"""Sweep single-regime flash blocks for the 1374-token ViT-B@518 shape.
Chained dispatches + one tiny fetch (tunnel-honest timing)."""
import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from freepose_tpu.ops.attention import flash_attention

rng = np.random.default_rng(0)
B, H, N, D = 16, 12, 1374, 64
q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
scale = 1 / 8.0
flops = 4 * B * H * N * N * D
CH = 20

def t(label, fn):
    out = fn(q); np.asarray(out[0, 0, :4])  # compile+settle
    t0 = time.perf_counter()
    np.asarray(fn(q)[0, 0, :4]); rtt_one = time.perf_counter() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = q
        for _ in range(CH):
            o = fn(o)
        np.asarray(o[0, 0, :4])
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    per = (best - (rtt_one - best / CH * 1)) / CH  # subtract ~1 rtt
    per = best / CH  # marginal rate; rtt amortized over 20
    print(f"{label}: {1e3*per:.2f} ms/dispatch -> {flops/1e12/per:.1f} TFLOP/s", flush=True)

for bq, budget in [(1024, 6 << 20), (688, 6 << 20), (512, 6 << 20), (344, 6 << 20),
                   (1376, 9 << 20), (1376, 12 << 20)]:
    try:
        t(f"bq={bq} budget={budget>>20}M",
          lambda x, bq=bq, budget=budget: flash_attention(x, k, v, scale, block_q=bq, single_budget=budget))
    except Exception as e:
        print(f"bq={bq} budget={budget>>20}M: FAILED {type(e).__name__}: {str(e)[:140]}")
