import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses as dc
from freepose_tpu.models.dinov2 import VIT_L14_REG, VIT_B14_REG, DinoFeatureExtractor

x0 = jnp.zeros(()); f0 = jax.jit(lambda a: a + 1); np.asarray(f0(x0))
def t(label, fn, n=5, flops=None):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    m = 1e3*float(np.median(ts))
    print(f"{label}: {m:.1f} ms" + (f" ({flops/1e9/m:.0f} TFLOP/s incl rtt)" if flops else ""), flush=True)
rtt_ts = []
for _ in range(5):
    t0=time.perf_counter(); np.asarray(f0(x0)); rtt_ts.append(time.perf_counter()-t0)
print(f"rtt {1e3*np.median(rtt_ts):.1f} ms", flush=True)

# numeric parity on-device first: flash vs dense tiny check via extractor? direct kernel:
from freepose_tpu.ops.attention import flash_attention
rng = np.random.default_rng(0)
for (bh, n, nk, d) in [(16, 905, 905, 64), (12, 1374, 1374, 64), (2, 4096, 4096, 64)]:
    q = jnp.asarray(rng.standard_normal((1, bh, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, bh, nk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, bh, nk, d)), jnp.float32)
    out = np.asarray(flash_attention(q, k, v, scale=d**-0.5))
    # dense reference on device
    import jax.numpy as jnp2
    lg = jnp2.einsum("bhnd,bhkd->bhnk", q, k) * d**-0.5
    ref = np.asarray(jnp2.einsum("bhnk,bhkd->bhnd", jax.nn.softmax(lg, axis=-1), v))
    err = np.abs(out - ref).max()
    print(f"shape n={n}: max err {err:.2e}", flush=True)
    assert err < 5e-3  # TPU f32 matmul precision

cfgb = dc.replace(VIT_B14_REG, dtype=jnp.bfloat16, use_flash=True)
feb = DinoFeatureExtractor(cfgb)
cfg = dc.replace(VIT_L14_REG, dtype=jnp.bfloat16, use_flash=True)
fe = DinoFeatureExtractor(cfg)
img16 = jnp.asarray(rng.random((16, 3, 518, 518)), jnp.float32)
img8 = jnp.asarray(rng.random((8, 3, 420, 420)), jnp.float32)
tokb = 1374; flb = 12 * (tokb * 12 * 768**2 + 4 * tokb**2 * 768) * 2
tok = 905; fl = 22 * (tok * 12 * 1024**2 + 4 * tok**2 * 1024) * 2
t("ViT-B b16 @518", lambda: np.asarray(feb(img16, layer=None, feature_type="patch")[0, 0, :4]), flops=16*flb)
t("ViT-L b8 @420", lambda: np.asarray(fe(img8, layer=22, feature_type="patch")[0, 0, :4]), flops=8*fl)
