"""CoTracker2-cost interval tracking: warm per-interval cost on the TPU."""
import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from freepose_tpu.models.cotracker2 import COTRACKER2, CoTracker2Predictor

rng = np.random.default_rng(0)
pred = CoTracker2Predictor(CoTracker2Predictor.init_params(COTRACKER2), COTRACKER2)
frames = jnp.asarray(rng.integers(0, 255, size=(12, 720, 1280, 3), dtype=np.uint8))
q = rng.uniform(50, 600, size=(512, 2)).astype(np.float32)
tr, vis = pred.track(frames, q, 0)  # compile
ts = []
for _ in range(3):
    t0 = time.perf_counter(); pred.track(frames, q, 0); ts.append(time.perf_counter() - t0)
print(f"interval(12f x 512q): {1e3*float(np.median(ts)):.1f} ms = {1e3*float(np.median(ts))/12:.2f} ms/frame")
