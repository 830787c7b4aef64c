"""Profile GroundingDINO-base detect on the TPU."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from freepose_tpu.models.grounding_dino import GroundingDino, GroundingDinoDetector
from scripts.common import production_gdino_config

rng = np.random.default_rng(0)
cfg = production_gdino_config()
model = GroundingDino(cfg)
from freepose_tpu.models.grounding_dino import text_token_masks
ids = np.array([[101, 5200, 1012, 102]])
sa, pos = text_token_masks(ids)
px = jnp.asarray(rng.random((1, 3, 800, 800)), jnp.float32)
params = model.init(jax.random.PRNGKey(0), px[:, :, :320, :320], jnp.asarray(ids), jnp.asarray(sa), jnp.asarray(pos), jnp.asarray(ids == 0))["params"]
det = GroundingDinoDetector(cfg, params, image_size=800)
frame = rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)
det.detect(frame, input_ids=ids, box_threshold=0.5)  # compile
t0 = time.perf_counter(); det.detect(frame, input_ids=ids, box_threshold=0.5); print(f"warm detect: {1e3*(time.perf_counter()-t0):.1f} ms")
jax.profiler.start_trace("/tmp/prof_detect")
for _ in range(3):
    det.detect(frame, input_ids=ids, box_threshold=0.5)
jax.profiler.stop_trace()
print("trace -> /tmp/prof_detect")
