import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses as dc
from freepose_tpu.models.dinov2 import VIT_L14_REG, VIT_B14_REG, DinoFeatureExtractor

rtt = None
def t(label, fn, n=5, flops=None):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    m = 1e3*float(np.median(ts))
    extra = f" -> {flops/1e9/max(m - (rtt or 0),1e-9):.0f} TFLOP/s (rtt-corrected)" if flops else ""
    print(f"{label}: {m:.1f} ms{extra}", flush=True)
    return m

x0 = jnp.zeros(())
f0 = jax.jit(lambda a: a + 1)
np.asarray(f0(x0))
rtt = t("rtt (tiny fetch)", lambda: np.asarray(f0(x0)))

cfg = dc.replace(VIT_L14_REG, dtype=jnp.bfloat16, use_flash=True)
fe = DinoFeatureExtractor(cfg)
cfgb = dc.replace(VIT_B14_REG, dtype=jnp.bfloat16, use_flash=True)
feb = DinoFeatureExtractor(cfgb)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((1, 3, 420, 420)), jnp.float32)
img8 = jnp.asarray(rng.random((8, 3, 420, 420)), jnp.float32)
img16 = jnp.asarray(rng.random((16, 3, 518, 518)), jnp.float32)

tok = (420 // 14) ** 2 + 1 + 4
fl = 22 * (tok * 12 * 1024**2 + 4 * tok**2 * 1024) * 2
tokb = (518 // 14) ** 2 + 1 + 4
flb = 12 * (tokb * 12 * 768**2 + 4 * tokb**2 * 768) * 2

t("ViT-L b1 @420", lambda: np.asarray(fe(img, layer=22, feature_type="patch")[0, 0, :4]), flops=fl)
t("ViT-L b8 @420", lambda: np.asarray(fe(img8, layer=22, feature_type="patch")[0, 0, :4]), flops=8*fl)
t("ViT-B b16 @518", lambda: np.asarray(feb(img16, layer=None, feature_type="patch")[0, 0, :4]), flops=16*flb)

# SAM2 chunk program cost: reuse bench pieces
from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor
from freepose_tpu.models.sam2.video import Sam2VideoModel, init_object_state
from scripts.common import production_sam2_video_config
from scripts.bench_sam2 import random_params_like
vcfg = production_sam2_video_config()
vmodel = Sam2VideoModel(vcfg)
state0 = init_object_state(vcfg)
p_cap = vcfg.max_point_prompts
def full(mdl, pixels):
    pyramid, pos = mdl.embed_frame(pixels)
    st, _ = mdl.track_step(state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
        points=jnp.zeros((1, 1, p_cap, 2)), labels=jnp.full((1, 1, p_cap), -10, jnp.int32), is_init=True)
    return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))
def init_fn():
    return vmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, vcfg.image_size, vcfg.image_size), jnp.float32), method=full)["params"]
pred = Sam2VideoPredictor(vcfg, random_params_like(init_fn), max_objects=1)
frames = rng.integers(0, 255, size=(33, 720, 1280, 3), dtype=np.uint8)
fd = jax.device_put(frames)
st = pred.init_state(fd)
st = pred.add_new_points_or_box(st, 0, obj_id=0, box=np.array([100.,100.,400.,400.], np.float32))
def sam2_pass():
    n = 0
    for ts_, lo, hi, fb in pred.propagate_batched(st, chunk=8):
        n = ts_[-1]
    np.asarray(hi[0,0,0,0])
t("SAM2 propagate 33f (per-frame avg below)", lambda: sam2_pass())
