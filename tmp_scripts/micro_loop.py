"""Decompose the coupled loop's per-frame cost on the TPU (warm)."""
import time, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses as dc
from freepose_tpu.models.dinov2 import VIT_L14_REG, DinoFeatureExtractor, DinoV2
from freepose_tpu.models.dinov2 import normalize_images

cfg = dc.replace(VIT_L14_REG, dtype=jnp.bfloat16, use_flash=True)
fe = DinoFeatureExtractor(cfg)
rng = np.random.default_rng(0)

def t(label, fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    m = 1e3*float(np.median(ts))
    print(f"{label}: {m:.1f} ms", flush=True)
    return m

# 1. ViT-L featurize batch1 @420 (901 tokens) — the refine query term
img = jnp.asarray(rng.random((1, 3, 420, 420)), jnp.float32)
def vit1():
    f = fe(img, layer=22, feature_type="patch")
    jax.block_until_ready(f)
m1 = t("ViT-L b1 @420 layer22", vit1)
# analytic
tok = (420 // 14) ** 2 + 1 + 4
fl = 22 * (tok * 12 * 1024**2 + 4 * tok**2 * 1024) * 2
print(f"  analytic {fl/1e12:.3f} TFLOP -> {fl/1e9/m1:.0f} TFLOP/s achieved", flush=True)

# 2. batch 8
img8 = jnp.asarray(rng.random((8, 3, 420, 420)), jnp.float32)
def vit8():
    f = fe(img8, layer=22, feature_type="patch")
    jax.block_until_ready(f)
m8 = t("ViT-L b8 @420 layer22", vit8)
print(f"  analytic {8*fl/1e12:.3f} TFLOP -> {8*fl/1e9/m8:.0f} TFLOP/s achieved", flush=True)

# 3. ViT-B conf image pair cost @518 (the conf stream unit is 16 imgs)
from freepose_tpu.models.dinov2 import VIT_B14_REG
cfgb = dc.replace(VIT_B14_REG, dtype=jnp.bfloat16, use_flash=True)
feb = DinoFeatureExtractor(cfgb)
img16 = jnp.asarray(rng.random((16, 3, 518, 518)), jnp.float32)
def vitb16():
    f = feb(img16, layer=None, feature_type="patch")
    jax.block_until_ready(f)
mb = t("ViT-B b16 @518", vitb16)
tokb = (518 // 14) ** 2 + 1 + 4
flb = 12 * (tokb * 12 * 768**2 + 4 * tokb**2 * 768) * 2
print(f"  analytic {16*flb/1e12:.3f} TFLOP -> {16*flb/1e9/mb:.0f} TFLOP/s achieved", flush=True)
