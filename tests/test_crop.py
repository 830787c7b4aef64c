import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from freepose_tpu.geometry.crop import crop_resize_pad, crop_resize_pad_shared


def _torch_crop_resize_pad(images, boxes, target, extend=0.0):
    """Independent oracle reproducing the reference CropResizePad semantics
    (crop -> isotropic nearest resize -> centre pad -> final resize), written
    against torch CPU as ground truth."""
    n, c, h, w = images.shape
    out = []
    for img, box in zip(torch.tensor(images), torch.tensor(boxes, dtype=torch.float32)):
        bw, bh = box[2] - box[0], box[3] - box[1]
        x1 = max(0.0, float(box[0] - extend * bw))
        x2 = min(float(w), float(box[2] + extend * bw))
        y1 = max(0.0, float(box[1] - extend * bh))
        y2 = min(float(h), float(box[3] + extend * bh))
        x1, y1, x2, y2 = int(x1), int(y1), int(x2), int(y2)
        crop = img[:, y1:y2, x1:x2]
        scale = target / max(crop.shape[1], crop.shape[2])
        crop = F.interpolate(crop[None], scale_factor=scale)[0]
        ch, cw = crop.shape[1:]
        pt = max((target - ch) // 2, 0)
        pb = target - ch - pt
        pl = max((target - cw) // 2, 0)
        pr = target - cw - pl
        crop = F.pad(crop, (pl, pr, pt, pb))
        crop = F.interpolate(crop[None], scale_factor=target / crop.shape[1])[0]
        out.append(crop)
    return torch.stack(out).numpy()


def test_crop_resize_pad_matches_torch_oracle():
    rng = np.random.default_rng(0)
    images = rng.random((3, 3, 64, 80), dtype=np.float32)
    boxes = np.array([[10, 5, 50, 45], [0, 0, 80, 64], [20, 30, 33, 40]], dtype=np.int32)
    ours = np.asarray(crop_resize_pad(jnp.asarray(images), jnp.asarray(boxes), 56))
    ref = _torch_crop_resize_pad(images, boxes, 56)
    # Nearest-neighbour rounding may differ on a thin band of pixels at resize
    # boundaries; demand exact match for >97% of pixels and identical masks.
    mismatch = np.mean(np.abs(ours - ref) > 1e-5)
    assert mismatch < 0.03, f"pixel mismatch fraction {mismatch}"


def test_crop_resize_pad_with_extend():
    rng = np.random.default_rng(1)
    images = rng.random((2, 3, 100, 100), dtype=np.float32)
    boxes = np.array([[40, 40, 60, 60], [10, 20, 90, 70]], dtype=np.int32)
    ours = np.asarray(crop_resize_pad(jnp.asarray(images), jnp.asarray(boxes), 42, extend=0.2))
    ref = _torch_crop_resize_pad(images, boxes, 42, extend=0.2)
    mismatch = np.mean(np.abs(ours - ref) > 1e-5)
    assert mismatch < 0.05, f"pixel mismatch fraction {mismatch}"


def test_crop_is_centered_and_padded():
    # Wide box: content occupies full width, vertically centred, zeros above
    # and below.
    img = jnp.ones((1, 1, 40, 40))
    boxes = jnp.array([[0, 10, 40, 20]])  # 40 wide, 10 tall
    out = np.asarray(crop_resize_pad(img, boxes, 40))[0, 0]
    assert out[:5].sum() == 0 and out[-5:].sum() == 0
    assert out[18:22].sum() == 4 * 40


def test_shared_image_variant():
    rng = np.random.default_rng(2)
    image = rng.random((3, 50, 60), dtype=np.float32)
    boxes = jnp.array([[5, 5, 30, 30], [10, 0, 60, 50]])
    shared = np.asarray(crop_resize_pad_shared(jnp.asarray(image), boxes, 32))
    tiled = np.asarray(
        crop_resize_pad(jnp.asarray(np.tile(image[None], (2, 1, 1, 1))), boxes, 32)
    )
    np.testing.assert_allclose(shared, tiled)
