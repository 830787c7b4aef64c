"""Streaming video frame loader (reference sam2/utils/misc.py:92-214)."""
import numpy as np
import pytest
from PIL import Image

from freepose_tpu.datasets.video import AsyncVideoFrameLoader, load_frame_dir


@pytest.fixture()
def frame_dir(tmp_path):
    rng = np.random.default_rng(0)
    frames = (rng.random((5, 24, 32, 3)) * 255).astype(np.uint8)
    for i, f in enumerate(frames):
        Image.fromarray(f).save(tmp_path / f"{i:05d}.png")
    return tmp_path, frames


def test_eager_loader(frame_dir):
    d, frames = frame_dir
    got = load_frame_dir(d)
    assert got.shape == frames.shape and got.dtype == np.uint8
    np.testing.assert_array_equal(got, frames)  # PNG is lossless


def test_async_loader_matches_eager(frame_dir):
    d, _ = frame_dir
    eager = load_frame_dir(d)
    lazy = AsyncVideoFrameLoader(d)
    assert len(lazy) == 5 and lazy.shape == eager.shape
    lazy.join()
    for i in [4, 2, 0]:  # out-of-order access
        np.testing.assert_array_equal(lazy[i], eager[i])


def test_async_loader_feeds_video_predictor(frame_dir):
    """The lazy loader duck-types the eager array inside Sam2VideoPredictor."""
    import jax, jax.numpy as jnp

    from freepose_tpu.models.sam2.video import Sam2VideoModel, init_object_state
    from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor
    from tests.test_sam2_video import OUR_CFG

    model = Sam2VideoModel(OUR_CFG)
    state0 = init_object_state(OUR_CFG)
    pixels = jnp.zeros((1, 3, 64, 64))

    def full(mdl, pixels):
        pyr, pos = mdl.embed_frame(pixels)
        st, _ = mdl.track_step(state0, pyr, pyr[2], pos[2], jnp.int32(0), jnp.int32(3),
                               points=jnp.zeros((1, 1, 8, 2)),
                               labels=jnp.full((1, 1, 8), -10, jnp.int32), is_init=True)
        return mdl.track_step(st, pyr, pyr[2], pos[2], jnp.int32(1), jnp.int32(3))

    params = model.init(jax.random.PRNGKey(0), pixels, method=full)["params"]
    pred = Sam2VideoPredictor(OUR_CFG, params)

    d, _ = frame_dir
    lazy = AsyncVideoFrameLoader(d)
    st = pred.init_state(lazy)
    st = pred.add_new_points_or_box(st, 0, obj_id=1, box=np.array([4, 4, 20, 20]))
    outs = list(pred.propagate_in_video(st, max_frames=2))
    assert [t for t, *_ in outs] == [0, 1]
    assert outs[0][3].shape == (1, 24, 32)


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_frame_dir(tmp_path / "nope")
