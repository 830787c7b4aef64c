"""Object-sharded SAM2 video propagation == single-device propagation.

The video predictor's per-object vmap axis shards over the mesh "data" axis
(freepose_tpu/models/sam2/predictor.py, device_mesh=...) — the multi-chip
latency scaling absent in the reference (SLURM-array throughput only,
SURVEY.md §5.8). Runs on the 8-virtual-device CPU mesh (tests/conftest.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor
from freepose_tpu.models.sam2.video import Sam2VideoModel, init_object_state
from freepose_tpu.parallel.mesh import make_mesh
from tests.test_sam2_video import OUR_CFG


@pytest.fixture(scope="module")
def video_params():
    model = Sam2VideoModel(OUR_CFG)
    state0 = init_object_state(OUR_CFG)
    pixels = jnp.zeros((1, 3, 64, 64))

    def full(mdl, pixels):
        pyramid, pos = mdl.embed_frame(pixels)
        st, _ = mdl.track_step(
            state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
            points=jnp.zeros((1, 1, 8, 2)), labels=jnp.full((1, 1, 8), -10, jnp.int32),
            is_init=True,
        )
        return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))

    return Sam2VideoModel(OUR_CFG).init(jax.random.PRNGKey(0), pixels, method=full)["params"]


def _run(pred, frames, prompts, **kw):
    state = pred.init_state(frames)
    for (obj_id, frame_idx, kwargs) in prompts:
        state = pred.add_new_points_or_box(state, frame_idx, obj_id=obj_id, **kwargs)
    return list(pred.propagate_in_video(state, **kw))


PROMPTS3 = [
    (7, 0, dict(box=np.array([5, 5, 30, 30]))),
    (9, 0, dict(points=np.array([[50.0, 20.0]]), labels=np.array([1]))),
    (11, 0, dict(box=np.array([20, 10, 60, 40]))),
]


def test_sharded_matches_unsharded(video_params):
    rng = np.random.default_rng(5)
    frames = (rng.random((4, 48, 80, 3)) * 255).astype(np.uint8)
    base = Sam2VideoPredictor(OUR_CFG, video_params, max_objects=4)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    shard = Sam2VideoPredictor(OUR_CFG, video_params, max_objects=4, device_mesh=mesh)

    ref = _run(base, frames, PROMPTS3)
    got = _run(shard, frames, PROMPTS3)
    assert len(ref) == len(got) == 4
    for (t_r, ids_r, low_r, high_r), (t_g, ids_g, low_g, high_g) in zip(ref, got):
        assert t_r == t_g and ids_r == ids_g
        np.testing.assert_allclose(low_g, low_r, atol=1e-4)
        np.testing.assert_allclose(high_g, high_r, atol=1e-3)


def test_sharded_multi_prompt_frames_binarized(video_params):
    """Objects prompted on different frames (separate sharded groups) and
    the joint non-overlap + on-device binarize path."""
    rng = np.random.default_rng(6)
    frames = (rng.random((4, 48, 80, 3)) * 255).astype(np.uint8)
    base = Sam2VideoPredictor(OUR_CFG, video_params, max_objects=4)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    shard = Sam2VideoPredictor(OUR_CFG, video_params, max_objects=4, device_mesh=mesh)
    prompts = [
        (1, 0, dict(box=np.array([5, 5, 30, 30]))),
        (2, 2, dict(points=np.array([[40.0, 24.0]]), labels=np.array([1]))),
    ]
    ref = _run(base, frames, prompts, non_overlap_masks=True, binarize=True)
    got = _run(shard, frames, prompts, non_overlap_masks=True, binarize=True)
    for (t_r, ids_r, low_r, high_r), (t_g, ids_g, low_g, high_g) in zip(ref, got):
        assert t_r == t_g and ids_r == ids_g
        np.testing.assert_array_equal(low_g, low_r)
        np.testing.assert_array_equal(high_g, high_r)
