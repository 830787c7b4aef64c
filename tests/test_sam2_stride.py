"""SAM2 memory_temporal_stride r>1 (reference sam2_base.py:528-563): the
non-cond memory bank holds the LAST frame plus the newest num_maskmem-2
frames of the r-grid. Write-policy oracle computed first-principles from the
reference formula; functional propagation smoke; r=1 layout unchanged (the
full parity suite pins that)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor
from freepose_tpu.models.sam2.video import Sam2VideoModel, init_object_state
from tests.test_sam2_video import OUR_CFG


def _cfg(r):
    return dataclasses.replace(
        OUR_CFG, mem=dataclasses.replace(OUR_CFG.mem, memory_temporal_stride=r)
    )


def _reference_memory_frames(t, cond_frame, num_maskmem, r):
    """Reference sam2_base.py:533-558 forward selection: frames the memory
    bank must be able to serve when attending at frame t."""
    frames = {t - 1}
    anchor = ((t - 2) // r) * r
    for t_rel in range(2, num_maskmem):
        f = anchor - (t_rel - 2) * r
        if f > cond_frame:  # cond frame lives in the cond slot
            frames.add(f)
    return {f for f in frames if f > cond_frame}


def _make_pred(r):
    cfg = _cfg(r)
    model = Sam2VideoModel(cfg)
    state0 = init_object_state(cfg)
    pixels = jnp.zeros((1, 3, cfg.image_size, cfg.image_size))

    def full(mdl, pixels):
        pyramid, pos = mdl.embed_frame(pixels)
        st, _ = mdl.track_step(
            state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
            points=jnp.zeros((1, 1, 8, 2)), labels=jnp.full((1, 1, 8), -10, jnp.int32),
            is_init=True,
        )
        return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))

    variables = model.init(jax.random.PRNGKey(0), pixels, method=full)
    return Sam2VideoPredictor(cfg, variables["params"], max_objects=1), cfg


@pytest.mark.parametrize("r", [2, 3])
def test_stride_write_policy_matches_reference_selection(r):
    """After stepping frames 0..T, the state must contain every frame the
    reference's stride-r selection would attend at frame T+1."""
    pred, cfg = _make_pred(r)
    m = cfg.mem
    rng = np.random.default_rng(0)
    n_frames = 14
    frames = (rng.random((n_frames, 48, 48, 3)) * 255).astype(np.uint8)
    state = pred.init_state(frames)
    state = pred.add_new_points_or_box(state, 0, obj_id=0, box=np.array([4, 4, 30, 30]))
    seen = []
    for t, _, low, _ in pred.propagate_in_video(state):
        seen.append(t)
        assert np.isfinite(low).all()
    assert seen == list(range(n_frames))

    # propagate_in_video rebuilds states internally; re-run the raw steps to
    # inspect the final state's slot contents.
    stacked = jax.tree.map(lambda x: jnp.stack([x]), init_object_state(cfg))
    pts = jnp.asarray(np.zeros((1, 1, 1, 8, 2), np.float32))
    lbl = jnp.asarray(np.full((1, 1, 1, 8), -10, np.int32))
    for t in range(n_frames):
        pyramid, pos = pred._frame_pyramid(state, t)
        if t == 0:
            stacked, _ = pred._init_step(
                pred.params, stacked, pyramid, pyramid[2], pos[2],
                jnp.int32(t), jnp.int32(n_frames), pts, lbl,
            )
        else:
            stacked, _ = pred._track_step(
                pred.params, stacked, pyramid, pyramid[2], pos[2],
                jnp.int32(t), jnp.int32(n_frames),
            )
        if t >= 2:
            held = {
                int(f)
                for f, v in zip(
                    np.asarray(stacked.maskmem_frame[0]), np.asarray(stacked.maskmem_valid[0])
                )
                if v
            }
            need = _reference_memory_frames(t + 1, 0, m.num_maskmem, r)
            assert need <= held, f"r={r} t={t}: need {sorted(need)}, held {sorted(held)}"


def test_stride_propagation_runs():
    """r=2 propagation end-to-end smoke (finite masks on every frame). The
    structural divergence from r=1 is pinned by the write-policy oracle above
    (the held frame sets differ by construction); output-level divergence is
    not assertable with random-init weights, whose masks are constant
    no-object logits."""
    pred2, _ = _make_pred(2)
    rng = np.random.default_rng(1)
    frames = (rng.random((10, 48, 48, 3)) * 255).astype(np.uint8)
    st = pred2.init_state(frames)
    st = pred2.add_new_points_or_box(st, 0, obj_id=0, box=np.array([4, 4, 30, 30]))
    outs = [low for _, _, low, _ in pred2.propagate_in_video(st)]
    assert len(outs) == 10
    for a in outs:
        assert np.isfinite(a).all()
