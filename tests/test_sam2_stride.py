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


@pytest.mark.parametrize("r", [2])
def test_stride_numeric_oracle(r):
    """NUMERIC oracle for stride-r memory attention (no HF implementation of
    memory_temporal_stride exists): harvest each frame's memory tokens and
    object pointer from the real ring-buffer run, then for target frames T
    assemble the variable-length memory bank FIRST-PRINCIPLES from the
    reference selection formula (sam2_base.py:533-558) — cond frame + last
    frame (t_rel 1) + r-grid frames (t_rel 2..num_maskmem-1), temporal-pos
    row t_rel-1 (cond row num_maskmem-1), object pointers at offsets
    1..max_ptrs_use-1 — run memory attention + SAM heads directly on that
    concatenation, and require the ring machine's outputs to MATCH
    numerically (iou / object-score logits / mask logits), not just by
    held-frame indices."""
    pred, cfg = _make_pred(r)
    m = cfg.mem
    rng = np.random.default_rng(0)
    n_frames = 14
    frames = (rng.random((n_frames, 48, 48, 3)) * 255).astype(np.uint8)
    state = pred.init_state(frames)
    state = pred.add_new_points_or_box(state, 0, obj_id=0, box=np.array([4, 4, 30, 30]))

    stacked = jax.tree.map(lambda x: jnp.stack([x]), init_object_state(cfg))
    pts = jnp.asarray(np.zeros((1, 1, 1, 8, 2), np.float32))
    lbl = jnp.asarray(np.full((1, 1, 1, 8), -10, np.int32))
    mem_of: dict[int, np.ndarray] = {}  # frame -> [hw, mem_dim] memory tokens
    ptr_of: dict[int, np.ndarray] = {}  # frame -> [hidden] object pointer
    real_out: dict[int, dict] = {}
    for t in range(n_frames):
        pyramid, pos = pred._frame_pyramid(state, t)
        if t == 0:
            stacked, out = pred._init_step(
                pred.params, stacked, pyramid, pyramid[2], pos[2],
                jnp.int32(t), jnp.int32(n_frames), pts, lbl,
            )
            mem_of[0] = np.asarray(stacked.maskmem[0][0])
        else:
            stacked, out = pred._track_step(
                pred.params, stacked, pyramid, pyramid[2], pos[2],
                jnp.int32(t), jnp.int32(n_frames),
            )
            # Stride-r writes every frame into the last-frame slot (1).
            mem_of[t] = np.asarray(stacked.maskmem[0][1])
        ptr_of[t] = np.asarray(out["object_pointer"][0, 0])
        real_out[t] = {k: np.asarray(v[0]) for k, v in out.items()}

    g = cfg.mem_grid
    hw = g * g
    splits = m.hidden_size // m.mem_dim
    max_ptrs_use = min(n_frames, m.max_obj_ptrs)

    def oracle(mdl, pyramid, raw_s2, pos_s2, mem_tokens, tpos_rows, ptr_tokens, p_off):
        from freepose_tpu.models.sam2.hiera import sine_position_encoding
        from freepose_tpu.models.sam2.memory import sine_1d_pe

        spatial = sine_position_encoding((g, g), m.mem_dim).reshape(hw, m.mem_dim)
        tpos = mdl.memory_temporal_pos[tpos_rows, 0, 0]  # [n_mem, mem_dim]
        mem_pos = (spatial[None] + tpos[:, None]).reshape(-1, m.mem_dim)
        mem = mem_tokens.reshape(-1, m.mem_dim)
        if cfg.enable_ptr_temporal_pos:
            norm = max(max_ptrs_use - 1.0, 1.0)
            ptr_pos = mdl.ptr_tpos_proj(sine_1d_pe(p_off.astype(jnp.float32) / norm, m.hidden_size))
        else:
            ptr_pos = jnp.zeros((p_off.shape[0], m.mem_dim))
        ptr_tok = ptr_tokens.reshape(-1, m.mem_dim)  # [n_ptr*splits, mem_dim]
        ptr_pos_tok = jnp.repeat(ptr_pos, splits, axis=0)
        memory = jnp.concatenate([mem, ptr_tok])[None]
        memory_pos = jnp.concatenate([mem_pos, ptr_pos_tok])[None]
        n_ptr = ptr_tok.shape[0]
        curr = raw_s2.reshape(1, hw, m.hidden_size)
        curr_pos = pos_s2.reshape(1, hw, m.hidden_size)
        kv_mask = jnp.ones((1, memory.shape[1]), bool)
        cond = mdl.memory_attention(curr, curr_pos, memory, memory_pos, n_ptr, kv_mask)
        pix = cond.reshape(1, g, g, m.hidden_size)
        low, high, pointer, obj_logits, iou = mdl._sam_step(
            [pyramid[0], pyramid[1], pix], None, None, None,
            cfg.multimask_for_tracking,
        )
        return low, obj_logits, iou

    for t_target in (5, 9, 13):
        # First-principles selection at frame T (forward): last frame t_rel=1,
        # grid frames anchor-(t_rel-2)*r at t_rel=2.., cond frame separate.
        anchor = ((t_target - 2) // r) * r
        sel = [(t_target - 1, 1)]
        for t_rel in range(2, m.num_maskmem):
            f = anchor - (t_rel - 2) * r
            if f > 0 and f != t_target - 1:
                sel.append((f, t_rel))
        mem_tokens = np.stack([mem_of[0]] + [mem_of[f] for f, _ in sel])
        tpos_rows = np.asarray(
            [m.num_maskmem - 1] + [t_rel - 1 for _, t_rel in sel], np.int32
        )
        ptr_frames = [0] + [
            f for f in range(1, t_target) if 1 <= t_target - f <= max_ptrs_use - 1
        ]
        ptr_tokens = np.stack([ptr_of[f] for f in ptr_frames])
        p_off = np.asarray([t_target - f for f in ptr_frames], np.int32)

        pyramid, pos = pred._frame_pyramid(state, t_target)
        pyr_1 = jax.tree.map(lambda a: a, pyramid)
        low, obj_logits, iou = pred.model.apply(
            {"params": pred.params}, pyr_1, pyramid[2], pos[2],
            jnp.asarray(mem_tokens), jnp.asarray(tpos_rows),
            jnp.asarray(ptr_tokens), jnp.asarray(p_off), method=oracle,
        )
        ro = real_out[t_target]
        np.testing.assert_allclose(
            np.asarray(iou[0]), ro["iou_scores"][0], rtol=1e-4, atol=1e-5,
            err_msg=f"iou mismatch at frame {t_target}",
        )
        np.testing.assert_allclose(
            np.asarray(obj_logits[0]), ro["object_score_logits"][0],
            rtol=1e-4, atol=1e-5,
            err_msg=f"object score mismatch at frame {t_target}",
        )
        np.testing.assert_allclose(
            np.asarray(low[0]), ro["pred_masks"][0], rtol=1e-3, atol=1e-4,
            err_msg=f"mask logits mismatch at frame {t_target}",
        )


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
