"""SAM2 predictor orchestration: image predict API + batched video tracking."""
import jax
import numpy as np
import pytest

from freepose_tpu.models.sam2.model import SAM2_TEST, Sam2ImageModel
from freepose_tpu.models.sam2.predictor import Sam2ImagePredictor, Sam2VideoPredictor
from freepose_tpu.models.sam2.video import Sam2VideoConfig, Sam2VideoModel, init_object_state

import jax.numpy as jnp

from tests.test_sam2_video import OUR_CFG  # tiny video config (64px)


@pytest.fixture(scope="module")
def image_predictor():
    model = Sam2ImageModel(SAM2_TEST)
    img = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    return Sam2ImagePredictor(SAM2_TEST, params, image_size=64)


def test_image_predictor_box(image_predictor):
    rng = np.random.default_rng(0)
    image = (rng.random((48, 80, 3)) * 255).astype(np.uint8)  # non-square original
    image_predictor.set_image(jnp.asarray(image))
    masks, iou, logits = image_predictor.predict(box=np.array([10, 10, 60, 40]))
    assert masks.shape == (1, 3, 48, 80)
    assert iou.shape == (1, 3)
    assert masks.dtype == bool


def test_image_predictor_points(image_predictor):
    rng = np.random.default_rng(1)
    image = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    image_predictor.set_image(jnp.asarray(image))
    masks, iou, _ = image_predictor.predict(
        point_coords=np.array([[32.0, 32.0]]), point_labels=np.array([1]),
        multimask_output=False,
    )
    assert masks.shape == (1, 1, 64, 64)


@pytest.fixture(scope="module")
def video_predictor():
    model = Sam2VideoModel(OUR_CFG)
    state0 = init_object_state(OUR_CFG)
    pixels = jnp.zeros((1, 3, 64, 64))

    def full(mdl, pixels):
        pyramid, pos = mdl.embed_frame(pixels)
        # Exercise both init (SAM prompts) and tracking (memory attention)
        # paths so every parameter is created.
        st, _ = mdl.track_step(
            state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
            points=jnp.zeros((1, 1, 8, 2)), labels=jnp.full((1, 1, 8), -10, jnp.int32),
            is_init=True,
        )
        return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))

    variables = model.init(jax.random.PRNGKey(0), pixels, method=full)
    return Sam2VideoPredictor(OUR_CFG, variables["params"], max_objects=2)


def test_video_multi_object_tracking(video_predictor):
    rng = np.random.default_rng(2)
    frames = (rng.random((4, 48, 80, 3)) * 255).astype(np.uint8)
    state = video_predictor.init_state(frames)
    state = video_predictor.add_new_points_or_box(state, 0, obj_id=7, box=np.array([5, 5, 30, 30]))
    state = video_predictor.add_new_points_or_box(
        state, 0, obj_id=9, points=np.array([[50.0, 20.0]]), labels=np.array([1])
    )
    outs = list(video_predictor.propagate_in_video(state))
    assert len(outs) == 4
    for t, obj_ids, low, high in outs:
        assert obj_ids == [7, 9]
        assert low.shape == (2, 16, 16)
        assert high.shape == (2, 48, 80)
        assert np.isfinite(low).all()


def test_video_vmapped_matches_sequential(video_predictor):
    """Batched multi-object tracking must equal tracking each object alone."""
    rng = np.random.default_rng(3)
    frames = (rng.random((3, 64, 64, 3)) * 255).astype(np.uint8)

    def run(boxes_pts):
        state = video_predictor.init_state(frames)
        for i, kw in enumerate(boxes_pts):
            state = video_predictor.add_new_points_or_box(state, 0, obj_id=i, **kw)
        return [low for _, _, low, _ in video_predictor.propagate_in_video(state)]

    both = run([
        dict(box=np.array([5, 5, 30, 30])),
        dict(points=np.array([[40.0, 40.0]]), labels=np.array([1])),
    ])
    solo0 = run([dict(box=np.array([5, 5, 30, 30]))])
    solo1 = run([dict(points=np.array([[40.0, 40.0]]), labels=np.array([1]))])
    for t in range(3):
        np.testing.assert_allclose(both[t][0], solo0[t][0], atol=1e-4)
        np.testing.assert_allclose(both[t][1], solo1[t][0], atol=1e-4)


def test_non_overlapping_constraints():
    """Per-pixel winner-take-all (reference sam2_base.py:811-829): only the
    argmax object keeps its score; everyone else clamps to <= -10."""
    from freepose_tpu.models.sam2.predictor import apply_non_overlapping_constraints

    rng = np.random.default_rng(0)
    masks = jnp.asarray(rng.normal(size=(3, 8, 8)).astype(np.float32)) * 5
    out = np.asarray(apply_non_overlapping_constraints(masks))
    win = np.argmax(np.asarray(masks), axis=0)
    for i in range(3):
        kept = win == i
        np.testing.assert_array_equal(out[i][kept], np.asarray(masks)[i][kept])
        assert (out[i][~kept] <= -10.0).all()
    # Clamp is min(score, -10): already-lower scores pass through unchanged.
    low = np.asarray(masks)[0][~(win == 0)]
    np.testing.assert_array_equal(out[0][~(win == 0)], np.minimum(low, -10.0))
    # Single object: unchanged.
    one = masks[:1]
    np.testing.assert_array_equal(np.asarray(apply_non_overlapping_constraints(one)), one)


def test_video_propagation_non_overlap_flag(video_predictor):
    rng = np.random.default_rng(5)
    frames = (rng.random((2, 48, 80, 3)) * 255).astype(np.uint8)
    state = video_predictor.init_state(frames)
    state = video_predictor.add_new_points_or_box(state, 0, obj_id=1, box=np.array([5, 5, 40, 40]))
    state = video_predictor.add_new_points_or_box(state, 0, obj_id=2, box=np.array([10, 10, 45, 45]))
    for t, _, low, high in video_predictor.propagate_in_video(state, non_overlap_masks=True):
        # At most one object above the suppression clamp per pixel.
        assert ((low > -10.0).sum(axis=0) <= 1).all()
        assert ((high > -10.0).sum(axis=0) <= 1).all()


def test_video_reverse_propagation(video_predictor):
    """Prompt on a middle frame, track back towards frame 0 (reference
    sam2_video_predictor.py:644-726 reverse pass)."""
    rng = np.random.default_rng(4)
    frames = (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    state = video_predictor.init_state(frames)
    state = video_predictor.add_new_points_or_box(state, 2, obj_id=3, box=np.array([5, 5, 40, 40]))

    back = list(video_predictor.propagate_in_video(state, reverse=True))
    assert [t for t, *_ in back] == [2, 1, 0]
    for t, obj_ids, low, high in back:
        assert obj_ids == [3]
        assert low.shape == (1, 16, 16) and high.shape == (1, 64, 64)
        assert np.isfinite(low).all()

    # The prompt frame itself is direction-independent.
    state2 = video_predictor.init_state(frames)
    state2 = video_predictor.add_new_points_or_box(state2, 2, obj_id=3, box=np.array([5, 5, 40, 40]))
    fwd0 = next(iter(video_predictor.propagate_in_video(state2)))
    np.testing.assert_allclose(back[0][2], fwd0[2], atol=1e-5)

    # Mechanism check on the jitted steps: after a prompt at frame 2, stepping
    # to frame 1 with reverse=True sees a VALID memory (offset +1) while the
    # forward step sees none (offset -1 -> unconditioned path), so the
    # memory-conditioned decoder outputs must differ.
    from freepose_tpu.models.sam2.video import init_object_state

    pred = video_predictor
    st = jax.tree.map(lambda x: x[None], init_object_state(pred.config))
    pyr2, pos2 = pred._frame_pyramid(state, 2)
    pts = jnp.asarray(state["prompts"][0][1])[None, None, None]
    lbl = jnp.asarray(state["prompts"][0][2])[None, None, None]
    st, _ = pred._init_step(pred.params, st, pyr2, pyr2[2], pos2[2],
                            jnp.int32(2), jnp.int32(4), pts, lbl)
    pyr1, pos1 = pred._frame_pyramid(state, 1)
    _, out_rev = pred._track_step_rev(pred.params, st, pyr1, pyr1[2], pos1[2],
                                      jnp.int32(1), jnp.int32(4))
    _, out_fwd = pred._track_step(pred.params, st, pyr1, pyr1[2], pos1[2],
                                  jnp.int32(1), jnp.int32(4))
    assert not np.allclose(
        np.asarray(out_rev["object_score_logits"]),
        np.asarray(out_fwd["object_score_logits"]),
        atol=1e-7,
    )


@pytest.mark.parametrize("reverse", [False, True], ids=["fwd", "rev"])
def test_video_chunked_matches_serial(video_predictor, reverse):
    """chunk>1 (scanned multi-frame program) must equal the per-frame path
    exactly — same sub-programs, scanned — including multi-prompt-frame
    layouts where init frames split the runs."""
    rng = np.random.default_rng(21)
    frames = (rng.random((7, 48, 80, 3)) * 255).astype(np.uint8)

    def run(chunk, binarize=False):
        state = video_predictor.init_state(frames)
        state = video_predictor.add_new_points_or_box(state, 1, obj_id=0, box=np.array([5, 5, 30, 30]))
        state = video_predictor.add_new_points_or_box(
            state, 4, obj_id=1, points=np.array([[50.0, 20.0]]), labels=np.array([1])
        )
        return list(video_predictor.propagate_in_video(
            state, reverse=reverse, chunk=chunk, binarize=binarize,
        ))

    serial = run(chunk=1)
    chunked = run(chunk=3)
    assert [t for t, *_ in serial] == [t for t, *_ in chunked]
    for (t1, o1, l1, h1), (t2, o2, l2, h2) in zip(serial, chunked):
        assert o1 == o2
        np.testing.assert_allclose(l1, l2, atol=1e-5)
        np.testing.assert_allclose(h1, h2, atol=1e-5)

    # Binarized masks follow the same path (packed on device).
    sb = run(chunk=1, binarize=True)
    cb = run(chunk=3, binarize=True)
    for (t1, _, l1, h1), (t2, _, l2, h2) in zip(sb, cb):
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(h1, h2)


def test_video_reverse_multi_prompt_frames(video_predictor):
    """Reverse propagation with objects prompted on DIFFERENT frames
    (reference sam2_video_predictor.py:644-726: reverse starts at the
    earliest cond frame and tracks the full batch; objects prompted later
    already carry their cond memory). The joint sweep must equal manually
    driving each group with the low-level jitted steps."""
    rng = np.random.default_rng(11)
    frames = (rng.random((5, 64, 64, 3)) * 255).astype(np.uint8)
    pred = video_predictor

    state = pred.init_state(frames)
    state = pred.add_new_points_or_box(state, 1, obj_id=0, box=np.array([5, 5, 30, 30]))
    state = pred.add_new_points_or_box(
        state, 3, obj_id=1, points=np.array([[40.0, 40.0]]), labels=np.array([1])
    )
    back = list(pred.propagate_in_video(state, reverse=True))
    assert [t for t, *_ in back] == [1, 0]
    for _, obj_ids, low, high in back:
        assert obj_ids == [0, 1]
        assert low.shape == (2, 16, 16) and np.isfinite(low).all()
        assert high.shape == (2, 64, 64)

    # Oracle: drive each object solo through the jitted steps it should see.
    def solo_reverse(prompt_frame, prompt_idx, steps):
        st = jax.tree.map(lambda x: x[None], init_object_state(pred.config))
        pyr, pos = pred._frame_pyramid(state, prompt_frame)
        pts = jnp.asarray(state["prompts"][prompt_idx][1])[None, None, None]
        lbl = jnp.asarray(state["prompts"][prompt_idx][2])[None, None, None]
        st, out = pred._init_step(pred.params, st, pyr, pyr[2], pos[2],
                                  jnp.int32(prompt_frame), jnp.int32(5), pts, lbl)
        outs = {prompt_frame: out}
        for t in steps:
            pyr, pos = pred._frame_pyramid(state, t)
            st, out = pred._track_step_rev(pred.params, st, pyr, pyr[2], pos[2],
                                           jnp.int32(t), jnp.int32(5))
            outs[t] = out
        return outs

    solo0 = solo_reverse(1, 0, [0])  # obj 0: cond @1, stepped to 0
    solo1 = solo_reverse(3, 1, [1, 0])  # obj 1: cond @3, stepped to 1 then 0

    from freepose_tpu.models.sam2.predictor import postprocess_video_masks

    for (t, _, low, _), ref_outs in ((back[0], (solo0[1], solo1[1])), (back[1], (solo0[0], solo1[0]))):
        for obj, ref in enumerate(ref_outs):
            exp, _ = postprocess_video_masks(
                ref["pred_masks"][:, 0], ref["high_res_masks"][:, 0],
                state["orig_hw"], False, False,
            )
            np.testing.assert_allclose(low[obj], np.asarray(exp)[0], atol=1e-4)


def test_video_binarize_matches_logits_threshold(video_predictor):
    """binarize=True must equal host-side `logits > 0` exactly (same program
    up to the threshold), incl. the non-overlap suppression path."""
    rng = np.random.default_rng(4)
    frames = (rng.random((3, 48, 80, 3)) * 255).astype(np.uint8)

    def run(**kw):
        state = video_predictor.init_state(frames)
        state = video_predictor.add_new_points_or_box(state, 0, obj_id=0, box=np.array([5, 5, 30, 30]))
        state = video_predictor.add_new_points_or_box(
            state, 0, obj_id=1, points=np.array([[50.0, 20.0]]), labels=np.array([1])
        )
        return list(video_predictor.propagate_in_video(state, **kw))

    for non_overlap in (False, True):
        ref = run(non_overlap_masks=non_overlap)
        binz = run(non_overlap_masks=non_overlap, binarize=True)
        for (t1, _, low_f, high_f), (t2, _, low_b, high_b) in zip(ref, binz):
            assert t1 == t2
            assert low_b.dtype == bool and high_b.dtype == bool
            np.testing.assert_array_equal(low_f > 0, low_b)
            np.testing.assert_array_equal(high_f > 0, high_b)


def test_packbits_roundtrip_and_odd_width(video_predictor):
    """Binarized masks travel bit-packed (8 px/byte) and must unpack to the
    exact bools, including widths not divisible by 8 (pad path)."""
    from freepose_tpu.models.sam2.predictor import _packbits_last, _unpackbits_last

    rng = np.random.default_rng(7)
    for shape in [(2, 5, 16), (1, 4, 83), (3, 7)]:
        m = rng.random(shape) > 0.5
        packed = np.asarray(_packbits_last(jnp.asarray(m)))
        assert packed.dtype == np.uint8 and packed.shape[-1] == -(-shape[-1] // 8)
        np.testing.assert_array_equal(_unpackbits_last(packed, shape[-1]), m)

    # End-to-end through propagation at an odd frame width.
    frames = (rng.random((2, 40, 83, 3)) * 255).astype(np.uint8)
    state = video_predictor.init_state(frames)
    state = video_predictor.add_new_points_or_box(state, 0, obj_id=0, box=np.array([5, 5, 30, 30]))
    ref = list(video_predictor.propagate_in_video(state))
    state = video_predictor.init_state(frames)
    state = video_predictor.add_new_points_or_box(state, 0, obj_id=0, box=np.array([5, 5, 30, 30]))
    binz = list(video_predictor.propagate_in_video(state, binarize=True))
    for (t1, _, low_f, high_f), (t2, _, low_b, high_b) in zip(ref, binz):
        assert t1 == t2 and high_b.shape == high_f.shape
        np.testing.assert_array_equal(low_f > 0, low_b)
        np.testing.assert_array_equal(high_f > 0, high_b)


def test_image_predictor_batched_boxes_match_sequential(image_predictor):
    """N boxes in one predict() call must equal N per-box calls (the
    proposal CLI decodes all detections as one batched prompt set)."""
    rng = np.random.default_rng(2)
    image = (rng.random((48, 80, 3)) * 255).astype(np.uint8)
    image_predictor.set_image(jnp.asarray(image))
    boxes = np.array([[5, 5, 30, 30], [20, 10, 70, 40], [1, 25, 40, 47]], np.float32)
    m_b, iou_b, lg_b = image_predictor.predict(box=boxes, multimask_output=False)
    assert m_b.shape[0] == 3
    for i in range(3):
        m_s, iou_s, lg_s = image_predictor.predict(box=boxes[i], multimask_output=False)
        np.testing.assert_array_equal(m_b[i], m_s[0])
        np.testing.assert_allclose(iou_b[i], iou_s[0], atol=1e-5)


def test_video_per_object_prompt_frames(video_predictor):
    """Objects prompted on DIFFERENT frames (reference
    sam2_video_predictor.py:167 allows arbitrary prompt frames): each
    object's track must equal its solo run started at its own frame, and
    pre-prompt frames must emit no-object masks."""
    rng = np.random.default_rng(6)
    frames = (rng.random((5, 64, 64, 3)) * 255).astype(np.uint8)

    state = video_predictor.init_state(frames)
    state = video_predictor.add_new_points_or_box(state, 0, obj_id=0, box=np.array([5, 5, 30, 30]))
    state = video_predictor.add_new_points_or_box(
        state, 2, obj_id=1, points=np.array([[40.0, 40.0]]), labels=np.array([1])
    )
    outs = list(video_predictor.propagate_in_video(state))
    assert [o[0] for o in outs] == [0, 1, 2, 3, 4]

    solo0_state = video_predictor.init_state(frames)
    solo0_state = video_predictor.add_new_points_or_box(
        solo0_state, 0, obj_id=0, box=np.array([5, 5, 30, 30])
    )
    solo0 = {t: low for t, _, low, _ in video_predictor.propagate_in_video(solo0_state)}

    solo1_state = video_predictor.init_state(frames)
    solo1_state = video_predictor.add_new_points_or_box(
        solo1_state, 2, obj_id=1, points=np.array([[40.0, 40.0]]), labels=np.array([1])
    )
    solo1 = {t: low for t, _, low, _ in video_predictor.propagate_in_video(solo1_state)}

    for t, obj_ids, low, high in outs:
        assert obj_ids == [0, 1]
        np.testing.assert_allclose(low[0], solo0[t][0], atol=1e-4)
        if t < 2:
            # Not yet prompted: no-object logits, thresholding gives empty.
            assert (low[1] < 0).all() and (high[1] < 0).all()
        else:
            np.testing.assert_allclose(low[1], solo1[t][0], atol=1e-4)


def test_video_per_object_prompt_frames_binarized(video_predictor):
    rng = np.random.default_rng(8)
    frames = (rng.random((4, 48, 48, 3)) * 255).astype(np.uint8)
    state = video_predictor.init_state(frames)
    state = video_predictor.add_new_points_or_box(state, 1, obj_id=0, box=np.array([4, 4, 24, 24]))
    state = video_predictor.add_new_points_or_box(state, 3, obj_id=1, box=np.array([10, 10, 40, 40]))
    outs = list(video_predictor.propagate_in_video(state, binarize=True))
    assert [o[0] for o in outs] == [1, 2, 3]
    for t, _, low, high in outs:
        assert low.dtype == bool and high.dtype == bool
        if t < 3:
            assert not high[1].any()


def test_video_reprompt_correction(video_predictor):
    """Re-prompting an existing object (the reference's correction flow,
    sam2_video_predictor.py:940-957) replaces its prompt: re-propagation
    equals a fresh run prompted at the corrected frame."""
    rng = np.random.default_rng(9)
    frames = (rng.random((4, 48, 48, 3)) * 255).astype(np.uint8)
    state = video_predictor.init_state(frames)
    state = video_predictor.add_new_points_or_box(state, 0, obj_id=5, box=np.array([4, 4, 20, 20]))
    _ = list(video_predictor.propagate_in_video(state))
    # Correct the same object on frame 1 with a different box.
    state = video_predictor.add_new_points_or_box(state, 1, obj_id=5, box=np.array([10, 10, 34, 34]))
    assert state["n_objects"] == 1 and state["obj_ids"] == [5]
    corrected = {t: low for t, _, low, _ in video_predictor.propagate_in_video(state)}

    fresh_state = video_predictor.init_state(frames)
    fresh_state = video_predictor.add_new_points_or_box(
        fresh_state, 1, obj_id=5, box=np.array([10, 10, 34, 34])
    )
    fresh = {t: low for t, _, low, _ in video_predictor.propagate_in_video(fresh_state)}
    assert corrected.keys() == fresh.keys()
    for t in fresh:
        np.testing.assert_allclose(corrected[t], fresh[t], atol=1e-5)
