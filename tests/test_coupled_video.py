"""Device-coupled SAM2 -> refine proposal path:

1. pipeline.proposals.proposals_from_masks_video (fused mask -> bbox ->
   crop_resize_pad over a frame batch) must equal the host-path
   extract_proposals per frame, including the empty-mask fallback.
2. Sam2VideoPredictor.propagate_batched must yield DEVICE masks identical to
   the fetched propagate_in_video(binarize=True) stream, plus the batch's
   uploaded frames."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.pipeline.proposals import extract_proposals, proposals_from_masks_video


def test_proposals_from_masks_matches_host_path():
    rng = np.random.default_rng(0)
    kf, h, w = 4, 96, 128
    frames = rng.integers(0, 255, size=(kf, h, w, 3), dtype=np.uint8)
    masks = np.zeros((kf, h, w), bool)
    masks[0, 10:40, 20:70] = True
    masks[1, 50:90, 5:60] = True
    masks[2, 30:35, 100:110] = True
    # frame 3: EMPTY mask -> centred half-frame fallback box
    crops, mcrops, bboxes = proposals_from_masks_video(
        jnp.asarray(frames), jnp.asarray(masks), target_size=56, bbox_extend=0.2
    )
    assert crops.shape == (kf, 3, 56, 56) and mcrops.shape == (kf, 56, 56)

    from freepose_tpu.geometry.boxes import mask_to_bbox

    for i in range(3):
        bb = np.asarray(mask_to_bbox(jnp.asarray(masks[i]))).astype(np.float32)
        np.testing.assert_allclose(np.asarray(bboxes[i]), bb)
        host = extract_proposals(
            jnp.asarray(frames[i]), jnp.asarray(masks[i : i + 1]),
            jnp.asarray(bb[None]), target_size=56, bbox_extend=0.2,
        )
        np.testing.assert_allclose(
            np.asarray(crops[i]), np.asarray(host.proposals[0]), atol=1e-6
        )
        assert np.array_equal(np.asarray(mcrops[i]), np.asarray(host.masks[0]))
    np.testing.assert_allclose(
        np.asarray(bboxes[3]), [w * 0.25, h * 0.25, w * 0.75, h * 0.75]
    )


@pytest.mark.slow
def test_propagate_batched_matches_fetched_stream():
    from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor
    from freepose_tpu.models.sam2.video import Sam2VideoModel, init_object_state
    from tests.test_sam2_video import OUR_CFG as cfg

    model = Sam2VideoModel(cfg)
    state0 = init_object_state(cfg)

    def full(mdl, pixels):
        pyramid, pos = mdl.embed_frame(pixels)
        st, _ = mdl.track_step(
            state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
            points=jnp.zeros((1, 1, cfg.max_point_prompts, 2)),
            labels=jnp.full((1, 1, cfg.max_point_prompts), -10, jnp.int32),
            is_init=True,
        )
        return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
        method=full,
    )["params"]
    pred = Sam2VideoPredictor(cfg, params, max_objects=1)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(7, 48, 56, 3), dtype=np.uint8)

    def fresh_state():
        st = pred.init_state(frames)
        return pred.add_new_points_or_box(
            st, 0, obj_id=0, box=np.array([5, 5, 40, 40], np.float32)
        )

    ref = {t: (low.copy(), high.copy()) for t, _, low, high in
           pred.propagate_in_video(fresh_state(), binarize=True, chunk=3)}

    seen = []
    for ts, lows, highs, frames_b in pred.propagate_batched(fresh_state(), chunk=3):
        assert frames_b.shape[0] == len(ts)
        for z, t in enumerate(ts):
            np.testing.assert_array_equal(np.asarray(frames_b[z]), frames[t])
            rl, rh = ref[t]
            np.testing.assert_array_equal(np.asarray(lows[z]), rl)
            np.testing.assert_array_equal(np.asarray(highs[z]), rh)
            seen.append(t)
    assert seen == list(range(7))


@pytest.mark.slow
def test_device_resident_frames_match_host_frames():
    """init_state with a DEVICE video array (pre-staged HBM frames) must
    propagate identically to the host-np path — chunked, singleton, and
    reverse batches all slice/flip/pad on device."""
    from freepose_tpu.models.sam2.predictor import Sam2VideoPredictor
    from freepose_tpu.models.sam2.video import Sam2VideoModel, init_object_state
    from tests.test_sam2_video import OUR_CFG as cfg

    model = Sam2VideoModel(cfg)
    state0 = init_object_state(cfg)

    def full(mdl, pixels):
        pyramid, pos = mdl.embed_frame(pixels)
        st, _ = mdl.track_step(
            state0, pyramid, pyramid[2], pos[2], jnp.int32(0), jnp.int32(3),
            points=jnp.zeros((1, 1, cfg.max_point_prompts, 2)),
            labels=jnp.full((1, 1, cfg.max_point_prompts), -10, jnp.int32),
            is_init=True,
        )
        return mdl.track_step(st, pyramid, pyramid[2], pos[2], jnp.int32(1), jnp.int32(3))

    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, cfg.image_size, cfg.image_size)),
        method=full,
    )["params"]
    pred = Sam2VideoPredictor(cfg, params, max_objects=1)
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(7, 48, 56, 3), dtype=np.uint8)
    frames_dev = jax.device_put(frames)

    for reverse, start in ((False, 0), (True, 4)):
        def run(src):
            st = pred.init_state(src)
            st = pred.add_new_points_or_box(
                st, start, obj_id=0, box=np.array([5, 5, 40, 40], np.float32)
            )
            return [
                (t, np.asarray(low), np.asarray(high))
                for t, _, low, high in pred.propagate_in_video(
                    st, binarize=True, chunk=3, reverse=reverse
                )
            ]

        ref = run(frames)
        got = run(frames_dev)
        assert [r[0] for r in ref] == [g[0] for g in got]
        for (t, rl, rh), (_, gl, gh) in zip(ref, got):
            np.testing.assert_array_equal(gl, rl, err_msg=f"reverse={reverse} t={t}")
            np.testing.assert_array_equal(gh, rh, err_msg=f"reverse={reverse} t={t}")
