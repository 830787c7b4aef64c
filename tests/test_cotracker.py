import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.models.cotracker import (
    COTRACKER_TEST,
    CoTracker,
    PointTracker,
    bilinear_sample,
)


def _moving_pattern_video(t=6, h=64, w=64, dx=2.0, dy=1.0, seed=0):
    """A textured 16x16 patch translating at (dx, dy) px/frame."""
    rng = np.random.default_rng(seed)
    patch = rng.random((16, 16, 3)).astype(np.float32)
    video = rng.random((t, h, w, 3)).astype(np.float32) * 0.05
    centers = []
    for f in range(t):
        x0 = int(10 + dx * f)
        y0 = int(20 + dy * f)
        video[f, y0 : y0 + 16, x0 : x0 + 16] = patch
        centers.append([x0 + 8, y0 + 8])
    return video, np.asarray(centers, np.float32)


def test_bilinear_sample_exact():
    fmap = jnp.arange(12.0).reshape(3, 4, 1)
    v = bilinear_sample(fmap, jnp.array([[1.0, 1.0], [1.5, 0.5], [-5.0, 0.0]]))
    assert float(v[0, 0]) == 5.0
    assert abs(float(v[1, 0]) - 3.5) < 1e-5  # mean of corners 1, 2, 5, 6
    assert float(v[2, 0]) == 0.0  # out of bounds -> 0


def test_correlation_tracker_follows_translation():
    video, centers = _moving_pattern_video()
    tracker = PointTracker(COTRACKER_TEST, mode="correlation")
    queries = centers[0:1]  # track the patch centre from frame 0
    tracks, vis = tracker.track(video, queries, query_frame=0)
    assert tracks.shape == (6, 1, 2)
    err = np.linalg.norm(tracks[:, 0] - centers, axis=-1)
    assert err.max() < 1.0, f"track error {err}"  # ZNCC subpixel matching
    assert vis[:, 0].all()


def test_correlation_tracker_backward():
    video, centers = _moving_pattern_video()
    tracker = PointTracker(COTRACKER_TEST, mode="correlation")
    tracks, vis = tracker.track(video, centers[3:4], query_frame=3)
    err = np.linalg.norm(tracks[:, 0] - centers, axis=-1)
    assert err.max() < 1.5, f"bidirectional track error {err}"


def test_learned_tracker_shapes_and_pinned_query():
    video, centers = _moving_pattern_video(t=4)
    model = CoTracker(COTRACKER_TEST)
    q = jnp.asarray(centers[:2])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(video), q)["params"]
    tracks, vis = model.apply({"params": params}, jnp.asarray(video), q, 0)
    assert tracks.shape == (4, 2, 2) and vis.shape == (4, 2)
    # Query frame stays pinned to the query coordinates.
    np.testing.assert_allclose(np.asarray(tracks[0]), centers[:2], atol=1e-4)
    assert np.asarray(vis[0]).min() == 1.0
    assert np.isfinite(np.asarray(tracks)).all()


def test_patch_track_step_matches_gather_oracle():
    """The separable (two-matmul) ZNCC patch extraction must equal the
    direct per-tap gather formulation, including edge/out-of-bounds points
    (out-of-range taps contribute zero in both)."""
    import jax
    from functools import partial
    from freepose_tpu.models.cotracker import bilinear_sample, patch_track_step

    def oracle(img_prev, img_next, coords, p=4, s=8):
        d = 2 * s + 1
        pr = jnp.arange(-p, p + 1, dtype=jnp.float32)
        py, px = jnp.meshgrid(pr, pr, indexing="ij")
        patch_offs = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)
        sr = jnp.arange(-s, s + 1, dtype=jnp.float32)
        sy, sx = jnp.meshgrid(sr, sr, indexing="ij")
        search_offs = jnp.stack([sx.reshape(-1), sy.reshape(-1)], axis=-1)
        ref = bilinear_sample(img_prev, coords[:, None, :] + patch_offs[None])
        ref = ref.reshape(ref.shape[0], -1)
        ref = ref - ref.mean(axis=-1, keepdims=True)
        ref = ref / jnp.linalg.norm(ref, axis=-1, keepdims=True).clip(1e-6)
        grid = coords[:, None, None, :] + search_offs[None, :, None, :] + patch_offs[None, None, :, :]
        cand = jax.vmap(lambda g: bilinear_sample(img_next, g))(grid)
        cand = cand.reshape(cand.shape[0], cand.shape[1], -1)
        cand = cand - cand.mean(axis=-1, keepdims=True)
        cand = cand / jnp.linalg.norm(cand, axis=-1, keepdims=True).clip(1e-6)
        corr = jnp.einsum("ndp,np->nd", cand, ref)
        best = jnp.argmax(corr, axis=-1)
        nidx = jnp.arange(coords.shape[0])
        return search_offs[best], corr[nidx, best]

    rng = np.random.default_rng(3)
    img0 = jnp.asarray(rng.random((60, 72, 3)).astype(np.float32))
    img1 = jnp.asarray(rng.random((60, 72, 3)).astype(np.float32))
    coords = jnp.asarray(np.array(
        [[30.3, 20.7], [3.2, 2.1], [69.9, 57.5], [-2.0, 10.0], [80.0, 65.0]],
        np.float32,
    ))
    offs_ref, score_ref = oracle(img0, img1, coords)
    new, score = patch_track_step(img0, img1, coords)
    np.testing.assert_allclose(np.asarray(score), np.asarray(score_ref), atol=1e-4)
    # integer part of the displacement must agree (subpixel tested via scores)
    np.testing.assert_allclose(
        np.round(np.asarray(new - coords)), np.asarray(offs_ref), atol=0.51
    )
