"""Tracking refiner integration on a synthetic textured mesh video."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rot

from freepose_tpu.io.mesh import TriMesh, pad_mesh
from freepose_tpu.models.cotracker import COTRACKER_TEST, PointTracker
from freepose_tpu.models.dinov2 import DinoFeatureExtractor, DinoV2Config
from freepose_tpu.ops.rasterizer import RasterSettings, rasterize
from freepose_tpu.pipeline.tracking_refiner import GRID, TrackingRefiner, quantile_threshold

RES = 518
K = jnp.array([[500.0, 0, 160], [0, 500.0, 120], [0, 0, 1]])
CFG = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)


def _mesh(seed=0):
    rng = np.random.default_rng(seed)
    n_lat, n_lon = 12, 16
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.25 * np.sin(3 * ph) * np.sin(2 * th)
            verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    v = np.asarray(verts, np.float32) * 0.1
    return TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v), 3)).astype(np.float32))


def _gt_poses(t=4):
    poses = []
    for i in range(t):
        p = np.eye(4, dtype=np.float32)
        p[:3, :3] = Rot.from_rotvec([0, 0.08 * i, 0.02 * i]).as_matrix()
        p[:3, 3] = [0.02 * i, 0.0, 0.8]
        poses.append(p)
    return np.stack(poses)


def _render_video(mesh, poses, res_hw=(240, 320)):
    """Render the mesh into small frames with camera K."""
    v, c, f, valid = pad_mesh(mesh, 512, 1024)
    setts = RasterSettings(resolution=320, tile=32, max_faces_per_tile=256)
    rgb, depth = rasterize(jnp.asarray(v), jnp.asarray(c), jnp.asarray(f), jnp.asarray(valid),
                           jnp.asarray(poses), K, setts)
    frames = np.asarray(rgb)[:, : res_hw[0], : res_hw[1]]
    return frames


@pytest.fixture(scope="module")
def refiner():
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    tracker = PointTracker(COTRACKER_TEST, mode="correlation")
    return TrackingRefiner(
        feature_fn=feature_fn, tracker=tracker, max_vertices=512, max_faces=1024,
        n_surface_samples=2000,
        settings=RasterSettings(resolution=RES, tile=37, max_faces_per_tile=128),
    )


def test_pose_confidence_correct_beats_wrong(refiner):
    mesh = _mesh()
    poses = _gt_poses(1)
    frames = _render_video(mesh, poses)
    photo = jnp.asarray(frames[0].transpose(2, 0, 1))
    conf_good = refiner.pose_confidence(mesh, photo, K, jnp.asarray(poses[0]))
    bad = poses[0].copy()
    bad[:3, :3] = Rot.from_rotvec([0, 1.6, 0]).as_matrix() @ bad[:3, :3]
    conf_bad = refiner.pose_confidence(mesh, photo, K, jnp.asarray(bad))
    assert conf_good.shape == (GRID, GRID)
    assert conf_good.sum() > conf_bad.sum()


def test_correspondences_project_correctly(refiner):
    mesh = _mesh()
    pose = _gt_poses(1)[0]
    frames = _render_video(mesh, pose[None])
    photo = jnp.asarray(frames[0].transpose(2, 0, 1))
    query, surface, valid = refiner.compute_2d3d_correspondences(mesh, photo, K, jnp.asarray(pose))
    assert valid.sum() >= 4
    # The chosen surface points, projected with the GT pose, must land near
    # their query pixels (within a patch diagonal of slack at image scale).
    cam = surface[valid] @ pose[:3, :3].T + pose[:3, 3]
    uv = cam @ np.asarray(K).T
    uv = uv[:, :2] / uv[:, 2:]
    err = np.linalg.norm(uv - query[valid], axis=-1)
    assert np.median(err) < 12.0, f"median reprojection gap {np.median(err)}"


def test_full_refine_loop_recovers_pose(refiner):
    mesh = _mesh()
    poses = _gt_poses(4)
    frames = _render_video(mesh, poses)
    photo0 = jnp.asarray(frames[0].transpose(2, 0, 1))
    query, surface, valid = refiner.compute_2d3d_correspondences(mesh, photo0, K, jnp.asarray(poses[0]))
    tracks, vis = refiner.track_frames(frames, query[valid], query_frame=0)
    # PnP on the last frame's tracked points.
    pose_est = refiner.compute_pnp(tracks[-1], surface[valid], vis[-1], K)
    rot_err = np.rad2deg(np.linalg.norm(Rot.from_matrix(pose_est[:3, :3] @ poses[-1][:3, :3].T).as_rotvec()))
    t_err = np.linalg.norm(pose_est[:3, 3] - poses[-1][:3, 3])
    # Patch-centre quantization (queries are 37×37 patch centres, a design
    # inherited from the reference) bounds achievable accuracy here.
    assert rot_err < 15.0, f"rotation error {rot_err} deg"
    assert t_err < 0.06, f"translation error {t_err} m"


def test_quantile_threshold():
    conf = jnp.asarray(np.concatenate([np.zeros(80), np.linspace(0.1, 1.0, 20)]))
    thr = float(quantile_threshold(conf, 0.2))
    # Top 20% of the 20 positives = 4 values: threshold near 0.8.
    assert 0.7 < thr < 0.9


def test_get_query_frames_suppression():
    inliers = np.array([1, 9, 8, 1, 1, 1, 10, 1, 1, 7, 1, 1])
    frames = TrackingRefiner.get_query_frames(inliers, n_reference=3)
    assert len(frames) == 3
    assert 6 in frames and 1 in frames


def test_pose_confidence_batch_fused_matches_plain(refiner):
    """TrackingRefiner(extractor=...) fuses the whole confidence batch into
    one program; must equal the eager per-op path (and handle uint8)."""
    import dataclasses as dc

    fe = DinoFeatureExtractor(CFG)
    fused = dc.replace(refiner, feature_fn=lambda im: fe(im, layer=2, feature_type="patch"),
                       extractor=fe, feature_layer=2)
    plain = dc.replace(fused, extractor=None)
    mesh = _mesh()
    poses = _gt_poses(2)
    frames = _render_video(mesh, poses)
    photos = jnp.asarray(frames.transpose(0, 3, 1, 2))
    a = plain.pose_confidence_batch(mesh, photos, K, jnp.asarray(poses))
    b = fused.pose_confidence_batch(mesh, photos, K, jnp.asarray(poses))
    np.testing.assert_allclose(a, b, atol=2e-5)
    u8 = np.clip(np.asarray(photos) * 255, 0, 255).astype(np.uint8)
    c = fused.pose_confidence_batch(mesh, jnp.asarray(u8), K, jnp.asarray(poses))
    assert np.isfinite(c).all() and c.shape == a.shape


def test_pose_confidence_batch_matches_serial(refiner):
    """Batched confidence (one crop/render/feature batch) must equal the
    per-frame path."""
    mesh = _mesh()
    poses = _gt_poses(3)
    frames = _render_video(mesh, poses)
    photos = jnp.asarray(frames.transpose(0, 3, 1, 2))
    batch = refiner.pose_confidence_batch(mesh, photos, K, jnp.asarray(poses))
    assert batch.shape == (3, GRID, GRID)
    for i in range(3):
        solo = refiner.pose_confidence(mesh, photos[i], K, jnp.asarray(poses[i]))
        np.testing.assert_allclose(batch[i], solo, atol=2e-5)


def test_smooth_track_pipelined_matches_exact(refiner):
    """smooth_track(pipelined=True): static-cap intervals + masked EPnP +
    device-chained ZNCC must reproduce the dynamic-subset path when every
    frame has <= cap valid correspondences."""
    from scripts.smooth_poses_video import smooth_track

    mesh = _mesh()
    poses = _gt_poses(t=8)
    frames = (_render_video(mesh, poses) * 255).astype(np.uint8)
    k = np.asarray(K)
    exact, inl_e = smooth_track(
        refiner, mesh, frames, jnp.asarray(k), poses, interval=4, pipelined=False
    )
    pipe, inl_p = smooth_track(
        refiner, mesh, frames, jnp.asarray(k), poses, interval=4, pipelined=True,
        cap=2000,
    )
    np.testing.assert_allclose(inl_e, inl_p)
    np.testing.assert_allclose(pipe, exact, rtol=1e-3, atol=1e-4)


def test_smooth_track_adaptive_cap_matches_static(refiner):
    """cap_buckets (adaptive per-interval correspondence cap, VERDICT r4
    #8): sparse intervals run bucket-sized ZNCC+EPnP programs, dense ones
    the full cap — and the result EXACTLY equals the static-cap path. The
    trajectory's distant tail (z 0.8 -> 3.0) forces BOTH bucket directions
    within one pass."""
    from scripts.smooth_poses_video import smooth_track

    # Thin rod: the square correspondence crop is mostly background when the
    # rod is SIDE-ON (sparse valid grid) and mostly foreground END-ON
    # (dense) — the two interval starts land one in each regime.
    rng = np.random.default_rng(3)
    nt, nl, r, length = 10, 12, 0.015, 0.4
    verts, faces = [], []
    for i in range(nl + 1):
        x = -length / 2 + length * i / nl
        for j in range(nt):
            th = 2 * np.pi * j / nt
            verts.append([x, r * np.cos(th), r * np.sin(th)])
    for i in range(nl):
        for j in range(nt):
            a = i * nt + j
            b = i * nt + (j + 1) % nt
            c = (i + 1) * nt + j
            d = (i + 1) * nt + (j + 1) % nt
            faces.append([a, b, c])
            faces.append([b, d, c])
    mesh = TriMesh(np.asarray(verts, np.float32), np.asarray(faces, np.int32),
                   rng.random((len(verts), 3)).astype(np.float32))
    poses = _gt_poses(t=8)
    for t in range(4, 8):  # end-on tail
        poses[t, :3, :3] = (Rot.from_rotvec([0, np.pi / 2, 0]).as_matrix()
                            @ poses[t, :3, :3]).astype(np.float32)
    frames = (_render_video(mesh, poses) * 255).astype(np.uint8)
    k = np.asarray(K)
    static, inl_s = smooth_track(
        refiner, mesh, frames, jnp.asarray(k), poses, interval=4,
        pipelined=True, cap=2000,
    )
    # The two starts' valid counts straddle a bucket boundary placed at the
    # smaller count (deterministic renders -> deterministic counts).
    best = int(np.argmax(inl_s))
    starts = sorted({best, best + 4 if best < 4 else best - 4})
    nvs = []
    for s in starts:
        _q, _s3, valid = refiner.compute_2d3d_correspondences(
            mesh, frames[s].transpose(2, 0, 1), K, jnp.asarray(poses[s]))
        nvs.append(int(valid.sum()))
    assert min(nvs) < max(nvs), nvs  # the regimes really differ
    b_small = min(nvs)
    tel = {}
    adap, inl_a = smooth_track(
        refiner, mesh, frames, jnp.asarray(k), poses, interval=4,
        pipelined=True, cap=2000, cap_buckets=(b_small, 2000), telemetry=tel,
    )
    np.testing.assert_allclose(inl_s, inl_a)
    np.testing.assert_allclose(adap, static, rtol=1e-4, atol=1e-5)
    chosen = {c for _s, c in tel["cap_choices"]}
    assert chosen == {b_small, 2000}, (tel, nvs)  # both directions exercised


def test_smooth_track_staged_matches_host(refiner):
    """StagedVideo (device-resident bucketed frames, on-device chunk slices
    and interval gathers) must reproduce the host-array pipelined path."""
    from freepose_tpu.datasets.video import stage_frames_hbm
    from scripts.smooth_poses_video import smooth_track

    mesh = _mesh()
    poses = _gt_poses(t=8)
    frames = (_render_video(mesh, poses) * 255).astype(np.uint8)
    k = np.asarray(K)
    host, inl_h = smooth_track(
        refiner, mesh, frames, jnp.asarray(k), poses, interval=4, pipelined=True,
        cap=2000,
    )
    staged = stage_frames_hbm(frames, bucket=16)
    assert staged.frames.shape[0] == 16 and staged.n == 8
    dev, inl_d = smooth_track(
        refiner, mesh, staged, jnp.asarray(k), poses, interval=4, pipelined=True,
        cap=2000,
    )
    np.testing.assert_allclose(inl_h, inl_d)
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
    # prefix() shares the buffer and only changes the logical length
    dev2, _ = smooth_track(
        refiner, mesh, staged.prefix(6), jnp.asarray(k), poses[:6], interval=4,
        pipelined=True, cap=2000,
    )
    host2, _ = smooth_track(
        refiner, mesh, frames[:6], jnp.asarray(k), poses[:6], interval=4,
        pipelined=True, cap=2000,
    )
    np.testing.assert_allclose(dev2, host2, rtol=1e-4, atol=1e-5)


def test_streaming_inliers_matches_batch(refiner):
    """StreamingInliers (chunks dispatched as poses arrive, in feed order or
    out of order) must reproduce n_inliers_per_pose on the staged video, and
    smooth_track(inliers=...) must equal the self-scoring staged path."""
    from freepose_tpu.datasets.video import stage_frames_hbm
    from freepose_tpu.pipeline.tracking_refiner import StreamingInliers
    from scripts.smooth_poses_video import smooth_track

    mesh = _mesh()
    poses = _gt_poses(t=7)  # non-multiple of chunk: exercises the tail
    frames = (_render_video(mesh, poses) * 255).astype(np.uint8)
    staged = stage_frames_hbm(frames, bucket=8)
    ref_inl, ref_thr = refiner.n_inliers_per_pose(
        mesh, staged.frames, K, poses, chunk=4, n_valid=7, channels_last=True)
    ref_inl2, _ = refiner.n_inliers_per_pose(
        mesh, staged.frames.transpose(0, 3, 1, 2), K, poses, chunk=4, n_valid=7)
    np.testing.assert_allclose(ref_inl, ref_inl2)

    si = StreamingInliers(refiner, mesh, staged, K, chunk=4)
    si.warmup()
    for t in [2, 0, 1, 5, 3, 4, 6]:  # out-of-order feed
        si.add(t, poses[t])
    inl, thr = si.finalize()
    np.testing.assert_allclose(inl, ref_inl)
    assert thr == pytest.approx(ref_thr)

    full, _ = smooth_track(refiner, mesh, staged, K, poses, interval=4, cap=2000)
    pre, _ = smooth_track(refiner, mesh, staged, K, poses, interval=4, cap=2000,
                          inliers=inl)
    np.testing.assert_allclose(pre, full, rtol=1e-5, atol=1e-6)


def test_smooth_track_sharded_matches_single(refiner):
    """device_mesh smooth pass (sharded confidence chunks + one batched
    sharded interval program) == the single-device staged pipelined path."""
    import dataclasses as dc

    from freepose_tpu.datasets.video import stage_frames_hbm
    from freepose_tpu.parallel.mesh import make_mesh
    from scripts.smooth_poses_video import smooth_track

    fe = DinoFeatureExtractor(CFG)
    refiner = dc.replace(
        refiner, feature_fn=lambda im: fe(im, layer=2, feature_type="patch"),
        extractor=fe, feature_layer=2)
    mesh = _mesh()
    poses = _gt_poses(t=8)
    frames = (_render_video(mesh, poses) * 255).astype(np.uint8)
    staged = stage_frames_hbm(frames, bucket=16)
    single, inl_s = smooth_track(
        refiner, mesh, staged, K, poses, interval=4, cap=2000)
    dmesh = make_mesh(data=4, model=2)
    shard, inl_d = smooth_track(
        refiner, mesh, staged, K, poses, interval=4, cap=2000,
        device_mesh=dmesh, mesh_axis="data")
    np.testing.assert_allclose(inl_s, inl_d)
    np.testing.assert_allclose(shard, single, rtol=1e-4, atol=1e-5)
    # Single-device BATCHED intervals (one program chain + one fetch set —
    # the production smooth layout) must also match the pipelined path.
    batched, inl_b = smooth_track(
        refiner, mesh, staged, K, poses, interval=4, cap=2000,
        batched_intervals=True)
    np.testing.assert_allclose(inl_s, inl_b)
    np.testing.assert_allclose(batched, single, rtol=1e-4, atol=1e-5)


def test_streaming_inliers_guards(refiner):
    from freepose_tpu.datasets.video import stage_frames_hbm
    from freepose_tpu.pipeline.tracking_refiner import StreamingInliers

    mesh = _mesh()
    poses = _gt_poses(t=3)
    frames = (_render_video(mesh, poses) * 255).astype(np.uint8)
    staged = stage_frames_hbm(frames, bucket=4)
    with pytest.raises(TypeError):
        StreamingInliers(refiner, mesh, frames, K)
    with pytest.raises(ValueError):
        StreamingInliers(refiner, mesh, staged, K, chunk=3)
    si = StreamingInliers(refiner, mesh, staged, K, chunk=4)
    si.add(0, poses[0])
    with pytest.raises(ValueError, match="missing"):
        si.finalize()
    # device frames without n_valid must be rejected (ADVICE r3)
    with pytest.raises(ValueError, match="n_valid"):
        refiner.n_inliers_per_pose(mesh, staged.frames.transpose(0, 3, 1, 2), K, poses)
