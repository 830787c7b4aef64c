"""Fine-view cache: exact-equivalence, host neighbourhood parity, eviction."""
import jax.numpy as jnp
import numpy as np
import pytest

from freepose_tpu.geometry.rotation import geodesic_distance, template_poses
from freepose_tpu.io.mesh import TriMesh
from freepose_tpu.models.dinov2 import DinoFeatureExtractor, DinoV2Config
from freepose_tpu.ops.rasterizer import RasterSettings
from freepose_tpu.pipeline.fine_cache import (
    FineViewCache, bucket_size, select_neighborhood_host,
)
from freepose_tpu.pipeline.online_pose_estimator import (
    OnlinePoseEstimator, select_neighborhood,
)
from freepose_tpu.pipeline.renderer import TemplateRenderer
from freepose_tpu.pipeline.template_bank import TemplateBank

RES = 84
CFG = DinoV2Config(hidden_size=32, num_layers=2, num_heads=2, patch_size=14, image_size=56)


def _mesh():
    rng = np.random.default_rng(0)
    n_lat, n_lon = 10, 14
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 1.0 + 0.2 * np.sin(3 * ph) * np.sin(2 * th)
            verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    v = np.asarray(verts, np.float32)
    return TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v), 3)).astype(np.float32))


def test_select_neighborhood_host_matches_device():
    poses = template_poses(2000)
    rots = np.asarray(poses[:, :3, :3])
    rng = np.random.default_rng(3)
    for i in rng.integers(0, 2000, size=8):
        prev = np.asarray(poses[int(i)])
        sel_d, idx_d, mask_d = select_neighborhood(poses, jnp.asarray(prev), 15.0, 32)
        idx_h, mask_h = select_neighborhood_host(rots, prev[:3, :3], 15.0, 32)
        np.testing.assert_array_equal(np.asarray(idx_d), idx_h)
        np.testing.assert_array_equal(np.asarray(mask_d), mask_h)


def test_bucket_size():
    assert bucket_size(1, 32) == 4
    assert bucket_size(4, 32) == 4
    assert bucket_size(5, 32) == 8
    assert bucket_size(11, 32) == 16
    assert bucket_size(17, 32) == 32
    assert bucket_size(32, 32) == 32
    # n_neighbors below the bucket ladder still resolves
    assert bucket_size(3, 4) == 4


def test_eviction_protects_current_neighborhood():
    cache = FineViewCache(capacity=4)
    cache.ensure_buffers(4, 8, 12, jnp.float32)
    cache.assign_slots([0, 1, 2, 3], protect=np.asarray([0, 1, 2, 3]))
    # Cache full; new selection shares 3 entries -> victim must be the one
    # NOT in the new neighbourhood (grid index 0).
    sel = np.asarray([1, 2, 3, 9])
    cache.touch(sel)
    slots = cache.assign_slots(cache.missing(sel), protect=sel)
    assert 9 in cache.slot_of and 0 not in cache.slot_of
    assert set(cache.slot_of.values()) == {0, 1, 2, 3}
    assert slots.shape == (1,)


@pytest.fixture(scope="module")
def setup():
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    renderer = TemplateRenderer(
        n_poses=16, resolution=RES, max_vertices=256, max_faces=512,
        settings=RasterSettings(resolution=RES, tile=28, max_faces_per_tile=128),
    )
    bank = TemplateBank(feature_fn, renderer, cache_size=2)
    mk = lambda cap: OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, fine_cache_capacity=cap,
    )
    return renderer, bank, mk


def test_cached_refine_matches_uncached_over_track(setup):
    """Walk a wandering trajectory (hits, misses, evictions) — the cached
    path must reproduce the uncached refine exactly."""
    renderer, bank, mk = setup
    est_ref = mk(0)
    est_c = mk(12)  # small capacity: forces evictions along the walk
    mesh = _mesh()
    pack = bank.get("blob-fc", mesh)

    fp = np.asarray(est_ref.fine_poses)
    rng = np.random.default_rng(7)
    # Jumpy trajectory across the grid: revisits + far jumps.
    traj = [5, 6, 5, 120, 121, 5, 60, 61, 120, 5]
    for t, gi in enumerate(traj):
        prev = jnp.asarray(fp[gi])
        gt = jnp.asarray(fp[(gi + 1) % len(fp)])
        rgb, depth = renderer.render_from_poses(mesh, gt[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        args = dict(
            k=renderer.k, bbox=boxes[0].astype(jnp.float32), est_scale=0.25,
            neighborhood_deg=40.0, mask_scores=(t % 2 == 1),
        )
        o_ref = est_ref.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
        o_c = est_c.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
        assert int(o_ref.view_indices) == int(o_c.view_indices)
        np.testing.assert_allclose(
            np.asarray(o_c.tcos), np.asarray(o_ref.tcos), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(o_c.scores), np.asarray(o_ref.scores), atol=1e-5
        )
    cache = est_c._fine_caches["blob-fc"]
    assert len(cache.slot_of) <= 12
    assert cache.feats.shape[0] == 13  # capacity + scratch slot


def test_cached_refine_hit_path_runs_single_query(setup):
    """Second visit to an identical neighbourhood takes the all-hit path."""
    renderer, bank, mk = setup
    est = mk(12)
    mesh = _mesh()
    pack = bank.get("blob-fc2", mesh)
    fp = np.asarray(est.fine_poses)
    prev = jnp.asarray(fp[33])
    rgb, depth = renderer.render_from_poses(mesh, jnp.asarray(fp[34])[None])
    props, masks, boxes = renderer.generate_proposals(rgb, depth)
    args = dict(
        k=renderer.k, bbox=boxes[0].astype(jnp.float32), est_scale=0.25,
        neighborhood_deg=40.0,
    )
    o1 = est.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
    n_cached = len(est._fine_caches["blob-fc2"].slot_of)
    o2 = est.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
    # No new slots on the second, all-hit call; result identical.
    assert len(est._fine_caches["blob-fc2"].slot_of) == n_cached
    assert int(o1.view_indices) == int(o2.view_indices)
    np.testing.assert_allclose(np.asarray(o1.tcos), np.asarray(o2.tcos), atol=1e-6)


def test_capacity_validation():
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    renderer = TemplateRenderer(
        n_poses=4, resolution=RES, max_vertices=64, max_faces=128,
        settings=RasterSettings(resolution=RES, tile=28, max_faces_per_tile=64),
    )
    bank = TemplateBank(feature_fn, renderer)
    with pytest.raises(ValueError):
        OnlinePoseEstimator(
            feature_fn, bank, renderer, n_fine_poses=50, n_neighbors=32,
            extractor=fe, fine_cache_capacity=8,
        )
    with pytest.raises(ValueError):
        OnlinePoseEstimator(
            feature_fn, bank, renderer, n_fine_poses=50, fine_cache_capacity=8,
        )


def test_predictive_prefetch_reduces_miss_frames(setup):
    """On a steadily rotating trajectory, prefetch (bucket round-up around
    the extrapolated pose) must convert most miss frames into all-hit
    frames, with identical results to the no-prefetch cache."""
    renderer, bank, mk = setup
    mesh = _mesh()
    pack = bank.get("blob-pf", mesh)

    def axis_angle(deg):
        a = np.radians(deg)
        return np.array([
            [np.cos(a), -np.sin(a), 0.0],
            [np.sin(a), np.cos(a), 0.0],
            [0.0, 0.0, 1.0],
        ], np.float64)

    def run(quota):
        est = mk(48)
        est.prefetch_quota = quota
        fp = np.asarray(est.fine_poses)
        pose = fp[50].copy()
        rgb, depth = renderer.render_from_poses(mesh, jnp.asarray(pose)[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        miss_frames = 0
        results = []
        for t in range(10):
            cache = est._fine_caches.get("blob-pf-k")
            before = len(cache.slot_of) + len(cache.free) * 0 if cache else 0
            n_before = len(cache.slot_of) if cache else 0
            out = est.refine_cached(
                props[0], masks[0], mesh, renderer.k,
                boxes[0].astype(jnp.float32), 0.25, jnp.asarray(pose),
                neighborhood_deg=60.0, cache_key="blob-pf-k",
            )
            cache = est._fine_caches["blob-pf-k"]
            if t > 0 and len(cache.slot_of) != n_before:
                miss_frames += 1
            results.append((int(out.view_indices), np.asarray(out.tcos)))
            pose = pose.copy()
            pose[:3, :3] = axis_angle(6.0) @ pose[:3, :3]
        return miss_frames, results

    miss_pf, res_pf = run(quota=4)
    miss_np, res_np = run(quota=0)
    # Identical estimates either way (prefetch never changes selection).
    for (i1, t1), (i2, t2) in zip(res_pf, res_np):
        assert i1 == i2
        np.testing.assert_allclose(t1, t2, atol=1e-5)
    assert miss_pf <= miss_np


def test_cached_refine_sharded_composes(setup):
    """fine cache + shard_mesh: miss-batch cold work fans over the 8-device
    mesh (buffers replicated); the track must match the single-device cached
    path, including evictions and the all-hit frames."""
    import jax
    from freepose_tpu.parallel.mesh import make_mesh

    renderer, bank, mk = setup
    fe = DinoFeatureExtractor(CFG)
    feature_fn = lambda imgs: fe(imgs, layer=2, feature_type="patch")
    dev_mesh = make_mesh(data=1, model=len(jax.devices()))
    est_c = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, fine_cache_capacity=12,
    )
    est_s = OnlinePoseEstimator(
        feature_fn, bank, renderer, n_coarse_poses=16, n_fine_poses=200,
        n_neighbors=8, extractor=fe, feature_layer=2, fine_cache_capacity=12,
        shard_mesh=dev_mesh,
    )
    mesh = _mesh()
    pack = bank.get("blob-fcs", mesh)
    fp = np.asarray(est_c.fine_poses)
    traj = [5, 6, 5, 120, 121, 5, 60]
    for t, gi in enumerate(traj):
        prev = jnp.asarray(fp[gi])
        gt = jnp.asarray(fp[(gi + 1) % len(fp)])
        rgb, depth = renderer.render_from_poses(mesh, gt[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        args = dict(
            k=renderer.k, bbox=boxes[0].astype(jnp.float32), est_scale=0.25,
            neighborhood_deg=40.0, mask_scores=(t % 2 == 1),
        )
        o_c = est_c.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
        o_s = est_s.estimate(props[0], masks[0], pack, mesh, prev_pose=prev, **args)
        assert int(o_c.view_indices) == int(o_s.view_indices), f"frame {t}"
        np.testing.assert_allclose(np.asarray(o_s.tcos), np.asarray(o_c.tcos), atol=1e-5)
        np.testing.assert_allclose(np.asarray(o_s.scores), np.asarray(o_c.scores), atol=1e-5)


def test_chain_matches_serial_closed_loop(setup):
    """Pipelined chain (device-side selection, speculative hit steps, lagged
    finalize, miss replay) == the serial closed-loop refine_cached sequence,
    including LRU evictions mid-chain."""
    renderer, bank, mk = setup
    mesh = _mesh()
    est_a = mk(12)
    est_b = mk(12)
    fp = np.asarray(est_a.fine_poses)

    # GT trajectory wandering across three grid regions: hits, misses and
    # evictions (capacity 12 < 3 regions x 8 neighbors) all occur mid-chain.
    traj = [5, 6, 7, 60, 61, 5, 120, 121, 6, 7]
    frames = []
    for gi in traj:
        gt = jnp.asarray(fp[gi])
        rgb, depth = renderer.render_from_poses(mesh, gt[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        frames.append((props[0], masks[0], renderer.k, boxes[0].astype(jnp.float32), 0.25))
    prev0 = jnp.asarray(fp[5])

    serial = []
    prev = prev0
    for f in frames:
        o = est_a.refine_cached(f[0], f[1], mesh, f[2], f[3], f[4], prev, 40.0, cache_key="ck")
        tc = np.asarray(o.tcos)[0]
        serial.append((tc, float(np.asarray(o.scores)[0])))
        prev = jnp.asarray(tc)

    from freepose_tpu.pipeline.online_pose_estimator import CachedRefineChain

    chain = CachedRefineChain(est_b, mesh, "ck", neighborhood_deg=40.0, lag=2)
    for i, f in enumerate(frames):
        chain.submit(*f, prev_pose=prev0 if i == 0 else None)
    got = chain.finalize_all()

    assert len(got) == len(serial) == len(traj)
    for (tr, sr), (tg, sg) in zip(serial, got):
        np.testing.assert_allclose(tg, tr, atol=1e-5)
        assert abs(sg - sr) < 1e-5
    # Both the speculative-hit and the replay path were exercised.
    assert chain.n_spec_hits > 0
    assert chain.n_replayed > 0
    # Host and device slot maps agree after the chain.
    cache = est_b._fine_caches["ck"]
    table = np.asarray(cache.slot_table)[:-1]
    assert {gi: s for gi, s in enumerate(table) if s >= 0} == cache.slot_of
    # LRU state equals the serial run's (same eviction order).
    cache_a = est_a._fine_caches["ck"]
    assert cache.slot_of == cache_a.slot_of
    assert list(cache.lru) == list(cache_a.lru)


def test_auto_chain_matches_serial_closed_loop(setup):
    """Fully-autonomous device-cache chain (fine_cache.cached_refine_auto_step:
    on-device slot table, LRU eviction, self-served misses) == the serial
    closed-loop refine_cached sequence, including a trajectory jump that
    overflows the stream miss bucket (full re-dispatch path)."""
    renderer, bank, mk = setup
    mesh = _mesh()
    est_a = mk(12)
    est_b = mk(12)
    fp = np.asarray(est_a.fine_poses)

    traj = [5, 6, 7, 60, 61, 5, 120, 121, 6, 7]
    frames = []
    for gi in traj:
        gt = jnp.asarray(fp[gi])
        rgb, depth = renderer.render_from_poses(mesh, gt[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        frames.append((props[0], masks[0], renderer.k, boxes[0].astype(jnp.float32), 0.25))
    prev0 = jnp.asarray(fp[5])

    serial = []
    prev = prev0
    for f in frames:
        o = est_a.refine_cached(f[0], f[1], mesh, f[2], f[3], f[4], prev, 40.0, cache_key="ck")
        tc = np.asarray(o.tcos)[0]
        serial.append((tc, float(np.asarray(o.scores)[0])))
        prev = jnp.asarray(tc)

    from freepose_tpu.pipeline.online_pose_estimator import AutoRefineChain

    chain = AutoRefineChain(
        est_b, mesh, "ck", neighborhood_deg=40.0, lag=2, miss_bucket=2
    )
    for i, f in enumerate(frames):
        chain.submit(*f, prev_pose=prev0 if i == 0 else None)
    got = chain.finalize_all()

    assert len(got) == len(serial) == len(traj)
    for (tr, sr), (tg, sg) in zip(serial, got):
        np.testing.assert_allclose(tg, tr, atol=1e-5)
        assert abs(sg - sr) < 1e-5
    # The jump path (more misses than the stream bucket) was exercised.
    assert chain.n_full_redispatch > 0
    # Device cache invariants: occupied slots and the slot table agree.
    st = chain.state
    table = np.asarray(st.slot_table)
    grid_of = np.asarray(st.grid_of)
    n_fine = len(table) - 1
    cap = len(grid_of) - 1
    occupied = [s for s in range(cap) if grid_of[s] < n_fine]
    assert len(occupied) <= 12
    for s in occupied:
        assert table[grid_of[s]] == s
    for gi in range(n_fine):
        if table[gi] >= 0:
            assert grid_of[table[gi]] == gi


def test_auto_chain_adaptive_bucket_matches_serial(setup):
    """adaptive_bucket=True: the stream miss bucket escalates under fast
    motion (overflow or near-capacity misses) and de-escalates when the
    trajectory settles, with results EXACTLY equal to the serial closed loop
    (the bucket caps self-served misses + prefetch padding, never scores)."""
    renderer, bank, mk = setup
    mesh = _mesh()
    est_a = mk(12)
    est_b = mk(12)
    fp = np.asarray(est_a.fine_poses)

    # Jumpy prefix (overflows bucket 2), then a SETTLED single-pose tail:
    # the de-escalation window needs 16 clean frames, and with the tiny
    # 12-slot cache an alternating tail would keep thrashing (each miss
    # frame's prefetch padding evicts the other pose's neighbours).
    traj = [5, 6, 7, 60, 61, 5, 120, 121] + [6] * 24
    frames = []
    for gi in traj:
        gt = jnp.asarray(fp[gi])
        rgb, depth = renderer.render_from_poses(mesh, gt[None])
        props, masks, boxes = renderer.generate_proposals(rgb, depth)
        frames.append((props[0], masks[0], renderer.k, boxes[0].astype(jnp.float32), 0.25))
    prev0 = jnp.asarray(fp[5])

    serial = []
    prev = prev0
    for f in frames:
        o = est_a.refine_cached(f[0], f[1], mesh, f[2], f[3], f[4], prev, 40.0, cache_key="ck")
        tc = np.asarray(o.tcos)[0]
        serial.append((tc, float(np.asarray(o.scores)[0])))
        prev = jnp.asarray(tc)

    from freepose_tpu.pipeline.online_pose_estimator import AutoRefineChain

    chain = AutoRefineChain(
        est_b, mesh, "ck", neighborhood_deg=40.0, lag=2, miss_bucket=2,
        adaptive_bucket=True, bucket_choices=(2, 4, 8),
    )
    for i, f in enumerate(frames):
        chain.submit(*f, prev_pose=prev0 if i == 0 else None)
    got = chain.finalize_all()

    assert len(got) == len(serial) == len(traj)
    for (tr, sr), (tg, sg) in zip(serial, got):
        np.testing.assert_allclose(tg, tr, atol=1e-5)
        assert abs(sg - sr) < 1e-5
    # The bucket moved in both directions.
    ups = [b for _f, b in chain.bucket_switches if b > 2]
    downs = [b for (_f, b), (_f2, b2) in zip(chain.bucket_switches[1:],
                                             chain.bucket_switches[:-1]) if b < b2]
    assert ups, chain.bucket_switches
    assert downs, chain.bucket_switches
