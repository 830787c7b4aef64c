import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.rotation import template_poses
from freepose_tpu.io.mesh import TriMesh, pad_mesh
from freepose_tpu.ops.rasterizer import RasterSettings, rasterize

SET = RasterSettings(resolution=128, tile=32, max_faces_per_tile=64)
K = jnp.array([[128.0, 0, 64], [0, 128.0, 64], [0, 0, 1]])


def _cube(side=1.0):
    h = side / 2
    v = np.array(
        [[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
         [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]], np.float32)
    f = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
         [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]], np.int32)
    return TriMesh(v, f, np.full((8, 3), 0.5, np.float32))


def _render_cube(poses, side=1.0, pad_to=(16, 24)):
    m = _cube(side)
    v, c, f, valid = pad_mesh(m, *pad_to)
    return rasterize(jnp.asarray(v), jnp.asarray(c), jnp.asarray(f), jnp.asarray(valid),
                     poses, K, SET)


def test_frontal_cube_geometry():
    pose = jnp.eye(4).at[2, 3].set(2.0)
    rgb, depth = _render_cube(pose[None])
    rgb, depth = np.asarray(rgb[0]), np.asarray(depth[0])
    # Cube of side 1 at z=2 with f=128: half-size on screen = 128*0.5/1.5 ≈ 42.7
    # for the near face (z = 1.5). Check the near-face depth at the centre.
    assert abs(depth[64, 64] - 1.5) < 1e-2
    # Centre is lit with ambient-saturated gray: 0.5 * 2.0 clipped to 1.
    np.testing.assert_allclose(rgb[64, 64], [1.0, 1.0, 1.0], atol=1e-5)
    # Mask extent: near face spans ±42.7 px around centre.
    mask = depth > 0
    ys, xs = np.nonzero(mask)
    assert abs(xs.min() - (64 - 42.7)) < 2.0
    assert abs(xs.max() - (64 + 42.7)) < 2.0
    # Background is empty.
    assert depth[5, 5] == 0 and rgb[5, 5].sum() == 0


def test_depth_ordering_two_triangles():
    # Two stacked triangles; the nearer one must win the z-buffer.
    v = np.array(
        [[-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0],
         [-1, -1, 3.0], [1, -1, 3.0], [0, 1, 3.0]], np.float32)
    f = np.array([[3, 4, 5], [0, 1, 2]], np.int32)  # far one listed first
    c = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)
    rgb, depth = rasterize(jnp.asarray(v), jnp.asarray(c), jnp.asarray(f),
                           jnp.ones(2, bool), jnp.eye(4)[None], K, SET)
    assert abs(float(depth[0, 64, 64]) - 2.0) < 1e-2
    np.testing.assert_allclose(np.asarray(rgb[0, 64, 64]), [1, 0, 0], atol=1e-5)


def test_vertex_color_interpolation():
    v = np.array([[-1, -1, 2.0], [1, -1, 2.0], [0, 1.5, 2.0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    c = np.array([[0.3, 0, 0], [0, 0.3, 0], [0, 0, 0.3]], np.float32)
    set_noamb = RasterSettings(resolution=128, tile=32, max_faces_per_tile=64, ambient=1.0)
    rgb, depth = rasterize(jnp.asarray(v), jnp.asarray(c), jnp.asarray(f),
                           jnp.ones(1, bool), jnp.eye(4)[None], K, set_noamb)
    rgb = np.asarray(rgb[0])
    # Colors sum to 0.3 everywhere inside (barycentric partition of unity).
    inside = np.asarray(depth[0]) > 0
    sums = rgb.sum(-1)[inside]
    np.testing.assert_allclose(sums, 0.3, atol=1e-3)
    # Near vertex 0 (projects to u=v=0, top-left) red dominates — sample an
    # inside pixel close to it.
    y, x = 8, 12
    assert inside[y, x]
    assert rgb[y, x, 0] > rgb[y, x, 1] and rgb[y, x, 0] > rgb[y, x, 2]


def test_perspective_correct_depth():
    # A triangle slanted in z: centre-pixel depth must match analytic ray hit.
    v = np.array([[-2, -2, 2.0], [2, -2, 4.0], [0, 4, 3.0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    c = np.full((3, 3), 0.5, np.float32)
    rgb, depth = rasterize(jnp.asarray(v), jnp.asarray(c), jnp.asarray(f),
                           jnp.ones(1, bool), jnp.eye(4)[None], K, SET)
    d = float(depth[0, 64, 64])
    # Ray through the optical centre (x=y=0): plane through the 3 points.
    p0, p1, p2 = v
    n = np.cross(p1 - p0, p2 - p0)
    # Plane n·(p - p0) = 0, ray p = t*(0,0,1): t = n·p0 / n_z
    t = np.dot(n, p0) / n[2]
    assert abs(d - t) < 0.02


def test_batched_poses_match_single():
    poses = template_poses(8, z=2.5)
    rgb_b, depth_b = _render_cube(poses)
    for i in [0, 3, 7]:
        rgb_s, depth_s = _render_cube(poses[i][None])
        np.testing.assert_allclose(np.asarray(rgb_b[i]), np.asarray(rgb_s[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth_b[i]), np.asarray(depth_s[0]), atol=1e-6)


def test_behind_camera_culled():
    pose = jnp.eye(4).at[2, 3].set(-2.0)  # object behind the camera
    rgb, depth = _render_cube(pose[None])
    assert float(jnp.abs(rgb).sum()) == 0.0
    assert float(depth.sum()) == 0.0


def test_depth_to_pointcloud_consistency():
    # Backprojecting the rendered depth must land on the cube surface.
    from freepose_tpu.geometry.camera import backproject_depth

    pose = jnp.eye(4).at[2, 3].set(2.0)
    _, depth = _render_cube(pose[None], side=1.0)
    pts, valid = backproject_depth(depth[0], K)
    pts = np.asarray(pts)[np.asarray(valid)]
    # Near face: z ≈ 1.5; |x|,|y| <= 0.5 (+ half-pixel slack)
    assert (np.abs(pts[:, :2]) < 0.52).all()
    assert pts[:, 2].min() > 1.45


def test_pallas_backend_matches_xla():
    """rasterize_pallas (interpret mode on CPU) is pixel-identical to the XLA
    baseline: same binning, same coverage epsilon, same z-winner."""
    from freepose_tpu.ops.rasterizer import RasterSettings, rasterize
    from freepose_tpu.ops.rasterizer_pallas import rasterize_pallas

    rng = np.random.default_rng(0)
    n_lat, n_lon = 12, 16
    verts, faces_l = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            r = 0.4 + 0.1 * np.sin(3 * ph)
            verts.append([r * np.sin(th) * np.cos(ph), r * np.sin(th) * np.sin(ph), r * np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a0 = i * n_lon + j
            b0 = i * n_lon + (j + 1) % n_lon
            c0 = (i + 1) * n_lon + j
            d0 = (i + 1) * n_lon + (j + 1) % n_lon
            faces_l += [[a0, b0, c0], [b0, d0, c0]]
    vv = np.asarray(verts, np.float32)
    mesh = TriMesh(vv, np.asarray(faces_l, np.int32), rng.random((len(vv), 3)).astype(np.float32))
    v, c, f, valid = pad_mesh(mesh, 256, 512)
    v, c, f, valid = map(jnp.asarray, (v, c, f, valid))
    poses = jnp.asarray(template_poses(3, z=1.1))
    k = jnp.asarray([[100.0, 0, 64], [0, 100, 64], [0, 0, 1]], jnp.float32)
    settings = RasterSettings(resolution=128, tile=32, max_faces_per_tile=128)

    rgb_x, depth_x = rasterize(v, c, f, valid, poses, k, settings)
    rgb_p, depth_p = rasterize_pallas(v, c, f, valid, poses, k, settings, interpret=True)
    np.testing.assert_allclose(np.asarray(depth_p), np.asarray(depth_x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_x), atol=1e-5)

    # depth_only parity too (eval-renderer mode).
    s2 = RasterSettings(resolution=128, tile=32, max_faces_per_tile=128, depth_only=True)
    _, d_x = rasterize(v, c, f, valid, poses, k, s2)
    _, d_p = rasterize_pallas(v, c, f, valid, poses, k, s2, interpret=True)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)

    # Per-pose intrinsics [P, 3, 3] (crop-zoomed K, tracking-refiner batch
    # path): the kernel must match the XLA path and honour each pose's K.
    ks = jnp.stack([k.at[0, 0].mul(s).at[1, 1].mul(s) for s in (0.8, 1.0, 1.25)])
    rgb_xk, depth_xk = rasterize(v, c, f, valid, poses, ks, settings)
    rgb_pk, depth_pk = rasterize_pallas(v, c, f, valid, poses, ks, settings, interpret=True)
    np.testing.assert_allclose(np.asarray(depth_pk), np.asarray(depth_xk), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_pk), np.asarray(rgb_xk), atol=1e-5)
    areas = [(np.asarray(depth_pk[i]) > 0).sum() for i in range(3)]
    assert areas[0] < areas[1] < areas[2]  # silhouette grows with focal

    # tile=37 (the 518² tracking-refiner grid, res here scaled down so the
    # interpreter stays fast): this config OOM'd scoped VMEM before the
    # tiles-per-step budget accounted for kernel temporaries.
    s37 = RasterSettings(resolution=74, tile=37, max_faces_per_tile=128)
    k37 = k.at[0, 2].set(37.0).at[1, 2].set(37.0)
    rgb_x37, depth_x37 = rasterize(v, c, f, valid, poses, k37, s37)
    rgb_p37, depth_p37 = rasterize_pallas(v, c, f, valid, poses, k37, s37, interpret=True)
    np.testing.assert_allclose(np.asarray(depth_p37), np.asarray(depth_x37), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb_p37), np.asarray(rgb_x37), atol=1e-5)


def test_backend_switch_via_settings():
    """RasterSettings(backend='pallas') routes rasterize() through the kernel
    (interpret-compatible on CPU via the pallas interpreter default? No —
    exercised through rasterize_pallas's interpret flag in the parity test;
    here we only check the dispatch wires up on CPU interpret)."""
    import freepose_tpu.ops.rasterizer_pallas as rp
    from freepose_tpu.ops.rasterizer import RasterSettings, rasterize

    poses = jnp.asarray(template_poses(1, z=2.0))
    m = _cube()
    v, c, f, valid = map(jnp.asarray, pad_mesh(m, 16, 24))
    called = {}
    orig = rp.rasterize_pallas

    def spy(*a, **kw):
        called["yes"] = True
        assert kw.get("interpret") is True  # auto-interpret off-TPU
        return orig(*a, **kw)

    rp.rasterize_pallas = spy
    try:
        s = RasterSettings(resolution=64, tile=32, max_faces_per_tile=128, backend="pallas")
        rgb, depth = rasterize(v, c, f, valid, poses, K, s)
    finally:
        rp.rasterize_pallas = orig
    assert called.get("yes") and depth.shape == (1, 64, 64)


def test_sort_binning_matches_topk_selection():
    """select_tile_faces(binning='sort') returns the IDENTICAL candidate set
    and packing as the dense per-tile top-k, including: bboxes exactly on
    tile boundaries (the overlap test is boundary-inclusive on both ends),
    faces spanning more than the 4×4 small-face window (routed through the
    exact big-face merge), invalid faces, and tiles with more than m
    candidates (both cap at the m lowest indices)."""
    from freepose_tpu.ops.rasterizer import select_tile_faces

    rng = np.random.default_rng(1)
    grid, tile, m = 5, 16, 64
    res = grid * tile
    nf = 400
    lo = rng.uniform(-10, res + 10, size=(nf, 2)).astype(np.float32)
    ext = rng.gamma(1.0, 6.0, size=(nf, 2)).astype(np.float32)
    # A handful of giant faces (span > 4 tiles both axes) and some huge-x only.
    ext[:10] = res * 0.9
    ext[10:16, 0] = res * 0.9
    hi = lo + ext
    # Snap some bboxes exactly onto tile boundaries (both ends inclusive).
    lo[20:40] = np.round(lo[20:40] / tile) * tile
    hi[40:60] = np.round(hi[40:60] / tile) * tile
    valid = rng.random(nf) > 0.1

    args = (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(valid), grid, tile, m)
    idx_s, ok_s = select_tile_faces(*args, "sort")
    idx_t, ok_t = select_tile_faces(*args, "topk")
    np.testing.assert_array_equal(np.asarray(ok_s), np.asarray(ok_t))
    np.testing.assert_array_equal(
        np.asarray(jnp.where(ok_s, idx_s, -1)), np.asarray(jnp.where(ok_t, idx_t, -1))
    )
    assert np.asarray(ok_s).any() and not np.asarray(ok_s).all()


def test_sort_binning_matches_topk_render():
    """Full renders are pixel-identical between the two binning algorithms
    (cube + crowded-tile config so the m cap binds)."""
    poses = jnp.asarray(template_poses(2, z=2.0))
    m = _cube()
    v, c, f, valid = map(jnp.asarray, pad_mesh(m, 16, 24))
    for mcap in (4, 64):  # 4: the per-tile cap binds; 64: it does not
        s_sort = RasterSettings(resolution=128, tile=32, max_faces_per_tile=mcap,
                                binning="sort", backend="xla")
        s_topk = RasterSettings(resolution=128, tile=32, max_faces_per_tile=mcap,
                                binning="topk", backend="xla")
        rgb_s, d_s = rasterize(v, c, f, valid, poses, K, s_sort)
        rgb_t, d_t = rasterize(v, c, f, valid, poses, K, s_topk)
        np.testing.assert_array_equal(np.asarray(d_s), np.asarray(d_t))
        np.testing.assert_array_equal(np.asarray(rgb_s), np.asarray(rgb_t))
