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
