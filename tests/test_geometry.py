import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rot

from freepose_tpu.geometry import boxes as B
from freepose_tpu.geometry import camera as C
from freepose_tpu.geometry import pointcloud as P
from freepose_tpu.geometry import se3 as S


def _random_pose(rng):
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = Rot.random(random_state=rng).as_matrix()
    t[:3, 3] = rng.normal(size=3)
    return t


def test_se3_inverse():
    rng = np.random.default_rng(0)
    t = np.stack([_random_pose(rng) for _ in range(8)])
    inv = np.asarray(S.se3_inverse(jnp.asarray(t)))
    prod = np.einsum("nij,njk->nik", t, inv)
    np.testing.assert_allclose(prod, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_backproject_project_roundtrip():
    k = jnp.array([[600.0, 0, 210], [0, 600, 210], [0, 0, 1]])
    depth = jnp.ones((420, 420)) * 1.1
    pts, valid = C.backproject_depth(depth, k)
    assert bool(valid.all())
    uv = C.project_points(pts, k)
    uu, vv = np.meshgrid(np.arange(420), np.arange(420))
    np.testing.assert_allclose(np.asarray(uv[:, 0]), uu.reshape(-1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[:, 1]), vv.reshape(-1), atol=1e-3)


def test_z_lift_recovers_depth():
    # A synthetic fronto-parallel square of known metric size: the bbox of its
    # projection at depth z0 must lift the template pose back to z0.
    k = jnp.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    half = 0.1  # 20 cm object
    z0 = 2.0
    # Object points (cube corners, flattened in z for simplicity).
    pts = np.array(
        [[-half, -half, 0], [half, -half, 0], [-half, half, 0], [half, half, 0]],
        dtype=np.float32,
    )
    # Projected bbox at depth z0, centred on principal point:
    r = 600 * half / z0
    bbox = jnp.array([320 - r, 240 - r, 320 + r - 1, 240 + r - 1])
    tco_init = jnp.eye(4).at[2, 3].set(1.1)
    tco = C.z_lift_from_pointcloud(bbox, jnp.asarray(pts), jnp.ones(4, bool), k, tco_init)
    assert abs(float(tco[2, 3]) - z0) < 0.05
    assert abs(float(tco[0, 3])) < 0.05
    assert abs(float(tco[1, 3])) < 0.05


def test_masked_median_even_odd():
    vals = jnp.array([5.0, 1.0, 9.0, 3.0, 100.0, 200.0])
    mask = jnp.array([True, True, True, True, False, False])
    assert float(P.masked_median(vals, mask)) == 4.0  # median of 1,3,5,9
    mask2 = jnp.array([True, True, True, False, False, False])
    assert float(P.masked_median(vals, mask2)) == 5.0  # median of 1,5,9


def test_reject_depth_outliers():
    z = jnp.concatenate([jnp.ones(100), jnp.array([50.0, 60.0])])
    valid = jnp.ones(102, dtype=bool)
    keep = P.reject_depth_outliers(z, valid, std_factor=1.5, min_vertices=25)
    assert bool(keep[:100].all())
    assert not bool(keep[100]) and not bool(keep[101])


def test_bbox_half_extent():
    pts = jnp.array([[0.0, 0, 0], [1, 0, 0], [0, 0.5, 0], [0, 0, 0.2], [99, 99, 99]])
    valid = jnp.array([True, True, True, True, False])
    assert abs(float(P.bbox_half_extent(pts, valid)) - 0.5) < 1e-6


def test_bbox_iou_and_conversions():
    a = jnp.array([0.0, 0, 10, 10])  # xywh
    b = jnp.array([5.0, 5, 10, 10])
    iou = float(B.bbox_iou(a, b))
    assert abs(iou - 25.0 / 175.0) < 1e-6
    xyxy = B.xywh_to_xyxy(a)
    np.testing.assert_allclose(np.asarray(B.xyxy_to_xywh(xyxy)), np.asarray(a))


def test_mask_to_bbox():
    mask = jnp.zeros((20, 30), bool).at[5:10, 7:15].set(True)
    bbox = np.asarray(B.mask_to_bbox(mask))
    np.testing.assert_array_equal(bbox, [7, 5, 14, 9])


def test_smooth_transforms_constant_trajectory_fixed_point():
    rng = np.random.default_rng(4)
    pose = _random_pose(rng)
    traj = jnp.asarray(np.tile(pose, (20, 1, 1)))
    smoothed = np.asarray(S.smooth_transforms(traj))
    # A constant trajectory is a fixed point of smoothing (up to quat sign).
    np.testing.assert_allclose(smoothed[:, :3, 3], np.tile(pose[:3, 3], (20, 1)), atol=1e-5)
    np.testing.assert_allclose(np.abs(smoothed[:, :3, :3]), np.abs(np.tile(pose[:3, :3], (20, 1, 1))), atol=1e-4)


def test_smooth_transforms_bucketed_matches_unpadded_formula():
    """The jitted frame-bucket path (pad to 128 with identity, masked window
    weights) must equal the direct per-length formula at every length —
    including lengths on/above the bucket boundary."""
    rng = np.random.default_rng(7)
    from freepose_tpu.geometry.rotation import matrix_to_quat, quat_to_matrix

    for n in (3, 12, 96, 128, 130):
        traj = jnp.asarray(np.stack([_random_pose(rng) for _ in range(n)]))
        got = np.asarray(S.smooth_transforms(traj))
        xyz = S.smooth_translations(traj[:, :3, 3], 5)
        quats = S.smooth_quaternions(matrix_to_quat(traj[:, :3, :3]), 9)
        want = traj.at[:, :3, 3].set(xyz).at[:, :3, :3].set(quat_to_matrix(quats))
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_quantile_threshold_nonpositive_padding_invariant():
    from freepose_tpu.pipeline.tracking_refiner import quantile_threshold

    rng = np.random.default_rng(8)
    conf = rng.standard_normal((13, 9, 9)).astype(np.float32)
    padded = np.full((32, 9, 9), -1e9, np.float32)
    padded[:13] = conf
    a = float(quantile_threshold(jnp.asarray(conf)))
    b = float(quantile_threshold(jnp.asarray(padded)))
    assert a == b


def test_smooth_translations_reduces_noise():
    rng = np.random.default_rng(5)
    clean = np.linspace(0, 1, 50)[:, None] * np.ones(3)
    noisy = clean + rng.normal(scale=0.05, size=(50, 3))
    smoothed = np.asarray(S.smooth_translations(jnp.asarray(noisy, dtype=jnp.float32)))
    assert np.mean((smoothed - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_update_k_with_crop_identity():
    k = jnp.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    # Crop that is exactly the full image and resize to the same size: K must
    # be (nearly) unchanged.
    bboxes = jnp.array([[0.0, 0.0, 640.0, 480.0]])
    new_k = np.asarray(C.update_k_with_crop(k, bboxes, 640, 480))
    np.testing.assert_allclose(new_k[0, 0, 0], 600.0, atol=1e-4)
    np.testing.assert_allclose(new_k[0, 0, 2], 320.0 - 0.5, atol=0.51)


def test_colored_point_cloud_matches_reference_semantics():
    """colored_point_cloud: XYZRGB rows land on the backprojected surface,
    colors normalized to [0,1], largest-CC isolation drops a second blob."""
    import jax.numpy as jnp
    from freepose_tpu.geometry.pointcloud import colored_point_cloud

    h, w = 40, 50
    k = jnp.asarray([[60.0, 0, 25], [0, 60.0, 20], [0, 0, 1]])
    depth = np.zeros((h, w), np.float32)
    mask = np.zeros((h, w), bool)
    # main blob near z=2 (slightly varying: the reference's strict
    # median±std·k cut keeps nothing on perfectly flat depth)
    rng = np.random.default_rng(0)
    depth[10:25, 10:30] = 2.0 + 0.01 * rng.standard_normal((15, 20)).astype(np.float32)
    mask[10:25, 10:30] = True
    # tiny distractor blob elsewhere (must be dropped by largest-CC)
    depth[35:38, 45:48] = 5.0
    mask[35:38, 45:48] = True
    rgb = np.full((h, w, 3), 128, np.uint8)
    cloud, valid = colored_point_cloud(
        jnp.asarray(rgb), jnp.asarray(depth), k, jnp.asarray(mask), align=False
    )
    cloud, valid = np.asarray(cloud), np.asarray(valid)
    assert valid.sum() > 0
    pts = cloud[valid]
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=0.05)  # distractor gone
    np.testing.assert_allclose(pts[:, 3:], 128 / 255.0, atol=1e-6)
    # aligned variant returns same validity, rotated coords
    cloud_a, valid_a = colored_point_cloud(
        jnp.asarray(rgb), jnp.asarray(depth), k, jnp.asarray(mask), align=True
    )
    np.testing.assert_array_equal(np.asarray(valid_a), valid)
