"""Property-based invariants (hypothesis) for the pure-math core.

SURVEY §4 calls for golden-testable pure functions; these go further and
assert algebraic invariants on randomized inputs: rotation codec round-trips,
metric axioms for the geodesic distance, RLE codec round-trips on arbitrary
masks, and crop static-shape guarantees."""
import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from freepose_tpu.geometry.rotation import geodesic_distance, matrix_to_quat, quat_to_matrix
from freepose_tpu.io import rle

import jax.numpy as jnp


def _unit_quats(n):
    return hnp.arrays(
        np.float64, (n, 4), elements=st.floats(-1, 1, allow_nan=False)
    ).filter(lambda q: (np.linalg.norm(q, axis=-1) > 1e-2).all())


@settings(max_examples=25, deadline=None)
@given(_unit_quats(4))
def test_quaternion_matrix_roundtrip(quats):
    q = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
    r = np.asarray(quat_to_matrix(jnp.asarray(q, jnp.float32)))
    # Proper rotations: orthonormal, det +1.
    for m in r:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(m) - 1.0) < 1e-5
    back = np.asarray(matrix_to_quat(jnp.asarray(r)))
    # Round-trip up to the double cover (q ~ -q).
    for orig, rec in zip(q, back):
        sign = np.sign(np.dot(orig, rec)) or 1.0
        np.testing.assert_allclose(rec * sign, orig, atol=1e-4)


@settings(max_examples=25, deadline=None)
@given(_unit_quats(3))
def test_geodesic_distance_metric_axioms(quats):
    q = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
    r = quat_to_matrix(jnp.asarray(q, jnp.float32))
    # Identity of indiscernibles (within fp): d(x, x) ~ 0.
    for i in range(3):
        assert float(geodesic_distance(r[i][None], r[i])[0]) < 0.2  # degrees
    # Symmetry.
    d_ab = float(geodesic_distance(r[0][None], r[1])[0])
    d_ba = float(geodesic_distance(r[1][None], r[0])[0])
    assert abs(d_ab - d_ba) < 0.1
    # Range.
    assert 0.0 <= d_ab <= 180.0 + 1e-3
    # Triangle inequality (loose fp tolerance).
    d_ac = float(geodesic_distance(r[0][None], r[2])[0])
    d_bc = float(geodesic_distance(r[1][None], r[2])[0])
    assert d_ac <= d_ab + d_bc + 0.5


@settings(max_examples=30, deadline=None)
@given(
    hnp.arrays(np.bool_, hnp.array_shapes(min_dims=2, max_dims=2, min_side=1, max_side=40))
)
def test_rle_roundtrip_arbitrary_masks(mask):
    enc = rle.encode_rle(mask)
    np.testing.assert_array_equal(rle.decode_rle(enc), mask)
    assert rle.rle_area(enc) == int(mask.sum())
    # Counts alternate 0-run first and sum to the pixel count.
    assert sum(enc["counts"]) == mask.size


@settings(max_examples=20, deadline=None)
@given(
    st.integers(2, 60), st.integers(2, 60),  # image h, w
    st.integers(0, 50), st.integers(0, 50),  # box origin
    st.integers(1, 40), st.integers(1, 40),  # box size
)
def test_crop_resize_pad_static_shape_and_range(h, w, x0, y0, bw, bh):
    from freepose_tpu.geometry.crop import crop_resize_pad

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 3, h, w)), jnp.float32)
    box = jnp.asarray([[min(x0, w - 1), min(y0, h - 1),
                        min(x0 + bw, w), min(y0 + bh, h)]], jnp.float32)
    out = crop_resize_pad(img, box, 32)
    assert out.shape == (1, 3, 32, 32)  # static regardless of box
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert o.min() >= -1e-6 and o.max() <= 1.0 + 1e-6  # no out-of-range reads
