"""cus render-convention oracle (VERDICT r3 #5).

The reference computes cus from GL-rendered silhouettes
(bop_toolkit/bop_toolkit_lib/pose_error.py:357-387 over masks from
renderer_vispy.py:26-110 / the C++ bop_renderer). GL rasterization samples
coverage at PIXEL CENTRES (u, v) = (i + 0.5, j + 0.5) of a viewport whose
projection maps a camera point X to image coordinates
(fx·X/Z + cx, fy·Y/Z + cy) — i.e. pixel (i, j) is lit iff the projected
silhouette covers (i + 0.5, j + 0.5). Both MaskRenderer backends implement
exactly this convention (ops/rasterizer.py:205, csrc/rasterizer.cpp:111-113);
these tests pin it against an oracle that needs NO renderer at all: the
silhouette of a sphere has a closed-form per-pixel inside test (the ray
through the pixel centre passes within one radius of the centre), so a
half-pixel/viewport convention error misclassifies a one-pixel boundary ring
and fails loudly. A numpy GL-convention triangle twin checks the same at the
single-triangle level, and cus itself is checked end-to-end against the
analytic complement-over-union.
"""
import numpy as np
import pytest

from freepose_tpu.evaluation.pose_error import MaskRenderer, cus
from freepose_tpu.io.mesh import TriMesh

W, H = 160, 120
K = np.array([[150.0, 0, 83.0], [0, 150.0, 57.0], [0, 0, 1]], np.float32)
RHO = 0.3


def _sphere_mesh(n=80, radius=RHO):
    verts, faces = [], []
    for i in range(n + 1):
        th = np.pi * i / n
        for j in range(n):
            ph = 2 * np.pi * j / n
            verts.append([radius * np.sin(th) * np.cos(ph),
                          radius * np.sin(th) * np.sin(ph),
                          radius * np.cos(th)])
    for i in range(n):
        for j in range(n):
            a = i * n + j
            b = i * n + (j + 1) % n
            c = (i + 1) * n + j
            d = (i + 1) * n + (j + 1) % n
            faces.append([a, b, c])
            faces.append([b, d, c])
    v = np.asarray(verts, np.float32)
    return TriMesh(v, np.asarray(faces, np.int32),
                   np.full((len(v), 3), 0.7, np.float32))


def _analytic_sphere_mask(center, radius=RHO, du=0.0, dv=0.0):
    """[H, W] bool: ray through pixel centre (i+0.5+du, j+0.5+dv) passes
    within `radius` of `center` (in front of the camera)."""
    us = np.arange(W) + 0.5 + du
    vs = np.arange(H) + 0.5 + dv
    uu, vv = np.meshgrid(us, vs)
    kinv = np.linalg.inv(K)
    d = np.stack([uu, vv, np.ones_like(uu)], axis=-1) @ kinv.T  # [H, W, 3]
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    c = np.asarray(center, np.float64)
    along = d @ c
    perp2 = np.sum(c * c) - along**2
    return (perp2 <= radius * radius) & (along > 0)


def _certain_masks(center, eps_px=0.2):
    """(inside, outside): pixels whose analytic classification is stable
    under +-eps_px pixel-centre shifts — faceting of the 80-seg sphere mesh
    moves the boundary by < 0.05 px here, so every 'certain' pixel must
    match the render exactly; a half-pixel convention error flips a ~0.3 px
    boundary band and fails."""
    evals = [
        _analytic_sphere_mask(center, du=du, dv=dv)
        for du, dv in [(0, 0), (eps_px, 0), (-eps_px, 0), (0, eps_px), (0, -eps_px)]
    ]
    allin = np.logical_and.reduce(evals)
    allout = np.logical_and.reduce([~e for e in evals])
    return allin, allout


CENTER = np.array([0.12, -0.06, 1.2], np.float32)


def _check_backend(backend):
    # 12.8k sphere faces concentrate in the ~10 tiles the disc covers —
    # far denser than BOP meshes at VGA — so raise the per-tile budget.
    r = MaskRenderer(W, H, backend=backend, max_faces_per_tile=4096)
    r.add_object("sph", _sphere_mesh())
    mask = r.render_depth("sph", np.eye(3, dtype=np.float32), CENTER, K) > 0
    cin, cout = _certain_masks(CENTER)
    assert cin.sum() > 1000 and cout.sum() > 1000
    miss_in = int((cin & ~mask).sum())
    miss_out = int((cout & mask).sum())
    assert miss_in == 0, f"{backend}: {miss_in} certain-inside pixels unlit"
    assert miss_out == 0, f"{backend}: {miss_out} certain-outside pixels lit"
    return mask


def test_device_backend_matches_analytic_sphere():
    _check_backend("device")


def test_native_backend_matches_analytic_sphere():
    from freepose_tpu.ops import raster_native

    if not raster_native.available():
        pytest.skip("C++ rasterizer not built")
    _check_backend("native")


def test_oracle_detects_half_pixel_shift():
    """Sensitivity: a corner-sampling (integer-coordinate) convention — the
    classic off-by-half bug — must violate the certain-pixel oracle."""
    shifted = _analytic_sphere_mask(CENTER, du=-0.5, dv=-0.5)
    cin, cout = _certain_masks(CENTER)
    bad = int((cin & ~shifted).sum() + (cout & shifted).sum())
    assert bad > 20, "oracle would not catch a half-pixel shift"


def test_numpy_gl_twin_matches_rasterizer():
    """Triangle-level convention: a pure-numpy GL-convention rasterizer
    (inside test at pixel centres via edge functions) must agree with the
    XLA backend on every pixel whose centre is > 0.2 px from any projected
    edge (closer pixels depend on fill-rule tie-breaking)."""
    import jax.numpy as jnp

    from freepose_tpu.io.mesh import pad_mesh
    from freepose_tpu.ops.rasterizer import RasterSettings, rasterize

    rng = np.random.default_rng(5)
    mesh = _sphere_mesh(n=12, radius=0.25)  # coarse: long visible edges
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array([[0.36, 0.48, -0.8], [-0.8, 0.6, 0.0], [0.48, 0.64, 0.6]], np.float32)
    pose[:3, 3] = CENTER
    v, c, f, valid = pad_mesh(mesh, 2048, 4096)
    setts = RasterSettings(resolution=160, tile=32, max_faces_per_tile=256, depth_only=True)
    _, depth = rasterize(jnp.asarray(v), jnp.asarray(c), jnp.asarray(f), jnp.asarray(valid),
                         jnp.asarray(pose[None]), jnp.asarray(K), setts)
    got = np.asarray(depth[0])[:H, :W] > 0

    # numpy twin: project, edge-function coverage at pixel centres.
    cam = mesh.vertices @ pose[:3, :3].T + pose[:3, 3]
    uv = (cam @ K.T)
    uv = uv[:, :2] / uv[:, 2:3]
    tri = uv[mesh.faces]  # [F, 3, 2]
    zs = cam[:, 2][mesh.faces]
    us = np.arange(W) + 0.5
    vs = np.arange(H) + 0.5
    uu, vv = np.meshgrid(us, vs)
    inside = np.zeros((H, W), bool)
    margin_in = np.zeros((H, W))  # covered pixels: px distance inside the
    #                               deepest covering triangle's boundary
    dist_out = np.full((H, W), np.inf)  # lower bound on px distance to the
    #                                     silhouette for uncovered pixels
    for t3, z3 in zip(tri, zs):
        if np.any(z3 <= 1e-6):
            continue
        e = []
        for a in range(3):
            p0, p1 = t3[a], t3[(a + 1) % 3]
            n = np.array([p1[1] - p0[1], -(p1[0] - p0[0])])
            ln = np.linalg.norm(n)
            if ln < 1e-12:
                e = None
                break
            n = n / ln
            e.append((uu - p0[0]) * n[0] + (vv - p0[1]) * n[1])
        if e is None:
            continue
        signed = np.stack(e)
        cover = np.all(signed >= 0, axis=0) | np.all(signed <= 0, axis=0)
        inside |= cover
        margin_in = np.where(cover, np.maximum(margin_in, np.min(np.abs(signed), axis=0)), margin_in)
        # Outside-distance lower bound (winding-agnostic): the larger of the
        # two orientations' worst edge violations is >= 0 outside, and every
        # point at perpendicular distance d beyond an edge is >= d from the
        # triangle.
        viol = np.minimum(np.max(-signed, axis=0), np.max(signed, axis=0))
        dist_out = np.minimum(dist_out, np.maximum(viol, 0.0))
    certain = np.where(inside, margin_in > 0.2, dist_out > 0.2)
    assert certain.sum() > got.size * 0.8
    mism = int((got[certain] != inside[certain]).sum())
    assert mism == 0, f"{mism} certain pixels disagree with the GL-convention twin"


def test_cus_matches_analytic_cou():
    """cus through evaluation/pose_error.py end-to-end equals the analytic
    complement-over-union of the two sphere silhouettes to < 1% (boundary
    faceting only)."""
    r = MaskRenderer(W, H, backend="device", max_faces_per_tile=4096)
    mesh = _sphere_mesh()
    r.add_object("est", mesh)
    r.add_object("gt", mesh)
    c_est = CENTER + np.array([0.06, 0.03, 0.0], np.float32)
    e = cus(np.eye(3, dtype=np.float32), c_est, np.eye(3, dtype=np.float32),
            CENTER, K, r, "est", "gt")
    m_est = _analytic_sphere_mask(c_est)
    m_gt = _analytic_sphere_mask(CENTER)
    expected = 1.0 - (m_est & m_gt).sum() / float((m_est | m_gt).sum())
    assert 0.05 < expected < 0.95  # informative configuration
    assert abs(e - expected) < 0.01, (e, expected)
