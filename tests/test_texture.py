"""Texture-mapped rendering: sampling math, backend parity, fidelity vs the
vertex-color bake, and loader plumbing (reference GL textured render,
src/pipeline/retrieval/renderer.py:37-68)."""
import numpy as np
import jax.numpy as jnp
import pytest

from freepose_tpu.io.mesh import TriMesh, fit_to_budget, pad_mesh, pad_uv
from freepose_tpu.ops.rasterizer import RasterSettings, rasterize
from freepose_tpu.ops.texture import render_textured, sample_texture


def quad_mesh(z_far: float = 0.0):
    """Unit quad in the z=2 plane (right edge pushed to 2+z_far for the
    perspective tests), UVs spanning the full texture."""
    v = np.array(
        [[-1, -1, 2.0], [1, -1, 2.0 + z_far], [1, 1, 2.0 + z_far], [-1, 1, 2.0]],
        np.float32,
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)
    return v, f, uv


def checkerboard(n: int, cells: int) -> np.ndarray:
    y, x = np.mgrid[0:n, 0:n]
    c = ((x * cells // n) + (y * cells // n)) % 2
    return np.stack([c, c, c], axis=-1).astype(np.float32)


RES = 64
K = jnp.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]])
SET = RasterSettings(resolution=RES, tile=16, max_faces_per_tile=8, backend="xla")
POSE = jnp.eye(4)[None]


def test_sample_texture_bilinear_exact():
    tex = np.zeros((4, 4, 3), np.float32)
    tex[..., 0] = np.arange(4)[None, :] / 3.0  # R ramps with u
    tex[..., 1] = np.arange(4)[:, None] / 3.0  # G ramps with texel row (1-v)
    uv = np.array([[0.0, 1.0], [1.0, 1.0], [0.0, 0.0], [0.5, 0.5], [1 / 6, 1.0]], np.float32)
    out = np.asarray(sample_texture(jnp.asarray(uv), jnp.asarray(tex)))
    exp = np.array([
        [0.0, 0.0, 0.0],       # top-left texel
        [1.0, 0.0, 0.0],       # top-right
        [0.0, 1.0, 0.0],       # bottom-left (v=0 -> last row)
        [0.5, 0.5, 0.0],       # centre
        [0.5 / 3, 0.0, 0.0],   # between texels 0 and 1 in u
    ], np.float32)
    np.testing.assert_allclose(out, exp, atol=1e-6)
    near = np.asarray(sample_texture(jnp.asarray(uv), jnp.asarray(tex), method="nearest"))
    np.testing.assert_allclose(near[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(near[1], [1, 0, 0], atol=1e-6)


def test_textured_matches_bake_on_constant_texture():
    """A constant texture must reproduce the vertex-bake exactly (every
    sample equals every baked vertex color)."""
    v, f, uvw = quad_mesh()
    tex = np.full((8, 8, 3), 0.25, np.float32)
    const_col = np.full((4, 3), 0.25, np.float32)
    valid = jnp.ones(2, bool)
    rgb_t, d_t = render_textured(
        jnp.asarray(v), jnp.asarray(uvw), jnp.asarray(f), valid, POSE, K,
        jnp.asarray(tex), SET,
    )
    rgb_b, d_b = rasterize(
        jnp.asarray(v), jnp.asarray(const_col), jnp.asarray(f), valid, POSE, K, SET
    )
    np.testing.assert_allclose(np.asarray(d_t), np.asarray(d_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_t), np.asarray(rgb_b), atol=1e-6)


def test_checkerboard_fidelity_vs_bake():
    """A 2-triangle quad with an 8x8 checkerboard: per-pixel sampling must
    reproduce the pattern; the 4-corner vertex bake cannot."""
    v, f, uvw = quad_mesh()
    cells = 8
    tex = checkerboard(64, cells)
    valid = jnp.ones(2, bool)
    settings = RasterSettings(resolution=RES, tile=16, max_faces_per_tile=8,
                              backend="xla", ambient=1.0)
    rgb, depth = render_textured(
        jnp.asarray(v), jnp.asarray(uvw), jnp.asarray(f), valid, POSE, K,
        jnp.asarray(tex), settings, method="nearest",
    )
    rgb = np.asarray(rgb)
    hit = np.asarray(depth[0]) > 0
    # Analytic: pixel (px+.5, py+.5) back-projects to the z=2 plane.
    ys, xs = np.mgrid[0:RES, 0:RES]
    wx = ((xs + 0.5) - 32.0) * 2.0 / 64.0  # world x in [-1, 1]
    wy = ((ys + 0.5) - 32.0) * 2.0 / 64.0
    u = (wx + 1) / 2
    vv = (wy + 1) / 2  # uv v ramps with +y; texel row = (1-v)*(H-1)
    tx = np.clip(np.round(u * 63), 0, 63).astype(int)
    ty = np.clip(np.round((1 - vv) * 63), 0, 63).astype(int)
    exp = tex[ty, tx, 0]
    inside = hit & (np.abs(wx) < 0.95) & (np.abs(wy) < 0.95)
    err = np.abs(rgb[0, ..., 0] - exp)[inside]
    # Away from cell boundaries the lookup is exact; boundary pixels may
    # round to either cell. >97% exact is far beyond what the bake achieves.
    assert (err < 1e-3).mean() > 0.97, (err < 1e-3).mean()

    # The bake on the SAME 4-vertex geometry loses the pattern entirely.
    from freepose_tpu.io.mesh import _bake_texture_to_vertices

    baked = _bake_texture_to_vertices(uvw[:, :2], tex)
    rgb_b, _ = rasterize(
        jnp.asarray(v), jnp.asarray(baked), jnp.asarray(f), valid, POSE, K, settings
    )
    err_b = np.abs(np.asarray(rgb_b)[0, ..., 0] - exp)[inside]
    assert (err_b < 1e-3).mean() < 0.7  # bake: interpolated corner colors


def test_perspective_correct_uv():
    """Tilted quad (right edge 3x farther): interpolated UV must follow the
    ray-plane intersection, not screen-linear interpolation."""
    v, f, uvw = quad_mesh(z_far=4.0)
    tex = np.zeros((64, 64, 3), np.float32)
    tex[..., 0] = np.linspace(0, 1, 64)[None, :]  # R = u ramp
    valid = jnp.ones(2, bool)
    settings = RasterSettings(resolution=RES, tile=16, max_faces_per_tile=8,
                              backend="xla", ambient=1.0)
    rgb, depth = render_textured(
        jnp.asarray(v), jnp.asarray(uvw), jnp.asarray(f), valid, POSE, K,
        jnp.asarray(tex), settings,
    )
    rgb = np.asarray(rgb)[0]
    depth = np.asarray(depth)[0]
    # Ray-plane oracle: the quad lies on the plane through (-1,*,2) and
    # (1,*,6): z = 4 + 2x -> with x = z*dx (dx = (px-cx)/f), z = 4/(1-2dx).
    ys, xs = np.mgrid[0:RES, 0:RES]
    dx = ((xs + 0.5) - 32.0) / 64.0
    dy = ((ys + 0.5) - 32.0) / 64.0
    z = 4.0 / (1.0 - 2.0 * dx)
    wx = z * dx
    wy = z * dy
    u_exp = (wx + 1) / 2
    hit = depth > 0
    inside = hit & (u_exp > 0.05) & (u_exp < 0.95) & (np.abs(wy) < 0.9)
    assert inside.sum() > 200
    np.testing.assert_allclose(depth[inside], z[inside], rtol=2e-2)
    np.testing.assert_allclose(rgb[..., 0][inside], u_exp[inside], atol=0.03)
    # Screen-linear u (what a non-perspective-correct pass would produce)
    # disagrees by >0.1 over much of the quad — assert we are NOT that.
    u_screen = (dx * 2 + 1) / 2  # linear in screen x across the quad's span
    assert np.abs(rgb[..., 0][inside] - u_screen[inside]).max() > 0.1


def test_backend_parity_interpret():
    """XLA and Pallas (interpret mode on CPU) textured renders are
    pixel-identical — the UV pass reuses the shared attribute path."""
    v, f, uvw = quad_mesh(z_far=1.0)
    tex = checkerboard(32, 4)
    valid = jnp.ones(2, bool)
    xla = RasterSettings(resolution=RES, tile=16, max_faces_per_tile=8, backend="xla")
    pls = RasterSettings(resolution=RES, tile=16, max_faces_per_tile=8, backend="pallas")
    out_x = render_textured(jnp.asarray(v), jnp.asarray(uvw), jnp.asarray(f),
                            valid, POSE, K, jnp.asarray(tex), xla)
    out_p = render_textured(jnp.asarray(v), jnp.asarray(uvw), jnp.asarray(f),
                            valid, POSE, K, jnp.asarray(tex), pls)
    np.testing.assert_array_equal(np.asarray(out_x[1]), np.asarray(out_p[1]))
    np.testing.assert_array_equal(np.asarray(out_x[0]), np.asarray(out_p[0]))


def test_no_vt_vertices_fall_back_to_gray():
    v, f, uvw = quad_mesh()
    uvw = uvw.copy()
    uvw[:, 2] = 0.0  # no real vt references anywhere
    tex = checkerboard(16, 4)
    rgb, depth = render_textured(
        jnp.asarray(v), jnp.asarray(uvw), jnp.asarray(f), jnp.ones(2, bool),
        POSE, K, jnp.asarray(tex), SET,
    )
    hit = np.asarray(depth[0]) > 0
    gray = np.clip(0.7 * SET.ambient, 0, 1)
    np.testing.assert_allclose(np.asarray(rgb[0])[hit], gray, atol=1e-6)


def test_load_obj_retains_uv_and_texture(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    tex = (checkerboard(16, 4) * 255).astype(np.uint8)
    Image.fromarray(tex).save(tmp_path / "t.png")
    (tmp_path / "m.mtl").write_text("newmtl m\nmap_Kd t.png\n")
    (tmp_path / "q.obj").write_text(
        "mtllib m.mtl\n"
        "v -1 -1 2\nv 1 -1 2\nv 1 1 2\nv -1 1 2\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n"
    )
    from freepose_tpu.io.mesh import load_obj

    mesh = load_obj(tmp_path / "q.obj")
    assert mesh.texture is not None and mesh.texture.shape == (16, 16, 3)
    assert mesh.texture.max() <= 1.0
    assert mesh.uv is not None and mesh.uv.shape == (mesh.num_vertices, 3)
    assert mesh.vertex_colors is not None  # bake fallback still present
    # Transforms propagate the texture fields.
    m2 = mesh.normalized().scaled(2.0)
    assert m2.texture is not None and m2.uv is not None

    # pad_uv aligns with pad_mesh's layout after fit_to_budget.
    fitted = fit_to_budget(mesh, 8192, 16384)
    vpad, cpad, fpad, valid = pad_mesh(fitted, 8192, 16384)
    uvw = pad_uv(fitted, 8192)
    assert uvw.shape == (8192, 3)
    n = fitted.num_vertices
    np.testing.assert_allclose(uvw[:n], fitted.uv, atol=0)
    assert (uvw[n:, 2] == 0).all()


def test_template_renderer_texture_auto(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    from freepose_tpu.io.mesh import load_obj
    from freepose_tpu.pipeline.renderer import TemplateRenderer

    tex = (checkerboard(32, 8) * 255).astype(np.uint8)
    Image.fromarray(tex).save(tmp_path / "t.png")
    (tmp_path / "m.mtl").write_text("newmtl m\nmap_Kd t.png\n")
    # A small octahedron with per-face UVs covering the atlas.
    vs = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    fs = [(1, 3, 5), (3, 2, 5), (2, 4, 5), (4, 1, 5), (3, 1, 6), (2, 3, 6), (4, 2, 6), (1, 4, 6)]
    lines = ["mtllib m.mtl"]
    lines += [f"v {a} {b} {c}" for a, b, c in vs]
    lines += ["vt 0 0", "vt 1 0", "vt 0.5 1"]
    lines += [f"f {a}/1 {b}/2 {c}/3" for a, b, c in fs]
    (tmp_path / "o.obj").write_text("\n".join(lines) + "\n")
    mesh = load_obj(tmp_path / "o.obj").normalized()
    assert mesh.texture is not None

    rend = TemplateRenderer(
        n_poses=2, resolution=48, max_vertices=512, max_faces=1024,
        settings=RasterSettings(resolution=48, tile=16, max_faces_per_tile=64, backend="xla"),
    )
    rgb_auto, d_auto = rend.render(mesh)
    rend_bake = TemplateRenderer(
        n_poses=2, resolution=48, max_vertices=512, max_faces=1024,
        settings=RasterSettings(resolution=48, tile=16, max_faces_per_tile=64, backend="xla"),
        texture_mode="bake",
    )
    rgb_bake, d_bake = rend_bake.render(mesh)
    # Same geometry either way; appearance differs (checkerboard detail).
    np.testing.assert_allclose(np.asarray(d_auto), np.asarray(d_bake), atol=1e-5)
    assert np.abs(np.asarray(rgb_auto) - np.asarray(rgb_bake)).max() > 0.2
