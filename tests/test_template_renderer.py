import jax.numpy as jnp
import numpy as np

from freepose_tpu.io.mesh import TriMesh
from freepose_tpu.ops.rasterizer import RasterSettings
from freepose_tpu.pipeline.renderer import (
    TemplateRenderer,
    decode_depth_png_mm,
    encode_depth_png_mm,
    render_template_views,
)


def _sphereish_mesh(n_lat=8, n_lon=12, r=1.0):
    verts, faces = [], []
    for i in range(n_lat + 1):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append([r * np.sin(theta) * np.cos(phi), r * np.sin(theta) * np.sin(phi), r * np.cos(theta)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    v = np.asarray(verts, np.float32)
    return TriMesh(v, np.asarray(faces, np.int32), (v + 1) / 2)


def _small_renderer(n_poses=4):
    return TemplateRenderer(
        n_poses=n_poses, resolution=84, max_vertices=256, max_faces=512,
        settings=RasterSettings(resolution=84, tile=28, max_faces_per_tile=128),
    )


def test_template_grid_render_all_views_hit():
    r = _small_renderer(4)
    mesh = _sphereish_mesh()
    rgb, depth = r.render(mesh)  # sphere r=1 at scale 0.25 -> r=0.25 at z=1.1
    assert rgb.shape == (4, 84, 84, 3) and depth.shape == (4, 84, 84)
    # Every view sees the object; depth near z - r*scale.
    for i in range(4):
        d = np.asarray(depth[i])
        assert (d > 0).sum() > 50
        assert abs(d[d > 0].min() - (1.1 - 0.25)) < 0.05
    # Sphere is rotation invariant: projected mask areas agree across views.
    areas = [(np.asarray(depth[i]) > 0).sum() for i in range(4)]
    assert max(areas) - min(areas) < 0.1 * max(areas)


def test_generate_proposals_crops_and_masks():
    r = _small_renderer(2)
    mesh = _sphereish_mesh()
    rgb, depth = r.render(mesh)
    props, masks, boxes = r.generate_proposals(rgb, depth)
    assert props.shape == (2, 3, 84, 84)
    # The crop zooms the object: occupancy in the crop >> occupancy in frame.
    frame_occ = float((depth[0] > 0).mean())
    crop_occ = float((props[0].sum(0) > 0).mean())
    assert crop_occ > 2 * frame_occ
    b = np.asarray(boxes[0])
    assert b[0] < b[2] and b[1] < b[3]


def test_degenerate_mask_fallback():
    r = _small_renderer(2)
    # Mesh far off-screen: renders empty -> fallback square mask res/2.
    mesh = _sphereish_mesh()
    mesh = TriMesh(mesh.vertices + np.array([100.0, 0, 0], np.float32), mesh.faces, mesh.vertex_colors)
    rgb, depth = r.render(mesh)
    props, masks, boxes = r.generate_proposals(rgb, depth)
    assert int(masks[0].sum()) == 42 * 42
    np.testing.assert_array_equal(np.asarray(boxes[0]), [21, 21, 62, 62])


def test_render_template_views_pack_and_depth_codec():
    mesh = _sphereish_mesh()
    pack = render_template_views(
        mesh, n_poses=2, resolution=84, max_vertices=256, max_faces=512,
        settings=RasterSettings(resolution=84, tile=28, max_faces_per_tile=128),
    )
    assert pack["rgb"].shape == (2, 84, 84, 3)
    assert pack["poses"].shape == (2, 4, 4)
    d = np.asarray(pack["depth"][0])
    rt = decode_depth_png_mm(encode_depth_png_mm(d))
    np.testing.assert_allclose(rt, d, atol=1e-3)
