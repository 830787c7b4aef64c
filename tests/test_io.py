import numpy as np
import pytest
import torch

from freepose_tpu.io import bop_csv, mesh as meshio, proposals_json, rle


def _torch_rle_oracle(masks: np.ndarray):
    """Independent RLE oracle with the pycoco/SAM2 convention (Fortran order,
    0-run first), written directly against the spec."""
    out = []
    for m in masks:
        h, w = m.shape
        flat = torch.tensor(m, dtype=torch.bool).T.reshape(-1).numpy()
        counts = []
        parity = False
        run = 0
        for px in flat:
            if bool(px) == parity:
                run += 1
            else:
                counts.append(run)
                parity = not parity
                run = 1
        counts.append(run)
        out.append({"size": [h, w], "counts": counts})
    return out


def test_rle_roundtrip_and_oracle():
    rng = np.random.default_rng(0)
    masks = rng.random((4, 17, 23)) > 0.6
    encoded = rle.encode_rle_batch(masks)
    oracle = _torch_rle_oracle(masks)
    for e, o, m in zip(encoded, oracle, masks):
        assert e["size"] == o["size"]
        assert e["counts"] == o["counts"]
        np.testing.assert_array_equal(rle.decode_rle(e), m)
        assert rle.rle_area(e) == int(m.sum())


def test_rle_edge_cases():
    all_zero = np.zeros((5, 7), bool)
    all_one = np.ones((5, 7), bool)
    for m in (all_zero, all_one):
        e = rle.encode_rle(m)
        np.testing.assert_array_equal(rle.decode_rle(e), m)
    assert rle.encode_rle(all_zero)["counts"] == [35]
    assert rle.encode_rle(all_one)["counts"] == [0, 35]


def test_rle_bad_counts_raises():
    with pytest.raises(ValueError):
        rle.decode_rle({"size": [4, 4], "counts": [3]})


def test_bop_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    results = [
        bop_csv.PoseResult(
            scene_id=48, im_id=i, obj_id=f"mesh{i}", score=0.9 - i * 0.1,
            R=np.linalg.qr(rng.normal(size=(3, 3)))[0],
            t=rng.normal(size=3),
            bbox_visib=np.array([1.0, 2, 30, 40]),
            scale=0.15, time=0.2,
        )
        for i in range(3)
    ]
    path = tmp_path / "poses.csv"
    bop_csv.write_results_csv(results, path, t_scale=1000.0)  # static: mm
    back = bop_csv.read_results_csv(path, t_scale=1000.0)
    for a, b in zip(results, back):
        assert a.scene_id == b.scene_id and a.im_id == b.im_id
        np.testing.assert_allclose(a.R, b.R, atol=1e-12)
        np.testing.assert_allclose(a.t, b.t, atol=1e-9)
        np.testing.assert_allclose(a.bbox_visib, b.bbox_visib)
    # Raw file spot-check: t stored in millimetres, R 9 space-separated floats.
    raw = path.read_text().splitlines()
    assert raw[0] == "scene_id,im_id,obj_id,score,R,t,bbox_visib,scale,time"
    assert len(raw[1].split(",")[4].split(" ")) == 9


def test_merge_results(tmp_path):
    r = bop_csv.PoseResult(1, 1, "m", 1.0, np.eye(3), np.zeros(3))
    p1, p2 = tmp_path / "a.csv", tmp_path / "b.csv"
    bop_csv.write_results_csv([r], p1)
    bop_csv.write_results_csv([r, r], p2)
    out = tmp_path / "merged.csv"
    bop_csv.merge_result_csvs([p1, p2], out)
    assert len(bop_csv.read_results_csv(out)) == 3


def test_proposals_json_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    mask = rng.random((32, 40)) > 0.5
    entry = proposals_json.proposal_entry(
        np.array([3, 4, 20, 25]), mask, "abc123", 0.7, 5, 9, scale=0.12
    )
    path = tmp_path / "props.json"
    proposals_json.save_proposals([entry], path)
    loaded = proposals_json.load_proposals(path)
    assert loaded[0]["bbox"] == [3, 4, 17, 21]
    assert loaded[0]["mesh"] == "abc123"
    assert loaded[0]["scale"] == pytest.approx(0.12)
    np.testing.assert_array_equal(proposals_json.proposal_mask(loaded[0]), mask)
    np.testing.assert_array_equal(proposals_json.proposal_bbox_xyxy(loaded[0]), [3, 4, 20, 25])
    assert proposals_json.filter_by_frame(loaded, 5, 9) == loaded
    assert proposals_json.filter_by_frame(loaded, 5, 10) == []


def _cube_mesh():
    v = np.array(
        [[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0], [0, 0, 2], [2, 0, 2], [2, 2, 2], [0, 2, 2]],
        dtype=np.float32,
    )
    f = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 6, 5], [4, 7, 6], [0, 4, 5], [0, 5, 1],
         [1, 5, 6], [1, 6, 2], [2, 6, 7], [2, 7, 3], [3, 7, 4], [3, 4, 0]],
        dtype=np.int32,
    )
    return meshio.TriMesh(v, f)


def test_mesh_normalize_and_sample():
    m = _cube_mesh().normalized()
    lo, hi = m.bounds()
    np.testing.assert_allclose(lo, [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(hi, [1, 1, 1], atol=1e-6)
    assert m.half_extent() == pytest.approx(1.0)
    pts = m.sample_surface(500, seed=0)
    assert pts.shape == (500, 3)
    # All samples on the cube surface: at least one coordinate = ±1.
    on_face = np.isclose(np.abs(pts), 1.0, atol=1e-5).any(axis=1)
    assert on_face.all()


def test_obj_roundtrip(tmp_path):
    m = _cube_mesh()
    m.vertex_colors = np.tile(np.array([[0.5, 0.25, 1.0]], np.float32), (8, 1))
    path = tmp_path / "cube.obj"
    meshio.save_obj(m, path)
    back = meshio.load_obj(path)
    np.testing.assert_allclose(back.vertices, m.vertices)
    np.testing.assert_array_equal(back.faces, m.faces)
    np.testing.assert_allclose(back.vertex_colors, m.vertex_colors)


def test_ply_ascii_and_binary(tmp_path):
    m = _cube_mesh()
    ascii_ply = tmp_path / "cube_ascii.ply"
    with ascii_ply.open("w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(m.vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(m.faces)}\nproperty list uchar int vertex_indices\nend_header\n")
        for v in m.vertices:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for face in m.faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
    back = meshio.load_ply(ascii_ply)
    np.testing.assert_allclose(back.vertices, m.vertices)
    np.testing.assert_array_equal(back.faces, m.faces)

    bin_ply = tmp_path / "cube_bin.ply"
    with bin_ply.open("wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(m.vertices)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(m.faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        f.write(m.vertices.astype("<f4").tobytes())
        for face in m.faces:
            f.write(np.uint8(3).tobytes() + face.astype("<i4").tobytes())
    back = meshio.load_ply(bin_ply)
    np.testing.assert_allclose(back.vertices, m.vertices)
    np.testing.assert_array_equal(back.faces, m.faces)


def test_pad_mesh():
    m = _cube_mesh()
    v, c, f, valid = meshio.pad_mesh(m, 16, 20)
    assert v.shape == (16, 3) and f.shape == (20, 3) and c.shape == (16, 3)
    assert valid.sum() == 12
    np.testing.assert_allclose(v[:8], m.vertices)


def test_decimate_vertex_clustering():
    from freepose_tpu.io.mesh import decimate_vertex_clustering

    # Dense sphere: 60x60 grid -> ~7k faces; decimate to <= 1000.
    n_lat, n_lon = 60, 60
    verts, faces = [], []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            verts.append([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph), np.cos(th)])
    for i in range(n_lat):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    rng = np.random.default_rng(0)
    v = np.asarray(verts, np.float32)
    mesh = meshio.TriMesh(v, np.asarray(faces, np.int32), rng.random((len(v), 3)).astype(np.float32))
    dec = decimate_vertex_clustering(mesh, target_faces=1000)
    assert 0 < dec.num_faces <= 1000
    # Shape preserved: decimated vertices stay near the unit sphere.
    radii = np.linalg.norm(dec.vertices, axis=1)
    assert abs(radii.mean() - 1.0) < 0.1
    assert dec.vertex_colors is not None and dec.vertex_colors.shape[0] == dec.num_vertices
    # No degenerate faces.
    f = dec.faces
    assert ((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])).all()
    # Small meshes pass through untouched.
    assert decimate_vertex_clustering(dec, target_faces=10**6) is dec


def test_check_bop_results(tmp_path):
    r1 = bop_csv.PoseResult(1, 1, "m", 1.0, np.eye(3), np.zeros(3), time=0.5)
    r2 = bop_csv.PoseResult(1, 1, "n", 0.9, np.eye(3), np.ones(3), time=0.5)
    ok_path = tmp_path / "ok.csv"
    bop_csv.write_results_csv([r1, r2], ok_path)
    ok, msg = bop_csv.check_bop_results(ok_path)
    assert ok and msg == "OK"

    # Mismatched per-image times fail (reference inout.py:397-414).
    r3 = bop_csv.PoseResult(1, 1, "n", 0.9, np.eye(3), np.ones(3), time=0.7)
    bad_path = tmp_path / "bad.csv"
    bop_csv.write_results_csv([r1, r3], bad_path)
    ok, msg = bop_csv.check_bop_results(bad_path)
    assert not ok and "running time" in msg

    # Garbage file fails gracefully.
    junk = tmp_path / "junk.csv"
    junk.write_text("not,a,results,file\n1,2,3,4\n")
    ok, msg = bop_csv.check_bop_results(junk)
    assert not ok


def test_textured_obj_subdivides_and_bakes(tmp_path):
    """A low-poly textured quad must subdivide toward the raster budget so
    baked vertex colors capture texture detail (checkerboard -> both colors
    present, spatially correlated with the texture)."""
    from PIL import Image
    from freepose_tpu.io import mesh as meshio

    # checkerboard texture: left half red, right half blue
    tex = np.zeros((64, 64, 3), np.uint8)
    tex[:, :32] = [255, 0, 0]
    tex[:, 32:] = [0, 0, 255]
    Image.fromarray(tex).save(tmp_path / "tex.png")
    (tmp_path / "mesh.mtl").write_text("newmtl m\nmap_Kd tex.png\n")
    (tmp_path / "mesh.obj").write_text(
        "mtllib mesh.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n"
    )
    m = meshio.load_obj(tmp_path / "mesh.obj")
    assert m.num_faces > 1000, "expected subdivision toward the raster budget"
    assert m.num_faces <= meshio.TEXTURE_BAKE_MAX_FACES
    assert m.num_vertices <= meshio.TEXTURE_BAKE_MAX_VERTICES
    assert m.vertex_colors is not None
    # u<0.45 -> red, u>0.55 -> blue (x == u on this quad)
    left = m.vertex_colors[m.vertices[:, 0] < 0.45]
    right = m.vertex_colors[m.vertices[:, 0] > 0.55]
    assert len(left) > 50 and len(right) > 50
    assert (np.abs(left - [1.0, 0, 0]) < 1e-6).all()
    assert (np.abs(right - [0, 0, 1.0]) < 1e-6).all()
    # geometry unchanged: still the unit quad
    np.testing.assert_allclose(m.vertices.min(0), [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(m.vertices.max(0), [1, 1, 0], atol=1e-6)


def test_textured_obj_uv_seam_splits_vertices(tmp_path):
    """Two triangles sharing vertices but with DIFFERENT UVs (a seam): the
    shared vertices must split so each side keeps its own color."""
    from PIL import Image
    from freepose_tpu.io import mesh as meshio

    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = [255, 0, 0]
    tex[:, 4:] = [0, 255, 0]
    Image.fromarray(tex).save(tmp_path / "t.png")
    (tmp_path / "m.mtl").write_text("newmtl m\nmap_Kd t.png\n")
    # both triangles map fully into one texture half each, sharing an edge
    (tmp_path / "m.obj").write_text(
        "mtllib m.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0.1 0.5\nvt 0.9 0.5\n"
        "f 1/1 2/1 3/1\nf 2/2 4/2 3/2\n"
    )
    m = meshio.load_obj(tmp_path / "m.obj")
    reds = (np.abs(m.vertex_colors - [1, 0, 0]) < 1e-6).all(1).sum()
    greens = (np.abs(m.vertex_colors - [0, 1, 0]) < 1e-6).all(1).sum()
    assert reds > 0 and greens > 0, "seam faces must keep their own colors"
