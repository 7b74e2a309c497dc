import os
import tempfile

import numpy as np
import pytest

from meshanything_tpu.geometry import (
    Mesh,
    load_mesh,
    save_obj,
    normalize_pc_cli,
    normalize_mesh_app,
    normalize_vertices,
    discretize,
    undiscretize,
    sample_surface_with_normals,
    faces_to_mesh,
)
from meshanything_tpu.geometry.postprocess import (
    merge_vertices,
    remove_degenerate_and_duplicate_faces,
    fix_normals,
)

REF = "/root/reference"


def _cube():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.float64
    )
    f = np.array(
        [[0, 2, 1], [0, 3, 2],            # bottom (z=0), outward = -z
         [4, 5, 6], [4, 6, 7],            # top
         [0, 1, 5], [0, 5, 4],            # y=0
         [2, 3, 7], [2, 7, 6],            # y=1
         [1, 2, 6], [1, 6, 5],            # x=1
         [3, 0, 4], [3, 4, 7]], dtype=np.int64
    )
    return v, f


def test_load_reference_obj():
    mesh = load_mesh(os.path.join(REF, "examples", "wand.obj"))
    assert mesh.vertices.shape[1] == 3
    assert mesh.faces.shape[1] == 3
    assert len(mesh.vertices) > 1000
    assert mesh.faces.min() >= 0
    assert mesh.faces.max() < len(mesh.vertices)


def test_obj_roundtrip(tmp_path):
    v, f = _cube()
    path = str(tmp_path / "cube.obj")
    save_obj(Mesh(v, f), path)
    back = load_mesh(path)
    np.testing.assert_allclose(back.vertices, v, atol=1e-7)
    np.testing.assert_array_equal(back.faces, f)


def test_normalize_pc_cli_contract(rng):
    # main.py:45-58: center at bbox midpoint, max |coord| == 0.9995
    pts = rng.normal(size=(4096, 3)) * 3 + 5
    normals = rng.normal(size=(4096, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    pc = np.concatenate([pts, normals], axis=-1)
    out = normalize_pc_cli(pc)
    assert out.dtype == np.float16
    coor = out[:, :3].astype(np.float64)
    assert abs(np.abs(coor).max() - 0.9995) < 1e-3
    lo, hi = coor.min(0), coor.max(0)
    # bbox midpoint at origin along the max-extent axis
    assert np.abs((lo + hi) / 2).max() < 2e-3


def test_normalize_pc_rejects_bad_normals(rng):
    pc = np.concatenate([rng.normal(size=(64, 3)), rng.normal(size=(64, 3)) * 0.1], axis=-1)
    with pytest.raises(ValueError):
        normalize_pc_cli(pc)


def test_normalize_mesh_app(rng):
    v, f = _cube()
    pc = rng.random((128, 3))
    nv, npc = normalize_mesh_app(v, pc)
    # mesh centered at origin, scaled by max extent (=1)
    assert np.allclose(nv.min(0), -0.5) and np.allclose(nv.max(0), 0.5)
    assert abs(np.abs(npc).max() - 0.9995) < 1e-9


def test_normalize_vertices_watertight():
    v, _ = _cube()
    scaled, center, factor = normalize_vertices(v, scale=0.9)
    np.testing.assert_allclose(center, [0.5, 0.5, 0.5])
    assert np.allclose(scaled.max(0) - scaled.min(0), 1.8)
    np.testing.assert_allclose((v - center) * factor, scaled)


def test_discretize_roundtrip():
    # undiscretize(meshanything.py:214-223): t/128 - 0.5. Bin centers map
    # back to themselves under discretize.
    bins = np.arange(128)
    coords = undiscretize(bins)
    np.testing.assert_allclose(coords, bins / 128.0 - 0.5)
    back = discretize(coords)
    np.testing.assert_array_equal(back, bins)


def test_sample_surface(rng):
    v, f = _cube()
    pc = sample_surface_with_normals(v, f, 4096, rng)
    assert pc.shape == (4096, 6) and pc.dtype == np.float16
    pts = pc[:, :3].astype(np.float64)
    assert (pts.min() >= -1e-3) and (pts.max() <= 1 + 1e-3)
    # normals unit
    n = pc[:, 3:].astype(np.float64)
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-2)
    # on a cube each face pair has area 1/6 of total: check rough balance
    on_z0 = np.abs(pts[:, 2]) < 1e-6
    assert 0.1 < on_z0.mean() < 0.25


def test_merge_vertices():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 0, 0]], dtype=np.float64)
    f = np.array([[0, 1, 2], [0, 3, 2]])
    nv, nf = merge_vertices(v, f)
    assert len(nv) == 3
    assert np.array_equal(nf[0], nf[1])


def test_unique_faces():
    f = np.array([[0, 1, 2], [2, 0, 1], [1, 1, 2], [3, 4, 5]])
    out = remove_degenerate_and_duplicate_faces(f)
    # [2,0,1] is a duplicate of [0,1,2] modulo rotation; [1,1,2] degenerate
    assert len(out) == 2
    assert np.array_equal(out[0], [0, 1, 2])
    assert np.array_equal(out[1], [3, 4, 5])


def test_fix_normals_consistency():
    v, f = _cube()
    # break the winding of half the faces
    broken = f.copy()
    broken[::2] = broken[::2, ::-1]
    fixed = fix_normals(v, broken)
    mesh = Mesh(v, fixed)
    # signed volume of a unit cube with outward normals = +1
    tri = v[fixed]
    vol = np.einsum("ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])).sum() / 6
    assert abs(vol - 1.0) < 1e-9
    # all normals point away from the centroid
    centers = tri.mean(axis=1) - 0.5
    assert (np.einsum("ij,ij->i", mesh.face_normals, centers) > 0).all()


def test_faces_to_mesh_nan_filter():
    v, f = _cube()
    coords = v[f].astype(np.float64)  # (12, 3, 3)
    padded = np.concatenate([coords, np.full((4, 3, 3), np.nan)], axis=0)
    mesh = faces_to_mesh(padded)
    assert len(mesh.faces) == 12
    assert len(mesh.vertices) == 8  # merged back to cube corners
    assert mesh.face_colors is not None and mesh.face_colors.shape == (12, 4)


def test_mouse_npy_pipeline():
    pc = np.load(os.path.join(REF, "pc_examples", "mouse.npy"))
    assert pc.shape[0] >= 4096
    out = normalize_pc_cli(pc[:4096])
    assert out.shape == (4096, 6)


def test_fix_normals_vectorized_matches_bfs_oracle():
    """The scipy doubled-graph fix_normals must reproduce the BFS
    reference on multi-component meshes with randomly broken winding
    (including a component needing a whole-component volume flip)."""
    from meshanything_tpu.geometry.postprocess import _fix_normals_bfs

    rng = np.random.default_rng(7)
    h = 0.5
    cv = np.array([[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
                   [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]])
    cf = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                   [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                   [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    V, F, off = [], [], 0
    for i in range(4):
        f = cf.copy()
        flip = rng.random(len(f)) < 0.5
        f[flip] = f[flip][:, ::-1]
        if i == 3:
            f = f[:, ::-1]  # fully inverted component: volume flip path
        F.append(f + off)
        V.append(cv + np.array([i * 3.0, 0.0, 0.0]))
        off += len(cv)
    V, F = np.concatenate(V), np.concatenate(F)

    fixed = fix_normals(V, F)
    oracle = _fix_normals_bfs(V, F)
    np.testing.assert_array_equal(fixed, oracle)
    # and the result is outward: positive total signed volume
    tri = V[fixed]
    vol = np.einsum("ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2])).sum() / 6
    assert vol > 3.9  # 4 unit cubes


def _tetra():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    f = np.array([[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]])
    return v, f


def test_load_stl_binary_and_ascii(tmp_path):
    """STL (binary + ascii): trimesh.load accepts it in the reference
    driver (main.py:33); per-triangle vertices survive and merge back."""
    import struct

    from meshanything_tpu.geometry.obj_io import load_mesh
    from meshanything_tpu.geometry.postprocess import merge_vertices

    v, f = _tetra()
    tri = v[f].astype(np.float32)
    # binary
    blob = b"\x00" * 80 + struct.pack("<I", len(tri))
    for t in tri:
        blob += struct.pack("<3f", 0, 0, 0)
        for p in t:
            blob += struct.pack("<3f", *p)
        blob += b"\x00\x00"
    p_bin = tmp_path / "t.stl"
    p_bin.write_bytes(blob)
    m = load_mesh(str(p_bin))
    assert m.faces.shape == (4, 3)
    mv, mf = merge_vertices(m.vertices, m.faces)
    assert len(mv) == 4
    np.testing.assert_allclose(np.sort(mv, axis=0), np.sort(v, axis=0))

    # ascii
    lines = ["solid t"]
    for t in tri:
        lines += ["facet normal 0 0 0", "outer loop"]
        lines += [f"vertex {p[0]} {p[1]} {p[2]}" for p in t]
        lines += ["endloop", "endfacet"]
    lines.append("endsolid t")
    p_asc = tmp_path / "ta.stl"
    p_asc.write_text("\n".join(lines) + "\n")
    m2 = load_mesh(str(p_asc))
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-6)


def test_load_stl_binary_solid_header_with_padding(tmp_path):
    """Binary STL whose 80-byte header starts with 'solid' (SolidWorks
    style) and carries a trailing padding byte: the record-size
    arithmetic (>=, trimesh-style) must still route it to the binary
    parser instead of crashing in the ASCII one."""
    import struct

    from meshanything_tpu.geometry.obj_io import detect_mesh_format, load_mesh

    v, f = _tetra()
    tri = v[f].astype(np.float32)
    header = b"solid exported-part" + b"\x00" * 61
    blob = header + struct.pack("<I", len(tri))
    for t in tri:
        blob += struct.pack("<3f", 0, 0, 0)
        for p in t:
            blob += struct.pack("<3f", *p)
        blob += b"\x00\x00"
    blob += b"\n"  # trailing padding byte
    p = tmp_path / "padded.stl"
    p.write_bytes(blob)
    m = load_mesh(str(p))
    assert m.faces.shape == (4, 3)
    assert detect_mesh_format(blob) == "stl"


def test_load_off_rejects_variants(tmp_path):
    """COFF/NOFF carry extra per-vertex fields this parser does not
    model — must refuse clearly, not silently corrupt coordinates."""
    from meshanything_tpu.geometry.obj_io import load_mesh

    v, f = _tetra()
    lines = ["COFF", f"{len(v)} {len(f)} 0"]
    lines += [f"{p[0]} {p[1]} {p[2]} 255 0 0 255" for p in v]
    lines += ["3 " + " ".join(str(i) for i in tri) for tri in f]
    p = tmp_path / "t.off"
    p.write_text("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="plain OFF"):
        load_mesh(str(p))


def test_load_off(tmp_path):
    from meshanything_tpu.geometry.obj_io import load_mesh

    v, f = _tetra()
    lines = ["OFF", f"{len(v)} {len(f)} 0"]
    lines += [f"{p[0]} {p[1]} {p[2]}" for p in v]
    lines += ["3 " + " ".join(str(i) for i in tri) for tri in f]
    # plus a quad to exercise fan triangulation
    lines[1] = f"{len(v)} {len(f) + 1} 0"
    lines.append("4 0 1 2 3")
    p = tmp_path / "t.off"
    p.write_text("\n".join(lines) + "\n")
    m = load_mesh(str(p))
    np.testing.assert_allclose(m.vertices, v)
    assert len(m.faces) == len(f) + 2  # quad -> two triangles


def test_detect_mesh_format(tmp_path):
    """Byte sniffing for HTTP uploads (no filename): every supported
    format resolves to the right loader."""
    import struct

    from meshanything_tpu.geometry.obj_io import detect_mesh_format

    assert detect_mesh_format(b"# comment\nv 0 0 0\nf 1 1 1\n") == "obj"
    assert detect_mesh_format(b"v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n") == "obj"
    assert detect_mesh_format(b"ply\nformat ascii 1.0\n") == "ply"
    assert detect_mesh_format(b"OFF\n4 4 0\n") == "off"
    # OFF family routes to load_off for a clear variant refusal
    assert detect_mesh_format(b"COFF\n4 1 0\n") == "off"
    assert detect_mesh_format(b"OFFSET 1 2 3\n") == "obj"
    assert detect_mesh_format(b"solid thing\nfacet normal 0 0 0\n") == "stl"
    assert detect_mesh_format(b"glTF" + b"\x00" * 16) == "glb"
    bin_stl = b"\x00" * 80 + struct.pack("<I", 1) + b"\x00" * 50
    assert detect_mesh_format(bin_stl) == "stl"


def test_load_glb(tmp_path):
    """Minimal binary glTF with an indexed triangle mesh under a
    translated node: geometry + node transform must round-trip."""
    import json
    import struct

    from meshanything_tpu.geometry.obj_io import load_mesh

    v, f = _tetra()
    pos = v.astype("<f4").tobytes()
    idx = f.astype("<u2").tobytes()
    idx += b"\x00" * (-len(idx) % 4)
    blob = pos + idx
    js = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0, "translation": [1.0, 2.0, 3.0]}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(v),
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": f.size,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos)},
            {"buffer": 0, "byteOffset": len(pos), "byteLength": len(idx)},
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    jbytes = json.dumps(js).encode()
    jbytes += b" " * (-len(jbytes) % 4)
    glb = b"glTF" + struct.pack("<II", 2, 12 + 8 + len(jbytes) + 8 + len(blob))
    glb += struct.pack("<I4s", len(jbytes), b"JSON") + jbytes
    glb += struct.pack("<I4s", len(blob), b"BIN\x00") + blob
    p = tmp_path / "t.glb"
    p.write_bytes(glb)

    m = load_mesh(str(p))
    np.testing.assert_allclose(m.vertices, v + np.array([1.0, 2.0, 3.0]))
    np.testing.assert_array_equal(m.faces, f)


def test_fix_normals_nonmanifold_fin():
    """A non-manifold edge (3 incident faces: two cube faces + a fin,
    the triangle-soup case merge_vertices can produce) must not poison
    the 2-coloring: the cube's winding is still repaired through its
    manifold edges, and the cube ends up outward-oriented (advisor r2:
    the doubled graph previously linked through the 3-incident edge and
    could collapse an orientable component to 'non-orientable')."""
    h = 0.5
    cv = np.array([[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
                   [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]])
    cf = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                   [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                   [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    # fin hanging off cube edge (0, 1) -> that edge now has 3 incident
    # faces; its traversal direction matches face [0, 2, 1]'s (0->1 via
    # 1? [0,2,1] edges: (0,2),(2,1),(1,0)) — direction irrelevant, the
    # point is 3 incidences
    fin_apex = len(cv)
    V = np.concatenate([cv, [[0.0, -2 * h, 0.0]]])
    flipped = cf.copy()
    flipped[[3, 7, 10]] = flipped[[3, 7, 10], ::-1]  # break some winding
    F = np.concatenate([flipped, [[0, 1, fin_apex]]])

    fixed = fix_normals(V, F)
    # the 12 cube faces must be mutually consistent AND outward
    tri = V[fixed[:12]]
    vols = np.einsum("ij,ij->i", tri[:, 0], np.cross(tri[:, 1], tri[:, 2]))
    assert vols.sum() / 6 > 0.99  # unit cube, outward
    centers = tri.mean(axis=1)
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    assert (np.einsum("ij,ij->i", normals, centers) > 0).all()
