"""IO helpers + textured export (reference utils/io.py + graphics/primitives/mesh.py)."""
import io
import json
import os
import tarfile
import zlib

import numpy as np

from meshanything_tpu.utils import (
    MeshOutput,
    extract_tar,
    json_loads,
    load_json,
    mkdir,
    npy_loads,
    npz_loads,
    save_textured_obj,
    write_json,
    write_png,
)


def test_json_and_npy_roundtrips(tmp_path, rng):
    p = str(tmp_path / "a" / "b")
    assert mkdir(p) == p and os.path.isdir(p)

    write_json(str(tmp_path / "x.json"), {"k": [1, 2]})
    assert load_json(str(tmp_path / "x.json")) == {"k": [1, 2]}
    assert json_loads('{"a": 1}') == {"a": 1}

    arr = rng.normal(size=(3, 4)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, arr)
    np.testing.assert_array_equal(npy_loads(buf.getvalue()), arr)

    buf = io.BytesIO()
    np.savez(buf, a=arr)
    np.testing.assert_array_equal(npz_loads(buf.getvalue())["a"], arr)


def test_extract_tar(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "u1.txt").write_text("x")
    (src / "u2.txt").write_text("y")
    tar_path = str(tmp_path / "shard.tar")
    with tarfile.open(tar_path, "w") as tar:
        tar.add(str(src / "u1.txt"), arcname="u1.txt")
        tar.add(str(src / "u2.txt"), arcname="u2.txt")
    out = tmp_path / "cache"
    uids = extract_tar(tar_path, str(out))
    assert uids == ["u1.txt", "u2.txt"]


def test_write_png_valid(tmp_path, rng):
    img = (rng.uniform(0, 255, size=(5, 7, 3))).astype(np.uint8)
    p = write_png(img, str(tmp_path / "t.png"))
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # decode IDAT and verify pixel bytes round-trip (filter 0 per row)
    idat = data.split(b"IDAT")[1]
    length = int.from_bytes(data.split(b"IDAT")[0][-4:], "big")
    raw = zlib.decompress(idat[:length])
    rows = [raw[i * (1 + 7 * 3) + 1:(i + 1) * (1 + 7 * 3)] for i in range(5)]
    got = np.frombuffer(b"".join(rows), np.uint8).reshape(5, 7, 3)
    np.testing.assert_array_equal(got, img)


def test_textured_obj_export(tmp_path, rng):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    f = np.array([[0, 1, 2]])
    uv = np.array([[0, 0], [1, 0], [0, 1]], float)
    tex = (rng.uniform(0, 255, size=(4, 4, 3))).astype(np.uint8)
    fname = str(tmp_path / "m.obj")
    save_textured_obj(v, uv, f, f, tex, fname)
    text = open(fname).read()
    assert text.startswith("mtllib m.mtl")
    assert "vt 0.000000 0.000000" in text
    assert "f 1/1 2/2 3/3" in text
    assert os.path.exists(str(tmp_path / "m.mtl"))
    assert os.path.exists(str(tmp_path / "m.png"))
    mtl = open(str(tmp_path / "m.mtl")).read()
    assert "map_Kd m.png" in mtl


def test_mesh_output_dispatch(tmp_path, rng):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    f = np.array([[0, 1, 2]])
    # plain
    MeshOutput(v, f).export(str(tmp_path / "plain.obj"))
    assert open(str(tmp_path / "plain.obj")).read().startswith("v ")
    # vertex colors (3-channel auto-padded to RGBA)
    MeshOutput(v, f, vertex_colors=np.full((3, 3), 255, np.uint8)).export(
        str(tmp_path / "vc.obj"))
    first = open(str(tmp_path / "vc.obj")).read().splitlines()[0]
    assert first.count(" ") == 6  # v x y z r g b
    # textured
    uv = np.array([[0, 0], [1, 0], [0, 1]], float)
    tex = np.zeros((2, 2, 3), np.uint8)
    m = MeshOutput(v, f, uvs=uv, mesh_tex_idx=f, tex_map=tex)
    assert m.contain_uv_texture()
    m.export(str(tmp_path / "tex.obj"))
    assert os.path.exists(str(tmp_path / "tex.png"))
