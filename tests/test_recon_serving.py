"""VAE reconstruction path + serving engine tests (CPU, small config)."""
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.config import PerceiverConfig, small_test_config
from meshanything_tpu.models import perceiver as per_mod
from meshanything_tpu.models import meshanything as ma
from meshanything_tpu.runtime.recon import extract_geometry, generate_dense_grid_points


def test_dense_grid_points():
    xyz, length, grid_size = generate_dense_grid_points(
        np.array([-1.0, -1.0, -1.0]), np.array([1.0, 1.0, 1.0]), octree_depth=3
    )
    assert grid_size == [9, 9, 9]
    assert xyz.shape == (729, 3)
    np.testing.assert_allclose(length, [2, 2, 2])
    np.testing.assert_allclose(xyz[0], [-1, -1, -1])
    np.testing.assert_allclose(xyz[-1], [1, 1, 1])


def test_extract_geometry_runs(rng):
    cfg = PerceiverConfig(
        num_latents=8, embed_dim=8, width=48, heads=4,
        num_encoder_layers=1, num_decoder_layers=1, num_points=32,
    )
    params = per_mod.init_perceiver_params(jax.random.PRNGKey(0), cfg)
    kl_embed = jnp.asarray(rng.normal(size=(1, 8, 8)).astype(np.float32))
    decoded = per_mod.decode_latents(params, cfg, kl_embed)
    meshes = extract_geometry(params, cfg, decoded, octree_depth=4, num_chunks=512)
    assert len(meshes) == 1
    # random weights may or may not cross zero; either a mesh or None
    if meshes[0] is not None:
        assert meshes[0].vertices.shape[1] == 3


def _cube_obj_bytes(tmp_path):
    from meshanything_tpu.geometry import Mesh, save_obj

    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    obj_path = tmp_path / "cube.obj"
    save_obj(Mesh(v, f), str(obj_path))
    return obj_path.read_bytes()


def test_serving_http_roundtrip(tmp_path, rng):
    """HTTP e2e against the REAL generate_from_mesh (small config): raw
    OBJ response with artifact headers, JSON response carrying both OBJ
    artifacts and both wireframe preview renders (app.py:172 parity),
    and the error path."""
    import base64

    from meshanything_tpu.serving import ServingEngine, _make_handler
    from http.server import ThreadingHTTPServer

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    engine = ServingEngine(params, cfg, bucket=16, artifacts_dir=str(tmp_path / "artifacts"))

    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert r.read() == b"ok"

        body = _cube_obj_bytes(tmp_path)

        # raw OBJ mode + artifact headers
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body, method="POST",
            headers={"X-Seed": "0"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert "X-Faces-Generated" in r.headers
            assert os.path.exists(r.headers["X-Input-Obj"])
            # renders are eventually-consistent; the contract is explicit
            assert r.headers["X-Renders-Async"] == "1"
            render_paths = [r.headers["X-Input-Render"], r.headers["X-Output-Render"]]
            text = r.read().decode()
            assert text.startswith("#") or text.startswith("v") or text.strip() == ""
        # renders are written off the request thread — they land shortly
        # after the response
        import time as _time

        deadline = _time.time() + 20
        while not all(os.path.exists(p) for p in render_paths):
            assert _time.time() < deadline, render_paths
            _time.sleep(0.05)

        # X-Renders: 0 skips preview rendering entirely
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body, method="POST",
            headers={"X-Seed": "0", "X-Renders": "0"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert "X-Input-Render" not in r.headers
            assert "X-Output-Render" not in r.headers

        # non-OBJ upload: binary STL body is sniffed and loaded
        import struct as _struct

        from meshanything_tpu.geometry import load_mesh as _lm  # noqa: F401

        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
        fidx = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                         [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                         [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
        tri = v[fidx].astype(np.float32)
        stl = b"\x00" * 80 + _struct.pack("<I", len(tri))
        for t in tri:
            stl += _struct.pack("<3f", 0, 0, 0)
            for p in t:
                stl += _struct.pack("<3f", *p)
            stl += b"\x00\x00"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=stl, method="POST",
            headers={"X-Seed": "0", "X-Renders": "0"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert int(r.headers["X-Faces-Generated"]) >= 0

        # JSON mode: both OBJs + both preview PNGs inline
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body, method="POST",
            headers={"X-Seed": "0", "Accept": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            payload = json.loads(r.read())
        assert payload["input_obj"].startswith("v ")
        # orange vertex colors ride the OBJ vertex lines (app.py:120)
        assert payload["input_obj"].splitlines()[0].count(" ") == 6
        assert payload["output_obj"] is not None
        for k in ("input_render_png_b64", "output_render_png_b64"):
            png = base64.b64decode(payload[k])
            assert png[:8] == b"\x89PNG\r\n\x1a\n", k
        assert payload["faces_final"] >= 0

        # error path: garbage body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"not an obj \xff\xfe", method="POST",
        )
        try:
            urllib.request.urlopen(req)
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # error path: truncated binary format (sniffed as GLB, loader
        # raises struct.error) must be a 400, not a dropped connection
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"glTF\x02\x00", method="POST",
        )
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_engine_exports_timestamped_artifacts(tmp_path, rng):
    """generate_from_mesh writes processed_input_*.obj / output_*.obj +
    wireframe renders (reference app.py:116-127,144-172)."""
    from meshanything_tpu.serving import ServingEngine

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    engine = ServingEngine(params, cfg, bucket=16, artifacts_dir=str(tmp_path / "a"))

    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    result = engine.generate_from_mesh(v, f, seed=0)
    assert os.path.basename(result["input_obj_path"]).startswith("processed_input_")
    assert os.path.basename(result["output_obj_path"]).startswith("output_")
    for k in ("input_obj_path", "output_obj_path", "input_render_path", "output_render_path"):
        assert os.path.exists(result[k]), k
    # input mesh normalized to the unit bbox and orange-colored
    span = result["input_mesh"].vertices.max(0) - result["input_mesh"].vertices.min(0)
    assert span.max() <= 1.0 + 1e-9
    np.testing.assert_array_equal(result["input_mesh"].vertex_colors[0], [255, 165, 0, 255])
    np.testing.assert_array_equal(result["mesh"].face_colors[0] if len(result["mesh"].faces) else [165, 42, 42, 255],
                                  [165, 42, 42, 255])


def test_engine_fast_tier_composes(tmp_path, rng):
    """The --fast serving preset's stack (w8a8 weights + int8 KV +
    lookahead) composes end-to-end through ServingEngine (VERDICT r3
    #2: the fast tier must be the user-facing path, not only an
    engine-level probe). CPU runs the Pallas kernels in interpret
    mode; on TPU the same knobs give ~2.3 s/mesh (PERF.md r3)."""
    from meshanything_tpu.serving import ServingEngine

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    engine = ServingEngine(params, cfg, bucket=16, attn="pallas_int8",
                           lookahead=2, wq=True,
                           artifacts_dir=str(tmp_path / "a"))

    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5],
                  [0, 5, 4], [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5],
                  [3, 0, 4], [3, 4, 7]])
    res = engine.generate_from_mesh(v, f, seed=0, render="off")
    assert os.path.exists(res["output_obj_path"])


def test_engine_render_modes(tmp_path, rng):
    """render='async' returns before the previews land (join completes
    them); render='off' writes no PNGs at all."""
    from meshanything_tpu.serving import ServingEngine

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    engine = ServingEngine(params, cfg, bucket=16, artifacts_dir=str(tmp_path / "a"))

    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5],
                  [0, 5, 4], [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5],
                  [3, 0, 4], [3, 4, 7]])

    res = engine.generate_from_mesh(v, f, seed=0, render="async")
    assert "render_thread" in res
    res["render_thread"].join(timeout=30)
    for k in ("input_render_path", "output_render_path"):
        assert os.path.exists(res[k]), k

    res_off = engine.generate_from_mesh(v, f, seed=0, render="off")
    assert "input_render_path" not in res_off
    assert "output_render_path" not in res_off
    assert os.path.exists(res_off["output_obj_path"])


def test_serving_http_completion(tmp_path, rng):
    """Mesh completion over HTTP: X-Partial-Obj-B64 seeds the decoder
    and the stream echoes the discretized partial faces."""
    import base64

    from http.server import ThreadingHTTPServer

    from meshanything_tpu.serving import ServingEngine, _make_handler

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    engine = ServingEngine(params, cfg, bucket=16, artifacts_dir=str(tmp_path / "a"))

    # direct engine path first (shared by gradio + HTTP)
    v = rng.normal(size=(8, 3)) * 0.2
    f = np.array([[0, 1, 2], [3, 4, 5]])
    partial = v[np.array([[0, 1, 2]])]  # one face, model space
    res = engine.generate_from_mesh(v, f, partial_faces=partial,
                                    export_artifacts=False)
    assert res["faces_generated"] >= 0

    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = _cube_obj_bytes(tmp_path)
        partial_obj = (b"v -0.2 0.0 -0.2\nv 0.2 0.0 -0.2\nv 0.0 0.1 0.2\nf 1 2 3\n")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body, method="POST",
            headers={"X-Seed": "0",
                     "X-Partial-Obj-B64": base64.b64encode(partial_obj).decode()},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert "X-Faces-Generated" in r.headers

        # client errors on the completion path are 400s with the
        # validation message, not generic 500s (advisor r2)
        def expect_400(headers, msg_frag):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body, method="POST",
                headers=headers)
            try:
                urllib.request.urlopen(req)
                raise AssertionError("expected HTTPError")
            except urllib.error.HTTPError as e:
                assert e.code == 400, e.code
                payload = json.loads(e.read())
                assert msg_frag in payload["error"], payload

        expect_400({"X-Partial-Obj-B64": "!!!not-base64!!!"}, "Error")
        # oversized partial: more prompt faces than the face budget
        # (n_max_triangles=2) allows
        big = "".join(
            f"v {i * 0.001} 0 0\nv {i * 0.001} 0.1 0\nv {i * 0.001} 0 0.1\n"
            f"f {3 * i + 1} {3 * i + 2} {3 * i + 3}\n"
            for i in range(4)
        ).encode()
        expect_400({"X-Partial-Obj-B64": base64.b64encode(big).decode()},
                   "completion needs room")
    finally:
        server.shutdown()
