"""VAE reconstruction path + serving engine tests (CPU, small config)."""
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


def test_serving_http_roundtrip(tmp_path, rng):
    from meshanything_tpu.serving import ServingEngine, _make_handler
    from meshanything_tpu.geometry import Mesh, save_obj
    from http.server import ThreadingHTTPServer

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    engine = ServingEngine(params, cfg, bucket=16)
    # patch sampling count to the test config's point budget
    import meshanything_tpu.serving as srv

    orig = srv.ServingEngine.generate_from_mesh

    def patched(self, vertices, faces, **kw):
        from meshanything_tpu.geometry.sample import sample_surface_with_normals
        from meshanything_tpu.geometry import normalize_mesh_app, faces_to_mesh
        import time as _t

        t0 = _t.time()
        rng_l = np.random.default_rng(kw.get("seed", 0))
        pc = sample_surface_with_normals(vertices, faces, cfg.perceiver.num_points, rng_l)
        _, pc_coor = normalize_mesh_app(vertices, pc[:, :3].astype(np.float64))
        normals = pc[:, 3:].astype(np.float64)
        pc_normal = np.concatenate([pc_coor, normals], -1).astype(np.float32)
        out = ma.generate(params, cfg, jnp.asarray(pc_normal)[None], bucket=16)
        coords = np.asarray(out.face_coords.astype(jnp.float32))[0]
        mesh = faces_to_mesh(coords)
        return {"mesh": mesh, "faces_generated": int(np.sum(~np.isnan(coords[:, 0, 0]))),
                "faces_final": len(mesh.faces), "latency_s": _t.time() - t0}

    srv.ServingEngine.generate_from_mesh = patched
    try:
        server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(engine))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()

        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            assert r.read() == b"ok"

        # generate from a cube OBJ
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                      [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
        f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                      [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
        obj_path = tmp_path / "cube.obj"
        save_obj(Mesh(v, f), str(obj_path))
        body = obj_path.read_bytes()

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body, method="POST",
            headers={"X-Seed": "0"},
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert "X-Faces-Generated" in r.headers
            text = r.read().decode()
            assert text.startswith("#") or text.startswith("v") or text.strip() == ""

        # error path: garbage body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"not an obj \xff\xfe", method="POST",
        )
        try:
            urllib.request.urlopen(req)
        except urllib.error.HTTPError as e:
            assert e.code == 400
        server.shutdown()
    finally:
        srv.ServingEngine.generate_from_mesh = orig
