"""Serving layer: the app.py equivalent (reference app.py:1-270).

Two frontends over one ServingEngine:
  * gradio Blocks UI when gradio is installed (same controls as the
    reference: 3D upload, seed, sampling checkbox, marching-cubes
    checkbox, preview renders);
  * a dependency-free stdlib HTTP server (this image has no gradio):
    GET / serves a minimal upload form, POST /generate accepts an OBJ
    body and returns the generated OBJ.

Normalization follows the *app* variant (mesh-bbox, app.py:108-114),
which differs from the CLI's pc-bbox variant (main.py:51-53).
"""
from __future__ import annotations

import json
import os
import tempfile
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
import numpy as np


class ServingEngine:
    """Load-once model + per-request generation (app.py:16-25,95-174)."""

    def __init__(self, params, cfg, *, bucket: int = 512, attn: str = "auto",
                 lookahead: int = 0):
        import jax

        from meshanything_tpu.runtime.phases import PhaseRunner

        self.cfg = cfg
        self.params = params
        self._jax = jax

        runner = PhaseRunner(params, cfg, bucket=bucket, attn=attn,
                             lookahead=lookahead)
        self._greedy = lambda p, pc, k: runner(pc, sampling=False, key=k)
        self._sample = lambda p, pc, k: runner(pc, sampling=True, key=k)

    def generate_from_mesh(
        self,
        vertices: np.ndarray,
        faces: np.ndarray,
        *,
        seed: int = 0,
        do_sampling: bool = False,
        do_marching_cubes: bool = False,
    ):
        from meshanything_tpu.geometry import (
            Mesh,
            faces_to_mesh,
            normalize_mesh_app,
        )
        from meshanything_tpu.geometry.sample import sample_surface_with_normals

        t0 = time.time()
        mesh = Mesh(np.asarray(vertices, float), np.asarray(faces, np.int64))
        if do_marching_cubes:
            from meshanything_tpu.geometry.sdf import export_to_watertight

            mesh = export_to_watertight(mesh)

        rng = np.random.default_rng(seed)
        pc = sample_surface_with_normals(mesh.vertices, mesh.faces, 4096, rng)

        # app normalization: mesh bbox for both mesh and pc (app.py:108-114)
        _, pc_coor = normalize_mesh_app(mesh.vertices, pc[:, :3].astype(np.float64))
        normals = pc[:, 3:].astype(np.float64)
        norms = np.linalg.norm(normals, axis=-1)
        if not (norms > 0.99).all():
            raise ValueError("normals should be unit vectors")
        pc_normal = np.concatenate([pc_coor, normals], axis=-1).astype(np.float16)

        jax = self._jax
        key = jax.random.PRNGKey(seed)
        fn = self._sample if do_sampling else self._greedy
        out = fn(self.params, np.asarray(pc_normal, np.float32)[None], key)
        coords = np.asarray(out.face_coords.astype(np.float32))[0]

        gen_mesh = faces_to_mesh(coords)
        return {
            "mesh": gen_mesh,
            "faces_generated": int(np.sum(~np.isnan(coords[:, 0, 0]))),
            "faces_final": len(gen_mesh.faces),
            "latency_s": time.time() - t0,
        }


_FORM = b"""<!doctype html><title>MeshAnything-TPU</title>
<h2>MeshAnything-TPU</h2>
<form method=post action=/generate enctype=multipart/form-data>
OBJ file: <input type=file name=file><br>
seed: <input name=seed value=0>
<label><input type=checkbox name=sampling> sampling</label>
<label><input type=checkbox name=mc> marching cubes</label><br>
<input type=submit value=Generate>
</form>"""


def _make_handler(engine: ServingEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/health":
                self.send_response(200)
                self.end_headers()
                self.wfile.write(b"ok")
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_FORM)

        def do_POST(self):
            if self.path != "/generate":
                self.send_response(404)
                self.end_headers()
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                seed = int(self.headers.get("X-Seed", "0"))
                sampling = self.headers.get("X-Sampling", "0") == "1"
                mc = self.headers.get("X-MC", "0") == "1"

                # body is a raw OBJ (API mode). multipart form uploads also
                # land here; extract the file part if present.
                if b"Content-Disposition" in body[:2048]:
                    marker = body.split(b"\r\n")[0]
                    parts = body.split(marker)
                    for part in parts:
                        if b"filename=" in part:
                            body = part.split(b"\r\n\r\n", 1)[1].rsplit(b"\r\n", 1)[0]
                            break

                with tempfile.NamedTemporaryFile(suffix=".obj", delete=False) as fh:
                    fh.write(body)
                    path = fh.name
                from meshanything_tpu.geometry import load_mesh, save_obj

                mesh = load_mesh(path)
                os.unlink(path)
                result = engine.generate_from_mesh(
                    mesh.vertices, mesh.faces,
                    seed=seed, do_sampling=sampling, do_marching_cubes=mc,
                )
                with tempfile.NamedTemporaryFile(mode="r", suffix=".obj", delete=False) as out_fh:
                    out_path = out_fh.name
                save_obj(result["mesh"], out_path)
                with open(out_path) as fh2:
                    obj_text = fh2.read()
                os.unlink(out_path)

                self.send_response(200)
                self.send_header("Content-Type", "model/obj")
                self.send_header("X-Faces-Generated", str(result["faces_generated"]))
                self.send_header("X-Faces-Final", str(result["faces_final"]))
                self.send_header("X-Latency-S", f"{result['latency_s']:.3f}")
                self.end_headers()
                self.wfile.write(obj_text.encode())
            except Exception as e:  # surface errors to the client
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": f"{type(e).__name__}: {e}"}).encode())

    return Handler


def serve_http(engine: ServingEngine, host: str = "127.0.0.1", port: int = 7860):
    server = ThreadingHTTPServer((host, port), _make_handler(engine))
    print(f"MeshAnything-TPU serving on http://{host}:{port}")
    server.serve_forever()


def serve_gradio(engine: ServingEngine, **launch_kwargs):
    """Gradio Blocks UI mirroring the reference app (app.py:217-269)."""
    import gradio as gr

    def do_inference(input_3d, sample_seed=0, do_sampling=False, do_marching_cubes=False):
        from meshanything_tpu.geometry import load_mesh, save_obj

        mesh = load_mesh(input_3d)
        result = engine.generate_from_mesh(
            mesh.vertices, mesh.faces,
            seed=int(sample_seed), do_sampling=do_sampling,
            do_marching_cubes=do_marching_cubes,
        )
        out_path = os.path.join(tempfile.gettempdir(), f"gen_{int(time.time())}.obj")
        save_obj(result["mesh"], out_path)
        return out_path

    with gr.Blocks() as demo:
        gr.Markdown("# MeshAnything-TPU")
        with gr.Row():
            input_3d = gr.Model3D(label="Input mesh")
            output_3d = gr.Model3D(label="Generated mesh")
        seed = gr.Number(value=0, label="seed")
        sampling = gr.Checkbox(label="sampling")
        mc = gr.Checkbox(label="marching cubes preprocessing")
        submit = gr.Button("Generate")
        submit.click(do_inference, [input_3d, seed, sampling, mc], [output_3d])
    demo.launch(**launch_kwargs)


def main(argv=None):
    import argparse

    from meshanything_tpu.cli import build_config, get_args, load_params
    from meshanything_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    args = get_args(argv)
    cfg = build_config(args)
    params = load_params(args, cfg)
    engine = ServingEngine(params, cfg, bucket=args.bucket, attn=args.attn,
                           lookahead=args.lookahead)
    try:
        import gradio  # noqa: F401

        serve_gradio(engine, share=False)
    except ImportError:
        serve_http(engine)


if __name__ == "__main__":
    main()
