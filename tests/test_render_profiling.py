"""Wireframe render + profiling subsystem tests."""
import json
import os
import time

import numpy as np

from meshanything_tpu.runtime.profiling import PhaseTimer, device_memory_stats
from meshanything_tpu.runtime.render import wireframe_render


def test_wireframe_render_writes_png(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    out = str(tmp_path / "wire.png")
    wireframe_render(v, f, out)
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000
    with open(out, "rb") as fh:
        assert fh.read(8) == b"\x89PNG\r\n\x1a\n"


def test_phase_timer_summary(tmp_path):
    t = PhaseTimer()
    with t.phase("encode"):
        time.sleep(0.01)
    with t.phase("decode"):
        time.sleep(0.02)
    with t.phase("decode"):
        time.sleep(0.02)
    s = t.summary()
    assert s["encode"]["count"] == 1
    assert s["decode"]["count"] == 2
    assert s["decode"]["total_s"] >= 0.04
    path = str(tmp_path / "prof.json")
    t.dump(path)
    loaded = json.load(open(path))
    assert "decode" in loaded


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1


def test_html_viewer_export(tmp_path):
    """Self-contained HTML viewer (the PyThreeJSViewer capability,
    reference utils/visualizers/) embeds the mesh and the JS renderer."""
    import json as _json

    from meshanything_tpu.runtime.html_viewer import export_html_viewer

    v = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 0, 2]], float)
    f = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3], [0, 2, 3]])
    out = export_html_viewer(v, f, str(tmp_path / "m.html"), title="t")
    text = open(out).read()
    assert text.startswith("<!doctype html>")
    assert "const V =" in text and "const F =" in text
    # embedded data round-trips and is unit-normalized
    vjson = text.split("const V = ")[1].split(";\n")[0]
    arr = np.asarray(_json.loads(vjson))
    assert arr.shape == (4, 3)
    assert np.abs(arr).max() <= 1.0 + 1e-6
    assert "[0, 1, 2]" in text.replace("], [", "], [")
