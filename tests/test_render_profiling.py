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


def _view_occupancy(png_path, grid=10):
    """Per-view coarse occupancy: split the two-view composite at its
    midpoint, tight-crop each view to its non-background content, then
    block-mean to (grid, grid). Tight-cropping first makes the numpy
    backend (fixed margin) comparable with matplotlib (bbox_inches=
    'tight' crops to content)."""
    import matplotlib.image as mpimg

    img = mpimg.imread(png_path)
    if img.dtype == np.uint8:
        img = img / 255.0
    half = img.shape[1] // 2
    occs = []
    for panel in (img[:, :half], img[:, half:]):
        nonbg = (panel[..., :3] < 0.95).any(axis=-1)
        rows = np.flatnonzero(nonbg.any(axis=1))
        cols = np.flatnonzero(nonbg.any(axis=0))
        assert len(rows) and len(cols), "view rendered empty"
        crop = nonbg[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1]
        hh, ww = crop.shape
        gy = np.linspace(0, hh, grid + 1).astype(int)
        gx = np.linspace(0, ww, grid + 1).astype(int)
        occ = np.array([[crop[gy[i]:gy[i + 1], gx[j]:gx[j + 1]].mean()
                         for j in range(grid)] for i in range(grid)])
        occs.append(occ)
    return occs


def test_rasterizer_matches_matplotlib_orientation(tmp_path):
    """Coarse parity of the numpy rasterizer against the reference-exact
    matplotlib backend (advisor r2): an asymmetric mesh must land in the
    same image regions in both — a sign error in _view_rotation (azimuth
    sign, elevation axis, screen-y flip) flips/mirrors the occupancy and
    drops the correlation below the mirrored alternative."""
    # asymmetric 'flag': a wide slab low down + a small cube high up,
    # offset to one side along x
    def box(center, half):
        c = np.asarray(center, float)
        h = np.asarray(half, float)
        v = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)],
                     float) * h + c
        f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                      [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                      [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
        return v, f

    v1, f1 = box((0.0, 0.0, 0.0), (1.0, 0.25, 0.6))
    v2, f2 = box((0.8, 1.2, 0.0), (0.25, 0.25, 0.25))
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + len(v1)])

    p_np = str(tmp_path / "np.png")
    p_mpl = str(tmp_path / "mpl.png")
    wireframe_render(v, f, p_np, backend="numpy", dpi=60)
    wireframe_render(v, f, p_mpl, backend="matplotlib", dpi=60)

    occ_np = _view_occupancy(p_np)
    occ_mpl = _view_occupancy(p_mpl)
    for view in range(2):
        a = occ_np[view].ravel()
        b = occ_mpl[view].ravel()
        corr = np.corrcoef(a, b)[0, 1]
        mirror = np.corrcoef(occ_np[view][:, ::-1].ravel(), b)[0, 1]
        flip = np.corrcoef(occ_np[view][::-1].ravel(), b)[0, 1]
        assert corr > 0.75, f"view {view}: occupancy corr {corr:.2f}"
        assert corr > mirror + 0.1, f"view {view}: mirrored ({mirror:.2f}) too close"
        assert corr > flip + 0.1, f"view {view}: y-flipped ({flip:.2f}) too close"


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
