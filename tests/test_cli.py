"""CLI argument surface + input collection tests."""
import os

import numpy as np
import pytest

from meshanything_tpu.cli import build_config, collect_inputs, get_args
from meshanything_tpu.miche_cli import load_surface


def test_reference_flags_parse():
    # the exact flag set of reference main.py:60-89 must parse
    args = get_args([
        "--llm", "facebook/opt-350m",
        "--input_path", "x.npy", "--input_type", "pc_normal",
        "--out_dir", "o", "--pretrained_weights", "w.pth",
        "--codebook_size", "8192", "--codebook_dim", "1024",
        "--n_max_triangles", "800", "--batchsize_per_gpu", "4",
        "--seed", "7", "--mc", "--sampling",
    ])
    assert args.codebook_size == 8192
    assert args.batchsize_per_gpu == 4
    assert args.mc and args.sampling
    cfg = build_config(args)
    assert cfg.opt.vocab_size == 8195
    assert cfg.generate_length == 800 * 9 + 2
    assert cfg.max_length == 7459


def test_tpu_extras_parse():
    args = get_args(["--input_path", "x.npy", "--attn", "pallas_int8",
                     "--lookahead", "8", "--resume", "--dtype", "float32"])
    assert args.attn == "pallas_int8"
    assert args.lookahead == 8
    assert args.resume
    cfg = build_config(args)
    assert cfg.activation_dtype.__name__ == "float32"


def test_fast_preset_resolves():
    # --fast = the 1.0000-trained-agreement serving stack (VERDICT r3 #2)
    args = get_args(["--input_path", "x.npy", "--fast"])
    assert args.attn == "pallas_int8"
    assert args.lookahead == 8
    assert args.wq


def test_fast_preset_explicit_flags_win():
    args = get_args(["--input_path", "x.npy", "--fast",
                     "--attn", "pallas_int4", "--lookahead", "4"])
    assert args.attn == "pallas_int4"
    assert args.lookahead == 4
    assert args.wq  # wq stays part of the preset


def test_invalid_attn_rejected():
    with pytest.raises(SystemExit):
        get_args(["--input_path", "x", "--attn", "flash3"])


def test_collect_inputs_filters_extensions(tmp_path):
    for name in ("a.npy", "b.obj", "c.ply", "d.txt", "e.stl", "f.off", "g.glb"):
        (tmp_path / name).write_bytes(b"x")
    args = get_args(["--input_dir", str(tmp_path), "--input_type", "pc_normal"])
    assert [os.path.basename(p) for p in collect_inputs(args)] == ["a.npy"]
    args = get_args(["--input_dir", str(tmp_path), "--input_type", "mesh"])
    assert [os.path.basename(p) for p in collect_inputs(args)] == [
        "a.npy", "b.obj", "c.ply", "e.stl", "f.off", "g.glb"]


def test_collect_inputs_requires_input():
    args = get_args([])
    with pytest.raises(ValueError, match="input_dir or input_path"):
        collect_inputs(args)


def test_miche_load_surface_formats(tmp_path, rng):
    pts = rng.normal(size=(5000, 3))
    nrm = pts / np.linalg.norm(pts, axis=-1, keepdims=True)

    p1 = tmp_path / "ref.npz"
    np.savez(p1, points=pts, normals=nrm)  # the reference format (encode.py:10-12)
    assert load_surface(str(p1), 4096).shape == (4096, 6)

    p2 = tmp_path / "surf.npz"
    np.savez(p2, surface=np.concatenate([pts, nrm], -1))
    assert load_surface(str(p2), 4096).shape == (4096, 6)

    p3 = tmp_path / "batched.npy"
    np.save(p3, np.concatenate([pts, nrm], -1)[None])  # (1, N, 6)
    assert load_surface(str(p3), 4096).shape == (4096, 6)

    p4 = tmp_path / "bad.npz"
    np.savez(p4, foo=pts)
    with pytest.raises(ValueError, match="expected"):
        load_surface(str(p4))

    p5 = tmp_path / "small.npy"
    np.save(p5, np.concatenate([pts, nrm], -1)[:100])
    with pytest.raises(ValueError, match="at least"):
        load_surface(str(p5), 4096)
