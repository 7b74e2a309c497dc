"""The day-one real-weights parity harness (tools/parity_vs_reference.py).

Two layers of coverage:
  * the _LegacyLayerAdapter (the 4.39 legacy-cache -> installed
    transformers bridge) is validated for prefill/incremental
    consistency on a real OPTDecoderLayer — the property the reference
    generate loop depends on;
  * the full harness selftest runs in a subprocess (its offline stubs
    monkeypatch global torch/transformers state): scaled-down reference
    torch model, state_dict exported as the checkpoint, converted,
    both sides generated, tokens + coords + OBJ bytes diffed.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch-oracle tier; smoke = -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "parity_vs_reference.py")


def _load_tool():
    import importlib.util

    spec = importlib.util.spec_from_file_location("parity_vs_reference", TOOL)
    mod = importlib.util.module_from_spec(spec)
    # dataclasses resolves annotations via sys.modules[cls.__module__]
    sys.modules["parity_vs_reference"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_legacy_layer_adapter_incremental_matches_full():
    """Adapter contract: prefill(N) == prefill(P) + N-P incremental
    single-token steps through the legacy (k, v) cache — i.e. the mask
    construction and cache bridging reproduce causal attention exactly."""
    import torch
    from transformers.models.opt.modeling_opt import OPTConfig, OPTDecoderLayer

    tool = _load_tool()
    torch.manual_seed(0)
    cfg = OPTConfig(
        hidden_size=32, num_attention_heads=4, ffn_dim=64,
        do_layer_norm_before=False, activation_function="relu",
        attn_implementation="eager", dropout=0.0,
    )
    layer = OPTDecoderLayer(cfg, layer_idx=0).eval()

    b, n, p = 2, 7, 3
    x = torch.randn(b, n, 32)

    with torch.no_grad():
        full, _ = tool._LegacyLayerAdapter(layer)(x, use_cache=True)

        out_p, past = tool._LegacyLayerAdapter(layer)(x[:, :p], use_cache=True)
        incr = [out_p]
        for t in range(p, n):
            out_t, past = tool._LegacyLayerAdapter(layer)(
                x[:, t:t + 1], past_key_value=past, use_cache=True)
            incr.append(out_t)
        incr = torch.cat(incr, dim=1)

    assert past[0].shape == (b, 4, n, 8)
    np.testing.assert_allclose(full.numpy(), incr.numpy(), atol=1e-5)

    # 2D padding mask: masked columns must not influence later rows
    mask = torch.ones(b, n, dtype=torch.long)
    mask[:, 1] = 0
    with torch.no_grad():
        masked, _ = tool._LegacyLayerAdapter(layer)(
            x, attention_mask=mask, use_cache=True)
        x2 = x.clone()
        x2[:, 1] = 100.0  # perturb only the masked position
        masked2, _ = tool._LegacyLayerAdapter(layer)(
            x2, attention_mask=mask, use_cache=True)
    np.testing.assert_allclose(
        masked[:, 2:].numpy(), masked2[:, 2:].numpy(), atol=1e-5)


def test_parity_selftest_end_to_end(tmp_path):
    """One command, green: the harness proves itself with the scaled
    reference model + its own state_dict (VERDICT r2 next #2)."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the tool pins cpu via jax.config
    proc = subprocess.run(
        [sys.executable, TOOL, "--selftest", "--out_dir", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout
    res = json.loads(lines[-1])
    assert res["ok"] is True
    assert res["token_match"] == 1.0
    assert res["obj_bytes_equal"] is True
    assert "PARITY VERDICT: PASS" in proc.stdout
    # both artifact OBJs were written
    assert os.path.exists(tmp_path / "synthetic_reference.obj")
    assert os.path.exists(tmp_path / "synthetic_ours.obj")


def test_parity_selftest_fast_mode(tmp_path):
    """--fast-modes runs the production PhaseRunner tiers against the
    torch oracle stream (VERDICT r3 #7: the day-one real-weights run
    must adjudicate the shipping surface). fast_preset = the --fast
    stack (int8 KV + lookahead + w8a8) composed at small scale."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, TOOL, "--selftest", "--out_dir", str(tmp_path),
         "--fast-modes", "fast_preset"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + "\n" + proc.stderr
    lines = [json.loads(ln) for ln in proc.stdout.splitlines() if ln.startswith("{")]
    exact = [r for r in lines if "ok" in r]
    fast = [r for r in lines if r.get("fast_mode") == "fast_preset"]
    assert exact and exact[0]["ok"] is True
    assert fast, proc.stdout
    assert fast[0]["tokens_compared"] > 0
    # f32 + tiny random weights: quantization can flip argmax near-ties,
    # so gate loosely on "the machinery tracks the oracle", not 1.0
    # (the trained-350M probe is the 1.0000 evidence, PERF.md r3)
    assert fast[0]["token_agreement"] >= 0.5, fast[0]
    assert "PARITY VERDICT: PASS" in proc.stdout
