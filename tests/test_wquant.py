"""int8 W8A8 decode weights (ops/wquant.py): quantization bounds,
linear accuracy, and end-to-end composition with the decode paths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.config import ShapeOPTConfig
from meshanything_tpu.models import shape_opt as sopt
from meshanything_tpu.models.layers import linear
from meshanything_tpu.models.lookahead import generate_lookahead
from meshanything_tpu.ops.wquant import (
    linear_w8a8,
    quantize_opt_layers,
    quantize_weight,
)

CFG = ShapeOPTConfig(
    hidden_size=32, num_layers=2, num_heads=4, ffn_dim=64,
    vocab_size=67, codebook_size=64, codebook_dim=32,
    max_positions=512, cond_length=9, cond_dim=48,
)


def test_quantize_weight_roundtrip_bound(rng):
    w = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32) * 0.05)
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (96,)
    deq = wq.astype(jnp.float32) * scale[None, :]
    # symmetric rounding: error at most half a quantization step per column
    assert float(jnp.max(jnp.abs(deq - w) / scale[None, :])) <= 0.5 + 1e-4


def test_linear_w8a8_matches_f32_linear(rng):
    w = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(512,)).astype(np.float32) * 0.01)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    wq, ws = quantize_weight(w)
    y8 = linear_w8a8(x, wq, ws, b)
    y = linear(x, w, b)
    rel = float(jnp.linalg.norm(y8 - y) / jnp.linalg.norm(y))
    assert rel < 0.03, rel  # measured ~0.011 for gaussian weights/inputs


def test_linear_w8a8_batched_rows(rng):
    """(B, W, d) activations (the lookahead window shape) quantize per row."""
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.1)
    wq, ws = quantize_weight(w)
    x = jnp.asarray(rng.normal(size=(2, 5, 64)).astype(np.float32))
    y8 = linear_w8a8(x, wq, ws)
    assert y8.shape == (2, 5, 32)
    y = linear(x, w)
    rel = float(jnp.linalg.norm(y8 - y) / jnp.linalg.norm(y))
    assert rel < 0.03, rel


def test_quantize_opt_layers_structure():
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(0), CFG)
    q = quantize_opt_layers(params["layers"])
    for name in ("qkv", "out", "fc1", "fc2"):
        assert q[name]["wq"].dtype == jnp.int8
        assert q[name]["wq"].shape == params["layers"][name]["w"].shape
        # per-layer per-output-column scales
        assert q[name]["scale"].shape == params["layers"][name]["w"].shape[:1] + (
            params["layers"][name]["w"].shape[-1],
        )
    # layernorms pass through untouched
    assert q["ln_attn"] is params["layers"]["ln_attn"]


@pytest.mark.parametrize("attn", ["xla", "pallas", "pallas_int8"])
def test_generate_wq_matches_exact_greedy(rng, attn):
    """In f32 on the small model the quantization error is far below the
    logit gaps, so the wq token stream matches exact greedy decoding
    (measured: byte-identical; threshold leaves margin for ties)."""
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(3), CFG)
    cond = jnp.asarray(
        rng.normal(size=(2, CFG.cond_length, CFG.hidden_size)).astype(np.float32) * 0.5
    )
    plain = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=24, bucket=16, attn="xla"))
    fast = np.asarray(
        sopt.generate(params, CFG, cond, max_new_tokens=24, bucket=16, attn=attn, wq=True)
    )
    assert fast.shape == plain.shape
    assert (fast == plain).mean() > 0.9, (plain, fast)


def test_lookahead_wq_matches_plain_wq(rng):
    """lookahead + wq compose: the window forward and the single-token
    forward share the same quantized weights, so their greedy streams
    agree (f32)."""
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(3), CFG)
    cond = jnp.asarray(
        rng.normal(size=(2, CFG.cond_length, CFG.hidden_size)).astype(np.float32) * 0.5
    )
    plain_wq = np.asarray(
        sopt.generate(params, CFG, cond, max_new_tokens=24, bucket=16, attn="xla", wq=True)
    )
    look_wq = np.asarray(
        generate_lookahead(params, CFG, cond, max_new_tokens=24, window=4, bucket=16, wq=True)
    )
    for row in range(2):
        eos = np.where(plain_wq[row] == CFG.eos_token_id)[0]
        limit = (eos[0] + 1) if len(eos) else plain_wq.shape[1]
        np.testing.assert_array_equal(look_wq[row, :limit], plain_wq[row, :limit])


def test_wq_int8kv_lookahead_all_compose(rng):
    """All three fast modes together (int8 KV + lookahead + int8 weights)
    through the full model surface."""
    from meshanything_tpu.config import small_test_config
    from meshanything_tpu.models import meshanything as ma

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
    out = ma.generate(params, cfg, pc, lookahead=4, attn="pallas_int8", bucket=16, wq=True)
    assert out.token_ids.shape == (1, cfg.generate_length)
    assert out.face_coords.shape == (1, cfg.n_max_triangles, 3, 3)
    assert np.isfinite(np.asarray(out.face_coords)[~np.isnan(np.asarray(out.face_coords))]).all()


def test_wq_megakernel_rejected():
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(0), CFG)
    cond = jnp.zeros((1, CFG.cond_length, CFG.hidden_size), jnp.float32)
    with pytest.raises(ValueError, match="megakernel"):
        sopt.generate(params, CFG, cond, max_new_tokens=4, bucket=16,
                      attn="megakernel", wq=True)
