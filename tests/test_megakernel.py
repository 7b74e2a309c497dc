"""Whole-decode-step megakernel vs the per-layer scan step (interpret)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.config import ShapeOPTConfig
from meshanything_tpu.models import shape_opt as sopt
from meshanything_tpu.ops.megakernel import decode_step_megakernel

CFG = ShapeOPTConfig(
    hidden_size=32, num_layers=3, num_heads=4, ffn_dim=64,
    vocab_size=67, codebook_size=64, codebook_dim=32,
    max_positions=512, cond_length=9, cond_dim=48,
)


def _reference_step(params, cfg, x, kv, write_pos, cur_len):
    """Per-layer scan math (the existing decode path) on the same
    bf16 weights, via _opt_layer_decode with the xla window."""
    s = kv.shape[3]
    body = sopt._opt_layer_decode(cfg, s, attn="xla")
    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    (xo, kvo, _), _ = jax.lax.scan(
        lambda c, pkv: body(c, pkv),
        (x[:, None, :], kv, jnp.asarray(write_pos, jnp.int32)),
        (params["layers"], layer_ids),
    )
    return xo[:, 0], kvo


@pytest.mark.parametrize("batch", [1, 2])
def test_megakernel_matches_scan_step(rng, batch):
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(0), CFG, jnp.bfloat16)
    s_max = 64
    chunk = 16
    kv = jnp.asarray(rng.normal(size=(2, CFG.num_layers, batch, s_max, CFG.hidden_size))
                     .astype(np.float32) * 0.3).astype(jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(batch, CFG.hidden_size)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    write_pos, cur_len = 21, 22

    ref_x, ref_kv = _reference_step(params, CFG, x, kv, write_pos, cur_len)
    got_x, got_kv = decode_step_megakernel(
        x, params["layers"], kv, write_pos, cur_len,
        num_heads=CFG.num_heads, chunk=chunk, ln_eps=CFG.ln_eps, interpret=True,
    )

    # bf16 stacks with different intermediate precision: compare loosely
    np.testing.assert_allclose(
        np.asarray(got_x, np.float32), np.asarray(ref_x, np.float32),
        atol=0.08, rtol=0.08,
    )
    # the appended K/V rows must match exactly where written
    np.testing.assert_allclose(
        np.asarray(got_kv[:, :, :, write_pos], np.float32),
        np.asarray(ref_kv[:, :, :, write_pos], np.float32),
        atol=0.05, rtol=0.05,
    )
    # untouched cache rows are bit-identical
    np.testing.assert_array_equal(
        np.asarray(got_kv[:, :, :, :write_pos], np.float32),
        np.asarray(kv[:, :, :, :write_pos], np.float32),
    )


def test_megakernel_ignores_dead_context(rng):
    """Rows past cur_len must not affect the output."""
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(1), CFG, jnp.bfloat16)
    batch, s_max, chunk = 1, 64, 16
    base = rng.normal(size=(2, CFG.num_layers, batch, s_max, CFG.hidden_size)).astype(np.float32) * 0.3
    poisoned = base.copy()
    poisoned[:, :, :, 40:] = 30.0
    x = jnp.asarray(rng.normal(size=(batch, CFG.hidden_size)).astype(np.float32)).astype(jnp.bfloat16)

    a, _ = decode_step_megakernel(x, params["layers"], jnp.asarray(base, jnp.bfloat16),
                                  30, 31, num_heads=CFG.num_heads, chunk=chunk,
                                  interpret=True)
    b, _ = decode_step_megakernel(x, params["layers"], jnp.asarray(poisoned, jnp.bfloat16),
                                  30, 31, num_heads=CFG.num_heads, chunk=chunk,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_generate_megakernel_matches_xla_tokens(rng):
    """Full generate() with attn="megakernel" (interpret) produces the
    same greedy token stream as the xla path (f32 conftest precision
    keeps argmax ties away at this scale)."""
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(3), CFG)
    cond = jnp.asarray(rng.normal(size=(2, CFG.cond_length, CFG.hidden_size)).astype(np.float32) * 0.5)
    plain = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=16, bucket=16, attn="xla"))
    mega = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=16, bucket=16, attn="megakernel"))
    for row in range(2):
        eos = np.where(plain[row] == CFG.eos_token_id)[0]
        limit = (eos[0] + 1) if len(eos) else 16
        np.testing.assert_array_equal(mega[row, :limit], plain[row, :limit], err_msg=f"row={row}")
