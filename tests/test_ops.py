"""Kernel-level ops tests (CPU: Pallas interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_impl,
    decode_attention_reference,
)
from meshanything_tpu.ops.kvcache import (
    alloc_kv_cache,
    dequantize_kv,
    quantize_kv,
)


def test_decode_attention_interpret_matches_reference(rng):
    B, H, D, S, L = 1, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    for layer in (0, 1):
        for cur in (3, 127, 128, 200):
            out = decode_attention(q, kv, layer, cur, chunk=128, interpret=True)
            ref = decode_attention_reference(q, kv, layer, cur)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4,
                err_msg=f"layer={layer} cur={cur}",
            )


def test_decode_attention_interpret_ignores_garbage_tail(rng):
    """Rows past cur_len must not affect the result."""
    B, H, D, S, L = 1, 4, 64, 256, 1
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    base = rng.normal(size=(2, L, B, S, H * D)).astype(np.float32)
    poisoned = base.copy()
    poisoned[:, :, :, 100:] = 1e4  # garbage beyond cur_len=100
    a = decode_attention(jnp.asarray(q), jnp.asarray(base), 0, 100, chunk=128, interpret=True)
    b = decode_attention(jnp.asarray(q), jnp.asarray(poisoned), 0, 100, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_kv_cache_alloc_padding():
    kv = alloc_kv_cache(2, 1, 700, 4, 64, chunk=512)
    assert kv.shape == (2, 2, 1, 1024, 256)


def test_kv_int8_roundtrip_error(rng):
    kv = jnp.asarray(rng.normal(size=(2, 2, 1, 64, 4, 64)).astype(np.float32))
    q = quantize_kv(kv)
    assert q.values.dtype == jnp.int8
    back = dequantize_kv(q, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(kv)).max()
    rel = err / np.abs(np.asarray(kv)).max()
    assert rel < 0.01, rel  # int8 symmetric: <1% of per-row amax


def test_decode_attention_mq_interpret_matches_window_math(rng):
    """Multi-query kernel vs explicit per-query masked attention."""
    import math

    from meshanything_tpu.ops.decode_attention import decode_attention_mq_impl

    B, W, H, D, S, L = 2, 4, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    base = jnp.asarray([100, 37], jnp.int32)

    for layer in (0, 1):
        out = decode_attention_mq_impl(q, kv, layer, base, chunk=128, interpret=True)

        k = np.asarray(kv[0, layer]).reshape(B, S, H, D)
        v = np.asarray(kv[1, layer]).reshape(B, S, H, D)
        scale = 1.0 / math.sqrt(D)
        ref = np.zeros((B, W, H, D), np.float32)
        for b in range(B):
            for w in range(W):
                cur = int(base[b]) + w + 1
                logits = np.einsum("hd,shd->hs", np.asarray(q[b, w]) * scale, k[b, :cur])
                p = np.exp(logits - logits.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                ref[b, w] = np.einsum("hs,shd->hd", p, v[b, :cur])
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4,
                                   err_msg=f"layer={layer}")


def test_decode_attention_int8_interpret_close_to_exact(rng):
    """int8 single-query vs the exact reference on the same (dequantized)
    content: quantization is the only error source."""
    from meshanything_tpu.ops.decode_attention import decode_attention_int8_impl

    B, H, D, S, L = 2, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    kv = rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3
    amax = np.abs(kv).max(-1, keepdims=True)
    scales = np.maximum(amax, 1e-8) / 127.0
    values = np.clip(np.round(kv / scales), -127, 127).astype(np.int8)
    scales_t = np.transpose(scales, (0, 1, 2, 4, 3))  # (2, L, B, 1, S)
    dequant = values.astype(np.float32) * scales

    for layer in (0, 1):
        for cur in (3, 127, 200):
            out = decode_attention_int8_impl(
                q, jnp.asarray(values), jnp.asarray(scales_t), layer, cur,
                chunk=128, interpret=True,
            )
            ref = decode_attention_reference(q, jnp.asarray(dequant), layer, cur)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"layer={layer} cur={cur}")


@pytest.mark.parametrize("packing,shape,dtype", [
    ("plane", (3, 5, 16), jnp.int32),
    ("nibble", (3, 5, 64), jnp.int8),
])
def test_kv_int4_pack_unpack_roundtrip(rng, packing, shape, dtype):
    """int4 packing: codes survive the pack/unpack round-trip exactly
    under BOTH contracts (byte-plane int32 words / legacy nibble pairs)
    and the dequantized rows stay within half a quantization step of
    the source (per-row symmetric scale = amax/7)."""
    from meshanything_tpu.ops.kvcache import quantize_rows_int4, unpack_int4

    rows = jnp.asarray(rng.normal(size=(3, 5, 128)).astype(np.float32))
    packed, scale = quantize_rows_int4(rows, packing=packing)
    assert packed.shape == shape and packed.dtype == dtype
    codes = np.asarray(unpack_int4(packed))
    expect = np.clip(np.round(np.asarray(rows) / np.asarray(scale)), -7, 7)
    np.testing.assert_array_equal(codes, expect.astype(np.int32))
    back = codes * np.asarray(scale)
    err = np.abs(back - np.asarray(rows))
    assert (err <= np.asarray(scale)[..., 0, None] * 0.5 + 1e-6).all()


def test_kv_int4_plane_and_nibble_codes_identical(rng):
    """The two packing contracts are pure layout changes: unpacked codes
    (and therefore every downstream attention result) are bit-identical
    for the same input rows."""
    from meshanything_tpu.ops.kvcache import quantize_rows_int4, unpack_int4

    rows = jnp.asarray(rng.normal(size=(2, 7, 256)).astype(np.float32) * 0.3)
    plane, s_p = quantize_rows_int4(rows, packing="plane")
    nibble, s_n = quantize_rows_int4(rows, packing="nibble")
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_n))
    np.testing.assert_array_equal(np.asarray(unpack_int4(plane)),
                                  np.asarray(unpack_int4(nibble)))


def test_decode_attention_int4_interpret_close_to_exact(rng):
    """int4 single-query kernel vs the exact reference on the same
    (dequantized) content: the in-kernel nibble unpack must reproduce
    the packed codes bit-exactly, leaving quantization as the only
    error source."""
    from meshanything_tpu.ops.decode_attention import decode_attention_int4_impl
    from meshanything_tpu.ops.kvcache import quantize_rows_int4, unpack_int4

    B, H, D, S, L = 2, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    values, scales = quantize_rows_int4(kv)
    scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))  # (2, L, B, 1, S)
    dequant = unpack_int4(values).astype(jnp.float32) * scales

    for layer in (0, 1):
        for cur in (3, 127, 200):
            out = decode_attention_int4_impl(
                q, values, scales_t, layer, cur, chunk=128, interpret=True,
            )
            ref = decode_attention_reference(q, dequant, layer, cur)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"layer={layer} cur={cur}")


def test_decode_attention_mq_int4_interpret(rng):
    """int4 + multi-query (lookahead over the quarter-width cache) vs
    per-query masked attention over the dequantized cache."""
    import math

    from meshanything_tpu.ops.decode_attention import decode_attention_mq_int4_impl
    from meshanything_tpu.ops.kvcache import quantize_rows_int4, unpack_int4

    B, W, H, D, S, L = 2, 4, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    values, scales = quantize_rows_int4(kv)
    scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))
    dequant = np.asarray(unpack_int4(values).astype(jnp.float32) * scales)
    base = jnp.asarray([100, 37], jnp.int32)

    for layer in (0, 1):
        out = decode_attention_mq_int4_impl(
            q, values, scales_t, layer, base, chunk=128, interpret=True,
        )
        k = dequant[0, layer].reshape(B, S, H, D)
        v = dequant[1, layer].reshape(B, S, H, D)
        scale = 1.0 / math.sqrt(D)
        ref = np.zeros((B, W, H, D), np.float32)
        for b in range(B):
            for w in range(W):
                cur = int(base[b]) + w + 1
                logits = np.einsum("hd,shd->hs", np.asarray(q[b, w]) * scale, k[b, :cur])
                p = np.exp(logits - logits.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                ref[b, w] = np.einsum("hs,shd->hd", p, v[b, :cur])
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4,
                                   err_msg=f"layer={layer}")


def test_decode_attention_mq_int8_interpret(rng):
    """int8 + multi-query (the lookahead-over-quantized-cache path) vs
    per-query masked attention over the dequantized cache."""
    import math

    from meshanything_tpu.ops.decode_attention import decode_attention_mq_int8_impl

    B, W, H, D, S, L = 2, 4, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32))
    kv = rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3
    amax = np.abs(kv).max(-1, keepdims=True)
    scales = np.maximum(amax, 1e-8) / 127.0
    values = np.clip(np.round(kv / scales), -127, 127).astype(np.int8)
    scales_t = np.transpose(scales, (0, 1, 2, 4, 3))
    dequant = values.astype(np.float32) * scales
    base = jnp.asarray([100, 37], jnp.int32)

    for layer in (0, 1):
        out = decode_attention_mq_int8_impl(
            q, jnp.asarray(values), jnp.asarray(scales_t), layer, base,
            chunk=128, interpret=True,
        )
        k = dequant[0, layer].reshape(B, S, H, D)
        v = dequant[1, layer].reshape(B, S, H, D)
        scale = 1.0 / math.sqrt(D)
        ref = np.zeros((B, W, H, D), np.float32)
        for b in range(B):
            for w in range(W):
                cur = int(base[b]) + w + 1
                logits = np.einsum("hd,shd->hs", np.asarray(q[b, w]) * scale, k[b, :cur])
                p = np.exp(logits - logits.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                ref[b, w] = np.einsum("hs,shd->hd", p, v[b, :cur])
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4,
                                   err_msg=f"layer={layer}")


def test_decode_attention_bf16_query_matches_reference(rng):
    """Production dtype: bf16 queries + bf16 cache. The kernel runs its
    matmuls in the query dtype (native MXU pass on TPU) with f32
    accumulation and post-matmul 1/sqrt(d) scaling — products of bf16
    values are exact, so the result must track the f32 reference on the
    same bf16 inputs to within bf16 output rounding."""
    B, H, D, S, L = 1, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3).astype(jnp.bfloat16)
    for layer in (0, 1):
        for cur in (3, 127, 200):
            out = decode_attention(q, kv, layer, cur, chunk=128, interpret=True)
            ref = decode_attention_reference(q, kv, layer, cur)
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                atol=1.5e-2, rtol=1.5e-2, err_msg=f"layer={layer} cur={cur}",
            )


def test_decode_attention_int8_bf16_query(rng):
    """bf16-query int8 SINGLE-query path (the production pallas_int8
    decode step, shape_opt.py) — exercises the same low-precision p.V
    branch as the int4 MQ test for decode_attention_int8_impl
    (ADVICE r3). Error budget: int8 code rounding ~0.4% dominates;
    bf16 p adds ~2^-9 relative."""
    from meshanything_tpu.ops.decode_attention import decode_attention_int8_impl

    B, H, D, S, L = 2, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    kv = rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3
    amax = np.abs(kv).max(-1, keepdims=True)
    scales = np.maximum(amax, 1e-8) / 127.0
    values = np.clip(np.round(kv / scales), -127, 127).astype(np.int8)
    scales_t = np.transpose(scales, (0, 1, 2, 4, 3))
    dequant = jnp.asarray(values.astype(np.float32) * scales).astype(jnp.bfloat16)
    for layer in (0, 1):
        for cur in (7, 200):
            out = decode_attention_int8_impl(
                q, jnp.asarray(values), jnp.asarray(scales_t), layer, cur,
                chunk=128, interpret=True,
            )
            ref = decode_attention_reference(q, dequant, layer, cur)
            np.testing.assert_allclose(
                np.asarray(out, np.float32), np.asarray(ref, np.float32),
                atol=2e-2, rtol=2e-2, err_msg=f"layer={layer} cur={cur}")


def test_decode_attention_rejects_mixed_unquantized_dtypes(rng):
    """f32 cache with bf16 queries would silently downcast the 'exact
    tier' cache values inside the kernel — the builder refuses it
    (ADVICE r3)."""
    B, H, D, S, L = 1, 4, 64, 128, 1
    q = jnp.zeros((B, H, D), jnp.bfloat16)
    kv = jnp.zeros((2, L, B, S, H * D), jnp.float32)
    with pytest.raises(AssertionError, match="unquantized KV cache dtype"):
        decode_attention_impl(q, kv, 0, 3, chunk=128, interpret=True)


def test_decode_attention_mq_int4_bf16_query(rng):
    """bf16-query int4 MQ path — exercises the low-precision p.V matmul
    (quantized tiers cast the probabilities to the query dtype). Error
    budget: int4 code rounding dominates; bf16 p adds ~2^-9 relative."""
    from meshanything_tpu.ops.decode_attention import decode_attention_mq_int4_impl
    from meshanything_tpu.ops.kvcache import quantize_rows_int4, unpack_int4

    B, W, H, D, S, L = 2, 3, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    values, scales = quantize_rows_int4(kv)
    scales = jnp.transpose(scales, (0, 1, 2, 4, 3))  # (2, L, B, 1, S)
    dequant = (unpack_int4(values).astype(jnp.float32)
               * jnp.transpose(scales, (0, 1, 2, 4, 3))).astype(jnp.bfloat16)
    base = jnp.asarray([5, 120], jnp.int32)
    layer = 1
    out = decode_attention_mq_int4_impl(
        q, values, scales, layer, base, chunk=128, interpret=True,
    )
    # reference: per (row, window-pos) single-query attention on the
    # dequantized cache with cur = base[row] + w + 1
    ref = np.zeros((B, W, H, D), np.float32)
    for bi in range(B):
        for w in range(W):
            r = decode_attention_reference(
                q[bi:bi + 1, w], dequant[:, :, bi:bi + 1], layer,
                int(base[bi]) + w + 1,
            )
            ref[bi, w] = np.asarray(r[0], np.float32)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=2.5e-2, rtol=2.5e-2)


def test_decode_attention_grouped_matches_flat(rng):
    """Head-pair grouped matmul layout (VERDICT r3 #4: cuts the
    block-diagonal FLOP inflation from Hx to 2x) — must be numerically
    identical math to the flat layout on the same inputs, single-query
    and multi-query, bf16 and int4."""
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_impl,
        decode_attention_mq_impl,
        decode_attention_mq_int4_impl,
    )
    from meshanything_tpu.ops.kvcache import quantize_rows_int4

    B, H, D, S, L = 2, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    for layer, cur in ((0, 7), (1, 200)):
        ref = decode_attention_reference(q, kv, layer, cur)
        out = decode_attention_impl(q, kv, layer, cur, chunk=128,
                                    interpret=True, grouped=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    # multi-query grouped (f32) vs per-query reference
    W = 3
    qw = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32))
    base = jnp.asarray([5, 120], jnp.int32)
    out = decode_attention_mq_impl(qw, kv, 1, base, chunk=128,
                                   interpret=True, grouped=True)
    for bi in range(B):
        for w in range(W):
            r = decode_attention_reference(
                qw[bi:bi + 1, w], kv[:, :, bi:bi + 1], 1, int(base[bi]) + w + 1)
            np.testing.assert_allclose(np.asarray(out[bi, w]), np.asarray(r[0]),
                                       atol=2e-5, rtol=1e-4,
                                       err_msg=f"b={bi} w={w}")

    # int4 grouped MQ vs flat int4 MQ (identical codes -> near-identical;
    # bf16 queries exercise the low-precision p.V path)
    qb = qw.astype(jnp.bfloat16)
    values, scales = quantize_rows_int4(kv)
    scales = jnp.transpose(scales, (0, 1, 2, 4, 3))
    flat = decode_attention_mq_int4_impl(qb, values, scales, 1, base,
                                         chunk=128, interpret=True)
    grp = decode_attention_mq_int4_impl(qb, values, scales, 1, base,
                                        chunk=128, interpret=True, grouped=True)
    np.testing.assert_allclose(np.asarray(grp, np.float32),
                               np.asarray(flat, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_decode_attention_mq_windowed_matches_incache(rng):
    """Fused window append (VERDICT r3 #3): passing the window K/V rows
    as kernel inputs (sweep covers history only, window folds as one
    causal tile) must equal the classic formulation where the rows are
    scattered into the cache first."""
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_mq_impl,
        decode_attention_mq_int4_impl,
        decode_attention_mq_int8_impl,
    )
    from meshanything_tpu.ops.kvcache import (
        quantize_rows,
        quantize_rows_int4,
    )

    B, W, H, D, S, L = 2, 4, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32))
    kv = rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3
    base = np.asarray([33, 100], np.int32)
    layer = 1
    # window rows live at cache positions [base, base+W) in the classic
    # formulation; extract them as the VMEM window inputs
    wk = np.stack([kv[0, layer, bi, base[bi]:base[bi] + W] for bi in range(B)])
    wv = np.stack([kv[1, layer, bi, base[bi]:base[bi] + W] for bi in range(B)])
    # zero the window region in the fused-mode cache: the kernel must
    # not read it (history sweep stops at base)
    kv_hist = kv.copy()
    for bi in range(B):
        kv_hist[:, layer, bi, base[bi]:base[bi] + W] = 7.7  # poison

    classic = decode_attention_mq_impl(
        q, jnp.asarray(kv), layer, jnp.asarray(base), chunk=64, interpret=True)
    fused = decode_attention_mq_impl(
        q, jnp.asarray(kv_hist), layer, jnp.asarray(base), chunk=64,
        interpret=True, win_kv=(jnp.asarray(wk), jnp.asarray(wv)))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(classic),
                               atol=2e-5, rtol=1e-4)

    # grouped + windowed composes
    fused_g = decode_attention_mq_impl(
        q, jnp.asarray(kv_hist), layer, jnp.asarray(base), chunk=64,
        interpret=True, win_kv=(jnp.asarray(wk), jnp.asarray(wv)), grouped=True)
    np.testing.assert_allclose(np.asarray(fused_g), np.asarray(classic),
                               atol=2e-5, rtol=1e-4)

    # quantized variants: quantize the full cache (classic) and compare
    # against history cache + quantized window inputs
    for qrows, impl in ((quantize_rows, decode_attention_mq_int8_impl),
                        (quantize_rows_int4, decode_attention_mq_int4_impl)):
        values, scales = qrows(jnp.asarray(kv))
        scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))
        classic_q = impl(q, values, scales_t, layer, jnp.asarray(base),
                         chunk=64, interpret=True)
        # window rows re-quantized standalone give the SAME codes
        # (per-row symmetric quantization is row-local)
        wkq, wks = qrows(jnp.asarray(wk))
        wvq, wvs = qrows(jnp.asarray(wv))
        fused_q = impl(
            q, values, scales_t, layer, jnp.asarray(base), chunk=64,
            interpret=True,
            win_kv=(wkq, wvq),
            win_scales=(jnp.transpose(wks, (0, 2, 1)),
                        jnp.transpose(wvs, (0, 2, 1))))
        np.testing.assert_allclose(np.asarray(fused_q, np.float32),
                                   np.asarray(classic_q, np.float32),
                                   atol=2e-5, rtol=1e-4,
                                   err_msg=str(impl.__name__))


def test_decode_attention_mm_s8_close_to_flat(rng):
    """mm_s8 (codes contracted on the MXU s8 path with re-quantized
    queries/probabilities) vs the standard quantized path: adds only
    the q/p int8 rounding (~1%) on top of the tier's code error."""
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_int4_impl,
        decode_attention_int8_impl,
        decode_attention_mq_int4_impl,
    )
    from meshanything_tpu.ops.kvcache import quantize_rows, quantize_rows_int4

    B, H, D, S, L = 2, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    for qrows, impl in ((quantize_rows, decode_attention_int8_impl),
                        (quantize_rows_int4, decode_attention_int4_impl)):
        values, scales = qrows(kv)
        scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))
        for cur in (7, 200):
            flat = impl(q, values, scales_t, 1, cur, chunk=128, interpret=True)
            s8 = impl(q, values, scales_t, 1, cur, chunk=128, interpret=True,
                      mm_s8=True)
            np.testing.assert_allclose(
                np.asarray(s8, np.float32), np.asarray(flat, np.float32),
                atol=4e-2, rtol=4e-2, err_msg=f"{impl.__name__} cur={cur}")

    # composes with the windowed MQ path
    W = 3
    qw = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    base = jnp.asarray([5, 120], jnp.int32)
    values, scales = quantize_rows_int4(kv)
    scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))
    wk = jnp.asarray(rng.normal(size=(B, W, H * D)).astype(np.float32) * 0.3)
    wkq, wks = quantize_rows_int4(wk)
    wvq, wvs = quantize_rows_int4(wk * 0.7)
    win_scales = (jnp.transpose(wks, (0, 2, 1)), jnp.transpose(wvs, (0, 2, 1)))
    flat = decode_attention_mq_int4_impl(
        qw, values, scales_t, 1, base, chunk=128, interpret=True,
        win_kv=(wkq, wvq), win_scales=win_scales)
    s8 = decode_attention_mq_int4_impl(
        qw, values, scales_t, 1, base, chunk=128, interpret=True,
        win_kv=(wkq, wvq), win_scales=win_scales, mm_s8=True)
    np.testing.assert_allclose(np.asarray(s8, np.float32),
                               np.asarray(flat, np.float32),
                               atol=4e-2, rtol=4e-2)


def test_decode_attention_fused_dma_matches_flat(rng):
    """fused_dma: K+V (and both scale rows) arrive in one strided DMA
    each — numerically identical to the split-DMA path."""
    from meshanything_tpu.ops.decode_attention import decode_attention_int4_impl
    from meshanything_tpu.ops.kvcache import quantize_rows_int4

    B, H, D, S, L = 2, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    values, scales = quantize_rows_int4(kv)
    scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))
    for cur in (7, 200):
        a = decode_attention_int4_impl(q, values, scales_t, 1, cur,
                                       chunk=128, interpret=True)
        b = decode_attention_int4_impl(q, values, scales_t, 1, cur,
                                       chunk=128, interpret=True, fused_dma=True)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_decode_attention_int4_legacy_nibble_format(rng):
    """The legacy nibble-pair packing (int8) still routes through every
    int4 kernel shape — single-query flat, pipelined, and windowed MQ —
    and produces results identical to the byte-plane packing of the
    same rows (pure layout change; kept for the A/B kernel probes)."""
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_int4_impl,
        decode_attention_mq_int4_impl,
    )
    from meshanything_tpu.ops.kvcache import quantize_rows_int4

    B, W, H, D, S, L = 2, 3, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    v_leg, s_leg = quantize_rows_int4(kv, packing="nibble")
    v_pl, s_pl = quantize_rows_int4(kv, packing="plane")
    assert v_leg.dtype == jnp.int8 and v_pl.dtype == jnp.int32
    st_leg = jnp.transpose(s_leg, (0, 1, 2, 4, 3))
    st_pl = jnp.transpose(s_pl, (0, 1, 2, 4, 3))

    for cur in (7, 200):
        a = decode_attention_int4_impl(q, v_leg, st_leg, 1, cur,
                                       chunk=128, interpret=True)
        b = decode_attention_int4_impl(q, v_pl, st_pl, 1, cur,
                                       chunk=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
        ap = decode_attention_int4_impl(q, v_leg, st_leg, 1, cur, chunk=128,
                                        interpret=True, pipelined=True)
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(ap, np.float32))

    qw = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    base = jnp.asarray([5, 120], jnp.int32)
    wk = jnp.asarray(rng.normal(size=(B, W, H * D)).astype(np.float32) * 0.3)
    wv = wk * 0.7
    outs = []
    for packing, values, scales_t in (("nibble", v_leg, st_leg),
                                      ("plane", v_pl, st_pl)):
        wkq, wks = quantize_rows_int4(wk, packing=packing)
        wvq, wvs = quantize_rows_int4(wv, packing=packing)
        outs.append(decode_attention_mq_int4_impl(
            qw, values, scales_t, 1, base, chunk=128, interpret=True,
            win_kv=(wkq, wvq),
            win_scales=(jnp.transpose(wks, (0, 2, 1)),
                        jnp.transpose(wvs, (0, 2, 1)))))
    np.testing.assert_array_equal(np.asarray(outs[0], np.float32),
                                  np.asarray(outs[1], np.float32))


def test_decode_attention_pipelined_matches_flat(rng):
    """Continuous-pipeline single-query kernel (one flattened
    (row, chunk) DMA schedule) vs the grid-per-row kernel: identical
    math, including per-row lengths that differ across the batch."""
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_int4_impl,
        decode_attention_int8_impl,
    )
    from meshanything_tpu.ops.kvcache import quantize_rows, quantize_rows_int4

    from meshanything_tpu.ops.decode_attention import decode_attention_impl

    B, H, D, S, L = 3, 4, 64, 256, 2
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)

    # exact bf16 tier (unquantized cache): the headline decode path.
    # split_planes=True is the big-cache DMA layout (per-plane copies —
    # the strided 2-plane descriptor wraps its plane offset at >=2^31
    # byte strides on real TPU, PERF.md r5); both layouts must be
    # bit-identical to the grid kernel.
    kv_bf16 = kv.astype(jnp.bfloat16)
    for cur in (jnp.int32(7), jnp.int32(200),
                jnp.asarray([3, 129, 255], jnp.int32)):
        a = decode_attention_impl(q, kv_bf16, 1, cur, chunk=128,
                                  interpret=True)
        for split in (False, True):
            b = decode_attention_impl(q, kv_bf16, 1, cur, chunk=128,
                                      interpret=True, pipelined=True,
                                      split_planes=split)
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                err_msg=f"bf16 cur={cur} split={split}")

    # pv_bf16 (the flash-attn-2 bf16-P contract for the exact tier):
    # grid and pipelined must stay bit-identical to EACH OTHER, and
    # both within bf16-P rounding of the f32-P kernel.
    cur = jnp.asarray([3, 129, 255], jnp.int32)
    ref = np.asarray(decode_attention_impl(
        q, kv_bf16, 1, cur, chunk=128, interpret=True), np.float32)
    g = decode_attention_impl(q, kv_bf16, 1, cur, chunk=128,
                              interpret=True, pv_bf16=True)
    p = decode_attention_impl(q, kv_bf16, 1, cur, chunk=128,
                              interpret=True, pipelined=True, pv_bf16=True)
    np.testing.assert_array_equal(np.asarray(g, np.float32),
                                  np.asarray(p, np.float32),
                                  err_msg="pv_bf16 grid vs pipelined")
    np.testing.assert_allclose(np.asarray(g, np.float32), ref,
                               atol=2e-2, rtol=2e-2,
                               err_msg="pv_bf16 vs f32-P")

    for qrows, impl in ((quantize_rows, decode_attention_int8_impl),
                        (quantize_rows_int4, decode_attention_int4_impl)):
        values, scales = qrows(kv)
        scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))
        for cur in (jnp.int32(7), jnp.int32(200),
                    jnp.asarray([3, 129, 255], jnp.int32)):
            a = impl(q, values, scales_t, 1, cur, chunk=128, interpret=True)
            for split in (None, False, True):
                b = impl(q, values, scales_t, 1, cur, chunk=128,
                         interpret=True, pipelined=True, split_planes=split)
                np.testing.assert_array_equal(
                    np.asarray(a, np.float32), np.asarray(b, np.float32),
                    err_msg=f"{impl.__name__} cur={cur} split={split}")
