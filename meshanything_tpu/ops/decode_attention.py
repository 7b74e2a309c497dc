"""Pallas TPU kernel: cached flash-decoding attention — ONE body for
all four decode variants (single-query / multi-query lookahead windows,
bf16 / int8 KV cache).

The hot op of the AR decode loop (SURVEY.md §3 hot loop 1). Each step
the query attends to ``cur_len`` cached K/V rows. The XLA formulation
must slice a static window out of the cache (bucket bound) — paying HBM
traffic for the bucket bound every step. This kernel instead:

  * keeps the K/V cache in HBM and DMAs (CHUNK, H*D) tiles into VMEM
    with double buffering — one contiguous ~1 MB burst per chunk
    covering *all* heads,
  * stops at the *dynamic* per-row context length — only real context
    is ever read,
  * accumulates online-softmax in f32.

Head-dim alignment: D=64 is half a TPU lane tile, so per-head (S, D)
planes mis-tile. Instead rows are (H*D)=1024-wide and the per-head
contraction is recast as block-diagonal matmuls:

  logits[h, s] = sum_d q[h, d] * k[s, h*D+d]
              == (Qmat @ K^T)[h, s]  with Qmat[h] = q[h] embedded in
                                     the h-th D-block, zero elsewhere;
  out_full[h, :] = sum_s p[h, s] * v[s, :]; the true per-head output is
  the h-th D-block of row h, extracted by the caller.

The HxD FLOP inflation is tolerable only if the matmuls ride the MXU's
native bf16 path: at bf16 caches the op is HBM-bandwidth-bound, but a
quantized (int8/int4) stream shrinks the bytes 2-4x while the inflated
FLOPs stay (~44 TFLOP per 800-face mesh at W=8) — in f32 that made the
quantized kernels COMPUTE-bound (measured: int4 B=64 1.883 s/mesh ~=
the f32-matmul roofline). Hence the matmul dtype policy below: operands
in the query dtype, accumulation in f32, softmax statistics in f32.

Variant parameterization (replacing the three hand-mirrored round-1
kernel bodies):
  * ``window`` W: the logits matrix is (W*H, CHUNK); row r = w*H + h is
    query w of head h and sees ``base + w + 1`` context rows (W=1 with
    base = cur_len - 1 reproduces plain single-query decoding).
  * ``quantized``: the cache is int8 with f32 per-row scales streamed
    alongside; the K scale folds into the logits, the V scale into the
    probabilities — no transposes.

Cache layout contract: (2, L, B, S, H*D) flat rows; the dynamic
``layer`` index is scalar-prefetched so no per-layer copy ever
materializes. int8 scales ride a separate (2, L, B, 1, S) f32 buffer.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _unpack4(tile, out_dtype):
    """In-kernel int4 unpack -> full-width codes in the matmul dtype.

    Routes on the tile dtype (the packing contract of ops/kvcache.py):

      * int32 = NIBBLE-PLANE words (the default): TWO vector ops per
        plane on natively-tiled int32 (no int8->int32 widen relayout),
        and every plane lands as a contiguous lane-aligned column
        block so reassembly is one concat. Measured 1.07x over the
        legacy unpack on the shipping pipelined kernel
        (tools/int4_plane_probe.py, PERF.md r5).
      * int8 = legacy nibble pairs: int32 widen + split + sign-fix +
        concat (the measured VPU residual of the r4 int4 kernel,
        PERF.md r4 — kept for A/B probes).
    """
    if tile.dtype == jnp.int32:
        # 2 ops/plane: shift the nibble to the sign position, then
        # arithmetic-shift down — sign extension rides the shift, no
        # mask/xor/sub chain. Concat in int32 and cast ONCE after:
        # full-lane int32 planes concat as pure vreg renumbering,
        # while casting per-plane first turns the concat into a
        # sublane relayout (measured 284 -> 324 us/call, PERF.md r5).
        planes = []
        for p in range(8):
            up = jax.lax.shift_left(tile, 4 * (7 - p)) if p != 7 else tile
            planes.append(jax.lax.shift_right_arithmetic(up, 28))
        return jnp.concatenate(planes, axis=-1).astype(out_dtype)
    raw = tile.astype(jnp.int32)
    hi = jax.lax.shift_right_arithmetic(raw, 4)
    lo = jnp.bitwise_xor(jnp.bitwise_and(raw, 15), 8) - 8
    return jnp.concatenate([lo, hi], axis=-1).astype(out_dtype)


def _int4_packed_hd(hd: int, dtype) -> int:
    return hd // 8 if dtype == jnp.int32 else hd // 2


def _flash_decode_kernel(
    # scalar prefetch
    base_ref,           # SMEM (B,) int32 — per-row confirmed kv rows
    layer_ref,          # SMEM (1,) int32
    # inputs
    qmat_ref,           # VMEM (1, W*H, H*D) block-diagonal queries — or,
                        # grouped, (1, G, W*2, 128) head-pair blocks
    *refs,              # kv_hbm[, scale_hbm][, win refs], o_ref, scratch...
    chunk: int,
    scale: float,
    num_heads: int,
    window: int,
    quantized: bool,
    bits: int,
    depth: int,
    grouped: bool = False,
    windowed: bool = False,
    mm_s8: bool = False,
    fused_dma: bool = False,
    pv_bf16: bool = False,
):
    refs = list(refs)
    # mm_s8 (quantized paths): contract the int8/int4 CODES directly on
    # the MXU s8 path (s8xs8->s32 runs at 2x bf16 throughput on v5e and
    # skips the code->bf16 VPU cast). Queries arrive pre-quantized with
    # per-row scales (qs_ref); probabilities are re-quantized per row
    # before p.V. Adds ~0.4-0.8% relative noise on top of the tier's
    # own code error — revalidate agreement per model
    # (tools/trained_agreement_probe.py).
    qs_ref = refs.pop(0) if mm_s8 else None
    kv_hbm = refs.pop(0)
    scale_hbm = refs.pop(0) if quantized else None
    if windowed:
        # lookahead window K/V arrive as VMEM inputs (same codes as the
        # cache writes) instead of being scattered into the cache first:
        # the kernel folds them as one extra causal tile, and the cache
        # write happens ONCE per forward after the layer scan
        # (models/lookahead.py) — removing the per-layer per-row
        # dynamic_update_slice storm that made the window forward
        # dispatch-bound (measured 5.2 ms of the 11.25 ms low-context
        # forward at int4 B=24, tools/la_dispatch_probe.py).
        win_k_ref = refs.pop(0)
        win_v_ref = refs.pop(0)
        win_ks_ref = refs.pop(0) if quantized else None
        win_vs_ref = refs.pop(0) if quantized else None
    if fused_dma:
        # K and V tiles (and both scale rows) arrive in ONE strided DMA
        # each: halves the per-chunk DMA count — at int4 B=16/ctx 7168 a
        # call issues ~900 copies whose fixed issue cost rivals the
        # transfer time of the 4x-shrunk packed stream.
        if quantized:
            o_ref, kv_buf, sc_buf, sem = refs[0], refs[1], refs[2], refs[3]
        else:
            o_ref, kv_buf, sem = refs[0], refs[1], refs[2]
            sc_buf = None

        def k_at(s):
            return kv_buf[s, 0]

        def v_at(s):
            return kv_buf[s, 1]

        def ks_at(s):
            return sc_buf[s, 0:1]

        def vs_at(s):
            return sc_buf[s, 1:2]
    else:
        o_ref, k_buf, v_buf = refs[0], refs[1], refs[2]
        if quantized:
            ks_buf, vs_buf, sem = refs[3], refs[4], refs[5]
        else:
            ks_buf = vs_buf = None
            sem = refs[3]

        def k_at(s):
            return k_buf[s]

        def v_at(s):
            return v_buf[s]

        def ks_at(s):
            return ks_buf[s]

        def vs_at(s):
            return vs_buf[s]

    # Matmul operand dtype = the query dtype (bf16 in production). The
    # kernel is COMPUTE-bound once the KV stream is quantized (the
    # block-diagonal trick inflates FLOPs H-fold: ~44 TFLOP/mesh at
    # W=8), and f32 dot_generals run ~6x slower than native
    # bf16xbf16->f32 MXU passes. Lossless by construction: bf16 cache
    # values and int8/int4 codes ([-127,127] / [-8,7]) are all exactly
    # representable in bf16, products accumulate in f32, and the 1/sqrt(d)
    # scale is applied post-matmul in f32 — so logits match the f32
    # formulation up to accumulation order.
    mm_dtype = qmat_ref.dtype

    code_dtype = jnp.int8 if mm_s8 else mm_dtype

    def load_kv(buf_slot):
        # bits=4: unpack to full-width codes (byte-plane or legacy
        # nibble-pair, routed on the buffer dtype — contracts in
        # ops/kvcache.py). Both reassemble with lane-aligned concats;
        # no interleave ever touches the TPU lane dim.
        if bits == 4:
            return _unpack4(buf_slot, code_dtype)
        return buf_slot.astype(code_dtype)

    b = pl.program_id(0)
    layer = layer_ref[0]
    base = base_ref[b]
    # query w of this row may see base + w + 1 rows; the widest is the
    # last query. In windowed mode the cache sweep covers only the
    # confirmed history [0, base) — the window rows are VMEM inputs.
    num_chunks = pl.cdiv(base, chunk) if windowed else pl.cdiv(base + window, chunk)

    def get_dma(slot, idx):
        span = pl.ds(idx * chunk, chunk)
        if fused_dma:
            copies = [pltpu.make_async_copy(
                kv_hbm.at[:, layer, b, span], kv_buf.at[slot], sem.at[slot, 0])]
            if quantized:
                copies.append(pltpu.make_async_copy(
                    scale_hbm.at[:, layer, b, 0, span], sc_buf.at[slot],
                    sem.at[slot, 1]))
            return copies
        copies = [
            pltpu.make_async_copy(kv_hbm.at[0, layer, b, span], k_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(kv_hbm.at[1, layer, b, span], v_buf.at[slot], sem.at[slot, 1]),
        ]
        if quantized:
            copies += [
                pltpu.make_async_copy(scale_hbm.at[0, layer, b, :, span], ks_buf.at[slot], sem.at[slot, 2]),
                pltpu.make_async_copy(scale_hbm.at[1, layer, b, :, span], vs_buf.at[slot], sem.at[slot, 3]),
            ]
        return copies

    # prologue: fill the pipeline depth-1 chunks deep
    for pre in range(depth - 1):
        @pl.when(pre < num_chunks)
        def _(pre=pre):
            for dma in get_dma(pre % depth, pre):
                dma.start()

    qmat = qmat_ref[0]                           # (W*H, HD) | (G*W*2, 128)
    if grouped:
        # Head-pair grouping (VERDICT r3 #4): D=64 heads are packed two
        # per 128-lane tile, so the block-diagonal FLOP inflation drops
        # from H× to 2× — per chunk the logits matmul shrinks from one
        # (W*H, HD)x(HD, CHUNK) pass to G statically-unrolled
        # (W*2, 128)x(128, CHUNK) passes (G = H/2), and p.V shrinks
        # symmetrically. Row r = g*(W*2) + w*2 + j is query w of head
        # 2g+j, embedded in lane block j; everything stays 2D
        # (sublane-aligned static slices — Mosaic rejects batched
        # dot_generals with mismatched batch-dim positions).
        rows_n, _ = qmat.shape                   # (G*W*2, 128)
        g_cnt = num_heads // 2
        wg = rows_n // g_cnt                     # W*2
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (rows_n, chunk), 0)
        w_of_row = (r_iota % wg) // 2
        acc_shape = (rows_n, 128)
        stat_shape = (rows_n, 128)
    else:
        wh, hd = qmat.shape
        w_of_row = jax.lax.broadcasted_iota(jnp.int32, (wh, chunk), 0) // num_heads
        acc_shape = (wh, hd)
        stat_shape = (wh, 128)

    # per logits-row kv visibility
    cur_of_row = base + w_of_row + 1             # (rows, CHUNK)
    # p.V matmul dtype: quantized tiers (already approximate by the
    # cache codes, >=0.4% elementwise) run it in mm_dtype — the bf16
    # rounding of p (2^-9 relative) is within the tier's noise and buys
    # the native-MXU pass. The exact bf16 tiers keep p in f32 by
    # default so their token streams are untouched; pv_bf16 opts the
    # unquantized path into the same bf16-P contract flash-attn-2 uses
    # (fp16 P tile into the PV matmul, f32 accumulate — the reference's
    # own kernel, flash_attn interface in shape_opt.py:347-357), which
    # skips the multi-pass f32 MXU decomposition.
    lowp = (quantized or pv_bf16) and mm_dtype != jnp.float32

    def logits_of(k):
        # k: (N, HD) loaded tile -> masked-input logits (rows, N)
        if grouped:
            tiles = [
                jax.lax.dot_general(
                    qmat[g * wg:(g + 1) * wg], k[:, g * 128:(g + 1) * 128],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for g in range(g_cnt)
            ]
            return jnp.concatenate(tiles, axis=0) * scale        # (G*W2, N)
        if mm_s8:
            raw = jax.lax.dot_general(
                qmat, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            return raw.astype(jnp.float32) * (qs_ref[0][:, :1] * scale)
        return jax.lax.dot_general(
            qmat, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale          # (W*H, N)

    def fold(carry, logits, v, vs=None):
        # one online-softmax update with a masked logits tile and its
        # value rows v (N, HD); vs: optional (1, N) V-scales applied to
        # the probabilities (the no-transpose quantized-V contract)
        acc, m_prev, l_prev = carry
        m_cur = jnp.max(logits, axis=-1, keepdims=True)          # (rows, 1)
        m_new = jnp.maximum(m_prev[..., :1], m_cur)
        p = jnp.exp(logits - m_new)                              # (rows, N)
        corr = jnp.exp(m_prev[..., :1] - m_new)
        l_new = corr * l_prev[..., :1] + jnp.sum(p, axis=-1, keepdims=True)
        if vs is not None:
            p = p * vs
        if mm_s8:
            # re-quantize the (V-scaled) probabilities per row and run
            # p.V entirely in s8 codes; amax >= 1/127 is guaranteed (the
            # row max exponentiates to 1), so ps never vanishes
            ps = jnp.max(jnp.abs(p), axis=-1, keepdims=True) / 127.0
            ps = jnp.maximum(ps, 1e-30)
            p_s8 = jnp.clip(jnp.round(p / ps), -127, 127).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p_s8, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) * ps
            return (
                acc * corr + pv,
                jnp.broadcast_to(m_new, stat_shape),
                jnp.broadcast_to(l_new, stat_shape),
            )
        if grouped:
            pm = p.astype(mm_dtype) if lowp else p
            tiles = [
                jnp.dot(pm[g * wg:(g + 1) * wg],
                        (v[:, g * 128:(g + 1) * 128] if lowp
                         else v[:, g * 128:(g + 1) * 128].astype(jnp.float32)),
                        preferred_element_type=jnp.float32)
                for g in range(g_cnt)
            ]
            pv = jnp.concatenate(tiles, axis=0)                  # (G*W2, 128)
        elif lowp:
            pv = jnp.dot(p.astype(mm_dtype), v,
                         preferred_element_type=jnp.float32)     # (W*H, HD)
        else:
            pv = jnp.dot(p, v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)     # (W*H, HD)
        return (
            acc * corr + pv,
            jnp.broadcast_to(m_new, stat_shape),
            jnp.broadcast_to(l_new, stat_shape),
        )

    def body(i, carry):
        slot = i % depth

        # issue the chunk depth-1 ahead into the slot freed by i-1
        @pl.when(i + depth - 1 < num_chunks)
        def _():
            for dma in get_dma((i + depth - 1) % depth, i + depth - 1):
                dma.start()

        for dma in get_dma(slot, i):
            dma.wait()

        logits = logits_of(load_kv(k_at(slot)))
        if quantized:
            logits = logits * ks_at(slot)                        # (1, CHUNK) bcast
        span = i * chunk + jax.lax.broadcasted_iota(
            jnp.int32, w_of_row.shape, 1)
        # windowed: the sweep covers confirmed history only — every
        # query sees all of it; the causal structure lives in the
        # window tile below
        mask = (span < base) if windowed else (span < cur_of_row)
        logits = jnp.where(mask, logits, NEG_INF)
        return fold(carry, logits, load_kv(v_at(slot)),
                    vs=vs_at(slot) if quantized else None)

    init = (
        jnp.zeros(acc_shape, jnp.float32),
        jnp.full(stat_shape, NEG_INF, jnp.float32),
        jnp.zeros(stat_shape, jnp.float32),
    )
    carry = jax.lax.fori_loop(0, num_chunks, body, init)

    if windowed:
        # fold the W window rows as one extra causal tile: query w of
        # any head sees window rows 0..w (row 0 = the last confirmed
        # token, whose kv slot the cache does not hold yet)
        wl = logits_of(load_kv(win_k_ref[0]))                    # (rows, W)
        if quantized:
            wl = wl * win_ks_ref[0]                              # (1, W) bcast
        rows_w = jax.lax.broadcasted_iota(
            jnp.int32, (w_of_row.shape[0], window), 0)
        rows_w = ((rows_w % wg) // 2) if grouped else (rows_w // num_heads)
        cols_w = jax.lax.broadcasted_iota(
            jnp.int32, (w_of_row.shape[0], window), 1)
        wmask = cols_w <= rows_w
        wl = jnp.where(wmask, wl, NEG_INF)
        carry = fold(carry, wl, load_kv(win_v_ref[0]),
                     vs=win_vs_ref[0] if quantized else None)

    acc, _m_fin, l_fin = carry
    out = acc / jnp.maximum(l_fin[..., :1], 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_decode(
    q: jax.Array,                      # (B, W, H, D)
    kv_values: jax.Array,              # (2, L, B, S, H*D) bf16 or int8
    kv_scales,                         # (2, L, B, 1, S) f32, or None
    layer: jax.Array,
    base_lens: jax.Array,              # (B,) int32
    *,
    chunk: int,
    interpret: bool,
    bits: int = 8,
    depth: int = 2,
    grouped: bool = False,
    win_kv=None,                       # (wk, wv): (B, W, packed_hd) each
    win_scales=None,                   # (wks, wvs): (B, 1, W) f32 each
    mm_s8: bool = False,
    fused_dma: bool = False,
    pv_bf16: bool = False,
) -> jax.Array:
    """Shared pallas_call builder; returns (B, W, H, D).

    bits: quantized-cache code width. 8 = one int8 per element; 4 = two
    4-bit codes per byte (kv_values last dim is HD//2, packing contract
    in ops/kvcache.py) — quarters the KV stream vs bf16.
    depth: DMA pipeline depth (buffer slots per stream). 2 = classic
    double buffering; 3 keeps one extra chunk in flight to ride out
    issue-latency gaps between chunks.
    grouped: head-pair matmul layout (D=64 heads packed two per 128-lane
    tile) — cuts the block-diagonal FLOP inflation from H× to 2×.
    win_kv: lookahead window K/V rows (same codes the caller will write
    to the cache AFTER the forward) — the kernel folds them as one extra
    causal tile so the cache scatter leaves the per-layer hot path."""
    b, w, h, d = q.shape
    hd = h * d
    quantized = kv_scales is not None
    packed_hd = _int4_packed_hd(hd, kv_values.dtype) if (quantized and bits == 4) else hd
    assert kv_values.shape[-1] == packed_hd, (kv_values.shape, h, d, bits)
    # The unquantized ("exact tier") path loads cache values in the
    # query dtype; a wider cache (e.g. f32 KV with bf16 queries) would
    # be silently downcast inside the kernel, quietly breaking the
    # exactness guarantee — refuse it up front (ADVICE r3).
    assert quantized or kv_values.dtype == q.dtype, (
        f"unquantized KV cache dtype {kv_values.dtype} must match the "
        f"query dtype {q.dtype} (the kernel loads cache tiles as the "
        "query dtype; a wider cache would silently lose precision)")
    windowed = win_kv is not None
    assert not mm_s8 or quantized, "mm_s8 applies to the quantized tiers"
    assert not (mm_s8 and grouped), "mm_s8 and grouped are separate experiments"
    scale = 1.0 / math.sqrt(d)

    if grouped:
        assert d == 64 and h % 2 == 0, (h, d)
        g = h // 2
        # row r = w*2 + j of group g holds query (w, head 2g+j) in lane
        # block j: qg[b, g, w*2+j, j*64:(j+1)*64] = q[b, w, 2g+j]
        eye2 = jnp.eye(2, dtype=q.dtype)
        q6 = q.reshape(b, w, g, 2, d)
        qmat = jnp.einsum("jk,bwgjd->bgwjkd", eye2, q6).reshape(b, g * w * 2, 128)
        qspec = pl.BlockSpec((1, g * w * 2, 128), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        out_shape = (b, g * w * 2, 128)
    else:
        # block-diagonal embedding per (w, h) pair
        eye = jnp.eye(h, dtype=q.dtype)
        qmat = jnp.einsum("ij,bwjd->bwijd", eye, q).reshape(b, w * h, hd)
        qspec = pl.BlockSpec((1, w * h, hd), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        out_shape = (b, w * h, hd)

    qs_in = None
    if mm_s8:
        # pre-quantize the block-diagonal queries per row (each row has
        # one head's 64 values; symmetric s8). The per-row scale rides a
        # small broadcast VMEM input the kernel folds into the logits.
        qf = qmat.astype(jnp.float32)
        amax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
        qs = jnp.maximum(amax, 1e-30) / 127.0
        qmat = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
        qs_in = jnp.broadcast_to(qs, qs.shape[:-1] + (128,)).astype(jnp.float32)

    in_specs = [
        qspec,
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    if fused_dma:
        scratch = [pltpu.VMEM((depth, 2, chunk, packed_hd), kv_values.dtype)]
    else:
        scratch = [
            pltpu.VMEM((depth, chunk, packed_hd), kv_values.dtype),
            pltpu.VMEM((depth, chunk, packed_hd), kv_values.dtype),
        ]
    inputs = [
        jnp.asarray(base_lens, jnp.int32).reshape(b),
        jnp.asarray(layer, jnp.int32).reshape(1),
        qmat,
        kv_values,
    ]
    if mm_s8:
        in_specs.insert(1, pl.BlockSpec(
            (1, qs_in.shape[1], 128), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM))
        inputs.insert(3, qs_in)
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        if fused_dma:
            scratch.append(pltpu.VMEM((depth, 2, chunk), jnp.float32))
        else:
            scratch += [
                pltpu.VMEM((depth, 1, chunk), jnp.float32),
                pltpu.VMEM((depth, 1, chunk), jnp.float32),
            ]
        inputs.append(kv_scales)
    if windowed:
        wk, wv = win_kv
        assert wk.shape == (b, w, packed_hd), (wk.shape, b, w, packed_hd)
        assert wk.dtype == kv_values.dtype, (wk.dtype, kv_values.dtype)
        win_spec = pl.BlockSpec((1, w, packed_hd), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        in_specs += [win_spec, win_spec]
        inputs += [wk, wv]
        if quantized:
            wks, wvs = win_scales
            assert wks.shape == (b, 1, w), (wks.shape, b, w)
            ws_spec = pl.BlockSpec((1, 1, w), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
            in_specs += [ws_spec, ws_spec]
            inputs += [wks, wvs]
    if fused_dma:
        scratch.append(pltpu.SemaphoreType.DMA((depth, 2 if quantized else 1)))
    else:
        scratch.append(pltpu.SemaphoreType.DMA((depth, 4 if quantized else 2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1,) + out_shape[1:],
            lambda i, *_: (i,) + (0,) * (len(out_shape) - 1),
            memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    kernel = functools.partial(
        _flash_decode_kernel, chunk=chunk, scale=scale,
        num_heads=h, window=w, quantized=quantized, bits=bits, depth=depth,
        grouped=grouped, windowed=windowed, mm_s8=mm_s8,
        fused_dma=fused_dma, pv_bf16=pv_bf16,
    )
    out_full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16 if mm_s8 and q.dtype == jnp.int8 else q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    if grouped:
        # out_full[b, g*W2 + w*2+j, j*64:(j+1)*64] -> (b, w, 2g+j, d)
        out6 = out_full.reshape(b, g, w, 2, 2, d)
        diag = out6[:, :, :, jnp.arange(2), jnp.arange(2), :]     # (b, g, w, 2, d)
        return jnp.moveaxis(diag, 2, 1).reshape(b, w, h, d)
    # extract the h-th D-block of row (w, h)
    out5 = out_full.reshape(b, w, h, h, d)
    return out5[:, :, jnp.arange(h), jnp.arange(h), :].reshape(b, w, h, d)


def _flash_decode_pipelined_kernel(
    # scalar prefetch
    base_ref,           # SMEM (B,) int32
    layer_ref,          # SMEM (1,) int32
    # inputs
    qmat_ref,           # VMEM (B, H, H*D) block-diagonal queries (W=1)
    *refs,              # kv_hbm[, scale_hbm], o_ref, kv_buf[, sc_buf], sem
    chunk: int,
    scale: float,
    quantized: bool,
    bits: int,
    depth: int,
    batch: int,
    split_planes: bool,
    pv_bf16: bool = False,
):
    """Single-query decode with ONE continuous DMA pipeline over the
    flattened (row, chunk) schedule. The grid=(B,) kernel pays a fixed
    ~16 µs per row (prologue stall + grid machinery — measured: B=1 is
    28 µs/call at ctx 7168 where the byte floor is ~12 µs, and none of
    chunk size / matmul dtype / DMA fusion moves it). Here rows share
    the pipeline: while row r's tail chunks compute, row r+1's first
    chunks are already in flight, so the per-row fixed cost is paid
    once per call instead of B times.

    split_planes: issue the K and V tiles as two per-plane copies
    instead of one strided 2-plane copy. REQUIRED for caches whose
    K->V plane stride is >= 2^31 bytes: the strided descriptor's plane
    offset wraps 32-bit arithmetic and the V tile silently reads the
    wrong address (measured on-chip at the 11.25 GiB bf16 B=16 cache —
    grid-vs-pipelined max abs 0.049, PERF.md r5; small caches are
    bit-identical). The builder picks it automatically from the cache
    byte size."""
    refs = list(refs)
    kv_hbm = refs.pop(0)
    scale_hbm = refs.pop(0) if quantized else None
    if quantized:
        o_ref, kv_buf, sc_buf, sem = refs
    else:
        o_ref, kv_buf, sem = refs
        sc_buf = None
    mm_dtype = qmat_ref.dtype
    layer = layer_ref[0]
    rows = o_ref.shape[1]                       # H block-diag rows

    def load(buf_slot):
        if bits == 4:
            return _unpack4(buf_slot, mm_dtype)
        return buf_slot.astype(mm_dtype)

    def nchunks(r):
        rr = jnp.minimum(r, batch - 1)          # clamp for past-end cursors
        return pl.cdiv(base_ref[rr] + 1, chunk)

    def adv(r, c):
        c2 = c + 1
        wrap = c2 >= nchunks(r)
        return jnp.where(wrap, r + 1, r), jnp.where(wrap, 0, c2)

    def kv_copies(slot, r, c):
        span = pl.ds(c * chunk, chunk)
        if split_planes:
            return [
                pltpu.make_async_copy(
                    kv_hbm.at[0, layer, r, span], kv_buf.at[slot, 0],
                    sem.at[slot, 0]),
                pltpu.make_async_copy(
                    kv_hbm.at[1, layer, r, span], kv_buf.at[slot, 1],
                    sem.at[slot, 0]),
            ]
        return [pltpu.make_async_copy(
            kv_hbm.at[:, layer, r, span], kv_buf.at[slot], sem.at[slot, 0])]

    def sc_copy(slot, r, c):
        span = pl.ds(c * chunk, chunk)
        return pltpu.make_async_copy(
            scale_hbm.at[:, layer, r, 0, span], sc_buf.at[slot], sem.at[slot, 1])

    def issue(slot, r, c):
        for cp in kv_copies(slot, r, c):
            cp.start()
        if quantized:
            sc_copy(slot, r, c).start()

    total = jax.lax.fori_loop(
        0, batch, lambda r, a: a + nchunks(r), jnp.zeros((), jnp.int32))

    # prologue: issue the first depth-1 schedule positions
    def pro(i, rc):
        r, c = rc

        @pl.when(i < total)
        def _():
            issue(i % depth, r, c)

        return adv(r, c)

    ri0, ci0 = jax.lax.fori_loop(
        0, depth - 1, pro, (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)))

    neg = jnp.full((rows, 128), NEG_INF, jnp.float32)
    zstat = jnp.zeros((rows, 128), jnp.float32)
    zacc = jnp.zeros((rows, o_ref.shape[2]), jnp.float32)

    def cond(carry):
        return carry[0] < total

    def body(carry):
        t, r, c, ri, ci, acc, m_prev, l_prev = carry
        slot = t % depth

        @pl.when(t + depth - 1 < total)
        def _():
            issue((t + depth - 1) % depth, ri, ci)

        ri2, ci2 = adv(ri, ci)

        for cp in kv_copies(slot, r, c):
            cp.wait()
        if quantized:
            sc_copy(slot, r, c).wait()

        k = load(kv_buf[slot, 0])
        v = load(kv_buf[slot, 1])
        qmat_r = qmat_ref[r]                                     # (rows, HD)
        logits = jax.lax.dot_general(
            qmat_r, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if quantized:
            logits = logits * sc_buf[slot, 0:1]
        span = c * chunk + jax.lax.broadcasted_iota(jnp.int32, (rows, chunk), 1)
        logits = jnp.where(span < base_ref[r] + 1, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m_prev[:, :1] - m_new)
        l_new = corr * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * sc_buf[slot, 1:2]
        # pv_bf16: the flash-attn-2 P contract for the exact tier (see
        # _flash_decode_kernel) — skips the f32 MXU decomposition that
        # makes this kernel compute-bound per chunk step.
        lowp = (quantized or pv_bf16) and mm_dtype != jnp.float32
        if lowp:
            pv = jnp.dot(p.astype(mm_dtype), v, preferred_element_type=jnp.float32)
        else:
            pv = jnp.dot(p, v.astype(jnp.float32), preferred_element_type=jnp.float32)
        acc_new = acc * corr + pv

        last = c + 1 >= nchunks(r)

        @pl.when(last)
        def _():
            o_ref[r] = (acc_new / jnp.maximum(l_new[:, :1], 1e-30)
                        ).astype(o_ref.dtype)

        keep = ~last
        acc2 = jnp.where(keep, acc_new, zacc)
        m2 = jnp.where(keep, jnp.broadcast_to(m_new, (rows, 128)), neg)
        l2 = jnp.where(keep, jnp.broadcast_to(l_new, (rows, 128)), zstat)
        r2, c2 = adv(r, c)
        return (t + 1, r2, c2, ri2, ci2, acc2, m2, l2)

    jax.lax.while_loop(cond, body, (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), ri0, ci0, zacc, neg, zstat))


def _flash_decode_pipelined(
    q: jax.Array,                      # (B, H, D)
    kv_values: jax.Array,              # (2, L, B, S, packed_hd)
    kv_scales,                         # (2, L, B, 1, S) f32, or None
    layer: jax.Array,
    cur_len: jax.Array,                # scalar or (B,)
    *,
    chunk: int,
    interpret: bool,
    bits: int = 8,
    depth: int = 2,
    split_planes: bool | None = None,
    pv_bf16: bool = False,
) -> jax.Array:
    """Continuous-pipeline single-query builder; returns (B, H, D).

    split_planes: None (default) auto-selects per-plane K/V copies
    whenever the cache's K->V plane stride reaches 2^31 bytes — the
    single strided 2-plane descriptor wraps its plane offset in 32-bit
    arithmetic there and silently streams V from the wrong address
    (measured on-chip, PERF.md r5). Explicit True/False is for A/B
    probes only."""
    b, h, d = q.shape
    hd = h * d
    quantized = kv_scales is not None
    packed_hd = _int4_packed_hd(hd, kv_values.dtype) if (quantized and bits == 4) else hd
    assert kv_values.shape[-1] == packed_hd, (kv_values.shape, h, d, bits)
    assert quantized or kv_values.dtype == q.dtype, (kv_values.dtype, q.dtype)
    if split_planes is None:
        split_planes = kv_values.nbytes // 2 >= 2**31
    scale = 1.0 / math.sqrt(d)
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))

    eye = jnp.eye(h, dtype=q.dtype)
    qmat = jnp.einsum("ij,bjd->bijd", eye, q).reshape(b, h, hd)

    in_specs = [
        pl.BlockSpec((b, h, hd), lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
    inputs = [base, jnp.asarray(layer, jnp.int32).reshape(1), qmat, kv_values]
    scratch = [pltpu.VMEM((depth, 2, chunk, packed_hd), kv_values.dtype)]
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        inputs.append(kv_scales)
        scratch.append(pltpu.VMEM((depth, 2, chunk), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((depth, 2 if quantized else 1)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((b, h, hd), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _flash_decode_pipelined_kernel, chunk=chunk, scale=scale,
        quantized=quantized, bits=bits, depth=depth, batch=b,
        split_planes=split_planes, pv_bf16=pv_bf16,
    )
    out_full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    out4 = out_full.reshape(b, h, h, d)
    return out4[:, jnp.arange(h), jnp.arange(h), :].reshape(b, h, d)


# ---------------------------------------------------------------------------
# public entry points (thin shape adapters over _flash_decode)


def decode_attention_impl(
    q: jax.Array,         # (B, H, D)
    kv_cache: jax.Array,  # (2, L, B, S, H*D)  — FLAT head layout
    layer: jax.Array,     # scalar int32
    cur_len: jax.Array,   # scalar int32: valid rows (incl. current token)
    *,
    chunk: int = 512,
    interpret: bool = False,
    grouped: bool = False,
    pipelined: bool = False,
    split_planes: bool | None = None,
    pv_bf16: bool = False,
    depth: int = 2,
) -> jax.Array:
    """Single-query cached attention. Plain (un-jitted) invocation for
    embedding inside larger compiled programs (the decode scan);
    ``interpret=True`` runs the Pallas interpreter — the CPU-test path.

    The cache's last dim MUST be flat H*D: a (..., H, 64) physical
    layout is lane-padded to 128 on TPU, so reshaping it here would
    materialize a full-cache copy per call (measured: ~18 µs per
    context row per decode step — 150x the DMA cost).

    pipelined: one continuous DMA schedule over all (row, chunk) pairs
    instead of the grid=(B,) per-row pipeline. The grid kernel pays a
    fixed ~16 µs of prologue stall per ROW per call; at B=16/ctx 7168
    bf16 that is ~35% on top of the transfer time — the exact reason
    the exact tier measured 679 GB/s while a pure double-buffered DMA
    stream sustains 1054 GB/s on the same chip (tools/dma_wire_probe,
    PERF.md r5). Bit-identical to the grid kernel
    (tests/test_ops.py::test_decode_attention_pipelined_matches_flat).

    pv_bf16: run the P.V matmul with a bf16 P tile (f32 accumulate) —
    the same P precision flash-attn-2 feeds its PV matmul (the
    reference's kernel runs P in fp16), instead of this kernel's
    stricter f32-P default. Measured on-chip at the headline shape it
    is a WASH (664 vs 662 us/call, bit-identical output): the f32 PV
    decomposition is NOT the residual over the 1054 GB/s wire rate
    (PERF.md r5)."""
    if pipelined:
        assert not grouped, "pipelined and grouped are separate layouts"
        return _flash_decode_pipelined(q, kv_cache, None, layer, cur_len,
                                       chunk=chunk, interpret=interpret,
                                       split_planes=split_planes,
                                       pv_bf16=pv_bf16, depth=depth)
    b = q.shape[0]
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))
    out = _flash_decode(q[:, None], kv_cache, None, layer, base,
                        chunk=chunk, interpret=interpret, grouped=grouped,
                        pv_bf16=pv_bf16)
    return out[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("chunk", "interpret", "grouped",
                                    "pipelined", "pv_bf16"))
def decode_attention(q, kv_cache, layer, cur_len, *, chunk: int = 512,
                     interpret: bool = False, grouped: bool = False,
                     pipelined: bool = False, pv_bf16: bool = False):
    return decode_attention_impl(q, kv_cache, layer, cur_len, chunk=chunk,
                                 interpret=interpret, grouped=grouped,
                                 pipelined=pipelined, pv_bf16=pv_bf16)


def decode_attention_mq_impl(
    q: jax.Array,          # (B, W, H, D) window queries
    kv_cache: jax.Array,   # (2, L, B, S, H*D)
    layer: jax.Array,      # scalar int32
    base_lens: jax.Array,  # (B,) int32 — confirmed kv rows per row
                           # (query w of row r attends to base_lens[r]+w+1 rows)
    *,
    chunk: int = 512,
    interpret: bool = False,
    grouped: bool = False,
    win_kv=None,
) -> jax.Array:
    """Multi-query flash-decoding for lookahead windows: W queries per
    row share ONE streaming sweep of the live context. Returns
    (B, W, H, D).

    win_kv: (wk, wv) window K/V rows (B, W, H*D) — fused-append mode:
    the kernel folds them as one causal tile and the sweep covers only
    the confirmed history [0, base_lens[b]); the caller writes the rows
    into the cache once per forward, after the layer scan."""
    return _flash_decode(q, kv_cache, None, layer, base_lens,
                         chunk=chunk, interpret=interpret, grouped=grouped,
                         win_kv=win_kv)


def decode_attention_int8_impl(
    q: jax.Array,          # (B, H, D)
    kv_values: jax.Array,  # (2, L, B, S, H*D) int8
    kv_scales: jax.Array,  # (2, L, B, 1, S) f32
    layer: jax.Array,
    cur_len: jax.Array,
    *,
    chunk: int = 512,
    interpret: bool = False,
    grouped: bool = False,
    mm_s8: bool = False,
    pipelined: bool = False,
    split_planes: bool | None = None,
) -> jax.Array:
    """int8-cache flash-decoding: halves the dominant HBM traffic of the
    full-length decode (PERF.md bottleneck model) for <1% attention
    error (per-row symmetric scales)."""
    if pipelined:
        return _flash_decode_pipelined(q, kv_values, kv_scales, layer, cur_len,
                                       chunk=chunk, interpret=interpret,
                                       split_planes=split_planes)
    b = q.shape[0]
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))
    out = _flash_decode(q[:, None], kv_values, kv_scales, layer, base,
                        chunk=chunk, interpret=interpret, grouped=grouped,
                        mm_s8=mm_s8)
    return out[:, 0]


def decode_attention_mq_int8_impl(
    q: jax.Array,          # (B, W, H, D)
    kv_values: jax.Array,  # (2, L, B, S, H*D) int8
    kv_scales: jax.Array,  # (2, L, B, 1, S) f32
    layer: jax.Array,
    base_lens: jax.Array,  # (B,) int32
    *,
    chunk: int = 512,
    interpret: bool = False,
    grouped: bool = False,
    win_kv=None,
    win_scales=None,
    mm_s8: bool = False,
) -> jax.Array:
    """Multi-query + int8 cache: composes the two decode accelerators
    (Jacobi lookahead windows over a quantized cache) — round-1's
    missing combination."""
    return _flash_decode(q, kv_values, kv_scales, layer, base_lens,
                         chunk=chunk, interpret=interpret, grouped=grouped,
                         win_kv=win_kv, win_scales=win_scales, mm_s8=mm_s8)


def decode_attention_int4_impl(
    q: jax.Array,          # (B, H, D)
    kv_values: jax.Array,  # (2, L, B, S, H*D//8) int32 byte-plane words
                           # (legacy: (..., H*D//2) int8 nibble pairs)
    kv_scales: jax.Array,  # (2, L, B, 1, S) f32
    layer: jax.Array,
    cur_len: jax.Array,
    *,
    chunk: int = 512,
    interpret: bool = False,
    grouped: bool = False,
    mm_s8: bool = False,
    fused_dma: bool = False,
    pipelined: bool = False,
    split_planes: bool | None = None,
) -> jax.Array:
    """int4-cache flash-decoding: QUARTERS the dominant KV traffic
    (2.73 TB/mesh exact, PERF.md bottleneck model). Packing contract in
    ops/kvcache.py::quantize_rows_int4; coarser than int8 — agreement
    must be re-validated per model (tools/trained_agreement_probe.py)."""
    if pipelined:
        return _flash_decode_pipelined(q, kv_values, kv_scales, layer, cur_len,
                                       chunk=chunk, interpret=interpret, bits=4,
                                       split_planes=split_planes)
    b = q.shape[0]
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))
    out = _flash_decode(q[:, None], kv_values, kv_scales, layer, base,
                        chunk=chunk, interpret=interpret, bits=4,
                        grouped=grouped, mm_s8=mm_s8, fused_dma=fused_dma)
    return out[:, 0]


def decode_attention_mq_int4_impl(
    q: jax.Array,          # (B, W, H, D)
    kv_values: jax.Array,  # (2, L, B, S, H*D//8) int32 (byte-plane)
    kv_scales: jax.Array,  # (2, L, B, 1, S) f32
    layer: jax.Array,
    base_lens: jax.Array,  # (B,) int32
    *,
    chunk: int = 512,
    interpret: bool = False,
    grouped: bool = False,
    win_kv=None,
    win_scales=None,
    mm_s8: bool = False,
) -> jax.Array:
    """Multi-query + int4 cache: lookahead windows over the
    quarter-width cache — the KV-bound large-batch fast path."""
    return _flash_decode(q, kv_values, kv_scales, layer, base_lens,
                         chunk=chunk, interpret=interpret, bits=4,
                         grouped=grouped, win_kv=win_kv, win_scales=win_scales,
                         mm_s8=mm_s8)


def decode_attention_reference(q, kv_cache, layer, cur_len):
    """XLA reference for testing: same math, full-cache read.

    kv_cache: (2, L, B, S, H*D)."""
    b, h, d = q.shape
    _, l, _, s, hd = kv_cache.shape
    k_cache = kv_cache[0, layer].reshape(b, s, h, d)
    v_cache = kv_cache[1, layer].reshape(b, s, h, d)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32) * scale,
                        k_cache.astype(jnp.float32))
    mask = jnp.arange(s)[None, None, :] < cur_len
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", w, v_cache.astype(jnp.float32)).astype(q.dtype)
