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


def _flash_decode_kernel(
    # scalar prefetch
    base_ref,           # SMEM (B,) int32 — per-row confirmed kv rows
    layer_ref,          # SMEM (1,) int32
    # inputs
    qmat_ref,           # VMEM (1, W*H, H*D) — block-diagonal queries
    *refs,              # kv_hbm[, scale_hbm], o_ref, scratch...
    chunk: int,
    scale: float,
    num_heads: int,
    window: int,
    quantized: bool,
    bits: int,
    depth: int,
):
    if quantized:
        kv_hbm, scale_hbm, o_ref, k_buf, v_buf, ks_buf, vs_buf, sem = refs
    else:
        kv_hbm, o_ref, k_buf, v_buf, sem = refs
        scale_hbm = ks_buf = vs_buf = None

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

    def load_kv(buf_slot):
        # bits=4: nibble-split + lane-aligned concat (the packing
        # contract of ops/kvcache.py puts column j's pair at j + HD/2,
        # so no lane interleave is ever needed)
        if bits == 4:
            raw = buf_slot.astype(jnp.int32)
            hi = jax.lax.shift_right_arithmetic(raw, 4)
            lo = jnp.bitwise_xor(jnp.bitwise_and(raw, 15), 8) - 8
            return jnp.concatenate([lo, hi], axis=-1).astype(mm_dtype)
        return buf_slot.astype(mm_dtype)

    b = pl.program_id(0)
    layer = layer_ref[0]
    base = base_ref[b]
    # query w of this row may see base + w + 1 rows; the widest is the
    # last query
    num_chunks = pl.cdiv(base + window, chunk)

    def get_dma(slot, idx):
        span = pl.ds(idx * chunk, chunk)
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

    qmat = qmat_ref[0]                                            # (W*H, HD)
    wh, hd = qmat.shape

    # per logits-row kv visibility
    w_of_row = jax.lax.broadcasted_iota(jnp.int32, (wh, chunk), 0) // num_heads
    cur_of_row = base + w_of_row + 1                              # (W*H, CHUNK)

    def body(i, carry):
        acc, m_prev, l_prev = carry               # (WH,HD), (WH,128), (WH,128)
        slot = i % depth

        # issue the chunk depth-1 ahead into the slot freed by i-1
        @pl.when(i + depth - 1 < num_chunks)
        def _():
            for dma in get_dma((i + depth - 1) % depth, i + depth - 1):
                dma.start()

        for dma in get_dma(slot, i):
            dma.wait()

        k = load_kv(k_buf[slot])                                  # (CHUNK, HD)
        v = load_kv(v_buf[slot])

        logits = jax.lax.dot_general(
            qmat, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                 # (W*H, CHUNK)
        if quantized:
            logits = logits * ks_buf[slot]                        # (1, CHUNK) bcast
        span = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (wh, chunk), 1)
        logits = jnp.where(span < cur_of_row, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)           # (W*H, 1)
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        p = jnp.exp(logits - m_new)                               # (W*H, CHUNK)
        corr = jnp.exp(m_prev[:, :1] - m_new)
        l_new = corr * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_buf[slot]
        # p.V matmul: quantized tiers (already approximate by the cache
        # codes, >=0.4% elementwise) run it in mm_dtype — the bf16
        # rounding of p (2^-9 relative) is within the tier's noise and
        # buys the native-MXU pass. The exact bf16 tiers keep p in f32
        # so their token streams are untouched.
        if quantized and mm_dtype != jnp.float32:
            pv = jnp.dot(p.astype(mm_dtype), v,
                         preferred_element_type=jnp.float32)      # (W*H, HD)
        else:
            pv = jnp.dot(p, v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)      # (W*H, HD)
        acc_new = acc * corr + pv
        return (
            acc_new,
            jnp.broadcast_to(m_new, (wh, 128)),
            jnp.broadcast_to(l_new, (wh, 128)),
        )

    init = (
        jnp.zeros((wh, hd), jnp.float32),
        jnp.full((wh, 128), NEG_INF, jnp.float32),
        jnp.zeros((wh, 128), jnp.float32),
    )
    acc, _m_fin, l_fin = jax.lax.fori_loop(0, num_chunks, body, init)
    out = acc / jnp.maximum(l_fin[:, :1], 1e-30)
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
) -> jax.Array:
    """Shared pallas_call builder; returns (B, W, H, D).

    bits: quantized-cache code width. 8 = one int8 per element; 4 = two
    4-bit codes per byte (kv_values last dim is HD//2, packing contract
    in ops/kvcache.py) — quarters the KV stream vs bf16.
    depth: DMA pipeline depth (buffer slots per stream). 2 = classic
    double buffering; 3 keeps one extra chunk in flight to ride out
    issue-latency gaps between chunks."""
    b, w, h, d = q.shape
    hd = h * d
    quantized = kv_scales is not None
    packed_hd = hd // 2 if (quantized and bits == 4) else hd
    assert kv_values.shape[-1] == packed_hd, (kv_values.shape, h, d, bits)
    # The unquantized ("exact tier") path loads cache values in the
    # query dtype; a wider cache (e.g. f32 KV with bf16 queries) would
    # be silently downcast inside the kernel, quietly breaking the
    # exactness guarantee — refuse it up front (ADVICE r3).
    assert quantized or kv_values.dtype == q.dtype, (
        f"unquantized KV cache dtype {kv_values.dtype} must match the "
        f"query dtype {q.dtype} (the kernel loads cache tiles as the "
        "query dtype; a wider cache would silently lose precision)")
    scale = 1.0 / math.sqrt(d)

    # block-diagonal embedding per (w, h) pair
    eye = jnp.eye(h, dtype=q.dtype)
    qmat = jnp.einsum("ij,bwjd->bwijd", eye, q).reshape(b, w * h, hd)

    in_specs = [
        pl.BlockSpec((1, w * h, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.HBM),
    ]
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
    if quantized:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.HBM))
        scratch += [
            pltpu.VMEM((depth, 1, chunk), jnp.float32),
            pltpu.VMEM((depth, 1, chunk), jnp.float32),
        ]
        inputs.append(kv_scales)
    scratch.append(pltpu.SemaphoreType.DMA((depth, 4 if quantized else 2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, w * h, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )

    kernel = functools.partial(
        _flash_decode_kernel, chunk=chunk, scale=scale,
        num_heads=h, window=w, quantized=quantized, bits=bits, depth=depth,
    )
    out_full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, w * h, hd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*inputs)
    # extract the h-th D-block of row (w, h)
    out5 = out_full.reshape(b, w, h, h, d)
    return out5[:, :, jnp.arange(h), jnp.arange(h), :].reshape(b, w, h, d)


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
) -> jax.Array:
    """Single-query cached attention. Plain (un-jitted) invocation for
    embedding inside larger compiled programs (the decode scan);
    ``interpret=True`` runs the Pallas interpreter — the CPU-test path.

    The cache's last dim MUST be flat H*D: a (..., H, 64) physical
    layout is lane-padded to 128 on TPU, so reshaping it here would
    materialize a full-cache copy per call (measured: ~18 µs per
    context row per decode step — 150x the DMA cost).

    The DMA pipeline runs at the fixed _flash_decode default depth=2:
    depth 2/3/4 x chunk 256/512/1024 all measured 571-585 GB/s
    (PERF.md r2 ablation), so the knob is not exposed here."""
    b = q.shape[0]
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))
    out = _flash_decode(q[:, None], kv_cache, None, layer, base,
                        chunk=chunk, interpret=interpret)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def decode_attention(q, kv_cache, layer, cur_len, *, chunk: int = 512,
                     interpret: bool = False):
    return decode_attention_impl(q, kv_cache, layer, cur_len, chunk=chunk,
                                 interpret=interpret)


def decode_attention_mq_impl(
    q: jax.Array,          # (B, W, H, D) window queries
    kv_cache: jax.Array,   # (2, L, B, S, H*D)
    layer: jax.Array,      # scalar int32
    base_lens: jax.Array,  # (B,) int32 — confirmed kv rows per row
                           # (query w of row r attends to base_lens[r]+w+1 rows)
    *,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Multi-query flash-decoding for lookahead windows: W queries per
    row share ONE streaming sweep of the live context. Returns
    (B, W, H, D)."""
    return _flash_decode(q, kv_cache, None, layer, base_lens,
                         chunk=chunk, interpret=interpret)


def decode_attention_int8_impl(
    q: jax.Array,          # (B, H, D)
    kv_values: jax.Array,  # (2, L, B, S, H*D) int8
    kv_scales: jax.Array,  # (2, L, B, 1, S) f32
    layer: jax.Array,
    cur_len: jax.Array,
    *,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """int8-cache flash-decoding: halves the dominant HBM traffic of the
    full-length decode (PERF.md bottleneck model) for <1% attention
    error (per-row symmetric scales)."""
    b = q.shape[0]
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))
    out = _flash_decode(q[:, None], kv_values, kv_scales, layer, base,
                        chunk=chunk, interpret=interpret)
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
) -> jax.Array:
    """Multi-query + int8 cache: composes the two decode accelerators
    (Jacobi lookahead windows over a quantized cache) — round-1's
    missing combination."""
    return _flash_decode(q, kv_values, kv_scales, layer, base_lens,
                         chunk=chunk, interpret=interpret)


def decode_attention_int4_impl(
    q: jax.Array,          # (B, H, D)
    kv_values: jax.Array,  # (2, L, B, S, H*D//2) int8 — two 4-bit codes/byte
    kv_scales: jax.Array,  # (2, L, B, 1, S) f32
    layer: jax.Array,
    cur_len: jax.Array,
    *,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """int4-cache flash-decoding: QUARTERS the dominant KV traffic
    (2.73 TB/mesh exact, PERF.md bottleneck model). Packing contract in
    ops/kvcache.py::quantize_rows_int4; coarser than int8 — agreement
    must be re-validated per model (tools/trained_agreement_probe.py)."""
    b = q.shape[0]
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))
    out = _flash_decode(q[:, None], kv_values, kv_scales, layer, base,
                        chunk=chunk, interpret=interpret, bits=4)
    return out[:, 0]


def decode_attention_mq_int4_impl(
    q: jax.Array,          # (B, W, H, D)
    kv_values: jax.Array,  # (2, L, B, S, H*D//2) int8
    kv_scales: jax.Array,  # (2, L, B, 1, S) f32
    layer: jax.Array,
    base_lens: jax.Array,  # (B,) int32
    *,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Multi-query + int4 cache: lookahead windows over the
    quarter-width cache — the KV-bound large-batch fast path."""
    return _flash_decode(q, kv_values, kv_scales, layer, base_lens,
                         chunk=chunk, interpret=interpret, bits=4)


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
