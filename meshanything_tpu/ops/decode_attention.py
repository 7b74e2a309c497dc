"""Pallas TPU kernel: single-query cached attention (flash-decoding).

The hot op of the AR decode loop (SURVEY.md §3 hot loop 1). Each step
the query attends to ``cur_len`` cached K/V rows. The XLA formulation
must slice a static window out of the cache (bucket bound) — paying HBM
traffic for the bucket bound every step. This kernel instead:

  * keeps the K/V cache in HBM and DMAs (CHUNK, H*D) tiles into VMEM
    with double buffering — one contiguous ~1 MB burst per chunk
    covering *all* heads,
  * stops at the *dynamic* ``cur_len`` chunk — only real context is
    ever read,
  * accumulates online-softmax in f32.

Head-dim alignment: D=64 is half a TPU lane tile, so per-head (S, D)
planes mis-tile. Instead rows are (H*D)=1024-wide and the per-head
contraction is recast as block-diagonal matmuls:

  logits[h, s] = sum_d q[h, d] * k[s, h*D+d]
              == (Qmat @ K^T)[h, s]  with Qmat[h] = q[h] embedded in
                                     the h-th D-block, zero elsewhere;
  out_full[h, :] = sum_s p[h, s] * v[s, :]; the true per-head output is
  the h-th D-block of row h, extracted by the caller.

The HxD FLOP inflation is irrelevant: the op is HBM-bandwidth-bound
(~2 FLOPs/byte against the MXU's thousands).

Cache layout contract: (2, L, B, S, H, D) — viewed here as
(2, L, B, S, H*D); the dynamic ``layer`` index is scalar-prefetched so
no per-layer copy ever materializes.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    cur_len_ref,        # SMEM (1,) int32
    layer_ref,          # SMEM (1,) int32
    # inputs
    qmat_ref,           # VMEM (1, H, H*D) — block-diagonal embedded query
    kv_hbm,             # HBM  (2, L, B, S, H*D)
    # output
    o_ref,              # VMEM (1, H, H*D) — row h holds sum_s p[h,s]*v[s,:]
    # scratch
    k_buf, v_buf,       # VMEM (2, CHUNK, H*D)
    sem,                # DMA  (2, 2)
    *,
    chunk: int,
    scale: float,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    cur_len = cur_len_ref[0]
    num_chunks = pl.cdiv(cur_len, chunk)

    def get_dma(slot, idx):
        return (
            pltpu.make_async_copy(
                kv_hbm.at[0, layer, b, pl.ds(idx * chunk, chunk)],
                k_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                kv_hbm.at[1, layer, b, pl.ds(idx * chunk, chunk)],
                v_buf.at[slot], sem.at[slot, 1],
            ),
        )

    kd, vd = get_dma(0, 0)
    kd.start()
    vd.start()

    qmat = qmat_ref[0].astype(jnp.float32) * scale                # (H, HD)
    h, hd = qmat.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry                   # (H,HD), (H,128), (H,128)
        slot = i % 2

        @pl.when(i + 1 < num_chunks)
        def _():
            nkd, nvd = get_dma((i + 1) % 2, i + 1)
            nkd.start()
            nvd.start()

        kd_i, vd_i = get_dma(slot, i)
        kd_i.wait()
        vd_i.wait()

        k = k_buf[slot].astype(jnp.float32)                       # (CHUNK, HD)
        v = v_buf[slot].astype(jnp.float32)

        logits = jax.lax.dot_general(
            qmat, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                         # (H, CHUNK)
        span = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (h, chunk), 1)
        logits = jnp.where(span < cur_len, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)           # (H, 1)
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        p = jnp.exp(logits - m_new)                               # (H, CHUNK)
        corr = jnp.exp(m_prev[:, :1] - m_new)                     # (H, 1)
        l_new = corr * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.dot(p, v, preferred_element_type=jnp.float32)    # (H, HD)
        acc_new = acc * corr + pv
        return (
            acc_new,
            jnp.broadcast_to(m_new, (h, 128)),
            jnp.broadcast_to(l_new, (h, 128)),
        )

    init = (
        jnp.zeros((h, hd), jnp.float32),
        jnp.full((h, 128), NEG_INF, jnp.float32),
        jnp.zeros((h, 128), jnp.float32),
    )
    acc, _m_fin, l_fin = jax.lax.fori_loop(0, num_chunks, body, init)
    out = acc / jnp.maximum(l_fin[:, :1], 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


def decode_attention_impl(
    q: jax.Array,         # (B, H, D)
    kv_cache: jax.Array,  # (2, L, B, S, H*D)  — FLAT head layout
    layer: jax.Array,     # scalar int32
    cur_len: jax.Array,   # scalar int32: valid rows (incl. current token)
    *,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Plain (un-jitted) kernel invocation for embedding inside larger
    compiled programs (the decode scan). ``interpret=True`` runs the
    Pallas interpreter — the CPU-test path.

    The cache's last dim MUST be flat H*D: a (..., H, 64) physical
    layout is lane-padded to 128 on TPU, so reshaping it here would
    materialize a full-cache copy per call (measured: ~18 µs per
    context row per decode step — 150x the DMA cost)."""
    b, h, d = q.shape
    _, l, _, s, hd = kv_cache.shape
    assert hd == h * d, (hd, h, d)
    scale = 1.0 / math.sqrt(d)

    # block-diagonal embedding: qmat[b, h, h*D:(h+1)*D] = q[b, h]
    eye = jnp.eye(h, dtype=q.dtype)
    qmat = jnp.einsum("ij,bjd->bijd", eye, q).reshape(b, h, hd)

    kv_flat = kv_cache

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, h, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, hd), kv_cache.dtype),
            pltpu.VMEM((2, chunk, hd), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(_kernel, chunk=chunk, scale=scale)
    out_full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(cur_len, jnp.int32).reshape(1),
        jnp.asarray(layer, jnp.int32).reshape(1),
        qmat,
        kv_flat,
    )
    # extract the h-th D-block of row h
    out4 = out_full.reshape(b, h, h, d)
    return out4[:, jnp.arange(h), jnp.arange(h), :]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def decode_attention(q, kv_cache, layer, cur_len, *, chunk: int = 512,
                     interpret: bool = False):
    return decode_attention_impl(q, kv_cache, layer, cur_len, chunk=chunk,
                                 interpret=interpret)


# ---------------------------------------------------------------------------
# multi-query variant (lookahead windows / chunked prefill)
#
# NOTE: _kernel, _kernel_mq and _kernel_int8 share the DMA-pipelined
# online-softmax skeleton on purpose: the single-query kernel is the
# benchmarked hot path and stays specialized; unifying them behind one
# parameterized body (w=1, base=cur_len-1, optional scales) is a
# planned cleanup once re-benchmarking is cheap. Until then, a change
# to any one of the three must be mirrored in the others.


def _kernel_mq(
    # scalar prefetch
    base_ref,           # SMEM (B,) int32 — per-row confirmed kv length
    layer_ref,          # SMEM (1,) int32
    # inputs
    qmat_ref,           # VMEM (1, W*H, H*D) block-diagonal queries
    kv_hbm,             # HBM  (2, L, B, S, H*D)
    # output
    o_ref,              # VMEM (1, W*H, H*D)
    # scratch
    k_buf, v_buf,       # VMEM (2, CHUNK, H*D)
    sem,                # DMA  (2, 2)
    *,
    chunk: int,
    scale: float,
    num_heads: int,
    window: int,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    base = base_ref[b]
    # query w may see base + w + 1 rows; the widest is the last query
    max_len = base + window
    num_chunks = pl.cdiv(max_len, chunk)

    def get_dma(slot, idx):
        span = pl.ds(idx * chunk, chunk)
        return (
            pltpu.make_async_copy(kv_hbm.at[0, layer, b, span], k_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(kv_hbm.at[1, layer, b, span], v_buf.at[slot], sem.at[slot, 1]),
        )

    kd, vd = get_dma(0, 0)
    kd.start()
    vd.start()

    qmat = qmat_ref[0].astype(jnp.float32) * scale                # (W*H, HD)
    wh, hd = qmat.shape

    # per logits-row kv visibility: row r = w*H + h sees base + w + 1 rows
    w_of_row = jax.lax.broadcasted_iota(jnp.int32, (wh, chunk), 0) // num_heads
    cur_of_row = base + w_of_row + 1                               # (W*H, CHUNK)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        slot = i % 2

        @pl.when(i + 1 < num_chunks)
        def _():
            nkd, nvd = get_dma((i + 1) % 2, i + 1)
            nkd.start()
            nvd.start()

        kd_i, vd_i = get_dma(slot, i)
        kd_i.wait()
        vd_i.wait()

        k = k_buf[slot].astype(jnp.float32)
        v = v_buf[slot].astype(jnp.float32)

        logits = jax.lax.dot_general(
            qmat, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                          # (W*H, CHUNK)
        span = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (wh, chunk), 1)
        logits = jnp.where(span < cur_of_row, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m_prev[:, :1] - m_new)
        l_new = corr * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.dot(p, v, preferred_element_type=jnp.float32)
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
    acc, _m, l_fin = jax.lax.fori_loop(0, num_chunks, body, init)
    out = acc / jnp.maximum(l_fin[:, :1], 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


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
    b, w, h, d = q.shape
    hd = h * d
    scale = 1.0 / math.sqrt(d)

    # block-diagonal embedding per (w, h) pair
    eye = jnp.eye(h, dtype=q.dtype)
    qmat = jnp.einsum("ij,bwjd->bwijd", eye, q).reshape(b, w * h, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, w * h, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, w * h, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, hd), kv_cache.dtype),
            pltpu.VMEM((2, chunk, hd), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(
        _kernel_mq, chunk=chunk, scale=scale, num_heads=h, window=w
    )
    out_full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, w * h, hd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(base_lens, jnp.int32).reshape(b),
        jnp.asarray(layer, jnp.int32).reshape(1),
        qmat,
        kv_cache,
    )
    out5 = out_full.reshape(b, w, h, h, d)
    return out5[:, :, jnp.arange(h), jnp.arange(h), :].reshape(b, w, h, d)


# ---------------------------------------------------------------------------
# int8-quantized cache variant


def _kernel_int8(
    # scalar prefetch
    cur_len_ref,        # SMEM (1,) int32
    layer_ref,          # SMEM (1,) int32
    # inputs
    qmat_ref,           # VMEM (1, H, H*D)
    kv_hbm,             # HBM  (2, L, B, S, H*D) int8
    scale_hbm,          # HBM  (2, L, B, 1, S) f32 per-row scales
    # output
    o_ref,              # VMEM (1, H, H*D)
    # scratch
    k_buf, v_buf,       # VMEM (2, CHUNK, H*D) int8
    ks_buf, vs_buf,     # VMEM (2, 1, CHUNK) f32
    sem,                # DMA  (2, 4)
    *,
    chunk: int,
    scale: float,
):
    b = pl.program_id(0)
    layer = layer_ref[0]
    cur_len = cur_len_ref[0]
    num_chunks = pl.cdiv(cur_len, chunk)

    def get_dma(slot, idx):
        span = pl.ds(idx * chunk, chunk)
        return (
            pltpu.make_async_copy(kv_hbm.at[0, layer, b, span], k_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(kv_hbm.at[1, layer, b, span], v_buf.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(scale_hbm.at[0, layer, b, :, span], ks_buf.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(scale_hbm.at[1, layer, b, :, span], vs_buf.at[slot], sem.at[slot, 3]),
        )

    for dma in get_dma(0, 0):
        dma.start()

    qmat = qmat_ref[0].astype(jnp.float32) * scale
    h, hd = qmat.shape

    def body(i, carry):
        acc, m_prev, l_prev = carry
        slot = i % 2

        @pl.when(i + 1 < num_chunks)
        def _():
            for dma in get_dma((i + 1) % 2, i + 1):
                dma.start()

        for dma in get_dma(slot, i):
            dma.wait()

        k = k_buf[slot].astype(jnp.float32)                       # (CHUNK, HD)
        v = v_buf[slot].astype(jnp.float32)
        k_scale = ks_buf[slot]                                    # (1, CHUNK)
        v_scale = vs_buf[slot]

        # fold the per-row K scale into the logits and the per-row V
        # scale into the probabilities — no transposes needed
        logits = jax.lax.dot_general(
            qmat, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * k_scale                                               # (H, CHUNK)
        span = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (h, chunk), 1)
        logits = jnp.where(span < cur_len, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m_prev[:, :1] - m_new)
        l_new = corr * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.dot(p * v_scale, v, preferred_element_type=jnp.float32)
        acc_new = acc * corr + pv
        return (
            acc_new,
            jnp.broadcast_to(m_new, (h, 128)),
            jnp.broadcast_to(l_new, (h, 128)),
        )

    init = (
        jnp.zeros((h, hd), jnp.float32),
        jnp.full((h, 128), NEG_INF, jnp.float32),
        jnp.zeros((h, 128), jnp.float32),
    )
    acc, _m, l_fin = jax.lax.fori_loop(0, num_chunks, body, init)
    out = acc / jnp.maximum(l_fin[:, :1], 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


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
    b, h, d = q.shape
    hd = h * d
    scale = 1.0 / math.sqrt(d)

    eye = jnp.eye(h, dtype=q.dtype)
    qmat = jnp.einsum("ij,bjd->bijd", eye, q).reshape(b, h, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, h, hd), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, hd), jnp.int8),
            pltpu.VMEM((2, chunk, hd), jnp.int8),
            pltpu.VMEM((2, 1, chunk), jnp.float32),
            pltpu.VMEM((2, 1, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )

    kernel = functools.partial(_kernel_int8, chunk=chunk, scale=scale)
    out_full = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(cur_len, jnp.int32).reshape(1),
        jnp.asarray(layer, jnp.int32).reshape(1),
        qmat,
        kv_values,
        kv_scales,
    )
    out4 = out_full.reshape(b, h, h, d)
    return out4[:, jnp.arange(h), jnp.arange(h), :]


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
