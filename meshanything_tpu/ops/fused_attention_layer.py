"""Experimental fused decode-attention layer kernel.

Fuses three of the per-layer decode-step ops into one Pallas kernel:
qkv projection -> flash attention over the cache -> output projection.
The qkv (6.3 MB) and out (2 MB) weight slabs are VMEM-resident for the
launch; the MLP stays in XLA (its 16.8 MB doesn't fit alongside).

Motivation: the decode step carries ~0.39 ms of per-step glue above the
bandwidth floors (PERF.md ablation); per-layer op fusion attacks the
launch/glue share. The KV-cache write stays in XLA (measured free —
carry aliasing is in-place): the kernel *returns* the new K/V rows and
attends to the current token from registers, so it only ever reads the
cache (no aliasing contract needed).

Status: correctness-tested (interpret + TPU); wired behind
attn="pallas_fused" as an opt-in experiment — see PERF.md for whether
it beats the unfused path before promoting it to default.
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
    cur_len_ref,        # SMEM (1,) int32 — rows already in the cache
                        # (EXCLUDING the current token)
    layer_ref,          # SMEM (1,) int32
    # inputs
    x_ref,              # VMEM (1, 1, D_MODEL) — this row's activation
    wqkv_ref,           # VMEM (D_MODEL, 3*D_MODEL)
    bqkv_ref,           # VMEM (1, 3*D_MODEL)
    wout_ref,           # VMEM (D_MODEL, D_MODEL)
    bout_ref,           # VMEM (1, D_MODEL)
    kv_hbm,             # HBM  (2, L, B, S, D_MODEL)
    # outputs
    o_ref,              # VMEM (1, 1, D_MODEL) attn output (projected, +bias)
    k_ref,              # VMEM (1, 1, D_MODEL) new K row (for XLA cache write)
    v_ref,              # VMEM (1, 1, D_MODEL) new V row
    # scratch
    k_buf, v_buf,       # VMEM (2, CHUNK, D_MODEL)
    sem,                # DMA  (2, 2)
    *,
    chunk: int,
    num_heads: int,
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
        )

    @pl.when(num_chunks > 0)
    def _():
        kd, vd = get_dma(0, 0)
        kd.start()
        vd.start()

    # qkv projection on the MXU (weights already in VMEM)
    x = x_ref[0].astype(jnp.float32)                       # (1, DM)
    qkv = jnp.dot(x, wqkv_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32) + bqkv_ref[:].astype(jnp.float32)
    dm = x.shape[-1]
    q_vec = qkv[:, :dm]                                    # (1, DM)
    k_vec = qkv[:, dm:2 * dm]
    v_vec = qkv[:, 2 * dm:]
    k_ref[0] = k_vec.astype(k_ref.dtype)
    v_ref[0] = v_vec.astype(v_ref.dtype)

    h = num_heads
    hd = dm // h
    scale = 1.0 / math.sqrt(hd)

    # block-diagonal qmat built in-register: row i holds q scaled, with
    # only the i-th head's D-block non-zero
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, dm), 0)
    col_head = jax.lax.broadcasted_iota(jnp.int32, (h, dm), 1) // hd
    blockmask = (row_ids == col_head).astype(jnp.float32)
    qmat = jnp.broadcast_to(q_vec * scale, (h, dm)) * blockmask

    # self-attention term from registers (the current token's own K/V)
    self_logit = jnp.dot(qmat, k_vec.reshape(dm, 1),
                         preferred_element_type=jnp.float32)        # (H, 1)

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
        )                                                  # (H, CHUNK)
        span = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (h, chunk), 1)
        logits = jnp.where(span < cur_len, logits, NEG_INF)

        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev[:, :1], m_cur)
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m_prev[:, :1] - m_new)
        l_new = corr * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.dot(p, v, preferred_element_type=jnp.float32)
        acc_new = acc * corr + pv
        return (
            acc_new,
            jnp.broadcast_to(m_new, (h, 128)),
            jnp.broadcast_to(l_new, (h, 128)),
        )

    init = (
        jnp.zeros((h, dm), jnp.float32),
        jnp.full((h, 128), NEG_INF, jnp.float32),
        jnp.zeros((h, 128), jnp.float32),
    )
    acc, m_fin, l_fin = jax.lax.fori_loop(0, num_chunks, body, init)

    # fold in the self position (always the running-max update once more)
    m_new = jnp.maximum(m_fin[:, :1], self_logit)
    corr = jnp.exp(m_fin[:, :1] - m_new)
    p_self = jnp.exp(self_logit - m_new)                   # (H, 1)
    l_fin2 = corr * l_fin[:, :1] + p_self
    acc = acc * corr + p_self * jnp.broadcast_to(v_vec, (h, dm))

    out_full = acc / jnp.maximum(l_fin2, 1e-30)            # (H, DM)
    # extract the h-th D-block of row h: mask then column-sum
    o_vec = jnp.sum(out_full * blockmask, axis=0, keepdims=True)    # (1, DM)

    # output projection (+bias); residual/LN stay in XLA
    o_proj = jnp.dot(o_vec, wout_ref[:].astype(jnp.float32),
                     preferred_element_type=jnp.float32) + bout_ref[:].astype(jnp.float32)
    o_ref[0] = o_proj.astype(o_ref.dtype)


def fused_attention_layer_impl(
    x: jax.Array,          # (B, D_MODEL) layer input (post-embedding / previous layer)
    wqkv: jax.Array,       # (D_MODEL, 3*D_MODEL)
    bqkv: jax.Array,       # (3*D_MODEL,)
    wout: jax.Array,       # (D_MODEL, D_MODEL)
    bout: jax.Array,       # (D_MODEL,)
    kv_cache: jax.Array,   # (2, L, B, S, D_MODEL)
    layer: jax.Array,      # scalar int32
    cur_len: jax.Array,    # scalar int32: rows already cached (EXCL. current)
    *,
    num_heads: int,
    chunk: int = 512,
    interpret: bool = False,
):
    """Returns (attn_out (B, DM) projected+bias, k_row (B, DM), v_row (B, DM)).

    The caller adds the residual, applies layernorm, runs the MLP, and
    writes k/v_row into the cache at position cur_len."""
    b, dm = x.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, dm), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, dm), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dm), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, dm), kv_cache.dtype),
            pltpu.VMEM((2, chunk, dm), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    kernel = functools.partial(_kernel, chunk=chunk, num_heads=num_heads)
    o, k_row, v_row = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, dm), x.dtype),
            jax.ShapeDtypeStruct((b, 1, dm), kv_cache.dtype),
            jax.ShapeDtypeStruct((b, 1, dm), kv_cache.dtype),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        jnp.asarray(cur_len, jnp.int32).reshape(1),
        jnp.asarray(layer, jnp.int32).reshape(1),
        x.reshape(b, 1, dm),
        wqkv,
        bqkv.reshape(1, -1),
        wout,
        bout.reshape(1, -1),
        kv_cache,
    )
    return o[:, 0], k_row[:, 0], v_row[:, 0]
