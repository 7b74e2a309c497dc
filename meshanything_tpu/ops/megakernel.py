"""Whole-decode-step Pallas megakernel: all 24 OPT layers in ONE launch.

Motivation (PERF.md ablations): the per-step decode cost decomposes as
~39 µs/layer of unavoidable HBM traffic plus ~10 µs/layer of kernel
launch + XLA glue and ~0.12 ms/step of fixed overhead. The scan-of-
layers formulation pays the glue 24 times per token. This kernel runs
the entire step — qkv projection, KV-cache append, flash attention over
the live context, output projection, both layernorms and the MLP, for
every layer — inside one pallas_call, double-buffering each layer's
weights (24 MB/layer) through VMEM while the previous layer computes.

Differences from the per-layer flash-decode kernel
(ops/decode_attention.py):
  * weights stream from HBM via manual DMA (the round-1 partial fusion
    staged them through pallas's automatic input windows per launch,
    which cost more than the glue it saved);
  * the KV cache is an aliased input/output (pl.pallas_call
    input_output_aliases) — the new K/V rows are DMA'd back to HBM
    before the attention sweep reads them.

Scope: bf16 cache, single-query (the lookahead/int8 paths keep the
per-layer kernel). B is free but every row's attention sweep shares the
layer-weight streaming. VMEM budget: 2x(6+2+8+8) MB weight buffers
+ 2 x chunk x 1 KB KV buffers ~= 50 MB of the ~128 MB v5e VMEM.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _megakernel(
    # scalar prefetch
    pos_ref,            # SMEM (2,) int32: [write_pos, cur_len]
    # inputs
    x_ref,              # VMEM (B, D)
    qkv_w_hbm,          # HBM (L, D, 3D)
    qkv_b_ref,          # VMEM (L, 3D)
    out_w_hbm,          # HBM (L, D, D)
    out_b_ref,          # VMEM (L, D)
    ln_attn_ref,        # VMEM (L, 2, D)  [scale, bias]
    fc1_w_hbm,          # HBM (L, D, F)
    fc1_b_ref,          # VMEM (L, F)
    fc2_w_hbm,          # HBM (L, F, D)
    fc2_b_ref,          # VMEM (L, D)
    ln_ffn_ref,         # VMEM (L, 2, D)
    kv_in,              # HBM (2, L, B, S, D) — aliased with kv_out
    # outputs
    x_out_ref,          # VMEM (B, D)
    kv_out,             # HBM (2, L, B, S, D)
    # scratch
    qkv_buf,            # VMEM (2, D, 3D)
    out_buf,            # VMEM (2, D, D)
    fc1_buf,            # VMEM (2, D, F)
    fc2_buf,            # VMEM (2, F, D)
    k_buf, v_buf,       # VMEM (2, CHUNK, D)
    kv_row_buf,         # VMEM (2, B, D) — staging for the cache append
    w_sem,              # DMA (2, 4)
    kv_sem,             # DMA (2, 2)
    row_sem,            # DMA (2,)
    *,
    layers: int,
    heads: int,
    chunk: int,
    ln_eps: float,
):
    write_pos = pos_ref[0]
    cur_len = pos_ref[1]
    b, d = x_ref.shape
    hd = d // heads
    scale = 1.0 / math.sqrt(hd)

    def weight_dmas(slot, layer):
        return [
            pltpu.make_async_copy(qkv_w_hbm.at[layer], qkv_buf.at[slot], w_sem.at[slot, 0]),
            pltpu.make_async_copy(out_w_hbm.at[layer], out_buf.at[slot], w_sem.at[slot, 1]),
            pltpu.make_async_copy(fc1_w_hbm.at[layer], fc1_buf.at[slot], w_sem.at[slot, 2]),
            pltpu.make_async_copy(fc2_w_hbm.at[layer], fc2_buf.at[slot], w_sem.at[slot, 3]),
        ]

    for dma in weight_dmas(0, 0):
        dma.start()

    # head block-diagonal masks for the qmat trick: row h of qmat holds
    # q's h-th D-block embedded at columns [h*hd, (h+1)*hd)
    col = jax.lax.broadcasted_iota(jnp.int32, (heads, d), 1)
    head_of_col = col // hd
    row_head = jax.lax.broadcasted_iota(jnp.int32, (heads, d), 0)
    diag_mask = (head_of_col == row_head).astype(jnp.float32)     # (H, D)

    def layer_body(i, x):
        slot = i % 2

        @pl.when(i + 1 < layers)
        def _():
            for dma in weight_dmas((i + 1) % 2, i + 1):
                dma.start()

        for dma in weight_dmas(slot, i):
            dma.wait()

        residual = x                                               # (B, D) f32
        qkv = jnp.dot(x.astype(jnp.bfloat16), qkv_buf[slot],
                      preferred_element_type=jnp.float32)
        qkv = qkv + qkv_b_ref[i].astype(jnp.float32)
        q = qkv[:, :d]
        k_new = qkv[:, d:2 * d]
        v_new = qkv[:, 2 * d:]

        # append K/V rows to the HBM cache (aliased in/out) and wait so
        # the sweep below reads the fresh row at write_pos
        kv_row_buf[0] = k_new.astype(kv_row_buf.dtype)
        kv_row_buf[1] = v_new.astype(kv_row_buf.dtype)
        row_copies = []
        for sel in range(2):
            for bi in range(b):
                cp = pltpu.make_async_copy(
                    kv_row_buf.at[sel, pl.ds(bi, 1)],
                    kv_out.at[sel, i, bi, pl.ds(write_pos, 1)],
                    row_sem.at[sel],
                )
                cp.start()
                row_copies.append(cp)
        for cp in row_copies:
            cp.wait()

        # --- flash attention over the live context, per batch row ----
        num_chunks = pl.cdiv(cur_len, chunk)

        def kv_dma(slot_c, idx, bi):
            span = pl.ds(idx * chunk, chunk)
            return (
                pltpu.make_async_copy(kv_out.at[0, i, bi, span], k_buf.at[slot_c], kv_sem.at[slot_c, 0]),
                pltpu.make_async_copy(kv_out.at[1, i, bi, span], v_buf.at[slot_c], kv_sem.at[slot_c, 1]),
            )

        o_rows = []
        for bi in range(b):
            qmat = diag_mask * jnp.broadcast_to(q[bi][None], (heads, d)) * scale

            kd, vd = kv_dma(0, 0, bi)
            kd.start()
            vd.start()

            def chunk_body(ci, carry):
                acc, m_prev, l_prev = carry
                slot_c = ci % 2

                @pl.when(ci + 1 < num_chunks)
                def _():
                    nkd, nvd = kv_dma((ci + 1) % 2, ci + 1, bi)
                    nkd.start()
                    nvd.start()

                kd_i, vd_i = kv_dma(slot_c, ci, bi)
                kd_i.wait()
                vd_i.wait()

                kc = k_buf[slot_c].astype(jnp.float32)            # (CHUNK, D)
                vc = v_buf[slot_c].astype(jnp.float32)
                logits = jax.lax.dot_general(
                    qmat, kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)           # (H, CHUNK)
                span = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, (heads, chunk), 1)
                logits = jnp.where(span < cur_len, logits, NEG_INF)

                m_cur = jnp.max(logits, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev[:, :1], m_cur)
                p = jnp.exp(logits - m_new)
                corr = jnp.exp(m_prev[:, :1] - m_new)
                l_new = corr * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
                pv = jnp.dot(p, vc, preferred_element_type=jnp.float32)
                return (acc * corr + pv,
                        jnp.broadcast_to(m_new, (heads, 128)),
                        jnp.broadcast_to(l_new, (heads, 128)))

            init = (jnp.zeros((heads, d), jnp.float32),
                    jnp.full((heads, 128), NEG_INF, jnp.float32),
                    jnp.zeros((heads, 128), jnp.float32))
            acc, _m, l_fin = jax.lax.fori_loop(0, num_chunks, chunk_body, init)
            o_full = acc / jnp.maximum(l_fin[:, :1], 1e-30)       # (H, D)
            # row h's h-th D-block is the true head output; blocks of
            # other heads are zero (qmat was block-diagonal) — summing
            # over rows reassembles the flat (D,) output
            o_rows.append(jnp.sum(o_full * diag_mask, axis=0))

        o = jnp.stack(o_rows)                                      # (B, D)

        x = residual + (jnp.dot(o.astype(jnp.bfloat16), out_buf[slot],
                                preferred_element_type=jnp.float32)
                        + out_b_ref[i].astype(jnp.float32))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + ln_eps)
        x = x * ln_attn_ref[i, 0].astype(jnp.float32) + ln_attn_ref[i, 1].astype(jnp.float32)

        residual = x
        h1 = jnp.dot(x.astype(jnp.bfloat16), fc1_buf[slot],
                     preferred_element_type=jnp.float32) + fc1_b_ref[i].astype(jnp.float32)
        h1 = jnp.maximum(h1, 0.0)
        x = residual + (jnp.dot(h1.astype(jnp.bfloat16), fc2_buf[slot],
                                preferred_element_type=jnp.float32)
                        + fc2_b_ref[i].astype(jnp.float32))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + ln_eps)
        x = x * ln_ffn_ref[i, 0].astype(jnp.float32) + ln_ffn_ref[i, 1].astype(jnp.float32)
        return x

    x = x_ref[...].astype(jnp.float32)
    x = jax.lax.fori_loop(0, layers, layer_body, x)
    x_out_ref[...] = x.astype(x_out_ref.dtype)


def decode_step_megakernel(
    x: jax.Array,              # (B, D) layer input (post-embedding)
    layer_params: dict,        # stacked: qkv/out/fc1/fc2 {w,b}, ln_attn/ln_ffn {scale,bias}
    kv_cache: jax.Array,       # (2, L, B, S, D) bf16, S a chunk multiple
    write_pos: jax.Array,      # scalar int32
    cur_len: jax.Array,        # scalar int32 (= write_pos + 1)
    *,
    num_heads: int,
    chunk: int = 512,
    ln_eps: float = 1e-5,
    interpret: bool = False,
):
    """One full decode step through all layers. Returns (x_out (B, D),
    kv_cache with the new K/V rows written). The cache buffer is donated
    (aliased), so callers must thread the returned array."""
    b, d = x.shape
    layers = layer_params["qkv"]["w"].shape[0]
    f = layer_params["fc1"]["w"].shape[-1]
    s = kv_cache.shape[3]
    bf16 = jnp.bfloat16

    ln_attn = jnp.stack([layer_params["ln_attn"]["scale"],
                         layer_params["ln_attn"]["bias"]], axis=1)
    ln_ffn = jnp.stack([layer_params["ln_ffn"]["scale"],
                        layer_params["ln_ffn"]["bias"]], axis=1)

    pos = jnp.stack([jnp.asarray(write_pos, jnp.int32),
                     jnp.asarray(cur_len, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, d), lambda *_: (0, 0), memory_space=pltpu.VMEM),      # x
            pl.BlockSpec(memory_space=pl.ANY),                                   # qkv_w
            pl.BlockSpec((layers, 3 * d), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),                                   # out_w
            pl.BlockSpec((layers, d), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((layers, 2, d), lambda *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),                                   # fc1_w
            pl.BlockSpec((layers, f), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),                                   # fc2_w
            pl.BlockSpec((layers, d), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((layers, 2, d), lambda *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),                                   # kv
        ],
        out_specs=[
            pl.BlockSpec((b, d), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, d, 3 * d), bf16),
            pltpu.VMEM((2, d, d), bf16),
            pltpu.VMEM((2, d, f), bf16),
            pltpu.VMEM((2, f, d), bf16),
            pltpu.VMEM((2, chunk, d), kv_cache.dtype),
            pltpu.VMEM((2, chunk, d), kv_cache.dtype),
            pltpu.VMEM((2, b, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _megakernel, layers=layers, heads=num_heads, chunk=chunk, ln_eps=ln_eps,
    )
    x_out, kv_out = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, d), x.dtype),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        ],
        grid_spec=grid_spec,
        # alias the cache: input index 12 (after the scalar-prefetch arg:
        # pos, x, qkv_w, qkv_b, out_w, out_b, ln_attn, fc1_w, fc1_b,
        # fc2_w, fc2_b, ln_ffn, kv) -> output 1
        input_output_aliases={12: 1},
        interpret=interpret,
    )(
        pos,
        x,
        layer_params["qkv"]["w"].astype(bf16),
        layer_params["qkv"]["b"],
        layer_params["out"]["w"].astype(bf16),
        layer_params["out"]["b"],
        ln_attn,
        layer_params["fc1"]["w"].astype(bf16),
        layer_params["fc1"]["b"],
        layer_params["fc2"]["w"].astype(bf16),
        layer_params["fc2"]["b"],
        ln_ffn,
        kv_cache,
    )
    return x_out, kv_out
