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
    before the attention sweep reads them;
  * the small per-layer params (biases + LN affines) ride a packed
    (L, 8, R) side array DMA'd with the weights and sliced at STATIC
    offsets — Mosaic cannot prove a dynamic `ref[layer]` row load into
    VMEM is 8-aligned (the platform's lane/sublane rule, see
    memory/axon-tpu-quirks).

Scope: bf16 cache, single-query (the lookahead/int8 paths keep the
per-layer kernel). B is free but every row's attention sweep shares the
layer-weight streaming.

STATUS — measured infeasible on v5e, kept as a documented experiment:
the whole-matrix double buffers need 2x(6+2+8+8) = 50 MB of VMEM, but a
v5e core has ~16 MB; Mosaic compiles the kernel (after three real
lowering fixes: packed small-params for dynamic row loads, separate
staging buffers, 8-aligned read-modify-write cache appends) and the
program then fails VMEM allocation at the XLA level. Making this fit
requires streaming each weight matrix in <=2 MB column/row chunks with
partial-sum accumulation — roughly quadrupling kernel complexity for a
ceiling the bandwidth-floor analysis caps at ~6% at B=8 (PERF.md: the
scan path already runs at 94% of measured speed-of-light). The
interpret-mode path stays fully tested (tests/test_megakernel.py) as
the starting point if a future chip's VMEM makes it viable;
decode_step_megakernel raises a clear error on real TPUs.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pack_small_params(layer_params: dict, d: int, f: int) -> jax.Array:
    """Biases + LN affines -> (L, 8, R) f32, R = max(4d, f).

    Row layout (static offsets inside the kernel):
      0: [qkv_b (3d) | out_b (d)]
      1: [fc1_b (f)]
      2: [fc2_b (d) | ln_attn.scale (d) | ln_attn.bias (d) | ln_ffn.scale (d)]
      3: [ln_ffn.bias (d)]
      4-7: zero padding (keeps the DMA tile 8 sublanes tall)."""
    L = layer_params["qkv"]["w"].shape[0]
    R = max(4 * d, f)

    def pad(x, width):
        x = x.astype(jnp.float32)
        return jnp.pad(x, ((0, 0), (0, width - x.shape[-1])))

    row0 = pad(jnp.concatenate(
        [layer_params["qkv"]["b"], layer_params["out"]["b"]], axis=-1), R)
    row1 = pad(layer_params["fc1"]["b"], R)
    row2 = pad(jnp.concatenate(
        [layer_params["fc2"]["b"], layer_params["ln_attn"]["scale"],
         layer_params["ln_attn"]["bias"], layer_params["ln_ffn"]["scale"]],
        axis=-1), R)
    row3 = pad(layer_params["ln_ffn"]["bias"], R)
    zeros = jnp.zeros((L, 4, R), jnp.float32)
    return jnp.concatenate(
        [jnp.stack([row0, row1, row2, row3], axis=1), zeros], axis=1)


def _megakernel(
    # scalar prefetch
    pos_ref,            # SMEM (2,) int32: [write_pos, cur_len]
    # inputs
    x_ref,              # VMEM (B, D)
    qkv_w_hbm,          # HBM (L, D, 3D)
    out_w_hbm,          # HBM (L, D, D)
    fc1_w_hbm,          # HBM (L, D, F)
    fc2_w_hbm,          # HBM (L, F, D)
    small_hbm,          # HBM (L, 8, R) f32 packed biases/LN
    kv_in,              # HBM (2, L, B, S, D) — aliased with kv_out
    # outputs
    x_out_ref,          # VMEM (B, D)
    kv_out,             # HBM (2, L, B, S, D)
    # scratch
    qkv_buf,            # VMEM (2, D, 3D)
    out_buf,            # VMEM (2, D, D)
    fc1_buf,            # VMEM (2, D, F)
    fc2_buf,            # VMEM (2, F, D)
    small_buf,          # VMEM (2, 8, R) f32
    k_buf, v_buf,       # VMEM (2, CHUNK, D)
    k_row_buf,          # VMEM (B, 8, D) — 8-row aligned append windows
    v_row_buf,          # VMEM (B, 8, D)
    w_sem,              # DMA (2, 5)
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
            pltpu.make_async_copy(small_hbm.at[layer], small_buf.at[slot], w_sem.at[slot, 4]),
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

        sm = small_buf[slot]                                       # (8, R) f32
        qkv_b = sm[0, :3 * d]
        out_b = sm[0, 3 * d:4 * d]
        fc1_b = sm[1, :fc1_buf.shape[-1]]
        fc2_b = sm[2, :d]
        ln_a_scale = sm[2, d:2 * d]
        ln_a_bias = sm[2, 2 * d:3 * d]
        ln_f_scale = sm[2, 3 * d:4 * d]
        ln_f_bias = sm[3, :d]

        residual = x                                               # (B, D) f32
        qkv = jnp.dot(x.astype(jnp.bfloat16), qkv_buf[slot],
                      preferred_element_type=jnp.float32)
        qkv = qkv + qkv_b
        q = qkv[:, :d]
        k_new = qkv[:, d:2 * d]
        v_new = qkv[:, 2 * d:]

        # append K/V rows to the HBM cache (aliased in/out) and wait so
        # the sweep below reads the fresh row. The cache is sublane-tiled
        # in HBM, so a 1-row DMA at a dynamic offset is not
        # tile-expressible; instead read-modify-write the 8-row aligned
        # window containing write_pos (pl.multiple_of carries the
        # alignment proof Mosaic needs).
        base = pl.multiple_of((write_pos // 8) * 8, 8)
        off = write_pos - base
        cp_k = pltpu.make_async_copy(
            kv_out.at[0, i, :, pl.ds(base, 8)], k_row_buf, row_sem.at[0])
        cp_v = pltpu.make_async_copy(
            kv_out.at[1, i, :, pl.ds(base, 8)], v_row_buf, row_sem.at[1])
        cp_k.start()
        cp_v.start()
        cp_k.wait()
        cp_v.wait()
        sel_row = (jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == off)
        k_row_buf[...] = jnp.where(
            sel_row, k_new.astype(k_row_buf.dtype).reshape(b, 1, d), k_row_buf[...])
        v_row_buf[...] = jnp.where(
            sel_row, v_new.astype(v_row_buf.dtype).reshape(b, 1, d), v_row_buf[...])
        cp_k = pltpu.make_async_copy(
            k_row_buf, kv_out.at[0, i, :, pl.ds(base, 8)], row_sem.at[0])
        cp_v = pltpu.make_async_copy(
            v_row_buf, kv_out.at[1, i, :, pl.ds(base, 8)], row_sem.at[1])
        cp_k.start()
        cp_v.start()
        cp_k.wait()
        cp_v.wait()

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
                                preferred_element_type=jnp.float32) + out_b)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + ln_eps)
        x = x * ln_a_scale + ln_a_bias

        residual = x
        h1 = jnp.dot(x.astype(jnp.bfloat16), fc1_buf[slot],
                     preferred_element_type=jnp.float32) + fc1_b
        h1 = jnp.maximum(h1, 0.0)
        x = residual + (jnp.dot(h1.astype(jnp.bfloat16), fc2_buf[slot],
                                preferred_element_type=jnp.float32) + fc2_b)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + ln_eps)
        x = x * ln_f_scale + ln_f_bias
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
    bf16 = jnp.bfloat16
    R = max(4 * d, f)

    if not interpret and jax.default_backend() == "tpu":
        vmem_needed = (2 * (d * 3 * d + d * d + 2 * d * f) * 2
                       + 2 * 2 * chunk * d * 2) / 1e6
        raise NotImplementedError(
            f"decode_step_megakernel needs ~{vmem_needed:.0f} MB of VMEM "
            "for whole-matrix weight double-buffering but a v5e core has "
            "~16 MB (see module docstring); use attn='pallas'. The "
            "interpret-mode path remains available for correctness work."
        )

    small = _pack_small_params(layer_params, d, f)
    pos = jnp.stack([jnp.asarray(write_pos, jnp.int32),
                     jnp.asarray(cur_len, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, d), lambda *_: (0, 0), memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pl.ANY),                                  # qkv_w
            pl.BlockSpec(memory_space=pl.ANY),                                  # out_w
            pl.BlockSpec(memory_space=pl.ANY),                                  # fc1_w
            pl.BlockSpec(memory_space=pl.ANY),                                  # fc2_w
            pl.BlockSpec(memory_space=pl.ANY),                                  # small
            pl.BlockSpec(memory_space=pl.ANY),                                  # kv
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
            pltpu.VMEM((2, 8, R), jnp.float32),
            pltpu.VMEM((2, chunk, d), kv_cache.dtype),
            pltpu.VMEM((2, chunk, d), kv_cache.dtype),
            pltpu.VMEM((b, 8, d), kv_cache.dtype),
            pltpu.VMEM((b, 8, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 5)),
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
        # alias the cache: operand order is (pos, x, qkv_w, out_w, fc1_w,
        # fc2_w, small, kv) -> kv is input index 7, output 1
        input_output_aliases={7: 1},
        interpret=interpret,
    )(
        pos,
        x,
        layer_params["qkv"]["w"].astype(bf16),
        layer_params["out"]["w"].astype(bf16),
        layer_params["fc1"]["w"].astype(bf16),
        layer_params["fc2"]["w"].astype(bf16),
        small,
        kv_cache,
    )
    return x_out, kv_out
