"""KV-cache utilities: allocation, layout, and int8 quantization.

Cache layout contract (shared with ops/decode_attention.py and
models/shape_opt.py): one array (2, L, B, S, H*D) — K at index 0, V at
index 1 — flat head rows (a (..., H, 64) layout would lane-pad to 128),
padded so S is a multiple of the decode chunk.

int8 mode: the full-length decode is KV-bandwidth-bound (~2.7 TB of
cache reads per 800-face mesh, SURVEY.md §6); storing K/V as int8 with
one symmetric scale per row (per kv/layer/batch/position, shared
across heads) halves the dominant traffic at the
cost of <1e-2 attention error. Exact bf16 mode stays the default; the
quality bound is asserted in tests/test_ops.py.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def alloc_kv_cache(
    num_layers: int, batch: int, seq: int, heads: int, head_dim: int,
    dtype=jnp.bfloat16, chunk: int = 512,
) -> jax.Array:
    padded = -(-seq // chunk) * chunk
    return jnp.zeros((2, num_layers, batch, padded, heads * head_dim), dtype)


class QuantizedKV(NamedTuple):
    values: jax.Array   # (2, L, B, S, H*D) int8
    scales: jax.Array   # (2, L, B, S, 1) f32  (amax / 127 per row)


def quantize_kv(kv: jax.Array) -> QuantizedKV:
    """Symmetric int8 quantization, one scale per flat (H*D) row."""
    amax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(kv.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return QuantizedKV(values=q, scales=scale)


def dequantize_kv(qkv: QuantizedKV, dtype=jnp.bfloat16) -> jax.Array:
    return (qkv.values.astype(jnp.float32) * qkv.scales).astype(dtype)


def quantize_rows(rows: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Quantize freshly-computed K/V rows (..., D) -> (int8 rows, scales)."""
    amax = jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(rows.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# int4: 4-bit codes — quarters the dominant KV traffic
#
# Two packing contracts (shared with ops/decode_attention.py `bits=4`),
# distinguished by the packed array's DTYPE so every consumer routes
# automatically:
#
#   * NIBBLE-PLANE ("plane", int32, the default): the packed row is
#     D//8 int32 WORDS; nibble p (bits [4p, 4p+4)) of word w holds
#     original column p*(D//8) + w as 4-bit two's complement in
#     [-7, 7]. The kernel unpack is then TWO vector ops per plane
#     (shift the nibble to the sign position, arithmetic-shift down —
#     sign extension rides the shift) on natively-tiled int32 with NO
#     int8->int32 widen, and plane p extracts the contiguous column
#     block [p*D//8, (p+1)*D//8), so reassembly is a lane-aligned
#     concat (cast per-plane first — the copy moves matmul-dtype
#     bytes), never an interleave. This is the packing contract of
#     VERDICT r4 #1; measured on-chip (tools/int4_plane_probe.py):
#     1.07x over the legacy nibble-pair unpack on the shipping
#     pipelined single-query kernel (306 -> 284 us/call at B=16 ctx
#     7168, 417 GB/s packed), 1.01x on the W=8 MQ kernel (which is
#     window-matmul-bound, not unpack-bound), bit-identical outputs.
#
#   * LEGACY nibble-pair ("nibble", int8): byte j of a packed (..., D//2)
#     row holds column j in its LOW nibble and column j + D//2 in its
#     HIGH nibble. Kept for A/B measurement (tools/int4_plane_probe.py);
#     select with INT4_PACKING="nibble".

INT4_PACKING = "plane"  # "plane" (int32 words) | "nibble" (legacy int8)


def quantize_rows_int4(rows: jax.Array, packing: str | None = None) -> Tuple[jax.Array, jax.Array]:
    """Quantize K/V rows (..., D) -> (packed codes, scales (..., 1) f32).

    Symmetric per-row scale = amax / 7 (4-bit range [-7, 7]). The packed
    layout follows ``packing`` (default: module INT4_PACKING)."""
    packing = INT4_PACKING if packing is None else packing
    d = rows.shape[-1]
    amax = jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0

    if packing == "plane":
        assert d % 8 == 0, d
        n = d // 8
        # Eight independent element-wise chains ORed into the output:
        # each has ONE consumer, so XLA fuses the whole tree into one
        # output-shaped loop (the r3 32 GB prompt-prefill intermediate
        # came from a SHARED full-width s32 subexpression with two
        # consumers — verified not to recur here via the chipless AOT
        # memory probe, PERF.md r5).
        word = None
        for p in range(8):
            sl = rows[..., p * n:(p + 1) * n].astype(jnp.float32)
            codes = jnp.clip(jnp.round(sl / scale), -7, 7).astype(jnp.int32)
            t = jnp.bitwise_and(codes, 15)
            t = jnp.left_shift(t, 4 * p) if p else t
            word = t if word is None else jnp.bitwise_or(word, t)
        return word, scale

    assert packing == "nibble", packing
    assert d % 2 == 0, d

    # Quantize each half independently in int8: a single full-width
    # int32 code tensor would be consumed by both nibbles, and XLA
    # materializes such shared subexpressions — at the prompt-prefill
    # shape that was a (2, L, B, S, D) s32 intermediate, 32 GB at a
    # 6.4k-token B=24 prompt (measured: the AOT compiler rejected the
    # allocation). Two independent element-wise chains fuse straight
    # into the packed output.
    def q4(x):
        return jnp.clip(jnp.round(x / scale), -7, 7).astype(jnp.int8)

    lo, hi = q4(rows[..., : d // 2].astype(jnp.float32)), q4(rows[..., d // 2:].astype(jnp.float32))
    packed = jnp.bitwise_or(jnp.left_shift(hi, 4), jnp.bitwise_and(lo, 15))
    return packed, scale


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of the int4 packing: packed codes -> (..., D) int32 codes
    in [-8, 7]. Routes on dtype: int32 = byte-plane words, int8 = legacy
    nibble pairs. XLA/test helper — the Pallas kernel inlines the same
    math on its VMEM tiles."""
    if packed.dtype == jnp.int32:
        planes = []
        for p in range(8):
            if p == 7:
                t = jax.lax.shift_right_arithmetic(packed, 28)
            else:
                sh = jax.lax.shift_right_logical(packed, 4 * p) if p else packed
                t = jnp.bitwise_xor(jnp.bitwise_and(sh, 15), 8) - 8
            planes.append(t)
        return jnp.concatenate(planes, axis=-1)
    raw = packed.astype(jnp.int32)
    hi = jnp.right_shift(raw, 4)                      # arithmetic: keeps sign
    lo = jnp.bitwise_xor(jnp.bitwise_and(raw, 15), 8) - 8  # sign-extend 4 bits
    return jnp.concatenate([lo, hi], axis=-1)


def int4_packed_width(d: int, dtype) -> int:
    """Packed last-dim width for a D-wide row under each contract."""
    return d // 8 if dtype == jnp.int32 else d // 2
