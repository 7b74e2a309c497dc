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
# int4: two 4-bit codes per byte — quarters the dominant KV traffic
#
# Packing contract (shared with ops/decode_attention.py `bits=4`): byte
# j of a packed (..., D//2) row holds original column j in its LOW
# nibble and column j + D//2 in its HIGH nibble, both 4-bit two's
# complement in [-7, 7]. Unpacking is then a nibble split + ONE
# lane-aligned concat — no interleave/shuffle on the TPU lane dim.


def quantize_rows_int4(rows: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Quantize K/V rows (..., D) -> (packed int8 (..., D//2), scales).

    Symmetric per-row scale = amax / 7 (4-bit range [-7, 7])."""
    d = rows.shape[-1]
    assert d % 2 == 0, d
    amax = jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0

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
    """Inverse of the int4 packing: (..., D//2) int8 -> (..., D) int32
    codes in [-8, 7]. XLA/test helper — the Pallas kernel inlines the
    same nibble math on its VMEM tiles."""
    raw = packed.astype(jnp.int32)
    hi = jnp.right_shift(raw, 4)                      # arithmetic: keeps sign
    lo = jnp.bitwise_xor(jnp.bitwise_and(raw, 15), 8) - 8  # sign-extend 4 bits
    return jnp.concatenate([lo, hi], axis=-1)
