"""int8 weight quantization (W8A8, dynamic activations) for the decode
hot path.

Why: the single-token decode step is weight-bandwidth-bound at small
batch — 621 MB of bf16 decoder weights stream from HBM per step, a
6.1 s/mesh floor at B=1 (PERF.md "Bottleneck model"). Storing the four
per-layer matrices int8 halves that traffic, and the v5e MXU multiplies
s8xs8->s32 natively, so the dot itself reads int8 tiles straight from
HBM — no bf16 dequant materialization (an XLA-level dequant-then-dot
would write the bf16 matrix back to HBM each step and *add* traffic).

Scheme (standard dynamic W8A8):
  * weights: symmetric per-output-channel scales, amax/127 over each
    column (same convention as the int8 KV cache, ops/kvcache.py).
  * activations: symmetric per-row dynamic scales computed in f32 at
    each step (rows are (B*W, 1024) — microscopic next to the weights).
  * accumulate s32 on the MXU, rescale by (row_scale x col_scale) in
    f32, add the bf16 bias, cast back.

This is a *fast mode* like int8 KV: it trades the exact-bf16
byte-equivalence north star for bytes. Exactness-sensitive pieces stay
bf16: the prefill pass, embeddings, layernorms, and the lm_head (whose
argmax picks the token; its 16.8 MB/step is ~3% of weight traffic).

Reference comparable: none — the reference runs fp16 end-to-end
(main.py:114). This is TPU-native headroom beyond parity.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(in, out) weights -> (int8 (in, out), f32 (out,) per-column scales)."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2), 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def linear_w8a8(
    x: jax.Array, wq: jax.Array, wscale: jax.Array, b: Optional[jax.Array] = None
) -> jax.Array:
    """x @ dequant(wq) with int8 inputs on the MXU.

    x: (..., in) bf16/f32; wq: (in, out) int8; wscale: (out,) f32.
    Activations are quantized per row (dynamic symmetric, f32 math).
    """
    xf = x.astype(jnp.float32)
    ascale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / ascale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * ascale * wscale
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


_QUANT_KEYS = ("qkv", "out", "fc1", "fc2")


def quantize_opt_layers(layers: dict) -> dict:
    """Quantize the stacked (L, in, out) decode matrices of an OPT layer
    tree (models/shape_opt.py::init_opt_layer keys). Linears become
    {"wq", "scale", "b"}; layernorm params pass through unchanged."""
    out = {}
    for name, entry in layers.items():
        if name in _QUANT_KEYS:
            wq, scale = jax.vmap(quantize_weight)(entry["w"])
            out[name] = {"wq": wq, "scale": scale, "b": entry["b"]}
        else:
            out[name] = entry
    return out


def lin_dispatch(wq: bool):
    """Returns lin(x, entry) for bf16 ({"w","b"}) or quantized
    ({"wq","scale","b"}) per-layer linear entries — the single switch
    shared by the decode and lookahead scan bodies."""
    if wq:
        return lambda x, e: linear_w8a8(x, e["wq"], e["scale"], e["b"])
    from meshanything_tpu.models.layers import linear

    return lambda x, e: linear(x, e["w"], e["b"])
