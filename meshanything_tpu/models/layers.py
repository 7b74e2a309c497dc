"""Functional NN primitives shared by every model in the framework.

Design: pure functions over explicit parameter pytrees (nested dicts of
jnp arrays). Linear weights are stored ``(in_features, out_features)``
so activations contract as ``x @ w`` — the natural MXU layout; the
checkpoint converter transposes torch's ``(out, in)``.

Numerics policy (TPU-first): matmuls run in the configured compute
dtype (bf16 by default), while softmax and layernorm always reduce in
f32 — this matches the reference's fp16-with-fp32-softmax behavior
(michelangelo transformer_blocks.py:67-72) and is the stable recipe on
TPU.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm with f32 statistics (torch.nn.LayerNorm semantics)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """x @ w (+ b); w is (in, out)."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch.nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, N, H*D) -> (B, N, H, D)."""
    b, n, hd = x.shape
    return x.reshape(b, n, num_heads, hd // num_heads)


def _merge_heads(x: jax.Array) -> jax.Array:
    b, n, h, d = x.shape
    return x.reshape(b, n, h * d)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    dual_sqrt_scale: bool = False,
    mask: Optional[jax.Array] = None,
    causal: bool = False,
) -> jax.Array:
    """Multi-head attention core over (B, N, H, D) tensors.

    dual_sqrt_scale replicates the Michelangelo stabilization
    (transformer_blocks.py:60-71): both q and k are pre-multiplied by
    1/sqrt(sqrt(D)) before the logit matmul; softmax runs in f32.
    Standard attention (OPT/BERT) uses ``scale = 1/sqrt(D)`` on q.
    """
    d = q.shape[-1]
    if dual_sqrt_scale:
        s = 1.0 / math.sqrt(math.sqrt(d))
        q = q * jnp.asarray(s, q.dtype)
        k = k * jnp.asarray(s, k.dtype)
    else:
        s = (1.0 / math.sqrt(d)) if scale is None else scale
        q = q * jnp.asarray(s, q.dtype)

    logits = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)

    if causal:
        tq, sk = logits.shape[-2], logits.shape[-1]
        causal_mask = jnp.tril(jnp.ones((tq, sk), dtype=bool), k=sk - tq)
        logits = jnp.where(causal_mask[None, None], logits, jnp.float32(-1e30))
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))

    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bshd->bthd", weights, v, preferred_element_type=q.dtype)
    return out


def flash_attention_causal(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Blockwise causal attention with online softmax (flash-attention
    recomputation scheme) in pure JAX — O(block_q * block_k) live logits
    instead of the O(N^2) score matrix ``attention(causal=True)``
    materializes.

    This is the training/prefill long-sequence path: at the real
    7,459-token teacher-forcing sequence the dense formulation holds
    ~56 M logits x 16 heads per layer; this never holds more than one
    (block_q, block_k) tile per head. Built from lax.scan only, so it is
    reverse-differentiable and composes with jax.checkpoint (the remat
    recipe replacing the reference's unconditional CheckpointFunction,
    michelangelo/models/modules/checkpoint.py:10-69).

    q, k, v: (B, N, H, D) with N a multiple of block_q and block_k.
    Accumulation is f32; returns q.dtype.
    """
    b, n, h, d = q.shape
    if n % block_q or n % block_k:
        raise ValueError(f"seq {n} must be a multiple of block_q={block_q}, block_k={block_k}")
    s = (1.0 / math.sqrt(d)) if scale is None else scale
    q = q * jnp.asarray(s, q.dtype)

    nq, nk = n // block_q, n // block_k
    # (n_blocks, B, block, H, D) — scan iterates the leading axis
    qb = q.reshape(b, nq, block_q, h, d).transpose(1, 0, 2, 3, 4)
    kb = k.reshape(b, nk, block_k, h, d).transpose(1, 0, 2, 3, 4)
    vb = v.reshape(b, nk, block_k, h, d).transpose(1, 0, 2, 3, 4)

    q_span = jnp.arange(block_q)
    k_span = jnp.arange(block_k)
    neg = jnp.float32(-1e30)

    def q_block(_, qi_and_block):
        qi, qblk = qi_and_block  # qblk: (B, bq, H, D)

        def k_block(carry, ki_and_block):
            m, l, acc = carry
            ki, kblk, vblk = ki_and_block

            def attend(carry):
                m, l, acc = carry
                logits = jnp.einsum(
                    "bqhd,bshd->bhqs", qblk, kblk, preferred_element_type=jnp.float32
                )
                gq = qi * block_q + q_span
                gk = ki * block_k + k_span
                mask = gq[:, None] >= gk[None, :]
                logits = jnp.where(mask[None, None], logits, neg)
                m_new = jnp.maximum(m, logits.max(axis=-1))        # (B, H, bq)
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(logits - m_new[..., None])             # (B, H, bq, bk)
                l_new = l * alpha + p.sum(axis=-1)
                pv = jnp.einsum(
                    "bhqs,bshd->bqhd", p.astype(q.dtype), vblk,
                    preferred_element_type=jnp.float32,
                )
                acc_new = acc * alpha.transpose(0, 2, 1)[..., None] + pv
                return m_new, l_new, acc_new

            # skip key blocks that lie entirely in the causal future
            live = ki * block_k <= qi * block_q + (block_q - 1)
            return jax.lax.cond(live, attend, lambda c: c, (m, l, acc)), None

        init = (
            jnp.full((b, h, block_q), neg),
            jnp.zeros((b, h, block_q), jnp.float32),
            jnp.zeros((b, block_q, h, d), jnp.float32),
        )
        (m, l, acc), _ = jax.lax.scan(k_block, init, (jnp.arange(nk), kb, vb))
        out = acc / l.transpose(0, 2, 1)[..., None]
        return None, out.astype(q.dtype)

    _, ys = jax.lax.scan(q_block, None, (jnp.arange(nq), qb))  # (nq, B, bq, H, D)
    return ys.transpose(1, 0, 2, 3, 4).reshape(b, n, h, d)


def flash_attention_full(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    dual_sqrt_scale: bool = False,
    block_q: int = 128,
    block_k: int = 512,
) -> jax.Array:
    """Blockwise full (non-causal) attention with online softmax — the
    memory-lean equivalent of ``attention(mask=None, causal=False)``.

    Why: the two one-shot passes outside the decode loop materialize
    batch-scaled f32 score matrices under the dense formulation — the
    perceiver encoder's 257x4096 cross-attention (sal_perceiver.py:93
    semantics) and the NRD detokenizer's 1057^2 bidirectional layers
    (meshanything.py:62-64 semantics) — ~100 MB/batch-row at full scale,
    the transients that capped the int4 batch at 16 and crashed the
    worker at B=32 (PERF.md r3). This never holds more than one
    (block_q, block_k) f32 tile per head.

    Supports cross-attention (len(q) != len(k)) and arbitrary lengths:
    inputs are zero-padded to block multiples and padded KEYS are masked
    to -inf (exact — padded queries are sliced off the output). Math
    matches ``attention``: f32 logits/softmax, probabilities cast to
    q.dtype for the PV matmul, f32 accumulation.
    """
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if dual_sqrt_scale:
        s = 1.0 / math.sqrt(math.sqrt(d))
        q = q * jnp.asarray(s, q.dtype)
        k = k * jnp.asarray(s, k.dtype)
    else:
        s = (1.0 / math.sqrt(d)) if scale is None else scale
        q = q * jnp.asarray(s, q.dtype)

    block_q = min(block_q, max(nq, 1))
    block_k = min(block_k, max(nk, 1))
    pq = (-nq) % block_q
    pk = (-nk) % block_k
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
    if pk:
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
    nqp, nkp = nq + pq, nk + pk
    nqb, nkb = nqp // block_q, nkp // block_k

    kb = k.reshape(b, nkb, block_k, h, d).transpose(1, 0, 2, 3, 4)
    vb = v.reshape(b, nkb, block_k, h, d).transpose(1, 0, 2, 3, 4)
    qb = q.reshape(b, nqb, block_q, h, d).transpose(1, 0, 2, 3, 4)
    # key-validity per block: only the final block can contain padding
    kvalid = (jnp.arange(nkb)[:, None] * block_k + jnp.arange(block_k)[None]) < nk
    neg = jnp.float32(-1e30)

    def q_block(_, qblk):  # qblk: (B, bq, H, D)
        def k_block(carry, kv_blk):
            m, l, acc = carry
            kblk, vblk, valid = kv_blk
            logits = jnp.einsum(
                "bqhd,bshd->bhqs", qblk, kblk, preferred_element_type=jnp.float32
            )
            logits = jnp.where(valid[None, None, None], logits, neg)
            m_new = jnp.maximum(m, logits.max(axis=-1))            # (B, H, bq)
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(logits - m_new[..., None])                 # (B, H, bq, bk)
            l_new = l * alpha + p.sum(axis=-1)
            pv = jnp.einsum(
                "bhqs,bshd->bqhd", p.astype(q.dtype), vblk,
                preferred_element_type=jnp.float32,
            )
            acc_new = acc * alpha.transpose(0, 2, 1)[..., None] + pv
            return (m_new, l_new, acc_new), None

        init = (
            jnp.full((b, h, block_q), neg),
            jnp.zeros((b, h, block_q), jnp.float32),
            jnp.zeros((b, block_q, h, d), jnp.float32),
        )
        (m, l, acc), _ = jax.lax.scan(k_block, init, (kb, vb, kvalid))
        out = acc / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
        return None, out.astype(q.dtype)

    _, ys = jax.lax.scan(q_block, None, qb)  # (nqb, B, bq, H, D)
    out = ys.transpose(1, 0, 2, 3, 4).reshape(b, nqp, h, d)
    return out[:, :nq]


def self_attention_block(
    x: jax.Array,
    p: dict,
    *,
    num_heads: int,
    dual_sqrt_scale: bool = False,
    ln_eps: float = 1e-5,
    causal: bool = False,
) -> jax.Array:
    """Pre-LN residual self-attention + MLP block (Michelangelo
    ResidualAttentionBlock, transformer_blocks.py:77-115).

    Params: ln1/{scale,bias}, qkv/{w[,b]}, proj/{w,b},
            ln2/{scale,bias}, fc/{w,b}, fc_out/{w,b}.
    """
    h = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], ln_eps)
    qkv = linear(h, p["qkv"]["w"], p["qkv"].get("b"))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = attention(
        _split_heads(q, num_heads), _split_heads(k, num_heads), _split_heads(v, num_heads),
        dual_sqrt_scale=dual_sqrt_scale, causal=causal,
    )
    x = x + linear(_merge_heads(o), p["proj"]["w"], p["proj"]["b"])

    h = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], ln_eps)
    h = linear(gelu(linear(h, p["fc"]["w"], p["fc"]["b"])), p["fc_out"]["w"], p["fc_out"]["b"])
    return x + h


def cross_attention_block(
    x: jax.Array,
    data: jax.Array,
    p: dict,
    *,
    num_heads: int,
    dual_sqrt_scale: bool = True,
    ln_eps: float = 1e-5,
    blockwise: bool = False,
) -> jax.Array:
    """Michelangelo ResidualCrossAttentionBlock (transformer_blocks.py:188-226).

    Params: ln_q, ln_kv, q/{w[,b]}, kv/{w[,b]}, proj/{w,b}, ln_mlp,
            fc/{w,b}, fc_out/{w,b}.

    blockwise swaps the dense score matrix for flash_attention_full —
    used where ``len(x) x len(data)`` is large and batch-scaled (the
    encoder's 257x4096 point cross-attention, recon's grid queries).
    """
    hq = layer_norm(x, p["ln_q"]["scale"], p["ln_q"]["bias"], ln_eps)
    hk = layer_norm(data, p["ln_kv"]["scale"], p["ln_kv"]["bias"], ln_eps)
    q = linear(hq, p["q"]["w"], p["q"].get("b"))
    kv = linear(hk, p["kv"]["w"], p["kv"].get("b"))
    k, v = jnp.split(kv, 2, axis=-1)
    attn_fn = flash_attention_full if blockwise else attention
    o = attn_fn(
        _split_heads(q, num_heads), _split_heads(k, num_heads), _split_heads(v, num_heads),
        dual_sqrt_scale=dual_sqrt_scale,
    )
    x = x + linear(_merge_heads(o), p["proj"]["w"], p["proj"]["b"])

    h = layer_norm(x, p["ln_mlp"]["scale"], p["ln_mlp"]["bias"], ln_eps)
    h = linear(gelu(linear(h, p["fc"]["w"], p["fc"]["b"])), p["fc_out"]["w"], p["fc_out"]["b"])
    return x + h


def scan_layers(apply_fn, x, stacked_params: dict):
    """Run a stack of identical layers with lax.scan.

    ``stacked_params`` leaves have a leading layer axis. One compiled
    layer body regardless of depth — fast compiles, and XLA pipelines
    the per-layer weight fetches from HBM.
    """
    def body(carry, layer_params):
        return apply_fn(carry, layer_params), None

    out, _ = jax.lax.scan(body, x, stacked_params)
    return out


# ---------------------------------------------------------------------------
# initializers


def init_linear(key, d_in, d_out, std, bias=True, dtype=jnp.float32):
    p = {"w": jax.random.normal(key, (d_in, d_out), dtype) * std}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_ln(d, dtype=jnp.float32):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_self_attention_block(key, width, ffn_mult=4, *, qkv_bias=True, std=0.02, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "ln1": init_ln(width, dtype),
        "qkv": init_linear(ks[0], width, 3 * width, std, qkv_bias, dtype),
        "proj": init_linear(ks[1], width, width, std, True, dtype),
        "ln2": init_ln(width, dtype),
        "fc": init_linear(ks[2], width, ffn_mult * width, std, True, dtype),
        "fc_out": init_linear(ks[3], ffn_mult * width, width, std, True, dtype),
    }


def init_cross_attention_block(key, width, data_width=None, ffn_mult=4, *, qkv_bias=True, std=0.02, dtype=jnp.float32):
    if data_width is None:
        data_width = width
    ks = jax.random.split(key, 5)
    return {
        "ln_q": init_ln(width, dtype),
        "ln_kv": init_ln(data_width, dtype),
        "q": init_linear(ks[0], width, width, std, qkv_bias, dtype),
        "kv": init_linear(ks[1], data_width, 2 * width, std, qkv_bias, dtype),
        "proj": init_linear(ks[2], width, width, std, True, dtype),
        "ln_mlp": init_ln(width, dtype),
        "fc": init_linear(ks[3], width, ffn_mult * width, std, True, dtype),
        "fc_out": init_linear(ks[4], ffn_mult * width, width, std, True, dtype),
    }


def trunc_normal(key, shape, std=0.02, a=-2.0, b=2.0, dtype=jnp.float32):
    """Truncated normal init (timm trunc_normal_ semantics: truncation
    bounds in sigmas; reference transformer_vit.py:17-70)."""
    return jax.random.truncated_normal(key, a, b, shape, jnp.float32).astype(dtype) * std


def init_self_attention_block_vit(key, width, ffn_mult=4, *, qkv_bias=True,
                                  std=0.02, dtype=jnp.float32):
    """ViT-initialized variant of the pre-LN block (reference
    transformer_vit.py:82-307): truncated-normal(std=0.02) weights, zero
    biases — versus the Michelangelo stack's normal(init_scale/sqrt(w))
    — and standard 1/sqrt(d) attention scaling at apply time
    (self_attention_block(..., dual_sqrt_scale=False))."""
    ks = jax.random.split(key, 4)

    def lin(k, d_in, d_out, bias=True):
        p = {"w": trunc_normal(k, (d_in, d_out), std, dtype=dtype)}
        if bias:
            p["b"] = jnp.zeros((d_out,), dtype)
        return p

    return {
        "ln1": init_ln(width, dtype),
        "qkv": lin(ks[0], width, 3 * width, qkv_bias),
        "proj": lin(ks[1], width, width),
        "ln2": init_ln(width, dtype),
        "fc": lin(ks[2], width, ffn_mult * width),
        "fc_out": lin(ks[3], ffn_mult * width, width),
    }


def stack_layer_params(layer_list):
    """List of per-layer param dicts -> one dict with stacked leaves."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_list)
