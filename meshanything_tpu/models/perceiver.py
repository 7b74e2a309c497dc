"""Michelangelo aligned shape-latent perceiver, TPU-native.

Functional re-design of the reference encoder
(MeshAnything/miche/michelangelo/models/tsal/sal_perceiver.py:20-423):

  encode_latents:  4096 points+normals --Fourier--> 54-d features
                   --input_proj--> 768 --cross-attn(257 queries)-->
                   --8x self-attn--> ln_post --> (B, 257, 768)
  to_shape_latents: latents[1:] --pre_kl--> Gaussian mode (64)
                   --post_kl--> 768 --16x self-attn--> (B, 256, 768)
  query_geometry:  occupancy logits for volume queries via the
                   cross-attention geo decoder (sal_perceiver.py:115-159)
                   — powers the VAE mesh-reconstruction path.

Everything is one XLA program per entry point; layer stacks run under
lax.scan over stacked weights. Attention uses the dual-sqrt scaling with
f32 softmax exactly as the reference (transformer_blocks.py:60-71).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from meshanything_tpu.config import PerceiverConfig
from meshanything_tpu.models.layers import (
    attention,
    _split_heads,
    _merge_heads,
    cross_attention_block,
    init_cross_attention_block,
    init_linear,
    init_ln,
    init_self_attention_block,
    layer_norm,
    linear,
    scan_layers,
    stack_layer_params,
)


def fourier_embed(x: jax.Array, num_freqs: int = 8, include_pi: bool = False) -> jax.Array:
    """[..., d] -> [..., d*(2*num_freqs+1)] as [x, sin(xf), cos(xf)].

    Frequency layout matches embedder.py:87-105: per input dim, all
    frequencies contiguous (x[..., None] * freqs flattened).
    """
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)
    if include_pi:
        freqs = freqs * jnp.pi
    emb = (x[..., None] * freqs.astype(x.dtype)).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(emb), jnp.cos(emb)], axis=-1)


def init_perceiver_params(key: jax.Array, cfg: PerceiverConfig, dtype=jnp.float32) -> dict:
    w = cfg.width
    std = cfg.init_scale * math.sqrt(1.0 / w)  # sal_perceiver.py:188
    ks = jax.random.split(key, 12)
    enc_layers = [
        init_self_attention_block(k, w, qkv_bias=cfg.qkv_bias, std=std, dtype=dtype)
        for k in jax.random.split(ks[0], cfg.num_encoder_layers)
    ]
    dec_layers = [
        init_self_attention_block(k, w, qkv_bias=cfg.qkv_bias, std=std, dtype=dtype)
        for k in jax.random.split(ks[1], cfg.num_decoder_layers)
    ]
    return {
        "query": jax.random.normal(ks[2], (cfg.total_latents, w), dtype) * 0.02,
        "input_proj": init_linear(ks[3], cfg.fourier_dim + cfg.point_feats, w, std, True, dtype),
        "cross_attn": init_cross_attention_block(ks[4], w, qkv_bias=cfg.qkv_bias, std=std, dtype=dtype),
        "encoder": stack_layer_params(enc_layers),
        "ln_post": init_ln(w, dtype),
        "pre_kl": init_linear(ks[5], w, 2 * cfg.embed_dim, std, True, dtype),
        "post_kl": init_linear(ks[6], cfg.embed_dim, w, std, True, dtype),
        "transformer": stack_layer_params(dec_layers),
        "geo_decoder": {
            "query_proj": init_linear(ks[7], cfg.fourier_dim, w, std, True, dtype),
            "cross": init_cross_attention_block(ks[8], w, qkv_bias=cfg.qkv_bias, std=std, dtype=dtype),
            "ln_post": init_ln(w, dtype),
            "output_proj": init_linear(ks[9], w, 1, std, True, dtype),
        },
    }


def encode_latents(params: dict, cfg: PerceiverConfig, pc_normal: jax.Array) -> jax.Array:
    """(B, N, 6) points+normals -> (B, 1+num_latents, width) latents.

    Equivalent to AlignedShapeAsLatentPLModule.encode_latents
    (asl_pl_module.py:145-157): returns the concatenated
    [shape_embed, latents] without splitting.
    """
    pc = pc_normal[..., 0:3]
    feats = pc_normal[..., 3:6]

    data = fourier_embed(pc, cfg.num_freqs, cfg.include_pi)
    data = jnp.concatenate([data, feats], axis=-1)
    data = linear(data, params["input_proj"]["w"], params["input_proj"]["b"])

    bs = pc.shape[0]
    query = jnp.broadcast_to(params["query"].astype(data.dtype), (bs, *params["query"].shape))
    # blockwise: the 257x4096 score matrix is the encoder's dominant
    # batch-scaled transient (~50 MB f32 per batch row at full scale) —
    # flash_attention_full keeps one (128, 512) tile per head instead
    x = cross_attention_block(
        query, data, params["cross_attn"], num_heads=cfg.heads,
        dual_sqrt_scale=True, ln_eps=cfg.ln_eps, blockwise=True,
    )

    def layer(h, p):
        from meshanything_tpu.models.layers import self_attention_block
        return self_attention_block(
            h, p, num_heads=cfg.heads, dual_sqrt_scale=True, ln_eps=cfg.ln_eps
        )

    x = scan_layers(layer, x, params["encoder"])
    if cfg.use_ln_post:
        x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"], cfg.ln_eps)
    return x


def encode_kl_mode(params: dict, latents: jax.Array) -> jax.Array:
    """pre_kl -> DiagonalGaussian mode (= mean half) (sal_perceiver.py:383-396)."""
    moments = linear(latents, params["pre_kl"]["w"], params["pre_kl"]["b"])
    mean, _logvar = jnp.split(moments, 2, axis=-1)
    return mean


def encode_kl_sample(params: dict, latents: jax.Array, key: jax.Array) -> jax.Array:
    """pre_kl -> Gaussian sample (distributions.py:43-45); logvar clamped
    to [-30, 20] as in distributions.py:36."""
    moments = linear(latents, params["pre_kl"]["w"], params["pre_kl"]["b"])
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def decode_latents(params: dict, cfg: PerceiverConfig, kl_embed: jax.Array) -> jax.Array:
    """post_kl + 16-layer self-attention stack (sal_perceiver.py:273-275)."""
    x = linear(kl_embed, params["post_kl"]["w"], params["post_kl"]["b"])

    def layer(h, p):
        from meshanything_tpu.models.layers import self_attention_block
        return self_attention_block(
            h, p, num_heads=cfg.heads, dual_sqrt_scale=True, ln_eps=cfg.ln_eps
        )

    return scan_layers(layer, x, params["transformer"])


def to_shape_latents(params: dict, cfg: PerceiverConfig, latents: jax.Array) -> jax.Array:
    """asl_pl_module.py:182-185: deterministic VAE round-trip of the 256
    latent tokens (no sampling)."""
    return decode_latents(params, cfg, encode_kl_mode(params, latents))


def query_geometry(params: dict, cfg: PerceiverConfig, queries: jax.Array, latents: jax.Array) -> jax.Array:
    """Occupancy logits for (B, P, 3) query points against decoded
    latents (CrossAttentionDecoder, sal_perceiver.py:115-159)."""
    g = params["geo_decoder"]
    q = fourier_embed(queries, cfg.num_freqs, cfg.include_pi)
    q = linear(q, g["query_proj"]["w"], g["query_proj"]["b"])
    # blockwise: recon queries arrive in 10k+-point grid chunks; dense
    # scores would be (P, 257) x heads x f32 per row
    x = cross_attention_block(
        q, latents, g["cross"], num_heads=cfg.heads,
        dual_sqrt_scale=True, ln_eps=cfg.ln_eps, blockwise=True,
    )
    x = layer_norm(x, g["ln_post"]["scale"], g["ln_post"]["bias"], cfg.ln_eps)
    return linear(x, g["output_proj"]["w"], g["output_proj"]["b"])[..., 0]
