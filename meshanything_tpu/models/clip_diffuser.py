"""ClipASLDiffuser — CLIP-conditioned latent diffusion over shape
latents, composed end to end.

Rebuilds the reference's clip_asl_diffuser_pl_module.py (dead code):
a frozen CLIP image (or text) encoder conditions the ASL denoiser; the
first stage is the perceiver VAE (encode_kl for training latents,
decode + occupancy extraction for sampling). Pipeline:

  train:  surface -> perceiver.encode_latents -> encode_kl(sample)
          -> diffusion_loss(latents, clip_cond)            (:241-301)
  sample: image/text -> CLIP embed -> ddim_sample(latents)
          -> perceiver.decode_latents -> extract_geometry  (:315-380)

Everything but the host-side marching step is jittable; the CLIP and
perceiver parameter trees are frozen structurally (never handed to an
optimizer)."""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from meshanything_tpu.config import PerceiverConfig
from meshanything_tpu.models import clip_cond as cc
from meshanything_tpu.models import diffusion as dm
from meshanything_tpu.models import perceiver as per_mod


def encode_first_stage(perceiver_params: dict, pcfg: PerceiverConfig,
                       surface: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
    """surface (B, N, 6) -> KL latents (B, num_latents, embed_dim)
    (clip_asl_diffuser_pl_module.py:229-236; posterior sample when a key
    is given, mode otherwise)."""
    feats = per_mod.encode_latents(perceiver_params, pcfg, surface)
    latents = feats[:, 1:]  # drop the shape-embed token
    if key is None:
        return per_mod.encode_kl_mode(perceiver_params, latents)
    return per_mod.encode_kl_sample(perceiver_params, latents, key)


def clip_diffuser_loss(diff_params: dict, dcfg: dm.DiffusionConfig,
                       perceiver_params: dict, pcfg: PerceiverConfig,
                       clip_params: dict, vcfg: cc.CLIPVisionConfig,
                       key: jax.Array, surface: jax.Array, image: jax.Array,
                       cond_drop_prob: float = 0.1) -> jax.Array:
    """One training objective evaluation: eps-MSE over VAE latents with
    the frozen CLIP image condition (the reference's forward + noise
    branch of compute_loss, :241-348). Only diff_params should receive
    gradients."""
    k_enc, k_img, k_loss = jax.random.split(key, 3)
    latents = encode_first_stage(perceiver_params, pcfg, surface, k_enc)
    cond = cc.image_embedding(clip_params, vcfg, image, key=k_img,
                              zero_embedding_radio=0.0)
    return dm.diffusion_loss(diff_params, dcfg, k_loss, latents, cond,
                             cond_drop_prob=cond_drop_prob)


def sample_latents_from_cond(diff_params: dict, dcfg: dm.DiffusionConfig,
                             cond: jax.Array, key: jax.Array, *,
                             num_latents: int, embed_dim: int,
                             steps: int = 50, guidance_scale: float = 3.0) -> jax.Array:
    """cond (B, n, ctx_dim) -> sampled KL latents via DDIM + CFG
    (zeros as the unconditional embedding, the MDM convention the
    reference notes at :425-430)."""
    return dm.ddim_sample(diff_params, dcfg, key, cond,
                          shape=(num_latents, embed_dim), steps=steps,
                          guidance_scale=guidance_scale)


def sample_shapes_from_image(diff_params: dict, dcfg: dm.DiffusionConfig,
                             perceiver_params: dict, pcfg: PerceiverConfig,
                             clip_params: dict, vcfg: cc.CLIPVisionConfig,
                             image: jax.Array, key: jax.Array, *,
                             steps: int = 50, guidance_scale: float = 3.0,
                             octree_depth: int = 6) -> List:
    """Image -> shape: CLIP embed, DDIM over latents, VAE decode,
    occupancy marching (the reference ClipASLDiffuser.sample, :315-380).
    Returns a list of Mesh | None per batch row."""
    from meshanything_tpu.runtime.recon import extract_geometry

    cond = cc.image_embedding(clip_params, vcfg, image)
    z = sample_latents_from_cond(
        diff_params, dcfg, cond, key,
        num_latents=pcfg.num_latents, embed_dim=pcfg.embed_dim,
        steps=steps, guidance_scale=guidance_scale)
    decoded = per_mod.decode_latents(perceiver_params, pcfg, z.astype(jnp.float32))
    return extract_geometry(perceiver_params, pcfg, decoded,
                            octree_depth=octree_depth)


def sample_shapes_from_text(diff_params: dict, dcfg: dm.DiffusionConfig,
                            perceiver_params: dict, pcfg: PerceiverConfig,
                            clip_params: dict, tcfg: cc.CLIPTextConfig,
                            input_ids: jax.Array, key: jax.Array, *,
                            steps: int = 50, guidance_scale: float = 3.0,
                            octree_depth: int = 6) -> List:
    """Tokenized text -> shape (the text-conditioned sibling; the
    pooled projected text feature conditions the denoiser)."""
    from meshanything_tpu.runtime.recon import extract_geometry

    feats = cc.clip_text_features(clip_params, tcfg, input_ids)
    cond = (feats / jnp.linalg.norm(feats, axis=-1, keepdims=True))[:, None, :]
    z = sample_latents_from_cond(
        diff_params, dcfg, cond, key,
        num_latents=pcfg.num_latents, embed_dim=pcfg.embed_dim,
        steps=steps, guidance_scale=guidance_scale)
    decoded = per_mod.decode_latents(perceiver_params, pcfg, z.astype(jnp.float32))
    return extract_geometry(perceiver_params, pcfg, decoded,
                            octree_depth=octree_depth)
