"""Training losses.

The reference releases no training code (README.md:123 TODO), but its
inference graph pins the loss surfaces:
  * AR token loss — the shifted cross-entropy inside ShapeOPT.forward
    (shape_opt.py:157-166);
  * the Michelangelo VAE recipe — ContrastKLNearFar
    (michelangelo/models/tsal/loss.py:193): BCE occupancy + KL, with an
    optional CLIP-contrastive term (dead at inference).
This module provides TPU-native implementations of both so the
framework is trainable end-to-end.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

import optax


def shifted_token_ce(
    logits: jax.Array,
    labels: jax.Array,
    ignore_index: int = -100,
) -> jax.Array:
    """CrossEntropy(logits[..., :-1, :], labels[..., 1:]) with -100
    ignored — exact shape_opt.py:157-166 semantics (mean over non-ignored
    positions)."""
    shift_logits = logits[..., :-1, :]
    shift_labels = labels[..., 1:]
    valid = shift_labels != ignore_index
    safe = jnp.where(valid, shift_labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        shift_logits.astype(jnp.float32), safe
    )
    ce = jnp.where(valid, ce, 0.0)
    return ce.sum() / jnp.maximum(valid.sum(), 1)


def token_accuracy(logits: jax.Array, labels: jax.Array, ignore_index: int = -100) -> jax.Array:
    pred = jnp.argmax(logits[..., :-1, :], axis=-1)
    shift_labels = labels[..., 1:]
    valid = shift_labels != ignore_index
    correct = (pred == shift_labels) & valid
    return correct.sum() / jnp.maximum(valid.sum(), 1)


def vae_occupancy_loss(
    logits: jax.Array,
    occupancy_labels: jax.Array,
    posterior_mean: jax.Array,
    posterior_logvar: jax.Array,
    *,
    kl_weight: float = 0.001,
    near_logits: Optional[jax.Array] = None,
    near_labels: Optional[jax.Array] = None,
    near_weight: float = 0.1,
) -> dict:
    """Michelangelo KLNearFar (loss.py:13-92): BCE over volume occupancy
    (+ optional near-surface term) + posterior KL to N(0, I)."""
    bce = optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), occupancy_labels.astype(jnp.float32)
    ).mean()
    loss = bce
    out = {"vol_bce": bce}
    if near_logits is not None:
        nb = optax.sigmoid_binary_cross_entropy(
            near_logits.astype(jnp.float32), near_labels.astype(jnp.float32)
        ).mean()
        loss = loss + near_weight * nb
        out["near_bce"] = nb
    var = jnp.exp(posterior_logvar)
    kl = 0.5 * jnp.mean(posterior_mean**2 + var - 1.0 - posterior_logvar)
    out["kl"] = kl
    out["loss"] = loss + kl_weight * kl
    return out


def contrastive_loss(shape_embed: jax.Array, other_embed: jax.Array, logit_scale: jax.Array,
                     axis_name: Optional[str] = None) -> jax.Array:
    """CLIP-style symmetric InfoNCE (loss.py:193-301). When ``axis_name``
    is given, negatives are gathered across the data axis with
    all_gather over ICI — the jax-native form of the reference's
    all_gather_batch (misc.py:60-83)."""
    a = shape_embed / jnp.linalg.norm(shape_embed, axis=-1, keepdims=True)
    b = other_embed / jnp.linalg.norm(other_embed, axis=-1, keepdims=True)
    if axis_name is not None:
        b_all = jax.lax.all_gather(b, axis_name, tiled=True)
        idx = jax.lax.axis_index(axis_name)
        offset = idx * a.shape[0]
    else:
        b_all = b
        offset = 0
    logits = logit_scale * (a @ b_all.T)
    labels = jnp.arange(a.shape[0]) + offset
    loss_ab = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    return loss_ab


def compute_psnr(x, y, data_range: float = 2.0, eps: float = 1e-7):
    """PSNR over a value range (reference utils/eval.py:6-11)."""
    mse = jnp.mean((x - y) ** 2)
    return 10.0 * jnp.log10(data_range / (mse + eps))
