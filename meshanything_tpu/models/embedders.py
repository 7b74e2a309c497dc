"""Auxiliary positional/coordinate embedders.

Rebuilds the reference's extra (dead-code) embedder tier,
michelangelo/models/modules/embedder.py:108-230:
  * LearnedFourierEmbedder (:108-132) — learned per-channel frequencies,
    output = [x ‖ sin ‖ cos];
  * TriplaneLearnedFourierEmbedder (:135-153) — sum of three plane
    embedders;
  * sequential_pos_embed (:156-172) — fixed sin/cos table;
  * timestep_embedding — see models/diffusion.py (diffusers
    convention);
  * get_embedder factory (:195-230) — identity / fourier / learned
    selection (the hashgrid branch requires tiny-cuda-nn and is
    rejected explicitly, as the reference effectively does by ImportError).

The live FourierEmbedder (fixed 2^k frequencies) lives in
models/perceiver.py; these are the generalizations the training stack
can opt into.
"""
from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def init_learned_fourier(key: jax.Array, in_channels: int, dim: int,
                         dtype=jnp.float32) -> dict:
    if dim % 2:
        raise ValueError("dim must be even")
    per_channel = (dim // 2) // in_channels
    return {"weights": jax.random.normal(key, (per_channel,), dtype)}


def learned_fourier(params: dict, x: jax.Array) -> jax.Array:
    """[..., c] -> [..., c + 2*c*per_channel]: x ‖ sin(2π x w) ‖ cos(2π x w)."""
    freqs = (x[..., None] * params["weights"] * (2 * math.pi))
    freqs = freqs.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


def learned_fourier_out_dim(in_channels: int, dim: int) -> int:
    per_channel = (dim // 2) // in_channels
    return in_channels + 2 * in_channels * per_channel


def init_triplane_fourier(key: jax.Array, in_channels: int, dim: int,
                          dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    return {plane: init_learned_fourier(k, in_channels, dim, dtype)
            for plane, k in zip(("yz", "xz", "xy"), ks)}


def triplane_fourier(params: dict, x: jax.Array) -> jax.Array:
    """Sum of the three plane embeddings (embedder.py:145-153)."""
    return (learned_fourier(params["yz"], x)
            + learned_fourier(params["xz"], x)
            + learned_fourier(params["xy"], x))


def sequential_pos_embed(num_len: int, embed_dim: int) -> jax.Array:
    """Fixed sin/cos table [sin ‖ cos] with 10000^(-2i/D) frequencies
    (embedder.py:156-172)."""
    if embed_dim % 2:
        raise ValueError("embed_dim must be even")
    pos = jnp.arange(num_len, dtype=jnp.float32)
    omega = 1.0 / 10000 ** (jnp.arange(embed_dim // 2, dtype=jnp.float32)
                            / (embed_dim / 2))
    out = pos[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1)


def get_embedder(embed_type: str = "fourier", num_freqs: int = -1,
                 input_dim: int = 3, *, key=None, learned_dim: int = 64,
                 include_pi: bool = True) -> Tuple[Callable, int]:
    """Embedder factory (embedder.py:195-230): returns (fn, out_dim).

    "identity" (or fourier with num_freqs=-1) -> passthrough;
    "fourier" -> the live fixed-frequency embedder (perceiver module);
    "learned_fourier" -> the per-channel learned variant (closes over
    freshly initialized params; pass them explicitly for training via
    init_learned_fourier + learned_fourier)."""
    if embed_type == "identity" or (embed_type == "fourier" and num_freqs == -1):
        return (lambda x: x), input_dim
    if embed_type == "fourier":
        from meshanything_tpu.models.perceiver import fourier_embed

        out_dim = input_dim * (2 * num_freqs + 1)
        return (lambda x: fourier_embed(x, num_freqs, include_pi=include_pi)), out_dim
    if embed_type == "learned_fourier":
        if key is None:
            key = jax.random.PRNGKey(0)
        params = init_learned_fourier(key, input_dim, learned_dim)
        return (lambda x: learned_fourier(params, x)), learned_fourier_out_dim(input_dim, learned_dim)
    raise ValueError(
        f"unsupported embed_type {embed_type!r} (the reference's hashgrid "
        "branch requires tiny-cuda-nn, unavailable on TPU)"
    )
