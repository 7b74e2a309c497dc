"""Token sampling: greedy and HF-compatible top-k/top-p.

The reference samples through HF generate with ``do_sample=True,
top_k=50, top_p=0.95`` (meshanything.py:153-162). HF applies the
warpers in sequence — top-k filter first, then nucleus — with
min_tokens_to_keep=1; this reproduces that filtering exactly (the drawn
token given a PRNG differs across frameworks, of course; determinism
here is per-seed within this framework).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    """Mask everything below the k-th largest logit to -inf."""
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, jnp.float32(-jnp.inf), logits)


def top_p_filter(logits: jax.Array, p: float) -> jax.Array:
    """Nucleus filtering with HF semantics: sort descending, drop tokens
    whose *cumulative* probability (inclusive) exceeds p, but always keep
    the top token."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # HF: sorted_indices_to_remove = cum > p, then shifted right one so
    # the first token crossing the threshold is kept.
    keep_sorted = (cum - probs) <= p  # exclusive cumsum <= p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    # find the logit cutoff: smallest kept logit per row
    cutoff = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.float32(jnp.inf)), axis=-1, keepdims=True)
    return jnp.where(logits >= cutoff, logits, jnp.float32(-jnp.inf))


def sample_token(
    key: jax.Array,
    logits: jax.Array,
    *,
    sampling: bool,
    top_k: int = 50,
    top_p: float = 0.95,
    temperature: float = 1.0,
) -> jax.Array:
    """(B, vocab) f32 logits -> (B,) int32 next token."""
    if not sampling:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if temperature != 1.0:
        logits = logits / temperature
    logits = top_k_filter(logits, top_k)
    logits = top_p_filter(logits, top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
