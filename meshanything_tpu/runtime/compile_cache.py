"""Persistent XLA compilation cache.

Compiles of the full decode graph cost 2-6 minutes on this platform
(remote AOT compile service); the on-disk cache makes every later
process start in seconds. Enabled by the CLI, serving, and bench entry
points; tests skip it (tiny CPU programs).
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "MESHANYTHING_COMPILE_CACHE",
            os.path.expanduser("~/.cache/meshanything_tpu/xla"),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
