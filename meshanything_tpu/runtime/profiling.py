"""Tracing / profiling: first-class per-phase timers + jax.profiler.

The reference's only observability is wall-clock prints
(main.py:147-177; SURVEY.md §5.1). Here: named phase timers with
aggregation, and optional XLA trace capture for xprof.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase (encode / prefill / decode
    / detok / postprocess)."""

    def __init__(self):
        self.records: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, xs in self.records.items():
            xs_sorted = sorted(xs)
            out[name] = {
                "count": len(xs),
                "total_s": sum(xs),
                "mean_s": sum(xs) / len(xs),
                "p50_s": xs_sorted[len(xs) // 2],
                "max_s": xs_sorted[-1],
            }
        return out

    def dump(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2)
        if path:
            with open(path, "w") as fh:
                fh.write(s)
        return s


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device live memory, when the backend exposes it."""
    stats = {}
    for d in jax.devices():
        try:
            ms = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use"),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use"),
            }
        except Exception:
            stats[str(d)] = None
    return stats
