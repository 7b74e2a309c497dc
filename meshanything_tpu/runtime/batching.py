"""Dynamic micro-batching for serving: coalesce concurrent requests.

Per-mesh decode cost falls super-linearly with batch on one chip —
exact bf16 runs 12.4 s at B=1 but 5.2 s/mesh at B=8 (PERF.md), because
each decode step's 0.62 GB weight read is shared by every row. The
reference serves strictly one request at a time (app.py); this batcher
keeps the per-request API while packing concurrent requests into one
padded batched generation.

Design:
  * requests enqueue (pc, sampling, key) + a Future; a single worker
    thread drains the queue, waiting up to ``max_wait_s`` after the
    first arrival to let a batch accumulate (classic dynamic batching);
  * batches pad UP to the next size in ``batch_sizes`` (repeating the
    last row) so only len(batch_sizes) decode programs ever compile —
    a lone request still runs the cheap B=1 program instead of paying
    a padded B=8 decode;
  * greedy and sampling requests never mix (different compiled
    programs); completion-prompt requests bypass batching (prompt
    shapes vary per request);
  * a failure inside a batch propagates to every member's Future —
    callers see the exception exactly as in the unbatched path.

Sampling requests BYPASS batching entirely: a batched decode draws all
rows from one PRNG key, which would silently discard every other
request's seed (its advertised seed would have zero effect on its
stream). Per-seed reproducibility is part of the API contract
(reference app.py seeds each request), so sampled requests run
unbatched; only greedy requests — the default and the deterministic
path — coalesce.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import numpy as np


class BatchingRunner:
    """Wraps a PhaseRunner-shaped callable with dynamic micro-batching.

    Call signature matches PhaseRunner: ``(pc, sampling=, key=,
    prompt_ids=)`` with pc of batch 1; returns that row's
    GenerateOutput."""

    def __init__(self, runner, *, batch_sizes: Sequence[int] = (1, 2, 4, 8),
                 max_wait_s: float = 0.05):
        self._runner = runner
        self._sizes = sorted(batch_sizes)
        self._max_batch = self._sizes[-1]
        self._max_wait = max_wait_s
        self._q: "queue.Queue" = queue.Queue()
        self.batch_calls = 0          # observability: batched launches
        self.rows_served = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def __call__(self, pc, *, sampling: bool = False, key=None,
                 prompt_ids=None, timer=None):
        if prompt_ids is not None or sampling or np.asarray(pc).shape[0] != 1:
            # pass-through: variable prompt shapes, per-seed sampling
            # (see module docstring), or already-batched pcs
            if prompt_ids is not None:
                return self._runner(pc, sampling=sampling, key=key,
                                    prompt_ids=prompt_ids)
            return self._runner(pc, sampling=sampling, key=key)
        fut: Future = Future()
        self._q.put((np.asarray(pc), False, key, fut))
        return fut.result()

    def close(self) -> None:
        """Stop the worker thread (idempotent). Without this the daemon
        worker blocks in queue.get forever, keeping the wrapped runner —
        and its param tree — alive for the life of the process."""
        if self._thread.is_alive():
            self._q.put(None)
            self._thread.join(timeout=10)

    # ------------------------------------------------------------------
    def _loop(self):
        while True:
            first = self._q.get()
            if first is None:  # close() sentinel
                return
            batch = [first]
            stop = False
            deadline = time.time() + self._max_wait
            while len(batch) < self._max_batch:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:  # close() raced an in-flight batch
                    stop = True
                    break
                batch.append(item)
            self._run_group(batch, sampling=False)  # only greedy enqueues
            if stop:
                return

    def _pad_size(self, n: int) -> int:
        for s in self._sizes:
            if s >= n:
                return s
        return self._max_batch

    def _run_group(self, group, sampling: bool):
        from meshanything_tpu.models.meshanything import GenerateOutput

        try:
            import jax.numpy as jnp

            pcs = np.concatenate([g[0] for g in group])
            size = self._pad_size(len(pcs))
            if size > len(pcs):
                pcs = np.concatenate(
                    [pcs, np.repeat(pcs[-1:], size - len(pcs), axis=0)])
            key = next((g[2] for g in group if g[2] is not None), None)
            out = self._runner(jnp.asarray(pcs), sampling=sampling, key=key)
            coords = np.asarray(out.face_coords)
            tokens = np.asarray(out.token_ids)
            self.batch_calls += 1
            self.rows_served += len(group)
            for i, (_, _, _, fut) in enumerate(group):
                fut.set_result(GenerateOutput(
                    face_coords=coords[i: i + 1], token_ids=tokens[i: i + 1]))
        except Exception as e:  # propagate to every member
            for _, _, _, fut in group:
                if not fut.done():
                    fut.set_exception(e)
