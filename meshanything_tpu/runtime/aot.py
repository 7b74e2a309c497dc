"""AOT compiled-executable store: cold-start without recompiling.

The decode program costs minutes of compile on this platform (~400 s
for the exact B=8 program, BENCH_r02 tail) and the persistent XLA
compilation cache cannot capture server-side compiles (CLAUDE.md) — so
every NEW PROCESS pays the full compile before its first token. The
reference has no comparable problem (torch eager), so this is a
TPU-operability subsystem the rebuild must add, not match.

This module serializes the COMPILED executable via
``jax.experimental.serialize_executable`` keyed by a fingerprint of
(function label, config/context, backend + device kind, jax version,
abstract argument shapes, static kwargs). A later process deserializes
and runs — IO-bound seconds instead of compile minutes.

Degrades gracefully: if the backend's executables don't serialize or a
stored artifact fails to load (version bump, different machine), the
wrapper silently falls back to ordinary jit compilation and tries to
refresh the store.

Platform note (PERF.md r3 cold-start study): on the axon remote-compile
tunnel, executables produced by lower().compile() — own or
deserialized — pay ~220 s of server-side work at FIRST execution,
while plain jit dispatch hits the compile service's own cross-process
cache (~26 s to first mesh once any process has run the program). So
on axon leave aot_dir unset and warm with `--precompile` (which then
runs one dummy generation); use the store on standard PJRT runtimes.

Usage:
    store = AotStore(directory)
    fn = AotFunction(lambda p, x: ..., "decode", store=store,
                     context=repr(cfg), static_argnames=("sampling",))
    fn(params, cond, sampling=False)            # compile-or-load + run
    fn.precompile(params, cond_sds, sampling=False)  # build only

PhaseRunner wires every phase through this when ``aot_dir`` is set;
``PhaseRunner.precompile(batch)`` warms all phases from shape structs
without touching the device.
"""
from __future__ import annotations

import hashlib
import os
import pickle
import sys
import tempfile
from typing import Callable, Optional, Sequence

import jax


def _log(msg: str) -> None:
    print(f"[aot] {msg}", file=sys.stderr, flush=True)


def fingerprint(*parts) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:32]


class AotStore:
    """Directory of serialized executables, one file per fingerprint."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, digest: str) -> str:
        return os.path.join(self.directory, f"{digest}.jaxexec")

    def load(self, digest: str):
        """Deserialized executable, or None (missing/unloadable)."""
        path = self._path(digest)
        if not os.path.exists(path):
            return None
        try:
            from jax.experimental.serialize_executable import deserialize_and_load

            with open(path, "rb") as fh:
                payload, in_tree, out_tree, device_ids = pickle.load(fh)
            # bind to the executable's own device set: without this the
            # unpickler defaults to ALL local devices, and a 1-device
            # program loaded on an 8-device host demands 8 input shards
            by_id = {d.id: d for d in jax.devices()}
            devices = [by_id[i] for i in device_ids]
            return deserialize_and_load(payload, in_tree, out_tree,
                                        execution_devices=devices)
        except Exception as e:  # stale jax/backend — recompile instead
            _log(f"load failed for {digest} ({type(e).__name__}: {e}); recompiling")
            return None

    def store(self, digest: str, compiled) -> bool:
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            try:
                device_ids = [
                    d.id for d in compiled._executable.xla_executable.local_devices()
                ]
            except Exception:
                device_ids = [jax.devices()[0].id]
            # atomic write: concurrent processes may warm the same key
            fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                pickle.dump((payload, in_tree, out_tree, device_ids), fh)
            os.replace(tmp, self._path(digest))
            return True
        except Exception as e:  # backend doesn't serialize — jit only
            _log(f"serialize failed for {digest} ({type(e).__name__}: {e})")
            return False


def _aval_tree(args):
    return jax.tree_util.tree_map(
        lambda x: (tuple(x.shape), str(x.dtype)), args
    )


class AotFunction:
    """jit wrapper with a disk-backed compiled-executable cache.

    Without a store this is exactly ``jax.jit(fn, static_argnames=...)``.
    With one, each distinct (arg shapes, statics) signature resolves to
    a compiled executable: in-memory first, then the store, then
    lower+compile (persisting the result)."""

    def __init__(self, fn: Callable, label: str, *,
                 store: Optional[AotStore] = None,
                 static_argnames: Sequence[str] = (),
                 donate_argnums: Sequence[int] = (),
                 context: str = ""):
        self._label = label
        self._store = store
        self._static_argnames = tuple(static_argnames)
        self._context = context
        self._jit = jax.jit(fn, static_argnames=self._static_argnames,
                            donate_argnums=tuple(donate_argnums))
        self._mem: dict = {}

    def _digest(self, args, statics) -> str:
        backend = jax.default_backend()
        device = jax.devices()[0].device_kind if jax.devices() else "none"
        return fingerprint(
            self._label, self._context, backend, device, jax.__version__,
            _aval_tree(args), tuple(sorted(statics.items())),
        )

    def _resolve(self, args, statics, build: bool = True):
        digest = self._digest(args, statics)
        compiled = self._mem.get(digest)
        if compiled is not None:
            return compiled
        if self._store is not None:
            compiled = self._store.load(digest)
            if compiled is not None:
                _log(f"{self._label}: loaded compiled executable {digest}")
                self._mem[digest] = compiled
                return compiled
        if not build:
            return None
        lowered = self._jit.lower(*args, **statics)
        compiled = lowered.compile()
        if self._store is not None:
            if self._store.store(digest, compiled):
                _log(f"{self._label}: stored compiled executable {digest}")
        self._mem[digest] = compiled
        return compiled

    def __call__(self, *args, **statics):
        if self._store is None:
            return self._jit(*args, **statics)
        return self._resolve(args, statics)(*args)

    def precompile(self, *args, **statics) -> None:
        """Compile-or-load without executing. Args may be (a mix of)
        concrete arrays and jax.ShapeDtypeStruct — nothing runs."""
        self._resolve(args, statics)
