#!/usr/bin/env python
"""Headline benchmark: 800-face max-length mesh generation on one chip.

Prints ONE JSON line:
  {"metric": "mesh_latency_800f_b8", "value": <seconds per mesh>,
   "unit": "s", "vs_baseline": <A6000_30s / value>}

Methodology: the full 350M pipeline (perceiver encode + condition +
7,202-token AR decode + detokenizer) at the 800-face cap with early-exit
disabled — the honest comparable to the reference's "~30 s per mesh on
A6000" (README.md:116), which is full-length generation. Exact bf16
numerics (token streams match the reference's greedy semantics); the
int8-KV fast mode is faster still (PERF.md) but trades exactness, so it
is not the headline. Batch 8 amortizes weight reads the same way any
production deployment would; per-mesh latency = batch time / 8. Falls
back to batch 1 if the batched run fails (e.g. memory pressure on a
shared chip).

Weights are random (the shipped checkpoint needs network access);
latency is weight-value-independent at fixed token count.
Diagnostics go to stderr.
"""
import json
import sys
import time

import numpy as np

BASELINE_S = 30.0  # A6000 per-mesh latency, reference README.md:116


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_config(runner, params, pc, batch, label):
    import jax

    t0 = time.time()
    out = runner(pc)
    jax.device_get(out.token_ids.ravel()[0])
    log(f"{label}: compile+first run {time.time() - t0:.1f}s")

    times = []
    for i in range(2):
        t0 = time.time()
        out = runner(pc)
        jax.device_get(out.token_ids.ravel()[0])
        times.append(time.time() - t0)
        log(f"{label} run {i}: {times[-1]:.3f}s ({times[-1] / batch:.3f}s/mesh)")
    return float(np.median(times)) / batch


def main():
    import jax
    import jax.numpy as jnp

    from meshanything_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.runtime.phases import PhaseRunner

    cfg = MeshAnythingConfig()
    log(f"devices: {jax.devices()}")
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    runner = PhaseRunner(params, cfg, bucket=512, early_exit=False)

    rng = np.random.default_rng(0)

    def emit(metric, per_mesh):
        log(f"meshes/min/chip: {60.0 / per_mesh:.1f}; "
            f"AR tokens/sec/chip: {cfg.generate_length / per_mesh:.0f}")
        # one JSON line per completed config; the last one printed is
        # the headline — so an external timeout during the bigger
        # config still leaves a valid result on stdout
        print(json.dumps({
            "metric": metric,
            "value": round(per_mesh, 3),
            "unit": "s",
            "vs_baseline": round(BASELINE_S / per_mesh, 2),
        }), flush=True)

    pc1 = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
    per_mesh = run_config(runner, params, pc1, 1, "exact bf16 B=1")
    emit("p50_mesh_latency_800f", per_mesh)

    try:
        batch = 8
        pc8 = jnp.asarray(rng.normal(size=(batch, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
        per_mesh = run_config(runner, params, pc8, batch, f"exact bf16 B={batch}")
        emit("mesh_latency_800f_b8", per_mesh)
    except Exception as e:
        log(f"batched config failed ({type(e).__name__}: {e}); keeping B=1 result")


if __name__ == "__main__":
    main()
