#!/usr/bin/env python
"""Headline benchmark: max-length 800-face mesh generation on one chip.

Prints ONE JSON line:
  {"metric": "p50_mesh_latency_800f", "value": <seconds>, "unit": "s",
   "vs_baseline": <A6000_30s / value>}

Methodology: the full 350M pipeline (perceiver encode + condition +
7,202-token AR decode + detokenizer) at the 800-face cap with early-exit
disabled — the honest comparable to the reference's "~30s per mesh on
A6000" (README.md:116), which is the full-length generation cost.
Weights are random (the shipped checkpoint needs network access);
latency is weight-value-independent for a fixed token count.

Extra diagnostics go to stderr.
"""
import json
import sys
import time

import numpy as np


BASELINE_S = 30.0  # A6000 per-mesh latency, reference README.md:116


def main():
    import jax
    import jax.numpy as jnp

    from meshanything_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.models import meshanything as ma

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    cfg = MeshAnythingConfig()
    log(f"devices: {jax.devices()}")
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)

    from meshanything_tpu.runtime.phases import PhaseRunner

    runner = PhaseRunner(params, cfg, bucket=512, early_exit=False)

    def full_gen(params, pc_normal):
        out = runner(pc_normal)
        return out.face_coords, out.token_ids

    # NOTE: device_get (host transfer) is the fence — on the axon
    # platform block_until_ready returns before execution completes.
    t0 = time.time()
    jax.device_get(full_gen(params, pc))
    log(f"compile+first run: {time.time() - t0:.1f}s")

    times = []
    for i in range(3):
        t0 = time.time()
        jax.device_get(full_gen(params, pc))
        times.append(time.time() - t0)
        log(f"run {i}: {times[-1]:.3f}s")

    p50 = float(np.median(times))
    tok_s = cfg.generate_length / p50
    log(f"AR tokens/sec/chip: {tok_s:.0f}")

    print(json.dumps({
        "metric": "p50_mesh_latency_800f",
        "value": round(p50, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / p50, 2),
    }))


if __name__ == "__main__":
    main()
