#!/usr/bin/env python
"""Measure AOT cold-start: time-to-first-mesh for a fresh process.

  python tools/cold_start_bench.py warm [dir]   # compile + store executables
  python tools/cold_start_bench.py cold [dir]   # fresh process: load + run
  python tools/cold_start_bench.py none         # baseline: no store (full compile)

Run warm once, then cold in a NEW process — the cold number is the
serving cold-start with an aot_dir (VERDICT r2 next #4: target <=60 s
against the ~400 s server-side compile).
Single-tenant chip: never run two of these at once.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "warm"
    aot_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/aot_r3"

    t_start = time.time()
    import jax
    import jax.numpy as jnp

    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.runtime.phases import PhaseRunner

    cfg = MeshAnythingConfig()
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    print(f"[{mode}] imports+params: {time.time() - t_start:.1f}s", flush=True)

    runner = PhaseRunner(params, cfg, bucket=512, early_exit=False,
                         aot_dir=None if mode == "none" else aot_dir)
    if mode == "warm":
        t0 = time.time()
        runner.precompile(batch=1)
        print(f"[warm] precompile(1): {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
    t0 = time.time()
    out = runner(pc)
    jax.device_get(out.token_ids.ravel()[0])
    print(f"[{mode}] first mesh: {time.time() - t0:.1f}s "
          f"(total since process start {time.time() - t_start:.1f}s)", flush=True)
    t0 = time.time()
    out = runner(pc)
    jax.device_get(out.token_ids.ravel()[0])
    print(f"[{mode}] second mesh: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
