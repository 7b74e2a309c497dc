"""Full-mesh wall-clock for the int4 KV decode on one chip.

Measures the 800-face max-length stress (7,202-token decode, early-exit
off — PERF.md methodology; latency is weight-value-independent at fixed
token count) for int4 configs, including the B=32 batch the int4 cache
unlocks (same HBM bytes as the measured-OK int8 B=16).

Run (exclusive TPU): python -m tools.int4_latency_probe [configs...]
  config syntax: attn:batch:lookahead[:bucket[:wq]]
  e.g. pallas_int4:16:0, pallas_int4:1:8:512:wq (the --fast stack with
  int4 instead of int8 KV)
  default set: pallas_int4:16:0 pallas_int4:16:0:1024 pallas_int4:32:0
               pallas_int4:16:8 pallas_int4:32:8
"""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DEFAULT = [
    "pallas_int4:16:0",
    "pallas_int4:16:0:1024",
    "pallas_int4:32:0",
    "pallas_int4:16:8",
    "pallas_int4:32:8",
]


def main():
    specs = sys.argv[1:] or DEFAULT

    import jax
    import jax.numpy as jnp

    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.runtime.compile_cache import enable as enable_cache
    from meshanything_tpu.runtime.phases import PhaseRunner

    enable_cache()
    cfg = MeshAnythingConfig()
    log(f"devices: {jax.devices()}")
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    gl = cfg.generate_length

    for spec in specs:
        parts = spec.split(":")
        attn, batch, la = parts[0], int(parts[1]), int(parts[2])
        bucket = int(parts[3]) if len(parts) > 3 else 512
        if len(parts) > 4 and parts[4] != "wq":
            # a typo'd 5th field ('WQ', 'true', ...) would otherwise run
            # unquantized under a mislabeled config (ADVICE r4)
            raise ValueError(f"unknown 5th config field in {spec!r}: "
                             f"{parts[4]!r} (only 'wq' is recognized)")
        wq = len(parts) > 4
        label = f"{attn} B={batch} la={la} bucket={bucket}" + (" wq" if wq else "")
        try:
            runner = PhaseRunner(params, cfg, bucket=bucket, attn=attn,
                                 lookahead=la, wq=wq, early_exit=(la > 0))
            pc = jnp.asarray(rng.normal(
                size=(batch, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
            t0 = time.time()
            out = runner(pc)
            jax.device_get(out.token_ids.ravel()[0])
            log(f"{label}: compile+first {time.time() - t0:.1f}s")
            times = []
            for i in range(2):
                t0 = time.time()
                out = runner(pc)
                jax.device_get(out.token_ids.ravel()[0])
                times.append(time.time() - t0)
                log(f"{label} run {i}: {times[-1]:.2f}s ({times[-1] / batch:.3f}s/mesh)")
            per = float(np.median(times)) / batch
            print(f"RESULT {spec} {per:.3f} s/mesh "
                  f"({60.0 / per:.1f} meshes/min/chip, {30.0 / per:.1f}x vs A6000)",
                  flush=True)
        except Exception as e:
            log(f"{label} FAILED: {type(e).__name__}: {e}")
            print(f"RESULT {spec} FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
