#!/usr/bin/env python
"""Serving throughput under concurrent load: micro-batching on vs off.

Fires N concurrent engine-level requests (same flow as HTTP handlers:
preprocess + generate + postprocess, renders off) against a
ServingEngine with the dynamic micro-batcher, then serially without it,
and reports aggregate wall-clock + per-request latency. The expected
shape (PERF.md): one B=8 exact decode costs ~41 s total vs 8x12.4 s
serial, so batching roughly halves time-per-mesh under load.

Run on TPU (single-tenant):  python tools/batch_serving_probe.py [N]
"""
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp

    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.geometry import load_mesh
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.runtime.batching import BatchingRunner
    from meshanything_tpu.runtime.phases import PhaseRunner
    from meshanything_tpu.serving import ServingEngine

    cfg = MeshAnythingConfig()
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    runner = PhaseRunner(params, cfg, bucket=512)
    mesh = load_mesh(os.path.join(REF, "examples/wand.obj"))

    # warm both programs (B=1 and B=n) — the server compile cache makes
    # this fast after bench has run
    print("warming B=1 and B=%d programs..." % n, flush=True)
    rng = np.random.default_rng(0)
    for b in (1, n):
        pc = jnp.asarray(rng.normal(size=(b, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
        out = runner(pc)
        jax.device_get(out.token_ids.ravel()[0])

    engine = ServingEngine(params, cfg, runner=runner,
                           artifacts_dir="/tmp/batch_probe")

    def one_request(eng):
        return eng.generate_from_mesh(mesh.vertices, mesh.faces, seed=0,
                                      render="off", export_artifacts=False)

    # serial baseline
    t0 = time.time()
    for _ in range(n):
        one_request(engine)
    t_serial = time.time() - t0
    print(f"serial {n} requests: {t_serial:.1f}s "
          f"({t_serial / n:.2f}s/request)", flush=True)

    # batched: generous window — this 1-core host serializes the
    # per-request preprocessing, spreading arrivals over ~2 s
    batched = BatchingRunner(runner, batch_sizes=(1, 2, 4, n), max_wait_s=4.0)
    engine_b = ServingEngine(params, cfg, runner=batched,
                             artifacts_dir="/tmp/batch_probe")
    results = [None] * n
    t0 = time.time()
    threads = []
    for i in range(n):
        t = threading.Thread(target=lambda i=i: results.__setitem__(i, one_request(engine_b)))
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=600)
    t_batch = time.time() - t0
    assert all(r is not None for r in results)
    print(f"batched {n} concurrent requests: {t_batch:.1f}s "
          f"({t_batch / n:.2f}s/request); launches: {batched.batch_calls} "
          f"(sizes coalesced from {batched.rows_served} rows)", flush=True)
    print(f"throughput gain under load: {t_serial / t_batch:.2f}x", flush=True)
    batched.close()


if __name__ == "__main__":
    main()
