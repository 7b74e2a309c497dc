#!/usr/bin/env python
"""Isolate the lookahead per-forward dispatch overhead (VERDICT r3 #3).

PERF.md r3: at int4+la8 B=24 each window forward costs ~42 ms of which
HBM traffic explains ~4 ms. This probe times window forwards directly
(lookahead_segment bounded by until_iters, state donated between
segments) so kernel/glue variants can be A/B'd per forward without
full-mesh runs. Context ramps with acceptance; per-forward overhead is
context-independent, so the A/B comparison is valid even though random
weights accept near-full windows.

  python -m tools.la_dispatch_probe [attn] [batch] [iters]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def probe(attn="pallas_int4", batch=24, window=8, iters=60, warm_iters=20,
          grouped=False):
    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.models import lookahead as la
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.models import perceiver as per

    cfg = MeshAnythingConfig()
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(
        size=(batch, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
    pf = per.encode_latents(params["perceiver"], cfg.perceiver,
                            pc.astype(jnp.bfloat16))
    cond = ma.process_point_feature(params, cfg, pf)
    gl = cfg.generate_length
    bucket = 512
    s_max = -(-(cfg.cond_length + gl + window) // bucket) * bucket

    init = jax.jit(lambda p, c: la.init_lookahead_state(
        p, cfg.opt, c, max_new_tokens=gl, window=window, bucket=bucket,
        attn=attn))
    seg = jax.jit(lambda p, st, until: la.lookahead_segment(
        p, cfg.opt, st, s_max=s_max, max_new_tokens=gl, window=window,
        attn=attn, bucket=bucket, until_iters=until, grouped=grouped),
        donate_argnums=(1,))

    t0 = time.time()
    st = init(params["opt"], cond)
    st = seg(params["opt"], st, jnp.int32(warm_iters))
    jax.device_get(np.asarray(st.steps))
    print(f"compile+warm ({warm_iters} forwards): {time.time() - t0:.1f}s",
          flush=True)

    it0 = int(st.iters)
    t0 = time.time()
    st = seg(params["opt"], st, jnp.int32(warm_iters + iters))
    steps = jax.device_get(np.asarray(st.steps))
    dt = time.time() - t0
    done_iters = int(st.iters) - it0
    print(f"{attn} B={batch} W={window}: {done_iters} forwards in {dt:.3f}s "
          f"= {dt / max(done_iters, 1) * 1e3:.2f} ms/forward; "
          f"steps[:4]={steps[:4]}")
    return dt / max(done_iters, 1)


if __name__ == "__main__":
    attn = sys.argv[1] if len(sys.argv) > 1 else "pallas_int4"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    grouped = len(sys.argv) > 4 and sys.argv[4] == "grouped"
    probe(attn=attn, batch=batch, iters=iters, grouped=grouped)
