#!/usr/bin/env python
"""Speculative-sampling wall-clock on trained 350M weights (TPU).

The fast tier's coverage of the reference --sampling surface (VERDICT
r2 next #9 'a PERF row'): plain step-by-step top-k/top-p sampling vs
the speculative sampler (models/lookahead.py) with the SAME trained
bf16 weights. Speculative acceptance is probabilistic (each draft
survives with its target probability), so acceptance — and speedup —
sits below the greedy lookahead number on the same model.

Run on TPU (single-tenant):  python tools/spec_sampling_probe.py [window]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp

    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.models import perceiver as per_mod
    from meshanything_tpu.models import shape_opt as sopt
    from meshanything_tpu.models.lookahead import generate_lookahead
    from meshanything_tpu.training.synthetic_grammar import (
        get_trained_350m,
        make_grammar_batch,
    )

    params, cfg = get_trained_350m()
    held_pc, _, _ = make_grammar_batch(cfg, np.random.default_rng(99), 2, k=5)
    attn = "pallas" if jax.default_backend() == "tpu" else "xla"

    pcj = jnp.asarray(held_pc, jnp.bfloat16)
    pf = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pcj)
    cond = ma.process_point_feature(params, cfg, pf)

    gen_plain = jax.jit(lambda p, c, k: sopt.generate(
        p, cfg.opt, c, max_new_tokens=cfg.generate_length,
        bucket=512, attn=attn, sampling=True, key=k))
    gen_spec = jax.jit(lambda p, c, k: generate_lookahead(
        p, cfg.opt, c, max_new_tokens=cfg.generate_length,
        window=window, bucket=512, attn=attn, sampling=True, key=k,
        return_stats=True))

    key = jax.random.PRNGKey(3)

    def timed(fn, label):
        out = fn(params["opt"], cond, key)
        leaf = out[0] if isinstance(out, tuple) else out
        jax.device_get(np.asarray(leaf).ravel()[0])
        t0 = time.time()
        out = fn(params["opt"], cond, key)
        leaf = out[0] if isinstance(out, tuple) else out
        jax.device_get(np.asarray(leaf).ravel()[0])
        dt = time.time() - t0
        print(f"{label}: {dt:.3f}s", flush=True)
        return dt, out

    t_plain, plain_out = timed(gen_plain, "plain top-k/top-p sampling")
    t_spec, spec_out = timed(gen_spec, f"speculative sampling W={window}")
    tokens, stats = spec_out
    emitted = int(np.sum(np.asarray(stats["emitted"]) - 1))
    iters = max(int(stats["iterations"]), 1)
    b = np.asarray(tokens).shape[0]
    acc = emitted / (iters * b)
    # stream sanity: eos-terminated and in-vocab
    arr = np.asarray(tokens)
    assert (arr >= 0).all() and (arr < cfg.opt.vocab_size).all()
    print(f"acceptance: {acc:.2f} tokens/row/forward "
          f"({emitted} tokens over {iters} forwards, B={b})", flush=True)
    print(f"speculative sampling speedup: {t_plain / t_spec:.2f}x", flush=True)


if __name__ == "__main__":
    main()
