#!/usr/bin/env python
"""Fast-mode token agreement vs exact bf16 on TRAINED 350M weights.

VERDICT r2 next #5: int8-KV / w8a8 / bf16-lookahead agreement was only
characterized at the extremes (random weights = tie-maximizing worst
case; grammar-trained small model in f32 = byte-identical). This probe
measures the production-proxy point: the grammar-trained 350M in bf16
(cache from bench.py / synthetic_grammar, trained on first use).

Run on TPU (single-tenant — nothing else on the chip):
  python tools/trained_agreement_probe.py [window]
Each variant costs one remote compile (2-10 min); results feed the
PERF.md fast-mode table.
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
    on_tpu = jax.default_backend() == "tpu"
    attn = "pallas" if on_tpu else "xla"

    pcj = jnp.asarray(held_pc, jnp.bfloat16)
    pf = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pcj)
    cond = ma.process_point_feature(params, cfg, pf)

    def gen(attn_mode, lookahead=0, wq=False):
        if lookahead:
            fn = jax.jit(lambda p, c: generate_lookahead(
                p, cfg.opt, c, max_new_tokens=cfg.generate_length,
                window=lookahead, bucket=512, attn=attn_mode, wq=wq))
        else:
            fn = jax.jit(lambda p, c: sopt.generate(
                p, cfg.opt, c, max_new_tokens=cfg.generate_length,
                bucket=512, attn=attn_mode, wq=wq))
        t0 = time.time()
        out = np.asarray(fn(params["opt"], cond))
        print(f"  ({time.time() - t0:.0f}s incl. compile)", flush=True)
        return out

    print("exact bf16 plain greedy...", flush=True)
    exact = gen(attn)

    def agreement(stream):
        agree, total = 0, 0
        for row in range(exact.shape[0]):
            eos = np.where(exact[row] == cfg.opt.eos_token_id)[0]
            limit = (eos[0] + 1) if len(eos) else exact.shape[1]
            agree += int((stream[row, :limit] == exact[row, :limit]).sum())
            total += int(limit)
        return agree / max(total, 1), total

    rows = []
    for label, kwargs in (
        ("int8 KV", {"attn_mode": "pallas_int8" if on_tpu else "xla"}),
        ("int4 KV", {"attn_mode": "pallas_int4" if on_tpu else "xla"}),
        (f"int4+la{window}", {"attn_mode": "pallas_int4" if on_tpu else "xla",
                              "lookahead": window}),
        ("w8a8", {"attn_mode": attn, "wq": True}),
        (f"bf16 lookahead W={window}", {"attn_mode": attn, "lookahead": window}),
        (f"w8a8+int8+la{window}", {"attn_mode": "pallas_int8" if on_tpu else "xla",
                                   "lookahead": window, "wq": True}),
    ):
        print(f"{label}...", flush=True)
        stream = gen(**kwargs)
        ag, total = agreement(stream)
        rows.append((label, ag, total))
        print(f"  agreement {ag:.4f} over {total} exact tokens", flush=True)

    print("\nPERF.md table (trained 350M bf16, held-out grammar conditions):")
    for label, ag, total in rows:
        print(f"| {label} | {ag:.4f} | {total} tokens |")


if __name__ == "__main__":
    main()
