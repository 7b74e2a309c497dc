"""CPU prototype for the chain grammar (VERDICT r4 #7, 2nd attempt).

Trains the SMALL test config on the chain grammar (heights = fixed
permutation orbit, flat-plane condition) and measures natural Jacobi
acceptance on held-out conditions — validates that the chain design
actually lowers acceptance below the saturated ~7.9/8 regime before we
pay the ~10 min 350M TPU train.

Run: python -m tools.chain_grammar_proto [steps] [fixed|rand]

rand uses a per-mesh permutation (chain="rand") — the 350M-proof
variant (the fixed global orbit is composable: the big model memorizes
PERM^n and predicts window positions from pre-window context, measured
7.904 acceptance, PERF.md r5).
"""
import dataclasses
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    chain = "rand" if len(sys.argv) > 2 and sys.argv[2] == "rand" else True
    from meshanything_tpu.config import small_test_config
    from meshanything_tpu.training.synthetic_grammar import (
        make_grammar_batch,
        measure_lookahead_acceptance,
        train_on_grammar,
    )

    base = small_test_config(n_max_triangles=40)
    cfg = dataclasses.replace(
        base, opt=dataclasses.replace(base.opt, vocab_size=67, codebook_size=64)
    )
    params, loss = train_on_grammar(
        cfg, steps=steps, batch=8, k=5, lr=3e-3, refresh_every=25,
        mask_padding=True, chain=chain, verbose=True)
    print(f"final loss {loss:.4f}", flush=True)

    pc, _, _ = make_grammar_batch(cfg, np.random.default_rng(99), 2, k=5,
                                  chain=chain)
    for w in (8, 16):
        stats = measure_lookahead_acceptance(params, cfg, pc, window=w,
                                             bucket=32)
        print(f"W={w}: acceptance {stats['acceptance']:.2f} "
              f"agreement {stats['agreement']:.4f} "
              f"({stats['plain_tokens']} plain tokens)", flush=True)


if __name__ == "__main__":
    main()
