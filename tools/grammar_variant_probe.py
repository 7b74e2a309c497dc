"""Train + measure a grammar VARIANT's natural lookahead acceptance
(VERDICT r4 #7 — the measured low band).

Variants:
  noisy — per-vertex coordinate jitter + refreshed batches. MEASURED r5:
          FAILED to lower acceptance (7.904/8): the point-cloud
          condition fully determines every coordinate, so greedy argmax
          is condition-driven and stable under stale in-window context
          regardless of data entropy.
  chain — heights follow a fixed pseudo-random permutation orbit that
          exists ONLY in the token stream (the condition is a flat
          plane). MEASURED r5: FAILED (7.904) — a single global
          permutation is composable; the 350M memorizes PERM^n and
          predicts window positions from pre-window context. (CPU
          prototype, too small to memoize: 4.31.)
  chainrand — per-mesh random permutation (unlearnable in principle).
          MEASURED r5: FAILED too (7.904) — the trained conditional is
          ~flat and its argmax is a constant marginal mode, equally
          Jacobi-stable. Full negative-result analysis: PERF.md r5
          "natural lookahead acceptance bands".

Trains (or loads the cached) variant 350M, then reports natural
acceptance, agreement vs its own plain greedy, and wall-clock speedup.
The params cache this writes is what bench.py's natural-low-band row
loads.

Run (exclusive TPU): python -m tools.grammar_variant_probe [variant] [window]
"""
import sys


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "chain"
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from meshanything_tpu.runtime.compile_cache import enable as enable_cache
    from meshanything_tpu.training.synthetic_grammar import (
        TrainedLookaheadProbe,
    )

    enable_cache()
    probe = TrainedLookaheadProbe(window=window, bucket=512, variant=variant)
    st = probe.run()
    print(f"RESULT {variant} W={window}: acceptance {st['acceptance']:.3f} "
          f"agreement {st['agreement']:.4f} speedup {st['speedup']:.2f}x "
          f"plain {st['t_plain']:.3f}s look {st['t_look']:.3f}s "
          f"over {st['plain_tokens']} tokens", flush=True)


if __name__ == "__main__":
    main()
