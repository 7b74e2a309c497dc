"""Train + measure the higher-entropy ("noisy") grammar variant
(VERDICT r4 #7): per-vertex coordinate jitter + refreshed batches make
coordinates unmemorizable, so the trained model's Jacobi acceptance is
a MEASUREMENT of mispredict-recovery dynamics instead of the fixed
probe's near-degenerate ~7.9/8 replay.

Trains (or loads the cached) noisy 350M, then reports natural W=8
acceptance, agreement vs its own plain greedy, and wall-clock speedup.
The params cache this writes is what bench.py's low-band row loads.

Run (exclusive TPU): python -m tools.noisy_grammar_probe [window]
"""
import sys


def main():
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from meshanything_tpu.runtime.compile_cache import enable as enable_cache
    from meshanything_tpu.training.synthetic_grammar import (
        TrainedLookaheadProbe,
    )

    enable_cache()
    probe = TrainedLookaheadProbe(window=window, bucket=512, variant="noisy")
    st = probe.run()
    print(f"RESULT noisy W={window}: acceptance {st['acceptance']:.3f} "
          f"agreement {st['agreement']:.4f} speedup {st['speedup']:.2f}x "
          f"plain {st['t_plain']:.3f}s look {st['t_look']:.3f}s "
          f"over {st['plain_tokens']} tokens", flush=True)


if __name__ == "__main__":
    main()
