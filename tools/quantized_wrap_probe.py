"""On-chip wrap-boundary check for the QUANTIZED pipelined decode
kernel (the shipping int8/int4 plain-decode path, shape_opt.py:388).

The bf16 probe showed the pipelined kernel's single strided 2-plane
DMA reads V from the wrong address once the K->V plane stride reaches
~2^31..2^32 bytes. The quantized tiers ship pipelined=True, and their
production configs cross that line too (int8 B>=12 at 7680 ctx: plane
3.02 GiB; int4 B=64: 6.04 GiB). This probe compares grid-per-row vs
pipelined-fused vs pipelined-split at exactly those strides to (a) pin
the wrap boundary and (b) prove the split_planes auto-fix restores
bit-identity.

Run (exclusive TPU): python -m tools._dbg_pipe_q
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from meshanything_tpu.ops.decode_attention import (
    decode_attention_int4_impl,
    decode_attention_int8_impl,
)
from meshanything_tpu.ops.kvcache import quantize_rows, quantize_rows_int4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def check(name, impl, qrows, B, bits):
    H, D, L, S = 16, 64, 24, 7680
    cur = 1500

    @jax.jit
    def mk(key):
        kv = jax.random.normal(key, (2, L, B, S, H * D), jnp.bfloat16) * 0.3
        return qrows(kv)

    values, scales = mk(jax.random.PRNGKey(0))
    q = jax.jit(lambda k: jax.random.normal(
        k, (B, H, D), jnp.bfloat16))(jax.random.PRNGKey(1))
    plane = values.nbytes // 2
    log(f"{name}: values {values.nbytes / 2**30:.2f} GiB, "
        f"plane stride {plane / 2**30:.2f} GiB "
        f"({'>=2^32' if plane >= 2**32 else '>=2^31' if plane >= 2**31 else '<2^31'})")

    def run(**kw):
        f = jax.jit(lambda q, v, s, l, c: impl(q, v, s, l, c, chunk=512, **kw))
        return jax.device_get(
            f(q, values, scales, jnp.int32(3), jnp.int32(cur))
        ).astype(np.float32)

    a = run()  # grid-per-row (per-plane copies, trusted)
    bf = run(pipelined=True, split_planes=False)
    bs = run(pipelined=True, split_planes=True)
    log(f"{name}: grid-vs-fused {np.abs(a - bf).max():.6f}  "
        f"grid-vs-split {np.abs(a - bs).max():.6f}")
    del values, scales, q
    return np.abs(a - bf).max(), np.abs(a - bs).max()


def main():
    log(f"devices: {jax.devices()}")
    r = {}
    # int8 B=8: plane 1.51 GiB < 2^31 — control point (should match)
    r["int8_B8"] = check("int8 B=8 (1.5 GiB plane)", decode_attention_int8_impl,
                         quantize_rows, 8, 8)
    # int8 B=16: plane 3.02 GiB — between 2^31 and 2^32
    r["int8_B16"] = check("int8 B=16 (3.0 GiB plane)", decode_attention_int8_impl,
                          quantize_rows, 16, 8)
    # int4 B=64: plane 6.04 GiB — above 2^32 (shipping max config)
    r["int4_B64"] = check("int4 B=64 (6.0 GiB plane)", decode_attention_int4_impl,
                          quantize_rows_int4, 64, 4)
    for k, (fused, split) in r.items():
        print(f"RESULT {k}: fused {fused:.6f} split {split:.6f}", flush=True)
    print("DBGQ-OK")


if __name__ == "__main__":
    main()
