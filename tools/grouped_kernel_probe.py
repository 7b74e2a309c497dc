#!/usr/bin/env python
"""A/B the grouped (head-pair) matmul layout against the flat
block-diagonal layout in the single-query int4 kernel at production
shapes (VERDICT r3 #4: int4 plain decode is compute-bound at ~60% of
its byte floor — the H× FLOP inflation hits the matmul roofline once
the stream is quartered). In-loop amortized sweep per bwprobe
methodology; B matches the production batch so the (B,)-grid overhead
is represented.

Run (exclusive TPU): python -m tools.grouped_kernel_probe [B] [ctx]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_int4_impl,
        decode_attention_reference,
    )
    from meshanything_tpu.ops.kvcache import quantize_rows_int4, unpack_int4

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cur = int(sys.argv[2]) if len(sys.argv) > 2 else 7168
    H, D, L = 16, 64, 4   # 4 layers is enough to defeat any cache locality
    S = -(-(cur + 1) // 512) * 512
    rng = np.random.default_rng(0)
    log(f"devices: {jax.devices()}  B={B} ctx={cur}")

    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    values, scales = quantize_rows_int4(kv)
    scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))

    # numeric check of the grouped path at full shape first
    dequant = (unpack_int4(values).astype(jnp.float32) * scales).astype(jnp.bfloat16)
    out_g = jax.device_get(jax.jit(
        lambda q, v, s: decode_attention_int4_impl(q, v, s, 1, cur, grouped=True)
    )(q, values, scales_t))
    ref = jax.device_get(decode_attention_reference(q[:1], dequant[:, :, :1], 1, cur))
    err = np.abs(out_g[:1].astype(np.float32) - ref.astype(np.float32)).max() / (
        np.abs(ref.astype(np.float32)).max() + 1e-9)
    log(f"grouped single-query rel err vs dequant reference: {err:.2e}")
    assert err < 3e-2, err

    n_iter = 600
    results = {}
    for name, kw in (("flat", {}), ("grouped", {"grouped": True}),
                     ("mm_s8", {"mm_s8": True}),
                     ("fused_dma", {"fused_dma": True}),
                     ("pipelined", {"pipelined": True})):
        @jax.jit
        def sweep(q, v, s, _kw=kw):
            def body(i, acc):
                o = decode_attention_int4_impl(q, v, s, i % L, cur, **_kw)
                return acc + o.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

        jax.device_get(sweep(q, values, scales_t))  # compile+warm
        t0 = time.time()
        jax.device_get(sweep(q, values, scales_t))
        dt = time.time() - t0
        per_call = dt / n_iter * 1e6
        results[name] = per_call
        bytes_per = B * (2 * cur * (H * D // 2) + 2 * cur * 4)
        log(f"{name}: {per_call:.0f} us/call ({n_iter * bytes_per / dt / 1e9:.0f} "
            f"GB/s packed)")
    for k in results:
        if k != "flat":
            log(f"{k} speedup vs flat: {results['flat'] / results[k]:.2f}x")
    print("GROUPED-PROBE-OK")


if __name__ == "__main__":
    main()
