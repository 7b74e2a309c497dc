#!/usr/bin/env python
"""A/B the int4 BYTE-PLANE packing (int32 words, 8 lane-aligned unpack
chains on D//8 elements each, no int8->int32 relayout) against the
legacy nibble-pair packing (int8, the measured VPU-unpack residual of
the r4 kernel — PERF.md r4) on the real kernels at production shapes.

Covers the three int4 consumers: flat single-query, pipelined
single-query (the shipping shape_opt default), and the W=8 windowed MQ
lookahead kernel. In-loop amortized fori_loop sweep per the bwprobe
methodology; numeric agreement between packings is asserted first
(pure layout change — tests/test_ops.py proves bit-identity in
interpret mode; this re-checks on-chip compiled output).

Run (exclusive TPU): python -m tools.int4_plane_probe [B] [ctx]
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
        decode_attention_mq_int4_impl,
    )
    from meshanything_tpu.ops.kvcache import quantize_rows_int4

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cur = int(sys.argv[2]) if len(sys.argv) > 2 else 7168
    W = 8
    H, D, L = 16, 64, 4   # 4 layers defeats any cache locality
    S = -(-(cur + 1 + W) // 512) * 512
    rng = np.random.default_rng(0)
    log(f"devices: {jax.devices()}  B={B} ctx={cur}")

    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    qw = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32)).astype(jnp.bfloat16)
    wk = jnp.asarray(rng.normal(size=(B, W, H * D)).astype(np.float32) * 0.3)
    wv = wk * 0.7
    base = jnp.full((B,), cur, jnp.int32)

    n_iter = 600
    packs = {}
    for packing in ("nibble", "plane"):
        values, scales = quantize_rows_int4(kv, packing=packing)
        scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))
        wkq, wks = quantize_rows_int4(wk, packing=packing)
        wvq, wvs = quantize_rows_int4(wv, packing=packing)
        win = dict(win_kv=(wkq, wvq),
                   win_scales=(jnp.transpose(wks, (0, 2, 1)),
                               jnp.transpose(wvs, (0, 2, 1))))
        packs[packing] = (values, scales_t, win)

    # Compile budget note: each jit below is a multi-minute remote
    # compile when cold (PERF.md r3) — the probe sticks to the two
    # SHIPPING kernels (pipelined single-query, windowed MQ) and checks
    # on-chip packing identity from the sweeps' own first outputs.
    # arrays are jit ARGUMENTS, never closure constants: captured
    # multi-GB operands ship through the remote compile service and it
    # rejects the body with HTTP 413 (same lesson as runtime/bwprobe.py)
    def sweep_single(q, v, s):
        def body(i, acc):
            o = decode_attention_int4_impl(q, v, s, i % L, cur, pipelined=True)
            return acc + o.astype(jnp.float32).sum()
        total = jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))
        return total, decode_attention_int4_impl(q, v, s, 1, cur, pipelined=True)

    def sweep_mq(qw, v, s, wk_q, wv_q, wk_s, wv_s):
        def call(i):
            return decode_attention_mq_int4_impl(
                qw, v, s, i % L, base, win_kv=(wk_q, wv_q),
                win_scales=(wk_s, wv_s))

        def body(i, acc):
            return acc + call(i).astype(jnp.float32).sum()
        total = jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))
        return total, call(1)

    jit_single = jax.jit(sweep_single)
    jit_mq = jax.jit(sweep_mq)

    results = {}
    first_out = {}
    for packing, (v, s, win) in packs.items():
        for name in ("pipelined", "mq_w8"):
            if name == "pipelined":
                args = (q, v, s)
                fn = jit_single
            else:
                args = (qw, v, s, win["win_kv"][0], win["win_kv"][1],
                        win["win_scales"][0], win["win_scales"][1])
                fn = jit_mq
            jax.device_get(fn(*args))  # compile + warm
            t0 = time.time()
            _, out1 = jax.device_get(fn(*args))
            dt = time.time() - t0
            first_out[(packing, name)] = np.asarray(out1, np.float32)
            per_call = dt / n_iter * 1e6
            results[(packing, name)] = per_call
            bytes_per = B * (2 * cur * (H * D // 2) + 2 * cur * 4)
            log(f"{packing:7s} {name:10s}: {per_call:6.0f} us/call "
                f"({n_iter * bytes_per / dt / 1e9:.0f} GB/s packed)")
    for name in ("pipelined", "mq_w8"):
        a, b = first_out[("nibble", name)], first_out[("plane", name)]
        same = np.array_equal(a, b)
        log(f"{name}: on-chip packing identity "
            f"{'bit-exact' if same else f'MAX ABS {np.abs(a - b).max():.3e}'}")
        assert same or np.abs(a - b).max() < 1e-2
        r = results[("nibble", name)] / results[("plane", name)]
        log(f"{name}: plane speedup vs nibble {r:.2f}x")
    print("PLANE-PROBE-OK")


if __name__ == "__main__":
    main()
