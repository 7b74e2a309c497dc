"""TPU probe for the int4 flash-decode kernel: Mosaic compile, numeric
check vs the dequantized XLA reference, and a KV-sweep bandwidth figure
comparable to PERF.md's int8/bf16 rows.

Run (exclusive TPU): python -m tools.int4_kernel_probe
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
        decode_attention_reference,
    )
    from meshanything_tpu.ops.kvcache import quantize_rows_int4, unpack_int4

    log(f"devices: {jax.devices()}")
    B, H, D, L = 1, 16, 64, 24
    S = 7680
    rng = np.random.default_rng(0)

    kv = jnp.asarray(rng.normal(size=(2, L, B, S, H * D)).astype(np.float32) * 0.3)
    q = jnp.asarray(rng.normal(size=(B, H, D)).astype(np.float32))
    values, scales = quantize_rows_int4(kv)
    scales_t = jnp.transpose(scales, (0, 1, 2, 4, 3))
    dequant = unpack_int4(values).astype(jnp.float32) * scales

    # --- numeric check at full shape --------------------------------------
    cur = 7168
    fn = jax.jit(lambda q, v, s: decode_attention_int4_impl(q, v, s, 3, cur))
    t0 = time.time()
    out = jax.device_get(fn(q, values, scales_t))
    log(f"int4 single-query: compile+run {time.time() - t0:.1f}s")
    ref = jax.device_get(decode_attention_reference(q, dequant, 3, cur))
    err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    log(f"int4 single-query rel err vs dequant reference: {err:.2e}")
    assert err < 2e-2, err

    # --- mq variant --------------------------------------------------------
    W = 8
    qmq = jnp.asarray(rng.normal(size=(B, W, H, D)).astype(np.float32))
    base = jnp.full((B,), cur - W, jnp.int32)
    fn_mq = jax.jit(lambda q, v, s: decode_attention_mq_int4_impl(q, v, s, 3, base))
    t0 = time.time()
    out_mq = jax.device_get(fn_mq(qmq, values, scales_t))
    log(f"int4 mq W={W}: compile+run {time.time() - t0:.1f}s; "
        f"out finite: {np.isfinite(out_mq).all()}")

    # --- KV sweep bandwidth (in-loop amortized, bwprobe methodology) -------
    # one layer sweep reads S*(HD/2) bytes of packed K + V + 2*S*4 of scales
    n_iter = 3000

    @jax.jit
    def sweep(q, v, s):
        def body(i, acc):
            o = decode_attention_int4_impl(q, v, s, i % L, cur)
            return acc + o.sum()
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

    r = jax.device_get(sweep(q, values, scales_t))  # compile+warm
    t0 = time.time()
    r = jax.device_get(sweep(q, values, scales_t))
    dt = time.time() - t0
    bytes_per = 2 * cur * (H * D // 2) + 2 * cur * 4  # K+V packed + scales
    gbs = n_iter * bytes_per / dt / 1e9
    bf16_equiv = n_iter * (2 * cur * H * D * 2) / dt / 1e9
    log(f"int4 kernel KV sweep @ {cur} ctx: {dt:.2f}s for {n_iter} iters "
        f"-> {gbs:.0f} GB/s packed-stream rate "
        f"({bf16_equiv:.0f} GB/s bf16-equivalent)")
    log(f"per-call: {dt / n_iter * 1e6:.0f} us")
    print("INT4-PROBE-OK")


if __name__ == "__main__":
    main()
