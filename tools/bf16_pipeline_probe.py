"""TPU probe: exact-bf16 decode kernel — grid-per-row vs continuous
pipeline (VERDICT r4 #3 follow-through).

The r4 pipelined kernel (one flattened (row, chunk) DMA schedule,
fixed per-row prologue stall paid once per call instead of B times)
was only wired for the quantized tiers. This probe A/Bs it for the
bf16 cache at the headline shape (B=16, ctx 7168) and sweeps
chunk/depth.

(History: this probe originally chased a "1054 GB/s wire rate" from
dma_wire_probe — RETRACTED, the wire probe's timing loop was
loop-invariant and XLA hoisted the transfer out; see PERF.md r5
"take 2". Verdict from the full sweep here: grid->pipelined is the one
real win (681 -> 659-662 us); chunk 256/512/1024, depth 2-6 and
pv_bf16 are all washes; 709-713 GB/s = 87% of the 819 GB/s v5e spec is
this pattern's practical ceiling.)

Run (exclusive TPU): python -m tools.bf16_pipeline_probe
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from meshanything_tpu.ops.decode_attention import decode_attention_impl

    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    log(f"devices: {jax.devices()}")
    B, H, D, L = 16, 16, 64, 24
    S = 7680
    cur = 7168

    # generate the cache ON DEVICE in bf16: a host-side f32 normal at
    # this shape is 24 GB (minutes of host RNG + a tunnel transfer that
    # lands an over-HBM f32 buffer before the bf16 cast)
    kv = jax.jit(lambda k: jax.random.normal(
        k, (2, L, B, S, H * D), jnp.bfloat16) * 0.3)(jax.random.PRNGKey(0))
    q = jax.jit(lambda k: jax.random.normal(
        k, (B, H, D), jnp.bfloat16))(jax.random.PRNGKey(1))
    jax.device_get(q)
    log(f"cache: {kv.nbytes / 2**30:.2f} GiB (device-generated)")

    # numeric check: pipelined vs grid on-chip at a mixed context
    small = 1500
    a = jax.device_get(jax.jit(functools.partial(
        decode_attention_impl, chunk=512))(q, kv, 3, small)).astype(np.float32)
    b = jax.device_get(jax.jit(functools.partial(
        decode_attention_impl, chunk=512, pipelined=True))(
            q, kv, 3, small)).astype(np.float32)
    md = np.abs(a - b).max()
    log(f"grid vs pipelined max abs diff @cur={small}: {md:.3e}")
    assert md == 0.0, md

    n_iter = 800
    bytes_per = 2 * cur * H * D * 2 * B  # K+V bf16, all rows

    def bench(label, **kw):
        @jax.jit
        def sweep(q, kv):
            def body(i, acc):
                o = decode_attention_impl(q, kv, i % L, cur, **kw)
                return acc + o.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

        jax.device_get(sweep(q, kv))  # compile+warm
        t0 = time.time()
        jax.device_get(sweep(q, kv))
        dt = time.time() - t0
        gbs = n_iter * bytes_per / dt / 1e9
        log(f"{label:36s}: {dt / n_iter * 1e6:7.0f} us/call  {gbs:6.0f} GB/s")
        return gbs

    if mode == "full":
        bench("grid chunk=512 (shipping)", chunk=512)
        bench("pipelined chunk=512", chunk=512, pipelined=True)
        bench("pipelined chunk=1024", chunk=1024, pipelined=True)
        bench("pipelined chunk=256", chunk=256, pipelined=True)

        # pv_bf16: the flash-attn-2 bf16-P contract — is the residual
        # over the 1054 GB/s wire rate the f32 PV decomposition?
        # MEASURED r5: no — 664 vs 662 us, a wash (bit-identical out).
        c = jax.device_get(jax.jit(functools.partial(
            decode_attention_impl, chunk=512, pipelined=True, pv_bf16=True))(
                q, kv, 3, small)).astype(np.float32)
        md = np.abs(a - c).max()
        rel = (np.abs(a - c) / (np.abs(a) + 1e-6)).max()
        log(f"f32-P vs bf16-P max abs diff @cur={small}: {md:.3e} (rel {rel:.3e})")
        bench("pipelined pv_bf16 chunk=512", chunk=512, pipelined=True,
              pv_bf16=True)
        bench("pipelined pv_bf16 chunk=1024", chunk=1024, pipelined=True,
              pv_bf16=True)
        bench("grid pv_bf16 chunk=512", chunk=512, pv_bf16=True)
    elif mode == "depth":
        # residual hunt, part 2: with pv_bf16 a wash, is the ~1 us/chunk
        # residual an overlap-depth problem (DMA completion jitter the
        # 2-slot pipeline can't ride out)?
        d3 = jax.device_get(jax.jit(functools.partial(
            decode_attention_impl, chunk=512, pipelined=True, depth=3))(
                q, kv, 3, small)).astype(np.float32)
        md = np.abs(a - d3).max()
        log(f"depth=2 vs depth=3 max abs diff @cur={small}: {md:.3e}")
        assert md == 0.0, md
        bench("pipelined depth=2 (baseline)", chunk=512, pipelined=True)
        bench("pipelined depth=3", chunk=512, pipelined=True, depth=3)
        bench("pipelined depth=4", chunk=512, pipelined=True, depth=4)
        bench("pipelined depth=3 chunk=256", chunk=256, pipelined=True,
              depth=3)
        bench("pipelined depth=4 chunk=256", chunk=256, pipelined=True,
              depth=4)
        bench("pipelined depth=6 chunk=256", chunk=256, pipelined=True,
              depth=6)
    print("BF16-PIPELINE-PROBE-OK")


if __name__ == "__main__":
    main()
