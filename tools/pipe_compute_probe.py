"""Decompose the pipelined bf16 decode kernel's per-chunk compute.

r5 established: the kernel moves bytes at 709 GB/s while the identical
DMA schedule with compute replaced by a tap sustains 1054 GB/s
(tools/dma_wire_probe), and the residual is a WASH under chunk size
(256-1024), pipeline depth (2-6) and PV matmul dtype (pv_bf16) — i.e.
the pipeline is COMPUTE-THROUGHPUT-bound: per-chunk compute (~3.0 us at
chunk=512) exceeds per-chunk DMA (~2.0 us) and the DMA hides behind it.

This probe carries a tools-local copy of the kernel body whose compute
stage is selectable, to localize the 3 us:

  full     — the shipping compute (sanity: ~662 us/call)
  tap      — wait + 1-element tap (sanity: ~wire rate)
  qk       — QK matmul + mask + max only
  pv       — PV matmul + acc only (constant P)
  softmax  — mask/exp/stat chain only (constant logits)

Run (exclusive TPU): python -m tools.pipe_compute_probe [modes...]
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(base_ref, layer_ref, qmat_ref, kv_hbm, o_ref, kv_buf, sem, *,
            chunk, scale, depth, batch, mode):
    layer = layer_ref[0]
    rows = o_ref.shape[1]

    def nchunks(r):
        rr = jnp.minimum(r, batch - 1)
        return pl.cdiv(base_ref[rr] + 1, chunk)

    def adv(r, c):
        c2 = c + 1
        wrap = c2 >= nchunks(r)
        return jnp.where(wrap, r + 1, r), jnp.where(wrap, 0, c2)

    def issue(slot, r, c):
        span = pl.ds(c * chunk, chunk)
        pltpu.make_async_copy(kv_hbm.at[0, layer, r, span], kv_buf.at[slot, 0],
                              sem.at[slot, 0]).start()
        pltpu.make_async_copy(kv_hbm.at[1, layer, r, span], kv_buf.at[slot, 1],
                              sem.at[slot, 0]).start()

    def wait(slot, r, c):
        span = pl.ds(c * chunk, chunk)
        pltpu.make_async_copy(kv_hbm.at[0, layer, r, span], kv_buf.at[slot, 0],
                              sem.at[slot, 0]).wait()
        pltpu.make_async_copy(kv_hbm.at[1, layer, r, span], kv_buf.at[slot, 1],
                              sem.at[slot, 0]).wait()

    total = jax.lax.fori_loop(
        0, batch, lambda r, a: a + nchunks(r), jnp.zeros((), jnp.int32))

    def pro(i, rc):
        r, c = rc

        @pl.when(i < total)
        def _():
            issue(i % depth, r, c)

        return adv(r, c)

    ri0, ci0 = jax.lax.fori_loop(
        0, depth - 1, pro, (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)))

    neg = jnp.full((rows, 128), NEG_INF, jnp.float32)
    zstat = jnp.zeros((rows, 128), jnp.float32)
    zacc = jnp.zeros((rows, o_ref.shape[2]), jnp.float32)

    def body(carry):
        t, r, c, ri, ci, acc, m_prev, l_prev = carry
        slot = t % depth

        @pl.when(t + depth - 1 < total)
        def _():
            issue((t + depth - 1) % depth, ri, ci)

        ri2, ci2 = adv(ri, ci)
        wait(slot, r, c)

        k = kv_buf[slot, 0]
        v = kv_buf[slot, 1]
        qmat_r = qmat_ref[r]

        # taps below broadcast along ONE axis only (sublane OR lane):
        # Mosaic cannot broadcast a (1,1) in both dims at once
        if mode == "tap":
            acc_new = (acc + k[0:1, :].astype(jnp.float32)
                       + v[0:1, :].astype(jnp.float32))
            m_new, l_new = m_prev, l_prev
        else:
            if mode in ("full", "qk"):
                logits = jax.lax.dot_general(
                    qmat_r, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                span = c * chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (rows, chunk), 1)
                logits = jnp.where(span < base_ref[r] + 1, logits, NEG_INF)
            else:
                # constant logits that still touch k so the DMA isn't dead
                logits = (jnp.full((rows, chunk), -1.0, jnp.float32)
                          + k[0:1, :chunk].astype(jnp.float32))
            if mode == "qk":
                m_cur = jnp.max(logits, axis=-1, keepdims=True)
                acc_new = acc + m_cur + v[0:1, :].astype(jnp.float32)
                m_new, l_new = m_prev, l_prev
            else:
                m_cur = jnp.max(logits, axis=-1, keepdims=True)
                m_new = jnp.maximum(m_prev[:, :1], m_cur)
                p = jnp.exp(logits - m_new)
                corr = jnp.exp(m_prev[:, :1] - m_new)
                l_new = corr * l_prev[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
                if mode == "softmax":
                    acc_new = acc * corr + p[:, :1] + v[0:1, :].astype(jnp.float32)
                else:  # full / pv
                    pv = jnp.dot(p, v.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                    acc_new = acc * corr + pv
                m_new = jnp.broadcast_to(m_new, (rows, 128))
                l_new = jnp.broadcast_to(l_new, (rows, 128))

        last = c + 1 >= nchunks(r)

        @pl.when(last)
        def _():
            o_ref[r] = (acc_new[:, :o_ref.shape[2]]).astype(o_ref.dtype)

        keep = ~last
        acc2 = jnp.where(keep, acc_new, zacc)
        m2 = jnp.where(keep, jnp.broadcast_to(m_new[:, :1], (rows, 128))
                       if m_new.shape != (rows, 128) else m_new, neg)
        l2 = jnp.where(keep, jnp.broadcast_to(l_new[:, :1], (rows, 128))
                       if l_new.shape != (rows, 128) else l_new, zstat)
        r2, c2 = adv(r, c)
        return (t + 1, r2, c2, ri2, ci2, acc2, m2, l2)

    jax.lax.while_loop(lambda ca: ca[0] < total, body, (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32), ri0, ci0, zacc, neg, zstat))


def build(q, kv, layer, cur_len, *, chunk, mode, depth=2):
    b, h, d = q.shape
    hd = h * d
    scale = 1.0 / np.sqrt(d)
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))
    eye = jnp.eye(h, dtype=q.dtype)
    qmat = jnp.einsum("ij,bjd->bijd", eye, q).reshape(b, h, hd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, h, hd), lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((b, h, hd), lambda i, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, 2, chunk, hd), kv.dtype),
            pltpu.SemaphoreType.DMA((depth, 1)),
        ],
    )
    kernel = functools.partial(_kernel, chunk=chunk, scale=scale, depth=depth,
                               batch=b, mode=mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        grid_spec=grid_spec,
    )(base, jnp.asarray(layer, jnp.int32).reshape(1), qmat, kv)


def main():
    modes = sys.argv[1:] or ["tap", "qk", "softmax", "pv", "full"]
    log(f"devices: {jax.devices()}")
    B, H, D, L = 16, 16, 64, 24
    S, cur = 7680, 7168
    kv = jax.jit(lambda k: jax.random.normal(
        k, (2, L, B, S, H * D), jnp.bfloat16) * 0.3)(jax.random.PRNGKey(0))
    q = jax.jit(lambda k: jax.random.normal(
        k, (B, H, D), jnp.bfloat16))(jax.random.PRNGKey(1))
    jax.device_get(q)
    log(f"cache: {kv.nbytes / 2**30:.2f} GiB")

    n_iter = 800
    bytes_per = 2 * cur * H * D * 2 * B
    for mode in modes:
        @jax.jit
        def sweep(q, kv, mode=mode):
            def body(i, acc):
                o = build(q, kv, i % L, cur, chunk=512, mode=mode)
                return acc + o.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

        jax.device_get(sweep(q, kv))
        t0 = time.time()
        jax.device_get(sweep(q, kv))
        dt = time.time() - t0
        log(f"{mode:8s}: {dt / n_iter * 1e6:7.0f} us/call  "
            f"{n_iter * bytes_per / dt / 1e9:6.0f} GB/s")
    print("PIPE-COMPUTE-PROBE-OK")


if __name__ == "__main__":
    main()
