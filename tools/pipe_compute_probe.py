"""Decompose the pipelined bf16 decode kernel's per-chunk cost.

r5 measured, in order:
  1. tap mode (same machinery, compute replaced by a 1-element tap)
     runs AT the full kernel's 662-667 us — compute is fully hidden;
     the kernel is DMA/machinery-bound.
  2. The machinery cuts are a WASH: tap_unisched 657, tap_flat 658,
     full_min 658 vs full 659 us (full_min asserted bit-identical to
     full on-chip). Neither the per-row cdiv schedule nor the 4D
     address arithmetic costs anything measurable.
  3. The "1054/1900 GB/s wire rate" this probe originally chased was
     RETRACTED: the wire probe's timing loop was loop-invariant and
     XLA hoisted the transfer out (PERF.md r5 take 2). An honest
     (i-dependent) depth-2 wire loop sustains 481 GB/s — the shipping
     kernel's 709 GB/s is already ABOVE the naive wire loop because it
     keeps 4 DMAs in flight. v5e spec is 819 GB/s; the kernel sits at
     ~87% of spec.

The compute modes localize nothing (all ~equal); the machinery modes
bisect scalar/VPU overhead vs the wire loop:

  full       — the shipping kernel body (sanity: ~662 us/call)
  tap        — full machinery, 1-element tap compute (~666 us)
  qk/pv/softmax — partial compute under full machinery
  tap_unisched — tap + UNIFORM schedule: nchunks computed once into a
               register (no per-step SMEM loads / cdiv; adv = 2 selects
               on registers); valid for the exact tier where cur_len is
               a broadcast scalar
  tap_nocarry — tap + minimal while-loop carry (no (rows,*) wheres /
               broadcasts / per-row o stores)
  tap_flat   — tap + 2D flattened HBM addressing (one scalar offset per
               descriptor instead of 4D .at[plane, layer, r, span])
  tap_min    — all three machinery cuts combined (target: ~250 us)
  full_min   — the real compute on the tap_min machinery (what the
               shipping kernel could be for uniform base)

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
            chunk, scale, depth, batch, mode, seqlen, nlayers):
    layer = layer_ref[0]
    rows = o_ref.shape[1]
    unisched = mode in ("tap_unisched", "tap_min", "full_min")
    nocarry = mode in ("tap_nocarry", "tap_min")
    flat = mode in ("tap_flat", "tap_min", "full_min")

    nc_uni = pl.cdiv(base_ref[0] + 1, chunk)  # registered once

    def nchunks(r):
        if unisched:
            return nc_uni
        rr = jnp.minimum(r, batch - 1)
        return pl.cdiv(base_ref[rr] + 1, chunk)

    def adv(r, c):
        c2 = c + 1
        wrap = c2 >= nchunks(r)
        return jnp.where(wrap, r + 1, r), jnp.where(wrap, 0, c2)

    plane_stride = nlayers * batch * seqlen  # rows between K and V planes

    def copies(slot, r, c):
        if flat:
            off = (layer * batch + r) * seqlen + c * chunk
            return [
                pltpu.make_async_copy(kv_hbm.at[pl.ds(off, chunk)],
                                      kv_buf.at[slot, 0], sem.at[slot, 0]),
                pltpu.make_async_copy(kv_hbm.at[pl.ds(off + plane_stride, chunk)],
                                      kv_buf.at[slot, 1], sem.at[slot, 0]),
            ]
        span = pl.ds(c * chunk, chunk)
        return [
            pltpu.make_async_copy(kv_hbm.at[0, layer, r, span],
                                  kv_buf.at[slot, 0], sem.at[slot, 0]),
            pltpu.make_async_copy(kv_hbm.at[1, layer, r, span],
                                  kv_buf.at[slot, 1], sem.at[slot, 0]),
        ]

    def issue(slot, r, c):
        for cp in copies(slot, r, c):
            cp.start()

    def wait(slot, r, c):
        for cp in copies(slot, r, c):
            cp.wait()

    if unisched:
        total = batch * nc_uni
    else:
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

    if nocarry:
        # minimal carry: scalars + one (1, <=128) accumulator; no
        # per-row resets/wheres/stores — isolates the carry cost
        w = min(128, kv_buf.shape[-1])

        def body_nc(t, st):
            r, c, ri, ci, acc = st
            slot = t % depth

            @pl.when(t + depth - 1 < total)
            def _():
                issue((t + depth - 1) % depth, ri, ci)

            ri2, ci2 = adv(ri, ci)
            wait(slot, r, c)
            acc = (acc + kv_buf[slot, 0][0:1, :w].astype(jnp.float32)
                   + kv_buf[slot, 1][0:1, :w].astype(jnp.float32))
            r2, c2 = adv(r, c)
            return (r2, c2, ri2, ci2, acc)

        z = jnp.zeros((), jnp.int32)
        st = jax.lax.fori_loop(0, total, body_nc,
                               (z, z, ri0, ci0,
                                jnp.zeros((1, w), jnp.float32)))
        # Mosaic can't broadcast (1,1) in both dims at once: sublane-
        # broadcast via an add first, then lane-broadcast the column.
        rows_full = st[4] + jnp.zeros((o_ref.shape[1], w), jnp.float32)
        o_ref[0] = jnp.broadcast_to(rows_full[:, :1],
                                    o_ref.shape[1:]).astype(o_ref.dtype)
        return

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
        if mode in ("tap", "tap_unisched", "tap_flat"):
            acc_new = (acc + k[0:1, :].astype(jnp.float32)
                       + v[0:1, :].astype(jnp.float32))
            m_new, l_new = m_prev, l_prev
        else:
            if mode in ("full", "full_min", "qk"):
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


def build(q, kv, layer, cur_len, *, chunk, mode, depth=2, interpret=False):
    b, h, d = q.shape
    hd = h * d
    scale = 1.0 / np.sqrt(d)
    base = jnp.broadcast_to(jnp.asarray(cur_len, jnp.int32) - 1, (b,))
    eye = jnp.eye(h, dtype=q.dtype)
    qmat = jnp.einsum("ij,bjd->bijd", eye, q).reshape(b, h, hd)
    _, nlayers, _, seqlen, _ = kv.shape
    if mode in ("tap_flat", "tap_min", "full_min"):
        kv = kv.reshape(-1, hd)  # free view: same HBM layout
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
                               batch=b, mode=mode, seqlen=seqlen,
                               nlayers=nlayers)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base, jnp.asarray(layer, jnp.int32).reshape(1), qmat, kv)


def main():
    modes = sys.argv[1:] or ["tap", "tap_unisched", "tap_nocarry", "tap_flat",
                             "tap_min", "full_min", "full"]
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
    if "full_min" in modes:
        # full_min must be numerically identical to full (same compute,
        # cheaper machinery) — uniform base makes unisched exact.
        # JIT both: the flat modes reshape kv and an UN-jitted reshape
        # of the concrete 11.25 GiB cache materializes a copy (22.5 GiB
        # -> ResourceExhausted); inside jit it is a free bitcast.
        def _run(mode):
            f = jax.jit(functools.partial(build, chunk=512, mode=mode))
            return jax.device_get(f(q, kv, 3, cur))

        a = _run("full")
        bmin = _run("full_min")
        md = np.abs(a.astype(np.float32) - bmin.astype(np.float32)).max()
        log(f"full vs full_min max abs diff: {md:.3e}")
        assert md == 0.0, md
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
