#!/usr/bin/env python
"""Adjudicate the exact-tier bandwidth floor (VERDICT r4 #3): what does
this chip's HBM actually sustain?

The r4 record pins the bf16 decode headline at "95% of 679 GB/s" — but
679 GB/s is the decode KERNEL's own measured rate, and the int8
diagnostic elsewhere quotes 613 GB/s. Neither is an independent wire
measurement. This probe measures sustained HBM read bandwidth two ways,
at the headline decode shapes, with no attention math in the way:

  1. xla_sum: jnp.sum over the full cache-sized buffer — XLA:TPU's own
     reduction pipeline, a known near-wire-rate baseline.
  2. pallas_stream: the decode kernel's exact DMA pattern (double-
     buffered chunked HBM->VMEM copies over a flattened (row, chunk)
     schedule, one program) with the per-chunk compute replaced by a
     single-element tap — pure transfer + pipeline machinery.

If pallas_stream lands near xla_sum and near the spec sheet, the 679
number is the platform and the headline is at its floor; if
pallas_stream beats 679 materially, the decode kernel is leaving
bandwidth on the table and the ≤3 s exact target is still live.

Run (exclusive TPU): python -m tools.dma_wire_probe [gib] [chunk]
"""
import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HD = 1024   # headline row width (16 heads x 64)


def _stream_kernel(hbm, o_ref, buf, sem, *, chunk, nchunks, depth):
    def copy(slot, c):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(c * chunk, chunk)], buf.at[slot], sem.at[slot])

    for i in range(depth - 1):
        copy(i, i).start()

    def body(c, acc):
        slot = c % depth

        @pl.when(c + depth - 1 < nchunks)
        def _():
            copy((c + depth - 1) % depth, c + depth - 1).start()

        copy(slot, c).wait()
        # single-element tap: forces the wait ordering, costs no
        # bandwidth-visible VPU time
        return acc + buf[slot][0, :1].astype(jnp.float32)

    acc = jax.lax.fori_loop(0, nchunks, body, jnp.zeros((1,), jnp.float32))
    o_ref[0] = acc


def pallas_stream(x2d: jax.Array, chunk: int, depth: int = 2) -> jax.Array:
    n, hd = x2d.shape
    assert n % chunk == 0, (n, chunk)
    nchunks = n // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, chunk, hd), x2d.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    kernel = functools.partial(_stream_kernel, chunk=chunk,
                               nchunks=nchunks, depth=depth)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid_spec=grid_spec,
    )(x2d)


def _stream_kernel_rot(start_ref, hbm, o_ref, buf, sem, *,
                       chunk, nchunks, depth, rot=True):
    """Rotated-start variant: the chunk schedule begins at start_ref[0]
    (mod nchunks), so the pallas_call is NOT loop-invariant inside the
    timing fori_loop. Same chunks, same bytes, same machinery — only
    the (data-independent) visit order rotates. A/Bs whether the
    invariant probe's rate was inflated by XLA hoisting the call out
    of the timing loop (v5e HBM is spec'd 819 GB/s; the invariant
    probe reported 1054, which is physically impossible sustained).

    Two sub-modes, both reading every chunk exactly once:
      rot=True  — chunk visit order rotates by start (costs a scalar
                  rem per copy on the issue path — NOT a clean A/B:
                  measured 495 GB/s, the rem serializes issue)
      rot=False — copies identical to the invariant kernel; start only
                  seeds the accumulator. ZERO machinery change; the
                  i-dependence lives in one scalar add."""
    start = start_ref[0]

    def copy(slot, c):
        cc = jax.lax.rem(c + start, nchunks) if rot else c
        return pltpu.make_async_copy(
            hbm.at[pl.ds(cc * chunk, chunk)], buf.at[slot], sem.at[slot])

    for i in range(depth - 1):
        copy(i, i).start()

    def body(c, acc):
        slot = c % depth

        @pl.when(c + depth - 1 < nchunks)
        def _():
            copy((c + depth - 1) % depth, c + depth - 1).start()

        copy(slot, c).wait()
        return acc + buf[slot][0, :1].astype(jnp.float32)

    acc0 = jnp.full((1,), start, jnp.float32)
    acc = jax.lax.fori_loop(0, nchunks, body, acc0)
    o_ref[0] = acc


def pallas_stream_rot(x2d: jax.Array, start, chunk: int,
                      depth: int = 2, rot: bool = True) -> jax.Array:
    n, hd = x2d.shape
    nchunks = n // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, chunk, hd), x2d.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    kernel = functools.partial(_stream_kernel_rot, chunk=chunk,
                               nchunks=nchunks, depth=depth, rot=rot)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid_spec=grid_spec,
    )(jnp.asarray(start, jnp.int32).reshape(1), x2d)


def verify_modes(gib, chunk):
    """Invariant vs loop-dependent A/B: was the 1054 GB/s adjudication
    an artifact of XLA hoisting the invariant pallas_call out of the
    timing loop?"""
    dtype = jnp.bfloat16
    rows = int(gib * (1 << 30) / (HD * 2))
    rows -= rows % chunk
    nbytes = rows * HD * 2
    nchunks = rows // chunk
    x = jnp.zeros((rows, HD), dtype)
    n_iter = 8

    def time_it(label, f):
        jax.device_get(f(x))
        t0 = time.time()
        jax.device_get(f(x))
        dt = time.time() - t0
        log(f"{label}: {n_iter * nbytes / dt / 1e9:6.0f} GB/s "
            f"({dt / n_iter * 1e3:.1f} ms/pass over {nbytes / 1e9:.2f} GB)")

    @jax.jit
    def invariant(x):
        def body(i, acc):
            return acc + pallas_stream(x, chunk)[0, 0] + i
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

    @jax.jit
    def rotated(x):
        def body(i, acc):
            return acc + pallas_stream_rot(x, i % nchunks, chunk)[0, 0]
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

    @jax.jit
    def seeded(x):
        # the clean A/B: byte-identical schedule to `invariant` (rot
        # off, copies are plain c), but the accumulator is seeded with
        # i — one scalar of i-dependence, zero machinery change. If
        # this lands at the `rotated` rate the invariant number was a
        # hoisting artifact; if it lands at `invariant` the chip really
        # streams that fast.
        def body(i, acc):
            return acc + pallas_stream_rot(x, i, chunk, rot=False)[0, 0]
        return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

    time_it("invariant (r5 probe)   ", invariant)
    time_it("rotated (i-dependent)  ", rotated)
    time_it("seeded (i-dep, same sched)", seeded)


def main():
    gib = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    log(f"devices: {jax.devices()}  buffer {gib} GiB, chunk {chunk}")
    if len(sys.argv) > 3 and sys.argv[3] == "verify":
        verify_modes(gib, chunk)
        print("DMA-WIRE-PROBE-OK")
        return

    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        itemsize = jnp.dtype(dtype).itemsize
        rows = int(gib * (1 << 30) / (HD * itemsize))
        rows -= rows % chunk
        nbytes = rows * HD * itemsize
        x = jnp.zeros((rows, HD), dtype)
        n_iter = 8

        @jax.jit
        def xla_sum(x):
            def body(i, acc):
                # i-dependence defeats loop-invariant hoisting
                return acc + jnp.sum(x.astype(jnp.float32)) + i
            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

        jax.device_get(xla_sum(x))
        t0 = time.time()
        jax.device_get(xla_sum(x))
        dt = time.time() - t0
        log(f"{name} xla_sum:       {n_iter * nbytes / dt / 1e9:6.0f} GB/s "
            f"({dt / n_iter * 1e3:.1f} ms/pass over {nbytes / 1e9:.2f} GB)")

        @jax.jit
        def stream(x):
            def body(i, acc):
                return acc + pallas_stream(x, chunk)[0, 0] + i
            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

        jax.device_get(stream(x))
        t0 = time.time()
        jax.device_get(stream(x))
        dt = time.time() - t0
        log(f"{name} pallas_stream: {n_iter * nbytes / dt / 1e9:6.0f} GB/s "
            f"({dt / n_iter * 1e3:.1f} ms/pass)")

    if len(sys.argv) > 3 and sys.argv[3] == "dual":
        dual_modes(gib, chunk)
    print("DMA-WIRE-PROBE-OK")


def _dual_kernel(x0, x1, o_ref, buf, sem, *, chunk, nchunks, depth, nsem):
    """Two interleaved plane streams — the REAL decode-kernel pattern
    (K chunk + V chunk per step, planes far apart in HBM, one or two
    semaphores). The r5 compute-decomposition probe showed the full
    kernel's tap mode runs at the full kernel's 705 GB/s, not the
    single-stream 1054 GB/s — so the gap lives in this pattern."""
    def copies(slot, c):
        span = pl.ds(c * chunk, chunk)
        return [
            pltpu.make_async_copy(x0.at[span], buf.at[slot, 0], sem.at[slot, 0]),
            pltpu.make_async_copy(x1.at[span], buf.at[slot, 1],
                                  sem.at[slot, 1 % nsem]),
        ]

    for i in range(depth - 1):
        for cp in copies(i, i):
            cp.start()

    def body(c, acc):
        slot = c % depth

        @pl.when(c + depth - 1 < nchunks)
        def _():
            for cp in copies((c + depth - 1) % depth, c + depth - 1):
                cp.start()

        for cp in copies(slot, c):
            cp.wait()
        return acc + buf[slot, 0][0, :1].astype(jnp.float32) \
            + buf[slot, 1][0, :1].astype(jnp.float32)

    acc = jax.lax.fori_loop(0, nchunks, body, jnp.zeros((1,), jnp.float32))
    o_ref[0] = acc


def dual_stream(x0, x1, chunk, depth=2, nsem=1):
    n, hd = x0.shape
    nchunks = n // chunk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, 2, chunk, hd), x0.dtype),
            pltpu.SemaphoreType.DMA((depth, nsem)),
        ],
    )
    kernel = functools.partial(_dual_kernel, chunk=chunk, nchunks=nchunks,
                               depth=depth, nsem=nsem)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid_spec=grid_spec,
    )(x0, x1)


def dual_modes(gib, chunk):
    """A/B the dual-plane stream against the single-stream wire rate."""
    dtype = jnp.bfloat16
    rows = int(gib * (1 << 30) / (HD * 2))
    rows -= rows % chunk
    nbytes = 2 * rows * HD * 2
    # two separate device buffers = two far-apart HBM regions
    x0 = jnp.zeros((rows, HD), dtype)
    x1 = jnp.zeros((rows, HD), dtype)
    n_iter = 8

    def run(label, **kw):
        @jax.jit
        def f(x0, x1):
            def body(i, acc):
                return acc + dual_stream(x0, x1, chunk, **kw)[0, 0] + i
            return jax.lax.fori_loop(0, n_iter, body, jnp.float32(0))

        jax.device_get(f(x0, x1))
        t0 = time.time()
        jax.device_get(f(x0, x1))
        dt = time.time() - t0
        log(f"{label}: {n_iter * nbytes / dt / 1e9:6.0f} GB/s "
            f"({dt / n_iter * 1e3:.1f} ms/pass over {nbytes / 1e9:.2f} GB)")

    run("dual far 1-sem depth=2 ", nsem=1)
    run("dual far 2-sem depth=2 ", nsem=2)
    run("dual far 2-sem depth=4 ", nsem=2, depth=4)


if __name__ == "__main__":
    main()
