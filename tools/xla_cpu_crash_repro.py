#!/usr/bin/env python
"""Minimal repro loop for the late-suite XLA:CPU segfault (VERDICT r4
#8): the full test suite crashed twice inside backend_compile_and_load
after ~180 accumulated compiled programs; every smaller grouping passes.

Compiles an unbounded stream of DISTINCT programs (unique constants so
nothing dedups) shaped like the suite's: layer scans with while_loop
decodes, donated buffers, Pallas-interpret kernels, and shard_map over
the 8-device virtual CPU mesh. Prints RSS and live-executable counts so
a crash point can be correlated with a resource curve.

Run: python -m tools.xla_cpu_crash_repro [n_programs] [--clear-every N]
(on the 1-core fleet host ~1-2 s/program).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return -1.0


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 400
    clear_every = 0
    if "--clear-every" in sys.argv:
        clear_every = int(sys.argv[sys.argv.index("--clear-every") + 1])

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.array(jax.devices("cpu")[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    keep = []   # hold every jitted fn alive, like a pytest session does

    print(f"jax {jax.__version__}, {len(jax.devices())} cpu devices, "
          f"target {n} programs, clear_every={clear_every}", flush=True)
    for i in range(n):
        kind = i % 4
        c = float(i) + 0.5   # unique constant defeats executable dedup

        if kind == 0:
            # layer scan + while_loop decode (the shape_opt generate shape)
            def f(x, _c=c):
                def layer(h, w):
                    return jnp.tanh(h @ w + _c), None
                ws = jnp.ones((4, x.shape[-1], x.shape[-1]), x.dtype)
                h, _ = jax.lax.scan(layer, x, ws)

                def cond(s):
                    return s[1] < 5

                def body(s):
                    return (jnp.sin(s[0]) + _c, s[1] + 1)

                out, _ = jax.lax.while_loop(cond, body, (h, 0))
                return out.sum()
            arg = jnp.zeros((8, 16 + i % 7 * 8), jnp.float32)
            keep.append(jax.jit(f))
            keep[-1](arg).block_until_ready()
        elif kind == 1:
            # donated-buffer update chain (the decode_segment shape)
            def f(buf, _c=c):
                return buf.at[0].add(_c)
            arg = jnp.zeros((64, 64), jnp.float32)
            keep.append(jax.jit(f, donate_argnums=(0,)))
            keep[-1](arg).block_until_ready()
        elif kind == 2:
            # pallas interpret kernel (the CPU-test kernel path)
            from jax.experimental import pallas as pl

            def kern(x_ref, o_ref, _c=c):
                o_ref[...] = x_ref[...] * 2.0 + _c

            def f(x, _k=kern):
                return pl.pallas_call(
                    _k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                    interpret=True)(x)
            arg = jnp.ones((8, 128), jnp.float32)
            keep.append(jax.jit(f))
            keep[-1](arg).block_until_ready()
        else:
            # shard_map collective over the mesh
            def f(x, _c=c):
                def inner(xs):
                    return jax.lax.psum(xs + _c, "data")
                return jax.shard_map(
                    inner, mesh=mesh, in_specs=P("data", None),
                    out_specs=P(None))(x)
            arg = jax.device_put(jnp.ones((8, 32), jnp.float32),
                                 NamedSharding(mesh, P("data", None)))
            keep.append(jax.jit(f))
            keep[-1](arg).block_until_ready()

        if clear_every and (i + 1) % clear_every == 0:
            jax.clear_caches()
        if (i + 1) % 20 == 0:
            print(f"{i + 1:4d} programs: RSS {rss_mb():7.0f} MB "
                  f"live_executables≈{len(keep)}", flush=True)
    print("REPRO-COMPLETED-WITHOUT-CRASH", flush=True)


if __name__ == "__main__":
    main()
