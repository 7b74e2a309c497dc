"""AOT compiled-executable store (runtime/aot.py): the cold-start
answer to the uncacheable server-side compiles (VERDICT r2 next #4)."""
import os

import numpy as np

import jax
import jax.numpy as jnp

from meshanything_tpu.config import small_test_config
from meshanything_tpu.models import meshanything as ma
from meshanything_tpu.runtime.aot import AotFunction, AotStore


def test_aot_function_roundtrip(tmp_path, rng):
    """compile-or-load: first call compiles + persists; a FRESH wrapper
    (simulating a new process) loads the executable instead of
    compiling, and produces identical results."""
    store = AotStore(str(tmp_path))
    x = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))

    def f(a, scale):
        return (a * scale).sum(axis=-1)

    fn1 = AotFunction(f, "f", store=store, static_argnames=("scale",), context="t")
    out1 = np.asarray(fn1(x, scale=2.0))
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].endswith(".jaxexec")

    # fresh wrapper: must resolve from the store, not compile
    fn2 = AotFunction(f, "f", store=store, static_argnames=("scale",), context="t")
    loaded = fn2._resolve((x,), {"scale": 2.0}, build=False)
    assert loaded is not None, "executable was not loadable from the store"
    out2 = np.asarray(fn2(x, scale=2.0))
    np.testing.assert_array_equal(out1, out2)

    # different statics / shapes get their own entries
    fn2(x, scale=3.0)
    assert len(os.listdir(tmp_path)) == 2


def test_aot_function_without_store_is_plain_jit(rng):
    x = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    fn = AotFunction(lambda a: a + 1, "g")
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(x) + 1)


def test_phase_runner_precompile_and_cold_start(tmp_path, rng):
    """PhaseRunner.precompile warms every phase from shape structs (no
    execution); a SECOND runner with the same aot_dir resolves each
    phase from disk and generates the identical stream."""
    from meshanything_tpu.runtime.phases import PhaseRunner

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    aot = str(tmp_path / "aot")

    warm = PhaseRunner(params, cfg, bucket=16, aot_dir=aot)
    warm.precompile(batch=1)
    stored = os.listdir(aot)
    assert len(stored) == 3, stored  # encode, decode, detok

    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
    ref = np.asarray(PhaseRunner(params, cfg, bucket=16)(pc).token_ids)

    cold = PhaseRunner(params, cfg, bucket=16, aot_dir=aot)
    # every phase must resolve without building
    sds = jax.ShapeDtypeStruct
    dtype = cfg.activation_dtype
    key_sds = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    cond_sds = sds((1, cfg.cond_length, cfg.opt.hidden_size), dtype)
    assert cold._decode._resolve(
        (params, cond_sds, key_sds), {"sampling": False}, build=False) is not None

    out = np.asarray(cold(pc).token_ids)
    np.testing.assert_array_equal(out, ref)
