"""Dynamic micro-batching for serving (runtime/batching.py)."""
import threading
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.config import small_test_config
from meshanything_tpu.models import meshanything as ma
from meshanything_tpu.runtime.batching import BatchingRunner


class _CountingRunner:
    """PhaseRunner-shaped test double over the real model: records the
    batch size of every launch."""

    def __init__(self, params, cfg):
        self.params = params
        self.cfg = cfg
        self.calls = []

    def __call__(self, pc, *, sampling=False, key=None, prompt_ids=None):
        self.calls.append(int(np.asarray(pc).shape[0]))
        if prompt_ids is not None:
            return ma.complete(self.params, self.cfg, jnp.asarray(pc),
                               jnp.zeros((pc.shape[0], 1, 3, 3)), bucket=16)
        return ma.generate(self.params, self.cfg, jnp.asarray(pc),
                           sampling=sampling, key=key, bucket=16)


@pytest.fixture(scope="module")
def setup():
    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture
def make_batcher():
    """Construct BatchingRunners that are CLOSED at test teardown.

    The r5 full-suite segfault dump (tools/xla_cpu_crash_repro findings,
    conftest docstring) showed six leaked _loop worker threads — one per
    test here — still alive inside a later module's XLA:CPU
    backend_compile_and_load crash. Leaked daemon workers pin their
    runner closures (params + executables) for the life of the process;
    every test must close its batcher."""
    created = []

    def _make(*a, **kw):
        b = BatchingRunner(*a, **kw)
        created.append(b)
        return b

    yield _make
    for b in created:
        b.close()


def test_concurrent_requests_coalesce(setup, rng, make_batcher):
    """Four concurrent submissions coalesce into fewer launches, each
    caller receives ITS OWN row, and results equal the unbatched path."""
    cfg, params = setup
    base = _CountingRunner(params, cfg)
    batcher = make_batcher(base, batch_sizes=(1, 2, 4), max_wait_s=0.3)

    pcs = [rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5
           for _ in range(4)]
    refs = [np.asarray(ma.generate(params, cfg, jnp.asarray(p), bucket=16).token_ids)
            for p in pcs]

    results = [None] * 4
    errors = []

    def worker(i):
        try:
            results[i] = batcher(jnp.asarray(pcs[i]))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
        time.sleep(0.01)  # arrive within the batching window
    for t in threads:
        t.join(timeout=300)
    assert not errors
    assert all(r is not None for r in results)

    # fewer launches than requests, every launch size from the allowed set
    assert len(base.calls) < 4
    assert all(c in (1, 2, 4) for c in base.calls)
    assert sum(1 for _ in results) == 4
    for i, r in enumerate(results):
        assert r.token_ids.shape[0] == 1
        np.testing.assert_array_equal(np.asarray(r.token_ids), refs[i],
                                      err_msg=f"request {i}")


def test_close_stops_worker_thread(setup, rng, make_batcher):
    """close() terminates the worker (no immortal daemon pinning the
    runner's params), is idempotent, and a close racing an in-flight
    batch still serves that batch."""
    cfg, params = setup
    base = _CountingRunner(params, cfg)
    batcher = make_batcher(base, batch_sizes=(1, 2), max_wait_s=0.2)
    pc = rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5

    out = [None]
    t = threading.Thread(target=lambda: out.__setitem__(0, batcher(jnp.asarray(pc))))
    t.start()
    time.sleep(0.05)       # request in flight (worker inside its wait window)
    batcher.close()        # sentinel races the accumulating batch
    t.join(timeout=120)
    assert out[0] is not None          # in-flight request still served
    batcher._thread.join(timeout=60)   # close()'s own join caps at 10 s
    assert not batcher._thread.is_alive()
    batcher.close()                    # idempotent


def test_single_request_uses_small_program(setup, rng, make_batcher):
    """A lone request must not pay a padded max-batch decode."""
    cfg, params = setup
    base = _CountingRunner(params, cfg)
    batcher = make_batcher(base, batch_sizes=(1, 4), max_wait_s=0.01)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32))
    out = batcher(pc)
    assert out.token_ids.shape == (1, cfg.generate_length)
    assert base.calls == [1]


def test_batch_failure_propagates(setup, rng, make_batcher):
    cfg, params = setup

    class _Boom:
        def __call__(self, pc, **kw):
            raise RuntimeError("device fell over")

    batcher = make_batcher(_Boom(), batch_sizes=(1, 2), max_wait_s=0.01)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32))
    with pytest.raises(RuntimeError, match="device fell over"):
        batcher(pc)


def test_prompt_requests_bypass_batching(setup, rng, make_batcher):
    cfg, params = setup
    base = _CountingRunner(params, cfg)
    batcher = make_batcher(base, batch_sizes=(1, 2), max_wait_s=0.01)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32))
    out = batcher(pc, prompt_ids=jnp.zeros((1, 10), jnp.int32))
    assert out.token_ids.shape[0] == 1
    assert batcher.batch_calls == 0  # went straight through


def test_sampling_requests_bypass_batching(setup, rng, make_batcher):
    """A batched decode draws all rows from one key, which would discard
    every other member's seed — sampled requests must go straight
    through so each request's advertised seed governs its stream."""
    cfg, params = setup
    base = _CountingRunner(params, cfg)
    batcher = make_batcher(base, batch_sizes=(1, 2), max_wait_s=0.01)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32))
    out = batcher(pc, sampling=True, key=jax.random.PRNGKey(7))
    ref = ma.generate(params, cfg, pc, sampling=True,
                      key=jax.random.PRNGKey(7), bucket=16)
    np.testing.assert_array_equal(np.asarray(out.token_ids),
                                  np.asarray(ref.token_ids))
    assert batcher.batch_calls == 0  # went straight through


def test_serving_engine_batching_wires_up(setup, rng, tmp_path, make_batcher):
    """ServingEngine(batching=2): two concurrent HTTP-level generations
    share one launch."""
    from meshanything_tpu.serving import ServingEngine

    cfg, params = setup
    base = _CountingRunner(params, cfg)
    engine = ServingEngine(params, cfg, bucket=16, runner=base,
                           artifacts_dir=str(tmp_path))
    # runner injection bypasses the batching flag; wrap manually the way
    # the flag does to keep the test's launch counting. Built via the
    # closing fixture: the r5 mitigation-off suite run STILL segfaulted
    # with exactly one leaked _loop thread alive — this one (the other
    # six constructions were already fixture-closed).
    engine._runner = make_batcher(base, batch_sizes=(1, 2), max_wait_s=0.3)

    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5],
                  [0, 5, 4], [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5],
                  [3, 0, 4], [3, 4, 7]])
    results = [None, None]

    def worker(i):
        results[i] = engine.generate_from_mesh(v, f, seed=0, render="off",
                                               export_artifacts=False)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
        time.sleep(0.01)
    for t in threads:
        t.join(timeout=300)
    assert all(r is not None for r in results)
    assert base.calls.count(2) >= 1  # the two requests shared a launch
