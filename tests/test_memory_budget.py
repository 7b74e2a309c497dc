import pytest

from meshanything_tpu.config import MeshAnythingConfig
from meshanything_tpu.runtime.phases import check_memory_budget, estimate_kv_bytes


def test_estimate_kv_bytes_full_scale():
    cfg = MeshAnythingConfig()
    # 2 * 24L * 7680 * 1024 * 2B ~ 0.755 GB per batch element (bf16)
    per = estimate_kv_bytes(cfg, 1)
    assert 0.7e9 < per < 0.8e9
    assert estimate_kv_bytes(cfg, 1, int8=True) == per // 2
    assert estimate_kv_bytes(cfg, 1, int4=True) == per // 4


def test_budget_accepts_known_good_configs():
    cfg = MeshAnythingConfig()
    check_memory_budget(cfg, 8)                        # bf16 B=8: measured OK
    check_memory_budget(cfg, 16, attn="pallas_int8")   # int8 B=16: measured OK
    check_memory_budget(cfg, 16, attn="pallas_int4")   # int4 B=16: measured OK
    check_memory_budget(cfg, 28, attn="pallas_int4")   # int4 B=28: measured OK


def test_budget_rejects_worker_killers():
    cfg = MeshAnythingConfig()
    with pytest.raises(ValueError, match="exceeds"):
        check_memory_budget(cfg, 32, attn="pallas_int8")  # crashed the worker
    with pytest.raises(ValueError, match="exceeds"):
        check_memory_budget(cfg, 16)                      # bf16 B=16: 12 GB cache
    # int4 B=32 crashed the worker TWICE — with dense and with blockwise
    # encode/detok — despite having the same kv bytes as the measured-OK
    # int8 B=16; the limit is calibrated between the largest measured-OK
    # estimate (int8 B=16 / int4 B=28, ~9.2 GB) and the smallest
    # measured-crash estimate (int4 B=32, ~10.2 GB), PERF.md r3
    with pytest.raises(ValueError, match="exceeds"):
        check_memory_budget(cfg, 32, attn="pallas_int4")


def test_budget_uses_measured_param_bytes():
    """The guard must scale with the actual param tree, not a hardcoded
    350M constant (round-1 weakness 9)."""
    import jax
    import numpy as np

    from meshanything_tpu.config import small_test_config
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.runtime.phases import param_tree_bytes

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    pb = param_tree_bytes(params)
    expected = sum(np.asarray(x).nbytes for x in jax.tree_util.tree_leaves(params))
    assert pb == expected
    # tiny model + tiny cache passes even under a tight budget
    check_memory_budget(cfg, 4, bucket=16, param_bytes=pb, limit_bytes=10 * 1024**2)
    # an enormous synthetic param slab alone trips the guard
    with pytest.raises(ValueError, match="exceeds"):
        check_memory_budget(cfg, 1, bucket=16, param_bytes=12 * 1024**3)


def test_budget_lookahead_extends_cache_estimate():
    cfg = MeshAnythingConfig()
    base = estimate_kv_bytes(cfg, 1, bucket=512)
    # +W tokens can cross a bucket boundary; never smaller
    assert estimate_kv_bytes(cfg, 1, bucket=512, extra_tokens=512) > base
