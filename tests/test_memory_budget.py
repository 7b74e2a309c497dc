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
    """The guard models CAPACITY only: what r1-r3 first read as a
    ~13 GB memory envelope was the worker's ~60 s per-program
    watchdog, handled since by segmented decode (PhaseRunner). Configs
    here are measured-OK on-chip (PERF.md r3)."""
    cfg = MeshAnythingConfig()
    check_memory_budget(cfg, 8)                        # bf16 B=8
    check_memory_budget(cfg, 12)                       # bf16 B=12: 4.87 s/mesh
    check_memory_budget(cfg, 16)                       # bf16 B=16 (segmented)
    check_memory_budget(cfg, 16, attn="pallas_int8")   # int8 B=16
    check_memory_budget(cfg, 28, attn="pallas_int4")   # int4 B=28
    check_memory_budget(cfg, 32, attn="pallas_int4")   # int4 B=32 (segmented)


def test_budget_rejects_capacity_overruns():
    cfg = MeshAnythingConfig()
    # 15.1 GB bf16 cache alone busts the 16 GiB part minus runtime headroom
    with pytest.raises(ValueError, match="exceeds"):
        check_memory_budget(cfg, 20)
    with pytest.raises(ValueError, match="exceeds"):
        check_memory_budget(cfg, 40, attn="pallas_int8")


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
        check_memory_budget(cfg, 1, bucket=16, param_bytes=16 * 1024**3)


def test_budget_lookahead_extends_cache_estimate():
    cfg = MeshAnythingConfig()
    base = estimate_kv_bytes(cfg, 1, bucket=512)
    # +W tokens can cross a bucket boundary; never smaller
    assert estimate_kv_bytes(cfg, 1, bucket=512, extra_tokens=512) > base
