import pytest

from meshanything_tpu.config import MeshAnythingConfig
from meshanything_tpu.runtime.phases import check_memory_budget, estimate_kv_bytes


def test_estimate_kv_bytes_full_scale():
    cfg = MeshAnythingConfig()
    # 2 * 24L * 7680 * 1024 * 2B ~ 0.755 GB per batch element (bf16)
    per = estimate_kv_bytes(cfg, 1)
    assert 0.7e9 < per < 0.8e9
    assert estimate_kv_bytes(cfg, 1, int8=True) == per // 2


def test_budget_accepts_known_good_configs():
    cfg = MeshAnythingConfig()
    check_memory_budget(cfg, 8)                        # bf16 B=8: measured OK
    check_memory_budget(cfg, 16, attn="pallas_int8")   # int8 B=16: measured OK


def test_budget_rejects_worker_killers():
    cfg = MeshAnythingConfig()
    with pytest.raises(ValueError, match="exceeds"):
        check_memory_budget(cfg, 32, attn="pallas_int8")  # crashed the worker
    with pytest.raises(ValueError, match="exceeds"):
        check_memory_budget(cfg, 16)                      # bf16 B=16: 12 GB cache
