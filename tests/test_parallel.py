"""Multi-device sharding tests on the virtual 8-CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from meshanything_tpu.config import small_test_config
from meshanything_tpu.models import meshanything as ma
from meshanything_tpu.parallel.mesh import create_mesh, param_shardings, shard_params


@pytest.fixture(scope="module")
def cfg():
    return small_test_config(n_max_triangles=4)


@pytest.fixture(scope="module")
def params(cfg):
    return ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)


def test_create_mesh_shapes(cpu_devices):
    mesh = create_mesh(data=2, model=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        create_mesh(data=4, model=4)


def test_param_shardings_cover_tree(params):
    mesh = create_mesh(data=2, model=4)
    sh = param_shardings(mesh, params)
    # same tree structure
    jax.tree_util.tree_map(lambda s, p: None, sh, params)
    flat_s = jax.tree_util.tree_leaves(sh)
    assert all(isinstance(s, NamedSharding) for s in flat_s)


def test_tp_sharded_forward_matches_single_device(cfg, params, rng):
    """DP+TP sharded teacher-forcing forward == single-device forward."""
    pc = jnp.asarray(rng.normal(size=(2, cfg.perceiver.num_points, 6)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, cfg.opt.vocab_size, size=(2, 9)).astype(np.int32))

    ref = np.asarray(ma.forward_logits(params, cfg, pc, toks))

    mesh = create_mesh(data=2, model=4)
    with mesh:
        sharded, _ = shard_params(mesh, params)
        batch_sh = NamedSharding(mesh, P("data"))
        pc_s = jax.device_put(pc, NamedSharding(mesh, P("data", None, None)))
        toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
        out = jax.jit(lambda p, a, b: ma.forward_logits(p, cfg, a, b))(sharded, pc_s, toks_s)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_dp_sharded_generate_matches_single_device(cfg, params, rng):
    """Pure-DP batched generation produces identical token streams."""
    pc = jnp.asarray(rng.normal(size=(4, cfg.perceiver.num_points, 6)).astype(np.float32))
    ref = np.asarray(ma.generate(params, cfg, pc, bucket=16).token_ids)

    mesh = create_mesh(data=4, model=2)
    with mesh:
        sharded, _ = shard_params(mesh, params)
        pc_s = jax.device_put(pc, NamedSharding(mesh, P("data", None, None)))
        out = jax.jit(lambda p, a: ma.generate(p, cfg, a, bucket=16).token_ids)(sharded, pc_s)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_dryrun_multichip_self_provisions():
    """Simulate the driver: a bare subprocess with no XLA_FLAGS / conftest.

    Round-1 regression: the driver invokes ``dryrun_multichip(8)`` in a
    fresh process where the sitecustomize hook force-registers the
    single-chip axon TPU platform; the entry point must provision its
    own 8-device virtual CPU mesh (MULTICHIP_r01.json failed rc=1).
    """
    import subprocess
    import sys
    import os

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout


# ---------------------------------------------------------------------------
# Pallas decode kernels under a sharded mesh (VERDICT r2 next #3): the
# flat (2, L, B, S, H*D) cache layout must partition — batch over
# "data", head-columns over "model" — with each shard running the
# kernel on purely local data (per-head attention needs no collective).


def _toy_cache(rng, b=4, h=8, d=16, layers=2, s=64):
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, layers, b, s, h * d)).astype(np.float32))
    return q, kv


def test_pallas_decode_kernel_under_shard_map(rng):
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_impl,
        decode_attention_reference,
    )

    q, kv = _toy_cache(rng)
    layer, cur_len = 1, 37
    ref = np.asarray(decode_attention_reference(
        q, kv, jnp.int32(layer), jnp.int32(cur_len)))

    mesh = create_mesh(data=2, model=4)

    def local(q_l, kv_l):
        # per-shard: (B/2, H/4, D) queries against (2, L, B/2, S, H*D/4)
        # local cache columns — H*D stays flat per the layout contract
        return decode_attention_impl(
            q_l, kv_l, jnp.int32(layer), jnp.int32(cur_len),
            chunk=16, interpret=True)

    out = jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(P("data", "model", None), P(None, None, "data", None, "model")),
        out_specs=P("data", "model", None),
    )(q, kv)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_pallas_mq_kernel_under_shard_map(rng):
    """The multi-query (lookahead) kernel with PER-ROW base lengths —
    the base_lens vector shards with the batch."""
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_mq_impl,
        decode_attention_reference,
    )

    b, h, d, layers, s, w = 4, 8, 16, 2, 64, 3
    q = jnp.asarray(rng.normal(size=(b, w, h, d)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, layers, b, s, h * d)).astype(np.float32))
    base = jnp.asarray([10, 20, 30, 40], jnp.int32)
    layer = 0

    # reference: query i of row r sees base[r] + i + 1 rows
    refs = []
    for i in range(w):
        per_row = []
        for r in range(b):
            o = decode_attention_reference(
                q[r: r + 1, i], kv[:, :, r: r + 1], jnp.int32(layer),
                jnp.int32(int(base[r]) + i + 1))
            per_row.append(np.asarray(o)[0])
        refs.append(np.stack(per_row))
    ref = np.stack(refs, axis=1)                         # (B, W, H, D)

    mesh = create_mesh(data=2, model=4)

    def local(q_l, kv_l, base_l):
        return decode_attention_mq_impl(
            q_l, kv_l, jnp.int32(layer), base_l, chunk=16, interpret=True)

    out = jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(P("data", None, "model", None),
                  P(None, None, "data", None, "model"),
                  P("data")),
        out_specs=P("data", None, "model", None),
    )(q, kv, base)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


def test_pallas_int8_kernel_under_shard_map(rng):
    """int8 cache + f32 per-row scales: values shard over (data, model),
    the scales (shared across head columns) shard over data only."""
    from meshanything_tpu.ops.decode_attention import (
        decode_attention_int8_impl,
        decode_attention_reference,
    )
    from meshanything_tpu.ops.kvcache import quantize_rows

    q, kv = _toy_cache(rng)
    layer, cur_len = 0, 41
    values, s_rows = quantize_rows(kv)                   # (...,S,HD) int8, (...,S,1)
    scales = jnp.transpose(s_rows, (0, 1, 2, 4, 3))      # (2, L, B, 1, S)
    deq = values.astype(jnp.float32) * jnp.transpose(scales, (0, 1, 2, 4, 3))
    ref = np.asarray(decode_attention_reference(
        q, deq, jnp.int32(layer), jnp.int32(cur_len)))

    mesh = create_mesh(data=2, model=4)

    def local(q_l, v_l, s_l):
        return decode_attention_int8_impl(
            q_l, v_l, s_l, jnp.int32(layer), jnp.int32(cur_len),
            chunk=16, interpret=True)

    out = jax.shard_map(
        local, mesh=mesh, check_vma=False,
        in_specs=(P("data", "model", None),
                  P(None, None, "data", None, "model"),
                  P(None, None, "data", None, None)),
        out_specs=P("data", "model", None),
    )(q, values, scales)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-3, rtol=1e-2)


def test_lookahead_generate_dp_sharded_matches_single_device(cfg, params, rng):
    """Full lookahead generation (the fast tier) under the DP mesh must
    reproduce the single-device stream — the sharded-inference surface
    dryrun_multichip exercises (VERDICT r2: the dryrun previously
    covered only the plain bucket path)."""
    from meshanything_tpu.models.lookahead import generate_lookahead
    from meshanything_tpu.models import perceiver as per_mod

    pc = jnp.asarray(rng.normal(size=(4, cfg.perceiver.num_points, 6)).astype(np.float32))
    ref = np.asarray(ma.generate(params, cfg, pc, bucket=16, lookahead=4).token_ids)

    mesh = create_mesh(data=4, model=2)
    with mesh:
        sharded, _ = shard_params(mesh, params)
        pc_s = jax.device_put(pc, NamedSharding(mesh, P("data", None, None)))
        out = jax.jit(
            lambda p, a: ma.generate(p, cfg, a, bucket=16, lookahead=4).token_ids
        )(sharded, pc_s)
    np.testing.assert_array_equal(np.asarray(out), ref)


# ---------------------------------------------------------------------------
# multi-host scaffolding (VERDICT r1 item 10)


def test_shard_files_for_host_partition():
    from meshanything_tpu.parallel.multihost import shard_files_for_host

    paths = [f"f{i}.npy" for i in range(10)]
    shards = [shard_files_for_host(paths, pi, 4) for pi in range(4)]
    # exact partition: disjoint, complete, strided
    flat = [p for s in shards for p in s]
    assert sorted(flat) == sorted(paths)
    assert shards[0] == ["f0.npy", "f4.npy", "f8.npy"]
    assert shards[3] == ["f3.npy", "f7.npy"]
    # single host: identity
    assert shard_files_for_host(paths, 0, 1) == paths


def test_initialize_multihost_single_host_noop(monkeypatch):
    from meshanything_tpu.parallel.multihost import initialize_multihost, process_info

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_multihost() is False
    assert process_info() == (0, 1)


def test_cli_multihost_flag_parses_and_noops(tmp_path, rng):
    """--multihost end-to-end on one host (small config, 2 inputs):
    graceful no-op, all inputs processed."""
    from meshanything_tpu import cli
    import meshanything_tpu.cli as cli_mod

    for i in range(2):
        pts = rng.normal(size=(64, 3))
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
        arr = np.concatenate([pts * 0.5, pts], axis=1).astype(np.float16)
        np.save(tmp_path / f"s{i}.npy", arr)

    orig_build = cli_mod.build_config

    def small_build(args):
        from meshanything_tpu.config import small_test_config

        return small_test_config(n_max_triangles=2)

    cli_mod.build_config = small_build
    try:
        results = cli.main([
            "--input_dir", str(tmp_path), "--input_type", "pc_normal",
            "--out_dir", str(tmp_path / "out"), "--random_weights",
            "--multihost", "--bucket", "16",
        ])
    finally:
        cli_mod.build_config = orig_build
    assert len(results) == 2
