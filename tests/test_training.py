"""Training scaffold tests: losses, data pipeline, end-to-end VAE step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.config import small_test_config
from meshanything_tpu.geometry.obj_io import Mesh
from meshanything_tpu.training.data import (
    axis_scale_augment,
    ray_parity_inside,
    sample_training_points,
)
from meshanything_tpu.training.losses import (
    shifted_token_ce,
    token_accuracy,
    vae_occupancy_loss,
)


def _cube(side=1.0):
    h = side / 2
    v = np.array([[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
                  [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]])
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    return Mesh(v, f)


def test_ray_parity_inside_cube():
    mesh = _cube(1.0)
    pts = np.array([
        [0, 0, 0],          # center -> inside
        [0.49, 0.49, 0.49], # corner-ish inside
        [0.9, 0, 0],        # outside
        [0, 0.51, 0],       # just outside
        [-0.3, 0.1, 0.2],   # inside
    ])
    got = ray_parity_inside(pts, mesh.vertices, mesh.faces)
    np.testing.assert_array_equal(got, [True, True, False, False, True])


def test_sample_training_points(rng):
    mesh = _cube(1.0)
    batch = sample_training_points(mesh, n_surface=256, n_vol=512, n_near=256, rng=rng)
    assert batch.surface.shape == (256, 6)
    assert batch.queries.shape == (768, 3)
    assert batch.occupancy.shape == (768,)
    # analytic check: a point is inside iff max |coord| < 0.5
    expect = (np.abs(batch.queries).max(axis=1) < 0.5).astype(np.float32)
    # near-surface points can straddle the boundary within float noise;
    # demand 99%+ agreement
    agree = (expect == batch.occupancy).mean()
    assert agree > 0.99, agree


def test_axis_scale_augment(rng):
    mesh = _cube(1.0)
    batch = sample_training_points(mesh, n_surface=128, n_vol=128, n_near=64, rng=rng)
    surf2, q2 = axis_scale_augment(batch.surface, batch.queries, rng=rng)
    assert surf2.shape == batch.surface.shape
    assert q2.shape == batch.queries.shape
    # normals stay unit
    np.testing.assert_allclose(np.linalg.norm(surf2[:, 3:], axis=-1), 1.0, atol=1e-5)
    # overall extent preserved
    orig = np.abs(np.concatenate([batch.surface[:, :3], batch.queries])).max()
    new = np.abs(np.concatenate([surf2[:, :3], q2])).max()
    np.testing.assert_allclose(new, orig, rtol=1e-5)


def test_vae_occupancy_loss_end_to_end(rng):
    """Perceiver encode -> decode -> occupancy logits -> loss + grads."""
    from meshanything_tpu.models import perceiver as per_mod

    cfg = small_test_config().perceiver
    params = per_mod.init_perceiver_params(jax.random.PRNGKey(0), cfg)
    mesh = _cube(1.0)
    batch = sample_training_points(
        mesh, n_surface=cfg.num_points, n_vol=64, n_near=32, rng=rng
    )

    def loss_fn(p):
        latents = per_mod.encode_latents(p, cfg, jnp.asarray(batch.surface)[None])
        from meshanything_tpu.models.layers import linear

        moments = linear(latents[:, 1:], p["pre_kl"]["w"], p["pre_kl"]["b"])
        mean, logvar = jnp.split(moments, 2, axis=-1)
        decoded = per_mod.decode_latents(p, cfg, mean)
        logits = per_mod.query_geometry(p, cfg, jnp.asarray(batch.queries)[None], decoded)
        out = vae_occupancy_loss(logits[0], jnp.asarray(batch.occupancy), mean, logvar)
        return out["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_shifted_ce_ignore_index():
    logits = jnp.zeros((1, 4, 5))
    labels = jnp.asarray([[-100, 2, -100, 3]])
    loss = shifted_token_ce(logits, labels)
    # uniform logits -> ln(5) on the 2 valid shifted positions
    np.testing.assert_allclose(float(loss), np.log(5), rtol=1e-5)
    acc = token_accuracy(logits, labels)
    assert 0.0 <= float(acc) <= 1.0


# ---------------------------------------------------------------------------
# remat + blockwise flash attention (VERDICT r1 item 5)


def test_flash_attention_causal_matches_dense(rng):
    from meshanything_tpu.models.layers import attention, flash_attention_causal

    b, n, h, d = 2, 24, 4, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32)) for _ in range(3))
    dense = attention(q, k, v, causal=True)
    for bq, bk in [(8, 8), (12, 4), (4, 12), (24, 24)]:
        flash = flash_attention_causal(q, k, v, block_q=bq, block_k=bk)
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=2e-5)


def test_flash_attention_causal_grads_match(rng):
    from meshanything_tpu.models.layers import attention, flash_attention_causal

    b, n, h, d = 1, 16, 2, 4
    q, k, v = (jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32)) for _ in range(3))

    def loss_dense(q, k, v):
        return jnp.sum(attention(q, k, v, causal=True) ** 2)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_causal(q, k, v, block_q=4, block_k=4) ** 2)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gd, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_flash_attention_full_matches_dense(rng):
    """flash_attention_full (the non-causal blockwise path used by the
    perceiver point cross-attention and every NRD layer) must match the
    dense formulation, including non-block-multiple and cross
    (len q != len k) shapes where padded keys must be masked exactly."""
    from meshanything_tpu.models.layers import attention, flash_attention_full

    b, h, d = 2, 3, 8
    for nq, nk, bq, bk, dual in [
        (24, 24, 8, 8, False),      # aligned self
        (23, 41, 8, 16, False),     # padding in both q and k
        (17, 64, 32, 16, True),     # dual-sqrt (Michelangelo) scaling
        (5, 3, 128, 512, False),    # blocks larger than the sequence
    ]:
        q = jnp.asarray(rng.normal(size=(b, nq, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, nk, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, nk, h, d)).astype(np.float32))
        dense = attention(q, k, v, dual_sqrt_scale=dual)
        flash = flash_attention_full(q, k, v, dual_sqrt_scale=dual,
                                     block_q=bq, block_k=bk)
        assert flash.shape == dense.shape
        np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=2e-5)


def test_forward_full_blockwise_remat_matches_dense(rng):
    """forward_full(remat, block_q) must be numerically identical to the
    dense pass, including internal padding to a block multiple."""
    from meshanything_tpu.models import meshanything as ma

    cfg = small_test_config(n_max_triangles=4)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    pc = jnp.asarray(rng.normal(size=(2, cfg.perceiver.num_points, 6)).astype(np.float32))
    ids = jnp.asarray(rng.integers(3, cfg.opt.vocab_size, size=(2, 21)).astype(np.int32))

    dense = ma.forward_logits(params, cfg, pc, ids)
    # cond 17 + 21 tokens = 38 positions -> pads to 40 with block_q=8
    flash = ma.forward_logits(params, cfg, pc, ids, remat=True, block_q=8)
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=3e-5)


def test_train_step_long_seq_remat_blockwise():
    """Full-length-style training: seq >= 2048 through the sharded step
    with remat + blockwise attention on the 8-device CPU mesh
    (VERDICT r1: COMPONENTS.md's gradient-checkpointing claim must hold
    beyond toy lengths)."""
    import dataclasses

    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.parallel.mesh import create_mesh
    from meshanything_tpu.training.train import make_batch, make_sharded_train_step

    base = small_test_config(n_max_triangles=228)  # 228*9+2 = 2054 tokens
    cfg = dataclasses.replace(
        base, opt=dataclasses.replace(base.opt, max_positions=2560)
    )
    assert cfg.generate_length >= 2048
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(data=2, model=4)
    with mesh:
        state, step_fn = make_sharded_train_step(mesh, cfg, params, block_q=256)
        rng = np.random.default_rng(0)
        pc, ids, labels = make_batch(cfg, rng, batch=2, seq=cfg.generate_length)
        state, metrics = step_fn(state, jnp.asarray(pc), jnp.asarray(ids), jnp.asarray(labels))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1


def test_sharded_train_state_save_resume(tmp_path):
    """Checkpoint/resume of the sharded trainer: save TrainState from a
    (2, 4) mesh, restore onto the shardings of a freshly-built state,
    and the resumed run is bit-identical to the uninterrupted one (the
    TPU-native replacement for torch.load + DDP broadcast: every device
    reads only its shard on restore)."""
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.parallel.mesh import create_mesh
    from meshanything_tpu.training.train import (
        make_batch,
        make_sharded_train_step,
        restore_train_state,
        save_train_state,
    )

    cfg = small_test_config(n_max_triangles=2)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(data=2, model=4)
    rng = np.random.default_rng(0)
    pc, ids, labels = make_batch(cfg, rng, batch=2, seq=cfg.generate_length)
    batch = (jnp.asarray(pc), jnp.asarray(ids), jnp.asarray(labels))

    with mesh:
        # uninterrupted: two steps straight through
        state, step_fn = make_sharded_train_step(mesh, cfg, params)
        s1, _ = step_fn(state, *batch)
        ref2, _ = step_fn(s1, *batch)

        # interrupted: step, save, rebuild from scratch, restore, step
        state_b, step_fn_b = make_sharded_train_step(mesh, cfg, params)
        s1b, _ = step_fn_b(state_b, *batch)
        path = str(tmp_path / "train_ckpt")
        save_train_state(s1b, path)
        fresh, step_fn_c = make_sharded_train_step(mesh, cfg, params)
        resumed = restore_train_state(path, fresh)
        assert int(resumed.step) == 1
        # restored params carry the mesh shardings of the template
        qkv = resumed.params["opt"]["layers"]["qkv"]["w"]
        assert qkv.sharding.is_equivalent_to(
            fresh.params["opt"]["layers"]["qkv"]["w"].sharding, qkv.ndim)
        got2, _ = step_fn_c(resumed, *batch)

    assert int(got2.step) == 2
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref2.params)[0],
        jax.tree_util.tree_flatten_with_path(got2.params)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_run_training_loop_resume(tmp_path):
    """run_training end-to-end: 2 steps + crash + resume to 4 equals 4
    uninterrupted steps bit-for-bit (same deterministic batch stream via
    grammar_batches(skip=restored_step))."""
    from meshanything_tpu.parallel.mesh import create_mesh
    from meshanything_tpu.training.train import grammar_batches, run_training

    cfg = small_test_config(n_max_triangles=4)
    mesh = create_mesh(data=1, model=1)
    kw = dict(steps=4, seed=0, log_every=0, save_every=2)

    ref = run_training(mesh, cfg, grammar_batches(cfg, 2, seed=0),
                       ckpt_dir=str(tmp_path / "a"), **kw)
    # interrupted at step 2: the step-2 periodic checkpoint survives
    part = run_training(mesh, cfg, grammar_batches(cfg, 2, seed=0),
                        ckpt_dir=str(tmp_path / "b"),
                        steps=2, seed=0, log_every=0, save_every=2)
    assert int(part.step) == 2
    got = run_training(mesh, cfg, grammar_batches(cfg, 2, seed=0, skip=2),
                       ckpt_dir=str(tmp_path / "b"), resume=True, **kw)

    assert int(ref.step) == int(got.step) == 4
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref.params)[0],
        jax.tree_util.tree_flatten_with_path(got.params)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))


def test_grammar_batch_mask_padding():
    """mask_padding labels exactly [bos, content, one eos] per row and
    -100 elsewhere (the eos tail otherwise dominates 2/3 of the loss
    mass and traps full-scale training in a structure-only attractor —
    synthetic_grammar.py full_scale_probe)."""
    from meshanything_tpu.training.synthetic_grammar import make_grammar_batch

    cfg = small_test_config(n_max_triangles=20)
    rng = np.random.default_rng(0)
    pc, ids, labels = make_grammar_batch(cfg, rng, 2, k=4, mask_padding=True)
    c = cfg.cond_length
    for row in range(2):
        assert np.all(labels[row, :c] == -100)
        tail = labels[row, c:]
        valid = tail != -100
        n = int(valid.sum())
        # contiguous prefix of labels, nothing after
        assert np.all(valid[:n]) and not np.any(valid[n:])
        assert tail[0] == cfg.opt.bos_token_id
        assert tail[n - 1] == cfg.opt.eos_token_id
        # exactly one labeled eos (the terminator)
        assert int((tail[:n] == cfg.opt.eos_token_id).sum()) == 1
        # ids themselves keep the eos prefill (generation contract)
        assert ids[row, -1] == cfg.opt.eos_token_id


def test_param_tree_npz_round_trip(tmp_path):
    """_flatten_tree/_unflatten_tree preserve the nested param tree
    through an npz file (the probe's trained-weights cache)."""
    from meshanything_tpu.training.synthetic_grammar import (
        _flatten_tree,
        _unflatten_tree,
    )

    tree = {"a": {"b": np.arange(6.0).reshape(2, 3), "c": np.ones(4)},
            "d": np.zeros((1, 2))}
    path = tmp_path / "params.npz"
    np.savez(path, **_flatten_tree(tree))
    loaded = _unflatten_tree(dict(np.load(path)))
    assert set(loaded) == {"a", "d"}
    np.testing.assert_array_equal(loaded["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(loaded["a"]["c"], tree["a"]["c"])
    np.testing.assert_array_equal(loaded["d"], tree["d"])


def test_make_optimizer_clips_and_warms_up():
    """training/optim.py: the 350M-stable recipe — global-norm clip plus
    warmup (first step's lr ~ 0) — measured necessary on the full-scale
    grammar probe (PERF.md)."""
    import optax

    from meshanything_tpu.training.optim import make_optimizer

    opt = make_optimizer(1e-3, steps=100)
    params = {"w": jnp.ones((4, 4))}
    state = opt.init(params)
    # a huge gradient must come out clipped AND warmup-scaled
    grads = {"w": jnp.full((4, 4), 1e6)}
    updates, state = opt.update(grads, state, params)
    assert float(jnp.abs(updates["w"]).max()) < 1e-3  # step-0 lr ~ 0
    # after stepping past warmup the update magnitude approaches lr
    for _ in range(60):
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert 1e-5 < float(jnp.abs(updates["w"]).max()) < 2e-3
    assert np.isfinite(np.asarray(params["w"])).all()

    # open-ended mode (no steps): constant lr after warmup
    opt2 = make_optimizer(1e-3)
    state2 = opt2.init({"w": jnp.ones((2,))})
    for _ in range(60):
        updates2, state2 = opt2.update({"w": jnp.ones((2,))}, state2, {"w": jnp.ones((2,))})
    assert float(jnp.abs(updates2["w"]).max()) > 5e-4  # ~ full lr


def test_chain_grammar_structure():
    """The chain grammar (VERDICT r4 #7): heights follow the FIXED
    permutation orbit in first-appearance order, start bin varies per
    mesh, discretization is lossless, and the point cloud comes from the
    FLAT base grid (the walk exists only in the token stream — that is
    the whole point: the condition must carry zero height information so
    in-window Jacobi guesses genuinely flip downstream argmaxes)."""
    from meshanything_tpu.training.synthetic_grammar import (
        _chain_perm,
        chain_grid_mesh,
        make_grammar_batch,
        mesh_to_token_stream,
    )

    bins, k = 63, 5
    v, v_pc, f = chain_grid_mesh(np.random.default_rng(0), k=k, bins=bins)
    assert np.allclose(v_pc[:, 1], 0.0)                    # flat condition
    assert np.allclose(v[:, [0, 2]], v_pc[:, [0, 2]])      # same x,z

    # heights sit at exact bin centers -> lossless discretization
    yb = np.clip(((v[:, 1] + 0.5) * bins).astype(np.int64), 0, bins - 1)
    assert np.allclose((yb + 0.5) / bins - 0.5, v[:, 1])

    # the orbit follows the fixed permutation in first-appearance order
    lo, hi = int(round(0.15 * bins)), int(round(0.85 * bins))
    perm = _chain_perm(lo, hi)
    order, seen = [], set()
    for face in f:
        for vid in face:
            if vid not in seen:
                seen.add(int(vid))
                order.append(int(vid))
    seq = yb[order]
    assert np.all((seq >= lo) & (seq < hi))
    for a, b in zip(seq[:-1], seq[1:]):
        assert perm[a - lo] == b

    # different rng -> different start -> different orbit slice
    v2, _, _ = chain_grid_mesh(np.random.default_rng(1), k=k, bins=bins)
    assert not np.allclose(v[:, 1], v2[:, 1])

    # batch plumbing: chain caps bins below the vocab clip, so the
    # stream round-trips the walk exactly
    import dataclasses

    base_cfg = small_test_config(n_max_triangles=40)
    cfg = dataclasses.replace(
        base_cfg,
        opt=dataclasses.replace(base_cfg.opt, vocab_size=67, codebook_size=64))
    pc, ids, labels = make_grammar_batch(
        cfg, np.random.default_rng(2), 2, k=k, mask_padding=True, chain=True)
    toks = mesh_to_token_stream(v, f, bins)
    assert toks.max() < cfg.opt.vocab_size
    # conditions are flat-plane samples: y ~ 0 everywhere
    assert np.abs(pc[..., 1]).max() < 1e-6
