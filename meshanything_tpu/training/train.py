"""Sharded training step for the AR mesh decoder.

The reference ships no trainer (README.md:123); this provides the
TPU-native scaffold: teacher-forcing CE over [cond ‖ tokens], adamw,
and jit with NamedShardings over a (data, model) mesh — data-parallel
batch, tensor-parallel decoder weights. XLA/GSPMD inserts the
psum/all-gather collectives over ICI.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from meshanything_tpu.config import MeshAnythingConfig
from meshanything_tpu.models import meshanything as ma
from meshanything_tpu.parallel.mesh import meshanything_specs, param_shardings
from meshanything_tpu.training.losses import shifted_token_ce, token_accuracy


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-2,
                   steps=None) -> optax.GradientTransformation:
    """Training optimizer — delegates to training/optim.py (clip 1.0 +
    warmup-cosine + adamw b2=0.95), the recipe measured stable at 350M;
    the raw Michelangelo adamw (b2=0.99, eps=1e-6, no clip/warmup,
    shapevae-256.yaml:33-38) either explodes after the initial descent
    or plateaus, depending on lr (PERF.md trained-weights probe)."""
    from meshanything_tpu.training.optim import make_optimizer as _mk

    return _mk(lr, steps=steps, weight_decay=weight_decay)


def loss_fn(params, cfg: MeshAnythingConfig, pc_normal, token_ids, labels,
            *, remat: bool = True, block_q: int = 0):
    logits = ma.forward_logits(params, cfg, pc_normal, token_ids,
                               remat=remat, block_q=block_q)
    # only the generated-token region contributes (condition positions
    # carry no labels) — labels are prepadded with -100 there.
    loss = shifted_token_ce(logits, labels)
    acc = token_accuracy(logits, labels)
    return loss, {"loss": loss, "accuracy": acc}


def train_step(state: TrainState, cfg: MeshAnythingConfig, optimizer, pc_normal, token_ids, labels,
               *, remat: bool = True, block_q: int = 0):
    grad_fn = jax.value_and_grad(
        functools.partial(loss_fn, remat=remat, block_q=block_q), has_aux=True
    )
    (loss, metrics), grads = grad_fn(state.params, cfg, pc_normal, token_ids, labels)
    updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return TrainState(new_params, new_opt_state, state.step + 1), metrics


def make_sharded_train_step(
    mesh: Mesh,
    cfg: MeshAnythingConfig,
    params,
    optimizer: Optional[optax.GradientTransformation] = None,
    *,
    remat: bool = True,
    block_q: int = 0,
) -> Tuple[TrainState, callable]:
    """Build a jitted, sharded train step.

    Params get TP shardings (parallel/mesh.py specs); batch arrays are
    sharded on the ``data`` axis; optimizer state inherits the param
    shardings via init-under-jit.

    remat (default on): per-layer jax.checkpoint in the decoder stack so
    full-length sequences fit in HBM. block_q: blockwise causal
    attention tile (0 = dense; use e.g. 512 at the real 7,459-token
    length).
    """
    if optimizer is None:
        optimizer = make_optimizer()

    p_shard = param_shardings(mesh, params)
    # reshard via a non-donating jit identity, NOT jax.device_put:
    # device_put aliases the caller's buffer as the device-0 shard, and
    # the donated step_fn below would then delete the caller's params
    # tree out from under them (measured: building a second trainer from
    # the same tree raised "Array has been deleted")
    params = jax.jit(lambda p: p, out_shardings=p_shard)(params)

    @functools.partial(
        jax.jit,
        in_shardings=(p_shard,),
        out_shardings=None,
    )
    def init_opt(p):
        return optimizer.init(p)

    opt_state = init_opt(params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    batch_shard3 = NamedSharding(mesh, P("data", None, None))
    batch_shard2 = NamedSharding(mesh, P("data", None))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, pc_normal, token_ids, labels):
        pc_normal = jax.lax.with_sharding_constraint(pc_normal, batch_shard3)
        token_ids = jax.lax.with_sharding_constraint(token_ids, batch_shard2)
        labels = jax.lax.with_sharding_constraint(labels, batch_shard2)
        return train_step(state, cfg, optimizer, pc_normal, token_ids, labels,
                          remat=remat, block_q=block_q)

    return state, step_fn


def save_train_state(state: TrainState, path: str) -> None:
    """Persist a (possibly sharded) TrainState with orbax. Works for
    sharded trees directly — orbax gathers per-shard data from each
    device; no host-side full replica is built first."""
    from meshanything_tpu.runtime.checkpoint import save_orbax

    save_orbax({"params": state.params, "opt_state": state.opt_state,
                "step": state.step}, path)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Resume: restore a checkpoint saved by save_train_state directly
    onto the shardings of ``template`` (a freshly-built state from
    make_sharded_train_step on the target mesh). Each device reads only
    its shard from storage, so resuming on a multi-chip mesh never
    materializes the full optimizer state on one host — the TPU-native
    replacement for torch.load + DDP broadcast."""
    from meshanything_tpu.runtime.checkpoint import (
        from_plain_tree,
        load_orbax_sharded,
    )

    # leaves the trainer left without an explicit mesh placement
    # (optimizer step counters, template.step) restore as replicated on
    # the params' mesh — a committed single-device leaf would otherwise
    # clash with the mesh-sharded params inside the jitted step
    mesh = next(x.sharding.mesh for x in jax.tree_util.tree_leaves(template.params)
                if isinstance(x.sharding, NamedSharding))
    repl = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(
        lambda x: x.sharding if isinstance(x.sharding, NamedSharding) else repl,
        {"params": template.params, "opt_state": template.opt_state,
         "step": template.step})
    tree = load_orbax_sharded(path, shardings)
    # rebuild optax's NamedTuple containers matching leaves by FIELD
    # NAME — flattened-order pairing silently swaps same-shaped leaves
    # (e.g. adam's mu/nu) for any state whose field order differs from
    # sorted-key order
    return TrainState(params=tree["params"],
                      opt_state=from_plain_tree(tree["opt_state"],
                                                template.opt_state),
                      step=tree["step"])


def _step_dirs(ckpt_dir: str):
    """Sorted [(step, path)] of step_N checkpoint dirs under ckpt_dir."""
    import os

    out = []
    if ckpt_dir and os.path.isdir(ckpt_dir):
        for name in os.listdir(ckpt_dir):
            if name.startswith("step_") and name[5:].isdigit():
                out.append((int(name[5:]), os.path.join(ckpt_dir, name)))
    return sorted(out)


def run_training(
    mesh: Mesh,
    cfg: MeshAnythingConfig,
    batches,
    *,
    steps: int,
    params=None,
    optimizer: Optional[optax.GradientTransformation] = None,
    ckpt_dir: Optional[str] = None,
    save_every: int = 0,
    resume: bool = False,
    log_every: int = 10,
    seed: int = 0,
    remat: bool = True,
    block_q: int = 0,
    on_metrics=None,
) -> TrainState:
    """Checkpointed training loop over a batch iterator.

    ``batches`` yields ``(pc_normal, token_ids, labels)`` numpy tuples
    (see make_batch for the contract). Checkpoints land in
    ``ckpt_dir/step_N`` via the sharded orbax path (each device writes/
    reads only its shard); ``resume=True`` restarts from the newest one
    and is bit-identical to an uninterrupted run as long as the iterator
    is deterministic and re-wound by the caller (the loop consumes one
    batch per completed step, so a resumed caller should skip the first
    ``restored_step`` batches — ``python -m meshanything_tpu.training.train``
    does). The reference ships no trainer at all (README.md:123); this is
    the torch-DDP-loop equivalent for the (data, model) mesh.
    """
    import os
    import shutil
    import sys

    if params is None:
        params = ma.init_meshanything_params(jax.random.PRNGKey(seed), cfg)
    state, step_fn = make_sharded_train_step(
        mesh, cfg, params, optimizer, remat=remat, block_q=block_q)

    if resume and ckpt_dir:
        found = _step_dirs(ckpt_dir)
        if found:
            step0, path = found[-1]
            state = restore_train_state(path, state)
            print(f"[train] resumed step {step0} from {path}", file=sys.stderr)

    def _save(st: TrainState) -> str:
        n = int(st.step)
        path = os.path.join(ckpt_dir, f"step_{n}")
        if os.path.exists(path):  # re-save of the same step (crash between save and advance)
            shutil.rmtree(path)
        save_train_state(st, path)
        return path

    last_metrics = None
    while int(state.step) < steps:
        try:
            pc, ids, labels = next(batches)
        except StopIteration:
            break
        state, metrics = step_fn(state, pc, ids, labels)
        last_metrics = metrics
        n = int(state.step)
        if log_every and (n % log_every == 0 or n == steps):
            print(f"[train] step {n}/{steps} "
                  f"loss {float(metrics['loss']):.4f} "
                  f"acc {float(metrics['accuracy']):.4f}", file=sys.stderr)
        if on_metrics is not None:
            on_metrics(n, metrics)
        if ckpt_dir and save_every and n % save_every == 0 and n < steps:
            _save(state)
    if ckpt_dir and last_metrics is not None:
        _save(state)
    return state


def make_batch(cfg: MeshAnythingConfig, rng, batch: int, seq: int):
    """Synthetic teacher-forcing batch: tokens = [bos, codes..., eos];
    labels over [cond ‖ tokens] with -100 on the condition region (the shift
    in shifted_token_ce consumes the cond->bos boundary)."""
    import numpy as np

    pc = rng.normal(size=(batch, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5
    ids = rng.integers(3, cfg.opt.vocab_size, size=(batch, seq)).astype(np.int32)
    ids[:, 0] = cfg.opt.bos_token_id
    ids[:, -1] = cfg.opt.eos_token_id
    labels = np.full((batch, cfg.cond_length + seq), -100, np.int32)
    labels[:, cfg.cond_length:] = ids
    return pc, ids, labels


def grammar_batches(cfg: MeshAnythingConfig, batch: int, *, seed: int = 0,
                    k: int = 5, skip: int = 0, mask_padding: bool = True):
    """Deterministic infinite iterator of face-grammar batches (real
    surface-sampled conditions + serialized face-token streams). On
    resume, pass skip=<restored step>: skipped batches are drawn and
    discarded so the RNG stream — and therefore the resumed run — is
    identical to the uninterrupted one."""
    import numpy as np

    from meshanything_tpu.training.synthetic_grammar import make_grammar_batch

    rng = np.random.default_rng(seed)
    i = 0
    while True:
        b = make_grammar_batch(cfg, rng, batch, k=k, mask_padding=mask_padding)
        if i >= skip:
            yield b
        i += 1


def main(argv=None) -> None:
    """`python -m meshanything_tpu.training.train` — checkpointed trainer
    on the procedural face grammar (the reference ships no trainer;
    real-data token streams plug in via run_training(batches=...))."""
    import argparse

    from meshanything_tpu.config import MeshAnythingConfig, small_test_config
    from meshanything_tpu.parallel.mesh import create_mesh

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dp", type=int, default=1, help="data-parallel axis size")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel axis size")
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--ckpt_dir", type=str, default=None)
    ap.add_argument("--save_every", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--full", action="store_true",
                    help="full 350M config (default: small smoke config)")
    ap.add_argument("--n_max_triangles", type=int, default=100,
                    help="face budget for the full config")
    args = ap.parse_args(argv)

    cfg = (MeshAnythingConfig(n_max_triangles=args.n_max_triangles)
           if args.full else small_test_config())
    mesh = create_mesh(data=args.dp, model=args.tp)
    skip = 0
    if args.resume and args.ckpt_dir:
        found = _step_dirs(args.ckpt_dir)
        skip = found[-1][0] if found else 0
    batches = grammar_batches(cfg, args.batch, seed=args.seed, skip=skip)
    run_training(
        mesh, cfg, batches, steps=args.steps, seed=args.seed,
        optimizer=make_optimizer(args.lr, steps=args.steps),
        ckpt_dir=args.ckpt_dir, save_every=args.save_every,
        resume=args.resume, log_every=args.log_every)


if __name__ == "__main__":
    main()
