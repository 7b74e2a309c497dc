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
    from meshanything_tpu.runtime.checkpoint import load_orbax_sharded

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
    return TrainState(params=tree["params"],
                      opt_state=jax.tree_util.tree_unflatten(
                          jax.tree_util.tree_structure(template.opt_state),
                          jax.tree_util.tree_leaves(tree["opt_state"])),
                      step=tree["step"])


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
