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

import sys
from typing import Tuple

import numpy as np


def _log(msg: str) -> None:
    # diagnostics go to stderr: bench.py consumes this module and its
    # stdout must stay pure JSON metric lines
    print(msg, file=sys.stderr, flush=True)

from meshanything_tpu.config import MeshAnythingConfig


def grid_mesh(rng: np.random.Generator, k: int = 5, smooth: int = 2,
              jitter: float = 0.0):
    """A (k x k) height-field terrain: the canonical structured artist
    mesh (shared vertices between adjacent faces).

    jitter > 0 perturbs every vertex coordinate with Gaussian noise of
    that scale AFTER smoothing — each draw then has unique, unmemorizable
    coordinates while the face/topology grammar stays fixed (the
    higher-entropy training task of VERDICT r4 #7)."""
    xs = np.linspace(-0.4, 0.4, k)
    zs = np.linspace(-0.4, 0.4, k)
    h = rng.normal(size=(k, k)) * 0.1
    for _ in range(smooth):
        h = 0.25 * (np.roll(h, 1, 0) + np.roll(h, -1, 0)
                    + np.roll(h, 1, 1) + np.roll(h, -1, 1))
    vertices = np.array([[xs[i], h[i, j], zs[j]] for i in range(k) for j in range(k)])
    if jitter > 0:
        vertices = vertices + rng.normal(size=vertices.shape) * jitter
    faces = []
    for i in range(k - 1):
        for j in range(k - 1):
            a = i * k + j
            faces.append([a, a + 1, a + k])
            faces.append([a + 1, a + k + 1, a + k])
    return vertices, np.asarray(faces, np.int64)


_CHAIN_PERM_SEED = 1234567


def _chain_perm(lo: int, hi: int) -> np.ndarray:
    """The fixed pseudo-random bin permutation that defines the chain
    grammar's height transitions (a grammar RULE, so it is shared by
    every mesh and every batch — the model has to learn the table)."""
    return np.random.default_rng(_CHAIN_PERM_SEED).permutation(
        np.arange(lo, hi))


def chain_grid_mesh(rng: np.random.Generator, k: int = 5, bins: int = 128,
                    per_mesh_perm: bool = False):
    """The chain grammar (VERDICT r4 #7): a (k x k) grid whose vertex
    heights follow a fixed pseudo-random permutation orbit in BIN space
    — bin(next new vertex) = PERM[bin(previous new vertex)] in stream
    first-appearance order, start bin drawn per mesh — while the point
    cloud is built from the FLAT base grid.

    Why: the noisy-jitter variant failed to lower natural Jacobi
    acceptance (measured 7.904, PERF.md r5) because the point-cloud
    condition fully determines every coordinate, so greedy argmax is
    condition-driven and stable under stale in-window context. Here the
    heights exist ONLY in the token stream (the condition is a flat
    plane): each new-vertex height token's argmax is a function of the
    PREVIOUS height token ~9-18 positions back, so a stale Jacobi guess
    upstream genuinely flips downstream predictions — mispredict
    recovery becomes a measurement instead of a max_accept simulation.

    Returns (v_tokens, v_pc, faces): v_tokens carries the walk (token
    stream source), v_pc is the flat grid (condition source). Heights
    are placed at exact bin centers so discretization is lossless.

    per_mesh_perm: draw the permutation fresh per mesh (from rng)
    instead of the fixed grammar rule. MEASURED r5: the fixed orbit
    FAILED to lower 350M acceptance (7.904 — with a single global
    permutation the model learns the composed maps PERM^n and predicts
    window position i from pre-window context alone, so stale in-window
    guesses never flip an argmax; the small CPU config, which cannot
    memorize the composed tables, measured 4.31). A per-mesh permutation
    removes the memorizable rule entirely — and MEASURED r5, the 350M
    STILL saturates at 7.904: an unlearnable transition trains a ~flat
    conditional whose argmax is a constant marginal mode, which is just
    as Jacobi-stable as a memorized one. (The CPU prototype's 4.38 came
    from an under-trained model with noisy conditionals.) Conclusion
    recorded in PERF.md r5: converged greedy models are Jacobi-saturated
    on both learnable AND unlearnable synthetic grammars; the honest low
    band stays the max_accept cap."""
    xs = np.linspace(-0.4, 0.4, k)
    zs = np.linspace(-0.4, 0.4, k)
    base = np.array([[xs[i], 0.0, zs[j]] for i in range(k) for j in range(k)])
    faces = []
    for i in range(k - 1):
        for j in range(k - 1):
            a = i * k + j
            faces.append([a, a + 1, a + k])
            faces.append([a + 1, a + k + 1, a + k])
    faces = np.asarray(faces, np.int64)

    # keep the walk inside the grid's coordinate envelope (|y| <= ~.36)
    lo, hi = int(round(0.15 * bins)), int(round(0.85 * bins))
    if per_mesh_perm:
        perm = rng.permutation(np.arange(lo, hi))
    else:
        perm = _chain_perm(lo, hi)

    # first-appearance order in the face serialization: the chain is a
    # STREAM-local dependency (each new height token depends on the one
    # that last appeared), which is what Jacobi windows break
    order, seen = [], set()
    for f in faces:
        for vid in f:
            if vid not in seen:
                seen.add(vid)
                order.append(int(vid))

    vbins = np.empty(k * k, np.int64)
    b = int(rng.integers(lo, hi))
    for vid in order:
        vbins[vid] = b
        b = int(perm[b - lo])

    v_tokens = base.copy()
    v_tokens[:, 1] = (vbins + 0.5) / bins - 0.5
    return v_tokens, base, faces


def mesh_to_token_stream(vertices: np.ndarray, faces: np.ndarray,
                         bins: int = 128) -> np.ndarray:
    """Discretize + serialize like the real data: 9 tokens per face
    (3 vertices x 3 coords, meshanything.py:214-223 inverse), +3 special
    offset."""
    disc = np.clip(((vertices + 0.5) * bins).astype(np.int64), 0, bins - 1)
    return (disc[faces].reshape(-1) + 3).astype(np.int32)


def make_grammar_batch(cfg: MeshAnythingConfig, rng: np.random.Generator,
                       batch: int, k: int = 5,
                       mask_padding: bool = False,
                       jitter: float = 0.0,
                       chain=False) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Teacher-forcing batch over synthetic meshes: real surface-sampled
    point clouds as conditions, [bos, face tokens..., eos] streams
    padded with eos to generate_length.

    mask_padding: label the eos padding tail (everything after the first
    eos) with -100. Without it ~2/3 of the loss mass is trivially
    learnable eos, which dilutes the coordinate gradient — measured at
    350M the optimizer then settles into a structure-only attractor
    (content at near-uniform 4.4 nats, total 1.42) whose greedy decode
    emits eos immediately.

    chain: use the chain grammar (chain_grid_mesh) — token streams from
    the permutation-walked mesh, point clouds from the flat base grid
    (bins capped so the walk never hits the vocab clip below)."""
    from meshanything_tpu.geometry.sample import sample_surface_with_normals

    seq = cfg.generate_length
    bins = cfg.nrd.discrete_num
    if chain:
        bins = min(bins, cfg.opt.vocab_size - 4)
    pcs, streams, lengths = [], [], []
    for _ in range(batch):
        if chain:
            v, v_pc, f = chain_grid_mesh(rng, k=k, bins=bins,
                                         per_mesh_perm=chain == "rand")
        else:
            v, f = grid_mesh(rng, k=k, jitter=jitter)
            v_pc = v
        toks = mesh_to_token_stream(v, f, bins)
        # clip vocab for small test configs
        toks = np.minimum(toks, cfg.opt.vocab_size - 1)
        stream = np.full((seq,), cfg.opt.eos_token_id, np.int32)
        stream[0] = cfg.opt.bos_token_id
        n = min(len(toks), seq - 2)
        stream[1:1 + n] = toks[:n]
        streams.append(stream)
        lengths.append(1 + n + 1)  # bos + content + one labeled eos
        pcs.append(sample_surface_with_normals(v_pc, f, cfg.perceiver.num_points, rng))
    pc = np.stack(pcs).astype(np.float32)
    ids = np.stack(streams)
    labels = np.full((batch, cfg.cond_length + seq), -100, np.int32)
    labels[:, cfg.cond_length:] = ids
    if mask_padding:
        for row, n in enumerate(lengths):
            labels[row, cfg.cond_length + n:] = -100
    return pc, ids, labels


def train_on_grammar(cfg: MeshAnythingConfig, steps: int = 200, batch: int = 8,
                     k: int = 5, seed: int = 0, lr: float = 3e-3,
                     refresh_every: int = 0, verbose: bool = False,
                     mask_padding: bool = False, jitter: float = 0.0,
                     chain=False):
    """Train a MeshAnything decoder on the grammar; returns
    (params, final_loss).

    refresh_every > 0 draws a fresh batch of procedural meshes every N
    steps (structural generalization instead of batch memorization —
    used by the full-scale probe); 0 keeps one fixed batch (the fast
    unit-test mode). k may be an int or a (lo, hi) range sampled per
    refresh."""
    import jax
    import jax.numpy as jnp
    import optax

    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.training.train import TrainState, loss_fn

    params = ma.init_meshanything_params(jax.random.PRNGKey(seed), cfg)
    # clip + warmup-cosine (training/optim.py): without clipping the
    # fast-learning regime (lr >=2e-4 at 350M) reaches loss ~1.2 by
    # step 50 then explodes; with a low enough lr to stay stable it
    # instead gets trapped in the unigram-marginal plateau (~3.0).
    # Measured on the full-scale probe.
    from meshanything_tpu.training.optim import make_optimizer

    optimizer = make_optimizer(lr, steps=steps)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    import functools

    # donate the state: without aliasing, old+new params+adam moments
    # live simultaneously (~12 GB for the 350M model) and the full-scale
    # probe OOMs the v5e
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, pc, ids, labels):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, cfg, pc, ids, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        return TrainState(
            optax.apply_updates(state.params, updates), opt_state, state.step + 1
        ), metrics

    rng = np.random.default_rng(seed)

    def draw():
        kk = k if isinstance(k, int) else int(rng.integers(k[0], k[1] + 1))
        pc, ids, labels = make_grammar_batch(cfg, rng, batch, k=kk,
                                             mask_padding=mask_padding,
                                             jitter=jitter, chain=chain)
        return jnp.asarray(pc), jnp.asarray(ids), jnp.asarray(labels)

    pc, ids, labels = draw()
    loss = float("nan")
    for i in range(steps):
        if refresh_every and i and i % refresh_every == 0:
            pc, ids, labels = draw()
        state, metrics = step_fn(state, pc, ids, labels)
        loss = float(metrics["loss"])
        if verbose and (i % 25 == 0 or i == steps - 1):
            _log(f"step {i}: loss {loss:.4f}")
    return state.params, loss


def measure_lookahead_acceptance(params, cfg: MeshAnythingConfig, pc: np.ndarray,
                                 window: int = 8, bucket: int = 32,
                                 attn: str = "xla",
                                 max_accept: int | None = None):
    """Run plain greedy and lookahead decoding on the same conditions;
    return a dict with acceptance (tokens per window forward) and token
    agreement vs plain greedy up to each row's eos.

    max_accept caps the per-forward acceptance (bench.py's honest
    acceptance-band knob, VERDICT r3 #5): the grammar probe model is
    near-degenerate (accepts ~7.9/8), while the converged small model
    bounds realistic acceptance at ~4.0 — capping re-creates that
    regime on the full 350M wall-clock without changing the stream."""
    import jax.numpy as jnp

    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.models import perceiver as per_mod
    from meshanything_tpu.models import shape_opt as sopt
    from meshanything_tpu.models.lookahead import generate_lookahead

    # activations must follow the param dtype (bf16 params + f32
    # activations would mix dtypes inside the KV cache update)
    dtype = params["opt"]["cond_embed"].dtype
    pc = jnp.asarray(pc, dtype)
    pf = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pc)
    cond = ma.process_point_feature(params, cfg, pf)

    plain = np.asarray(sopt.generate(
        params["opt"], cfg.opt, cond, max_new_tokens=cfg.generate_length,
        bucket=bucket, attn=attn if attn != "xla" else "xla"))
    look, stats = generate_lookahead(
        params["opt"], cfg.opt, cond, max_new_tokens=cfg.generate_length,
        window=window, bucket=bucket, attn=attn, return_stats=True,
        max_accept=max_accept)
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


def _flatten_tree(tree, prefix=""):
    """Nested dict of arrays -> flat {'a/b/c': np.ndarray} (npz-safe)."""
    out = {}
    for key, val in tree.items():
        path = f"{prefix}/{key}" if prefix else str(key)
        if isinstance(val, dict):
            out.update(_flatten_tree(val, path))
        else:
            out[path] = np.asarray(val)
    return out


def _unflatten_tree(flat):
    out = {}
    for path, val in flat.items():
        parts = path.split("/")
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return out


def get_trained_350m(steps: int = 600, batch: int = 4, n_max_triangles: int = 100,
                     lr: float = 1e-3, seed: int = 0,
                     cache: str | None = None, variant: str = "fixed"):
    """Load-or-train the full 350M architecture on the face grammar;
    returns (bf16 params, cfg). ``cache`` (default the
    GRAMMAR_PROBE_CACHE env var, falling back to a /tmp path KEYED BY
    the training knobs — a cache written for one (steps, batch,
    n_max_triangles, lr, seed) tuple must never be loaded for another)
    persists the trained f32 tree as a flat npz so bench runs across
    processes pay the ~10 min train+compile once per machine."""
    import os
    import time

    import jax
    import jax.numpy as jnp

    from meshanything_tpu.config import MeshAnythingConfig

    cfg = MeshAnythingConfig(n_max_triangles=n_max_triangles)
    t0 = time.time()
    if cache is None:
        tag = "" if variant == "fixed" else f"_{variant}"
        default = (f"/tmp/grammar350m_s{steps}b{batch}"
                   f"n{n_max_triangles}lr{lr:g}seed{seed}{tag}.npz")
        env = {"fixed": "GRAMMAR_PROBE_CACHE",
               "noisy": "GRAMMAR_PROBE_CACHE_NOISY",
               "chain": "GRAMMAR_PROBE_CACHE_CHAIN",
               "chainrand": "GRAMMAR_PROBE_CACHE_CHAINRAND"}[variant]
        cache = os.environ.get(env, default)
    if cache and os.path.exists(cache):
        flat = np.load(cache)
        params = _unflatten_tree({k: jnp.asarray(v) for k, v in flat.items()})
        _log(f"loaded trained params from {cache}")
    else:
        # fixed batch of k=5 grids (like the CPU unit test): measured at
        # 350M, the dense k=8 task (98 faces, ~880 content tokens) gets
        # trapped in the unigram-marginal plateau (~3.0) for every lr/
        # warmup/batch combination tried, while k=5 descends within 50
        # steps. mask_padding is essential at this scale: with the eos
        # tail labeled, the optimizer settles into a structure-only
        # attractor (total loss 1.42 = content at near-uniform) whose
        # greedy decode emits eos immediately after bos.
        if variant in ("chain", "chainrand"):
            # Chain grammar (VERDICT r4 #7, second/third attempts):
            # heights are a permutation orbit that exists ONLY in the
            # token stream (flat-plane condition). MEASURED r5: BOTH
            # fail to lower 350M acceptance (7.904 each — chain is
            # composable/memorizable, chainrand trains a flat
            # conditional whose argmax is a constant mode; PERF.md r5
            # "natural lookahead acceptance bands"). Kept as the
            # adversarial-data acceptance row in bench.py.
            params, loss = train_on_grammar(
                cfg, steps=steps, batch=batch, k=5, seed=seed, lr=lr,
                refresh_every=25, verbose=True, mask_padding=True,
                chain="rand" if variant == "chainrand" else True)
        elif variant == "noisy":
            # Higher-entropy task (VERDICT r4 #7): per-vertex coordinate
            # jitter + a fresh mesh batch every 25 steps — the model can
            # learn the face grammar and the vertex-sharing structure
            # but cannot memorize coordinates, so held-out Jacobi
            # acceptance is a MEASUREMENT of mispredict-recovery
            # dynamics, not a near-degenerate replay (the fixed-batch
            # probe accepts ~7.9/8).
            params, loss = train_on_grammar(
                cfg, steps=steps, batch=batch, k=5, seed=seed, lr=lr,
                refresh_every=25, verbose=True, mask_padding=True,
                jitter=0.03)
        else:
            assert variant == "fixed", variant
            params, loss = train_on_grammar(
                cfg, steps=steps, batch=batch, k=5, seed=seed, lr=lr,
                refresh_every=0, verbose=True, mask_padding=True)
        _log(f"trained 350M on grammar: loss {loss:.4f} in {time.time() - t0:.0f}s")
        if cache:
            np.savez(cache, **_flatten_tree(params))
            _log(f"saved trained params to {cache}")

    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    return params, cfg


class TrainedLookaheadProbe:
    """Shared-state trained-weights lookahead probe for bench.py.

    Loading the trained 350M, encoding the held-out grammar conditions,
    and compiling+timing PLAIN greedy all happen once in __init__; each
    ``run(max_accept)`` then pays only the lookahead side (one compile
    of the capped variant + one stats pass + one timed pass). This is
    what lets bench.py emit BOTH ends of the acceptance band (VERDICT
    r3 #5) inside its wall-clock budget: the r4 preflights measured
    293 s for a monolithic high-band pass, and the low band — which
    re-did the load, the plain decode and the plain timing — was then
    skipped 5 s short of its estimate."""

    def __init__(self, window: int = 8, bucket: int = 512, seed: int = 0,
                 cache: str | None = None, variant: str = "fixed"):
        import time

        import jax
        import jax.numpy as jnp

        from meshanything_tpu.models import meshanything as ma
        from meshanything_tpu.models import perceiver as per_mod
        from meshanything_tpu.models import shape_opt as sopt

        self.window, self.bucket = window, bucket
        params, cfg = get_trained_350m(seed=seed, cache=cache, variant=variant)
        self.params, self.cfg = params, cfg
        # held-out conditions from the TRAINING distribution (jittered
        # for the noisy variant, flat-plane for the chain variant —
        # conditions from another variant would be OOD)
        held_pc, _, _ = make_grammar_batch(
            cfg, np.random.default_rng(seed + 99), 2, k=5,
            jitter=0.03 if variant == "noisy" else 0.0,
            chain={"chain": True, "chainrand": "rand"}.get(variant, False))
        self.attn = "pallas" if jax.default_backend() == "tpu" else "xla"
        dtype = params["opt"]["cond_embed"].dtype
        pcj = jnp.asarray(held_pc, dtype)
        pf = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pcj)
        self.cond = ma.process_point_feature(params, cfg, pf)
        # params as jit ARGUMENTS (closure-captured weights ship 1.4 GB
        # of constants through the remote compile service — HTTP 413)
        gen_plain = jax.jit(lambda p, c: sopt.generate(
            p, cfg.opt, c, max_new_tokens=cfg.generate_length,
            bucket=bucket, attn=self.attn))
        self.plain = np.asarray(gen_plain(params["opt"], self.cond))
        t0 = time.time()
        out = gen_plain(params["opt"], self.cond)
        jax.device_get(np.asarray(out).ravel()[0])
        self.t_plain = time.time() - t0

    def run(self, max_accept: int | None = None, window: int | None = None):
        """One band point: acceptance + agreement vs the shared plain
        stream, and jitted lookahead wall-clock (same methodology as
        the plain timing in __init__). The plain side is
        window-independent, so sweeping window/max_accept through run()
        reuses everything __init__ paid for.

        Caveat (ADVICE r4): the returned speedup divides the SHARED
        t_plain (measured once in __init__) by a t_look measured
        possibly minutes later; on the single-tenant chip drift is
        negligible, but band/sweep points are not strictly
        back-to-back pairs — t_plain in the dict is the shared value."""
        import time

        import jax

        from meshanything_tpu.models.lookahead import generate_lookahead

        window = self.window if window is None else window
        cfg, params = self.cfg, self.params
        gen_look = jax.jit(lambda p, c: generate_lookahead(
            p, cfg.opt, c, max_new_tokens=cfg.generate_length,
            window=window, bucket=self.bucket, attn=self.attn,
            max_accept=max_accept, return_stats=True))
        look, stats = gen_look(params["opt"], self.cond)  # compile + stats
        look = np.asarray(look)
        t0 = time.time()
        out, _ = gen_look(params["opt"], self.cond)
        jax.device_get(np.asarray(out).ravel()[0])
        t_look = time.time() - t0

        emitted = int(np.sum(np.asarray(stats["emitted"]) - 1))
        iters = max(int(np.asarray(stats["iterations"])), 1)
        plain = self.plain
        b = plain.shape[0]
        agree, total = 0, 0
        for row in range(b):
            eos = np.where(plain[row] == cfg.opt.eos_token_id)[0]
            limit = (eos[0] + 1) if len(eos) else plain.shape[1]
            agree += int((look[row, :limit] == plain[row, :limit]).sum())
            total += int(limit)
        return {
            "acceptance": emitted / (iters * b),
            "agreement": agree / max(total, 1),
            "t_plain": self.t_plain,
            "t_look": t_look,
            "speedup": self.t_plain / max(t_look, 1e-9),
            "window": window,
            "plain_tokens": total,
        }


    def run_adaptive(self, max_accept: int | None = None,
                     windows: tuple = (8, 16), check_iters: int = 16):
        """Adaptive-window band point (VERDICT r4 #2): the shared
        controller (models/lookahead.py::run_adaptive_controller) over
        two jitted bounded-segment programs on the trained model. On
        the saturating grammar model it should match the fixed W=16
        wall-clock; under max_accept=4 it should match-or-beat fixed
        W=8 (the controller never leaves the small window when
        acceptance is capped below the switch-up threshold)."""
        import time

        import jax
        import jax.numpy as jnp

        from meshanything_tpu.models import lookahead as la_mod

        cfg, params = self.cfg, self.params
        gl = cfg.generate_length
        bucket = self.bucket
        big = max(windows)
        s_max = -(-(cfg.cond_length + gl + big) // bucket) * bucket
        interp = self.attn.startswith("pallas") and jax.default_backend() != "tpu"

        init = jax.jit(lambda p, c: la_mod.init_lookahead_state(
            p, cfg.opt, c, max_new_tokens=gl, window=windows[0],
            bucket=bucket, attn=self.attn, buf_window=big))
        seg = jax.jit(
            lambda p, st, until, window: la_mod.lookahead_segment(
                p, cfg.opt, st, s_max=s_max, max_new_tokens=gl,
                window=window, attn=self.attn, bucket=bucket,
                until_iters=until, max_accept=max_accept, interpret=interp),
            static_argnames=("window",), donate_argnums=(1,))

        def run_once(trace=None):
            st = init(params["opt"], self.cond)
            return la_mod.run_adaptive_controller(
                st, lambda s, u, w: seg(params["opt"], s, u, window=w),
                windows=windows, check_iters=check_iters,
                max_new_tokens=gl, trace=trace)

        trace: list = []
        st = run_once(trace)            # compiles whichever windows engage
        look = np.asarray(st.tokens[:, :gl])
        emitted = int(np.sum(np.asarray(st.steps) - 1))
        iters = max(int(np.asarray(st.iters)), 1)
        t0 = time.time()
        st2 = run_once()
        import jax as _jax
        _jax.device_get(np.asarray(st2.tokens).ravel()[0])
        t_look = time.time() - t0

        plain = self.plain
        b = plain.shape[0]
        agree, total = 0, 0
        for row in range(b):
            eos = np.where(plain[row] == cfg.opt.eos_token_id)[0]
            limit = (eos[0] + 1) if len(eos) else plain.shape[1]
            agree += int((look[row, :limit] == plain[row, :limit]).sum())
            total += int(limit)
        return {
            "acceptance": emitted / (iters * b),
            "agreement": agree / max(total, 1),
            "t_plain": self.t_plain,
            "t_look": t_look,
            "speedup": self.t_plain / max(t_look, 1e-9),
            "windows": windows,
            "trace": trace,
            "plain_tokens": total,
        }


def trained_lookahead_bench(window: int = 8, bucket: int = 512, seed: int = 0,
                            cache: str | None = None,
                            max_accept: int | None = None):
    """One-shot wrapper around TrainedLookaheadProbe (kept as the
    documented CLI/API entry; bench.py uses the probe class directly so
    the two band ends share the model load and the plain timing)."""
    probe = TrainedLookaheadProbe(window=window, bucket=bucket, seed=seed,
                                  cache=cache)
    return probe.run(max_accept=max_accept)


def full_scale_probe(steps: int = 600, batch: int = 4, n_max_triangles: int = 100,
                     lr: float = 1e-3, window: int = 8, seed: int = 0):
    """Train the FULL 350M architecture on the grammar on one chip, then
    measure lookahead acceptance and wall-clock speedup with trained
    (structured) weights — the defensible alternative to random-weight
    lookahead numbers (PERF.md caveat) while real checkpoints are
    unavailable offline.

    Run: ``python -m meshanything_tpu.training.synthetic_grammar``
    (TPU; ~15-30 min dominated by remote compiles). Set
    ``GRAMMAR_PROBE_CACHE`` to change the params cache location
    (default /tmp/grammar350m.npz)."""
    import time

    import jax
    import jax.numpy as jnp

    params, cfg = get_trained_350m(
        steps=steps, batch=batch, n_max_triangles=n_max_triangles,
        lr=lr, seed=seed)

    # measure ON-distribution: (a) the training conditions (greedy
    # replays the learned grammar-structured streams — the acceptance
    # question is how many of those tokens Jacobi confirms per window)
    # and (b) held-out same-size k=5 meshes. OOD sizes (k=6) make the
    # model emit eos immediately (measured: 0 tokens generated), which
    # measures nothing.
    train_pc, _, _ = make_grammar_batch(cfg, np.random.default_rng(seed), 2, k=5)
    held_pc, _, _ = make_grammar_batch(cfg, np.random.default_rng(seed + 99), 2, k=5)

    attn = "pallas" if jax.default_backend() == "tpu" else "xla"
    stats = None
    for label, pc in (("train-cond", train_pc), ("heldout-cond", held_pc)):
        s = measure_lookahead_acceptance(
            params, cfg, pc, window=window, bucket=512, attn=attn)
        print(f"{label}: acceptance {s['acceptance']:.2f} tokens/row/forward "
              f"(window {window}, {s['plain_tokens']} plain tokens); "
              f"agreement vs plain greedy: {s['agreement']:.4f}", flush=True)
        if stats is None:
            stats, pc_timed = s, pc

    # wall-clock: plain vs lookahead on the same conditions
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.models import perceiver as per_mod
    from meshanything_tpu.models import shape_opt as sopt
    from meshanything_tpu.models.lookahead import generate_lookahead

    pcj = jnp.asarray(pc_timed, jnp.bfloat16)
    pf = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pcj)
    cond = ma.process_point_feature(params, cfg, pf)

    # jit-wrap: generate()/generate_lookahead() are un-jitted Python
    # orchestration, and re-tracing a 24-layer scan per call costs
    # seconds of host time on a 1-core host — it swamped the device
    # time and showed a fake ~1.1x "speedup" in earlier probe runs.
    # params MUST be a jit argument: closure-captured weights ship as
    # 1.4 GB of constants through the remote compile service (HTTP 413
    # — same lesson as runtime/bwprobe.py)
    gen_plain = jax.jit(lambda p, c: sopt.generate(
        p, cfg.opt, c, max_new_tokens=cfg.generate_length,
        bucket=512, attn=attn))
    gen_look = jax.jit(lambda p, c: generate_lookahead(
        p, cfg.opt, c, max_new_tokens=cfg.generate_length,
        window=window, bucket=512, attn=attn))

    def timed(fn, label):
        out = fn(params["opt"], cond)
        jax.device_get(np.asarray(out).ravel()[0])
        t0 = time.time()
        out = fn(params["opt"], cond)
        jax.device_get(np.asarray(out).ravel()[0])
        dt = time.time() - t0
        print(f"{label}: {dt:.3f}s", flush=True)
        return dt

    t_plain = timed(gen_plain, "plain greedy")
    t_look = timed(gen_look, f"lookahead W={window}")
    print(f"trained-weights lookahead speedup: {t_plain / t_look:.2f}x", flush=True)
    return stats, t_plain, t_look


if __name__ == "__main__":
    full_scale_probe()
