"""Phase-split generation runner.

``models.meshanything.generate`` is one jittable program — right for
tests and graft entry. For production serving the pipeline compiles
three smaller programs instead (encode+condition | AR decode | detok):
compile time drops several-fold, phases can be timed/profiled
independently (runtime/profiling.py), and the host can overlap
postprocessing of batch i with the decode of batch i+1.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from meshanything_tpu.config import MeshAnythingConfig
from meshanything_tpu.models import meshanything as ma
from meshanything_tpu.models import nrd as nrd_mod
from meshanything_tpu.models import perceiver as per_mod
from meshanything_tpu.models import shape_opt as opt_mod


def estimate_kv_bytes(cfg: MeshAnythingConfig, batch: int, bucket: int = 512,
                      int8: bool = False, extra_tokens: int = 0,
                      int4: bool = False) -> int:
    """Upper-bound KV-cache footprint for a generation batch.

    extra_tokens: lookahead windows extend the cache by W slots.
    int4 packs two codes per byte (the per-row f32 scales shared with
    int8 add <1% and are covered by the workspace headroom)."""
    c = cfg.cond_length
    s_max = -(-(c + cfg.generate_length + extra_tokens) // bucket) * bucket
    o = cfg.opt
    elems = 2 * o.num_layers * batch * s_max * o.hidden_size
    if int4:
        return elems // 2
    return elems * (1 if int8 else 2)


def param_tree_bytes(params) -> int:
    """Actual device footprint of a parameter pytree."""
    return sum(
        x.size * jnp.dtype(x.dtype).itemsize for x in jax.tree_util.tree_leaves(params)
    )


def check_memory_budget(cfg: MeshAnythingConfig, batch: int, bucket: int = 512,
                        attn: str = "auto", limit_bytes: int = int(15.0e9),
                        param_bytes: Optional[int] = None,
                        extra_tokens: int = 0) -> None:
    """Refuse configurations that would OOM-crash the TPU worker (an HBM
    overrun on this platform kills the worker for ~10 min rather than
    raising).

    Model (validated against chipless AOT memory analysis + on-chip
    runs, PERF.md r3): the peak program is either the decode (ONE cache
    copy — the pad-then-stack double buffering is fixed,
    shape_opt._assemble_cache — plus params and ~0.5 GB of loop
    transients) or encode/detok (params plus batch-scaled bf16
    hidden-state transients; the f32 N^2 score matrices are gone —
    flash_attention_full). Physical HBM is 16 GiB; the limit keeps
    ~2 GB of headroom for the runtime. NOTE: what r1-r3 first read as a
    ~13 GB memory envelope was actually the worker's ~60 s
    per-program-execution watchdog — now handled by segmenting long
    decodes (PhaseRunner dispatches decode_segment repeatedly), so
    capacity is the only thing this guard models.

    param_bytes: measured param-tree size (param_tree_bytes); defaults
    to the 350M-model bf16 slab if not supplied."""
    int8 = attn == "pallas_int8"
    int4 = attn == "pallas_int4"
    kv = estimate_kv_bytes(cfg, batch, bucket, int8, extra_tokens, int4=int4)
    weights = int(350e6 * 2) if param_bytes is None else param_bytes
    p, n = cfg.perceiver, cfg.nrd
    ntok = n.cond_length + cfg.n_max_triangles
    act_row = 16 * (p.num_points * p.width + ntok * n.hidden_size)
    overhead = min(int(0.5e9), max(weights, 1) * 2)  # scaled down for test configs
    est = weights + max(kv + overhead, batch * act_row)
    if est > limit_bytes:
        raise ValueError(
            f"estimated device footprint {est / 1e9:.1f} GB exceeds the "
            f"{limit_bytes / 1e9:.1f} GB budget for batch={batch} "
            f"(kv cache {kv / 1e9:.1f} GB). Reduce --batchsize_per_gpu, "
            "use --attn pallas_int8/pallas_int4 (smaller cache), or shard "
            "the batch over more chips (parallel/mesh.py)."
        )


class PhaseRunner:
    """Three compiled programs sharing the params tree."""

    def __init__(self, params, cfg: MeshAnythingConfig, *, bucket: int = 512,
                 attn: str = "auto", early_exit: bool = True,
                 lookahead: "int | str" = 0,
                 wq: bool = False, aot_dir: Optional[str] = None,
                 adaptive_windows: tuple = (8, 16),
                 adaptive_check_iters: int = 64):
        """aot_dir: directory for serialized compiled executables
        (runtime/aot.py) — a second process cold-starts by
        deserializing instead of paying the multi-minute decode compile
        (the persistent XLA cache cannot capture this platform's
        server-side compiles).

        lookahead="adaptive": acceptance-adaptive window — TWO compiled
        lookahead segment programs (adaptive_windows, default 8/16)
        share one state layout (buf_window = the larger), and a host
        controller reads the (steps, iters) counters every
        adaptive_check_iters window forwards to switch width on
        measured acceptance (models/lookahead.py::resize_window). The
        r4 W-sweep showed W=16 winning 22% at B=1 *iff* acceptance
        tracks the window — unknowable before the real checkpoint's
        acceptance is seen, hence measured at runtime."""
        from meshanything_tpu.runtime.aot import AotFunction, AotStore

        self.params = params
        self.cfg = cfg
        self.attn = attn
        self.bucket = bucket
        self._adaptive = lookahead == "adaptive"
        if self._adaptive:
            if len(adaptive_windows) != 2 or adaptive_windows[0] >= adaptive_windows[1]:
                raise ValueError(f"adaptive_windows must be (small, big): {adaptive_windows}")
            lookahead = adaptive_windows[0]
            self._la_windows = tuple(adaptive_windows)
            self._adapt_check = adaptive_check_iters
        self._lookahead = lookahead
        self.window_trace: list = []   # (iters, window, acceptance) per check
        buf_window = self._la_windows[1] if self._adaptive else lookahead
        dtype = cfg.activation_dtype
        store = AotStore(aot_dir) if aot_dir else None
        self._buf_window = buf_window
        ctx = repr((cfg, bucket, attn, early_exit, lookahead, wq,
                    self._adaptive and self._la_windows))

        def encode(params, pc_normal):
            pf = per_mod.encode_latents(params["perceiver"], cfg.perceiver,
                                        pc_normal.astype(dtype))
            cond = ma.process_point_feature(params, cfg, pf)
            return pf, cond

        def decode(params, cond, key, sampling):
            if lookahead > 0:
                from meshanything_tpu.models.lookahead import generate_lookahead

                # composes with attn="pallas_int8" (multi-query int8
                # kernel) and sampling=True (speculative sampling)
                return generate_lookahead(
                    params["opt"], cfg.opt, cond,
                    max_new_tokens=cfg.generate_length,
                    window=lookahead, bucket=bucket, attn=attn, wq=wq,
                    sampling=sampling, key=key,
                )
            return opt_mod.generate(
                params["opt"], cfg.opt, cond,
                max_new_tokens=cfg.generate_length,
                key=key, sampling=sampling, bucket=bucket,
                early_exit=early_exit, attn=attn, wq=wq,
            )

        def decode_prompt(params, cond, key, prompt_ids, sampling):
            # prompt-seeded continuation (mesh completion); compiled per
            # prompt length — the completion path is a one-off, not the
            # folder-inference hot loop
            if lookahead > 0:
                from meshanything_tpu.models.lookahead import generate_lookahead

                return generate_lookahead(
                    params["opt"], cfg.opt, cond,
                    max_new_tokens=cfg.generate_length,
                    window=lookahead, bucket=bucket, attn=attn, wq=wq,
                    prompt_ids=prompt_ids, sampling=sampling, key=key,
                )
            return opt_mod.generate(
                params["opt"], cfg.opt, cond,
                max_new_tokens=cfg.generate_length,
                key=key, sampling=sampling, bucket=bucket,
                early_exit=early_exit, attn=attn, wq=wq,
                prompt_ids=prompt_ids,
            )

        def detok(params, raw, pf):
            ids = ma.token_postprocess(cfg, raw)
            codes = ma.get_codes(params, cfg, ids)
            return nrd_mod.decode_faces(
                params["nrd"], cfg.nrd, ids, codes.astype(dtype), pf
            )

        # Segmented decode (plain-pallas path): the axon worker kills any
        # single program execution past ~60 s (PERF.md r3), which full-
        # length decodes exceed at large batch (bf16 B=16 ~73 s, int4
        # B=32 ~64 s). One compiled segment program is dispatched
        # ceil(gl/seg) times with the state donated between calls; a
        # finished segment is a no-op, so the fixed schedule costs
        # nothing and needs no host round-trips.
        resolved = attn if attn != "auto" else (
            "pallas" if jax.default_backend() == "tpu" else "xla")
        interp = resolved.startswith("pallas") and jax.default_backend() != "tpu"
        self._segmented = resolved.startswith("pallas")
        if self._adaptive and not self._segmented:
            # the XLA fallback runs one fused while_loop program — there
            # is no segment boundary to read counters at, so adaptivity
            # degrades to a fixed window of the SMALL width (correct
            # stream, no switching); the pallas paths get the controller
            import warnings

            warnings.warn(
                "lookahead='adaptive' requires the segmented pallas decode "
                f"path (attn={resolved!r} resolved non-pallas); running with "
                f"a fixed window of {lookahead}")
        gl = cfg.generate_length
        if lookahead > 0:
            # bound by window forwards (st.iters): ~42 ms each at large
            # batch -> ~17 s/segment; worst case (acceptance 1) is gl
            # forwards, and finished segments are no-ops
            seg = 400
            self._seg_bounds = [(i + 1) * seg for i in range(-(-gl // seg))]
            s_max = -(-(cfg.cond_length + gl + buf_window) // bucket) * bucket
        else:
            seg = 1800  # worst measured step rate ~10 ms -> <=18 s/segment
            self._seg_bounds = [min((i + 1) * seg, gl) for i in range(-(-gl // seg))]
            s_max = -(-(cfg.cond_length + gl) // bucket) * bucket

        def decode_init(params, cond, key, sampling):
            if lookahead > 0:
                from meshanything_tpu.models import lookahead as la_mod

                return la_mod.init_lookahead_state(
                    params["opt"], cfg.opt, cond, max_new_tokens=gl,
                    window=lookahead, bucket=bucket, key=key, attn=resolved,
                    sampling=sampling, buf_window=buf_window)
            return opt_mod.init_decode_state(
                params["opt"], cfg.opt, cond, max_new_tokens=gl, key=key,
                sampling=sampling, bucket=bucket, attn=resolved)

        def decode_seg(params, state, until, sampling, window=lookahead):
            if lookahead > 0:
                from meshanything_tpu.models import lookahead as la_mod

                return la_mod.lookahead_segment(
                    params["opt"], cfg.opt, state, s_max=s_max,
                    max_new_tokens=gl, window=window, attn=resolved,
                    bucket=bucket, interpret=interp, wq=wq,
                    sampling=sampling, until_iters=until)
            return opt_mod.decode_segment(
                params["opt"], cfg.opt, state, s_max=s_max, max_new_tokens=gl,
                until=until, early_exit=early_exit, attn=resolved,
                bucket=bucket, interpret=interp, wq=wq, sampling=sampling)

        self._encode = AotFunction(encode, "encode", store=store, context=ctx)
        self._decode = AotFunction(decode, "decode", store=store, context=ctx,
                                   static_argnames=("sampling",))
        self._decode_init = AotFunction(decode_init, "decode_init", store=store,
                                        context=ctx, static_argnames=("sampling",))
        self._decode_seg = AotFunction(decode_seg, "decode_seg", store=store,
                                       context=ctx,
                                       static_argnames=("sampling", "window"),
                                       donate_argnums=(1,))
        self._decode_prompt = AotFunction(
            decode_prompt, "decode_prompt", store=store, context=ctx,
            static_argnames=("sampling",))
        self._detok = AotFunction(detok, "detok", store=store, context=ctx)

    def precompile(self, batch: int, *, sampling: bool = False) -> None:
        """Warm (compile-or-load and persist) every phase program for a
        batch size WITHOUT executing anything — args are shape structs.
        A serving process started with the same aot_dir then cold-starts
        in seconds."""
        cfg = self.cfg
        dtype = cfg.activation_dtype
        sds = jax.ShapeDtypeStruct
        pc = sds((batch, cfg.perceiver.num_points, 6), jnp.float32)
        pf = sds((batch, cfg.perceiver.total_latents, cfg.perceiver.width), dtype)
        cond = sds((batch, cfg.cond_length, cfg.opt.hidden_size), dtype)
        key = jax.eval_shape(lambda: jax.random.PRNGKey(0))
        raw = sds((batch, cfg.generate_length), jnp.int32)
        self._encode.precompile(self.params, pc)
        if self._segmented:
            state = jax.eval_shape(
                lambda p, c, k: self._decode_init._jit(p, c, k, sampling=sampling),
                self.params, cond, key)
            self._decode_init.precompile(self.params, cond, key, sampling=sampling)
            until = sds((), jnp.int32)
            self._decode_seg.precompile(self.params, state, until, sampling=sampling)
            if self._adaptive:
                big = self._la_windows[1]
                state_big = state._replace(window=sds((batch, big), jnp.int32))
                self._decode_seg.precompile(self.params, state_big, until,
                                            sampling=sampling, window=big)
        else:
            self._decode.precompile(self.params, cond, key, sampling=sampling)
        self._detok.precompile(self.params, raw, pf)

    def _run_adaptive(self, state, sampling: bool):
        """Acceptance-adaptive segment dispatch (VERDICT r4 #2): thin
        wrapper over lookahead.run_adaptive_controller — each slice is
        ONE bounded segment program execution (the ~60 s watchdog stays
        satisfied exactly like the fixed schedule), and the trace of
        (iters, window, acceptance) lands in self.window_trace for
        tests and the bench's acceptance-band rows."""
        from meshanything_tpu.models.lookahead import run_adaptive_controller

        self.window_trace = []
        return run_adaptive_controller(
            state,
            lambda st, until, w: self._decode_seg(
                self.params, st, until, sampling=sampling, window=w),
            windows=self._la_windows, check_iters=self._adapt_check,
            max_new_tokens=self.cfg.generate_length, trace=self.window_trace)

    def __call__(self, pc_normal: jax.Array, *, sampling: bool = False,
                 key: Optional[jax.Array] = None, timer=None,
                 prompt_ids: Optional[jax.Array] = None):
        if jax.default_backend() == "tpu":
            check_memory_budget(
                self.cfg, pc_normal.shape[0], self.bucket, self.attn,
                param_bytes=param_tree_bytes(self.params),
                extra_tokens=self._buf_window,
            )
        if key is None:
            key = jax.random.PRNGKey(0)

        import contextlib

        def phase(name):
            return timer.phase(name) if timer is not None else contextlib.nullcontext()

        def fence(x):
            # device_get of one element is the only reliable execution
            # fence on this platform (block_until_ready returns early on
            # the axon backend); only paid when timing is requested.
            if timer is not None:
                jax.device_get(x.ravel()[0])

        with phase("encode"):
            pf, cond = self._encode(self.params, pc_normal)
            fence(cond)
        with phase("decode"):
            if prompt_ids is not None:
                raw = self._decode_prompt(self.params, cond, key,
                                          jnp.asarray(prompt_ids, jnp.int32),
                                          sampling=sampling)
            elif self._segmented:
                state = self._decode_init(self.params, cond, key, sampling=sampling)
                if self._adaptive and self._lookahead > 0:
                    state = self._run_adaptive(state, sampling)
                else:
                    for until in self._seg_bounds:
                        state = self._decode_seg(self.params, state,
                                                 jnp.asarray(until, jnp.int32),
                                                 sampling=sampling)
                # lookahead's token buffer carries +window scratch slots
                raw = state.tokens[:, : self.cfg.generate_length]
            else:
                raw = self._decode(self.params, cond, key, sampling=sampling)
            fence(raw)
        with phase("detok"):
            coords = self._detok(self.params, raw, pf)
            fence(coords)
        return ma.GenerateOutput(face_coords=coords, token_ids=raw)
