#!/usr/bin/env python
"""Headline benchmark: 800-face max-length mesh generation on one chip.

Prints one JSON line per completed config; the LAST line is the
headline:
  {"metric": "mesh_latency_800f_b16", "value": <seconds per mesh>,
   "unit": "s", "vs_baseline": <A6000_30s / value>}

Methodology: the full 350M pipeline (perceiver encode + condition +
7,202-token AR decode + detokenizer) at the 800-face cap with early-exit
disabled — the honest comparable to the reference's "~30 s per mesh on
A6000" (README.md:116), which is full-length generation. Exact bf16
numerics are the headline; fast modes (int8/int4 KV, lookahead, w8a8)
and the BASELINE.json fixture configs (mouse.npy pc path, wand.obj mesh
path, serving round-trip — each in exact AND fast tiers) are emitted as
secondary metric lines, along with a measured HBM bandwidth floor for
exact mode (the speed-of-light proof — exact bf16 must read 2.73 TB of
KV per mesh, so its per-mesh floor on one chip is bandwidth-bound
regardless of kernel quality).

DEADLINE DISCIPLINE (VERDICT r3 #1 — BENCH_r03 was killed at rc=124 and
lost four metric lines plus the headline re-emit): the run holds itself
to a wall-clock budget (env BENCH_BUDGET_S, default 1500 s — inside the
driver's kill window). Sections are ordered most-informative-first,
each carries a cost estimate and is skipped (with a log line) when the
remaining budget cannot cover it, and an atexit/SIGTERM hook guarantees
the exact-bf16 headline is re-emitted as the final stdout line no
matter what ends the process.

Weights are random (the shipped checkpoint needs network access);
latency is weight-value-independent at fixed token count.
Diagnostics go to stderr. Lines are emitted incrementally so an
external timeout still leaves valid results on stdout.
"""
import atexit
import json
import os
import signal
import sys
import time

import numpy as np

BASELINE_S = 30.0  # A6000 per-mesh latency, reference README.md:116
REF = "/root/reference"
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
T_START = time.monotonic()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def elapsed():
    return time.monotonic() - T_START


def remaining():
    return BUDGET_S - elapsed()


def emit(metric, value, unit="s", vs=None):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 3),
        "unit": unit,
        "vs_baseline": round(BASELINE_S / value if vs is None else vs, 2),
    }), flush=True)


_HEADLINE = {}  # metric -> value; re-emitted last by the exit hook


def _final_emit():
    if _HEADLINE:
        (metric, value), = _HEADLINE.items()
        emit(metric, value)


def _install_exit_hooks():
    atexit.register(_final_emit)

    def _term(signum, frame):
        # sys.exit from a signal handler unwinds through atexit, so the
        # headline still lands last on stdout when the driver's timeout
        # SIGTERMs us (rc stays nonzero — the budget below is what keeps
        # rc=0 in the normal case).
        sys.exit(128 + signum)

    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGINT, _term)


def fits(name, est, reserve=0.0):
    """Budget gate: skip-and-log a section whose estimate no longer
    fits (VERDICT r3 #1 — silent truncation reads as coverage).

    reserve: additionally protect this much budget for sections queued
    BEHIND this one (VERDICT r4 #5 — the int4 B=64 row now runs before
    the trained-probe block but must not be able to starve it)."""
    r = remaining()
    if r < est + reserve:
        log(f"SKIP {name}: est {est:.0f}s{f' + reserve {reserve:.0f}s' if reserve else ''} "
            f"> remaining {r:.0f}s "
            f"(BENCH_BUDGET_S={BUDGET_S:.0f})")
        return False
    log(f"[{elapsed():.0f}s] {name} (est {est:.0f}s, {r:.0f}s left)")
    return True


def run_config(runner, pc, batch, label, gen_len, runs=1,
               single_pass_if_warm=None):
    import jax

    t0 = time.time()
    out = runner(pc)
    jax.device_get(out.token_ids.ravel()[0])
    first = time.time() - t0
    log(f"{label}: compile+first run {first:.1f}s")
    if single_pass_if_warm is not None and first < single_pass_if_warm:
        # The compile service served every program from cache, so the
        # first call IS a clean timed run (dispatch overhead is <1% at
        # these multi-second runtimes) — skip the second pass. Used for
        # the most expensive rows (int4 B=64: ~115 s/run), where the
        # extra pass is the difference between landing in the budget
        # and being SKIP-logged out of the artifact (VERDICT r4 #5).
        per_mesh = first / batch
        log(f"{label}: single-pass timing (warm compile): "
            f"{per_mesh:.3f}s/mesh")
        log(f"meshes/min/chip: {60.0 / per_mesh:.1f}; "
            f"AR tokens/sec/chip: {gen_len / per_mesh:.0f}")
        return per_mesh

    times = []
    for i in range(runs):
        t0 = time.time()
        out = runner(pc)
        jax.device_get(out.token_ids.ravel()[0])
        times.append(time.time() - t0)
        log(f"{label} run {i}: {times[-1]:.3f}s ({times[-1] / batch:.3f}s/mesh)")
    per_mesh = float(np.median(times)) / batch
    log(f"meshes/min/chip: {60.0 / per_mesh:.1f}; "
        f"AR tokens/sec/chip: {gen_len / per_mesh:.0f}")
    return per_mesh


def main():
    import jax
    import jax.numpy as jnp

    from meshanything_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    _install_exit_hooks()

    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.runtime.phases import PhaseRunner

    cfg = MeshAnythingConfig()
    log(f"devices: {jax.devices()}  budget: {BUDGET_S:.0f}s")
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    runner = PhaseRunner(params, cfg, bucket=512, early_exit=False)
    rng = np.random.default_rng(0)
    gl = cfg.generate_length

    def make_pc(batch):
        return jnp.asarray(rng.normal(
            size=(batch, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)

    # --- headline configs (exact bf16, max-length stress) -----------------
    # B=1 first: the p50 single-request exact number, and its compiled
    # programs are reused by the fixture/serving sections below.
    pc1 = make_pc(1)
    fits("exact bf16 B=1", 75)  # logged, but B=1 ALWAYS runs: the driver
    # needs at least one metric line even under a pathological budget
    per1 = run_config(runner, pc1, 1, "exact bf16 B=1", gl, runs=2)
    emit("p50_mesh_latency_800f", per1)
    _HEADLINE.clear()
    _HEADLINE["p50_mesh_latency_800f"] = per1

    # B=16 is the largest exact-bf16 batch that fits HBM (13.2 GB
    # measured); its 75 s decode runs as 5 segments under the axon
    # worker's ~60 s per-program watchdog (PhaseRunner segmented decode,
    # PERF.md r3). Measured 4.695 s/mesh vs 4.87 (B=12) / 5.18 (B=8).
    for bb, metric, est in ((16, "mesh_latency_800f_b16", 330),
                            (12, "mesh_latency_800f_b12", 260),
                            (8, "mesh_latency_800f_b8", 150)):
        if not fits(f"exact bf16 B={bb}", est):
            continue
        try:
            perb = run_config(runner, make_pc(bb), bb, f"exact bf16 B={bb}", gl)
            emit(metric, perb)
            _HEADLINE.clear()
            _HEADLINE[metric] = perb
            break
        except Exception as e:
            log(f"B={bb} failed ({type(e).__name__}: {e}); trying smaller")

    # --- the FAST TIER as the user-facing path (VERDICT r3 #2) -------------
    # --fast preset = w8a8 weights + int8 KV + lookahead 8: 1.0000 token
    # agreement vs exact bf16 on the trained-350M probe (PERF.md r3).
    # Its engine-level 2.27 s/mesh is re-measured here AND driven through
    # the same e2e fixture + serving round-trip as the exact tier, so the
    # single-request path users touch has a driver-visible ≤3 s metric.
    fast_runner = None
    if fits("fast tier w8a8+int8+la8 B=1", 60):
        try:
            fast_runner = PhaseRunner(params, cfg, bucket=512, attn="pallas_int8",
                                      lookahead=8, wq=True, early_exit=True)
            per_fast = run_config(fast_runner, pc1, 1,
                                  "w8a8+int8+lookahead W=8 B=1 (--fast)", gl)
            emit("mesh_latency_800f_w8a8_int8_la8_b1", per_fast)
        except Exception as e:
            fast_runner = None
            log(f"fast tier failed ({type(e).__name__}: {e})")

    if fast_runner is not None and fits("e2e fast fixture", 30):
        try:
            from meshanything_tpu.runtime.pipeline import load_inputs

            path = os.path.join(REF, "pc_examples/mouse.npy")
            if os.path.exists(path):
                for attempt in range(2):  # first call may pay residual compile
                    t0 = time.time()
                    samples = load_inputs("pc_normal", [path],
                                          num_points=cfg.perceiver.num_points, seed=0)
                    pc = jnp.asarray(np.asarray(samples[0].pc_normal, np.float32)[None])
                    out = fast_runner(pc)
                    jax.device_get(out.token_ids.ravel()[0])
                    warm = time.time() - t0
                log(f"mouse_npy_pc_fast: {warm:.3f}s (incl. host preprocessing; "
                    "--fast preset, early exit on)")
                emit("e2e_mouse_npy_pc_fast", warm)
        except Exception as e:
            log(f"e2e fast fixture failed ({type(e).__name__}: {e})")

    # --- exact-tier fixture configs (BASELINE.json): real inputs ----------
    # (defined here, CALLED from the demoted-repeats block at the end —
    # both rows exist in BENCH_r04)
    def e2e_exact_fixtures():
        if not fits("e2e exact fixtures", 70):
            return
        try:
            from meshanything_tpu.runtime.pipeline import load_inputs

            for name, path, itype in (
                ("mouse_npy_pc", os.path.join(REF, "pc_examples/mouse.npy"), "pc_normal"),
                ("wand_obj_mesh", os.path.join(REF, "examples/wand.obj"), "mesh"),
            ):
                if not os.path.exists(path):
                    continue
                warm = None
                for attempt in range(2):
                    t0 = time.time()
                    samples = load_inputs(itype, [path],
                                          num_points=cfg.perceiver.num_points, seed=0)
                    pc = jnp.asarray(np.asarray(samples[0].pc_normal, np.float32)[None])
                    out = runner(pc)  # same shapes as pc1 — compiled programs reused
                    jax.device_get(out.token_ids.ravel()[0])
                    warm = time.time() - t0
                log(f"{name}: warm {warm:.3f}s (incl. host preprocessing)")
                emit(f"e2e_{name}", warm)
        except Exception as e:
            log(f"fixture configs failed ({type(e).__name__}: {e})")

    # --- serving round-trips: exact AND fast tiers -------------------------
    def serving_roundtrip(metric, rt_runner, est):
        if not fits(f"serving {metric}", est):
            return
        try:
            import threading
            import urllib.request
            from http.server import ThreadingHTTPServer

            from meshanything_tpu.serving import ServingEngine, _make_handler

            class _Adapter:
                # PhaseRunner-shaped wrapper dropping the key (greedy bench)
                def __call__(self, pc, sampling=False, key=None):
                    return rt_runner(jnp.asarray(pc))

            engine = ServingEngine(params, cfg, runner=_Adapter(),
                                   artifacts_dir="/tmp/bench_artifacts")
            server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(engine))
            port = server.server_address[1]
            threading.Thread(target=server.serve_forever, daemon=True).start()
            wand = os.path.join(REF, "examples/wand.obj")
            if os.path.exists(wand):
                with open(wand, "rb") as fh:
                    body = fh.read()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/generate", data=body, method="POST")
                with urllib.request.urlopen(req) as r:   # warm the path
                    r.read()
                t0 = time.time()
                with urllib.request.urlopen(urllib.request.Request(
                        f"http://127.0.0.1:{port}/generate", data=body,
                        method="POST")) as r:
                    r.read()
                emit(metric, time.time() - t0)
            server.shutdown()
        except Exception as e:
            log(f"serving {metric} failed ({type(e).__name__}: {e})")

    if fast_runner is not None:
        serving_roundtrip("serving_roundtrip_fast", fast_runner, est=30)
    # (exact-tier round-trip demoted to the repeats block)

    # --- bandwidth-floor proof --------------------------------------------
    if fits("bandwidth floor", 60):
        try:
            from meshanything_tpu.runtime.bwprobe import (
                exact_floor_seconds,
                measure_kernel_bw,
                measure_matmul_bw,
            )

            bw = max(measure_matmul_bw(), measure_kernel_bw())
            log(f"measured HBM BW: {bw:.0f} GB/s")
            (hmetric, hval), = _HEADLINE.items() if _HEADLINE else ((None, None),)
            floor_batch = {"mesh_latency_800f_b16": 16, "mesh_latency_800f_b12": 12,
                           "mesh_latency_800f_b8": 8}.get(hmetric, 1)
            floor = exact_floor_seconds(cfg, bw, batch=floor_batch)
            emit(f"exact_bf16_floor_b{floor_batch}", floor)
            if hval:
                log(f"exact bf16 B={floor_batch} is at {floor / hval * 100:.0f}% "
                    "of the measured-bandwidth speed of light")
        except Exception as e:
            log(f"floor probe failed ({type(e).__name__}: {e})")

    # --- fast-mode latency rows (secondary; quantized KV trades bytes) ----
    # lookahead amortizes one weight read + one KV sweep over every
    # accepted token; random-weight acceptance is the degenerate best
    # case (the face-grammar-trained bound is ~4.0 per row at window 8,
    # tests/test_lookahead.py), so these are fast-mode secondaries.
    # int4 KV packs two codes per byte (ops/kvcache.py), quartering the
    # decode's dominant HBM stream; trained-350M token agreement is
    # 1.0000 for every mode below (PERF.md r3). Long decodes run via the
    # segmented PhaseRunner path under the ~60 s watchdog.
    # r4 reference points (PERF.md): int4+la8 B=24 0.877 / B=48 0.844,
    # int8+la8 B=16 0.921, bf16+la8 B=8 1.567 — the fused window append
    # + grouped MQ matmuls removed the old dispatch overhead, and batch
    # scaling is monotone through B=48.
    def latency_rows(rows, reserve=0.0, single_pass_if_warm=None):
        for attn, batch, la, wq, metric, label, est in rows:
            if not fits(label, est, reserve=reserve):
                continue
            try:
                runner_la = PhaseRunner(params, cfg, bucket=512, attn=attn,
                                        lookahead=la, wq=wq,
                                        early_exit=(la > 0))
                per_la = run_config(runner_la, make_pc(batch), batch, label, gl,
                                    single_pass_if_warm=single_pass_if_warm)
                emit(metric, per_la)
            except Exception as e:
                log(f"{label} failed ({type(e).__name__}: {e})")

    latency_rows((
        ("pallas_int4", 24, 8, False, "mesh_latency_800f_int4_la8_b24",
         "int4+lookahead W=8 B=24", 70),
        ("pallas_int4", 48, 8, False, "mesh_latency_800f_int4_la8_b48",
         "int4+lookahead W=8 B=48 (throughput max)", 110),
    ))
    # (int8+la8 B=16 and bf16+la8 B=8 are demoted to the repeats block —
    # both exist in BENCH_r04 with the same methodology)

    # --- examples/ folder with --mc (the 5th BASELINE config) -------------
    # watertight UDF grid at 2^7 + marching tetrahedra + sampling +
    # generate for both example meshes; the reference flags this as the
    # slow path ("several minutes" per batch on CPU, mesh_to_pc.py:36)
    # r5: preprocessing is ~45x faster than r4 (marching gathers corners
    # only for active cells; native UDF got a CSR index + thread pool) —
    # host share dropped from ~9 s/mesh to ~1.5 s/mesh on this 1-core
    # host. The fast-tier variant composes the cheap preprocessing with
    # the --fast decode (VERDICT r4 #6).
    def folder_mc(metric, tier_runner, est, tier_label):
        if not fits(f"folder --mc {tier_label}", est):
            return
        try:
            from meshanything_tpu.runtime.pipeline import load_inputs

            folder = [os.path.join(REF, "examples/wand.obj"),
                      os.path.join(REF, "examples/screwdriver.obj")]
            folder = [p for p in folder if os.path.exists(p)]
            if folder:
                t0 = time.time()
                samples = load_inputs("mesh", folder, marching_cubes=True,
                                      num_points=cfg.perceiver.num_points, seed=0)
                t_pre = time.time() - t0
                t0 = time.time()
                for s in samples:
                    pc = jnp.asarray(np.asarray(s.pc_normal, np.float32)[None])
                    out = tier_runner(pc)
                    jax.device_get(out.token_ids.ravel()[0])
                t_gen = time.time() - t0
                per = (t_pre + t_gen) / len(folder)
                log(f"folder --mc [{tier_label}]: preprocess {t_pre:.1f}s + "
                    f"generate {t_gen:.1f}s for {len(folder)} meshes = "
                    f"{per:.1f}s/mesh "
                    f"(reference: 'several minutes' of mesh2sdf alone)")
                emit(metric, per, vs=180.0 / per)
        except Exception as e:
            log(f"folder --mc {tier_label} failed ({type(e).__name__}: {e})")

    folder_mc("e2e_folder_mc", runner, 45, "exact")
    if fast_runner is not None:
        folder_mc("e2e_folder_mc_fast", fast_runner, 25, "fast")

    # --- serving under concurrent load (dynamic micro-batching) ------------
    # 8 concurrent engine-level requests coalesce into ONE padded B=8
    # decode launch (runtime/batching.py). Reference serves strictly
    # one request at a time (app.py).
    def batched_serving(metric, tier_runner, est):
        if not fits(f"batched serving {metric}", est):
            return
        try:
            import threading

            from meshanything_tpu.geometry import load_mesh
            from meshanything_tpu.runtime.batching import BatchingRunner
            from meshanything_tpu.serving import ServingEngine

            wand = os.path.join(REF, "examples/wand.obj")
            if not os.path.exists(wand):
                return
            m = load_mesh(wand)
            batched = BatchingRunner(tier_runner, batch_sizes=(1, 2, 4, 8),
                                     max_wait_s=4.0)
            engine_b = ServingEngine(params, cfg, runner=batched,
                                     artifacts_dir="/tmp/bench_artifacts")
            nreq = 8
            done = [None] * nreq
            t0 = time.time()
            threads = [threading.Thread(target=lambda i=i: done.__setitem__(
                i, engine_b.generate_from_mesh(m.vertices, m.faces, seed=0,
                                               render="off",
                                               export_artifacts=False)))
                       for i in range(nreq)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
            if all(r is not None for r in done):
                per = (time.time() - t0) / nreq
                log(f"batched serving [{metric}]: {nreq} concurrent requests, "
                    f"{batched.batch_calls} launches, {per:.2f}s/request")
                emit(metric, per)
            else:
                log(f"batched serving [{metric}] incomplete: "
                    f"{sum(r is None for r in done)}/{nreq} requests failed")
            batched.close()
        except Exception as e:
            log(f"batched serving {metric} failed ({type(e).__name__}: {e})")

    # fast tier FIRST (VERDICT r4 #4: the composition this framework
    # should own — ~8 concurrent --fast requests in one padded B=8
    # lookahead launch); the exact-tier row is kept for comparison.
    if fast_runner is not None:
        batched_serving("serving_batched_8x_fast", fast_runner, est=130)
    # (exact-tier batched row demoted to the repeats block)

    # --- int4 B=64 (driver-visible, VERDICT r4 #5) -------------------------
    # Ahead of the trained block (it was dead last in r4 and
    # budget-skipped out of the artifact) with the trained block's
    # estimate reserved so it cannot starve the acceptance metrics.
    # single_pass_if_warm: one ~110 s run is the measurement when the
    # compile service is warm (r5 measured: clean run 108.6 s; a first
    # call with compile RESIDUE measured 187 s and must NOT qualify —
    # it would report 2.9 s/mesh for a 1.70 s/mesh config — so the
    # threshold sits between the clean-run and residue costs).
    # (int8 B=16 plain is demoted to the repeats block.)
    cache_default = "/tmp/grammar350m_s600b4n100lr0.001seed0.npz"
    cache_path = os.environ.get("GRAMMAR_PROBE_CACHE", cache_default)
    train_est = 250 if os.path.exists(cache_path) else 700
    latency_rows((
        ("pallas_int4", 64, 0, False, "mesh_latency_800f_int4_b64",
         "int4 KV B=64", 170),
    ), reserve=train_est, single_pass_if_warm=135)

    # --- trained-weights lookahead (the honest exact-greedy claim) --------
    # random-weight lookahead acceptance is the degenerate best case
    # (VERDICT r1/r2); this trains (or loads a cached) 350M on the face
    # grammar ON-CHIP and measures acceptance, token agreement and
    # jitted wall-clock speedup with structured weights — and emits BOTH
    # ends of the acceptance band (VERDICT r3 #5): the probe model's own
    # ~7.9 and a max_accept=4 capped run matching the converged-model
    # ~4.0 bound (PERF.md), so the record carries the band, not the
    # best case.
    #
    # Deliberately LAST: this is the one section whose cost is dominated
    # by non-preemptible on-chip training + fresh-program compiles (the
    # r4 preflight measured >880 s post-training when the compile
    # service was cold), so a stall here must not be able to starve the
    # cheap warm latency rows above (that starvation is exactly what
    # truncated BENCH_r03). When /tmp holds the grammar cache and the
    # compile service is warm it costs ~250 s.
    from meshanything_tpu.training.synthetic_grammar import (
        TrainedLookaheadProbe,
    )

    probe = None   # shared with the demoted W=16 row at the end
    if fits("trained lookahead (350M grammar)", train_est):
        try:
            t0 = time.time()
            probe = TrainedLookaheadProbe(window=8, bucket=512)
            st = probe.run()
            log(f"trained lookahead: acceptance {st['acceptance']:.2f}, "
                f"agreement {st['agreement']:.4f}, plain {st['t_plain']:.3f}s vs "
                f"lookahead {st['t_look']:.3f}s over {st['plain_tokens']} tokens "
                f"({time.time() - t0:.0f}s incl. train/compiles)")
            emit("trained_la8_acceptance", st["acceptance"], unit="tokens/forward",
                 vs=st["acceptance"])
            emit("trained_la8_agreement", st["agreement"], unit="fraction",
                 vs=st["agreement"])
            emit("trained_la8_speedup", st["speedup"], unit="x", vs=st["speedup"])
        except Exception as e:
            log(f"trained lookahead failed ({type(e).__name__}: {e})")

        # the LOW band reuses the probe's loaded model + plain timing,
        # so its marginal cost is one capped-lookahead compile + two
        # passes (vs a full second probe, which BENCH preflights showed
        # never fit the leftover budget)
        if probe is not None and fits("trained lookahead LOW band (max_accept=4)", 70):
            try:
                t0 = time.time()
                lo = probe.run(max_accept=4)
                log(f"trained lookahead low band: acceptance {lo['acceptance']:.2f}, "
                    f"agreement {lo['agreement']:.4f}, speedup {lo['speedup']:.2f}x "
                    f"({time.time() - t0:.0f}s)")
                emit("trained_la8_acceptance_low", lo["acceptance"],
                     unit="tokens/forward", vs=lo["acceptance"])
                emit("trained_la8_speedup_low", lo["speedup"], unit="x",
                     vs=lo["speedup"])
            except Exception as e:
                log(f"trained lookahead low band failed ({type(e).__name__}: {e})")

        # Adaptive-window band points (VERDICT r4 #2): the controller
        # over precompiled W=8/W=16 segment programs on the SAME probe.
        # On the saturating grammar model it should match fixed W=16
        # (switch-up engages); under max_accept=4 it should match fixed
        # W=8 (acceptance never reaches the switch-up threshold).
        if probe is not None and fits("adaptive lookahead (trained)", 150):
            try:
                t0 = time.time()
                ad = probe.run_adaptive()
                trace_w = [w for _, w, _ in ad["trace"]]
                log(f"adaptive lookahead: acceptance {ad['acceptance']:.2f}, "
                    f"agreement {ad['agreement']:.4f}, speedup "
                    f"{ad['speedup']:.2f}x, window trace {trace_w} "
                    f"({time.time() - t0:.0f}s)")
                emit("trained_adaptive_speedup", ad["speedup"], unit="x",
                     vs=ad["speedup"])
            except Exception as e:
                log(f"adaptive lookahead failed ({type(e).__name__}: {e})")
        if probe is not None and fits("adaptive lookahead capped4 (trained)", 80):
            try:
                t0 = time.time()
                ad4 = probe.run_adaptive(max_accept=4)
                trace_w = [w for _, w, _ in ad4["trace"]]
                log(f"adaptive lookahead capped4: acceptance "
                    f"{ad4['acceptance']:.2f}, speedup {ad4['speedup']:.2f}x, "
                    f"window trace {trace_w} ({time.time() - t0:.0f}s)")
                emit("trained_adaptive_speedup_capped4", ad4["speedup"],
                     unit="x", vs=ad4["speedup"])
            except Exception as e:
                log(f"adaptive capped4 failed ({type(e).__name__}: {e})")

    # --- CHAIN-RAND grammar: the adversarial-data acceptance row ----------
    # (VERDICT r4 #7 closure — a MEASURED negative result.) Three
    # grammar variants were built to force natural mid-band acceptance
    # and ALL saturate on the converged 350M at 7.904 (PERF.md r5):
    #   jitter    — condition-determined coordinates keep greedy
    #               Jacobi-stable regardless of data entropy;
    #   chain     — a FIXED permutation orbit is composable, so the
    #               model memorizes PERM^n tables and predicts window
    #               position i from pre-window context;
    #   chainrand — a PER-MESH random orbit is unlearnable, so the
    #               trained conditional is flat and its argmax is a
    #               constant marginal mode — stable under stale
    #               in-window guesses too.
    # Mechanism: under self-generation a converged greedy model is
    # Jacobi-stable for any LEARNABLE grammar (it composes n-step maps
    # across the window) and for any UNLEARNABLE one (argmax = marginal
    # mode). Natural mid-band acceptance requires a model that genuinely
    # mispredicts its own greedy stream — i.e. real weights mid-training
    # or real data ambiguity; the honest low BOUND stays the max_accept=4
    # capped row above. This row is still emitted: it is the measured
    # acceptance on the most adversarial data in the family (heights
    # unpredictable-in-principle, flat-plane condition).
    # Training is cached in /tmp by tools/grammar_variant_probe.py; a
    # warm run pays load + eval (the lookahead/plain programs are
    # shape-identical to the fixed probe's, so the compile service
    # serves them from cache).
    chain_cache = os.environ.get(
        "GRAMMAR_PROBE_CACHE_CHAINRAND",
        "/tmp/grammar350m_s600b4n100lr0.001seed0_chainrand.npz")
    chain_est = 120 if os.path.exists(chain_cache) else 900
    if fits("trained lookahead CHAIN-RAND (adversarial data)", chain_est):
        try:
            t0 = time.time()
            nprobe = TrainedLookaheadProbe(window=8, bucket=512,
                                           variant="chainrand")
            nst = nprobe.run()
            log(f"chainrand-grammar lookahead: acceptance {nst['acceptance']:.2f}, "
                f"agreement {nst['agreement']:.4f}, speedup "
                f"{nst['speedup']:.2f}x ({time.time() - t0:.0f}s)")
            emit("trained_la8_acceptance_chainrand", nst["acceptance"],
                 unit="tokens/forward", vs=nst["acceptance"])
            emit("trained_la8_speedup_chainrand", nst["speedup"], unit="x",
                 vs=nst["speedup"])
            nprobe = None
        except Exception as e:
            log(f"chainrand-grammar lookahead failed ({type(e).__name__}: {e})")

    # --- demoted repeats (every row below exists in BENCH_r04 with the
    # same methodology; the r5 priority order guarantees the NEW driver
    # asks — int4 B=64, trained band, adaptive, chainrand — cannot be
    # starved by them; they still run whenever budget remains) ---------
    # window-16 point of the sweep (PERF r4): on this (sharp) probe
    # model acceptance is ~15.5/16 and speedup 10.7x — the
    # single-request headroom case (--lookahead 16). Marginal cost:
    # one W=16 lookahead compile + two passes on the shared probe.
    if probe is not None and fits("trained lookahead W=16", 150):
        try:
            t0 = time.time()
            w16 = probe.run(window=16)
            log(f"trained lookahead W=16: acceptance {w16['acceptance']:.2f}, "
                f"agreement {w16['agreement']:.4f}, speedup {w16['speedup']:.2f}x "
                f"({time.time() - t0:.0f}s)")
            emit("trained_la16_acceptance", w16["acceptance"],
                 unit="tokens/forward", vs=w16["acceptance"])
            emit("trained_la16_speedup", w16["speedup"], unit="x",
                 vs=w16["speedup"])
        except Exception as e:
            log(f"trained lookahead W=16 failed ({type(e).__name__}: {e})")

    # free the trained probe's device buffers (~0.7 GB bf16 params +
    # cond) before the remaining latency rows (ADVICE r4)
    probe = None
    del probe

    e2e_exact_fixtures()
    serving_roundtrip("serving_roundtrip", runner, est=50)
    latency_rows((
        ("pallas_int8", 16, 8, False, "mesh_latency_800f_int8_la8_b16",
         "int8+lookahead W=8 B=16", 60),
        ("pallas", 8, 8, False, "mesh_latency_800f_la8_b8",
         "bf16+lookahead W=8 B=8", 60),
    ))
    batched_serving("serving_batched_8x", runner, est=150)
    latency_rows((
        ("pallas_int8", 16, 0, False, "mesh_latency_800f_int8_b16",
         "int8 KV B=16", 120),
    ))

    log(f"bench done in {elapsed():.0f}s of {BUDGET_S:.0f}s budget")
    # headline re-emitted last by the atexit hook (_final_emit)


if __name__ == "__main__":
    main()
