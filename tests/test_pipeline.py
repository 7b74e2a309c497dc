"""End-to-end pipeline tests on the small config (CPU)."""
import os

import numpy as np
import pytest

import jax

from meshanything_tpu.config import small_test_config
from meshanything_tpu.models import meshanything as ma
from meshanything_tpu.runtime.pipeline import InferencePipeline, Sample, load_inputs


@pytest.fixture(scope="module")
def cfg():
    return small_test_config(n_max_triangles=2)


@pytest.fixture(scope="module")
def pipe(cfg):
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    return InferencePipeline(params, cfg, batch_size=2, bucket=16)


def _samples(cfg, rng, n):
    out = []
    for i in range(n):
        pc = rng.normal(size=(cfg.perceiver.num_points, 6)).astype(np.float32) * 0.3
        pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=-1, keepdims=True)
        out.append(Sample(pc_normal=pc.astype(np.float16), uid=f"s{i}"))
    return out


def test_pipeline_batch_padding(pipe, cfg, tmp_path, rng):
    # 3 samples with batch_size 2: ragged tail must not recompile/crash
    results = pipe.run(_samples(cfg, rng, 3), str(tmp_path), seed=0)
    assert len(results) == 3
    for r in results:
        assert "error" not in r
        assert os.path.exists(r["obj_path"])


def test_pipeline_resume_skips_existing(pipe, cfg, tmp_path, rng):
    samples = _samples(cfg, rng, 2)
    pipe.run(samples, str(tmp_path), seed=0)
    before = len(pipe.timings)
    pipe.run(samples, str(tmp_path), seed=0, resume=True)
    skipped = [t for t in pipe.timings[before:] if t.get("skipped")]
    assert len(skipped) == 2


def test_pipeline_records_failures(cfg, tmp_path, rng):
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    pipe = InferencePipeline(params, cfg, batch_size=1, bucket=16)

    # sabotage the compiled fn to simulate a device fault
    def boom(*a, **k):
        raise RuntimeError("TPU worker crashed (simulated)")

    pipe._gen_greedy = boom
    results = pipe.run(_samples(cfg, rng, 2), str(tmp_path), seed=0, max_retries=1)
    assert len(results) == 2
    assert all("error" in r and "RuntimeError" in r["error"] for r in results)


def test_load_inputs_pc_too_small(tmp_path):
    p = tmp_path / "tiny.npy"
    np.save(p, np.zeros((10, 6), np.float16))
    with pytest.raises(ValueError, match="at least"):
        load_inputs("pc_normal", [str(p)], num_points=64)


def test_load_inputs_mesh(tmp_path, cfg):
    from meshanything_tpu.geometry import Mesh, save_obj

    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], float)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
                  [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]])
    path = tmp_path / "cube.obj"
    save_obj(Mesh(v, f), str(path))
    samples = load_inputs("mesh", [str(path)], num_points=cfg.perceiver.num_points)
    assert samples[0].pc_normal.shape == (cfg.perceiver.num_points, 6)
    assert samples[0].uid == "cube"


def test_pipeline_mesh_completion(pipe, cfg, tmp_path, rng):
    """--complete_from path: prompt tokens are echoed at the front of
    the generated stream for every sample."""
    samples = [
        Sample(pc_normal=rng.normal(size=(cfg.perceiver.num_points, 6)).astype(np.float16), uid="x")
    ]
    bins = cfg.nrd.discrete_num
    toks = rng.integers(3, bins + 3, size=9).astype(np.int32)  # one face
    prompt = np.concatenate([[cfg.opt.bos_token_id], toks]).astype(np.int32)
    res = pipe.run(samples, str(tmp_path), prompt_tokens=prompt, export=False)
    assert len(res) == 1 and "error" not in res[0]


def test_segmented_decode_matches_single_loop(cfg, rng):
    """PhaseRunner's segmented decode (repeated decode_segment calls of
    one compiled program, state donated between calls — the axon ~60 s
    per-program watchdog workaround, PERF.md r3) must be token-identical
    to the single-while_loop generate."""
    import jax.numpy as jnp

    from meshanything_tpu.models import shape_opt as opt_mod
    from meshanything_tpu.runtime.phases import PhaseRunner

    params = ma.init_meshanything_params(jax.random.PRNGKey(1), cfg)
    runner = PhaseRunner(params, cfg, bucket=16, attn="pallas", early_exit=False)
    assert runner._segmented
    # force several tiny segments so the schedule actually splits
    gl = cfg.generate_length
    runner._seg_bounds = [min(s, gl) for s in (3, 6, 9, gl)]
    pc = jnp.asarray(
        rng.normal(size=(2, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.3)
    out = runner(pc)

    pf, cond = runner._encode(params, pc)
    ref = opt_mod.generate(
        params["opt"], cfg.opt, cond, max_new_tokens=gl,
        key=jax.random.PRNGKey(0), bucket=16, early_exit=False, attn="pallas")
    np.testing.assert_array_equal(np.asarray(out.token_ids), np.asarray(ref))


def test_segmented_lookahead_matches_single_loop(cfg, rng):
    """The segmented lookahead path (window forwards bounded by a traced
    until_iters) must be token-identical to the single-loop
    generate_lookahead."""
    import jax.numpy as jnp

    from meshanything_tpu.models.lookahead import generate_lookahead
    from meshanything_tpu.runtime.phases import PhaseRunner

    params = ma.init_meshanything_params(jax.random.PRNGKey(2), cfg)
    runner = PhaseRunner(params, cfg, bucket=16, attn="pallas", lookahead=4)
    assert runner._segmented
    runner._seg_bounds = [2, 4, 6, cfg.generate_length]  # force tiny segments
    pc = jnp.asarray(
        rng.normal(size=(2, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.3)
    out = runner(pc)

    pf, cond = runner._encode(params, pc)
    ref = generate_lookahead(
        params["opt"], cfg.opt, cond, max_new_tokens=cfg.generate_length,
        window=4, bucket=16, attn="pallas", key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out.token_ids), np.asarray(ref))


def test_adaptive_lookahead_matches_fixed_window(cfg, rng):
    """lookahead='adaptive' (VERDICT r4 #2): the controller switches
    between two precompiled window programs on measured acceptance —
    the emitted token stream must be identical to the fixed-window run
    (greedy lookahead is window-size-invariant in exact arithmetic),
    and the trace must show the controller actually engaging."""
    import jax.numpy as jnp

    from meshanything_tpu.models.lookahead import generate_lookahead
    from meshanything_tpu.runtime.phases import PhaseRunner

    # seed 1: the decode runs ~9 window-4 forwards to the length cap
    # (seed 3 emits eos at init — no iterations for the controller to see)
    params = ma.init_meshanything_params(jax.random.PRNGKey(1), cfg)
    runner = PhaseRunner(params, cfg, bucket=16, attn="pallas",
                         lookahead="adaptive", adaptive_windows=(4, 8),
                         adaptive_check_iters=2)
    assert runner._segmented and runner._adaptive
    pc = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.3)
    out = runner(pc)
    assert runner.window_trace, "controller never read the counters"
    # every trace window is one of the two compiled widths
    assert {w for _, w, _ in runner.window_trace} <= {4, 8}

    pf, cond = runner._encode(params, pc)
    ref = generate_lookahead(
        params["opt"], cfg.opt, cond, max_new_tokens=cfg.generate_length,
        window=4, bucket=16, attn="pallas", key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out.token_ids), np.asarray(ref))
