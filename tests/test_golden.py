"""Golden regression: fixed-seed small-config outputs pinned to files.

Catches silent numerics drift (layer math, sampling, postprocess)
between refactors. Regenerate with:
    python -m tests.test_golden   (writes tests/golden/*.json)
"""
import json
import os

if __name__ == "__main__":
    # regeneration must match the pytest environment: CPU + exact matmuls
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
    _jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np

import jax
import jax.numpy as jnp

from meshanything_tpu.config import small_test_config
from meshanything_tpu.models import meshanything as ma

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _compute():
    cfg = small_test_config(n_max_triangles=4)
    params = ma.init_meshanything_params(jax.random.PRNGKey(42), cfg)
    rng = np.random.default_rng(7)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)

    greedy = ma.generate(params, cfg, pc, bucket=16)
    sampled = ma.generate(params, cfg, pc, sampling=True, key=jax.random.PRNGKey(5), bucket=16)

    coords = np.asarray(greedy.face_coords, np.float64)
    return {
        "greedy_tokens": np.asarray(greedy.token_ids)[0].tolist(),
        "sampled_tokens": np.asarray(sampled.token_ids)[0].tolist(),
        # NaNs are json-unfriendly: encode valid-face mask + rounded coords
        "valid_faces": (~np.isnan(coords[0, :, 0, 0])).astype(int).tolist(),
        "coords_rounded": np.where(np.isnan(coords), -9.0, np.round(coords * 128)).astype(int)[0].tolist(),
    }


def _compute_completion():
    """Prompt-seeded mesh completion (models/meshanything.py::complete):
    pins the trickier coordinate-space handling — partial faces are
    discretized to the token grid, echoed through the stream, and the
    continuation + detok must stay bit-stable."""
    cfg = small_test_config(n_max_triangles=4)
    params = ma.init_meshanything_params(jax.random.PRNGKey(42), cfg)
    rng = np.random.default_rng(7)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)
    partial = jnp.asarray(
        rng.uniform(-0.45, 0.45, size=(1, 2, 3, 3)).astype(np.float32))

    out = ma.complete(params, cfg, pc, partial, bucket=16)
    coords = np.asarray(out.face_coords, np.float64)
    return {
        "tokens": np.asarray(out.token_ids)[0].tolist(),
        "valid_faces": (~np.isnan(coords[0, :, 0, 0])).astype(int).tolist(),
        "coords_rounded": np.where(np.isnan(coords), -9.0, np.round(coords * 128)).astype(int)[0].tolist(),
        # the prompt echo itself: first 1 + 2*9 tokens must be the
        # discretized partial behind bos
        "prompt_echo": np.asarray(
            ma.build_face_prompt(cfg, partial))[0].tolist(),
    }


def test_golden_small_config_outputs():
    path = os.path.join(GOLDEN_DIR, "small_config.json")
    assert os.path.exists(path), "golden file missing — run python -m tests.test_golden"
    golden = json.load(open(path))
    got = _compute()
    assert got["greedy_tokens"] == golden["greedy_tokens"], "greedy token stream drifted"
    assert got["sampled_tokens"] == golden["sampled_tokens"], "seeded sampling stream drifted"
    assert got["valid_faces"] == golden["valid_faces"]
    assert got["coords_rounded"] == golden["coords_rounded"], "detokenized coords drifted"


def test_golden_completion_outputs():
    path = os.path.join(GOLDEN_DIR, "completion.json")
    assert os.path.exists(path), "golden file missing — run python -m tests.test_golden"
    golden = json.load(open(path))
    got = _compute_completion()
    assert got["prompt_echo"] == golden["prompt_echo"], "prompt discretization drifted"
    assert got["tokens"][: len(got["prompt_echo"])] == golden["prompt_echo"], \
        "completion stream does not echo the prompt"
    assert got["tokens"] == golden["tokens"], "completion token stream drifted"
    assert got["valid_faces"] == golden["valid_faces"]
    assert got["coords_rounded"] == golden["coords_rounded"], "completion coords drifted"


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    out = _compute()
    with open(os.path.join(GOLDEN_DIR, "small_config.json"), "w") as fh:
        json.dump(out, fh)
    print("golden written:", {k: (len(v) if isinstance(v, list) else v) for k, v in out.items()})
    out_c = _compute_completion()
    with open(os.path.join(GOLDEN_DIR, "completion.json"), "w") as fh:
        json.dump(out_c, fh)
    print("completion golden written:",
          {k: (len(v) if isinstance(v, list) else v) for k, v in out_c.items()})
