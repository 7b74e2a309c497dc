"""NRD (BERT detokenizer) parity + full-model composition tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.config import NRDConfig, small_test_config
from meshanything_tpu.models import nrd as nrd_mod
from meshanything_tpu.models import meshanything as ma
from meshanything_tpu.runtime.checkpoint import convert_bert_encoder, to_device_tree

NCFG = NRDConfig(
    hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96,
    codebook_dim=32, cond_length=9, cond_dim=48, max_faces_pos=64,
)


@pytest.mark.slow
def test_bert_layer_parity_with_hf(rng):
    """Our scan-able BERT layer vs HF BertEncoder (post-LN, eps 1e-12)."""
    import torch
    from transformers.models.bert.modeling_bert import BertEncoder, BertConfig

    cfg = BertConfig(
        hidden_size=NCFG.hidden_size, num_hidden_layers=NCFG.num_layers,
        num_attention_heads=NCFG.num_heads, intermediate_size=NCFG.intermediate_size,
        hidden_act="gelu", attn_implementation="eager",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    enc = BertEncoder(cfg).eval()

    sd = {k: v.numpy() for k, v in enc.state_dict().items()}
    params = to_device_tree(convert_bert_encoder(sd, NCFG, ""))

    x = rng.normal(size=(2, 11, NCFG.hidden_size)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).last_hidden_state.numpy()

    h = jnp.asarray(x)

    def body(carry, p):
        return nrd_mod.bert_layer_apply(carry, p, num_heads=NCFG.num_heads, ln_eps=NCFG.ln_eps), None

    ours, _ = jax.lax.scan(body, h, params)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_decode_faces_masking(rng):
    """Faces with any pad token -> NaN output; others finite and on the
    1/128 grid in [-0.5, 0.5)."""
    params = nrd_mod.init_nrd_params(jax.random.PRNGKey(0), NCFG)
    b, nf = 2, 4
    ids = rng.integers(0, 60, size=(b, nf * 9)).astype(np.int32)
    ids[0, 9:18] = -1     # face 1 of row 0 padded
    ids[1, -1] = -1       # last face of row 1 partially padded
    codes = rng.normal(size=(b, nf * 3, NCFG.codebook_dim)).astype(np.float32)
    pf = rng.normal(size=(b, NCFG.cond_length, NCFG.cond_dim)).astype(np.float32)

    out = np.asarray(nrd_mod.decode_faces(params, NCFG, jnp.asarray(ids), jnp.asarray(codes), jnp.asarray(pf)))
    assert out.shape == (b, nf, 3, 3)
    assert np.isnan(out[0, 1]).all()
    assert np.isnan(out[1, 3]).all()
    valid = out[0, 0]
    assert np.isfinite(valid).all()
    bins = (valid + 0.5) * 128
    np.testing.assert_allclose(bins, np.round(bins), atol=1e-4)
    assert (valid >= -0.5).all() and (valid < 0.5).all()


def test_get_codes_formula(rng):
    """get_codes (meshanything.py:178-212): reshape (B, n, 3), dummy-0
    gather with mask, sum over the quantizer axis."""
    cfg = small_test_config()
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    codebook = np.asarray(params["opt"]["codebook"])

    ids = rng.integers(-1, cfg.opt.codebook_size, size=(2, 18)).astype(np.int32)
    out = np.asarray(ma.get_codes(params, cfg, jnp.asarray(ids)))

    idx = ids.reshape(2, 6, 3)
    expect = np.zeros((2, 6, cfg.opt.codebook_dim), np.float32)
    for b in range(2):
        for n in range(6):
            for q in range(3):
                if idx[b, n, q] != -1:
                    expect[b, n] += codebook[idx[b, n, q]]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_token_postprocess():
    cfg = small_test_config()
    raw = jnp.asarray([[0, 5, 6, 7, 3, 1, 2, 2]])  # bos, codes, eos, pads
    out = np.asarray(ma.token_postprocess(cfg, raw))
    # strip bos (predicted) and final slot; specials -> -1; -3 shift
    np.testing.assert_array_equal(out[0], [2, 3, 4, 0, -1, -1])


def test_end_to_end_generate_small(rng):
    """Full composition on the small config: shapes, determinism, NaN
    padding structure."""
    cfg = small_test_config(n_max_triangles=4)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    pc = jnp.asarray(rng.normal(size=(2, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)

    out = ma.generate(params, cfg, pc, bucket=16)
    assert out.face_coords.shape == (2, 4, 3, 3)
    assert out.token_ids.shape == (2, cfg.generate_length)

    out2 = ma.generate(params, cfg, pc, bucket=16)
    np.testing.assert_array_equal(np.asarray(out.token_ids), np.asarray(out2.token_ids))

    # every face is either fully NaN or fully finite
    fc = np.asarray(out.face_coords)
    for b in range(2):
        for f in range(4):
            face = fc[b, f]
            assert np.isnan(face).all() or np.isfinite(face).all()


def test_end_to_end_sampling_seeded(rng):
    cfg = small_test_config(n_max_triangles=4)
    params = ma.init_meshanything_params(jax.random.PRNGKey(1), cfg)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32))
    a = ma.generate(params, cfg, pc, sampling=True, key=jax.random.PRNGKey(11), bucket=16)
    b = ma.generate(params, cfg, pc, sampling=True, key=jax.random.PRNGKey(11), bucket=16)
    np.testing.assert_array_equal(np.asarray(a.token_ids), np.asarray(b.token_ids))


def test_forward_logits_shape(rng):
    cfg = small_test_config(n_max_triangles=4)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32))
    toks = jnp.asarray(rng.integers(0, cfg.opt.vocab_size, size=(1, 12)).astype(np.int32))
    logits = ma.forward_logits(params, cfg, pc, toks)
    assert logits.shape == (1, cfg.cond_length + 12, cfg.opt.vocab_size)


def test_v2_scale_1600_face_config_bounds():
    """The reference successor (MeshAnything V2, README.md:52) raises the
    face cap to 1600; the position tables here already carry headroom to
    2000 faces (max_positions=18259 = 2000*9+259, meshanything.py:97;
    max_faces_pos=18000, meshanything.py:27). A 1600-face config must
    stay inside every embedding table on the full pipeline's index
    paths."""
    import dataclasses

    from meshanything_tpu.config import MeshAnythingConfig, small_test_config

    cfg = MeshAnythingConfig(n_max_triangles=1600)
    # decoder absolute positions: cond + tokens + OPT's +2 offset
    assert cfg.cond_length + cfg.generate_length + 2 <= cfg.opt.max_positions
    # NRD face-position table covers every face slot
    assert cfg.n_max_triangles <= cfg.nrd.max_faces_pos

    # and the composed forward actually runs at a scaled-down analogue
    # (same headroom ratio) on CPU
    base = small_test_config(n_max_triangles=8)
    big = dataclasses.replace(base, n_max_triangles=16)
    assert big.cond_length + big.generate_length + 2 <= big.opt.max_positions
    import jax

    from meshanything_tpu.models import meshanything as ma

    params = ma.init_meshanything_params(jax.random.PRNGKey(0), big)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(1, big.perceiver.num_points, 6)).astype(np.float32) * 0.5)
    out = ma.generate(params, big, pc, bucket=16)
    assert out.token_ids.shape == (1, big.generate_length)
    assert out.face_coords.shape == (1, 16, 3, 3)


def test_mesh_completion_continues_prompt(rng):
    """ma.complete: partial faces are discretized, echoed at the front of
    the stream, and the continuation matches plain generation seeded
    with the same prefix (mesh-completion capability)."""
    import jax

    from meshanything_tpu.config import small_test_config
    from meshanything_tpu.models import meshanything as ma

    cfg = small_test_config(n_max_triangles=4)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)
    pc = jnp.asarray(rng.normal(size=(1, cfg.perceiver.num_points, 6)).astype(np.float32) * 0.5)

    # one partial face on the discrete grid
    bins = cfg.nrd.discrete_num
    grid = (rng.integers(0, bins, size=(1, 1, 3, 3)) + 0.5) / bins - 0.5
    partial = jnp.asarray(grid.astype(np.float32))

    out = ma.complete(params, cfg, pc, partial, bucket=16)
    assert out.token_ids.shape == (1, cfg.generate_length)
    assert out.face_coords.shape == (1, cfg.n_max_triangles, 3, 3)

    # prompt echo: bos + the discretized face tokens
    toks = np.asarray(ma.discretize_faces(cfg, partial))[0]
    raw = np.asarray(out.token_ids)[0]
    assert raw[0] == cfg.opt.bos_token_id
    np.testing.assert_array_equal(raw[1:1 + toks.size], toks)

    # round trip: discretize(undiscretize-grid coords) is lossless
    np.testing.assert_allclose(
        (toks.reshape(3, 3) - 3 + 0.5) / bins - 0.5, np.asarray(partial)[0, 0],
        atol=1e-6)


def test_build_face_prompt_validates_budget(rng):
    """Oversized partials must fail fast with an actionable message, not
    a mid-trace error (code-review r2)."""
    import jax

    from meshanything_tpu.config import small_test_config
    from meshanything_tpu.models.meshanything import build_face_prompt

    cfg = small_test_config(n_max_triangles=4)
    ok = build_face_prompt(cfg, jnp.zeros((1, 2, 3, 3)))
    assert ok.shape == (1, 1 + 2 * 9)
    assert int(ok[0, 0]) == cfg.opt.bos_token_id
    with pytest.raises(ValueError, match="at most"):
        build_face_prompt(cfg, jnp.zeros((1, cfg.n_max_triangles, 3, 3)))


def test_serving_partial_faces_share_mesh_normalization(tmp_path, rng):
    """HTTP/engine completion: partial faces given in the CLIENT mesh's
    coordinate space get the same mesh-bbox transform as the condition
    (code-review r2: raw coords outside [-0.5,0.5) clipped to boundary
    bins and silently produced garbage prompts)."""
    import jax

    from meshanything_tpu.config import small_test_config
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.serving import ServingEngine

    cfg = small_test_config(n_max_triangles=4)
    params = ma.init_meshanything_params(jax.random.PRNGKey(0), cfg)

    captured = {}

    class Spy:
        def __call__(self, pc, sampling=False, key=None, prompt_ids=None):
            captured["prompt"] = None if prompt_ids is None else np.asarray(prompt_ids)
            return ma.generate(params, cfg, jnp.asarray(pc), bucket=16)

    engine = ServingEngine(params, cfg, runner=Spy(), artifacts_dir=str(tmp_path))
    # client mesh in native coords (bbox [0, 100])
    v = rng.random((12, 3)) * 100.0
    f = np.arange(12).reshape(4, 3)
    partial = v[f[:1]]  # first face, same client space
    engine.generate_from_mesh(v, f, partial_faces=partial, export_artifacts=False)

    prompt = captured["prompt"]
    assert prompt is not None and prompt.shape == (1, 10)
    toks = prompt[0, 1:] - 3
    bins = cfg.nrd.discrete_num
    # tokens must be interior bins, not the 0/max clip boundary a raw
    # (unnormalized) coordinate would produce
    assert (toks >= 0).all() and (toks <= bins - 1).all()
    assert not ((toks == 0) | (toks == bins - 1)).all()
