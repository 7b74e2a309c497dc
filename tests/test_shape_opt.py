"""ShapeOPT decoder tests.

Parity oracle: HF's torch OPT implementation (installed transformers),
configured to the reference's forced architecture (meshanything.py:95-113:
post-LN OPT-350m shape, word_embed_proj_dim == hidden_size, untied head).
The custom embedding pathways (hybrid codebook embed, face-phase ids,
cond flag) are validated against the reference formulas directly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.config import ShapeOPTConfig
from meshanything_tpu.models import shape_opt as sopt
from meshanything_tpu.runtime.checkpoint import convert_opt, to_device_tree

CFG = ShapeOPTConfig(
    hidden_size=32, num_layers=2, num_heads=4, ffn_dim=64,
    vocab_size=67, codebook_size=64, codebook_dim=32,
    max_positions=512, cond_length=9, cond_dim=48,
)


def _rand_params(seed=0):
    return sopt.init_shape_opt_params(jax.random.PRNGKey(seed), CFG)


# ---------------------------------------------------------------------------
# reference-formula tests


def test_face_phase_ids_matches_mask_formula():
    """shape_opt.py:457: cur_index = (mask_len - 2) % 9 + 3 where
    mask_len counts generated tokens incl. the current one. Our step
    formulation: token at gen-index g -> (g - 1) % 9 + 3."""
    fpt = 9
    for g in range(1, 40):
        mask_len = g + 1  # generated tokens 0..g inclusive
        ref = (mask_len - 2) % fpt + 3
        ours = int(sopt.face_phase_ids(jnp.asarray([50]), jnp.asarray(g), fpt)[0])
        assert ours == ref, (g, ours, ref)
    # special tokens keep their id
    for sid in (0, 1, 2):
        assert int(sopt.face_phase_ids(jnp.asarray([sid]), jnp.asarray(7), fpt)[0]) == sid


def test_embed_tokens_hybrid():
    params = _rand_params()
    ids = jnp.asarray([0, 1, 2, 3, 10, 66])
    out = sopt.embed_tokens(params, CFG, ids)
    np.testing.assert_allclose(out[0], params["extra_embeds"][0], atol=1e-6)
    np.testing.assert_allclose(out[2], params["extra_embeds"][2], atol=1e-6)
    expect = params["codebook"][10 - 3] @ params["input_layer"]["w"] + params["input_layer"]["b"]
    np.testing.assert_allclose(out[4], expect, atol=1e-5)


# ---------------------------------------------------------------------------
# HF torch parity of the OPT stack + converter


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import OPTForCausalLM, OPTConfig

    torch.manual_seed(0)
    hf_cfg = OPTConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_layers,
        ffn_dim=CFG.ffn_dim,
        num_attention_heads=CFG.num_heads,
        max_position_embeddings=CFG.max_positions,
        do_layer_norm_before=False,
        word_embed_proj_dim=CFG.hidden_size,
        activation_function="relu",
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = OPTForCausalLM(hf_cfg).eval()
    return m


@pytest.fixture(scope="module")
def converted_params(hf_model):
    sd = {"transformer." + k: v.numpy() for k, v in hf_model.state_dict().items()}
    # synthesize the custom ShapeOPT additions absent from vanilla OPT
    rng = np.random.default_rng(0)
    d = CFG.hidden_size
    sd["transformer.model.decoder.extra_embeds.weight"] = rng.normal(size=(3, d)).astype(np.float32)
    sd["transformer.model.decoder.input_layer.weight"] = rng.normal(size=(d, CFG.codebook_dim)).astype(np.float32) * 0.1
    sd["transformer.model.decoder.input_layer.bias"] = rng.normal(size=(d,)).astype(np.float32) * 0.1
    sd["transformer.model.decoder.token_embed_positions.weight"] = rng.normal(size=(CFG.num_face_pos, d)).astype(np.float32) * 0.1
    sd["transformer.model.decoder.cond_embed.weight"] = rng.normal(size=(2, d)).astype(np.float32) * 0.1
    sd["transformer.model.decoder.quantize_codebooks"] = rng.normal(size=(1, CFG.codebook_size, CFG.codebook_dim)).astype(np.float32) * 0.1
    return to_device_tree(convert_opt(sd, CFG))


@pytest.mark.slow
def test_opt_stack_parity_with_hf(hf_model, converted_params, rng):
    """Condition pass through our prefill vs HF OPT over inputs_embeds.

    Both add learned positions with the +2 offset over an all-ones mask;
    our cond_embed[0] is added to the inputs first on both sides.
    """
    import torch

    b, c, d = 2, CFG.cond_length, CFG.hidden_size
    cond = rng.normal(size=(b, c, d)).astype(np.float32) * 0.5

    cond_embed0 = np.asarray(converted_params["cond_embed"][0])
    with torch.no_grad():
        out = hf_model(
            inputs_embeds=torch.from_numpy(cond + cond_embed0),
            attention_mask=torch.ones(b, c, dtype=torch.long),
        )
        ref_logits = out.logits.numpy()  # (B, C, vocab)

    logits_last, kv = sopt.prefill(converted_params, CFG, jnp.asarray(cond), kv_len=c + 4)
    np.testing.assert_allclose(np.asarray(logits_last), ref_logits[:, -1], atol=2e-5, rtol=1e-4)

    full = sopt.forward_full(converted_params, CFG, jnp.asarray(cond), jnp.zeros((b, 0), jnp.int32))
    np.testing.assert_allclose(np.asarray(full), ref_logits, atol=2e-5, rtol=1e-4)
    assert kv.shape == (2, CFG.num_layers, b, c + 4, CFG.hidden_size)


# ---------------------------------------------------------------------------
# decode-loop self-consistency


def test_generate_matches_teacher_forcing(rng):
    """KV-cache incremental decode must reproduce the dense causal pass:
    greedy-generated tokens re-fed through forward_full give argmax
    sequences identical to what generate emitted (prefill-vs-incremental
    equivalence, SURVEY.md §4 seam (b))."""
    params = _rand_params(3)
    b, c = 2, CFG.cond_length
    cond = jnp.asarray(rng.normal(size=(b, c, CFG.hidden_size)).astype(np.float32) * 0.5)

    max_new = 24
    tokens = sopt.generate(params, CFG, cond, max_new_tokens=max_new, bucket=8)
    tokens = np.asarray(tokens)

    # teacher-force: feed generated tokens 0..T-2, compare predictions 1..T-1
    full_logits = sopt.forward_full(params, CFG, cond, jnp.asarray(tokens[:, :-1]))
    preds = np.asarray(jnp.argmax(full_logits[:, c - 1:], axis=-1))  # predicts gen tokens 0..T-1

    for row in range(b):
        eos_pos = np.where(tokens[row] == CFG.eos_token_id)[0]
        limit = (eos_pos[0] + 1) if len(eos_pos) else tokens.shape[1]
        np.testing.assert_array_equal(
            preds[row, :limit], tokens[row, :limit],
            err_msg=f"row {row} mismatch within first {limit} tokens",
        )


def test_generate_eos_fill_and_determinism(rng):
    params = _rand_params(4)
    cond = jnp.asarray(rng.normal(size=(1, CFG.cond_length, CFG.hidden_size)).astype(np.float32))
    t1 = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=30, bucket=16))
    t2 = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=30, bucket=16))
    np.testing.assert_array_equal(t1, t2)
    eos_pos = np.where(t1[0] == CFG.eos_token_id)[0]
    if len(eos_pos):
        # after first eos: everything is pad (HF fill) or the eos prefill
        tail = t1[0, eos_pos[0] + 1:]
        assert np.all((tail == CFG.pad_token_id) | (tail == CFG.eos_token_id))


def test_generate_bucket_invariance(rng):
    """Token stream must not depend on the KV bucket size (pure perf knob)."""
    params = _rand_params(5)
    cond = jnp.asarray(rng.normal(size=(2, CFG.cond_length, CFG.hidden_size)).astype(np.float32))
    a = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=20, bucket=4))
    b = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=20, bucket=64))
    np.testing.assert_array_equal(a, b)


def test_generate_sampling_mode(rng):
    params = _rand_params(6)
    cond = jnp.asarray(rng.normal(size=(1, CFG.cond_length, CFG.hidden_size)).astype(np.float32))
    s1 = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=16,
                                  key=jax.random.PRNGKey(7), sampling=True, bucket=16))
    s2 = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=16,
                                  key=jax.random.PRNGKey(7), sampling=True, bucket=16))
    s3 = np.asarray(sopt.generate(params, CFG, cond, max_new_tokens=16,
                                  key=jax.random.PRNGKey(8), sampling=True, bucket=16))
    np.testing.assert_array_equal(s1, s2)  # same seed -> same stream
    assert s1.shape == (1, 16)
    assert not np.array_equal(s1, s3) or True  # different seed may differ


@pytest.mark.slow
def test_sampling_filters_match_hf():
    """top-k then top-p filtering equals HF's warper chain."""
    import torch
    from transformers.generation.logits_process import TopKLogitsWarper, TopPLogitsWarper

    from meshanything_tpu.ops.sampling import top_k_filter, top_p_filter

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 40)).astype(np.float32) * 2

    hf = TopPLogitsWarper(top_p=0.95)(
        None, TopKLogitsWarper(top_k=10)(None, torch.from_numpy(logits.copy()))
    ).numpy()
    ours = np.asarray(top_p_filter(top_k_filter(jnp.asarray(logits), 10), 0.95))

    np.testing.assert_array_equal(np.isinf(ours), np.isinf(hf))
    finite = ~np.isinf(hf)
    np.testing.assert_allclose(ours[finite], hf[finite], atol=1e-6)


@pytest.mark.parametrize("attn", ["xla", "pallas", "pallas_int8", "pallas_int4"])
def test_prompt_seeded_generate_matches_plain(rng, attn):
    """generate(prompt_ids=plain[:, :P]) must reproduce plain greedy's
    stream exactly: the one-pass prompt prefill (prefill_with_prompt)
    is position/phase-identical to having decoded the prefix token by
    token."""
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(3), CFG)
    b = 2
    cond = jnp.asarray(
        rng.normal(size=(b, CFG.cond_length, CFG.hidden_size)).astype(np.float32) * 0.5)

    plain = np.asarray(sopt.generate(
        params, CFG, cond, max_new_tokens=24, bucket=16, attn=attn))
    for p_len in (1, 7):
        prompt = jnp.asarray(plain[:, :p_len])
        seeded = np.asarray(sopt.generate(
            params, CFG, cond, max_new_tokens=24, bucket=16, attn=attn,
            prompt_ids=prompt))
        for row in range(b):
            eos = np.where(plain[row] == CFG.eos_token_id)[0]
            limit = (eos[0] + 1) if len(eos) else plain.shape[1]
            np.testing.assert_array_equal(
                seeded[row, :limit], plain[row, :limit],
                err_msg=f"attn={attn} p_len={p_len} row={row}")


def test_prompt_seeded_generate_rejects_overlong_prompt(rng):
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(3), CFG)
    cond = jnp.asarray(
        rng.normal(size=(1, CFG.cond_length, CFG.hidden_size)).astype(np.float32))
    with pytest.raises(ValueError, match="prompt length"):
        sopt.generate(params, CFG, cond, max_new_tokens=4, bucket=16,
                      prompt_ids=jnp.zeros((1, 4), jnp.int32))


def test_prompt_seeded_generate_long_prompt_blockwise(rng):
    """Long prompts (> 1024 total prefill tokens) route through the
    blockwise flash prefill; the continuation must still match plain
    greedy exactly (mesh-completion scale)."""
    params = sopt.init_shape_opt_params(jax.random.PRNGKey(3), CFG)
    cond = jnp.asarray(
        rng.normal(size=(1, CFG.cond_length, CFG.hidden_size)).astype(np.float32) * 0.5)

    max_new = 1100
    plain = np.asarray(sopt.generate(
        params, CFG, cond, max_new_tokens=max_new, bucket=128, attn="xla",
        early_exit=False))
    p_len = 1040  # cond 9 + 1040 = 1049 > 1024 -> block_q path
    seeded = np.asarray(sopt.generate(
        params, CFG, cond, max_new_tokens=max_new, bucket=128, attn="xla",
        prompt_ids=jnp.asarray(plain[:, :p_len])))
    eos = np.where(plain[0] == CFG.eos_token_id)[0]
    limit = (eos[0] + 1) if len(eos) else max_new
    np.testing.assert_array_equal(seeded[0, :limit], plain[0, :limit])
