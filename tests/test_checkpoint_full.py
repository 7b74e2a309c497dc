"""Full combined-checkpoint conversion: exercises every key path of
convert_meshanything with the exact prefixes the reference state dict
uses (point_encoder.model.shape_model.* / tokenizer.* / transformer.*,
SURVEY.md §3.4), built from real torch modules at small scale."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from meshanything_tpu.config import small_test_config  # noqa: E402
from meshanything_tpu.models import meshanything as ma  # noqa: E402
from meshanything_tpu.runtime.checkpoint import (  # noqa: E402
    convert_meshanything,
    load_orbax,
    save_orbax,
    to_device_tree,
)

pytestmark = pytest.mark.slow  # torch-oracle tier; smoke = -m 'not slow'

CFG = small_test_config(n_max_triangles=2)


def _build_reference_style_state_dict():
    """Assemble a state dict with the reference's exact key layout from
    real torch modules (perceiver from the vendored reference code used
    as oracle; OPT + BERT from HF)."""
    from MeshAnything.miche.michelangelo.models.tsal.sal_perceiver import (
        AlignedShapeLatentPerceiver,
    )
    from transformers import OPTForCausalLM, OPTConfig
    from transformers.models.bert.modeling_bert import BertEncoder, BertConfig

    torch.manual_seed(0)
    p = CFG.perceiver
    perceiver = AlignedShapeLatentPerceiver(
        device=None, dtype=torch.float32,
        num_latents=p.num_latents, embed_dim=p.embed_dim, point_feats=3,
        num_freqs=p.num_freqs, include_pi=p.include_pi, width=p.width,
        heads=p.heads, num_encoder_layers=p.num_encoder_layers,
        num_decoder_layers=p.num_decoder_layers, init_scale=p.init_scale,
        qkv_bias=p.qkv_bias, flash=False, use_ln_post=p.use_ln_post,
        use_checkpoint=False,
    )

    o = CFG.opt
    opt = OPTForCausalLM(OPTConfig(
        vocab_size=o.vocab_size, hidden_size=o.hidden_size,
        num_hidden_layers=o.num_layers, ffn_dim=o.ffn_dim,
        num_attention_heads=o.num_heads, max_position_embeddings=o.max_positions,
        do_layer_norm_before=False, word_embed_proj_dim=o.hidden_size,
        activation_function="relu", tie_word_embeddings=False,
        attn_implementation="eager",
    ))

    n = CFG.nrd
    bert = BertEncoder(BertConfig(
        hidden_size=n.hidden_size, num_hidden_layers=n.num_layers,
        num_attention_heads=n.num_heads, intermediate_size=n.intermediate_size,
        hidden_act="gelu", attn_implementation="eager",
    ))

    rng = np.random.default_rng(0)
    sd = {}
    for k, v in perceiver.state_dict().items():
        sd[f"point_encoder.model.shape_model.{k}"] = v.numpy()
    for k, v in opt.state_dict().items():
        sd[f"transformer.{k}"] = v.numpy()
    for k, v in bert.state_dict().items():
        sd[f"tokenizer.decoder.{k}"] = v.numpy()

    f32 = lambda *shape: rng.normal(size=shape).astype(np.float32) * 0.05  # noqa: E731
    d = o.hidden_size
    # ShapeOPT custom additions (shape_opt.py:199-209, meshanything.py:118)
    sd["transformer.model.decoder.extra_embeds.weight"] = f32(3, d)
    sd["transformer.model.decoder.input_layer.weight"] = f32(d, o.codebook_dim)
    sd["transformer.model.decoder.input_layer.bias"] = f32(d)
    sd["transformer.model.decoder.token_embed_positions.weight"] = f32(o.num_face_pos, d)
    sd["transformer.model.decoder.cond_embed.weight"] = f32(2, d)
    sd["transformer.model.decoder.quantize_codebooks"] = f32(1, o.codebook_size, o.codebook_dim)
    # NRD surroundings (meshanything.py:27-41)
    nd = n.hidden_size
    sd["tokenizer.pos_embedding.weight"] = f32(n.max_faces_pos, nd)
    sd["tokenizer.layernorm.weight"] = np.ones(nd, np.float32)
    sd["tokenizer.layernorm.bias"] = np.zeros(nd, np.float32)
    sd["tokenizer.point_layernorm.weight"] = np.ones(nd, np.float32)
    sd["tokenizer.point_layernorm.bias"] = np.zeros(nd, np.float32)
    sd["tokenizer.point_pe.weight"] = f32(n.cond_length, nd)
    sd["tokenizer.cond_proj.weight"] = f32(nd, n.cond_dim)
    sd["tokenizer.cond_proj.bias"] = f32(nd)
    sd["tokenizer.cond_head_proj.weight"] = f32(nd, n.cond_dim)
    sd["tokenizer.cond_head_proj.bias"] = f32(nd)
    sd["tokenizer.project_down_codebook.weight"] = f32(nd, n.codebook_dim * 3)
    sd["tokenizer.project_down_codebook.bias"] = f32(nd)
    sd["tokenizer.to_coor_logits.0.weight"] = f32(n.discrete_num * 9, nd)
    sd["tokenizer.to_coor_logits.0.bias"] = f32(n.discrete_num * 9)
    # top-level cond projections (meshanything.py:120-121)
    sd["cond_head_proj.weight"] = f32(d, o.cond_dim)
    sd["cond_head_proj.bias"] = f32(d)
    sd["cond_proj.weight"] = f32(d, o.cond_dim * 2)
    sd["cond_proj.bias"] = f32(d)
    return sd


@pytest.fixture(scope="module")
def converted():
    sd = _build_reference_style_state_dict()
    return to_device_tree(convert_meshanything(sd, CFG))


def test_convert_full_tree_structure(converted):
    ref = ma.init_meshanything_params(jax.random.PRNGKey(0), CFG)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert ref_paths == got_paths
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(ref)[0], key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(converted)[0], key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert a.shape == b.shape, (jax.tree_util.keystr(pa), a.shape, b.shape)


def test_converted_params_generate_end_to_end(converted, rng):
    pc = jnp.asarray(rng.normal(size=(1, CFG.perceiver.num_points, 6)).astype(np.float32) * 0.5)
    out = ma.generate(converted, CFG, pc, bucket=16)
    assert out.face_coords.shape == (1, CFG.n_max_triangles, 3, 3)
    assert out.token_ids.shape == (1, CFG.generate_length)


def test_orbax_roundtrip(converted, tmp_path):
    path = str(tmp_path / "ckpt")
    save_orbax(converted, path)
    back = load_orbax(path)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(converted)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa))


def test_orbax_sharded_restore(converted, tmp_path):
    """load_orbax_sharded restores straight onto mesh NamedShardings
    (each device materializes only its shard — the multi-chip load
    path): values match the saved tree, shardings are the requested
    ones, and a TP-sharded leaf really is partitioned across devices."""
    from meshanything_tpu.parallel.mesh import create_mesh, param_shardings
    from meshanything_tpu.runtime.checkpoint import load_orbax_sharded

    path = str(tmp_path / "ckpt_sharded")
    save_orbax(converted, path)
    mesh = create_mesh(data=2, model=4)
    shardings = param_shardings(mesh, converted)
    back = load_orbax_sharded(path, shardings)

    for (pa, a), (_, b), (_, s) in zip(
        jax.tree_util.tree_flatten_with_path(converted)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
        jax.tree_util.tree_flatten_with_path(shardings)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(pa))
        assert b.sharding.is_equivalent_to(s, b.ndim), jax.tree_util.keystr(pa)
    # a model-sharded weight is genuinely partitioned, not replicated
    qkv = back["opt"]["layers"]["qkv"]["w"]
    shard_shape = qkv.addressable_shards[0].data.shape
    assert shard_shape[-1] == qkv.shape[-1] // 4, shard_shape


def test_orbax_sharded_restore_matches_namedtuple_fields_by_name(tmp_path):
    """NamedTuple containers (optax states) round-trip by FIELD NAME:
    orbax metadata flattens its dict form in sorted-key order while the
    NamedTuple flattens in field order, so order-based pairing silently
    swaps same-shaped leaves whenever those orders differ (zeta/alpha
    here; optax.apply_if_finite in general)."""
    import collections

    from jax.sharding import NamedSharding, PartitionSpec as P

    from meshanything_tpu.parallel.mesh import create_mesh
    from meshanything_tpu.runtime.checkpoint import (
        from_plain_tree,
        load_orbax_sharded,
    )

    S = collections.namedtuple("S", ["zeta", "alpha"])  # non-sorted fields
    tree = {"opt_state": (S(zeta=jnp.full((4,), 7.0), alpha=jnp.full((4,), 3.0)),),
            "x": jnp.arange(4.0)}
    path = str(tmp_path / "ck_nt")
    save_orbax(tree, path)

    mesh = create_mesh(data=2, model=4)
    shardings = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree)
    back = from_plain_tree(load_orbax_sharded(path, shardings), tree)
    assert isinstance(back["opt_state"], tuple)
    assert isinstance(back["opt_state"][0], S)
    np.testing.assert_array_equal(np.asarray(back["opt_state"][0].zeta), 7.0)
    np.testing.assert_array_equal(np.asarray(back["opt_state"][0].alpha), 3.0)
    np.testing.assert_array_equal(np.asarray(back["x"]), np.arange(4.0))


def test_bettertransformer_fused_branch_matches_vanilla():
    """Synthesize a BetterTransformer-fused NRD naming
    (decoder.layer.{i}.in_proj_weight etc., as optimum saves after
    to_bettertransformer — the format the shipped checkpoint uses,
    meshanything.py:24) from the same underlying weights as the vanilla
    HF naming, and assert both conversion branches produce identical
    trees (round-1: this branch had zero coverage)."""
    from meshanything_tpu.runtime.checkpoint import convert_nrd

    sd = _build_reference_style_state_dict()
    n = CFG.nrd

    fused = {k: v for k, v in sd.items() if not k.startswith("tokenizer.decoder.")}
    for i in range(n.num_layers):
        src = f"tokenizer.decoder.layer.{i}."
        dst = f"tokenizer.decoder.layer.{i}."
        # optimum BertLayerBetterTransformer: in_proj = cat(q, k, v) rows
        fused[dst + "in_proj_weight"] = np.concatenate([
            sd[src + "attention.self.query.weight"],
            sd[src + "attention.self.key.weight"],
            sd[src + "attention.self.value.weight"],
        ], axis=0)
        fused[dst + "in_proj_bias"] = np.concatenate([
            sd[src + "attention.self.query.bias"],
            sd[src + "attention.self.key.bias"],
            sd[src + "attention.self.value.bias"],
        ])
        fused[dst + "out_proj_weight"] = sd[src + "attention.output.dense.weight"]
        fused[dst + "out_proj_bias"] = sd[src + "attention.output.dense.bias"]
        fused[dst + "norm1_weight"] = sd[src + "attention.output.LayerNorm.weight"]
        fused[dst + "norm1_bias"] = sd[src + "attention.output.LayerNorm.bias"]
        fused[dst + "linear1_weight"] = sd[src + "intermediate.dense.weight"]
        fused[dst + "linear1_bias"] = sd[src + "intermediate.dense.bias"]
        fused[dst + "linear2_weight"] = sd[src + "output.dense.weight"]
        fused[dst + "linear2_bias"] = sd[src + "output.dense.bias"]
        fused[dst + "norm2_weight"] = sd[src + "output.LayerNorm.weight"]
        fused[dst + "norm2_bias"] = sd[src + "output.LayerNorm.bias"]

    vanilla_tree = convert_nrd(sd, n)
    fused_tree = convert_nrd(fused, n)

    import jax

    va = jax.tree_util.tree_flatten_with_path(vanilla_tree)[0]
    fu = jax.tree_util.tree_flatten_with_path(fused_tree)[0]
    assert len(va) == len(fu)
    for (pa, a), (pb, b) in zip(va, fu):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(a, b, err_msg=jax.tree_util.keystr(pa))
