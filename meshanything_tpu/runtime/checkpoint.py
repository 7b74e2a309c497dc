"""Checkpoint conversion and persistence.

The reference ships one combined safetensors state dict
(``MeshAnything_350m.pth``; main.py:95-104) covering
point_encoder.* / tokenizer.* / transformer.*. This module maps that
torch state dict onto our functional parameter pytrees, and saves/loads
the converted tree with orbax.

Key layout differences handled here:
  * torch Linear weights are (out, in); ours are (in, out).
  * Michelangelo fused qkv/kv projections are interleaved per head
    (transformer_blocks.py:61-62: view(B, N, heads, 3*ch) then split),
    ours are the standard [Q | K | V] block layout — de-interleaved at
    conversion time.
  * torch per-layer modules become stacked (L, ...) leaves for lax.scan.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Mapping

import numpy as np

import jax.numpy as jnp

from meshanything_tpu.config import MeshAnythingConfig, PerceiverConfig, ShapeOPTConfig, NRDConfig


Arr = np.ndarray


def _lin(sd: Mapping[str, Arr], prefix: str, bias: bool = True) -> dict:
    p = {"w": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = np.asarray(sd[prefix + ".bias"])
    return p


def _ln(sd: Mapping[str, Arr], prefix: str) -> dict:
    return {"scale": np.asarray(sd[prefix + ".weight"]), "bias": np.asarray(sd[prefix + ".bias"])}


def _deinterleave_qkv(w_t: Arr, heads: int, parts: int) -> Arr:
    """torch fused qkv/kv weight (parts*W, in) with per-head interleaving
    -> (in, parts*W) with [Q|K|V] ([K|V]) block layout."""
    out_dim, in_dim = w_t.shape
    width = out_dim // parts
    ch = width // heads
    w = w_t.reshape(heads, parts, ch, in_dim)       # out index = h*parts*ch + p*ch + c
    w = np.transpose(w, (1, 0, 2, 3)).reshape(parts * width, in_dim)
    return np.ascontiguousarray(w.T)


def _deinterleave_qkv_bias(b_t: Arr, heads: int, parts: int) -> Arr:
    width = b_t.shape[0] // parts
    ch = width // heads
    return b_t.reshape(heads, parts, ch).transpose(1, 0, 2).reshape(parts * width)


def _miche_self_block(sd, prefix, heads, qkv_bias=False) -> dict:
    """ResidualAttentionBlock -> our self_attention_block params."""
    p = {
        "ln1": _ln(sd, f"{prefix}.ln_1"),
        "qkv": {"w": _deinterleave_qkv(np.asarray(sd[f"{prefix}.attn.c_qkv.weight"]), heads, 3)},
        "proj": _lin(sd, f"{prefix}.attn.c_proj"),
        "ln2": _ln(sd, f"{prefix}.ln_2"),
        "fc": _lin(sd, f"{prefix}.mlp.c_fc"),
        "fc_out": _lin(sd, f"{prefix}.mlp.c_proj"),
    }
    if qkv_bias and f"{prefix}.attn.c_qkv.bias" in sd:
        p["qkv"]["b"] = _deinterleave_qkv_bias(np.asarray(sd[f"{prefix}.attn.c_qkv.bias"]), heads, 3)
    return p


def _miche_cross_block(sd, prefix, heads, qkv_bias=False) -> dict:
    """ResidualCrossAttentionBlock -> our cross_attention_block params."""
    p = {
        "ln_q": _ln(sd, f"{prefix}.ln_1"),
        "ln_kv": _ln(sd, f"{prefix}.ln_2"),
        "q": {"w": np.ascontiguousarray(np.asarray(sd[f"{prefix}.attn.c_q.weight"]).T)},
        "kv": {"w": _deinterleave_qkv(np.asarray(sd[f"{prefix}.attn.c_kv.weight"]), heads, 2)},
        "proj": _lin(sd, f"{prefix}.attn.c_proj"),
        "ln_mlp": _ln(sd, f"{prefix}.ln_3"),
        "fc": _lin(sd, f"{prefix}.mlp.c_fc"),
        "fc_out": _lin(sd, f"{prefix}.mlp.c_proj"),
    }
    if qkv_bias:
        if f"{prefix}.attn.c_q.bias" in sd:
            p["q"]["b"] = np.asarray(sd[f"{prefix}.attn.c_q.bias"])
        if f"{prefix}.attn.c_kv.bias" in sd:
            p["kv"]["b"] = _deinterleave_qkv_bias(np.asarray(sd[f"{prefix}.attn.c_kv.bias"]), heads, 2)
    return p


def _stack(dicts):
    import jax
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *dicts)


def convert_perceiver(sd: Mapping[str, Arr], cfg: PerceiverConfig, prefix: str = "") -> dict:
    """Convert an AlignedShapeLatentPerceiver state dict subtree.

    ``prefix`` is e.g. "point_encoder.model.shape_model." for the
    combined checkpoint, or "" for a bare perceiver state dict.
    """
    g = lambda k: prefix + k  # noqa: E731
    heads = cfg.heads
    enc = [
        _miche_self_block(sd, g(f"encoder.self_attn.resblocks.{i}"), heads, cfg.qkv_bias)
        for i in range(cfg.num_encoder_layers)
    ]
    dec = [
        _miche_self_block(sd, g(f"transformer.resblocks.{i}"), heads, cfg.qkv_bias)
        for i in range(cfg.num_decoder_layers)
    ]
    return {
        "query": np.asarray(sd[g("encoder.query")]),
        "input_proj": _lin(sd, g("encoder.input_proj")),
        "cross_attn": _miche_cross_block(sd, g("encoder.cross_attn"), heads, cfg.qkv_bias),
        "encoder": _stack(enc),
        "ln_post": _ln(sd, g("encoder.ln_post")),
        "pre_kl": _lin(sd, g("pre_kl")),
        "post_kl": _lin(sd, g("post_kl")),
        "transformer": _stack(dec),
        "geo_decoder": {
            "query_proj": _lin(sd, g("geo_decoder.query_proj")),
            "cross": _miche_cross_block(sd, g("geo_decoder.cross_attn_decoder"), heads, cfg.qkv_bias),
            "ln_post": _ln(sd, g("geo_decoder.ln_post")),
            "output_proj": _lin(sd, g("geo_decoder.output_proj")),
        },
    }


def convert_opt(sd: Mapping[str, Arr], cfg: ShapeOPTConfig, prefix: str = "transformer.") -> dict:
    """Convert the ShapeOPT decoder + head (shape_opt.py:18-245).

    HF OPT layer naming: self_attn.{q,k,v,out}_proj, self_attn_layer_norm,
    fc1, fc2, final_layer_norm (per-layer ffn LN in post-LN OPT).
    """
    g = lambda k: prefix + k  # noqa: E731
    d = "model.decoder."

    def opt_layer(i):
        lp = g(f"{d}layers.{i}.")
        qw = np.asarray(sd[lp + "self_attn.q_proj.weight"]).T
        kw = np.asarray(sd[lp + "self_attn.k_proj.weight"]).T
        vw = np.asarray(sd[lp + "self_attn.v_proj.weight"]).T
        qb = np.asarray(sd[lp + "self_attn.q_proj.bias"])
        kb = np.asarray(sd[lp + "self_attn.k_proj.bias"])
        vb = np.asarray(sd[lp + "self_attn.v_proj.bias"])
        return {
            "qkv": {
                "w": np.ascontiguousarray(np.concatenate([qw, kw, vw], axis=1)),
                "b": np.concatenate([qb, kb, vb]),
            },
            "out": _lin(sd, lp + "self_attn.out_proj"),
            "ln_attn": _ln(sd, lp + "self_attn_layer_norm"),
            "fc1": _lin(sd, lp + "fc1"),
            "fc2": _lin(sd, lp + "fc2"),
            "ln_ffn": _ln(sd, lp + "final_layer_norm"),
        }

    layers = [opt_layer(i) for i in range(cfg.num_layers)]
    return {
        "extra_embeds": np.asarray(sd[g(d + "extra_embeds.weight")]),
        "input_layer": _lin(sd, g(d + "input_layer")),
        "embed_positions": np.asarray(sd[g(d + "embed_positions.weight")]),
        "face_positions": np.asarray(sd[g(d + "token_embed_positions.weight")]),
        "cond_embed": np.asarray(sd[g(d + "cond_embed.weight")]),
        "codebook": np.asarray(sd[g(d + "quantize_codebooks")])[0],
        "layers": _stack(layers),
        "lm_head": {"w": np.ascontiguousarray(np.asarray(sd[g("lm_head.weight")]).T)},
    }


def convert_bert_encoder(sd: Mapping[str, Arr], cfg: NRDConfig, prefix: str) -> dict:
    """Convert a HF BertEncoder subtree (layer.{i}.attention...)."""
    def bert_layer(i):
        lp = f"{prefix}layer.{i}."
        qw = np.asarray(sd[lp + "attention.self.query.weight"]).T
        kw = np.asarray(sd[lp + "attention.self.key.weight"]).T
        vw = np.asarray(sd[lp + "attention.self.value.weight"]).T
        qb = np.asarray(sd[lp + "attention.self.query.bias"])
        kb = np.asarray(sd[lp + "attention.self.key.bias"])
        vb = np.asarray(sd[lp + "attention.self.value.bias"])
        return {
            "qkv": {
                "w": np.ascontiguousarray(np.concatenate([qw, kw, vw], axis=1)),
                "b": np.concatenate([qb, kb, vb]),
            },
            "attn_out": _lin(sd, lp + "attention.output.dense"),
            "ln_attn": _ln(sd, lp + "attention.output.LayerNorm"),
            "fc1": _lin(sd, lp + "intermediate.dense"),
            "fc2": _lin(sd, lp + "output.dense"),
            "ln_ffn": _ln(sd, lp + "output.LayerNorm"),
        }

    return _stack([bert_layer(i) for i in range(cfg.num_layers)])


def convert_nrd(sd: Mapping[str, Arr], cfg: NRDConfig, prefix: str = "tokenizer.") -> dict:
    """NoiseResistantDecoder (meshanything.py:10-41).

    Note: with BetterTransformer the BERT encoder layers are stored as
    ``decoder.layer.{i}.*`` fused params; the shipped checkpoint was
    saved from the BetterTransformer-ized module. Both the fused
    (``in_proj_weight``) and vanilla HF namings are accepted.
    """
    g = lambda k: prefix + k  # noqa: E731

    fused_probe = g("decoder.layer.0.in_proj_weight")
    if fused_probe in sd:
        def bt_layer(i):
            lp = g(f"decoder.layer.{i}.")
            w = np.asarray(sd[lp + "in_proj_weight"])  # (3H, H) rows [q;k;v]
            b = np.asarray(sd[lp + "in_proj_bias"])
            return {
                "qkv": {"w": np.ascontiguousarray(w.T), "b": b},
                "attn_out": {"w": np.ascontiguousarray(np.asarray(sd[lp + "out_proj_weight"]).T),
                             "b": np.asarray(sd[lp + "out_proj_bias"])},
                "ln_attn": {"scale": np.asarray(sd[lp + "norm1_weight"]), "bias": np.asarray(sd[lp + "norm1_bias"])},
                "fc1": {"w": np.ascontiguousarray(np.asarray(sd[lp + "linear1_weight"]).T),
                        "b": np.asarray(sd[lp + "linear1_bias"])},
                "fc2": {"w": np.ascontiguousarray(np.asarray(sd[lp + "linear2_weight"]).T),
                        "b": np.asarray(sd[lp + "linear2_bias"])},
                "ln_ffn": {"scale": np.asarray(sd[lp + "norm2_weight"]), "bias": np.asarray(sd[lp + "norm2_bias"])},
            }
        encoder = _stack([bt_layer(i) for i in range(cfg.num_layers)])
    else:
        encoder = convert_bert_encoder(sd, cfg, prefix + "decoder.")

    return {
        "pos_embedding": np.asarray(sd[g("pos_embedding.weight")]),
        "layernorm": _ln(sd, g("layernorm")),
        "point_layernorm": _ln(sd, g("point_layernorm")),
        "point_pe": np.asarray(sd[g("point_pe.weight")]),
        "cond_proj": _lin(sd, g("cond_proj")),
        "cond_head_proj": _lin(sd, g("cond_head_proj")),
        "project_down_codebook": _lin(sd, g("project_down_codebook")),
        "to_coor_logits": _lin(sd, g("to_coor_logits.0")),
        "encoder": encoder,
    }


def convert_meshanything(sd: Mapping[str, Arr], cfg: MeshAnythingConfig) -> dict:
    """Full combined state dict -> our parameter pytree (SURVEY.md §3.4)."""
    return {
        "perceiver": convert_perceiver(sd, cfg.perceiver, "point_encoder.model.shape_model."),
        "opt": convert_opt(sd, cfg.opt, "transformer."),
        "nrd": convert_nrd(sd, cfg.nrd, "tokenizer."),
        "cond_head_proj": _lin(sd, "cond_head_proj"),
        "cond_proj": _lin(sd, "cond_proj"),
    }


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    tensors = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            tensors[k] = f.get_tensor(k)
    return tensors


def load_reference_checkpoint(path: str, cfg: MeshAnythingConfig) -> dict:
    """MeshAnything_350m.pth (safetensors despite the name) -> param tree."""
    return convert_meshanything(load_safetensors(path), cfg)


def to_device_tree(tree, dtype=None):
    """numpy tree -> jnp tree (optionally casting float leaves)."""
    import jax

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    return jax.tree_util.tree_map(conv, tree)


def save_orbax(tree, path: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def load_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def to_plain_tree(tree):
    """Re-container a pytree the way orbax's metadata represents it:
    NamedTuples become dicts keyed by field name, tuples become lists.
    Leaf VALUES are untouched. Pairing trees by this normalized
    structure matches leaves by NAME — never by flattened order, which
    silently swaps same-shaped leaves whenever a NamedTuple's field
    order differs from its sorted-key order (dicts flatten sorted)."""
    if hasattr(tree, "_fields"):  # NamedTuple (e.g. optax states)
        # empty containers (optax EmptyState) appear as None in orbax
        # metadata — collapse to match
        return {f: to_plain_tree(getattr(tree, f))
                for f in tree._fields} or None
    if isinstance(tree, dict):
        return {k: to_plain_tree(v) for k, v in tree.items()} or None
    if isinstance(tree, (list, tuple)):
        return [to_plain_tree(v) for v in tree] or None
    return tree


def from_plain_tree(plain, template):
    """Inverse of to_plain_tree: rebuild ``template``'s container types
    around the values of ``plain`` (a restored checkpoint tree),
    matching by field/key names and indices."""
    if template is None:
        return None
    if hasattr(template, "_fields"):
        return type(template)(**{
            f: from_plain_tree(plain[f], getattr(template, f))
            for f in template._fields})
    if isinstance(template, dict):
        return {k: from_plain_tree(plain[k], v) for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return type(template)(
            from_plain_tree(p, t) for p, t in zip(plain, template))
    return plain


def load_orbax_sharded(path: str, shardings):
    """Restore an orbax checkpoint directly onto device shardings.

    ``shardings`` is a tree of jax.sharding.Sharding congruent with the
    saved tree (e.g. ``parallel.mesh.param_shardings(mesh, params)``);
    NamedTuple/tuple containers (optax states) are matched to the
    checkpoint by field name via to_plain_tree. Each device
    materializes ONLY its shard straight from storage — no full-size
    host replica is ever built, which is what makes restoring models
    larger than one host/chip (the multi-chip serving path) possible.
    Shapes and dtypes come from the checkpoint's own metadata, so no
    template params are needed.

    Returns the checkpoint's plain structure (dicts/lists); use
    from_plain_tree to rebuild the original container types.
    """
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    meta = ckptr.metadata(path).item_metadata.tree
    abstract = jax.tree_util.tree_map(
        lambda m, s: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=s),
        meta, to_plain_tree(shardings))
    return ckptr.restore(path, abstract)
