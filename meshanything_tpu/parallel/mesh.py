"""Device mesh + sharding strategy.

The reference's only parallelism is DDP data-parallel inference via HF
accelerate/NCCL (main.py:113-146; SURVEY.md §2.4). The TPU-native
design replaces that with a ``jax.sharding.Mesh`` over ICI and
NamedShardings consumed by jit — XLA inserts the collectives:

  * ``data``  axis: batch sharding (DP) — inference and training;
  * ``model`` axis: megatron-style tensor parallelism over the OPT
    decoder (column-parallel qkv/fc1, row-parallel out/fc2 — the
    pattern of the scaling-book TP recipe), the perceiver MLPs/heads
    and the BERT detokenizer, plus vocab-sharded lm_head.

Both axes compose: mesh (data=D, model=M) runs D*M chips with batch
slices on ``data`` and weight slices on ``model``.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: int = 1, model: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _attn_block_spec(qkv_key: str = "qkv"):
    """Column-parallel fused qkv + row-parallel out projection.

    Our fused qkv layout is [Q | K | V] blocks; sharding the last axis
    over ``model`` splits *heads* only when model divides num_heads —
    callers must ensure that (16 OPT heads, 12 perceiver/BERT heads).
    """
    return {
        qkv_key: {"w": P(None, "model"), "b": P("model")},
    }


def opt_layer_specs() -> dict:
    """PartitionSpecs for one (stacked) OPT layer: leaves carry a
    leading layer axis (lax.scan stacking), so every spec is prefixed
    with None."""
    L = None  # layer axis
    return {
        "qkv": {"w": P(L, None, "model"), "b": P(L, "model")},
        "out": {"w": P(L, "model", None), "b": P(L)},
        "ln_attn": {"scale": P(L), "bias": P(L)},
        "fc1": {"w": P(L, None, "model"), "b": P(L, "model")},
        "fc2": {"w": P(L, "model", None), "b": P(L)},
        "ln_ffn": {"scale": P(L), "bias": P(L)},
    }


def bertlike_layer_specs(qkv_key: str = "qkv", out_key: str = "attn_out") -> dict:
    L = None
    return {
        qkv_key: {"w": P(L, None, "model"), "b": P(L, "model")},
        out_key: {"w": P(L, "model", None), "b": P(L)},
        "ln_attn": {"scale": P(L), "bias": P(L)},
        "fc1": {"w": P(L, None, "model"), "b": P(L, "model")},
        "fc2": {"w": P(L, "model", None), "b": P(L)},
        "ln_ffn": {"scale": P(L), "bias": P(L)},
    }


def miche_self_block_specs() -> dict:
    L = None
    return {
        "ln1": {"scale": P(L), "bias": P(L)},
        "qkv": {"w": P(L, None, "model")},
        "proj": {"w": P(L, "model", None), "b": P(L)},
        "ln2": {"scale": P(L), "bias": P(L)},
        "fc": {"w": P(L, None, "model"), "b": P(L, "model")},
        "fc_out": {"w": P(L, "model", None), "b": P(L)},
    }


def _cross_block_specs() -> dict:
    return {
        "ln_q": {"scale": P(), "bias": P()},
        "ln_kv": {"scale": P(), "bias": P()},
        "q": {"w": P(None, "model")},
        "kv": {"w": P(None, "model")},
        "proj": {"w": P("model", None), "b": P()},
        "ln_mlp": {"scale": P(), "bias": P()},
        "fc": {"w": P(None, "model"), "b": P("model")},
        "fc_out": {"w": P("model", None), "b": P()},
    }


def perceiver_specs() -> dict:
    return {
        "query": P(),
        "input_proj": {"w": P(), "b": P()},
        "cross_attn": _cross_block_specs(),
        "encoder": miche_self_block_specs(),
        "ln_post": {"scale": P(), "bias": P()},
        "pre_kl": {"w": P(), "b": P()},
        "post_kl": {"w": P(), "b": P()},
        "transformer": miche_self_block_specs(),
        "geo_decoder": {
            "query_proj": {"w": P(), "b": P()},
            "cross": _cross_block_specs(),
            "ln_post": {"scale": P(), "bias": P()},
            "output_proj": {"w": P(), "b": P()},
        },
    }


def shape_opt_specs() -> dict:
    return {
        "extra_embeds": P(),
        "input_layer": {"w": P(), "b": P()},
        "embed_positions": P(),
        "face_positions": P(),
        "cond_embed": P(),
        "codebook": P(),
        "layers": opt_layer_specs(),
        # vocab 8195 = 5*11*149 has no useful divisors — the lm_head is
        # replicated (its (1024, 8195) bf16 slab is ~16 MB, negligible).
        "lm_head": {"w": P()},
    }


def nrd_specs() -> dict:
    return {
        "pos_embedding": P(),
        "layernorm": {"scale": P(), "bias": P()},
        "point_layernorm": {"scale": P(), "bias": P()},
        "point_pe": P(),
        "cond_proj": {"w": P(), "b": P()},
        "cond_head_proj": {"w": P(), "b": P()},
        "project_down_codebook": {"w": P(), "b": P()},
        "to_coor_logits": {"w": P(), "b": P()},
        "encoder": bertlike_layer_specs(),
    }


def meshanything_specs() -> dict:
    return {
        "perceiver": perceiver_specs(),
        "opt": shape_opt_specs(),
        "nrd": nrd_specs(),
        "cond_head_proj": {"w": P(), "b": P()},
        "cond_proj": {"w": P(), "b": P()},
    }


def param_shardings(mesh: Mesh, params) -> dict:
    """NamedSharding tree matching the full parameter pytree."""
    specs = meshanything_specs()

    def to_sharding(spec, leaf):
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(
        to_sharding, specs, params,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params):
    shardings = param_shardings(mesh, params)
    return jax.device_put(params, shardings), shardings
