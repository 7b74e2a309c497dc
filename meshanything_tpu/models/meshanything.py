"""Top-level MeshAnything composition: perceiver -> condition ->
autoregressive decode -> codebook gather -> noise-resistant detokenizer.

Functional re-design of ``MeshAnything``
(MeshAnything/models/meshanything.py:82-212). The whole forward is a
single jitted program per phase; all shapes static.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from meshanything_tpu.config import MeshAnythingConfig
from meshanything_tpu.models import nrd as nrd_mod
from meshanything_tpu.models import perceiver as per_mod
from meshanything_tpu.models import shape_opt as opt_mod
from meshanything_tpu.models.layers import linear


def init_meshanything_params(key: jax.Array, cfg: MeshAnythingConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5)
    d_cond = cfg.opt.cond_dim
    d_model = cfg.opt.hidden_size
    return {
        "perceiver": per_mod.init_perceiver_params(ks[0], cfg.perceiver, dtype),
        "opt": opt_mod.init_shape_opt_params(ks[1], cfg.opt, dtype),
        "nrd": nrd_mod.init_nrd_params(ks[2], cfg.nrd, dtype),
        "cond_head_proj": {
            "w": jax.random.normal(ks[3], (d_cond, d_model), dtype) * 0.02,
            "b": jnp.zeros((d_model,), dtype),
        },
        "cond_proj": {
            "w": jax.random.normal(ks[4], (d_cond * 2, d_model), dtype) * 0.02,
            "b": jnp.zeros((d_model,), dtype),
        },
    }


def process_point_feature(params: dict, cfg: MeshAnythingConfig, point_feature: jax.Array) -> jax.Array:
    """Condition builder (meshanything.py:125-132): token 0 from the
    shape embed, tokens 1..256 from [latents ‖ VAE-decoded latents]."""
    head = linear(point_feature[:, :1], params["cond_head_proj"]["w"], params["cond_head_proj"]["b"])
    shape_latents = per_mod.to_shape_latents(params["perceiver"], cfg.perceiver, point_feature[:, 1:])
    rest = linear(
        jnp.concatenate([point_feature[:, 1:], shape_latents], axis=-1),
        params["cond_proj"]["w"], params["cond_proj"]["b"],
    )
    return jnp.concatenate([head, rest], axis=1)


def get_codes(params: dict, cfg: MeshAnythingConfig, indices: jax.Array) -> jax.Array:
    """Codebook gather + residual-quantizer sum (meshanything.py:178-212).

    indices: (B, T) int32 with pad_id == -1; T = nf * 9. Groups of
    num_quantizers (3) consecutive ids are looked up in the shared
    codebook and summed -> (B, T/3, codebook_dim)."""
    b, t = indices.shape
    q = cfg.num_quantizers
    idx = indices.reshape(b, t // q, q)
    mask = idx == -1
    safe = jnp.where(mask, 0, idx)
    codes = params["opt"]["codebook"][safe]            # (B, n, q, D)
    codes = jnp.where(mask[..., None], 0.0, codes)
    return codes.sum(axis=2)


class GenerateOutput(NamedTuple):
    face_coords: jax.Array   # (B, n_max_triangles, 3, 3) with NaN padding
    token_ids: jax.Array     # (B, generate_length) raw generated stream


def token_postprocess(cfg: MeshAnythingConfig, raw_tokens: jax.Array) -> jax.Array:
    """meshanything.py:163-172: strip predicted bos + final slot, map
    special ids -> pad_id (-1), shift the rest down by 3."""
    out = raw_tokens[:, 1:-1]
    is_special = out < 3
    return jnp.where(is_special, -1, out - 3)


def generate(
    params: dict,
    cfg: MeshAnythingConfig,
    pc_normal: jax.Array,
    *,
    sampling: bool = False,
    key: Optional[jax.Array] = None,
    bucket: int = 512,
    lookahead: int = 0,
    attn: str = "auto",
    wq: bool = False,
) -> GenerateOutput:
    """Full inference pass (meshanything.py:134-176).

    pc_normal: (B, N, 6) normalized points+normals.
    lookahead > 0 enables Jacobi multi-token decoding with that window
    size — exact greedy, and with sampling=True exact speculative
    top-k/top-p sampling (models/lookahead.py).
    wq: int8 W8A8 decode weights (fast mode, ops/wquant.py).
    """
    dtype = cfg.activation_dtype
    pc_normal = pc_normal.astype(dtype)

    point_feature = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pc_normal)
    cond = process_point_feature(params, cfg, point_feature)

    if lookahead > 0:
        from meshanything_tpu.models.lookahead import generate_lookahead

        # composes with attn="pallas_int8" (lookahead windows over the
        # quantized cache) and with sampling=True (speculative top-k/
        # top-p — exact distribution, models/lookahead.py)
        raw = generate_lookahead(
            params["opt"], cfg.opt, cond,
            max_new_tokens=cfg.generate_length,
            window=lookahead, bucket=bucket, attn=attn, wq=wq,
            sampling=sampling, key=key,
        )
    else:
        raw = opt_mod.generate(
            params["opt"], cfg.opt, cond,
            max_new_tokens=cfg.generate_length,
            key=key, sampling=sampling, bucket=bucket, attn=attn, wq=wq,
        )

    ids = token_postprocess(cfg, raw)
    code_embeds = get_codes(params, cfg, ids)
    coords = nrd_mod.decode_faces(
        params["nrd"], cfg.nrd, ids, code_embeds.astype(dtype), point_feature
    )
    return GenerateOutput(face_coords=coords, token_ids=raw)


def discretize_faces(cfg: MeshAnythingConfig, face_coords: jax.Array) -> jax.Array:
    """Inverse of the NRD undiscretize (meshanything.py:214-223): clamp
    [-0.5, 0.5) coords onto the discrete grid and add the +3 special
    offset -> (B, nf*9) stream-order token ids."""
    bins = cfg.nrd.discrete_num
    disc = jnp.clip(jnp.floor((face_coords + 0.5) * bins), 0, bins - 1)
    b = face_coords.shape[0]
    return disc.astype(jnp.int32).reshape(b, -1) + 3


def build_face_prompt(cfg: MeshAnythingConfig, face_coords) -> "jnp.ndarray":
    """THE prompt assembly point for mesh completion, shared by
    complete()/CLI/serving: [bos ‖ discretize_faces] in stream order,
    (B, 1 + nf*9) int32. Validates the face budget up front so an
    oversized partial fails with an actionable message instead of a
    mid-trace error."""
    face_coords = jnp.asarray(face_coords)
    nf = face_coords.shape[1]
    max_nf = (cfg.generate_length - 2) // cfg.opt.face_per_token
    if nf >= max_nf:
        raise ValueError(
            f"partial mesh has {nf} faces; completion needs room to "
            f"continue — at n_max_triangles={cfg.n_max_triangles} the "
            f"prompt may carry at most {max_nf - 1} faces")
    toks = discretize_faces(cfg, face_coords)
    bos = jnp.full((face_coords.shape[0], 1), cfg.opt.bos_token_id, jnp.int32)
    return jnp.concatenate([bos, toks], axis=1)


def complete(
    params: dict,
    cfg: MeshAnythingConfig,
    pc_normal: jax.Array,
    partial_faces: jax.Array,
    *,
    sampling: bool = False,
    key: Optional[jax.Array] = None,
    bucket: int = 512,
    lookahead: int = 0,
    attn: str = "auto",
    wq: bool = False,
) -> GenerateOutput:
    """Mesh completion: continue autoregressive generation from a
    partial face list conditioned on the full shape's point cloud.

    partial_faces: (B, nf, 3, 3) float coords in [-0.5, 0.5) — e.g. the
    first faces of an artist mesh to be extended. They are discretized
    onto the token grid, prefilled as [bos ‖ face tokens] in one causal
    pass, and the decoder continues from there; the prompt faces come
    back at the front of the output stream.

    Capability note: the reference could reach this through HF
    ``generate(input_ids=...)`` (shape_opt.py:318-328 handles the
    input_ids path) but never exposes it; here it is a first-class
    entry next to ``generate``.
    """
    dtype = cfg.activation_dtype
    pc_normal = pc_normal.astype(dtype)

    point_feature = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pc_normal)
    cond = process_point_feature(params, cfg, point_feature)

    prompt = build_face_prompt(cfg, partial_faces)

    if lookahead > 0:
        from meshanything_tpu.models.lookahead import generate_lookahead

        raw = generate_lookahead(
            params["opt"], cfg.opt, cond,
            max_new_tokens=cfg.generate_length,
            window=lookahead, bucket=bucket, attn=attn, wq=wq,
            prompt_ids=prompt, sampling=sampling, key=key,
        )
    else:
        raw = opt_mod.generate(
            params["opt"], cfg.opt, cond,
            max_new_tokens=cfg.generate_length,
            key=key, sampling=sampling, bucket=bucket, attn=attn, wq=wq,
            prompt_ids=prompt,
        )

    ids = token_postprocess(cfg, raw)
    code_embeds = get_codes(params, cfg, ids)
    coords = nrd_mod.decode_faces(
        params["nrd"], cfg.nrd, ids, code_embeds.astype(dtype), point_feature
    )
    return GenerateOutput(face_coords=coords, token_ids=raw)


def forward_logits(
    params: dict,
    cfg: MeshAnythingConfig,
    pc_normal: jax.Array,
    token_ids: jax.Array,
    *,
    remat: bool = False,
    block_q: int = 0,
) -> jax.Array:
    """Teacher-forcing logits over [cond ‖ token_ids] — the training-path
    forward (ShapeOPT.forward with labels, shape_opt.py:155-166 computes
    the shifted CE elsewhere; see training/losses.py).

    remat/block_q: per-layer rematerialization and blockwise causal
    attention for full-length training (see shape_opt.forward_full)."""
    dtype = cfg.activation_dtype
    point_feature = per_mod.encode_latents(params["perceiver"], cfg.perceiver, pc_normal.astype(dtype))
    cond = process_point_feature(params, cfg, point_feature)
    return opt_mod.forward_full(params["opt"], cfg.opt, cond, token_ids,
                                remat=remat, block_q=block_q)
