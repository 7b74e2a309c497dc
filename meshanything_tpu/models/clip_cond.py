"""CLIP conditional encoders — TPU-native rebuild of the reference's
vendored conditional_encoders tier (dead on its live path).

Reference: michelangelo/models/conditional_encoders/encoder_factory.py:
  * FrozenCLIPTextEmbedder (:38-108) — frozen HF CLIP text tower;
    forward returns last_hidden_state; unconditional embedding = the
    empty string; encode() zero-drops whole samples at
    zero_embedding_radio.
  * FrozenCLIPImageEmbedder (:185-296) — resize-224/center-crop/CLIP
    mean-std normalize, get_image_features, L2-normalize, optional
    zero-dropout, optional projection fan-out.
  * FrozenCLIPImageGridEmbedder (:299-379) — all vision tokens (grid)
    instead of the pooled feature.

Here the towers are functional JAX (pre-LN transformer with quickGELU,
causal mask for text; patch-embed + cls + pre/post LN for vision), and
the weights come from any HF CLIPModel state dict via
``convert_clip_text`` / ``convert_clip_vision`` (q/k/v de-fused into
our packed qkv layout, torch (out,in) transposed) — the same converter
discipline as runtime/checkpoint.py. Frozen-ness is structural: params
are plain pytrees that simply aren't passed to any optimizer.

No network egress exists in this environment, so loading the published
openai/clip-vit-large-patch14 weights requires a local file; tests
verify numerical parity against randomly-initialized HF CLIP modules
(``from_config``), which pins the math rather than the weights.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Mapping, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from meshanything_tpu.models.layers import init_linear, init_ln, layer_norm, linear


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_positions: int = 77
    projection_dim: int = 768
    ln_eps: float = 1e-5
    eos_token_id: int = 49407


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    projection_dim: int = 768
    ln_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


# ---------------------------------------------------------------------------
# shared transformer


def _clip_layer(x: jax.Array, p: dict, *, heads: int, causal: bool, eps: float) -> jax.Array:
    """HF CLIPEncoderLayer: pre-LN attn + pre-LN quickGELU MLP."""
    b, n, d = x.shape
    hd = d // heads
    h = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps)
    qkv = linear(h, p["qkv"]["w"], p["qkv"]["b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, hd)
    k = k.reshape(b, n, heads, hd)
    v = v.reshape(b, n, heads, hd)
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bthd,bshd->bhts", q * jnp.asarray(scale, q.dtype), k,
                        preferred_element_type=jnp.float32)
    if causal:
        mask = jnp.tril(jnp.ones((n, n), bool))
        logits = jnp.where(mask[None, None], logits, jnp.float32(-1e30))
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhts,bshd->bthd", w, v, preferred_element_type=q.dtype)
    x = x + linear(o.reshape(b, n, d), p["out"]["w"], p["out"]["b"])

    h = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], eps)
    h = linear(quick_gelu(linear(h, p["fc1"]["w"], p["fc1"]["b"])),
               p["fc2"]["w"], p["fc2"]["b"])
    return x + h


def _encoder(x: jax.Array, stacked: dict, *, heads: int, causal: bool, eps: float) -> jax.Array:
    def body(h, p):
        return _clip_layer(h, p, heads=heads, causal=causal, eps=eps), None

    x, _ = jax.lax.scan(body, x, stacked)
    return x


# ---------------------------------------------------------------------------
# text tower


def clip_text_forward(params: dict, cfg: CLIPTextConfig, input_ids: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """HF CLIPTextModel forward over padded (B, 77) ids with the causal
    mask (the reference passes no attention mask, encoder_factory.py:97).

    Returns (last_hidden_state (B, N, D), pooled (B, D)) — pooled is the
    eos-position token after the final LN (HF semantics)."""
    b, n = input_ids.shape
    x = params["token_embedding"][input_ids]
    x = x + params["position_embedding"][jnp.arange(n)]
    x = _encoder(x, params["layers"], heads=cfg.heads, causal=True, eps=cfg.ln_eps)
    x = layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"], cfg.ln_eps)
    eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(b), eos_pos]
    return x, pooled


def clip_text_features(params: dict, cfg: CLIPTextConfig, input_ids: jax.Array) -> jax.Array:
    """get_text_features: pooled @ text_projection."""
    _, pooled = clip_text_forward(params, cfg, input_ids)
    return linear(pooled, params["text_projection"]["w"])


# ---------------------------------------------------------------------------
# vision tower


def clip_vision_forward(params: dict, cfg: CLIPVisionConfig, pixel_values: jax.Array
                        ) -> Tuple[jax.Array, jax.Array]:
    """HF CLIPVisionModel forward over (B, 3, H, W) normalized pixels.

    Returns (last_hidden_state (B, 1+P, D), pooled (B, D)) — pooled is
    the post-LN class token."""
    b = pixel_values.shape[0]
    p = cfg.patch_size
    # patch embedding: conv with stride=kernel=p, no bias == unfold+matmul
    img = jnp.transpose(pixel_values, (0, 2, 3, 1))                  # (B, H, W, 3)
    gh = cfg.image_size // p
    patches = img.reshape(b, gh, p, gh, p, 3).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, gh * gh, p * p * 3)
    x = linear(patches, params["patch_embedding"]["w"])              # (B, P, D)
    cls = jnp.broadcast_to(params["class_embedding"], (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + params["position_embedding"][jnp.arange(x.shape[1])]
    x = layer_norm(x, params["pre_ln"]["scale"], params["pre_ln"]["bias"], cfg.ln_eps)
    x = _encoder(x, params["layers"], heads=cfg.heads, causal=False, eps=cfg.ln_eps)
    pooled = layer_norm(x[:, 0], params["post_ln"]["scale"], params["post_ln"]["bias"], cfg.ln_eps)
    return x, pooled


def clip_image_features(params: dict, cfg: CLIPVisionConfig, pixel_values: jax.Array) -> jax.Array:
    _, pooled = clip_vision_forward(params, cfg, pixel_values)
    return linear(pooled, params["visual_projection"]["w"])


# ---------------------------------------------------------------------------
# preprocessing (torchvision transform parity, encoder_factory.py:209-218)

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(image: jax.Array, image_size: int = 224,
                     value_range: Optional[Tuple[float, float]] = (-1.0, 1.0),
                     method: str = "cubic") -> jax.Array:
    """(B, 3, H, W) -> resized/center-cropped/CLIP-normalized pixels.

    method: "cubic" matches the pooled embedder's BICUBIC transform
    (encoder_factory.py:211); the grid embedder resizes BILINEAR
    (encoder_factory.py:324) — pass "linear" there."""
    if value_range is not None:
        lo, hi = value_range
        image = (image - lo) / (hi - lo)
    b, c, h, w = image.shape
    short = min(h, w)
    new_h, new_w = int(round(h * image_size / short)), int(round(w * image_size / short))
    image = jax.image.resize(image, (b, c, new_h, new_w), method=method)
    top = (new_h - image_size) // 2
    left = (new_w - image_size) // 2
    image = image[:, :, top:top + image_size, left:left + image_size]
    mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_STD)[None, :, None, None]
    return (image - mean) / std


# ---------------------------------------------------------------------------
# embedder wrappers (the encoder_factory surface)


def text_embedding(params: dict, cfg: CLIPTextConfig, input_ids: jax.Array) -> jax.Array:
    """FrozenCLIPTextEmbedder.forward: the full last_hidden_state
    (B, 77, D) (encoder_factory.py:83-100)."""
    z, _ = clip_text_forward(params, cfg, input_ids)
    return z


def image_embedding(params: dict, cfg: CLIPVisionConfig, image: jax.Array, *,
                    key: Optional[jax.Array] = None,
                    value_range: Optional[Tuple[float, float]] = (-1.0, 1.0),
                    zero_embedding_radio: float = 0.0,
                    normalize: bool = True) -> jax.Array:
    """FrozenCLIPImageEmbedder.forward (encoder_factory.py:261-285):
    pooled projected feature, L2-normalized, (B, 1, D), with optional
    whole-sample zero dropout."""
    pixels = preprocess_image(image, cfg.image_size, value_range)
    z = clip_image_features(params, cfg, pixels)
    if normalize:
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    z = z[:, None, :]
    if zero_embedding_radio > 0 and key is not None:
        keep = jax.random.uniform(key, (z.shape[0], 1, 1)) >= zero_embedding_radio
        z = z * keep.astype(z.dtype)
    return z


def image_grid_embedding(params: dict, cfg: CLIPVisionConfig, image: jax.Array, *,
                         key: Optional[jax.Array] = None,
                         value_range: Optional[Tuple[float, float]] = (-1.0, 1.0),
                         zero_embedding_radio: float = 0.0) -> jax.Array:
    """FrozenCLIPImageGridEmbedder: every vision token (B, 1+P, D)
    (encoder_factory.py:299-379). Resizes BILINEAR (that embedder's
    transform differs from the pooled one) and supports the same
    whole-sample zero dropout."""
    pixels = preprocess_image(image, cfg.image_size, value_range, method="linear")
    z, _ = clip_vision_forward(params, cfg, pixels)
    if zero_embedding_radio > 0 and key is not None:
        keep = jax.random.uniform(key, (z.shape[0], 1, 1)) >= zero_embedding_radio
        z = z * keep.astype(z.dtype)
    return z


def unconditional_text_ids(cfg: CLIPTextConfig, batch: int, bos: int = 49406) -> jax.Array:
    """Token ids of the empty string: [bos, eos, eos...] padded — the
    reference's unconditional embedding (encoder_factory.py:78-81)."""
    ids = jnp.full((batch, cfg.max_positions), cfg.eos_token_id, jnp.int32)
    return ids.at[:, 0].set(bos)


def load_text_templates(category: str = "shape") -> list:
    """CLIP prompt-ensemble templates — the data file backing the
    reference's conditional text encoders (miche/michelangelo/data/
    templates.json, consumed by encoder_factory.py's text embedders).
    Returns the raw ``"a photo of a {}."``-style format strings."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "data", "templates.json")
    with open(path) as fh:
        return list(json.load(fh)[category])


def expand_text_templates(label: str, category: str = "shape") -> list:
    """Fill one class label into every template — the prompt ensemble a
    CLIP text tower averages over (reference encoder_factory.py usage
    of templates.json)."""
    return [t.format(label) for t in load_text_templates(category)]


# ---------------------------------------------------------------------------
# HF CLIPModel state-dict converters


def _lin_t(sd: Mapping, prefix: str, bias: bool = True) -> dict:
    p = {"w": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = np.asarray(sd[prefix + ".bias"])
    return p


def _ln_t(sd: Mapping, prefix: str) -> dict:
    return {"scale": np.asarray(sd[prefix + ".weight"]),
            "bias": np.asarray(sd[prefix + ".bias"])}


def _clip_layers(sd: Mapping, prefix: str, layers: int) -> dict:
    from meshanything_tpu.models.layers import stack_layer_params

    def one(i):
        lp = f"{prefix}.layers.{i}."
        qw = np.asarray(sd[lp + "self_attn.q_proj.weight"]).T
        kw = np.asarray(sd[lp + "self_attn.k_proj.weight"]).T
        vw = np.asarray(sd[lp + "self_attn.v_proj.weight"]).T
        qb = np.asarray(sd[lp + "self_attn.q_proj.bias"])
        kb = np.asarray(sd[lp + "self_attn.k_proj.bias"])
        vb = np.asarray(sd[lp + "self_attn.v_proj.bias"])
        return {
            "ln1": _ln_t(sd, lp + "layer_norm1"),
            "qkv": {"w": np.ascontiguousarray(np.concatenate([qw, kw, vw], axis=1)),
                    "b": np.concatenate([qb, kb, vb])},
            "out": _lin_t(sd, lp + "self_attn.out_proj"),
            "ln2": _ln_t(sd, lp + "layer_norm2"),
            "fc1": _lin_t(sd, lp + "mlp.fc1"),
            "fc2": _lin_t(sd, lp + "mlp.fc2"),
        }

    return stack_layer_params([one(i) for i in range(layers)])


def convert_clip_text(sd: Mapping, cfg: CLIPTextConfig, prefix: str = "text_model.") -> dict:
    g = lambda k: prefix + k  # noqa: E731
    p = {
        "token_embedding": np.asarray(sd[g("embeddings.token_embedding.weight")]),
        "position_embedding": np.asarray(sd[g("embeddings.position_embedding.weight")]),
        "layers": _clip_layers(sd, g("encoder"), cfg.layers),
        "ln_final": _ln_t(sd, g("final_layer_norm")),
    }
    if "text_projection.weight" in sd:
        p["text_projection"] = {"w": np.ascontiguousarray(np.asarray(sd["text_projection.weight"]).T)}
    return p


def convert_clip_vision(sd: Mapping, cfg: CLIPVisionConfig, prefix: str = "vision_model.") -> dict:
    g = lambda k: prefix + k  # noqa: E731
    # conv (D, 3, p, p) -> unfold-matmul weight (p*p*3, D); the unfold
    # layout above is (row-major within patch, channel last)
    conv = np.asarray(sd[g("embeddings.patch_embedding.weight")])
    d, c, ph, pw = conv.shape
    w = conv.transpose(2, 3, 1, 0).reshape(ph * pw * c, d)
    p = {
        "class_embedding": np.asarray(sd[g("embeddings.class_embedding")]),
        "patch_embedding": {"w": np.ascontiguousarray(w)},
        "position_embedding": np.asarray(sd[g("embeddings.position_embedding.weight")]),
        "pre_ln": _ln_t(sd, g("pre_layrnorm")),   # HF's typo'd attribute name
        "layers": _clip_layers(sd, g("encoder"), cfg.layers),
        "post_ln": _ln_t(sd, g("post_layernorm")),
    }
    if "visual_projection.weight" in sd:
        p["visual_projection"] = {"w": np.ascontiguousarray(np.asarray(sd["visual_projection.weight"]).T)}
    return p


# ---------------------------------------------------------------------------
# class-label conditioning (encoder_factory.py:23-35)


def init_class_embedder(key: jax.Array, embed_dim: int, n_classes: int = 1000,
                        dtype=jnp.float32) -> dict:
    return {"embedding": jax.random.normal(key, (n_classes, embed_dim), dtype) * 0.02}


def class_embedding(params: dict, labels: jax.Array) -> jax.Array:
    """ClassEmbedder.forward: (B,) int labels -> (B, 1, D) cross-attention
    condition tokens."""
    return params["embedding"][labels][:, None]
