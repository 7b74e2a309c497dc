"""Configuration dataclasses for the MeshAnything-TPU framework.

These pin the architecture hyperparameters of the reference pipeline
(buaacyw/MeshAnything) as plain dataclasses instead of the reference's
three-way split between argparse flags (main.py:60-89), an OmegaConf YAML
(MeshAnything/miche/shapevae-256.yaml) and a HF ``ShapeOPTConfig``
(MeshAnything/models/meshanything.py:95-111).

All defaults reproduce the shipped 350M model.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    """Michelangelo aligned shape-latent perceiver.

    Reference: MeshAnything/miche/shapevae-256.yaml:5-19 and
    michelangelo/models/tsal/sal_perceiver.py:309-346.
    """

    num_latents: int = 256          # latent tokens (+1 shape embed token)
    embed_dim: int = 64             # VAE bottleneck width
    point_feats: int = 3            # per-point normals
    num_freqs: int = 8              # Fourier frequencies
    include_pi: bool = False
    width: int = 768
    heads: int = 12
    num_encoder_layers: int = 8
    num_decoder_layers: int = 16
    use_ln_post: bool = True
    qkv_bias: bool = False
    init_scale: float = 0.25
    num_points: int = 4096          # input point-cloud size contract (main.py:24)
    ln_eps: float = 1e-5            # torch.nn.LayerNorm default

    @property
    def total_latents(self) -> int:
        # AlignedShapeLatentPerceiver prepends one shape-embed token
        # (sal_perceiver.py:332: num_latents=1+num_latents).
        return self.num_latents + 1

    @property
    def fourier_dim(self) -> int:
        # include_input=True: d * (2*num_freqs + 1)  (embedder.py:81-85)
        return 3 * (2 * self.num_freqs + 1)


@dataclasses.dataclass(frozen=True)
class ShapeOPTConfig:
    """The OPT-350M-based autoregressive shape decoder.

    Reference: MeshAnything/models/shape_opt.py + the forced config in
    MeshAnything/models/meshanything.py:95-113 (word_embed_proj_dim ==
    hidden_size, n_positions=18259, vocab=8195).

    OPT-350m architectural facts (facebook/opt-350m):
    do_layer_norm_before=False => post-layernorm blocks and *no* final
    layernorm after the stack (shape_opt.py:223-228); ReLU activation.
    """

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    vocab_size: int = 8195          # codebook 8192 + bos/eos/pad
    max_positions: int = 18259
    pos_offset: int = 2             # OPTLearnedPositionalEmbedding offset
    do_layer_norm_before: bool = False
    activation: str = "relu"
    ln_eps: float = 1e-5
    codebook_size: int = 8192
    codebook_dim: int = 1024
    face_per_token: int = 9         # 3 vertices x 3 coords
    cond_length: int = 257
    cond_dim: int = 768
    bos_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_face_pos(self) -> int:
        # token_embed_positions = Embedding(face_per_token + 3, d)
        # (shape_opt.py:206).
        return self.face_per_token + 3


@dataclasses.dataclass(frozen=True)
class NRDConfig:
    """Noise-resistant token->coordinate decoder (BERT-base, 6 layers).

    Reference: NoiseResistantDecoder in
    MeshAnything/models/meshanything.py:10-80.
    """

    hidden_size: int = 768
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 3072
    ln_eps: float = 1e-12           # BERT layernorm eps
    discrete_num: int = 128         # coordinate bins
    codebook_dim: int = 1024
    cond_length: int = 257
    cond_dim: int = 768
    max_faces_pos: int = 18000      # pos_embedding table size (meshanything.py:27)
    pad_id: int = -1


@dataclasses.dataclass(frozen=True)
class MeshAnythingConfig:
    """Top-level composition (MeshAnything/models/meshanything.py:82-123)."""

    perceiver: PerceiverConfig = dataclasses.field(default_factory=PerceiverConfig)
    opt: ShapeOPTConfig = dataclasses.field(default_factory=ShapeOPTConfig)
    nrd: NRDConfig = dataclasses.field(default_factory=NRDConfig)
    n_max_triangles: int = 800
    num_quantizers: int = 3

    # numerics: "parity" runs everything in f32; "fast" uses bf16 matmuls
    # with f32 softmax/layernorm (TPU-native default).
    dtype: str = "bfloat16"

    @property
    def face_per_token(self) -> int:
        return self.num_quantizers * 3

    @property
    def cond_length(self) -> int:
        return self.opt.cond_length

    @property
    def max_length(self) -> int:
        # n_max_triangles * 9 + bos + eos + cond  (meshanything.py:93)
        return self.n_max_triangles * self.face_per_token + 2 + self.cond_length

    @property
    def generate_length(self) -> int:
        return self.max_length - self.cond_length

    @property
    def activation_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


def small_test_config(n_max_triangles: int = 8) -> MeshAnythingConfig:
    """A tiny config for CPU tests: same wiring, small dims."""
    return MeshAnythingConfig(
        perceiver=PerceiverConfig(
            num_latents=16, embed_dim=8, width=48, heads=4,
            num_encoder_layers=2, num_decoder_layers=2, num_points=64,
        ),
        opt=ShapeOPTConfig(
            hidden_size=32, num_layers=2, num_heads=4, ffn_dim=64,
            vocab_size=67, codebook_size=64, codebook_dim=32,
            max_positions=512, cond_length=17, cond_dim=48,
        ),
        nrd=NRDConfig(
            hidden_size=40, num_layers=2, num_heads=4, intermediate_size=80,
            codebook_dim=32, cond_length=17, cond_dim=48, max_faces_pos=256,
        ),
        n_max_triangles=n_max_triangles,
        dtype="float32",
    )
