"""MeshAnything-TPU: a TPU-native (JAX/XLA/Pallas) framework for
point-cloud-conditioned autoregressive artist-mesh generation, with the
capabilities of buaacyw/MeshAnything re-designed for TPU hardware.

Layout:
  geometry/  host-side mesh IO, normalization, sampling, SDF/MC, cleanup
  models/    functional JAX models (perceiver encoder, ShapeOPT AR
             decoder, noise-resistant detokenizer, composition)
  ops/       Pallas TPU kernels + sampling / KV-cache primitives
  parallel/  device mesh + sharding strategies (dp/tp)
  runtime/   pipeline orchestration, checkpointing, profiling
  training/  training scaffold (losses + sharded train step)
"""

__version__ = "0.1.0"

from meshanything_tpu.config import (
    MeshAnythingConfig,
    PerceiverConfig,
    ShapeOPTConfig,
    NRDConfig,
    small_test_config,
)
