"""VAE occupancy reconstruction: latents -> mesh.

Equivalent of the reference's ``extract_geometry``
(michelangelo/models/tsal/inference_utils.py:13-80) reached via
``AlignedShapeAsLatentPLModule.recon`` / ``latent2mesh``
(asl_pl_module.py:159-196): query the geo decoder for occupancy logits
over a dense grid in chunks, then extract the zero isosurface.

TPU-native: the chunked queries are one vmapped/jitted cross-attention
program; marching runs host-side.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from meshanything_tpu.config import PerceiverConfig
from meshanything_tpu.geometry.marching import marching_tetrahedra
from meshanything_tpu.geometry.obj_io import Mesh
from meshanything_tpu.models import perceiver as per_mod


def generate_dense_grid_points(
    bbox_min: np.ndarray, bbox_max: np.ndarray, octree_depth: int
) -> Tuple[np.ndarray, np.ndarray, list]:
    """Reference grid convention (graphics/primitives/volume.py:6-20):
    (2^depth + 1) points per axis, xyz indexing."""
    length = bbox_max - bbox_min
    num_cells = 2 ** octree_depth
    x = np.linspace(bbox_min[0], bbox_max[0], num_cells + 1)
    y = np.linspace(bbox_min[1], bbox_max[1], num_cells + 1)
    z = np.linspace(bbox_min[2], bbox_max[2], num_cells + 1)
    xs, ys, zs = np.meshgrid(x, y, z, indexing="ij")
    grid = np.stack((xs, ys, zs), axis=-1)
    grid_size = [num_cells + 1] * 3
    return grid.reshape(-1, 3), length, grid_size


def extract_geometry(
    params: dict,
    cfg: PerceiverConfig,
    latents: jax.Array,
    *,
    bounds: float = 1.1,
    octree_depth: int = 7,
    num_chunks: int = 10000,
):
    """Decoded latents (B, 256, width) -> list of (Mesh | None).

    Mirrors inference_utils.py:13-80: chunked occupancy queries, zero
    level set, graceful None when no surface crosses the level."""
    bbox_min = np.array([-bounds] * 3)
    bbox_max = np.array([bounds] * 3)
    xyz, _, grid_size = generate_dense_grid_points(bbox_min, bbox_max, octree_depth)

    b = latents.shape[0]

    query_fn = jax.jit(
        lambda p, q, lat: per_mod.query_geometry(p, cfg, q, lat)
    )

    logits_parts = []
    for start in range(0, len(xyz), num_chunks):
        chunk = xyz[start:start + num_chunks]
        pad = 0
        if len(chunk) < num_chunks:
            pad = num_chunks - len(chunk)
            chunk = np.concatenate([chunk, np.zeros((pad, 3))])
        q = jnp.broadcast_to(jnp.asarray(chunk, latents.dtype)[None], (b, num_chunks, 3))
        out = np.asarray(query_fn(params, q, latents).astype(jnp.float32))
        if pad:
            out = out[:, :-pad]
        logits_parts.append(out)
    logits = np.concatenate(logits_parts, axis=1)  # (B, P)

    meshes = []
    for i in range(b):
        field = logits[i].reshape(grid_size)
        try:
            verts, faces = marching_tetrahedra(field, 0.0)
            if len(faces) == 0:
                meshes.append(None)
                continue
            n = grid_size[0] - 1
            verts = bbox_min + verts / n * (bbox_max - bbox_min)
            meshes.append(Mesh(vertices=verts, faces=faces))
        except (ValueError, RuntimeError):
            meshes.append(None)
    return meshes


def reconstruct_from_pc(
    params: dict, cfg: PerceiverConfig, pc_normal, **kw
):
    """Full VAE round-trip (asl_pl_module.py:159-179): encode -> KL mode
    -> decode -> occupancy -> mesh."""
    latents = per_mod.encode_latents(params, cfg, pc_normal)
    kl = per_mod.encode_kl_mode(params, latents[:, 1:])
    decoded = per_mod.decode_latents(params, cfg, kl)
    return extract_geometry(params, cfg, decoded, **kw)
