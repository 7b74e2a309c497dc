"""Area-weighted surface sampling with face normals.

Equivalent of trimesh's ``mesh.sample(n, return_index=True)`` +
``mesh.face_normals[face_idx]`` as used in mesh_to_pc.py:51-52: sample
faces with probability proportional to area, then a uniform barycentric
point inside each sampled triangle.

Two implementations: a NumPy host version (default for preprocessing)
and a jittable JAX version (useful when preprocessing is fused into the
device pipeline for batched serving).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _uniform_barycentric(u: np.ndarray, v: np.ndarray):
    """Map two uniforms to barycentric coords uniform over the triangle."""
    # standard sqrt trick (same distribution trimesh uses)
    su = np.sqrt(u)
    a = 1.0 - su
    b = su * (1.0 - v)
    c = su * v
    return a, b, c


def sample_surface_with_normals(
    vertices: np.ndarray,
    faces: np.ndarray,
    num_samples: int = 4096,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Returns (num_samples, 6) float16 points+normals (mesh_to_pc.py:42-57)."""
    if rng is None:
        rng = np.random.default_rng()
    vertices = np.asarray(vertices, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)

    tri = vertices[faces]                      # (F, 3, 3)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    areas = 0.5 * np.linalg.norm(n, axis=-1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("mesh has zero surface area")
    probs = areas / total
    face_idx = rng.choice(len(faces), size=num_samples, p=probs)

    u = rng.random(num_samples)
    v = rng.random(num_samples)
    a, b, c = _uniform_barycentric(u, v)
    t = tri[face_idx]
    points = a[:, None] * t[:, 0] + b[:, None] * t[:, 1] + c[:, None] * t[:, 2]

    normals = n[face_idx]
    norm = np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / np.where(norm > 1e-20, norm, 1.0)

    return np.concatenate([points, normals], axis=-1).astype(np.float16)


def sample_surface_jax(
    key: jax.Array,
    vertices: jax.Array,
    faces: jax.Array,
    num_samples: int = 4096,
) -> jax.Array:
    """Jittable area-weighted sampler: (num_samples, 6) float32.

    Static-shape version for on-device preprocessing: categorical over
    face areas + uniform barycentric. Degenerate faces get zero weight.
    """
    tri = vertices[faces]                      # (F, 3, 3)
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    areas = 0.5 * jnp.linalg.norm(n, axis=-1)
    logits = jnp.log(jnp.maximum(areas, 1e-30))

    k1, k2, k3 = jax.random.split(key, 3)
    face_idx = jax.random.categorical(k1, logits, shape=(num_samples,))
    u = jax.random.uniform(k2, (num_samples,))
    v = jax.random.uniform(k3, (num_samples,))
    su = jnp.sqrt(u)
    a = 1.0 - su
    b = su * (1.0 - v)
    c = su * v

    t = tri[face_idx]
    points = a[:, None] * t[:, 0] + b[:, None] * t[:, 1] + c[:, None] * t[:, 2]
    normals = n[face_idx]
    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    normals = normals / jnp.where(norm > 1e-20, norm, 1.0)
    return jnp.concatenate([points, normals], axis=-1)
