"""Standalone Michelangelo VAE entry point.

Parity with the reference's secondary CLI (MeshAnything/miche/encode.py:
8-40): load a surface point cloud, subsample 4096 points, optionally
flip position z (the reference convention, encode.py:30 — positions
only, normals untouched), encode to shape latents, and either save the
KL latents or reconstruct a mesh through the occupancy decoder.

  python -m meshanything_tpu.miche_cli --input surface.npz --out recon.obj
  python -m meshanything_tpu.miche_cli --input points.npy --encode-only --out latents.npy

Input formats: .npz with 'points' (N, 3) + 'normals' (N, 3) arrays
(the reference's format, encode.py:10-12) or a combined (N, 6) 'surface'
key, or a raw (N, 6) .npy.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("miche-tpu")
    p.add_argument("--input", required=True,
                   help=".npz (points+normals or surface keys) or .npy point cloud")
    p.add_argument("--out", required=True, help="output .obj (recon) or .npy (latents)")
    p.add_argument("--encode-only", action="store_true",
                   help="write KL latents instead of reconstructing")
    p.add_argument("--octree_depth", default=7, type=int)
    p.add_argument("--num_chunks", default=10000, type=int)
    p.add_argument("--bounds", default=1.1, type=float)
    p.add_argument("--num_points", default=4096, type=int,
                   help="subsample size (encode.py:15)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--pretrained_weights", default="MeshAnything_350m.pth")
    p.add_argument("--flip_z", action=argparse.BooleanOptionalAction, default=True,
                   help="flip position z as the reference does (encode.py:30); "
                        "--no-flip_z for inputs already in model convention")
    return p.parse_args(argv)


def load_surface(path: str, num_points: int = 4096, seed: int = 0) -> np.ndarray:
    """-> (num_points, 6) float32, subsampled (encode.py:8-21)."""
    if path.endswith(".npz"):
        with np.load(path) as data:
            if "points" in data and "normals" in data:
                surface = np.concatenate(
                    [np.asarray(data["points"]), np.asarray(data["normals"])], axis=-1
                )
            elif "surface" in data:
                surface = np.asarray(data["surface"])
            else:
                raise ValueError(
                    f"{path}: expected 'points'+'normals' or 'surface' keys, got {list(data.keys())}"
                )
    else:
        surface = np.load(path)
    if surface.ndim == 3:
        surface = surface[0]
    if surface.ndim != 2 or surface.shape[-1] < 6:
        raise ValueError(f"{path}: need (N, >=6) xyz+normals, got {surface.shape}")
    surface = surface[:, :6].astype(np.float32)
    if surface.shape[0] < num_points:
        raise ValueError(f"{path}: need at least {num_points} points, got {surface.shape[0]}")
    rng = np.random.default_rng(seed)
    idx = rng.choice(surface.shape[0], num_points, replace=False)
    return surface[idx]


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.models import perceiver as per_mod
    from meshanything_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    args = get_args(argv)
    cfg = MeshAnythingConfig()

    if args.random_weights:
        from meshanything_tpu.models.perceiver import init_perceiver_params

        params = init_perceiver_params(jax.random.PRNGKey(0), cfg.perceiver)
    else:
        from meshanything_tpu.runtime import checkpoint as ckpt

        if not os.path.exists(args.pretrained_weights):
            raise FileNotFoundError(
                f"{args.pretrained_weights} not found; use --random_weights for a smoke run"
            )
        sd = ckpt.load_safetensors(args.pretrained_weights)
        params = ckpt.to_device_tree(
            ckpt.convert_perceiver(sd, cfg.perceiver, "point_encoder.model.shape_model.")
        )

    surface = load_surface(args.input, args.num_points, args.seed)
    if args.flip_z:
        # encode.py:30 flips position z only; normals stay untouched
        surface = surface.copy()
        surface[:, 2] *= -1

    pc_normal = jnp.asarray(surface)[None]
    latents = per_mod.encode_latents(params, cfg.perceiver, pc_normal)
    kl = per_mod.encode_kl_mode(params, latents[:, 1:])

    if args.encode_only:
        np.save(args.out, np.asarray(kl))
        print(f"latents {kl.shape} -> {args.out}")
        return

    from meshanything_tpu.geometry import save_obj
    from meshanything_tpu.runtime.recon import extract_geometry

    decoded = per_mod.decode_latents(params, cfg.perceiver, kl)
    meshes = extract_geometry(
        params, cfg.perceiver, decoded,
        bounds=args.bounds, octree_depth=args.octree_depth, num_chunks=args.num_chunks,
    )
    if meshes[0] is None:
        raise RuntimeError("no surface crossed the occupancy level (random weights?)")
    save_obj(meshes[0], args.out)
    print(f"reconstructed {len(meshes[0].faces)} faces -> {args.out}")


if __name__ == "__main__":
    main()
