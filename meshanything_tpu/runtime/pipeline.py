"""End-to-end inference pipeline: host preprocessing -> device
generation -> host postprocessing.

The TPU-native counterpart of main.py's __main__ loop (main.py:107-177):
  * the host side (file IO, sampling, normalization, mesh cleanup) stays
    NumPy/C++ behind a clean boundary;
  * the device side is two jitted programs (condition+prefill, bucketed
    decode) plus the detokenizer, all fixed-shape;
  * batches are padded to a static batch size so XLA never recompiles.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Iterable, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from meshanything_tpu.config import MeshAnythingConfig
from meshanything_tpu.geometry import (
    load_mesh,
    normalize_pc_cli,
    sample_surface_with_normals,
    postprocess_faces,
)
from meshanything_tpu.models import meshanything as ma


@dataclasses.dataclass
class Sample:
    pc_normal: np.ndarray  # (N, 6) float16 normalized
    uid: str


def load_inputs(
    input_type: str,
    paths: Sequence[str],
    *,
    marching_cubes: bool = False,
    num_points: int = 4096,
    seed: int = 0,
) -> List[Sample]:
    """Dataset construction (main.py:15-58).

    pc_normal: .npy (N, 6), random-subsampled to ``num_points``.
    mesh: .obj/.ply, optionally watertighted via SDF+MC, then
    area-weighted surface sampling.
    """
    rng = np.random.default_rng(seed)
    samples: List[Sample] = []
    for path in paths:
        uid = os.path.basename(path).rsplit(".", 1)[0]
        if input_type == "pc_normal":
            data = np.load(path)
            if data.shape[0] < num_points:
                raise ValueError(
                    f"{path}: input pc_normal should have at least {num_points} points"
                )
            idx = rng.choice(data.shape[0], num_points, replace=False)
            pc = data[idx]
        elif input_type == "mesh":
            mesh = load_mesh(path)
            if marching_cubes:
                from meshanything_tpu.geometry.sdf import export_to_watertight

                mesh = export_to_watertight(mesh)
            pc = sample_surface_with_normals(mesh.vertices, mesh.faces, num_points, rng)
        else:
            raise ValueError(f"unknown input_type {input_type!r}")
        samples.append(Sample(pc_normal=normalize_pc_cli(pc), uid=uid))
    return samples


class InferencePipeline:
    """Owns the compiled generation programs and runs batches.

    The generate call is compiled once per (batch_size,) — batches are
    padded up to ``batch_size`` so folder inference with a ragged tail
    never triggers recompilation.
    """

    def __init__(
        self,
        params,
        cfg: MeshAnythingConfig,
        *,
        batch_size: int = 1,
        bucket: int = 512,
        attn: str = "auto",
        lookahead: int = 0,
        wq: bool = False,
        aot_dir: str | None = None,
    ):
        self.cfg = cfg
        self.params = params
        self.batch_size = batch_size
        self.bucket = bucket

        from meshanything_tpu.runtime.phases import PhaseRunner

        self._runner = PhaseRunner(params, cfg, bucket=bucket, attn=attn,
                                   lookahead=lookahead, wq=wq, aot_dir=aot_dir)
        self._gen_greedy = lambda p, pc, k: self._runner(pc, sampling=False, key=k)
        self._gen_sample = lambda p, pc, k: self._runner(pc, sampling=True, key=k)
        self.timings: List[dict] = []

    def run(
        self,
        samples: Iterable[Sample],
        out_dir: str,
        *,
        sampling: bool = False,
        seed: int = 0,
        export: bool = True,
        resume: bool = False,
        max_retries: int = 1,
        prompt_tokens: np.ndarray | None = None,
    ) -> List[dict]:
        """Run generation over samples.

        Failure handling (absent from the reference, SURVEY.md §5.3):
        a device error on one batch is caught, retried ``max_retries``
        times, then recorded as a failure record — folder inference
        survives a flaky accelerator. ``resume=True`` skips samples
        whose output OBJ already exists, making reruns incremental.

        prompt_tokens (P,): mesh-completion prefix in stream order
        ([bos, face tokens...]) applied to every sample — the CLI's
        ``--complete_from`` path.
        """
        os.makedirs(out_dir, exist_ok=True)
        samples = list(samples)
        if resume:
            remaining = []
            for s in samples:
                path = os.path.join(out_dir, f"{s.uid}_gen.obj")
                if os.path.exists(path):
                    self.timings.append({"uid": s.uid, "skipped": True, "obj_path": path})
                else:
                    remaining.append(s)
            samples = remaining
        results = []
        bs = self.batch_size
        for start in range(0, len(samples), bs):
            chunk = samples[start:start + bs]
            pcs = np.stack([s.pc_normal for s in chunk]).astype(np.float32)
            pad = bs - len(chunk)
            if pad:
                pcs = np.concatenate([pcs, np.repeat(pcs[-1:], pad, axis=0)])

            key = jax.random.fold_in(jax.random.PRNGKey(seed), start)
            if prompt_tokens is not None:
                prompt = jnp.asarray(
                    np.broadcast_to(np.asarray(prompt_tokens, np.int32)[None],
                                    (bs, len(prompt_tokens))))
                fn = (lambda p, pc, k: self._runner(pc, sampling=sampling, key=k,
                                                    prompt_ids=prompt))
            else:
                fn = self._gen_sample if sampling else self._gen_greedy
            t0 = time.time()
            coords = None
            last_err = None
            for attempt in range(max_retries + 1):
                try:
                    out = fn(self.params, jnp.asarray(pcs), key)
                    coords = np.asarray(out.face_coords.astype(jnp.float32))
                    break
                except Exception as e:  # device fault / OOM — record & retry
                    last_err = e
            if coords is None:
                for s in chunk:
                    results.append({
                        "uid": s.uid,
                        "error": f"{type(last_err).__name__}: {last_err}",
                    })
                continue
            device_time = time.time() - t0

            for i, s in enumerate(chunk):
                t1 = time.time()
                n_valid = int(np.sum(~np.isnan(coords[i, :, 0, 0])))
                rec = {
                    "uid": s.uid,
                    "faces_generated": n_valid,
                    "device_time_s": device_time / len(chunk),
                }
                if export:
                    path = os.path.join(out_dir, f"{s.uid}_gen.obj")
                    mesh = postprocess_faces(coords[i], path)
                    rec["faces_final"] = len(mesh.faces)
                    rec["obj_path"] = path
                rec["post_time_s"] = time.time() - t1
                results.append(rec)
        self.timings.extend(results)
        return results


def write_metrics(results: List[dict], path: str) -> None:
    with open(path, "w") as fh:
        for r in results:
            fh.write(json.dumps(r) + "\n")
