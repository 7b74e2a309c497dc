"""CLI driver with the reference's exact flag surface (main.py:60-89).

``python main.py --input_path pc_examples/mouse.npy --input_type pc_normal``
works identically; TPU-specific extras (--batch/--bucket/--dtype/
--weights-format) are additive.
"""
from __future__ import annotations

import argparse
import datetime
import os
import time


def get_args(argv=None):
    parser = argparse.ArgumentParser("MeshAnything-TPU", add_help=False)

    # reference flags (main.py:60-89)
    parser.add_argument("--llm", default="facebook/opt-350m", type=str)
    parser.add_argument("--input_dir", default=None, type=str)
    parser.add_argument("--input_path", default=None, type=str)
    parser.add_argument("--out_dir", default="inference_out", type=str)
    parser.add_argument("--pretrained_weights", default="MeshAnything_350m.pth", type=str)
    parser.add_argument(
        "--input_type", choices=["mesh", "pc_normal"], default="pc",
        help="Type of the asset to process (default: pc)",
    )
    parser.add_argument("--codebook_size", default=8192, type=int)
    parser.add_argument("--codebook_dim", default=1024, type=int)
    parser.add_argument("--n_max_triangles", default=800, type=int)
    parser.add_argument("--batchsize_per_gpu", default=1, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--mc", default=False, action="store_true")
    parser.add_argument("--sampling", default=False, action="store_true")

    # TPU-native extras
    parser.add_argument("--bucket", default=512, type=int, help="KV bucket size for decode")
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    parser.add_argument("--random_weights", default=False, action="store_true",
                        help="skip checkpoint loading (smoke tests)")
    parser.add_argument("--metrics_out", default=None, type=str)
    parser.add_argument("--resume", default=False, action="store_true",
                        help="skip inputs whose output OBJ already exists")
    parser.add_argument("--lookahead", default=0,
                        type=lambda v: v if v == "adaptive" else int(v),
                        help="Jacobi lookahead window (exact greedy multi-token "
                             "decode); 'adaptive' switches between precompiled "
                             "W=8/W=16 programs on measured acceptance "
                             "(runtime/phases.py::PhaseRunner._run_adaptive)")
    parser.add_argument("--attn", default="auto",
                        choices=["auto", "pallas", "pallas_int8", "pallas_int4", "xla"],
                        help="decode attention backend (pallas_int8/int4 = "
                             "fast quantized-KV modes)")
    parser.add_argument("--wq", default=False, action="store_true",
                        help="int8 W8A8 decode weights (fast mode: halves weight "
                             "HBM traffic at small batch; prefill/lm_head stay bf16)")
    parser.add_argument("--fast", default=False, action="store_true",
                        help="fast serving preset: --wq --attn pallas_int8 "
                             "--lookahead 8 — the stack with 1.0000 token "
                             "agreement vs exact bf16 on the trained-350M probe "
                             "(PERF.md r3) at ~2.3 s/mesh single-request vs "
                             "~12.5 s exact. Explicit --attn/--lookahead values "
                             "still win over the preset.")
    parser.add_argument("--complete_from", default=None, type=str,
                        help="partial mesh (OBJ/PLY, model output space "
                             "[-0.5,0.5)) whose faces seed the decoder — "
                             "mesh completion: the generation continues "
                             "the given faces (models/meshanything.py::complete)")
    parser.add_argument("--multihost", default=False, action="store_true",
                        help="join the jax.distributed process group and shard "
                             "folder inputs per host (no-op on one host) — the "
                             "TPU-native accelerate-DDP equivalent (main.py:113-146)")
    parser.add_argument("--aot_dir", default=None, type=str,
                        help="directory of serialized compiled executables "
                             "(runtime/aot.py): cold-start in seconds instead "
                             "of minutes of decode compile")
    parser.add_argument("--precompile", default=False, action="store_true",
                        help="warm the aot_dir executables for this config/"
                             "batch (no inputs needed), then run any inputs")
    parser.add_argument("--help", action="help")

    return apply_fast_preset(parser.parse_args(argv))


def apply_fast_preset(args):
    """Resolve --fast into its concrete knobs (w8a8 weights + int8 KV +
    lookahead 8). This is the user-facing single-request fast tier:
    engine-level 2.27 s/mesh vs 12.4 s exact bf16 (PERF.md r3), with
    1.0000 token agreement vs the exact stream on the trained-350M
    probe (tools/trained_agreement_probe.py). Explicitly passed
    --attn/--lookahead override the preset pieces."""
    if getattr(args, "fast", False):
        if args.attn == "auto":
            args.attn = "pallas_int8"
        if args.lookahead == 0:
            args.lookahead = 8
        args.wq = True
    return args


def build_config(args):
    from meshanything_tpu.config import MeshAnythingConfig, ShapeOPTConfig

    return MeshAnythingConfig(
        opt=ShapeOPTConfig(
            codebook_size=args.codebook_size,
            codebook_dim=args.codebook_dim,
            vocab_size=args.codebook_size + 3,
        ),
        n_max_triangles=args.n_max_triangles,
        dtype=args.dtype,
    )


def load_params(args, cfg):
    import jax
    import jax.numpy as jnp

    from meshanything_tpu.runtime import checkpoint as ckpt

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.random_weights:
        from meshanything_tpu.models.meshanything import init_meshanything_params

        print("using random weights (--random_weights)")
        return init_meshanything_params(jax.random.PRNGKey(args.seed), cfg, dtype)

    path = args.pretrained_weights
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"checkpoint {path!r} not found. Download MeshAnything_350m.pth "
            "from the HF hub (Yiwen-ntu/MeshAnything) and pass "
            "--pretrained_weights, or use --random_weights for a smoke run."
        )
    if os.path.isdir(path):
        tree = ckpt.load_orbax(path)
        return ckpt.to_device_tree(tree, dtype)
    tree = ckpt.load_reference_checkpoint(path, cfg)
    print("converted reference checkpoint:", path)
    return ckpt.to_device_tree(tree, dtype)


def collect_inputs(args):
    if args.input_dir is not None:
        names = sorted(os.listdir(args.input_dir))
        if args.input_type == "pc_normal":
            names = [n for n in names if n.endswith(".npy")]
        else:
            names = [n for n in names
                     if n.endswith((".ply", ".obj", ".npy", ".stl", ".off", ".glb"))]
        return [os.path.join(args.input_dir, n) for n in names]
    if args.input_path is not None:
        return [args.input_path]
    if args.precompile:
        return []  # warm the executables only
    raise ValueError("input_dir or input_path must be provided.")


def main(argv=None):
    from meshanything_tpu.runtime.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    args = get_args(argv)
    cfg = build_config(args)

    process_index = 0
    if args.multihost:
        from meshanything_tpu.parallel.multihost import (
            initialize_multihost,
            process_info,
        )

        initialize_multihost()
        process_index, process_count = process_info()
        print(f"multihost: process {process_index}/{process_count}")

    cur_time = datetime.datetime.now().strftime("%d_%H-%M-%S")
    out_dir = os.path.join(args.out_dir, cur_time)
    os.makedirs(out_dir, exist_ok=True)

    from meshanything_tpu.runtime.pipeline import InferencePipeline, load_inputs, write_metrics

    params = load_params(args, cfg)
    paths = collect_inputs(args)
    if args.multihost:
        from meshanything_tpu.parallel.multihost import shard_files_for_host

        paths = shard_files_for_host(paths)
    samples = load_inputs(
        args.input_type, paths, marching_cubes=args.mc,
        num_points=cfg.perceiver.num_points, seed=args.seed,
    )
    print(f"dataset total data samples: {len(samples)}")

    prompt_tokens = None
    if args.complete_from:
        import numpy as np

        from meshanything_tpu.geometry import load_mesh
        from meshanything_tpu.models.meshanything import build_face_prompt

        partial = load_mesh(args.complete_from)
        face_coords = partial.vertices[partial.faces]          # (nf, 3, 3)
        prompt_tokens = np.asarray(build_face_prompt(cfg, face_coords[None]))[0]
        print(f"mesh completion: seeding {len(partial.faces)} faces "
              f"({len(prompt_tokens)} tokens) from {args.complete_from}")

    pipe = InferencePipeline(
        params, cfg, batch_size=args.batchsize_per_gpu, bucket=args.bucket,
        attn=args.attn, lookahead=args.lookahead, wq=args.wq,
        aot_dir=args.aot_dir,
    )
    if args.precompile:
        t0 = time.time()
        if args.aot_dir:
            pipe._runner.precompile(args.batchsize_per_gpu, sampling=args.sampling)
            print(f"precompile done in {time.time() - t0:.1f}s "
                  f"(executables stored in {args.aot_dir})")
        else:
            # no store: one dummy generation through plain jit — on the
            # axon tunnel this warms the compile SERVICE's cross-process
            # cache, after which a fresh process reaches its first mesh
            # in ~26 s instead of 124-400 s (PERF.md r3 cold-start)
            import jax
            import jax.numpy as jnp

            pcw = jnp.zeros(
                (args.batchsize_per_gpu, cfg.perceiver.num_points, 6), jnp.float32)
            out = pipe._runner(pcw, sampling=args.sampling)
            jax.device_get(out.token_ids.ravel()[0])
            print(f"warmup generation done in {time.time() - t0:.1f}s "
                  "(compile-service cache warmed for this config)")
        if not paths:
            return []
    begin = time.time()
    print("Generation Start!!!")
    results = pipe.run(samples, out_dir, sampling=args.sampling, seed=args.seed,
                       resume=args.resume, prompt_tokens=prompt_tokens)
    for r in results:
        print(f"{r.get('obj_path', r['uid'])} Over!!")
    print(f"Total time: {time.time() - begin}")

    if args.metrics_out:
        metrics_path = args.metrics_out
        if args.multihost and process_index:
            metrics_path = f"{metrics_path}.{process_index}"  # one file per host
        write_metrics(results, metrics_path)
    return results


if __name__ == "__main__":
    main()
