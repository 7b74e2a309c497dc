"""Chipless HBM probe: AOT-compile a decode config and print its real
buffer-assignment footprint.

The axon compile service runs the TPU AOT compiler without a chip, so
`jit(f).lower(shapes).compile()` yields `memory_analysis()` (and, on
OOM, the exact allocation that burst) WITHOUT risking the
crash-the-worker-for-10-minutes failure mode of just running the
config. This is how the r3 HBM envelope was measured (PERF.md):
physical 16 GiB, effective runtime ~12.8-13.1 GB, prefill cache
double-buffering found and fixed (shape_opt._assemble_cache).

Usage: python -m tools.memory_probe [batch] [attn] [window]
  e.g.  python -m tools.memory_probe 16 pallas      # exact bf16 B=16
        python -m tools.memory_probe 32 pallas_int4 # int4 B=32
Safe to run while another process owns the chip (no device execution).
"""
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from meshanything_tpu.config import MeshAnythingConfig
    from meshanything_tpu.models import meshanything as ma
    from meshanything_tpu.models.lookahead import generate_lookahead

    cfg = MeshAnythingConfig()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    attn = sys.argv[2] if len(sys.argv) > 2 else "pallas"
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    def gen(p, c):
        return generate_lookahead(
            p, cfg.opt, c, max_new_tokens=cfg.generate_length,
            window=window, bucket=512, attn=attn)

    params = jax.eval_shape(
        lambda k: ma.init_meshanything_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    p_structs = jtu.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), params["opt"])
    cond = jax.ShapeDtypeStruct((batch, 257, cfg.opt.hidden_size), jnp.bfloat16)
    compiled = jax.jit(gen).lower(p_structs, cond).compile()
    m = compiled.memory_analysis()
    print(f"decode program  B={batch} attn={attn} window={window}")
    total = 0
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            print(f"  {k}: {v / 1e9:.3f} GB")
            if k in ("temp_size_in_bytes", "argument_size_in_bytes"):
                total += v
    print(f"  total (temp+args): {total / 1e9:.3f} GB "
          f"(effective runtime limit ~12.8 GB, PERF.md r3)")


if __name__ == "__main__":
    main()
