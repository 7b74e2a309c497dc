"""ShapeOPT: the OPT-350M-based autoregressive mesh-token decoder,
re-designed TPU-first.

Reference semantics (MeshAnything/models/shape_opt.py):
  * hybrid token embedding — ids {0,1,2} via a 3-row table, ids >= 3 via
    a linear projection of the frozen RVQ codebook row (shape_opt.py:237-245);
    here branchless via jnp.where instead of boolean scatter.
  * learned absolute positions with OPT's +2 offset over the mask
    including the 257 condition slots (shape_opt.py:359).
  * face-phase positional embedding: coordinate token k (0-indexed over
    generated coordinate tokens) gets id (k mod 9)+3; special tokens keep
    their own id 0-2 (shape_opt.py:440-460). The reference derives this
    from attention-mask sums at runtime; with the all-ones masks of this
    pipeline mask_len == cond_length + step + 1, so a step counter is
    exactly equivalent (proven in tests/test_shape_opt.py).
  * cond_embed flag: 0 for the condition pass, 1 for token passes
    (shape_opt.py:326-337).
  * OPT-350m block: post-layernorm, ReLU FFN, untied lm_head
    (shape_opt.py:24,29-43; do_layer_norm_before=False so there is no
    final stack layernorm, shape_opt.py:223-228).

TPU-first execution model (replaces HF's Python generate loop,
meshanything.py:144-162):
  * prefill — one jitted causal pass over the 257 condition embeddings
    that also writes the KV cache;
  * decode — a lax.while_loop per static KV *bucket*: attention inside
    bucket b only reads cache[:, :b], so KV traffic grows with the
    sequence instead of paying the full 7459-slot cache every step.
    Early exit when every row has emitted eos.

The KV cache is preallocated (2, L, B, S_max, H*D) and updated with
dynamic_update_slice — the fixed-shape long-context recipe
(SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from meshanything_tpu.config import ShapeOPTConfig
from meshanything_tpu.models.layers import (
    init_linear,
    init_ln,
    layer_norm,
    linear,
)
from meshanything_tpu.ops.sampling import sample_token


# ---------------------------------------------------------------------------
# parameters


def init_opt_layer(key, cfg: ShapeOPTConfig, dtype=jnp.float32) -> dict:
    d, f = cfg.hidden_size, cfg.ffn_dim
    ks = jax.random.split(key, 4)
    return {
        "qkv": init_linear(ks[0], d, 3 * d, 0.02, True, dtype),
        "out": init_linear(ks[1], d, d, 0.02, True, dtype),
        "ln_attn": init_ln(d, dtype),
        "fc1": init_linear(ks[2], d, f, 0.02, True, dtype),
        "fc2": init_linear(ks[3], f, d, 0.02, True, dtype),
        "ln_ffn": init_ln(d, dtype),
    }


def init_shape_opt_params(key, cfg: ShapeOPTConfig, dtype=jnp.float32) -> dict:
    from meshanything_tpu.models.layers import stack_layer_params

    d = cfg.hidden_size
    ks = jax.random.split(key, 8)
    layers = [init_opt_layer(k, cfg, dtype) for k in jax.random.split(ks[0], cfg.num_layers)]
    return {
        "extra_embeds": jax.random.normal(ks[1], (3, d), dtype) * 0.02,
        "input_layer": init_linear(ks[2], cfg.codebook_dim, d, 0.02, True, dtype),
        "embed_positions": jax.random.normal(ks[3], (cfg.max_positions + cfg.pos_offset, d), dtype) * 0.02,
        "face_positions": jax.random.normal(ks[4], (cfg.num_face_pos, d), dtype) * 0.02,
        "cond_embed": jax.random.normal(ks[5], (2, d), dtype) * 0.02,
        "codebook": jax.random.normal(ks[6], (cfg.codebook_size, cfg.codebook_dim), dtype) * 0.02,
        "layers": stack_layer_params(layers),
        "lm_head": {"w": jax.random.normal(ks[7], (d, cfg.vocab_size), dtype) * 0.02},
    }


# ---------------------------------------------------------------------------
# embedding


def embed_tokens(params: dict, cfg: ShapeOPTConfig, ids: jax.Array) -> jax.Array:
    """Hybrid embedding (shape_opt.py:237-245), branchless.

    ids: (..., ) int32 in [0, vocab). Special ids {0,1,2} hit
    extra_embeds; the rest project quantize_codebooks[id-3] through
    input_layer.
    """
    is_special = ids < 3
    special = params["extra_embeds"][jnp.clip(ids, 0, 2)]
    code = params["codebook"][jnp.clip(ids - 3, 0, cfg.codebook_size - 1)]
    projected = linear(code.astype(special.dtype), params["input_layer"]["w"], params["input_layer"]["b"])
    return jnp.where(is_special[..., None], special, projected)


def face_phase_ids(ids: jax.Array, gen_index: jax.Array, face_per_token: int) -> jax.Array:
    """Face positional id for generated token at generated-index
    ``gen_index`` (0 == bos prediction slot; coordinate tokens start at
    gen_index 1). Specials keep their id; coords get
    ((gen_index - 1) mod 9) + 3 — equal to the reference's
    ((mask_len - 2) mod 9) + 3 with mask_len = gen_index + 1
    (shape_opt.py:457)."""
    phase = (gen_index - 1) % face_per_token + 3
    return jnp.where(ids < 3, ids, phase)


# ---------------------------------------------------------------------------
# transformer core


def _opt_layer_prefill(cfg: ShapeOPTConfig, *, block_q: int = 0, with_kv: bool = True):
    """Returns a scan body over stacked layer params for the causal
    prefill pass.

    with_kv: emit per-layer (k, v) for the decode cache (the prefill
    call); the training pass sets False so the scan does not stack a
    full KV cache it never reads.
    block_q > 0: use the blockwise online-softmax attention
    (layers.flash_attention_causal) instead of materializing the dense
    (N, N) score matrix — required at the real 7,459-token
    teacher-forcing length.
    """
    h = cfg.num_heads
    d = cfg.head_dim

    def body(x, p):
        b, n, _ = x.shape
        residual = x
        qkv = linear(x, p["qkv"]["w"], p["qkv"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        if block_q:
            from meshanything_tpu.models.layers import flash_attention_causal

            o = flash_attention_causal(q, k, v, block_q=block_q, block_k=block_q)
        else:
            from meshanything_tpu.models.layers import attention

            o = attention(q, k, v, causal=True)
        x = residual + linear(o.reshape(b, n, h * d), p["out"]["w"], p["out"]["b"])
        x = layer_norm(x, p["ln_attn"]["scale"], p["ln_attn"]["bias"], cfg.ln_eps)

        residual = x
        x2 = jax.nn.relu(linear(x, p["fc1"]["w"], p["fc1"]["b"]))
        x = residual + linear(x2, p["fc2"]["w"], p["fc2"]["b"])
        x = layer_norm(x, p["ln_ffn"]["scale"], p["ln_ffn"]["bias"], cfg.ln_eps)
        return x, (k, v) if with_kv else None

    return body


def _assemble_cache(ks: jax.Array, vs: jax.Array, kv_len: int) -> jax.Array:
    """(L, B, C, HD) k/v prefix rows -> (2, L, B, kv_len, HD) cache.

    One zero-init buffer plus an in-place dynamic_update_slice of the
    compact prefix. The obvious pad-then-stack formulation keeps BOTH
    full-length padded halves alive as the stack's operands — measured
    22.5 GB peak for the 11.25 GB bf16 B=16 cache (AOT memory analysis,
    PERF.md r3), which is what made exact bf16 B=16 a worker-killer."""
    lcnt, bsz, c, hd = ks.shape
    small = jnp.stack([ks, vs])                      # (2, L, B, C, HD)
    cache = jnp.zeros((2, lcnt, bsz, kv_len, hd), ks.dtype)
    return jax.lax.dynamic_update_slice(cache, small, (0, 0, 0, 0, 0))


def prefill(
    params: dict,
    cfg: ShapeOPTConfig,
    cond_embeds: jax.Array,
    kv_len: int,
) -> Tuple[jax.Array, jax.Array]:
    """Run the condition pass (inputs_embeds path, shape_opt.py:331-337).

    cond_embeds: (B, C, d) projected point features.
    Returns (logits_last (B, vocab), kv_cache (2, L, B, kv_len, H*D)).
    """
    b, c, d = cond_embeds.shape
    x = cond_embeds + params["cond_embed"][0].astype(cond_embeds.dtype)
    positions = jnp.arange(c) + cfg.pos_offset
    x = x + params["embed_positions"][positions].astype(x.dtype)

    body = _opt_layer_prefill(cfg)
    x, (ks, vs) = jax.lax.scan(lambda h, p: body(h, p), x, params["layers"])
    # ks: (L, B, C, H, D) -> flat-head rows (L, B, C, H*D), padded to
    # kv_len. The flat layout is the cache contract (see
    # ops/decode_attention.py: a (..., H, 64) layout lane-pads to 128
    # and every later reshape would copy the whole cache).
    lcnt, bsz = ks.shape[0], ks.shape[1]
    ks = ks.reshape(lcnt, bsz, c, cfg.hidden_size)
    vs = vs.reshape(lcnt, bsz, c, cfg.hidden_size)
    logits = linear(x[:, -1], params["lm_head"]["w"])
    return logits.astype(jnp.float32), _assemble_cache(ks, vs, kv_len)


def prefill_with_prompt(
    params: dict,
    cfg: ShapeOPTConfig,
    cond_embeds: jax.Array,
    token_ids: jax.Array,
    kv_len: int,
) -> Tuple[jax.Array, jax.Array]:
    """Causal pass over [condition ‖ prompt tokens] emitting the KV
    cache — the prompt-seeded prefill behind continuation / mesh
    completion (``generate(prompt_ids=...)``).

    Embedding semantics are identical to ``forward_full`` (same absolute
    positions, face-phase ids, cond_embed 0/1 flags), so decoding from
    this cache is token-identical to a generation whose first
    ``token_ids.shape[1]`` steps had emitted the prompt themselves
    (asserted in tests/test_shape_opt.py). The reference reaches the
    same capability through HF ``generate``'s input_ids path
    (shape_opt.py:318-328); its release never exercises it.

    token_ids: (B, P) int32 in stream order — element 0 is the
    (predicted-)bos slot, exactly as ``generate`` emits it.
    Returns (logits_last (B, vocab) f32, kv (2, L, B, kv_len, H*D)).

    Long prompts (completing most of an 800-face mesh = up to ~7.5k
    prefix tokens) switch to the blockwise online-softmax attention —
    dense (C+P)^2 scores would cost ~1 GB/layer at a 400-face prompt.
    """
    b, c, _ = cond_embeds.shape
    t = token_ids.shape[1]

    cond_x = cond_embeds + params["cond_embed"][0].astype(cond_embeds.dtype)
    tok = embed_tokens(params, cfg, token_ids).astype(cond_embeds.dtype)
    gen_index = jnp.broadcast_to(jnp.arange(t), (b, t))
    fids = face_phase_ids(token_ids, gen_index, cfg.face_per_token)
    tok = tok + params["face_positions"][fids].astype(tok.dtype)
    tok = tok + params["cond_embed"][1].astype(tok.dtype)

    x = jnp.concatenate([cond_x, tok], axis=1)
    n = c + t
    positions = jnp.arange(n) + cfg.pos_offset
    x = x + params["embed_positions"][positions].astype(x.dtype)

    # blockwise attention past 1k tokens (padded positions sit in every
    # real token's causal future, so results are unchanged)
    block_q = 512 if n > 1024 else 0
    pad = (-n) % block_q if block_q else 0
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    body = _opt_layer_prefill(cfg, block_q=block_q)
    x, (ks, vs) = jax.lax.scan(lambda h, p: body(h, p), x, params["layers"])
    lcnt = ks.shape[0]
    ks = ks.reshape(lcnt, b, n + pad, cfg.hidden_size)[:, :, :n]
    vs = vs.reshape(lcnt, b, n + pad, cfg.hidden_size)[:, :, :n]
    logits = linear(x[:, n - 1], params["lm_head"]["w"])
    return logits.astype(jnp.float32), _assemble_cache(ks, vs, kv_len)


def forward_full(
    params: dict,
    cfg: ShapeOPTConfig,
    cond_embeds: jax.Array,
    token_ids: jax.Array,
    token_mask: Optional[jax.Array] = None,
    *,
    remat: bool = False,
    block_q: int = 0,
) -> jax.Array:
    """Teacher-forcing pass over [condition ‖ tokens] -> logits for every
    position (the training-path equivalent of shape_opt.py:318-328 with
    input_ids + 2D mask). token_ids: (B, T) int32. Returns (B, C+T, vocab).

    remat: wrap each layer in jax.checkpoint so backward recomputes
    activations per layer instead of storing all 24 — the TPU-native
    equivalent of the reference's unconditional attention checkpointing
    (michelangelo/models/modules/checkpoint.py:10-69, wrapped at
    transformer_blocks.py:43,150). Required for full-length (7,459-token)
    training steps.
    block_q > 0: blockwise flash attention for the causal pass (the
    sequence is zero-padded to a block multiple internally; padded
    positions sit in the causal future of every real token, so results
    are unchanged).
    """
    b, c, _ = cond_embeds.shape
    t = token_ids.shape[1]

    cond_x = cond_embeds + params["cond_embed"][0].astype(cond_embeds.dtype)

    tok = embed_tokens(params, cfg, token_ids)
    gen_index = jnp.broadcast_to(jnp.arange(t), (b, t))
    fids = face_phase_ids(token_ids, gen_index, cfg.face_per_token)
    tok = tok + params["face_positions"][fids].astype(tok.dtype)
    tok = tok + params["cond_embed"][1].astype(tok.dtype)

    x = jnp.concatenate([cond_x, tok], axis=1)
    positions = jnp.arange(c + t) + cfg.pos_offset
    x = x + params["embed_positions"][positions].astype(x.dtype)

    n = c + t
    pad = (-n) % block_q if block_q else 0
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    body = _opt_layer_prefill(cfg, block_q=block_q, with_kv=False)
    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, params["layers"])
    if pad:
        x = x[:, :n]
    return linear(x, params["lm_head"]["w"]).astype(jnp.float32)


def _opt_layer_decode(cfg: ShapeOPTConfig, kv_slice_len: int, attn: str = "xla",
                      chunk: int = 512, interpret: bool = False, wq: bool = False):
    """Scan body for one decode step: single query token against the
    cache.

    The full KV cache rides in the scan *carry* and is updated with
    dynamic_update_slice — XLA aliases carry buffers in place, so each
    step touches only the new slot instead of re-materializing the
    1.4 GB cache (the naive stacked-ys formulation costs a full cache
    copy per token).

    attn="pallas": the flash-decoding kernel streams exactly
    ``write_pos+1`` cache rows from HBM (ops/decode_attention.py).
    attn="xla": slice a static ``kv_slice_len`` window (bucket bound).
    wq: per-layer matrices are int8 (ops/wquant.py) — halves the
    dominant weight traffic of small-batch decode.
    """
    from meshanything_tpu.ops.wquant import lin_dispatch

    h = cfg.num_heads
    hd = cfg.head_dim
    lin = lin_dispatch(wq)

    def body(carry, p_and_idx):
        x, kv, write_pos = carry
        p, layer_idx = p_and_idx
        b = x.shape[0]
        d_model = h * hd
        residual = x

        qkv = lin(x, p["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, 1, h, hd)
        # cache rows are flat (H*D,) — the layout contract of
        # ops/decode_attention.py
        k_row = k.reshape(b, 1, d_model)[None, None]   # (1, 1, B, 1, H*D)
        v_row = v.reshape(b, 1, d_model)[None, None]

        zero = jnp.zeros((), jnp.int32)
        one = jnp.ones((), jnp.int32)
        if attn in ("pallas_int8", "pallas_int4"):
            from meshanything_tpu.ops.kvcache import quantize_rows, quantize_rows_int4

            qrows = quantize_rows if attn == "pallas_int8" else quantize_rows_int4
            values, scales = kv
            kq, ks_ = qrows(k_row)
            vq, vs_ = qrows(v_row)
            values = jax.lax.dynamic_update_slice(values, kq, (zero, layer_idx, zero, write_pos, zero))
            values = jax.lax.dynamic_update_slice(values, vq, (one, layer_idx, zero, write_pos, zero))
            # scales: (2, L, B, 1, S) — scalar per row
            ks_s = ks_.reshape(1, 1, b, 1, 1)
            vs_s = vs_.reshape(1, 1, b, 1, 1)
            scales = jax.lax.dynamic_update_slice(scales, ks_s, (zero, layer_idx, zero, zero, write_pos))
            scales = jax.lax.dynamic_update_slice(scales, vs_s, (one, layer_idx, zero, zero, write_pos))
            kv = (values, scales)
        else:
            kv = jax.lax.dynamic_update_slice(kv, k_row, (zero, layer_idx, zero, write_pos, zero))
            kv = jax.lax.dynamic_update_slice(kv, v_row, (one, layer_idx, zero, write_pos, zero))

        if attn in ("pallas_int8", "pallas_int4"):
            from meshanything_tpu.ops.decode_attention import (
                decode_attention_int4_impl,
                decode_attention_int8_impl,
            )

            impl = (decode_attention_int8_impl if attn == "pallas_int8"
                    else decode_attention_int4_impl)
            # pipelined: one continuous DMA schedule over all (row,
            # chunk) pairs — bit-identical to the grid-per-row kernel
            # (tests/test_ops.py::test_decode_attention_pipelined_...)
            # and ~5% faster at production shapes (PERF.md r4)
            o = impl(
                q[:, 0], kv[0], kv[1], layer_idx, write_pos + 1,
                chunk=chunk, interpret=interpret, pipelined=True,
            )[:, None]
        elif attn == "pallas":
            from meshanything_tpu.ops.decode_attention import decode_attention_impl

            # pipelined: bit-identical to the grid kernel on-chip at the
            # headline 11.25 GiB cache (max abs diff 0.0, PERF.md r5)
            # and 681 -> 662 us/call — the per-row prologue stall is
            # paid once per call instead of B times
            o = decode_attention_impl(
                q[:, 0], kv, layer_idx, write_pos + 1,
                chunk=chunk, interpret=interpret, pipelined=True,
            )[:, None]  # (B, 1, H, D)
        else:
            # static-size window reads; the dynamic layer index slices
            # fuse into the attention matmuls
            window = jax.lax.dynamic_slice(
                kv, (zero, layer_idx, zero, zero, zero),
                (2, 1, b, kv_slice_len, d_model),
            )
            keys = window[0, 0].reshape(b, kv_slice_len, h, hd)
            vals = window[1, 0].reshape(b, kv_slice_len, h, hd)
            scale = 1.0 / (hd ** 0.5)
            logits = jnp.einsum("bqhd,bshd->bhqs", q * jnp.asarray(scale, q.dtype), keys,
                                preferred_element_type=jnp.float32)
            span = jnp.arange(kv_slice_len)
            mask = span[None, None, None, :] <= write_pos
            logits = jnp.where(mask, logits, jnp.float32(-1e30))
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
            o = jnp.einsum("bhqs,bshd->bqhd", w, vals, preferred_element_type=q.dtype)

        x = residual + lin(o.reshape(b, 1, h * hd).astype(x.dtype), p["out"])
        x = layer_norm(x, p["ln_attn"]["scale"], p["ln_attn"]["bias"], cfg.ln_eps)
        residual = x
        x2 = jax.nn.relu(lin(x, p["fc1"]))
        x = residual + lin(x2, p["fc2"])
        x = layer_norm(x, p["ln_ffn"]["scale"], p["ln_ffn"]["bias"], cfg.ln_eps)
        return (x, kv, write_pos), None

    return body


class DecodeState(NamedTuple):
    step: jax.Array          # scalar int32: number of generated tokens so far
    tokens: jax.Array        # (B, gen_len) int32 output buffer (eos-prefilled)
    kv: jax.Array            # (2, L, B, S_max, H*D) — flat head rows
    done: jax.Array          # (B,) bool — row emitted eos
    last_token: jax.Array    # (B,) int32 token to feed next
    key: jax.Array           # PRNG key (sampling mode)


def _decode_step(params, cfg: ShapeOPTConfig, state: DecodeState, kv_slice_len: int,
                 *, sampling: bool, top_k: int, top_p: float, temperature: float,
                 attn: str = "xla", chunk: int = 512, interpret: bool = False,
                 unroll: int = 1, wq: bool = False) -> DecodeState:
    b = state.last_token.shape[0]
    dtype = params["cond_embed"].dtype

    # the token being fed was generated at gen-index (step - 1) and sits
    # at absolute position cond_length + step - 1
    ids = state.last_token
    gen_index = state.step - 1
    x = embed_tokens(params, cfg, ids).astype(dtype)
    fids = face_phase_ids(ids, gen_index, cfg.face_per_token)
    x = x + params["face_positions"][fids].astype(dtype)
    x = x + params["cond_embed"][1].astype(dtype)
    abs_pos = cfg.cond_length + gen_index
    x = x + params["embed_positions"][abs_pos + cfg.pos_offset].astype(dtype)
    x = x[:, None, :]  # (B, 1, d)

    if attn == "megakernel":
        # ONE launch for all layers: weights double-buffered through
        # VMEM, KV append + flash sweep inline (ops/megakernel.py)
        from meshanything_tpu.ops.megakernel import decode_step_megakernel

        x_row, kv = decode_step_megakernel(
            x[:, 0], params["layers"], state.kv, abs_pos, abs_pos + 1,
            num_heads=cfg.num_heads, chunk=chunk, ln_eps=cfg.ln_eps,
            interpret=interpret,
        )
        x = x_row[:, None]
    else:
        body = _opt_layer_decode(cfg, kv_slice_len, attn=attn, chunk=chunk,
                                 interpret=interpret, wq=wq)
        layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)
        (x, kv, _), _ = jax.lax.scan(
            lambda c, pkv: body(c, pkv),
            (x, state.kv, abs_pos),
            (params["layers"], layer_ids),
            unroll=unroll,
        )

    logits = linear(x[:, 0], params["lm_head"]["w"]).astype(jnp.float32)

    key, subkey = jax.random.split(state.key)
    next_token = sample_token(
        subkey, logits, sampling=sampling, top_k=top_k, top_p=top_p, temperature=temperature
    )
    # finished rows emit pad (HF generate semantics, meshanything.py:150)
    next_token = jnp.where(state.done, cfg.pad_token_id, next_token)
    new_done = state.done | (next_token == cfg.eos_token_id)

    tokens = jax.lax.dynamic_update_slice(
        state.tokens, next_token[:, None].astype(state.tokens.dtype), (0, state.step)
    )
    return DecodeState(state.step + 1, tokens, kv, new_done, next_token, key)


def init_decode_state(
    params: dict,
    cfg: ShapeOPTConfig,
    cond_embeds: jax.Array,
    *,
    max_new_tokens: int,
    key: Optional[jax.Array] = None,
    sampling: bool = False,
    top_k: int = 50,
    top_p: float = 0.95,
    temperature: float = 1.0,
    bucket: int = 512,
    attn: str = "pallas",
    prompt_ids: Optional[jax.Array] = None,
) -> DecodeState:
    """Prefill + first token -> the DecodeState the decode loop carries.

    Split out of ``generate`` so callers can run the loop in bounded
    segments (``decode_segment(until=...)``): the axon TPU worker kills
    any single program execution running past ~60 s (PERF.md r3 — the
    measured envelope first misattributed to HBM), so full-length
    decodes at large batch must be several calls of one compiled
    segment program with the state donated between calls
    (runtime/phases.py)."""
    b, c, _ = cond_embeds.shape
    p_len = 0 if prompt_ids is None else prompt_ids.shape[1]
    if p_len >= max_new_tokens:
        raise ValueError(f"prompt length {p_len} must be < max_new_tokens={max_new_tokens}")
    # pad the cache to a chunk multiple: the flash-decode kernel DMAs
    # whole chunks, so the last chunk must not run past the buffer
    s_max = -(-(c + max_new_tokens) // bucket) * bucket
    if key is None:
        key = jax.random.PRNGKey(0)

    def _prefill(kv_len):
        if prompt_ids is None:
            return prefill(params, cfg, cond_embeds, kv_len)
        return prefill_with_prompt(params, cfg, cond_embeds,
                                   jnp.asarray(prompt_ids, jnp.int32), kv_len)

    if attn in ("pallas_int8", "pallas_int4"):
        # quantize the compact prefix-length cache, THEN pad to
        # s_max — padding the bf16 cache first would materialize the
        # full-length bf16 buffer (12 GB at B=16) before quantization
        from meshanything_tpu.ops.kvcache import quantize_rows, quantize_rows_int4

        qrows = quantize_rows if attn == "pallas_int8" else quantize_rows_int4
        plen = c + p_len
        logits0, kv_c = _prefill(plen)
        values, row_scale = qrows(kv_c)                     # (..., plen, 1) scales
        scales = jnp.transpose(row_scale, (0, 1, 2, 4, 3))  # (2, L, B, 1, plen)
        values = jnp.pad(values, ((0, 0), (0, 0), (0, 0), (0, s_max - plen), (0, 0)))
        scales = jnp.pad(scales, ((0, 0), (0, 0), (0, 0), (0, 0), (0, s_max - plen)),
                         constant_values=1.0)
        kv = (values, scales)
    else:
        logits0, kv = _prefill(s_max)
    key, subkey = jax.random.split(key)
    first = sample_token(
        subkey, logits0, sampling=sampling, top_k=top_k, top_p=top_p, temperature=temperature
    )

    tokens = jnp.full((b, max_new_tokens), cfg.eos_token_id, jnp.int32)
    if p_len:
        tokens = jax.lax.dynamic_update_slice(
            tokens, jnp.asarray(prompt_ids, jnp.int32), (0, 0))
    tokens = tokens.at[:, p_len].set(first)
    return DecodeState(
        step=jnp.asarray(p_len + 1, jnp.int32),
        tokens=tokens,
        kv=kv,
        done=first == cfg.eos_token_id,
        last_token=first,
        key=key,
    )


def decode_segment(
    params: dict,
    cfg: ShapeOPTConfig,
    state: DecodeState,
    *,
    s_max: int,
    max_new_tokens: int,
    until: Optional[jax.Array] = None,
    early_exit: bool = True,
    attn: str = "pallas",
    bucket: int = 512,
    interpret: bool = False,
    unroll: int = 1,
    wq: bool = False,
    sampling: bool = False,
    top_k: int = 50,
    top_p: float = 0.95,
    temperature: float = 1.0,
) -> DecodeState:
    """Run the pallas decode while_loop until ``max_new_tokens`` — or,
    when ``until`` (a traced scalar) is given, at most until that step.

    One compiled program serves every segment of a request: the caller
    loops ``state = jit(decode_segment)(state, until=state.step + K)``
    with the state donated, keeping each device execution under the
    axon worker's ~60 s per-program watchdog. A segment whose rows are
    all done (or whose ``until`` has passed) is a no-op returning
    immediately, so callers can dispatch a fixed segment count
    asynchronously with no host round-trips between them."""
    step_kw = dict(sampling=sampling, top_k=top_k, top_p=top_p, temperature=temperature)

    # int8 weights: quantize the stacked layer matrices once per
    # segment (one 0.6 GB read, amortized over the segment's steps);
    # prefill ran on the bf16 originals.
    dec_params = params
    if wq:
        from meshanything_tpu.ops.wquant import quantize_opt_layers

        dec_params = dict(params, layers=quantize_opt_layers(params["layers"]))

    def cond_fn(st):
        live = st.step < max_new_tokens
        if until is not None:
            live = live & (st.step < until)
        if early_exit:
            live = live & ~jnp.all(st.done)
        return live

    def body_fn(st):
        return _decode_step(dec_params, cfg, st, s_max, attn=attn,
                            chunk=bucket, interpret=interpret,
                            unroll=unroll, wq=wq, **step_kw)

    return jax.lax.while_loop(cond_fn, body_fn, state)


def generate(
    params: dict,
    cfg: ShapeOPTConfig,
    cond_embeds: jax.Array,
    *,
    max_new_tokens: int,
    key: Optional[jax.Array] = None,
    sampling: bool = False,
    top_k: int = 50,
    top_p: float = 0.95,
    temperature: float = 1.0,
    bucket: int = 512,
    early_exit: bool = True,
    attn: str = "auto",
    unroll: int = 1,
    wq: bool = False,
    prompt_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Autoregressive generation: TPU-resident replacement for
    ``transformer.generate`` (meshanything.py:144-162).

    Returns (B, max_new_tokens) int32, eos-prefilled past the stop point
    (matching the reference's eos-filled output buffer,
    meshanything.py:142,163-164).

    prompt_ids (B, P): continue from a token prefix (stream order:
    element 0 is the bos slot). The prefix is prefilled causally in one
    pass (``prefill_with_prompt``) and echoed into the output; the
    continuation is token-identical to a generation whose first P steps
    had emitted the prefix (tested). Powers mesh completion
    (models/meshanything.py::complete).

    Execution: prefill writes the cache, then the decode loop runs
    fully on-device.

    attn="pallas" (default on TPU): ONE lax.while_loop; each step's
    attention is the flash-decoding kernel, streaming exactly the live
    context from HBM. attn="pallas_int8": same, with the cache stored
    int8 + per-row scales — halves the dominant HBM traffic for <1%
    attention error (fast mode; token streams may diverge from exact
    bf16 where logit gaps are sub-quantization). attn="pallas_int4":
    two 4-bit codes per byte (ops/kvcache.py packing contract) —
    QUARTERS the KV traffic; coarser quantization, so validate
    agreement per model (tools/trained_agreement_probe.py). attn="xla"
    (default
    off-TPU): one while_loop per static KV *bucket* — inside a bucket,
    attention reads the slice ``cache[:, :bucket_end]``, so early steps
    never touch the far end of the 7.5k-slot cache. All paths exit
    early once every row is done (tests/test_shape_opt.py).

    wq=True (fast mode): the 24 layers' matrices run int8 W8A8 in the
    decode loop (ops/wquant.py) — halves the dominant weight traffic of
    small-batch decode. Prefill, embeddings and lm_head stay bf16.
    Composes with attn="pallas"/"pallas_int8"/"pallas_int4"/"xla".
    """
    if attn == "auto":
        attn = "pallas" if jax.default_backend() == "tpu" else "xla"
    if wq and attn == "megakernel":
        raise ValueError("wq (int8 weights) does not compose with the megakernel path")
    interpret = (attn.startswith("pallas") or attn == "megakernel") \
        and jax.default_backend() != "tpu"
    c = cond_embeds.shape[1]
    s_max = -(-(c + max_new_tokens) // bucket) * bucket
    state = init_decode_state(
        params, cfg, cond_embeds, max_new_tokens=max_new_tokens, key=key,
        sampling=sampling, top_k=top_k, top_p=top_p, temperature=temperature,
        bucket=bucket, attn=attn, prompt_ids=prompt_ids)

    step_kw = dict(sampling=sampling, top_k=top_k, top_p=top_p, temperature=temperature)

    if attn.startswith("pallas") or attn == "megakernel":
        state = decode_segment(
            params, cfg, state, s_max=s_max, max_new_tokens=max_new_tokens,
            early_exit=early_exit, attn=attn, bucket=bucket,
            interpret=interpret, unroll=unroll, wq=wq, **step_kw)
        return state.tokens

    # XLA path: static bucket schedule over absolute kv length
    p_len = 0 if prompt_ids is None else prompt_ids.shape[1]
    dec_params = params
    if wq:
        from meshanything_tpu.ops.wquant import quantize_opt_layers

        dec_params = dict(params, layers=quantize_opt_layers(params["layers"]))
    starts = list(range(0, s_max, bucket))
    for bstart in starts:
        bend = min(bstart + bucket, s_max)
        if bend <= c + p_len:
            continue  # bucket fully covered by cond + static prompt

        def cond_fn(st, _bend=bend):
            # the next fed token writes KV slot cond_length + step - 1,
            # which must stay inside this bucket's static read window
            in_bucket = (cfg.cond_length + st.step - 1) < _bend
            live = in_bucket & (st.step < max_new_tokens)
            if early_exit:
                live = live & ~jnp.all(st.done)
            return live

        def body_fn(st, _bend=bend):
            return _decode_step(dec_params, cfg, st, _bend, attn="xla", wq=wq, **step_kw)

        state = jax.lax.while_loop(cond_fn, body_fn, state)

    return state.tokens
