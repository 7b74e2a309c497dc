#!/usr/bin/env python
"""Day-one real-weights parity harness: reference torch vs meshanything_tpu.

THE script to run the moment real MeshAnything weights (and/or network)
are available: it loads a combined safetensors checkpoint into BOTH the
reference torch model (/root/reference, imported as the numerical
oracle) and our JAX stack via runtime/checkpoint.py, runs both on the
same inputs, and diffs token streams, face coordinates and OBJ bytes.

  python tools/parity_vs_reference.py --ckpt MeshAnything_350m.pth \
      --fixtures /root/reference/pc_examples/mouse.npy \
                 /root/reference/examples/wand.obj
  python tools/parity_vs_reference.py --selftest        # no weights needed

--selftest builds a scaled-down reference model with RANDOM weights
(the reference hardcodes cond_length=257/bert/opt names, so the scale
knobs are injected through the same offline patch points a real run
needs anyway), exports ITS state_dict as the checkpoint, and runs the
full converter + compare path — proving the harness end-to-end today.

Offline/CPU environment accommodations (all are oracle-side plumbing,
none change the math):
  * transformers in this image is 4.57 (reference pins 4.39): the
    legacy tuple KV-cache layer API the reference decoder uses
    (shape_opt.py:390-415) is bridged by _LegacyLayerAdapter, which
    wraps each REAL OPTDecoderLayer with a DynamicCache and an explicit
    bottom-right-aligned causal mask — exactly what flash-attn-2
    computed in the pinned version. The adapter is validated against
    transformers' own layer in tests/test_parity_harness.py.
  * flash-attn / CUDA absent: attention runs eager through the real
    OPTAttention; the decoder's flash-only branch (shape_opt.py:357
    raises otherwise) is satisfied by setting _use_flash_attention_2
    (it only selects 2D-mask passthrough, which the adapter consumes).
  * no network: ShapeOPTConfig.from_pretrained / AutoConfig
    .from_pretrained("bert-base-uncased") are patched to construct the
    (pinned) configs locally; gradio/omegaconf/trimesh/skimage/optimum
    are absent -> stubbed (omegaconf via PyYAML over the reference's
    own shapevae-256.yaml; to_bettertransformer -> identity, which is
    numerically equivalent and keeps vanilla HF param naming).
  * HF generate under 4.57 no longer speaks the legacy cache, so the
    greedy loop (HF generate semantics: argmax, eos stop, pad fill —
    meshanything.py:140-162) is driven explicitly.

Both sides run f32 with highest matmul precision; the verdict requires
exact token-stream equality and coordinate agreement to 1e-4.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import types

import numpy as np

REFERENCE = os.environ.get("MESHANYTHING_REFERENCE", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@dataclasses.dataclass(frozen=True)
class ParityScale:
    """Scale knobs injected into the reference's hardcoded-name config
    loaders (and mirrored on the JAX side). full() == the shipped 350M."""

    opt_hidden: int = 1024
    opt_layers: int = 24
    opt_heads: int = 16
    opt_ffn: int = 4096
    opt_positions: int = 18259
    codebook_size: int = 8192
    codebook_dim: int = 1024
    nrd_hidden: int = 768
    nrd_heads: int = 12
    nrd_intermediate: int = 3072
    perceiver_enc_layers: int = 8
    perceiver_dec_layers: int = 16
    num_points: int = 4096
    n_max_triangles: int = 800

    @staticmethod
    def small() -> "ParityScale":
        return ParityScale(
            opt_hidden=128, opt_layers=2, opt_heads=4, opt_ffn=256,
            opt_positions=1024, codebook_size=64, codebook_dim=64,
            nrd_hidden=64, nrd_heads=4, nrd_intermediate=128,
            perceiver_enc_layers=1, perceiver_dec_layers=1,
            num_points=256, n_max_triangles=2,
        )

    def jax_config(self):
        from meshanything_tpu.config import (
            MeshAnythingConfig, NRDConfig, PerceiverConfig, ShapeOPTConfig,
        )

        return MeshAnythingConfig(
            perceiver=PerceiverConfig(
                num_encoder_layers=self.perceiver_enc_layers,
                num_decoder_layers=self.perceiver_dec_layers,
                num_points=self.num_points,
            ),
            opt=ShapeOPTConfig(
                hidden_size=self.opt_hidden, num_layers=self.opt_layers,
                num_heads=self.opt_heads, ffn_dim=self.opt_ffn,
                vocab_size=self.codebook_size + 3,
                max_positions=self.opt_positions,
                codebook_size=self.codebook_size,
                codebook_dim=self.codebook_dim,
            ),
            nrd=NRDConfig(
                hidden_size=self.nrd_hidden, num_heads=self.nrd_heads,
                intermediate_size=self.nrd_intermediate,
                codebook_dim=self.codebook_dim,
            ),
            n_max_triangles=self.n_max_triangles,
            dtype="float32",
        )


def _install_offline_stubs(scale: ParityScale):
    """Make `import MeshAnything.models.meshanything` + model build work
    offline on CPU. Returns nothing; patches sys.modules + classes."""
    import torch
    import yaml

    # ---- omegaconf: OmegaConf.load via PyYAML + attr-dict wrapper ----
    class _Dot(dict):
        def __getattr__(self, k):
            try:
                v = self[k]
            except KeyError:
                raise AttributeError(k)
            return _wrap(v)

    def _wrap(v):
        return _Dot(v) if isinstance(v, dict) else v

    def _load(path):
        with open(path) as fh:
            data = yaml.safe_load(fh)
        # scale-down injection point: the perceiver layer counts come
        # from the reference's own yaml; shrink them in small mode
        try:
            p = data["model"]["params"]["shape_module_cfg"]["params"]
            p["num_encoder_layers"] = scale.perceiver_enc_layers
            p["num_decoder_layers"] = scale.perceiver_dec_layers
        except KeyError:
            pass
        return _Dot(data)

    om = types.ModuleType("omegaconf")
    om.OmegaConf = type("OmegaConf", (), {"load": staticmethod(_load)})
    om.DictConfig = _Dot
    sys.modules.setdefault("omegaconf", om)

    # ---- dead-at-inference imports the miche modules pull in ----
    for name in ("trimesh", "pytorch_lightning"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk.measure = types.ModuleType("skimage.measure")
        sys.modules["skimage"] = sk
        sys.modules["skimage.measure"] = sk.measure

    # ---- CPU: .cuda() is identity ----
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # ---- optimum absent: BetterTransformer is an SDPA-fusion identity
    # transform; skipping it keeps vanilla HF param naming (the BT-fused
    # checkpoint naming is handled by a key translation at load time,
    # mirroring runtime/checkpoint.convert_nrd's dual support) ----
    from transformers import PreTrainedModel

    PreTrainedModel.to_bettertransformer = lambda self: self

    # ---- offline configs for the two hub names the reference fetches ----
    from transformers import AutoConfig, BertConfig

    _real_autoconfig = AutoConfig.from_pretrained.__func__

    def _auto_from_pretrained(cls, name, *a, **kw):
        if name == "bert-base-uncased":
            # bert-base-uncased == BertConfig defaults; NRD then forces
            # num_hidden_layers=6 itself (meshanything.py:23)
            return BertConfig(
                hidden_size=scale.nrd_hidden,
                num_attention_heads=scale.nrd_heads,
                intermediate_size=scale.nrd_intermediate,
                attn_implementation="eager",
            )
        return _real_autoconfig(cls, name, *a, **kw)

    AutoConfig.from_pretrained = classmethod(_auto_from_pretrained)

    sys.path.insert(0, REFERENCE)
    from MeshAnything.models.shape_opt import ShapeOPT as RefShapeOPT
    from MeshAnything.models.shape_opt import ShapeOPTConfig as RefOPTCfg

    # 4.57 forwards from_config kwargs into the constructor (the
    # reference passes use_flash_attention_2=True, meshanything.py:115);
    # also force eager BEFORE construction so no flash-attn validation
    # fires (the decoder's flash-only branch is re-enabled afterwards
    # via _use_flash_attention_2, which only selects mask passthrough)
    _orig_shapeopt_init = RefShapeOPT.__init__

    def _shapeopt_init(self, config, **kwargs):
        kwargs.pop("use_flash_attention_2", None)
        config._attn_implementation = "eager"
        _orig_shapeopt_init(self, config)

    RefShapeOPT.__init__ = _shapeopt_init

    def _opt_from_pretrained(cls, name, **overrides):
        # facebook/opt-350m architectural facts (see config.py pins)
        cfg = RefOPTCfg(
            hidden_size=scale.opt_hidden, num_hidden_layers=scale.opt_layers,
            ffn_dim=scale.opt_ffn, num_attention_heads=scale.opt_heads,
            word_embed_proj_dim=scale.opt_hidden,
            do_layer_norm_before=False, activation_function="relu",
            tie_word_embeddings=False,
        )
        overrides.pop("_attn_implementation", None)
        for k, v in overrides.items():
            setattr(cfg, k, v)
        cfg.n_positions = scale.opt_positions
        cfg.max_position_embeddings = scale.opt_positions
        return cfg

    RefOPTCfg.from_pretrained = classmethod(_opt_from_pretrained)


class _LegacyLayerAdapter:
    """Bridge the reference decoder's 4.39-era layer calling convention
    (2D/None mask passthrough + legacy (k, v) tuple cache, returning
    (hidden, present)) onto the installed transformers' OPTDecoderLayer.

    Equivalent math: flash-attn-2 in the pinned version computed
    bottom-right-aligned causal attention with padding columns masked;
    the adapter builds exactly that mask as a 4D additive tensor and
    runs the REAL layer's eager attention with it."""

    def __init__(self, layer):
        import torch  # noqa: F401

        self.layer = layer
        layer.self_attn.layer_idx = 0

    def __call__(self, hidden_states, attention_mask=None, layer_head_mask=None,
                 past_key_value=None, output_attentions=False, use_cache=True):
        import torch
        from transformers.cache_utils import DynamicCache

        b, q, _ = hidden_states.shape
        past_len = past_key_value[0].shape[2] if past_key_value is not None else 0
        total = past_len + q
        qi = torch.arange(q).view(1, 1, q, 1)
        kj = torch.arange(total).view(1, 1, 1, total)
        allowed = kj <= (qi + past_len)
        if attention_mask is not None:
            allowed = allowed & attention_mask[:, None, None, :total].bool()
        neg = torch.finfo(hidden_states.dtype).min
        mask4d = torch.where(allowed, 0.0, neg).to(hidden_states.dtype)
        mask4d = mask4d.expand(b, 1, q, total)

        cache = DynamicCache()
        if past_key_value is not None:
            cache.update(past_key_value[0], past_key_value[1], 0)
        out = self.layer(
            hidden_states,
            attention_mask=mask4d,
            past_key_values=cache,
            use_cache=True,
            output_attentions=False,
            cache_position=torch.arange(past_len, total),
        )
        lay = cache.layers[0]
        return (out[0], (lay.keys, lay.values))


def build_reference_model(scale: ParityScale):
    """Construct the reference MeshAnything(args) (meshanything.py:82)
    with the offline patches installed; adapt its decoder layers."""
    _install_offline_stubs(scale)
    cwd = os.getcwd()
    os.chdir(REFERENCE)  # load_model reads a relative yaml path (encode.py:43)
    try:
        from MeshAnything.models.meshanything import MeshAnything as RefMeshAnything

        args = argparse.Namespace(
            llm="facebook/opt-350m",
            codebook_size=scale.codebook_size,
            codebook_dim=scale.codebook_dim,
            n_max_triangles=scale.n_max_triangles,
        )
        import torch

        torch.manual_seed(0)
        model = RefMeshAnything(args)
    finally:
        os.chdir(cwd)

    import torch

    class _AdapterModuleList(torch.nn.ModuleList):
        """ModuleList that iterates as legacy adapters: param naming
        (layers.{i}.self_attn...) and state_dict stay untouched; the
        reference decoder's `for layer in self.layers` loop
        (shape_opt.py:380) sees the 4.39-convention callables."""

        def __iter__(self):
            return (_LegacyLayerAdapter(m) for m in super().__iter__())

    dec = model.transformer.model.decoder
    dec._use_flash_attention_2 = True          # 2D-mask passthrough branch
    model.transformer.config._attn_implementation = "eager"
    dec.layers = _AdapterModuleList(dec.layers)
    model.eval()
    return model


def reference_greedy_generate(model, cond, max_new_tokens):
    """HF greedy-generate semantics (meshanything.py:144-151 with
    num_beams=1): argmax each step, stop when every row emitted eos,
    finished rows padded with pad_token_id."""
    import torch

    b = cond.shape[0]
    bos, eos, pad = 0, 1, 2
    mask = torch.ones(b, cond.shape[1], dtype=torch.long)
    out = model.transformer(inputs_embeds=cond, attention_mask=mask, use_cache=True)
    past = out.past_key_values
    cur = out.logits[:, -1].argmax(-1)
    tokens = [cur]
    done = cur == eos
    for _ in range(max_new_tokens - 1):
        if bool(done.all()):
            break
        mask = torch.cat([mask, torch.ones(b, 1, dtype=torch.long)], dim=1)
        out = model.transformer(
            input_ids=cur[:, None], attention_mask=mask,
            past_key_values=past, use_cache=True,
        )
        past = out.past_key_values
        nxt = out.logits[:, -1].argmax(-1)
        nxt = torch.where(done, torch.full_like(nxt, pad), nxt)
        done = done | (nxt == eos)
        tokens.append(nxt)
        cur = nxt
    return torch.stack(tokens, dim=1)


def run_reference(model, pc_normal: np.ndarray, max_new_tokens: int):
    """The reference MeshAnything.forward (meshanything.py:134-176) with
    the explicit greedy loop; returns (raw token buffer, face coords)."""
    import torch

    with torch.no_grad():
        pc = torch.from_numpy(np.asarray(pc_normal, np.float32))
        point_feature = model.point_encoder.encode_latents(pc)
        cond = model.process_point_feature(point_feature)

        results = reference_greedy_generate(model, cond, max_new_tokens)
        b = pc.shape[0]
        outputs = torch.ones(b, max_new_tokens, dtype=torch.long) * model.eos_token_id
        outputs[:, : results.shape[1]] = results
        raw = outputs.clone()

        outputs = outputs[:, 1:-1]
        for special in (model.bos_token_id, model.eos_token_id, model.pad_token_id):
            outputs[outputs == special] = model.tokenizer.pad_id
        outputs[outputs != model.tokenizer.pad_id] -= 3
        code_embed = model.get_codes(outputs)
        coords = model.tokenizer(outputs, code_embed, point_feature=point_feature)
    return raw.numpy(), coords.numpy()


def run_ours(params, cfg, pc_normal: np.ndarray, bucket: int):
    import jax.numpy as jnp

    from meshanything_tpu.models import meshanything as ma

    out = ma.generate(params, cfg, jnp.asarray(pc_normal, jnp.float32),
                      bucket=bucket, attn="xla")
    return np.asarray(out.token_ids), np.asarray(out.face_coords)


# The shipping fast tiers (VERDICT r3 #7: the day-one real-weights run
# must adjudicate the full serving surface, not only the exact path).
# Each runs the SAME fixtures through the production PhaseRunner with
# that tier's knobs; on CPU the Pallas kernels run in interpret mode.
FAST_MODES = {
    "int8_kv": dict(attn="pallas_int8", lookahead=0, wq=False),
    "int4_kv": dict(attn="pallas_int4", lookahead=0, wq=False),
    "lookahead8": dict(attn="pallas", lookahead=8, wq=False),
    "w8a8": dict(attn="xla", lookahead=0, wq=True),
    # the --fast preset (cli.apply_fast_preset): all three composed
    "fast_preset": dict(attn="pallas_int8", lookahead=8, wq=True),
}


def run_ours_mode(params, cfg, pc_normal: np.ndarray, bucket: int, mode: dict):
    """One fixture through the production PhaseRunner at a fast tier."""
    import jax.numpy as jnp

    from meshanything_tpu.runtime.phases import PhaseRunner

    runner = PhaseRunner(params, cfg, bucket=bucket, early_exit=True, **mode)
    out = runner(jnp.asarray(pc_normal, jnp.float32))
    return np.asarray(out.token_ids), np.asarray(out.face_coords)


def token_agreement(ref_raw: np.ndarray, our_raw: np.ndarray, eos: int):
    """Per-row agreement up to and including the reference stream's
    first eos (beyond it the two stacks legitimately differ in pad
    filler: HF pads with pad_id, our buffers stay eos-prefilled)."""
    agree = total = 0
    for row in range(ref_raw.shape[0]):
        hits = np.where(ref_raw[row] == eos)[0]
        limit = int(hits[0]) + 1 if len(hits) else ref_raw.shape[1]
        agree += int((ref_raw[row, :limit] == our_raw[row, :limit]).sum())
        total += limit
    return agree / max(total, 1), total


def compare(name, ref_raw, ref_coords, our_raw, our_coords, out_dir,
            coord_tol=1e-4):
    """Diff token streams, coords, and postprocessed OBJ bytes; returns
    a result dict (ok=True iff exact tokens + coords within tol +
    identical OBJ bytes)."""
    from meshanything_tpu.geometry.postprocess import postprocess_faces

    res = {"fixture": name}
    res["tokens_total"] = int(ref_raw.size)
    res["tokens_equal"] = int((ref_raw == our_raw).sum())
    res["token_match"] = res["tokens_equal"] / max(res["tokens_total"], 1)
    # guard against a vacuous all-special comparison (e.g. instant eos)
    res["content_tokens"] = int((ref_raw >= 3).sum())

    ref_nan = np.isnan(ref_coords)
    our_nan = np.isnan(our_coords)
    res["nan_mask_equal"] = bool((ref_nan == our_nan).all())
    both = ~ref_nan & ~our_nan
    res["coord_max_abs_diff"] = (
        float(np.max(np.abs(ref_coords[both] - our_coords[both]))) if both.any() else 0.0
    )

    os.makedirs(out_dir, exist_ok=True)
    ref_obj = os.path.join(out_dir, f"{name}_reference.obj")
    our_obj = os.path.join(out_dir, f"{name}_ours.obj")
    postprocess_faces(ref_coords[0], ref_obj)
    postprocess_faces(our_coords[0], our_obj)
    with open(ref_obj, "rb") as fh:
        ref_bytes = fh.read()
    with open(our_obj, "rb") as fh:
        our_bytes = fh.read()
    res["obj_bytes_equal"] = ref_bytes == our_bytes

    res["ok"] = (
        res["token_match"] == 1.0
        and res["nan_mask_equal"]
        and res["coord_max_abs_diff"] <= coord_tol
        and res["obj_bytes_equal"]
    )
    return res


def load_fixture(path: str, num_points: int, seed: int = 0) -> np.ndarray:
    """Shared input loading (BOTH sides see the same pc_normal; the
    host preprocessing itself is parity-tested in tests/test_geometry).
    .npy -> CLI pc-bbox normalization; mesh -> sample + normalize."""
    from meshanything_tpu.runtime.pipeline import load_inputs

    itype = "pc_normal" if path.endswith(".npy") else "mesh"
    samples = load_inputs(itype, [path], num_points=num_points, seed=seed)
    return np.asarray(samples[0].pc_normal, np.float32)[None]


def _translate_bt_fused_nrd(sd):
    """If the checkpoint stores the NRD with BetterTransformer-fused
    naming (the shipped format), expand to vanilla HF naming so the
    torch model (built without optimum) loads it strictly."""
    import re

    out = {}
    for k, v in sd.items():
        m = re.match(r"tokenizer\.decoder\.layer\.(\d+)\.in_proj_weight", k)
        if m:
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            base = f"tokenizer.decoder.layer.{m.group(1)}.attention.self"
            out[f"{base}.query.weight"] = q
            out[f"{base}.key.weight"] = kk
            out[f"{base}.value.weight"] = vv
            continue
        m = re.match(r"tokenizer\.decoder\.layer\.(\d+)\.in_proj_bias", k)
        if m:
            q, kk, vv = np.split(np.asarray(v), 3, axis=0)
            base = f"tokenizer.decoder.layer.{m.group(1)}.attention.self"
            out[f"{base}.query.bias"] = q
            out[f"{base}.key.bias"] = kk
            out[f"{base}.value.bias"] = vv
            continue
        ren = {
            "out_proj_weight": "attention.output.dense.weight",
            "out_proj_bias": "attention.output.dense.bias",
            "norm1_weight": "attention.output.LayerNorm.weight",
            "norm1_bias": "attention.output.LayerNorm.bias",
            "linear1_weight": "intermediate.dense.weight",
            "linear1_bias": "intermediate.dense.bias",
            "linear2_weight": "output.dense.weight",
            "linear2_bias": "output.dense.bias",
            "norm2_weight": "output.LayerNorm.weight",
            "norm2_bias": "output.LayerNorm.bias",
        }
        m = re.match(r"(tokenizer\.decoder\.layer\.\d+\.)(\w+)$", k)
        if m and m.group(2) in ren:
            out[m.group(1) + ren[m.group(2)]] = v
            continue
        out[k] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser("parity_vs_reference")
    ap.add_argument("--ckpt", default=None,
                    help="combined safetensors state dict (MeshAnything_350m.pth)")
    ap.add_argument("--fixtures", nargs="*", default=None,
                    help="input files; default: the three shipped fixtures")
    ap.add_argument("--selftest", action="store_true",
                    help="scaled-down random-weight end-to-end check (no ckpt)")
    ap.add_argument("--fast-modes", nargs="*", default=None, metavar="MODE",
                    help="also run these fast tiers through the production "
                         "PhaseRunner and report per-mode token agreement vs "
                         f"the torch oracle stream (choices: {sorted(FAST_MODES)}; "
                         "bare flag = all). Fast-tier agreement is reported, "
                         "not gated: quantized/reordered arithmetic may flip "
                         "argmax near-ties, so the threshold is a per-model "
                         "judgement (trained-350M probe: 1.0000, PERF.md r3).")
    ap.add_argument("--n_max_triangles", type=int, default=None)
    ap.add_argument("--out_dir", default="/tmp/parity_out")
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--coord_tol", type=float, default=1e-4)
    args = ap.parse_args(argv)

    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    # pin CPU: parity is an f32 exactness check, and this must never
    # contend with a TPU process (single-tenant chip — CLAUDE.md). The
    # env var is overridden by a sitecustomize hook on this image;
    # jax.config is not.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        print("note: JAX backend already initialized as",
              jax.default_backend(), flush=True)

    scale = ParityScale.small() if args.selftest else ParityScale()
    if args.n_max_triangles:
        scale = dataclasses.replace(scale, n_max_triangles=args.n_max_triangles)
    cfg = scale.jax_config()

    print("building reference torch model...", flush=True)
    model = build_reference_model(scale)
    model = model.float()

    if args.selftest:
        # the torch model's own random init IS the checkpoint: exporting
        # its state_dict exercises the converter against the reference's
        # real key layout end-to-end
        sd = {k: v.numpy() for k, v in model.state_dict().items()}
    else:
        if not args.ckpt:
            ap.error("--ckpt is required without --selftest")
        from meshanything_tpu.runtime.checkpoint import load_safetensors

        sd = load_safetensors(args.ckpt)
        import torch

        model.load_state_dict(
            {k: torch.from_numpy(np.asarray(v))
             for k, v in _translate_bt_fused_nrd(sd).items()},
            strict=False,
        )

    from meshanything_tpu.runtime.checkpoint import convert_meshanything, to_device_tree

    params = to_device_tree(convert_meshanything(sd, cfg))

    if args.fixtures:
        fixtures = args.fixtures
    elif args.selftest:
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(scale.num_points, 3))
        pts /= np.abs(pts).max()
        pts *= 0.9
        nrm = rng.normal(size=(scale.num_points, 3))
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        fixtures = [("synthetic", np.concatenate([pts, nrm], -1)[None].astype(np.float32))]
    else:
        fixtures = [
            os.path.join(REFERENCE, "pc_examples/mouse.npy"),
            os.path.join(REFERENCE, "examples/wand.obj"),
            os.path.join(REFERENCE, "examples/screwdriver.obj"),
        ]

    results = []
    for fx in fixtures:
        if isinstance(fx, tuple):
            name, pc = fx
        else:
            name = os.path.splitext(os.path.basename(fx))[0]
            pc = load_fixture(fx, scale.num_points)
        print(f"[{name}] reference torch forward...", flush=True)
        ref_raw, ref_coords = run_reference(model, pc, cfg.generate_length)
        print(f"[{name}] meshanything_tpu forward...", flush=True)
        our_raw, our_coords = run_ours(params, cfg, pc, args.bucket)
        res = compare(name, ref_raw, ref_coords, our_raw, our_coords,
                      args.out_dir, args.coord_tol)
        results.append(res)
        print(json.dumps(res), flush=True)

        if args.fast_modes is not None:
            modes = args.fast_modes or sorted(FAST_MODES)
            bad = [m for m in modes if m not in FAST_MODES]
            if bad:
                ap.error(f"unknown fast modes {bad}; choices: {sorted(FAST_MODES)}")
            eos = cfg.opt.eos_token_id
            for m in modes:
                print(f"[{name}] fast mode {m}...", flush=True)
                fm_raw, _fm_coords = run_ours_mode(
                    params, cfg, pc, args.bucket, FAST_MODES[m])
                agr, total = token_agreement(ref_raw, fm_raw, eos)
                fm_res = {"fixture": name, "fast_mode": m,
                          "token_agreement": round(agr, 6),
                          "tokens_compared": total}
                results.append(fm_res)
                print(json.dumps(fm_res), flush=True)

    ok = all(r["ok"] for r in results if "ok" in r)
    print("PARITY VERDICT:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
