"""CLIP conditional-encoder parity vs HF CLIP modules (random weights
from_config — pins the math offline; reference encoder_factory.py)."""
import numpy as np
import pytest

import torch

import jax
import jax.numpy as jnp

from meshanything_tpu.models import clip_cond as cc

pytestmark = pytest.mark.slow  # torch-oracle tier; smoke = -m 'not slow'

TCFG = cc.CLIPTextConfig(vocab_size=99, width=32, layers=2, heads=4,
                         max_positions=12, projection_dim=24, eos_token_id=98)
VCFG = cc.CLIPVisionConfig(image_size=16, patch_size=4, width=32, layers=2,
                           heads=4, projection_dim=24)


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    torch.manual_seed(0)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            vocab_size=TCFG.vocab_size, hidden_size=TCFG.width,
            num_hidden_layers=TCFG.layers, num_attention_heads=TCFG.heads,
            intermediate_size=TCFG.width * 4, max_position_embeddings=TCFG.max_positions,
            hidden_act="quick_gelu", eos_token_id=TCFG.eos_token_id,
            bos_token_id=TCFG.eos_token_id - 1, pad_token_id=0,
        ).to_dict(),
        vision_config=CLIPVisionConfig(
            image_size=VCFG.image_size, patch_size=VCFG.patch_size,
            hidden_size=VCFG.width, num_hidden_layers=VCFG.layers,
            num_attention_heads=VCFG.heads, intermediate_size=VCFG.width * 4,
            hidden_act="quick_gelu",
        ).to_dict(),
        projection_dim=TCFG.projection_dim,
    )
    model = CLIPModel(cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    return model, sd


def test_text_tower_parity(hf_clip, rng):
    model, sd = hf_clip
    params = cc.convert_clip_text(sd, TCFG)
    ids = rng.integers(1, TCFG.vocab_size - 2, size=(2, TCFG.max_positions)).astype(np.int64)
    ids[:, 0] = TCFG.eos_token_id - 1
    ids[0, 5] = TCFG.eos_token_id
    ids[1, -1] = TCFG.eos_token_id

    with torch.no_grad():
        out = model.text_model(input_ids=torch.from_numpy(ids))
    ours_h, ours_pool = cc.clip_text_forward(params, TCFG, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours_h), out.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_pool), out.pooler_output.numpy(),
                               atol=2e-5, rtol=1e-4)

    with torch.no_grad():
        feats = model.get_text_features(input_ids=torch.from_numpy(ids))
    np.testing.assert_allclose(np.asarray(cc.clip_text_features(params, TCFG, jnp.asarray(ids, jnp.int32))),
                               feats.numpy(), atol=2e-5, rtol=1e-4)


def test_vision_tower_parity(hf_clip, rng):
    model, sd = hf_clip
    params = cc.convert_clip_vision(sd, VCFG)
    px = rng.normal(size=(2, 3, VCFG.image_size, VCFG.image_size)).astype(np.float32)

    with torch.no_grad():
        out = model.vision_model(pixel_values=torch.from_numpy(px))
        feats = model.get_image_features(pixel_values=torch.from_numpy(px))
    ours_h, ours_pool = cc.clip_vision_forward(params, VCFG, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(ours_h), out.last_hidden_state.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_pool), out.pooler_output.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(cc.clip_image_features(params, VCFG, jnp.asarray(px))),
                               feats.numpy(), atol=3e-5, rtol=1e-4)


def test_embedder_wrappers(hf_clip, rng):
    model, sd = hf_clip
    tparams = cc.convert_clip_text(sd, TCFG)
    vparams = cc.convert_clip_vision(sd, VCFG)

    ids = cc.unconditional_text_ids(TCFG, 3, bos=TCFG.eos_token_id - 1)
    z = cc.text_embedding(tparams, TCFG, ids)
    assert z.shape == (3, TCFG.max_positions, TCFG.width)

    img = jnp.asarray(rng.uniform(-1, 1, size=(2, 3, 20, 24)).astype(np.float32))
    z = cc.image_embedding(vparams, VCFG, img)
    assert z.shape == (2, 1, TCFG.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0, rtol=1e-5)

    # zero-dropout masks whole rows
    zd = cc.image_embedding(vparams, VCFG, img, key=jax.random.PRNGKey(0),
                            zero_embedding_radio=1.0)
    np.testing.assert_allclose(np.asarray(zd), 0.0, atol=1e-7)

    grid = cc.image_grid_embedding(vparams, VCFG, img)
    assert grid.shape == (2, 1 + VCFG.num_patches, VCFG.width)


def test_preprocess_matches_torchvision(rng):
    """Resize-shortest-side + center-crop + normalize vs torchvision
    semantics (nearest-enough: bicubic kernels differ slightly between
    torch and jax.image — compare coarse statistics + exact crop/norm on
    an already-sized input)."""
    px = rng.uniform(0, 1, size=(1, 3, 16, 16)).astype(np.float32) * 2 - 1
    out = cc.preprocess_image(jnp.asarray(px), image_size=16)
    expected = ((px + 1) / 2 - cc.CLIP_MEAN[None, :, None, None]) / cc.CLIP_STD[None, :, None, None]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_class_embedder(rng):
    p = cc.init_class_embedder(jax.random.PRNGKey(0), embed_dim=16, n_classes=10)
    labels = jnp.asarray([3, 7])
    z = cc.class_embedding(p, labels)
    assert z.shape == (2, 1, 16)
    np.testing.assert_array_equal(np.asarray(z[0, 0]), np.asarray(p["embedding"][3]))


def test_text_templates_load_and_expand():
    """The CLIP prompt-ensemble data file (reference michelangelo/data/
    templates.json — the last file-level parity gap, VERDICT r3 #9):
    64 'shape' templates, each a one-slot format string."""
    templates = cc.load_text_templates("shape")
    assert len(templates) == 64
    assert all("{}" in t for t in templates)
    prompts = cc.expand_text_templates("chair")
    assert len(prompts) == 64
    assert "a point cloud model of chair." in prompts
    assert all("chair" in p and "{}" not in p for p in prompts)
