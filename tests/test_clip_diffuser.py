"""ClipASLDiffuser composition: CLIP cond -> latent DDIM -> VAE decode
-> occupancy mesh (reference clip_asl_diffuser_pl_module.py dead code)."""
import numpy as np
import pytest

import torch

import jax
import jax.numpy as jnp

from meshanything_tpu.config import PerceiverConfig
from meshanything_tpu.models import clip_cond as cc
from meshanything_tpu.models import clip_diffuser as cd
from meshanything_tpu.models import diffusion as dm
from meshanything_tpu.models import perceiver as per_mod

pytestmark = pytest.mark.slow  # torch-oracle tier; smoke = -m 'not slow'

PCFG = PerceiverConfig(num_latents=8, embed_dim=8, width=48, heads=4,
                       num_encoder_layers=1, num_decoder_layers=1, num_points=32)
VCFG = cc.CLIPVisionConfig(image_size=16, patch_size=4, width=32, layers=1,
                           heads=4, projection_dim=24)
DCFG = dm.DiffusionConfig(input_channels=8, output_channels=8, n_ctx=8,
                          width=48, layers=1, heads=4, context_dim=24,
                          num_train_timesteps=50)


@pytest.fixture(scope="module")
def trees(rng):
    per = per_mod.init_perceiver_params(jax.random.PRNGKey(0), PCFG)
    diff = dm.init_udt_params(jax.random.PRNGKey(1), DCFG)
    from transformers import CLIPVisionConfig as HFV, CLIPVisionModel

    torch.manual_seed(0)
    hf = CLIPVisionModel(HFV(
        image_size=VCFG.image_size, patch_size=VCFG.patch_size,
        hidden_size=VCFG.width, num_hidden_layers=VCFG.layers,
        num_attention_heads=VCFG.heads, intermediate_size=VCFG.width * 4,
        hidden_act="quick_gelu")).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    # CLIPVisionModel state dict nests under vision_model.* already
    clip = cc.convert_clip_vision(sd, VCFG)
    # standalone vision model carries no projection; synthesize one
    clip["visual_projection"] = {"w": np.asarray(
        np.random.default_rng(0).normal(size=(VCFG.width, VCFG.projection_dim)) * 0.02,
        np.float32)}
    return per, diff, clip


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_encode_first_stage_shapes(trees, rng):
    per, _, _ = trees
    surf = jnp.asarray(rng.normal(size=(2, PCFG.num_points, 6)).astype(np.float32) * 0.4)
    z_mode = cd.encode_first_stage(per, PCFG, surf)
    z_samp = cd.encode_first_stage(per, PCFG, surf, jax.random.PRNGKey(0))
    assert z_mode.shape == (2, PCFG.num_latents, PCFG.embed_dim)
    assert z_samp.shape == z_mode.shape
    assert not np.allclose(np.asarray(z_mode), np.asarray(z_samp))  # posterior noise


def test_clip_diffuser_loss_grads_only_diffusion(trees, rng):
    per, diff, clip = trees
    surf = jnp.asarray(rng.normal(size=(2, PCFG.num_points, 6)).astype(np.float32) * 0.4)
    img = jnp.asarray(rng.uniform(-1, 1, size=(2, 3, 16, 16)).astype(np.float32))

    loss, grads = jax.value_and_grad(cd.clip_diffuser_loss)(
        diff, DCFG, per, PCFG, clip, VCFG, jax.random.PRNGKey(0), surf, img)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_sample_shapes_from_image_end_to_end(trees, rng):
    per, diff, clip = trees
    img = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 16, 16)).astype(np.float32))
    meshes = cd.sample_shapes_from_image(
        diff, DCFG, per, PCFG, clip, VCFG, img, jax.random.PRNGKey(0),
        steps=4, guidance_scale=2.0, octree_depth=4)
    assert len(meshes) == 1
    if meshes[0] is not None:  # random weights may or may not cross zero
        assert meshes[0].vertices.shape[1] == 3
