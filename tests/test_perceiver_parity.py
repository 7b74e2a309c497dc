"""Numerical parity of the JAX perceiver against the reference
Michelangelo implementation (used as a test oracle on CPU; the perceiver
runs with flash=False by default per shapevae-256.yaml, so it is fully
CPU-executable)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from meshanything_tpu.config import PerceiverConfig  # noqa: E402
from meshanything_tpu.models import perceiver as jper  # noqa: E402
from meshanything_tpu.runtime.checkpoint import convert_perceiver, to_device_tree  # noqa: E402

pytestmark = pytest.mark.slow  # torch-oracle tier; smoke = -m 'not slow'

CFG = PerceiverConfig(
    num_latents=16, embed_dim=8, point_feats=3, num_freqs=8, include_pi=False,
    width=48, heads=4, num_encoder_layers=2, num_decoder_layers=2,
    use_ln_post=True, qkv_bias=False, num_points=64,
)


@pytest.fixture(scope="module")
def ref_model():
    from MeshAnything.miche.michelangelo.models.tsal.sal_perceiver import (
        AlignedShapeLatentPerceiver,
    )

    torch.manual_seed(0)
    m = AlignedShapeLatentPerceiver(
        device=None, dtype=torch.float32,
        num_latents=CFG.num_latents, embed_dim=CFG.embed_dim,
        point_feats=CFG.point_feats, num_freqs=CFG.num_freqs,
        include_pi=CFG.include_pi, width=CFG.width, heads=CFG.heads,
        num_encoder_layers=CFG.num_encoder_layers,
        num_decoder_layers=CFG.num_decoder_layers,
        init_scale=CFG.init_scale, qkv_bias=CFG.qkv_bias, flash=False,
        use_ln_post=CFG.use_ln_post, use_checkpoint=False,
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_params(ref_model):
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    return to_device_tree(convert_perceiver(sd, CFG))


def test_fourier_embed_matches(ref_model):
    x = np.random.default_rng(0).normal(size=(2, 5, 3)).astype(np.float32)
    ref = ref_model.fourier_embedder(torch.from_numpy(x)).numpy()
    ours = np.asarray(jper.fourier_embed(jnp.asarray(x), CFG.num_freqs, CFG.include_pi))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_encode_latents_parity(ref_model, jax_params, rng):
    pc = rng.normal(size=(2, 64, 3)).astype(np.float32) * 0.5
    feats = rng.normal(size=(2, 64, 3)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    with torch.no_grad():
        se, lat = ref_model.encode_latents(torch.from_numpy(pc), torch.from_numpy(feats))
        ref = torch.cat([se.unsqueeze(1), lat], dim=1).numpy()

    pc_normal = jnp.asarray(np.concatenate([pc, feats], axis=-1))
    ours = np.asarray(jper.encode_latents(jax_params, CFG, pc_normal))

    assert ours.shape == ref.shape == (2, 17, 48)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_to_shape_latents_parity(ref_model, jax_params, rng):
    latents = rng.normal(size=(2, 16, 48)).astype(np.float32)
    with torch.no_grad():
        zq, _ = ref_model.encode_kl_embed(torch.from_numpy(latents), sample_posterior=False)
        ref = ref_model.decode(zq).numpy()
    ours = np.asarray(jper.to_shape_latents(jax_params, CFG, jnp.asarray(latents)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_query_geometry_parity(ref_model, jax_params, rng):
    kl_embed = rng.normal(size=(2, 16, 8)).astype(np.float32)
    queries = rng.normal(size=(2, 33, 3)).astype(np.float32)
    with torch.no_grad():
        decoded = ref_model.decode(torch.from_numpy(kl_embed))
        ref = ref_model.query_geometry(torch.from_numpy(queries), decoded).numpy()
    dec = jper.decode_latents(jax_params, CFG, jnp.asarray(kl_embed))
    ours = np.asarray(jper.query_geometry(jax_params, CFG, jnp.asarray(queries), dec))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_encode_kl_sample_stats(jax_params, rng):
    # sampling path: z-scores of samples against the analytic posterior
    # moments are standard-normal
    latents = jnp.asarray(rng.normal(size=(4, 16, 48)).astype(np.float32))
    from meshanything_tpu.models.layers import linear

    moments = linear(latents, jax_params["pre_kl"]["w"], jax_params["pre_kl"]["b"])
    mean, logvar = np.split(np.asarray(moments), 2, axis=-1)
    std = np.exp(0.5 * np.clip(logvar, -30, 20))
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    samples = np.stack([np.asarray(jper.encode_kl_sample(jax_params, latents, k)) for k in keys])
    z = (samples - mean) / std
    assert abs(z.mean()) < 0.05
    assert abs(z.std() - 1.0) < 0.05


def test_jit_and_batch_invariance(jax_params, rng):
    pc_normal = jnp.asarray(rng.normal(size=(3, 64, 6)).astype(np.float32))
    f = jax.jit(lambda p, x: jper.encode_latents(p, CFG, x))
    full = f(jax_params, pc_normal)
    single = f(jax_params, pc_normal[1:2])
    np.testing.assert_allclose(np.asarray(full[1:2]), np.asarray(single), atol=1e-5)
