"""Training transform pipeline (reference data/transforms.py dead code)
+ ViT-init block variant (transformer_vit.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.training.transforms import (
    AxisScaleTransform,
    Compose,
    FeatureSelection,
    RandomSample,
    SplitRandomSample,
    build_transforms,
    identity,
)


def _sample(rng, n_sets=3, n_surf=64, n_vol=256, n_near=128):
    return {
        "surface": rng.normal(size=(n_sets, n_surf, 9)).astype(np.float32) * 0.4,
        "vol_points": rng.normal(size=(n_vol, 3)).astype(np.float32),
        "vol_label": (rng.uniform(size=(n_vol,)) > 0.5).astype(np.float32),
        "near_points": rng.normal(size=(n_near, 3)).astype(np.float32),
        "near_label": (rng.uniform(size=(n_near,)) > 0.5).astype(np.float32),
    }


def test_random_sample_shapes(rng):
    out = RandomSample(num_volume_samples=32, num_near_samples=16)(_sample(rng), rng)
    assert out["surface"].shape == (64, 9)
    assert out["geo_points"].shape == (48, 4)  # [xyz | label]
    assert set(np.unique(out["geo_points"][:, 3])) <= {0.0, 1.0}


def test_split_random_sample(rng):
    out = SplitRandomSample(use_surface_sample=True, num_surface_samples=8,
                            num_volume_samples=32, num_near_samples=16)(
        {**_sample(rng), "surface": _sample(rng)["surface"][0]}, rng)
    assert out["surface"].shape == (8, 9)
    assert out["vol_points"].shape == (32, 4)
    assert out["near_points"].shape == (16, 4)


def test_feature_selection(rng):
    s = {"surface": rng.normal(size=(10, 9)).astype(np.float32)}
    assert FeatureSelection("none")(s)["surface"].shape == (10, 3)
    got = FeatureSelection("normal")(s)["surface"]
    np.testing.assert_array_equal(got, s["surface"][:, [0, 1, 2, 6, 7, 8]])
    with pytest.raises(KeyError):
        FeatureSelection("bogus")


def test_axis_scale_normalizes_to_unit_cube(rng):
    base = RandomSample(num_volume_samples=32, num_near_samples=16)(_sample(rng), rng)
    out = AxisScaleTransform(jitter=False)(base, rng)
    assert np.abs(out["surface"][..., :3]).max() <= 1.0
    assert np.abs(out["surface"][..., :3]).max() > 0.99  # renormalized up
    jit = AxisScaleTransform(jitter=True)(base, rng)
    assert np.abs(jit["surface"][..., :3]).max() <= 1.015


def test_compose_and_registry(rng):
    pipe = build_transforms({
        "RandomSample": {"num_volume_samples": 32, "num_near_samples": 16},
        "AxisScaleTransform": {"jitter": False},
    })
    out = pipe(_sample(rng), rng)
    assert out["geo_points"].shape == (48, 4)
    assert "RandomSample" in repr(pipe)
    assert build_transforms(None) is identity
    with pytest.raises(KeyError, match="unknown transform"):
        build_transforms({"Nope": {}})


def test_vit_init_block_variant(rng):
    from meshanything_tpu.models.layers import (
        init_self_attention_block_vit,
        self_attention_block,
        trunc_normal,
    )

    w = trunc_normal(jax.random.PRNGKey(0), (4000,), std=0.02)
    assert float(jnp.abs(w).max()) <= 0.04 + 1e-6     # truncated at 2 sigma
    assert 0.015 < float(jnp.std(w)) < 0.025

    p = init_self_attention_block_vit(jax.random.PRNGKey(1), 32, qkv_bias=True)
    x = jnp.asarray(rng.normal(size=(2, 6, 32)).astype(np.float32))
    out = self_attention_block(x, p, num_heads=4, dual_sqrt_scale=False)
    assert out.shape == x.shape and bool(jnp.isfinite(out).all())
