"""Extra embedder tier (reference modules/embedder.py:108-230 dead code)
+ psnr (utils/eval.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from meshanything_tpu.models import embedders as em


def test_learned_fourier_matches_torch_formula(rng):
    in_c, dim = 3, 24
    params = em.init_learned_fourier(jax.random.PRNGKey(0), in_c, dim)
    x = rng.normal(size=(2, 5, in_c)).astype(np.float32)
    out = em.learned_fourier(params, jnp.asarray(x))
    w = np.asarray(params["weights"])
    freqs = (x[..., None] * w[None] * 2 * np.pi).reshape(2, 5, -1)
    expected = np.concatenate([x, np.sin(freqs), np.cos(freqs)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
    assert out.shape[-1] == em.learned_fourier_out_dim(in_c, dim)


def test_triplane_is_sum_of_planes(rng):
    params = em.init_triplane_fourier(jax.random.PRNGKey(1), 3, 24)
    x = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    total = em.triplane_fourier(params, x)
    parts = sum(em.learned_fourier(params[pl], x) for pl in ("yz", "xz", "xy"))
    np.testing.assert_allclose(np.asarray(total), np.asarray(parts), atol=1e-6)


def test_sequential_pos_embed_formula():
    emb = em.sequential_pos_embed(6, 8)
    assert emb.shape == (6, 8)
    omega = 1.0 / 10000 ** (np.arange(4, dtype=np.float32) / 4)
    np.testing.assert_allclose(np.asarray(emb[3, :4]), np.sin(3 * omega), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[3, 4:]), np.cos(3 * omega), atol=1e-6)


def test_get_embedder_factory(rng):
    fn, d = em.get_embedder("identity", input_dim=5)
    x = jnp.asarray(rng.normal(size=(2, 5)).astype(np.float32))
    assert d == 5 and np.allclose(np.asarray(fn(x)), np.asarray(x))

    fn, d = em.get_embedder("fourier", num_freqs=-1, input_dim=3)
    assert d == 3  # num_freqs=-1 -> identity (embedder.py:204)

    fn, d = em.get_embedder("fourier", num_freqs=8, input_dim=3, include_pi=False)
    x3 = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    assert fn(x3).shape == (2, d) and d == 3 * 17

    fn, d = em.get_embedder("learned_fourier", input_dim=3,
                            key=jax.random.PRNGKey(0), learned_dim=24)
    assert fn(x3).shape == (2, d)

    with pytest.raises(ValueError, match="hashgrid|unsupported"):
        em.get_embedder("hashgrid")


def test_compute_psnr():
    from meshanything_tpu.training.losses import compute_psnr

    x = jnp.ones((4, 4))
    assert float(compute_psnr(x, x)) > 70  # identical -> eps-bounded max
    noisy = x + 0.1
    # mse = 0.01 -> psnr = 10*log10(2/0.01) ~ 23
    np.testing.assert_allclose(float(compute_psnr(x, noisy)), 23.0, atol=0.1)
