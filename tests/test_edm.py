"""EDM schedule / preconditioning math against closed-form values.

The reference formulas live at /root/reference/tqdne/edm.py:9-52; we test
against independently computed numpy ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tqdne_tpu.diffusion import edm


CFG = edm.EDMConfig()


def test_sigma_from_normal():
    eps = jnp.array([-1.0, 0.0, 2.0])
    expected = np.exp(np.array([-1.0, 0.0, 2.0]) * 1.2 - 1.2)
    np.testing.assert_allclose(edm.sigma_from_normal(CFG, eps), expected, rtol=1e-5)


def test_preconditioning_identities():
    """EDM boundary conditions: c_skip^2 + (c_out/sigma_data * ...)."""
    sigma = jnp.array([0.002, 0.5, 80.0])
    c_skip = edm.skip_scaling(CFG, sigma)
    c_out = edm.out_scaling(CFG, sigma)
    c_in = edm.in_scaling(CFG, sigma)
    # closed forms
    sd = CFG.sigma_data
    np.testing.assert_allclose(c_skip, sd**2 / (sigma**2 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(c_out, sigma * sd / np.sqrt(sigma**2 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(c_in, 1 / np.sqrt(sigma**2 + sd**2), rtol=1e-5)
    # variance-preserving identity from the EDM paper: c_skip^2*(s^2+sd^2) + c_out^2 = sd^2
    lhs = c_skip**2 * (sigma**2 + sd**2) + c_out**2
    np.testing.assert_allclose(lhs, np.full(3, sd**2), rtol=1e-5)


def test_loss_weight_inverse_of_outscaling():
    """lambda(sigma) == 1 / c_out(sigma)^2 (EDM paper, eq. 8)."""
    sigma = jnp.array([0.01, 0.3, 5.0, 79.0])
    np.testing.assert_allclose(
        edm.loss_weight(CFG, sigma), 1.0 / edm.out_scaling(CFG, sigma) ** 2, rtol=1e-5
    )


def test_sampling_sigmas_grid():
    sigmas = np.asarray(edm.sampling_sigmas(CFG, 25))
    assert sigmas.shape == (26,)
    assert sigmas[0] == pytest.approx(80.0, rel=1e-5)
    assert sigmas[24] == pytest.approx(0.002, rel=1e-4)
    assert sigmas[25] == 0.0
    assert np.all(np.diff(sigmas) < 0)  # strictly decreasing
    # spot-check the rho=7 interpolation at i=12
    rho_inv = 1 / 7.0
    expected = (80**rho_inv + 12 / 24 * (0.002**rho_inv - 80**rho_inv)) ** 7.0
    assert sigmas[12] == pytest.approx(expected, rel=1e-5)


def test_sigma_hat_churn_gating():
    n = 25
    gamma = min(CFG.S_churn / n, 2**0.5 - 1)
    # inside [S_min, S_max] -> inflated
    assert edm.sigma_hat(CFG, jnp.float32(1.0), n) == pytest.approx(1 + gamma, rel=1e-6)
    # outside -> unchanged
    assert edm.sigma_hat(CFG, jnp.float32(0.01), n) == pytest.approx(0.01, rel=1e-6)
    assert edm.sigma_hat(CFG, jnp.float32(60.0), n) == pytest.approx(60.0, rel=1e-6)


def test_noise_conditioning():
    np.testing.assert_allclose(
        edm.noise_conditioning(CFG, jnp.array([1.0, np.e**4])), [0.0, 1.0], atol=1e-5
    )


def test_precondition_with_identity_net():
    """With F(x) = 0 the denoiser must return c_skip * x."""
    cfg = CFG
    x = jnp.ones((2, 8, 3))
    sigma = jnp.array([0.5, 2.0])
    out = edm.precondition(cfg, lambda x, nc, c: jnp.zeros_like(x), x, sigma)
    expected = np.asarray(edm.skip_scaling(cfg, sigma))[:, None, None] * np.asarray(x)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_edm_loss_perfect_denoiser_near_zero():
    """A denoiser that returns the clean sample exactly gives zero loss."""
    cfg = CFG
    sample = jax.random.normal(jax.random.key(0), (4, 16, 3)) * cfg.sigma_data

    def perfect_net(x_in, noise_cond, cond):
        # invert the preconditioning: F = (sample - c_skip*noisy)/c_out.
        sigma = jnp.exp(noise_cond / 0.25)
        noisy = x_in / edm.in_scaling(cfg, sigma)[:, None, None]
        return (
            sample - edm.skip_scaling(cfg, sigma)[:, None, None] * noisy
        ) / edm.out_scaling(cfg, sigma)[:, None, None]

    loss = edm.edm_loss(cfg, perfect_net, jax.random.key(1), sample)
    assert float(loss) < 1e-8


def test_edm_loss_is_finite_and_positive():
    loss = edm.edm_loss(
        CFG,
        lambda x, nc, c: jnp.zeros_like(x),
        jax.random.key(0),
        jax.random.normal(jax.random.key(2), (8, 32, 3)),
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
