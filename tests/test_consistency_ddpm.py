"""Consistency-model and DDPM capability tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tqdne_tpu.diffusion import consistency as cm
from tqdne_tpu.diffusion import ddpm
from tqdne_tpu.models.unet import UNet
from tqdne_tpu.train.state import TrainState, make_optimizer

CFG = cm.ConsistencyConfig()


def test_boundary_condition_at_sigma_min():
    """f(x, sigma_min) must equal x exactly (c_skip=1, c_out=0)."""
    s = jnp.float32(CFG.sigma_min)
    assert float(cm.skip_scaling(CFG, s)) == pytest.approx(1.0)
    assert float(cm.out_scaling(CFG, s)) == pytest.approx(0.0)


def test_num_timesteps_doubling_schedule():
    """N(k): 10 -> 1280 by doubling over the training run (cm paper)."""
    max_steps = 800
    # log2(floor(1280/10)) + 1 = 8 stages; s' = floor(800/8) = 100
    n0 = float(cm.num_timesteps(CFG, jnp.int32(0), max_steps))
    assert n0 == 11  # initial 10 + 1
    n_mid = float(cm.num_timesteps(CFG, jnp.int32(100), max_steps))
    assert n_mid == 21  # doubled once
    n_end = float(cm.num_timesteps(CFG, jnp.int32(799), max_steps))
    assert n_end == 1281  # capped at final + 1


def test_sigma_grid_endpoints():
    n = jnp.float32(11.0)
    assert float(cm.sigma_grid_value(CFG, jnp.float32(0.0), n)) == pytest.approx(0.002, rel=1e-4)
    assert float(cm.sigma_grid_value(CFG, jnp.float32(10.0), n)) == pytest.approx(80.0, rel=1e-4)


def test_timestep_pmf_masks_beyond_n():
    n = jnp.float32(11.0)
    log_pmf = cm.timestep_log_pmf(CFG, n, CFG.final_timesteps)
    assert log_pmf.shape == (1280,)
    assert np.all(np.isfinite(np.asarray(log_pmf[:10])))
    assert np.all(np.asarray(log_pmf[10:]) == -np.inf)
    # normalized over the valid region
    p = np.exp(np.asarray(log_pmf[:10], np.float64))
    assert p.sum() == pytest.approx(1.0, rel=1e-3)


def test_consistency_train_step_runs_and_is_finite():
    unet = UNet(
        in_channels=3, out_channels=3, model_channels=16, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), conv_kernel_size=5,
        dims=1, cond_features=5, dropout=0.1,
    )
    tx = make_optimizer("radam", 1e-3)
    train_step, eval_step, sample_fn = cm.make_consistency_steps(unet, tx, CFG, max_steps=800)

    x = jnp.zeros((1, 128, 3))
    params = unet.init(jax.random.key(0), x, jnp.zeros((1,)), jnp.zeros((1, 5)))
    state = TrainState.create(params, tx)
    batch = {
        "signal": jax.random.normal(jax.random.key(1), (4, 128, 3)) * 0.5,
        "cond": jnp.zeros((4, 5)),
    }
    step = jax.jit(train_step)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # single jit covers the whole doubling schedule: jump the step counter
    state_late = state.replace(step=jnp.int32(750))
    state_late, metrics = step(state_late, batch, jax.random.key(99))
    assert np.isfinite(float(metrics["loss"]))

    out = sample_fn(state.ema_params, jax.random.key(5), (2, 128, 3),
                    sigmas=(1.0,), cond=jnp.zeros((2, 5)))
    assert out.shape == (2, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_consistency_sample_noise_conventions():
    """'song' feeds the net on-distribution inputs (N(0, sigma_max^2) init,
    variance-matched Gaussian refinement); 'reference' reproduces the
    reference's unscaled init + uniform [0,1) refinement
    (consistency_model.py:97-104)."""
    seen = []

    def spy_net(x, sigma, cond):
        seen.append((np.asarray(x), float(np.asarray(sigma)[0])))
        return jnp.zeros_like(x)

    shape = (4, 2048, 1)
    for mode in ("song", "reference"):
        seen.clear()
        cm.consistency_sample(CFG, spy_net, jax.random.key(0), shape,
                              sigmas=(1.0,), noise=mode)
        (x0, s0), (x1, s1) = seen
        assert s0 == pytest.approx(CFG.sigma_max)
        assert s1 == pytest.approx(1.0)
        if mode == "song":
            # init ~ N(0, sigma_max^2); refinement of the zero output
            # ~ N(0, 1 - sigma_min^2) -> std ~1, mean ~0
            assert x0.std() == pytest.approx(CFG.sigma_max, rel=0.05)
            assert x1.std() == pytest.approx((1 - CFG.sigma_min**2) ** 0.5, rel=0.05)
            assert abs(x1.mean()) < 0.05
        else:
            # init unscaled; uniform refinement has mean 1/2, std 1/sqrt(12)
            assert x0.std() == pytest.approx(1.0, rel=0.05)
            assert x1.mean() == pytest.approx(0.5, rel=0.1)
            assert x1.std() == pytest.approx(12**-0.5, rel=0.05)

    with pytest.raises(ValueError, match="noise mode"):
        cm.consistency_sample(CFG, spy_net, jax.random.key(0), shape, noise="bogus")


def test_consistency_sample_auto_convention_table():
    """Pins the measured-best defaults (VERDICT r4 weak #3 + round-5
    re-measurement, docs/quality CD tables): 'auto' resolves to 'song'
    at EVERY NFE.  The round-4 short student's NFE-1 preference for the
    reference convention (39.2 vs 82.8) was an undertrained-student
    artifact — on the converged 640-epoch student the ordering flipped
    decisively (song 46.4/54.0 vs reference 203.5/207.5 at NFE 1/2)."""

    def net(x, sigma, cond):
        return 0.5 * x

    shape = (4, 256, 1)
    # NFE 1: auto == song, != reference
    out_auto = cm.consistency_sample(CFG, net, jax.random.key(7), shape,
                                     sigmas=(), noise="auto")
    out_ref = cm.consistency_sample(CFG, net, jax.random.key(7), shape,
                                    sigmas=(), noise="reference")
    out_song = cm.consistency_sample(CFG, net, jax.random.key(7), shape,
                                     sigmas=(), noise="song")
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_song))
    assert not np.allclose(np.asarray(out_auto), np.asarray(out_ref))

    # NFE 2: auto == song, != reference
    out_auto2 = cm.consistency_sample(CFG, net, jax.random.key(7), shape,
                                      sigmas=(1.0,), noise="auto")
    out_song2 = cm.consistency_sample(CFG, net, jax.random.key(7), shape,
                                      sigmas=(1.0,), noise="song")
    out_ref2 = cm.consistency_sample(CFG, net, jax.random.key(7), shape,
                                     sigmas=(1.0,), noise="reference")
    np.testing.assert_array_equal(np.asarray(out_auto2), np.asarray(out_song2))
    assert not np.allclose(np.asarray(out_auto2), np.asarray(out_ref2))


# ---------------------------------------------------------------------------


def test_ddpm_noising_snr_endpoints():
    cfg = ddpm.DDPMConfig()
    acp = np.asarray(ddpm.alphas_cumprod(cfg))
    assert acp[0] == pytest.approx(1 - 1e-4, rel=1e-5)
    assert acp[-1] < 5e-5  # nearly pure noise at T
    x0 = jnp.ones((2, 16, 1))
    noise = jnp.zeros_like(x0)
    out = ddpm.add_noise(cfg, x0, noise, jnp.array([0, 999]))
    np.testing.assert_allclose(np.asarray(out[0]), np.sqrt(acp[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.sqrt(acp[-1]), rtol=1e-3)


def test_ddpm_step_posterior_mean():
    """At x_t = sqrt(acp_t) x0 with a perfect eps-prediction of 0, the
    posterior mean recovers the clean trajectory."""
    cfg = ddpm.DDPMConfig(clip_sample=False)
    x0 = jnp.full((1, 4, 1), 0.5)
    t = jnp.int32(500)
    acp = ddpm.alphas_cumprod(cfg)
    x_t = jnp.sqrt(acp[t]) * x0
    out = ddpm.ddpm_step(cfg, jnp.zeros_like(x0), t, x_t, jax.random.key(0))
    acp_prev = np.asarray(acp)[499]
    # mean should equal sqrt(acp_{t-1}) * x0_implied where x0_implied = x_t/sqrt(acp_t)...
    # with eps=0, x0_pred = x_t/sqrt(acp_t) = x0 exactly
    want_mean_coef = (
        np.sqrt(acp_prev) * np.asarray(ddpm.betas(cfg))[500] / (1 - np.asarray(acp)[500])
        + np.sqrt(1 - np.asarray(ddpm.betas(cfg))[500])
        * (1 - acp_prev) / (1 - np.asarray(acp)[500]) * np.sqrt(np.asarray(acp)[500])
    )
    got = float(out.mean())
    # noise is added (t>0) so compare loosely around the deterministic mean
    assert abs(got - 0.5 * want_mean_coef) < 0.2


def test_ddpm_train_and_tiny_sample():
    cfg = ddpm.DDPMConfig(num_train_timesteps=20)
    unet = UNet(
        in_channels=3, out_channels=3, model_channels=16, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), conv_kernel_size=5,
        dims=1, cond_features=5,
    )
    tx = make_optimizer("adamw", 1e-3)
    train_step, eval_step, sample_fn = ddpm.make_ddpm_steps(unet, tx, cfg)
    x = jnp.zeros((1, 64, 3))
    params = unet.init(jax.random.key(0), x, jnp.zeros((1,)), jnp.zeros((1, 5)))
    state = TrainState.create(params, tx)
    batch = {"signal": jax.random.normal(jax.random.key(1), (4, 64, 3)), "cond": jnp.zeros((4, 5))}
    step = jax.jit(train_step)
    for i in range(3):
        state, metrics = step(state, batch, jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    out = sample_fn(state.ema_params, jax.random.key(9), (2, 64, 3), cond=jnp.zeros((2, 5)))
    assert out.shape == (2, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
