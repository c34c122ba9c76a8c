"""Consistency distillation (beyond reference): a consistency student
regressed onto a trained EDM teacher's PF-ODE trajectory
(diffusion/distillation.py; Song et al. 2023 §4).  The reference trains
consistency only from scratch (/root/reference/tqdne/consistency_model.py);
CD is the natural follow-on once the flagship EDM exists."""

import json

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tqdne_tpu.diffusion import edm as edm_lib
from tqdne_tpu.diffusion.consistency import ConsistencyConfig, consistency_forward
from tqdne_tpu.diffusion.distillation import (
    distillation_loss,
    edm_conditioned_net,
    make_distillation_steps,
    teacher_heun_step,
)
from tqdne_tpu.models.unet import UNet


def tiny_unet():
    return UNet(
        in_channels=4, out_channels=4, model_channels=8, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), conv_kernel_size=3,
        dims=2, cond_features=3, num_heads=1,
    )


@pytest.fixture(scope="module")
def setup():
    unet = tiny_unet()
    x = jnp.zeros((2, 8, 8, 4))
    params = unet.init(jax.random.key(0), x, jnp.zeros((2,)), jnp.zeros((2, 3)))
    teacher = unet.init(jax.random.key(1), x, jnp.zeros((2,)), jnp.zeros((2, 3)))
    return unet, params, teacher


def test_boundary_condition_identity(setup):
    """f(x, sigma_min) == x exactly: c_skip(sigma_min) = 1, c_out = 0 —
    the consistency boundary holds by construction for ANY weights."""
    unet, params, _ = setup
    cfg = ConsistencyConfig()
    net = edm_conditioned_net(unet, edm_lib.EDMConfig(), params)
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 4))
    sigma = jnp.full((2,), cfg.sigma_min)
    out = consistency_forward(cfg, net, x, sigma, None, jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_teacher_heun_step_linear_denoiser_exact():
    """For the linear denoiser D(x) = a*x the PF-ODE derivative is linear
    in x and sigma, so one Heun step (trapezoid rule on a polynomial of
    degree 1 in sigma) must integrate it to high accuracy vs a fine Euler
    reference."""
    a = 0.7
    edm_cfg = edm_lib.EDMConfig()

    def denoise(x, sigma, cond):
        return a * x

    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 1))
    hi, lo = jnp.full((2,), 2.0), jnp.full((2,), 1.6)
    out = teacher_heun_step(edm_cfg, denoise, x, hi, lo, None)

    # closed form: dx/dsigma = (1-a) x / sigma  =>  x * (lo/hi)^(1-a)
    exact = x * (1.6 / 2.0) ** (1 - a)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exact), rtol=1e-3)


def test_distillation_loss_finite_and_perfect_student_near_zero(setup):
    """The loss is finite for random weights, and ~0 when the student and
    target are the same EXACT consistency function of a zero teacher (the
    degenerate fixed point)."""
    unet, params, teacher = setup
    cm, ec = ConsistencyConfig(), edm_lib.EDMConfig()
    sample = jax.random.normal(jax.random.key(3), (4, 8, 8, 4))
    cond = jnp.zeros((4, 3))

    def teacher_denoise(x, sigma, c):
        def net(xx, t, cc):
            return unet.apply(teacher, xx, t, cc)

        return edm_lib.precondition(ec, net, x, sigma, cond=c)

    student = edm_conditioned_net(unet, ec, params)
    loss = distillation_loss(cm, ec, teacher_denoise, student, student,
                             jax.random.key(4), sample, 18, cond=cond)
    assert np.isfinite(float(loss))

    # exact fixed point: for the identity teacher D(x) = x every PF-ODE
    # trajectory is constant, whose consistency function is f(x, sigma) = x.
    # The boundary parameterization can express it in closed form:
    # F(x, sigma) = (1 - c_skip)/c_out * x  =>  pred == target, loss == 0.
    from tqdne_tpu.diffusion.consistency import out_scaling, skip_scaling
    from tqdne_tpu.utils import append_dims

    ident = lambda x, sigma, c: x

    def exact_student(x, sigma, c):
        num = 1.0 - skip_scaling(cm, sigma)
        den = out_scaling(cm, sigma)
        coef = jnp.where(den == 0, 0.0, num / jnp.where(den == 0, 1.0, den))
        return append_dims(coef, x.ndim) * x

    loss0 = distillation_loss(cm, ec, ident, exact_student, exact_student,
                              jax.random.key(4), sample, 18, cond=cond)
    assert float(loss0) < 1e-5


def test_train_steps_decrease_loss(setup):
    """A few distillation steps on a fixed batch decrease the loss (the
    student moves toward the frozen teacher's trajectory map)."""
    import optax

    from tqdne_tpu.train.state import TrainState

    unet, params, teacher = setup
    tx = optax.adam(1e-3)
    train_step, eval_step, sample_fn = make_distillation_steps(unet, tx, n_grid=8)
    state = TrainState.create(params, tx)
    batch = {
        "signal": jax.random.normal(jax.random.key(5), (8, 8, 8, 4)) * 0.5,
        "cond": jnp.zeros((8, 3)),
    }
    step = jax.jit(train_step)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.key(7), teacher_params=teacher)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    ev = eval_step(state, batch, jax.random.key(8), teacher_params=teacher)
    assert np.isfinite(float(ev["loss"]))

    out = sample_fn(state.ema_params, jax.random.key(9), (2, 8, 8, 4),
                    sigmas=(1.0,), cond=jnp.zeros((2, 3)))
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_latent_distill_chain(tmp_path):
    """Tiny AE -> tiny latent-EDM teacher -> cached-moments distillation ->
    generate via --solver distill -> finite waveforms."""
    from tqdne_tpu import configs
    from tqdne_tpu.cli import train as train_cli

    wd = str(tmp_path)
    train_cli.main([
        "autoencoder", "--workdir", wd, "--synthetic", "24", "--max-epochs", "1",
        "-b", "8", "--tiny", "--dtype", "f32",
    ])
    from tqdne_tpu.cli import precompute_latents as pre

    pre.main(["--workdir", wd, "--config", "latent_edm", "-b", "8",
              "--tiny", "--dtype", "f32"])
    train_cli.main([
        "latent_edm", "--workdir", wd, "--max-epochs", "1", "-b", "8",
        "--eval-every", "99", "--tiny", "--dtype", "f32", "--cached-latents",
    ])
    train_cli.main([
        "latent_distill", "--workdir", wd, "--max-epochs", "1", "-b", "8",
        "--eval-every", "99", "--tiny", "--dtype", "f32", "--cached-latents",
    ])
    config = configs.LatentSpectrogramConfig(workdir=wd)
    mfile = config.outputdir / "Latent-Distill-32x32x8-LogSpectrogram" / "metrics.jsonl"
    recs = [json.loads(l) for l in mfile.read_text().splitlines()]
    losses = [r["training/loss"] for r in recs if "training/loss" in r]
    assert losses and np.isfinite(losses).all()

    from tqdne_tpu.cli import generate_waveforms as gen

    out = tmp_path / "gen_cd.h5"
    gen.main([
        "--config", "latent_edm", "--solver", "distill", "--workdir", wd,
        "--outfile", str(out), "--num_samples", "2", "--hypocentral_distance", "50",
        "--magnitude", "5.5", "--vs30", "400", "--hypocentre_depth", "20",
        "--azimuthal_gap", "100", "--batch_size", "2", "--tiny", "--dtype", "f32",
    ])
    with h5py.File(out) as f:
        wf = f["waveforms"][:]
        assert wf.shape == (2, 3, 4064)
        assert np.isfinite(wf).all()
