"""EDM (Karras et al., "Elucidating the Design Space of Diffusion-Based
Generative Models") schedule and preconditioning math as pure JAX functions.

Functional capability parity with the reference hyperparameter object
(/root/reference/tqdne/edm.py:9-52): sigma schedule, loss weighting,
skip/out/in preconditioning scalings, noise conditioning, the Karras
rho-grid of sampling sigmas with an appended sigma=0, and the
stochastic-churn sigma-hat.  Everything here is shape-polymorphic,
jit-safe (no data-dependent Python control flow) and dtype-preserving,
so it can be traced once inside a pjit-ed train step or a lax.scan
sampling loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EDMConfig:
    """EDM hyperparameters (defaults follow the paper / reference)."""

    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    sigma_data: float = 0.5
    P_mean: float = -1.2
    P_std: float = 1.2
    S_churn: float = 40.0
    S_min: float = 0.05
    S_max: float = 50.0
    S_noise: float = 1.003


def sigma_from_normal(cfg: EDMConfig, eps: jax.Array) -> jax.Array:
    """Map a standard-normal draw to a training sigma: exp(eps*P_std + P_mean)."""
    return jnp.exp(eps * cfg.P_std + cfg.P_mean)


def loss_weight(cfg: EDMConfig, sigma: jax.Array) -> jax.Array:
    """lambda(sigma) = (sigma^2 + sigma_data^2) / (sigma * sigma_data)^2."""
    return (sigma**2 + cfg.sigma_data**2) / (sigma * cfg.sigma_data) ** 2


def skip_scaling(cfg: EDMConfig, sigma: jax.Array) -> jax.Array:
    return cfg.sigma_data**2 / (sigma**2 + cfg.sigma_data**2)


def out_scaling(cfg: EDMConfig, sigma: jax.Array) -> jax.Array:
    return sigma * cfg.sigma_data / (sigma**2 + cfg.sigma_data**2) ** 0.5


def in_scaling(cfg: EDMConfig, sigma: jax.Array) -> jax.Array:
    return 1.0 / (sigma**2 + cfg.sigma_data**2) ** 0.5


def noise_conditioning(cfg: EDMConfig, sigma: jax.Array) -> jax.Array:
    """The network's time input: 0.25 * ln(sigma)."""
    return 0.25 * jnp.log(sigma)


def sampling_sigmas(cfg: EDMConfig, num_steps: int, dtype=jnp.float32) -> jax.Array:
    """Karras rho-spaced sigma grid of length ``num_steps`` plus a final 0.

    sigma_i = (sigma_max^(1/rho) + i/(N-1) * (sigma_min^(1/rho) - sigma_max^(1/rho)))^rho
    """
    rho_inv = 1.0 / cfg.rho
    steps = jnp.arange(num_steps, dtype=dtype)
    sigmas = (
        cfg.sigma_max**rho_inv
        + steps / (num_steps - 1) * (cfg.sigma_min**rho_inv - cfg.sigma_max**rho_inv)
    ) ** cfg.rho
    return jnp.concatenate([sigmas, jnp.zeros((1,), dtype=dtype)])


def sigma_hat(cfg: EDMConfig, sigma: jax.Array, num_steps: int) -> jax.Array:
    """Stochastic-churn noise inflation: sigma * (1 + gamma) inside [S_min, S_max]."""
    gamma_max = min(cfg.S_churn / num_steps, 2**0.5 - 1)
    in_range = (sigma >= cfg.S_min) & (sigma <= cfg.S_max)
    gamma = jnp.where(in_range, gamma_max, 0.0)
    return sigma + gamma * sigma


def precondition(
    cfg: EDMConfig,
    net_apply,
    noisy: jax.Array,
    sigma: jax.Array,
    *,
    cond_signal: jax.Array | None = None,
    cond: jax.Array | None = None,
) -> jax.Array:
    """Preconditioned denoiser D(x, sigma) = c_skip*x + c_out*F(c_in*x, c_noise).

    ``net_apply(x, noise_cond, cond)`` is the raw network (channels-last);
    ``sigma`` is per-batch-element, shape [B].  An optional conditioning
    signal is concatenated on the channel (last) axis, mirroring the
    reference forward (/root/reference/tqdne/edm.py:105-113) which
    concatenates on the torch channel axis.
    """
    from tqdne_tpu.utils import append_dims

    ndim = noisy.ndim
    x_in = noisy * append_dims(in_scaling(cfg, sigma), ndim)
    if cond_signal is not None:
        x_in = jnp.concatenate([x_in, cond_signal], axis=-1)
    out = net_apply(x_in, noise_conditioning(cfg, sigma), cond)
    skip = append_dims(skip_scaling(cfg, sigma), ndim) * noisy
    return out * append_dims(out_scaling(cfg, sigma), ndim) + skip


def edm_loss(
    cfg: EDMConfig,
    net_apply,
    key: jax.Array,
    sample: jax.Array,
    *,
    cond_signal: jax.Array | None = None,
    cond: jax.Array | None = None,
) -> jax.Array:
    """EDM training loss: weighted MSE between D(x+n, sigma) and x.

    Per-batch-element sigma drawn from the lognormal proposal
    (/root/reference/tqdne/edm.py:115-134).  Returns a scalar.
    """
    from tqdne_tpu.utils import append_dims

    key_sigma, key_noise = jax.random.split(key)
    eps = jax.random.normal(key_sigma, (sample.shape[0],), dtype=sample.dtype)
    sigma = sigma_from_normal(cfg, eps)
    noise = jax.random.normal(key_noise, sample.shape, dtype=sample.dtype)
    noisy = sample + noise * append_dims(sigma, sample.ndim)
    pred = precondition(cfg, net_apply, noisy, sigma, cond_signal=cond_signal, cond=cond)
    sq = (pred - sample) ** 2
    w = append_dims(loss_weight(cfg, sigma), sq.ndim)
    return jnp.mean(sq * w)
