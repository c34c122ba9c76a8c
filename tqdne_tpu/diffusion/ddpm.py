"""DDPM diffusion (legacy capability) as pure JAX functions.

The reference's LightningDDMP (/root/reference/tqdne/diffusion.py) wraps
the diffusers DDPMScheduler (epsilon- or sample-prediction, iterative
ancestral sampling).  That module is dead code in the reference (not
wired to any script, diffusers not in its deps) but is a declared
capability, so it is preserved here self-contained: linear or
squared-cosine beta schedule, q(x_t|x_0) noising, the fixed-small
posterior step with x0-clipping, MSE training loss, and a lax.scan
ancestral sampler (the reference loops in Python per timestep).

Scheduler math matches diffusers' defaults: T=1000, beta linear
1e-4..0.02, variance_type="fixed_small", clip_sample=True.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tqdne_tpu.utils import append_dims


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 1e-4
    beta_end: float = 0.02
    beta_schedule: str = "linear"  # "linear" | "squaredcos_cap_v2"
    clip_sample: bool = True
    prediction_type: str = "epsilon"  # "epsilon" | "sample"


def betas(cfg: DDPMConfig) -> jnp.ndarray:
    t = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return jnp.linspace(cfg.beta_start, cfg.beta_end, t, dtype=jnp.float32)
    if cfg.beta_schedule == "squaredcos_cap_v2":
        i = jnp.arange(t, dtype=jnp.float32)
        f = lambda x: jnp.cos((x / t + 0.008) / 1.008 * jnp.pi / 2) ** 2  # noqa: E731
        return jnp.clip(1.0 - f(i + 1) / f(i), 0.0, 0.999)
    raise ValueError(cfg.beta_schedule)


def alphas_cumprod(cfg: DDPMConfig) -> jnp.ndarray:
    return jnp.cumprod(1.0 - betas(cfg))


def add_noise(cfg: DDPMConfig, x0, noise, t):
    """q(x_t | x_0) forward noising."""
    acp = alphas_cumprod(cfg)[t]
    nd = x0.ndim
    return append_dims(jnp.sqrt(acp), nd) * x0 + append_dims(jnp.sqrt(1 - acp), nd) * noise


def ddpm_loss(cfg: DDPMConfig, net_apply, key, sample, *, cond_signal=None, cond=None):
    """MSE on epsilon (or x0) prediction (diffusion.py:88-109)."""
    key_t, key_n = jax.random.split(key)
    b = sample.shape[0]
    t = jax.random.randint(key_t, (b,), 0, cfg.num_train_timesteps)
    noise = jax.random.normal(key_n, sample.shape, sample.dtype)
    noisy = add_noise(cfg, sample, noise, t)
    x_in = noisy if cond_signal is None else jnp.concatenate([cond_signal, noisy], axis=-1)
    pred = net_apply(x_in, t.astype(jnp.float32), cond)
    target = noise if cfg.prediction_type == "epsilon" else sample
    return jnp.mean((pred - target) ** 2)


def ddpm_step(cfg: DDPMConfig, model_out, t, x_t, key):
    """One ancestral posterior step p(x_{t-1} | x_t) (fixed_small variance)."""
    bet = betas(cfg)
    acp = alphas_cumprod(cfg)
    acp_prev = jnp.concatenate([jnp.ones((1,)), acp[:-1]])

    beta_t = bet[t]
    acp_t = acp[t]
    acp_tm1 = acp_prev[t]
    alpha_t = 1.0 - beta_t

    if cfg.prediction_type == "epsilon":
        x0 = (x_t - jnp.sqrt(1 - acp_t) * model_out) / jnp.sqrt(acp_t)
    else:
        x0 = model_out
    if cfg.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)

    coef_x0 = jnp.sqrt(acp_tm1) * beta_t / (1 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1 - acp_tm1) / (1 - acp_t)
    mean = coef_x0 * x0 + coef_xt * x_t

    var = jnp.clip((1 - acp_tm1) / (1 - acp_t) * beta_t, a_min=1e-20)
    noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    return mean + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise


def ddpm_sample(cfg: DDPMConfig, net_apply, key, shape, *, cond_signal=None, cond=None):
    """Full T-step ancestral sampling as one lax.scan (diffusion.py:67-79
    runs this as a host loop with a tqdm bar)."""
    key_init, key_loop = jax.random.split(key)
    x = jax.random.normal(key_init, shape)
    ts = jnp.arange(cfg.num_train_timesteps - 1, -1, -1)
    keys = jax.random.split(key_loop, cfg.num_train_timesteps)

    def body(x, inp):
        t, k = inp
        x_in = x if cond_signal is None else jnp.concatenate([cond_signal, x], axis=-1)
        pred = net_apply(x_in, jnp.full((shape[0],), t, jnp.float32), cond)
        return ddpm_step(cfg, pred, t, x, k), None

    x, _ = jax.lax.scan(body, x, (ts, keys))
    return x


def make_ddpm_steps(unet, tx, cfg: DDPMConfig = DDPMConfig(), *, ema_decay: float = 0.999):
    from tqdne_tpu.train.state import TrainState, apply_updates

    def _loss(params, batch, key, train):
        key_drop, key_loss = jax.random.split(key)

        def net(x, t, c):
            rngs = {"dropout": key_drop} if train else None
            return unet.apply(params, x, t, c, train=train, rngs=rngs)

        return ddpm_loss(
            cfg, net, key_loss, batch["signal"],
            cond_signal=batch.get("cond_signal"), cond=batch.get("cond"),
        )

    def train_step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(_loss)(state.params, batch, key, True)
        return apply_updates(state, grads, tx, ema_decay), {"loss": loss}

    def eval_step(state: TrainState, batch, key):
        return {"loss": _loss(state.ema_params, batch, key, False)}

    def sample_fn(params, key, shape, cond=None, cond_signal=None):
        def net(x, t, c):
            return unet.apply(params, x, t, c)

        return ddpm_sample(cfg, net, key, shape, cond_signal=cond_signal, cond=cond)

    return train_step, eval_step, sample_fn
