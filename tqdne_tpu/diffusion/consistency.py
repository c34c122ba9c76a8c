"""Consistency model training (Improved Techniques for Training Consistency
Models, arXiv 2310.14189) as pure JAX functions.

Functional parity with /root/reference/tqdne/consistency_model.py:
boundary-condition c_skip/c_out with the sigma - sigma_min offset
(l.68-74), the discretization-doubling schedule N(k): initial 10 ->
final 1280 (l.121-129), the erf-based lognormal timestep PMF (l.139-146),
teacher/student adjacent-sigma pairs with SHARED dropout randomness
(l.154-157, isolate_rng equivalent: both forwards get the same dropout
key), pseudo-Huber loss with c = 0.00054*sqrt(dim) (l.164-167), and
1/delta-sigma loss weights (l.169-171).

TPU-first difference: the reference's num_timesteps is a Python int that
changes during training (host-side recompute per step).  Here the sigma
grid sigma(i, N) is evaluated *analytically inside the jitted step* for a
traced N derived from state.step, over a fixed-size index space of
final_timesteps entries with masking — one compilation for the whole run,
no shape changes, no recompiles at each doubling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tqdne_tpu.utils import append_dims


@dataclasses.dataclass(frozen=True)
class ConsistencyConfig:
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    sigma_data: float = 0.5
    initial_timesteps: int = 10
    final_timesteps: int = 1280
    lognormal_mean: float = -1.1
    lognormal_std: float = 2.0
    huber_c_scale: float = 0.00054


def skip_scaling(cfg: ConsistencyConfig, sigma):
    return cfg.sigma_data**2 / ((sigma - cfg.sigma_min) ** 2 + cfg.sigma_data**2)


def out_scaling(cfg: ConsistencyConfig, sigma):
    return cfg.sigma_data * (sigma - cfg.sigma_min) / (cfg.sigma_data**2 + sigma**2) ** 0.5


def num_timesteps(cfg: ConsistencyConfig, step, max_steps: int):
    """N(k) discretization doubling (consistency_model.py:121-129); jit-safe.

    Returns the number of *grid points* = min(initial * 2^floor(k/s'), final) + 1.
    """
    doublings = jnp.floor(jnp.log2(jnp.floor(cfg.final_timesteps / cfg.initial_timesteps))) + 1
    # max_steps < doublings (smoke runs) would give s_prime = 0 -> step/0
    # = NaN poisoning the whole loss; clamp to 1 (doubling every step)
    s_prime = jnp.maximum(jnp.floor(max_steps / doublings), 1.0)
    n = cfg.initial_timesteps * 2 ** jnp.floor(step / s_prime)
    return jnp.minimum(n, cfg.final_timesteps) + 1


def sigma_grid_value(cfg: ConsistencyConfig, i, n):
    """sigma(i, N): the ascending Karras grid point i of an N-point grid,
    evaluated analytically (supports traced i and N)."""
    rho_inv = 1.0 / cfg.rho
    lo = cfg.sigma_min**rho_inv
    hi = cfg.sigma_max**rho_inv
    return (lo + i / (n - 1.0) * (hi - lo)) ** cfg.rho


def timestep_log_pmf(cfg: ConsistencyConfig, n, max_intervals: int):
    """Lognormal interval PMF over a fixed-size masked index space.

    p(i) ∝ erf((ln sigma_{i+1} - mu)/(s sqrt2)) - erf((ln sigma_i - mu)/(s sqrt2)),
    for i < N-1; -inf (masked) beyond.  Matches consistency_model.py:139-146.
    """
    i = jnp.arange(max_intervals, dtype=jnp.float32)
    s_lo = sigma_grid_value(cfg, i, n)
    s_hi = sigma_grid_value(cfg, i + 1.0, n)
    denom = cfg.lognormal_std * jnp.sqrt(2.0)
    pdf = jax.scipy.special.erf((jnp.log(s_hi) - cfg.lognormal_mean) / denom) - jax.scipy.special.erf(
        (jnp.log(s_lo) - cfg.lognormal_mean) / denom
    )
    valid = i < (n - 1.0)
    pdf = jnp.where(valid, jnp.maximum(pdf, 1e-30), 0.0)
    log_pmf = jnp.where(valid, jnp.log(pdf), -jnp.inf)
    return log_pmf - jax.scipy.special.logsumexp(log_pmf)


def consistency_forward(cfg: ConsistencyConfig, net_apply, x, sigma, cond_signal=None, cond=None):
    """f_theta(x, sigma) = c_skip * x + c_out * F(x, sigma)
    (consistency_model.py:63-79; the raw network receives sigma itself,
    not the EDM 0.25*log-sigma conditioning)."""
    ndim = x.ndim
    x_in = x if cond_signal is None else jnp.concatenate([x, cond_signal], axis=-1)
    out = net_apply(x_in, sigma, cond)
    return append_dims(out_scaling(cfg, sigma), ndim) * out + append_dims(
        skip_scaling(cfg, sigma), ndim
    ) * x


def consistency_loss(
    cfg: ConsistencyConfig,
    net_apply_teacher,
    net_apply_student,
    key: jax.Array,
    sample: jax.Array,
    step,
    max_steps: int,
    *,
    cond_signal=None,
    cond=None,
):
    """One training loss evaluation (consistency_model.py:115-173).

    ``net_apply_teacher`` must be gradient-blocked and use the SAME
    dropout randomness as the student (the caller passes the same dropout
    key to both, replacing torch's isolate_rng trick).
    """
    n = num_timesteps(cfg, step, max_steps)
    key_t, key_eps = jax.random.split(key)

    log_pmf = timestep_log_pmf(cfg, n, cfg.final_timesteps)
    timesteps = jax.random.categorical(key_t, log_pmf, shape=(sample.shape[0],))
    t = timesteps.astype(jnp.float32)

    sigma_teacher = sigma_grid_value(cfg, t, n)
    sigma_student = sigma_grid_value(cfg, t + 1.0, n)

    eps = jax.random.normal(key_eps, sample.shape, dtype=sample.dtype)
    x_teacher = sample + eps * append_dims(sigma_teacher, sample.ndim)
    x_student = sample + eps * append_dims(sigma_student, sample.ndim)

    target = jax.lax.stop_gradient(
        consistency_forward(cfg, net_apply_teacher, x_teacher, sigma_teacher, cond_signal, cond)
    )
    pred = consistency_forward(cfg, net_apply_student, x_student, sigma_student, cond_signal, cond)

    # pseudo-Huber with the paper's heuristic c (spatial size, matching
    # torch's prod(shape[2:]) = channels-last prod(shape[1:-1]))
    sample_dim = 1
    for s in sample.shape[1:-1]:
        sample_dim *= s
    c = cfg.huber_c_scale * jnp.sqrt(float(sample_dim))
    loss = jnp.sqrt((pred - target) ** 2 + c**2) - c

    weights = 1.0 / (sigma_student - sigma_teacher)
    return jnp.mean(loss * append_dims(weights, loss.ndim))


def consistency_sample(
    cfg: ConsistencyConfig,
    net_apply,
    key: jax.Array,
    shape: tuple[int, ...],
    sigmas=(1.0,),
    cond_signal=None,
    cond=None,
    noise: str = "auto",
):
    """1-step generation from sigma_max + optional refinement steps
    (consistency_model.py:81-106).

    ``noise`` selects the sampling convention:

    - ``"song"``: the multistep procedure of Song et al. 2023
      (arXiv 2303.01469, Alg. 1) — the initial draw is N(0, sigma_max^2)
      and each refinement re-noises with variance-matched GAUSSIAN noise
      sqrt(sigma^2 - sigma_min^2) * N(0, 1).  This matches the TRAINING
      input distribution x = sample + eps*sigma at every sigma, so the
      network is never evaluated off-distribution.
    - ``"reference"``: bit-for-bit the reference's conventions
      (consistency_model.py:97-104): the initial draw is N(0, 1)
      *unscaled* by sigma_max, and refinement adds UNIFORM [0,1) noise
      (``torch.rand_like``).  Both deviate from the paper.
    - ``"auto"`` (default): the measured-best convention, re-measured on
      each round's best student — currently "song" at EVERY NFE.
      History (docs/quality/README.md CD tables): on the SHORT
      (160-epoch, mu=0.95) round-4 student the reference's unscaled
      N(0, 1) init won FID at NFE 1 (39.2 vs song's 82.8) — an
      undertrained-student artifact.  On the round-5 LONG student
      (640 epochs, mu=0.999) the ordering FLIPPED decisively: song
      46.4 / 54.0 FID at NFE 1/2 vs reference 203.5 / 207.5 — the
      converged student expects the on-distribution sigma_max draw it
      was trained on, and the reference's conventions (unscaled init,
      uniform [0,1) refinement noise) are unambiguously a bug at every
      NFE, consistent with Song et al.'s procedure.

    ``tests/test_consistency_ddpm.py`` pins the auto table; re-measure
    (scripts/round4_distill_long.sh sweeps both conventions at NFE 1-2)
    before changing it.
    """
    if noise == "auto":
        noise = "song"
    if noise not in ("song", "reference"):
        raise ValueError(
            f"unknown noise mode {noise!r}; use 'auto', 'song' or 'reference'")
    key, sub = jax.random.split(key)
    eps = jax.random.normal(sub, shape)
    if noise == "song":
        eps = eps * cfg.sigma_max
    ones = jnp.ones((shape[0],))
    x = consistency_forward(cfg, net_apply, eps, ones * cfg.sigma_max, cond_signal, cond)
    for sigma in sigmas:
        key, sub = jax.random.split(key)
        if noise == "song":
            std = (max(sigma**2 - cfg.sigma_min**2, 0.0)) ** 0.5
            x = x + jax.random.normal(sub, shape) * std
        else:
            x = x + jax.random.uniform(sub, shape) * sigma
        x = consistency_forward(cfg, net_apply, x, ones * sigma, cond_signal, cond)
    return x


def make_consistency_steps(unet, tx, cfg: ConsistencyConfig, max_steps: int, *,
                           ema_decay=0.999, autoencoder=None,
                           device_representation=None, latent_moments=False):
    """(train_step, eval_step, sample_fn) factory in the tqdne_tpu.train
    step convention; RAdam is the reference optimizer choice.

    Latent mode (beyond reference — the reference trains consistency only
    on 1D envelopes, consistency_model.py): with ``autoencoder`` the model
    learns consistency in the frozen-VAE latent space (flagship 8x32x32)
    and ``sample_fn`` decodes — few-eval sampling at flagship quality.
    ``latent_moments`` / ``device_representation`` follow the EDM factory
    contract (train/steps.py:make_edm_steps): cached AE moments replace
    the in-step encode; the signal transform runs inside the jitted step.
    """
    from tqdne_tpu.train.state import TrainState, apply_updates

    latent = autoencoder is not None
    if latent_moments and not latent:
        raise ValueError("latent_moments requires an autoencoder (for decode)")

    def _sample_of(batch, key, ae_vars):
        if latent_moments:
            mean, log_std = batch["latent_mean"], batch["latent_log_std"]
            eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
            return mean + eps * jnp.exp(log_std)
        x = batch["signal"] if device_representation is None else device_representation(
            batch["waveform"])
        if latent:
            x = autoencoder.apply(ae_vars, x, method="encode", rngs={"sample": key})
        return x

    def _loss(params, batch, key, step, ae_vars):
        key_ae, key_drop, key_cm = jax.random.split(key, 3)
        sample = _sample_of(batch, key_ae, ae_vars)

        def teacher(x, sigma, c):
            return unet.apply(
                jax.lax.stop_gradient(params), x, sigma, c, train=True,
                rngs={"dropout": key_drop},
            )

        def student(x, sigma, c):
            return unet.apply(params, x, sigma, c, train=True, rngs={"dropout": key_drop})

        return consistency_loss(
            cfg, teacher, student, key_cm, sample, step, max_steps,
            cond_signal=batch.get("cond_signal"), cond=batch.get("cond"),
        )

    def train_step(state: TrainState, batch, key, ae_vars=None):
        loss, grads = jax.value_and_grad(_loss)(state.params, batch, key, state.step,
                                                ae_vars)
        new_state = apply_updates(state, grads, tx, ema_decay)
        return new_state, {"loss": loss}

    def eval_step(state: TrainState, batch, key, ae_vars=None):
        key_ae, key_cm = jax.random.split(key)
        sample = _sample_of(batch, key_ae, ae_vars)

        def net(x, sigma, c):
            return unet.apply(state.ema_params, x, sigma, c)

        loss = consistency_loss(
            cfg, net, net, key_cm, sample, state.step, max_steps,
            cond_signal=batch.get("cond_signal"), cond=batch.get("cond"),
        )
        return {"loss": loss}

    def sample_fn(params, key, shape, sigmas=(1.0,), cond=None, cond_signal=None,
                  ae_vars=None, cast_params=None, noise="auto"):
        """In latent mode ``shape`` is the LATENT shape and the output is
        decoded to signal space.  ``cast_params``: pre-cast the weights
        once (see make_edm_steps)."""
        if cast_params is not None:
            params = jax.tree_util.tree_map(lambda p: p.astype(cast_params), params)

        def net(x, sigma, c):
            return unet.apply(params, x, sigma, c)

        out = consistency_sample(cfg, net, key, shape, sigmas, cond_signal, cond,
                                 noise=noise)
        if latent:
            out = autoencoder.apply(ae_vars, out.astype(jnp.float32), method="decode")
        return out

    return train_step, eval_step, sample_fn
