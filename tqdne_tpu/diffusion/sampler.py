"""EDM samplers as single-trace `lax.scan` loops.

The reference runs a Python loop of 2N-1 UNet forwards with float64
accumulators on the host (/root/reference/tqdne/edm.py:171-230).  On TPU
the whole sigma schedule is scanned inside one jit: the per-step
"skip the 2nd-order correction on the last step" branch becomes a
`lax.cond` on sigma_next > 0 (exactly equivalent, since the appended
final sigma is the only zero), and the accumulator dtype is a parameter
(f32 by default — TPU has no fast f64; enable jax_enable_x64 and pass
jnp.float64 for the parity configuration).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tqdne_tpu.diffusion.edm import EDMConfig, sampling_sigmas, sigma_hat

# DenoiseFn(x, sigma[B]) -> denoised x; closes over params / conditioning.
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def heun_deterministic(
    denoise_fn: DenoiseFn,
    eps: jax.Array,
    sigmas: jax.Array,
    *,
    model_dtype=jnp.float32,
) -> jax.Array:
    """Deterministic 2nd-order Heun sampling (edm.py:171-196 equivalent).

    ``eps`` is already scaled by sigmas[0].  ``sigmas`` has length N+1 and
    ends with 0.  Runs 2N-1 network evaluations.
    """
    acc_dtype = eps.dtype
    batch = eps.shape[0]

    def denoise(x, sigma):
        s = jnp.full((batch,), sigma, dtype=model_dtype)
        return denoise_fn(x.astype(model_dtype), s).astype(acc_dtype)

    def body(x, sig_pair):
        sigma, sigma_next = sig_pair
        pred = denoise(x, sigma)
        d_cur = (x - pred) / sigma
        x_euler = x + d_cur * (sigma_next - sigma)

        def second_order(x_euler):
            pred_next = denoise(x_euler, sigma_next)
            d_prime = (x_euler - pred_next) / sigma_next
            return x + (sigma_next - sigma) * (0.5 * d_cur + 0.5 * d_prime)

        x_next = jax.lax.cond(sigma_next > 0, second_order, lambda xe: xe, x_euler)
        return x_next, None

    sig_pairs = (sigmas[:-1].astype(acc_dtype), sigmas[1:].astype(acc_dtype))
    x, _ = jax.lax.scan(body, eps, sig_pairs)
    return x


def heun_stochastic(
    denoise_fn: DenoiseFn,
    key: jax.Array,
    eps: jax.Array,
    sigmas: jax.Array,
    cfg: EDMConfig,
    *,
    model_dtype=jnp.float32,
) -> jax.Array:
    """Stochastic churn sampler (edm.py:198-230 equivalent)."""
    acc_dtype = eps.dtype
    batch = eps.shape[0]
    num_steps = sigmas.shape[0] - 1

    def denoise(x, sigma):
        s = jnp.full((batch,), sigma, dtype=model_dtype)
        return denoise_fn(x.astype(model_dtype), s).astype(acc_dtype)

    def body(x, inputs):
        sigma, sigma_next, step_key = inputs
        s_hat = sigma_hat(cfg, sigma, num_steps).astype(acc_dtype)
        noise = jax.random.normal(step_key, x.shape, dtype=acc_dtype) * cfg.S_noise
        churn = jnp.sqrt(jnp.maximum(s_hat**2 - sigma**2, 0.0))
        x_hat = x + noise * churn

        pred_hat = denoise(x_hat, s_hat)
        d_cur = (x_hat - pred_hat) / s_hat
        x_euler = x_hat + d_cur * (sigma_next - s_hat)

        def second_order(x_euler):
            pred_next = denoise(x_euler, sigma_next)
            d_prime = (x_euler - pred_next) / sigma_next
            return x_hat + (sigma_next - s_hat) * (0.5 * d_cur + 0.5 * d_prime)

        x_next = jax.lax.cond(sigma_next > 0, second_order, lambda xe: xe, x_euler)
        return x_next, None

    keys = jax.random.split(key, num_steps)
    sig_pairs = (sigmas[:-1].astype(acc_dtype), sigmas[1:].astype(acc_dtype), keys)
    x, _ = jax.lax.scan(body, eps, sig_pairs)
    return x


def dpmpp_2m(
    denoise_fn: DenoiseFn,
    eps: jax.Array,
    sigmas: jax.Array,
    *,
    model_dtype=jnp.float32,
) -> jax.Array:
    """DPM-Solver++(2M) for the EDM probability-flow ODE (beyond reference).

    Second-order *multistep* solver (Lu et al., arXiv 2211.01095, data-
    prediction variant for the VE/EDM parameterization): reuses the
    previous step's denoiser output instead of Heun's second evaluation,
    so N steps cost N network evaluations instead of Heun's 2N-1 —
    ~2x sampler throughput at the same step count with comparable ODE
    accuracy (both are order 2).  Deterministic; integrates the same ODE
    as heun_deterministic (they converge to each other as N grows — see
    tests/test_sampler.py).
    """
    acc_dtype = eps.dtype
    batch = eps.shape[0]

    def denoise(x, sigma):
        s = jnp.full((batch,), sigma, dtype=model_dtype)
        return denoise_fn(x.astype(model_dtype), s).astype(acc_dtype)

    tiny = jnp.asarray(jnp.finfo(acc_dtype).tiny, acc_dtype)

    def lam(sigma):  # lambda = -log sigma; sigma=0 handled via clamp
        return -jnp.log(jnp.maximum(sigma, tiny))

    def body(carry, sig_pair):
        x, denoised_prev, h_prev = carry
        sigma, sigma_next = sig_pair
        denoised = denoise(x, sigma)
        h = lam(sigma_next) - lam(sigma)
        # 2M correction: extrapolate the denoiser with the previous output.
        # First step has no history (h_prev <= 0 flags it) -> plain DPM++(1).
        r = h_prev / h
        # no history on the first step; no correction on the final sigma=0
        # step (h -> inf there, the coefficient would diverge — same
        # special case as k-diffusion's sample_dpmpp_2m)
        use_hist = (h_prev > 0) & (sigma_next > 0)
        coef = jnp.where(use_hist, 1.0 / (2.0 * jnp.maximum(r, tiny)), 0.0)
        denoised_d = (1.0 + coef) * denoised - coef * denoised_prev
        ratio = sigma_next / jnp.maximum(sigma, tiny)
        x_next = ratio * x - jnp.expm1(-h) * denoised_d
        return (x_next, denoised, h), None

    sig_pairs = (sigmas[:-1].astype(acc_dtype), sigmas[1:].astype(acc_dtype))
    init = (eps, jnp.zeros_like(eps), jnp.asarray(-1.0, acc_dtype))
    (x, _, _), _ = jax.lax.scan(body, init, sig_pairs)
    return x


def sample(
    denoise_fn: DenoiseFn,
    key: jax.Array,
    shape: tuple[int, ...],
    cfg: EDMConfig = EDMConfig(),
    *,
    num_steps: int = 25,
    deterministic: bool = True,
    acc_dtype=jnp.float32,
    model_dtype=jnp.float32,
    solver: str = "heun",
    eps_sharding=None,
) -> jax.Array:
    """Draw samples by integrating the EDM probability-flow ODE.

    jit-safe end to end; equivalent to the dispatch in edm.py:146-169
    (minus the latent encode/decode, which the latent model composes
    around this).  solver: "heun" (reference semantics, 2N-1 evals) or
    "dpmpp_2m" (N evals, beyond reference; deterministic only).

    ``eps_sharding``: optional sharding constraint on the initial noise —
    seeds GSPMD's layout propagation so the whole scan runs with that
    activation layout (e.g. parallel.spatial's batch-on-data /
    spatial-axis-on-model serving layout).
    """
    sigmas = sampling_sigmas(cfg, num_steps, dtype=acc_dtype)
    key_eps, key_churn = jax.random.split(key)
    eps = jax.random.normal(key_eps, shape, dtype=acc_dtype) * sigmas[0]
    if eps_sharding is not None:
        eps = jax.lax.with_sharding_constraint(eps, eps_sharding)
    if solver == "dpmpp_2m":
        if not deterministic:
            raise ValueError("dpmpp_2m is a deterministic solver")
        return dpmpp_2m(denoise_fn, eps, sigmas, model_dtype=model_dtype)
    if solver != "heun":
        raise ValueError(f"unknown solver {solver!r}; use 'heun' or 'dpmpp_2m'")
    if deterministic:
        return heun_deterministic(denoise_fn, eps, sigmas, model_dtype=model_dtype)
    return heun_stochastic(denoise_fn, key_churn, eps, sigmas, cfg, model_dtype=model_dtype)
