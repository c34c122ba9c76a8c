"""THE parity test (BASELINE.md north star): with shared weights, our
channels-last flax UNet and scan-based Heun sampler reproduce the
reference torch model to 1e-4 relative tolerance.

The reference UNet (/root/reference/tqdne/unet.py) imports only torch —
we instantiate it directly (reading the public reference for testing is
not code reuse), convert its random-init state_dict with
tqdne_tpu.utils.torch_convert, and compare:
  1. single forward passes (1D and 2D, conditioned),
  2. a full deterministic Heun sampling run with identical injected
     noise and float64 accumulators on both sides (edm.py:146-196
     semantics).
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tqdne.unet import UNetModel  # noqa: E402  (reference, torch-only imports)

from tqdne_tpu.diffusion import edm as edm_lib  # noqa: E402
from tqdne_tpu.diffusion import sampler as sampler_lib  # noqa: E402
from tqdne_tpu.models.unet import UNet  # noqa: E402
from tqdne_tpu.utils.torch_convert import convert_unet  # noqa: E402

CFG_1D = dict(
    in_channels=3,
    out_channels=3,
    model_channels=32,
    num_res_blocks=1,
    attention_resolutions=(2,),
    dropout=0.0,
    channel_mult=(1, 2),
    conv_kernel_size=5,
    dims=1,
    cond_features=5,
    num_heads=2,
)

CFG_2D = dict(
    in_channels=4,
    out_channels=4,
    model_channels=32,
    num_res_blocks=2,
    attention_resolutions=(2,),
    dropout=0.0,
    channel_mult=(1, 2),
    conv_kernel_size=3,
    dims=2,
    cond_features=5,
    num_heads=4,
)


def _build_pair(cfg, seed=0):
    torch.manual_seed(seed)
    ref = UNetModel(**cfg, flash_attention=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = UNet(**cfg)
    params = convert_unet(sd, cfg)
    return ref, ours, params


def _to_last(x):  # (B, C, *S) -> (B, *S, C)
    return np.moveaxis(x, 1, -1)


def _to_first(x):
    return np.moveaxis(np.asarray(x), -1, 1)


@pytest.mark.parametrize("cfg,shape", [(CFG_1D, (2, 3, 64)), (CFG_2D, (2, 4, 16, 16))])
def test_unet_forward_parity(cfg, shape, rng):
    ref, ours, params = _build_pair(cfg)
    x = rng.standard_normal(shape).astype(np.float32)
    t = rng.standard_normal(shape[0]).astype(np.float32)
    cond = rng.standard_normal((shape[0], 5)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(t), torch.tensor(cond)).numpy()

    got = _to_first(ours.apply(params, jnp.asarray(_to_last(x)), jnp.asarray(t), jnp.asarray(cond)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_heun_sampling_parity_1e4(rng):
    """Full 8-step deterministic Heun run: identical weights + identical
    initial noise => identical waveforms to 1e-4 rel tol (float64
    accumulators both sides, matching edm.py:149)."""
    cfg = CFG_1D
    ref, ours, params = _build_pair(cfg, seed=1)
    edm_cfg = edm_lib.EDMConfig()
    num_steps = 8
    shape_first = (2, 3, 64)
    cond = rng.standard_normal((2, 5)).astype(np.float32)

    sigmas_np = np.asarray(edm_lib.sampling_sigmas(edm_cfg, num_steps), np.float64)
    eps = rng.standard_normal(shape_first).astype(np.float64) * sigmas_np[0]

    # ---- torch side: reference deterministic sampler semantics ----------
    def torch_denoise(x64, sigma_scalar):
        sigma = torch.full((x64.shape[0],), float(sigma_scalar), dtype=torch.float32)
        x32 = x64.to(torch.float32)
        c_in = 1.0 / (sigma**2 + edm_cfg.sigma_data**2) ** 0.5
        with torch.no_grad():
            out = ref(
                x32 * c_in.view(-1, 1, 1),
                0.25 * sigma.log(),
                torch.tensor(cond),
            )
        c_skip = edm_cfg.sigma_data**2 / (sigma**2 + edm_cfg.sigma_data**2)
        c_out = sigma * edm_cfg.sigma_data / (sigma**2 + edm_cfg.sigma_data**2) ** 0.5
        return (out * c_out.view(-1, 1, 1) + x32 * c_skip.view(-1, 1, 1)).to(torch.float64)

    x_next = torch.tensor(eps)
    for i in range(num_steps):
        s, s_next = sigmas_np[i], sigmas_np[i + 1]
        x_cur = x_next
        pred = torch_denoise(x_cur, s)
        d_cur = (x_cur - pred) / s
        x_next = x_cur + d_cur * (s_next - s)
        if i < num_steps - 1:
            pred2 = torch_denoise(x_next, s_next)
            d_prime = (x_next - pred2) / s_next
            x_next = x_cur + (s_next - s) * (0.5 * d_cur + 0.5 * d_prime)
    want = x_next.numpy()

    # ---- jax side: our scan sampler with f64 accumulators ----------------
    jax.config.update("jax_enable_x64", True)
    try:
        cond_j = jnp.asarray(cond, jnp.float32)

        def denoise_fn(x, sigma):
            def net_apply(xx, noise_cond, c):
                return ours.apply(params, xx, noise_cond, c)

            return edm_lib.precondition(edm_cfg, net_apply, x, sigma, cond=cond_j)

        got = sampler_lib.heun_deterministic(
            denoise_fn,
            jnp.asarray(_to_last(eps), jnp.float64),
            jnp.asarray(sigmas_np, jnp.float64),
            model_dtype=jnp.float32,
        )
        got = _to_first(got)
    finally:
        jax.config.update("jax_enable_x64", False)

    denom = np.maximum(np.abs(want), 1e-3)
    rel = np.abs(got - want) / denom
    assert rel.max() < 1e-4, f"max rel err {rel.max():.2e}"
