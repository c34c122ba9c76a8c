"""Flagship-scale torch<->JAX parity (VERDICT r3 item #2).

The toy-scale parity tests (test_reference_parity.py) prove the
conversion math; this file proves it at the exact flagship
configuration the reference ships (/root/reference/tqdne/
architectures.py:61-79 — 2D UNet, model_channels=128, channel_mult
(1,2,4,4), attention at ds=8, ~108M params, operating on the 8-channel
32x32 latent) plus the paired 2D autoencoder (architectures.py:40-58).
A random-init torch model is converted with utils/torch_convert and we
assert forward + 8-step deterministic Heun parity <=1e-4 — the exact
bridge the BASELINE north star (released-Zenodo-weights parity) depends
on, runnable without egress.
"""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tqdne.blocks import Decoder as RefDecoder  # noqa: E402
from tqdne.blocks import Encoder as RefEncoder  # noqa: E402
from tqdne.unet import UNetModel  # noqa: E402

from tqdne_tpu.diffusion import edm as edm_lib  # noqa: E402
from tqdne_tpu.diffusion import sampler as sampler_lib  # noqa: E402
from tqdne_tpu.models.autoencoder import AutoencoderKL  # noqa: E402
from tqdne_tpu.models.unet import UNet  # noqa: E402
from tqdne_tpu.utils.torch_convert import convert_autoencoder, convert_unet  # noqa: E402

pytestmark = pytest.mark.slow

# architectures.py:61-79 (get_2d_unet_config), on the latent_channels=8
# latent of config.py:45-50; dropout is inactive in eval/parity mode.
FLAGSHIP_UNET = dict(
    in_channels=8,
    out_channels=8,
    cond_features=5,
    dims=2,
    conv_kernel_size=3,
    model_channels=128,
    channel_mult=(1, 2, 4, 4),
    attention_resolutions=(8,),
    num_res_blocks=2,
    num_heads=4,
    dropout=0.1,
)

# architectures.py:40-58 (get_2d_autoencoder_configs), latent_channels=8.
_AE_BASE = dict(
    model_channels=64,
    channel_mult=(1, 2, 4),
    attention_resolutions=(),
    num_res_blocks=2,
    dims=2,
    conv_kernel_size=3,
    dropout=0.1,
)
FLAGSHIP_ENC = _AE_BASE | dict(in_channels=3, out_channels=16)
FLAGSHIP_DEC = _AE_BASE | dict(in_channels=8, out_channels=3)


def _to_last(x):  # (B, C, *S) -> (B, *S, C)
    return np.moveaxis(x, 1, -1)


def _to_first(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def _build_pair(seed=0):
    torch.manual_seed(seed)
    ref = UNetModel(**FLAGSHIP_UNET, flash_attention=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = UNet(**FLAGSHIP_UNET)
    params = convert_unet(sd, FLAGSHIP_UNET)
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))
    assert n_params > 100_000_000, f"not flagship scale: {n_params} params"
    return ref, ours, params


def test_flagship_unet_forward_parity(rng):
    ref, ours, params = _build_pair()
    x = rng.standard_normal((2, 8, 32, 32)).astype(np.float32)
    t = rng.standard_normal(2).astype(np.float32)
    cond = rng.standard_normal((2, 5)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.tensor(x), torch.tensor(t), torch.tensor(cond)).numpy()

    got = _to_first(ours.apply(params, jnp.asarray(_to_last(x)), jnp.asarray(t), jnp.asarray(cond)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flagship_heun_sampling_parity_1e4(rng):
    """8-step deterministic Heun (15 UNet evals) at flagship scale:
    identical weights + identical injected noise must agree to 1e-4 rel
    tol with float64 accumulators on both sides (edm.py:146-196)."""
    ref, ours, params = _build_pair(seed=1)
    edm_cfg = edm_lib.EDMConfig()
    num_steps = 8
    shape_first = (1, 8, 32, 32)
    cond = rng.standard_normal((1, 5)).astype(np.float32)

    sigmas_np = np.asarray(edm_lib.sampling_sigmas(edm_cfg, num_steps), np.float64)
    eps = rng.standard_normal(shape_first).astype(np.float64) * sigmas_np[0]

    def torch_denoise(x64, sigma_scalar):
        sigma = torch.full((x64.shape[0],), float(sigma_scalar), dtype=torch.float32)
        x32 = x64.to(torch.float32)
        c_in = 1.0 / (sigma**2 + edm_cfg.sigma_data**2) ** 0.5
        with torch.no_grad():
            out = ref(x32 * c_in.view(-1, 1, 1, 1), 0.25 * sigma.log(), torch.tensor(cond))
        c_skip = edm_cfg.sigma_data**2 / (sigma**2 + edm_cfg.sigma_data**2)
        c_out = sigma * edm_cfg.sigma_data / (sigma**2 + edm_cfg.sigma_data**2) ** 0.5
        return (out * c_out.view(-1, 1, 1, 1) + x32 * c_skip.view(-1, 1, 1, 1)).to(torch.float64)

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


def test_flagship_autoencoder_parity(rng):
    """Flagship 2D VAE: encoder moments on a 3x128x128 spectrogram and
    decoder on the 8x32x32 latent both match the torch blocks
    (/root/reference/tqdne/blocks.py:263-436) to 1e-4."""
    torch.manual_seed(2)
    ref_enc = RefEncoder(**FLAGSHIP_ENC, flash_attention=False).eval()
    ref_dec = RefDecoder(**FLAGSHIP_DEC, flash_attention=False).eval()

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in ref_enc.state_dict().items()}
    sd |= {f"decoder.{k}": v.detach().numpy() for k, v in ref_dec.state_dict().items()}

    ae = AutoencoderKL(encoder_config=FLAGSHIP_ENC, decoder_config=FLAGSHIP_DEC)
    variables = convert_autoencoder(sd, FLAGSHIP_ENC, FLAGSHIP_DEC)

    x = rng.standard_normal((1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want_moments = ref_enc(torch.tensor(x)).numpy()
    mean_want, logstd_want = np.split(want_moments, 2, axis=1)
    mean_got, logstd_got = ae.apply(variables, jnp.asarray(_to_last(x)), method="moments")
    np.testing.assert_allclose(_to_first(mean_got), mean_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_to_first(logstd_got), logstd_want, rtol=1e-4, atol=1e-5)

    z = rng.standard_normal((1, 8, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want_dec = ref_dec(torch.tensor(z)).numpy()
    got_dec = ae.apply(variables, jnp.asarray(_to_last(z)), method="decode")
    np.testing.assert_allclose(_to_first(got_dec), want_dec, rtol=1e-4, atol=1e-5)
