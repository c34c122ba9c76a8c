"""Converter structural coverage: cond-Fourier variant, deeper configs,
and full round-trip through our UNet apply."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tqdne.unet import UNetModel  # noqa: E402

from tqdne_tpu.models.unet import UNet  # noqa: E402
from tqdne_tpu.utils.torch_convert import convert_unet  # noqa: E402


def _roundtrip(cfg, shape, rng, seed=0):
    torch.manual_seed(seed)
    ref = UNetModel(**cfg, flash_attention=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = UNet(**cfg)
    params = convert_unet(sd, cfg)
    x = rng.standard_normal(shape).astype(np.float32)
    t = rng.standard_normal(shape[0]).astype(np.float32)
    cond = (
        rng.standard_normal((shape[0], cfg["cond_features"])).astype(np.float32)
        if cfg.get("cond_features")
        else None
    )
    with torch.no_grad():
        want = ref(
            torch.tensor(x), torch.tensor(t),
            torch.tensor(cond) if cond is not None else None,
        ).numpy()
    got = ours.apply(
        params, jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(t),
        jnp.asarray(cond) if cond is not None else None,
    )
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), -1, 1), want, rtol=2e-4, atol=2e-5)


def test_three_level_unconditioned(rng):
    cfg = dict(
        in_channels=2, out_channels=2, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 4), dropout=0.0, channel_mult=(1, 2, 2),
        conv_kernel_size=3, dims=1, cond_features=None, num_heads=4,
    )
    _roundtrip(cfg, (2, 2, 32), rng)


def test_cond_fourier_embedding(rng):
    """cond_emb_scale path: the reference's per-feature Fourier intent with
    a single conditioning feature (the only case its broadcasting handles)."""
    cfg = dict(
        in_channels=2, out_channels=2, model_channels=32, num_res_blocks=1,
        attention_resolutions=(), dropout=0.0, channel_mult=(1, 2),
        conv_kernel_size=3, dims=1, cond_features=1, cond_emb_scale=1.0, num_heads=2,
    )
    _roundtrip(cfg, (2, 2, 32), rng)


def test_scale_shift_norm_variant(rng):
    cfg = dict(
        in_channels=3, out_channels=3, model_channels=32, num_res_blocks=2,
        attention_resolutions=(), dropout=0.0, channel_mult=(1, 2),
        conv_kernel_size=5, dims=1, cond_features=5, num_heads=2,
        use_scale_shift_norm=True,
    )
    _roundtrip(cfg, (2, 3, 64), rng)
