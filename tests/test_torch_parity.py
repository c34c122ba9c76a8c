"""Numerical parity of our channels-last flax primitives against raw torch
(CPU) ops in the reference's channels-first layout.

These tests pin the exact semantics needed to load reference (torch)
checkpoints: convolution padding rules (stride-1 'same' and the stride-2
padding=k//2 downsampling, /root/reference/tqdne/blocks.py:86-104),
fp32 GroupNorm(32) with eps=1e-5 (nn.py:11-13,90-105), the
sqrt(sqrt(d))-scaled einsum attention (blocks.py:148-190), and the
Fourier time embedding (blocks.py:15-26).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tqdne_tpu.nn.attention import AttentionBlock, qkv_attention
from tqdne_tpu.nn.layers import GaussianFourierProjection, Norm32, conv_nd

ATOL = 1e-5
RTOL = 1e-4


def _torch_conv1d(x_ncl, w_oik, b, stride=1, padding="same"):
    return torch.nn.functional.conv1d(
        torch.tensor(x_ncl), torch.tensor(w_oik), torch.tensor(b),
        stride=stride, padding=padding,
    ).numpy()


def test_conv1d_same_padding_matches_torch(rng):
    x = rng.standard_normal((2, 16, 64)).astype(np.float32)  # (B, C, L)
    w = rng.standard_normal((24, 16, 5)).astype(np.float32)  # (O, I, K)
    b = rng.standard_normal(24).astype(np.float32)

    want = _torch_conv1d(x, w, b)  # (B, O, L)

    conv = conv_nd(1, 24, 5)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}}
    got = conv.apply(params, jnp.asarray(x.transpose(0, 2, 1)))  # (B, L, C)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=RTOL, atol=ATOL)


def test_conv1d_stride2_padding_matches_torch(rng):
    """Downsample conv: torch pads k//2 both sides; XLA 'SAME' would pad
    asymmetrically — our explicit padding must match torch."""
    x = rng.standard_normal((2, 8, 64)).astype(np.float32)
    w = rng.standard_normal((8, 8, 3)).astype(np.float32)
    b = np.zeros(8, np.float32)

    want = _torch_conv1d(x, w, b, stride=2, padding=1)
    conv = conv_nd(1, 8, 3, stride=2)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}}
    got = conv.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    assert got.shape == (2, 32, 8)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=RTOL, atol=ATOL)


def test_conv2d_same_padding_matches_torch(rng):
    x = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    want = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), padding="same"
    ).numpy()
    conv = conv_nd(2, 6, 3)
    # torch (O, I, kH, kW) -> flax (kH, kW, I, O)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    got = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=RTOL, atol=ATOL)


def test_groupnorm32_matches_torch(rng):
    c = 64
    x = (rng.standard_normal((2, c, 32)) * 3 + 1).astype(np.float32)
    weight = rng.standard_normal(c).astype(np.float32)
    bias = rng.standard_normal(c).astype(np.float32)

    gn = torch.nn.GroupNorm(32, c, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(weight))
        gn.bias.copy_(torch.tensor(bias))
    want = gn(torch.tensor(x)).detach().numpy()

    norm = Norm32()
    params = {"params": {"GroupNorm_0": {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)}}}
    got = norm.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=RTOL, atol=1e-4)


def test_qkv_attention_matches_torch_einsum(rng):
    """The reference QKVAttention math (blocks.py:156-190) recomputed with
    torch einsum in channels-first layout."""
    b, h, d, L = 2, 4, 16, 32
    c = h * d
    qkv = rng.standard_normal((b, 3 * c, L)).astype(np.float32)

    # torch-side computation of the reference formula
    tq = torch.tensor(qkv)
    q, k, v = tq.chunk(3, dim=1)
    scale = 1 / (d**0.25)
    weight = torch.einsum(
        "bct,bcs->bts", (q * scale).reshape(b * h, d, L), (k * scale).reshape(b * h, d, L)
    )
    weight = torch.softmax(weight.float(), dim=-1)
    want = (
        torch.einsum("bts,bcs->bct", weight, v.reshape(b * h, d, L)).reshape(b, c, L).numpy()
    )

    # ours: channels-last (B, L, H, D)
    qkv_last = jnp.asarray(qkv.transpose(0, 2, 1)).reshape(b, L, 3, h, d)
    got = qkv_attention(qkv_last[:, :, 0], qkv_last[:, :, 1], qkv_last[:, :, 2])
    got = np.asarray(got.reshape(b, L, c)).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_causal_mask_matches_torch(rng):
    b, h, d, L = 1, 2, 8, 16
    c = h * d
    qkv = rng.standard_normal((b, 3 * c, L)).astype(np.float32)
    tq = torch.tensor(qkv)
    q, k, v = tq.chunk(3, dim=1)
    scale = 1 / (d**0.25)
    weight = torch.einsum(
        "bct,bcs->bts", (q * scale).reshape(b * h, d, L), (k * scale).reshape(b * h, d, L)
    )
    mask = torch.tril(torch.ones(L, L)).unsqueeze(0).expand(weight.size(0), -1, -1)
    weight = weight.masked_fill(mask == 0, -torch.inf)
    weight = torch.softmax(weight.float(), dim=-1)
    want = torch.einsum("bts,bcs->bct", weight, v.reshape(b * h, d, L)).reshape(b, c, L).numpy()

    qkv_last = jnp.asarray(qkv.transpose(0, 2, 1)).reshape(b, L, 3, h, d)
    got = qkv_attention(qkv_last[:, :, 0], qkv_last[:, :, 1], qkv_last[:, :, 2], causal=True)
    got = np.asarray(got.reshape(b, L, c)).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_fourier_projection_matches_torch_formula(rng):
    c = 32
    w = (rng.standard_normal(c // 2) * 0.02).astype(np.float32)
    x = rng.standard_normal(8).astype(np.float32)
    hx = torch.tensor(x)[:, None] * torch.tensor(w)[None, :] * 2 * torch.pi
    want = torch.cat([torch.sin(hx), torch.cos(hx)], dim=-1).numpy()

    mod = GaussianFourierProjection(c)
    got = mod.apply({"params": {"W": jnp.asarray(w)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=RTOL, atol=ATOL)


def test_nearest_upsample_matches_torch(rng):
    from tqdne_tpu.nn.layers import Upsample

    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    want = torch.nn.functional.interpolate(torch.tensor(x), scale_factor=2, mode="nearest").numpy()
    up = Upsample(4, use_conv=False, dims=2)
    got = up.apply({}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, rtol=0, atol=0)


def test_silu_and_avgpool_match_torch(rng):
    import flax.linen as fnn

    x = rng.standard_normal((2, 8, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fnn.silu(jnp.asarray(x))),
        torch.nn.functional.silu(torch.tensor(x)).numpy(),
        rtol=RTOL, atol=ATOL,
    )
    want = torch.nn.functional.avg_pool1d(torch.tensor(x), 2, 2).numpy()
    got = fnn.avg_pool(jnp.asarray(x.transpose(0, 2, 1)), (2,), (2,))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, rtol=RTOL, atol=ATOL)
