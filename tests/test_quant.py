"""int8 quantized convolution (nn/quant.py) — the quality-gated fast mode.

Checks the three properties the mode depends on:
- checkpoint interchangeability: QuantConv's param tree is structurally
  identical to nn.Conv's, so f32-trained weights load unchanged;
- numerics: int8 output tracks the f32 conv within quantization noise
  (~1% relative) across dims/strides/kernel sizes the UNet uses;
- the conv_nd gate: TQDNE_INT8_CONV=1 swaps the implementation and a
  full UNet forward with f32-trained params stays close to the f32 path.
"""

import os

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from tqdne_tpu.nn.quant import QuantConv, quantize_symmetric


@pytest.mark.parametrize(
    "dims,shape,k,stride,pad",
    [
        (1, (2, 64, 16), 3, 1, "SAME"),
        (2, (2, 16, 16, 8), 3, 1, "SAME"),
        (2, (2, 16, 16, 8), 3, 2, [(1, 1), (1, 1)]),
        (1, (2, 64, 16), 1, 1, "SAME"),
        (1, (2, 64, 16), 3, 2, [(1, 1)]),
    ],
)
def test_quantconv_matches_f32_conv(dims, shape, k, stride, pad):
    x = jax.random.normal(jax.random.key(1), shape)
    ref = nn.Conv(features=24, kernel_size=(k,) * dims, strides=(stride,) * dims,
                  padding=pad, param_dtype=jnp.float32)
    variables = ref.init(jax.random.key(0), x)
    q = QuantConv(features=24, kernel_size=(k,) * dims, strides=(stride,) * dims,
                  padding=pad)

    # param structure identical -> checkpoints interchange
    assert (jax.tree_util.tree_structure(q.init(jax.random.key(0), x))
            == jax.tree_util.tree_structure(variables))

    y_ref = ref.apply(variables, x)
    y_q = q.apply(variables, x)
    assert y_q.shape == y_ref.shape
    rel = float(jnp.linalg.norm(y_ref - y_q) / jnp.linalg.norm(y_ref))
    assert rel < 0.03, rel


def test_quantconv_bf16_activations():
    x = jax.random.normal(jax.random.key(1), (2, 32, 16), dtype=jnp.bfloat16)
    q = QuantConv(features=8, kernel_size=(3,), strides=(1,), padding="SAME")
    v = q.init(jax.random.key(0), x)
    y = q.apply(v, x)
    assert y.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())


def test_quantize_symmetric_range_and_zero_guard():
    q, s = quantize_symmetric(jnp.zeros((4, 4)), axes=(0, 1))
    assert int(jnp.abs(q.astype(jnp.int32)).max()) == 0  # no NaN/inf from 0/0
    x = jnp.array([[-3.0, 0.5], [1.0, 3.0]])
    q, s = quantize_symmetric(x, axes=(0, 1))
    assert int(jnp.abs(q.astype(jnp.int32)).max()) == 127
    back = q.astype(jnp.float32) * s
    assert float(jnp.abs(back - x).max()) < 3.0 / 127 + 1e-6


def test_conv_nd_int8_gate_unet_forward():
    """TQDNE_INT8_CONV=1: the whole UNet runs through QuantConv and its
    output tracks the f32 path (same trained-structure params)."""
    from tqdne_tpu.models.unet import UNet

    cfg = dict(model_channels=16, num_res_blocks=1, channel_mult=(1, 2),
               attention_resolutions=(), dims=1, cond_features=5,
               in_channels=3, out_channels=3)
    x = jax.random.normal(jax.random.key(1), (2, 64, 3))
    sigma = jnp.ones((2,))
    cond = jnp.zeros((2, 5))

    unet = UNet(**cfg)
    v = unet.init(jax.random.key(0), x, sigma, cond)
    # the output conv is zero-init (reference zero_module), which would
    # zero the whole comparison — fill zeroed leaves as a trained net would
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    leaves = [
        jnp.where(jnp.all(leaf == 0), jax.random.normal(k, leaf.shape) * 0.05, leaf)
        for leaf, k in zip(leaves, keys)
    ]
    v = jax.tree_util.tree_unflatten(treedef, leaves)
    y_f32 = unet.apply(v, x, sigma, cond)

    os.environ["TQDNE_INT8_CONV"] = "1"
    try:
        unet_q = UNet(**cfg)
        # identical param structure: f32 checkpoint loads into the int8 path
        assert (jax.tree_util.tree_structure(unet_q.init(jax.random.key(0), x, sigma, cond))
                == jax.tree_util.tree_structure(v))
        y_q = unet_q.apply(v, x, sigma, cond)
    finally:
        del os.environ["TQDNE_INT8_CONV"]

    assert y_q.shape == y_f32.shape
    assert bool(jnp.isfinite(y_q).all())
    # per-layer ~1% quantization noise compounds through the network;
    # the outputs must stay strongly correlated (the FID-level quality
    # delta is measured on the trained flagship, docs/quality)
    a, b = np.asarray(y_f32).ravel(), np.asarray(y_q).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert cos > 0.98, cos
