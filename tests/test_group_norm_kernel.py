"""Fused GroupNorm+SiLU kernel parity vs flax/Norm32 (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tqdne_tpu.nn.layers import Norm32
from tqdne_tpu.ops.group_norm import group_norm_silu


@pytest.mark.parametrize("shape,groups", [((2, 64, 64), 32), ((2, 8, 8, 128), 32),
                                          ((1, 100, 48), 16)])
def test_fused_matches_norm32_plus_silu(rng, shape, groups):
    import flax.linen as fnn

    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 2 + 0.5
    c = shape[-1]
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))

    norm = Norm32(groups=groups)
    params = {"params": {"GroupNorm_0": {"scale": scale, "bias": bias}}}
    want = fnn.silu(norm.apply(params, x))

    got = group_norm_silu(x, scale, bias, groups, 1e-5, True, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fused_no_silu(rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 64)).astype(np.float32))
    scale = jnp.ones(64)
    bias = jnp.zeros(64)
    norm = Norm32()
    params = {"params": {"GroupNorm_0": {"scale": scale, "bias": bias}}}
    want = norm.apply(params, x)
    got = group_norm_silu(x, scale, bias, 32, 1e-5, False, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fused_gradients(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(32).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_silu(x, s, b, 32, 1e-5, True, True) ** 2)

    import flax.linen as fnn

    def loss_ref(x, s, b):
        norm = Norm32()
        params = {"params": {"GroupNorm_0": {"scale": s, "bias": b}}}
        return jnp.sum(fnn.silu(norm.apply(params, x)) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_bf16_in_f32_stats(rng):
    """bf16 activations, fp32 statistics, bf16 out — Norm32 cast semantics."""
    x = jnp.asarray(rng.standard_normal((2, 64, 64)), jnp.bfloat16)
    out = group_norm_silu(x, jnp.ones(64), jnp.zeros(64), 32, 1e-5, True, True)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_unet_with_pallas_norm_matches_default(rng):
    """use_pallas_norm=True produces the same UNet outputs (interpret on CPU)
    with identical parameter paths (checkpoint interchangeable)."""
    from tqdne_tpu.models.unet import UNet

    kwargs = dict(
        in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
        attention_resolutions=(), channel_mult=(1, 2), conv_kernel_size=5, dims=1,
        cond_features=5,
    )
    x = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    t = jnp.zeros((2,))
    c = jnp.zeros((2, 5))
    ref = UNet(**kwargs)
    params = ref.init(jax.random.key(0), x, t, c)
    # randomize so outputs are nonzero
    flat, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(1), len(flat))
    params = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, p.shape, p.dtype) * 0.05 for k, p in zip(keys, flat)]
    )
    fused = UNet(**kwargs, use_pallas_norm=True)
    want = ref.apply(params, x, t, c)
    got = fused.apply(params, x, t, c)  # same params tree: identical paths
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
