"""Pallas flash-attention parity vs the einsum reference implementation
(interpret mode on CPU; the same kernel compiles on TPU — exercised by
bench and the TPU smoke script)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tqdne_tpu.nn.attention import qkv_attention
from tqdne_tpu.ops.flash_attention import flash_attention


def _qkv(rng, b=2, l=128, h=4, d=32):
    def one():
        return jnp.asarray(rng.standard_normal((b, l, h, d)).astype(np.float32))

    return one(), one(), one()


@pytest.mark.parametrize("l,d", [(128, 32), (508, 16), (256, 128), (100, 64)])
def test_forward_parity(rng, l, d):
    q, k, v = _qkv(rng, l=l, d=d)
    want = qkv_attention(q, k, v)
    got = flash_attention(q, k, v, False, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_causal_parity(rng):
    q, k, v = _qkv(rng, l=128, d=32)
    want = qkv_attention(q, k, v, causal=True)
    got = flash_attention(q, k, v, True, 64, 64, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_gradients_match_einsum(rng):
    q, k, v = _qkv(rng, b=1, l=64, h=2, d=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, False, 64, 64, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(qkv_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("l,blk,causal", [(256, 128, False), (200, 128, False),
                                          (256, 64, True), (100, 64, False)])
def test_gradients_multiblock(rng, l, blk, causal):
    """Pallas backward across tile boundaries, ragged lengths (padding
    masks), and the causal mask."""
    q, k, v = _qkv(rng, b=1, l=l, h=2, d=32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, causal, blk, blk, True)
        return jnp.sum(out * jnp.cos(out))  # non-symmetric cotangent

    def loss_ref(q, k, v):
        out = qkv_attention(q, k, v, causal=causal)
        return jnp.sum(out * jnp.cos(out))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_attention_block_pallas_flag(rng):
    """AttentionBlock(use_pallas=True) equals the einsum path."""
    from tqdne_tpu.nn.attention import AttentionBlock

    x = jnp.asarray(rng.standard_normal((2, 64, 32)).astype(np.float32))
    blk_ein = AttentionBlock(32, num_heads=4, dims=1, use_pallas=False)
    params = blk_ein.init(jax.random.key(0), x)
    # make proj_out nonzero so the attention output actually matters
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim > 0 else p, params
    )
    blk_pal = AttentionBlock(32, num_heads=4, dims=1, use_pallas=True)
    import tqdne_tpu.ops.flash_attention as fa

    # run the pallas path in interpreter mode on CPU
    orig = fa.flash_attention

    def interp(q, k, v, causal=False, block_q=128, block_k=128, interpret=False):
        return orig(q, k, v, causal, block_q, block_k, True)

    fa.flash_attention = interp
    try:
        got = blk_pal.apply(params, x)
    finally:
        fa.flash_attention = orig
    want = blk_ein.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
