"""Spatial self-attention (channels-last) with XLA-einsum and Pallas paths.

Parity with AttentionBlock/QKVAttention (/root/reference/tqdne/blocks.py:
111-190): GroupNorm -> 1x1 conv to 3C (channel order [q|k|v], heads are
contiguous channel slices) -> scaled dot-product with the sqrt(sqrt(d))
double-scaling trick -> fp32 softmax -> zero-init 1x1 output projection
-> residual add.

The default path is a plain einsum: at reference sequence lengths
(<= 508 in 1D, 16x16 in 2D) XLA fuses it onto the MXU just fine.  For
long sequences `use_pallas=True` switches to the fused flash-attention
kernel in tqdne_tpu.ops.flash_attention (same math, tiled, O(L) memory).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tqdne_tpu.nn.layers import Norm32, conv_nd


def qkv_attention(q, k, v, *, causal: bool = False) -> jnp.ndarray:
    """Multi-head attention over (B, L, H, D) tensors; returns (B, L, H, D).

    Uses the reference's numerically-stable double scaling: both q and k
    are multiplied by d^-1/4 before the product (blocks.py:173-179), and
    the softmax runs in float32.
    """
    d = q.shape[-1]
    scale = d**-0.25
    logits = jnp.einsum(
        "blhd,bshd->bhls", q * scale, k * scale, preferred_element_type=jnp.float32
    )
    if causal:
        l, s = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((l, s), dtype=bool))
        logits = jnp.where(mask, logits, -jnp.inf)
    weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhls,bshd->blhd", weights, v)


class AttentionBlock(nn.Module):
    """Residual spatial self-attention over flattened spatial dims."""

    channels: int
    num_heads: int = 1
    dims: int = 2
    use_causal_mask: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, *spatial, c = x.shape
        assert c == self.channels, (c, self.channels)
        assert c % self.num_heads == 0
        head_dim = c // self.num_heads

        h = Norm32(name="norm")(x)
        qkv = conv_nd(self.dims, 3 * c, 1, dtype=self.dtype, name="qkv")(h)

        length = 1
        for s in spatial:
            length *= s
        qkv = qkv.reshape(b, length, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.use_pallas:
            from tqdne_tpu.ops.flash_attention import flash_attention

            a = flash_attention(q, k, v, causal=self.use_causal_mask)
        else:
            a = qkv_attention(q, k, v, causal=self.use_causal_mask)

        a = a.reshape(b, *spatial, c)
        out = conv_nd(self.dims, c, 1, zero_init=True, dtype=self.dtype, name="proj_out")(a)
        return x + out
