"""Spatial self-attention (channels-last) with XLA-einsum and Pallas paths.

Parity with AttentionBlock/QKVAttention (/root/reference/tqdne/blocks.py:
111-190): GroupNorm -> 1x1 conv to 3C (channel order [q|k|v], heads are
contiguous channel slices) -> scaled dot-product with the sqrt(sqrt(d))
double-scaling trick -> fp32 softmax -> zero-init 1x1 output projection
-> residual add.

Path selection (``use_pallas``):
- "auto" (default): the fused Pallas flash kernel when the flattened
  sequence is long enough to pay (L >= 256) and head_dim fits a lane
  tile; the plain einsum otherwise.  Measured on v5e: at the 1D UNet's
  L=508 the einsum path materializes a (64, 4, 508, 508) f32 score
  tensor per block — ~10 of the 26 ms forward — while the 2D flagship's
  16-token attention is faster as an einsum (flash tiling would pad
  16 -> 128).
- True / False: force one path (used by parity tests and benchmarks).
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
    use_pallas: bool | str = "auto"
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

        use_pallas = self.use_pallas
        if use_pallas == "auto":
            import jax

            # the Pallas kernel lowers on TPU (interpret mode covers CPU
            # tests); other backends (GPU, ...) keep the einsum path
            backend_ok = jax.default_backend() in ("tpu", "cpu")
            use_pallas = backend_ok and length >= 256 and head_dim <= 128
        if use_pallas:
            from tqdne_tpu.ops.flash_attention import flash_attention

            import jax

            # mid lengths: one whole-sequence block per (batch, head) keeps
            # the scores in VMEM and avoids a launch-bound 128x128 grid
            # (head_dim here can be as small as 16); long sequences tile.
            block = 512 if length <= 1024 else 128
            a = flash_attention(q, k, v, self.use_causal_mask, block, block,
                                jax.default_backend() == "cpu")
        else:
            a = qkv_attention(q, k, v, causal=self.use_causal_mask)

        a = a.reshape(b, *spatial, c)
        out = conv_nd(self.dims, c, 1, zero_init=True, dtype=self.dtype, name="proj_out")(a)
        return x + out
