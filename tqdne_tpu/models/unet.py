"""Conditional UNet for EDM diffusion (flax.linen, channels-last, dims 1/2/3).

Topological parity with /root/reference/tqdne/unet.py:146-398 (itself
adapted from openai/consistency_models): Gaussian-Fourier time embedding
-> 4x-width MLP, optional scalar-conditioning embedding added to the time
embedding, a down path of FiLM ResBlocks with attention at configured
downsample rates, a Res-Attn-Res middle, an up path with skip
concatenation, and a zero-init output convolution.

TPU-first: channels-last tensors, `dtype` selects bfloat16 compute for
MXU throughput (params stay fp32), and `use_checkpoint` applies
jax.checkpoint (remat) per ResBlock instead of torch's manual
CheckpointFunction (nn.py:137-215).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from tqdne_tpu.nn.attention import AttentionBlock
from tqdne_tpu.nn.layers import (
    Downsample,
    GaussianFourierProjection,
    MLP,
    Norm32,
    Upsample,
    conv_nd,
)


class ResBlock(nn.Module):
    """FiLM residual block conditioned on an embedding (unet.py:42-143 parity).

    norm -> SiLU -> conv, add (or scale-shift with) the projected
    embedding, norm -> SiLU -> dropout -> zero-init conv, plus a skip
    connection (identity / 1x1 conv / full conv).
    """

    channels: int
    emb_channels: int
    dropout: float = 0.0
    out_channels: int | None = None
    kernel_size: int = 3
    use_conv: bool = False
    use_scale_shift_norm: bool = False
    dims: int = 2
    train: bool = False  # static: enables dropout (attribute, so remat-safe)
    use_pallas_norm: bool = False  # fused GroupNorm+SiLU kernel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        out_ch = self.out_channels or self.channels

        h = Norm32(silu=True, use_pallas=self.use_pallas_norm, name="in_norm")(x)
        h = conv_nd(self.dims, out_ch, self.kernel_size, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="emb_proj",
        )(nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out[:, *(None,) * self.dims, :]  # broadcast over spatial

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = Norm32(name="out_norm")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = Norm32(silu=True, use_pallas=self.use_pallas_norm, name="out_norm")(h)
        h = nn.Dropout(rate=self.dropout, deterministic=not self.train)(h)
        h = conv_nd(
            self.dims, out_ch, self.kernel_size, zero_init=True, dtype=self.dtype, name="out_conv"
        )(h)

        if out_ch == self.channels:
            skip = x
        elif self.use_conv:
            skip = conv_nd(self.dims, out_ch, self.kernel_size, dtype=self.dtype, name="skip")(x)
        else:
            skip = conv_nd(self.dims, out_ch, 1, dtype=self.dtype, name="skip")(x)
        return skip + h


class UNet(nn.Module):
    """The full conditional UNet (unet.py:146-398 parity).

    Input/output are channels-last: (B, T, C) for dims=1, (B, H, W, C)
    for dims=2.  ``timesteps`` is the EDM noise conditioning (B,);
    ``cond`` the optional (B, cond_features) scalar conditioning.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = (8, 16, 32)
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_kernel_size: int = 3
    conv_resample: bool = True
    dims: int = 2
    cond_features: int | None = None
    cond_emb_scale: float | None = None
    use_checkpoint: bool = False
    num_heads: int = 1
    use_scale_shift_norm: bool = False
    use_causal_mask: bool = False
    use_pallas_attention: bool | str = "auto"
    use_pallas_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, cond=None, *, train: bool = False):
        assert (cond is not None) == (self.cond_features is not None), (
            "must specify cond iff the model is conditioned"
        )
        M = self.model_channels
        embed_dim = 4 * M
        res_block = nn.remat(ResBlock) if self.use_checkpoint else ResBlock

        emb = GaussianFourierProjection(M, name="time_embed")(timesteps)
        emb = MLP(embed_dim, embed_dim, dtype=self.dtype, name="time_mlp")(emb)

        if self.cond_features is not None:
            c = cond.astype(x.dtype)
            if self.cond_emb_scale is not None:
                # per-feature Fourier embedding, flattened (unet.py:215-227)
                c = GaussianFourierProjection(M, self.cond_emb_scale, name="cond_embed")(c)
                c = c.reshape(c.shape[0], -1)
            emb = emb + MLP(embed_dim, embed_dim, dtype=self.dtype, name="cond_mlp")(c)

        def attn(ch, name):
            return AttentionBlock(
                ch,
                num_heads=self.num_heads,
                dims=self.dims,
                use_causal_mask=self.use_causal_mask,
                use_pallas=self.use_pallas_attention,
                dtype=self.dtype,
                name=name,
            )

        # --- down path -----------------------------------------------------
        ch = input_ch = int(self.channel_mult[0] * M)
        h = conv_nd(self.dims, ch, self.conv_kernel_size, dtype=self.dtype, name="in_conv")(x)
        hs = [h]
        ds = 1
        block = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = res_block(
                    ch,
                    embed_dim,
                    self.dropout,
                    out_channels=int(mult * M),
                    kernel_size=self.conv_kernel_size,
                    dims=self.dims,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    use_pallas_norm=self.use_pallas_norm,
                    dtype=self.dtype,
                    train=train,
                    name=f"down_{block}_res",
                )(h, emb)
                ch = int(mult * M)
                if ds in self.attention_resolutions:
                    h = attn(ch, f"down_{block}_attn")(h)
                hs.append(h)
                block += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(
                    ch,
                    self.conv_resample,
                    dims=self.dims,
                    out_channels=ch,
                    dtype=self.dtype,
                    name=f"down_{block}_downsample",
                )(h)
                hs.append(h)
                ds *= 2
                block += 1

        # --- middle ---------------------------------------------------------
        mid_args = dict(
            emb_channels=embed_dim,
            dropout=self.dropout,
            kernel_size=self.conv_kernel_size,
            dims=self.dims,
            use_scale_shift_norm=self.use_scale_shift_norm,
            use_pallas_norm=self.use_pallas_norm,
            dtype=self.dtype,
        )
        h = res_block(ch, **mid_args, train=train, name="mid_res1")(h, emb)
        h = attn(ch, "mid_attn")(h)
        h = res_block(ch, **mid_args, train=train, name="mid_res2")(h, emb)

        # --- up path ---------------------------------------------------------
        block = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res_block(
                    ch + skip.shape[-1],
                    embed_dim,
                    self.dropout,
                    out_channels=int(mult * M),
                    kernel_size=self.conv_kernel_size,
                    dims=self.dims,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    use_pallas_norm=self.use_pallas_norm,
                    dtype=self.dtype,
                    train=train,
                    name=f"up_{block}_res",
                )(h, emb)
                ch = int(mult * M)
                if ds in self.attention_resolutions:
                    h = attn(ch, f"up_{block}_attn")(h)
                if level and i == self.num_res_blocks:
                    h = Upsample(
                        ch,
                        self.conv_resample,
                        dims=self.dims,
                        out_channels=ch,
                        kernel_size=self.conv_kernel_size,
                        dtype=self.dtype,
                        name=f"up_{block}_upsample",
                    )(h)
                    ds //= 2
                block += 1
        assert not hs

        # --- out head ---------------------------------------------------------
        h = Norm32(silu=True, use_pallas=self.use_pallas_norm, name="out_norm")(h)
        h = conv_nd(
            self.dims,
            self.out_channels,
            self.conv_kernel_size,
            zero_init=True,
            dtype=self.dtype,
            name="out_conv",
        )(h)
        return h.astype(jnp.float32)
