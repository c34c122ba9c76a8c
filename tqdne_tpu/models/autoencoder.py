"""KL-regularized convolutional VAE (flax.linen, channels-last).

Parity with /root/reference/tqdne/autoencoder.py and the Encoder/Decoder
stacks in blocks.py:263-436: a conv downstack encoder producing
2*latent_channels outputs (chunked into mean / log_std on the channel
axis), reparameterized sampling, a conv upstack decoder, and the
recon-MSE + kl_weight * KL training loss (sum over channels, mean over
the rest — matching th.sum(dim=1) in autoencoder.py:54-57).

Each channel_mult level halves the spatial dims; with mult (1, 2, 4) the
flagship 2D config maps 128x128x3 spectrograms to 32x32x8 latents.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tqdne_tpu.nn.attention import AttentionBlock
from tqdne_tpu.nn.layers import Downsample, Norm32, Upsample, conv_nd


class PlainResBlock(nn.Module):
    """Residual block without conditioning (blocks.py:233-260 parity)."""

    channels: int
    dropout: float = 0.0
    out_channels: int | None = None
    kernel_size: int = 3
    dims: int = 2
    train: bool = False
    use_pallas_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.channels
        h = Norm32(silu=True, use_pallas=self.use_pallas_norm, name="in_norm")(x)
        h = conv_nd(self.dims, out_ch, self.kernel_size, dtype=self.dtype, name="in_conv")(h)
        h = Norm32(silu=True, use_pallas=self.use_pallas_norm, name="out_norm")(h)
        h = nn.Dropout(rate=self.dropout, deterministic=not self.train)(h)
        h = conv_nd(
            self.dims, out_ch, self.kernel_size, zero_init=True, dtype=self.dtype, name="out_conv"
        )(h)
        skip = x if out_ch == self.channels else conv_nd(
            self.dims, out_ch, 1, dtype=self.dtype, name="skip"
        )(x)
        return skip + h


class Encoder(nn.Module):
    """Conv downstack (blocks.py:263-348 parity)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_kernel_size: int = 3
    conv_resample: bool = True
    dims: int = 2
    num_heads: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = int(self.channel_mult[0] * self.model_channels)
        h = conv_nd(self.dims, ch, self.conv_kernel_size, dtype=self.dtype, name="in_conv")(x)
        ds = 1
        block = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = PlainResBlock(
                    ch,
                    self.dropout,
                    out_channels=int(mult * self.model_channels),
                    kernel_size=self.conv_kernel_size,
                    dims=self.dims,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"down_{block}_res",
                )(h)
                ch = int(mult * self.model_channels)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(
                        ch,
                        num_heads=self.num_heads,
                        dims=self.dims,
                        dtype=self.dtype,
                        name=f"down_{block}_attn",
                    )(h)
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
                ds *= 2
                block += 1
        return conv_nd(
            self.dims, self.out_channels, self.conv_kernel_size, dtype=self.dtype, name="out_conv"
        )(h)


class Decoder(nn.Module):
    """Conv upstack (blocks.py:351-436 parity)."""

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_kernel_size: int = 3
    conv_resample: bool = True
    dims: int = 2
    num_heads: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ch = int(self.channel_mult[-1] * self.model_channels)
        h = conv_nd(self.dims, ch, self.conv_kernel_size, dtype=self.dtype, name="in_conv")(x)
        ds = 2 ** (len(self.channel_mult) - 1)
        block = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            if level != len(self.channel_mult) - 1:
                h = Upsample(
                    ch,
                    self.conv_resample,
                    dims=self.dims,
                    out_channels=ch,
                    dtype=self.dtype,
                    name=f"up_{block}_upsample",
                )(h)
                ds //= 2
                block += 1
            for _ in range(self.num_res_blocks):
                h = PlainResBlock(
                    ch,
                    self.dropout,
                    out_channels=int(mult * self.model_channels),
                    kernel_size=self.conv_kernel_size,
                    dims=self.dims,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"up_{block}_res",
                )(h)
                ch = int(mult * self.model_channels)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(
                        ch,
                        num_heads=self.num_heads,
                        dims=self.dims,
                        dtype=self.dtype,
                        name=f"up_{block}_attn",
                    )(h)
                block += 1
        return conv_nd(
            self.dims, self.out_channels, self.conv_kernel_size, dtype=self.dtype, name="out_conv"
        )(h)


class AutoencoderKL(nn.Module):
    """VAE: encode -> (mean, log_std) -> reparameterize -> decode.

    Methods are exposed for use inside pjit-ed train steps via
    ``model.apply(params, x, method="encode", rngs={"sample": key})``.
    """

    encoder_config: dict
    decoder_config: dict
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        common = dict(train=self.train, dtype=self.dtype)
        self.encoder = Encoder(**{**dict(self.encoder_config), **common}, name="encoder")
        self.decoder = Decoder(**{**dict(self.decoder_config), **common}, name="decoder")

    def moments(self, x):
        """Encoder output chunked into (mean, log_std) on the channel axis."""
        mean, log_std = jnp.split(self.encoder(x), 2, axis=-1)
        return mean, log_std

    def encode(self, x):
        """Stochastic latent: mean + eps * exp(log_std) (autoencoder.py:37-43)."""
        mean, log_std = self.moments(x)
        eps = jax.random.normal(self.make_rng("sample"), mean.shape, dtype=mean.dtype)
        return mean + eps * jnp.exp(log_std)

    def encode_mean(self, x):
        """Deterministic latent (posterior mean) — for parity testing."""
        return self.moments(x)[0]

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x):
        return self.decode(self.encode(x))


def kl_divergence(mean: jax.Array, log_std: jax.Array) -> jax.Array:
    """KL(q || N(0, I)), summed over the channel (last) axis.

    Matches autoencoder.py:54-57 (th.sum over dim=1, the torch channel
    axis), keeping spatial dims: returns shape mean.shape[:-1].
    """
    log_var = 2.0 * log_std
    return 0.5 * jnp.sum(mean**2 + jnp.exp(log_var) - log_var - 1.0, axis=-1)
