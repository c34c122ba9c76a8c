"""NN primitives (flax.linen, channels-last).

Functional parity with /root/reference/tqdne/nn.py and blocks.py:
fp32 GroupNorm with cast-back, dim-dispatched convolutions, zero-init
output convolutions, Gaussian Fourier feature embeddings, nearest-x2
upsampling and stride-2 downsampling.

TPU-first design notes:
- channels-last everywhere: the channel axis rides the 128-wide lane
  dimension, convolutions lower to MXU matmuls without transposes;
- `dtype` is the compute dtype (use bfloat16 on TPU for 2x MXU
  throughput), params stay float32; GroupNorm always normalizes in
  fp32 and casts back, mirroring GroupNorm32 (nn.py:11-13);
- stride-2 convs use explicit symmetric (k//2, k//2) padding to match
  torch's padding=k//2 semantics (XLA 'SAME' pads asymmetrically for
  stride 2, which would break checkpoint-weight parity).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def norm_layer(name: str | None = None, groups: int = 32):
    """fp32 GroupNorm(32) with cast back to input dtype (GroupNorm32 parity)."""
    return nn.GroupNorm(
        num_groups=groups,
        epsilon=1e-5,  # torch nn.GroupNorm default
        dtype=jnp.float32,
        param_dtype=jnp.float32,
        name=name,
    )


class _Affine(nn.Module):
    """scale/bias parameters with flax-GroupNorm-compatible names."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


def group_norm_lanes(x, scale, bias, groups: int, eps: float = 1e-5,
                     silu: bool = False):
    """fp32 GroupNorm statistics computed channel-wise first.

    flax's GroupNorm reshapes (..., C) -> (..., G, C/G) and reduces over
    (spatial, C/G); on TPU the channel axis rides the 128-wide lane
    dimension, so that reduction becomes a cross-lane segment reduction
    (the profiled convert_reduce_fusion wall in the flagship sampler,
    ~5x over the HBM roofline).  Here statistics are taken over the
    spatial axes only — channels stay on lanes, the reduce is a clean
    sublane accumulation — and the tiny (B, C) -> (B, G) combine follows.
    Same math as torch GroupNorm / flax use_fast_variance (E[x^2]-E[x]^2,
    eps inside rsqrt), fp32 throughout, output cast back to input dtype.
    """
    b, c = x.shape[0], x.shape[-1]
    gsize = c // groups
    spatial_axes = tuple(range(1, x.ndim - 1))
    n = float(gsize * _prod(x.shape[1:-1]))

    xf = x.astype(jnp.float32)
    sum_c = jnp.sum(xf, axis=spatial_axes)  # (B, C): lanes preserved
    sumsq_c = jnp.sum(xf * xf, axis=spatial_axes)  # (B, C)
    sum_g = sum_c.reshape(b, groups, gsize).sum(-1)  # (B, G): tiny
    sumsq_g = sumsq_c.reshape(b, groups, gsize).sum(-1)
    mean_g = sum_g / n
    rstd_g = jax.lax.rsqrt(jnp.maximum(sumsq_g / n - mean_g * mean_g, 0.0) + eps)

    # per-channel affine folded with the group stats: out = x*a + b
    a_c = jnp.repeat(rstd_g, gsize, axis=-1) * scale.astype(jnp.float32)  # (B, C)
    b_c = bias.astype(jnp.float32) - jnp.repeat(mean_g * rstd_g, gsize, axis=-1) * scale.astype(jnp.float32)
    bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
    out = xf * a_c.reshape(bshape) + b_c.reshape(bshape)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _prod(xs):
    p = 1
    for v in xs:
        p *= v
    return p


class Norm32(nn.Module):
    """GroupNorm(32) computed in float32, output cast back to input dtype.

    For narrow layers (channels < 32) the group count drops to the channel
    count; the reference never instantiates that case (all normed layers
    have >= 64 channels), so parity is unaffected.

    ``silu=True`` appends the activation.  Three implementations, all with
    identical parameter paths (<scope>/GroupNorm_0/{scale,bias}) so
    checkpoints are interchangeable:
    - "flax" (default): plain flax GroupNorm — measured fastest end-to-end
      (196 vs 181 wf/s, see comment below);
    - "lanes": spatial-first statistics that keep channels on the TPU
      lane dimension (group_norm_lanes above), kept for A/B;
    - ``use_pallas=True``: fused Pallas kernel (tqdne_tpu.ops.group_norm)
      — measured slower end-to-end (breaks XLA conv fusion), kept as a
      counter-example.
    """

    # "flax" measured 196 wf/s vs "lanes" 181 on the flagship sampler (v5e,
    # batch 64, clean A/B) — XLA's reshape-reduce lowering beats the
    # spatial-first two-reduction formulation; lanes kept as the measured
    # counter-example (BENCH_NOTES.md round 2).
    groups: int = 32
    silu: bool = False
    use_pallas: bool = False
    impl: str = "flax"

    @nn.compact
    def __call__(self, x):
        import math

        groups = math.gcd(self.groups, x.shape[-1])
        if self.use_pallas:
            import jax

            from tqdne_tpu.ops.group_norm import group_norm_silu

            scale, bias = _Affine(x.shape[-1], name="GroupNorm_0")()
            # interpret mode on CPU so tests exercise the same code path
            return group_norm_silu(
                x, scale, bias, groups, 1e-5, self.silu,
                jax.default_backend() == "cpu",
            )
        import os

        impl = os.environ.get("TQDNE_GN_IMPL", self.impl)
        if impl == "lanes":
            scale, bias = _Affine(x.shape[-1], name="GroupNorm_0")()
            return group_norm_lanes(x, scale, bias, groups, 1e-5, self.silu)
        if impl == "skip":  # timing ceiling probe ONLY: affine, no normalization
            scale, bias = _Affine(x.shape[-1], name="GroupNorm_0")()
            out = x * scale.astype(x.dtype) + bias.astype(x.dtype)
            return nn.silu(out) if self.silu else out
        if impl == "bf16":  # quality-gated fast mode: statistics in bf16
            out = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=x.dtype,
                               param_dtype=jnp.float32)(x)
            return nn.silu(out) if self.silu else out
        # no explicit pre-cast: GroupNorm(dtype=f32) promotes internally
        # (identical math; lets XLA fuse the convert into the reductions —
        # measured +3% on the flagship sampler)
        out = norm_layer(groups=groups)(x).astype(x.dtype)
        return nn.silu(out) if self.silu else out


def conv_nd(
    dims: int,
    features: int,
    kernel_size: int,
    *,
    stride: int = 1,
    padding="SAME",
    zero_init: bool = False,
    dtype=jnp.float32,
    name: str | None = None,
) -> nn.Conv:
    """1D/2D/3D convolution (channels-last), optional zero initialization.

    Mirrors conv_nd (/root/reference/tqdne/nn.py:16-24) + zero_module
    (nn.py:59-63).  For stride > 1 explicit (k//2, k//2) padding is used
    (see module docstring).
    """
    if dims not in (1, 2, 3):
        raise ValueError(f"unsupported dims: {dims}")
    if stride != 1 and padding == "SAME":
        padding = [(kernel_size // 2, kernel_size // 2)] * dims
    kernel_init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    from tqdne_tpu.nn import quant

    if quant.int8_enabled():
        # quality-gated fast mode: int8 MXU convolutions (2x bf16 TOPS on
        # v5e); same param structure, different numerics — see nn/quant.py
        return quant.QuantConv(
            features=features,
            kernel_size=(kernel_size,) * dims,
            strides=(stride,) * dims,
            padding=padding,
            kernel_init=kernel_init,
            bias_init=nn.initializers.zeros,
            dtype=dtype,
            name=name,
        )
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size,) * dims,
        strides=(stride,) * dims,
        padding=padding,
        kernel_init=kernel_init,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class GaussianFourierProjection(nn.Module):
    """Random Fourier feature embedding (blocks.py:15-26 parity).

    W ~ N(0, scale^2), frozen (stop_gradient).  Input (..., ) scalar per
    element; output (..., channels) = [sin(2 pi x W), cos(2 pi x W)].
    """

    channels: int
    scale: float = 0.02

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.channels // 2,),
        )
        w = jax.lax.stop_gradient(w)
        h = x[..., None].astype(jnp.float32) * w * (2 * jnp.pi)
        return jnp.concatenate([jnp.sin(h), jnp.cos(h)], axis=-1).astype(x.dtype)


class Upsample(nn.Module):
    """Nearest-neighbor x2 upsampling + optional conv (blocks.py:29-66 parity)."""

    channels: int
    use_conv: bool = True
    dims: int = 2
    out_channels: int | None = None
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, *spatial, C); repeat each spatial axis by 2 (nearest).
        for axis in range(1, 1 + self.dims):
            x = jnp.repeat(x, 2, axis=axis)
        if self.use_conv:
            x = conv_nd(
                self.dims,
                self.out_channels or self.channels,
                self.kernel_size,
                dtype=self.dtype,
                name="conv",
            )(x)
        return x


class Downsample(nn.Module):
    """Stride-2 conv or avg-pool downsampling (blocks.py:69-108 parity)."""

    channels: int
    use_conv: bool = True
    dims: int = 2
    out_channels: int | None = None
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return conv_nd(
                self.dims,
                self.out_channels or self.channels,
                self.kernel_size,
                stride=2,
                dtype=self.dtype,
                name="op",
            )(x)
        assert (self.out_channels or self.channels) == self.channels
        window = (2,) * self.dims
        return nn.avg_pool(x, window_shape=window, strides=window)


class MLP(nn.Module):
    """Dense -> SiLU -> Dense, the reference's embedding MLP shape."""

    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
