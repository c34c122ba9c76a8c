"""int8 MXU convolution — a quality-gated fast mode for sampling.

The v5e MXU runs int8 matmuls at 2x bf16 throughput (394 vs 197 TOPS);
the flagship sampler is compute-bound at ~79% MFU (BENCH_NOTES.md), so
the remaining hardware lever past bf16 is 8-bit arithmetic.  This module
provides a drop-in quantized replacement for the framework's conv_nd
path (every ResBlock/Up/Down/qkv convolution routes through it):

- weights: symmetric per-output-channel int8, scales computed from the
  f32 params at call time (params keep their checkpoint dtype/structure;
  under jit the quantize is an O(params) elementwise pass, negligible
  next to the conv FLOPs at sampling batch sizes);
- activations: symmetric per-tensor dynamic int8 (amax over the tensor,
  fused by XLA into the preceding producer);
- accumulation: int32 via `preferred_element_type` so XLA lowers the
  convolution onto the MXU's int8 path;
- dequant: one f32 multiply by (act_scale * channel_scale) + bias, cast
  back to the activation dtype.

This intentionally changes numerics (it is NOT the fp32-GroupNorm parity
contract the default path keeps — reference tqdne/nn.py:11-13); it is
gated behind TQDNE_INT8_CONV=1 / conv_nd(quant="int8") and must only be
used with a measured quality delta (see docs/quality, BENCH_NOTES.md).

Param structure matches flax nn.Conv exactly (`kernel` (*window, in, out)
HWIO, `bias` (out,)) so trained checkpoints are interchangeable between
the f32/bf16 and int8 paths.
"""

from __future__ import annotations

import contextlib
import contextvars
import os

import flax.linen as nn
import jax
import jax.numpy as jnp

# Trace-time scope: conv_nd consults this when the UNet's Python body is
# being traced, so exactly one jitted program (e.g. the sampler) can be
# quantized while everything else in the process (the FID classifier, the
# training step) keeps f32/bf16 convolutions.  The TQDNE_INT8_CONV=1 env
# var is the ambient whole-process variant for bench A/Bs.  NOTE: the
# flag participates in tracing, not in jit cache keys — use distinct
# function objects for quantized and unquantized programs (build_inference
# creates one raw_sample per bundle, which satisfies this).
_INT8_SCOPE = contextvars.ContextVar("tqdne_int8_convs", default=False)


@contextlib.contextmanager
def int8_scope(enabled: bool = True):
    token = _INT8_SCOPE.set(enabled)
    try:
        yield
    finally:
        _INT8_SCOPE.reset(token)


def int8_enabled() -> bool:
    return _INT8_SCOPE.get() or os.environ.get("TQDNE_INT8_CONV") == "1"


def _conv_specs(dims: int):
    # NWC/WIO for 1D, NHWC/HWIO for 2D — flax channels-last conventions
    sp = {1: "W", 2: "HW", 3: "HWD"}[dims]
    return ("N" + sp + "C", sp + "IO", "N" + sp + "C")


def quantize_symmetric(x, axes, eps: float = 1e-8):
    """(q_int8, scale) with q = round(x / scale) clipped to [-127, 127].

    ``axes``: reduction axes for the amax (per-tensor: all axes;
    per-channel weights: all but the output-channel axis).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, eps) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


class QuantConv(nn.Module):
    """int8 x int8 -> int32 convolution, channels-last, nn.Conv-compatible.

    Supports the subset of nn.Conv the UNet uses: square kernels, uniform
    stride, 'SAME' or explicit symmetric padding.
    """

    features: int
    kernel_size: tuple[int, ...]
    strides: tuple[int, ...]
    padding: object = "SAME"
    kernel_init: object = nn.initializers.lecun_normal()
    bias_init: object = nn.initializers.zeros
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dims = len(self.kernel_size)
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (*self.kernel_size, in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)

        # per-output-channel weight scales (reduce over window + in axes)
        wq, w_scale = quantize_symmetric(kernel, axes=tuple(range(kernel.ndim - 1)))
        # per-tensor dynamic activation scale
        xq, x_scale = quantize_symmetric(x, axes=tuple(range(x.ndim)))

        padding = self.padding
        if isinstance(padding, str):
            pad_arg = padding
        else:
            pad_arg = [tuple(p) for p in padding]
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, _conv_specs(dims))
        acc = jax.lax.conv_general_dilated(
            xq, wq,
            window_strides=self.strides,
            padding=pad_arg,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        # fold both scales + bias in one f32 affine; w_scale is
        # (1,...,1,out) -> broadcast over batch/spatial
        out = acc.astype(jnp.float32) * (x_scale.reshape(()) * w_scale.reshape(-1)) + bias
        return out.astype(x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else self.dtype)
