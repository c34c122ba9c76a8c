"""Fused GroupNorm(32) + SiLU Pallas TPU kernel.

The UNet evaluates ~50 GroupNorm->SiLU pairs per forward (every ResBlock
in_layers/out_layers, /root/reference/tqdne/unet.py:85-103); in fp32
(GroupNorm32 semantics) each costs multiple HBM passes when XLA doesn't
fuse across the cast boundaries.  This kernel does the whole thing in
one VMEM pass per sample: group statistics, normalize, affine, SiLU —
activations enter in model dtype, statistics accumulate in fp32, output
returns in model dtype (Norm32 parity).

Forward-fused with a recompute backward (custom_vjp over the XLA
reference implementation) — same pattern as ops.flash_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float,
                    apply_silu: bool):
    """Mosaic-friendly formulation: group statistics via one-hot matmuls so
    every intermediate stays 2-D with channels on the lane dimension (a
    (S, G, C/G) reshape would put C/G < 128 on the lanes)."""
    x = x_ref[0].astype(jnp.float32)  # (S, C) — spatial flattened, channels last
    s, c = x.shape
    gsize = c // groups
    n = float(s * gsize)

    # (C, G) one-hot group membership
    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // gsize
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    member = (ch_group == gid).astype(jnp.float32)

    sum_c = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    sumsq_c = jnp.sum(x * x, axis=0, keepdims=True)
    hp = jax.lax.Precision.HIGHEST  # exact f32 sums (default uses bf16 passes)
    sum_g = jax.lax.dot_general(sum_c, member, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32, precision=hp)  # (1, G)
    sumsq_g = jax.lax.dot_general(sumsq_c, member, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32, precision=hp)
    mean_g = sum_g / n
    var_g = sumsq_g / n - mean_g * mean_g

    # broadcast group stats back to channels: (1, G) @ (G, C)
    member_t = member.T  # (G, C)
    mean_c = jax.lax.dot_general(mean_g, member_t, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32, precision=hp)  # (1, C)
    rstd_c = jax.lax.dot_general(jax.lax.rsqrt(var_g + eps), member_t,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32, precision=hp)

    out = (x - mean_c) * rstd_c
    out = out * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _reference(x, scale, bias, groups, eps, apply_silu):
    """XLA reference (Norm32 + silu) for the backward pass and parity tests."""
    shape = x.shape
    c = shape[-1]
    xf = x.astype(jnp.float32).reshape(shape[0], -1, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 3), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(shape[0], -1, c)
    out = xn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if apply_silu:
        out = out * jax.nn.sigmoid(out)
    return out.reshape(shape).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_silu(
    x, scale, bias, groups: int = 32, eps: float = 1e-5, apply_silu: bool = True,
    interpret: bool = False,
):
    """Fused fp32 GroupNorm + affine + optional SiLU over channels-last
    (B, *spatial, C) activations; one Pallas program per sample."""
    shape = x.shape
    b, c = shape[0], shape[-1]
    spatial = 1
    for s in shape[1:-1]:
        spatial *= s
    xf = x.reshape(b, spatial, c)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps, apply_silu=apply_silu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, spatial, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, spatial, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, spatial, c), x.dtype),
        interpret=interpret,
    )(xf, scale, bias)
    return out.reshape(shape)


def _fwd(x, scale, bias, groups, eps, apply_silu, interpret):
    return group_norm_silu(x, scale, bias, groups, eps, apply_silu, interpret), (x, scale, bias)


def _bwd(groups, eps, apply_silu, interpret, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _reference(
            x.reshape(x.shape[0], -1, x.shape[-1]).reshape(x.shape), s, b, groups, eps,
            apply_silu,
        ),
        x, scale, bias,
    )
    return vjp(g)


group_norm_silu.defvjp(_fwd, _bwd)
