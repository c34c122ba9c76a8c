"""Fused flash-attention Pallas TPU kernel.

Replaces the reference's optional flash_attn CUDA dependency
(/root/reference/tqdne/blocks.py:193-230, off by default in every
config) with a TPU-native fused kernel: tiled online-softmax attention
that never materializes the (L, L) score matrix in HBM — O(L) memory,
one VMEM-resident pass per query tile.

Numerics match tqdne_tpu.nn.attention.qkv_attention exactly: the
sqrt(sqrt(d)) double scaling on q and k, softmax accumulated in float32.
The backward pass recomputes attention via the einsum reference
implementation under jax.custom_vjp (correct gradients; the fused
forward is what the sampling hot loop needs — training-time attention is
a tiny fraction of the UNet FLOPs at reference sequence lengths).

Layout: (B, L, H, D) channels-last, D <= 128 (one MXU lane tile); L is
padded to the query/key block size with masked keys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attention_kernel(
    q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, length: int, causal: bool
):
    """3-D grid (batch*head, q-block, k-block) flash attention.

    The k-block axis is the innermost (sequential) grid dimension, so
    Mosaic double-buffers the K/V tile DMAs against the MXU work; the
    online-softmax state (running max, denominator, accumulator) lives in
    VMEM scratch across k iterations of the same q block.
    """
    block_q, d = q_ref.shape[-2], q_ref.shape[-1]
    block_k = k_ref.shape[-2]
    qi, ki = pl.program_id(1), pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    scale = d**-0.25
    q = q_ref[0].astype(jnp.float32) * scale
    k_tile = k_ref[0].astype(jnp.float32) * scale
    v_tile = v_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k)

    k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    mask = k_pos < length
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        mask &= k_pos <= q_pos
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_ref[:, 0]
    l_prev = l_ref[:, 0]
    m_cur = jnp.max(s, axis=-1)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, None])
    l_ref[:, 0] = l_prev * alpha + jnp.sum(p, axis=-1)
    m_ref[:, 0] = m_next
    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
        p, v_tile, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == num_k - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, 0], 1e-30)[:, None]).astype(o_ref.dtype)


def _flash_forward(q, k, v, *, causal: bool, block_q: int, block_k: int, interpret: bool):
    b, length, h, d = q.shape
    assert d <= 128, f"head_dim {d} > 128 not supported (lane tile)"

    # (B, L, H, D) -> (B*H, L, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, length, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    block_q = min(block_q, max(length, 8))
    block_k = min(block_k, max(length, 128))
    pad_q = (-length) % block_q
    pad_k = (-length) % block_k
    qp = jnp.pad(qb, ((0, 0), (0, pad_q), (0, 0)))
    kp = jnp.pad(kb, ((0, 0), (0, pad_k), (0, 0)))
    vp = jnp.pad(vb, ((0, 0), (0, pad_k), (0, 0)))
    lq, lk = length + pad_q, length + pad_k

    grid = (b * h, lq // block_q, lk // block_k)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, length=length, causal=causal),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :length].reshape(b, h, length, d).transpose(0, 2, 1, 3)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q, k, v, causal: bool = False, block_q: int = 128, block_k: int = 128,
    interpret: bool = False,
):
    """Fused multi-head attention over (B, L, H, D); returns (B, L, H, D)."""
    return _flash_forward(
        q, k, v, causal=causal, block_q=block_q, block_k=block_k, interpret=interpret
    )


def _fwd(q, k, v, causal, block_q, block_k, interpret):
    out = _flash_forward(
        q, k, v, causal=causal, block_q=block_q, block_k=block_k, interpret=interpret
    )
    return out, (q, k, v)


def _bwd(causal, block_q, block_k, interpret, res, g):
    from tqdne_tpu.nn.attention import qkv_attention

    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: qkv_attention(q, k, v, causal=causal), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
