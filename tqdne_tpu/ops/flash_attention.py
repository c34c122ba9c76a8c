"""Fused flash-attention Pallas TPU kernel.

Replaces the reference's optional flash_attn CUDA dependency
(/root/reference/tqdne/blocks.py:193-230, off by default in every
config) with a TPU-native fused kernel: tiled online-softmax attention
that never materializes the (L, L) score matrix in HBM — O(L) memory,
one VMEM-resident pass per query tile.

Numerics match tqdne_tpu.nn.attention.qkv_attention exactly: the
sqrt(sqrt(d)) double scaling on q and k, softmax accumulated in float32.

The backward pass is a tiled Pallas kernel pair (FlashAttention-2
recipe): the forward saves the per-row log-sum-exp, the backward
recomputes score tiles in VMEM and accumulates dQ (k-inner grid) and
dK/dV (q-inner grid) without ever materializing the (L, L) matrix —
so both training AND inference are O(L) memory (round 1's einsum-
recompute VJP was O(L^2), which OOMed long-context training).

Round-4 VPU/layout optimizations (BENCH_NOTES r2 flagged the kernel's
exp time ~3.4 ms and layout copies ~1.7 ms as the last non-conv costs
of the 1D forward):

- **Base-2 softmax**: the TPU transcendental unit natively computes
  exp2; ``exp(x)`` lowers to ``exp2(x * log2 e)`` with a per-element
  multiply.  We fold ``sqrt(log2 e)`` into the q/k pre-scale (one
  O(L*D) multiply instead of O(L^2)), track the running max and the
  saved log-sum-exp in base 2, and call ``exp2`` directly; the
  backward folds the compensating ``ln 2`` into its O(L*D) finalize
  scale.  Same softmax values, fewer O(L^2) VPU ops.
- **Static mask elision**: whether a tile needs padding masks is known
  at trace time (lengths and block sizes are static), so the in-kernel
  ``iota + compare + select`` chains (3-4 O(L^2) VPU ops) are emitted
  only when the sequence actually pads (or the mask is causal), and
  then only as broadcast row/column masks, never a full 2-D mask.
- **Packed I/O: tried and killed.**  Indexing the native (B, L, H, D)
  arrays straight from the grid (index maps decomposing the batch*head
  program id) would remove the four O(B L H D) HBM layout copies
  around the kernel, and it passes in interpreter mode — but the
  Mosaic TPU lowering rejects the required (1, block, 1, D) block
  shape (the second-to-last block dim must be a multiple of 8 or the
  full axis, and the head axis is neither).  Making it legal means an
  all-heads-resident kernel (block (1, block, H, D), batched per-head
  matmuls), a redesign whose ceiling is the measured ~1.7 ms of copies
  on a 20 ms forward — not worth the complexity.  The (B*H, L, D)
  transpose layout stays.

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
LOG2E = 1.4426950408889634  # log2(e): base-2 softmax scale
LN2 = 0.6931471805599453  # 1/LOG2E: backward compensation


def _attention_kernel(
    q_ref, k_ref, v_ref, o_ref, *rest, length: int, causal: bool,
    kv_pad: bool, with_lse: bool = False
):
    """3-D grid (batch*head, q-block, k-block) flash attention.

    The k-block axis is the innermost (sequential) grid dimension, so
    Mosaic double-buffers the K/V tile DMAs against the MXU work; the
    online-softmax state (running max, denominator, accumulator) lives in
    VMEM scratch across k iterations of the same q block.  With
    ``with_lse`` the per-row log-sum-exp is written as a second output
    (consumed by the Pallas backward).  All logits, the running max and
    the saved lse are in BASE 2 (see module docstring).
    """
    lse_ref = rest[0] if with_lse else None
    acc_ref, m_ref, l_ref = rest[-3:]
    block_q, d = q_ref.shape[1], q_ref.shape[-1]
    block_k = k_ref.shape[1]
    qi, ki = pl.program_id(1), pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    scale = d**-0.25 * LOG2E**0.5
    q = q_ref[...].reshape(block_q, d).astype(jnp.float32) * scale
    k_tile = k_ref[...].reshape(block_k, d).astype(jnp.float32) * scale
    v_tile = v_ref[...].reshape(block_k, d).astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k_tile, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, block_k), base-2 logits

    if causal:
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        mask = k_pos <= q_pos
        if kv_pad:
            mask &= k_pos < length
        s = jnp.where(mask, s, NEG_INF)
    elif kv_pad:
        # padding only depends on the key position: a (1, block_k) row
        # mask broadcast over queries, not a full 2-D mask
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        s = jnp.where(k_pos < length, s, NEG_INF)

    m_prev = m_ref[:, 0]
    l_prev = l_ref[:, 0]
    m_cur = jnp.max(s, axis=-1)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next[:, None])
    l_ref[:, 0] = l_prev * alpha + jnp.sum(p, axis=-1)
    m_ref[:, 0] = m_next
    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
        p, v_tile, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == num_k - 1)
    def _finalize():
        out = acc_ref[:] / jnp.maximum(l_ref[:, 0], 1e-30)[:, None]
        o_ref[...] = out.reshape(o_ref.shape).astype(o_ref.dtype)
        if lse_ref is not None:
            lse2 = m_ref[:, 0] + jnp.log2(jnp.maximum(l_ref[:, 0], 1e-30))
            lse_ref[...] = lse2.reshape(lse_ref.shape)


def _pad_blocks(q, k, v, length, block_q, block_k):
    """Pad the sequence axis (axis 1 in either layout) to the block size."""
    block_q = min(block_q, max(length, 8))
    block_k = min(block_k, max(length, 128))
    pad_q = (-length) % block_q
    pad_k = (-length) % block_k
    pad = [(0, 0)] * q.ndim
    pad[1] = (0, pad_q)
    qp = jnp.pad(q, pad)
    pad[1] = (0, pad_k)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    return qp, kp, vp, block_q, block_k


def _specs(block, d, extra=0):
    """BlockSpec for a (q-indexed or k-indexed) operand: (1, block, d)
    over (B*H, Lpad, D).  ``extra`` selects which grid axis (1=q, 2=k)
    walks the sequence."""

    def idx_q(bh, i, j):
        return (bh, i, 0)

    def idx_k(bh, i, j):
        return (bh, j, 0)

    return pl.BlockSpec((1, block, d), idx_k if extra == 2 else idx_q)


def _flash_forward(q, k, v, *, causal: bool, block_q: int, block_k: int, interpret: bool,
                   return_lse: bool = False):
    b, length, h, d = q.shape
    assert d <= 128, f"head_dim {d} > 128 not supported (lane tile)"

    # (B, L, H, D) -> (B*H, L, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, length, d)

    qp, kp, vp, block_q, block_k = _pad_blocks(to_bh(q), to_bh(k), to_bh(v), length,
                                               block_q, block_k)
    lq, lk = qp.shape[1], kp.shape[1]

    grid = (b * h, lq // block_q, lk // block_k)
    out_shapes = [jax.ShapeDtypeStruct((b * h, lq, d), q.dtype)]
    out_specs = [_specs(block_q, d, 1)]
    if return_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b * h, lq, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((1, block_q, 1), lambda bh, i, j: (bh, i, 0)))
    res = pl.pallas_call(
        functools.partial(_attention_kernel, length=length, causal=causal,
                          kv_pad=lk > length, with_lse=return_lse),
        grid=grid,
        in_specs=[
            _specs(block_q, d, 1),
            _specs(block_k, d, 2),
            _specs(block_k, d, 2),
        ],
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shapes if return_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)

    out_p, lse = (res[0], res[1]) if return_lse else (res, None)
    out = out_p[:, :length].reshape(b, h, length, d).transpose(0, 2, 1, 3)
    if return_lse:
        return out, out_p, lse  # out_p/lse stay in the kernel's padded layout
    return out


def _bwd_dkdv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dk_ref, dv_ref,
                     dk_acc, dv_acc, *, length: int, causal: bool,
                     q_pad: bool, kv_pad: bool):
    """Grid (B*H, k-block, q-block[inner]): accumulate dK/dV for one key
    tile over all query tiles.  Scores are computed TRANSPOSED
    (block_k, block_q) so the per-row lse/delta broadcast along lanes.
    Base-2 logits/lse; the missing ln2 factor on dS is folded into the
    finalize scale (dV uses P itself, which needs no compensation)."""
    block_q, d = q_ref.shape[1], q_ref.shape[-1]
    block_k = k_ref.shape[1]
    kj, qi = pl.program_id(1), pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    scale = d**-0.25 * LOG2E**0.5
    q = q_ref[...].reshape(block_q, d).astype(jnp.float32) * scale  # pre-scaled q'
    k = k_ref[...].reshape(block_k, d).astype(jnp.float32) * scale  # pre-scaled k'
    v = v_ref[...].reshape(block_k, d).astype(jnp.float32)
    do = do_ref[...].reshape(block_q, d).astype(jnp.float32)
    lse = lse_ref[...].reshape(block_q)  # base-2
    delta = delta_ref[...].reshape(block_q)

    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, bq) = S^T, base-2
    p_t = jnp.exp2(s_t - lse[None, :])  # (bk, bq) = P^T
    if causal:
        k_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0)
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1)
        mask = k_pos <= q_pos
        if kv_pad:
            mask &= k_pos < length
        if q_pad:
            mask &= q_pos < length
        p_t = jnp.where(mask, p_t, 0.0)
    else:
        if kv_pad:
            k_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
            p_t = jnp.where(k_pos < length, p_t, 0.0)
        if q_pad:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (1, block_q), 1)
            p_t = jnp.where(q_pos < length, p_t, 0.0)

    dv_acc[:] += jax.lax.dot_general(
        p_t, do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, bq) = (dO V^T)^T
    ds_t = p_t * (dp_t - delta[None, :])
    dk_acc[:] += jax.lax.dot_general(
        ds_t, q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # dK' = dS^T Q' (up to the ln2 folded into _finalize)

    @pl.when(qi == num_q - 1)
    def _finalize():
        # dK = scale * ln2 * dK': the base-2 chain rule's d exp2 = ln2 exp2
        dk_ref[...] = (dk_acc[:] * (scale * LN2)).reshape(dk_ref.shape).astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[:].reshape(dv_ref.shape).astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref, dq_acc,
                   *, length: int, causal: bool, q_pad: bool, kv_pad: bool):
    """Grid (B*H, q-block, k-block[inner]): accumulate dQ for one query
    tile over all key tiles (same transposed-score trick)."""
    block_q, d = q_ref.shape[1], q_ref.shape[-1]
    block_k = k_ref.shape[1]
    qi, kj = pl.program_id(1), pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    scale = d**-0.25 * LOG2E**0.5
    q = q_ref[...].reshape(block_q, d).astype(jnp.float32) * scale
    k = k_ref[...].reshape(block_k, d).astype(jnp.float32) * scale
    v = v_ref[...].reshape(block_k, d).astype(jnp.float32)
    do = do_ref[...].reshape(block_q, d).astype(jnp.float32)
    lse = lse_ref[...].reshape(block_q)
    delta = delta_ref[...].reshape(block_q)

    s_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bk, bq), base-2
    p_t = jnp.exp2(s_t - lse[None, :])
    if causal:
        k_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 0)
        q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_k, block_q), 1)
        mask = k_pos <= q_pos
        if kv_pad:
            mask &= k_pos < length
        if q_pad:
            mask &= q_pos < length
        p_t = jnp.where(mask, p_t, 0.0)
    else:
        if kv_pad:
            k_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
            p_t = jnp.where(k_pos < length, p_t, 0.0)
        if q_pad:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (1, block_q), 1)
            p_t = jnp.where(q_pos < length, p_t, 0.0)
    dp_t = jax.lax.dot_general(
        v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds_t = p_t * (dp_t - delta[None, :])  # (bk, bq) = dS^T (missing ln2, folded below)
    # dQ' = dS K' = (dS^T)^T K': contract the key axis (sublanes of both)
    dq_acc[:] += jax.lax.dot_general(
        ds_t, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, d)

    @pl.when(kj == num_k - 1)
    def _finalize():
        dq_ref[...] = (dq_acc[:] * (scale * LN2)).reshape(dq_ref.shape).astype(dq_ref.dtype)


def _flash_backward(q, k, v, out_p, lse, g, *, causal: bool, block_q: int, block_k: int,
                    interpret: bool):
    b, length, h, d = q.shape

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, length, d)

    qp, kp, vp, block_q, block_k = _pad_blocks(to_bh(q), to_bh(k), to_bh(v), length,
                                               block_q, block_k)
    lq, lk = qp.shape[1], kp.shape[1]
    gp = jnp.pad(to_bh(g), ((0, 0), (0, lq - length), (0, 0)))
    # delta_i = sum_d dO_id * O_id, in the kernel's padded layout
    delta = jnp.sum(gp.astype(jnp.float32) * out_p.astype(jnp.float32), axis=-1)[..., None]

    nq, nk = lq // block_q, lk // block_k

    def scalar_spec(block, extra):
        def idx(bh, a, b_):
            i = (a, b_)[extra]
            return (bh, i, 0)

        return pl.BlockSpec((1, block, 1), idx)

    # q-indexed operands walk grid axis `extra`; for dK/dV q is the INNER
    # grid axis (extra=1 -> b_), for dQ it's the outer one (extra=0 -> a)
    def op_specs(q_axis: int):
        k_axis = 1 - q_axis
        return [
            _specs(block_q, d, q_axis + 1),
            _specs(block_q, d, q_axis + 1),
            scalar_spec(block_q, q_axis),
            scalar_spec(block_q, q_axis),
            _specs(block_k, d, k_axis + 1),
            _specs(block_k, d, k_axis + 1),
        ]

    kern = dict(length=length, causal=causal, q_pad=lq > length, kv_pad=lk > length)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkdv_kernel, **kern),
        grid=(b * h, nk, nq),
        in_specs=op_specs(q_axis=1),
        out_specs=[
            _specs(block_k, d, 1),
            _specs(block_k, d, 1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, lk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, lk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, gp, lse, delta, kp, vp)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **kern),
        grid=(b * h, nq, nk),
        in_specs=op_specs(q_axis=0),
        out_specs=_specs(block_q, d, 1),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qp, gp, lse, delta, kp, vp)

    def from_bh(x):
        return x[:, :length].reshape(b, h, length, d).transpose(0, 2, 1, 3)

    return from_bh(dq), from_bh(dk), from_bh(dv)


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
    out, out_p, lse = _flash_forward(
        q, k, v, causal=causal, block_q=block_q, block_k=block_k, interpret=interpret,
        return_lse=True,
    )
    return out, (q, k, v, out_p, lse)


def _bwd(causal, block_q, block_k, interpret, res, g):
    q, k, v, out_p, lse = res
    return _flash_backward(
        q, k, v, out_p, lse, g, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )


flash_attention.defvjp(_fwd, _bwd)
