"""Small pytree / array utilities.

Parity notes: `append_dims` mirrors the broadcast helper of the reference
(/root/reference/tqdne/nn.py:78-83) but appends trailing axes for a
channels-last layout, which on TPU keeps the lane dimension (= channels)
last where the VPU wants it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def append_dims(x: jax.Array, target_ndim: int) -> jax.Array:
    """Append size-1 trailing axes until ``x.ndim == target_ndim``."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"input has {x.ndim} dims but target_ndim is {target_ndim}")
    return x[(...,) + (None,) * dims_to_append]


def count_params(tree) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def to_numpy(x):
    """Recursively convert JAX arrays / nested containers to numpy."""
    if isinstance(x, dict):
        return {k: to_numpy(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return type(x)(to_numpy(v) for v in x)
    if isinstance(x, (jax.Array, jnp.ndarray)):
        return np.asarray(x)
    return x
