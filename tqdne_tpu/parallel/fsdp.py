"""FSDP-style parameter sharding (scaling headroom beyond the reference).

The reference replicates parameters on every DDP rank (SURVEY §2.4); at
reference scale (~10^8 params) that is also our default. For larger
models, shard each large parameter across the `data` axis and let GSPMD
insert the per-layer all-gathers (weights) and reduce-scatters (grads)
over ICI — the standard JAX fsdp recipe: annotate shardings, let XLA
place collectives.

Pure-annotation implementation: `fsdp_shardings` picks, for every leaf
above `min_size` elements, the largest axis divisible by the mesh size
and shards it; everything else stays replicated. Works with the existing
train steps unchanged — only the device_put of the TrainState and the
jit in_shardings change.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(shape: tuple[int, ...], n_shards: int, min_size: int) -> P:
    if int(np.prod(shape)) < min_size:
        return P()
    # shard the largest divisible axis
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % n_shards == 0 and shape[axis] >= n_shards:
            spec = [None] * len(shape)
            spec[axis] = "data"
            return P(*spec)
    return P()


def fsdp_shardings(tree, mesh: Mesh, *, axis: str = "data", min_size: int = 2**16):
    """Pytree of NamedShardings: large leaves sharded over ``axis``."""
    n = mesh.shape[axis]

    def spec(leaf):
        return NamedSharding(mesh, _leaf_spec(np.shape(leaf), n, min_size))

    return jax.tree_util.tree_map(spec, tree)


def shard_params(tree, mesh: Mesh, *, min_size: int = 2**16):
    """device_put a parameter pytree with fsdp shardings."""
    shardings = fsdp_shardings(tree, mesh, min_size=min_size)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def fsdp_state_shardings(state, mesh: Mesh, *, min_size: int = 2**16):
    """Shardings for a whole TrainState: params / ema / optimizer moments all
    follow the parameter layout (step stays replicated)."""
    return fsdp_shardings(state, mesh, min_size=min_size)
