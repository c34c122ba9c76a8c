"""Spatial model parallelism — the conv-family analogue of sequence
parallelism — via GSPMD's spatially partitioned convolutions.

The reference has no model parallelism at all (single-node Lightning DDP
only, /root/reference/experiments/train_latent_edm.py devices=4; SURVEY
§2.4).  On TPU the idiomatic route needs no model changes: lay the
activations out over a 2D mesh ``("data", "model")`` with the batch on
``data`` and the H (2D) / T (1D) axis on ``model``.  GSPMD then
partitions every convolution spatially with halo exchanges over ICI,
inserts the cross-shard psum for GroupNorm's per-sample statistics, and
reshards around the attention blocks — all from the input annotation,
with zero changes to the UNet/VAE code.

This covers two production regimes the pure-dp layout cannot:

- **small-batch / low-latency serving**: a request batch smaller than the
  chip count still uses every chip (speedup from partitioning one
  sample's spatial extent, not from batching requests);
- **activation footprints beyond one chip's HBM**: long 1D waveforms /
  large spectrograms train with each chip holding 1/model of every
  activation (the activation-memory axis; fsdp.py covers the
  parameter-memory axis).

Pipeline (pp) and expert (ep) axes are deliberately absent from this
package: the model family has no MoE layers, and at reference scale
(~10^8 params) the network fits comfortably in one chip's HBM, so
pipelining would only add bubble overhead.  The mesh machinery here
generalizes if either ever appears.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_mesh(model: int, n_devices: int | None = None) -> Mesh:
    """A 2D ``("data", "model")`` mesh with ``model``-way spatial sharding.

    The model axis is laid out innermost so it maps to adjacent devices
    (ICI neighbours on a real slice) — halo exchanges and GroupNorm psums
    ride the fastest links, while the data axis (gradient all-reduce,
    once per step) spans the slower hops.
    """
    devices = np.asarray(jax.devices() if n_devices is None else jax.devices()[:n_devices])
    if devices.size % model:
        raise ValueError(f"{devices.size} devices not divisible by model={model}")
    return Mesh(devices.reshape(devices.size // model, model), ("data", "model"))


def signal_spec(ndim: int) -> P:
    """PartitionSpec for a channels-last signal batch: batch on ``data``,
    the leading spatial axis (T for 1D, H for 2D) on ``model``."""
    if ndim < 3:
        raise ValueError("signal arrays are (B, T, C) or (B, H, W, C)")
    return P("data", "model")


def signal_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    return NamedSharding(mesh, signal_spec(ndim))


def batch_shardings(mesh: Mesh, batch):
    """Shardings for a loader batch dict: signal-like leaves (ndim>=3) are
    spatially sharded, per-sample vectors (cond, labels) ride ``data``."""

    def spec(leaf):
        nd = np.ndim(leaf)
        return NamedSharding(mesh, signal_spec(nd) if nd >= 3 else P("data"))

    return jax.tree_util.tree_map(spec, batch)


def shard_batch(mesh: Mesh, batch):
    """device_put a host batch with spatial shardings."""
    return jax.tree_util.tree_map(jax.device_put, batch, batch_shardings(mesh, batch))
