"""Convenience loader factory (parity with
/root/reference/tqdne/dataloader.py:6-30): train loader shuffles and
drops the last partial batch; the validation loader is sequential.
Both land batches directly on the data-parallel mesh."""

from __future__ import annotations

from tqdne_tpu.data.dataset import Dataset
from tqdne_tpu.data.pipeline import BatchLoader
from tqdne_tpu.parallel.mesh import batch_sharding


def get_train_and_val_loader(
    config,
    batch_size: int,
    *,
    cond: bool = False,
    mesh=None,
    val_batch_size: int | None = None,
    keys: tuple[str, ...] | None = None,
    prefetch: int = 2,
):
    representation = config.make_representation()
    train_ds = Dataset(config.datapath, representation, cut=config.t, cond=cond, split="train")
    val_ds = Dataset(config.datapath, representation, cut=config.t, cond=cond,
                     split="validation")
    sharding = batch_sharding(mesh) if mesh is not None else None
    train_loader = BatchLoader(
        train_ds, batch_size, shuffle=True, drop_last=True, sharding=sharding,
        prefetch=prefetch, keys=keys,
    )
    val_loader = BatchLoader(
        val_ds, val_batch_size or batch_size, shuffle=False, drop_last=True,
        sharding=sharding, prefetch=prefetch, keys=keys,
    )
    return train_loader, val_loader
