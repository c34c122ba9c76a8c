"""Orbax checkpointing: top-k by validation loss + always-keep-last.

Parity with the reference's Lightning ModelCheckpoint configuration
(/root/reference/tqdne/training.py:53-65): monitor validation loss,
keep the best 3, always keep the last — implemented as two orbax
CheckpointManagers over the same TrainState pytree (params + EMA +
optimizer state + step, so resume is exact; the reference persists EMA
inside the same checkpoint file, ema.py:50-54).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger("tqdne_tpu")


class Checkpointer:
    def __init__(self, directory: str | Path, max_best: int = 3, monitor: str = "loss",
                 create: bool = True):
        """``create=False`` opens read-only: restoring from a run dir won't
        scatter empty best/last directories when nothing was ever saved."""
        directory = Path(directory).absolute()
        self.directory = directory
        self.monitor = monitor
        # distinct barrier prefixes: both managers save the same step number,
        # and in multi-host runs orbax derives its sync-barrier keys from the
        # step — without a prefix the two managers' barriers collide
        # ("Barrier _async_write_complete.N is already ongoing")
        from orbax.checkpoint import options as ocp_options

        self._best = ocp.CheckpointManager(
            directory / "best",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_best,
                best_fn=lambda m: float(m[monitor]),
                best_mode="min",
                create=create,
                multiprocessing_options=ocp_options.MultiprocessingOptions(
                    barrier_sync_key_prefix="best"
                ),
            ),
        )
        self._last = ocp.CheckpointManager(
            directory / "last",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                create=create,
                multiprocessing_options=ocp_options.MultiprocessingOptions(
                    barrier_sync_key_prefix="last"
                ),
            ),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None):
        self._last.save(step, args=ocp.args.StandardSave(state))
        if metrics is not None and self.monitor in metrics:
            self._best.save(
                step,
                args=ocp.args.StandardSave(state),
                metrics={k: float(v) for k, v in metrics.items()},
            )
        self._last.wait_until_finished()
        self._best.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._last.latest_step()

    def restore_latest(self, template: Any) -> tuple[Any, int] | None:
        """Restore the newest checkpoint; returns (state, step) or None.

        ``template`` is a concrete or abstract (jax.eval_shape) TrainState
        with the right structure/shardings.
        """
        step = self._last.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        state = self._last.restore(step, args=ocp.args.StandardRestore(abstract))
        return state, step

    def restore_latest_raw(self) -> tuple[dict, int] | None:
        """Restore the newest checkpoint as a raw pytree (nested dicts of
        arrays) without a structural template — useful to extract a
        sub-tree (e.g. ema_params of a frozen model) regardless of which
        optimizer state it was trained with."""
        step = self._last.latest_step()
        if step is None:
            return None
        state = self._last.restore(step, args=ocp.args.StandardRestore())
        return state, step

    def restore_best(self, template: Any) -> tuple[Any, int] | None:
        step = self._best.best_step()
        if step is None:
            return self.restore_latest(template)
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        state = self._best.restore(step, args=ocp.args.StandardRestore(abstract))
        return state, step

    # -- hyperparameters-in-checkpoint ---------------------------------------
    # The reference's Lightning modules call save_hyperparameters() so
    # checkpoints are self-describing and load_from_checkpoint needs no
    # config (/root/reference/tqdne/edm.py:103, utils.py:46-70).  Here the
    # architecture/config dict lives in hparams.json next to the orbax
    # trees, and restores verify it against the rebuilt config.

    @property
    def hparams_path(self) -> Path:
        return self.directory / "hparams.json"

    def save_hyperparameters(self, hparams: dict) -> None:
        self.directory.mkdir(parents=True, exist_ok=True)
        self.hparams_path.write_text(json.dumps(hparams, indent=2, default=str))

    def restore_hyperparameters(self) -> dict | None:
        if self.hparams_path.exists():
            return json.loads(self.hparams_path.read_text())
        return None

    def verify_hyperparameters(self, hparams: dict, *, strict: bool = True) -> bool:
        """Compare against the stored hparams; on mismatch raise (strict)
        or warn.  Returns True when stored hparams exist and match."""
        stored = self.restore_hyperparameters()
        if stored is None:
            return False
        diffs = _dict_diff(stored, json.loads(json.dumps(hparams, default=str)))
        if diffs:
            msg = (f"checkpoint hyperparameters at {self.hparams_path} do not match "
                   f"the requested configuration: {'; '.join(diffs[:8])}")
            if strict:
                raise ValueError(msg)
            logger.warning(msg)
            return False
        return True

    def close(self):
        self._best.close()
        self._last.close()


def _dict_diff(a: dict, b: dict, prefix: str = "") -> list[str]:
    diffs = []
    for key in sorted(set(a) | set(b)):
        pa, pb = a.get(key, "<absent>"), b.get(key, "<absent>")
        path = f"{prefix}{key}"
        if isinstance(pa, dict) and isinstance(pb, dict):
            diffs += _dict_diff(pa, pb, prefix=path + ".")
        elif _norm(pa) != _norm(pb):
            diffs.append(f"{path}: stored={pa!r} requested={pb!r}")
    return diffs


def _norm(v):
    return tuple(v) if isinstance(v, (list, tuple)) else v
