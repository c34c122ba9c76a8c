"""Orbax checkpointing: top-k by validation loss + always-keep-last.

Parity with the reference's Lightning ModelCheckpoint configuration
(/root/reference/tqdne/training.py:53-65): monitor validation loss,
keep the best 3, always keep the last — implemented as two orbax
CheckpointManagers over the same TrainState pytree (params + EMA +
optimizer state + step, so resume is exact; the reference persists EMA
inside the same checkpoint file, ema.py:50-54).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str | Path, max_best: int = 3, monitor: str = "loss",
                 create: bool = True):
        """``create=False`` opens read-only: restoring from a run dir won't
        scatter empty best/last directories when nothing was ever saved."""
        directory = Path(directory).absolute()
        self.monitor = monitor
        self._best = ocp.CheckpointManager(
            directory / "best",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_best,
                best_fn=lambda m: float(m[monitor]),
                best_mode="min",
                create=create,
            ),
        )
        self._last = ocp.CheckpointManager(
            directory / "last",
            options=ocp.CheckpointManagerOptions(max_to_keep=1, create=create),
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

    def close(self):
        self._best.close()
        self._last.close()
