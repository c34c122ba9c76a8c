"""Training callbacks.

SamplingEvalCallback reproduces the reference LogCallback
(/root/reference/tqdne/logging.py:12-98): every N epochs it runs FULL
model sampling on a few validation batches (using EMA params, matching
the reference's EMA swap), inverts the representation back to the
waveform domain, evaluates a metric list on (pred, target) waveforms,
logs the scalars, and writes comparison figures to
workdir/plots/epoch_{e}/ (the reference posts them to wandb as Images).

NaN guard parity: non-finite predictions are warned about and zeroed
(logging.py:57-59).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Sequence

import numpy as np

import jax

from tqdne_tpu.data.pipeline import to_channels_first
from tqdne_tpu.data.representation import Representation

logger = logging.getLogger("tqdne_tpu")


class SamplingEvalCallback:
    """Callable as cb(trainer, state, epoch, gstep).

    Parameters
    ----------
    sample_fn:
        (params, key, batch) -> channels-last signal samples.  Typically a
        jit-closed wrapper of tqdne_tpu.train.steps sample_fn using the
        batch's conditioning.
    representation:
        Inverts signals to waveforms (host side or jax backend).
    metrics / plots:
        tqdne_tpu.eval.metrics.Metric / eval.plots.Plot instances over
        channel-first waveform batches.
    feature_stats / features_keys:
        (F, 2) [mean, std] per conditioning feature and the matching key
        names.  When given, the batch "cond" columns are denormalized and
        the raw magnitude / hypocentral_distance are passed to every plot
        as mag= / dist= kwargs, enabling BinPlot / GridPlot during
        training (the reference computes these from the HDF5 raw columns
        in evaluation.ipynb; LogCallback passes cond through,
        /root/reference/tqdne/logging.py:75-81).
    """

    def __init__(
        self,
        sample_fn: Callable,
        val_batches: Sequence[dict],
        representation: Representation,
        metrics: Sequence = (),
        plots: Sequence = (),
        every_n_epochs: int = 10,
        seed: int = 123,
        feature_stats=None,
        features_keys: Sequence[str] = (),
        max_consecutive_failures: int = 3,
    ):
        self.sample_fn = sample_fn
        self.val_batches = list(val_batches)
        self.representation = representation
        self.metrics = list(metrics)
        self.plots = list(plots)
        self.every_n_epochs = every_n_epochs
        self.seed = seed
        self.feature_stats = None if feature_stats is None else np.asarray(feature_stats)
        self.features_keys = list(features_keys)
        # per-metric/plot consecutive-failure counters: one-off failures
        # stay warnings (reference NaN-guard philosophy), but a metric that
        # fails every eval for a whole run must surface, not scroll by
        self.max_consecutive_failures = max_consecutive_failures
        self._failures: dict[str, int] = {}

    def _record_failure(self, kind: str, name: str, err: Exception):
        count = self._failures.get(name, 0) + 1
        self._failures[name] = count
        logger.warning("%s %s failed (%d consecutive): %s", kind, name, count, err)
        if count >= self.max_consecutive_failures:
            raise RuntimeError(
                f"{kind} {name!r} failed {count} sampling evals in a row "
                f"(last error: {err}); fix it or drop it from the callback"
            ) from err

    def __call__(self, trainer, state, epoch: int, gstep: int):
        if (epoch + 1) % self.every_n_epochs != 0:
            return
        preds, targets, conds = [], [], []
        for i, batch in enumerate(self.val_batches):
            key = jax.random.fold_in(jax.random.key(self.seed), epoch * 1000 + i)
            pred_signal = np.asarray(self.sample_fn(state.ema_params, key, batch))
            if not np.isfinite(pred_signal).all():
                logger.warning("prediction contains non-finite values; zeroing (NaN guard)")
                pred_signal = np.nan_to_num(pred_signal)
            pred_wf = self.representation.invert_representation(
                to_channels_first(pred_signal)
            )
            target_wf = to_channels_first(np.asarray(batch["waveform"]))
            if len(pred_wf) != len(target_wf):
                raise ValueError(
                    f"sampling eval batch {i}: {len(pred_wf)} predictions vs "
                    f"{len(target_wf)} targets — sample_fn must preserve batch size"
                )
            preds.append(pred_wf)
            targets.append(target_wf)
            if "cond" in batch:
                conds.append(np.asarray(batch["cond"]))

        pred = np.concatenate(preds)
        target = np.concatenate(targets)[:, :, : pred.shape[-1]]

        plot_kwargs = {}
        if conds and self.feature_stats is not None and self.features_keys:
            cond = np.concatenate(conds)
            raw = cond * self.feature_stats[:, 1] + self.feature_stats[:, 0]
            by_key = dict(zip(self.features_keys, raw.T))
            if "magnitude" in by_key:
                plot_kwargs["mag"] = by_key["magnitude"]
            if "hypocentral_distance" in by_key:
                plot_kwargs["dist"] = by_key["hypocentral_distance"]

        scalars = {}
        for metric in self.metrics:
            try:
                scalars[f"eval/{metric.name}"] = float(metric(pred, target))
                self._failures.pop(metric.name, None)
            except Exception as e:
                self._record_failure("metric", metric.name, e)
        if scalars:
            trainer.writer.write(gstep, scalars)

        if self.plots:
            plotdir = Path(trainer.workdir) / "plots" / f"epoch_{epoch}"
            plotdir.mkdir(parents=True, exist_ok=True)
            for plot in self.plots:
                try:
                    fig = plot(pred, target, **plot_kwargs)
                    fig.savefig(plotdir / f"{plot.name.replace(' ', '_')}.png", dpi=100)
                    self._failures.pop(plot.name, None)
                except Exception as e:
                    self._record_failure("plot", plot.name, e)
