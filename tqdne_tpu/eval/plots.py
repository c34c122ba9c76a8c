"""Evaluation plots (capability parity with /root/reference/tqdne/plot.py).

All plots take channel-first (B, C, T) waveform batches (the storage /
reference layout; use tqdne_tpu.data.pipeline.to_channels_first on device
outputs) and return matplotlib figures:

- SamplePlot: a few predicted (vs target) traces
- UpsamplingSamplePlot: input/target/reconstruction triplet
- AmplitudeSpectralDensityPlot: mean +/- std log-ASD comparison
- BinPlot: metric heatmap over magnitude x distance bins
- MovingAverageEnvelopeGrid / AmplitudeSpectralDensityGrid: pred-vs-target
  grids per distance bin with one line per magnitude bin
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from tqdne_tpu.data.representation import moving_average_same  # noqa: E402
from tqdne_tpu.eval.metrics import Metric  # noqa: E402


def fig_to_image(fig):
    """Render a matplotlib figure to a PIL image (utils.py:73-90 role) —
    used when pushing figures to image-based metric sinks."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=100, bbox_inches="tight")
    buf.seek(0)
    return Image.open(buf).convert("RGB")


class Plot(ABC):
    def __init__(self, channel: int | None = None):
        self.channel = channel

    @property
    def name(self) -> str:
        name = self.__class__.__name__
        return name if self.channel is None else f"{name} - Channel {self.channel}"

    def __call__(self, pred, target=None, cond_signal=None, **kwargs):
        pred = np.asarray(pred)
        target = np.asarray(target) if target is not None else None
        cond_signal = np.asarray(cond_signal) if cond_signal is not None else None
        if self.channel is not None:
            pred = pred[:, self.channel]
            target = target[:, self.channel] if target is not None else None
            cond_signal = cond_signal[:, self.channel] if cond_signal is not None else None
        kwargs = {k: np.asarray(v) for k, v in kwargs.items()}
        return self.plot(pred, target, cond_signal, **kwargs)

    @abstractmethod
    def plot(self, pred, target=None, cond_signal=None, **kwargs):
        ...


class SamplePlot(Plot):
    """A column of predicted traces, optionally overlaid with targets."""

    def __init__(self, plot_target: bool = False, fs: float = 100, channel: int = 0, n: int = 5):
        super().__init__(channel)
        self.plot_target = plot_target
        self.fs = fs
        self.n = n

    def plot(self, pred, target=None, cond_signal=None, **kwargs):
        n = min(self.n, len(pred))
        time = np.arange(pred.shape[-1]) / self.fs
        fig, axes = plt.subplots(figsize=(14, 3 * n), nrows=n, squeeze=False)
        for i, ax in enumerate(axes[:, 0]):
            ax.plot(time, pred[i], "b", label="Predicted", alpha=0.7)
            if self.plot_target and target is not None:
                ax.plot(time, target[i], "orange", label="Target", alpha=0.7)
            ax.set_ylabel("Amplitude")
            ax.legend()
        axes[-1, 0].set_xlabel("Time [s]")
        fig.tight_layout()
        plt.close(fig)
        return fig


class UpsamplingSamplePlot(Plot):
    """Input / target / reconstruction overlay for signal-to-signal tasks."""

    def __init__(self, fs: float = 100, channel: int = 0):
        super().__init__(channel)
        self.fs = fs

    def plot(self, pred, target=None, cond_signal=None, **kwargs):
        time = np.arange(pred.shape[-1]) / self.fs
        fig, ax = plt.subplots(figsize=(14, 5))
        if cond_signal is not None:
            ax.plot(time, cond_signal[0], "g", label="Input")
        if target is not None:
            ax.plot(time, target[0], "orange", label="Target")
        ax.plot(time, pred[0], "b", label="Predicted")
        ax.set_xlabel("Time [s]")
        ax.set_ylabel("Amplitude")
        ax.legend()
        fig.tight_layout()
        plt.close(fig)
        return fig


def _log_asd(signal, log_eps=1e-8):
    return np.log(np.clip(np.abs(np.fft.rfft(signal, axis=-1)), log_eps, None))


class AmplitudeSpectralDensityPlot(Plot):
    """Mean +/- std of log amplitude spectral densities, pred vs target."""

    def __init__(self, fs: float, channel: int = 0, log_eps: float = 1e-8):
        super().__init__(channel)
        self.fs = fs
        self.log_eps = log_eps

    def plot(self, pred, target=None, cond_signal=None, **kwargs):
        freq = np.fft.rfftfreq(pred.shape[-1], d=1 / self.fs)
        fig, ax = plt.subplots(figsize=(10, 5))
        with np.errstate(divide="ignore"):
            lf = np.log(freq)
        for sig, color, label in ((pred, "b", "Predicted"), (target, "orange", "Target")):
            if sig is None:
                continue
            sd = _log_asd(sig, self.log_eps)
            mean, std = sd.mean(0), sd.std(0)
            ax.plot(lf, mean, color, label=label)
            ax.fill_between(lf, mean - std, mean + std, color=color, alpha=0.2)
        ax.set_xlabel("Log-Frequency [Hz]")
        ax.set_ylabel(r"Log-Amplitude $[m/s^2\,Hz^{-1}]$")
        ax.legend()
        fig.tight_layout()
        plt.close(fig)
        return fig


class BinPlot(Plot):
    """Heatmap of a metric over magnitude x distance bins."""

    def __init__(self, metric: Metric, mag_bins, dist_bins, fmt: str = ".2f"):
        super().__init__(None)
        self.metric = metric
        self.mag_bins = list(mag_bins)
        self.dist_bins = list(dist_bins)
        self.fmt = fmt

    @property
    def name(self):
        return f"Bin {self.metric.name}"

    def plot(self, pred, target=None, cond_signal=None, *, mag=None, dist=None, **kwargs):
        nd, nm = len(self.dist_bins) - 1, len(self.mag_bins) - 1
        results = np.full((nd, nm), np.nan)
        for i in range(nd):
            dmask = (dist >= self.dist_bins[i]) & (dist < self.dist_bins[i + 1])
            for j in range(nm):
                mask = dmask & (mag >= self.mag_bins[j]) & (mag < self.mag_bins[j + 1])
                if mask.sum() > 1:
                    results[i, j] = self.metric(pred[mask], target[mask])

        fig, ax = plt.subplots(figsize=(1.5 * nm + 2, 1.2 * nd + 2))
        im = ax.imshow(results, cmap="viridis", origin="lower", aspect="auto")
        for i in range(nd):
            for j in range(nm):
                if np.isfinite(results[i, j]):
                    ax.text(j, i, format(results[i, j], self.fmt), ha="center", va="center",
                            color="w", fontsize=9)
        ax.set_xticks(np.arange(nm + 1) - 0.5, self.mag_bins)
        ax.set_yticks(np.arange(nd + 1) - 0.5, self.dist_bins)
        ax.set_xlabel("Magnitude bin")
        ax.set_ylabel("Distance bin [km]")
        fig.colorbar(im, ax=ax)
        fig.tight_layout()
        plt.close(fig)
        return fig


class GridPlot(Plot, ABC):
    """Pred-vs-target grid: one row per distance bin, one line per magnitude
    bin, mean +/- std of a per-waveform transform."""

    def __init__(self, fs, channel, mag_bins, dist_bins):
        super().__init__(channel)
        self.fs = fs
        self.mag_bins = list(mag_bins)
        self.dist_bins = list(dist_bins)

    @abstractmethod
    def transform(self, waveform):
        ...

    @property
    @abstractmethod
    def xlabel(self):
        ...

    @property
    @abstractmethod
    def ylabel(self):
        ...

    @abstractmethod
    def xticks(self, length):
        ...

    def plot(self, pred, target=None, cond_signal=None, *, mag=None, dist=None, **kwargs):
        nd = len(self.dist_bins) - 1
        fig, axs = plt.subplots(nd, 2, figsize=(14, 4 * nd), squeeze=False)
        xt = self.xticks(pred.shape[-1])
        for i in range(nd):
            dmask = (dist >= self.dist_bins[i]) & (dist < self.dist_bins[i + 1])
            for j in range(len(self.mag_bins) - 1):
                mask = dmask & (mag >= self.mag_bins[j]) & (mag < self.mag_bins[j + 1])
                if mask.sum() < 2:
                    continue
                for ax, wf in zip(axs[i], (pred, target)):
                    if wf is None:
                        continue
                    tr = self.transform(wf[mask])
                    mean, std = tr.mean(0), tr.std(0)
                    ax.plot(xt, mean, label=f"{self.mag_bins[j]}-{self.mag_bins[j+1]}")
                    ax.fill_between(xt, mean - std, mean + std, alpha=0.2)
                    ax.set_xlabel(self.xlabel)
                    ax.set_ylabel(self.ylabel)
                    ax.grid(True)
            axs[i, 0].set_title(f"Predicted  ({self.dist_bins[i]}-{self.dist_bins[i+1]} km)")
            axs[i, 1].set_title(f"Target  ({self.dist_bins[i]}-{self.dist_bins[i+1]} km)")
        # unified y-limits
        flat = axs.flatten()
        lo = min(a.get_ylim()[0] for a in flat)
        hi = max(a.get_ylim()[1] for a in flat)
        for a in flat:
            a.set_ylim(lo, hi)
            a.margins(x=0)
        handles, labels = axs[0, 0].get_legend_handles_labels()
        if handles:
            fig.legend(handles, labels, loc="lower center",
                       ncol=len(self.mag_bins) - 1, title="Magnitude bins")
        fig.tight_layout()
        plt.close(fig)
        return fig


class MovingAverageEnvelopeGrid(GridPlot):
    def __init__(self, fs, channel, mag_bins, dist_bins, window_size=128, log_eps=1e-6):
        super().__init__(fs, channel, mag_bins, dist_bins)
        self.window_size = window_size
        self.log_eps = log_eps

    xlabel = property(lambda self: "Time [s]")
    ylabel = property(lambda self: r"Log-Amplitude $[m/s^2]$")

    def xticks(self, length):
        return np.arange(length) / self.fs

    def transform(self, waveform):
        env = moving_average_same(np.abs(waveform), self.window_size)
        return np.log(env + self.log_eps)


class AmplitudeSpectralDensityGrid(GridPlot):
    def __init__(self, fs, channel, mag_bins, dist_bins, log_eps=1e-8):
        super().__init__(fs, channel, mag_bins, dist_bins)
        self.log_eps = log_eps

    xlabel = property(lambda self: "Frequency [Hz]")
    ylabel = property(lambda self: r"Log-Amplitude $[m/s^2\,Hz^{-1}]$")

    def xticks(self, length):
        return np.fft.rfftfreq(length, d=1 / self.fs)

    def transform(self, waveform):
        return _log_asd(waveform, self.log_eps)
