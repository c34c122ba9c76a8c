"""Evaluation metrics (parity with /root/reference/tqdne/metric.py).

- frechet_distance: full (matrix-sqrt) and isotropic variants
- MeanSquaredError, AmplitudeSpectralDensity (Frechet distance between
  log-|rfft| distributions, per channel)
- FrechetInceptionDistance / InceptionScore on a pretrained conditioning
  classifier's embeddings / logits.

Host-side numpy for the statistics (they are tiny); the classifier
forward passes run jit-compiled on device in batches.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np

from tqdne_tpu.data.representation import Representation


def _psd_sqrt(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigendecomposition (negative
    eigenvalues from sampling noise are clipped to zero)."""
    vals, vecs = np.linalg.eigh(mat)
    return (vecs * np.sqrt(np.clip(vals, 0.0, None))) @ vecs.T


def frechet_distance(x: np.ndarray, y: np.ndarray, isotropic: bool = False) -> float:
    """Squared 2-Wasserstein distance between Gaussians fitted to two
    sample sets (capability parity with /root/reference/tqdne/metric.py's
    full + isotropic variants).

    The cross term trace(sqrt(Cx Cy)) is evaluated in the symmetrized
    eigenvalue form sum(sqrt(eig(Cx^1/2 Cy Cx^1/2))), which stays in real
    arithmetic for PSD covariances — no complex matrix-sqrt fallback
    needed.
    """
    x = np.asarray(x, np.float64).reshape(len(x), -1)
    y = np.asarray(y, np.float64).reshape(len(y), -1)
    dmu = x.mean(0) - y.mean(0)
    if isotropic:
        return float(dmu @ dmu + np.sum((x.std(0) - y.std(0)) ** 2))

    cov_x = np.cov(x, rowvar=False)
    cov_y = np.cov(y, rowvar=False)
    rx = _psd_sqrt(cov_x)
    cross_eigs = np.linalg.eigvalsh(rx @ cov_y @ rx)
    gm_trace = np.sqrt(np.clip(cross_eigs, 0.0, None)).sum()
    return float(dmu @ dmu + np.trace(cov_x) + np.trace(cov_y) - 2.0 * gm_trace)


class Metric(ABC):
    """Per-channel metric over (pred, target) waveform batches (B, C, T)."""

    def __init__(self, channel: int | None = 0):
        self.channel = channel

    @property
    def name(self) -> str:
        return f"{self.__class__.__name__} - Channel {self.channel}"

    def __call__(self, pred, target):
        pred = np.asarray(pred)
        target = np.asarray(target)
        if self.channel is not None:
            pred = pred[:, self.channel]
            target = target[:, self.channel]
        return self.compute(pred, target)

    @abstractmethod
    def compute(self, pred, target):
        ...


class MeanSquaredError(Metric):
    def compute(self, pred, target):
        return float(((pred - target) ** 2).mean())


class AmplitudeSpectralDensity(Metric):
    """Frechet distance between log amplitude-spectral-density sets
    (metric.py:74-95)."""

    def __init__(self, fs: float, channel: int = 0, log_eps: float = 1e-8, isotropic: bool = True):
        super().__init__(channel)
        self.fs = fs
        self.log_eps = log_eps
        self.isotropic = isotropic

    def spectral_density(self, signal: np.ndarray) -> np.ndarray:
        sd = np.abs(np.fft.rfft(signal, axis=-1))
        return np.log(np.clip(sd, self.log_eps, None))

    def compute(self, pred, target):
        return frechet_distance(
            self.spectral_density(pred), self.spectral_density(target), isotropic=self.isotropic
        )


def asd_loss(pred, target, log_eps: float = 1e-8) -> float:
    """MSE between log amplitude spectral densities
    (/root/reference/tqdne/loss.py:5-15 — unused by the reference's
    modules but part of its API surface)."""
    def log_asd(x):
        return np.log(np.clip(np.abs(np.fft.rfft(np.asarray(x), axis=-1)), log_eps, None))

    return float(((log_asd(pred) - log_asd(target)) ** 2).mean())


class _NeuralMetric:
    """Shared plumbing: run the classifier on waveforms via representation."""

    def __init__(self, classifier, clf_vars, representation: Representation, batch_size: int = 32):
        import jax

        self.classifier = classifier
        self.clf_vars = clf_vars
        self.representation = representation
        self.batch_size = batch_size
        self._embed = jax.jit(lambda v, x: classifier.apply(v, x, method="embed"))
        self._logits = jax.jit(lambda v, x: classifier.apply(v, x))

    @property
    def name(self) -> str:
        return self.__class__.__name__

    def _signals(self, waveforms: np.ndarray) -> np.ndarray:
        sig = self.representation.get_representation(np.asarray(waveforms))
        return np.moveaxis(sig, 1, -1)  # channels-last for the model

    def _batched(self, fn, x: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(x), self.batch_size):
            outs.append(np.asarray(fn(self.clf_vars, x[i : i + self.batch_size])))
        return np.concatenate(outs)


class FrechetInceptionDistance(_NeuralMetric):
    """FID on classifier embeddings (metric.py:139-157)."""

    def __call__(self, pred, target):
        pe = self._batched(self._embed, self._signals(pred))
        te = self._batched(self._embed, self._signals(target))
        return frechet_distance(pe, te)


class InceptionScore(_NeuralMetric):
    """IS on classifier logits (metric.py:160-173)."""

    def __call__(self, pred, target=None):
        logits = self._batched(self._logits, self._signals(pred))
        logits = logits - logits.max(-1, keepdims=True)
        prob = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
        marginal = prob.mean(axis=0)
        kl = np.sum(prob * (np.log(prob + 1e-12) - np.log(marginal + 1e-12)), axis=-1)
        return float(np.exp(kl.mean()))
