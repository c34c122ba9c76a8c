"""Invertible waveform <-> model-space "signal" representations.

Capability parity with /root/reference/tqdne/representation.py: Identity,
Normalization, MovingAverageEnvelope (waveform/envelope + log-envelope,
exact inverse) and LogSpectrogram (centered STFT magnitude, Nyquist row
dropped, log-clip-normalize to [-1, 1], Griffin-Lim inversion).

Arrays follow the storage layout (..., C, T) with the channel axis at -2,
matching the reference HDF5 contract (waveforms [N, 3, T]).  The input
pipeline transposes to channels-last before device transfer (TPU wants
channels on the lane dimension); see tqdne_tpu.data.dataset.

Engineering differences from the reference:
- no librosa: STFT/Griffin-Lim are self-contained (tqdne_tpu.data.spectral),
- no pathos process pools: everything is vectorized numpy, and
  LogSpectrogram can invert on the accelerator (backend="jax"), replacing
  128 host Griffin-Lim iterations per waveform with one batched jit call,
- MovingAverageEnvelope uses an O(N) sliding cumsum instead of
  np.apply_along_axis + np.convolve, with identical window placement.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


def _as_numpy(x):
    if isinstance(x, np.ndarray):
        return x
    try:
        return np.asarray(x)
    except Exception:  # jax arrays on device etc.
        import jax

        return np.asarray(jax.device_get(x))


class Representation(ABC):
    """Abstract invertible transform between waveform and signal domains."""

    @abstractmethod
    def get_representation(self, waveform):
        ...

    @abstractmethod
    def invert_representation(self, representation):
        ...

    def __call__(self, waveform):
        return self.get_representation(_as_numpy(waveform))


class Identity(Representation):
    def get_representation(self, waveform):
        return _as_numpy(waveform)

    def invert_representation(self, representation):
        return _as_numpy(representation)


class Normalization(Representation):
    def __init__(self, mean, std):
        self.mean = mean
        self.std = std

    def get_representation(self, waveform):
        return (_as_numpy(waveform) - self.mean) / self.std

    def invert_representation(self, representation):
        return _as_numpy(representation) * self.std + self.mean


def moving_average_same(x: np.ndarray, window: int) -> np.ndarray:
    """Moving average along the last axis, identical window placement to
    np.convolve(x, ones(window)/window, mode="same") (zero padding)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[-1]
    c = np.concatenate([np.zeros(x.shape[:-1] + (1,)), np.cumsum(x, axis=-1)], axis=-1)
    left = window // 2  # samples strictly before i
    right = window - left - 1  # samples after i (inclusive of i via +1)
    hi = np.minimum(np.arange(n) + right + 1, n)
    lo = np.maximum(np.arange(n) - left, 0)
    return (np.take(c, hi, axis=-1) - np.take(c, lo, axis=-1)) / window


class MovingAverageEnvelope(Representation):
    """(waveform / envelope, log envelope) stacked on the channel axis.

    3-channel waveform -> 6-channel signal; exactly invertible
    (representation.py:41-60 equivalent).
    """

    def __init__(self, window_size: int = 128, log_eps: float = 1e-6, eps: float = 1e-6):
        self.window_size = window_size
        self.log_eps = log_eps
        self.eps = eps

    def get_representation(self, waveform):
        waveform = _as_numpy(waveform)
        if waveform.ndim == 3:
            try:  # fused native path (csrc/fastops.cpp), exact parity
                from tqdne_tpu import _fastops

                return _fastops.envelope_representation(
                    np.ascontiguousarray(waveform, np.float32),
                    self.window_size, self.log_eps, self.eps,
                )
            except ImportError:
                pass
        env = moving_average_same(np.abs(waveform), self.window_size)
        scaled = waveform / (env + self.eps)
        log_env = np.log(env + self.log_eps) - np.log(self.log_eps) / 2
        return np.concatenate([scaled, log_env], axis=-2).astype(np.float32)

    def invert_representation(self, representation):
        representation = _as_numpy(representation)
        scaled, log_env = np.split(representation, 2, axis=-2)
        env = np.exp(log_env + np.log(self.log_eps) / 2)
        return (scaled * (env + self.eps)).astype(np.float32)


class LogSpectrogram(Representation):
    """Normalized log-magnitude spectrogram with Griffin-Lim inversion.

    Defaults (stft_channels=256, hop_size=32) map a 3 x 4064 waveform to a
    3 x 128 x 128 "image" (Nyquist row dropped), normalized to [-1, 1]
    (representation.py:63-175 equivalent).

    backend="numpy" inverts on the host; backend="jax" runs batched
    Griffin-Lim on the accelerator.
    """

    def __init__(
        self,
        stft_channels: int = 256,
        hop_size: int | None = None,
        clip: float = 1e-8,
        log_max: float = 3.0,
        n_iter: int = 128,
        seed: int = 0,
        backend: str = "numpy",
        length: int = 4064,
    ):
        self.n_fft = stft_channels
        self.hop = hop_size if hop_size is not None else stft_channels // 4
        self.clip = clip
        self.log_clip = float(np.log(clip))
        self.log_max = log_max
        self.n_iter = n_iter
        self.seed = seed
        self.backend = backend
        self.length = length

    # -- spectrogram plumbing -------------------------------------------------
    def get_spectrogram(self, waveform: np.ndarray) -> np.ndarray:
        from tqdne_tpu.data import spectral

        self.length = int(waveform.shape[-1])
        spec = spectral.stft(waveform, self.n_fft, self.hop)
        return spec[..., :-1, :]  # drop Nyquist row -> even freq count

    def invert_spectrogram(self, spec: np.ndarray) -> np.ndarray:
        pad = np.zeros_like(spec[..., :1, :])
        full = np.concatenate([np.asarray(spec), pad], axis=-2)  # re-add Nyquist
        if self.backend == "jax":
            import jax

            from tqdne_tpu.ops import spectral as jspectral

            out = jspectral.griffin_lim(
                jax.numpy.asarray(np.abs(full), dtype=jax.numpy.float32),
                jax.random.key(self.seed),
                self.n_fft,
                self.hop,
                self.length,
                n_iter=self.n_iter,
            )
            return np.asarray(out)
        from tqdne_tpu.data import spectral

        return spectral.griffin_lim(
            np.abs(full), self.n_fft, self.hop, self.length, n_iter=self.n_iter, seed=self.seed
        ).astype(np.float32)

    # -- representation API ----------------------------------------------------
    def get_representation(self, waveform):
        spec = np.abs(self.get_spectrogram(_as_numpy(waveform)))
        log_spec = np.log(np.clip(spec, self.clip, None))
        norm = (log_spec - self.log_clip) / (self.log_max - self.log_clip)  # [0, 1]
        return (norm * 2 - 1).astype(np.float32)  # [-1, 1]

    # log-magnitude safety ceiling: e^20 ~ 5e8 is far beyond any physical
    # spectrogram magnitude but keeps exp() finite for badly-trained model
    # outputs (the reference instead NaN-guards downstream, logging.py:57-59)
    log_spec_ceiling: float = 20.0

    def invert_representation(self, representation):
        norm = (_as_numpy(representation) + 1) / 2
        log_spec = norm * (self.log_max - self.log_clip) + self.log_clip
        log_spec = np.minimum(log_spec, self.log_spec_ceiling)
        return self.invert_spectrogram(np.exp(log_spec))
