"""Host-side (numpy) STFT / iSTFT / Griffin-Lim.

Self-contained replacement for the reference's librosa dependency
(/root/reference/tqdne/representation.py:102-108): centered STFT with a
periodic Hann window and constant (zero) padding, NOLA-normalized
inverse, and momentum-accelerated Griffin-Lim phase recovery
(n_iter=128, momentum=0.99, seeded random phase init).

These run in the offline data pipeline / CPU fallback.  The accelerator
path lives in tqdne_tpu.ops.spectral (same math in jnp, batched and
jit-compiled); the two are parity-tested against each other.
"""

from __future__ import annotations

import numpy as np

try:  # scipy's pocketfft wrapper runs float32 natively and is ~20x numpy's
    # (which upcasts through float64) on this class of host — same math
    from scipy import fft as _fft
except ImportError:  # pragma: no cover
    _fft = np.fft


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (matches scipy get_window('hann', n, fftbins=True))."""
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Centered STFT of the last axis.  Returns (..., n_fft//2+1, n_frames) complex."""
    x = np.asarray(x)
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    xp = np.pad(x, pad, mode="constant")
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = xp[..., idx]  # (..., n_frames, n_fft)
    win = hann_window(n_fft).astype(xp.dtype if xp.dtype.kind == "f" else np.float64)
    spec = _fft.rfft(frames * win, axis=-1)  # (..., n_frames, n_fft//2+1)
    return np.moveaxis(spec, -1, -2)  # (..., freq, time)


def istft(spec: np.ndarray, n_fft: int, hop: int, length: int) -> np.ndarray:
    """NOLA-normalized inverse STFT.  ``spec`` is (..., n_fft//2+1, n_frames)."""
    spec = np.moveaxis(np.asarray(spec), -2, -1)  # (..., n_frames, freq)
    frames = _fft.irfft(spec, n=n_fft, axis=-1)  # (..., n_frames, n_fft)
    win = hann_window(n_fft)
    n_frames = frames.shape[-2]
    total = length + n_fft  # padded length used at analysis
    contrib = frames * win
    if n_fft % hop == 0:
        # vectorized fold: frame i chunk k (hop samples) lands on row i+k of
        # the output viewed as (total//hop, hop) — r shifted adds, no loop
        r = n_fft // hop
        total_r = -(-total // hop) * hop
        chunks = contrib.reshape(*contrib.shape[:-1], r, hop)
        out = np.zeros(contrib.shape[:-2] + (total_r // hop, hop), dtype=frames.dtype)
        wchunks = (win**2).reshape(r, hop)
        norm = np.zeros((total_r // hop, hop))
        for k in range(r):
            out[..., k : k + n_frames, :] += chunks[..., :, k, :]
            norm[k : k + n_frames, :] += wchunks[k]
        out = out.reshape(*contrib.shape[:-2], total_r)[..., :total]
        norm = norm.reshape(total_r)[:total]
    else:
        out = np.zeros(spec.shape[:-2] + (total,), dtype=frames.dtype)
        norm = np.zeros(total, dtype=np.float64)
        for t in range(n_frames):
            s = t * hop
            out[..., s : s + n_fft] += contrib[..., t, :]
            norm[s : s + n_fft] += win**2
    norm = np.where(norm > 1e-10, norm, 1.0)
    out = out / norm
    return out[..., n_fft // 2 : n_fft // 2 + length]


def griffin_lim(
    mag: np.ndarray,
    n_fft: int,
    hop: int,
    length: int,
    *,
    n_iter: int = 128,
    momentum: float = 0.99,
    seed: int = 0,
) -> np.ndarray:
    """Momentum (fast) Griffin-Lim phase recovery from a magnitude spectrogram.

    ``mag`` is (..., n_fft//2+1, n_frames) nonnegative.  Deterministic for a
    fixed seed, like the reference's random_state=0 configuration.
    """
    rng = np.random.default_rng(seed)
    angles = np.exp(2j * np.pi * rng.random(mag.shape))
    rebuilt = np.zeros_like(angles)
    beta = momentum / (1 + momentum)
    for _ in range(n_iter):
        tprev = rebuilt
        inverse = istft(mag * angles, n_fft, hop, length)
        rebuilt = stft(inverse, n_fft, hop)
        angles = rebuilt - beta * tprev
        angles /= np.abs(angles) + 1e-16
    return istft(mag * angles, n_fft, hop, length)
