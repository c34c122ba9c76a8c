"""Device-side (JAX) STFT / iSTFT / Griffin-Lim.

The reference inverts log-spectrograms with 128 librosa Griffin-Lim
iterations per waveform in host process pools
(/root/reference/tqdne/representation.py:106-108,128-138) — a serial CPU
bottleneck behind every sampling benchmark.  Here the whole phase
recovery runs on the accelerator: batched rfft/irfft on the VPU inside a
single jit-ed `lax.fori_loop`, so inverting a batch of spectrograms
costs milliseconds instead of seconds.

Math matches tqdne_tpu.data.spectral (numpy host path) and is
parity-tested against it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    return (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n, dtype=dtype) / n)).astype(dtype)


@partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Centered STFT of the last axis.  (..., T) -> (..., n_fft//2+1, n_frames)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    xp = jnp.pad(x, pad)
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = xp[..., idx]  # (..., n_frames, n_fft)
    spec = jnp.fft.rfft(frames * hann_window(n_fft, xp.dtype), axis=-1)
    return jnp.moveaxis(spec, -1, -2)


@partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft(spec: jax.Array, n_fft: int, hop: int, length: int) -> jax.Array:
    """NOLA-normalized inverse STFT.  (..., n_fft//2+1, n_frames) -> (..., length)."""
    frames = jnp.fft.irfft(jnp.moveaxis(spec, -2, -1), n=n_fft, axis=-1)
    win = hann_window(n_fft, frames.dtype)
    n_frames = frames.shape[-2]
    total = length + n_fft
    idx = (hop * jnp.arange(n_frames)[:, None] + jnp.arange(n_fft)[None, :]).reshape(-1)
    contrib = (frames * win).reshape(frames.shape[:-2] + (-1,))
    out = jnp.zeros(frames.shape[:-2] + (total,), dtype=frames.dtype)
    out = out.at[..., idx].add(contrib)
    norm = jnp.zeros((total,), dtype=frames.dtype).at[idx].add(jnp.tile(win**2, n_frames))
    norm = jnp.where(norm > 1e-10, norm, 1.0)
    return (out / norm)[..., n_fft // 2 : n_fft // 2 + length]


@partial(jax.jit, static_argnames=("n_fft", "hop", "length", "n_iter"))
def griffin_lim(
    mag: jax.Array,
    key: jax.Array,
    n_fft: int,
    hop: int,
    length: int,
    *,
    n_iter: int = 128,
    momentum: float = 0.99,
) -> jax.Array:
    """Batched momentum Griffin-Lim, fully on device.

    ``mag`` is (..., n_fft//2+1, n_frames); all leading axes are batched.
    """
    phase0 = 2.0 * jnp.pi * jax.random.uniform(key, mag.shape, dtype=jnp.float32)
    angles0 = jax.lax.complex(jnp.cos(phase0), jnp.sin(phase0))
    beta = momentum / (1 + momentum)

    def body(_, carry):
        angles, rebuilt_prev = carry
        inverse = istft(mag * angles, n_fft, hop, length)
        rebuilt = stft(inverse, n_fft, hop)
        angles = rebuilt - beta * rebuilt_prev
        angles = angles / (jnp.abs(angles) + 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles0, jnp.zeros_like(angles0)))
    return istft(mag * angles, n_fft, hop, length)
