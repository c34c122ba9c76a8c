"""Device-side FORWARD representations (waveform -> model signal).

The reference computes representations in DataLoader worker processes on
the host (/root/reference/tqdne/representation.py via dataset.py:74-83) —
at TPU training rates the host becomes the bottleneck (a single CPU core
computes LogSpectrogram at a few hundred samples/s while the train step
consumes >2000/s).  These transforms run *inside the jitted train step*
on channels-last batches: the loader ships raw waveforms (cheap HDF5
slab reads) and the accelerator computes the representation — STFT as
MXU matmuls (ops/spectral.py), envelope as a cumsum.

Numerics match the host classes in tqdne_tpu.data.representation
(parity-tested in tests/test_representation.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tqdne_tpu.ops.spectral import stft


@partial(jax.jit, static_argnames=("n_fft", "hop", "impl"))
def log_spectrogram_representation(
    waveform_cl: jax.Array,
    n_fft: int = 256,
    hop: int = 32,
    clip: float = 1e-8,
    log_max: float = 3.0,
    impl: str = "auto",
) -> jax.Array:
    """Channels-last (B, T, C) waveform -> (B, F, frames, C) signal in [-1, 1].

    Matches LogSpectrogram.get_representation (Nyquist row dropped,
    log -> clip -> normalize; data/representation.py:188-192).
    """
    x = jnp.moveaxis(waveform_cl, -1, 1)  # (B, C, T)
    spec = jnp.abs(stft(x, n_fft, hop, impl=impl))[..., :-1, :]
    log_clip = jnp.log(jnp.asarray(clip, spec.dtype))
    log_spec = jnp.log(jnp.maximum(spec, clip))
    norm = (log_spec - log_clip) / (jnp.asarray(log_max, spec.dtype) - log_clip)
    return jnp.moveaxis(norm * 2.0 - 1.0, 1, -1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("window",))
def envelope_representation(
    waveform_cl: jax.Array,
    window: int = 128,
    log_eps: float = 1e-6,
    eps: float = 1e-6,
) -> jax.Array:
    """Channels-last (B, T, C) waveform -> (B, T, 2C) signal.

    Matches MovingAverageEnvelope.get_representation (scaled waveform +
    shifted log envelope; data/representation.py:100-115); the moving
    average reproduces np.convolve(..., mode="same") window placement.
    """
    x = jnp.abs(waveform_cl)  # (B, T, C); average along T (axis -2)
    n = x.shape[-2]
    c = jnp.concatenate([jnp.zeros_like(x[..., :1, :]), jnp.cumsum(x, axis=-2)], axis=-2)
    left = window // 2
    right = window - left - 1
    hi = np.minimum(np.arange(n) + right + 1, n)
    lo = np.maximum(np.arange(n) - left, 0)
    env = (c[..., hi, :] - c[..., lo, :]) / window
    scaled = waveform_cl / (env + eps)
    log_env = jnp.log(env + log_eps) - jnp.log(jnp.asarray(log_eps, env.dtype)) / 2.0
    return jnp.concatenate([scaled, log_env], axis=-1).astype(jnp.float32)


def device_representation_fn(representation):
    """The device transform equivalent to a host Representation instance,
    or None when there is no device implementation (Normalization etc. stay
    host-side)."""
    from tqdne_tpu.data import representation as host

    if isinstance(representation, host.Identity):
        return lambda wf: wf
    if isinstance(representation, host.LogSpectrogram):
        return partial(
            log_spectrogram_representation,
            n_fft=representation.n_fft,
            hop=representation.hop,
            clip=representation.clip,
            log_max=representation.log_max,
        )
    if isinstance(representation, host.MovingAverageEnvelope):
        return partial(
            envelope_representation,
            window=representation.window_size,
            log_eps=representation.log_eps,
            eps=representation.eps,
        )
    return None
