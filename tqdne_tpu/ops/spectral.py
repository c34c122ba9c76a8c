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

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    return (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n, dtype=dtype) / n)).astype(dtype)


# ---- matmul DFT: the MXU path ------------------------------------------------
#
# TPU FFTs run on the VPU and small per-frame transforms (n_fft=256) leave
# the MXU idle; an explicit DFT matrix turns STFT/iSTFT into dense
# (frames x n_fft) @ (n_fft x bins) matmuls.  13x the FLOPs of an FFT, but
# the MXU's matmul throughput is >100x the VPU's small-FFT throughput, and
# framing/overlap-add become pure slicing (no gather/scatter) when
# hop divides n_fft.  Numerics match the rfft path to ~1e-5 (f32 matmuls).

@lru_cache(maxsize=8)
def _dft_mats(n_fft: int):
    """Forward rfft as two real matrices: Re = x@C, Im = x@S."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


@lru_cache(maxsize=8)
def _idft_mats(n_fft: int):
    """Inverse rfft as two real matrices: x = Re@Ci + Im@Si."""
    bins = n_fft // 2 + 1
    k = np.arange(bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    coef = np.full((bins, 1), 2.0)
    coef[0] = coef[-1] = 1.0
    ci = (coef * np.cos(ang) / n_fft).astype(np.float32)
    si = (-coef * np.sin(ang) / n_fft).astype(np.float32)
    return ci, si


def _frame_slices(xp: jax.Array, n_fft: int, hop: int, n_frames: int) -> jax.Array:
    """(..., T) padded signal -> (..., n_frames, n_fft) frames, slicing only.

    Requires n_fft % hop == 0: with r = n_fft//hop, frame i is the
    concatenation of hop-sized rows i..i+r-1 of the signal viewed as
    (T//hop, hop).
    """
    r = n_fft // hop
    rows = xp[..., : (n_frames + r - 1) * hop].reshape(*xp.shape[:-1], n_frames + r - 1, hop)
    return jnp.concatenate([rows[..., k : k + n_frames, :] for k in range(r)], axis=-1)


def _overlap_add_slices(contrib: jax.Array, n_fft: int, hop: int, total: int) -> jax.Array:
    """(..., n_frames, n_fft) windowed frames -> (..., total) sum.

    Fold as a sum of r zero-padded shifted chunk planes: XLA fuses the
    pads+adds into one elementwise kernel.  (The earlier .at[].add
    formulation lowered to r sequential dynamic-update-slices that each
    copied the whole output — 54% of the Griffin-Lim runtime.)
    """
    r = n_fft // hop
    n_frames = contrib.shape[-2]
    n_rows = total // hop
    chunks = contrib.reshape(*contrib.shape[:-1], r, hop)  # (..., F, r, hop)
    out = None
    for k in range(r):
        pad = [(0, 0)] * (contrib.ndim - 2) + [(k, n_rows - n_frames - k), (0, 0)]
        part = jnp.pad(chunks[..., :, k, :], pad)
        out = part if out is None else out + part
    return out.reshape(*contrib.shape[:-2], n_rows * hop)


def _use_matmul(impl: str) -> bool:
    if impl == "auto":
        return jax.default_backend() == "tpu"
    return impl == "matmul"


def _stft_fm(x: jax.Array, n_fft: int, hop: int, impl: str) -> jax.Array:
    """Frames-major STFT: (..., T) -> (..., n_frames, bins)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    xp = jnp.pad(x, pad)
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    if _use_matmul(impl) and n_fft % hop == 0:
        # frames by slicing+concat, then one wide (n_fft-deep) DFT matmul.
        # (A conv formulation with r hop-deep taps avoids the concat but
        # lowers to K=hop matmuls that underutilize the MXU — measured
        # 134 vs 92 ms for GL(128); the concat is the cheaper evil.)
        # HIGHEST: exact f32 (default TPU matmul precision is bf16-ish,
        # 2e-3 rel err; exact costs +27% and still wins end-to-end).
        frames = _frame_slices(xp, n_fft, hop, n_frames) * hann_window(n_fft, xp.dtype)
        c, s = (jnp.asarray(m) for m in _dft_mats(n_fft))
        mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.complex(mm(frames, c), mm(frames, s))
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = xp[..., idx]  # (..., n_frames, n_fft)
    return jnp.fft.rfft(frames * hann_window(n_fft, xp.dtype), axis=-1)


@partial(jax.jit, static_argnames=("n_fft", "hop", "impl"))
def stft(x: jax.Array, n_fft: int, hop: int, impl: str = "auto") -> jax.Array:
    """Centered STFT of the last axis.  (..., T) -> (..., n_fft//2+1, n_frames).

    impl: "fft" (jnp.fft.rfft, VPU), "matmul" (DFT matrices on the MXU),
    or "auto" (matmul on TPU, fft elsewhere).
    """
    return jnp.moveaxis(_stft_fm(x, n_fft, hop, impl), -1, -2)


def _istft_fm(spec_t: jax.Array, n_fft: int, hop: int, length: int, impl: str) -> jax.Array:
    """Frames-major inverse STFT: (..., n_frames, bins) -> (..., length)."""
    win = hann_window(n_fft, jnp.float32)
    n_frames = spec_t.shape[-2]
    total = -(-(length + n_fft) // hop) * hop  # round up for the sliced fold
    if _use_matmul(impl) and n_fft % hop == 0:
        ci, si = (jnp.asarray(m) for m in _idft_mats(n_fft))
        mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
        frames = mm(jnp.real(spec_t), ci) + mm(jnp.imag(spec_t), si)
        out = _overlap_add_slices(frames * win, n_fft, hop, total)
        norm_frames = jnp.broadcast_to(win**2, (n_frames, n_fft))
        norm = _overlap_add_slices(norm_frames, n_fft, hop, total)
    else:
        frames = jnp.fft.irfft(spec_t, n=n_fft, axis=-1)
        idx = (hop * jnp.arange(n_frames)[:, None] + jnp.arange(n_fft)[None, :]).reshape(-1)
        contrib = (frames * win).reshape(frames.shape[:-2] + (-1,))
        out = jnp.zeros(frames.shape[:-2] + (total,), dtype=frames.dtype)
        out = out.at[..., idx].add(contrib)
        norm = jnp.zeros((total,), dtype=frames.dtype).at[idx].add(jnp.tile(win**2, n_frames))
    norm = jnp.where(norm > 1e-10, norm, 1.0)
    return (out / norm)[..., n_fft // 2 : n_fft // 2 + length]


@partial(jax.jit, static_argnames=("n_fft", "hop", "length", "impl"))
def istft(spec: jax.Array, n_fft: int, hop: int, length: int, impl: str = "auto") -> jax.Array:
    """NOLA-normalized inverse STFT.  (..., n_fft//2+1, n_frames) -> (..., length)."""
    return _istft_fm(jnp.moveaxis(spec, -2, -1), n_fft, hop, length, impl)


@partial(jax.jit, static_argnames=("n_fft", "hop", "length", "n_iter", "impl"))
def griffin_lim(
    mag: jax.Array,
    key: jax.Array,
    n_fft: int,
    hop: int,
    length: int,
    *,
    n_iter: int = 128,
    momentum: float = 0.99,
    impl: str = "auto",
) -> jax.Array:
    """Batched momentum Griffin-Lim, fully on device.

    ``mag`` is (..., n_fft//2+1, n_frames); all leading axes are batched.
    """
    # iterate in frames-major layout: the matmul DFT is frames-major
    # natively, so the loop carries no per-iteration transposes.  The phase
    # init is drawn in the public bins-major layout so the trajectory is
    # identical to the pre-refactor implementation for a given key.
    mag_fm = jnp.moveaxis(mag, -2, -1)  # (..., n_frames, bins)
    phase0 = jnp.moveaxis(
        2.0 * jnp.pi * jax.random.uniform(key, mag.shape, dtype=jnp.float32), -2, -1
    )
    angles0 = jax.lax.complex(jnp.cos(phase0), jnp.sin(phase0))
    beta = momentum / (1 + momentum)

    def body(_, carry):
        angles, rebuilt_prev = carry
        inverse = _istft_fm(mag_fm * angles, n_fft, hop, length, impl)
        rebuilt = _stft_fm(inverse, n_fft, hop, impl)
        angles = rebuilt - beta * rebuilt_prev
        angles = angles / (jnp.abs(angles) + 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(0, n_iter, body, (angles0, jnp.zeros_like(angles0)))
    return _istft_fm(mag_fm * angles, n_fft, hop, length, impl)
