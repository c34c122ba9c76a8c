"""Valid-length masking helpers (parity with
/root/reference/tqdne/utils.py:104-122, channels-last here).

`indices_valid_waveforms` marks the last live sample of each record;
these helpers blank everything after it — in waveform space or mapped
down into the latent grid of the flagship autoencoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_from_indexes(mask_idxs: jax.Array, x: jax.Array, fill_with=jnp.nan) -> jax.Array:
    """Fill positions at or beyond each record's valid index.

    ``x`` is channels-last: (B, T, C) or (B, H, W, C); masking runs along
    the *first spatial* axis right after batch (time for 1D, the frame
    axis for spectrograms — the reference masks the torch last axis,
    which is the same axis in channels-first layout).
    """
    b = x.shape[0]
    length = x.shape[1]
    mask = jnp.arange(length)[None, :] >= mask_idxs.reshape(b, 1)  # (B, T)
    mask = mask.reshape((b, length) + (1,) * (x.ndim - 2))
    return jnp.where(mask, fill_with, x)


def get_latent_mask_indexes(mask_idxs: jax.Array, dim: int = 2):
    """Map waveform-sample validity indices into the 4x-downsampled latent
    grid (and back up), matching the reference's empirically calibrated
    receptive-field offsets (utils.py:116-122)."""
    if dim != 2:
        raise ValueError("only dim=2 supported (flagship spectrogram path)")
    low = ((((mask_idxs - 8) / 2) - 8) / 2 - 3).astype(jnp.int32)
    up = (((low - 6) * 2) - 6) * 2
    return low, up
