"""Masking helper tests (utils.py:104-122 parity, channels-last)."""

import numpy as np

import jax.numpy as jnp

from tqdne_tpu.utils.masking import get_latent_mask_indexes, mask_from_indexes


def test_mask_from_indexes_1d():
    x = jnp.ones((2, 10, 3))
    idx = jnp.array([4, 8])
    out = np.asarray(mask_from_indexes(idx, x, fill_with=0.0))
    assert out[0, :4].sum() == 4 * 3 and out[0, 4:].sum() == 0
    assert out[1, :8].sum() == 8 * 3 and out[1, 8:].sum() == 0


def test_mask_from_indexes_2d_nan():
    x = jnp.ones((1, 8, 8, 3))
    out = np.asarray(mask_from_indexes(jnp.array([5]), x))
    assert np.isfinite(out[0, :5]).all()
    assert np.isnan(out[0, 5:]).all()


def test_latent_mask_indexes_reference_formula():
    idx = jnp.array([4064.0])
    low, up = get_latent_mask_indexes(idx)
    want_low = int((((4064 - 8) / 2 - 8) / 2) - 3)
    assert int(low[0]) == want_low
    assert int(up[0]) == ((want_low - 6) * 2 - 6) * 2
