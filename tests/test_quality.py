"""Waveform quality heuristic tests (05_raw_data_filter_indices.py port)."""

import numpy as np

from tqdne_tpu.data import quality


def _trace(rng, n=2048):
    t = np.arange(n) / 100.0
    return (np.sin(2 * np.pi * 3 * t) * np.exp(-(((t - 8) / 4) ** 2))
            + 0.001 * rng.standard_normal(n)).astype(np.float64)


def test_trailing_zeros_detection(rng):
    live = _trace(rng)
    dead = live.copy()
    dead[1500:] = 0.0
    batch = np.stack([live, dead])
    has, idx = quality.check_trailing_zeros(batch, n_samples=100)
    assert not has[0]
    assert has[1]
    assert 1400 <= idx[1] <= 1510  # zeros start at 1500 (adaptive threshold slack)


def test_small_range(rng):
    batch = np.stack([_trace(rng), np.full(2048, 0.5)])
    flags = quality.check_small_range(batch)
    assert not flags[0] and flags[1]


def test_last_oscillating_sample(rng):
    sig = _trace(rng)
    cut = 1200
    sig[cut:] = 0.0
    idx = quality.find_last_oscillating_sample(sig[None])[0]
    assert 1000 <= idx <= cut + 25  # near the cut point

    # fully oscillating trace -> near the end
    full = np.sin(2 * np.pi * 5 * np.arange(2048) / 100.0)
    idx_full = quality.find_last_oscillating_sample(full[None])[0]
    assert idx_full >= 2000


def test_linear_trend_detection(rng):
    good = _trace(rng)
    faulty = good.copy()
    faulty[1000:] = np.linspace(0.0, 0.8, 1048)  # straight-line tail
    flags = quality.check_linear_trend(np.stack([good, faulty]))
    assert not flags[0]
    assert flags[1]


def test_compute_validity_indices(rng):
    n, c, t = 4, 3, 2048
    wf = np.stack([np.stack([_trace(rng) for _ in range(c)]) for _ in range(n)])
    wf[0, :, 1024:] = 0.0  # record 0 dies halfway on all channels
    idx = quality.compute_validity_indices(wf)
    assert idx.shape == (n,)
    assert idx[0] < 1100
    assert (idx[1:] > 1500).all()


def test_quality_report_keys(rng):
    wf = np.stack([np.stack([_trace(rng) for _ in range(3)]) for _ in range(2)])
    rep = quality.quality_report(wf)
    assert set(rep) == {
        "has_trailing_zeros", "trailing_zero_index", "has_small_range",
        "has_linear_trend", "validity_index",
    }
    for v in rep.values():
        assert v.shape == (2,)
