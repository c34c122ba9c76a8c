"""Waveform quality heuristics -> validity indices.

Port of the reference's offline filters
(/root/reference/scripts/preprocessing/05_raw_data_filter_indices.py):
trailing-zero detection with an adaptive amplitude threshold, tiny
dynamic range, linear-trend tails, and the last-oscillating-sample index
from zero-crossing windows — the index that ends up in
`indices_valid_waveforms` and masks padded/dead tails during training
and evaluation.

The reference loops per trace and per window in Python; everything here
is vectorized numpy over (..., T) batches (cumulative-sum window
statistics), hundreds of times faster on full datasets.
"""

from __future__ import annotations

import numpy as np


def _adaptive_threshold(waveform: np.ndarray) -> np.ndarray:
    """0.1% of max |amplitude| with a 1e-10 floor, per trace (kept as a
    broadcastable (..., 1) array)."""
    peak = np.max(np.abs(waveform), axis=-1, keepdims=True)
    return np.maximum(1e-10, peak * 0.001)


def check_trailing_zeros(waveform: np.ndarray, n_samples: int = 100):
    """(has_trailing_zeros, index where zeros start) per trace, batched.

    A trace "has trailing zeros" when its last ``n_samples`` are all below
    the adaptive threshold; the index is one past the last live sample.
    """
    waveform = np.asarray(waveform)
    thr = _adaptive_threshold(waveform)
    quiet = np.abs(waveform) < thr  # (..., T)
    has = quiet[..., -n_samples:].all(axis=-1)
    # index of last non-quiet sample + 1 (0 if all quiet)
    live = ~quiet
    rev_first_live = np.argmax(live[..., ::-1], axis=-1)
    any_live = live.any(axis=-1)
    idx = np.where(any_live, waveform.shape[-1] - rev_first_live, 0)
    return has, np.where(has, idx, -1)


def check_small_range(waveform: np.ndarray, threshold: float = 1e-5) -> np.ndarray:
    """True where max - min < threshold (dead channel), batched."""
    w = np.asarray(waveform)
    return (w.max(axis=-1) - w.min(axis=-1)) < threshold


def _window_sums(x: np.ndarray, window: int) -> np.ndarray:
    """Sliding-window sums along the last axis: out[..., i] = sum x[i:i+w]."""
    c = np.concatenate(
        [np.zeros(x.shape[:-1] + (1,), x.dtype), np.cumsum(x, axis=-1)], axis=-1
    )
    return c[..., window:] - c[..., :-window]


def find_last_oscillating_sample(
    waveform: np.ndarray, window_size: int = 20, min_crossings: int = 2
) -> np.ndarray:
    """Index of the last sample inside a window that still oscillates
    (>= min_crossings sign changes among above-threshold samples), batched.

    Vectorized equivalent of 05_raw_data_filter_indices.py:316-380: the
    reference removes near-zero samples from each window before counting
    sign flips; here the same count comes from forward-filled signs —
    a change is scored where a nonzero sample differs in sign from the
    previous nonzero sample.
    """
    waveform = np.asarray(waveform)
    n = waveform.shape[-1]
    if n <= window_size * 2:
        return np.full(waveform.shape[:-1], n // 2)

    thr = _adaptive_threshold(waveform)
    sgn = np.where(np.abs(waveform) < thr, 0, np.sign(waveform)).astype(np.int8)

    # forward-fill the last nonzero sign
    nz = sgn != 0
    idx = np.where(nz, np.arange(n), 0)
    idx = np.maximum.accumulate(idx, axis=-1)
    ffill = np.take_along_axis(sgn, idx, axis=-1)

    prev = np.concatenate([np.zeros(sgn.shape[:-1] + (1,), np.int8), ffill[..., :-1]], axis=-1)
    change = (sgn != 0) & (prev != 0) & (sgn != prev)

    # count sign changes inside each window of `window_size` samples;
    # window starting at i covers changes at positions i+1 .. i+w-1
    counts = _window_sums(change.astype(np.int32), window_size)  # start index axis
    oscillating = counts >= min_crossings  # (..., n - w + 1)

    any_osc = oscillating.any(axis=-1)
    last_start = (
        oscillating.shape[-1] - 1 - np.argmax(oscillating[..., ::-1], axis=-1)
    )
    result = last_start + window_size - 1

    # fallback (reference: variance-drop scan; we use the same default)
    return np.where(any_osc, result, n // 2)


def check_linear_trend(
    waveform: np.ndarray,
    r_squared_threshold: float = 0.95,
    min_segment_length: int = 300,
) -> np.ndarray:
    """Detect traces whose tail is (almost exactly) a straight line —
    instrument faults (05_raw_data_filter_indices.py:56-152).

    Vectorized: sliding-window linear-regression R^2 from cumulative
    sums; True where any tail window of min_segment_length exceeds the
    R^2 threshold while having non-trivial slope coverage.
    """
    w = np.asarray(waveform, np.float64)
    n = w.shape[-1]
    m = min_segment_length
    if n < m:
        return np.zeros(w.shape[:-1], bool)

    t = np.arange(m)
    t_mean = t.mean()
    t_var = ((t - t_mean) ** 2).sum()

    sum_y = _window_sums(w, m)
    sum_ty_full = _window_sums(w * np.arange(n), m)
    starts = np.arange(n - m + 1)
    # sum_i (t_i * y_{s+i}) = sum_j ((j - s) * y_j) over window
    sum_ty = sum_ty_full - starts * sum_y
    sum_y2 = _window_sums(w**2, m)

    beta = (sum_ty - t_mean * sum_y) / t_var
    y_mean = sum_y / m
    ss_tot = sum_y2 - m * y_mean**2
    ss_reg = beta**2 * t_var
    with np.errstate(divide="ignore", invalid="ignore"):
        r2 = np.where(ss_tot > 1e-20, ss_reg / ss_tot, 0.0)

    # consider only the tail third of the trace (where faults appear)
    tail = r2[..., (n - m + 1) * 2 // 3 :]
    return (tail > r_squared_threshold).any(axis=-1)


def compute_validity_indices(
    waveforms: np.ndarray, window_size: int = 20, min_crossings: int = 2
) -> np.ndarray:
    """Per-record validity index for (N, C, T) batches: the largest
    last-oscillating-sample across channels (process_waveforms parity —
    the most conservative cut keeps all channels' live signal)."""
    waveforms = np.asarray(waveforms)
    if waveforms.ndim == 3:
        try:  # native OpenMP scan (csrc/fastops.cpp)
            from tqdne_tpu import _fastops

            return _fastops.validity_indices(
                np.ascontiguousarray(waveforms, np.float32), window_size, min_crossings
            )
        except ImportError:
            pass
    last = find_last_oscillating_sample(waveforms, window_size, min_crossings)
    return last.max(axis=-1)


def quality_report(waveforms: np.ndarray) -> dict:
    """Batch fault summary over (N, C, T): per-record flags."""
    has_tz, tz_idx = check_trailing_zeros(waveforms)
    return {
        "has_trailing_zeros": has_tz.any(axis=-1),
        "trailing_zero_index": tz_idx.min(axis=-1),
        "has_small_range": check_small_range(waveforms).any(axis=-1),
        "has_linear_trend": check_linear_trend(waveforms).any(axis=-1),
        "validity_index": compute_validity_indices(waveforms),
    }
