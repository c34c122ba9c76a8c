"""SeisBench export tests (write_to_seisbench.py port, portable fallback)."""

import csv

import numpy as np

from tqdne_tpu.data.export import (
    export_seisbench,
    pick_trace_start_time,
    recursive_sta_lta,
    trigger_onset,
)


def _waveform_with_onset(rng, onset=1000, n=4064):
    x = 0.01 * rng.standard_normal(n)
    t = np.arange(n - onset) / 100.0
    x[onset:] += np.sin(2 * np.pi * 4 * t) * np.exp(-t / 8)
    return x


def test_recursive_sta_lta_peaks_after_onset(rng):
    x = _waveform_with_onset(rng)
    cft = recursive_sta_lta(x, 200, 500)
    assert cft[:500].max() == 0.0  # warm-up zeroed
    assert cft[1000:1400].max() > cft[600:950].max()


def test_trigger_onset_hysteresis():
    cft = np.array([0, 0, 2.0, 2.0, 1.0, 0.4, 0, 2.0, 0.3])
    pairs = trigger_onset(cft, on=1.5, off=0.5)
    assert pairs[0][0] == 2 and pairs[0][1] == 5
    assert pairs[1][0] == 7


def test_pick_trace_start_time(rng):
    x = _waveform_with_onset(rng, onset=1200)
    t = pick_trace_start_time(x, 100.0)
    assert 11.0 < t < 13.5  # onset at 12 s


def test_export_portable_fallback(rng, tmp_path):
    n = 5
    wf = np.stack([np.stack([_waveform_with_onset(rng) for _ in range(3)]) for _ in range(n)])
    feats = {
        "hypocentral_distance": rng.uniform(10, 200, n),
        "magnitude": rng.uniform(4.5, 7, n),
        "vs30": rng.uniform(200, 800, n),
        "hypocentre_depth": rng.uniform(5, 50, n),
        "azimuthal_gap": rng.uniform(30, 300, n),
    }
    meta_path, wf_path = export_seisbench(wf, feats, tmp_path / "sb")
    rows = list(csv.DictReader(open(meta_path)))
    assert len(rows) == n
    assert float(rows[0]["path_travel_time_s"]) > 0
    import h5py

    with h5py.File(wf_path) as f:
        assert f.attrs["dimension_order"] == "CW"
        assert f["data"][rows[0]["trace_name"]].shape == (3, 4064)
