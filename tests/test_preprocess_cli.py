"""End-to-end preprocessing orchestrator test with a synthetic archive."""

import numpy as np
import pytest

from tqdne_tpu.cli.preprocess import finalize, process_archive


@pytest.fixture
def archive(tmp_path, rng):
    import h5py

    fs = 200.0
    n_t = 2 * 12501 + 4000
    path = tmp_path / "archive.h5"
    with h5py.File(path, "w") as f:
        for i in range(8):
            g = f.create_group(f"EQ{i:03d}")
            onset = 6000 + 200 * i
            x = 0.005 * rng.standard_normal((3, n_t))
            t = np.arange(n_t - onset) / fs
            x[:, onset:] += np.sin(2 * np.pi * 4 * t) * np.exp(-t / 10)
            if i == 3:
                x[0, 8000:8040] = np.nan  # gap to repair
            g.create_dataset("waveform", data=x.astype(np.float32))
            g.attrs["fs"] = fs
            g.attrs["rhyp"] = 50.0 + 10 * i if i != 5 else 400.0  # i=5 filtered (dist)
            g.attrs["mag"] = 5.5 if i != 6 else 2.0  # i=6 filtered (mag)
            g.attrs["depth"] = 20.0
            g.attrs["vs30"] = 400.0 if i != 7 else -1.0  # i=7 filtered at stage 04
            g.attrs["azimuthal_gap"] = 120.0
            # hypocenters: even = onshore (near Nagano), odd = offshore (2011
            # Tohoku epicenter) for is_onshore classification
            g.attrs["hypo_lat"] = 36.65 if i % 2 == 0 else 38.32
            g.attrs["hypo_lon"] = 138.18 if i % 2 == 0 else 142.37
    return path


def test_preprocess_pipeline(archive, tmp_path):
    import h5py

    stage = process_archive(archive, tmp_path, trace_len=4064)
    with h5py.File(stage) as f:
        assert len(f.keys()) == 6  # 8 - 2 catalog-filtered
        wf = f["EQ000"]["waveform"][()]
        assert wf.shape == (3, 4064)
        assert np.isfinite(wf).all()

    out = finalize(stage, tmp_path, trace_len=4064)
    with h5py.File(out) as f:
        n = f["waveforms"].shape[0]
        assert 1 <= n <= 5  # vs30<0 dropped; pick-window may drop more
        assert f["waveforms"].shape[1:] == (4064, 3)  # (N, T, C) contract
        for key in ("hypocentral_distance", "magnitude", "vs30", "hypocentre_depth",
                    "azimuthal_gap", "indices_valid_waveforms", "is_onshore"):
            assert f[key].shape == (n,)
        assert (f["vs30"][:] > 0).all()
        # onshore/offshore follows the archive hypocenters (no -1: all
        # records carried coordinates)
        assert set(np.unique(f["is_onshore"][:])) <= {0, 1}


def test_preprocess_resume(archive, tmp_path):
    stage1 = process_archive(archive, tmp_path, trace_len=4064)
    import h5py

    with h5py.File(stage1) as f:
        keys_before = set(f.keys())
    # resume run: nothing new to do, nothing lost
    stage2 = process_archive(archive, tmp_path, trace_len=4064, resume=True)
    with h5py.File(stage2) as f:
        assert set(f.keys()) == keys_before
