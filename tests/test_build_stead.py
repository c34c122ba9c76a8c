"""STEAD builder test with a synthetic STEAD-format chunk."""

import numpy as np
import pytest

from tqdne_tpu.cli.build_stead import build, filter_metadata


@pytest.fixture
def stead_chunk(tmp_path, rng):
    import h5py
    import pandas as pd

    n = 12
    rows = []
    with h5py.File(tmp_path / "chunk.hdf5", "w") as f:
        grp = f.create_group("data")
        for i in range(n):
            name = f"TRACE{i:04d}_EV"
            t = 8000
            grp.create_dataset(name, data=rng.standard_normal((t, 3)).astype(np.float32))
            rows.append(
                {
                    "trace_name": name,
                    "trace_category": "earthquake_local" if i % 4 else "noise",
                    "source_distance_km": 100.0 if i % 3 else 350.0,
                    "source_magnitude": 5.5 if i % 2 else 3.0,
                    "source_depth_km": 20.0,
                    "source_latitude": 36.0,
                    "source_longitude": 138.0,
                    "receiver_latitude": 36.5,
                    "receiver_longitude": 138.5,
                    "p_arrival_sample": 1000,
                }
            )
    pd.DataFrame(rows).to_csv(tmp_path / "chunk.csv", index=False)
    return tmp_path


def test_filter_metadata(stead_chunk):
    import pandas as pd

    df = pd.read_csv(stead_chunk / "chunk.csv")
    kept = filter_metadata(df)
    # earthquake_local AND dist<=200 AND mag>4.5
    for _, row in kept.iterrows():
        assert row.trace_category == "earthquake_local"
        assert row.source_distance_km <= 200
        assert row.source_magnitude > 4.5


def test_build_stead_storage_contract(stead_chunk):
    import h5py

    out = build(
        stead_chunk / "chunk.csv", stead_chunk / "chunk.hdf5", stead_chunk, counts_ok=True
    )
    with h5py.File(out) as f:
        wf = f["waveforms"]
        n = wf.shape[0]
        assert n > 0
        assert wf.shape[1:] == (6000, 3)  # (T, C) pre-build layout, 60 s @ 100 Hz
        for k in ("hypocentral_distance", "magnitude", "vs30", "hypocentre_depth",
                  "azimuthal_gap"):
            assert f[k].shape == (n,)
        assert (f["vs30"][:] >= 400).all() and (f["vs30"][:] <= 1500).all()
        assert (f["azimuthal_gap"][:] > 0).all()
