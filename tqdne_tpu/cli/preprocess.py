"""`tqdne-preprocess` — event archive -> raw_waveforms.h5.

The reference's four offline stages (scripts/preprocessing/01..04) in one
resumable orchestrator built on tqdne_tpu.data primitives:

  01 select + ingest    catalog filters (rhyp <= 200 km, 4 <= mag <= 10,
                        depth <= 100 km), demean/detrend + causal 0.1 Hz
                        highpass, resample to the common 100 Hz grid,
                        incremental per-event writes + diary resume
                        (01_preprocess.py:194-298,343-356,387-397,462-472)
  02 gap repair         linear interpolation + frequency-constrained POCS
                        reconstruction of NaN gaps (02:251-359)
  03 pick + align       P-onset picking and fixed-length cuts around the
                        pick (PhaseNet in the reference, 03:126-127;
                        STA/LTA here — seisbench-gated PhaseNet hook)
  04 filter             drop vs30 <= 0 / dead traces, re-pick and reject
                        records whose onset leaves the 2-7 s window
                        (04_filter_waveforms.py)

Input archive format: an HDF5 of per-record groups, each with a
"waveform" (C, T) dataset and attrs {fs, rhyp, mag, depth, vs30}
(the consolidated KiK-net/K-NET archive shape; reading raw KNET tar
files additionally requires obspy).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from tqdne_tpu.data import preprocessing as pp
from tqdne_tpu.data.quality import check_small_range, compute_validity_indices

TARGET_FS = 100.0
PRE_SAMPLES = 500  # 5 s before P
TRACE_LEN = 12501  # reference raw trace length (03 output)


def process_archive(
    archive_path, workdir, *, trace_len: int = TRACE_LEN, resume: bool = True,
    use_phasenet: bool = False,
):
    import h5py

    from tqdne_tpu.data.preprocessing import IncrementalH5Writer

    workdir = Path(workdir)
    stage_path = workdir / "data" / "processed_events.h5"
    stage_path.parent.mkdir(parents=True, exist_ok=True)
    if not resume and stage_path.exists():
        stage_path.unlink()

    picker = _phasenet_picker() if use_phasenet else None

    n_done = n_skip = 0
    with h5py.File(archive_path, "r") as src, IncrementalH5Writer(stage_path) as writer:
        for key in src:
            grp = src[key]
            rhyp, mag = grp.attrs["rhyp"], grp.attrs["mag"]
            depth, vs30 = grp.attrs["depth"], grp.attrs["vs30"]
            fs = float(grp.attrs.get("fs", TARGET_FS))
            if not pp.select_records(rhyp, mag, depth):
                n_skip += 1
                continue
            if writer.is_processed(key):
                continue
            wf = np.asarray(grp["waveform"], np.float64)  # (C, T)

            # 02: repair NaN gaps before filtering
            if np.isnan(wf).any():
                wf = np.stack([
                    pp.spectral_gap_fill(tr, fs) if np.isnan(tr).any()
                    else np.nan_to_num(tr)
                    for tr in wf
                ])

            # 01: demean/detrend/highpass/resample to the 100 Hz grid
            wf = pp.preprocess_trace(wf, fs, TARGET_FS)

            # 03: pick P (vertical channel) and cut a fixed window
            if picker is not None:
                onset = picker(wf)
            else:
                onset = int(pp.pick_onset(wf[-1][None], TARGET_FS)[0])
            cut = pp.cut_around_onset(wf, onset, PRE_SAMPLES, trace_len)

            # 03: onshore/offshore hypocenter classification (reference
            # 03_picking:214-224 via OSMnx; here geo.classify_onshore);
            # -1 when the archive carries no hypocenter coordinates
            lat = grp.attrs.get("hypo_lat", grp.attrs.get("latitude"))
            lon = grp.attrs.get("hypo_lon", grp.attrs.get("longitude"))
            if lat is not None and lon is not None:
                from tqdne_tpu.data.geo import classify_onshore

                is_onshore = int(classify_onshore(float(lat), float(lon))[0])
            else:
                is_onshore = -1

            writer.write(key, {
                "waveform": cut.astype(np.float32),
                "features": np.array([rhyp, mag, vs30, depth,
                                      grp.attrs.get("azimuthal_gap", 0.0)], np.float32),
                "is_onshore": np.array(is_onshore, np.int64),
            })
            n_done += 1
    print(f"stage 01-03: processed {n_done}, filtered {n_skip} (resumable at {stage_path})")
    return stage_path


def finalize(stage_path, workdir, trace_len: int = TRACE_LEN):
    """Stage 04 + assembly: quality filters -> raw_waveforms.h5."""
    import h5py

    keys, wfs, feats, onshore = [], [], [], []
    with h5py.File(stage_path, "r") as f:
        for key in f:
            wfs.append(f[key]["waveform"][()])
            feats.append(f[key]["features"][()])
            # stage files from before the is_onshore column: unknown (-1)
            onshore.append(int(f[key]["is_onshore"][()]) if "is_onshore" in f[key] else -1)
            keys.append(key)
    wf = np.stack(wfs)  # (N, C, T)
    feats = np.stack(feats)
    onshore = np.array(onshore, np.int64)

    keep = feats[:, 2] > 0  # vs30 > 0
    keep &= ~check_small_range(wf).any(axis=-1)  # dead channels
    keep &= pp.p_window_filter(wf, TARGET_FS)  # onset inside 2-7 s
    wf, feats, onshore = wf[keep], feats[keep], onshore[keep]
    validity = compute_validity_indices(wf)

    out = Path(workdir) / "data" / "raw_waveforms.h5"
    names = ("hypocentral_distance", "magnitude", "vs30", "hypocentre_depth", "azimuthal_gap")
    with h5py.File(out, "w") as f:
        f.create_dataset("waveforms", data=np.swapaxes(wf, 1, 2))  # (N, T, C) contract
        f.create_dataset("indices_valid_waveforms", data=validity)
        f.create_dataset("is_onshore", data=onshore)  # reference 03_picking:464
        for i, name in enumerate(names):
            f.create_dataset(name, data=feats[:, i])
    print(f"stage 04: kept {keep.sum()}/{len(keep)} -> {out}")
    return out


def _phasenet_picker():
    try:
        import seisbench.models as sbm
    except ImportError:
        raise SystemExit(
            "PhaseNet picking requires seisbench (unavailable); omit --phasenet to use "
            "the built-in STA/LTA picker"
        )
    model = sbm.PhaseNet.from_pretrained("jma")

    def pick(wf):
        import numpy as np

        annotations = model.annotate_stream_array(wf)  # pragma: no cover
        return int(np.argmax(annotations))

    return pick


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-preprocess", description=__doc__)
    parser.add_argument("--archive", required=True, help="consolidated event archive HDF5")
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--trace-len", type=int, default=TRACE_LEN)
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--phasenet", action="store_true",
                        help="use seisbench PhaseNet for picking (requires seisbench)")
    args = parser.parse_args(argv)
    stage = process_archive(args.archive, args.workdir, trace_len=args.trace_len,
                            resume=not args.no_resume, use_phasenet=args.phasenet)
    finalize(stage, args.workdir, args.trace_len)


if __name__ == "__main__":
    main()
