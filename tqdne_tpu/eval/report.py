"""Evaluation report: the reference's evaluation.ipynb as a function/CLI.

Reads the HDF5 files written by tqdne-evaluate (target/predicted
waveforms, signals, classifier embeddings and logits + conditioning
features) and computes the notebook's tables
(/root/reference/experiments/evaluation.ipynb):

- FID between predicted and target classifier embeddings (plus a
  train-vs-test style calibration value when two target sets are given)
- Inception Score of predicted logits
- per magnitude x distance bin FID matrix and bin-classifier accuracy
- ASD Frechet distance per channel (and per bin)
- MSE per channel

Returns a plain dict (also dumped as JSON next to the inputs); figures
via tqdne_tpu.eval.plots.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from tqdne_tpu.eval.metrics import AmplitudeSpectralDensity, frechet_distance


def _concat_ranks(paths: list[Path], key: str) -> np.ndarray:
    import h5py

    parts = []
    for p in paths:
        with h5py.File(p, "r") as f:
            parts.append(f[key][()])
    return np.concatenate(parts)


def _bin_label(mag, dist, mag_bins, dist_bins):
    return (np.digitize(dist, dist_bins) - 1) * (len(mag_bins) - 1) + np.digitize(
        mag, mag_bins
    ) - 1


def evaluation_report(
    eval_files,
    mag_bins=(4, 4.75, 5, 5.5, 6.5, 7.5, 9.1),
    dist_bins=(0, 75, 100, 125, 150, 175, 200),
    fs: float = 100.0,
    min_bin_count: int = 8,
    calibration_files=None,
) -> dict:
    """``calibration_files``: a second tqdne-evaluate output set (e.g. the
    TRAIN split) whose target embeddings are compared against this set's
    target embeddings — the train-vs-test FID baseline evaluation.ipynb
    computes before judging the generated FID."""
    import h5py

    paths = [Path(p) for p in (eval_files if isinstance(eval_files, (list, tuple))
                               else [eval_files])]
    pred_wf = _concat_ranks(paths, "predicted_waveform")
    targ_wf = _concat_ranks(paths, "target_waveform")
    mag = _concat_ranks(paths, "magnitude")
    dist = _concat_ranks(paths, "hypocentral_distance")
    # classifier datasets are optional: 1D configs (MovingAvg families)
    # have no spectrogram classifier, matching the reference whose
    # classifier is 2D-only — then the report carries waveform-domain
    # metrics and fid/inception_score stay null
    provs = []
    for i, p in enumerate(paths):
        with h5py.File(p, "r") as f:
            if i == 0:
                has_classifier = "predicted_classifier_embedding" in f
            provs.append(json.loads(f.attrs["provenance"])
                         if "provenance" in f.attrs else None)
    # merged inputs (rank files, --suffix sweeps) must agree on what they
    # evaluated; silently labeling the report with paths[0]'s provenance
    # would misattribute the other files' samples (ADVICE r4)
    if all(pv == provs[0] for pv in provs):
        provenance = provs[0]
    else:
        provenance = {
            "mixed": provs,
            "note": "input files carry differing provenance; see 'mixed' "
                    "(one entry per input file, in argument order)",
        }

    report: dict = {"num_samples": int(len(pred_wf))}
    if provenance is not None:
        # training budget + sampler settings of the evaluated checkpoint,
        # written by tqdne-evaluate (cli/evaluate.py) — committed quality
        # numbers state the budget that produced them
        report["provenance"] = provenance
    labels = _bin_label(mag, dist, list(mag_bins), list(dist_bins))

    pred_emb = targ_emb = pred_logits = None
    if has_classifier:
        pred_emb = _concat_ranks(paths, "predicted_classifier_embedding")
        targ_emb = _concat_ranks(paths, "target_classifier_embedding")
        pred_logits = _concat_ranks(paths, "predicted_classifier_pred")
        targ_logits = _concat_ranks(paths, "target_classifier_pred")

        # global FID / IS
        report["fid"] = frechet_distance(pred_emb, targ_emb)
        if calibration_files:
            cal_paths = [Path(p) for p in (
                calibration_files if isinstance(calibration_files, (list, tuple))
                else [calibration_files]
            )]
            cal_emb = _concat_ranks(cal_paths, "target_classifier_embedding")
            report["fid_calibration"] = frechet_distance(cal_emb, targ_emb)
        probs = np.exp(pred_logits - pred_logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        marginal = probs.mean(0)
        kl = np.sum(probs * (np.log(probs + 1e-12) - np.log(marginal + 1e-12)), -1)
        report["inception_score"] = float(np.exp(kl.mean()))

        # classifier accuracy vs the conditioning bins
        report["classifier_accuracy_target"] = float(
            (targ_logits.argmax(-1) == labels).mean()
        )
        report["classifier_accuracy_predicted"] = float(
            (pred_logits.argmax(-1) == labels).mean()
        )
    else:
        report["fid"] = None
        report["inception_score"] = None

    # ASD Frechet + MSE per channel
    n_ch = pred_wf.shape[1]
    report["asd_frechet_per_channel"] = [
        AmplitudeSpectralDensity(fs=fs, channel=c, isotropic=True)(pred_wf, targ_wf)
        for c in range(n_ch)
    ]
    report["mse_per_channel"] = [
        float(((pred_wf[:, c] - targ_wf[:, c]) ** 2).mean()) for c in range(n_ch)
    ]

    # per-bin matrices: FID + accuracy (classifier) and ASD Frechet
    nd, nm = len(dist_bins) - 1, len(mag_bins) - 1
    fid_bins = np.full((nd, nm), np.nan)
    acc_bins = np.full((nd, nm), np.nan)
    asd_bins = np.full((nd, nm), np.nan)
    asd0 = AmplitudeSpectralDensity(fs=fs, channel=0, isotropic=True)
    for i in range(nd):
        for j in range(nm):
            m = (
                (dist >= dist_bins[i]) & (dist < dist_bins[i + 1])
                & (mag >= mag_bins[j]) & (mag < mag_bins[j + 1])
            )
            if m.sum() >= min_bin_count:
                asd_bins[i, j] = asd0(pred_wf[m], targ_wf[m])
                if has_classifier:
                    fid_bins[i, j] = frechet_distance(
                        pred_emb[m], targ_emb[m], isotropic=True
                    )
                    acc_bins[i, j] = float(
                        (pred_logits[m].argmax(-1) == labels[m]).mean()
                    )
    def _json_safe(x):  # NaN -> None so the output is strict JSON
        if isinstance(x, float) and not np.isfinite(x):
            return None
        if isinstance(x, list):
            return [_json_safe(v) for v in x]
        return x

    report["fid_per_bin"] = _json_safe(fid_bins.tolist())
    report["accuracy_per_bin"] = _json_safe(acc_bins.tolist())
    report["asd_frechet_per_bin"] = _json_safe(asd_bins.tolist())
    report["mag_bins"] = list(mag_bins)
    report["dist_bins"] = list(dist_bins)
    return report


def report_figures(
    eval_files,
    outdir,
    mag_bins=(4, 4.75, 5, 5.5, 6.5, 7.5, 9.1),
    dist_bins=(0, 75, 100, 125, 150, 175, 200),
    fs: float = 100.0,
    gallery_events: int = 3,
    gallery_samples: int = 5,
) -> list[Path]:
    """Render the notebook figure set from tqdne-evaluate outputs into
    ``outdir``: ASD comparison, envelope/ASD grids, per-bin ASD heatmap,
    waveform gallery (nearest-conditioning samples per event) and the
    PGA cumulative-probability heatmap."""
    from tqdne_tpu.eval import plots as P

    paths = [Path(p) for p in (eval_files if isinstance(eval_files, (list, tuple))
                               else [eval_files])]
    pred_wf = _concat_ranks(paths, "predicted_waveform")
    targ_wf = _concat_ranks(paths, "target_waveform")
    mag = _concat_ranks(paths, "magnitude")
    dist = _concat_ranks(paths, "hypocentral_distance")
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    mb, db = list(mag_bins), list(dist_bins)

    figures = {
        "asd_comparison": P.AmplitudeSpectralDensityPlot(fs=fs, channel=0),
        "sample_overlay": P.SamplePlot(plot_target=True, fs=fs, channel=0, n=4),
        "envelope_grid": P.MovingAverageEnvelopeGrid(fs, 0, mb, db),
        "asd_grid": P.AmplitudeSpectralDensityGrid(fs, 0, mb, db),
        "bin_asd": P.BinPlot(AmplitudeSpectralDensity(fs=fs, channel=0, isotropic=True),
                             mb, db),
    }
    written = []
    for name, plot in figures.items():
        kwargs = {"mag": mag, "dist": dist} if isinstance(plot, (P.BinPlot, P.GridPlot)) \
            else {}
        fig = plot(pred_wf, targ_wf, **kwargs)
        path = outdir / f"{name}.png"
        fig.savefig(path, dpi=110, bbox_inches="tight")
        written.append(path)

    # gallery: per picked event, the generated rows with the nearest
    # conditioning (each evaluate row has exactly one sample per cond)
    order = np.argsort(mag)
    picks = order[np.linspace(0, len(order) - 1, gallery_events).astype(int)]
    gal_pred, labels = [], []
    for e in picks:
        score = (np.abs(mag - mag[e]) / 0.5) ** 2 + (np.abs(dist - dist[e]) / 20.0) ** 2
        near = np.argsort(score)[1 : gallery_samples + 1]
        gal_pred.append(pred_wf[near])
        labels.append(f"M{mag[e]:.1f}  {dist[e]:.0f} km")
    fig = P.WaveformGalleryGrid(fs=fs, channel=0, samples_per_event=gallery_samples)(
        np.concatenate(gal_pred), targ_wf[picks], event_labels=labels
    )
    path = outdir / "waveform_gallery.png"
    fig.savefig(path, dpi=110, bbox_inches="tight")
    written.append(path)

    # PGA likelihood heatmap (cumulative_probability notebook statistic)
    pga = lambda wf: np.abs(wf[:, :2]).max(axis=(1, 2))  # noqa: E731 - horizontals
    fig = P.CumulativeProbabilityPlot(mb, db, im_name="PGA")(
        pga(pred_wf), pga(targ_wf), mag=mag, dist=dist
    )
    path = outdir / "cumulative_probability.png"
    fig.savefig(path, dpi=110, bbox_inches="tight")
    written.append(path)
    return written


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser("tqdne-report", description=__doc__)
    parser.add_argument("files", nargs="+", help="tqdne-evaluate output HDF5 files")
    parser.add_argument("--out", type=str, default=None, help="JSON output path")
    parser.add_argument("--calibration-files", nargs="+", default=None,
                        help="second evaluate-output set (train split) for the "
                             "train-vs-test calibration FID")
    parser.add_argument("--figures", type=str, default=None,
                        help="also render the notebook figure set into this directory")
    args = parser.parse_args(argv)
    report = evaluation_report(args.files, calibration_files=args.calibration_files)
    text = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).write_text(text)
    print(text)
    if args.figures:
        for p in report_figures(args.files, args.figures):
            print(f"wrote {p}")


if __name__ == "__main__":
    main()
