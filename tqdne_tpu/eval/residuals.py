"""Ground-motion residual analysis: observed vs generated PGA/PGV.

The reference's Residual_plot_stead.ipynb workflow
(/root/reference/experiments/Residual_plot_stead.ipynb +
experiments/utils.py:599-803): integrate horizontal components to
velocity, take GMRotD50-style peak ground motions, bin the
log10(obs/gen) ratios by hypocentral distance, and compare the absolute
levels against GMM predictions (BooreEtAl2014 + Kanno2006Shallow in the
reference; the built-in Kanno2006Shallow here, openquake-gated
otherwise).  Exposed as a function and the `tqdne-residuals` CLI over
tqdne-evaluate output files.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from tqdne_tpu.eval import seismo


def residual_report(
    target_wf: np.ndarray,
    predicted_wf: np.ndarray,
    hypocentral_distance: np.ndarray,
    *,
    dt: float = 0.01,
    magnitude: np.ndarray | None = None,
    vs30: np.ndarray | None = None,
    n_bins: int = 20,
) -> dict:
    """Compute PGA & PGV residual statistics (+ GMM comparison curves)."""
    report: dict = {}
    for pgv, label in ((True, "PGV"), (False, "PGA")):
        res = seismo.evaluate_pgx(target_wf, predicted_wf, dt=dt, pgv=pgv)
        obs = res[f"{label}_geom_mean_obs"]
        gen = res[f"{label}_geom_mean_gwm"]
        binned = seismo.calculate_distance_binned_ratios(
            obs, gen, hypocentral_distance, n_bins=n_bins
        )
        report[label] = {
            "bin_centers": binned["bin_centers"].tolist(),
            "median_log10_ratio": binned["median_ratios"].tolist(),
            "std_log10_ratio": binned["std_ratios"].tolist(),
            "bin_counts": binned["bin_counts"].tolist(),
            "global_median_log10_ratio": float(np.nanmedian(binned["ratio_values"])),
            "obs_peak_median": float(np.median(obs)),
            "gen_peak_median": float(np.median(gen)),
        }
        if magnitude is not None and vs30 is not None:
            mbar, vbar = float(np.mean(magnitude)), float(np.mean(vs30))
            centers = binned["bin_centers"]
            # Kanno2006Shallow on hypocentral distance with the reference's
            # geometric-mean convention correction (custom_GMM.ipynb cells
            # 11-12), BooreEtAl2014 on EPRI-adjusted Joyner-Boore distance
            # (custom_GMM.ipynb cell 1)
            gmm = seismo.gmm_curve(label, mbar, centers, vbar,
                                   model="Kanno2006Shallow",
                                   mean_convention_correction=True)
            report[label]["gmm_kanno2006_median"] = np.asarray(gmm).tolist()
            rjb = seismo.epri_epicentral_to_rjb(centers, mbar)
            gmm_ba = seismo.gmm_curve(label, mbar, rjb, vbar,
                                      model="BooreEtAl2014", rake=0.0)
            report[label]["gmm_boore2014_median"] = np.asarray(gmm_ba).tolist()
    return report


def plot_residuals(report: dict, outpath=None):
    """Median log-ratio vs distance figure (one panel per intensity measure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4.5))
    for ax, label in zip(axes, ("PGV", "PGA")):
        d = report[label]
        centers = np.asarray(d["bin_centers"])
        med = np.asarray(d["median_log10_ratio"])
        std = np.asarray(d["std_log10_ratio"])
        ax.errorbar(centers, med, yerr=std, fmt="o-", capsize=3, label="median log10(obs/gen)")
        ax.axhline(0.0, color="k", lw=0.8, ls="--")
        ax.set_xlabel("Hypocentral distance [km]")
        ax.set_ylabel(f"log10({label}_obs / {label}_gen)")
        ax.set_title(f"{label} residuals")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.tight_layout()
    if outpath:
        fig.savefig(outpath, dpi=110)
    plt.close(fig)
    return fig


def main(argv=None):
    import argparse

    import h5py

    parser = argparse.ArgumentParser("tqdne-residuals", description=__doc__)
    parser.add_argument("files", nargs="+", help="tqdne-evaluate output HDF5 files")
    parser.add_argument("--out", default=None, help="JSON output path")
    parser.add_argument("--plot", default=None, help="figure output path (PNG)")
    parser.add_argument("--n-bins", type=int, default=20)
    args = parser.parse_args(argv)

    tgt, gen, dist, mag, vs30, provs = [], [], [], [], [], []
    for p in args.files:
        with h5py.File(p, "r") as f:
            tgt.append(f["target_waveform"][()])
            gen.append(f["predicted_waveform"][()])
            dist.append(f["hypocentral_distance"][()])
            mag.append(f["magnitude"][()])
            vs30.append(f["vs30"][()])
            provs.append(json.loads(f.attrs["provenance"])
                         if "provenance" in f.attrs else None)
    report = residual_report(
        np.concatenate(tgt), np.concatenate(gen), np.concatenate(dist),
        magnitude=np.concatenate(mag), vs30=np.concatenate(vs30), n_bins=args.n_bins,
    )
    # same provenance contract as eval/report.py: the residual numbers
    # self-describe the checkpoint/sampler that produced them, and merged
    # inputs must agree or the disagreement is recorded, not hidden
    if all(pv == provs[0] for pv in provs):
        if provs[0] is not None:
            report["provenance"] = provs[0]
    else:
        report["provenance"] = {
            "mixed": provs,
            "note": "input files carry differing provenance; see 'mixed' "
                    "(one entry per input file, in argument order)",
        }
    if args.plot:
        plot_residuals(report, args.plot)
    text = json.dumps(report, indent=2)
    if args.out:
        Path(args.out).write_text(text)
    print(text)


if __name__ == "__main__":
    main()
