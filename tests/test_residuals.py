"""Residual-analysis workflow tests (Residual_plot_stead.ipynb counterpart)."""

import numpy as np

from tqdne_tpu.eval.residuals import plot_residuals, residual_report


def test_residual_report_identical_waveforms(rng):
    n, t = 24, 1024
    wf = rng.standard_normal((n, 3, t)).astype(np.float64)
    dist = rng.uniform(10, 200, n)
    rep = residual_report(wf, wf, dist, magnitude=np.full(n, 6.0), vs30=np.full(n, 400.0),
                          n_bins=6)
    for label in ("PGV", "PGA"):
        assert rep[label]["global_median_log10_ratio"] == 0.0
        med = np.asarray(rep[label]["median_log10_ratio"])
        valid = np.asarray(rep[label]["bin_counts"]) > 0
        np.testing.assert_allclose(med[valid], 0.0, atol=1e-12)
        assert "gmm_kanno2006_median" in rep[label]
        assert (np.asarray(rep[label]["gmm_kanno2006_median"]) > 0).all()


def test_residual_report_bias_detection(rng):
    """Generated waveforms 2x too strong -> median log ratio = -log10(2)."""
    n, t = 16, 512
    obs = rng.standard_normal((n, 3, t))
    gen = obs * 2.0
    dist = rng.uniform(10, 200, n)
    rep = residual_report(obs, gen, dist, n_bins=4)
    assert rep["PGA"]["global_median_log10_ratio"] == np.float64(
        np.log10(0.5)
    ) or abs(rep["PGA"]["global_median_log10_ratio"] - np.log10(0.5)) < 1e-9


def test_plot_residuals(tmp_path, rng):
    n = 16
    wf = rng.standard_normal((n, 3, 256))
    rep = residual_report(wf, wf * 1.2, rng.uniform(10, 200, n), n_bins=4)
    out = tmp_path / "res.png"
    plot_residuals(rep, out)
    assert out.exists() and out.stat().st_size > 5000


def test_residuals_cli_stamps_provenance(tmp_path, rng):
    """The CLI copies provenance from the eval HDF5 into the JSON (same
    contract as eval/report.py), so curated residuals.json passes
    scripts/restamp_reports.py --check without a reconstruction entry."""
    import h5py
    import json

    from tqdne_tpu.eval import residuals

    n, t = 8, 256
    prov = {"run_name": "X", "train_epoch": 3, "solver": "heun"}
    p = tmp_path / "eval.h5"
    with h5py.File(p, "w") as f:
        f["target_waveform"] = rng.standard_normal((n, 3, t))
        f["predicted_waveform"] = rng.standard_normal((n, 3, t))
        f["hypocentral_distance"] = rng.uniform(10, 200, n)
        f["magnitude"] = np.full(n, 6.0)
        f["vs30"] = np.full(n, 400.0)
        f.attrs["provenance"] = json.dumps(prov)
    out = tmp_path / "residuals.json"
    residuals.main([str(p), "--out", str(out), "--n-bins", "4"])
    assert json.loads(out.read_text())["provenance"] == prov
