"""Evaluation report + metrics tests (evaluation.ipynb replacement)."""

import numpy as np
import pytest

from tqdne_tpu.eval.metrics import (
    AmplitudeSpectralDensity,
    MeanSquaredError,
    asd_loss,
    frechet_distance,
)
from tqdne_tpu.eval.report import evaluation_report


def test_frechet_distance_properties(rng):
    x = rng.standard_normal((200, 8))
    assert frechet_distance(x, x) == pytest.approx(0.0, abs=1e-6)
    assert frechet_distance(x, x, isotropic=True) == pytest.approx(0.0, abs=1e-9)
    y = x + 3.0
    assert frechet_distance(x, y) == pytest.approx(8 * 9.0, rel=0.05)  # mean shift^2 * dim


def test_asd_metric_and_loss(rng):
    x = rng.standard_normal((32, 3, 512))
    m = AmplitudeSpectralDensity(fs=100, channel=0, isotropic=True)
    assert m(x, x) == pytest.approx(0.0, abs=1e-9)
    assert m(x, rng.standard_normal((32, 3, 512)) * 3) > 0.01
    assert asd_loss(x, x) == 0.0
    assert MeanSquaredError(channel=1)(x, x) == 0.0


def _write_eval_file(path, rng, n=64, provenance=None):
    import h5py
    import json

    mag = rng.uniform(4.0, 9.0, n)
    dist = rng.uniform(1.0, 199.0, n)
    labels = None
    with h5py.File(path, "w") as f:
        if provenance is not None:
            f.attrs["provenance"] = json.dumps(provenance)
        f.create_dataset("magnitude", data=mag)
        f.create_dataset("hypocentral_distance", data=dist)
        f.create_dataset("vs30", data=rng.uniform(200, 800, n))
        f.create_dataset("hypocentre_depth", data=rng.uniform(2, 90, n))
        f.create_dataset("azimuthal_gap", data=rng.uniform(30, 330, n))
        emb = rng.standard_normal((n, 16))
        f.create_dataset("target_classifier_embedding", data=emb)
        f.create_dataset("predicted_classifier_embedding", data=emb + 0.1)
        logits = rng.standard_normal((n, 36))
        f.create_dataset("target_classifier_pred", data=logits)
        f.create_dataset("predicted_classifier_pred", data=logits)
        wf = rng.standard_normal((n, 3, 256)).astype(np.float32)
        f.create_dataset("target_waveform", data=wf)
        f.create_dataset("predicted_waveform", data=wf + 0.05 * rng.standard_normal(wf.shape))
        f.create_dataset("target_signal", data=np.zeros((n, 3, 8, 8), np.float32))
        f.create_dataset("predicted_signal", data=np.zeros((n, 3, 8, 8), np.float32))
    return path


def test_evaluation_report(tmp_path, rng):
    p1 = _write_eval_file(tmp_path / "rank0.h5", rng)
    p2 = _write_eval_file(tmp_path / "rank1.h5", rng, n=32)
    rep = evaluation_report([p1, p2], min_bin_count=2)
    assert rep["num_samples"] == 96
    assert rep["fid"] >= 0
    assert rep["inception_score"] >= 1.0
    assert len(rep["asd_frechet_per_channel"]) == 3
    assert len(rep["mse_per_channel"]) == 3
    assert 0.0 <= rep["classifier_accuracy_predicted"] <= 1.0
    fid_bins = np.array(rep["fid_per_bin"])
    assert fid_bins.shape == (6, 6)
    assert "fid_calibration" not in rep  # only with a second target set
    assert "provenance" not in rep  # only when the eval file carries it

    # train-vs-test calibration FID (evaluation.ipynb baseline): compare
    # this set's targets against another split's targets
    p3 = _write_eval_file(tmp_path / "train_rank0.h5", rng, n=48)
    rep2 = evaluation_report([p1, p2], min_bin_count=2, calibration_files=[p3])
    assert rep2["fid_calibration"] >= 0
    # same-distribution targets: calibration FID comparable to (or below)
    # the generated-vs-target FID scale
    assert np.isfinite(rep2["fid_calibration"])


def test_incremental_writer_resume(tmp_path, rng):
    from tqdne_tpu.data.preprocessing import IncrementalH5Writer

    path = tmp_path / "incr.h5"
    with IncrementalH5Writer(path) as w:
        assert w.write("eq001", {"wf": rng.standard_normal((3, 64))})
        assert w.write("eq002", {"wf": rng.standard_normal((3, 64))})
    # resume: already-processed keys are skipped
    with IncrementalH5Writer(path) as w:
        assert w.is_processed("eq001")
        assert not w.write("eq001", {"wf": np.zeros((3, 64))})
        assert w.write("eq003", {"wf": rng.standard_normal((3, 64))})
        assert w.processed_keys == {"eq001", "eq002", "eq003"}
    diary = open(str(path) + ".diary").read().split()
    assert diary == ["eq001", "eq002", "eq003"]


def test_p_window_filter(rng):
    from tqdne_tpu.data.preprocessing import p_window_filter

    n = 4096

    def trace(onset):
        x = 0.01 * rng.standard_normal((3, n))
        t = np.arange(n - onset) / 100.0
        x[:, onset:] += np.sin(2 * np.pi * 5 * t) * np.exp(-t / 5)
        return x

    batch = np.stack([trace(500), trace(3000)])  # 5 s (in window), 30 s (out)
    keep = p_window_filter(batch, fs=100.0, window_s=(2.0, 7.0))
    assert keep[0] and not keep[1]


def test_report_figures(tmp_path, rng):
    from tqdne_tpu.eval.report import report_figures

    p = _write_eval_file(tmp_path / "rank0.h5", rng, n=96)
    written = report_figures([p], tmp_path / "figs", gallery_events=2, gallery_samples=3)
    names = {w.name for w in written}
    assert {"asd_comparison.png", "envelope_grid.png", "asd_grid.png", "bin_asd.png",
            "waveform_gallery.png", "cumulative_probability.png",
            "sample_overlay.png"} <= names
    for w in written:
        assert w.exists() and w.stat().st_size > 1000


def test_evaluation_report_provenance(tmp_path, rng):
    """Training-budget provenance written by tqdne-evaluate (HDF5 root attr)
    is copied verbatim into the report JSON so committed quality numbers
    state the budget that produced them."""
    prov = {"run_name": "Latent-Distill-32x32x8-LogSpectrogram",
            "checkpoint_step": 17280, "train_epoch": 640, "train_step": 17280,
            "num_steps": 2, "solver": "heun", "consistency_noise": "song"}
    p = _write_eval_file(tmp_path / "rank0.h5", rng, provenance=prov)
    rep = evaluation_report([p], min_bin_count=2)
    assert rep["provenance"] == prov


def test_evaluation_report_without_classifier(tmp_path, rng):
    """1D (MovingAvg) configs have no spectrogram classifier — the report
    must still produce the waveform-domain metrics with fid/IS null."""
    import h5py

    p = tmp_path / "rank0.h5"
    _write_eval_file(p, rng, n=48)
    with h5py.File(p, "r+") as f:
        for k in ("target_classifier_embedding", "predicted_classifier_embedding",
                  "target_classifier_pred", "predicted_classifier_pred"):
            del f[k]
    rep = evaluation_report([p], mag_bins=(4, 6.5, 9.1), dist_bins=(0, 100, 200))
    assert rep["fid"] is None and rep["inception_score"] is None
    assert len(rep["asd_frechet_per_channel"]) == 3
    assert "asd_frechet_per_bin" in rep
    flat = [v for row in rep["asd_frechet_per_bin"] for v in row]
    assert any(v is not None for v in flat)
