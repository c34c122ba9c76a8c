"""CLI wiring tests (no full-size training: architectures are exercised in
test_models/test_train; here we test config plumbing, dataset building,
and conditioning handling)."""

import numpy as np
import pytest

from tqdne_tpu import configs
from tqdne_tpu.cli import common
from tqdne_tpu.cli.generate_waveforms import SUMMARY_STATISTICS, normalize, read_conditioning
from tqdne_tpu.cli.train import RECIPES


def test_recipe_names_match_reference():
    """Run names must match the reference scripts exactly (checkpoint path
    conventions: train_latent_edm.py:52-58 loads the AE by name)."""
    want = {
        "1d_edm": "EDM-MovingAvg",
        "1d_autoencoder": "Autoencoder-1024x16-MovingAvg",
        "1d_latent_edm": "Latent-EDM-MovingAvg-1024x16",
        "autoencoder": "Autoencoder-32x32x4-LogSpectrogram",
        "edm": "EDM-128x128-LogSpectrogram",
        "latent_edm": "Latent-EDM-32x32x8-LogSpectrogram",
        "classifier": "Classifier-LogSpectrogram",
    }
    for key, name in want.items():
        assert RECIPES[key].name == name
    assert RECIPES["latent_edm"].ae_name == "Autoencoder-32x32x4-LogSpectrogram"
    assert RECIPES["1d_latent_edm"].ae_name == "Autoencoder-1024x16-MovingAvg"


def test_signal_shapes():
    assert common.signal_shape(configs.SpectrogramConfig(workdir=".")) == (128, 128, 3)
    assert common.signal_shape(configs.MovingAverageEnvelopeConfig(workdir=".")) == (4064, 6)
    assert common.signal_shape(configs.Config(workdir=".", t=4064)) == (4064, 3)


def test_config_paths(tmp_path):
    cfg = configs.LatentSpectrogramConfig(workdir=tmp_path)
    assert cfg.datapath == tmp_path / "data" / "preprocessed_waveforms.h5"
    assert cfg.outputdir == tmp_path / "outputs"
    assert cfg.latent_channels == 8
    assert cfg.kl_weight == 1e-6
    clf = configs.SpectrogramClassificationConfig(workdir=tmp_path)
    assert clf.num_classes == 36


def test_build_dataset_parity(tmp_path):
    """build_dataset: vs30<=0 filtering, z-scoring, (b,t,c)->(b,c,t)."""
    import h5py

    from tqdne_tpu.cli.build_dataset import run

    n, t, c = 20, 64, 3
    rng = np.random.default_rng(0)
    raw = tmp_path / "data" / "raw_waveforms.h5"
    raw.parent.mkdir(parents=True)
    vs30 = rng.uniform(-10, 800, n).astype(np.float32)
    vs30[:3] = -1  # filtered out
    wf = rng.standard_normal((n, t, c)).astype(np.float32)
    wf[5, 0, 0] = np.nan
    with h5py.File(raw, "w") as f:
        f.create_dataset("waveforms", data=wf)
        f.create_dataset("vs30", data=vs30)
        f.create_dataset("indices_valid_waveforms", data=np.full(n, t))
        for k in ("hypocentral_distance", "magnitude", "hypocentre_depth", "azimuthal_gap"):
            f.create_dataset(k, data=rng.uniform(1, 100, n).astype(np.float32))

    run(str(tmp_path), batch_size=7)

    kept = int((vs30 > 0).sum())
    first_kept = int(np.argmax(vs30 > 0))
    with h5py.File(tmp_path / "data" / "preprocessed_waveforms.h5") as f:
        assert f["waveforms"].shape == (kept, c, t)  # vs30<=0 filtered, transposed
        assert np.isfinite(f["waveforms"][:]).all()  # NaN scrubbed
        nf = f["normalized_features"][:]
        assert nf.shape == (kept, 5)
        np.testing.assert_allclose(nf.mean(0), 0, atol=1e-5)
        np.testing.assert_allclose(nf.std(0), 1, atol=1e-4)
        # transposition preserves content
        np.testing.assert_allclose(f["waveforms"][0], wf[first_kept].T, atol=1e-6)


def test_generate_conditioning_csv_and_flags(tmp_path):
    import argparse

    csv = tmp_path / "cond.csv"
    csv.write_text(
        "hypocentral_distance,magnitude,vs30,hypocentre_depth,azimuthal_gap,num_samples\n"
        "50,5.5,400,20,100,3\n"
        "150,6.5,300,40,200,2\n"
    )
    ns = argparse.Namespace(
        csv=str(csv), num_samples=None,
        **{k: None for k in ("hypocentral_distance", "magnitude", "vs30",
                             "hypocentre_depth", "azimuthal_gap")},
    )
    rows = read_conditioning(ns)
    assert rows.shape == (5, 5)
    assert (rows[:3] == [50, 5.5, 400, 20, 100]).all()

    ns2 = argparse.Namespace(
        csv=None, num_samples=4, hypocentral_distance=75.0, magnitude=6.0,
        vs30=500.0, hypocentre_depth=10.0, azimuthal_gap=90.0,
    )
    rows2 = read_conditioning(ns2)
    assert rows2.shape == (4, 5)

    norm = normalize(rows2)
    want = (rows2 - SUMMARY_STATISTICS[:, 0]) / SUMMARY_STATISTICS[:, 1]
    np.testing.assert_allclose(norm, want)


def test_parse_dtype():
    import jax.numpy as jnp

    assert common.parse_dtype("bf16") == jnp.bfloat16
    assert common.parse_dtype("f32") == jnp.float32
