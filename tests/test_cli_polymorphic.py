"""Config-polymorphic evaluate/generate: a 1D EDM run trained from the CLI
must be sampleable and evaluable from the CLI end-to-end (the reference
selects configs by name — experiments/evaluate.py:210, generate.py:210 —
and works for every model family; round-1 hardcoded flagship shapes)."""

import h5py
import numpy as np
import pytest


@pytest.mark.slow
def test_1d_edm_train_generate_evaluate(tmp_path):
    from tqdne_tpu.cli import train as train_cli

    wd = str(tmp_path)
    train_cli.main([
        "1d_edm", "--workdir", wd, "--synthetic", "16", "--max-epochs", "1",
        "-b", "8", "--eval-every", "99", "--tiny", "--dtype", "f32",
    ])

    # --- generate from the 1D run (flag conditioning) ---
    from tqdne_tpu.cli import generate_waveforms as gen

    out = tmp_path / "gen.h5"
    gen.main([
        "--config", "1d_edm", "--workdir", wd, "--outfile", str(out),
        "--num_samples", "3", "--hypocentral_distance", "50", "--magnitude", "5.5",
        "--vs30", "400", "--hypocentre_depth", "20", "--azimuthal_gap", "100",
        "--batch_size", "4", "--num_steps", "2", "--tiny", "--dtype", "f32",
    ])
    with h5py.File(out) as f:
        wf = f["waveforms"][:]
        assert wf.shape == (3, 3, 4064)
        # an untrained model's log-envelope can overflow exp() in the
        # inversion (reference representation.py:57-60 behaves identically),
        # so only require that the pipeline produced real data
        assert np.isfinite(wf).mean() > 0.5

    # same CLI with the N-eval multistep solver (beyond reference)
    out2 = tmp_path / "gen_dpmpp.h5"
    gen.main([
        "--config", "1d_edm", "--workdir", wd, "--outfile", str(out2),
        "--num_samples", "2", "--hypocentral_distance", "50", "--magnitude", "5.5",
        "--vs30", "400", "--hypocentre_depth", "20", "--azimuthal_gap", "100",
        "--batch_size", "2", "--num_steps", "3", "--tiny", "--dtype", "f32",
        "--solver", "dpmpp_2m",
    ])
    with h5py.File(out2) as f:
        assert f["waveforms"].shape == (2, 3, 4064)

    # same CLI in the small-batch serving layout: batch (2) < devices (8),
    # each sample's T axis split 4 ways over the (data, model) mesh
    out3 = tmp_path / "gen_spatial.h5"
    gen.main([
        "--config", "1d_edm", "--workdir", wd, "--outfile", str(out3),
        "--num_samples", "2", "--hypocentral_distance", "50", "--magnitude", "5.5",
        "--vs30", "400", "--hypocentre_depth", "20", "--azimuthal_gap", "100",
        "--batch_size", "2", "--num_steps", "2", "--tiny", "--dtype", "f32",
        "--spatial", "4",
    ])
    with h5py.File(out3) as f:
        assert f["waveforms"].shape == (2, 3, 4064)
        assert np.isfinite(f["waveforms"][:]).mean() > 0.5

    # --- evaluate the same run (no classifier: spectrogram-only preset) ---
    from tqdne_tpu.cli import evaluate as ev

    ev.main([
        "--workdir", wd, "--config", "1d_edm", "--split", "test", "-b", "4",
        "--num_steps", "2", "--no-classifier", "--limit-batches", "1",
        "--tiny", "--dtype", "f32",
    ])
    files = list((tmp_path / "evaluation").glob("EDM-MovingAvg-split_test-rank_0.h5"))
    assert files, "evaluate must write the per-rank file named after the run"
    with h5py.File(files[0]) as f:
        n = f["target_waveform"].shape[0]
        assert n >= 1
        # 1D MovingAverageEnvelope signal: channels-first (6, 4064)
        assert f["target_signal"].shape == (n, 6, 4064)
        assert f["predicted_signal"].shape == (n, 6, 4064)
        assert f["predicted_waveform"].shape == (n, 3, 4064)
        assert np.isfinite(f["target_waveform"][:]).all()
        assert np.isfinite(f["predicted_waveform"][:]).mean() > 0.5
        assert "target_classifier_embedding" not in f
        assert "hypocentral_distance" in f


def test_build_inference_rejects_non_samplers(tmp_path):
    from tqdne_tpu.cli import common

    with pytest.raises(SystemExit):
        common.build_inference("autoencoder", str(tmp_path))
    with pytest.raises(SystemExit):
        common.build_inference("classifier", str(tmp_path))


def test_load_classifier_uses_stored_hparams(tmp_path):
    """A non-default-width classifier checkpoint must restore with its
    STORED encoder config, not the preset (round-2 review finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tqdne_tpu import configs
    from tqdne_tpu.cli.evaluate import load_classifier
    from tqdne_tpu.models.classifier import Classifier
    from tqdne_tpu.train.checkpoint import Checkpointer

    cfg = configs.SpectrogramClassificationConfig(workdir=tmp_path)
    enc = configs.get_classifier_encoder_config(cfg)
    enc["model_channels"] = 16  # tiny, unlike the preset's default
    enc["out_channels"] = 32
    clf = Classifier(encoder_config=enc, num_classes=cfg.num_classes)
    params = jax.jit(clf.init)(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))

    rundir = cfg.outputdir / "Classifier-LogSpectrogram" / "checkpoints"
    ckpt = Checkpointer(rundir)
    ckpt.save_hyperparameters({"kind": "classifier", "encoder": enc,
                               "num_classes": cfg.num_classes})
    ckpt.save(1, {"ema_params": jax.device_get(params)})
    ckpt.close()

    loaded = load_classifier(str(tmp_path), "Classifier-LogSpectrogram", jnp.float32)
    assert loaded is not None
    clf2, variables, enc2, _ = loaded
    assert enc2["model_channels"] == 16
    # restored weights apply cleanly at the stored width
    out = clf2.apply(variables, jnp.zeros((2, 16, 16, 3)))
    assert np.asarray(out).shape == (2, cfg.num_classes)
