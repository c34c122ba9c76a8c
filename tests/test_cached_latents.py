"""Cached-latents training: precompute frozen-AE moments once, sample the
latent in the step (the reference re-encodes every step, edm.py:121-124;
this removes the encoder forward from the hot loop — BENCH_NOTES r2)."""

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_precompute_and_train_cached_latents(tmp_path):
    from tqdne_tpu.cli import train as train_cli

    wd = str(tmp_path)
    # 1) train the (tiny) frozen AE
    train_cli.main([
        "1d_autoencoder", "--workdir", wd, "--synthetic", "24", "--max-epochs", "1",
        "-b", "8", "--tiny", "--dtype", "f32",
    ])

    # 2) precompute latent moments
    from tqdne_tpu.cli import precompute_latents as pre

    pre.main(["--workdir", wd, "--config", "1d_latent_edm", "-b", "8",
              "--tiny", "--dtype", "f32"])
    from tqdne_tpu import configs

    config = configs.LatentMovingAverageEnvelopeConfig(workdir=wd)
    lat_path = pre.latents_path(config, "Autoencoder-1024x16-MovingAvg")
    with h5py.File(lat_path) as f:
        n = f["latent_mean"].shape[0]
        assert n == 24
        assert f["latent_mean"].shape == f["latent_log_std"].shape
        assert np.isfinite(f["latent_mean"][:]).all()
        stored_mean = f["latent_mean"][:2]

    # moments parity: the file contains exactly ae.moments(representation(x))
    from tqdne_tpu.cli import common
    from tqdne_tpu.data.dataset import Dataset

    rep = config.make_representation()
    ds = Dataset(config.datapath, rep, cut=config.t, cond=False, split="full")
    ae, _, _ = common.build_autoencoder(config, 1, jnp.float32, model_channels=32)
    ae_vars = common.load_ae_variables(config, "Autoencoder-1024x16-MovingAvg", ae,
                                       common.signal_shape(config))
    batch = ds.load_batch(np.array([0, 1]))
    sig = jnp.moveaxis(jnp.asarray(batch["signal"]), 1, -1)
    want_mean, _ = ae.apply(ae_vars, sig, method="moments")
    np.testing.assert_allclose(stored_mean, np.asarray(want_mean), rtol=2e-2, atol=2e-3)

    # 3) train the latent EDM from the cache (no encoder in the step)
    train_cli.main([
        "1d_latent_edm", "--workdir", wd, "--max-epochs", "1", "-b", "8",
        "--eval-every", "99", "--tiny", "--dtype", "f32", "--cached-latents",
    ])
    import json

    mfile = config.outputdir / "Latent-EDM-MovingAvg-1024x16" / "metrics.jsonl"
    recs = [json.loads(l) for l in mfile.read_text().splitlines()]
    losses = [r["training/loss"] for r in recs if "training/loss" in r]
    # the untrained tiny AE's log_std is large so the loss is huge — but the
    # cached-latents step must run and produce finite numbers
    assert losses and np.isfinite(losses).all()

    # 4) staleness guard: a sidecar from different AE weights must refuse
    import gc

    ds.close()
    gc.collect()  # drop the training run's read handles before reopening r+
    with h5py.File(lat_path, "r+", locking=False) as f:
        f.attrs["ae_fingerprint"] = 0.0
    with pytest.raises(SystemExit, match="different AE weights"):
        train_cli.main([
            "1d_latent_edm", "--workdir", wd, "--max-epochs", "1", "-b", "8",
            "--eval-every", "99", "--tiny", "--dtype", "f32", "--cached-latents",
            "--no-resume",
        ])


def test_keys_pushdown_skips_waveform_read(tmp_path):
    """load_batch(keys=...) must not MATERIALIZE unrequested arrays: for
    cached-latent training batches (moments + cond only) the waveform slab
    read and host representation are skipped — ~8 s/epoch of discarded IO
    on the flagship chain (round 5)."""
    from tqdne_tpu.data import representation as rep
    from tqdne_tpu.data.dataset import Dataset, make_synthetic_dataset

    path = tmp_path / "wf.h5"
    make_synthetic_dataset(path, n=16, t=256)
    ds = Dataset(path, rep.Identity(), cut=256, cond=True, split="full")
    calls = {"n": 0}

    class SpyWaveforms:
        def __init__(self, real):
            self.real = real
            self.shape = real.shape

        def __getitem__(self, idx):
            calls["n"] += 1
            return self.real[idx]

    ds.waveforms = SpyWaveforms(ds.waveforms)
    batch = ds.load_batch(np.arange(4), keys=("cond",))
    assert set(batch) == {"cond"}
    assert calls["n"] == 0, "waveform slab was read despite keys=('cond',)"
    full = ds.load_batch(np.arange(4))
    assert {"waveform", "signal", "valid_index", "cond"} <= set(full)
    assert calls["n"] == 1
    ds.close()
