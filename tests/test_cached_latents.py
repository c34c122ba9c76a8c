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


def test_device_resident_loader_matches_batchloader(tmp_path):
    """DeviceResidentLoader (one upload + device-side gathers; the axon
    device_put host-staging leak workaround) must yield the SAME batches
    as BatchLoader for the same seed/epoch, and fits() must gate on the
    byte budget and process count."""
    import h5py
    import numpy as np

    from tqdne_tpu.data import representation as rep
    from tqdne_tpu.data.dataset import CachedLatentsDataset, make_synthetic_dataset
    from tqdne_tpu.data.pipeline import BatchLoader, DeviceResidentLoader

    wf = tmp_path / "wf.h5"
    make_synthetic_dataset(wf, n=32, t=256)
    lat = tmp_path / "lat.h5"
    with h5py.File(lat, "w") as f:
        f["latent_mean"] = np.random.default_rng(0).normal(
            size=(32, 4, 8, 8)).astype(np.float32)
        f["latent_log_std"] = np.random.default_rng(1).normal(
            size=(32, 4, 8, 8)).astype(np.float32)
    keys = ("latent_mean", "latent_log_std", "cond")
    ds_a = CachedLatentsDataset(wf, lat, rep.Identity(), cut=256, cond=True,
                                split="train")
    ds_b = CachedLatentsDataset(wf, lat, rep.Identity(), cut=256, cond=True,
                                split="train")
    assert DeviceResidentLoader.fits(ds_a, keys)
    assert not DeviceResidentLoader.fits(ds_a, keys, budget_bytes=16)

    ref = BatchLoader(ds_a, 8, shuffle=True, drop_last=True, keys=keys,
                      prefetch=0)
    res = DeviceResidentLoader(ds_b, 8, shuffle=True, drop_last=True,
                               keys=keys)
    assert len(ref) == len(res)
    for epoch in range(2):
        for a, b in zip(ref, res, strict=True):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(np.asarray(a[k]),
                                              np.asarray(b[k]), err_msg=k)
    ds_a.close()
    ds_b.close()
