"""Latent consistency model (beyond reference): iCT trained in the
flagship's frozen-VAE latent space — few-eval sampling of 128x128
spectrograms.  The reference trains consistency only on 1D envelopes
(/root/reference/tqdne/consistency_model.py); the latent variant reuses
its exact loss/schedule (diffusion/consistency.py) with the EDM factory's
latent/cached-moments batch contract (train/steps.py:make_edm_steps)."""

import json

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_latent_consistency_chain(tmp_path):
    """AE -> precompute moments -> cached-latents iCT train -> generate
    via --solver consistency (which routes latent_edm to the latent
    consistency family) -> evaluate."""
    from tqdne_tpu import configs
    from tqdne_tpu.cli import train as train_cli

    wd = str(tmp_path)
    train_cli.main([
        "autoencoder", "--workdir", wd, "--synthetic", "24", "--max-epochs", "1",
        "-b", "8", "--tiny", "--dtype", "f32",
    ])

    from tqdne_tpu.cli import precompute_latents as pre

    pre.main(["--workdir", wd, "--config", "latent_consistency", "-b", "8",
              "--tiny", "--dtype", "f32"])

    train_cli.main([
        "latent_consistency", "--workdir", wd, "--max-epochs", "1", "-b", "8",
        "--eval-every", "99", "--tiny", "--dtype", "f32", "--cached-latents",
    ])
    config = configs.LatentSpectrogramConfig(workdir=wd)
    mfile = config.outputdir / "Latent-Consistency-32x32x8-LogSpectrogram" / "metrics.jsonl"
    recs = [json.loads(l) for l in mfile.read_text().splitlines()]
    losses = [r["training/loss"] for r in recs if "training/loss" in r]
    assert losses and np.isfinite(losses).all()

    # generate: --solver consistency on the flagship config routes here
    from tqdne_tpu.cli import generate_waveforms as gen

    out = tmp_path / "gen_cm.h5"
    gen.main([
        "--config", "latent_edm", "--solver", "consistency", "--workdir", wd,
        "--outfile", str(out), "--num_samples", "2", "--hypocentral_distance", "50",
        "--magnitude", "5.5", "--vs30", "400", "--hypocentre_depth", "20",
        "--azimuthal_gap", "100", "--batch_size", "2", "--tiny", "--dtype", "f32",
    ])
    with h5py.File(out) as f:
        wf = f["waveforms"][:]
        assert wf.shape == (2, 3, 4064)
        # untrained models can overflow exp() in the spectrogram inversion
        # (reference representation.py:57-60 parity); require real data
        assert np.isfinite(wf).mean() > 0.5

    # evaluate through the config-polymorphic CLI (2-eval sampling)
    from tqdne_tpu.cli import evaluate as ev

    ev.main([
        "--workdir", wd, "--config", "latent_consistency", "--split", "test",
        "-b", "2", "--num_steps", "2", "--no-classifier", "--limit-batches", "1",
        "--tiny", "--dtype", "f32",
    ])
    files = list((tmp_path / "evaluation").glob(
        "Latent-Consistency-32x32x8-LogSpectrogram-split_test-rank_0.h5"))
    assert files
    with h5py.File(files[0]) as f:
        assert f["predicted_waveform"].shape[1:] == (3, 4064)
        assert np.isfinite(f["predicted_waveform"][:]).mean() > 0.5


def test_latent_consistency_steps_match_edm_batch_contract():
    """The latent consistency factory accepts the same batches as the EDM
    latent factory: in-step encode AND cached moments, both finite."""
    from tqdne_tpu.diffusion.consistency import ConsistencyConfig, make_consistency_steps
    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.unet import UNet
    from tqdne_tpu.train.state import TrainState, make_optimizer

    base = dict(model_channels=8, channel_mult=(1, 2), num_res_blocks=1,
                attention_resolutions=(), dims=2, conv_kernel_size=3, dropout=0.0)
    enc = base | {"in_channels": 3, "out_channels": 8}  # latent_channels*2
    dec = base | {"in_channels": 4, "out_channels": 3}
    ae = AutoencoderKL(encoder_config=enc, decoder_config=dec)
    x = jnp.zeros((2, 16, 16, 3))
    ae_vars = jax.jit(ae.init)({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)

    unet = UNet(model_channels=8, num_res_blocks=1, channel_mult=(1, 2),
                attention_resolutions=(), dims=2, cond_features=5,
                in_channels=4, out_channels=4)
    lat = ae.apply(ae_vars, x, method="encode", rngs={"sample": jax.random.key(2)})
    params = jax.jit(unet.init)(jax.random.key(0), lat, jnp.zeros((2,)), jnp.zeros((2, 5)))
    tx = make_optimizer("radam", 1e-4)
    state = TrainState.create(params, tx)

    # in-step encode mode
    ts, es, sf = make_consistency_steps(unet, tx, ConsistencyConfig(), max_steps=10,
                                        autoencoder=ae)
    batch = {"signal": x, "cond": jnp.zeros((2, 5))}
    state2, m = jax.jit(ts)(state, batch, jax.random.key(1), ae_vars)
    assert np.isfinite(float(m["loss"]))
    m2 = jax.jit(es)(state2, batch, jax.random.key(2), ae_vars)
    assert np.isfinite(float(m2["loss"]))

    # cached-moments mode
    mean, log_std = ae.apply(ae_vars, x, method="moments")
    tsm, esm, _ = make_consistency_steps(unet, tx, ConsistencyConfig(), max_steps=10,
                                         autoencoder=ae, latent_moments=True)
    mb = {"latent_mean": mean, "latent_log_std": log_std, "cond": jnp.zeros((2, 5))}
    state3, m3 = jax.jit(tsm)(state, mb, jax.random.key(3), ae_vars)
    assert np.isfinite(float(m3["loss"]))

    # latent sampling decodes to signal space
    out = jax.jit(lambda p, k, av: sf(p, k, (2, *lat.shape[1:]), sigmas=(1.0,),
                                      cond=jnp.zeros((2, 5)), ae_vars=av))(
        state2.ema_params, jax.random.key(4), ae_vars)
    assert out.shape == (2, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())
