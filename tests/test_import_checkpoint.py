"""Checkpoint-import CLI: torch Lightning .ckpt -> orbax run dir round trip,
including the EMA callback state (ema.py:50-54 format)."""

import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")


def _make_lightning_ckpt(tmp_path):
    """Synthesize a Lightning-format AE checkpoint: state_dict with
    encoder./decoder. prefixes, global_step, and ema_state."""
    from tqdne.blocks import Decoder as RefDecoder
    from tqdne.blocks import Encoder as RefEncoder

    from tqdne_tpu import configs

    cfg = configs.LatentSpectrogramConfig(workdir=tmp_path)
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    torch.manual_seed(0)
    enc = RefEncoder(**enc_cfg, flash_attention=False)
    dec = RefDecoder(**dec_cfg, flash_attention=False)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd |= {f"decoder.{k}": v for k, v in dec.state_dict().items()}
    # EMA state: same names, shifted values (so we can tell them apart)
    ema = {k: v + 0.25 for k, v in sd.items()}
    ckpt = {"state_dict": sd, "global_step": 1234, "ema_state": ema}
    path = tmp_path / "autoencoder.ckpt"
    torch.save(ckpt, path)
    return path, enc


def test_import_autoencoder_checkpoint(tmp_path, rng):
    from tqdne_tpu.cli.import_checkpoint import import_checkpoint
    from tqdne_tpu.train.checkpoint import Checkpointer

    ckpt_path, ref_enc = _make_lightning_ckpt(tmp_path)
    outdir = import_checkpoint("autoencoder", str(ckpt_path), str(tmp_path))

    restored, step = Checkpointer(outdir).restore_latest_raw()
    assert step == 1234
    assert int(restored["step"]) == 1234

    # live params match the torch encoder forward
    from tqdne_tpu import configs
    from tqdne_tpu.models.autoencoder import AutoencoderKL

    cfg = configs.LatentSpectrogramConfig(workdir=tmp_path)
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    ae = AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg)
    x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_enc(torch.tensor(x)).numpy()
    mean_got, logstd_got = ae.apply(
        restored["params"], jnp.asarray(np.moveaxis(x, 1, -1)), method="moments"
    )
    got = np.concatenate(
        [np.moveaxis(np.asarray(mean_got), -1, 1), np.moveaxis(np.asarray(logstd_got), -1, 1)],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # EMA params carry the +0.25 shift
    w_live = restored["params"]["params"]["encoder"]["in_conv"]["kernel"]
    w_ema = restored["ema_params"]["params"]["encoder"]["in_conv"]["kernel"]
    np.testing.assert_allclose(np.asarray(w_ema) - np.asarray(w_live), 0.25, atol=1e-6)


@pytest.mark.slow
def test_import_with_verify_passes_and_catches_tampering(tmp_path):
    """--verify (VERDICT r3 #8): the released-weights validation path.

    Importing with verify=True must rebuild the torch model and pass the
    <=1e-4 forward parity check; a tampered conversion must exit nonzero.
    """
    from tqdne_tpu.cli.import_checkpoint import _verify_conversion, import_checkpoint

    ckpt_path, _ = _make_lightning_ckpt(tmp_path)
    import_checkpoint("autoencoder", str(ckpt_path), str(tmp_path), verify=True)

    # negative path: corrupt one converted weight -> SystemExit
    from tqdne_tpu import configs
    from tqdne_tpu.utils.torch_convert import convert_autoencoder

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    cfg = configs.LatentSpectrogramConfig(workdir=tmp_path)
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    variables = convert_autoencoder(sd, enc_cfg, dec_cfg)
    kernel = np.asarray(variables["params"]["encoder"]["in_conv"]["kernel"])
    variables["params"]["encoder"]["in_conv"]["kernel"] = jnp.asarray(kernel + 0.05)
    with pytest.raises(SystemExit, match="FAILED"):
        _verify_conversion("autoencoder", sd, variables, (enc_cfg, dec_cfg))
