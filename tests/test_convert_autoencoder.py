"""Converter parity for the VAE Encoder/Decoder and classifier head
against the reference torch blocks (/root/reference/tqdne/blocks.py)."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tqdne.blocks import Decoder as RefDecoder  # noqa: E402
from tqdne.blocks import Encoder as RefEncoder  # noqa: E402

from tqdne_tpu.models.autoencoder import AutoencoderKL  # noqa: E402
from tqdne_tpu.models.classifier import Classifier  # noqa: E402
from tqdne_tpu.utils.torch_convert import convert_autoencoder, convert_classifier  # noqa: E402

ENC_CFG = dict(
    in_channels=3,
    model_channels=32,
    out_channels=8,
    num_res_blocks=2,
    attention_resolutions=(2,),
    dropout=0.0,
    channel_mult=(1, 2),
    conv_kernel_size=3,
    dims=2,
    num_heads=2,
)
DEC_CFG = ENC_CFG | dict(in_channels=4, out_channels=3)


def _to_last(x):
    return np.moveaxis(x, 1, -1)


def _to_first(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def test_autoencoder_conversion_parity(rng):
    torch.manual_seed(0)
    ref_enc = RefEncoder(**ENC_CFG, flash_attention=False).eval()
    ref_dec = RefDecoder(**DEC_CFG, flash_attention=False).eval()

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in ref_enc.state_dict().items()}
    sd |= {f"decoder.{k}": v.detach().numpy() for k, v in ref_dec.state_dict().items()}

    ae = AutoencoderKL(encoder_config=ENC_CFG, decoder_config=DEC_CFG)
    variables = convert_autoencoder(sd, ENC_CFG, DEC_CFG)

    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want_moments = ref_enc(torch.tensor(x)).numpy()  # (B, 8, 8, 8)
    mean_want, logstd_want = np.split(want_moments, 2, axis=1)
    mean_got, logstd_got = ae.apply(variables, jnp.asarray(_to_last(x)), method="moments")
    np.testing.assert_allclose(_to_first(mean_got), mean_want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(_to_first(logstd_got), logstd_want, rtol=1e-4, atol=1e-5)

    z = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want_dec = ref_dec(torch.tensor(z)).numpy()
    got_dec = ae.apply(variables, jnp.asarray(_to_last(z)), method="decode")
    np.testing.assert_allclose(_to_first(got_dec), want_dec, rtol=1e-4, atol=1e-5)


def test_classifier_conversion_parity(rng):
    """Classifier = Encoder + mean-pool + SiLU MLP + linear head
    (/root/reference/tqdne/classifier.py:51-59); the Lightning wrapper is
    not importable (no lightning in env) so the head is composed from
    plain torch modules with the same names."""
    torch.manual_seed(1)
    enc_cfg = ENC_CFG | dict(out_channels=16)
    ref_enc = RefEncoder(**enc_cfg, flash_attention=False).eval()
    mlp1 = torch.nn.Linear(16, 16)
    mlp2 = torch.nn.Linear(16, 16)
    head = torch.nn.Linear(16, 6)

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in ref_enc.state_dict().items()}
    for name, mod in (("output_MLP.1", mlp1), ("output_MLP.3", mlp2), ("output_layer", head)):
        sd[f"{name}.weight"] = mod.weight.detach().numpy()
        sd[f"{name}.bias"] = mod.bias.detach().numpy()

    clf = Classifier(encoder_config=enc_cfg, num_classes=6)
    variables = convert_classifier(sd, enc_cfg)

    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        h = ref_enc(torch.tensor(x))
        h = h.mean(dim=(2, 3))
        emb = mlp2(torch.nn.functional.silu(mlp1(torch.nn.functional.silu(h))))
        want_logits = head(emb).numpy()

    got_logits = clf.apply(variables, jnp.asarray(_to_last(x)))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits, rtol=1e-4, atol=1e-5)
