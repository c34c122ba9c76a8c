"""Model shape / init-invariant tests for every architecture preset
(/root/reference/tqdne/architectures.py shapes, channels-last here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tqdne_tpu import configs
from tqdne_tpu.models.autoencoder import AutoencoderKL, kl_divergence
from tqdne_tpu.models.classifier import Classifier, weighted_cross_entropy
from tqdne_tpu.models.unet import UNet
from tqdne_tpu.utils import count_params


def _unet_kwargs(cfg_dict):
    d = dict(cfg_dict)
    d.pop("flash_attention", None)
    return d


@pytest.fixture(scope="module")
def cfg1d():
    return configs.LatentMovingAverageEnvelopeConfig(workdir=".")


@pytest.fixture(scope="module")
def cfg2d():
    return configs.LatentSpectrogramConfig(workdir=".")


def test_unet_1d_shapes_and_zero_init(cfg1d):
    # small version of the 1D preset for test speed
    ucfg = configs.get_1d_unet_config(cfg1d, in_channels=6, out_channels=6)
    ucfg["model_channels"] = 32
    model = UNet(**_unet_kwargs(ucfg))
    x = jnp.ones((2, 512, 6))
    t = jnp.zeros((2,))
    cond = jnp.ones((2, 5))
    params = model.init(jax.random.key(0), x, t, cond)
    out = model.apply(params, x, t, cond)
    assert out.shape == x.shape
    # zero-init output conv => fresh UNet returns exactly zero
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet_2d_flagship_shapes(cfg2d):
    ucfg = configs.get_2d_unet_config(cfg2d, in_channels=8, out_channels=8, model_channels=32)
    model = UNet(**_unet_kwargs(ucfg))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 8))
    t = jnp.full((2,), 0.5)
    cond = jnp.ones((2, 5))
    params = model.init(jax.random.key(0), x, t, cond)
    out = model.apply(params, x, t, cond)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_unet_flagship_param_count(cfg2d):
    """Full-size flagship 2D UNet builds and has a plausible param count."""
    ucfg = configs.get_2d_unet_config(cfg2d, in_channels=8, out_channels=8)
    model = UNet(**_unet_kwargs(ucfg))
    params = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 32, 32, 8)), jnp.zeros((1,)), jnp.zeros((1, 5))),
        jax.random.key(0),
    )
    n = count_params(params)
    assert 50e6 < n < 200e6  # ~108M in the torch reference ballpark


def test_unet_dropout_train_vs_eval(cfg1d):
    ucfg = configs.get_1d_unet_config(cfg1d, in_channels=6, out_channels=6)
    ucfg.update(model_channels=32, dropout=0.5)
    model = UNet(**_unet_kwargs(ucfg))
    x = jax.random.normal(jax.random.key(1), (2, 256, 6))
    t = jnp.zeros((2,))
    cond = jnp.ones((2, 5))
    params = model.init(jax.random.key(0), x, t, cond)
    # randomize params (zero-init convs otherwise make the output identically 0)
    flat, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.key(42), len(flat))
    params = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, p.shape, p.dtype) * 0.02 for k, p in zip(keys, flat)]
    )
    a = model.apply(params, x, t, cond)
    b = model.apply(params, x, t, cond)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # eval deterministic
    # train mode requires a dropout rng and produces different outputs per key
    c = model.apply(params, x, t, cond, train=True, rngs={"dropout": jax.random.key(2)})
    d = model.apply(params, x, t, cond, train=True, rngs={"dropout": jax.random.key(3)})
    assert not np.allclose(np.asarray(c), np.asarray(d))


def test_autoencoder_2d_latent_shape(cfg2d):
    enc, dec = configs.get_2d_autoencoder_configs(cfg2d)
    enc = enc | {"model_channels": 16}
    dec = dec | {"model_channels": 16}
    ae = AutoencoderKL(encoder_config=enc, decoder_config=dec)
    x = jax.random.normal(jax.random.key(0), (2, 128, 128, 3))
    params = ae.init({"params": jax.random.key(1), "sample": jax.random.key(2)}, x)
    z = ae.apply(params, x, method="encode", rngs={"sample": jax.random.key(3)})
    assert z.shape == (2, 32, 32, 8)  # 4x spatial compression, 8 latent channels
    recon = ae.apply(params, z, method="decode")
    assert recon.shape == x.shape


def test_autoencoder_1d_latent_shape(cfg1d):
    enc, dec = configs.get_1d_autoencoder_configs(cfg1d)
    enc = enc | {"model_channels": 16}
    dec = dec | {"model_channels": 16}
    ae = AutoencoderKL(encoder_config=enc, decoder_config=dec)
    x = jax.random.normal(jax.random.key(0), (2, 4064, 6))
    params = ae.init({"params": jax.random.key(1), "sample": jax.random.key(2)}, x)
    z = ae.apply(params, x, method="encode", rngs={"sample": jax.random.key(3)})
    assert z.shape == (2, 1016, 16)  # 4064/4 x latent_channels 16
    recon = ae.apply(params, z, method="decode")
    assert recon.shape == x.shape


def test_kl_divergence_zero_at_prior():
    mean = jnp.zeros((4, 8, 8, 3))
    log_std = jnp.zeros((4, 8, 8, 3))
    np.testing.assert_allclose(np.asarray(kl_divergence(mean, log_std)), 0.0, atol=1e-6)
    # positive elsewhere
    assert float(kl_divergence(mean + 1.0, log_std).mean()) > 0


def test_classifier_shapes(cfg2d):
    ecfg = configs.get_classifier_encoder_config(cfg2d, out_channels=64)
    ecfg["model_channels"] = 16
    clf = Classifier(encoder_config=ecfg, num_classes=36)
    x = jax.random.normal(jax.random.key(0), (2, 128, 128, 3))
    params = clf.init(jax.random.key(1), x)
    logits = clf.apply(params, x)
    assert logits.shape == (2, 36)
    emb = clf.apply(params, x, method="embed")
    assert emb.shape == (2, 64)


def test_weighted_cross_entropy_matches_torch_semantics():
    """Weighted CE normalizes by the sum of per-sample weights."""
    logits = jnp.array([[2.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    labels = jnp.array([0, 1, 0])
    w = jnp.array([1.0, 3.0])
    lp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    want = -(1.0 * lp[0, 0] + 3.0 * lp[1, 1] + 1.0 * lp[2, 0]) / (1.0 + 3.0 + 1.0)
    got = float(weighted_cross_entropy(logits, labels, w))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_unet_bfloat16_compute(cfg1d):
    """bf16 compute path: f32 params, bf16 activations, f32 output."""
    ucfg = configs.get_1d_unet_config(cfg1d, in_channels=6, out_channels=6)
    ucfg["model_channels"] = 32
    model = UNet(**_unet_kwargs(ucfg), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(1), (2, 256, 6), dtype=jnp.bfloat16)
    t = jnp.zeros((2,), jnp.bfloat16)
    cond = jnp.ones((2, 5), jnp.bfloat16)
    params = model.init(jax.random.key(0), x, t, cond)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(p.dtype == jnp.float32 for p in leaves)
    out = model.apply(params, x, t, cond)
    assert out.dtype == jnp.float32
    assert out.shape == x.shape
