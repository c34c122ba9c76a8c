"""Representation round-trip and parity tests.

The reference's representations are numpy-domain invertible transforms
(/root/reference/tqdne/representation.py); we verify exact-inverse
properties, window-placement parity of the O(N) moving average against
np.convolve, and host/device STFT+Griffin-Lim parity.
"""

import numpy as np
import pytest

from tqdne_tpu.data import representation as rep
from tqdne_tpu.data import spectral as nps
from tqdne_tpu.ops import spectral as jsp


def _waveform(rng, shape=(2, 3, 4064)):
    t = np.linspace(0, 40.64, shape[-1])
    base = np.sin(2 * np.pi * 3.0 * t) * np.exp(-(((t - 12) / 6) ** 2))
    x = base + 0.05 * rng.standard_normal(shape)
    return x.astype(np.float32)


def test_identity_roundtrip(rng):
    x = _waveform(rng)
    r = rep.Identity()
    np.testing.assert_array_equal(r.invert_representation(r.get_representation(x)), x)


def test_normalization_roundtrip(rng):
    x = _waveform(rng)
    r = rep.Normalization(mean=0.1, std=2.5)
    np.testing.assert_allclose(r.invert_representation(r.get_representation(x)), x, rtol=1e-4, atol=1e-6)


def test_moving_average_matches_convolve(rng):
    x = np.abs(rng.standard_normal(500))
    for w in (128, 64, 7):
        want = np.convolve(x, np.ones(w) / w, mode="same")
        got = rep.moving_average_same(x, w)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_moving_average_envelope_roundtrip(rng):
    x = _waveform(rng)
    r = rep.MovingAverageEnvelope()
    signal = r.get_representation(x)
    assert signal.shape == (2, 6, 4064)  # 3ch -> 6ch
    back = r.invert_representation(signal)
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-6)


def test_stft_istft_roundtrip(rng):
    x = _waveform(rng, (3, 4064))
    spec = nps.stft(x, 256, 32)
    assert spec.shape == (3, 129, 128)
    back = nps.istft(spec, 256, 32, 4064)
    np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-6)


def test_jax_stft_matches_numpy(rng):
    x = _waveform(rng, (2, 4064))
    want = nps.stft(x, 256, 32)
    got = np.asarray(jsp.stft(x, 256, 32))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_jax_istft_matches_numpy(rng):
    x = _waveform(rng, (2, 4064))
    spec = nps.stft(x, 256, 32)
    want = nps.istft(spec, 256, 32, 4064)
    got = np.asarray(jsp.istft(spec.astype(np.complex64), 256, 32, 4064))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_log_spectrogram_shape_and_range(rng):
    x = _waveform(rng)
    r = rep.LogSpectrogram(hop_size=32)
    signal = r.get_representation(x)
    assert signal.shape == (2, 3, 128, 128)  # 128x128 "image" per channel
    assert signal.min() >= -1.0 - 1e-6  # clip floor maps to exactly -1
    assert np.isfinite(signal).all()
    # log_max=3 is an *empirical* normalization constant: values land in
    # [-1, 1] for data scaled like the training set.
    x_small = x * 1e-2
    signal_small = rep.LogSpectrogram(hop_size=32).get_representation(x_small)
    assert signal_small.max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_log_spectrogram_griffin_lim_reconstruction(rng):
    """Griffin-Lim recovers a waveform whose spectrogram matches the input's."""
    x = _waveform(rng, (1, 4064))
    r = rep.LogSpectrogram(hop_size=32, n_iter=32)
    signal = r.get_representation(x)
    back = r.invert_representation(signal)
    assert back.shape == x.shape
    # compare magnitude spectrograms (phase is not identifiable)
    mag_x = np.abs(nps.stft(x, 256, 32))
    mag_b = np.abs(nps.stft(back, 256, 32))
    rel = np.linalg.norm(mag_x - mag_b) / np.linalg.norm(mag_x)
    assert rel < 0.35  # phase recovery keeps spectral content


def test_config_griffin_lim_iters_plumbing():
    """SpectrogramConfig.griffin_lim_iters reaches the representation (the
    deployment knob behind tqdne-serve/--gl-iters; scripts/gl_iter_sweep.py
    measures the quality-vs-cost trade-off)."""
    from tqdne_tpu import configs

    cfg = configs.LatentSpectrogramConfig(workdir=".", griffin_lim_iters=16)
    r = cfg.make_representation()
    assert r.n_iter == 16
    assert configs.LatentSpectrogramConfig(workdir=".").make_representation().n_iter == 128


def test_jax_griffin_lim_matches_numpy_quality(rng):
    """Device Griffin-Lim reconstructs as well as the host version."""
    import jax

    x = _waveform(rng, (1, 4064))
    mag = np.abs(nps.stft(x, 256, 32)).astype(np.float32)
    out_np = nps.griffin_lim(mag, 256, 32, 4064, n_iter=16, seed=0)
    out_j = np.asarray(
        jsp.griffin_lim(mag, jax.random.key(0), 256, 32, 4064, n_iter=16)
    )
    err_np = np.linalg.norm(np.abs(nps.stft(out_np, 256, 32)) - mag)
    err_j = np.linalg.norm(np.abs(nps.stft(out_j, 256, 32)) - mag)
    assert err_j < err_np * 1.5 + 1e-3


def test_matmul_dft_stft_matches_fft(rng):
    """MXU matmul-DFT path == rfft path (ops/spectral.py impl switch)."""
    x = _waveform(rng, (2, 4064))
    want = np.asarray(jsp.stft(x, 256, 32, impl="fft"))
    got = np.asarray(jsp.stft(x, 256, 32, impl="matmul"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)


def test_matmul_dft_istft_matches_fft(rng):
    x = _waveform(rng, (2, 4064))
    spec = np.asarray(jsp.stft(x, 256, 32, impl="fft")).astype(np.complex64)
    want = np.asarray(jsp.istft(spec, 256, 32, 4064, impl="fft"))
    got = np.asarray(jsp.istft(spec, 256, 32, 4064, impl="matmul"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)
    # and the matmul round-trip still reconstructs the waveform
    np.testing.assert_allclose(got, x, rtol=1e-3, atol=1e-4)


def test_matmul_dft_griffin_lim_quality(rng):
    """Phase recovery through the matmul path reconstructs as well as fft."""
    import jax

    x = _waveform(rng, (1, 4064))
    mag = np.abs(nps.stft(x, 256, 32)).astype(np.float32)
    out_f = np.asarray(jsp.griffin_lim(mag, jax.random.key(0), 256, 32, 4064,
                                       n_iter=16, impl="fft"))
    out_m = np.asarray(jsp.griffin_lim(mag, jax.random.key(0), 256, 32, 4064,
                                       n_iter=16, impl="matmul"))
    err_f = np.linalg.norm(np.abs(nps.stft(out_f, 256, 32)) - mag)
    err_m = np.linalg.norm(np.abs(nps.stft(out_m, 256, 32)) - mag)
    assert err_m < err_f * 1.2 + 1e-3


def test_matmul_dft_odd_hop_falls_back(rng):
    """hop that doesn't divide n_fft uses the fft path under impl=matmul."""
    x = _waveform(rng, (1, 1000))
    want = np.asarray(jsp.stft(x, 256, 48, impl="fft"))
    got = np.asarray(jsp.stft(x, 256, 48, impl="matmul"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


# ---- device-side FORWARD representations (ops/representation.py) ------------


def test_device_log_spectrogram_matches_host(rng):
    from tqdne_tpu.ops.representation import log_spectrogram_representation

    wf = _waveform(rng)  # (2, 3, 4064) channels-first
    host = rep.LogSpectrogram(hop_size=32).get_representation(wf)
    dev = log_spectrogram_representation(jnp_moveaxis(wf))
    got = np.moveaxis(np.asarray(dev), -1, 1)
    assert got.shape == host.shape == (2, 3, 128, 128)
    np.testing.assert_allclose(got, host, rtol=1e-3, atol=2e-4)


def test_device_envelope_matches_host(rng):
    from tqdne_tpu.ops.representation import envelope_representation

    wf = _waveform(rng)
    host = rep.MovingAverageEnvelope().get_representation(wf)
    dev = envelope_representation(jnp_moveaxis(wf))
    got = np.moveaxis(np.asarray(dev), -1, 1)
    assert got.shape == host.shape == (2, 6, 4064)
    np.testing.assert_allclose(got, host, rtol=1e-3, atol=1e-3)


def test_device_representation_fn_dispatch():
    from tqdne_tpu.ops.representation import device_representation_fn

    assert device_representation_fn(rep.MovingAverageEnvelope()) is not None
    assert device_representation_fn(rep.LogSpectrogram()) is not None
    assert device_representation_fn(rep.Normalization(1.0, 2.0)) is None
    ident = device_representation_fn(rep.Identity())
    x = np.ones((1, 8, 3), np.float32)
    np.testing.assert_array_equal(np.asarray(ident(x)), x)


def jnp_moveaxis(wf_cf):
    import jax.numpy as jnp

    return jnp.moveaxis(jnp.asarray(wf_cf, jnp.float32), 1, -1)


def test_device_representation_in_train_step(rng):
    """make_edm_steps(device_representation=...): training on raw waveforms
    gives the same loss as training on host-computed signals."""
    import jax
    import jax.numpy as jnp
    import optax

    from tqdne_tpu.models.unet import UNet
    from tqdne_tpu.ops.representation import device_representation_fn
    from tqdne_tpu.train.state import TrainState
    from tqdne_tpu.train.steps import make_edm_steps

    host_rep = rep.MovingAverageEnvelope(window_size=16)
    wf = _waveform(rng, (4, 3, 256))
    signal = host_rep.get_representation(wf)

    unet = UNet(in_channels=6, out_channels=6, model_channels=8, num_res_blocks=1,
                attention_resolutions=(), channel_mult=(1, 2), conv_kernel_size=5,
                dims=1, cond_features=None, num_heads=1, dropout=0.0)
    tx = optax.adam(1e-3)
    params = unet.init(jax.random.key(0), jnp.zeros((1, 256, 6)), jnp.zeros((1,)), None)
    dev_fn = device_representation_fn(host_rep)

    ts_host, _, _ = make_edm_steps(unet, tx)
    ts_dev, _, _ = make_edm_steps(unet, tx, device_representation=dev_fn)

    batch_host = {"signal": jnp.moveaxis(jnp.asarray(signal), 1, -1)}
    batch_dev = {"waveform": jnp_moveaxis(wf)}
    key = jax.random.key(7)
    _, m_host = jax.jit(ts_host)(TrainState.create(params, tx), batch_host, key)
    _, m_dev = jax.jit(ts_dev)(TrainState.create(params, tx), batch_dev, key)
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]),
                               rtol=1e-4)


def test_matmul_istft_non_divisible_length(rng):
    """length % hop != 0: the pad-sum fold rounds the working buffer up and
    must still reconstruct exactly."""
    x = _waveform(rng, (2, 1000))
    spec = np.asarray(jsp.stft(x, 256, 32, impl="fft")).astype(np.complex64)
    want = np.asarray(jsp.istft(spec, 256, 32, 1000, impl="fft"))
    got = np.asarray(jsp.istft(spec, 256, 32, 1000, impl="matmul"))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(got, x, rtol=1e-3, atol=1e-4)


def test_device_representation_in_ae_and_classifier_steps(rng):
    """make_autoencoder_steps / make_classifier_steps with
    device_representation: training on raw waveforms matches training on
    host-computed signals (round-3: the flag now covers all three
    representation-consuming recipe kinds)."""
    import jax
    import jax.numpy as jnp
    import optax

    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.classifier import Classifier
    from tqdne_tpu.ops.representation import device_representation_fn
    from tqdne_tpu.train.state import TrainState
    from tqdne_tpu.train.steps import make_autoencoder_steps, make_classifier_steps

    host_rep = rep.MovingAverageEnvelope(window_size=16)
    wf = _waveform(rng, (4, 3, 256))
    signal = host_rep.get_representation(wf)
    dev_fn = device_representation_fn(host_rep)
    batch_host = {"signal": jnp.moveaxis(jnp.asarray(signal), 1, -1)}
    batch_dev = {"waveform": jnp_moveaxis(wf)}
    key = jax.random.key(3)

    ae_cfg = dict(model_channels=8, channel_mult=(1, 2), attention_resolutions=(),
                  num_res_blocks=1, dims=1, conv_kernel_size=5, dropout=0.0)
    ae = AutoencoderKL(encoder_config=ae_cfg | {"in_channels": 6, "out_channels": 8},
                       decoder_config=ae_cfg | {"in_channels": 4, "out_channels": 6})
    variables = ae.init({"params": jax.random.key(0), "sample": jax.random.key(1)},
                        jnp.zeros((1, 256, 6)))
    tx = optax.adam(1e-3)
    ts_host, _ = make_autoencoder_steps(ae, tx)
    ts_dev, _ = make_autoencoder_steps(ae, tx, device_representation=dev_fn)
    _, m_host = jax.jit(ts_host)(TrainState.create(variables, tx), batch_host, key)
    _, m_dev = jax.jit(ts_dev)(TrainState.create(variables, tx), batch_dev, key)
    np.testing.assert_allclose(float(m_dev["loss"]), float(m_host["loss"]), rtol=1e-4)

    ecfg = dict(in_channels=6, model_channels=8, out_channels=16, channel_mult=(1, 2),
                attention_resolutions=(), num_res_blocks=1, dims=1, conv_kernel_size=5,
                dropout=0.0)
    clf = Classifier(encoder_config=ecfg, num_classes=4)
    params = clf.init(jax.random.key(0), jnp.zeros((1, 256, 6)))
    labels = jnp.asarray(rng.integers(0, 4, 4))
    cs_host, _, _ = make_classifier_steps(clf, tx, np.ones(4, np.float32))
    cs_dev, _, _ = make_classifier_steps(clf, tx, np.ones(4, np.float32),
                                         device_representation=dev_fn)
    _, c_host = jax.jit(cs_host)(TrainState.create(params, tx),
                                 batch_host | {"label": labels}, key)
    _, c_dev = jax.jit(cs_dev)(TrainState.create(params, tx),
                               batch_dev | {"label": labels}, key)
    np.testing.assert_allclose(float(c_dev["loss"]), float(c_host["loss"]), rtol=1e-4)
