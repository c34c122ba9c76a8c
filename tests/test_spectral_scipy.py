"""External validation of the self-contained STFT/iSTFT against scipy.

Round 1 only tested the host (numpy) and device (jnp) spectral
implementations against each other; here scipy.signal pins the math
independently at the reference's settings (stft_channels=256, hop=32,
periodic Hann, centered zero padding —
/root/reference/tqdne/representation.py:102-126 via librosa defaults).
scipy's legacy stft scales by 1/win.sum(); librosa (and ours) do not.
"""

import numpy as np
import pytest
from scipy import signal as sp

from tqdne_tpu.data import spectral

N_FFT, HOP, T = 256, 32, 4064


@pytest.fixture
def x(rng):
    return rng.standard_normal(T)


def test_stft_matches_scipy(x):
    ours = spectral.stft(x, N_FFT, HOP)  # (freq, frames)
    win = sp.get_window("hann", N_FFT, fftbins=True)
    f, t, z = sp.stft(
        x, window=win, nperseg=N_FFT, noverlap=N_FFT - HOP, nfft=N_FFT,
        boundary="zeros", padded=False, return_onesided=True,
    )
    z = z * win.sum()  # undo scipy's 1/win.sum() scaling
    n = min(ours.shape[-1], z.shape[-1])
    assert n >= T // HOP  # the common frame range covers the signal
    np.testing.assert_allclose(ours[:, :n], z[:, :n], atol=1e-9)


def test_hann_matches_scipy():
    np.testing.assert_allclose(
        spectral.hann_window(N_FFT), sp.get_window("hann", N_FFT, fftbins=True),
        atol=1e-12,
    )


def test_istft_matches_scipy_reconstruction(x):
    """Both inverses recover the original signal from our (unscaled) STFT."""
    spec = spectral.stft(x, N_FFT, HOP)
    ours = spectral.istft(spec, N_FFT, HOP, T)
    np.testing.assert_allclose(ours, x, atol=1e-10)

    win = sp.get_window("hann", N_FFT, fftbins=True)
    _, rec = sp.istft(
        spec / win.sum(), window=win, nperseg=N_FFT, noverlap=N_FFT - HOP,
        nfft=N_FFT, boundary=True, input_onesided=True,
    )
    np.testing.assert_allclose(rec[:T], x, atol=1e-9)


def test_log_spectrogram_roundtrip_error_bound(rng):
    """LogSpectrogram invert(get(x)) error bound at the flagship shape.

    Griffin-Lim recovers phase approximately; the documented contract is
    a bounded relative L2 error on band-limited signals (the reference
    uses n_iter=128 and reports visually-indistinguishable inversions).
    """
    from tqdne_tpu.data.representation import LogSpectrogram

    t = np.arange(T) / 100.0
    wf = np.stack(
        [
            np.sin(2 * np.pi * f0 * t) * np.exp(-(((t - 20) / 6.0) ** 2))
            for f0 in (1.5, 3.0, 7.0)
        ]
    )[None].astype(np.float32)  # (1, 3, T) band-limited test signal
    rep = LogSpectrogram(stft_channels=N_FFT, hop_size=HOP, backend="numpy", length=T)
    sig = rep.get_representation(wf)
    assert sig.shape == (1, 3, 128, 128)
    rec = rep.invert_representation(sig)[..., :T]
    # phase retrieval is unique only up to global phase/shift, so the
    # contract is spectral-magnitude consistency, not waveform L2
    mag_w = np.abs(spectral.stft(wf.astype(np.float64), N_FFT, HOP))
    mag_r = np.abs(spectral.stft(rec.astype(np.float64), N_FFT, HOP))
    err = np.linalg.norm(mag_r - mag_w) / np.linalg.norm(mag_w)
    assert err < 0.05, f"flagship round-trip spectral-magnitude error {err:.3f}"
