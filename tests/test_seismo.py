"""Seismological evaluation utility tests (physics sanity + parity
semantics with experiments/utils.py)."""

import numpy as np
import pytest

from tqdne_tpu.eval import seismo


def test_rotation_invariant_peak_matches_reference_semantics(rng):
    """The reference's calculate_gmrotd50 reduces to the peak vector
    amplitude (its per-angle quantity is rotation-invariant)."""
    c1 = rng.standard_normal((4, 512))
    c2 = rng.standard_normal((4, 512))
    want = np.sqrt(c1**2 + c2**2).max(-1)
    np.testing.assert_allclose(seismo.rotation_invariant_peak(c1, c2), want)


def test_gmrotd50_rotation_invariance(rng):
    c1 = rng.standard_normal((2, 256))
    c2 = rng.standard_normal((2, 256))
    base = seismo.gmrotd50(c1, c2)
    th = np.deg2rad(37.0)
    r1 = c1 * np.cos(th) + c2 * np.sin(th)
    r2 = -c1 * np.sin(th) + c2 * np.cos(th)
    rotated = seismo.gmrotd50(r1, r2)
    np.testing.assert_allclose(rotated, base, rtol=0.05)  # grid-resolution tolerance


def test_integration_of_harmonic():
    """d/dt [sin(2 pi f t)/(2 pi f)] = cos(2 pi f t): integrating the cosine
    recovers the scaled sine (f above the 0.1 Hz cutoff)."""
    dt, n = 0.01, 4096
    f = 82 / (n * dt)  # integer number of cycles -> no spectral leakage
    t = np.arange(n) * dt
    acc = np.cos(2 * np.pi * f * t)[None]
    vel = seismo.integrate_frequency_domain(acc, dt)
    want = np.sin(2 * np.pi * f * t) / (2 * np.pi * f)
    np.testing.assert_allclose(vel[0], want, atol=1e-6)


def test_highpass_removes_dc(rng):
    x = rng.standard_normal((2, 3, 1024)) + 5.0
    y = seismo.highpass_filter(x, cutoff_freq=0.5, sampling_rate=100)
    assert abs(y[..., 512:].mean()) < 0.1  # DC gone after settling
    assert y.shape == x.shape


def test_evaluate_pgx_identical_inputs(rng):
    wf = rng.standard_normal((8, 2, 1024))
    res = seismo.evaluate_pgx(wf, wf, dt=0.01, pgv=True)
    np.testing.assert_allclose(res["PGV_geom_mean_obs"], res["PGV_geom_mean_gwm"])
    res_pga = seismo.evaluate_pgx(wf, wf, dt=0.01, pgv=False)
    assert (res_pga["PGA_geom_mean_obs"] > 0).all()


def test_distance_binned_ratios_zero_for_identical(rng):
    pgx = np.abs(rng.standard_normal(100)) + 0.1
    dist = rng.uniform(10, 200, 100)
    out = seismo.calculate_distance_binned_ratios(pgx, pgx, dist, n_bins=10)
    valid = out["bin_counts"] > 0
    np.testing.assert_allclose(out["median_ratios"][valid], 0.0, atol=1e-12)
    assert out["ratio_values"].shape == (100,)


def test_pga_to_mmi_reference_formula():
    pga = np.array([0.001, 0.01, 0.1, 0.5, 1.0])  # g
    mmi = seismo.pga_to_mmi(pga, unit="g")
    assert (np.diff(mmi) > 0).all()
    np.testing.assert_allclose(mmi, 3.66 * np.log10(pga) + 1.66, rtol=1e-9)
    # unit conversions agree
    np.testing.assert_allclose(
        seismo.pga_to_mmi(pga * 9.80665, unit="m/s^2"), mmi, rtol=1e-9
    )


def test_arias_and_duration():
    dt = 0.01
    t = np.arange(2048) * dt
    env = np.exp(-(((t - 8) / 2) ** 2))
    acc = (np.sin(2 * np.pi * 5 * t) * env)[None]
    ia = seismo.arias_intensity(acc, dt)
    assert ia.shape == (1,) and ia[0] > 0
    d595 = seismo.significant_duration(acc, dt)
    assert 1.0 < d595[0] < 10.0  # energy concentrated around the pulse


def test_response_spectrum_limits():
    dt = 0.005
    t = np.arange(8192) * dt
    f0 = 1.0
    acc = np.sin(2 * np.pi * f0 * t) * np.exp(-(((t - 15) / 5) ** 2))
    sa = seismo.response_spectrum(acc[None], dt, periods=[0.02, 1.0, 5.0])[0]
    # very stiff oscillator tracks the ground: SA(T->0) ~ PGA
    assert sa[0] == pytest.approx(np.abs(acc).max(), rel=0.1)
    # resonance amplifies well beyond PGA
    assert sa[1] > 3 * np.abs(acc).max()
    # long period far from resonance responds weakly
    assert sa[2] < sa[1]


def test_kanno2006_behavior():
    d = np.array([10.0, 50.0, 100.0, 200.0])
    pga_m6 = seismo.kanno2006_shallow("PGA", 6.0, d)
    pga_m7 = seismo.kanno2006_shallow("PGA", 7.0, d)
    assert (np.diff(pga_m6) < 0).all()  # decays with distance
    assert (pga_m7 > pga_m6).all()  # grows with magnitude
    pgv = seismo.kanno2006_shallow("PGV", 6.0, d)
    assert (pgv > 0).all()
    # soft site (low vs30) amplifies
    assert (seismo.kanno2006_shallow("PGA", 6.0, d, vs30=200)
            > seismo.kanno2006_shallow("PGA", 6.0, d, vs30=800)).all()


def test_shakemap_colormap():
    cmap = seismo.shakemap_colormap()
    assert cmap.N == 256
    lo = cmap(0.0)
    hi = cmap(1.0)
    assert lo[0] > 0.9 and lo[1] > 0.9  # near-white at MMI 1
    assert hi[0] > 0.4 and hi[1] < 0.1  # dark red at MMI 10


def test_sa_rotd_rotation_consistency():
    dt = 0.01
    t = np.arange(2048) * dt
    c1 = np.sin(2 * np.pi * 2.0 * t) * np.exp(-(((t - 8) / 3) ** 2))
    c2 = 0.5 * np.sin(2 * np.pi * 3.0 * t) * np.exp(-(((t - 8) / 3) ** 2))
    base = seismo.sa_rotd(c1, c2, dt, [0.5, 1.0], num_angles=12)
    th = np.deg2rad(30)
    r1 = c1 * np.cos(th) + c2 * np.sin(th)
    r2 = -c1 * np.sin(th) + c2 * np.cos(th)
    rotated = seismo.sa_rotd(r1, r2, dt, [0.5, 1.0], num_angles=12)
    np.testing.assert_allclose(rotated, base, rtol=0.12)  # angle-grid tolerance
    assert base.shape == (2,)


def test_sa_distance_table(rng):
    n, t = 4, 1024
    ns = rng.standard_normal((n, t))
    ew = rng.standard_normal((n, t))
    rhyp = np.array([20.0, 60.0, 120.0, 180.0])
    out = seismo.sa_distance(ns, ew, rhyp, 0.01, periods=(0.3, 1.0), mag=6.0)
    assert out["sa"].shape == (n, 2)
    assert (out["sa"] > 0).all()
    assert (out["gmm_pga"] > 0).all()
