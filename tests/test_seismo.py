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
    out = seismo.sa_distance(
        ns, ew, rhyp, 0.01, periods=(0.3, 1.0), mag=6.0,
        obs_ns=ns * 1.1, obs_ew=ew * 1.1, obs_rhyp=rhyp, n_bins=10,
    )
    assert out["sa"].shape == (n, 2)
    assert (out["sa"] > 0).all()
    # observed-vs-generated comparison at the SAME intensity measure
    assert out["obs_sa"].shape == (n, 2)
    assert out["sa_median"].shape == (10, 2)  # n_bins means n_bins bins
    finite = np.isfinite(out["sa_median"]) & np.isfinite(out["obs_sa_median"])
    assert finite.any()
    np.testing.assert_allclose(
        out["obs_sa_median"][finite], 1.1 * out["sa_median"][finite], rtol=1e-6
    )
    # SA-period GMM curves are never silently substituted with PGA: the
    # built-in models don't cover SA(T), so they must be reported skipped
    assert "gmm_pga" not in out
    assert set(out["gmm_skipped"]) == {"Kanno2006Shallow", "BooreEtAl2014"}
    assert out["gmm_sa"] == {}


def test_boore_etal_2014_hand_computed():
    """Pin the BSSA14 median against independent hand arithmetic
    (paper eqs. 2-3): M=6.0 strike-slip, Rjb=30 km, rock vs30=760
    (both site terms vanish at Vref)."""
    r = np.sqrt(30.0**2 + 4.5**2)
    # M=6.0 > Mh=5.5: F_E = e1 + e6*(M-Mh)
    fe = 0.4856 + (-0.1662) * 0.5
    # F_P = (c1 + c2*(6-4.5))*ln(R/1) + c3*(R-1)
    fp = (-1.134 + 0.1917 * 1.5) * np.log(r) + (-0.00809) * (r - 1.0)
    got = seismo.boore_etal_2014("PGA", 6.0, np.array([30.0]), vs30=760.0, rake=0.0)
    np.testing.assert_allclose(got, np.exp(fe + fp), rtol=1e-12)
    assert 0.03 < got[0] < 0.3  # plausible rock median for M6 at 30 km
    # M=5.0 <= Mh: F_E = e1 + e4*(M-Mh) + e5*(M-Mh)^2
    fe5 = 0.4856 + 1.431 * (-0.5) + 0.05053 * 0.25
    fp5 = (-1.134 + 0.1917 * 0.5) * np.log(r) + (-0.00809) * (r - 1.0)
    got5 = seismo.boore_etal_2014("PGA", 5.0, np.array([30.0]), vs30=760.0, rake=0.0)
    np.testing.assert_allclose(got5, np.exp(fe5 + fp5), rtol=1e-12)


def test_boore_etal_2014_behavior():
    d = np.array([5.0, 20.0, 60.0, 150.0])
    pga_m5 = seismo.boore_etal_2014("PGA", 5.0, d, rake=0.0)
    pga_m7 = seismo.boore_etal_2014("PGA", 7.0, d, rake=0.0)
    assert (np.diff(pga_m5) < 0).all()  # decays with distance
    assert (pga_m7 > pga_m5).all()  # grows with magnitude
    # soft-site linear amplification (at weak motions): vs30 360 > 760
    far = np.array([150.0])
    assert seismo.boore_etal_2014("PGA", 5.0, far, vs30=360.0) > seismo.boore_etal_2014(
        "PGA", 5.0, far, vs30=760.0
    )
    # nonlinear site term damps amplification at strong shaking:
    # soft/rock ratio near-source < soft/rock ratio far-field
    near = np.array([2.0])
    ratio_near = (seismo.boore_etal_2014("PGA", 7.0, near, vs30=200.0)
                  / seismo.boore_etal_2014("PGA", 7.0, near, vs30=760.0))
    ratio_far = (seismo.boore_etal_2014("PGA", 7.0, far, vs30=200.0)
                 / seismo.boore_etal_2014("PGA", 7.0, far, vs30=760.0))
    assert ratio_near < ratio_far
    # mechanism: reverse > normal at the same scenario (e3 > e2 for PGA)
    assert seismo.boore_etal_2014("PGA", 6.0, far, rake=90.0) > seismo.boore_etal_2014(
        "PGA", 6.0, far, rake=-90.0
    )
    # PGV row works and is positive
    assert (seismo.boore_etal_2014("PGV", 6.0, d) > 0).all()
    # SA periods are not silently faked
    with pytest.raises(NotImplementedError):
        seismo.boore_etal_2014("SA(1.0)", 6.0, d)


def test_gmm_curve_dispatch():
    d = np.array([10.0, 50.0, 100.0])
    kanno = seismo.gmm_curve("PGA", 6.0, d, 400.0, model="Kanno2006Shallow")
    boore = seismo.gmm_curve("PGA", 6.0, d, 400.0, model="BooreEtAl2014", rake=0.0)
    # both in cm/s^2, same order of magnitude for a common scenario
    assert (kanno > 0).all() and (boore > 0).all()
    assert (0.1 < kanno / boore).all() and (kanno / boore < 10).all()
    # the reference's Kanno geometric-mean convention correction
    corr = seismo.gmm_curve("PGA", 6.0, d, 400.0, model="Kanno2006Shallow",
                            mean_convention_correction=True)
    np.testing.assert_allclose(corr, kanno * 10**-0.07)
    with pytest.raises(NotImplementedError):
        seismo.gmm_curve("PGA", 6.0, d, model="NotAModel")


def test_epri_rjb_adjustment():
    repi = np.array([1.0, 30.0, 100.0])
    rjb = seismo.epri_epicentral_to_rjb(repi, 6.0)
    assert (rjb <= repi).all()  # finite-fault shrinkage
    assert (rjb >= 0).all()
    assert rjb[2] / repi[2] > rjb[0] / repi[0]  # adjustment fades with distance
