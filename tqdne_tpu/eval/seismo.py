"""Seismological evaluation utilities.

Capability parity with /root/reference/experiments/utils.py and
scripts/seismo_evaluations/: peak-ground-motion extraction (GMRotD50
PGA/PGV), frequency-domain integration acceleration -> velocity with a
0.1 Hz highpass, causal Butterworth highpass filtering, distance-binned
log-ratio statistics for generated-vs-observed validation, PGA -> MMI
conversion, Arias intensity / significant duration, and 5%-damped
response spectral acceleration SA(T) via the Nigam-Jennings exact
piecewise method (SA_distance.py equivalent).

All functions are vectorized over waveform batches (the reference maps
Python functions over rows in process pools).

Ground-motion-model comparisons: the reference calls OpenQuake
(BooreEtAl2014, Kanno2006Shallow via ContextMaker,
experiments/example_GMM.py:16-131).  OpenQuake is not available here;
`kanno2006_shallow` implements that GMM directly from the published
coefficients (Kanno et al., 2006, BSSA 96(3), table 3), and
`gmm_curve` dispatches to OpenQuake when importable.
"""

from __future__ import annotations

import numpy as np
from scipy import signal as sp_signal


# --------------------------------------------------------------------------
# peak ground motion
# --------------------------------------------------------------------------


def rotation_invariant_peak(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """max_t sqrt(c1(t)^2 + c2(t)^2), batched over leading axes.

    This is what the reference's calculate_gmrotd50
    (experiments/utils.py:190-226) computes: its per-angle quantity
    sqrt(r1^2 + r2^2) is rotation-invariant, so the median over angles
    collapses to the peak vector amplitude.
    """
    return np.sqrt(c1**2 + c2**2).max(axis=-1)


def gmrotd50(c1: np.ndarray, c2: np.ndarray, num_angles: int = 90) -> np.ndarray:
    """GMRotD50 (Boore et al. 2006): median over non-redundant rotation
    angles of the geometric mean of the two rotated components' peaks.

    Batched over leading axes: c1, c2 are (..., T); returns (...).
    """
    c1 = np.asarray(c1, np.float64)
    c2 = np.asarray(c2, np.float64)
    thetas = np.deg2rad(np.arange(num_angles) * (90.0 / num_angles))
    cos, sin = np.cos(thetas), np.sin(thetas)
    # (..., A, T) peaks per angle
    r1 = c1[..., None, :] * cos[:, None] + c2[..., None, :] * sin[:, None]
    r2 = -c1[..., None, :] * sin[:, None] + c2[..., None, :] * cos[:, None]
    gm = np.sqrt(np.abs(r1).max(-1) * np.abs(r2).max(-1))  # (..., A)
    return np.percentile(gm, 50, axis=-1)


# --------------------------------------------------------------------------
# integration / filtering
# --------------------------------------------------------------------------


def integrate_frequency_domain(sig: np.ndarray, dt: float, highpass_hz: float = 0.1):
    """Acceleration -> velocity: FFT-domain division by j*omega with a
    highpass mask (experiments/utils.py:565-581), batched over rows."""
    sig = np.asarray(sig)
    n = sig.shape[-1]
    fft = np.fft.fft(sig, axis=-1)
    freqs = np.fft.fftfreq(n, dt)
    fft = fft * (np.abs(freqs) >= highpass_hz)
    with np.errstate(divide="ignore", invalid="ignore"):
        fft[..., 1:] = fft[..., 1:] / (1j * 2 * np.pi * freqs[1:])
    fft[..., 0] = 0
    return np.fft.ifft(fft, axis=-1).real


def filter_frequency_domain(sig: np.ndarray, dt: float, highpass_hz: float = 0.1):
    """Zero-phase FFT highpass mask (utils.py:584-596), batched."""
    sig = np.asarray(sig)
    freqs = np.fft.fftfreq(sig.shape[-1], dt)
    fft = np.fft.fft(sig, axis=-1) * (np.abs(freqs) >= highpass_hz)
    return np.fft.ifft(fft, axis=-1).real


def highpass_filter(data: np.ndarray, cutoff_freq: float = 0.1, sampling_rate: float = 100.0):
    """Causal 4th-order Butterworth highpass along the last axis
    (utils.py:862-896), fully vectorized (no per-trace Python loops)."""
    nyquist = 0.5 * sampling_rate
    b, a = sp_signal.butter(4, cutoff_freq / nyquist, btype="high")
    return sp_signal.lfilter(b, a, data, axis=-1)


# --------------------------------------------------------------------------
# observed-vs-generated ratio statistics
# --------------------------------------------------------------------------


def evaluate_pgx(
    target: np.ndarray,
    predicted: np.ndarray,
    dt: float = 0.01,
    pgv: bool = True,
    evaluate_obs: bool = True,
) -> dict | np.ndarray:
    """Peak-ground-motion geometric means for observed & generated
    waveforms (utils.py:599-718 equivalent, vectorized).

    ``target``/``predicted`` are (N, >=2, T); channels 0/1 are the
    horizontal components.  pgv=True integrates to velocity first;
    otherwise the highpass-filtered acceleration peaks (PGA) are used.
    """
    def process(batch):
        h1, h2 = batch[:, 0], batch[:, 1]
        if pgv:
            h1 = integrate_frequency_domain(h1, dt)
            h2 = integrate_frequency_domain(h2, dt)
        else:
            h1 = filter_frequency_domain(h1, dt)
            h2 = filter_frequency_domain(h2, dt)
        return rotation_invariant_peak(h1, h2)

    key = "PGV_geom_mean" if pgv else "PGA_geom_mean"
    pred_vals = process(np.asarray(predicted))
    if not evaluate_obs:
        return pred_vals
    return {f"{key}_obs": process(np.asarray(target)), f"{key}_gwm": pred_vals}


def calculate_distance_binned_ratios(
    pgx_obs: np.ndarray,
    pgx_gen: np.ndarray,
    hypocentral_distance: np.ndarray,
    n_bins: int = 50,
) -> dict:
    """Distance-binned statistics of log10(obs/gen) (utils.py:721-803)."""
    pgx_obs = np.asarray(pgx_obs)
    pgx_gen = np.asarray(pgx_gen)
    dist = np.asarray(hypocentral_distance)
    if not (len(pgx_obs) == len(pgx_gen) == len(dist)):
        raise ValueError("Input arrays must have the same length")

    ratio = np.log10(pgx_obs / pgx_gen)
    edges = np.linspace(dist.min(), dist.max(), n_bins)
    centers, median, std, counts = [], [], [], []
    for i in range(len(edges) - 1):
        idx = np.where((dist > edges[i]) & (dist <= edges[i + 1]))[0]
        centers.append(0.5 * (edges[i] + edges[i + 1]))
        if len(idx) > 0:
            median.append(np.median(ratio[idx]))
            std.append(np.std(ratio[idx]))
            counts.append(len(idx))
        else:
            median.append(np.nan)
            std.append(np.nan)
            counts.append(0)
    return {
        "bin_centers": np.array(centers),
        "median_ratios": np.array(median),
        "std_ratios": np.array(std),
        "bin_counts": np.array(counts),
        "bin_edges": edges,
        "ratio_values": ratio,
    }


# --------------------------------------------------------------------------
# intensity measures
# --------------------------------------------------------------------------


def pga_to_mmi(pga: np.ndarray, unit: str = "g") -> np.ndarray:
    """PGA -> Modified Mercalli Intensity, the reference's empirical form
    (utils.py:164-187): MMI = 3.66 * log10(PGA[g]) + 1.66."""
    pga = np.asarray(pga, np.float64)
    if unit == "m/s^2" or unit == "m/s2":
        pga = pga / 9.80665
    elif unit == "cm/s^2" or unit == "cm/s2":
        pga = pga / 980.665
    return 3.66 * np.log10(np.maximum(pga, 1e-12)) + 1.66


def shakemap_colormap(mmi=None):
    """ShakeMap MMI colormap (utils.py:97-161): the standard 11-edge color
    scale linearly interpolated over the given MMI values."""
    from matplotlib.colors import LinearSegmentedColormap

    if mmi is None:
        mmi = np.linspace(1, 10, 256)
    edges = np.array(
        [
            [255, 255, 255], [191, 204, 255], [160, 230, 255], [128, 255, 255],
            [122, 255, 147], [255, 255, 0], [255, 200, 0], [255, 145, 0],
            [255, 0, 0], [200, 0, 0], [128, 0, 0],
        ],
        dtype=np.float64,
    ) / 255.0
    mmi_values = np.arange(1, 12)
    colors = np.stack(
        [np.interp(mmi, mmi_values, edges[:, i]) for i in range(3)], axis=1
    )
    return LinearSegmentedColormap.from_list("ShakeMapMMI", colors, N=len(colors))


def sa_rotd(
    c1: np.ndarray, c2: np.ndarray, dt: float, periods, *,
    percentile: float = 50.0, num_angles: int = 18, damping: float = 0.05,
) -> np.ndarray:
    """RotD{percentile} spectral acceleration: SA of each rotated horizontal
    component, percentile over rotation angles (the SA_distance.py /
    smtk GMRotDpp workflow, scripts/seismo_evaluations/SA_distance.py:36-70).

    c1, c2 are (..., T); returns (..., len(periods)).
    """
    c1 = np.asarray(c1, np.float64)
    c2 = np.asarray(c2, np.float64)
    thetas = np.deg2rad(np.arange(num_angles) * (180.0 / num_angles))
    # (A, ..., T) rotations, batched through the response-spectrum solver
    rotated = (
        c1[None] * np.cos(thetas).reshape(-1, *([1] * c1.ndim))
        + c2[None] * np.sin(thetas).reshape(-1, *([1] * c1.ndim))
    )
    sa = response_spectrum(rotated, dt, periods, damping)  # (A, ..., P)
    return np.percentile(sa, percentile, axis=0)


def _distance_binned_percentiles(values, dist, edges):
    """Distance-binned median/16th/84th percentiles of (N, P) values;
    the SA_distance.py binning loop (SA_distance.py:72-90), vectorized
    over periods.  Returns (centers, p50, p16, p84), NaN for empty bins."""
    values = np.asarray(values, np.float64)
    dist = np.asarray(dist, np.float64)
    nb = len(edges) - 1
    centers = 0.5 * (edges[:-1] + edges[1:])
    p50 = np.full((nb, values.shape[-1]), np.nan)
    p16 = np.full_like(p50, np.nan)
    p84 = np.full_like(p50, np.nan)
    for i in range(nb):
        m = (dist > edges[i]) & (dist <= edges[i + 1])
        if m.any():
            p50[i] = np.percentile(values[m], 50, axis=0)
            p16[i] = np.percentile(values[m], 16, axis=0)
            p84[i] = np.percentile(values[m], 84, axis=0)
    return centers, p50, p16, p84


def sa_distance(
    wf_ns: np.ndarray, wf_ew: np.ndarray, rhyp: np.ndarray, dt: float,
    periods=(0.1, 0.3, 1.0, 2.0), *, obs_ns: np.ndarray | None = None,
    obs_ew: np.ndarray | None = None, obs_rhyp: np.ndarray | None = None,
    mag: float | None = None, vs30: float = 400.0, percentile: float = 50.0,
    n_bins: int = 100, bin_range: tuple[float, float] = (0.1, 190.0),
    gmm_models: tuple[str, ...] = ("Kanno2006Shallow", "BooreEtAl2014"),
) -> dict:
    """SA(T) vs hypocentral distance — the SA_distance.py evaluation
    (scripts/seismo_evaluations/SA_distance.py:36-90).

    Computes RotD{percentile} SA(T) for the generated horizontal pairs,
    distance-binned medians with 16/84 percentiles, the same for an
    observed set when given (the reference compares generated vs observed
    SA with matching vs30/magnitude masks), and — when ``mag`` is given —
    GMM median SA(T) curves for each model in ``gmm_models`` at the SAME
    period (the reference overlays BooreEtAl2014 + Kanno2006Shallow
    SA(0.1/0.3/1.0/2.0) curves).  Models whose built-in implementation
    does not cover an SA period are recorded under ``gmm_skipped``
    instead of silently substituting another intensity measure.
    """
    periods = list(periods)
    sa = sa_rotd(wf_ns, wf_ew, dt, periods, percentile=percentile)
    out = {"periods": periods, "rhyp": np.asarray(rhyp), "sa": sa}
    edges = np.linspace(bin_range[0], bin_range[1], n_bins + 1)  # n_bins bins
    out["bin_centers"], out["sa_median"], out["sa_p16"], out["sa_p84"] = (
        _distance_binned_percentiles(sa, rhyp, edges)
    )
    if obs_ns is not None and obs_ew is not None and obs_rhyp is not None:
        sa_obs = sa_rotd(obs_ns, obs_ew, dt, periods, percentile=percentile)
        out["obs_sa"] = sa_obs
        out["obs_rhyp"] = np.asarray(obs_rhyp)
        _, out["obs_sa_median"], out["obs_sa_p16"], out["obs_sa_p84"] = (
            _distance_binned_percentiles(sa_obs, obs_rhyp, edges)
        )
    if mag is not None:
        grid = np.linspace(max(1.0, np.min(rhyp)), np.max(rhyp), 50)
        out["gmm_distances"] = grid
        out["gmm_sa"], out["gmm_skipped"] = {}, {}
        for model in gmm_models:
            curves, skipped = [], None
            for T in periods:
                try:
                    curves.append(gmm_curve(f"SA({T})", mag, grid, vs30, model=model))
                except NotImplementedError as e:
                    skipped = str(e)
                    break
            if skipped is None:
                out["gmm_sa"][model] = np.stack(curves, axis=-1)  # (50, P)
            else:
                out["gmm_skipped"][model] = skipped
    return out


def arias_intensity(acc: np.ndarray, dt: float, g: float = 9.80665) -> np.ndarray:
    """Arias intensity Ia = pi/(2g) * integral a(t)^2 dt, batched."""
    return np.pi / (2 * g) * np.trapezoid(np.asarray(acc) ** 2, dx=dt, axis=-1)


def significant_duration(acc: np.ndarray, dt: float, lo=0.05, hi=0.95) -> np.ndarray:
    """D_{5-95}: time between 5% and 95% of cumulative Arias intensity."""
    acc = np.asarray(acc)
    cum = np.cumsum(acc**2, axis=-1)
    total = cum[..., -1:]
    norm = cum / np.maximum(total, 1e-30)
    t_lo = np.argmax(norm >= lo, axis=-1)
    t_hi = np.argmax(norm >= hi, axis=-1)
    return (t_hi - t_lo) * dt


# --------------------------------------------------------------------------
# response spectra (Nigam-Jennings exact piecewise integration)
# --------------------------------------------------------------------------


def response_spectrum(
    acc: np.ndarray, dt: float, periods, damping: float = 0.05
) -> np.ndarray:
    """5%-damped pseudo-spectral acceleration SA(T), batched.

    ``acc`` is (..., T) ground acceleration; ``periods`` a sequence of
    oscillator periods [s].  Returns (..., len(periods)).  Uses the
    Nigam & Jennings (1969) exact solution for piecewise-linear input —
    the standard engineering-seismology recipe (reference counterpart:
    smtk response spectra in example_GMM.py:133-197).
    """
    acc = np.asarray(acc, np.float64)
    batch_shape = acc.shape[:-1]
    flat = acc.reshape(-1, acc.shape[-1])
    out = np.empty((flat.shape[0], len(periods)))

    for pi, T in enumerate(periods):
        wn = 2 * np.pi / T
        wd = wn * np.sqrt(1 - damping**2)
        e = np.exp(-damping * wn * dt)
        s, c = np.sin(wd * dt), np.cos(wd * dt)

        a11 = e * (c + damping / np.sqrt(1 - damping**2) * s)
        a12 = e / wd * s
        a21 = -wn / np.sqrt(1 - damping**2) * e * s
        a22 = e * (c - damping / np.sqrt(1 - damping**2) * s)

        zw3 = (2 * damping**2 - 1) / (wn**2 * dt)
        zw = 2 * damping / (wn**3 * dt)
        b11 = e * (s / wd * (zw3 + damping / wn) + c * (zw + 1 / wn**2)) - zw
        b12 = -e * (s / wd * zw3 + c * zw) - 1 / wn**2 + zw
        b21 = (
            e * ((zw3 + damping / wn) * (c - damping / np.sqrt(1 - damping**2) * s)
                 - (zw + 1 / wn**2) * (wd * s + damping * wn * c))
            + 1 / (wn**2 * dt)
        )
        b22 = (
            -e * (zw3 * (c - damping / np.sqrt(1 - damping**2) * s)
                  - zw * (wd * s + damping * wn * c))
            - 1 / (wn**2 * dt)
        )

        # scipy lfilter formulation of the 2-state recursion, vectorized
        # over the batch: x_{i+1} = A x_i + B [a_i, a_{i+1}]
        n = flat.shape[1]
        x = np.zeros(flat.shape[0])
        v = np.zeros(flat.shape[0])
        peak = np.zeros(flat.shape[0])
        for i in range(n - 1):
            ai, aj = flat[:, i], flat[:, i + 1]
            x_new = a11 * x + a12 * v + b11 * ai + b12 * aj
            v_new = a21 * x + a22 * v + b21 * ai + b22 * aj
            x, v = x_new, v_new
            peak = np.maximum(peak, np.abs(x))
        out[:, pi] = peak * wn**2  # pseudo-spectral acceleration

    return out.reshape(*batch_shape, len(periods))


# --------------------------------------------------------------------------
# ground motion models
# --------------------------------------------------------------------------

# Kanno et al. (2006), BSSA 96(3), "A New Attenuation Relation for Strong
# Ground Motion in Japan Based on Recorded Data" — shallow-event (D <= 30 km)
# regression coefficients for PGA [cm/s^2] and PGV [cm/s]:
#   log10 pre = a*Mw + b*X - log10(X + d*10^(e*Mw)) + c
# with site correction G = p*log10(Vs30) + q.
_KANNO2006_SHALLOW = {
    "PGA": dict(a=0.56, b=-0.0031, c=0.26, d=0.0055, e=0.5, p=-0.55, q=1.35),
    "PGV": dict(a=0.70, b=-0.0009, c=-1.93, d=0.0022, e=0.42, p=-0.71, q=1.77),
}


def kanno2006_shallow(imt: str, mag: float, rrup, vs30: float = 400.0) -> np.ndarray:
    """Median Kanno et al. (2006) shallow prediction for PGA [cm/s^2] or
    PGV [cm/s] at rupture distances ``rrup`` [km]."""
    if imt.upper() not in _KANNO2006_SHALLOW:
        raise NotImplementedError(
            f"Kanno2006Shallow built-in supports PGA/PGV; {imt} requires openquake"
        )
    cf = _KANNO2006_SHALLOW[imt.upper()]
    rrup = np.asarray(rrup, np.float64)
    log_pre = (
        cf["a"] * mag
        + cf["b"] * rrup
        - np.log10(rrup + cf["d"] * 10 ** (cf["e"] * mag))
        + cf["c"]
    )
    site = cf["p"] * np.log10(vs30) + cf["q"]
    return 10 ** (log_pre + site)


# Boore, Stewart, Seyhan & Atkinson (2014), "NGA-West2 Equations for
# Predicting PGA, PGV, and 5% Damped PSA for Shallow Crustal Earthquakes",
# Earthquake Spectra 30(3):1057-1085 — the BooreEtAl2014 GMM the reference
# calls through OpenQuake (experiments/example_GMM.py:16-131,
# scripts/seismo_evaluations/custom_GMM.ipynb).  Median (global region),
# full functional form: mechanism-dependent event term, geometric +
# anelastic path term, and linear + nonlinear site response with the
# rock-PGA recursion.  Coefficient rows below are the published PGA and
# PGV values (paper Tables; identical to OpenQuake's boore_2014 table).
# The reference's residual workflows use exactly these two IMTs
# (custom_GMM.ipynb cells 8-9); SA-period rows require transcribing the
# electronic supplement, unavailable in this offline environment — SA
# requests raise NotImplementedError rather than returning wrong numbers.
_BSSA14 = {
    "PGA": dict(e0=0.4473, e1=0.4856, e2=0.2459, e3=0.4539, e4=1.431, e5=0.05053,
                e6=-0.1662, Mh=5.5, c1=-1.134, c2=0.1917, c3=-0.00809, h=4.5,
                c=-0.600, Vc=1500.0, f4=-0.150, f5=-0.00701),
    "PGV": dict(e0=5.037, e1=5.078, e2=4.849, e3=5.033, e4=1.073, e5=-0.1536,
                e6=0.2252, Mh=6.2, c1=-1.243, c2=0.1489, c3=-0.00344, h=5.3,
                c=-0.840, Vc=1300.0, f4=-0.100, f5=-0.00844),
}
_BSSA14_MREF, _BSSA14_RREF, _BSSA14_VREF = 4.5, 1.0, 760.0
_BSSA14_F1, _BSSA14_F3 = 0.0, 0.1  # nonlinear-site constants (g)


def _bssa14_mech(rake: float | None) -> str:
    """Rake angle -> mechanism dummy (paper §'Mechanism'; OpenQuake's
    convention): SS |rake|<30 or |rake|>150, NS -150..-30, RS 30..150,
    unspecified when rake is None."""
    if rake is None:
        return "e0"
    if abs(rake) < 30 or abs(rake) > 150:
        return "e1"  # strike-slip
    if -150 <= rake <= -30:
        return "e2"  # normal
    return "e3"  # reverse


def _bssa14_event_path(cf: dict, mag: float, rjb, mech: str):
    """F_E + F_P (paper eqs. 2-3), no site term."""
    rjb = np.asarray(rjb, np.float64)
    dm = mag - cf["Mh"]
    if mag <= cf["Mh"]:
        fe = cf[mech] + cf["e4"] * dm + cf["e5"] * dm * dm
    else:
        fe = cf[mech] + cf["e6"] * dm
    r = np.sqrt(rjb * rjb + cf["h"] * cf["h"])
    fp = (cf["c1"] + cf["c2"] * (mag - _BSSA14_MREF)) * np.log(r / _BSSA14_RREF) + cf[
        "c3"
    ] * (r - _BSSA14_RREF)
    return fe + fp


def boore_etal_2014(
    imt: str, mag: float, rjb, vs30: float = 760.0, rake: float | None = None
) -> np.ndarray:
    """Median BooreEtAl2014 prediction: PGA [g] or PGV [cm/s] at
    Joyner-Boore distances ``rjb`` [km].

    Site response (paper eqs. 4-8): linear ln F_lin = c*ln(min(V,Vc)/760)
    and nonlinear ln F_nl = f1 + f2*ln((PGA_r + f3)/f3), where PGA_r is
    the median rock (vs30=760) PGA for the same scenario and
    f2 = f4*(exp(f5*(min(V,760)-360)) - exp(f5*400)).
    """
    key = imt.upper()
    if key not in _BSSA14:
        raise NotImplementedError(
            f"BooreEtAl2014 built-in supports PGA/PGV; {imt} requires openquake"
        )
    cf = _BSSA14[key]
    mech = _bssa14_mech(rake)
    ln_y = _bssa14_event_path(cf, mag, rjb, mech)

    # rock PGA for the nonlinear site term (site terms vanish at vs30=760)
    pga_r = np.exp(_bssa14_event_path(_BSSA14["PGA"], mag, rjb, mech))
    ln_flin = cf["c"] * np.log(min(vs30, cf["Vc"]) / _BSSA14_VREF)
    f2 = cf["f4"] * (
        np.exp(cf["f5"] * (min(vs30, 760.0) - 360.0)) - np.exp(cf["f5"] * 400.0)
    )
    ln_fnl = _BSSA14_F1 + f2 * np.log((pga_r + _BSSA14_F3) / _BSSA14_F3)
    return np.exp(ln_y + ln_flin + ln_fnl)


def epri_epicentral_to_rjb(repi, mag: float, *, C1=-2.118, C2=0.17, C3=-0.14,
                           C4=1.19, C5=0.09):
    """EPRI-2003 empirical epicentral -> Joyner-Boore distance adjustment,
    as used by the reference before BooreEtAl2014 lookups
    (custom_GMM.ipynb cell 1, epri_epicentral_to_rjb)."""
    repi = np.asarray(repi, np.float64)
    h = np.exp(C4 + C5 * (mag - 6.0))
    rprime = np.sqrt(repi**2 + h**2)
    return repi * (1 - 1 / np.cosh(C1 + C2 * (mag - 6.0) + C3 * np.log(rprime)))


# The reference multiplies OpenQuake Kanno2006 medians by 10^-0.07 (PGA)
# and 10^-0.11 (PGV) — "correcion from how kanno calculate the average
# mean" (custom_GMM.ipynb cells 11-12): Kanno regressed vectorial peaks,
# the workflow compares geometric means.
KANNO_MEAN_CONVENTION_LOG10 = {"PGA": -0.07, "PGV": -0.11}


def gmm_curve(
    imt: str, mag: float, distances, vs30: float = 400.0,
    model: str = "Kanno2006Shallow", *, rake: float | None = None,
    mean_convention_correction: bool = False,
):
    """Ground-motion prediction curve for residual plots.

    Distances are hypocentral/rupture for Kanno2006 and Joyner-Boore for
    BooreEtAl2014, matching the reference's context construction
    (custom_GMM.ipynb build_*_contexts).  Units: PGA in cm/s^2, PGV in
    cm/s for both models.  Uses OpenQuake when importable (exact
    reference parity); otherwise the built-in implementations.
    """
    key = imt.upper()
    try:  # exact reference path when the dependency exists
        curve = _gmm_curve_openquake(key, mag, distances, vs30, model, rake)
    except ImportError:
        if model == "Kanno2006Shallow":
            curve = kanno2006_shallow(key, mag, distances, vs30)
        elif model == "BooreEtAl2014":
            curve = boore_etal_2014(key, mag, distances, vs30, rake)
            if key == "PGA":
                curve = curve * 980.665  # g -> cm/s^2
        else:
            raise NotImplementedError(
                f"unknown GMM {model!r}; built-ins: Kanno2006Shallow, BooreEtAl2014"
            ) from None
    if mean_convention_correction and model.startswith("Kanno") and key in (
        KANNO_MEAN_CONVENTION_LOG10
    ):
        curve = curve * 10.0 ** KANNO_MEAN_CONVENTION_LOG10[key]
    return curve


def _gmm_curve_openquake(imt, mag, distances, vs30, model, rake):
    """Median curve via openquake's ContextMaker-free point API."""
    import numpy as _np
    from openquake.hazardlib import const as oq_const
    from openquake.hazardlib import contexts as oq_ctx
    from openquake.hazardlib import imt as oq_imt
    from openquake.hazardlib.valid import gsim as oq_gsim

    gmpe = oq_gsim(model)
    distances = _np.asarray(distances, _np.float64)
    ctx = oq_ctx.RuptureContext()
    ctx.mag = mag
    ctx.rake = rake if rake is not None else 0.0
    ctx.hypo_depth = 15.0
    ctx.sids = _np.arange(len(distances))
    ctx.vs30 = _np.full(len(distances), vs30)
    ctx.vs30measured = _np.ones(len(distances), bool)
    ctx.rjb = distances
    ctx.rrup = distances
    ctx.rhypo = distances
    im = oq_imt.from_string(imt if imt.startswith("SA") else imt.upper())
    mean = _np.zeros((1, len(distances)))
    sig = tau = phi = _np.zeros_like(mean)
    gmpe.compute(ctx, [im], mean, sig, tau, phi)
    out = _np.exp(mean[0])
    if imt.upper() == "PGA" or imt.startswith("SA"):
        out = out * 980.665  # g -> cm/s^2
    elif imt.upper() == "PGV":
        pass  # already cm/s
    return out
