"""Per-series preprocessing transforms (reference preprocessing.py).

All stateless and vectorizable; the Ray stage applies them per row
inside map_batches (stages.series_ops). ``smoothing`` (Butterworth
low-pass) requires scipy, which this environment does not ship — it is
gated behind an import-try like the reference gates its own scipy use.
"""

from __future__ import annotations

import numpy as np


def differencing(series: np.ndarray, smooth=None) -> np.ndarray:
    """np.diff + optional low-pass smoothing (preprocessing.py:16-42)."""
    series = np.diff(np.asarray(series, dtype=np.float64), n=1, axis=-1)
    if smooth is not None:
        series = smoothing(series, smooth)
    return series


def butter2_lowpass(wn: float) -> tuple:
    """Second-order digital Butterworth low-pass (b, a) for normalized
    cutoff wn in (0, 1) (fraction of Nyquist) — the standard bilinear-
    transform closed form; equals scipy.signal.butter(2, wn, 'low').
    Self-implemented from the textbook design equations (no scipy)."""
    if not 0.0 < wn < 1.0:
        raise ValueError(
            "Cannot construct filter, change the smoothing factor. "
            f"Requires 0<smooth<0.5 (Wn={wn})"
        )
    ita = 1.0 / np.tan(np.pi * wn / 2.0)
    q = np.sqrt(2.0)
    b0 = 1.0 / (1.0 + q * ita + ita * ita)
    b = np.array([b0, 2.0 * b0, b0])
    a = np.array(
        [1.0, -2.0 * (ita * ita - 1.0) * b0, (1.0 - q * ita + ita * ita) * b0]
    )
    return b, a


def _lfilter(b: np.ndarray, a: np.ndarray, x: np.ndarray, zi: np.ndarray) -> np.ndarray:
    """Direct-form-II-transposed IIR filter with initial state zi
    (len = order). Sequential by nature; series here are short
    (per-row token sequences), so the per-sample loop is acceptable."""
    m = len(a) - 1
    z = np.array(zi, dtype=np.float64, copy=True)
    y = np.empty_like(x, dtype=np.float64)
    for n in range(len(x)):
        xn = x[n]
        yn = b[0] * xn + z[0]
        for k in range(m - 1):
            z[k] = b[k + 1] * xn + z[k + 1] - a[k + 1] * yn
        z[m - 1] = b[m] * xn - a[m] * yn
        y[n] = yn
    return y


def _filtfilt_gust(b: np.ndarray, a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering with Gustafsson's method
    for the edges (F. Gustafsson, "Determining the initial states in
    forward-backward filtering", IEEE TSP 44(4), 1996).

    The forward initial state z0f and backward initial state z0b are
    chosen so the forward-then-backward and backward-then-forward
    outputs coincide; both outputs are affine in (z0f, z0b), so the
    least-squares criterion ||y_fb - y_bf||^2 is solved exactly with
    one lstsq over 2*order unknowns (superposition columns built from
    the zero-input state responses). Output is the optimum's
    (y_fb + y_bf)/2 — the same criterion scipy's method='gust' solves,
    so results agree to numerical precision."""
    x = np.asarray(x, dtype=np.float64)
    m = max(len(a), len(b)) - 1
    n = len(x)
    zeros = np.zeros(n)
    z0 = np.zeros(m)

    def F(v, zi):  # forward pass
        return _lfilter(b, a, v, zi)

    def Bw(v, zi):  # backward pass (reverse, filter, reverse)
        return _lfilter(b, a, v[::-1], zi)[::-1]

    eye = np.eye(m)
    # zero-input responses to unit initial states
    f_zi = np.stack([F(zeros, eye[j]) for j in range(m)], axis=1)  # (n, m)
    b_zi = np.stack([Bw(zeros, eye[j]) for j in range(m)], axis=1)

    y_f0 = F(x, z0)
    y_b0 = Bw(x, z0)
    c_fb = Bw(y_f0, z0)
    c_bf = F(y_b0, z0)
    # y_fb = c_fb + [Bw(f_zi_j)] z0f + b_zi z0b
    # y_bf = c_bf + [F(b_zi_j)] z0b + f_zi z0f
    A1 = np.stack([Bw(f_zi[:, j], z0) for j in range(m)], axis=1)
    B1 = np.stack([F(b_zi[:, j], z0) for j in range(m)], axis=1)
    M = np.hstack([A1 - f_zi, b_zi - B1])  # (n, 2m)
    rhs = c_bf - c_fb
    sol, *_ = np.linalg.lstsq(M, rhs, rcond=None)
    z0f, z0b = sol[:m], sol[m:]
    y_fb = c_fb + A1 @ z0f + b_zi @ z0b
    y_bf = c_bf + B1 @ z0b + f_zi @ z0f
    return 0.5 * (y_fb + y_bf)


def smoothing(series: np.ndarray, smooth: float) -> np.ndarray:
    """Butterworth(N=2) low-pass with Gustafsson edge handling
    (reference preprocessing.py:45-88 semantics), self-implemented in
    NumPy — no scipy dependency. Parity with the reference's own
    test vector is asserted in tests/test_kernel_parity.py."""
    series = np.asarray(series, dtype=np.float64)
    fs = 100
    nyq = 0.5 * fs
    wn = fs * smooth / nyq
    b, a = butter2_lowpass(wn)
    if series.ndim == 1:
        return _filtfilt_gust(b, a, series)
    return np.stack([_filtfilt_gust(b, a, row) for row in series])


def derivative(series: np.ndarray, smooth=None) -> np.ndarray:
    """Keogh DDTW derivative ((q_i - q_{i-1}) + (q_{i+1} - q_{i-1})/2)/2,
    one-sided at the endpoints (preprocessing.py:91-138)."""
    series = np.asarray(series, dtype=np.float64)
    if series.ndim > 1:
        # reference preprocessing.differencing/derivative raise here;
        # silently differencing ACROSS rows (axis 0) produced wrong DDTW
        # values for batched 2-D input (round-5 review finding)
        raise NotImplementedError("derivative expects a 1-D series")
    out = np.zeros_like(series)
    qim = series[:-2]
    qi = series[1:-1]
    qip = series[2:]
    out[1:-1] = ((qi - qim) + (qip - qim) / 2) / 2
    out[0] = series[1] - series[0]
    out[-1] = series[-1] - series[-2]
    if smooth is not None:
        out = smoothing(out, smooth)
    return out


def logdomain(series: np.ndarray) -> np.ndarray:
    """sign(x) * log1p(|x|) (preprocessing.py:141-151)."""
    series = np.asarray(series, dtype=np.float64)
    return np.sign(series) * np.log1p(np.abs(series))


def mixedlinearlogdomain(series: np.ndarray, c=10) -> np.ndarray:
    """Piecewise linear-then-log with knee c; tuple c = (pos, neg)
    (preprocessing.py:154-191)."""
    series = np.asarray(series, dtype=np.float64)
    if isinstance(c, (tuple, list)):
        pos = np.heaviside(series, 1)
        seriesp = pos * series
        seriesn = (1 - pos) * np.abs(series)
        cc = c[0]
        step = np.heaviside(seriesp - cc, 1)
        seriesp = (1 - step) * seriesp + step * (cc + np.log1p(step * (seriesp - cc)))
        cc = -c[1]
        step = np.heaviside(seriesn - cc, 1)
        seriesn = (1 - step) * seriesn + step * (cc + np.log1p(step * (seriesn - cc)))
        return -seriesn + seriesp
    sign = np.sign(series)
    series = np.abs(series)
    step = np.heaviside(series - c, 1)
    return sign * ((1 - step) * series + step * (c + np.log1p(step * (series - c))))


def znormal(series: np.ndarray) -> np.ndarray:
    """Per-row z-normalization along axis 1 (population std,
    preprocessing.py:194-206); 1-D input treated as one row."""
    series = np.asarray(series, dtype=np.float64)
    if series.ndim == 1:
        return (series - series.mean()) / series.std()
    return (series - series.mean(axis=1)[:, None]) / series.std(axis=1)[:, None]
