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


def smoothing(series: np.ndarray, smooth: float) -> np.ndarray:
    """Butterworth(N=2) low-pass, Gustafsson edges
    (preprocessing.py:45-88). Requires scipy."""
    try:
        from scipy import signal
    except ImportError as exc:  # pragma: no cover - scipy absent here
        raise ImportError(
            "smoothing requires scipy (not available in this environment); "
            "pass smooth=None or install scipy"
        ) from exc
    fs = 100
    nyq = 0.5 * fs
    wn = fs * smooth / nyq
    b, a = signal.butter(N=2, Wn=wn, btype="low", analog=False, output="ba")
    return signal.filtfilt(b, a, series, axis=-1, method="gust")


def derivative(series: np.ndarray, smooth=None) -> np.ndarray:
    """Keogh DDTW derivative ((q_i - q_{i-1}) + (q_{i+1} - q_{i-1})/2)/2,
    one-sided at the endpoints (preprocessing.py:91-138)."""
    series = np.asarray(series, dtype=np.float64)
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
