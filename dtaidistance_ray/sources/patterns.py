"""Synthetic benchmark-pattern generators (scipy-free).

Reimplements the reference's ``benchmarks/synthetic.py`` surface
(pattern1 / pattern2 / ts_under_pattern1 — study-only, no code copied)
without scipy, which is not available in this environment (the
reference module itself cannot even import here). The only nontrivial
dependency is the Dawson integral ``F(x) = exp(-x^2) * int_0^x
exp(t^2) dt``; we evaluate it with Rybicki's exponentially convergent
sampling series

    F(x) ~= (1/sqrt(pi)) * sum_{n odd} exp(-(x - n h)^2) / n

(G. Rybicki, "Dawson's integral and the sampling theorem", Computers
in Physics 3, 1989 — public formula). The discretization error decays
like exp(-pi^2/(4 h^2)); h = 0.25 puts it below double-precision
round-off, verified in tests/test_patterns.py against the Taylor and
asymptotic expansions on their own convergence domains.
"""

from __future__ import annotations

import math

import numpy as np

_H = 0.25
_K = 30  # window half-width in odd-term index; tail < exp(-(2*K*h)^2)


def dawsn(x) -> np.ndarray:
    """Dawson integral, vectorized, ~1e-15 absolute accuracy."""
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    xf = np.atleast_1d(x)
    # center the odd-n window on x/h: n = 2*(m+j)+1, j in [-K, K]
    m = np.round((xf / _H - 1.0) / 2.0).astype(np.int64)
    j = np.arange(-_K, _K + 1, dtype=np.int64)
    n = 2 * (m[:, None] + j[None, :]) + 1  # always odd, never 0
    t = xf[:, None] - n * _H
    out = (np.exp(-t * t) / n).sum(axis=1) / math.sqrt(math.pi)
    return float(out[0]) if scalar else out


def _norm_pdf(x, loc: float = 0.0, scale: float = 1.0) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    z = (x - loc) / scale
    return np.exp(-0.5 * z * z) / (scale * math.sqrt(2.0 * math.pi))


def pattern1(x, x0=4, c=0.5, a=0, x1=22, d=1, r=0.0, rs=3980, w0=1, x2=25, w2=0):
    """Transient-system pattern: rise with overshoot + one sine-like
    cycle (+ optional dip and noise). Same parameters and semantics as
    the reference generator (benchmarks/synthetic.py:5-44)."""
    x = np.asarray(x, dtype=np.float64)
    # overshoot: Dawson tail after x0, exponential rise before it
    y = (dawsn((x - x0) * w0) + c) * np.heaviside(x - x0, 0)
    y += (np.exp(x * w0) / (np.exp(x0 * w0) / c)) * np.heaviside(x0 - x, 0)
    if a > 0:
        y += _norm_pdf(x - x0) * a
    # one clipped-Dawson sine-like cycle centered at x1
    xd = 3
    y0 = dawsn(xd)
    dv = dawsn((x - x1) * d)
    idx1 = dv > y0
    idx2 = dv < -y0
    dv = dv.copy()
    dv[idx1] = dv[idx1] - y0
    dv[idx2] = dv[idx2] + y0
    dv[~idx1 & ~idx2] = 0
    y += np.heaviside(x - x1 + xd, 0) * np.heaviside(x1 - x + xd, 0) * dv / 2
    # dip
    if w2 > 0:
        scale = w2 / 10
        peak = _norm_pdf(x2, loc=x2, scale=scale)
        y -= _norm_pdf(x, loc=x2, scale=scale) / peak * c
    # noise: same legacy-MT19937 stream as the reference's
    # np.random.seed(rs); np.random.random(shape)
    if r > 0:
        y += np.random.RandomState(rs).random_sample(y.shape) * r
    return y


def pattern2(length_of_ts: int, starting_index_of_wave: int, length_of_wave: int) -> np.ndarray:
    """Zero-padded single sine cycle (reference benchmarks/synthetic.py:47-50)."""
    return np.concatenate(
        (
            np.zeros(starting_index_of_wave),
            np.sin(np.linspace(0, 2 * np.pi, length_of_wave)),
            np.zeros(length_of_ts - starting_index_of_wave - length_of_wave),
        )
    )


def ts_under_pattern1(params_of_cluster=None, params_of_new_times=None):
    """Cluster of pattern1 series + held-out new series (reference
    benchmarks/synthetic.py:53-82): x grid [0, 30] with 200 points,
    params are (x0-delta, c, a, d) tuples."""
    x = np.linspace(0, 30, num=200)
    x00 = 7
    x1 = 22
    if params_of_cluster is None:
        params_of_cluster = [
            (0, 0.5, 1.0, 1),
            (-0.7, 0.5, 1.0, 1),
            (-0.3, 0.5, 2.0, 2),
            (0.7, 0.5, 1.0, 2),
            (0.4, 0.5, 1.0, 3),
        ]
    if params_of_new_times is None:
        params_of_new_times = [(5, 0.5, 1, 1)]
    ys = [pattern1(x, x00 + x0d, c, a, x1, d) for x0d, c, a, d in params_of_cluster]
    ys_new = [pattern1(x, x00 + x0d, c, a, x1, d) for x0d, c, a, d in params_of_new_times]
    return x, ys, ys_new
