"""Weighted DTW (reference dtw_weighted.py:56-152).

The inner difference d = s1[i] - s2[j] is re-shaped by a per-point
ReLU-like weight profile before squaring. Weights for point i of s1
are a tuple (-x3, -x2, -x1, -x0, x0, x1, x2, x3); the negative block
applies when d < 0 (series compared against is higher), the positive
when d >= 0:

    d <= x0        -> 0            (dead zone)
    x0 < d < x1    -> d*(d-x0)/(x1-x0)   (ramp-in)
    x1 <= d < x2   -> d            (unit zone)
    x2 <= d        -> d*(1 + a*(d-x2)), a = 1 if x3 in {inf, x1}
                                        else 2/(x3-x2)  (amplify)

Row-vectorized (weight transform elementwise, row DP via the same
min-plus scan as kernels/elastic.py). The decision-tree weight
LEARNING machinery of the reference (series_to_dt + its own
DecisionTreeClassifier, dtw_weighted.py:170-1004) is out of scope —
every reference test of it is skipped in the reference's own suite;
weights come in as arrays here.

Parity with the reference's pure-Python dtw_weighted.warping_paths /
distance_matrix is asserted in tests/test_ops_parity.py, including the
reference's two API quirks which we reproduce deliberately: a given
window is widened by one (its own "0 should be diagonal" TODO), and
the returned scalar reads paths[l1-1, l2-1] of the sqrt'ed matrix.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from .elastic import _minplus_scan

INF = float("inf")


def _apply_weight_profile(d: np.ndarray, w_row: np.ndarray) -> np.ndarray:
    """Elementwise ReLU-like re-shaping of a row of differences."""
    xn3, xn2, xn1, xn0, xp0, xp1, xp2, xp3 = w_row
    neg = d < 0
    a = np.abs(d)
    x0 = np.where(neg, xn0, xp0)
    x1 = np.where(neg, xn1, xp1)
    x2 = np.where(neg, xn2, xp2)
    x3 = np.where(neg, xn3, xp3)
    out = a.copy()
    out[a <= x0] = 0.0
    ramp = (x0 < a) & (a < x1)
    if ramp.any():
        out[ramp] = a[ramp] * (a[ramp] - x0[ramp]) / (x1[ramp] - x0[ramp])
    amp = x2 <= a
    if amp.any():
        amp_coef = np.where(
            np.isinf(x3[amp]) | (x3[amp] == x1[amp]), 1.0, 2.0 / (x3[amp] - x2[amp])
        )
        out[amp] = a[amp] * (1.0 + amp_coef * (a[amp] - x2[amp]))
    return out


def warping_paths(s1, s2, weights=None, window: Optional[int] = None, **_kwargs):
    """Weighted accumulated-cost matrix; returns (value, sqrt matrix)
    with the reference's exact conventions (dtw_weighted.py:56-120)."""
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    l1, l2 = len(s1), len(s2)
    if window is None:
        window = max(l1, l2)
    else:
        window += 1  # reference quirk: 0 means the diagonal
    paths = np.full((l1 + 1, l2 + 1), INF)
    paths[0, 0] = 0.0
    if weights is not None:
        weights = np.asarray(weights, dtype=np.float64)
    for i in range(l1):
        js = max(0, i - max(0, l1 - l2) - window + 1)
        je = min(l2, i + max(0, l2 - l1) + window)
        if js >= je:
            continue
        d = s1[i] - s2[js:je]
        if weights is not None:
            d = _apply_weight_profile(d, weights[i, :])
        cost = d * d
        prev = paths[i]
        e = np.minimum(prev[js:je], prev[js + 1 : je + 1])
        f = _minplus_scan(cost + e, cost, 0.0, paths[i + 1, js])
        paths[i + 1, js + 1 : je + 1] = f
    paths = np.sqrt(paths)
    return paths[l1 - 1, l2 - 1], paths


def _largest_ml_below_cl(mls, cls) -> float:
    """Largest must-link value that stays below every cannot-link value."""
    mls = sorted(mls)
    cls = sorted(cls)
    cl_floor = cls[0] if cls else INF
    best = 0.0
    for v in mls:
        if v > cl_floor:
            return best
        if v > best:
            best = v
    return best


def _smallest_cl_above_ml(cls, mls, keep_largest: bool = True) -> float:
    """Smallest cannot-link value above every must-link value; when
    none qualifies and keep_largest, fall back to the largest cl."""
    mls = sorted(mls)
    cls = sorted(cls)
    ml_ceil = mls[-1] if mls else 0.0
    best = INF
    for v in reversed(cls):
        if v < ml_ceil:
            break
        if v < best:
            best = v
    if keep_largest and np.isinf(best) and cls:
        best = cls[-1]
    return best


def compute_weights_from_mlclvalues(serie, ml_values, cl_values, only_max=False,
                                    strict_cl=True, **_kwargs):
    """Per-point weight profiles from must-link / cannot-link distance
    observations (reference dtw_weighted.py:441-543 semantics).

    ml_values / cl_values: dict idx -> (neg list, pos list) of observed
    |differences| toward same-class / other-class series. The dead zone
    ends inside the must-link range, the amplification zone starts at
    the cleaned cannot-link minimum:

        x1 = min(1.5*ml_max, x3); x0 = x1/2; x3 = cl_min; x2 = 0.9*x3
        (x1 and x2 meet at their midpoint if they cross)
    """
    n = len(serie)
    w = np.zeros((n, 8), dtype=np.double)
    w[:, 0:2] = INF
    w[:, 6:8] = INF

    bounds = {side: np.zeros((n, 3)) for side in (0, 1)}
    for idx in range(n):
        for side in (0, 1):  # 0 = negative differences, 1 = positive
            mls = list(ml_values[idx][side]) if idx in ml_values else []
            cls = list(cl_values[idx][side]) if idx in cl_values else []
            ml_max = _largest_ml_below_cl(mls, cls)
            cl_min = _smallest_cl_above_ml(cls, mls, strict_cl)
            diff = 0.0 if np.isinf(cl_min) else cl_min - ml_max
            bounds[side][idx] = [ml_max, cl_min, diff]

    if only_max:
        # keep the cl-min only where the ml/cl margin is widest
        for side in (0, 1):
            b = bounds[side]
            widest = b[:, 2] == np.max(b[:, 2])
            kept = b[:, 1][widest]
            b[:, 1] = INF
            b[:, 1][widest] = kept

    for idx in range(n):
        row = []
        for side in (0, 1):
            ml_max, cl_min, _ = bounds[side][idx]
            x1 = 1.5 * ml_max
            x3 = cl_min
            if x1 > x3:
                x1 = x3
            x0 = 0.5 * x1
            x2 = 0.9 * x3
            if x2 < x1:
                x1 = x2 = (x1 + x2) / 2
            row.append((x0, x1, x2, x3))
        (n0, n1, n2, n3), (p0, p1, p2, p3) = row
        w[idx, :] = [n3, n2, n1, n0, p0, p1, p2, p3]
    return w


def distance_matrix(s, weights: Dict[int, np.ndarray], window: Optional[int] = None,
                    **_kwargs):
    """Pairwise weighted distances (reference dtw_weighted.py:121-152):
    weights make the measure asymmetric, so each pair scores both
    directions and keeps the min. Driver-sized inputs (the weight
    matrices are per-prototype artifacts); for corpus-scale use the
    tile pattern of stages/distance_matrix.py applies unchanged."""
    n = len(s)
    dists = np.full((n, n), INF)
    for r in range(n):
        for c in range(r + 1, n):
            w_r = weights.get(r, None)
            d1, _ = warping_paths(s[r], s[c], w_r, window=window)
            w_c = weights.get(c, None)
            if w_r is None and w_c is None:
                dists[r, c] = d1
            else:
                d2, _ = warping_paths(s[c], s[r], w_c, window=window)
                dists[r, c] = min(d1, d2)
    return dists
