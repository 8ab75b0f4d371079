"""Distance-matrix <-> similarity transforms (reference similarity.py).

Monotone elementwise transforms; applied driver-side to small matrices
or per batch over pair Datasets.
"""

from __future__ import annotations

import numpy as np


# Similarity transforms, dispatch-table style: per method a default
# scale, a quantile calibration (choose r so the q-th distance quantile
# maps to the target similarity), and the elementwise map D -> S. The
# transform/calibration FORMULAS follow the published semantics of
# reference similarity.py:7-78; the structure here is our own.

_SIM_METHODS = {
    "exponential": dict(
        default=lambda D: np.max(D),
        calibrate=lambda q, tgt: -q / np.log(tgt),
        transform=lambda D, r: np.exp(-D / r),
    ),
    "gaussian": dict(
        default=lambda D: np.max(D),
        calibrate=lambda q, tgt: np.sqrt(-(q**2) / np.log(tgt)),
        transform=lambda D, r: np.exp(-np.power(D, 2) / r**2),
    ),
    "reverse": dict(
        default=lambda D: np.min(D) + np.max(D),
        calibrate=None,  # reverse has no quantile calibration
        transform=lambda D, r: (r - D) / r,
    ),
}


def distance_to_similarity(D, r=None, a=None, method="exponential", return_params=False,
                           cover_quantile=False):
    """Distance matrix -> similarity in (0, 1].

    method: 'exponential' | 'gaussian' | 'reciprocal' | 'reverse'.
    r (and a for reciprocal) override the auto-calibrated scale;
    cover_quantile = q or (q, target) calibrates the scale so the q-th
    distance quantile maps to the target similarity (default 1-q)."""
    D = np.asarray(D, dtype=np.float64)
    q = tgt = None
    if cover_quantile is not False:
        if isinstance(cover_quantile, (tuple, list)):
            cq, tgt = cover_quantile
        else:
            cq, tgt = cover_quantile, 1 - cover_quantile
        q = np.quantile(D, cq)
    method = method.lower()
    if method == "reciprocal":
        # distinct shape: two parameters (offset r, slope a)
        r = 1 if r is None else r
        if a is None:
            a = 1 if q is None else (1 - tgt * r) / (tgt * q)
        S = 1 / (r + D * a)
        return (S, r) if return_params else S
    spec = _SIM_METHODS.get(method)
    if spec is None:
        raise ValueError(f"method={method} is not supported")
    if r is None:
        if q is not None and spec["calibrate"] is not None:
            r = spec["calibrate"](q, tgt)
        else:
            r = spec["default"](D)
    S = spec["transform"](D, r)
    return (S, r) if return_params else S


def squash(X, r=None, base=None, x0=None, method="logistic", return_params=False,
           keep_sign=False, cover_quantile=False):
    """Monotone squashing to [0, 1]: logistic / gaussian / exponential
    (similarity.py:81-173; Vercruyssen et al., ICDM 2018)."""
    X = np.asarray(X, dtype=np.float64)
    if cover_quantile is not False:
        if isinstance(cover_quantile, (tuple, list)):
            cover_quantile, cover_quantile_target = cover_quantile
        else:
            cover_quantile_target = cover_quantile
    else:
        cover_quantile_target = None
    if keep_sign:
        Xs = np.sign(X)
        Xz = 0
        X = np.abs(X)
    else:
        Xs = 1
    result = None
    if method == "gaussian":
        x0 = 0
        if r is None:
            if cover_quantile is False:
                r = 1
            else:
                r = np.sqrt(-((np.quantile(X, cover_quantile) - x0) ** 2) / np.log(1 - cover_quantile_target))
        if base is None:
            result = 1 - np.exp(-np.power(X - x0, 2) / r**2)
            Xz = 1 - np.exp(-np.power(0 - x0, 2) / r**2)
        else:
            result = 1 - np.power(base, -np.power(X - x0, 2) / r**2)
            Xz = 1 - np.power(base, -np.power(0 - x0, 2) / r**2)
    if method == "exponential":
        x0 = 0
        if r is None:
            if cover_quantile is False:
                r = 1
            else:
                r = -(np.quantile(X, cover_quantile) - x0) / np.log(1 - cover_quantile_target)
        if base is None:
            result = 1 - np.exp(-(X - x0) / r)
            Xz = 1 - np.exp(x0 / r)
        else:
            result = 1 - np.power(base, -(X - x0) / r)
            Xz = 1 - np.power(base, x0 / r)
    elif method == "logistic":
        if x0 is None:
            x0 = np.mean(X)
        if r is None:
            if cover_quantile is False:
                r = x0 / 6
            else:
                r = -(np.quantile(X, cover_quantile) - x0) / np.log(1 / cover_quantile_target - 1)
        if base is None:
            result = 1 / (1 + np.exp(-(X - x0) / r))
            Xz = 1 / (1 + np.exp(-(0 - x0) / r))
        else:
            result = 1 / (1 + np.power(base, -(X - x0) / r))
            Xz = 1 / (1 + np.power(base, -(0 - x0) / r))
    if result is None:
        raise ValueError("Unknown value for method")
    if keep_sign:
        result = Xs * (result - Xz)
    if return_params:
        return result, r, x0
    return result
