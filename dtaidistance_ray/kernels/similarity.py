"""Distance-matrix <-> similarity transforms (reference similarity.py).

Monotone elementwise transforms; applied driver-side to small matrices
or per batch over pair Datasets.
"""

from __future__ import annotations

import numpy as np


def distance_to_similarity(D, r=None, a=None, method="exponential", return_params=False,
                           cover_quantile=False):
    """exponential / gaussian / reciprocal / reverse transforms with the
    reference's default and quantile-calibrated r (similarity.py:7-78)."""
    D = np.asarray(D, dtype=np.float64)
    if cover_quantile is not False:
        if isinstance(cover_quantile, (tuple, list)):
            cover_quantile, cover_quantile_target = cover_quantile
        else:
            cover_quantile_target = 1 - cover_quantile
    else:
        cover_quantile_target = None
    method = method.lower()
    if method == "exponential":
        if r is None:
            if cover_quantile is False:
                r = np.max(D)
            else:
                r = -np.quantile(D, cover_quantile) / np.log(cover_quantile_target)
        S = np.exp(-D / r)
    elif method == "gaussian":
        if r is None:
            if cover_quantile is False:
                r = np.max(D)
            else:
                r = np.sqrt(-np.quantile(D, cover_quantile) ** 2 / np.log(cover_quantile_target))
        S = np.exp(-np.power(D, 2) / r**2)
    elif method == "reciprocal":
        if r is None:
            r = 1
        if a is None:
            if cover_quantile is False:
                a = 1
            else:
                a = (1 - cover_quantile_target * r) / (
                    cover_quantile_target * np.quantile(D, cover_quantile)
                )
        S = 1 / (r + D * a)
    elif method == "reverse":
        if r is None:
            r = np.min(D) + np.max(D)
        S = (r - D) / r
    else:
        raise ValueError(f"method={method} is not supported")
    if return_params:
        return S, r
    return S


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
