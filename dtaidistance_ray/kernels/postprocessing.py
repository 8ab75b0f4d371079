"""Warping-path postprocessing (reference postprocessing.py:17-93).

Re-score an existing path with optionally derivative-relaxed point
costs (each point's value treated as a range [v - d/2, v + d/2] where d
is its Keogh derivative; the smallest endpoint-combination cost wins),
and filter path points by (relaxed) value difference.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

from .preprocessing import derivative


def _inner(inner_dist: str):
    if inner_dist == "squared euclidean":
        return (lambda a, b: (a - b) ** 2), math.sqrt
    return (lambda a, b: abs(a - b)), (lambda x: x)


def distance_from_path(
    ts1,
    ts2,
    path: List[Tuple[int, int]],
    inner_dist: str = "squared euclidean",
    relaxed: bool = True,
) -> float:
    """Distance of a GIVEN warping path; relaxed mode compensates for
    sampling position on steep slopes (postprocessing.py:17-58)."""
    ts1 = np.asarray(ts1, dtype=np.float64)
    ts2 = np.asarray(ts2, dtype=np.float64)
    idist, result = _inner(inner_dist)
    if relaxed:
        ts1d = derivative(ts1)
        ts2d = derivative(ts2)
    dist = 0.0
    for i_f, i_t in path:
        if not relaxed:
            dist += idist(ts1[i_f], ts2[i_t])
            continue
        d1, d2 = ts1d[i_f], ts2d[i_t]
        a1, a2 = ts1[i_f] - d1 * 0.5, ts1[i_f] + d1 * 0.5
        b1, b2 = ts2[i_t] - d2 * 0.5, ts2[i_t] + d2 * 0.5
        dist += min(idist(a1, b1), idist(a1, b2), idist(a2, b1), idist(a2, b2))
    return result(dist)


def get_points_in_path_with_min_diff(
    ts1,
    ts2,
    path: List[Tuple[int, int]],
    min_diff: float,
    relaxed: bool = True,
) -> List[Tuple[int, int]]:
    """Path points whose (relaxed) value difference exceeds min_diff
    (postprocessing.py:61-93); endpoints use derivative 1 as the
    reference does."""
    ts1 = np.asarray(ts1, dtype=np.float64)
    ts2 = np.asarray(ts2, dtype=np.float64)
    points = []
    for i_f, i_t in path:
        diff = abs(ts1[i_f] - ts2[i_t])
        if diff > min_diff:
            if not relaxed:
                points.append((i_f, i_t))
                continue
            if 0 < i_f < len(ts1) - 1:
                d1 = ((ts1[i_f] - ts1[i_f - 1]) + (ts1[i_f + 1] - ts1[i_f - 1]) / 2) / 2
            else:
                d1 = 1
            if 0 < i_t < len(ts2) - 1:
                d2 = ((ts2[i_t] - ts2[i_t - 1]) + (ts2[i_t + 1] - ts2[i_t - 1]) / 2) / 2
            else:
                d2 = 1
            a1, a2 = ts1[i_f] - d1 * 0.5, ts1[i_f] + d1 * 0.5
            b1, b2 = ts2[i_t] - d2 * 0.5, ts2[i_t] + d2 * 0.5
            diff = min(abs(a1 - b1), abs(a1 - b2), abs(a2 - b1), abs(a2 - b2))
            if diff > min_diff:
                points.append((i_f, i_t))
    return points
