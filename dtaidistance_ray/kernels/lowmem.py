"""Low-memory warping path via Hirschberg divide-and-conquer.

Counterpart of reference dtw.warping_path_fast(use_lowmem=True)
(dtw.py:993-1038, C kernel dd_dtw.h:159-187): the full warping-paths
matrix is O(r*c) floats, which for very long series dwarfs the data;
Hirschberg's recursion needs only two O(c) cost rows per level.

Scheme: forward two-row DP gives the accumulated costs of row mid-1,
a mirrored backward DP gives the cost-to-goal of row mid; the optimal
path must hop between those rows at some column (vertically j -> j or
diagonally j -> j+1), so argmin over the joined costs pins a path cell
and the problem splits into two independent corner-to-corner blocks.
Blocks under ``switch_to_full`` rows fall back to the full-matrix
traceback (same base behavior as the reference's switch_to_full).

Supported settings: the default plain-DTW path (inner sqeuclidean).
Like the reference we raise for psi / max_step / max_length_diff;
unlike the reference's C kernel we also raise for window and penalty:
a windowed subproblem's band differs from the global band, and the
full-matrix traceback's penalty rule compares UNPENALIZED neighbor
values (a reference quirk the split recursion cannot reproduce) —
use the full-matrix ``warping_path`` for those.

Total work is <= 2x the full DP; memory is O(r + c).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..settings import DTWSettings, SQEUCLIDEAN
from .elastic import warping_path as full_warping_path

INF = float("inf")


def _forward_last_row(s1: np.ndarray, s2: np.ndarray, penalty: float) -> np.ndarray:
    """Accumulated costs D[len(s1)-1, j] for all j (two-row DP).

    Index k of the returned array is column k (0-based cells)."""
    c = len(s2)
    prev = np.full(c + 1, INF)
    prev[0] = 0.0
    cur = np.empty(c + 1)
    for i in range(len(s1)):
        cur[:] = INF
        cost = (s1[i] - s2) ** 2
        e = np.minimum(prev[:-1], prev[1:] + penalty)
        h = cost + e
        cpen = cost + penalty
        S = np.cumsum(cpen)
        cur[1:] = S + np.minimum.accumulate(h - S)
        prev, cur = cur, prev
    return prev[1:]


def _backward_first_row(s1: np.ndarray, s2: np.ndarray, penalty: float) -> np.ndarray:
    """Cost-to-goal B[0, j] including cell (0, j): best path cost from
    (0, j) to the bottom-right corner. Mirrored DP on reversed data."""
    rev = _forward_last_row(s1[::-1], s2[::-1], penalty)
    return rev[::-1]


def _hirschberg(
    s1: np.ndarray,
    s2: np.ndarray,
    i_off: int,
    j_off: int,
    penalty: float,
    switch: int,
    out: List[Tuple[int, int]],
) -> None:
    r, c = len(s1), len(s2)
    if r == 0 or c == 0:
        return
    if r <= switch or r <= 2 or c <= 2:
        path = full_warping_path(s1, s2, DTWSettings())
        out.extend((i_off + i, j_off + j) for i, j in path)
        return
    mid = r // 2
    df = _forward_last_row(s1[:mid], s2, penalty)  # row mid-1 costs
    db = _backward_first_row(s1[mid:], s2, penalty)  # row mid cost-to-goal
    diag_tot = df[:-1] + db[1:]  # (mid-1, j) -> (mid, j+1)
    vert_tot = df + db + penalty  # (mid-1, j) -> (mid, j)
    bd = int(np.argmin(diag_tot)) if len(diag_tot) else 0
    bv = int(np.argmin(vert_tot))
    # diagonal preferred on ties (matches traceback preference diag-first)
    if len(diag_tot) and diag_tot[bd] <= vert_tot[bv]:
        j_split, j_next = bd, bd + 1
    else:
        j_split, j_next = bv, bv
    _hirschberg(s1[:mid], s2[: j_split + 1], i_off, j_off, penalty, switch, out)
    _hirschberg(s1[mid:], s2[j_next:], i_off + mid, j_off + j_next, penalty, switch, out)


def warping_path_lowmem(
    s1,
    s2,
    settings: Optional[DTWSettings] = None,
    switch_to_full: int = 1000,
    include_distance: bool = False,
):
    """Hirschberg warping path; O(r + c) memory.

    Returns the same optimal alignment cost as ``warping_path``; when
    the optimum is unique the path is identical, on exact-tie inputs an
    equally-optimal path may differ (asserted in tests)."""
    s = settings or DTWSettings()
    for bad in ("psi", "max_step", "max_length_diff", "window", "penalty"):
        if getattr(s, bad) not in (None, 0):
            raise ValueError(f"The argument {bad} is not supported when use_lowmem=True")
    if s.max_dist is not None or s.use_pruning:
        raise ValueError("max_dist/use_pruning are not supported when use_lowmem=True")
    if s.inner_dist != SQEUCLIDEAN:
        raise ValueError("only the default inner distance is supported when use_lowmem=True")
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    if s1.ndim > 1 or s2.ndim > 1:
        raise ValueError(
            "warping_path_lowmem supports 1-D series; use the full-matrix "
            "warping_path for multi-dimensional input"
        )
    penalty = s.adj_penalty
    out: List[Tuple[int, int]] = []
    _hirschberg(s1, s2, 0, 0, penalty, max(2, switch_to_full), out)
    # splits re-emit their boundary cells; de-dup adjacent repeats
    path: List[Tuple[int, int]] = []
    for p in out:
        if not path or path[-1] != p:
            path.append(p)
    if include_distance:
        # the Hirschberg path is optimal, so its accumulated cost IS the
        # DP optimum (penalty is forced to 0 on this surface, line 111) —
        # harvesting it from the path is O(|path|) instead of re-running
        # the O(r*c) forward DP (round-5 review finding)
        idx = np.asarray(path, dtype=np.int64)
        d = (
            float(np.sqrt(((s1[idx[:, 0]] - s2[idx[:, 1]]) ** 2).sum()))
            if len(idx)
            else 0.0
        )
        return path, d
    return path


def warping_path_fast(from_s, to_s, include_distance: bool = False,
                      use_lowmem=False, settings: Optional[DTWSettings] = None):
    """Reference warping_path_fast surface (dtw.py:993-1038): lowmem
    switches to Hirschberg; an int use_lowmem sets switch_to_full."""
    if use_lowmem:
        switch = use_lowmem if isinstance(use_lowmem, int) and use_lowmem is not True else 1000
        return warping_path_lowmem(
            from_s, to_s, settings, switch_to_full=switch,
            include_distance=include_distance,
        )
    path = full_warping_path(from_s, to_s, settings)
    if include_distance:
        from .elastic import distance

        return path, distance(from_s, to_s, settings)
    return path
