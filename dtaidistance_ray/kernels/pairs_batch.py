"""Batched pairwise DTW distances: many (s1, s2) pairs per DP pass.

The scalar ``elastic.distance`` is row-vectorized but pays the Python
row loop per pair; scoring stages (distance-matrix tiles, k-NN) batch
hundreds of pairs, so the row loop should amortize across the batch.
This kernel runs the same band-compacted min-plus DP as the rollup
sweep (kernels/dba_scan.py) over a whole class of pairs at once: row
arrays hold only the Sakoe-Chiba band in per-pair diagonal coordinates
(one take_along_axis gather per row), classes are formed on a 1.25x
length ladder so padding waste is bounded.

Supported settings: window (per-pair effective), penalty,
max_length_diff, use_pruning. use_pruning is NOT value-neutral: the
reference (dtw.py:199-203 + the final ``d > max_dist`` check) returns
inf when the DTW cost exceeds ub_euclidean, and ub_euclidean's
unequal-length tail truncation (or a nonzero penalty) makes that
reachable — so this kernel post-applies the same cutoff per pair
after the exact DP (parity asserted in tests/test_stages.py).
psi / max_step / max_dist fall back to the scalar kernel in the
callers.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..settings import DTWSettings, SQEUCLIDEAN

INF = float("inf")


def pairs_supported(settings: Optional[DTWSettings]) -> bool:
    s = settings or DTWSettings()
    return (
        s.psi in (None, 0)
        and s.max_step is None
        and s.max_dist is None
        and s.inner_dist == SQEUCLIDEAN
    )


def _ladder(x: int) -> int:
    n = 16
    while n < x:
        n = (n * 5 + 3) // 4
    return n


def _class_distances(
    C: np.ndarray,
    c_lens: np.ndarray,
    S: np.ndarray,
    s_lens: np.ndarray,
    windows: np.ndarray,
    penalty: float,
) -> np.ndarray:
    """Final accumulated costs D[c_len, s_len] for one padded class.

    Same recurrence/band layout as dba_scan._dp_choices_compact, minus
    the traceback bookkeeping, plus per-pair windows and result harvest
    at each pair's final row."""
    B, R = C.shape
    M = S.shape[1]
    d_rs = np.maximum(0, c_lens - s_lens)
    d_sr = np.maximum(0, s_lens - c_lens)
    W = int(np.minimum(s_lens, d_rs + d_sr + 2 * windows - 1).max())
    out = np.full(B, INF)
    Fprev = np.full((B, W + 2), INF)
    Fcur = np.empty((B, W + 2))
    Fprev[:, 0] = 0.0
    tq = np.arange(W + 1)
    qW = np.arange(W)
    js_prev = np.zeros(B, dtype=np.int64)
    R_max = int(c_lens.max())
    for i in range(R_max):
        js = np.maximum(0, i - d_rs - windows + 1)
        je = np.minimum(s_lens, i + d_sr + windows)
        width = np.maximum(je - js, 0)
        delta = js - js_prev
        G = np.take_along_axis(Fprev, tq[None, :] + delta[:, None], axis=1)
        diag = G[:, :W]
        up_nop = G[:, 1 : W + 1]
        col_idx = np.minimum(js[:, None] + qW[None, :], M - 1)
        cost = np.take_along_axis(S, col_idx, axis=1) - C[:, i][:, None]
        np.multiply(cost, cost, out=cost)
        if penalty:
            h = np.minimum(diag, up_nop + penalty)
        else:
            h = np.minimum(diag, up_nop)
        h += cost
        invalid = qW[None, :] >= width[:, None]
        h[invalid] = INF
        if penalty:
            cost += penalty
        acc = np.cumsum(cost, axis=1)
        f = h - acc
        np.minimum.accumulate(f, axis=1, out=f)
        f += acc
        f[invalid] = INF
        done = c_lens == i + 1
        if done.any():
            q_last = (s_lens - 1 - js)[done]
            out[done] = f[done, q_last]
        Fcur[:, 0] = INF
        Fcur[:, 1 : W + 1] = f
        Fcur[:, W + 1] = INF
        Fprev, Fcur = Fcur, Fprev
        js_prev = js
    return out


def batched_pair_distances(
    s1s: List[np.ndarray],
    s2s: List[np.ndarray],
    settings: Optional[DTWSettings] = None,
) -> np.ndarray:
    """DTW distance per (s1s[k], s2s[k]) pair — value parity with
    elastic.distance for every pairs_supported settings combination
    (asserted in tests/test_stages.py)."""
    s = settings or DTWSettings()
    n = len(s1s)
    out = np.full(n, INF)
    ndim_pairs: List[int] = []  # multi-dimensional: scalar kernel path
    classes: Dict[Tuple[int, int], List[int]] = {}
    lens1 = np.array([len(x) for x in s1s], dtype=np.int64)
    lens2 = np.array([len(x) for x in s2s], dtype=np.int64)
    for k in range(n):
        r, m = int(lens1[k]), int(lens2[k])
        if r == 0 or m == 0 or abs(r - m) > s.adj_max_length_diff:
            continue  # inf (reference max_length_diff semantics)
        if np.ndim(s1s[k]) > 1 or np.ndim(s2s[k]) > 1:
            ndim_pairs.append(k)
            continue
        classes.setdefault((_ladder(r), _ladder(m)), []).append(k)
    for (R, M), ks in classes.items():
        B = len(ks)
        C = np.zeros((B, R))
        S = np.zeros((B, M))
        for b, k in enumerate(ks):
            C[b, : lens1[k]] = s1s[k]
            S[b, : lens2[k]] = s2s[k]
        c_lens = lens1[ks]
        s_lens = lens2[ks]
        windows = np.array(
            [s.effective_window(int(lens1[k]), int(lens2[k])) for k in ks],
            dtype=np.int64,
        )
        d = _class_distances(C, c_lens, S, s_lens, windows, s.adj_penalty)
        out[np.asarray(ks)] = d
    scalar_redo: List[int] = []
    if s.use_pruning and (s.max_dist is None or s.max_dist == 0):
        # Reference PrunedDTW semantics: the accumulated (inner-domain)
        # cost is compared STRICTLY against inner_val(ub_euclidean) and
        # the result is inf when it exceeds it (elastic.distance's final
        # check; ref dtw.py:397-398). The class DP's prefix-scan trick
        # (f - acc, min-accumulate, + acc) is not bit-exact with the
        # scalar DP, so within a small relative zone of the cutoff we
        # defer the whole pair to the scalar kernel, whose sums are
        # bit-equal to the reference's.
        from .elastic import ub_euclidean

        for ks in classes.values():
            for k in ks:
                if out[k] == INF:
                    continue
                md = s.inner_val(ub_euclidean(s1s[k], s2s[k], s.inner_dist))
                if not md:
                    continue
                if out[k] > md * (1.0 + 1e-9):
                    out[k] = INF
                elif out[k] > md * (1.0 - 1e-9):
                    scalar_redo.append(k)
    result = s.result(out)  # vectorized (np.sqrt keeps inf); was a per-pair Python loop
    if ndim_pairs or scalar_redo:
        # ndim pairs (vector inner cost) and cutoff-boundary pairs use
        # the scalar kernel, which applies s.result itself
        from .elastic import distance as _scalar_distance

        for k in ndim_pairs + scalar_redo:
            result[k] = _scalar_distance(s1s[k], s2s[k], s)
    return result
