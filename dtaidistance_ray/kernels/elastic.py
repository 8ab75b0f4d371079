"""Elastic-distance kernels: banded / pruned / psi-relaxed DTW.

Pure NumPy, no Ray. These are the per-pair kernels that Ray stages call
inside ``map_batches`` (see dtaidistance_ray.stages). Semantics follow
the reference implementation (study-only, no code copied):

- recurrence  wps[i,j] = cost(s1[i-1], s2[j-1])
                 + min(wps[i-1,j-1], wps[i-1,j]+penalty, wps[i,j-1]+penalty)
  with result sqrt(.) for the default squared-euclidean inner distance
  (/root/reference/src/dtaidistance/dtw.py:299-400),
- Sakoe-Chiba band: j in [i - max(0,r-c) - window + 1, i + max(0,c-r) + window)
  (dtw.py:347-349),
- psi begin/end relaxation (dtw.py:333-337, 360-361, 386-398),
- max_step skips cells (dtw.py:364-366), max_dist early abandon with
  sc/ec band narrowing — PrunedDTW, exact given the final
  ``d > max_dist -> inf`` check (dtw.py:371-385, 397-398),
- use_pruning sets max_dist = ub_euclidean (dtw.py:199-203).

Implementation note (ours, not the reference's): each DP row is computed
with vectorized NumPy ops instead of a per-cell Python loop. The in-row
left-to-right dependency ``f[j] = min(h[j], (f[j-1] + penalty) +
cost[j])`` is first solved with the algebraic prefix min-plus scan
(``S + cumsum/cummin``), then VERIFIED against the recurrence and
patched sequentially where the scan's rounding differs from the
reference's sequential add order (see _minplus_scan) — so every matrix
cell is BIT-IDENTICAL to the reference's per-cell loop, including its
documented float-tie behaviors (reference tests/test_bugs.py
test_bug5_path). Residual 1-ulp cells can only come from the
reference's use of scalar ``(x-y)**2`` (libm pow), which disagrees
with the correctly-rounded ``d*d`` multiply on ~0.1% of inputs and is
not reproducible vectorized (numpy's array ``np.power`` disagrees with
scalar pow on yet other inputs). Parity is asserted in
tests/test_kernel_parity.py and tests/test_reference_bugs.py.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from ..settings import DTWSettings, EUCLIDEAN, SQEUCLIDEAN

INF = float("inf")


def _as_f64(s, allow_2d: bool = False) -> np.ndarray:
    a = np.asarray(s, dtype=np.float64)
    if a.ndim != 1 and not (allow_2d and a.ndim == 2):
        raise ValueError(f"expected 1-D series, got shape {a.shape}")
    return a


def _cost_row(v, s2: np.ndarray, inner_dist) -> np.ndarray:
    """Point-cost row; v is a scalar (1-D series) or a vector
    (multivariate series, dependent-DTW inner dist sum((x-y)^2) as in
    reference dtw_ndim.py:43-94 / innerdistance.py:80-93). Custom
    inner-dist objects (reference CustomInnerDist surface) are applied
    per point."""
    from ..settings import is_custom_inner

    if is_custom_inner(inner_dist):
        return np.array([inner_dist.inner_dist(v, x) for x in s2])
    if s2.ndim == 2:
        d = s2 - v
        if inner_dist == SQEUCLIDEAN:
            return np.einsum("ij,ij->i", d, d)
        return np.sqrt(np.einsum("ij,ij->i", d, d))
    if inner_dist == SQEUCLIDEAN:
        d = s2 - v
        return d * d
    return np.abs(s2 - v)


def _minplus_scan(
    h: np.ndarray, cost: np.ndarray, penalty: float, left0: float
) -> np.ndarray:
    """Exact f[j] = min(h[j], (f[j-1] + penalty) + cost[j]), f[-1] = left0.

    BIT-IDENTICAL to the reference's sequential per-cell recurrence
    (its add order is (left + penalty) + cost, left-to-right). The fast
    path is the algebraic prefix scan ``S + cummin(h - S)``, whose
    rounding can differ from sequential adds by an ulp — exactly the
    margin behind the reference's documented float-tie behaviors (its
    tests/test_bugs.py test_bug5_path) and the strict pruning cutoff.
    So we then VERIFY the scan against the recurrence in two vector
    ops: the sequential solution is the unique fixpoint of
    ``f[j] == min(h[j], (f[j-1]+penalty)+cost[j])`` given f[0], and
    any scan/sequential divergence must show as a first mismatching
    index, from which we recompute sequentially (measured ~0.1% of
    rows on random data — the scan's rounding almost always agrees).

    ``h`` may contain inf; ``cost`` must be finite (callers segment
    around inf step costs).
    """
    n = len(h)
    if n == 0:
        return h
    if left0 != INF:
        h = h.copy()
        v = (left0 + penalty) + cost[0] if penalty else left0 + cost[0]
        if v < h[0]:
            h[0] = v
    if n == 1:
        return h
    cpen = cost + penalty if penalty else cost
    S = np.cumsum(cpen)
    f = S + np.minimum.accumulate(h - S)
    f[0] = h[0]  # the scan's S[0] round-trip can perturb even f[0]
    if penalty:
        cand = (f[:-1] + penalty) + cost[1:]
    else:
        cand = f[:-1] + cost[1:]
    want = np.minimum(h[1:], cand)
    bad = np.flatnonzero(f[1:] != want)
    if len(bad):
        # Patch each divergent chain sequentially, stopping as soon as
        # the sequential state reconverges with the scan value (min
        # with h[j] resets chains within a few steps) AND no later
        # mismatch is pending — so total patch work is O(sum of chain
        # lengths), not O(n) per mismatch.
        nb = len(bad)
        bi = 0
        while bi < nb:
            j0 = int(bad[bi]) + 1
            prev = f[j0 - 1]
            k = j0
            while k < n:
                v = (prev + penalty) + cost[k] if penalty else prev + cost[k]
                hk = h[k]
                prev = v if v < hk else hk
                if prev == f[k] and (bi + 1 >= nb or int(bad[bi + 1]) + 1 > k):
                    break
                f[k] = prev
                k += 1
            while bi < nb and int(bad[bi]) + 1 <= k:
                bi += 1
    return f


def _row_update(
    prev: np.ndarray,
    cur: np.ndarray,
    s1i: float,
    s2: np.ndarray,
    js: int,
    je: int,
    penalty: float,
    max_step: float,
    inner_dist: str,
) -> np.ndarray:
    """Fill cur[js+1:je+1] from prev; returns the skip-mask (max_step cells).

    prev/cur are full (c+1)-length rows of the accumulated-cost matrix.
    """
    cost = _cost_row(s1i, s2[js:je], inner_dist)
    skip = cost > max_step
    e = np.minimum(prev[js:je], prev[js + 1 : je + 1] + penalty)
    if not skip.any():
        h = cost + e
        f = _minplus_scan(h, cost, penalty, cur[js])
        cur[js + 1 : je + 1] = f
    else:
        # max_step breaks the in-row chain; run the scan per finite segment.
        cur[js + 1 : je + 1] = INF
        idx = np.flatnonzero(skip)
        seg_starts = np.concatenate(([0], idx + 1))
        seg_ends = np.concatenate((idx, [je - js]))
        left = cur[js]
        for a, b in zip(seg_starts, seg_ends):
            if a >= b:
                left = INF
                continue
            h = cost[a:b] + e[a:b]
            f = _minplus_scan(h, cost[a:b], penalty, left if a == seg_starts[0] else INF)
            cur[js + a + 1 : js + b + 1] = f
            left = INF
    return skip


def _band(i: int, r: int, c: int, window: int) -> Tuple[int, int]:
    js = max(0, i - max(0, r - c) - window + 1)
    je = min(c, i + max(0, c - r) + window)
    return js, je


def ub_euclidean(s1, s2, inner_dist: str = SQEUCLIDEAN) -> float:
    """Euclidean upper bound tolerant of unequal lengths.

    Tail of the longer series is compared against the last element of the
    shorter one (reference ed.py:47-80, Silva & Batista SDM'16).
    """
    from ..settings import is_custom_inner

    s1 = _as_f64(s1, allow_2d=True)
    s2 = _as_f64(s2, allow_2d=True)
    n = min(len(s1), len(s2))
    if is_custom_inner(inner_dist):
        ub = sum(inner_dist.inner_dist(a, b) for a, b in zip(s1[:n], s2[:n]))
        if len(s1) > n:
            ub += sum(inner_dist.inner_dist(a, s2[n - 1]) for a in s1[n:])
        elif len(s2) > n:
            ub += sum(inner_dist.inner_dist(s1[n - 1], b) for b in s2[n:])
        return inner_dist.result(ub)
    # Accumulate SEQUENTIALLY (left-to-right), like the reference's
    # Python loop (ed.py:66-78) — NOT numpy pairwise summation. The
    # use_pruning cutoff compares the DP's path sum (sequential adds in
    # path order) strictly against inner_val(ub); when the optimal path
    # IS the Euclidean-bound path the two sums must be bit-equal or the
    # inf/finite decision diverges from the reference.
    if inner_dist == SQEUCLIDEAN:
        d = s1[:n] - s2[:n]
        e = d * d
        if s1.ndim > 1:
            e = e.sum(axis=1)  # per-timestep ndim inner dist (ref SquaredEuclideanNdim)
        if len(s1) > n:
            t = s1[n:] - s2[n - 1]
            tail = t * t
        elif len(s2) > n:
            t = s2[n:] - s1[n - 1]
            tail = t * t
        else:
            tail = None
        if tail is not None and np.ndim(tail) > 1:
            tail = tail.sum(axis=1)
        ub = 0.0
        for v in e.tolist():
            ub += v
        if tail is not None:
            for v in tail.tolist():
                ub += v
        return math.sqrt(ub)
    def _eu_steps(a, b):
        d = np.abs(a - b)
        if d.ndim > 1:
            # per-timestep ndim euclidean (ref EuclideanNdim): reduce the
            # dims BEFORE accumulating — the 2-D array previously reached
            # the scalar accumulation below and raised (round-5 review)
            d = np.sqrt((d * d).sum(axis=1))
        return d

    e = _eu_steps(s1[:n], s2[:n])
    if len(s1) > n:
        tail = _eu_steps(s1[n:], s2[n - 1])
    elif len(s2) > n:
        tail = _eu_steps(s2[n:], s1[n - 1])
    else:
        tail = None
    ub = 0.0
    for v in e.tolist():
        ub += v
    if tail is not None:
        for v in tail.tolist():
            ub += v
    return ub


def lb_keogh(s1, s2, settings: Optional[DTWSettings] = None) -> float:
    """LB_Keogh lower bound (reference dtw.py:266-291).

    Envelope of s2 within the window compared against s1; guarantees
    lb_keogh(s1, s2) <= dtw(s1, s2), so it is a safe pruning filter.
    """
    s = settings or DTWSettings()
    s1 = _as_f64(s1)
    s2 = _as_f64(s2)
    # None AND 0 mean unconstrained (DTWSettings contract; distance()
    # maps both via effective_window — a raw 0 made the envelope slice
    # empty and crashed, round-5 review finding)
    window = s.window if s.window else max(len(s1), len(s2))
    imin_diff = max(0, len(s1) - len(s2)) + window - 1
    imax_diff = max(0, len(s2) - len(s1)) + window
    n1 = len(s1)
    i = np.arange(n1)
    imin = np.maximum(0, i - imin_diff)
    imax = np.minimum(len(s2), i + imax_diff)
    t = 0.0
    for k in range(n1):
        seg = s2[imin[k] : imax[k]]
        u = seg.max()
        l = seg.min()
        ci = s1[k]
        if ci > u:
            t += (ci - u) ** 2 if s.inner_dist == SQEUCLIDEAN else abs(ci - u)
        elif ci < l:
            t += (l - ci) ** 2 if s.inner_dist == SQEUCLIDEAN else abs(l - ci)
    return s.result(t)


def lb_keogh_batch(query: np.ndarray, corpus: List[np.ndarray], settings: Optional[DTWSettings] = None) -> np.ndarray:
    """Vectorized LB_Keogh of one query against many candidate series."""
    return np.array([lb_keogh(query, c, settings) for c in corpus])


def _sequential_band_dp(s1, s2, s: DTWSettings, window: int) -> float:
    """Final accumulated (inner-domain) cost via a plain sequential
    band DP whose float-add order matches the reference's per-cell
    loop bit-for-bit (dtw.py:336-398 semantics; own implementation).

    Used only in the cutoff-ambiguity zone of ``distance``: the
    vectorized min-plus scan is algebraically exact but its
    ``S + cummin(h - S)`` rounding can differ from sequential adds by
    an ulp, which is exactly the margin that decides the strict
    ``d > max_dist`` pruning check. No in-DP pruning here — PrunedDTW
    with the final strict check is value-identical to the unpruned DP
    for any d <= max_dist, and both report inf otherwise.
    """
    r, c = len(s1), len(s2)
    psi_1b, psi_1e, psi_2b, psi_2e = s.split_psi()
    penalty = s.adj_penalty
    max_step = s.adj_max_step
    prev = [INF] * (c + 1)
    for j in range(min(psi_2b, c) + 1):
        prev[j] = 0.0
    psi_shortest = INF
    cur = [INF] * (c + 1)
    for i in range(r):
        for j in range(c + 1):
            cur[j] = INF
        js, je = _band(i, r, c, window)
        if psi_1b != 0 and js == 0 and i < psi_1b:
            cur[0] = 0.0
        row_costs = _cost_row(s1[i], s2[js:je], s.inner_dist)
        for j in range(js, je):
            d0 = float(row_costs[j - js])
            if d0 > max_step:
                continue
            best = min(prev[j], prev[j + 1] + penalty, cur[j] + penalty)
            if best != INF:
                cur[j + 1] = d0 + best
        if psi_1e != 0 and je == c and r - 1 - i <= psi_1e:
            psi_shortest = min(psi_shortest, cur[je])
        prev, cur = cur, prev
    ic = min(c, c + window - 1)
    if psi_1e == 0 and psi_2e == 0:
        return prev[ic]
    if psi_2e != 0:
        return min(min(prev[max(0, ic - psi_2e) : ic + 1]), psi_shortest)
    return min(prev[ic], psi_shortest)


def _prune_row(row, skip, js: int, je: int, sc: int, ec: int, max_dist, i: int):
    """Shared sc/ec pruning step for one DP row (reference
    dtw.py:366-389 semantics). ``row`` is the row buffer AFTER
    _row_update (compact ``cur`` or the full-matrix ``dtw[i + 1]``);
    cells past the break point are set to INF in place. Returns the
    updated (sc, ec). One arange serves all the index tests (the two
    previous inline copies each allocated three — round-5 review)."""
    f = row[js + 1 : je + 1]
    computed = ~skip
    good = computed & (f <= max_dist)
    bad = computed & ~good
    idx = np.arange(je - js)
    jj = idx + js
    # break at first bad cell with j >= ec
    brk = np.flatnonzero(bad & (jj >= ec))
    if len(brk):
        cut = brk[0]
        row[js + cut + 2 :] = INF
        good = good & (idx <= cut)
        bad = bad & (idx <= cut)
    good_idx = np.flatnonzero(good)
    if len(good_idx):
        first_bad_prefix = np.flatnonzero(bad & (idx < good_idx[0]))
        if len(first_bad_prefix):
            sc = js + int(first_bad_prefix[-1]) + 1
        ec = js + int(good_idx[-1]) + 1
    else:
        bad_idx = np.flatnonzero(bad)
        if len(bad_idx):
            sc = js + int(bad_idx[-1]) + 1
        ec = i
    return sc, ec



def distance(s1, s2, settings: Optional[DTWSettings] = None) -> float:
    """Banded, pruned, psi-relaxed DTW distance (two-row memory).

    Numeric parity with reference dtw.distance is asserted in tests.
    """
    s = settings or DTWSettings()
    s1 = _as_f64(s1, allow_2d=True)
    s2 = _as_f64(s2, allow_2d=True)
    r, c = len(s1), len(s2)
    if abs(r - c) > s.adj_max_length_diff:
        return INF
    window = s.effective_window(r, c)
    psi_1b, psi_1e, psi_2b, psi_2e = s.split_psi()
    penalty = s.adj_penalty
    max_step = s.adj_max_step
    max_dist = s.adj_max_dist
    if s.use_pruning and (s.max_dist is None or s.max_dist == 0):
        max_dist = s.inner_val(ub_euclidean(s1, s2, s.inner_dist))
    pruning = max_dist != INF

    prev = np.full(c + 1, INF)
    prev[: psi_2b + 1] = 0.0
    cur = np.full(c + 1, INF)
    sc = 0
    ec = 0
    psi_shortest = INF
    for i in range(r):
        cur[:] = INF
        js, je = _band(i, r, c, window)
        if sc > js:
            js = sc
        if psi_1b != 0 and js == 0 and i < psi_1b:
            cur[0] = 0.0
        if js < je:
            skip = _row_update(prev, cur, s1[i], s2, js, je, penalty, max_step, s.inner_dist)
            if pruning:
                sc, ec = _prune_row(cur, skip, js, je, sc, ec, max_dist, i)
        if psi_1e != 0 and je == c and r - 1 - i <= psi_1e:
            psi_shortest = min(psi_shortest, cur[je])
        prev, cur = cur, prev
    last = prev  # after swap, prev holds the final row
    if psi_1e == 0 and psi_2e == 0:
        d = last[min(c, c + window - 1)]
    else:
        ic = min(c, c + window - 1)
        if psi_2e != 0:
            # clamp like warping_paths / _sequential_band_dp: without
            # max(0, .) a psi_2e larger than the last column index wraps
            # the slice negative and silently drops end candidates
            # (round-5 review finding; internal consistency — the
            # reference's flat-array slice here is accidental)
            vc = last[max(0, ic - psi_2e) : ic + 1]
            d = min(float(vc.min()), psi_shortest)
        else:
            d = min(last[ic], psi_shortest)
    # STRICT cutoff, like the reference (dtw.py:397-398). With
    # use_pruning, max_dist = inner_val(ub_euclidean(..)) is the
    # sqrt->square round-trip of the sequential path sum; when the
    # round-trip rounds DOWN an ulp the reference really does return
    # inf even though DTW == the Euclidean bound — we reproduce that.
    # Within an ulp-scale window of the cutoff, the vectorized scan's
    # rounding is not authoritative: recompute d with the sequential
    # band DP whose add order matches the reference bit-for-bit.
    if max_dist and max_dist != INF and max_dist * (1.0 - 1e-9) < d < max_dist * (1.0 + 1e-9):
        d = _sequential_band_dp(s1, s2, s, window)
    if max_dist and d > max_dist:
        d = INF
    return float(s.result(d))


def warping_paths(
    s1,
    s2,
    settings: Optional[DTWSettings] = None,
    psi_neg: bool = True,
    keep_int_repr: bool = False,
) -> Tuple[float, Optional[np.ndarray]]:
    """Full (r+1)x(c+1) accumulated-cost matrix + distance.

    Mirrors reference dtw.warping_paths (dtw.py:440-535) including the
    psi-end argmin/masking behavior.
    """
    s = settings or DTWSettings()
    s1 = _as_f64(s1, allow_2d=True)
    s2 = _as_f64(s2, allow_2d=True)
    r, c = len(s1), len(s2)
    if abs(r - c) > s.adj_max_length_diff:
        return INF, None
    window = s.effective_window(r, c)
    psi_1b, psi_1e, psi_2b, psi_2e = s.split_psi()
    penalty = s.adj_penalty
    max_step = s.adj_max_step
    max_dist = s.adj_max_dist
    if s.use_pruning and (s.max_dist is None or s.max_dist == 0):
        max_dist = s.inner_val(ub_euclidean(s1, s2, s.inner_dist))
        eff_max_dist_dist_space = s.result(max_dist)
    else:
        eff_max_dist_dist_space = s.max_dist
    pruning = max_dist != INF

    dtw = np.full((r + 1, c + 1), INF)
    dtw[0, : psi_2b + 1] = 0.0
    dtw[: psi_1b + 1, 0] = 0.0
    sc = 0
    ec = 0
    for i in range(r):
        js, je = _band(i, r, c, window)
        if sc > js:
            js = sc
        if js < je:
            skip = _row_update(dtw[i], dtw[i + 1], s1[i], s2, js, je, penalty, max_step, s.inner_dist)
            # NOTE _row_update writes into dtw[i+1] but also resets the
            # full band slice; out-of-band cells keep inf, and the psi
            # boundary at column 0 was pre-set above and is never touched
            # because js+1 >= 1.
            if pruning:
                sc, ec = _prune_row(dtw[i + 1], skip, js, je, sc, ec, max_dist, i)
    if not keep_int_repr:
        with np.errstate(invalid="ignore"):
            dtw = s.result(dtw)
    ir = r
    ic = min(c, c + window - 1)
    if psi_1e == 0 and psi_2e == 0:
        d = dtw[ir, ic]
    else:
        if psi_1e != 0:
            vr = dtw[ir : max(0, ir - psi_1e - 1) : -1, ic]
            mir = int(np.argmin(vr))
            vr_mir = vr[mir]
        else:
            mir = ir
            vr_mir = INF
        if psi_2e != 0:
            vc = dtw[ir, ic : max(0, ic - psi_2e - 1) : -1]
            mic = int(np.argmin(vc))
            vc_mic = vc[mic]
        else:
            mic = ic
            vc_mic = INF
        if vr_mir < vc_mic:
            if psi_neg:
                dtw[ir : ir - mir : -1, ic] = -1
            d = vr_mir
        else:
            if psi_neg:
                dtw[ir, ic : ic - mic : -1] = -1
            d = vc_mic
    if keep_int_repr:
        if max_dist and d > max_dist:
            d = INF
    else:
        if eff_max_dist_dist_space and d > eff_max_dist_dist_space:
            d = INF
    return float(d), dtw


def warping_paths_affinity(
    s1,
    s2,
    settings: Optional[DTWSettings] = None,
    only_triu: bool = False,
    psi_neg: bool = True,
    gamma: float = 1,
    tau: float = 0,
    delta: float = 0,
    delta_factor: float = 1,
) -> Tuple[float, np.ndarray]:
    """Affinity-maximizing DP (basis of LoCo local-concurrence mining,
    reference dtw.py:577-662): cell affinity exp(-gamma (a-b)^2), cells
    below tau decay by delta/delta_factor, floor at 0. Not on the
    rollup hot path, so the DP is a plain loop (the max(0, .) clamp
    breaks the min-plus scan trick)."""
    s = settings or DTWSettings()
    s1 = _as_f64(s1)
    s2 = _as_f64(s2)
    r, c = len(s1), len(s2)
    window = s.effective_window(r, c)
    psi_1b, psi_1e, psi_2b, psi_2e = s.split_psi()
    penalty = s.penalty or 0  # raw penalty, as the reference uses here
    dtw = np.full((r + 1, c + 1), -INF)
    dtw[0, : psi_2b + 1] = 0
    dtw[: psi_1b + 1, 0] = 0
    i1 = 0
    for i in range(r):
        i0, i1 = i, i + 1
        j_start = max(0, i - max(0, r - c) - window + 1)
        if only_triu:
            j_start = max(i, j_start)
        j_end = min(c, i + max(0, c - r) + window)
        for j in range(j_start, j_end):
            d = math.exp(-gamma * (s1[i] - s2[j]) ** 2)
            prev = max(dtw[i0, j], dtw[i0, j + 1] - penalty, dtw[i1, j] - penalty)
            if d < tau:
                dtw[i1, j + 1] = max(0, delta + delta_factor * prev)
            else:
                dtw[i1, j + 1] = max(0, d + prev)
    if psi_1e == 0 and psi_2e == 0:
        dval = dtw[i1, min(c, c + window - 1)]
    else:
        ir = i1
        ic = min(c, c + window - 1)
        if psi_1e != 0:
            vr = dtw[ir : max(0, ir - psi_1e - 1) : -1, ic]
            mir = int(np.argmax(vr))
            vr_mir = vr[mir]
        else:
            mir = ir
            vr_mir = INF
        if psi_2e != 0:
            vc = dtw[ir, ic : max(0, ic - psi_2e - 1) : -1]
            mic = int(np.argmax(vc))
            vc_mic = vc[mic]
        else:
            mic = ic
            vc_mic = INF
        if vr_mir > vc_mic:
            if psi_neg:
                dtw[ir : ir - mir : -1, ic] = -1
            dval = vr_mir
        else:
            if psi_neg:
                dtw[ir, ic : ic - mic : -1] = -1
            dval = vc_mic
    return float(dval), dtw


def best_path(
    paths: np.ndarray,
    row: Optional[int] = None,
    col: Optional[int] = None,
    penalty: float = 0.0,
) -> List[Tuple[int, int]]:
    """Greedy argmin traceback, diagonal-then-up-then-left tie order
    (reference dtw.py:1121-1161); honors -1 psi-masked cells; row/col
    select an alternative start cell (subsequence alignment uses the
    match end column)."""
    i = int(paths.shape[0] - 1) if row is None else int(row)
    j = int(paths.shape[1] - 1) if col is None else int(col)
    p = []
    if paths[i, j] != -1:
        p.append((i - 1, j - 1))
    while i > 0 and j > 0:
        cands = (
            paths[i - 1, j - 1],
            paths[i - 1, j] + penalty,
            paths[i, j - 1] + penalty,
        )
        cm = min(cands)
        if cands[0] == cm:
            i, j = i - 1, j - 1
        elif cands[1] == cm:
            i = i - 1
        else:
            j = j - 1
        if paths[i, j] != -1:
            p.append((i - 1, j - 1))
    p.pop()
    p.reverse()
    return p


def warping_path(
    s1,
    s2,
    settings: Optional[DTWSettings] = None,
    include_distance: bool = False,
):
    """Best warping path via full matrix + traceback (dtw.py:975-990)."""
    d, paths = warping_paths(s1, s2, settings=settings)
    path = best_path(paths)
    if include_distance:
        return path, d
    return path


# Module-level generator for the probabilistic traceback, reseedable via
# srand() — mirrors the reference's global srand()/rand() stream model
# (dd_dtw.c:3734-3741 dtw_srand). The reference draws from libc rand(),
# which is platform-defined; bit-stream parity with the C build is
# therefore impossible BY DESIGN, so parity is semantic (valid monotone
# paths with the documented step distribution), not bit-wise.
_PROB_RNG = np.random.default_rng(1)


def srand(seed: int) -> None:
    """Seed the probabilistic-traceback RNG (reference dtw_cc.srand /
    dd_dtw.c:3734 dtw_srand: seed 0 means time-based)."""
    global _PROB_RNG
    if seed == 0:
        import time as _time

        seed = int(_time.time())
    _PROB_RNG = np.random.default_rng(seed)


def best_path_prob(
    paths: np.ndarray,
    avg: float,
    rng: Optional[np.random.Generator] = None,
) -> List[Tuple[int, int]]:
    """Sample a likely warping path from the accumulated-cost matrix.

    Reference dd_dtw.c:3759-3920 dtw_best_path_prob, re-expressed over
    the full (r+1)x(c+1) matrix (the C version walks its compact banded
    storage; out-of-band cells are +inf here, which zeroes their step
    weight exactly like the band boundary does in C). At each cell the
    three predecessor steps get weight 1/(avg + min_diff - delta) where
    delta = cell - predecessor and min_diff = max(delta, 0-clamped);
    the step is drawn from the normalized cumulative with a draw on the
    reference's 1/1000 grid (rand()%1000/1000). As avg -> 0+ the weight
    of the argmin predecessor (delta == min_diff) dominates at 1/avg,
    so the sample converges to the greedy best path.

    ``paths`` must be the keep_int_repr matrix (inner/squared domain) —
    the reference computes the prob matrix with keep_int_repr=true
    (dd_dtw.c:3957). -1-masked psi cells are skipped in the output like
    dtw_best_path_prob's `!= -1` gate.
    """
    if rng is None:
        rng = _PROB_RNG
    avg = float(avg)
    if avg == 0.0:
        avg = 1.0  # dd_dtw.c:3779 guard
    i = int(paths.shape[0] - 1)
    j = int(paths.shape[1] - 1)
    if not np.isfinite(paths[i, j]):
        return []  # infeasible alignment (band/max_dist pruned the end)
    p: List[Tuple[int, int]] = []
    while i > 0 and j > 0:
        if paths[i, j] != -1:
            p.append((i - 1, j - 1))
        prev = paths[i, j]
        with np.errstate(invalid="ignore"):
            deltas = np.array(
                [
                    prev - paths[i - 1, j - 1],  # diagonal
                    prev - paths[i, j - 1],  # left
                    prev - paths[i - 1, j],  # up
                ]
            )
        min_diff = max(float(np.max(deltas)), 0.0)
        with np.errstate(divide="ignore"):
            w = 1.0 / (avg + min_diff - deltas)  # inf predecessor -> weight 0
        total = float(w.sum())
        rnum = int(rng.integers(0, 1000)) / 1000.0
        if total <= 0.0:  # all predecessors unreachable (cannot happen
            i, j = i - 1, j - 1  # on a finite cell; defensive diagonal)
            continue
        c0 = float(w[0]) / total
        c1 = float(w[0] + w[1]) / total
        if rnum < c0:
            i, j = i - 1, j - 1
        elif rnum < c1:
            j = j - 1
        else:
            i = i - 1
    p.reverse()
    return p


def warping_path_prob(
    s1,
    s2,
    avg: float,
    settings: Optional[DTWSettings] = None,
    include_distance: bool = False,
    rng: Optional[np.random.Generator] = None,
):
    """Sample a probabilistic warping path (reference dtw.py:1041-1049
    warping_path_prob — C-only there, use_c=False raises; this is the
    portable implementation). ``avg`` sets the temperature: the order of
    magnitude of cost differences at which alternative steps become
    likely (callers typically pass distance/len(series),
    tests/test_warping.py:67).

    include_distance returns the TRUE DTW distance (distance domain,
    like warping_path); the reference's C wrapper returns -1 here
    because it computes the matrix with return_dtw=false
    (dd_dtw.c:3953-3960) — a documented artifact we do not copy.
    """
    d, paths = warping_paths(
        s1, s2, settings=settings, keep_int_repr=True, psi_neg=True
    )
    path = best_path_prob(paths, avg, rng=rng)
    if include_distance:
        s = settings or DTWSettings()
        return path, s.result(d) if np.isfinite(d) else d
    return path


def warping_path_penalty(s1, s2, penalty_post=0, settings: Optional[DTWSettings] = None):
    """Path distance with post-hoc penalty per compression/expansion
    (reference dtw.py:1064-1096): penalty_post is ADDED TO THE DTW
    DISTANCE returned by warping_paths — which includes any per-step DP
    penalty and the settings' inner distance — not to a re-summed raw
    path cost (round-5 review finding: the re-sum dropped the DP
    penalty and hardcoded squared-euclidean). Returns
    [dist, path, path_stepsize, paths] like the reference."""
    dist, paths = warping_paths(s1, s2, settings=settings)
    path = best_path(paths)
    path_stepsize = []
    for k in range(1, len(path)):
        if path[k - 1][0] + 1 != path[k][0] or path[k - 1][1] + 1 != path[k][1]:
            dist += penalty_post
        path_stepsize.append(
            paths[path[k][0] + 1, path[k][1] + 1]
            - paths[path[k - 1][0] + 1, path[k - 1][1] + 1]
        )
    return [dist, path, path_stepsize, paths]


def warping_amount(path) -> int:
    """Number of compressions/expansions along a path (dtw.py:1051-1061)."""
    n = 0
    for k in range(1, len(path)):
        if path[k][0] == path[k - 1][0] or path[k][1] == path[k - 1][1]:
            n += 1
    return n


def warp(from_s, to_s, path=None, settings: Optional[DTWSettings] = None):
    """Resample from_s onto to_s's axis by averaging path-mapped values
    (reference dtw.py:1099-1118) — the elementary align-then-average step."""
    from_s = _as_f64(from_s)
    to_s = _as_f64(to_s)
    if path is None:
        path = warping_path(from_s, to_s, settings=settings)
    sums = np.zeros(len(to_s))
    cnts = np.zeros(len(to_s), dtype=np.int64)
    for r_c, c_c in path:
        sums[c_c] += from_s[r_c]
        cnts[c_c] += 1
    return sums / cnts, path
