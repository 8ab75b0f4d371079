"""Cross-group batched DBA partials for the scan-based rollup.

One vectorized DP serves ALL (member, center) pairs in a batch even
when every group has a different center: the per-row cost uses a
per-member center value C[k, i], so members of many groups co-batch.
Members are bucketed into size classes (padded R x M work area) under a
memory budget, keeping padding waste bounded.

This is the combiner-side kernel of the tier-0 downsample: a map_batches
task calls ``scan_dba_partials`` on its batch fragment; the emitted
(key, sums, counts) partial accumulators merge associatively in a tiny
keyed shuffle. Member values are integer tokens, so float64 partial
sums are exact and the merged result is bit-identical to a sequential
sweep regardless of partitioning.

Traceback choices follow the reference best_path tie order
(diag > up > left on un-penalized neighbor values, dtw.py:1148-1155),
identical to kernels.dba_batch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..settings import DTWSettings

INF = float("inf")

import os as _os

# bytes of int8 choice matrix per sub-batch; smaller budgets shrink the
# per-row DP working set toward per-core cache sizes (A/B'd in BASELINE)
_CHOICE_BUDGET = int(float(_os.environ.get("DTAIR_CHOICE_MB", "16")) * 1024 * 1024)


def _band_width(s_lens: np.ndarray, d_rs: np.ndarray, d_sr: np.ndarray, window: int) -> int:
    """Max Sakoe-Chiba band width over the chunk's members."""
    return int(np.minimum(s_lens, d_rs + d_sr + 2 * window - 1).max())


def _dp_choices_compact(
    C: np.ndarray,
    c_lens: np.ndarray,
    S: np.ndarray,
    s_lens: np.ndarray,
    window: int,
    penalty: float,
) -> Tuple[np.ndarray, int]:
    """Band-compacted batched DP: per-member diagonal coordinates.

    Row arrays hold only the band (width W = max member bandwidth), so
    they stay cache-resident — the full-width DP is memory-bandwidth
    bound. Compact cell q in D-row i is column base_k(i) + q - 1 + 1
    where base_k(i) = js_k(i-1); the shift between consecutive rows is
    0 or 1 and is absorbed by one take_along_axis gather per row.

    Returns (choice_compact (B, R+1, W+2) int8, W)."""
    B, R = C.shape
    M = S.shape[1]
    d_rs = np.maximum(0, c_lens - s_lens)
    d_sr = np.maximum(0, s_lens - c_lens)
    W = _band_width(s_lens, d_rs, d_sr, window)
    choice = np.empty((B, R + 1, W + 2), dtype=np.int8)
    Fprev = np.full((B, W + 2), INF)
    Fcur = np.empty((B, W + 2))
    Fprev[:, 0] = 0.0  # D[0, 0]
    tq = np.arange(W + 1)
    qW = np.arange(W)
    js_prev = np.zeros(B, dtype=np.int64)
    # workspaces
    t_cost = np.empty((B, W))
    t_e = np.empty((B, W))
    t_acc = np.empty((B, W))
    t_f = np.empty((B, W))
    t_ch = np.empty((B, W), dtype=np.int8)
    for i in range(R):
        js = np.maximum(0, i - d_rs - window + 1)
        je = np.minimum(s_lens, i + d_sr + window)
        width = np.maximum(je - js, 0)
        delta = js - js_prev
        G = np.take_along_axis(Fprev, tq[None, :] + delta[:, None], axis=1)
        diag = G[:, :W]
        up_nop = G[:, 1 : W + 1]
        col_idx = np.minimum(js[:, None] + qW[None, :], M - 1)
        Sg = np.take_along_axis(S, col_idx, axis=1)
        cost = t_cost
        np.subtract(Sg, C[:, i][:, None], out=cost)
        np.multiply(cost, cost, out=cost)
        e = t_e
        if penalty:
            np.add(up_nop, penalty, out=e)
            np.minimum(diag, e, out=e)
        else:
            np.minimum(diag, up_nop, out=e)
        np.add(e, cost, out=e)  # e is now h
        invalid = qW[None, :] >= width[:, None]
        e[invalid] = INF
        acc = t_acc
        if penalty:
            np.add(cost, penalty, out=cost)
        np.cumsum(cost, axis=1, out=acc)
        f = t_f
        np.subtract(e, acc, out=f)
        np.minimum.accumulate(f, axis=1, out=f)
        np.add(f, acc, out=f)
        f[invalid] = INF
        Fcur[:, 0] = INF
        Fcur[:, 1 : W + 1] = f
        Fcur[:, W + 1] = INF
        ch = t_ch
        np.less(up_nop, diag, out=ch, casting="unsafe")
        np.minimum(diag, up_nop, out=acc)
        ch[:, 1:][f[:, :-1] < acc[:, 1:]] = 2
        choice[:, i + 1, 1 : W + 1] = ch
        Fprev, Fcur = Fcur, Fprev
        js_prev = js
    return choice, W


def _traceback_compact(
    choice: np.ndarray,
    c_lens: np.ndarray,
    s_lens: np.ndarray,
    window: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized traceback over the compact choice matrix; maps D
    coordinates (i, j) to compact q = j - js_k(i-1) at each step."""
    B = choice.shape[0]
    d_rs = np.maximum(0, c_lens - s_lens)
    i = c_lens.astype(np.int64).copy()
    j = s_lens.astype(np.int64).copy()
    ks = np.arange(B)
    out_k: List[np.ndarray] = [ks.copy()]
    out_i: List[np.ndarray] = [i - 1]
    out_j: List[np.ndarray] = [j - 1]
    active = (i > 1) | (j > 1)
    while active.any():
        ka = ks[active]
        ia = i[active]
        ja = j[active]
        js_row = np.maximum(0, (ia - 1) - d_rs[ka] - window + 1)
        q = ja - js_row
        ch = choice[ka, ia, q]
        move_up = (ja == 1) | ((ia > 1) & ((ch == 0) | (ch == 1)))
        move_left = (ia == 1) | ((ja > 1) & ((ch == 0) | (ch == 2)))
        i[active] = ia - move_up
        j[active] = ja - move_left
        out_k.append(ka)
        out_i.append(i[active] - 1)
        out_j.append(j[active] - 1)
        active = (i > 1) | (j > 1)
    return np.concatenate(out_k), np.concatenate(out_i), np.concatenate(out_j)


def _dp_choices_prefix(
    C: np.ndarray,
    c_lens: np.ndarray,
    S: np.ndarray,
    s_lens: np.ndarray,
    window: int,
    penalty: float,
) -> Tuple[np.ndarray, int]:
    """Band-compacted batched DP with a SHRINKING ACTIVE PREFIX.

    Same recurrence/choice semantics as _dp_choices_compact, but the
    members must arrive sorted by center length DESCENDING: at DP row i
    only the prefix of members with c_len > i is touched, so short
    centers stop paying row work the moment their rows are done. This
    lets the caller co-batch members of very different center lengths
    in ONE call (large B amortizes the per-row numpy dispatch floor that
    dominated the old (R-class x M-class) bucketing at per-task batch
    sizes), with zero waste rows. All per-row gathers and masks run
    through preallocated buffers + flat np.take(out=) — the per-row
    allocations of the original (take_along_axis index matrices, gather
    results, masks) were measured at ~40% of kernel time at B~74.

    Per-member DP values are independent of batch composition, so the
    choice matrix (and traceback) is bit-identical to
    _dp_choices_compact for every member."""
    B, R = C.shape
    M = S.shape[1]
    d_rs = np.maximum(0, c_lens - s_lens)
    d_sr = np.maximum(0, s_lens - c_lens)
    W = _band_width(s_lens, d_rs, d_sr, window)
    # active prefix per row: members with c_len > i (c_lens sorted desc)
    act = np.searchsorted(-c_lens, -np.arange(1, R + 1), side="right")
    choice = np.empty((B, R + 1, W + 2), dtype=np.int8)
    Fprev = np.full((B, W + 2), INF)
    Fcur = np.empty((B, W + 2))
    Fprev[:, 0] = 0.0
    tq = np.arange(W + 1)
    qW = np.arange(W)
    js_prev = np.zeros(B, dtype=np.int64)
    rowoff_F = np.arange(B, dtype=np.int64) * (W + 2)
    rowoff_S = np.arange(B, dtype=np.int64) * M
    # preallocated per-row workspaces (flat-take gathers: no per-row allocs)
    idxG = np.empty((B, W + 1), dtype=np.int64)
    Gbuf = np.empty((B, W + 1))
    colb = np.empty((B, W), dtype=np.int64)
    Sgb = np.empty((B, W))
    inv = np.empty((B, W), dtype=bool)
    t_cost = np.empty((B, W))
    t_e = np.empty((B, W))
    t_acc = np.empty((B, W))
    t_f = np.empty((B, W))
    t_ch = np.empty((B, W), dtype=np.int8)
    S_flat = S.reshape(-1)
    for i in range(R):
        n = int(act[i])
        if n == 0:
            break
        js = np.maximum(0, i - d_rs[:n] - window + 1)
        je = np.minimum(s_lens[:n], i + d_sr[:n] + window)
        width = np.maximum(je - js, 0)
        delta = js - js_prev[:n]
        ig = idxG[:n]
        np.add(tq[None, :], delta[:, None], out=ig)
        ig += rowoff_F[:n, None]
        G = Gbuf[:n]
        np.take(Fprev.reshape(-1), ig, out=G)
        diag = G[:, :W]
        up_nop = G[:, 1 : W + 1]
        cb = colb[:n]
        np.add(js[:, None], qW[None, :], out=cb)
        np.minimum(cb, M - 1, out=cb)
        cb += rowoff_S[:n, None]
        Sg = Sgb[:n]
        np.take(S_flat, cb, out=Sg)
        cost = t_cost[:n]
        np.subtract(Sg, C[:n, i][:, None], out=cost)
        np.multiply(cost, cost, out=cost)
        e = t_e[:n]
        if penalty:
            np.add(up_nop, penalty, out=e)
            np.minimum(diag, e, out=e)
        else:
            np.minimum(diag, up_nop, out=e)
        np.add(e, cost, out=e)
        iv = inv[:n]
        np.greater_equal(qW[None, :], width[:, None], out=iv)
        np.copyto(e, INF, where=iv)
        acc = t_acc[:n]
        if penalty:
            np.add(cost, penalty, out=cost)
        np.cumsum(cost, axis=1, out=acc)
        f = t_f[:n]
        np.subtract(e, acc, out=f)
        np.minimum.accumulate(f, axis=1, out=f)
        np.add(f, acc, out=f)
        np.copyto(f, INF, where=iv)
        Fcur[:n, 0] = INF
        Fcur[:n, 1 : W + 1] = f
        Fcur[:n, W + 1] = INF
        ch = t_ch[:n]
        np.less(up_nop, diag, out=ch, casting="unsafe")
        np.minimum(diag, up_nop, out=acc)
        lt = inv[:n, : W - 1]
        np.less(f[:, :-1], acc[:, 1:], out=lt)
        np.copyto(ch[:, 1:], np.int8(2), where=lt)
        choice[:n, i + 1, 1 : W + 1] = ch
        Fprev, Fcur = Fcur, Fprev
        js_prev[:n] = js
    return choice, W


def _dp_choices(
    C: np.ndarray,
    c_lens: np.ndarray,
    S: np.ndarray,
    s_lens: np.ndarray,
    window: Optional[int],
    penalty: float,
) -> np.ndarray:
    """Batched DP over (B) pairs with per-member centers (full-width
    layout; used when no window bands the matrix).

    C (B, R) padded centers, S (B, M) padded members; returns the int8
    choice matrix (B, R+1, M+1). Rows beyond a member's center length
    are computed but never read by its traceback.

    window must be None: every windowed call routes to the compact /
    shrinking-prefix kernels in scan_dba_partials (its own comment at
    the call site), so a banded arm here would be dead code that must
    be kept bit-consistent for no benefit (round-5 review finding)."""
    if window is not None:
        raise AssertionError("_dp_choices is the full-matrix DP; windowed "
                             "calls use the compact kernels")
    B, R = C.shape
    M = S.shape[1]
    col = np.arange(M)
    choice = np.empty((B, R + 1, M + 1), dtype=np.int8)
    prev = np.full((B, M + 1), INF)
    cur = np.full((B, M + 1), INF)
    prev[:, 0] = 0.0
    d_rs = np.zeros(B, dtype=np.int64)
    d_sr = np.zeros(B, dtype=np.int64)
    wdefault = int(max(R, M))
    # preallocated row workspaces (reused every row: the DP is
    # memory-bandwidth bound, so temporaries are the enemy)
    t_cost = np.empty((B, M))
    t_e = np.empty((B, M))
    t_acc = np.empty((B, M))
    t_f = np.empty((B, M))
    t_chd = np.empty((B, M), dtype=np.int8)
    for i in range(R):
        js = np.maximum(0, i - d_rs - wdefault + 1)
        je = np.minimum(s_lens, i + d_sr + wdefault)
        # restrict all row ops to the chunk's union band [lo, hi) —
        # with a narrow Sakoe-Chiba window this skips most columns
        lo = int(js.min())
        hi = int(je.max())
        if lo >= hi:
            cur[:, :] = INF
            choice[:, i + 1, :] = 0
            prev, cur = cur, prev
            continue
        w = hi - lo
        csl = col[lo:hi]
        invalid = (csl[None, :] < js[:, None]) | (csl[None, :] >= je[:, None])
        cost = t_cost[:, :w]
        np.subtract(S[:, lo:hi], C[:, i][:, None], out=cost)
        np.multiply(cost, cost, out=cost)
        diag = prev[:, lo:hi]
        up_nop = prev[:, lo + 1 : hi + 1]
        e = t_e[:, :w]
        if penalty:
            np.add(up_nop, penalty, out=e)
            np.minimum(diag, e, out=e)
        else:
            np.minimum(diag, up_nop, out=e)
        # h = valid ? cost + e : INF  (reuse e as h)
        np.add(e, cost, out=e)
        e[invalid] = INF
        # in-row min-plus scan: f = Ssum + cummin(h - Ssum)
        acc = t_acc[:, :w]
        if penalty:
            np.add(cost, penalty, out=cost)  # cost becomes cpen
        np.cumsum(cost, axis=1, out=acc)  # acc = Ssum
        f = t_f[:, :w]
        np.subtract(e, acc, out=f)
        np.minimum.accumulate(f, axis=1, out=f)
        np.add(f, acc, out=f)
        f[invalid] = INF
        cur[:, :lo + 1] = INF
        cur[:, lo + 1 : hi + 1] = f
        cur[:, hi + 1 :] = INF
        # traceback direction, un-penalized neighbor values (reference
        # best_path default), diag > up > left tie preference
        ch = t_chd[:, :w]
        np.less(up_nop, diag, out=ch, casting="unsafe")  # 0=diag, 1=up
        np.minimum(diag, up_nop, out=acc)  # acc reused: best of diag/up
        # left neighbor (f[j-1]) strictly smaller -> 2; the band's first
        # column's left neighbor is the INF boundary, never smaller
        ch[:, 1:][f[:, :-1] < acc[:, 1:]] = 2
        choice[:, i + 1, lo + 1 : hi + 1] = ch
        prev, cur = cur, prev
    return choice


def _batched_traceback(
    choice: np.ndarray, c_lens: np.ndarray, s_lens: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Walk all members' paths simultaneously (vectorized gather steps).

    Returns flat (member_idx, center_idx, seq_idx) arrays over every
    path point of every member (order irrelevant: accumulation sums are
    integer-exact / per-bin)."""
    B = choice.shape[0]
    i = c_lens.astype(np.int64).copy()
    j = s_lens.astype(np.int64).copy()
    max_steps = int((c_lens + s_lens).max())
    ks = np.arange(B)
    out_k: List[np.ndarray] = []
    out_i: List[np.ndarray] = []
    out_j: List[np.ndarray] = []
    out_k.append(ks.copy())
    out_i.append(i - 1)
    out_j.append(j - 1)
    active = (i > 1) | (j > 1)
    while active.any():
        ka = ks[active]
        ia = i[active]
        ja = j[active]
        ch = choice[ka, ia, ja]
        move_up = (ja == 1) | ((ia > 1) & ((ch == 0) | (ch == 1)))
        move_left = (ia == 1) | ((ja > 1) & ((ch == 0) | (ch == 2)))
        i[active] = ia - move_up
        j[active] = ja - move_left
        out_k.append(ka)
        out_i.append(i[active] - 1)
        out_j.append(j[active] - 1)
        active = (i > 1) | (j > 1)
    return np.concatenate(out_k), np.concatenate(out_i), np.concatenate(out_j)


def _sweep_width_plan(
    group_keys,
    seqs,
    centers,
    window: int,
    penalty: float,
    idx,
    slot_base: np.ndarray,
    big_sums: np.ndarray,
    big_counts: np.ndarray,
    total: int,
) -> None:
    """Width-bucketed batching for the shrinking-prefix DP.

    The row-op width of the compact DP is the chunk's max band width W,
    so members are bucketed by a 4/3 ladder on their OWN band width
    (one wide member would otherwise widen every row of the chunk) and
    sorted by center length descending inside the bucket — the
    _dp_choices_prefix contract. That collapses the old
    (center-class x member-class) cross-product (~40 chunks of B~74 at
    per-task fragment sizes; per-row numpy dispatch dominated) into a
    handful of big-B chunks with zero waste rows.

    ``slot_base[n]`` is the flat accumulation offset of idx[n]'s bin 0
    in (big_sums, big_counts): the GROUP's slot when the caller wants
    direct group accumulation (order-free exact — integer members), or
    idx[n]'s own PER-MEMBER slot when the caller needs the
    batching-independent member-ordered fold (float members)."""
    ids = np.asarray(idx, dtype=np.int64)
    c_len = np.array([len(centers[group_keys[k]]) for k in ids], dtype=np.int64)
    s_len = np.array([len(seqs[k]) for k in ids], dtype=np.int64)
    wid = np.minimum(s_len, np.abs(c_len - s_len) + 2 * window - 1)
    # Ladder on band width. The per-call fixed cost is the row loop:
    # ~#buckets x r_max numpy-dispatch rows, INDEPENDENT of B — at
    # small B (upper-tier promotion fragments: tens to a few hundred
    # members) a fine ladder's dispatch floor dominates the useful
    # work, so the ladder coarsens as B shrinks (padding waste grows
    # with W_class/wid, but wasted lane-floats are ~100x cheaper than
    # dispatched rows). Per-member DP values are ladder-independent
    # (band masks are per-member), so this changes no result bit —
    # asserted across ladder settings in tests/test_rollup.py.
    n_ids = len(ids)
    if n_ids <= 128:
        factor = (64, 1)  # effectively one bucket
    elif n_ids <= 1024:
        factor = (4, 1)  # coarse: ~2-3 buckets
    else:
        factor = (4, 3)  # fine 4/3 ladder (tier-0 sweep fragments)
    ladder = [8]
    while ladder[-1] < int(wid.max()):
        ladder.append((ladder[-1] * factor[0] + factor[0] - 2) // factor[1])
    ladder_arr = np.array(ladder, dtype=np.int64)
    wclass = ladder_arr[np.searchsorted(ladder_arr, wid, side="left")]
    order = np.lexsort((-c_len, wclass))
    wc_sorted = wclass[order]
    cuts = np.flatnonzero(np.diff(wc_sorted)) + 1
    for seg in np.split(order, cuts):
        # seg: one width bucket, center length descending
        pos = 0
        nseg = len(seg)
        while pos < nseg:
            r_max = int(c_len[seg[pos]])
            w_cap = int(wid[seg[pos:]].max())  # upper bound for budget calc
            bmax = max(1, _CHOICE_BUDGET // ((r_max + 1) * (w_cap + 2)))
            chunk = seg[pos : pos + bmax]
            pos += len(chunk)
            B = len(chunk)
            M = int(s_len[chunk].max())
            C = np.zeros((B, r_max), dtype=np.float64)
            S = np.zeros((B, M), dtype=np.float64)
            c_lens = c_len[chunk]
            s_lens = s_len[chunk]
            slot_off = slot_base[chunk]
            for b, p in enumerate(chunk):
                k = int(ids[p])
                g = group_keys[k]
                c = centers[g]
                x = seqs[k]
                C[b, : len(c)] = c
                S[b, : len(x)] = x
            choice, _W = _dp_choices_prefix(C, c_lens, S, s_lens, window, penalty)
            fk, fi, fj = _traceback_compact(choice, c_lens, s_lens, window)
            flat_idx = slot_off[fk] + fi
            vals = S[fk, fj]
            big_sums += np.bincount(flat_idx, weights=vals, minlength=total)
            big_counts += np.bincount(flat_idx, minlength=total)


def scan_dba_partials(
    group_keys: Sequence,
    seqs: List[np.ndarray],
    centers: Dict,
    settings: Optional[DTWSettings] = None,
    order_free: bool = False,
) -> Dict:
    """Partial DBA accumulators for one batch fragment.

    group_keys[k] is the (hashable) group key of seqs[k]; centers maps
    key -> center array. Returns key -> (sums, counts). Only groups
    present in ``centers`` are swept (inactive/converged groups skip).

    Both paths use the width-bucketed shrinking-prefix DP when a window
    is set (per-member DP values and paths are independent of batch
    composition — asserted bit-identical in tests/test_rollup.py); they
    differ only in HOW path bins accumulate:

    order_free=True — the caller guarantees member values are exact in
    any accumulation order (integer-valued tokens — tier-0 sweeps):
    bins accumulate straight into the group slots (cheapest).

    order_free=False — float members (upper-tier promote over tier
    representatives): each member's path bins accumulate into its OWN
    slot first (bit-deterministic regardless of batching), then members
    fold into their group in canonical idx order. Any two calls with
    the same per-group member lists produce IDENTICAL bits, so the
    staged, fused, exchange and single-process-oracle promotion paths
    agree exactly whatever their task sharding."""
    s = settings or DTWSettings()
    window = s.window if s.window else None
    penalty = s.adj_penalty

    # collect active members with their per-member centers; zero-length
    # members have no warping path (contribute nothing) and zero-length
    # centers have no bins to fill — both would wedge the batched
    # traceback (an empty member can never step), so they are excluded
    # up front while their groups still report (empty) accumulators
    idx = [
        k
        for k, g in enumerate(group_keys)
        if g in centers and len(seqs[k]) > 0 and len(centers[g]) > 0
    ]
    out: Dict = {}
    for k, g in enumerate(group_keys):
        if g in centers and g not in out:
            c = centers[g]
            out[g] = (np.zeros(len(c), dtype=np.float64), np.zeros(len(c), dtype=np.int64))
    if not idx:
        return out

    # size classes by CENTER length only (1.25x ladder): the row-loop
    # count per call is then bounded by the ladder sum (~1.5 * max R)
    # independent of how members' lengths scatter, which keeps the
    # per-row Python dispatch floor amortized even on small batch
    # fragments. Member lengths within a class just set that class's
    # padded M; the per-member Sakoe-Chiba bands (and the banded union
    # row slice) bound the actual computed area.
    def size_class(x: int) -> int:
        n = 16
        while n < x:
            n = (n * 5 + 3) // 4
        return n

    def m_class(x: int) -> int:  # coarse member ladder (4x)
        n = 16
        while n < x:
            n *= 4
        return n

    # flat accumulator layout: one big (sum, count) vector with a slot
    # range per group; integer member values make the bincount sums
    # exact in any order
    group_list = list(out.keys())
    group_slot = {g: n for n, g in enumerate(group_list)}
    offsets = np.zeros(len(group_list) + 1, dtype=np.int64)
    for n, g in enumerate(group_list):
        offsets[n + 1] = offsets[n] + len(centers[g])
    total = int(offsets[-1])

    use_compact = window is not None
    if order_free and use_compact:
        big_sums = np.zeros(total, dtype=np.float64)
        big_counts = np.zeros(total, dtype=np.int64)
        ids = np.asarray(idx, dtype=np.int64)
        slot_base = np.array(
            [offsets[group_slot[group_keys[int(k)]]] for k in ids], dtype=np.int64
        )
        _sweep_width_plan(
            group_keys, seqs, centers, window, penalty,
            idx, slot_base, big_sums, big_counts, total,
        )
        for n, g in enumerate(group_list):
            s_, c_ = out[g]
            s_ += big_sums[offsets[n] : offsets[n + 1]]
            c_ += big_counts[offsets[n] : offsets[n + 1]]
        return out

    if use_compact:
        # FLOAT members (upper-tier promote): accumulate each member's
        # path bins into its OWN slot (bit-deterministic — a member's
        # path and per-bin sums are independent of batch composition),
        # then fold members into their group in canonical idx order.
        # Result: identical bits under ANY batching/sharding plan, so
        # the staged, fused, exchange and single-process-oracle paths
        # all agree exactly (the old per-chunk group bincount made
        # upper-tier reprs ULP-sensitive to shard composition). Memory:
        # one f64+i64 vector per ACTIVE member (sum of its group's
        # center lengths) — promotion calls are key-space sized.
        ids = np.asarray(idx, dtype=np.int64)
        mem_off = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(
            [len(centers[group_keys[int(k)]]) for k in ids], out=mem_off[1:]
        )
        mem_total = int(mem_off[-1])
        mem_sums = np.zeros(mem_total, dtype=np.float64)
        mem_counts = np.zeros(mem_total, dtype=np.int64)
        _sweep_width_plan(
            group_keys, seqs, centers, window, penalty,
            idx, mem_off[:-1], mem_sums, mem_counts, mem_total,
        )
        for n, k in enumerate(ids):  # ascending member order per group
            s_, c_ = out[group_keys[int(k)]]
            s_ += mem_sums[mem_off[n] : mem_off[n + 1]]
            c_ += mem_counts[mem_off[n] : mem_off[n + 1]]
        return out

    # window=None fallback (full-matrix DP). order_free=True (integer
    # members) keeps the per-GROUP slot layout — exact in any order and
    # bounded by the key space, not the member count; order_free=False
    # (float members) uses the member-slot + canonical-fold layout for
    # batching independence (promotion calls are key-space sized, so
    # the per-member memory is bounded there).
    ids = np.asarray(idx, dtype=np.int64)
    if order_free:
        mem_off = None
        mem_total = total
        mem_sums = np.zeros(total, dtype=np.float64)
        mem_counts = np.zeros(total, dtype=np.int64)
        mem_base = {
            int(k): offsets[group_slot[group_keys[int(k)]]] for k in ids
        }
    else:
        mem_off = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum([len(centers[group_keys[int(k)]]) for k in ids], out=mem_off[1:])
        mem_total = int(mem_off[-1])
        mem_sums = np.zeros(mem_total, dtype=np.float64)
        mem_counts = np.zeros(mem_total, dtype=np.int64)
        mem_base = {int(k): mem_off[n] for n, k in enumerate(ids)}

    classes: Dict[Tuple[int, int], List[int]] = {}
    for k in idx:
        r = size_class(len(centers[group_keys[k]]))
        classes.setdefault((r, m_class(len(seqs[k]))), []).append(k)

    for (R, _mc), members in classes.items():
        M = max(len(seqs[k]) for k in members)
        per_member_bytes = (R + 1) * (M + 1)
        bmax = max(1, _CHOICE_BUDGET // per_member_bytes)
        # longest members first so each sub-chunk's padded M is tight
        members = sorted(members, key=lambda k: -len(seqs[k]))
        for lo in range(0, len(members), bmax):
            chunk = members[lo : lo + bmax]
            B = len(chunk)
            M = max(len(seqs[k]) for k in chunk)
            C = np.zeros((B, R), dtype=np.float64)
            S = np.zeros((B, M), dtype=np.float64)
            c_lens = np.empty(B, dtype=np.int64)
            s_lens = np.empty(B, dtype=np.int64)
            slot_off = np.empty(B, dtype=np.int64)
            for b, k in enumerate(chunk):
                g = group_keys[k]
                c = centers[g]
                x = seqs[k]
                C[b, : len(c)] = c
                S[b, : len(x)] = x
                c_lens[b] = len(c)
                s_lens[b] = len(x)
                slot_off[b] = mem_base[int(k)]
            # both compact paths returned above, so this is always the
            # full-matrix (window=None) DP
            choice = _dp_choices(C, c_lens, S, s_lens, window, penalty)
            fk, fi, fj = _batched_traceback(choice, c_lens, s_lens)
            flat_idx = slot_off[fk] + fi
            vals = S[fk, fj]
            mem_sums += np.bincount(flat_idx, weights=vals, minlength=mem_total)
            mem_counts += np.bincount(flat_idx, minlength=mem_total)

    if order_free:  # group-slot layout: copy slot ranges straight out
        for n, g in enumerate(group_list):
            s_, c_ = out[g]
            s_ += mem_sums[offsets[n] : offsets[n + 1]]
            c_ += mem_counts[offsets[n] : offsets[n + 1]]
    else:
        for n, k in enumerate(ids):  # ascending member order per group
            s_, c_ = out[group_keys[int(k)]]
            s_ += mem_sums[mem_off[n] : mem_off[n + 1]]
            c_ += mem_counts[mem_off[n] : mem_off[n + 1]]
    return out
