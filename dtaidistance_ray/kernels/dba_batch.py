"""Batched DBA sweep: one vectorized DP over all members vs one center.

The per-group DBA sweep computes warping paths of the SAME center
against many member series. Instead of B independent (r x m) dynamic
programs (each paying per-row Python overhead), this kernel runs ONE
batched DP: every row update is a handful of NumPy ops on (B, M)
matrices — the row-wise min-plus scan of kernels.elastic generalized
over a batch axis. Members of different lengths are padded to M and
masked by per-member Sakoe-Chiba bands, so results are identical to the
sequential kernel (asserted in tests/test_kernel_parity.py).

Memory: the DP keeps only two rolling rows; the traceback needs just an
int8 choice matrix (argmin direction, diag-then-up-then-left tie order
matching the reference best_path with its default penalty=0 walk,
dtw.py:1148-1155, compared in SQRT space as the reference does).
Buffers are reused across calls via a module-level workspace — the
"warm DTW cost-matrix buffer" actor state of the north star (actors
call these kernels, each actor process gets its own workspace).

Exactness: each scan row is refined to the sequential-recurrence
fixpoint (vectorized relaxation over a shrinking active-row set), so
every DP cell — and therefore every warping path, including tied-float
choices — is bit-identical to the sequential kernel and the reference.
Cost: free-ish for integer-valued inputs (the scan is already exact,
one verification sweep detects it), ~2-3x the raw scan on float inputs
whose rows carry ULP-perturbed chains (measured 0.85 -> 2.5 s per
512-member sweep at M=256). The flagship hot path uses kernels/dba_scan
(its own deterministic contract), not this kernel, so the trade buys
reference exactness where it matters without touching bench numbers.

Supported settings: window, penalty (the DBA defaults); psi / max_step
/ max_dist fall back to the sequential kernel.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..settings import DTWSettings, SQEUCLIDEAN

INF = float("inf")


def batch_supported(settings: Optional[DTWSettings]) -> bool:
    s = settings or DTWSettings()
    return (
        s.psi in (None, 0)
        and s.max_step is None
        and s.max_dist is None
        and not s.use_pruning
        and s.inner_dist == SQEUCLIDEAN
    )


class _Workspace:
    """Grow-only scratch buffers reused across groups (per process)."""

    def __init__(self):
        self.choice = np.empty((0, 0, 0), dtype=np.int8)
        self.S = np.empty((0, 0), dtype=np.float64)

    def get(self, B: int, r: int, M: int):
        if (
            self.choice.shape[0] < B
            or self.choice.shape[1] < r + 1
            or self.choice.shape[2] < M + 1
        ):
            shape = (
                max(B, self.choice.shape[0]),
                max(r + 1, self.choice.shape[1]),
                max(M + 1, self.choice.shape[2]),
            )
            self.choice = np.empty(shape, dtype=np.int8)
        if self.S.shape[0] < B or self.S.shape[1] < M:
            self.S = np.empty(
                (max(B, self.S.shape[0]), max(M, self.S.shape[1])), dtype=np.float64
            )
        return self.choice, self.S


_WS = _Workspace()


def batched_traceback_choices(
    c: np.ndarray,
    seqs: List[np.ndarray],
    settings: Optional[DTWSettings] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched DP emitting (choice, final_row, lengths).

    choice[k, i, j] in {0: diag, 1: up, 2: left} for matrix cell (i, j);
    final_row[k, j] is the last DP row (cost space) for distances."""
    s = settings or DTWSettings()
    B = len(seqs)
    r = len(c)
    lens = np.array([len(x) for x in seqs], dtype=np.int64)
    M = int(lens.max())
    choice_buf, S_buf = _WS.get(B, r, M)
    choice = choice_buf[:B, : r + 1, : M + 1]
    S = S_buf[:B, :M]
    S[:] = 0.0
    for k, x in enumerate(seqs):
        S[k, : len(x)] = x
    penalty = s.adj_penalty
    window = s.window if s.window else None
    col = np.arange(M)

    prev = np.full((B, M + 1), INF)
    cur = np.empty((B, M + 1))
    prev[:, 0] = 0.0
    if window is None:
        valid_all = col[None, :] < lens[:, None]
    for i in range(r):
        if window is None:
            valid = valid_all
        else:
            js = np.maximum(0, i - np.maximum(0, r - lens) - window + 1)
            je = np.minimum(lens, i + np.maximum(0, lens - r) + window)
            valid = (col[None, :] >= js[:, None]) & (col[None, :] < je[:, None])
        diff = S - c[i]
        cost = diff * diff
        diag = prev[:, :M]
        up = prev[:, 1:] + penalty
        e = np.minimum(diag, up)
        h = np.where(valid, cost + e, INF)
        cpen = cost + penalty
        # in-row left chain: f[j] = min(h[j], (f[j-1]+penalty)+cost[j])
        # — algebraic prefix min-plus scan (cumsum + running min), then
        # VERIFIED against the sequential recurrence and patched where
        # the scan's rounding differs (same fixpoint technique as
        # kernels/elastic._minplus_scan) so every DP cell is
        # BIT-identical to the sequential/reference recurrence — tied
        # float cells tie in both kernels.
        Ssum = np.cumsum(cpen, axis=1)
        f = Ssum + np.minimum.accumulate(h - Ssum, axis=1)
        f = np.where(valid, f, INF)
        f[:, 0] = h[:, 0]  # no left neighbor at j=0; scan can perturb it
        # Refine to the sequential fixpoint by iterating the relaxation
        # f[j] <- min(h[j], (f[j-1]+penalty)+cost[j]) (reference add
        # order) until stable. Column 0 is pinned to h[0], so after at
        # most M sweeps every value is an h-rooted chain evaluated
        # left-to-right — the unique sequential solution — and in
        # practice the ULP-perturbed scan start converges in a few
        # sweeps (each sweep is 2-3 vector ops over the batch).
        inval = ~valid[:, 1:]
        active = np.arange(B)
        for _ in range(M):
            sub = f[active]
            if penalty:
                cand = (sub[:, :-1] + penalty) + cost[active, 1:]
            else:
                cand = sub[:, :-1] + cost[active, 1:]
            nf = np.minimum(h[active, 1:], cand)
            nf[inval[active]] = INF
            changed = ~(nf == sub[:, 1:]).all(axis=1)
            if not changed.any():
                break
            # rows are independent chains: a converged row stays
            # converged, so only still-changing rows re-sweep
            active = active[changed]
            f[active, 1:] = nf[changed]
        cur[:, 0] = INF
        cur[:, 1:] = f
        # traceback direction: the reference best_path compares the
        # SQRT-space paths matrix (warping_paths applies sqrt per
        # cell) with un-penalized neighbors and diag > up > left tie
        # preference — compare sqrt values so near-ties that collapse
        # to equality after sqrt resolve identically
        up_nop = prev[:, 1:]
        left_nop = np.empty_like(f)
        left_nop[:, 0] = INF
        left_nop[:, 1:] = f[:, :-1]
        sd = np.sqrt(diag)
        su = np.sqrt(up_nop)
        sl = np.sqrt(left_nop)
        ch = np.where(su < sd, 1, 0).astype(np.int8)
        best_du = np.minimum(sd, su)
        choice[:, i + 1, 1:] = np.where(sl < best_du, 2, ch)
        prev, cur = cur, prev
    return choice, prev, lens


def batched_dba_partial(
    seqs: List[np.ndarray],
    c: np.ndarray,
    settings: Optional[DTWSettings] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(sum[t], count[t]) accumulators for one DBA sweep, batched DP.

    Accumulation is member-major in input order, matching the
    sequential kernel bit-for-bit (float adds happen in the same
    order)."""
    c = np.asarray(c, dtype=np.float64)
    t = len(c)
    sums = np.zeros(t, dtype=np.float64)
    counts = np.zeros(t, dtype=np.int64)
    if not seqs:
        return sums, counts
    choice, _, lens = batched_traceback_choices(c, seqs, settings)
    for k, seq in enumerate(seqs):
        i, j = t, int(lens[k])
        path_i = [i - 1]
        path_j = [j - 1]
        while i > 1 or j > 1:
            ch = choice[k, i, j]
            if i == 1:
                j -= 1
            elif j == 1:
                i -= 1
            elif ch == 0:
                i -= 1
                j -= 1
            elif ch == 1:
                i -= 1
            else:
                j -= 1
            path_i.append(i - 1)
            path_j.append(j - 1)
        pi = np.array(path_i[::-1], dtype=np.int64)
        pj = np.array(path_j[::-1], dtype=np.int64)
        # member-major, path order (reversed walk == forward path order)
        np.add.at(sums, pi, np.asarray(seq, dtype=np.float64)[pj])
        np.add.at(counts, pi, 1)
    return sums, counts
