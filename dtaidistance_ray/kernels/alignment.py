"""Generic DP + Needleman-Wunsch global alignment (reference dp.py /
alignment.py). Token sequences ARE symbol sequences, so NW applies
directly to the int32 token arrays of the canonical table.

The traceback matrix uses a direction bitmask (1=diag, 2=up, 4=left)
instead of the reference's string concatenation; semantics (which
directions tie) are identical and asserted in parity tests.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

INF = float("inf")

DIAG, UP, LEFT = 1, 2, 4


def default_substitution(v1, v2) -> Tuple[float, float]:
    """-1 match / +1 mismatch, +1 indel — negated because dp() minimizes
    (reference alignment.py:85-99)."""
    return (-1.0 if v1 == v2 else 1.0), 1.0


def make_substitution_fn(matrix: dict, gap: float = 1.0, opt: str = "max") -> Callable:
    """Substitution fn from a dict, e.g. BLOSUM weights
    (alignment.py:103-132); falls back to the default for absent pairs."""
    modifier = -1.0 if opt == "max" else 1.0

    def fn(a, b):
        if (a, b) in matrix:
            return matrix[(a, b)] * modifier, gap
        if (b, a) in matrix:
            return matrix[(b, a)] * modifier, gap
        return default_substitution(a, b)[0], gap

    return fn


def read_substitution_matrix(path: str) -> dict:
    """Whitespace matrix file with '#' comments (BLOSUM-style), as the
    reference util.py:153-177 parses it."""
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip() and not ln.strip().startswith("#")]
    cols = lines[0].split()
    matrix = {}
    for ln in lines[1:]:
        parts = ln.split()
        row = parts[0]
        for c, v in zip(cols, parts[1:]):
            matrix[(row, c)] = float(v)
    return matrix


def dp(
    s1,
    s2,
    fn: Callable,
    border: Optional[Callable] = None,
    window: Optional[int] = None,
    max_dist: Optional[float] = None,
    max_step: Optional[float] = None,
    max_length_diff: Optional[int] = None,
    penalty: Optional[float] = None,
    psi: Optional[int] = None,
):
    """Generic minimizing DP with custom cost fn + traceback directions
    (reference dp.py:36-141): returns (cost, scores, paths_mask)."""
    r, c = len(s1), len(s2)
    if max_length_diff is not None and abs(r - c) > max_length_diff:
        return np.inf
    window = max(r, c) if window is None else window
    max_step = INF if not max_step else max_step
    max_dist = INF if not max_dist else max_dist
    penalty = 0.0 if not penalty else penalty
    psi = 0 if psi is None else psi

    scores = np.full((r + 1, c + 1), INF)
    if border:
        for ci in range(c + 1):
            scores[0, ci] = border(0, ci)
        for ri in range(1, r + 1):
            scores[ri, 0] = border(ri, 0)
    scores[0, : psi + 1] = 0
    scores[: psi + 1, 0] = 0

    paths = np.zeros((r + 1, c + 1), dtype=np.uint8)
    last_under_max_dist = 0
    i1 = 0
    for i0 in range(r):
        i1 = i0 + 1
        prev_last_under = INF if last_under_max_dist == -1 else last_under_max_dist
        last_under_max_dist = -1
        j_start = max(0, i0 - max(0, r - c) - window + 1)
        j_end = min(c, i0 + max(0, c - r) + window)
        for j0 in range(j_start, j_end):
            j1 = j0 + 1
            d, d_indel = fn(s1[i0], s2[j0])
            if d > max_step:
                d = np.inf
            if d_indel > max_step:
                d_indel = np.inf
            if d == np.inf and d_indel == np.inf:
                continue
            from_left = d_indel + scores[i1, j0] + penalty
            from_above = d_indel + scores[i0, j1] + penalty
            from_diag = d + scores[i0, j0]
            best = min(from_left, from_above, from_diag)
            scores[i1, j1] = best
            mask = 0
            if best == from_left:
                mask |= LEFT
            if best == from_above:
                mask |= UP
            if best == from_diag:
                mask |= DIAG
            paths[i1, j1] = mask
            if scores[i1, j1] <= max_dist:
                last_under_max_dist = j0
            else:
                scores[i1, j1] = np.inf
                if prev_last_under < j1:
                    break
        if max_dist != INF and last_under_max_dist == -1:
            return np.inf, scores
    if psi == 0:
        d = scores[i1, min(c, c + window - 1)]
    else:
        ir, ic = i1, min(c, c + window - 1)
        vr = scores[ir - psi : ir + 1, ic]
        vc = scores[ir, ic - psi : ic + 1]
        mir, mic = int(np.argmin(vr)), int(np.argmin(vc))
        if vr[mir] < vc[mic]:
            scores[ir - psi + mir + 1 : ir + 1, ic] = -1
            d = vr[mir]
        else:
            scores[ir, ic - psi + mic + 1 : ic + 1] = -1
            d = vc[mic]
    return d, scores, paths


def _nw_border(ri: int, ci: int) -> float:
    if ri == 0:
        return ci
    if ci == 0:
        return ri
    return 0.0


def needleman_wunsch(s1, s2, substitution: Optional[Callable] = None, **kwargs):
    """Global alignment maximizing similarity; returns (value, scores,
    paths) with value/scores negated back to similarity space
    (reference alignment.py:21-76)."""
    if substitution is None:
        substitution = default_substitution
    value, scores, paths = dp(s1, s2, fn=substitution, border=_nw_border, penalty=0, **kwargs)
    return -value, -scores, paths


def best_alignment(paths: np.ndarray, s1=None, s2=None, gap="-", order=None):
    """Optimal alignment from the paths mask; order = preference among
    (diag, up, left) as in reference alignment.py:155-197."""
    i, j = int(paths.shape[0] - 1), int(paths.shape[1] - 1)
    p = [(i - 1, j - 1)]
    ops = [(-1, -1), (-1, 0), (0, -1)]
    op_masks = [DIAG, UP, LEFT]
    if order is None:
        order = [0, 1, 2]
    while i > 0 and j > 0:
        opi, opj = next(ops[k] for k in order if paths[i, j] & op_masks[k])
        i, j = i + opi, j + opj
        p.append((i - 1, j - 1))
    while i > 0:
        i -= 1
        p.append((i - 1, j - 1))
    while j > 0:
        j -= 1
        p.append((i - 1, j - 1))
    s1a = None if s1 is None else []
    s2a = None if s2 is None else []
    s1ip, s2ip = p[0]
    for s1i, s2i in p[1:]:
        if s1i != s1ip and s2i != s2ip:
            if s1a is not None:
                s1a.append(s1[s1ip])
            if s2a is not None:
                s2a.append(s2[s2ip])
        elif s1i == s1ip:
            if s1a is not None:
                s1a.append(gap)
            if s2a is not None:
                s2a.append(s2[s2ip])
        elif s2i == s2ip:
            if s1a is not None:
                s1a.append(s1[s1ip])
            if s2a is not None:
                s2a.append(gap)
        s1ip, s2ip = s1i, s2i
    if s1a is not None:
        s1a.reverse()
    if s2a is not None:
        s2a.reverse()
    p.pop()
    p.reverse()
    return p, s1a, s2a
