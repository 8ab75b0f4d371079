"""Condensed distance-matrix index math (reference dtw.py:853-947).

The condensed (compact) layout stores the upper triangle (optionally
restricted to a block) as a 1-D array; these utilities mirror the
reference's index bookkeeping exactly (parity-tested against the cases
in the reference's tests/test_dtw.py:12-50) and drive our tile planner.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def complete_block(block, n: int) -> Tuple[int, int, int, int, bool]:
    """Normalize a block spec to (rb, re, cb, ce, triu).

    Reference _complete_block semantics (dtw.py:887-901): triu is
    disabled ONLY by ``block[2] is False`` (a falsy 0/None keeps the
    upper triangle), and column ranges clamp to n at use — both fixed
    to match in round 5 (review finding: a 0 flag flipped to the full
    rectangle and unclamped columns indexed past the corpus)."""
    if block is None or block == 0:
        return 0, n, 0, n, True
    (rb, re_), (cb, ce) = block[0], block[1]
    triu = not (len(block) > 2 and block[2] is False)
    return rb, re_, cb, min(n, ce), triu


def distance_matrix_length(block, n: int) -> int:
    """Number of condensed entries for pairs i<j within the block
    (reference _distance_matrix_length, dtw.py:928-947)."""
    rb, re_, cb, ce, triu = complete_block(block, n)
    if not triu:
        return (re_ - rb) * max(0, ce - cb)
    length = 0
    for r in range(rb, re_):
        cbp = max(cb, r + 1)
        if ce > cbp:
            length += ce - cbp
    return length


def distance_matrix_idxs(block, n: int):
    """(i_idx, j_idx) arrays of the pairs in condensed order."""
    rb, re_, cb, ce, triu = complete_block(block, n)
    out_i, out_j = [], []
    for r in range(rb, re_):
        cbp = max(cb, r + 1) if triu else cb
        for c in range(cbp, ce):
            out_i.append(r)
            out_j.append(c)
    return np.array(out_i, dtype=np.int64), np.array(out_j, dtype=np.int64)


def distance_array_index(a: int, b: int, n: int) -> int:
    """Condensed index of pair (a, b) in the full n-series triangle
    (reference distance_array_index, dtw.py:887-895)."""
    if a == b:
        raise ValueError("No distance between identical series")
    if a > b:
        a, b = b, a
    return int(a * n - a * (a + 1) // 2 + (b - a - 1))


def condensed_to_matrix(dists: np.ndarray, n: int, block=None) -> np.ndarray:
    """Condensed -> full symmetric matrix: inf off-block, 0 diagonal
    (reference distances_array_to_matrix, dtw.py:831-850)."""
    m = np.full((n, n), np.inf)
    i_idx, j_idx = distance_matrix_idxs(block, n)
    m[i_idx, j_idx] = dists
    m[j_idx, i_idx] = dists
    np.fill_diagonal(m, 0.0)
    return m
