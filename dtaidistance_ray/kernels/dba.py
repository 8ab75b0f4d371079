"""DBA — DTW Barycenter Averaging (Petitjean et al., 2011).

Per-group reduction kernel of the downsample stage. Semantics follow the
reference (/root/reference/src/dtaidistance/dtw_barycenter.py:168-243):
one sweep computes, for every member series, the warping path against
the current center ``c`` and accumulates the member values mapped onto
each center index; the new center is the per-index mean.

Distributed form: the accumulator is an ``(sum[t], count[t])`` pair,
which merges associatively across partitions / salt shards. When member
values are integers (our token tables), float64 sums of integers are
exact up to 2^53, so the merged result is bit-identical regardless of
partitioning — this is the partitioning-invariance guarantee the rollup
engine's tier-equality tests rely on.

Empty accumulator bins (center index never matched by any path) follow
the reference C behavior and yield 0.0 (dd_dtw.c:5513-5517; the
reference Python path would raise, C zeroes — we zero).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import numpy as np

from ..settings import DTWSettings
from .elastic import warping_path


def dba_partial(
    seqs: Iterable[np.ndarray],
    c: np.ndarray,
    settings: Optional[DTWSettings] = None,
    use_batch: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """One partition's contribution to a DBA sweep: (sum[t], count[t]).

    Dispatches to the batched vectorized DP (kernels.dba_batch) when the
    settings allow; results are bit-identical either way, INCLUDING on
    float members whose DP develops exact value ties: the batched scan
    verifies/patches each row against the sequential recurrence
    (elastic._minplus_scan fixpoint technique) and breaks traceback
    ties in sqrt space like the reference best_path, so tied cells tie
    — and resolve — identically in both kernels (regression:
    tests/test_kernel_parity.py tied-float case). ``use_batch=False``
    forces the sequential path (debugging escape)."""
    # zero-length members have no warping path and contribute nothing
    # (same exclusion as the scan path, kernels/dba_scan.py)
    seqs = [s for s in seqs if len(s) > 0]
    from .dba_batch import batch_supported, batched_dba_partial

    if len(c) == 0:
        return np.zeros(0, dtype=np.float64), np.zeros(0, dtype=np.int64)
    if seqs and use_batch and batch_supported(settings):
        return batched_dba_partial(seqs, np.asarray(c, dtype=np.float64), settings)
    t = len(c)
    sums = np.zeros(t, dtype=np.float64)
    counts = np.zeros(t, dtype=np.int64)
    for seq in seqs:
        m = warping_path(c, seq, settings=settings)
        for i, j in m:
            sums[i] += seq[j]
            counts[i] += 1
    return sums, counts


def dba_merge(partials: Iterable[Tuple[np.ndarray, np.ndarray]]) -> Tuple[np.ndarray, np.ndarray]:
    """Merge partial accumulators (associative)."""
    it = iter(partials)
    sums, counts = next(it)
    sums = sums.copy()
    counts = counts.copy()
    for s, n in it:
        sums += s
        counts += n
    return sums, counts


def dba_finalize(sums: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """New center = per-index mean; empty bins -> 0.0 (C reference behavior)."""
    out = np.zeros_like(sums)
    nz = counts > 0
    out[nz] = sums[nz] / counts[nz]
    return out


def get_good_c(
    seqs: List[np.ndarray],
    nb_initial_samples: int,
    settings: Optional[DTWSettings] = None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Informed DBA seed: sample nb_initial_samples series, return the
    medoid (min distance-matrix row-sum), reference
    dtw_barycenter.py:46-63. Takes an explicit rng (the reference uses
    the global random module; we require seedable determinism)."""
    from .elastic import distance as _dist

    rng = rng or np.random.default_rng(0)
    nb = min(nb_initial_samples, len(seqs))
    idx = rng.choice(len(seqs), size=nb, replace=False)
    cs = [seqs[int(i)] for i in idx]
    d = np.zeros((nb, nb))
    for a in range(nb):
        for b in range(a + 1, nb):
            d[a, b] = d[b, a] = _dist(cs[a], cs[b], settings)
    return cs[int(np.argmin(d.sum(axis=1)))]


def dba(
    seqs: List[np.ndarray],
    c: np.ndarray,
    settings: Optional[DTWSettings] = None,
    use_batch: bool = True,
) -> np.ndarray:
    """One full DBA sweep (single partition)."""
    return dba_finalize(*dba_partial(seqs, c, settings, use_batch=use_batch))


def dba_loop(
    seqs: List[np.ndarray],
    c: Optional[np.ndarray] = None,
    max_it: int = 10,
    thr: Optional[float] = 0.001,
    keep_averages: bool = False,
    settings: Optional[DTWSettings] = None,
    use_batch: bool = True,
):
    """Iterate DBA until max_it or mean abs change <= thr
    (reference dtw_barycenter.py:66-165, convergence at 149-160).

    Initial center defaults to the first sequence. Callers that need
    determinism under partitioning must pass ``seqs`` in a canonical
    order (the rollup stage sorts by doc_id).
    """
    if not seqs:
        raise ValueError("dba_loop requires at least one sequence")
    if c is None:
        c = np.asarray(seqs[0], dtype=np.float64)
    avgs = [] if keep_averages else None
    avg = c
    for _ in range(max_it):
        if len(c) == 0:
            break  # empty center: nothing to average into
        avg = dba(seqs, c, settings=settings, use_batch=use_batch)
        if keep_averages:
            avgs.append(avg)
        if thr is not None and c is not None:
            diff = float(np.abs(np.asarray(avg) - np.asarray(c)).sum()) / len(avg)
            if diff <= thr:
                break
        c = avg
    if keep_averages:
        return avg, avgs
    return avg
