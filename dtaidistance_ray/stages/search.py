"""Subsequence / k-NN search over series collections.

Reference shapes (subsequence/subsequencesearch.py:140-301 and
subsequencealignment.py:175-459) re-expressed as Ray stages:

  stage 1  map_batches: LB_Keogh lower bound per candidate (cheap filter)
  stage 2  DTW scorer actor pool with a per-actor running k-heap whose
           max tightens max_dist (early abandoning; per-worker heaps
           weaken pruning vs the reference's single-threaded heap but
           never change results — lb_keogh <= dtw guarantees safety)
  stage 3  global sort(d).limit(k)

SubsequenceAlignment (query-in-long-series) uses the psi trick
psi=(0, 0, len(series), len(series)) so the query floats freely inside
the series.
"""

from __future__ import annotations

import heapq
from typing import List, Optional

import numpy as np
import pandas as pd

from ..kernels.elastic import distance, lb_keogh, warping_paths, best_path
from ..settings import DTWSettings


class KnnScorer:
    """DTW scorer with per-actor shrinking max_dist from a size-k heap."""

    def __init__(self, query_ref, k: int, settings: DTWSettings):
        import ray

        self.query = ray.get(query_ref)
        self.k = k
        self.settings = settings
        self.heap: List[float] = []  # max-heap via negation

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for doc_id, seq in zip(batch["doc_id"], batch["tokens"]):
            seq = np.asarray(seq, dtype=np.float64)
            max_dist = -self.heap[0] if len(self.heap) >= self.k else None
            if max_dist is not None:
                lb = lb_keogh(self.query, seq, self.settings)
                if lb > max_dist:
                    continue
            s = DTWSettings(**{**self.settings.kwargs(), "max_dist": max_dist})
            d = distance(self.query, seq, s)
            if d != np.inf:
                if len(self.heap) < self.k:
                    heapq.heappush(self.heap, -d)
                elif d < -self.heap[0]:
                    heapq.heapreplace(self.heap, -d)
                out.append((doc_id, float(d)))
        return pd.DataFrame(out, columns=["doc_id", "d"])


def knn_search(corpus_ds, query: np.ndarray, k: int, settings: Optional[DTWSettings] = None):
    """k nearest series to the query by DTW distance."""
    import ray

    settings = settings or DTWSettings(use_pruning=True)
    qref = ray.put(np.asarray(query, dtype=np.float64))
    scored = corpus_ds.map_batches(
        KnnScorer,
        fn_constructor_kwargs={"query_ref": qref, "k": k, "settings": settings},
        batch_format="pandas",
        concurrency=2,
    )
    return scored.sort(["d", "doc_id"]).limit(k)


def subsequence_knn_tokens(spec, k: int = 10):
    """k-NN of a deterministic query (tokens of row 0) over the
    synthetic token-table corpus."""
    from ..sources.synth import generate_batch, token_table

    q = np.asarray(
        generate_batch(np.arange(1, dtype=np.int64), spec)["tokens"].to_pylist()[0],
        dtype=np.float64,
    )
    corpus = token_table(spec)
    return knn_search(corpus, q, k, DTWSettings(window=32, use_pruning=True))


def subsequence_alignment_matches(series: np.ndarray, query: np.ndarray, k: int = 3):
    """k best non-overlapping matches of query inside one long series
    (driver-side kernel util; the distributed form maps this over a
    Dataset of (series_id, series) rows)."""
    query = np.asarray(query, dtype=np.float64)
    series = np.asarray(series, dtype=np.float64)
    psi = (0, 0, len(series), len(series))
    _, paths = warping_paths(query, series, DTWSettings(psi=psi), psi_neg=False)
    matching = paths[-1, 1:] / len(query)
    matches = []
    used = np.zeros(len(series), dtype=bool)
    order = np.argsort(matching, kind="stable")
    for end_idx in order:
        if len(matches) >= k:
            break
        if used[end_idx]:
            continue
        path = _path_from(paths, end_idx)
        s_start, s_end = path[0][1], path[-1][1]
        if used[s_start : s_end + 1].any():
            continue
        used[s_start : s_end + 1] = True
        matches.append(
            {
                "start": int(s_start),
                "end": int(s_end),
                "value": float(matching[end_idx]),
            }
        )
    return matches


def _path_from(paths: np.ndarray, end_col: int):
    from ..kernels.elastic import best_path as _bp

    sub = paths[:, : end_col + 2]
    return _bp(sub)
