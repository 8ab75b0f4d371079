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
from .pool import auto_pool


class KnnScorer:
    """DTW scorer with a per-actor size-k heap.

    The heap max gives an lb_keogh prune threshold per batch (cheap
    filter, result-safe: lb <= dtw); survivors are scored in ONE
    batched DP pass (kernels/pairs_batch.py) when the settings allow,
    else scalar with the shrinking max_dist."""

    def __init__(self, query_ref, k: int, settings: DTWSettings):
        import ray

        from ..kernels.pairs_batch import pairs_supported

        self.query = ray.get(query_ref)
        self.k = k
        self.settings = settings
        self.heap: List[float] = []  # max-heap via negation
        self.batched = pairs_supported(settings)
        # lb_keogh ignores psi (reference semantics): with psi-relaxed
        # DTW the bound is NOT a lower bound and the prune could drop
        # true neighbors (round-5 review finding) — disable it then
        self.use_lb = not any(settings.split_psi())

    def _push(self, d: float) -> None:
        if len(self.heap) < self.k:
            heapq.heappush(self.heap, -d)
        elif d < -self.heap[0]:
            heapq.heapreplace(self.heap, -d)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        max_dist = -self.heap[0] if len(self.heap) >= self.k else None
        docs, seqs = [], []
        for doc_id, seq in zip(batch["doc_id"], batch["tokens"]):
            seq = np.asarray(seq, dtype=np.float64)
            if (
                self.use_lb
                and max_dist is not None
                and lb_keogh(self.query, seq, self.settings) > max_dist
            ):
                continue
            docs.append(doc_id)
            seqs.append(seq)
        out = []
        if self.batched:
            from ..kernels.pairs_batch import batched_pair_distances

            ds = batched_pair_distances([self.query] * len(seqs), seqs, self.settings)
            for doc_id, d in zip(docs, ds):
                if np.isfinite(d):
                    self._push(float(d))
                    out.append((doc_id, float(d)))
        else:
            for doc_id, seq in zip(docs, seqs):
                md = -self.heap[0] if len(self.heap) >= self.k else None
                s = DTWSettings(**{**self.settings.kwargs(), "max_dist": md})
                d = distance(self.query, seq, s)
                if d != np.inf:
                    self._push(float(d))
                    out.append((doc_id, float(d)))
        if not out:
            # typed empty: an all-pruned batch must not emit object-dtype
            # columns that conflict with the int64/float64 blocks from
            # non-empty batches in the downstream sort (round-5 review)
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "d": pd.Series(dtype="float64")}
            )
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
        concurrency=auto_pool(),
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
    knn = knn_search(corpus, q, k, DTWSettings(window=32, use_pruning=True))

    def rnd(batch: pd.DataFrame) -> pd.DataFrame:
        batch["d"] = batch["d"].round(6)  # hash-robust across kernel paths
        return batch

    return knn.map_batches(rnd, batch_format="pandas")


class SAMatch:
    """One subsequence-alignment match — the reference's convenience
    surface (subsequencealignment.py:68-140, study-only): attribute
    access (idx / value / distance / segment / path) plus
    ``linearly_scale``; ``__getitem__`` keeps the engine's original
    dict-style consumers working unchanged."""

    def __init__(self, alignment: "SubsequenceAlignment", idx: int, value: float,
                 segment, path):
        self.alignment = alignment
        self.idx = idx
        self.value = value
        self.segment = segment
        self.path = path

    @property
    def distance(self) -> float:
        """Raw DTW distance (value is normalized by query length)."""
        return self.value * len(self.alignment.query)

    def __getitem__(self, key):
        return {"idx": self.idx, "value": self.value,
                "segment": self.segment, "path": self.path}[key]

    def linearly_scale(self, return_coeff: bool = False):
        """Linearly rescale the query to optimally cover the matched
        segment: fit a weighted straight line through the warping path
        (weights = |query derivative|, so flat stretches of the query
        don't drag the fit), extend the segment to where the line meets
        the query's ends, and resample the query over that span."""
        from ..kernels.preprocessing import derivative as _derivative

        series = self.alignment.series
        query = self.alignment.query
        segment = self.segment
        xy = np.array(self.path)
        xy[:, 1] -= segment[0]
        wf = _derivative(query)
        w = np.abs(wf[xy[:, 0]]).astype(np.float64)
        b, m = (
            np.polynomial.polynomial.Polynomial.fit(xy[:, 1], xy[:, 0], 1, w=w)
            .convert()
            .coef
        )
        segment = (
            int(max(0, segment[0] - b / m)),
            int(min(len(series), segment[0] + (len(query) - b) / m)),
        )
        x = list(range(len(query)))
        x_new = np.linspace(x[0], x[-1], segment[1] - segment[0] + 1)
        scaled = np.interp(x_new, x, query)
        if return_coeff:
            return scaled, segment, (m, b), len(scaled) / len(query)
        return scaled, segment


class SAMatches:
    """Container over collected SAMatch objects (reference
    SAMatches semantics: iteration, len, segments/values views)."""

    def __init__(self, matches):
        self.matches = list(matches)

    def __iter__(self):
        return iter(self.matches)

    def __len__(self):
        return len(self.matches)

    def __getitem__(self, i):
        return self.matches[i]

    def segments(self):
        return [m.segment for m in self.matches]

    def values(self):
        return [m.value for m in self.matches]


class SubsequenceAlignment:
    """Query-in-series alignment (reference
    subsequence/subsequencealignment.py:175-459): free start/end in the
    long series via psi = (0, 0, len(series), len(series)); matching
    function = last row of the cost-space warping-paths matrix,
    sqrt'ed, divided by the query length; k-best non-overlapping
    matches by argmin + masking."""

    def __init__(self, query, series, penalty: float = 0.1, **kwargs):
        self.query = np.asarray(query, dtype=np.float64)
        self.series = np.asarray(series, dtype=np.float64)
        self.settings = DTWSettings(
            penalty=penalty, psi=(0, 0, len(self.series), len(self.series)), **kwargs
        )
        self.paths = None
        self.matching = None

    def align(self):
        if self.matching is not None:
            return
        _, self.paths = warping_paths(
            self.query, self.series, self.settings, psi_neg=False, keep_int_repr=True
        )
        matching = self.paths[-1, :]
        if len(matching) > len(self.series):
            matching = np.sqrt(matching[-len(self.series) :])
        self.matching = np.array(matching) / len(self.query)

    def matching_function(self):
        self.align()
        return self.matching

    def matching_function_endpoint(self, idx: int) -> int:
        if len(self.matching) == len(self.series):
            return idx
        return idx + (len(self.series) - len(self.matching))

    def matching_function_bestpath(self, idx: int):
        real_idx = idx + 1
        return best_path(self.paths, col=real_idx, penalty=self.settings.adj_penalty)

    def matching_function_segment(self, idx: int):
        path = self.matching_function_bestpath(idx)
        return [path[0][1], self.matching_function_endpoint(idx)]

    def best_matches(self, k=None, overlap=0, minlength=2, maxlength=None,
                     max_rangefactor=None, detectknee_alpha=None):
        """Yield (idx, value, segment, path) tuples, best first, masking
        overlapping end-points as the reference does
        (subsequencealignment.py:440-480). Stops early on
        ``max_rangefactor`` (value range vs the first match) or on an
        EWMA knee when ``detectknee_alpha`` is given (the candidate
        stream of match values feeds the detector, including candidates
        later rejected on length/overlap — reference semantics)."""
        self.align()
        matching = np.array(self.matching)
        maxv = np.ceil(np.max(matching) + 1)
        matching[: min(len(self.query) - 1, overlap)] = maxv
        ki = 0
        max_dist = np.inf
        dk = None
        if detectknee_alpha is not None:
            from ..kernels.knee import DetectKnee

            dk = DetectKnee(alpha=detectknee_alpha)
        while k is None or ki < k:
            best_idx = int(np.argmin(matching))
            if np.isinf(matching[best_idx]) or matching[best_idx] == maxv:
                break
            if max_rangefactor is not None:
                if ki == 0:
                    max_dist = matching[best_idx] * max_rangefactor
                elif matching[best_idx] > max_dist:
                    break
            if dk is not None and dk.dostop(matching[best_idx]):
                break
            value = float(self.matching[best_idx])
            path = self.matching_function_bestpath(best_idx)
            b, e = path[0][1], self.matching_function_endpoint(best_idx)
            cur_overlap = min(overlap, e - b - 1)
            mb, me = best_idx + 1 - (e - b) + cur_overlap, best_idx + 1
            if (minlength is not None and e - b + 1 < minlength) or (
                maxlength is not None and e - b + 1 > maxlength
            ):
                matching[best_idx] = maxv
                continue
            if np.isinf(np.max(matching[mb:me])):
                matching[best_idx] = maxv
                continue
            matching[mb:me] = np.inf
            ki += 1
            yield SAMatch(self, best_idx, value, [b, e], path)

    def kbest_matches(self, k=1, overlap=0, minlength=2, maxlength=None):
        return self.best_matches(k=k, overlap=overlap, minlength=minlength, maxlength=maxlength)

    def best_matches_rangefactor(self, max_rangefactor=2, overlap=0, minlength=2, maxlength=None):
        """All matches until the value exceeds first-match * factor."""
        return self.best_matches(k=None, max_rangefactor=max_rangefactor, overlap=overlap,
                                 minlength=minlength, maxlength=maxlength)

    def best_matches_knee(self, alpha=0.3, overlap=0, minlength=2, maxlength=None):
        """All matches until the EWMA knee of the value curve
        (reference subsequencealignment.py:338-351)."""
        return self.best_matches(k=None, detectknee_alpha=alpha, overlap=overlap,
                                 minlength=minlength, maxlength=maxlength)


def subsequence_alignment(query, series, penalty: float = 0.1, **kwargs) -> SubsequenceAlignment:
    sa = SubsequenceAlignment(query, series, penalty=penalty, **kwargs)
    sa.align()
    return sa


def subsequence_alignment_matches(series, query, k: int = 3, penalty: float = 0.1):
    """k best non-overlapping matches of query inside one long series.
    The distributed form maps this over a Dataset of
    (series_id, series) rows inside map_batches."""
    sa = subsequence_alignment(query, series, penalty=penalty)
    return [
        {"start": m["segment"][0], "end": m["segment"][1], "value": m["value"]}
        for m in sa.kbest_matches(k=k)
    ]
