"""Clustering layer: hierarchical (prototype merge), linkage tree,
k-means with DBA update.

Distance pairs are computed by the Ray distance-matrix service
(stages.distance_matrix); the n^2 -> n contraction itself is
sequential by nature and runs driver-side, as the reference does
(clustering/hierarchical.py:35-137 — "distance to prototype"
clustering: merged series' rows are inf-ed out, distances are NOT
recomputed). KMeans distributes the assignment step (scorer tasks
against broadcast means) and the update step (per-cluster DBA).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Set, Tuple

import numpy as np

from ..kernels.dba import dba_loop
from ..kernels.elastic import distance as dtw_distance
from ..settings import DTWSettings


MAX_DRIVER_PAIRS = 2_000_000


def _full_triu_matrix(seqs, settings: Optional[DTWSettings], use_ray: bool = True) -> np.ndarray:
    n = len(seqs)
    npairs = n * (n - 1) // 2
    if npairs > MAX_DRIVER_PAIRS:
        # loud-fail guard (merge_partials.max_driver_rows contract):
        # the n^2 contraction is driver-side by design — a series set
        # this large must go through the tiled distance-matrix service
        # + an out-of-core clustering plan, not this path
        raise ValueError(
            f"_full_triu_matrix: {npairs} pairs (n={n}) exceeds "
            f"MAX_DRIVER_PAIRS={MAX_DRIVER_PAIRS}; cluster per-group or "
            "use the tiled distance_matrix service directly"
        )
    m = np.full((n, n), np.inf)
    if use_ray and n > 8:
        from .distance_matrix import distance_matrix

        pairs = distance_matrix(seqs, settings).to_pandas()
        for i, j, d in zip(pairs["i"], pairs["j"], pairs["d"]):
            m[int(i), int(j)] = d
    else:
        for i in range(n):
            for j in range(i + 1, n):
                m[i, j] = dtw_distance(seqs[i], seqs[j], settings)
    return m


def _symmetrize_triu(m: np.ndarray) -> np.ndarray:
    """Full symmetric matrix from the computed upper triangle: only the
    never-computed lower-triangle/diagonal cells become 0; a GENUINE
    +inf distance computed in the triangle (possible under max_dist /
    max_step / max_length_diff settings) is preserved on both sides —
    the most dissimilar pairs must not collapse to 0."""
    iu = np.triu_indices(len(m), k=1)
    d = np.zeros_like(m)
    d[iu] = m[iu]
    d.T[iu] = m[iu]
    return d


class Hierarchical:
    """Prototype-merge hierarchical clustering, reference semantics:
    repeatedly merge the global argmin pair (i1 <- i2), inf out i2,
    stop at max_dist; distances to the merged prototype are not
    recomputed (hierarchical.py:88-109)."""

    def __init__(
        self,
        settings: Optional[DTWSettings] = None,
        max_dist: float = float("inf"),
        merge_hook: Optional[Callable] = None,
        order_hook: Optional[Callable] = None,
        use_ray: bool = True,
    ):
        self.settings = settings
        self.max_dist = max_dist
        self.merge_hook = merge_hook
        self.order_hook = order_hook
        self.use_ray = use_ray

    def fit(self, seqs: List[np.ndarray]) -> Dict[int, Set[int]]:
        n = len(seqs)
        pair_d = _full_triu_matrix(seqs, self.settings, self.use_ray)
        members: Dict[int, Set[int]] = {}  # prototype -> absorbed set
        merged_away: Set[int] = set()

        def best_cell():
            """(value, (keep, absorb)) of the smallest remaining pair —
            row-major first among exact ties, unless an order hook
            picks among them."""
            v = np.min(pair_d)
            ties = np.argwhere(pair_d == v)
            pick = self.order_hook(ties) if self.order_hook else ties[0, :]
            return v, pick

        v, pick = best_cell()
        while v <= self.max_dist and not np.isinf(v):
            keep, absorb = int(pick[0]), int(pick[1])
            if self.merge_hook:
                swapped = self.merge_hook(absorb, keep, v)
                if swapped:
                    keep, absorb = swapped
            # absorb's whole cluster folds into keep's; absorb leaves
            # the candidate matrix (its row/column go to +inf) and the
            # surviving prototype's distances are NOT recomputed
            members.setdefault(keep, {keep}).update(members.pop(absorb, {absorb}))
            pair_d[:absorb, absorb] = np.inf
            pair_d[absorb, absorb + 1 :] = np.inf
            merged_away.add(absorb)
            if len(merged_away) == n - 1:
                break
            v, pick = best_cell()
        for i in range(n):
            if i not in merged_away and i not in members:
                members[i] = {i}
        return members


class HierarchicalTree:
    """Records a SciPy-compatible linkage while running Hierarchical
    (reference hierarchical.py:411-464)."""

    def __init__(self, model: Optional[Hierarchical] = None, **kwargs):
        self._model = model or Hierarchical(**kwargs)
        self._model.max_dist = float("inf")
        self.linkage: List[Tuple] = []

    def fit(self, seqs: List[np.ndarray]):
        self.linkage = []
        n = len(seqs)
        new_nodes = {i: i for i in range(n)}
        old_hook = self._model.merge_hook

        def merge_hook(from_idx, to_idx, dist_):
            new_idx = n + len(self.linkage)
            if new_nodes[from_idx] is None:
                # reference hierarchical.py:452-453
                raise ValueError("Trying to merge series that is already merged")
            self.linkage.append((new_nodes[from_idx], new_nodes[to_idx], dist_, 0))
            new_nodes[to_idx] = new_idx
            new_nodes[from_idx] = None
            if old_hook:
                # reference hierarchical.py:457-458 deliberately DISCARDS
                # the wrapped hook's swap result: honoring a (keep, absorb)
                # swap here would invalidate the linkage row recorded above
                # (round-5 review finding — None ids leaked into Z)
                old_hook(from_idx, to_idx, dist_)

        self._model.merge_hook = merge_hook
        result = self._model.fit(seqs)
        self._model.merge_hook = old_hook
        return result


def linkage_complete(seqs: List[np.ndarray], settings: Optional[DTWSettings] = None,
                     use_ray: bool = True) -> np.ndarray:
    """Complete-linkage agglomerative tree, SciPy-compatible (n-1)x4 Z
    matrix. Self-implemented (no scipy in this environment); matches
    scipy.cluster.hierarchy.linkage(method='complete') conventions:
    merged pair ids sorted ascending, new cluster id n + step."""
    n = len(seqs)
    m = _full_triu_matrix(seqs, settings, use_ray)
    d = _symmetrize_triu(m)  # symmetric, 0 diag; computed inf preserved
    active = {i: (i, 1) for i in range(n)}  # pos -> (cluster id, count)
    cur = d.copy()
    np.fill_diagonal(cur, np.inf)
    Z = np.empty((n - 1, 4))
    for r in range(n - 1):
        pi, pj = np.unravel_index(int(np.argmin(cur)), cur.shape)
        if pi > pj:
            pi, pj = pj, pi
        v = cur[pi, pj]
        id_i, cnt_i = active[pi]
        id_j, cnt_j = active[pj]
        lo, hi = sorted((id_i, id_j))
        Z[r] = (float(lo), float(hi), float(v), float(cnt_i + cnt_j))
        # complete linkage: new cluster's distance = max of the two
        for pk in list(active.keys()):
            if pk in (pi, pj):
                continue
            cur[pi, pk] = cur[pk, pi] = max(cur[pi, pk], cur[pj, pk])
        del active[pj]
        active[pi] = (n + r, cnt_i + cnt_j)
        cur[pj, :] = np.inf
        cur[:, pj] = np.inf
    return Z


class Hooks:
    """Prototype-choice hooks (reference hierarchical.py:521-546)."""

    @staticmethod
    def create_weighthook(weights: Dict[int, float], series):
        def newhook(i1, i2, dist):
            w1 = weights[i1]
            w2 = weights[i2]
            p1 = series[i1]
            p2 = series[i2]
            if w1 < w2 or (w1 == w2 and len(p1) > len(p2)):
                i1, i2 = i2, i1
            weights[i1] = w1 + w2
            return i1, i2

        return newhook

    @staticmethod
    def create_orderhook(weights: Dict[int, float]):
        def newhook(idxs):
            min_idx = -1
            max_weight = -1
            for r, c in [idxs[ii, :] for ii in range(idxs.shape[0])]:
                total = weights[r] + weights[c]
                if total > max_weight:
                    max_weight = total
                    min_idx = (r, c)
            return min_idx

        return newhook


class KMedoids:
    """k-medoids (PAM) on the precomputed DTW distance matrix.

    The reference delegates to the PyClustering package
    (medoids.py:118-160), which is not available here; this is a
    self-implemented PAM: assign points to nearest medoid, then for
    each cluster pick the member minimizing the within-cluster
    distance sum; iterate to convergence. Deterministic given
    initial_medoids (or a seed)."""

    def __init__(
        self,
        k: Optional[int] = None,
        initial_medoids: Optional[List[int]] = None,
        settings: Optional[DTWSettings] = None,
        max_it: int = 50,
        seed: int = 0,
        use_ray: bool = True,
    ):
        if k is None and initial_medoids is None:
            raise AttributeError("Both k and initial_medoids cannot be None")
        self.k = k if k is not None else len(initial_medoids)
        self.initial_medoids = initial_medoids
        self.settings = settings
        self.max_it = max_it
        self.seed = seed
        self.use_ray = use_ray
        self.cluster_idx: Dict[int, Set[int]] = {}

    def fit(self, seqs: List[np.ndarray]) -> Dict[int, Set[int]]:
        n = len(seqs)
        m = _full_triu_matrix(seqs, self.settings, self.use_ray)
        d = _symmetrize_triu(m)
        if self.initial_medoids is None:
            rng = np.random.default_rng(self.seed)
            medoids = sorted(rng.choice(n, size=self.k, replace=False).tolist())
        else:
            medoids = list(self.initial_medoids)
        for _ in range(self.max_it):
            assign = np.argmin(d[:, medoids], axis=1)
            new_medoids = []
            for c in range(self.k):
                members = np.flatnonzero(assign == c)
                if len(members) == 0:
                    new_medoids.append(medoids[c])
                    continue
                sub = d[np.ix_(members, members)]
                new_medoids.append(int(members[np.argmin(sub.sum(axis=1))]))
            if new_medoids == medoids:
                break
            medoids = new_medoids
        assign = np.argmin(d[:, medoids], axis=1)
        self.cluster_idx = {
            medoids[c]: set(np.flatnonzero(assign == c).tolist()) for c in range(self.k)
        }
        return self.cluster_idx


# ---------------------------------------------------------------------------
# k-means with DBA update
# ---------------------------------------------------------------------------


class KMeans:
    """k-means over series with DTW assignment and DBA barycenter
    update (reference clustering/kmeans.py:241-419 semantics: assign ->
    drop_stddev trim -> empty-cluster re-seed with most dissimilar ->
    DBA update -> converge on assignment stability / mean shift).

    Distribution: the assignment step scores batches against broadcast
    means inside Ray tasks; the update step runs one DBA per cluster.
    Init is deterministic (seeded k-means++ with an explicit rng)."""

    def __init__(
        self,
        k: int,
        max_it: int = 10,
        thr: float = 0.0001,
        drop_stddev: Optional[float] = None,
        settings: Optional[DTWSettings] = None,
        seed: int = 0,
        use_ray: bool = True,
    ):
        self.k = k
        self.max_it = max_it
        self.thr = thr
        self.drop_stddev = drop_stddev
        self.settings = settings
        self.seed = seed
        self.use_ray = use_ray
        self.means: List[np.ndarray] = []
        self.cluster_idx: Dict[int, Set[int]] = {}

    def _kmeanspp_init(self, seqs) -> List[np.ndarray]:
        rng = np.random.default_rng(self.seed)
        n = len(seqs)
        first = int(rng.integers(0, n))
        means = [np.asarray(seqs[first], dtype=np.float64)]
        d2 = np.array([dtw_distance(s, means[0], self.settings) ** 2 for s in seqs])
        for _ in range(1, self.k):
            probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
            nxt = int(rng.choice(n, p=probs))
            means.append(np.asarray(seqs[nxt], dtype=np.float64))
            d2 = np.minimum(d2, np.array([dtw_distance(s, means[-1], self.settings) ** 2 for s in seqs]))
        return means

    def _assign(self, seqs) -> Tuple[np.ndarray, np.ndarray]:
        if self.use_ray:
            import ray
            import ray.data as rd

            means_ref = ray.put(self.means)
            settings = self.settings

            def score(batch):
                import pandas as pd

                means = ray.get(means_ref)
                idxs, clusters, dists = [], [], []
                for i, s in zip(batch["idx"], batch["seq"]):
                    ds_ = [dtw_distance(np.asarray(s, dtype=np.float64), m, settings) for m in means]
                    best = int(np.argmin(ds_))
                    idxs.append(int(i))
                    clusters.append(best)
                    dists.append(float(ds_[best]))
                return pd.DataFrame({"idx": idxs, "cluster": clusters, "dist": dists})

            items = [{"idx": i, "seq": np.asarray(s, dtype=np.float64)} for i, s in enumerate(seqs)]
            res = (
                rd.from_items(items)
                .map_batches(score, batch_format="pandas")
                .to_pandas()
                .sort_values("idx")
            )
            return res["cluster"].to_numpy(), res["dist"].to_numpy()
        clusters = np.empty(len(seqs), dtype=np.int64)
        dists = np.empty(len(seqs))
        for i, s in enumerate(seqs):
            ds_ = [dtw_distance(s, m, self.settings) for m in self.means]
            clusters[i] = int(np.argmin(ds_))
            dists[i] = ds_[clusters[i]]
        return clusters, dists

    def fit(self, seqs: List[np.ndarray]) -> Dict[int, Set[int]]:
        seqs = [np.asarray(s, dtype=np.float64) for s in seqs]
        self.means = self._kmeanspp_init(seqs)
        prev_clusters = None
        for _ in range(self.max_it):
            clusters, dists = self._assign(seqs)
            # drop_stddev trimming: exclude members beyond mean + k*std
            # of their cluster's distances from the update
            mask = np.ones(len(seqs), dtype=bool)
            if self.drop_stddev is not None:
                limit = dists.mean() + dists.std() * self.drop_stddev
                mask = dists <= limit
            # empty-cluster rescue: re-seed with the most dissimilar series
            for c in range(self.k):
                if not (clusters == c).any():
                    worst = int(np.argmax(dists))
                    clusters[worst] = c
                    dists[worst] = 0.0
            shift = 0.0
            for c in range(self.k):
                members = [seqs[i] for i in np.flatnonzero((clusters == c) & mask)]
                if not members:
                    members = [seqs[i] for i in np.flatnonzero(clusters == c)]
                if not members:
                    # the rescue above can empty an earlier cluster (its sole
                    # member was the globally most-dissimilar point): the
                    # reference's dba returns a zero-constant average for an
                    # empty mask (dtw_barycenter.py:194-197) — mirror that
                    # instead of crashing in dba_loop (round-5 review finding)
                    new_mean = np.zeros(len(seqs[0]), dtype=np.float64)
                else:
                    new_mean = dba_loop(members, c=self.means[c], max_it=2, thr=None,
                                        settings=self.settings)
                if len(new_mean) == len(self.means[c]):
                    shift += float(np.abs(new_mean - self.means[c]).mean())
                self.means[c] = np.asarray(new_mean)
            if prev_clusters is not None and (clusters == prev_clusters).all():
                break
            if self.thr is not None and shift / self.k <= self.thr:
                break
            prev_clusters = clusters
        clusters, dists = self._assign(seqs)
        self.cluster_idx = {
            c: set(np.flatnonzero(clusters == c).tolist()) for c in range(self.k)
        }
        self.inertia = float(np.sum(dists**2))
        return self.cluster_idx


class KMeansReferenceParity:
    """Call-for-call mirror of the reference KMeans.fit
    (clustering/kmeans.py:96-420; use_parallel=False, 1-D, pure
    Python): identical global np.random / random draw sequence
    (k-means++ init), identical assignment / drop_stddev trimming /
    empty-cluster rescue / DBA update order — so from an identically
    seeded global RNG state it reproduces the reference's exact
    clusters and means (asserted in tests/test_ops_parity.py). The
    engine's scalable KMeans above keeps its own explicit-RNG design;
    this class pins the reference's stochastic path, including its
    quirks (the DBA update ignores dists_options; the non-k-means++
    init draws indices it does not use)."""

    def __init__(self, k, max_it=10, max_dba_it=10, thr=0.0001, drop_stddev=None,
                 initialize_with_kmeanspp=True, initialize_sample_size=None,
                 settings: Optional[DTWSettings] = None):
        self.k = k
        self.max_it = max_it
        self.max_dba_it = max_dba_it
        self.thr = thr
        self.drop_stddev = drop_stddev
        self.initialize_with_kmeanspp = initialize_with_kmeanspp
        self.initialize_sample_size = initialize_sample_size
        self.settings = settings or DTWSettings()
        self.means = [None] * k
        self.cluster_idx: Dict[int, Set[int]] = {}

    def _dist_row_sq(self, seqs, idx) -> np.ndarray:
        from ..kernels.pairs_batch import batched_pair_distances, pairs_supported

        if pairs_supported(self.settings):
            d = batched_pair_distances([seqs[idx]] * len(seqs), seqs, self.settings)
        else:
            d = np.array([dtw_distance(seqs[idx], s, self.settings) for s in seqs])
        return np.power(d, 2)

    def _kmeanspp(self, seqs) -> List[np.ndarray]:
        import math as _math

        if self.initialize_sample_size is None:
            n_samples = min(2 + int(_math.log(self.k)), len(seqs) - self.k)
        else:
            n_samples = self.initialize_sample_size
        dists = np.empty((n_samples, len(seqs)))
        idx = np.random.randint(0, len(seqs))
        min_dists = self._dist_row_sq(seqs, idx)
        indices = [idx]
        for _k_idx in range(1, self.k):
            total = np.sum(min_dists)
            weights = None if total == 0.0 else min_dists / total
            idx_cand = np.random.choice(len(min_dists), size=n_samples, replace=False, p=weights)
            for s_idx, cand in enumerate(idx_cand):
                dists[s_idx, :] = np.minimum(self._dist_row_sq(seqs, cand), min_dists)
            best = int(np.argmin(np.sum(dists, axis=1)))
            indices.append(int(idx_cand[best]))
            min_dists = dists[best, :].copy()
        return [seqs[i] for i in indices]

    def fit(self, series) -> Tuple[Dict[int, Set[int]], int]:
        import math as _math
        import random as _random

        from ..kernels.dba import dba_loop

        seqs = [np.asarray(s, dtype=np.float64) for s in series]
        n = len(seqs)
        mask = np.full((self.k, n), False, dtype=bool)
        mask_new = np.full((self.k, n), False, dtype=bool)
        performed_it = 1
        drop_stddev = max(self.drop_stddev, 4) if self.drop_stddev is not None else None

        if self.initialize_with_kmeanspp:
            self.means = self._kmeanspp(seqs)
        else:
            indices = np.random.choice(range(n), self.k, replace=False)
            # reference quirk: ignores `indices`, draws again per slot
            self.means = [seqs[_random.randint(0, n - 1)] for _ki in indices]

        def assign():
            out = []
            for s in seqs:
                best_i, best_d = -1, float("inf")
                for i, avg in enumerate(self.means):
                    d = dtw_distance(s, avg, self.settings)
                    if d < best_d:
                        best_d, best_i = d, i
                out.append((best_i, best_d))
            return out

        for it_nb in range(self.max_it):
            performed_it += 1
            clusters_distances = assign()
            distances = [d for _, d in clusters_distances]

            best_medoid = [0] * self.k
            best_dist = [float("inf")] * self.k
            for idx, (cluster, d) in enumerate(clusters_distances):
                if d < best_dist[cluster]:
                    best_dist[cluster] = d
                    best_medoid[cluster] = idx

            if self.drop_stddev is not None and self.drop_stddev != 0:
                stats = [[0.0, 0.0, 0] for _ in range(self.k)]
                for cluster, d in clusters_distances:
                    stats[cluster][0] += d
                    stats[cluster][2] += 1
                for ki in range(self.k):
                    stats[ki][0] = 0 if stats[ki][2] == 0 else stats[ki][0] / stats[ki][2]
                for cluster, d in clusters_distances:
                    stats[cluster][1] += (stats[cluster][0] - d) ** 2
                max_value = []
                for ki in range(self.k):
                    if stats[ki][2] == 0:
                        stats[ki][1] = 0
                    else:
                        stats[ki][1] = _math.sqrt(stats[ki][1] / stats[ki][2])
                    max_value.append(stats[ki][0] + stats[ki][1] * drop_stddev)
                drop_stddev = (drop_stddev + self.drop_stddev) / 2
            else:
                max_value = None

            mask_new[:, :] = False
            for idx, (cluster, d) in enumerate(clusters_distances):
                if max_value is None or d <= max_value[cluster]:
                    mask_new[cluster, idx] = True
            if (mask == mask_new).all():
                break
            mask[:, :] = mask_new
            for ki in range(self.k):
                if not mask[ki, :].any():
                    idx = int(np.argmax(distances))
                    mask[:, idx] = False
                    mask[ki, idx] = True
                    distances[idx] = 0

            # DBA update — reference quirk: runs with DEFAULT dtw
            # settings regardless of the assignment's dists_options
            new_means = [
                dba_loop(
                    [seqs[i] for i in range(n) if mask[ki, i]],
                    c=seqs[best_medoid[ki]],
                    max_it=self.max_dba_it,
                    thr=self.thr,
                )
                for ki in range(self.k)
            ]
            diff = 0.0
            difflen = 0
            for ki in range(self.k):
                curlen = min(len(new_means[ki]), len(self.means[ki]))
                difflen += curlen
                for a, b in zip(new_means[ki], self.means[ki]):
                    diff += abs(a - b)
                self.means[ki] = new_means[ki]
            diff /= difflen
            if diff <= self.thr:
                break

        clusters_distances = assign()
        self.cluster_idx = {ki: set() for ki in range(self.k)}
        for idx, (cluster, _d) in enumerate(clusters_distances):
            self.cluster_idx[cluster].add(idx)
        return self.cluster_idx, performed_it
