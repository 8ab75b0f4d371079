"""Decision-tree weight LEARNING for weighted DTW.

Completes the dtw_weighted surface (reference dtw_weighted.py:155-439
+ its built-in DecisionTreeClassifier at 680-1004, which exists
because scikit-learn is optional upstream — and is the only runnable
path in this container): per-point must-link / cannot-link difference
observations are mined from warping paths against a prototype, a
small two-class decision tree (information gain x k-distance density
criterion, each feature used once per path) separates must-link from
cannot-link series, and every pure cannot-link leaf's "feature >
threshold" conditions become cannot-link weight values. Combined with
kernels/weighted.compute_weights_from_mlclvalues this yields the full
compute_weights_using_dt pipeline.

All of it is deterministic (no RNG). Parity with the reference is
asserted in tests/test_ops_parity.py — the reference's series_to_dt
needs a test-only ``np.int = int`` shim on modern NumPy.
"""

from __future__ import annotations

import math
from collections import defaultdict, deque
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from .elastic import best_path
from .weighted import compute_weights_from_mlclvalues, warping_paths

INF = float("inf")


class Tree:
    """Flat-array decision-tree storage (sklearn-compatible fields)."""

    def __init__(self):
        self.threshold: List[float] = []
        self.feature: List[int] = []
        self.children_right: List[int] = []
        self.children_left: List[int] = []
        self.value: List[np.ndarray] = []
        self.impurity: List[float] = []
        self.n_node_samples: List[int] = []
        self.kd: List[float] = []
        self.add()

    def add(self) -> int:
        self.threshold.append(-1)
        self.feature.append(-1)
        self.children_right.append(-1)
        self.children_left.append(-1)
        self.value.append(np.array([[0.0, 0.0]]))
        self.impurity.append(-1)
        self.n_node_samples.append(-1)
        self.kd.append(-1)
        return len(self.feature) - 1

    @property
    def nb_nodes(self) -> int:
        return len(self.threshold)

    @property
    def used_features(self) -> Set[int]:
        return set(self.feature)

    @property
    def depth(self) -> int:
        best = 1
        stack = [(0, 1)]
        while stack:
            idx, d = stack.pop()
            best = max(best, d)
            if self.children_left[idx] != -1:
                stack.append((self.children_left[idx], d + 1))
            if self.children_right[idx] != -1:
                stack.append((self.children_right[idx], d + 1))
        return best


def _entropy(targets: np.ndarray) -> float:
    p = float(np.sum(targets)) / len(targets)
    if p in (0.0, 1.0):
        return 0.0
    return -p * math.log(p) - (1.0 - p) * math.log(1.0 - p)


def _best_split(targets: np.ndarray, values: np.ndarray, h0: float):
    """(information gain, threshold) of the best binary split of one
    continuous feature (thresholds at midpoints of sorted uniques)."""
    uniq = np.unique(values)
    thresholds = (uniq[1:] + uniq[:-1]) / 2
    n = len(values)
    h1_best, thr_best = INF, None
    for thr in thresholds:
        mask = values <= thr
        p = float(np.sum(mask)) / n
        h1 = p * _entropy(targets[mask]) + (1.0 - p) * _entropy(targets[~mask])
        if h1 < h1_best:
            h1_best, thr_best = h1, thr
    return (0.0 if thr_best is None else h0 - h1_best), thr_best


def _kdistance(values: np.ndarray, threshold: float, k: int = 5) -> float:
    """Distance to the k-th nearest value — low-density thresholds
    (large k-distance) are preferred split points."""
    dists: List[float] = []
    for v in np.nditer(values):
        d = abs(float(v) - threshold)
        if len(dists) < k:
            dists.append(d)
            dists.sort()
        elif d < dists[-1]:
            dists[-1] = d
            dists.sort()
    return dists[-1]


class DecisionTreeClassifier:
    """Two-class tree with the reference's igkdistance criterion:
    candidate splits rank by ig * (1 + kd/max_kd), each feature is used
    at most once per root-to-leaf path."""

    def __init__(self):
        self.tree_: Optional[Tree] = None
        self.criterion = "igkdistance"
        self.n_features_: Optional[int] = None

    def fit(self, features: np.ndarray, targets: np.ndarray,
            use_feature_once: bool = True, ignore_features=None, min_ig: float = 0):
        nb_features = features.shape[1]
        self.n_features_ = nb_features
        nb_instances = features.shape[0]
        k = int(math.ceil(len(targets) * 0.005))
        self.tree_ = Tree()
        queue = deque(
            [(0, np.zeros(nb_features, dtype=bool), np.ones(nb_instances, dtype=bool))]
        )
        while queue:
            node, used, idxs = queue.popleft()
            n_samples = int(np.sum(idxs))
            pos = float(np.sum(targets[idxs]))
            self.tree_.value[node][0, 1] = pos
            self.tree_.value[node][0, 0] = n_samples - pos
            self.tree_.n_node_samples[node] = n_samples
            if np.all(targets[idxs]) or not np.any(targets[idxs]):
                self.tree_.impurity[node] = 0
                continue
            cur_vals = features[idxs, :]
            cur_tgts = targets[idxs]
            h0 = _entropy(cur_tgts)
            candidates = []
            max_kd = 0.0
            for fi in range(nb_features):
                if (use_feature_once and used[fi]) or (
                    ignore_features is not None and fi in ignore_features
                ):
                    continue
                ig, thr = _best_split(cur_tgts, cur_vals[:, fi], h0)
                if thr is None or ig < min_ig:
                    continue
                kd = _kdistance(cur_vals[:, fi], thr, k=k)
                max_kd = max(max_kd, kd)
                candidates.append((fi, ig, thr, kd))
            best = (0.0, None, None, None)  # gain, fi, thr, kd
            for fi, ig, thr, kd in candidates:
                gain = ig * (1 + kd / max_kd)
                if best[0] < gain:
                    best = (gain, fi, thr, kd)
            self.tree_.impurity[node] = h0
            if best[1] is not None:
                _, fi, thr, kd = best
                self.tree_.kd[node] = kd
                self.tree_.feature[node] = fi
                self.tree_.threshold[node] = thr
                used = used.copy()
                used[fi] = True
                left = self.tree_.add()
                queue.append((left, used, idxs & (features[:, fi] <= thr)))
                self.tree_.children_left[node] = left
                right = self.tree_.add()
                queue.append((right, used, idxs & (features[:, fi] > thr)))
                self.tree_.children_right[node] = right
        return self

    def avg_impurity(self) -> float:
        leaf = [i for i in range(self.tree_.nb_nodes) if self.tree_.feature[i] == -1]
        return sum(self.tree_.impurity[i] for i in leaf) / len(leaf)

    def score(self, max_kd: float) -> float:
        """Leaf purity weighted by the branch's low-density bonus."""
        total, count = 0.0, 0
        queue = deque([(0, 0.0)])
        while queue:
            idx, branch_kd = queue.popleft()
            l, r = self.tree_.children_left[idx], self.tree_.children_right[idx]
            if l == -1 and r == -1:
                total += (1.0 - self.tree_.impurity[idx]) * (1 + branch_kd / max_kd)
                count += 1
            else:
                nkd = max(branch_kd, self.tree_.kd[idx])
                queue.append((l, nkd))
                queue.append((r, nkd))
        return total / count

    def set_features(self, features: List[int]) -> None:
        for i in range(self.tree_.nb_nodes):
            if self.tree_.feature[i] != -1:
                self.tree_.feature[i] = features[self.tree_.feature[i]]


def decisiontree_to_clweights(clf: DecisionTreeClassifier, min_purity: float = 1.0):
    """Every sufficiently pure cannot-link leaf contributes its path's
    'feature > threshold' conditions as cannot-link values (the CL
    region is the union of CL leaves; negating gives the safe zone)."""
    cl_values = defaultdict(lambda: ([], []))
    used_features: Set[int] = set()
    queue = deque([(0, [])])
    while queue:
        node, path = queue.popleft()
        t = clf.tree_
        if t.children_left[node] == -1 and t.children_right[node] == -1:
            v = t.value[node][0]
            purity = v[1] / (v[0] + v[1])
            if purity >= min_purity:
                for feature, threshold, leq in path:
                    if not leq:  # only 'f > t' conditions carry CL info
                        index = feature // 2
                        neg_side = (feature % 2) == 0
                        cl_values[index][0 if neg_side else 1].append(threshold)
                        used_features.add(feature)
        else:
            f, thr = t.feature[node], t.threshold[node]
            queue.append((t.children_left[node], path + [(f, thr, True)]))
            queue.append((t.children_right[node], path + [(f, thr, False)]))
    return cl_values, used_features


def _merge_cl_values(acc: Dict, new: Dict) -> None:
    for idx, (n, p) in new.items():
        if idx not in acc:
            acc[idx] = [n, p]
        else:
            acc[idx][0].extend(n)
            acc[idx][1].extend(p)


def _merge_importances(acc: Dict, new: Dict, weight: float) -> None:
    for idx, (n, p) in new.items():
        if n:
            acc[idx][0] = max(weight, acc[idx][0])
        if p:
            acc[idx][1] = max(weight, acc[idx][1])


def dt_onewindow(features, targets, classifier, max_clfs, min_ig, min_purity):
    """Learn trees over the full feature window repeatedly, retiring
    each tree's used features, geometrically down-weighting later
    trees' importances."""
    cl_values: Dict = {}
    clfs = []
    ignore: Set[int] = set()
    weight = 1.0
    importances = defaultdict(lambda: [0, 0])
    while max_clfs is None or len(clfs) < max_clfs:
        clf = classifier()
        clf.fit(features, targets, ignore_features=ignore, min_ig=min_ig)
        if clf.tree_.nb_nodes <= 1:
            break
        clfs.append(clf)
        new_cl, used = decisiontree_to_clweights(clf, min_purity)
        if not used:
            used.update(clf.tree_.used_features)
        _merge_cl_values(cl_values, new_cl)
        _merge_importances(importances, new_cl, weight)
        ignore.update(used)
        weight *= 0.66
    return cl_values, clfs, importances


def dt_windows(features, targets, classifier, patternlen, max_clfs, min_ig, min_purity):
    """Learn one tree per half-overlapping feature window, keep the
    top-scoring band (score gap heuristic), merge their CL values."""
    cl_values: Dict = {}
    importances = defaultdict(lambda: [0, 0])
    candidates = []
    nb_indices = features.shape[1] // 2
    max_kd = 0.0
    for idx in range(0, int(nb_indices - patternlen / 2), int(patternlen / 2)):
        lo = idx * 2
        hi = lo + patternlen * 2
        clf = classifier()
        clf.fit(features[:, lo:hi], targets, ignore_features=set(), min_ig=min_ig)
        if clf.tree_.nb_nodes <= 1:
            continue
        clf.set_features(list(range(lo, hi)))
        max_kd = max(max_kd, max(clf.tree_.kd))
        candidates.append(clf)
    # stable sort on (score, -nb_nodes): exact ties keep window order
    # (the reference achieves this with no-op comparators on the clf)
    scored = sorted(
        ((clf.score(max_kd), -clf.tree_.nb_nodes, clf) for clf in candidates),
        key=lambda t: (t[0], t[1]),
        reverse=True,
    )
    if not scored:
        # no window produced a non-trivial tree (pure targets, or
        # min_ig cleared every split): nothing to merge (round-5 review
        # finding — scored[-1] raised IndexError here)
        return cl_values, [], importances
    min_score = scored[-1][0]
    max_score = scored[0][0]
    min_allowed = max_score - (max_score - min_score) / 5
    use = 1
    while len(scored) > use and min_allowed > scored[use][0]:
        max_score = scored[use][0]
        min_allowed = max_score - (max_score - min_score) / 5
        use += 1
    kept = [t for t in scored if t[0] >= min_allowed]
    if max_clfs is not None:
        kept = kept[:max_clfs]
    for score, _neg_nodes, clf in kept:
        new_cl, _used = decisiontree_to_clweights(clf, min_purity)
        _merge_cl_values(cl_values, new_cl)
        # max == min (single kept tree / all-tie scores): weight 1.0,
        # not 0/0 = NaN (round-5 review finding)
        span = max_score - min_score
        _merge_importances(
            importances, new_cl, (score - min_score) / span if span else 1.0
        )
    return cl_values, kept, importances


def series_to_dt(series, labels, prototypeidx, classifier=None, max_clfs=None,
                 min_ig=0, warping_paths_fnc=None, ignore_idxs=None,
                 patternlen=None, min_purity=1.0, **kwargs):
    """Mine must-link values and learn cannot-link values from warping
    paths against the prototype (reference dtw_weighted.py:170-279,
    minus the Graphviz export).

    labels: 1 = must-link (same cluster as prototype), 0 = cannot-link.
    Features per series: mean |difference| per (prototype point, sign).
    """
    if warping_paths_fnc is None:
        warping_paths_fnc = warping_paths
    ignore_idxs = ignore_idxs or set()
    proto = np.asarray(series[prototypeidx], dtype=np.float64)
    features = [[0.0] * (len(proto) * 2)]
    targets = [0]  # the prototype itself: must-link
    ml_values = defaultdict(lambda: ([], []))
    wp_keys = {"window", "max_dist", "max_step", "max_length_diff", "penalty", "psi"}
    wp_params = {k: kwargs[k] for k in wp_keys.intersection(kwargs.keys())}
    for idx, label in enumerate(labels):
        if idx in ignore_idxs:
            continue
        sums = np.zeros(len(proto) * 2)
        counts = np.zeros(len(proto) * 2, dtype=np.int64)
        _, paths = warping_paths_fnc(proto, series[idx], **wp_params)
        path = best_path(paths)
        for i_to, i_from in path:
            d = proto[i_to] - series[idx][i_from]
            if label == 1:
                if d < 0:
                    ml_values[i_to][0].append(-d)
                elif d > 0:
                    ml_values[i_to][1].append(d)
            if d <= 0:
                sums[i_to * 2] += -d
                counts[i_to * 2] += 1
            if d >= 0:
                sums[i_to * 2 + 1] += d
                counts[i_to * 2 + 1] += 1
        counts[counts == 0] = 1
        features.append(sums / counts)
        if label == 0:
            targets.append(1)  # cannot-link -> class 1 ("do not cluster")
        elif label == 1:
            targets.append(0)
        else:
            raise Exception(f"Label must be 0 (cannot-link) or 1 (must-link): {label}")
    if classifier is None:
        classifier = DecisionTreeClassifier
    features = np.array(features)
    targets = np.array(targets)
    if patternlen is not None:
        cl_values, clfs, importances = dt_windows(
            features, targets, classifier, patternlen, max_clfs, min_ig, min_purity
        )
    else:
        cl_values, clfs, importances = dt_onewindow(
            features, targets, classifier, max_clfs, min_ig, min_purity
        )
    return ml_values, cl_values, clfs, importances


def compute_weights_using_dt(series, labels, prototypeidx, **kwargs):
    """series + labels -> weight array for the prototype (reference
    dtw_weighted.py:155-168): mine ml/cl values, derive the profile."""
    ml_values, cl_values, _clfs, importances = series_to_dt(
        series, labels, prototypeidx, **kwargs
    )
    weights = compute_weights_from_mlclvalues(
        series[prototypeidx], ml_values, cl_values, **kwargs
    )
    return weights, importances
