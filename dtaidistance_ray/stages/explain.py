"""Warping-path explanation via Dynamic Subsequence Warping (DSW).

Reimplements the core of the reference's ExplainPair
(explain/dsw/explainpair.py:310-1260; the algorithm is published in
Lin, Meert, Robberechts, Blockeel, "Warping and Matching Subsequences
Between Time Series", arXiv:2506.15452): the optimal warping path is
simplified into a handful of straight segments — each read as a
(shift, compression/expansion) explanation — such that the DTW cost of
the piecewise-linear path stays within a user tolerance of the optimal
cost.

Pipeline: warping path -> cost-aware top-down RDP (split at the point
farthest from the straight segment while the segment's Bresenham-line
cost exceeds the tolerance criterion) -> bottom-up merge pruning ->
segments with shift / expansion deltas.

Tolerance criterion (per candidate segment, approx_local): accept when

    cost(line) <= max(cost(path part) * (1 + ub_m),
                      cost(path part) + len(path part) * ub_a)

with (ub_m, ub_a) derived from the approx type exactly as the
reference derives them (delta_rel scales with the optimal distance,
delta_abs amortizes an absolute distance allowance over the path).

Implemented approx types: max_factor, max_factor_and_diff (default),
max_diff, max_dist, max_index (plain spatial RDP). Split strategies:
spatialdist (default), pathdiff, deriv, derivdist. Plotting is out of
scope.

Value parity with the reference implementation is asserted in
tests/test_explain.py across types and tolerances.
"""

from __future__ import annotations

import heapq
from bisect import bisect_left
from collections import defaultdict, deque
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..kernels.elastic import warping_path
from ..settings import DTWSettings
from .pool import auto_pool


def _inner_sq(a: float, b: float) -> float:
    d = a - b
    return d * d


def _cost2dist(c: float) -> float:
    return float(np.sqrt(c))


def _dist2cost(d: float) -> float:
    return d * d


@dataclass
class PathSegment:
    """One straight piece of the simplified path, in series indices:
    rows (series_from) s_idx..e_idx map to cols (series_to)
    s_idx_y..e_idx_y. shift is measured at the segment midpoint;
    expansion > 0 means series_from stretches, < 0 compresses."""

    s_idx: int
    e_idx: int
    s_idx_y: int
    e_idx_y: int
    s_idx_p: int  # path-point index range backing this segment
    e_idx_p: int

    @property
    def angle(self) -> float:
        dx = self.e_idx - self.s_idx
        dy = self.e_idx_y - self.s_idx_y
        return float(np.pi / 2) if dx == 0 else float(np.arctan(dy / dx))

    @property
    def shift(self) -> int:
        return round((self.s_idx_y + self.e_idx_y) / 2 - (self.s_idx + self.e_idx) / 2)

    @property
    def elasticity(self) -> int:
        """Signed: > 0 expansion, < 0 compression."""
        return (self.e_idx_y - self.s_idx_y) - (self.e_idx - self.s_idx)

    @property
    def expansion(self) -> int:
        return 0 if self.elasticity < 0 else self.elasticity

    @property
    def compression(self) -> int:
        return 0 if self.elasticity > 0 else -self.elasticity

    @property
    def shift_l(self) -> int:
        return 0 if self.shift > 0 else -self.shift

    @property
    def shift_r(self) -> int:
        return 0 if self.shift < 0 else self.shift

    @property
    def length(self) -> int:
        return self.e_idx - self.s_idx


class ExplainPair:
    def __init__(
        self,
        series_from,
        series_to,
        approx_type: str = "max_factor_and_diff",
        delta_rel: float = 1,
        delta_abs: Optional[float] = None,
        approx_prune: bool = True,
        approx_local: bool = True,
        split_strategy: str = "spatialdist",
        onlychanges: Optional[int] = None,
        path: Optional[list] = None,
        dtw_settings: Optional[DTWSettings] = None,
    ):
        self.series_from = np.asarray(series_from, dtype=np.float64)
        self.series_to = np.asarray(series_to, dtype=np.float64)
        self.approx_type = str(approx_type).lower()
        self.delta_rel = delta_rel
        self.delta_abs = 0.1 if delta_abs is None else delta_abs
        self.approx_prune = approx_prune
        self.approx_local = approx_local
        self.split_strategy = str(split_strategy).lower()
        self.onlychanges = onlychanges
        self.dtw_settings = dtw_settings or DTWSettings()
        if path is None:
            path = warping_path(self.series_from, self.series_to, self.dtw_settings)
        self.path = path
        self.segments, self.line2 = self._build_segments()
        self._variations = None

    # -- cost helpers -----------------------------------------------------

    def _line_cost(self, p0, p1, include_begin=True, include_end=True) -> Tuple[float, int]:
        """Cost of the Bresenham discretization of the straight segment
        p0 -> p1 through the pair-cost matrix (monotone direction)."""
        sf, st = self.series_from, self.series_to
        d_f = p1[0] - p0[0]
        d_t = -(p1[1] - p0[1])
        err = d_f + d_t
        i, j = int(p0[0]), int(p0[1])
        ie, je = int(p1[0]), int(p1[1])
        total = 0.0
        n = 0
        while True:
            total += _inner_sq(sf[i], st[j])
            n += 1
            if i == ie and j == je:
                break
            e2 = 2 * err
            if e2 >= d_t:
                err += d_t
                i += 1
            if e2 <= d_f:
                err += d_f
                j += 1
        if not include_begin:
            total -= _inner_sq(sf[int(p0[0])], st[int(p0[1])])
            n -= 1
        if not include_end:
            total -= _inner_sq(sf[ie], st[je])
            n -= 1
        return total, n

    def _tolerance_factors(self, ccost: float, length: int) -> Tuple[float, float]:
        """(relative, absolute) per-segment allowances for the chosen
        approx type; the absolute allowance amortizes delta_abs over
        the full path length."""
        t = self.approx_type
        if t in ("max_factor", "max_factor_loose", "max_factor_and_diff"):
            if ccost == 0.0:
                ub_m = 0.0
            else:
                ub_m = _dist2cost(_cost2dist(ccost) * self.delta_rel) / ccost
        else:
            ub_m = 0.0
        if t == "max_factor":
            ub_a = 0.0
        elif t == "max_factor_loose":
            ub_a = (
                _dist2cost(_cost2dist(ccost) * (1 + self.delta_rel * self.delta_abs)) - ccost
            ) / length
        elif t == "max_factor_and_diff":
            ub_a = (_dist2cost(_cost2dist(ccost) + self.delta_abs) - ccost) / length
        elif t == "max_diff":
            ub_a = (_dist2cost(_cost2dist(ccost) + self.delta_abs) - ccost) / length
        elif t in ("max_dist", "max_index"):
            ub_a = (_dist2cost(self.delta_abs) - ccost) / length
        else:
            raise ValueError(f"Unknown approximation type: {self.approx_type}")
        return ub_m, ub_a

    @staticmethod
    def _farthest_point(points: np.ndarray, i0: int, i1: int) -> int:
        """Index in (i0, i1) of the path point farthest from the
        straight segment (closest-point distance, ends clamped).

        Operation order mirrors the reference scalar loop exactly
        (norm-then-square denominator, elementwise products, sqrt of
        squared sums) so exact deviation TIES break identically —
        vectorized-but-differently-rounded math picked a different
        split point on tied integer paths."""
        p0 = points[i0].astype(np.float64)
        p1 = points[i1].astype(np.float64)
        seg = points[i0:i1].astype(np.float64)
        if np.allclose(p0, p1):
            dx = seg[:, 0] - p0[0]
            dy = seg[:, 1] - p0[1]
            dist = np.sqrt(dx**2 + dy**2)
        else:
            nsq = float(np.linalg.norm(p1 - p0)) ** 2
            tpar = (
                (seg[:, 0] - p0[0]) * (p1[0] - p0[0])
                + (seg[:, 1] - p0[1]) * (p1[1] - p0[1])
            ) / nsq
            px = p0[0] + tpar * (p1[0] - p0[0])
            py = p0[1] + tpar * (p1[1] - p0[1])
            dx = seg[:, 0] - px
            dy = seg[:, 1] - py
            dist = np.sqrt(dx**2 + dy**2)
            lo = tpar < 0
            hi = tpar > 1
            if lo.any():
                dist[lo] = np.sqrt(
                    (seg[lo, 0] - p0[0]) ** 2 + (seg[lo, 1] - p0[1]) ** 2
                )
            if hi.any():
                dist[hi] = np.sqrt(
                    (seg[hi, 0] - p1[0]) ** 2 + (seg[hi, 1] - p1[1]) ** 2
                )
        return i0 + int(np.argmax(dist))

    # -- split-point selection -------------------------------------------

    def _deriv1(self, points: np.ndarray, h: int = 1) -> np.ndarray:
        """First derivative of the |cost| surface at each path point
        (max over the centered differences in both axes; border points
        fall back to clamped one-sided differences). Zero values are
        floored to 10% of the max so distance still matters in the
        Taylor mix."""
        sf, st = self.series_from, self.series_to
        fi_m = len(sf) - h - 1
        ti_m = len(st) - h - 1
        ders = np.zeros(len(points))
        for idx, (fi, ti) in enumerate(points):
            c = abs(sf[fi] - st[ti])
            lo_t, hi_t = max(0, ti - h), min(ti_m, ti + h)
            lo_f, hi_f = max(0, fi - h), min(fi_m, fi + h)
            ders[idx] = abs(
                max(
                    abs(c - abs(sf[fi] - st[lo_t])) / h,
                    abs(c - abs(sf[fi] - st[hi_t])) / h,
                    abs(c - abs(sf[lo_f] - st[ti])) / h,
                    abs(c - abs(sf[hi_f] - st[ti])) / h,
                )
            )
        floor = np.max(ders) * 0.1
        ders[ders < floor] = floor
        return ders

    def _deriv2(self, points: np.ndarray, h: int = 1) -> np.ndarray:
        """Second derivative (centered differences along each axis,
        max of |axis values|; clamped at borders)."""
        sf, st = self.series_from, self.series_to
        fi_m = len(sf) - h - 1
        ti_m = len(st) - h - 1
        ders = np.zeros(len(points))
        for idx, (fi, ti) in enumerate(points):
            c = abs(sf[fi] - st[ti])
            lo_t, hi_t = max(0, ti - h), min(ti_m, ti + h)
            lo_f, hi_f = max(0, fi - h), min(fi_m, fi + h)
            ders[idx] = abs(
                max(
                    abs(abs(sf[fi] - st[lo_t]) + abs(sf[fi] - st[hi_t]) - 2 * c) / h**2,
                    abs(abs(sf[hi_f] - st[ti]) + abs(sf[lo_f] - st[ti]) - 2 * c) / h**2,
                )
            )
        return ders

    def _split_pathdiff(self, points: np.ndarray, i0: int, i1: int) -> int:
        """Largest cost increase when projecting the path point onto
        the straight segment (horizontal and vertical projections)."""
        sf, st = self.series_from, self.series_to
        p0, p1 = points[i0], points[i1]
        s_tf = (p1[1] - p0[1]) / (p1[0] - p0[0])
        s_ft = (p1[0] - p0[0]) / (p1[1] - p0[1])
        max_f = len(sf) - 1
        max_t = len(st) - 1
        best, best_idx = 0.0, i0
        for idx in range(i0 + 1, i1):
            fi, ti = points[idx]
            c_o = _inner_sq(sf[fi], st[ti])
            lf = min(int(s_tf * (ti - p0[1]) + p0[0]), max_f)
            diff = _inner_sq(sf[lf], st[ti]) - c_o
            lt = min(int(s_ft * (fi - p0[0]) + p0[1]), max_t)
            diff = max(diff, _inner_sq(sf[fi], st[lt]) - c_o)
            if diff > best:
                best, best_idx = diff, idx
        return best_idx

    def _split_deriv(self, ders2: np.ndarray, i0: int, i1: int) -> int:
        best, best_idx = 0.0, i0
        for idx in range(i0 + 1, i1):
            if ders2[idx] > best:
                best, best_idx = ders2[idx], idx
        return best_idx

    def _split_derivdist(
        self, ders1: np.ndarray, ders2: np.ndarray, points: np.ndarray, i0: int, i1: int
    ) -> int:
        """Second-order Taylor mix of spatial deviation with the local
        cost derivatives: score = d1*dist + d2*dist^2/2."""
        p0 = points[i0].astype(np.float64)
        p1 = points[i1].astype(np.float64)
        nsq = float(np.linalg.norm(p1 - p0)) ** 2
        best, best_idx = 0.0, i0
        for idx in range(i0, i1):
            p = points[idx].astype(np.float64)
            if np.allclose(p0, p1):
                dist = float(np.linalg.norm(p - p0))
            else:
                t = ((p[0] - p0[0]) * (p1[0] - p0[0]) + (p[1] - p0[1]) * (p1[1] - p0[1])) / nsq
                if t < 0:
                    dist = float(np.linalg.norm(p - p0))
                elif t > 1:
                    dist = float(np.linalg.norm(p - p1))
                else:
                    pt = np.array([p0[0] + t * (p1[0] - p0[0]), p0[1] + t * (p1[1] - p0[1])])
                    dist = float(np.linalg.norm(p - pt))
            score = ders1[idx] * dist + 0.5 * ders2[idx] * dist**2
            if score > best:
                best, best_idx = score, idx
        return best_idx

    def _make_split_selector(self, points: np.ndarray):
        if self.split_strategy == "spatialdist":
            return lambda i0, i1: self._farthest_point(points, i0, i1)
        if self.split_strategy == "pathdiff":
            return lambda i0, i1: self._split_pathdiff(points, i0, i1)
        if self.split_strategy == "deriv":
            ders2 = self._deriv2(points)
            return lambda i0, i1: self._split_deriv(ders2, i0, i1)
        if self.split_strategy == "derivdist":
            ders1 = self._deriv1(points)
            ders2 = self._deriv2(points)
            return lambda i0, i1: self._split_derivdist(ders1, ders2, points, i0, i1)
        raise AttributeError(f"Unknown split strategy: {self.split_strategy}")

    # -- simplification ---------------------------------------------------

    def _simplify(self, points: np.ndarray) -> List[int]:
        n = len(points)
        sf, st = self.series_from, self.series_to
        ccostv = np.cumsum(
            [(sf[i] - st[j]) ** 2 for i, j in points]
        )
        ccost_o = float(ccostv[-1])
        if self.approx_type == "max_index":
            keep = _rdp_spatial(points, self.delta_abs)
        else:
            split_at = self._make_split_selector(points)
            ub_m, ub_a = self._tolerance_factors(ccost_o, n)
            keep = set()
            queue = deque([(0, n - 1)])
            while queue:
                i0, i1 = queue.popleft()
                if i1 - i0 <= 1:
                    keep.add(i0)
                    keep.add(i1)
                    continue
                part_cost = float(ccostv[i1] - ccostv[i0])
                part_len = i1 - i0
                line_cost, _ = self._line_cost(
                    points[i0], points[i1], include_begin=False, include_end=True
                )
                allowed = max(part_cost + part_len * ub_a, part_cost * (1 + ub_m))
                if line_cost <= allowed:
                    keep.add(i0)
                    keep.add(i1)
                else:
                    mid = split_at(i0, i1)
                    if mid == i0:
                        mid = i0 + 1
                    queue.append((i0, mid))
                    queue.append((mid, i1))
            keep = sorted(keep)
        if self.approx_prune and self.approx_type != "max_index":
            keep = self._prune(points, list(keep), ccostv)
        return list(keep)

    def _prune(self, points: np.ndarray, idxs: List[int], ccostv: np.ndarray) -> List[int]:
        """Bottom-up merges: drop interior split points while the merged
        segment still satisfies the criterion (smallest spans first)."""
        sf, st = self.series_from, self.series_to
        ccost_o = float(ccostv[-1])
        ub_m, ub_a = self._tolerance_factors(ccost_o, len(points))
        global_ub = self._global_bound(ccost_o)
        kept = sorted(idxs)
        alive = set(kept)

        cache: dict = {}

        def line_cost(a: int, b: int) -> float:
            key = (a, b)
            if key not in cache:
                cache[key] = self._line_cost(
                    points[a], points[b], include_begin=False, include_end=True
                )[0]
            return cache[key]

        ccost_a = sum(line_cost(a, b) for a, b in zip(kept, kept[1:]))
        ccost_a += _inner_sq(sf[-1], st[-1])

        heap = []
        for a, b, c in zip(kept, kept[1:], kept[2:]):
            heapq.heappush(heap, (min(b - a, c - b), (a, b, c)))
        while heap:
            _, (a, b, c) = heapq.heappop(heap)
            if a not in alive or b not in alive or c not in alive:
                continue
            merged = line_cost(a, c)
            if self.approx_local:
                part_cost = float(ccostv[c] - ccostv[a])
                part_len = c - a
                ok = merged <= max(part_cost + part_len * ub_a, part_cost * (1 + ub_m))
            else:
                replaced = line_cost(a, b) + line_cost(b, c)
                ok = ccost_a - replaced + merged < global_ub
                if ok:
                    ccost_a = ccost_a - replaced + merged
            if ok:
                alive.remove(b)
                kept = sorted(alive)
                pos = bisect_left(kept, a)
                if pos > 0:
                    heapq.heappush(
                        heap,
                        (min(a - kept[pos - 1], c - a), (kept[pos - 1], a, c)),
                    )
                pos_c = bisect_left(kept, c)
                if pos_c + 1 < len(kept):
                    heapq.heappush(
                        heap,
                        (min(c - a, kept[pos_c + 1] - c), (a, c, kept[pos_c + 1])),
                    )
        return sorted(alive)

    def _global_bound(self, ccost: float) -> float:
        d = _cost2dist(ccost)
        t = self.approx_type
        if t == "max_factor":
            ub = (self.delta_rel + 1) * d
        elif t == "max_factor_loose":
            ub = ((1 + self.delta_abs) * self.delta_rel + 1) * d
        elif t == "max_factor_and_diff":
            ub = (1 + self.delta_rel) * d + self.delta_abs
        elif t == "max_diff":
            ub = self.delta_abs + d
        elif t in ("max_dist", "max_index"):
            ub = self.delta_abs
        else:
            raise ValueError(f"Unknown approximation type: {t}")
        return _dist2cost(ub)

    def _build_segments(self):
        points = np.asarray(self.path, dtype=np.int64)
        keep = self._simplify(points)
        line2 = points[keep]
        segments: List[PathSegment] = []
        for k in range(len(keep) - 1):
            bp, ep = line2[k], line2[k + 1]
            shift = round((bp[1] + ep[1]) / 2 - (bp[0] + ep[0]) / 2)
            elasticity = (ep[1] - bp[1]) - (ep[0] - bp[0])
            if (
                self.onlychanges is None
                or abs(shift) >= self.onlychanges
                or abs(elasticity) >= self.onlychanges
            ):
                segments.append(
                    PathSegment(
                        int(bp[0]), int(ep[0]), int(bp[1]), int(ep[1]),
                        keep[k], keep[k + 1],
                    )
                )
        return segments, line2

    # -- results ----------------------------------------------------------

    def distance(self) -> float:
        """DTW distance along the ORIGINAL path points backing the
        segments."""
        sf, st = self.series_from, self.series_to
        total = 0.0
        for seg in self.segments:
            for k in range(seg.s_idx_p, seg.e_idx_p):
                i, j = self.path[k]
                total += _inner_sq(sf[i], st[j])
        i, j = self.path[self.segments[-1].e_idx_p]
        total += _inner_sq(sf[i], st[j])
        return _cost2dist(total)

    def distance_approx(self) -> float:
        """DTW distance along the simplified (piecewise-straight)
        path — the quantity the tolerance criterion bounds."""
        sf, st = self.series_from, self.series_to
        total = 0.0
        for seg in self.segments:
            c, _ = self._line_cost(
                (seg.s_idx, seg.s_idx_y), (seg.e_idx, seg.e_idx_y),
                include_begin=True, include_end=False,
            )
            total += c
        last = self.segments[-1]
        total += _inner_sq(sf[last.e_idx], st[last.e_idx_y])
        return _cost2dist(total)

    def segments_to_path(self) -> List[Tuple[int, int]]:
        path: List[Tuple[int, int]] = []
        for seg in self.segments:
            d_f = seg.e_idx - seg.s_idx
            d_t = -(seg.e_idx_y - seg.s_idx_y)
            err = d_f + d_t
            i, j = seg.s_idx, seg.s_idx_y
            while True:
                if i == seg.e_idx and j == seg.e_idx_y:
                    break
                path.append((i, j))
                e2 = 2 * err
                if e2 >= d_t:
                    err += d_t
                    i += 1
                if e2 <= d_f:
                    err += d_f
                    j += 1
        last = self.segments[-1]
        path.append((last.e_idx, last.e_idx_y))
        return path

    @property
    def variations(self) -> np.ndarray:
        if self._variations is None:
            self._variations = self.get_variations()
        return self._variations

    def get_variations(self, on_segments: bool = False) -> np.ndarray:
        """Per series_from index: (max downward, max upward) amplitude
        difference of matched series_to points."""
        path = self.segments_to_path() if on_segments else self.path
        out = np.zeros((len(self.series_from), 2))
        buckets = defaultdict(lambda: ([], []))
        for fi, ti in path:
            v = self.series_to[ti] - self.series_from[fi]
            if v <= 0:
                buckets[fi][0].append(-v)
            if v >= 0:
                buckets[fi][1].append(v)
        for fi, (neg, pos) in buckets.items():
            out[fi] = [max(neg) if neg else 0, max(pos) if pos else 0]
        return out


def _rdp_spatial(points: np.ndarray, epsilon: float) -> List[int]:
    """Plain Ramer-Douglas-Peucker on the path coordinates
    (perpendicular distance), for approx_type='max_index'."""
    queue = deque([(0, len(points) - 1)])
    keep = set()
    while queue:
        i0, i1 = queue.popleft()
        p0 = points[i0].astype(np.float64)
        p1 = points[i1].astype(np.float64)
        seg = points[i0:i1].astype(np.float64)
        if np.allclose(p0, p1):
            dist = np.linalg.norm(seg - p0, axis=1)
        else:
            a = np.abs(
                (seg[:, 0] - p0[0]) * (p1[1] - p0[1])
                - (seg[:, 1] - p0[1]) * (p1[0] - p0[0])
            )
            dist = a / np.linalg.norm(p1 - p0)
        imax = int(np.argmax(dist))
        if dist[imax] > epsilon:
            queue.append((i0, i0 + imax))
            queue.append((i0 + imax, i1))
        else:
            keep.add(i0)
            keep.add(i1)
    result = sorted(keep)
    # tilt vertical segments by one time index (right if possible, else
    # left) so every segment advances in series_from — same fix-up as
    # the reference's rdp_vectorized tail
    snap = points[result]
    if snap[-2, 0] == snap[-1, 0]:
        if snap[-3, 0] == snap[-2, 0] - 1:
            result.pop(-2)
        else:
            result[-2] = result[-2] - 1
    for i in range(len(result) - 2, 0, -1):
        if snap[i, 0] == snap[i - 1, 0]:
            if snap[i + 1, 0] == snap[i, 0] + 1:
                result.pop(i)
            else:
                result[i] = result[i] + 1
    return result


def explain_pairs_dataset(pairs, **kwargs):
    """Ray stage: explain many (series_from, series_to) pairs — one
    PathSegment row set per pair via map_batches (actor-pool friendly;
    each pair's explanation is independent)."""
    import pandas as pd

    def explain_batch(batch: "pd.DataFrame") -> "pd.DataFrame":
        rows = []
        for pid, a, b in zip(batch["pair_id"], batch["series_from"], batch["series_to"]):
            ep = ExplainPair(np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64), **kwargs)
            for s in ep.segments:
                rows.append(
                    {
                        "pair_id": int(pid),
                        "s_idx": s.s_idx,
                        "e_idx": s.e_idx,
                        "s_idx_y": s.s_idx_y,
                        "e_idx_y": s.e_idx_y,
                        "shift": int(s.shift),
                        "elasticity": int(s.elasticity),
                    }
                )
        cols = ["pair_id", "s_idx", "e_idx", "s_idx_y", "e_idx_y", "shift", "elasticity"]
        return pd.DataFrame(rows, columns=cols)

    # plain function -> task pool (Ray autoscales tasks; tuple
    # concurrency is only valid for callable-class actor pools)
    return pairs.map_batches(explain_batch, batch_format="pandas")
