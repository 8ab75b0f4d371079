"""LocalConcurrences (LoCo): recurring-pattern mining via affinity DP.

Reference subsequence/localconcurrences.py:328-905 (based on §7.3.2 of
Müller, Fundamentals of Music Processing): the self/cross similarity
matrix is thresholded (tau) and penalized (delta/delta_factor), an
accumulating max-DP builds the score matrix, and concurrent paths are
extracted best-first with negativization masking.

Parity notes: the warping-paths matrix and best_path match the
reference's pure-Python implementation; the reference's own
kbest_matches requires its compiled loco_cc (BufferedArgMax), so the
extraction loop here is verified behaviorally (planted motifs) instead.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

INF = float("inf")

STEPS = {
    "TypeI": ((1, 1), (0, 1), (1, 0)),
    "TypeIII": ((1, 1), (1, 2), (2, 1)),
    "Diagonal": ((1, 1),),
}
STEPS_DEFAULT = "TypeIII"


def loco_warping_paths(
    s1,
    s2,
    gamma: float = 1,
    tau: float = 0,
    delta: float = 0,
    delta_factor: float = 1,
    penalty: float = 0,
    window: Optional[int] = None,
    only_triu: bool = False,
    steps_type: str = STEPS_DEFAULT,
) -> Tuple[float, np.ndarray]:
    """Affinity-accumulating DP with configurable step set (reference
    loco_warping_paths, localconcurrences.py:976-1040)."""
    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    r, c = len(s1), len(s2)
    steps = STEPS[steps_type]
    if window is None or window == 0:
        window = max(r, c)
    penalties = np.array([penalty if sr != sc else 0.0 for sr, sc in steps])
    pad_r = max(sr for sr, _ in steps)
    pad_c = max(sc for _, sc in steps)
    # padded score grid: top/left margin holds the 0 boundary, the rest
    # starts at -inf so out-of-band predecessors never win a max
    wps = np.full((r + pad_r, c + pad_c), -INF)
    wps[:pad_r, :pad_c] = 0
    # every step of the default ladder reaches at least one row back,
    # so each row's band depends only on finished rows and the whole
    # band computes as one vector op; a step set with an in-row move
    # (TypeI's (0,1)) creates a left-to-right chain instead and takes
    # the sequential path
    rows_independent = all(sr >= 1 for sr, _ in steps)
    shift = max(0, r - c)
    grow = max(0, c - r)
    for i in range(r):
        lo = max(0, i - shift - window + 1)
        if only_triu:
            lo = max(i, lo)
        hi = min(c, i + grow + window)
        if lo >= hi:
            continue
        if rows_independent:
            js = np.arange(lo, hi)
            aff = np.exp(-gamma * (s1[i] - s2[js]) ** 2)
            best_prev = np.full(hi - lo, -INF)
            for (sr, sc), p in zip(steps, penalties):
                np.maximum(
                    best_prev, wps[i + pad_r - sr, js + pad_c - sc] - p, out=best_prev
                )
            scored = np.where(aff < tau, delta + delta_factor * best_prev, aff + best_prev)
            wps[i + pad_r, js + pad_c] = np.maximum(0.0, scored)
        else:
            for j in range(lo, hi):
                aff = math.exp(-gamma * (s1[i] - s2[j]) ** 2)
                best_prev = max(
                    wps[i + pad_r - sr, j + pad_c - sc] - p
                    for (sr, sc), p in zip(steps, penalties)
                )
                if aff < tau:
                    cell = delta + delta_factor * best_prev
                else:
                    cell = aff + best_prev
                wps[i + pad_r, j + pad_c] = max(0.0, cell)
    return 0.0, wps


class LocalConcurrences:
    def __init__(
        self,
        series1,
        series2=None,
        gamma: float = 1,
        tau: float = 0,
        delta: float = 0,
        delta_factor: float = 1,
        # NOTE the reference documents only_triu=None -> True for
        # self-comparison, but its signature defaults to False, making
        # that branch dead (localconcurrences.py:329,369-372); we match
        # the actual behavior
        only_triu: Optional[bool] = False,
        penalty: float = 0,
        window: Optional[int] = None,
        steps_type: str = STEPS_DEFAULT,
    ):
        self.series1 = np.asarray(series1, dtype=np.float64)
        if series2 is None:
            self.series2 = self.series1
            self.only_triu = True if only_triu is None else only_triu
        else:
            self.series2 = np.asarray(series2, dtype=np.float64)
            self.only_triu = False if only_triu is None else only_triu
        self.gamma = gamma
        self.tau = tau
        self.delta = delta
        self.delta_factor = delta_factor
        self.penalty = penalty
        self.window = window
        self.steps_type = steps_type
        self.steps_tuples = STEPS[steps_type]
        sr, sc = zip(*self.steps_tuples)
        self.inf_rows = max(sr)
        self.inf_cols = max(sc)
        self._wp: Optional[np.ndarray] = None

    # -- settings estimators (localconcurrences.py:397-478) --------------
    def estimate_settings_from_std(self, series, tau_std: float = 0.33):
        return self.estimate_settings(series, tau_factor=tau_std, tau_type="std")

    def estimate_settings_from_mean(self, series, tau_mean: float = 0.33):
        return self.estimate_settings(series, tau_factor=tau_mean, tau_type="mean")

    def estimate_settings_from_abs(self, series, tau_abs: float = 0.33):
        return self.estimate_settings(series, tau_factor=tau_abs, tau_type="abs")

    def estimate_settings(self, series, tau_factor: float = 0.33, tau_type: str = "mean",
                          gamma: Optional[float] = None):
        if tau_type != "abs":
            if series is None:
                diffm = 1
            elif tau_type == "std":
                diffm = float(np.std(series))
            elif tau_type == "mean":
                diffm = float(np.mean(series))
            else:
                diffm = 1
            if gamma is None:
                self.gamma = 1 / diffm**2
            else:
                self.gamma = gamma
            diffp = tau_factor * diffm if tau_factor is not None else diffm
        else:
            diffp = tau_factor
        self.tau = math.exp(-self.gamma * diffp**2)
        self.delta = -2 * self.tau
        self.delta_factor = 0.90
        self.penalty = self.tau / 10

    def estimate_settings_from_ssm(self, rho: float, set_penalty: bool = False,
                                   set_gamma: bool = False):
        sdm = np.subtract.outer(self.series1, self.series2)
        if set_gamma:
            sdm_mean = float(np.mean(np.abs(sdm)))
            self.gamma = 1 if sdm_mean == 0 else 1 / sdm_mean**2
        ssm = np.exp(-self.gamma * np.power(sdm, 2))
        if self.only_triu:
            self.tau = float(np.quantile(ssm[np.triu_indices(len(ssm))], rho))
        else:
            self.tau = float(np.quantile(ssm, rho))
        self.delta = -2 * self.tau
        self.delta_factor = 0.5
        if set_penalty:
            self.penalty = self.tau

    # -- alignment --------------------------------------------------------
    def align(self):
        if self._wp is not None:
            return
        _, wp = loco_warping_paths(
            self.series1,
            self.series2,
            gamma=self.gamma,
            tau=self.tau,
            delta=self.delta,
            delta_factor=self.delta_factor,
            only_triu=self.only_triu,
            penalty=self.penalty,
            window=self.window,
            steps_type=self.steps_type,
        )
        self._wp = wp
        self._reset_wp_mask()

    def _reset_wp_mask(self):
        wp = self._wp
        if self.window is None:
            np.abs(wp, out=wp)
            wp[np.isinf(wp)] = -np.inf
        else:
            wd1 = max(0, wp.shape[1] - wp.shape[0])
            wd2 = max(0, wp.shape[0] - wp.shape[1])
            il = np.tril_indices(n=wp.shape[0], k=-1 - self.window - wd2, m=wp.shape[1])
            wp[il] = -np.abs(wp[il])
            il = np.triu_indices(n=wp.shape[0], k=-self.window - wd2, m=wp.shape[1])
            wp[il] = np.abs(wp[il])
            il = np.triu_indices(n=wp.shape[0], k=1 + self.window + wd1, m=wp.shape[1])
            wp[il] = -np.abs(wp[il])
            wp[np.isinf(wp)] = -np.inf
        # NaN cells (0 * -inf in the affinity DP when delta_factor == 0)
        # compare False against every guard: argmax would re-select them
        # forever in best_matches (round-5 review finding) — mask them
        wp[np.isnan(wp)] = -np.inf
        if self.only_triu:
            il = np.tril_indices(self._wp.shape[0], k=-1)
            wp[il] = -np.inf

    @property
    def wp(self) -> np.ndarray:
        self.align()
        return self._wp

    def best_path(self, row: int, col: int) -> List[Tuple[int, int]]:
        """Concurrent path from (row, col) back to score 0.

        Reference localconcurrences.py:802-870 pure-Python semantics,
        with one guard the reference lacks: its loop runs `while i > 0`
        so for pad offsets > 1 (TypeIII) a penalty-funded step onto a
        zero-initialized pad cell lands at i (or j) == 1 and the next
        append emits a NEGATIVE series coordinate, which best_matches
        then masks through Python negative-index wraparound (round-5
        review finding; the reference's own post-loop `assert False` at
        localconcurrences.py:849-850 documents the case as invalid, and
        its compiled path bounds the walk at the pad offsets,
        dd_loco.c). Here the walk simply ends before entering a pad
        row/column — identical to the reference everywhere it produces
        valid output."""
        wp = self.wp
        penalties = [self.penalty if sr != sc else 0 for sr, sc in self.steps_tuples]
        i, j = row, col
        p = []
        while i > 0 and j > 0:
            if i < self.inf_rows or j < self.inf_cols:
                break  # inside the pad rows: never emit negative coords
            p.append((i - self.inf_rows, j - self.inf_cols))
            values = []
            for (si, sj), penalty in zip(self.steps_tuples, penalties):
                if wp[i - si, j - sj] >= 0:
                    values.append(wp[i - si, j - sj] + penalty)
                else:
                    values.append(-1)
            c = int(np.argmax(values))
            if values[c] <= 0:
                break
            i -= self.steps_tuples[c][0]
            j -= self.steps_tuples[c][1]
        p.reverse()
        return p

    def best_matches(self, k: Optional[int] = 1, minlen: int = 2, buffer: int = 0,
                     restart: bool = True):
        """Yield dicts {row, col, path, value}, best-first, masking used
        cells (and an optional buffer) negative so matches don't overlap
        (reference localconcurrences.py:682-799; the reference's own
        loop needs its compiled loco_cc, so this is a pure re-expression
        of the same masking semantics)."""
        self.align()
        wp = self._wp
        if restart:
            self._reset_wp_mask()
        ki = 0
        while k is None or ki < k:
            lcm = None
            while lcm is None:
                idx = np.unravel_index(int(np.argmax(wp)), wp.shape)
                r, c = int(idx[0]), int(idx[1])
                # `not (v > 0)` instead of `v <= 0`: NaN fails both
                # comparisons and would loop forever (round-5 review)
                if r == 0 or c == 0 or not (wp[r, c] > 0):
                    return
                path = self.best_path(r, c)
                if not path:
                    # crossing-drop produced an empty path: mask the seed
                    # cell or argmax re-selects it forever
                    wp[r, c] = -abs(wp[r, c])
                    continue
                ok = True
                for (x, y) in path:
                    x += self.inf_rows
                    y += self.inf_cols
                    if wp[x, y] < 0:
                        ok = False
                        break
                    wp[x, y] = -abs(wp[x, y])
                if not ok:
                    lcm = None
                    continue
                if len(path) < minlen:
                    lcm = None
                    continue
                lcm = {"row": r, "col": c, "path": path,
                       "value": float(sum((self.series1[a] - self.series2[b]) ** 2
                                          for a, b in path))}
            if buffer > 0:
                for p_idx, (x, y) in enumerate(lcm["path"]):
                    x += self.inf_rows
                    y += self.inf_cols
                    if p_idx < buffer:
                        cb = p_idx + 1
                    elif p_idx > len(lcm["path"]) - buffer:
                        cb = len(lcm["path"]) - p_idx
                    else:
                        cb = buffer
                    x_l = max(self.inf_rows, x - cb)
                    x_r = min(x + cb + 1, wp.shape[0])
                    y_l = max(self.inf_cols, y - cb)
                    y_r = min(y + cb + 1, wp.shape[1])
                    wp[x_l:x_r, y_l:y_r] = -np.abs(wp[x_l:x_r, y_l:y_r])
            ki += 1
            yield lcm

    def kbest_matches(self, k: int = 1, **kwargs):
        return self.best_matches(k=k, **kwargs)


def local_concurrences(series1, series2=None, gamma=1, tau=0, delta=0, delta_factor=1,
                       estimate_settings=None, only_triu=None, penalty=0, window=None):
    """Convenience constructor mirroring the reference's
    local_concurrences() (localconcurrences.py:64-91): optional
    'delta'/'tau_std'-style estimate_settings string."""
    lc = LocalConcurrences(series1, series2, gamma=gamma, tau=tau, delta=delta,
                           delta_factor=delta_factor, only_triu=only_triu,
                           penalty=penalty, window=window)
    if estimate_settings is not None:
        lc.estimate_settings_from_std(lc.series1, tau_std=float(estimate_settings))
    lc.align()
    return lc
