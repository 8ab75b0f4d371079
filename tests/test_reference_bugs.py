"""Regression pins ported from the reference's own bug suite
(reference tests/test_bugs.py — inputs and expected values only; all
assertions run against OUR kernels, with the reference library as a
live cross-check where its pure-Python path supports the case).

These encode the reference's subtlest boundary behaviors: max_dist /
max_step early-abandon flipping to inf, psi-relaxation with per-part
[b1, e1, b2, e2] lists, and the documented float-tie best_path quirk
(test_bug5: rounding makes the left move beat the diagonal).
"""

import numpy as np
import pytest

from dtaidistance_ray import DTWSettings
from dtaidistance_ray.kernels import best_path, distance, warping_paths
from dtaidistance_ray.kernels.pairs_batch import batched_pair_distances

ref_dtw = pytest.importorskip("dtaidistance.dtw")

S1A = np.array([0.0, 0.01, 0.0, 0.01, 0.0, 0.0, 0.0, 0.01, 0.01, 0.02, 0.0, 0.0])
S2A = np.array([0.0, 0.02, 0.02, 0.0, 0.0, 0.01, 0.01, 0.0, 0.0, 0.0, 0.0])
S1B = np.array([0.0, 0.0, 2.0, 1.0, 1.0, 0.0, 0.0])
S2B = np.array([0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0])


class TestDistanceBugs:
    def test_distance1_window(self):
        # ref test_distance1_a/b: window=3 and unconstrained both 0.02
        assert distance(S1A, S2A, DTWSettings(window=3)) == pytest.approx(0.02)
        d = distance(S1A, S2A)
        assert d == pytest.approx(0.02)
        dw, _ = warping_paths(S1A, S2A)
        assert dw == pytest.approx(d)

    def test_distance2_max_dist(self):
        # ref test_distance2_a/aa: loose max_dist keeps the value,
        # tight max_dist flips to inf
        assert distance(S1B, S2B, DTWSettings(max_dist=1.1)) == pytest.approx(1.0)
        assert np.isinf(distance(S1B, S2B, DTWSettings(max_dist=0.1)))

    def test_distance2_max_step(self):
        # ref test_distance2_b/bb: max_step skips cells; tight -> inf
        assert distance(S1B, S2B, DTWSettings(max_step=1.1)) == pytest.approx(1.0)
        assert np.isinf(distance(S1B, S2B, DTWSettings(max_step=0.1)))

    def test_distance2_plain(self):
        assert distance(S1B, S2B) == pytest.approx(1.0)

    def test_distance3_penalty_max_step_window(self):
        # ref test_distance3_a: penalty + max_step + window combined
        s = np.zeros(48)
        s[13:18] = [0.005, 0.01, 0.015, 0.02, 0.01]
        p = np.zeros(47)
        p[12:17] = [0.005, 0.01, 0.015, 0.02, 0.01]
        kw = dict(penalty=0.005, max_step=0.011, window=3)
        ours = distance(s, p, DTWSettings(**kw))
        theirs = ref_dtw.distance(s, p, **kw)
        assert ours == pytest.approx(theirs)

    def test_bug1_mixed_length_matrix(self):
        # ref test_bug1: distance matrix over different-length series
        series = [
            np.array([0, 0, 1, 2, 1, 0, 1, 0, 0], dtype=np.double),
            np.array([0.0, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0]),
            np.array([0.0, 0, 1, 2, 1, 0, 0, 0]),
        ]
        pairs = [(0, 1), (0, 2), (1, 2)]
        got = batched_pair_distances(
            [series[a] for a, b in pairs], [series[b] for a, b in pairs], DTWSettings()
        )
        want = [ref_dtw.distance(series[a], series[b]) for a, b in pairs]
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_bug1_psi_matrix(self):
        # ref test_bug1_psi: psi=1 compact matrix parity
        s = [
            np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0]),
            np.array([9.0, 0, 1, 2, 1, 0, 1, 0, 9]),
        ]
        ours = distance(s[0], s[1], DTWSettings(psi=1))
        theirs = ref_dtw.distance_matrix(s, compact=True, psi=1)[0]
        assert ours == pytest.approx(theirs)

    def test_bug4_psi_window_value(self):
        # ref test_bug4: pinned literal 0.6305018693852942
        x = np.arange(0, 13, 0.5)
        s1 = np.sin(x)
        s2 = np.sin(x - 1)
        import random

        random.seed(1)
        for idx in range(len(s2)):
            if random.random() < 0.05:
                s2[idx] += (random.random() - 0.5) / 2
        want = 0.6305018693852942
        d1, _ = warping_paths(s1, s2, DTWSettings(window=10, psi=1), psi_neg=False)
        d3 = distance(s1, s2, DTWSettings(window=10, psi=1))
        assert d1 == pytest.approx(want)
        assert d3 == pytest.approx(want)

    def test_bug5_path_float_tie(self):
        # ref test_bug5_path: documented float-tie quirk — moving left
        # from (1,3) beats the diagonal because 0.9999999999999996 < 1.
        s1 = np.array([2.1, 4.1, 5.1])
        s2 = np.array([1.1, 2.1, 3.1, 4.1, 5.1])
        psi = [0, 0, len(s2), len(s2)]
        d, wps = warping_paths(s1, s2, DTWSettings(psi=psi))
        got = best_path(wps)
        dr, wr = ref_dtw.warping_paths(s1, s2, psi=psi)
        want = ref_dtw.best_path(wr)
        assert d == pytest.approx(dr)
        assert got == want == [(0, 1), (1, 2), (1, 3), (2, 4)]

    def test_bug6_psi_parts(self):
        # ref test_bug6: per-part psi [b1, e1, b2, e2]
        s1 = np.array([0.0, 1.0])
        s2 = np.array([0.0, 0.0])
        for psi, want in [([0, 1, 0, 0], 0.0), ([0, 0, 0, 1], 1.0)]:
            d, _ = warping_paths(s1, s2, DTWSettings(psi=psi))
            assert d == pytest.approx(want), psi
            assert distance(s1, s2, DTWSettings(psi=psi)) == pytest.approx(want), psi

    def test_bug_size_long_series(self):
        # ref test_bug_size (shrunk 1500->700 for CI time): long-series
        # warping_paths and distance must agree
        rng = np.random.default_rng(0)
        s1 = rng.random(700)
        s2 = rng.random(700)
        d1, _ = warping_paths(s1, s2)
        d2 = distance(s1, s2)
        assert d1 == pytest.approx(d2)

    def test_bug2_max_dist_value_neutral_when_loose(self):
        # ref test_bug2 semantics: a max_dist ABOVE the true distance
        # changes nothing, in both distance and warping_paths
        rng = np.random.default_rng(3)
        s1 = np.cumsum(rng.normal(scale=0.05, size=70)) + 0.5
        s2 = np.cumsum(rng.normal(scale=0.05, size=70)) + 0.5
        d0 = distance(s1, s2)
        md = d0 * 1.3
        assert distance(s1, s2, DTWSettings(max_dist=md)) == pytest.approx(d0)
        d1, _ = warping_paths(s1, s2)
        d2, _ = warping_paths(s1, s2, DTWSettings(max_dist=md))
        assert d1 == pytest.approx(d0)
        assert d2 == pytest.approx(d0)
