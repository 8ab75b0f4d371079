"""Mirrors of the reference's own golden test cases (its test files'
exact expected values) run against OUR engine — the strongest parity
evidence (SURVEY.md §5)."""

import math

import numpy as np
import pytest

from dtaidistance_ray import DTWSettings
from dtaidistance_ray.kernels import best_path, distance, warping_path, warping_paths
from dtaidistance_ray.stages.clustering import Hierarchical, HierarchicalTree


class TestDtwGoldens:
    def test_distance1(self):
        # reference tests/test_dtw.py:53-57
        s1 = [0, 0, 1, 2, 1, 0, 1, 0, 0]
        s2 = [0, 1, 2, 0, 0, 0, 0, 0, 0]
        assert distance(s1, s2) == pytest.approx(math.sqrt(2))

    def test_distance1_inner_euclidean(self):
        # reference tests/test_dtw.py:69-93
        s1 = [0, 0, 1, 2, 1, 0, 1, 0, 0]
        s2 = [0, 1, 2, 0, 0, 0, 0, 0, 0]
        assert distance(s1, s2, DTWSettings(inner_dist="euclidean")) == pytest.approx(2.0)

    def test_penalty(self):
        # reference tests/test_penalty.py:9-20
        s1 = [0.0, 1, 2, 1, 0, 1, 2, 1, 0, 1, 2, 1, 0]
        s2 = [2.0, 1, 0, 1, 2, 1, 0, 1, 2, 1, 0, 1, 2]
        assert distance(s1, s2) == pytest.approx(math.sqrt(10))
        assert distance(s1, s2, DTWSettings(penalty=1)) == pytest.approx(math.sqrt(14))

    def test_psi_dtw_1a(self):
        # reference tests/test_warping.py psi suite: shifted sine -> 0
        x = np.arange(0, 20, 0.5)
        s1 = np.sin(x)
        s2 = np.sin(x - 1)
        assert distance(s1, s2, DTWSettings(psi=2)) == pytest.approx(0.0, abs=1e-10)

    def test_warping_path_example(self):
        # reference docs example: path endpoints cover both series
        s1 = np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0])
        s2 = np.array([0.0, 1, 2, 0, 0, 0, 0, 0, 0])
        p = warping_path(s1, s2)
        assert p[0] == (0, 0)
        assert p[-1] == (len(s1) - 1, len(s2) - 1)


class TestClusteringGoldens:
    S6 = [
        np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0]),
        np.array([0.0, 1, 2, 0, 0, 0, 0, 0, 0]),
        np.array([1.0, 2, 0, 0, 0, 0, 0, 1, 1]),
        np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0]),
        np.array([0.0, 1, 2, 0, 0, 0, 0, 0, 0]),
        np.array([1.0, 2, 0, 0, 0, 0, 0, 1, 1]),
    ]

    def test_clustering_golden(self):
        # reference tests/test_clustering.py:20-37: max_dist=2 ->
        # clusters {0: {0,1,3,4}, 2: {2,5}}, exact merge order
        merges = []

        def hook(from_idx, to_idx, d):
            merges.append((from_idx, to_idx))

        model = Hierarchical(max_dist=2, merge_hook=hook, use_ray=False)
        cluster_idx = model.fit(self.S6)
        assert cluster_idx[0] == {0, 1, 3, 4}
        assert cluster_idx[2] == {2, 5}
        assert set(merges) <= {(3, 0), (4, 1), (5, 2), (1, 0)}

    def test_clustering_tree_golden(self):
        # reference tests/test_clustering.py:40-58 (7 series, full tree)
        s7 = self.S6 + [np.array([1.0, 2, 0, 0, 0, 0, 0, 1, 1])]
        merges = []

        def hook(from_idx, to_idx, d):
            merges.append((from_idx, to_idx))

        tree = HierarchicalTree(model=Hierarchical(merge_hook=hook, use_ray=False))
        cluster_idx = tree.fit(s7)
        assert cluster_idx[0] == {0, 1, 2, 3, 4, 5, 6}
        assert set(merges) <= {(3, 0), (4, 1), (5, 2), (6, 2), (1, 0), (2, 0)}
        assert len(tree.linkage) == 6


class TestBugRegressions:
    """Shapes from the reference's tests/test_bugs.py."""

    def test_bug1_path_through_equal_series(self):
        s = np.array([0.0, 1, 2, 1, 0])
        p = warping_path(s, s)
        assert p == [(i, i) for i in range(len(s))]
        assert distance(s, s) == 0.0

    def test_psi_with_window(self):
        x = np.arange(0, 20, 0.5)
        s1 = np.sin(x)
        s2 = np.sin(x - 1)
        for w in (3, 25):
            assert distance(s1, s2, DTWSettings(psi=2, window=w)) == pytest.approx(
                0.0, abs=1e-10
            )

    def test_warping_paths_matrix_shape(self):
        s1 = np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0])
        s2 = np.array([0.0, 1, 2, 0, 0, 0])
        d, m = warping_paths(s1, s2)
        assert m.shape == (len(s1) + 1, len(s2) + 1)
        assert d == pytest.approx(m[-1, -1])


class TestBugCaseMirrors:
    """Exact-value mirrors of the reference's tests/test_bugs.py cases."""

    S1 = np.array([0.0, 0.01, 0.0, 0.01, 0.0, 0.0, 0.0, 0.01, 0.01, 0.02, 0.0, 0.0])
    S2 = np.array([0.0, 0.02, 0.02, 0.0, 0.0, 0.01, 0.01, 0.0, 0.0, 0.0, 0.0])

    def test_distance1_a(self):
        assert distance(self.S1, self.S2, DTWSettings(window=3)) == pytest.approx(0.02)

    def test_distance1_b(self):
        d1 = distance(self.S1, self.S2)
        d3, _ = warping_paths(self.S1, self.S2)
        assert d1 == pytest.approx(0.02)
        assert d3 == pytest.approx(d1)

    A1 = np.array([0.0, 0.0, 2.0, 1.0, 1.0, 0.0, 0.0])
    A2 = np.array([0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0])

    def test_distance2_max_dist(self):
        assert distance(self.A1, self.A2, DTWSettings(max_dist=1.1)) == pytest.approx(1.0)
        assert distance(self.A1, self.A2, DTWSettings(max_dist=0.1)) == np.inf

    def test_distance2_max_step(self):
        assert distance(self.A1, self.A2, DTWSettings(max_step=1.1)) == pytest.approx(1.0)
        assert distance(self.A1, self.A2, DTWSettings(max_step=0.1)) == np.inf

    def test_distance2_plain(self):
        assert distance(self.A1, self.A2) == pytest.approx(1.0)

    def test_distance3_penalty_maxstep_window(self):
        s = np.zeros(48)
        s[13:18] = [0.005, 0.01, 0.015, 0.02, 0.01]
        p = np.zeros(48)
        p[12:17] = [0.005, 0.01, 0.015, 0.02, 0.01]
        ref = pytest.importorskip("dtaidistance.dtw")
        kw = dict(penalty=0.005, max_step=0.011, window=3)
        assert distance(s, p, DTWSettings(**kw)) == pytest.approx(ref.distance(s, p, **kw))

    def test_bug5_path(self):
        # The reference's tests/test_bugs.py:316-343 documents that its
        # float rounding breaks the diagonal-priority tie at (1,3) and
        # yields [(0,1),(1,2),(1,3),(2,4)] instead of the "in theory"
        # path [(0,2),(1,3),(2,4)]. Since the row updates became
        # bit-exact with the reference's sequential add order
        # (elastic._minplus_scan verify+patch), we reproduce the
        # reference's documented outcome exactly — see also
        # tests/test_reference_bugs.py::test_bug5_path_float_tie which
        # asserts this against the live reference library.
        s1 = np.array([2.1, 4.1, 5.1])
        s2 = np.array([1.1, 2.1, 3.1, 4.1, 5.1])
        _, wps = warping_paths(s1, s2, DTWSettings(psi=(0, 0, len(s2), len(s2))))
        p = best_path(wps)
        assert p == [(0, 1), (1, 2), (1, 3), (2, 4)]
        assert p[-1] == (2, 4)

    def test_bug6_psi_tuple(self):
        s1 = np.array([0.0, 1.0])
        s2 = np.array([0.0, 0.0])
        psi = (0, 1, 0, 0)
        d, _ = warping_paths(s1, s2, DTWSettings(psi=psi))
        assert d == pytest.approx(0.0)
        assert distance(s1, s2, DTWSettings(psi=psi)) == pytest.approx(0.0)
