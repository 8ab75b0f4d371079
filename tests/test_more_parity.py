"""Parity: condensed-index math, postprocessing, multivariate DTW,
get_good_c seeding utilities."""

import numpy as np
import pytest

from dtaidistance_ray import DTWSettings
from dtaidistance_ray.kernels import distance, warping_path
from dtaidistance_ray.kernels.matrix_index import (
    condensed_to_matrix,
    distance_array_index,
    distance_matrix_idxs,
    distance_matrix_length,
)
from dtaidistance_ray.kernels.postprocessing import (
    distance_from_path,
    get_points_in_path_with_min_diff,
)

ref_dtw = pytest.importorskip("dtaidistance.dtw")
from dtaidistance import dtw_ndim as ref_ndim  # noqa: E402
from dtaidistance import postprocessing as ref_post  # noqa: E402


class TestCondensedIndex:
    def test_length_cases(self):
        # reference tests/test_dtw.py:12-50 block/index cases
        assert distance_matrix_length(((1, 4), (3, 5)), 6) == 5
        assert distance_matrix_length(None, 6) == 15
        for n in (2, 5, 9):
            assert distance_matrix_length(None, n) == n * (n - 1) // 2

    def test_array_index_roundtrip(self):
        n = 7
        i_idx, j_idx = distance_matrix_idxs(None, n)
        for k, (a, b) in enumerate(zip(i_idx, j_idx)):
            assert distance_array_index(int(a), int(b), n) == k
            assert distance_array_index(int(b), int(a), n) == k

    def test_condensed_to_matrix_block(self):
        n = 6
        block = ((1, 4), (3, 5))
        length = distance_matrix_length(block, n)
        dists = np.arange(1.0, length + 1)
        m = condensed_to_matrix(dists, n, block)
        assert np.isinf(m[0, 1])
        assert m[1, 3] == 1.0
        assert m[3, 1] == 1.0
        assert (np.diag(m) == 0).all()

    def test_against_reference_matrix_layout(self):
        rng = np.random.default_rng(0)
        seqs = [rng.normal(size=10) for _ in range(6)]
        ref_m = ref_dtw.distance_matrix(seqs, block=((1, 4), (3, 5)))
        from dtaidistance_ray.kernels import distance as our_d

        i_idx, j_idx = distance_matrix_idxs(((1, 4), (3, 5)), 6)
        ours = np.array([our_d(seqs[a], seqs[b]) for a, b in zip(i_idx, j_idx)])
        m = condensed_to_matrix(ours, 6, ((1, 4), (3, 5)))
        np.testing.assert_allclose(m[1:4, 3:5], ref_m[1:4, 3:5], rtol=1e-9)


class TestPostprocessing:
    def test_distance_from_path(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=15)
        b = rng.normal(size=12)
        p = warping_path(a, b)
        for relaxed in (True, False):
            ours = distance_from_path(a, b, p, relaxed=relaxed)
            theirs = ref_post.distance_from_path(a, b, p, relaxed=relaxed)
            assert ours == pytest.approx(theirs), relaxed
        # unrelaxed path distance equals the DTW distance for the optimal path
        assert distance_from_path(a, b, p, relaxed=False) == pytest.approx(distance(a, b))

    def test_min_diff_points(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=12)
        b = rng.normal(size=12)
        p = warping_path(a, b)
        for md in (0.1, 0.5):
            for relaxed in (True, False):
                assert get_points_in_path_with_min_diff(a, b, p, md, relaxed=relaxed) == (
                    ref_post.get_points_in_path_with_min_diff(a, b, p, md, relaxed=relaxed)
                )


class TestNdim:
    def test_ndim_distance_parity(self):
        rng = np.random.default_rng(4)
        for _ in range(8):
            a = rng.normal(size=(int(rng.integers(5, 20)), 3))
            b = rng.normal(size=(int(rng.integers(5, 20)), 3))
            ours = distance(a, b)
            theirs = ref_ndim.distance(a, b)
            assert ours == pytest.approx(theirs, rel=1e-9)

    def test_ndim_with_window(self):
        rng = np.random.default_rng(5)
        a = rng.normal(size=(15, 2))
        b = rng.normal(size=(15, 2))
        for w in (3, 6):
            assert distance(a, b, DTWSettings(window=w)) == pytest.approx(
                ref_ndim.distance(a, b, window=w), rel=1e-9
            )

    def test_ndim_use_pruning_consistent(self):
        # the reference's pure-Python dtw_ndim.distance(use_pruning=True)
        # raises (its set_max_dist uses the univariate inner fns); ours
        # supports it — pruning must never change the result
        rng = np.random.default_rng(6)
        a = rng.normal(size=(12, 2))
        b = rng.normal(size=(12, 2))
        assert distance(a, b, DTWSettings(use_pruning=True)) == pytest.approx(
            distance(a, b), rel=1e-12
        )


class TestNdimPaths:
    def test_ndim_warping_path_parity(self):
        # mirror of reference tests/test_dtw2d.py path checks
        rng = np.random.default_rng(7)
        for _ in range(5):
            a = rng.normal(size=(int(rng.integers(5, 15)), 2))
            b = rng.normal(size=(int(rng.integers(5, 15)), 2))
            ours = warping_path(a, b)
            theirs = ref_ndim.warping_path(a, b)
            assert ours == theirs

    def test_psi_neg_masking_parity(self):
        from dtaidistance_ray.kernels import warping_paths as our_wp

        x = np.arange(0, 20, 0.5)
        s1 = np.sin(x)
        s2 = np.sin(x - 1)
        d1, m1 = our_wp(s1, s2, DTWSettings(psi=2), psi_neg=True)
        d2, m2 = ref_dtw.warping_paths(s1, s2, psi=2, psi_neg=True)
        assert d1 == pytest.approx(d2, abs=1e-12)
        np.testing.assert_allclose(m1, m2, rtol=1e-9, atol=1e-12)
        assert (m1 == -1).any()  # psi-masked cells present


class TestNdimDistanceMatrix:
    def test_parity_vs_reference(self, ray_session):
        """distance_matrix over multivariate (2-D) series matches the
        reference dtw_ndim.distance_matrix (vector inner distance
        routes through the scalar kernel's ndim path per pair)."""
        import numpy as np

        from dtaidistance import dtw_ndim

        from dtaidistance_ray.stages.distance_matrix import distance_matrix

        rng = np.random.default_rng(1)
        seqs = [rng.normal(size=(int(rng.integers(5, 20)), 3)) for _ in range(10)]
        got = distance_matrix(seqs).to_pandas()
        ref = dtw_ndim.distance_matrix(seqs)
        assert len(got) == 45
        for i, j, d in zip(got["i"], got["j"], got["d"]):
            assert abs(ref[int(i), int(j)] - d) < 1e-9


class TestWarpingPathProb:
    """warping_path_prob / best_path_prob / srand — the reference's
    probabilistic traceback is C-only (dtw.py:1041 raises for
    use_c=False) and dtw_cc is not built in this container, so parity
    is semantic: the documented step-weight law and its limits
    (dd_dtw.c:3759-3920), not the libc rand() bit stream."""

    S1 = np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0, 2, 1, 0, 0])
    S2 = np.array([0.0, 1, 2, 3, 1, 0, 0, 0, 2, 1, 0, 0, 0])

    @staticmethod
    def _assert_valid(path, l1, l2):
        assert path[-1] == (l1 - 1, l2 - 1)
        assert path[0][0] == 0 or path[0][1] == 0
        for (a, b), (c, d) in zip(path, path[1:]):
            assert (c - a, d - b) in {(1, 1), (0, 1), (1, 0)}

    def test_paths_valid_and_seeded_reproducible(self):
        from dtaidistance_ray.kernels import srand, warping_path_prob

        d = distance(self.S1, self.S2)
        avg = d / len(self.S1)
        srand(42)
        first = [warping_path_prob(self.S1, self.S2, avg) for _ in range(30)]
        for p in first:
            self._assert_valid(p, len(self.S1), len(self.S2))
        # temperature avg > 0 explores: not every sample is the same path
        assert len({tuple(p) for p in first}) >= 2
        srand(42)
        again = [warping_path_prob(self.S1, self.S2, avg) for _ in range(30)]
        assert first == again

    def test_avg_to_zero_converges_to_optimal_cost(self):
        from dtaidistance_ray.kernels import warping_path_prob

        d = distance(self.S1, self.S2)
        rng = np.random.default_rng(7)
        for _ in range(10):
            # any tied-argmin traceback is optimal, so the path COST
            # must equal d even where tie choices differ from best_path
            p = warping_path_prob(self.S1, self.S2, 1e-12, rng=rng)
            cost = sum((self.S1[i] - self.S2[j]) ** 2 for i, j in p)
            assert cost == pytest.approx(d**2, abs=1e-9)

    def test_include_distance_and_avg_zero_guard(self):
        from dtaidistance_ray.kernels import warping_path_prob

        d = distance(self.S1, self.S2)
        p, dist = warping_path_prob(
            self.S1, self.S2, 0.0, include_distance=True,
            rng=np.random.default_rng(3),
        )
        # avg=0 -> 1.0 (dd_dtw.c:3779); distance is the TRUE dtw value
        # (documented divergence: the C wrapper returns -1 here)
        self._assert_valid(p, len(self.S1), len(self.S2))
        assert dist == pytest.approx(d, abs=1e-12)

    def test_psi_masked_cells_skipped(self):
        from dtaidistance_ray.kernels import warping_path_prob

        rng = np.random.default_rng(11)
        p = warping_path_prob(
            self.S1, self.S2, 0.05, settings=DTWSettings(psi=2), rng=rng
        )
        # psi relaxes the endpoints: the path may end before the last
        # row/col but every step must still be monotone
        assert p[0][0] == 0 or p[0][1] == 0
        for (a, b), (c, d) in zip(p, p[1:]):
            assert (c - a, d - b) in {(1, 1), (0, 1), (1, 0)}

    def test_window_band_respected(self):
        from dtaidistance_ray.kernels import warping_path_prob

        rng = np.random.default_rng(13)
        for _ in range(5):
            p = warping_path_prob(
                self.S1, self.S2, 0.5, settings=DTWSettings(window=2), rng=rng
            )
            self._assert_valid(p, len(self.S1), len(self.S2))
            for i, j in p:
                assert abs(i - j) <= 2  # out-of-band weight is exactly 0
