"""CustomInnerDist extension surface parity vs the reference."""

import numpy as np
import pytest

from dtaidistance_ray import DTWSettings
from dtaidistance_ray.kernels import distance, warping_paths

ref_dtw = pytest.importorskip("dtaidistance.dtw")


class ManhattanLike:
    """Custom inner distance: |a-b|^1.5, result/inner_val ^(1/1.5)."""

    @staticmethod
    def inner_dist(x, y):
        return abs(x - y) ** 1.5

    @staticmethod
    def result(x):
        return x ** (1 / 1.5)

    @staticmethod
    def inner_val(x):
        return x**1.5


class TestCustomInner:
    def test_distance_parity(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            a = rng.normal(size=int(rng.integers(5, 15)))
            b = rng.normal(size=int(rng.integers(5, 15)))
            ours = distance(a, b, DTWSettings(inner_dist=ManhattanLike))
            theirs = ref_dtw.distance(a, b, inner_dist=ManhattanLike)
            assert ours == pytest.approx(theirs, rel=1e-9)

    def test_distance_with_window_penalty(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=12)
        b = rng.normal(size=12)
        ours = distance(a, b, DTWSettings(inner_dist=ManhattanLike, window=4, penalty=0.3))
        theirs = ref_dtw.distance(a, b, inner_dist=ManhattanLike, window=4, penalty=0.3)
        assert ours == pytest.approx(theirs, rel=1e-9)

    def test_warping_paths_matrix(self):
        rng = np.random.default_rng(2)
        a = rng.normal(size=8)
        b = rng.normal(size=9)
        d1, m1 = warping_paths(a, b, DTWSettings(inner_dist=ManhattanLike))
        d2, m2 = ref_dtw.warping_paths(a, b, inner_dist=ManhattanLike)
        assert d1 == pytest.approx(d2, rel=1e-9)
        np.testing.assert_allclose(m1, m2, rtol=1e-9)
