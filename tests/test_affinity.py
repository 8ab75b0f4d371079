"""Parity: affinity warping paths (LoCo basis) and get_good_c."""

import numpy as np
import pytest

from dtaidistance_ray import DTWSettings
from dtaidistance_ray.kernels.elastic import warping_paths_affinity
from dtaidistance_ray.kernels.dba import get_good_c

ref_dtw = pytest.importorskip("dtaidistance.dtw")


class TestAffinity:
    def test_affinity_matrix_parity(self):
        rng = np.random.default_rng(0)
        for trial in range(6):
            a = rng.normal(size=int(rng.integers(5, 18)))
            b = rng.normal(size=int(rng.integers(5, 18)))
            for kw in (
                dict(gamma=1, tau=0, delta=0, delta_factor=1),
                dict(gamma=0.5, tau=0.3, delta=-0.5, delta_factor=0.5),
            ):
                d1, m1 = warping_paths_affinity(a, b, DTWSettings(penalty=0.1), **kw)
                d2, m2 = ref_dtw.warping_paths_affinity(a, b, penalty=0.1, **kw)
                assert d1 == pytest.approx(d2, rel=1e-9)
                np.testing.assert_allclose(m1, m2, rtol=1e-9)

    def test_affinity_only_triu(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=12)
        d1, m1 = warping_paths_affinity(
            a, a, DTWSettings(penalty=0.0), only_triu=True, gamma=0.7, tau=0.2, delta=-1
        )
        d2, m2 = ref_dtw.warping_paths_affinity(
            a, a, penalty=0.0, only_triu=True, gamma=0.7, tau=0.2, delta=-1
        )
        np.testing.assert_allclose(m1, m2, rtol=1e-9)

    def test_affinity_window_penalty(self):
        rng = np.random.default_rng(2)
        a = rng.normal(size=14)
        b = rng.normal(size=14)
        d1, m1 = warping_paths_affinity(a, b, DTWSettings(window=4, penalty=0.2), gamma=0.8)
        d2, m2 = ref_dtw.warping_paths_affinity(a, b, window=4, penalty=0.2, gamma=0.8)
        np.testing.assert_allclose(m1, m2, rtol=1e-9)

    def test_affinity_psi(self):
        # psi relaxation through the affinity recurrence (the reference
        # requires an explicit penalty — it crashes on penalty=None)
        rng = np.random.default_rng(9)
        for _ in range(5):
            a = rng.normal(size=int(rng.integers(6, 20)))
            b = rng.normal(size=int(rng.integers(6, 20)))
            d1, m1 = warping_paths_affinity(a, b, DTWSettings(penalty=0.4, psi=2))
            d2, m2 = ref_dtw.warping_paths_affinity(a, b, penalty=0.4, psi=2)
            np.testing.assert_allclose(
                np.nan_to_num(np.asarray(m1), posinf=1e300, neginf=-1e300),
                np.nan_to_num(np.asarray(m2), posinf=1e300, neginf=-1e300),
                rtol=1e-9, atol=1e-12,
            )


class TestGoodC:
    def test_medoid_seed(self):
        rng = np.random.default_rng(3)
        base = np.sin(np.linspace(0, 6, 30))
        seqs = [base + rng.normal(scale=0.05, size=30) for _ in range(8)]
        seqs.append(rng.normal(size=30) * 5)  # outlier
        c = get_good_c(seqs, nb_initial_samples=9, rng=np.random.default_rng(0))
        # medoid must not be the outlier
        assert not np.allclose(c, seqs[-1])
