"""Parity for preprocessing, similarity, alignment, msm kernels and the
hierarchical clustering layer vs the reference library."""

import numpy as np
import pytest

from dtaidistance_ray import DTWSettings
from dtaidistance_ray.kernels import alignment as our_align
from dtaidistance_ray.kernels import msm as our_msm
from dtaidistance_ray.kernels import preprocessing as our_prep
from dtaidistance_ray.kernels import similarity as our_sim
from dtaidistance_ray.stages.clustering import Hierarchical, HierarchicalTree, KMeans

ref_prep = pytest.importorskip("dtaidistance.preprocessing")
from dtaidistance import alignment as ref_align  # noqa: E402
from dtaidistance import msm as ref_msm  # noqa: E402
from dtaidistance import similarity as ref_sim  # noqa: E402
from dtaidistance.clustering import hierarchical as ref_hier  # noqa: E402
from dtaidistance import dtw as ref_dtw  # noqa: E402


class TestPreprocessing:
    def test_differencing(self):
        rng = np.random.default_rng(0)
        s = rng.normal(size=50)
        np.testing.assert_allclose(our_prep.differencing(s), ref_prep.differencing(s))

    def test_derivative(self):
        rng = np.random.default_rng(1)
        s = rng.normal(size=50)
        np.testing.assert_allclose(our_prep.derivative(s), ref_prep.derivative(s))

    def test_smoothing_reference_golden(self):
        # the reference's own tests/test_preprocessing.py vector (its
        # scipy butter(2)+filtfilt(method='gust') output); our scipy-free
        # Butterworth + exact-lstsq Gustafsson must reproduce it
        series = np.array([0.1, 0.3, 0.2, 0.1] * 3)
        golden = np.array(
            [0.02217, 0.010307, 0.002632, 0.001504, 0.001629, -0.000457,
             -0.001698, -0.001238, -0.004681, -0.014869, -0.026607]
        )
        np.testing.assert_array_almost_equal(
            our_prep.differencing(series, smooth=0.1), golden
        )
        np.testing.assert_array_almost_equal(
            our_prep.differencing(series[None, :], smooth=0.1), golden[None, :]
        )

    def test_smoothing_properties(self):
        # zero-phase: a constant passes through unchanged; invalid
        # smooth raises like the reference's butter wrapper
        const = np.full(40, 3.7)
        np.testing.assert_allclose(our_prep.smoothing(const, 0.1), const, atol=1e-9)
        with pytest.raises(ValueError):
            our_prep.smoothing(const, 0.6)
        # derivative(smooth=...) path is un-gated too
        rng = np.random.default_rng(4)
        s = rng.normal(size=60).cumsum()
        out = our_prep.derivative(s, smooth=0.1)
        assert out.shape == s.shape and np.isfinite(out).all()

    def test_logdomain(self):
        rng = np.random.default_rng(2)
        s = rng.normal(size=50) * 10
        np.testing.assert_allclose(our_prep.logdomain(s), ref_prep.logdomain(s))

    def test_mixedlinearlogdomain(self):
        rng = np.random.default_rng(3)
        s = rng.normal(size=50) * 30
        np.testing.assert_allclose(
            our_prep.mixedlinearlogdomain(s, 10), ref_prep.mixedlinearlogdomain(s, 10)
        )
        np.testing.assert_allclose(
            our_prep.mixedlinearlogdomain(s, (10, 5)), ref_prep.mixedlinearlogdomain(s, (10, 5))
        )

    def test_znormal(self):
        rng = np.random.default_rng(4)
        s = rng.normal(size=(5, 30))
        np.testing.assert_allclose(our_prep.znormal(s), ref_prep.znormal(s))


class TestSimilarity:
    def setup_method(self):
        rng = np.random.default_rng(5)
        self.D = np.abs(rng.normal(size=(6, 6))) * 3

    def test_distance_to_similarity_methods(self):
        for method in ("exponential", "gaussian", "reciprocal", "reverse"):
            np.testing.assert_allclose(
                our_sim.distance_to_similarity(self.D, method=method),
                ref_sim.distance_to_similarity(self.D, method=method),
            )

    def test_quantile_calibrated(self):
        for method in ("exponential", "gaussian"):
            np.testing.assert_allclose(
                our_sim.distance_to_similarity(self.D, method=method, cover_quantile=0.9),
                ref_sim.distance_to_similarity(self.D, method=method, cover_quantile=0.9),
            )

    def test_squash(self):
        for method in ("logistic", "exponential"):
            np.testing.assert_allclose(
                our_sim.squash(self.D, method=method), ref_sim.squash(self.D, method=method)
            )

    def test_squash_gaussian(self):
        # the reference's own squash(method='gaussian') raises (its
        # if/elif chain falls through to the else, similarity.py:125-167);
        # ours returns the documented 1 - e^(-X^2/r^2)
        out = our_sim.squash(self.D, method="gaussian", r=2.0)
        np.testing.assert_allclose(out, 1 - np.exp(-self.D**2 / 4.0))


class TestAlignment:
    def test_gattaca(self):
        s1 = "GATTACA"
        s2 = "GCATGCU"
        v1, sc1, p1 = our_align.needleman_wunsch(s1, s2)
        v2, sc2, p2 = ref_align.needleman_wunsch(s1, s2)
        assert v1 == v2
        np.testing.assert_allclose(sc1, sc2)
        a1, s1a, s2a = our_align.best_alignment(p1, s1, s2)
        a2, s1b, s2b = ref_align.best_alignment(p2, s1, s2)
        assert a1 == a2
        assert s1a == s1b and s2a == s2b
        # note: the reference docstring shows 'GCAT-GCU' but its own
        # pure-Python traceback yields the tie-equivalent 'GCA-TGCU';
        # we match the implementation, not the docstring
        assert "".join(s1a) == "G-ATTACA"

    def test_on_token_arrays(self):
        rng = np.random.default_rng(7)
        for _ in range(5):
            a = rng.integers(0, 5, size=12).tolist()
            b = rng.integers(0, 5, size=10).tolist()
            v1, sc1, p1 = our_align.needleman_wunsch(a, b)
            v2, sc2, p2 = ref_align.needleman_wunsch(a, b)
            assert v1 == v2
            np.testing.assert_allclose(sc1, sc2)
            path1, _, _ = our_align.best_alignment(p1)
            path2, _, _ = ref_align.best_alignment(p2)
            assert path1 == path2

    def test_substitution_fn(self):
        matrix = {("A", "B"): 2, ("B", "A"): 3, ("A", "A"): 5}
        f1 = our_align.make_substitution_fn(matrix)
        f2 = ref_align.make_substitution_fn(matrix)
        for pair in [("A", "B"), ("B", "A"), ("A", "A"), ("C", "C"), ("C", "D")]:
            assert f1(*pair) == f2(*pair)


class TestMSM:
    def test_msm_parity(self):
        rng = np.random.default_rng(8)
        for _ in range(5):
            n = int(rng.integers(5, 20))
            a = rng.normal(size=n)
            b = rng.normal(size=n)
            assert our_msm.distance(a, b) == pytest.approx(ref_msm.distance(a, b))


def _ref_dists_fun(series, **kwargs):
    return ref_dtw.distance_matrix(series, **kwargs)


class TestClustering:
    SERIES = [
        np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0]),
        np.array([0.0, 1, 2, 0, 0, 0, 0, 0, 0]),
        np.array([1.0, 2, 0, 0, 0, 0, 0, 1, 1]),
        np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0]),
        np.array([0.0, 1, 2, 0, 0, 0, 0, 0, 0]),
        np.array([1.0, 2, 0, 0, 0, 0, 0, 1, 1]),
    ]

    def test_hierarchical_parity(self, ray_session):
        ours = Hierarchical(max_dist=float("inf")).fit(self.SERIES)
        theirs = ref_hier.Hierarchical(
            _ref_dists_fun, {}, show_progress=False
        ).fit(self.SERIES)
        assert ours == theirs

    def test_hierarchical_tree_linkage_parity(self, ray_session):
        tree = HierarchicalTree(model=Hierarchical(use_ray=False))
        tree.fit(self.SERIES)
        ref_tree = ref_hier.HierarchicalTree(
            model=ref_hier.Hierarchical(_ref_dists_fun, {}, show_progress=False)
        )
        ref_tree.fit(self.SERIES)
        assert len(tree.linkage) == len(ref_tree.linkage)
        for a, b in zip(tree.linkage, ref_tree.linkage):
            assert a[0] == b[0] and a[1] == b[1]
            assert a[2] == pytest.approx(b[2])

    def test_kmeans_separates_patterns(self, ray_session):
        rng = np.random.default_rng(11)
        seqs = []
        for _ in range(10):
            x = np.linspace(0, 2 * np.pi, 30)
            seqs.append(np.sin(x) + rng.normal(scale=0.05, size=30))
        for _ in range(10):
            x = np.linspace(0, 2 * np.pi, 30)
            seqs.append(np.cos(2 * x) * 2 + rng.normal(scale=0.05, size=30))
        km = KMeans(k=2, max_it=5, seed=3, use_ray=True)
        clusters = km.fit(seqs)
        groups = sorted(tuple(sorted(v)) for v in clusters.values())
        assert groups == [tuple(range(10)), tuple(range(10, 20))]


class TestMedoidsAndHooks:
    SERIES = TestClustering.SERIES

    def test_kmedoids_groups_duplicates(self, ray_session):
        from dtaidistance_ray.stages.clustering import KMedoids

        km = KMedoids(k=3, initial_medoids=[0, 1, 2], use_ray=False)
        clusters = km.fit(self.SERIES)
        groups = sorted(tuple(sorted(v)) for v in clusters.values())
        assert groups == [(0, 3), (1, 4), (2, 5)]

    def test_weighthook_parity(self):
        from dtaidistance_ray.stages.clustering import Hierarchical, Hooks
        from dtaidistance.clustering.hierarchical import Hooks as RefHooks
        from dtaidistance.clustering import hierarchical as ref_hier

        series = self.SERIES
        w1 = {i: 1 for i in range(len(series))}
        w2 = {i: 1 for i in range(len(series))}
        ours = Hierarchical(
            max_dist=2, merge_hook=Hooks.create_weighthook(w1, series), use_ray=False
        ).fit(series)
        theirs = ref_hier.Hierarchical(
            _ref_dists_fun, {}, 2, merge_hook=RefHooks.create_weighthook(w2, series),
            show_progress=False,
        ).fit(series)
        assert ours == theirs
        assert w1 == w2


class TestWeightedDTW:
    """Parity vs reference dtw_weighted (pure Python)."""

    def test_reference_test_distance1_case(self):
        from dtaidistance import dtw_weighted as ref_w
        from dtaidistance_ray.kernels import weighted as our_w

        s1 = np.array([0., 0, 1, 2, 1, 0, 1, 0, 0, 2, 1, 0, 0])
        s2 = np.array([0., 1, 2, 3, 1, 10, 1, 0, 2, 1, 0, 0, 0])
        weights = np.full((len(s1), 8), np.inf)
        weights[:, 2:4] = 0.0
        weights[4:7, 2:4] = 10.0
        weights[:, 4:6] = 0.0
        weights[4:7, 4:6] = 10.0
        d_ref, p_ref = ref_w.warping_paths(s1, s2, weights)
        d_our, p_our = our_w.warping_paths(s1, s2, weights)
        np.testing.assert_allclose(p_our, p_ref, rtol=1e-10)
        assert d_our == pytest.approx(d_ref)

    def test_windows_and_random_weights(self):
        from dtaidistance import dtw_weighted as ref_w
        from dtaidistance_ray.kernels import weighted as our_w

        rng = np.random.default_rng(0)
        s1 = np.array([0., 0, 1, 2, 1, 0, 1, 0, 0, 2, 1, 0, 0])
        s2 = np.array([0., 1, 2, 3, 1, 10, 1, 0, 2, 1, 0, 0, 0])
        for win in [None, 0, 2, 5]:
            _, pr = ref_w.warping_paths(s1, s2, None, window=win)
            _, po = our_w.warping_paths(s1, s2, None, window=win)
            np.testing.assert_allclose(po, pr, rtol=1e-10)
        for _ in range(4):
            a = rng.normal(size=15)
            b = rng.normal(size=18)
            w = np.sort(rng.uniform(0, 2, size=(15, 4)), axis=1)
            W = np.hstack([w[:, ::-1], w])
            _, pr = ref_w.warping_paths(a, b, W, window=4)
            _, po = our_w.warping_paths(a, b, W, window=4)
            np.testing.assert_allclose(po, pr, rtol=1e-8, atol=1e-10)

    def test_distance_matrix_asymmetric_min(self):
        from dtaidistance import dtw_weighted as ref_w
        from dtaidistance_ray.kernels import weighted as our_w

        s = [
            np.array([0., 0, 1, 2, 1, 0, 1.3, 0, 0]),
            np.array([0., 1, 2, 0, 0, 0, 0, 0, 0]),
            np.array([1., 2, 0, 0, 0, 0, 0, 1, 1]),
        ]
        w = np.full((9, 8), np.inf)
        w[:, 2:6] = 0.0
        w[3:6, 2:6] = 1.5
        wts = {0: w}
        mr = ref_w.distance_matrix(s, wts, window=2)
        mo = our_w.distance_matrix(s, wts, window=2)
        np.testing.assert_allclose(mo, mr, rtol=1e-10)

    def test_compute_weights_from_mlclvalues(self):
        import copy
        from collections import defaultdict

        from dtaidistance import dtw_weighted as ref_w
        from dtaidistance_ray.kernels import weighted as our_w

        rng = np.random.default_rng(0)
        for _ in range(6):
            n = int(rng.integers(5, 20))
            serie = rng.normal(size=n)
            ml = defaultdict(lambda: ([], []))
            cl = defaultdict(lambda: ([], []))
            for idx in range(n):
                if rng.random() < 0.8:
                    ml[idx][0].extend(rng.uniform(0, 2, rng.integers(0, 5)).tolist())
                    ml[idx][1].extend(rng.uniform(0, 2, rng.integers(0, 5)).tolist())
                if rng.random() < 0.8:
                    cl[idx][0].extend(rng.uniform(0, 4, rng.integers(0, 5)).tolist())
                    cl[idx][1].extend(rng.uniform(0, 4, rng.integers(0, 5)).tolist())
            for om in (False, True):
                for sc in (True, False):
                    got = our_w.compute_weights_from_mlclvalues(
                        serie, copy.deepcopy(dict(ml)), copy.deepcopy(dict(cl)),
                        only_max=om, strict_cl=sc,
                    )
                    want = ref_w.compute_weights_from_mlclvalues(
                        serie, copy.deepcopy(dict(ml)), copy.deepcopy(dict(cl)),
                        only_max=om, strict_cl=sc,
                    )
                    np.testing.assert_allclose(got, want, rtol=1e-12)


class TestWeightedDTWDecisionTree:
    """series_to_dt / compute_weights_using_dt parity vs the reference
    (its own DecisionTreeClassifier; sklearn is absent both here and as
    the reference's fallback). The reference needs a test-only np.int
    shim on modern NumPy."""

    @staticmethod
    def _canon_cl(cl):
        return {
            int(k): (sorted(map(float, v[0])), sorted(map(float, v[1])))
            for k, v in dict(cl).items()
        }

    def test_series_to_dt_parity(self):
        np.int = int  # removed alias the reference still uses
        from dtaidistance import dtw_weighted as ref_w
        from dtaidistance_ray.kernels import weighted_dt as our_dt

        rng = np.random.default_rng(0)
        for _ in range(3):
            n_series = int(rng.integers(6, 12))
            length = int(rng.integers(8, 16))
            base = rng.normal(size=length)
            series = np.stack(
                [base + rng.normal(scale=(0.1 if i % 2 else 1.0), size=length)
                 for i in range(n_series)]
            )
            labels = np.array([1 if i % 2 else 0 for i in range(n_series)])
            labels[0] = 1
            for kw in [dict(), dict(max_clfs=2), dict(window=3), dict(patternlen=6)]:
                rml, rcl, _, _ = ref_w.series_to_dt(series, labels, 0, **kw)
                oml, ocl, _, _ = our_dt.series_to_dt(series, labels, 0, **kw)
                assert self._canon_cl(rml) == self._canon_cl(oml), kw
                assert self._canon_cl(rcl) == self._canon_cl(ocl), kw
            rw, _ = ref_w.compute_weights_using_dt(series, labels, 0)
            ow, _ = our_dt.compute_weights_using_dt(series, labels, 0)
            np.testing.assert_allclose(ow, rw, rtol=1e-12)

    def test_weighted_distance_separates_classes(self):
        # end-to-end: DT-learned weights make the prototype closer to
        # its must-link series than to cannot-link series
        from dtaidistance_ray.kernels import weighted as our_w
        from dtaidistance_ray.kernels import weighted_dt as our_dt

        rng = np.random.default_rng(3)
        base = np.sin(np.linspace(0, 3 * np.pi, 24))
        series = np.stack(
            [base + rng.normal(scale=0.05, size=24) for _ in range(4)]
            + [base + np.where(np.arange(24) % 7 == 0, 3.0, 0.0)
               + rng.normal(scale=0.05, size=24) for _ in range(4)]
        )
        labels = np.array([1, 1, 1, 1, 0, 0, 0, 0])
        w, _ = our_dt.compute_weights_using_dt(series, labels, 0)
        d_ml = [our_w.warping_paths(series[0], series[i], w)[0] for i in (1, 2, 3)]
        d_cl = [our_w.warping_paths(series[0], series[i], w)[0] for i in (4, 5, 6, 7)]
        assert max(d_ml) < min(d_cl), (d_ml, d_cl)


class TestKMeansExactRNGParity:
    def test_reference_rng_replica(self):
        """KMeansReferenceParity replays the reference KMeans.fit
        call-for-call: identical seeded global RNG state => identical
        clusters, iteration counts, and bit-equal means."""
        import random

        from dtaidistance.clustering.kmeans import KMeans as RefKMeans
        from dtaidistance_ray.stages.clustering import KMeansReferenceParity

        rng = np.random.default_rng(0)
        for trial in range(2):
            n = int(rng.integers(15, 30))
            L = int(rng.integers(10, 20))
            seqs = [np.cumsum(rng.normal(size=L)) for _ in range(n)]
            for kw in [dict(k=3), dict(k=3, drop_stddev=2)]:
                np.random.seed(42 + trial)
                random.seed(42 + trial)
                ref = RefKMeans(dists_options={"window": 5}, show_progress=False, **kw)
                rci, rits = ref.fit(seqs, use_parallel=False)
                np.random.seed(42 + trial)
                random.seed(42 + trial)
                ours = KMeansReferenceParity(settings=DTWSettings(window=5), **kw)
                oci, oits = ours.fit(seqs)
                assert rits == oits
                assert {k: set(v) for k, v in rci.items()} == oci
                for a, b in zip(ref.means, ours.means):
                    np.testing.assert_array_equal(np.asarray(a, dtype=np.float64), b)
