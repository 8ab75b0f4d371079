"""Kernel parity vs the reference library (pure-Python oracle).

Golden cases from the reference's own tests (tests/test_dtw.py,
tests/test_penalty.py, tests/test_warping.py) plus randomized parity
over the full settings grid.
"""

import math

import numpy as np
import pytest

from dtaidistance_ray import DTWSettings
from dtaidistance_ray.kernels import (
    best_path,
    dba,
    dba_loop,
    distance,
    lb_keogh,
    ub_euclidean,
    warp,
    warping_path,
    warping_paths,
)

ref_dtw = pytest.importorskip("dtaidistance.dtw")
ref_ed = pytest.importorskip("dtaidistance.ed")
from dtaidistance import dtw_barycenter as ref_dba  # noqa: E402

S1 = [0, 0, 1, 2, 1, 0, 1, 0, 0]
S2 = [0, 1, 2, 0, 0, 0, 0, 0, 0]


class TestGolden:
    def test_basic_sqrt2(self):
        assert distance(S1, S2) == pytest.approx(math.sqrt(2))

    def test_basic_euclidean_inner(self):
        assert distance(S1, S2, DTWSettings(inner_dist="euclidean")) == pytest.approx(2.0)

    def test_penalty_golden(self):
        # reference tests/test_penalty.py:9-20
        s1 = [0.0, 1, 2, 1, 0, 1, 2, 1, 0, 1, 2, 1, 0]
        s2 = [2.0, 1, 0, 1, 2, 1, 0, 1, 2, 1, 0, 1, 2]
        assert distance(s1, s2) == pytest.approx(math.sqrt(10))
        assert distance(s1, s2, DTWSettings(penalty=1)) == pytest.approx(math.sqrt(14))

    def test_psi_shifted_sine_zero(self):
        # reference tests/test_warping.py:169-288
        x = np.arange(0, 20, 0.5)
        s1 = np.sin(x)
        s2 = np.sin(x - 1)
        for window in (None, 3, 25):
            d = distance(s1, s2, DTWSettings(psi=2, window=window))
            rd = ref_dtw.distance(s1, s2, psi=2, window=window)
            assert d == pytest.approx(rd)
            assert d == pytest.approx(0.0, abs=1e-10)

    def test_window(self):
        for w in (1, 2, 3, 5):
            assert distance(S1, S2, DTWSettings(window=w)) == pytest.approx(
                ref_dtw.distance(S1, S2, window=w)
            )

    def test_ub_euclidean(self):
        for a, b in [(S1, S2), (S1, S2[:5]), (S1[:4], S2)]:
            assert ub_euclidean(a, b) == pytest.approx(ref_dtw.ub_euclidean(a, b))

    def test_lb_keogh(self):
        rng = np.random.default_rng(0)
        for _ in range(20):
            a = rng.normal(size=rng.integers(5, 30))
            b = rng.normal(size=rng.integers(5, 30))
            for w in (None, 3):
                assert lb_keogh(a, b, DTWSettings(window=w)) == pytest.approx(
                    ref_dtw.lb_keogh(a, b, window=w)
                )
                assert lb_keogh(a, b, DTWSettings(window=w)) <= distance(
                    a, b, DTWSettings(window=w)
                ) + 1e-9


def _param_grid():
    return [
        dict(),
        dict(window=2),
        dict(window=5),
        dict(psi=2),
        dict(psi=(2, 0, 1, 3)),
        dict(penalty=0.5),
        dict(penalty=1.0, window=4),
        dict(max_step=1.5),
        dict(max_dist=2.0),
        dict(max_dist=0.5),
        dict(use_pruning=True),
        dict(use_pruning=True, window=3),
        dict(inner_dist="euclidean"),
        dict(inner_dist="euclidean", penalty=0.3, window=4),
        dict(psi=1, penalty=0.25),
        dict(max_length_diff=3),
        dict(max_step=1.0, max_dist=3.0),
        dict(psi=2, use_pruning=True),
    ]


class TestRandomParity:
    def test_distance_parity_random(self):
        rng = np.random.default_rng(42)
        for trial in range(30):
            n1 = int(rng.integers(3, 40))
            n2 = int(rng.integers(3, 40))
            a = np.round(rng.normal(size=n1) * 3, 3)
            b = np.round(rng.normal(size=n2) * 3, 3)
            for kw in _param_grid():
                ours = distance(a, b, DTWSettings(**kw))
                theirs = ref_dtw.distance(a, b, **kw)
                assert ours == pytest.approx(theirs, rel=1e-9, abs=1e-12), (
                    f"trial={trial} kw={kw} ours={ours} theirs={theirs}"
                )

    def test_use_pruning_inf_parity_vs_reference(self):
        """Strict-cutoff inf parity (round-2 ADVICE high finding).

        With use_pruning, the reference compares the DP path sum
        strictly against inner_val(ub_euclidean); the sqrt->square
        round-trip makes inf reachable even when DTW equals the
        Euclidean bound exactly. Short, unequal-length pairs maximize
        boundary hits. We must agree with the reference on EXACTLY
        which pairs are inf, not just on the finite values."""
        from dtaidistance_ray.kernels.pairs_batch import (
            batched_pair_distances,
            pairs_supported,
        )

        rng = np.random.default_rng(0)
        inf_hits = 0
        for trial in range(120):
            n1 = int(rng.integers(1, 10))
            n2 = int(rng.integers(1, 10))
            a = rng.normal(size=n1)
            b = rng.normal(size=n2)
            for kw in [
                dict(use_pruning=True),
                dict(use_pruning=True, penalty=0.5),
                dict(use_pruning=True, penalty=2.0),
            ]:
                s = DTWSettings(**kw)
                ours = distance(a, b, s)
                theirs = ref_dtw.distance(a, b, **kw)
                if np.isinf(theirs):
                    inf_hits += 1
                    assert np.isinf(ours), (trial, kw, ours, theirs)
                else:
                    assert ours == pytest.approx(theirs, rel=1e-9), (trial, kw)
                if pairs_supported(s):
                    bv = batched_pair_distances([a], [b], s)[0]
                    assert np.isinf(bv) == np.isinf(ours), (trial, kw, bv, ours)
                    if np.isfinite(bv):
                        assert bv == pytest.approx(ours, rel=1e-9)
        assert inf_hits > 5  # the boundary must actually be exercised

    def test_distance_parity_integer_tokens(self):
        # token tables: integer-valued series (input_hint payload)
        rng = np.random.default_rng(7)
        for trial in range(15):
            a = rng.integers(0, 50, size=int(rng.integers(4, 60))).astype(np.float64)
            b = rng.integers(0, 50, size=int(rng.integers(4, 60))).astype(np.float64)
            for kw in [dict(), dict(window=8), dict(use_pruning=True), dict(psi=3)]:
                assert distance(a, b, DTWSettings(**kw)) == pytest.approx(
                    ref_dtw.distance(a, b, **kw), rel=1e-9
                )

    def test_warping_paths_matrix_parity(self):
        rng = np.random.default_rng(3)
        bitexact = 0
        total = 0
        for trial in range(10):
            a = np.round(rng.normal(size=int(rng.integers(3, 20))), 3)
            b = np.round(rng.normal(size=int(rng.integers(3, 20))), 3)
            for kw in [dict(), dict(window=3), dict(psi=2), dict(penalty=0.5)]:
                d1, m1 = warping_paths(a, b, DTWSettings(**kw))
                d2, m2 = ref_dtw.warping_paths(a, b, **kw)
                assert d1 == pytest.approx(d2, rel=1e-9, abs=1e-12), kw
                np.testing.assert_allclose(m1, m2, rtol=1e-9, atol=1e-12)
                total += 1
                if np.array_equal(
                    np.nan_to_num(m1, posinf=1e300),
                    np.nan_to_num(np.asarray(m2), posinf=1e300),
                ):
                    bitexact += 1
        # sequential-order row updates: matrices should be BIT-equal to
        # the reference except for the rare scalar-pow libm ulp (see
        # elastic.py header); demand near-total bit equality
        assert bitexact >= total - 2, (bitexact, total)

    def test_best_path_parity(self):
        rng = np.random.default_rng(11)
        for trial in range(15):
            a = np.round(rng.normal(size=int(rng.integers(4, 25))), 3)
            b = np.round(rng.normal(size=int(rng.integers(4, 25))), 3)
            for kw in [dict(), dict(psi=2), dict(window=4)]:
                p1 = warping_path(a, b, DTWSettings(**kw))
                p2 = ref_dtw.warping_path(a, b, **kw)
                assert p1 == p2, kw

    def test_warp_parity(self):
        rng = np.random.default_rng(5)
        a = rng.normal(size=15)
        b = rng.normal(size=12)
        w1, p1 = warp(a, b)
        w2, p2 = ref_dtw.warp(a, b)
        np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-12)
        assert p1 == p2


class TestDBAParity:
    def test_dba_single_sweep(self):
        rng = np.random.default_rng(17)
        seqs = [rng.integers(0, 30, size=20).astype(np.float64) for _ in range(6)]
        c = seqs[0]
        ours = dba(seqs, c)
        theirs = ref_dba.dba(seqs, c)
        np.testing.assert_allclose(ours, np.asarray(theirs), rtol=1e-12)

    def test_dba_loop(self):
        rng = np.random.default_rng(19)
        seqs = [rng.integers(0, 30, size=16).astype(np.float64) for _ in range(5)]
        ours = dba_loop(seqs, c=None, max_it=5, thr=0.0001)
        theirs = ref_dba.dba_loop(seqs, c=None, max_it=5, thr=0.0001)
        np.testing.assert_allclose(ours, np.asarray(theirs), rtol=1e-12)

    def test_dba_with_window(self):
        rng = np.random.default_rng(23)
        seqs = [rng.normal(size=18) for _ in range(4)]
        ours = dba_loop(seqs, max_it=3, settings=DTWSettings(window=5))
        theirs = ref_dba.dba_loop(seqs, max_it=3, window=5)
        np.testing.assert_allclose(ours, np.asarray(theirs), rtol=1e-10)

    def test_dba_tied_floats_sequential_parity(self):
        """Float members whose DP develops EXACT value ties (here:
        z-normalized small-integer count profiles — many repeated
        values) must produce reference-identical barycenters through
        the SEQUENTIAL path (use_batch=False). The batched prefix-scan
        DP may resolve such ties to different equally-optimal warping
        paths unless its rows are verified/patched and its tie rule
        matches (documented in dba_partial); this pins BOTH paths
        against the reference on the tied-float corpus the
        events_profile_dtw_anomaly golden exercises."""
        rng = np.random.default_rng(31)
        profs = []
        for _ in range(12):
            x = rng.integers(0, 6, size=24).astype(np.float64)  # heavy ties
            if x.std() == 0:
                x[0] += 1
            profs.append((x - x.mean()) / x.std())
        s = DTWSettings(window=4)
        theirs = np.asarray(ref_dba.dba_loop(profs, c=profs[0], max_it=10, thr=0.001, window=4))
        seq = dba_loop(profs, c=profs[0], max_it=10, thr=0.001, settings=s, use_batch=False)
        np.testing.assert_allclose(seq, theirs, rtol=1e-12)
        # the BATCHED kernel must agree bit-for-bit too: its rows are
        # verified/patched against the sequential recurrence and its
        # traceback breaks ties in sqrt space like reference best_path
        bat = dba_loop(profs, c=profs[0], max_it=10, thr=0.001, settings=s)
        np.testing.assert_array_equal(bat, seq)

    def test_dba_batched_bitexact_random_floats(self):
        """The batched DP's fixpoint refinement makes it bit-identical
        to the sequential kernel on ARBITRARY float inputs (not just
        integer tokens): same sums, same counts, any window."""
        from dtaidistance_ray.kernels.dba_batch import batched_dba_partial
        from dtaidistance_ray.kernels import warping_path

        rng = np.random.default_rng(41)
        for _ in range(4):
            c = rng.normal(size=int(rng.integers(16, 80)))
            seqs = [rng.normal(size=int(rng.integers(8, 100))) for _ in range(30)]
            s = DTWSettings(window=int(rng.integers(2, 16)))
            sb, cb = batched_dba_partial(seqs, c, s)
            sums = np.zeros(len(c))
            cnts = np.zeros(len(c), dtype=np.int64)
            for p_ in seqs:
                for i, j in warping_path(c, p_, settings=s):
                    sums[i] += p_[j]
                    cnts[i] += 1
            np.testing.assert_array_equal(sb, sums)
            np.testing.assert_array_equal(cb, cnts)

    def test_dba_partial_merge_invariance(self):
        # partition the members arbitrarily -> identical merged result
        from dtaidistance_ray.kernels import dba_finalize, dba_merge, dba_partial

        rng = np.random.default_rng(29)
        seqs = [rng.integers(0, 100, size=24).astype(np.float64) for _ in range(9)]
        c = seqs[0]
        whole = dba_finalize(*dba_partial(seqs, c))
        parts = [dba_partial(seqs[i : i + 3], c) for i in range(0, 9, 3)]
        merged = dba_finalize(*dba_merge(parts))
        np.testing.assert_array_equal(whole, merged)  # bit-exact (integer sums)


class TestBatchedKernelFuzz:
    """Property-based parity of the batched pair kernel against the
    scalar kernel AND the reference library over the supported settings
    space (window x penalty x use_pruning x unequal lengths)."""

    def test_hypothesis_settings_parity(self):
        from hypothesis import given, settings as hsettings
        from hypothesis import strategies as st

        from dtaidistance_ray.kernels.pairs_batch import (
            batched_pair_distances, pairs_supported,
        )

        @hsettings(max_examples=60, deadline=None)
        @given(
            n1=st.integers(min_value=1, max_value=24),
            n2=st.integers(min_value=1, max_value=24),
            window=st.sampled_from([None, 1, 3, 8]),
            penalty=st.sampled_from([None, 0.25, 1.5]),
            use_pruning=st.booleans(),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def check(n1, n2, window, penalty, use_pruning, seed):
            rng = np.random.default_rng(seed)
            s1 = rng.normal(size=n1)
            s2 = rng.normal(size=n2)
            s = DTWSettings(window=window, penalty=penalty, use_pruning=use_pruning)
            assert pairs_supported(s)
            b = float(batched_pair_distances([s1], [s2], s)[0])
            sc = distance(s1, s2, s)
            ref = ref_dtw.distance(
                s1, s2, window=window, penalty=penalty, use_pruning=use_pruning
            )
            if np.isinf(sc):
                assert np.isinf(b)
            else:
                assert b == pytest.approx(sc, rel=1e-9)
                # vs reference: identical except the documented d == ub
                # rounding boundary, where the reference's own strict
                # `>` flips on last-ULP noise (elastic.py tolerance note)
                if np.isfinite(ref):
                    assert b == pytest.approx(ref, rel=1e-9)

        check()


class TestMinplusScanExactness:
    def test_hypothesis_sequential_fixpoint(self):
        """_minplus_scan must be BIT-identical to the sequential
        recurrence f[j] = min(h[j], (f[j-1]+penalty)+cost[j]) — the
        reference's per-cell add order — on adversarial inputs
        (long chains, exact ties, infs, zero costs)."""
        from hypothesis import given, settings as hsettings
        from hypothesis import strategies as st

        from dtaidistance_ray.kernels.elastic import INF, _minplus_scan

        finite = st.floats(0.0, 10.0, allow_nan=False)
        maybe_inf = st.one_of(finite, st.just(float("inf")))

        @given(
            h=st.lists(maybe_inf, min_size=1, max_size=60),
            cost=st.data(),
            penalty=st.sampled_from([0.0, 0.25, 1e-9, 3.0]),
            left0=st.one_of(finite, st.just(float("inf"))),
        )
        @hsettings(max_examples=300, deadline=None)
        def check(h, cost, penalty, left0):
            n = len(h)
            c = np.array(
                cost.draw(st.lists(st.floats(0.0, 2.0), min_size=n, max_size=n))
            )
            ha = np.array(h)
            got = _minplus_scan(ha.copy(), c, penalty, left0)
            # sequential oracle, reference add order
            f = ha.copy()
            if left0 != INF:
                v = (left0 + penalty) + c[0] if penalty else left0 + c[0]
                if v < f[0]:
                    f[0] = v
            for j in range(1, n):
                v = (f[j - 1] + penalty) + c[j] if penalty else f[j - 1] + c[j]
                if v < f[j]:
                    f[j] = v
            np.testing.assert_array_equal(got, f)

        check()

    def test_long_chain_adversarial(self):
        """Rows engineered for maximal scan/sequential divergence:
        monotone-increasing h with tiny costs (every position chains)."""
        from dtaidistance_ray.kernels.elastic import INF, _minplus_scan

        rng = np.random.default_rng(0)
        for _ in range(20):
            n = 400
            h = np.cumsum(rng.random(n) * 0.1) + 1.0
            c = rng.random(n) * 1e-6
            for pen in (0.0, 1e-7):
                got = _minplus_scan(h.copy(), c, pen, INF)
                f = h.copy()
                for j in range(1, n):
                    v = (f[j - 1] + pen) + c[j] if pen else f[j - 1] + c[j]
                    if v < f[j]:
                        f[j] = v
                np.testing.assert_array_equal(got, f)


class TestRound5KernelReviewFixes:
    def test_ub_euclidean_ndim_euclidean_inner(self):
        """2-D series with inner_dist='euclidean' reduce per timestep
        (ref EuclideanNdim) — previously raised TypeError through
        use_pruning (round-5 review finding)."""
        import dtaidistance.ed as red

        rng = np.random.default_rng(7)
        a, b = rng.random((6, 3)), rng.random((9, 3))
        got = ub_euclidean(a, b, "euclidean")
        want = red.distance(a, b, inner_dist="euclidean", use_ndim=True)
        assert got == pytest.approx(want, abs=0)
        # and the full pruned multivariate euclidean distance runs
        d = distance(a, b, DTWSettings(inner_dist="euclidean", use_pruning=True))
        assert np.isfinite(d)

    def test_distance_psi2e_exceeding_length(self):
        """psi_2e larger than the last column index must not wrap the
        end-candidate slice negative: distance() now clamps like
        warping_paths() (round-5 review finding)."""
        s = DTWSettings(psi=(0, 0, 0, 5))
        d1 = distance([1.0], [1.0, 50.0, 50.0], s)
        d2, _ = warping_paths([1.0], [1.0, 50.0, 50.0], s)
        assert d1 == d2 == 0.0

    def test_lb_keogh_window_zero_unconstrained(self):
        """window=0 means unconstrained (DTWSettings contract, same as
        distance's effective_window) — previously an empty envelope
        slice crashed (round-5 review finding)."""
        s1 = np.arange(5, dtype=np.float64)
        assert lb_keogh(s1, s1, DTWSettings(window=0)) == 0.0

    def test_knn_scorer_disables_lb_under_psi(self):
        """lb_keogh ignores psi (reference semantics), so it is NOT a
        lower bound for psi-relaxed DTW; the k-NN prune must disable
        itself then (round-5 review finding)."""
        import ray

        from dtaidistance_ray.stages.search import KnnScorer

        q = np.array([5.0, 0, 0, 0, 5])
        assert lb_keogh(q, np.zeros(5), DTWSettings(psi=2)) > 0.0
        assert distance(q, np.zeros(5), DTWSettings(psi=2)) == 0.0
        sc = KnnScorer(ray.put(q), k=1, settings=DTWSettings(psi=2))
        assert sc.use_lb is False
        assert KnnScorer(ray.put(q), k=1, settings=DTWSettings()).use_lb is True

    def test_warping_path_penalty_reference_parity(self):
        """penalty_post adds to the DP distance (incl. per-step penalty)
        and the return carries [dist, path, stepsize, paths] — the old
        re-summed raw path cost dropped the DP penalty (round-5
        review finding)."""
        from dtaidistance_ray.kernels import warping_path_penalty

        rng = np.random.default_rng(7)
        s1, s2 = rng.random(10), rng.random(12)
        for kw in ({}, {"penalty": 0.3}):
            ours = warping_path_penalty(
                s1, s2, penalty_post=0.5, settings=DTWSettings(**kw)
            )
            ref = ref_dtw.warping_path_penalty(s1, s2, penalty_post=0.5, **kw)
            assert ours[0] == pytest.approx(ref[0], abs=1e-12)
            assert ours[1] == ref[1]
            assert np.allclose(ours[2], ref[2])


class TestRound5KernelReviewFixesWave2:
    def test_complete_block_reference_semantics(self):
        """triu disabled only by block[2] is False; columns clamp to n
        (reference _complete_block + the iteration clamp)."""
        from dtaidistance_ray.kernels.matrix_index import (
            complete_block,
            distance_matrix_idxs,
            distance_matrix_length,
        )

        assert complete_block(((0, 3), (0, 3), 0), 6)[4] is True  # falsy != False
        assert complete_block(((0, 3), (0, 3), False), 6)[4] is False
        # columns clamp to n: idxs stay in range, length matches
        i, j = distance_matrix_idxs(((0, 3), (0, 10)), 6)
        assert j.max() == 5 and len(i) == distance_matrix_length(((0, 3), (0, 10)), 6)
        ri, rj = ref_dtw._distance_matrix_idxs(((0, 3), (0, 10)), 6)
        assert list(i) == list(ri) and list(j) == list(rj)

    def test_distance_matrix_three_element_block(self, ray_session):
        """The Ray tile service accepts the reference's 3-element block
        spec and clamps overhanging columns (round-5 review finding)."""
        from dtaidistance_ray.stages.distance_matrix import distance_matrix

        rng = np.random.default_rng(3)
        seqs = [rng.random(12) for _ in range(5)]
        full = distance_matrix(seqs, block=((0, 4), (0, 9), False)).to_pandas()
        assert set(zip(full["i"], full["j"])) == {(r, c) for r in range(4) for c in range(5)}
        tri = distance_matrix(seqs, block=((0, 4), (0, 9), 0)).to_pandas()
        assert all(jj > ii for ii, jj in zip(tri["i"], tri["j"]))

    def test_derivative_2d_raises(self):
        from dtaidistance_ray.kernels.preprocessing import derivative

        with pytest.raises(NotImplementedError):
            derivative(np.zeros((3, 4)))

    def test_settings_hash_custom_inner(self):
        """settings_hash works for object inner_dist (checkpoint
        manifests) and is process-stable (no id() in the payload)."""
        class MyInner:
            def inner_dist(self, a, b):
                return abs(a - b)

            def result(self, x):
                return x

            def inner_val(self, x):
                return x

        h1 = DTWSettings(inner_dist=MyInner()).settings_hash()
        h2 = DTWSettings(inner_dist=MyInner()).settings_hash()
        assert h1 == h2 and len(h1) == 16

    def test_dt_windows_degenerate_inputs(self):
        """Pure targets: no candidate trees -> empty result, not
        IndexError; single kept tree -> weight 1.0, not NaN."""
        from dtaidistance_ray.kernels.weighted_dt import DecisionTreeClassifier, dt_windows

        rng = np.random.default_rng(5)
        feats = rng.random((20, 12))
        pure = np.zeros(20)
        cl, kept, imp = dt_windows(
            feats, pure, DecisionTreeClassifier, patternlen=4,
            max_clfs=None, min_ig=0, min_purity=1.0,
        )
        assert kept == [] and cl == {} and len(imp) == 0
        mixed = (feats[:, 0] > 0.5).astype(float)
        cl2, kept2, imp2 = dt_windows(
            feats, mixed, DecisionTreeClassifier, patternlen=12,
            max_clfs=1, min_ig=0, min_purity=1.0,
        )
        for v in imp2.values():
            assert np.isfinite(v).all()
