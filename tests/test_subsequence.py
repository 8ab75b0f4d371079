"""SubsequenceAlignment parity vs the reference (matching function,
segments, k-best matches) — reference doc example + random cases."""

import numpy as np
import pytest

from dtaidistance_ray.stages.search import SubsequenceAlignment, subsequence_alignment

ref_mod = pytest.importorskip("dtaidistance.subsequence.subsequencealignment")


class TestSubsequenceAlignment:
    def test_doc_example(self):
        # reference subsequencealignment.py:182-189
        query = np.array([1.0, 2, 0])
        series = np.array([1.0, 0, 1, 2, 1, 0, 2, 0, 3, 0, 0])
        ours = subsequence_alignment(query, series)
        theirs = ref_mod.subsequence_alignment(query, series)
        np.testing.assert_allclose(ours.matching_function(), theirs.matching_function())
        m_our = list(ours.kbest_matches(k=2))
        m_ref = list(theirs.kbest_matches(k=2))
        assert len(m_our) == len(m_ref) == 2
        for a, b in zip(m_our, m_ref):
            assert a["idx"] == b.idx
            assert a["value"] == pytest.approx(b.value)
            assert a["segment"] == b.segment
            assert a["path"] == b.path

    def test_random_parity(self):
        rng = np.random.default_rng(7)
        for trial in range(5):
            series = rng.normal(size=80)
            query = series[20:30] + rng.normal(scale=0.05, size=10)
            ours = subsequence_alignment(query, series)
            theirs = ref_mod.subsequence_alignment(query, series)
            np.testing.assert_allclose(
                ours.matching_function(), theirs.matching_function(), rtol=1e-9
            )
            m_our = list(ours.kbest_matches(k=3))
            m_ref = list(theirs.kbest_matches(k=3))
            assert [m["idx"] for m in m_our] == [m.idx for m in m_ref]
            assert [m["segment"] for m in m_our] == [m.segment for m in m_ref]

    def test_best_match_finds_planted_motif(self):
        rng = np.random.default_rng(9)
        series = rng.normal(size=200)
        query = np.sin(np.linspace(0, 3, 15))
        series[100:115] = query + rng.normal(scale=0.01, size=15)
        sa = SubsequenceAlignment(query, series)
        m = next(sa.kbest_matches(k=1))
        assert 95 <= m["segment"][0] <= 105
        assert 110 <= m["segment"][1] <= 120

    def test_detectknee_parity(self):
        """DetectKnee state machine matches the reference EWMA detector
        on random curves, including only_var and invert modes."""
        from dtaidistance.util import DetectKnee as RefKnee

        from dtaidistance_ray.kernels.knee import DetectKnee

        rng = np.random.default_rng(21)
        for invert in (False, True):
            for alpha in (0.1, 0.3, 0.7):
                vals = np.cumsum(np.abs(rng.normal(size=60))) * (-1 if invert else 1)
                vals = vals[::-1] if invert else vals
                ours = DetectKnee(alpha=alpha, invert=invert, alpha_onlyvar=0.2)
                ref = RefKnee(alpha=alpha, invert=invert, alpha_onlyvar=0.2)
                for i, v in enumerate(vals):
                    ov = i % 5 == 4
                    assert ours.dostop(v, only_var=ov) == ref.dostop(v, only_var=ov)
                    assert ours.arr == pytest.approx(ref.arr)
                    assert ours.arrvar == pytest.approx(ref.arrvar)

    def test_best_matches_knee_parity(self):
        """best_matches_knee yields the same match sequence as the
        reference's knee-stopped iterator."""
        rng = np.random.default_rng(31)
        series = rng.normal(size=300)
        query = np.sin(np.linspace(0, 3, 12))
        for pos in (40, 120, 250):
            series[pos : pos + 12] = query + rng.normal(scale=0.02, size=12)
        ours_sa = SubsequenceAlignment(query, series)
        ref_sa = ref_mod.subsequence_alignment(query, series)
        m_our = list(ours_sa.best_matches_knee(alpha=0.3))
        m_ref = list(ref_sa.best_matches_knee(alpha=0.3))
        assert len(m_our) == len(m_ref)
        assert [m["idx"] for m in m_our] == [m.idx for m in m_ref]
        assert [m["segment"] for m in m_our] == [m.segment for m in m_ref]

    def test_samatch_surface_and_linearly_scale_parity(self):
        """SAMatch attribute surface + linearly_scale match the
        reference SAMatch on the same alignment."""
        rng = np.random.default_rng(17)
        series = rng.normal(size=250)
        query = np.sin(np.linspace(0, 4, 14)) * 2
        series[60:88] = np.interp(
            np.linspace(0, 13, 28), np.arange(14), query
        ) + rng.normal(scale=0.02, size=28)  # stretched occurrence
        ours = SubsequenceAlignment(query, series)
        theirs = ref_mod.subsequence_alignment(query, series)
        m_our = next(ours.kbest_matches(k=1))
        m_ref = next(theirs.kbest_matches(k=1))
        assert m_our.idx == m_ref.idx
        assert m_our.value == pytest.approx(m_ref.value)
        assert m_our.distance == pytest.approx(m_ref.distance)
        assert m_our.segment == m_ref.segment
        assert m_our.path == m_ref.path
        # dict-style access keeps working (engine's original surface)
        assert m_our["idx"] == m_our.idx
        q_our, seg_our, coeff_our, ratio_our = m_our.linearly_scale(return_coeff=True)
        q_ref, seg_ref, coeff_ref, ratio_ref = m_ref.linearly_scale(return_coeff=True)
        assert seg_our == tuple(seg_ref)
        np.testing.assert_allclose(q_our, q_ref, rtol=1e-9)
        assert coeff_our[0] == pytest.approx(coeff_ref[0])
        assert ratio_our == pytest.approx(ratio_ref)
