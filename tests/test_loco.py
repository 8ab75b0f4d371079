"""LocalConcurrences: WP-matrix + best_path parity vs the reference
(its own kbest extraction needs the compiled loco_cc, so the extraction
loop is verified behaviorally on planted motifs)."""

import numpy as np
import pytest

from dtaidistance_ray.stages.loco import LocalConcurrences, loco_warping_paths

ref_lc = pytest.importorskip("dtaidistance.subsequence.localconcurrences")


def _series():
    rng = np.random.default_rng(4)
    s = rng.normal(scale=0.3, size=60)
    motif = np.sin(np.linspace(0, 3, 12))
    s[5:17] += motif
    s[40:52] += motif
    return s


class TestLoCoParity:
    def test_wp_matrix_parity(self):
        s = _series()
        ours = LocalConcurrences(s)
        ours.estimate_settings_from_std(s, tau_std=0.5)
        theirs = ref_lc.LocalConcurrences(s)
        theirs.estimate_settings_from_std(s, tau_std=0.5)
        assert ours.gamma == pytest.approx(theirs.gamma)
        assert ours.tau == pytest.approx(theirs.tau)
        assert ours.delta == pytest.approx(theirs.delta)
        ours.align()
        theirs.align()
        np.testing.assert_allclose(ours._wp, theirs._wp, rtol=1e-9)

    def test_best_path_parity(self):
        s = _series()
        ours = LocalConcurrences(s)
        ours.estimate_settings_from_std(s, tau_std=0.5)
        ours.align()
        theirs = ref_lc.LocalConcurrences(s)
        theirs.estimate_settings_from_std(s, tau_std=0.5)
        theirs.align()
        r, c = np.unravel_index(int(np.argmax(ours._wp)), ours._wp.shape)
        assert ours.best_path(int(r), int(c)) == theirs.best_path(int(r), int(c))

    def test_estimate_from_ssm_parity(self):
        s = _series()
        ours = LocalConcurrences(s)
        ours.estimate_settings_from_ssm(rho=0.7, set_gamma=True)
        theirs = ref_lc.LocalConcurrences(s)
        theirs.estimate_settings_from_ssm(rho=0.7, set_gamma=True)
        assert ours.tau == pytest.approx(theirs.tau)
        assert ours.gamma == pytest.approx(theirs.gamma)


class TestLoCoBehavior:
    def test_finds_planted_concurrence(self):
        s = _series()
        lc = LocalConcurrences(s)
        lc.estimate_settings_from_std(s, tau_std=0.5)
        matches = list(lc.kbest_matches(k=1, minlen=5))
        assert len(matches) == 1
        path = matches[0]["path"]
        rows = [p[0] for p in path]
        cols = [p[1] for p in path]
        # the off-diagonal concurrence links the two motif instances
        assert min(rows) <= 20 and max(cols) >= 38

    def test_matches_do_not_overlap(self):
        s = _series()
        lc = LocalConcurrences(s)
        lc.estimate_settings_from_std(s, tau_std=0.5)
        seen = set()
        for m in lc.kbest_matches(k=3, minlen=3):
            cells = set(m["path"])
            assert not (cells & seen)
            seen |= cells


class TestRound5ReviewFixes:
    def test_nan_cells_do_not_hang_kbest(self):
        """delta_factor=0 produces 0 * -inf = NaN cells in the affinity
        DP; NaN fails every termination guard and argmax re-selected it
        forever (round-5 review finding). Must terminate."""
        rng = np.random.default_rng(3)
        s1 = rng.normal(size=30).cumsum()
        s2 = rng.normal(size=30).cumsum()
        lc = LocalConcurrences(s1, s2, tau=0.5, delta=-1.0, delta_factor=0.0)
        out = list(lc.kbest_matches(k=3))  # previously: infinite loop
        assert len(out) <= 3

    def test_pad_corner_walk_raises_loudly(self):
        """With penalty > 0 the backward walk can step into the
        zero-initialized pad rows; the reference's compiled path bounds
        the walk at the pad offsets and drops the crossing point
        (dd_loco.c loco_best_path) — the port previously emitted
        NEGATIVE series coordinates and masked wrapped-around cells
        (round-5 review finding)."""
        s1 = np.array([1.0, 2, 3, 1, 2, 0, 0, 0])
        s2 = np.concatenate([[9.0], s1])
        lc = LocalConcurrences(s1, s2, penalty=0.2)
        for m in lc.kbest_matches(k=5):
            for (a, b) in m["path"]:
                assert a >= 0 and b >= 0, "corrupt negative path coordinate"
