"""ExplainPair (Dynamic Subsequence Warping) parity vs the reference
implementation, plus the paper's tolerance-bound property."""

import numpy as np
import pytest

from dtaidistance_ray.stages.explain import ExplainPair

ref_mod = pytest.importorskip("dtaidistance.explain.dsw.explainpair")
from dtaidistance_ray.kernels.elastic import distance as dtw_distance  # noqa: E402


CONFIGS = [
    dict(delta_rel=1, delta_abs=0.3),
    dict(delta_rel=2, delta_abs=1),
    dict(approx_type="max_diff", delta_abs=0.5),
    dict(approx_type="max_factor", delta_rel=0.5),
    dict(delta_rel=1, delta_abs=0.3, approx_prune=False),
    dict(approx_type="max_index", delta_abs=2.0),
    dict(approx_type="max_dist", delta_abs=3.0),
    dict(delta_rel=1, delta_abs=0.3, approx_local=False),
    dict(delta_rel=1, delta_abs=0.3, onlychanges=3),
    dict(delta_rel=1, delta_abs=0.3, split_strategy="pathdiff"),
    dict(delta_rel=1, delta_abs=0.3, split_strategy="deriv"),
    dict(delta_rel=1, delta_abs=0.3, split_strategy="derivdist"),
]


class TestExplainPairParity:
    def test_segments_and_distances_match_reference(self):
        rng = np.random.default_rng(0)
        for _ in range(6):
            ya = np.cumsum(rng.normal(size=int(rng.integers(40, 120)))) * 0.3
            yb = np.cumsum(rng.normal(size=int(rng.integers(40, 120)))) * 0.3
            for kw in CONFIGS:
                r = ref_mod.ExplainPair(ya, yb, **kw)
                o = ExplainPair(ya, yb, **kw)
                assert [tuple(p) for p in r.line2] == [tuple(p) for p in o.line2], kw
                rs = [
                    (s.s_idx, s.e_idx, s.s_idx_y, s.e_idx_y, s.shift, s.elasticity)
                    for s in r.segments
                ]
                os_ = [
                    (s.s_idx, s.e_idx, s.s_idx_y, s.e_idx_y, s.shift, s.elasticity)
                    for s in o.segments
                ]
                assert rs == os_, kw
                if r.segments:
                    assert r.distance_approx() == pytest.approx(o.distance_approx())
                    assert r.distance() == pytest.approx(o.distance())
                    np.testing.assert_allclose(o.variations, r.variations)

    def test_tolerance_bound_property(self):
        # the paper's guarantee: for max_factor_and_diff the simplified
        # path's distance stays within d*(1+Delta_rel) + delta_abs'
        # (deltas transformed through the squared inner distance)
        rng = np.random.default_rng(4)
        for _ in range(5):
            ya = np.cumsum(rng.normal(size=100))
            yb = np.cumsum(rng.normal(size=110))
            d = dtw_distance(ya, yb)
            delta_rel, delta_abs = 1, 0.3
            ep = ExplainPair(ya, yb, delta_rel=delta_rel, delta_abs=delta_abs)
            cap_rel = np.sqrt((d * delta_rel) ** 2) / d
            cap_abs = np.sqrt(d**2 + 0) + delta_abs - d  # transformed allowance
            bound = d * (1 + cap_rel) + (np.sqrt((d + delta_abs) ** 2) - d)
            assert ep.distance_approx() <= bound + 1e-9

    def test_clipped_views(self):
        rng = np.random.default_rng(7)
        ya = np.cumsum(rng.normal(size=80))
        yb = np.cumsum(rng.normal(size=60))
        ep = ExplainPair(ya, yb, delta_rel=1, delta_abs=0.5)
        for s in ep.segments:
            assert s.expansion >= 0 and s.compression >= 0
            assert s.expansion - s.compression == s.elasticity
            assert s.shift_r - s.shift_l == s.shift
