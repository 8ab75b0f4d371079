"""Synthetic pattern generators (scipy-free reference surface).

The reference's benchmarks/synthetic.py needs scipy, which is absent
here — so the oracle for the Dawson integral is mathematics itself:
the Taylor series on |x| <= 1 and the asymptotic expansion for large
x, each on its own convergence domain, plus the ODE invariant
F'(x) = 1 - 2 x F(x) checked spectrally via finite differences.
"""

import math

import numpy as np
import pytest

from dtaidistance_ray.sources.patterns import (
    dawsn,
    pattern1,
    pattern2,
    ts_under_pattern1,
)


def _dawsn_taylor(x: float, terms: int = 60) -> float:
    # F(x) = sum_k (-2)^k x^(2k+1) / (2k+1)!!  — converges fast for |x|<=1.5
    total = 0.0
    term = x  # k=0: x
    for k in range(terms):
        total += term
        term *= -2.0 * x * x / (2 * k + 3)
    return total


def _dawsn_asymptotic(x: float, terms: int = 10) -> float:
    # F(x) ~ 1/(2x) * sum_k (2k-1)!! / (2x^2)^k  — valid for large |x|
    total = 0.0
    term = 1.0 / (2.0 * x)
    for k in range(terms):
        total += term
        term *= (2 * k + 1) / (2.0 * x * x)
    return total


class TestDawson:
    def test_taylor_domain(self):
        xs = np.linspace(-1.5, 1.5, 31)
        got = dawsn(xs)
        want = np.array([_dawsn_taylor(float(v)) for v in xs])
        np.testing.assert_allclose(got, want, atol=1e-14)

    def test_asymptotic_domain(self):
        xs = np.array([8.0, 10.0, 15.0, -8.0, -12.0])
        got = dawsn(xs)
        want = np.array([_dawsn_asymptotic(float(v), terms=12) for v in xs])
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_known_values(self):
        # at the maximum x*, F'(x*)=0 and the ODE gives F(x*)=1/(2 x*)
        xstar = 0.9241388730
        assert dawsn(xstar) == pytest.approx(1.0 / (2.0 * xstar), abs=1e-9)
        assert dawsn(0.0) == pytest.approx(0.0, abs=1e-15)
        # odd function
        xs = np.linspace(0.1, 4, 17)
        np.testing.assert_allclose(dawsn(xs), -dawsn(-xs), atol=1e-15)

    def test_ode_invariant(self):
        # F' = 1 - 2 x F, checked with a 4th-order central difference
        xs = np.linspace(-5, 5, 101)
        h = 1e-3
        fp = (
            dawsn(xs - 2 * h)
            - 8 * dawsn(xs - h)
            + 8 * dawsn(xs + h)
            - dawsn(xs + 2 * h)
        ) / (12 * h)
        np.testing.assert_allclose(fp, 1 - 2 * xs * dawsn(xs), atol=1e-9)


class TestPatterns:
    def test_pattern2_structure(self):
        y = pattern2(50, 10, 20)
        assert y.shape == (50,)
        assert (y[:10] == 0).all() and (y[30:] == 0).all()
        np.testing.assert_allclose(y[10:30], np.sin(np.linspace(0, 2 * np.pi, 20)))

    def test_pattern1_shape_and_regions(self):
        x = np.linspace(0, 30, 200)
        y = pattern1(x, x0=7, c=0.5, a=1.0, x1=22, d=1)
        assert y.shape == x.shape
        # exponential rise toward c before x0, converged level after overshoot
        want0 = math.exp(0) / (math.exp(7) / 0.5) + math.exp(-0.5 * 49) / math.sqrt(
            2 * math.pi
        )  # exp rise + the a*N(0,1) overshoot bump at x-x0=-7
        assert y[0] == pytest.approx(want0, rel=1e-12)
        assert y[np.searchsorted(x, 15)] == pytest.approx(0.5, abs=0.1)
        # sine-like cycle only inside [x1-3, x1+3]
        outside = (x < 19) & (x > 15)
        inside = (x > 20) & (x < 24)
        assert np.abs(y[inside] - 0.5).max() > np.abs(y[outside] - 0.5).max()

    def test_pattern1_dip_and_noise_determinism(self):
        x = np.linspace(0, 30, 200)
        base = pattern1(x, w2=0)
        dip = pattern1(x, x2=25, w2=5)
        i25 = int(np.argmin(np.abs(x - 25)))  # 25 is not exactly on the grid
        # normalized gaussian dip of depth c at x2
        z = (x[i25] - 25.0) / 0.5
        assert dip[i25] == pytest.approx(base[i25] - 0.5 * math.exp(-0.5 * z * z), abs=1e-12)
        assert np.allclose(dip[x < 20], base[x < 20], atol=1e-9)  # dip is local
        n1 = pattern1(x, r=0.1, rs=3980)
        n2 = pattern1(x, r=0.1, rs=3980)
        np.testing.assert_array_equal(n1, n2)  # seeded noise is reproducible
        assert ((n1 - base) >= 0).all() and ((n1 - base) <= 0.1).all()

    def test_ts_under_pattern1_defaults(self):
        x, ys, ys_new = ts_under_pattern1()
        assert x.shape == (200,) and len(ys) == 5 and len(ys_new) == 1
        assert all(y.shape == (200,) for y in ys + ys_new)
        # distinct cluster members
        assert not np.allclose(ys[0], ys[1])
