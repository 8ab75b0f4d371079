"""Round-trip tests for the Gorilla XOR and delta-of-delta codecs."""

import math

import numpy as np
import pytest
from hypothesis import given, settings as hsettings
from hypothesis import strategies as st

from dtaidistance_ray.codec import dod_decode, dod_encode, gorilla_decode, gorilla_encode


class TestGorilla:
    def test_empty(self):
        assert len(gorilla_decode(gorilla_encode([]))) == 0

    def test_single(self):
        np.testing.assert_array_equal(gorilla_decode(gorilla_encode([3.25])), [3.25])

    def test_constant_run_compresses(self):
        vals = [42.0] * 1000
        enc = gorilla_encode(vals)
        assert len(enc) < 200  # ~1 bit/value after header
        np.testing.assert_array_equal(gorilla_decode(enc), vals)

    def test_typical_series(self):
        rng = np.random.default_rng(0)
        vals = np.cumsum(rng.normal(size=500))
        np.testing.assert_array_equal(gorilla_decode(gorilla_encode(vals)), vals)

    def test_special_values(self):
        vals = [0.0, -0.0, math.inf, -math.inf, 1e-308, 1e308, 123.456]
        dec = gorilla_decode(gorilla_encode(vals))
        for a, b in zip(vals, dec):
            assert a == b or (a != a and b != b)
        nanvals = [1.0, float("nan"), 2.0]
        dec = gorilla_decode(gorilla_encode(nanvals))
        assert dec[0] == 1.0 and math.isnan(dec[1]) and dec[2] == 2.0

    @hsettings(max_examples=50, deadline=None)
    @given(st.lists(st.floats(allow_nan=False, width=64), max_size=60))
    def test_roundtrip_property(self, vals):
        np.testing.assert_array_equal(gorilla_decode(gorilla_encode(vals)), vals)

    def test_integer_valued_means(self):
        # DBA outputs on token tables: rational means of small ints
        vals = [float(a) / b for a, b in zip(range(100), range(1, 101))]
        np.testing.assert_array_equal(gorilla_decode(gorilla_encode(vals)), vals)


class TestDeltaDelta:
    def test_empty_and_small(self):
        for vals in ([], [7], [7, 9], [1, 2, 3]):
            np.testing.assert_array_equal(dod_decode(dod_encode(vals)), vals)

    def test_regular_grid_compresses(self):
        ts = list(range(1_700_000_000, 1_700_000_000 + 3600 * 1000, 3600))
        enc = dod_encode(ts)
        assert len(enc) < 200  # ~1 bit/step
        np.testing.assert_array_equal(dod_decode(enc), ts)

    def test_irregular(self):
        rng = np.random.default_rng(1)
        ts = np.cumsum(rng.integers(-5000, 5000, size=300)).astype(np.int64)
        np.testing.assert_array_equal(dod_decode(dod_encode(ts)), ts)

    @hsettings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=40))
    def test_roundtrip_property(self, vals):
        np.testing.assert_array_equal(dod_decode(dod_encode(vals)), vals)

    def test_tokens(self):
        rng = np.random.default_rng(2)
        toks = rng.integers(0, 32000, size=500)
        np.testing.assert_array_equal(dod_decode(dod_encode(toks)), toks)


class TestPngProperty:
    @hsettings(max_examples=40, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=24),
        w=st.integers(min_value=1, max_value=24),
        ft=st.integers(min_value=0, max_value=4),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_roundtrip_property(self, h, w, ft, seed):
        """PNG encode/decode round-trips bit-exactly for every image
        shape and scanline filter (property-based)."""
        import numpy as np

        from dtaidistance_ray.stages.multimodal import decode_png, encode_png

        px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = decode_png(encode_png(px, filter_type=ft))
        np.testing.assert_array_equal(got, px)
