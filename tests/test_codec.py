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


class TestJpeg:
    """Baseline JPEG codec (codec/jpeg.py): lossy, so round-trip is
    judged by PSNR and structure, not bit equality. No JPEG library
    exists in this container to cross-check against; the structural
    probes (markers, stuffing, dimensions) plus PSNR bounds are the
    self-contained evidence."""

    @staticmethod
    def _psnr(a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)

    def _smooth(self, h, w):
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [(yy * 3 + xx * 2) % 256, (xx * 4) % 256, (yy * 5) % 256], axis=2
        ).astype(np.uint8)

    def test_roundtrip_psnr_444(self):
        from dtaidistance_ray.codec.jpeg import decode_jpeg, encode_jpeg

        img = self._smooth(37, 53)
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="444"))
        assert dec.shape == img.shape
        assert self._psnr(img, dec) > 40

    def test_roundtrip_psnr_420(self):
        from dtaidistance_ray.codec.jpeg import decode_jpeg, encode_jpeg

        img = self._smooth(37, 53)  # odd dims exercise chroma padding
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
        assert dec.shape == img.shape
        assert self._psnr(img, dec) > 35

    def test_grayscale(self):
        from dtaidistance_ray.codec.jpeg import decode_jpeg, encode_jpeg

        g = self._smooth(25, 19)[:, :, 0]
        dec = decode_jpeg(encode_jpeg(g, quality=90))
        assert dec.shape == (25, 19, 3)
        assert (dec[:, :, 0] == dec[:, :, 1]).all()
        assert self._psnr(np.repeat(g[:, :, None], 3, axis=2), dec) > 35

    def test_flat_image_exact(self):
        from dtaidistance_ray.codec.jpeg import decode_jpeg, encode_jpeg

        flat = np.full((16, 24, 3), 77, np.uint8)
        assert (decode_jpeg(encode_jpeg(flat, quality=85)) == 77).all()

    def test_marker_structure(self):
        from dtaidistance_ray.codec.jpeg import encode_jpeg

        enc = encode_jpeg(self._smooth(16, 16), quality=85)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        assert b"\xff\xc0" in enc and b"\xff\xc4" in enc and b"\xff\xdb" in enc
        # entropy segment must stuff 0xFF bytes: no bare 0xFF+marker
        # other than EOI after SOS
        sos = enc.index(b"\xff\xda")
        body = enc[sos + 2 :-2]
        i = 0
        seglen = int.from_bytes(body[:2], "big")
        i = seglen
        while i < len(body) - 1:
            if body[i] == 0xFF:
                assert body[i + 1] == 0x00, f"unstuffed FF at {i}"
                i += 2
            else:
                i += 1

    def test_quality_monotonic_size(self):
        from dtaidistance_ray.codec.jpeg import encode_jpeg

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]

    @hsettings(max_examples=25, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=40),
        w=st.integers(min_value=1, max_value=40),
        sub=st.sampled_from(["444", "420"]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def test_roundtrip_property(self, h, w, sub, seed):
        """Any shape (incl. 1xN edges) decodes back to the same
        dimensions with bounded error (property-based)."""
        from dtaidistance_ray.codec.jpeg import decode_jpeg, encode_jpeg

        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        phase = rng.uniform(0, 2 * np.pi, 3)
        freq = rng.uniform(0.05, 0.4, 3)
        px = np.stack(
            [
                (127.5 + 120 * np.sin(freq[c] * (yy + 2 * xx) + phase[c]))
                for c in range(3)
            ],
            axis=2,
        ).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(px, quality=95, subsampling=sub))
        assert dec.shape == px.shape
        # 4:2:0 legitimately destroys saturated per-pixel chroma swings
        # (2x2 decimation); the loss is subsampling, not coding
        assert self._psnr(px, dec) > (26 if sub == "444" else 12)
        # decode is deterministic
        dec2 = decode_jpeg(encode_jpeg(px, quality=95, subsampling=sub))
        np.testing.assert_array_equal(dec, dec2)

    def test_decode_rejects_garbage(self):
        from dtaidistance_ray.codec.jpeg import decode_jpeg

        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")
