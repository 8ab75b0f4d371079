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


class TestAviMjpeg:
    """MJPEG-in-AVI container codec (codec/avi.py). The decoder is
    anchored to a hand-assembled spec-level byte fixture built with
    raw struct.pack from the public Microsoft AVI RIFF layout —
    independent of the repo's own encoder."""

    @staticmethod
    def _frames(n=4, h=16, w=24, seed=0):
        rng = np.random.default_rng(seed)
        grad = np.add.outer(np.linspace(0, 50, h), np.linspace(0, 50, w))[:, :, None]
        return [
            np.clip(grad + 40 + 35 * k + rng.normal(0, 1.5, (h, w, 3)), 0, 255).astype(np.uint8)
            for k in range(n)
        ]

    def test_roundtrip(self):
        from dtaidistance_ray.codec.avi import decode_avi_mjpeg, encode_avi_mjpeg

        frames = self._frames()
        avi = encode_avi_mjpeg(frames, rate=30000, scale=1001, quality=90)
        dec, info = decode_avi_mjpeg(avi)
        assert info.n_frames == 4 and (info.width, info.height) == (24, 16)
        assert (info.rate, info.scale) == (30000, 1001)
        for src, d in zip(frames, dec):
            assert d.shape == src.shape
            assert abs(float(src.mean()) - float(d.mean())) < 1.0

    def test_frame_index_timeline(self):
        from dtaidistance_ray.codec.avi import encode_avi_mjpeg, frame_index_at, parse_avi

        avi = encode_avi_mjpeg(self._frames(5), rate=30000, scale=1001)
        info = parse_avi(avi)
        # frame i covers [i*1001/30, (i+1)*1001/30) ms
        assert frame_index_at(info, 0) == 0
        assert frame_index_at(info, 33) == 0
        assert frame_index_at(info, 34) == 1
        assert frame_index_at(info, 10**9) == 4  # clamped to last frame
        assert info.duration_ms == round(5 * 1001 / 30)

    def test_spec_fixture_hand_assembled(self):
        """Container bytes laid out by hand straight from the spec:
        interleaved audio ('01wb', to be skipped) + video stream, the
        video declared SECOND (stream 01 -> '01dc' chunks), one frame
        wrapped in the optional LIST 'rec ' grouping, an odd-sized
        junk chunk exercising the pad-byte rule, and no idx1."""
        import struct

        from dtaidistance_ray.codec.avi import decode_avi_mjpeg, parse_avi
        from dtaidistance_ray.codec.jpeg import decode_jpeg, encode_jpeg

        f0, f1 = self._frames(2, h=8, w=8, seed=3)
        j0 = encode_jpeg(f0, quality=92)
        j1 = encode_jpeg(f1, quality=92)

        def ck(cid, data):
            return cid + struct.pack("<I", len(data)) + data + (b"\0" if len(data) % 2 else b"")

        def li(ltype, payload):
            return ck(b"LIST", ltype + payload)

        # stream 0: audio (PCM); stream 1: video MJPG 8x8 @ 10 fps
        strh_a = struct.pack("<4s4sIHHIIIIIIiI4h", b"auds", b"\0\0\0\0", 0, 0, 0, 0, 1, 8000, 0, 800, 0, -1, 1, 0, 0, 0, 0)
        strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        strh_v = struct.pack("<4s4sIHHIIIIIIiI4h", b"vids", b"MJPG", 0, 0, 0, 0, 1, 10, 0, 2, max(len(j0), len(j1)), -1, 0, 0, 0, 8, 8)
        strf_v = struct.pack("<IiiHH4sIiiII", 40, 8, 8, 1, 24, b"MJPG", 8 * 8 * 3, 0, 0, 0, 0)
        avih = struct.pack("<14I", 100000, 0, 0, 0, 2, 0, 2, 0, 8, 8, 0, 0, 0, 0)
        hdrl = li(b"hdrl", ck(b"avih", avih) + li(b"strl", ck(b"strh", strh_a) + ck(b"strf", strf_a)) + li(b"strl", ck(b"strh", strh_v) + ck(b"strf", strf_v)))
        movi = li(
            b"movi",
            ck(b"01dc", j0)
            + ck(b"00wb", b"\x80" * 801)  # odd size: pad byte follows
            + li(b"rec ", ck(b"00wb", b"\x80" * 800) + ck(b"01dc", j1)),
        )
        avi = ck(b"RIFF", b"AVI " + hdrl + movi)

        info = parse_avi(avi)
        assert (info.width, info.height) == (8, 8)
        assert (info.rate, info.scale) == (10, 1)
        assert info.n_frames == 2
        assert info.frame_chunks == [j0, j1]
        dec, _ = decode_avi_mjpeg(avi)
        np.testing.assert_array_equal(dec[0], decode_jpeg(j0))
        np.testing.assert_array_equal(dec[1], decode_jpeg(j1))

    def test_rejects_garbage_and_shape_mismatch(self):
        from dtaidistance_ray.codec.avi import encode_avi_mjpeg, parse_avi

        with pytest.raises(ValueError):
            parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            encode_avi_mjpeg([])
        with pytest.raises(ValueError):
            encode_avi_mjpeg([np.zeros((8, 8, 3), np.uint8), np.zeros((8, 9, 3), np.uint8)])


class _HandBits:
    """Test-local MSB-first bit assembler — independent of the codec's
    own _BitWriter so the fixture can't inherit an encoder bug."""

    def __init__(self):
        self.v = 0
        self.n = 0

    def put(self, value, nbits):
        self.v = (self.v << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        return self

    def bytes(self):
        assert self.n % 8 == 0
        return self.v.to_bytes(self.n // 8, "big")


def _hand_streaminfo(rate, channels, bps, total, blocksize):
    b = _HandBits()
    b.put(blocksize, 16).put(blocksize, 16)        # min/max blocksize
    b.put(0, 24).put(0, 24)                        # min/max frame size
    b.put(rate, 20).put(channels - 1, 3).put(bps - 1, 5)
    b.put(total, 36)
    body = b.bytes() + bytes(16)                   # md5 = zeros
    assert len(body) == 34
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + body


def _hand_frame(subframe_bits: "_HandBits", blocksize: int):
    """Frame header (mono, 16-bit, rate from STREAMINFO, frame #0,
    16-bit blocksize field) + CRC-8, the given subframe, pad, CRC-16 —
    every field placed per the spec document, not via the encoder."""
    from dtaidistance_ray.codec.flac import crc8, crc16

    h = _HandBits()
    h.put(0b11111111111110, 14).put(0, 1).put(0, 1)
    h.put(7, 4)      # blocksize: 16-bit value-1 follows header
    h.put(0, 4)      # sample rate: from STREAMINFO
    h.put(0, 4)      # channel assignment: 1 channel
    h.put(0b100, 3)  # sample size: 16 bit
    h.put(0, 1)
    h.put(0, 8)      # UTF-8 frame number 0
    h.put(blocksize - 1, 16)
    hdr = h.bytes()
    hdr += bytes([crc8(hdr)])
    body = _HandBits()
    body.put(int.from_bytes(hdr, "big"), len(hdr) * 8)
    body.v = (body.v << subframe_bits.n) | subframe_bits.v
    body.n += subframe_bits.n
    if body.n % 8:
        body.put(0, 8 - body.n % 8)
    frame = body.bytes()
    return frame + crc16(frame).to_bytes(2, "big")


class TestFLACCodec:
    def test_hand_built_constant_frame(self):
        """Spec fixture: mono 16-bit stream, one CONSTANT subframe of
        value -321 over 4 samples — every bit placed by hand."""
        from dtaidistance_ray.codec.flac import decode_flac, parse_streaminfo

        sub = _HandBits()
        sub.put(0, 1).put(0, 6).put(0, 1)   # pad, type=CONSTANT, no wasted bits
        sub.put(-321, 16)
        payload = _hand_streaminfo(8000, 1, 16, 4, 4) + _hand_frame(sub, 4)
        info = parse_streaminfo(payload)
        assert info["sample_rate"] == 8000
        assert info["channels"] == 1
        assert info["bits_per_sample"] == 16
        assert info["total_samples"] == 4
        dec, rate = decode_flac(payload)
        assert rate == 8000
        np.testing.assert_array_equal(dec, np.full(4, -321, dtype=np.int32))

    def test_hand_built_fixed1_rice_frame(self):
        """Spec fixture: FIXED order-1 subframe, Rice method 0,
        partition order 0, parameter k=1. Samples [5, 7, 4, 4]:
        residuals (first differences) [2, -3, 0] -> zigzag [4, 5, 0]
        -> rice(k=1) quotients [2, 2, 0] remainders [0, 1, 0]."""
        from dtaidistance_ray.codec.flac import decode_flac

        sub = _HandBits()
        sub.put(0, 1).put(0b001001, 6).put(0, 1)  # FIXED order 1
        sub.put(5, 16)                            # warmup sample
        sub.put(0, 2).put(0, 4)                   # residual method 0, porder 0
        sub.put(1, 4)                             # rice parameter k=1
        sub.put(0b001, 3).put(0, 1)               # u=4: q=2 (001), r=0
        sub.put(0b001, 3).put(1, 1)               # u=5: q=2, r=1
        sub.put(1, 1).put(0, 1)                   # u=0: q=0, r=0
        payload = _hand_streaminfo(16000, 1, 16, 4, 4) + _hand_frame(sub, 4)
        dec, rate = decode_flac(payload)
        assert rate == 16000
        np.testing.assert_array_equal(dec, np.array([5, 7, 4, 4], dtype=np.int32))

    def test_hand_built_wasted_bits_and_escape_rice2(self):
        """Spec fixture: VERBATIM subframe with 2 wasted bits (values
        shift left on output), then a FIXED-0 frame whose residual uses
        coding method 1 (5-bit parameters) with an ESCAPE partition of
        raw 3-bit values."""
        from dtaidistance_ray.codec.flac import decode_flac

        sub = _HandBits()
        sub.put(0, 1).put(1, 6)                  # VERBATIM
        sub.put(1, 1).put(0b01, 2)               # wasted flag, unary 1+1 = 2
        for v in (3, -2, 1, 0):                  # 14-bit effective samples
            sub.put(v, 14)
        p1 = _hand_streaminfo(8000, 1, 16, 4, 4) + _hand_frame(sub, 4)
        dec, _ = decode_flac(p1)
        np.testing.assert_array_equal(dec, np.array([12, -8, 4, 0], dtype=np.int32))

        sub = _HandBits()
        sub.put(0, 1).put(0b001000, 6).put(0, 1)  # FIXED order 0
        sub.put(1, 2).put(0, 4)                   # method 1 (rice2), porder 0
        sub.put(31, 5)                            # escape parameter
        sub.put(3, 5)                             # raw bit width 3
        for v in (1, -2, 3, 0):
            sub.put(v, 3)
        p2 = _hand_streaminfo(8000, 1, 16, 4, 4) + _hand_frame(sub, 4)
        dec, _ = decode_flac(p2)
        np.testing.assert_array_equal(dec, np.array([1, -2, 3, 0], dtype=np.int32))

    def test_round_trip_every_mode_and_partition(self):
        from dtaidistance_ray.codec.flac import decode_flac, encode_flac

        rng = np.random.default_rng(7)
        for mode in ("constant", "verbatim", "fixed0", "fixed1", "fixed2",
                     "fixed3", "fixed4", "lpc", "auto"):
            x = (
                np.full(768, 99, dtype=np.int16)
                if mode == "constant"
                else (np.sin(np.arange(768) / 9) * 7000 + rng.normal(0, 90, 768)).astype(np.int16)
            )
            for po in (0, 1, 2):
                dec, rate = decode_flac(encode_flac(x, 22050, mode=mode, partition_order=po, blocksize=256))
                assert rate == 22050
                np.testing.assert_array_equal(dec, x.astype(np.int32)), (mode, po)

    def test_round_trip_stereo_decorrelation(self):
        from dtaidistance_ray.codec.flac import decode_flac, encode_flac

        x = (np.sin(np.arange(640) / 12) * 8000).astype(np.int16)
        st = np.stack([x, (np.roll(x, 5) // 2).astype(np.int16)], axis=1)
        for sm in ("independent", "left_side", "right_side", "mid_side"):
            dec, _ = decode_flac(encode_flac(st, 44100, mode="fixed2", stereo_mode=sm, blocksize=128))
            np.testing.assert_array_equal(dec, st.astype(np.int32)), sm

    def test_multiframe_and_odd_tail(self):
        from dtaidistance_ray.codec.flac import decode_flac, encode_flac

        rng = np.random.default_rng(3)
        x = rng.normal(0, 2500, 10007).astype(np.int16)
        dec, _ = decode_flac(encode_flac(x, 8000, mode="auto", blocksize=4096))
        np.testing.assert_array_equal(dec, x.astype(np.int32))

    def test_crc_tamper_detection(self):
        from dtaidistance_ray.codec.flac import decode_flac, encode_flac, parse_streaminfo

        x = (np.sin(np.arange(512) / 8) * 5000).astype(np.int16)
        enc = bytearray(encode_flac(x, 16000, mode="fixed2"))
        off = parse_streaminfo(bytes(enc))["frames_offset"]
        enc[-3] ^= 0x40  # flip a bit inside the last frame body
        with pytest.raises(ValueError):
            decode_flac(bytes(enc))
        with pytest.raises(ValueError):
            decode_flac(b"RIFF not flac")
        hdr_tamper = bytearray(encode_flac(x, 16000))
        hdr_tamper[off + 2] ^= 0x01  # flip a frame-header bit
        with pytest.raises(ValueError):
            decode_flac(bytes(hdr_tamper))

    def test_short_tail_block_partition_clamp(self):
        """Regression (round-5 review): a final short block whose size
        is not divisible by 2^partition_order, or whose first partition
        would hold <= predictor-order samples, must still round-trip —
        the encoder clamps the order per frame instead of emitting a
        spec-invalid or silently-corrupt layout."""
        from dtaidistance_ray.codec.flac import decode_flac, encode_flac

        for n, mode in ((4104, "fixed4"), (4106, "fixed2"), (4097, "lpc")):
            x = (np.sin(np.arange(n) / 9) * 7000).astype(np.int16)
            dec, _ = decode_flac(encode_flac(x, 8000, mode=mode, partition_order=2, blocksize=4096))
            np.testing.assert_array_equal(dec, x.astype(np.int32)), (n, mode)

    def test_decoder_rejects_negative_first_partition(self):
        """Spec-invalid residual layout (first partition count < 0 with
        partition_order > 0) must raise, not write through negative
        indices."""
        from dtaidistance_ray.codec.flac import decode_flac

        sub = _HandBits()
        sub.put(0, 1).put(0b001100, 6).put(0, 1)  # FIXED order 4
        for v in (1, 2, 3, 4):                    # warmup
            sub.put(v, 16)
        sub.put(0, 2).put(1, 4)                   # method 0, porder 1: psize 2 < 4
        sub.put(0, 4).put(0, 4)                   # two empty-ish partitions
        payload = _hand_streaminfo(8000, 1, 16, 4, 4) + _hand_frame(sub, 4)
        with pytest.raises(ValueError):
            decode_flac(payload)

    def test_unknown_total_samples_decodes_all_frames(self):
        """Regression (round-5 review): STREAMINFO total_samples == 0 is
        spec-legal 'unknown length' (RFC 9639) — the decoder must decode
        the frames present, not silently return zero samples."""
        from dtaidistance_ray.codec.flac import decode_flac, encode_flac, parse_streaminfo

        rng = np.random.default_rng(11)
        x = rng.normal(0, 3000, 9000).astype(np.int16)
        enc = bytearray(encode_flac(x, 8000, mode="auto", blocksize=4096))
        # zero the 36-bit total_samples field: bits 128..163 of the 34-byte
        # STREAMINFO body starting at offset 8 (fLaC + 4-byte block header)
        si = int.from_bytes(enc[8 : 8 + 34], "big")
        si &= ~(0xFFFFFFFFF << 128)
        enc[8 : 8 + 34] = si.to_bytes(34, "big")
        assert parse_streaminfo(bytes(enc))["total_samples"] == 0
        dec, rate = decode_flac(bytes(enc))
        assert rate == 8000
        np.testing.assert_array_equal(dec, x.astype(np.int32))

    def test_encoder_rejects_out_of_range_fields(self):
        """Regression (round-5 review): blocksize/rate beyond their FLAC
        field widths must fail loudly at encode time instead of emitting
        a stream that fails with an unrelated CRC error at decode."""
        from dtaidistance_ray.codec.flac import encode_flac

        x = np.zeros(16, dtype=np.int16)
        with pytest.raises(ValueError, match="blocksize"):
            encode_flac(x, 8000, blocksize=70000)
        with pytest.raises(ValueError, match="blocksize"):
            encode_flac(x, 8000, blocksize=0)
        with pytest.raises(ValueError, match="rate"):
            encode_flac(x, 1 << 20)
        with pytest.raises(ValueError, match="rate"):
            encode_flac(x, 0)
