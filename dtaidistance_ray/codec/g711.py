"""G.711 mu-law / A-law companding codecs, pure NumPy.

Own implementation from the public ITU-T G.711 segment layout (the
same algorithm family as Sun Microsystems' classic g711.c, which is
also what CPython's `audioop` wraps). Operates at 16-bit linear scale
so results are byte-exact with `audioop.ulaw2lin/lin2ulaw` and
`alaw2lin/lin2alaw` at width=2 — tests/test_stages.py
(TestRealMediaCodecs) asserts
exhaustive equality over all 256 code bytes and all 65536 int16
values. `audioop` is used ONLY as the independent test oracle; the
tables below are built from the spec formulas, not copied.
"""
from __future__ import annotations

import numpy as np

_ULAW_BIAS = 0x84  # 132, at 16-bit scale
_ULAW_CLIP = 8159  # 14-bit magnitude clip
# segment end points at 14-bit (mu-law) / 13-bit (A-law) scale
_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int32)
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32)


def _build_ulaw_dec() -> np.ndarray:
    u = np.arange(256, dtype=np.int32) ^ 0xFF
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    t = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return np.where(u & 0x80, -t, t).astype(np.int16)


def _build_alaw_dec() -> np.ndarray:
    a = np.arange(256, dtype=np.int32) ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    # in A-law the 0x80 bit SET means positive
    return np.where(a & 0x80, t, -t).astype(np.int16)


ULAW_DECODE_TABLE = _build_ulaw_dec()
ALAW_DECODE_TABLE = _build_alaw_dec()


def ulaw_decode(codes: bytes | np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16 linear samples."""
    idx = np.frombuffer(codes, dtype=np.uint8) if isinstance(codes, (bytes, bytearray)) else np.asarray(codes, dtype=np.uint8)
    return ULAW_DECODE_TABLE[idx]


def alaw_decode(codes: bytes | np.ndarray) -> np.ndarray:
    """A-law bytes -> int16 linear samples."""
    idx = np.frombuffer(codes, dtype=np.uint8) if isinstance(codes, (bytes, bytearray)) else np.asarray(codes, dtype=np.uint8)
    return ALAW_DECODE_TABLE[idx]


def ulaw_encode(samples: np.ndarray) -> bytes:
    """int16 linear samples -> mu-law bytes (vectorized segment search)."""
    x = np.asarray(samples, dtype=np.int16).astype(np.int32) >> 2  # to 14-bit
    mask = np.where(x < 0, 0x7F, 0xFF)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + (_ULAW_BIAS >> 2)
    seg = np.searchsorted(_SEG_UEND, mag, side="left").astype(np.int32)
    in_range = seg < 8
    seg_c = np.minimum(seg, 7)
    uval = (seg_c << 4) | ((mag >> (seg_c + 1)) & 0x0F)
    out = np.where(in_range, uval, 0x7F) ^ mask
    return out.astype(np.uint8).tobytes()


def alaw_encode(samples: np.ndarray) -> bytes:
    """int16 linear samples -> A-law bytes (vectorized segment search)."""
    x = np.asarray(samples, dtype=np.int16).astype(np.int32) >> 3  # to 13-bit
    neg = x < 0
    mask = np.where(neg, 0x55, 0xD5)
    mag = np.where(neg, -x - 1, x)
    seg = np.searchsorted(_SEG_AEND, mag, side="left").astype(np.int32)
    in_range = seg < 8
    seg_c = np.minimum(seg, 7)
    shift = np.where(seg_c < 2, 1, seg_c)
    aval = (seg_c << 4) | ((mag >> shift) & 0x0F)
    out = np.where(in_range, aval, 0x7F) ^ mask
    return out.astype(np.uint8).tobytes()
