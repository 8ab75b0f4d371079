"""Gorilla XOR compression for float64 streams.

Scheme from the public Gorilla paper (Pelkonen et al., VLDB 2015, §4.1.2):
first value raw 64 bits; each next value XORed with its predecessor:

  xor == 0            -> '0'
  same leading/trailing window as previous block -> '10' + meaningful bits
  otherwise           -> '11' + 5b leading-zero count + 6b block length
                         + meaningful bits

Used by the rollup sink to store representative (DBA) series and
continuous-aggregate float columns as compact ``binary`` payloads.
Deterministic; exact round-trip (bit-level) for any float64 including
inf/nan. Encoder state (prev value, prev window) lives per call — the
Ray stage holds one encoder per actor and encodes one group per row.
"""

from __future__ import annotations

import struct
from typing import Iterable, List

import numpy as np

from .bits import BitReader, BitWriter


def _f2u(x: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", x))[0]


def _u2f(u: int) -> float:
    return struct.unpack(">d", struct.pack(">Q", u))[0]


def gorilla_encode(values: Iterable[float]) -> bytes:
    """Encode a float64 sequence; prefixed with a 32-bit count."""
    vals = [float(v) for v in values]
    w = BitWriter()
    w.write(len(vals), 32)
    if not vals:
        return w.bytes()
    prev = _f2u(vals[0])
    w.write(prev, 64)
    prev_lead, prev_sig = 65, 0  # no previous block
    for v in vals[1:]:
        cur = _f2u(v)
        xor = prev ^ cur
        if xor == 0:
            w.write(0, 1)
        else:
            lead = 64 - xor.bit_length()
            trail = (xor & -xor).bit_length() - 1
            if lead > 31:
                lead = 31
            sig = 64 - lead - trail
            if prev_lead <= lead and (64 - prev_lead - prev_sig) <= trail:
                # fits in the previous meaningful-bit window
                w.write(0b10, 2)
                shift = 64 - prev_lead - prev_sig
                w.write(xor >> shift, prev_sig)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(sig - 1, 6)  # sig in [1, 64] stored as sig-1
                w.write(xor >> trail, sig)
                prev_lead, prev_sig = lead, sig
        prev = cur
    return w.bytes()


def gorilla_decode(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    prev = r.read(64)
    out[0] = _u2f(prev)
    lead, sig = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = _u2f(prev)
            continue
        if r.read(1) == 0:  # '10' — reuse window
            shift = 64 - lead - sig
            xor = r.read(sig) << shift
        else:  # '11' — new window
            lead = r.read(5)
            sig = r.read(6) + 1
            shift = 64 - lead - sig
            xor = r.read(sig) << shift
        prev ^= xor
        out[i] = _u2f(prev)
    return out


def gorilla_encode_many(arrays: Iterable[Iterable[float]]) -> List[bytes]:
    return [gorilla_encode(a) for a in arrays]
