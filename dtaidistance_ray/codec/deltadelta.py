"""Delta-of-delta integer compression (Gorilla §4.1.1 timestamp scheme).

First value raw 64 bits (zig-zag), first delta raw 64 bits (zig-zag),
then per value dod = delta_i - delta_{i-1}:

  dod == 0               -> '0'
  dod in [-63, 64]       -> '10'   + 7 bits
  dod in [-255, 256]     -> '110'  + 9 bits
  dod in [-2047, 2048]   -> '1110' + 12 bits
  otherwise              -> '1111' + 66 bits (zig-zag; wider than the
                            paper's 32-bit class so arbitrary int64
                            token/timestamp streams round-trip — deltas
                            of int64 values need up to 65 bits, dods 66)

Used for bucket-timestamp grids and integer token streams in the
rollup sink.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from .bits import BitReader, BitWriter


def _zz(v: int) -> int:
    # unbounded zig-zag (deltas/dods may exceed 64 bits)
    return -2 * v - 1 if v < 0 else 2 * v


def _unzz(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def dod_encode(values: Iterable[int]) -> bytes:
    vals = [int(v) for v in values]
    w = BitWriter()
    w.write(len(vals), 32)
    if not vals:
        return w.bytes()
    w.write(_zz(vals[0]) & ((1 << 64) - 1), 64)
    if len(vals) == 1:
        return w.bytes()
    prev = vals[0]
    prev_delta = vals[1] - vals[0]
    w.write(_zz(prev_delta), 66)
    prev = vals[1]
    for v in vals[2:]:
        delta = v - prev
        dod = delta - prev_delta
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(_zz(dod), 66)
        prev = v
        prev_delta = delta
    return w.bytes()


def dod_decode(data: bytes) -> np.ndarray:
    r = BitReader(data)
    n = r.read(32)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # arithmetic in Python ints: intermediate deltas may exceed int64
    out = [0] * n
    out[0] = _unzz(r.read(64))
    if n == 1:
        return np.array(out, dtype=np.int64)
    delta = _unzz(r.read(66))
    out[1] = out[0] + delta
    prev = out[1]
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _unzz(r.read(66))
        delta += dod
        prev += delta
        out[i] = prev
    return np.array(out, dtype=np.int64)
