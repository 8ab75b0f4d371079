"""FLAC (Free Lossless Audio Codec) decoder + test encoder, built from
the PUBLIC format specification (RFC 9639 / the xiph.org FLAC format
document) — no codec library involved.

Decoder coverage:
  - fLaC stream marker, metadata blocks (STREAMINFO parsed, others
    skipped), frame sync walk
  - frame header: block-size / sample-rate / sample-size codes incl.
    the 8/16-bit trailing forms, UTF-8-coded frame/sample number,
    CRC-8 header check, CRC-16 frame check
  - subframes: CONSTANT, VERBATIM, FIXED (orders 0-4, vectorized
    cumulative-sum reintegration), LPC (orders 1-32, quantized
    coefficients + shift), wasted-bits
  - residual: Rice partitions, coding methods 0 (4-bit parameter) and
    1 (5-bit), escape partitions (raw n-bit, incl. n=0)
  - inter-channel decorrelation: left-side, right-side, mid-side
    (side channel carries +1 bit)

The encoder exists to synthesize test corpora (constant / verbatim /
fixed / LPC subframes, selectable Rice partition order, mono or
stereo with decorrelation) — decoder correctness is anchored to a
hand-built spec fixture in tests/test_codec.py plus round-trips over
every subframe type, NOT to the encoder alone.

Bit access is numpy-vectorized where the format allows: the frame
region is unpacked to a bit array once, unary (Rice quotient) reads
are searchsorted jumps over the precomputed 1-bit positions, and
fixed-order prediction is reintegrated with cumulative sums. Like
codec/jpeg.py and codec/gif.py this has NO reference counterpart
(wannesm/dtaidistance has no media ops); it is a north-rule
multimodal-pipeline component.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

_POW2 = (1 << np.arange(63, -1, -1).astype(np.int64)).astype(np.int64)

# ---------------------------------------------------------------- CRC

def _make_crc8_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t[i] = c
    return t


def _make_crc16_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t[i] = c
    return t


_CRC8_T = _make_crc8_table()
_CRC16_T = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_T[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ int(_CRC16_T[((c >> 8) ^ b) & 0xFF])
    return c


# ---------------------------------------------------------- bit reader

class _Bits:
    """MSB-first bit reader over a frame region: bits unpacked ONCE to
    a numpy array; unary reads jump via searchsorted over the 1-bit
    positions (no per-bit Python loop on the Rice hot path)."""

    __slots__ = ("bits", "ones", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits).astype(np.int64)
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > len(self.bits):
            raise ValueError("flac: bitstream truncated")
        v = int(self.bits[p : p + n].astype(np.int64) @ _POW2[64 - n :])
        self.pos = p + n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and (v >> (n - 1)) else v

    def unary(self) -> int:
        j = int(np.searchsorted(self.ones, self.pos))
        if j >= len(self.ones):
            raise ValueError("flac: bitstream truncated in unary code")
        stop = int(self.ones[j])
        q = stop - self.pos
        self.pos = stop + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) // 8 * 8

    def byte_pos(self) -> int:
        return self.pos // 8


# ------------------------------------------------------------- decoder

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_utf8_number(br: _Bits) -> int:
    """UTF-8-style variable-length frame/sample number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("flac: bad UTF-8 coded number")
    val = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: bad UTF-8 continuation")
        val = (val << 6) | (c & 0x3F)
    return val


def _decode_residual(br: _Bits, blocksize: int, pred_order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("flac: partition order does not divide block size")
    psize = blocksize >> porder
    if psize < pred_order or (psize == pred_order and nparts == 1):
        # first partition holds psize - pred_order samples: negative is
        # always spec-invalid; zero leaves an empty frame when it is
        # the only partition
        raise ValueError("flac: first partition has no samples")
    out = np.empty(blocksize - pred_order, dtype=np.int64)
    w = 0
    for part in range(nparts):
        count = psize - (pred_order if part == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            nbits = br.read(5)
            if nbits == 0:
                out[w : w + count] = 0
            else:
                for i in range(count):
                    out[w + i] = br.read_signed(nbits)
            w += count
            continue
        for i in range(count):
            q = br.unary()
            r = br.read(param) if param else 0
            u = (q << param) | r
            out[w + i] = (u >> 1) ^ -(u & 1)  # zigzag
        w += count
    return out


def _restore_fixed(warmup: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Invert the order-th finite difference with cumulative sums
    seeded by the warmup samples' difference pyramid."""
    if order == 0:
        return res.copy()
    seeds = [warmup.astype(np.int64)]
    for _ in range(order - 1):
        seeds.append(np.diff(seeds[-1]))
    cur = res.astype(np.int64)
    for lvl in range(order - 1, -1, -1):
        cur = np.cumsum(np.concatenate(([seeds[lvl][-1]], cur)))[1:]
    return np.concatenate([warmup.astype(np.int64), cur])


def _restore_lpc(warmup: np.ndarray, res: np.ndarray, coefs: List[int], shift: int) -> np.ndarray:
    order = len(coefs)
    n = order + len(res)
    x = np.empty(n, dtype=np.int64)
    x[:order] = warmup
    c = np.array(coefs[::-1], dtype=np.int64)  # c aligns with x[i-order:i]
    for i in range(order, n):
        x[i] = res[i - order] + (int(x[i - order : i] @ c) >> shift)
    return x


def _decode_subframe(br: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        x = np.full(blocksize, br.read_signed(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        x = np.array([br.read_signed(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = np.array([br.read_signed(eff) for _ in range(order)], dtype=np.int64)
        res = _decode_residual(br, blocksize, order)
        x = _restore_fixed(warm, res, order)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 0x1F) + 1
        warm = np.array([br.read_signed(eff) for _ in range(order)], dtype=np.int64)
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid LPC precision code 15")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, blocksize, order)
        x = _restore_lpc(warm, res, coefs, shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        x <<= wasted
    return x


def parse_streaminfo(payload: bytes) -> dict:
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info: Optional[dict] = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype, last = hdr & 0x7F, hdr >> 7
        size = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            if size != 34:
                raise ValueError("flac: STREAMINFO must be 34 bytes")
            bits = int.from_bytes(body, "big")  # 272 bits
            # 272-bit layout: 16 min_bs | 16 max_bs | 24 min_frame |
            # 24 max_frame | 20 rate | 3 ch-1 | 5 bps-1 | 36 total | 128 md5
            info = {
                "min_blocksize": (bits >> 256) & 0xFFFF,
                "max_blocksize": (bits >> 240) & 0xFFFF,
                "sample_rate": (bits >> 172) & 0xFFFFF,
                "channels": ((bits >> 169) & 0x7) + 1,
                "bits_per_sample": ((bits >> 164) & 0x1F) + 1,
                "total_samples": (bits >> 128) & 0xFFFFFFFFF,
                "md5": body[18:34],
                "frames_offset": 0,  # patched below
            }
        pos += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    info["frames_offset"] = pos
    return info


def decode_flac(payload: bytes) -> Tuple[np.ndarray, int]:
    """FLAC stream -> (samples int32 array shape (n,) mono or (n, ch),
    sample_rate). Verifies frame CRC-8/CRC-16; raises ValueError on
    any malformed structure."""
    info = parse_streaminfo(payload)
    region = payload[info["frames_offset"] :]
    br = _Bits(region)
    channels_out: List[np.ndarray] = []
    total = info["total_samples"]
    got = 0
    # total_samples == 0 is spec-legal "unknown length" (RFC 9639 §8.2):
    # decode frames until the byte region is exhausted instead of stopping
    # at zero samples.
    while (got < total) if total else (br.byte_pos() < len(region)):
        frame_start = br.byte_pos()
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"flac: lost frame sync (got {sync:#x})")
        if br.read(1):
            raise ValueError("flac: reserved frame-header bit set")
        br.read(1)  # blocking strategy (fixed/variable) — number read below
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: reserved frame-header bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved block-size code 0")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 0:
            pass  # streaminfo
        elif sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample-rate code 15")
        bps = info["bits_per_sample"] if ss_code == 0 else _SAMPLE_SIZE_CODES.get(ss_code)
        if bps is None:
            raise ValueError(f"flac: reserved sample-size code {ss_code}")
        br.align()  # header fields are byte-aligned; CRC-8 byte follows
        crc_start = br.byte_pos()
        if crc8(region[frame_start:crc_start]) != br.read(8):
            raise ValueError("flac: frame header CRC-8 mismatch")
        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_decode_subframe(br, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            extra = (0, 1) if ch_code == 8 else ((1, 0) if ch_code == 9 else (0, 1))
            a = _decode_subframe(br, blocksize, bps + extra[0])
            b = _decode_subframe(br, blocksize, bps + extra[1])
            if ch_code == 8:  # left/side: right = left - side
                subs = [a, a - b]
            elif ch_code == 9:  # side/right: left = right + side
                subs = [b + a, b]
            else:  # mid/side
                side = b
                mid2 = (a << 1) | (side & 1)
                subs = [(mid2 + side) >> 1, (mid2 - side) >> 1]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        br.align()
        foot_pos = br.byte_pos()
        frame_bytes = region[frame_start:foot_pos]
        want = int.from_bytes(region[foot_pos : foot_pos + 2], "big")
        if crc16(frame_bytes) != want:
            raise ValueError("flac: frame CRC-16 mismatch")
        br.pos = (foot_pos + 2) * 8
        take = min(blocksize, total - got) if total else blocksize
        channels_out.append(np.stack([s[:take] for s in subs], axis=1))
        got += take
    if not channels_out:
        return np.zeros((0,), dtype=np.int32), info["sample_rate"]
    out = np.concatenate(channels_out, axis=0).astype(np.int32)
    if out.shape[1] == 1:
        out = out[:, 0]
    return out, info["sample_rate"]


# ------------------------------------------------------------- encoder

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shifts = [(nbytes - 1 - i) * 6 for i in range(nbytes)]
    out.append(lead | ((n >> shifts[0]) & (0x7F >> nbytes)))
    for s in shifts[1:]:
        out.append(0x80 | ((n >> s) & 0x3F))
    return bytes(out)


def _rice_param_for(res: np.ndarray) -> int:
    if not len(res):
        return 0
    mean = float(np.mean(np.abs(res.astype(np.float64)))) + 1e-9
    k = max(0, int(np.ceil(np.log2(mean + 1))))
    return min(k, 14)


def _write_residual(bw: _BitWriter, res: np.ndarray, blocksize: int,
                    pred_order: int, partition_order: int) -> None:
    # clamp for the frame actually being written: 2^po must divide the
    # block size AND leave the first partition at least one residual
    # (a short tail block would otherwise emit a spec-invalid or
    # silently-corrupt layout — caught by review, regression-tested)
    while partition_order > 0 and (
        blocksize % (1 << partition_order)
        or (blocksize >> partition_order) <= pred_order
    ):
        partition_order -= 1
    bw.write(0, 2)  # method 0: 4-bit Rice
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    psize = blocksize >> partition_order
    w = 0
    for part in range(nparts):
        count = psize - (pred_order if part == 0 else 0)
        seg = res[w : w + count]
        k = _rice_param_for(seg)
        bw.write(k, 4)
        for v in seg.tolist():
            u = ((-v - 1) << 1) | 1 if v < 0 else (v << 1)  # zigzag
            bw.write_unary(u >> k)
            bw.write(u & ((1 << k) - 1), k)
        w += count


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int, mode: str,
                     partition_order: int = 0,
                     lpc: Optional[Tuple[List[int], int, int]] = None) -> None:
    x = x.astype(np.int64)
    blocksize = len(x)
    # a tail block shorter than the predictor order cannot carry the
    # declared warmup: degrade to VERBATIM (always valid, still lossless)
    if mode.startswith("fixed") and blocksize <= int(mode[-1]):
        mode = "verbatim"
    if mode == "lpc" and blocksize <= len((lpc or ([3, -1], 4, 1))[0]):
        mode = "verbatim"
    if mode == "constant":
        bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
        bw.write_signed(int(x[0]), bps)
        return
    if mode == "verbatim":
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        for v in x.tolist():
            bw.write_signed(v, bps)
        return
    if mode.startswith("fixed"):
        order = int(mode[-1])
        c = np.array(_FIXED_COEFS[order], dtype=np.int64)
        res = np.array(
            [x[i] - (int(x[i - order : i][::-1] @ c) if order else 0)
             for i in range(order, blocksize)],
            dtype=np.int64,
        )
        bw.write(0, 1); bw.write(8 + order, 6); bw.write(0, 1)
        for v in x[:order].tolist():
            bw.write_signed(v, bps)
        _write_residual(bw, res, blocksize, order, partition_order)
        return
    if mode == "lpc":
        coefs, prec, shift = lpc or ([3, -1], 4, 1)
        order = len(coefs)
        ca = np.array(coefs, dtype=np.int64)
        res = np.array(
            [x[i] - (int(x[i - order : i][::-1] @ ca) >> shift)
             for i in range(order, blocksize)],
            dtype=np.int64,
        )
        bw.write(0, 1); bw.write(0x20 | (order - 1), 6); bw.write(0, 1)
        for v in x[:order].tolist():
            bw.write_signed(v, bps)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        _write_residual(bw, res, blocksize, order, partition_order)
        return
    raise ValueError(f"unknown subframe mode {mode}")


def encode_flac(samples: np.ndarray, rate: int = 16000, *, bps: int = 16,
                blocksize: int = 4096, mode: str = "auto",
                partition_order: int = 0, stereo_mode: str = "independent",
                lpc: Optional[Tuple[List[int], int, int]] = None) -> bytes:
    """PCM -> FLAC stream (test/synth encoder). samples: int array,
    shape (n,) mono or (n, 2) stereo. mode: auto | constant | verbatim
    | fixed0..fixed4 | lpc. stereo_mode: independent | left_side |
    right_side | mid_side."""
    samples = np.asarray(samples, dtype=np.int64)
    mono = samples.ndim == 1
    n = len(samples)
    nch = 1 if mono else samples.shape[1]
    # Field-width limits: blocksize-1 must fit the 16-bit frame-header
    # field and the STREAMINFO min/max blocksize fields; rate must fit
    # STREAMINFO's 20-bit field. Silently truncating either emits a
    # structurally inconsistent stream that fails far away at decode.
    if not 1 <= blocksize <= 65535:
        raise ValueError(f"flac: blocksize {blocksize} outside 1..65535")
    if not 0 < rate < (1 << 20):
        raise ValueError(f"flac: sample rate {rate} outside 1..2^20-1")
    # STREAMINFO
    si = 0
    si |= min(blocksize, 65535) << 256
    si |= min(blocksize, 65535) << 240
    si |= rate << 172
    si |= (nch - 1) << 169
    si |= (bps - 1) << 164
    si |= n << 128
    head = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.to_bytes(34, "big")
    frames = bytearray()
    fno = 0
    for start in range(0, max(n, 1), blocksize):
        chunk = samples[start : start + blocksize]
        bsz = len(chunk)
        if bsz == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize stream
        bw.write(7, 4)  # blocksize as 16-bit value-1
        bw.write(0, 4)  # sample rate from STREAMINFO
        if mono:
            ch_code = 0
        elif stereo_mode == "independent":
            ch_code = 1
        elif stereo_mode == "left_side":
            ch_code = 8
        elif stereo_mode == "right_side":
            ch_code = 9
        else:
            ch_code = 10
        bw.write(ch_code, 4)
        bw.write(4 if bps == 16 else 1 if bps == 8 else 0, 3)
        bw.write(0, 1)
        for b in _utf8_number(fno):
            bw.write(b, 8)
        bw.write(bsz - 1, 16)
        bw.align()
        hdr = bw.bytes()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(crc8(hdr), 8)

        def pick(x):
            if mode != "auto":
                return mode
            if len(np.unique(x)) == 1:
                return "constant"
            return "fixed2" if len(x) > 4 else "verbatim"

        if mono:
            _encode_subframe(bw2, chunk, bps, pick(chunk), partition_order, lpc)
        else:
            l, r = chunk[:, 0], chunk[:, 1]
            if ch_code == 1:
                for x in (l, r):
                    _encode_subframe(bw2, x, bps, pick(x), partition_order, lpc)
            elif ch_code == 8:
                side = l - r
                _encode_subframe(bw2, l, bps, pick(l), partition_order, lpc)
                _encode_subframe(bw2, side, bps + 1, pick(side), partition_order, lpc)
            elif ch_code == 9:
                side = l - r
                _encode_subframe(bw2, side, bps + 1, pick(side), partition_order, lpc)
                _encode_subframe(bw2, r, bps, pick(r), partition_order, lpc)
            else:
                side = l - r
                mid = (l + r) >> 1
                _encode_subframe(bw2, mid, bps, pick(mid), partition_order, lpc)
                _encode_subframe(bw2, side, bps + 1, pick(side), partition_order, lpc)
        bw2.align()
        body = bw2.bytes()
        frames += body + crc16(body).to_bytes(2, "big")
        fno += 1
    return head + bytes(frames)
