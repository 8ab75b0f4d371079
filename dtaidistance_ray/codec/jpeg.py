"""Baseline JPEG (ITU-T T.81 sequential DCT) codec — pure NumPy + stdlib.

Closes the last prominent compressed-image stub in the multimodal
decode stage (jpeg was a declared ``NotImplementedError``; BMP/PPM/PNG
were already real). Scope is the baseline process every camera/browser
emits: 8-bit samples, Huffman entropy coding, interleaved single scan,
grayscale or YCbCr with 4:4:4 or 4:2:0 subsampling, restart markers
tolerated on decode.

All constants are the public Annex-K tables of the JPEG standard
(quantization matrices, the standard DC/AC Huffman tables, zigzag
order); quality scaling follows the classic IJG 5000/Q formula. No
code derives from any JPEG library — DCT is a dense 8x8 matrix
sandwich (einsum over all blocks of a plane at once), entropy coding
is an explicit bit accumulator with 0xFF byte stuffing.

Encode is lossy by nature; tests assert round-trip PSNR and marker
structure rather than bit equality (see tests/test_codec.py).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K constants
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# (bits-per-length[1..16], symbol values) — standard tables, Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """8x8 type-II DCT basis: D @ block @ D.T == 2-D DCT."""
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    d = np.cos((2 * x[None, :] + 1) * u * np.pi / 16.0) / 2.0
    d[0, :] *= 1.0 / np.sqrt(2.0)
    return d


_DCT = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> per-coefficient divisors in 1..255."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _build_codes(bits, vals):
    """Canonical Huffman: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode(bits, vals):
    """Canonical Huffman: (length, code) -> symbol."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category: value -> (size, extra-bits payload)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1  # one's-complement representation
    return size, v & ((1 << size) - 1)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-bits padding
        return bytes(self.buf)


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to multiples of 8 and return (by, bx, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _quantized_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Level-shift, DCT every 8x8 block, quantize -> int32 (by,bx,8,8)."""
    blocks = _plane_blocks(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ux,byxv,wv->byuw", _DCT, blocks, _DCT, optimize=True)
    # einsum above: D @ block @ D.T for every block at once
    return np.round(coef / qtbl).astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray):
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _encode_block(zz: np.ndarray, pred: int, dc_codes, ac_codes, bw: _BitWriter) -> int:
    """Entropy-code one zigzagged block; returns the new DC predictor."""
    dc = int(zz[0])
    size, extra = _magnitude(dc - pred)
    code, length = dc_codes[size]
    bw.write(code, length)
    bw.write(extra, size)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            bw.write(c, l)
            run -= 16
        size, extra = _magnitude(v)
        c, l = ac_codes[(run << 4) | size]
        bw.write(c, l)
        bw.write(extra, size)
        run = 0
    if last < 63:
        c, l = ac_codes[0x00]  # EOB
        bw.write(c, l)
    return dc


def encode_jpeg(pixels: np.ndarray, quality: int = 85, subsampling: str = "444") -> bytes:
    """(H,W,3) uint8 RGB or (H,W) grayscale -> baseline JFIF bytes.

    subsampling: "444" (no chroma subsampling) or "420" (2x2).
    """
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    if gray:
        planes = [pixels.astype(np.float64)]
        sampling = [(1, 1)]
        qtbls = [qy]
    else:
        y, cb, cr = _rgb_to_ycbcr(pixels)
        if subsampling == "420":
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            sampling = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            sampling = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        planes = [y, cb, cr]
        qtbls = [qy, qc, qc]

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    # quantized blocks per component, padded to whole MCUs
    comp_blocks = []
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for plane, (sh, sv), q in zip(planes, sampling, qtbls):
        need_h = mcus_y * 8 * sv
        need_w = mcus_x * 8 * sh
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        if ph or pw:
            plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        comp_blocks.append(_quantized_blocks(plane, q))

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    for tid, q in ((0, qy),) if gray else ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">BB", 0, 0)  # placeholder len
        payload = bytes([tid]) + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8))
        out[-2:] = struct.pack(">H", 2 + len(payload))
        out += payload
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        tables += [(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS), (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    for tc, bits, vals in tables:
        payload = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    sos = struct.pack(">B", ncomp)
    for ci in range(ncomp):
        sos += struct.pack(">BB", ci + 1, 0x00 if ci == 0 else 0x11)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # interleaved MCU scan
    dc_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    bw = _BitWriter()
    preds = [0] * ncomp
    flat = ZIGZAG
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                sh, sv = sampling[ci]
                dcc, acc = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
                for by in range(sv):
                    for bx in range(sh):
                        blk = comp_blocks[ci][my * sv + by, mx * sh + bx]
                        zz = blk.reshape(-1)[flat]
                        preds[ci] = _encode_block(zz, preds[ci], dcc, acc, bw)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over the entropy segment; un-stuffs 0xFF00 and
    treats RSTn as DC-predictor resets (decoder tolerates them)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.reset_pending = False

    def _fill(self):
        d = self.data
        while self.n <= 24:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy data")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn
                    self.pos += 2
                    self.acc = 0
                    self.n = 0
                    self.reset_pending = True
                    b = None
                else:  # EOI or next marker: feed 1-padding
                    b = 0xFF if nxt == 0x00 else None
                    if b is None:
                        self.acc = (self.acc << 8) | 0xFF
                        self.n += 8
                        continue
            else:
                self.pos += 1
            if b is not None:
                self.acc = (self.acc << 8) | b
                self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.n < k:
            self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _receive_extend(r: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = r.bits(size)
    if v < (1 << (size - 1)):  # negative branch of one's complement
        v -= (1 << size) - 1
    return v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W, 3) uint8 RGB (grayscale replicated).

    Supports: baseline sequential DCT, 8-bit, 1 or 3 components,
    sampling factors up to 2x2, restart markers, 0xFF byte stuffing.
    Progressive / arithmetic-coded / 12-bit JPEGs raise ValueError.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtbls = {}
    huff_dc = {}
    huff_ac = {}
    comps = None  # list of (cid, sh, sv, tq)
    h = w = None
    scan = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(data, np.uint8, 64, p + 1)
                qtbls[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline/extended sequential)
            prec, h, w, nc = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", data, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(data[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            ns = data[0]
            scan = []
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", data, 1 + 2 * i)
                scan.append((cs, tdta >> 4, tdta & 0xF))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if comps is None or scan is None:
        raise ValueError("missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scan]
    dcsel = {cs: td for cs, td, _ in scan}
    acsel = {cs: ta for cs, _, ta in scan}

    planes = {}
    for cid, sh, sv, _ in comps:
        planes[cid] = np.zeros((mcus_y * sv * 8, mcus_x * sh * 8), dtype=np.float64)

    r = _BitReader(payload, pos)
    preds = {c[0]: 0 for c in comps}
    idct = _DCT.T
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # predictor reset happens at RST markers; the reader
                # consumed them inline
                if r.reset_pending:
                    preds = {c[0]: 0 for c in comps}
                    r.reset_pending = False
            if r.reset_pending:
                preds = {c[0]: 0 for c in comps}
                r.reset_pending = False
            for cid, sh, sv, tq in order:
                q = qtbls[tq]
                dct_t = huff_dc[dcsel[cid]]
                act_t = huff_ac[acsel[cid]]
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int32)
                        size = r.huff(dct_t)
                        preds[cid] += _receive_extend(r, size)
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = r.huff(act_t)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _receive_extend(r, size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
                        spatial = idct @ blk.reshape(8, 8) @ _DCT
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial + 128.0
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for cid, sh, sv, _ in comps:
        p = planes[cid]
        if sh != hmax or sv != vmax:
            p = np.repeat(np.repeat(p, vmax // sv, axis=0), hmax // sh, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
