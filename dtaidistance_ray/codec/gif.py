"""GIF87a/89a codec (LZW), pure Python + NumPy.

Own implementation from the public GIF89a specification: logical
screen descriptor, global/local color tables, graphic-control /
application / comment extensions (skipped), image descriptor with
interlace support, and the GIF variant of LZW (variable code width
3..12 bits, LSB-first bit packing, clear/EOI codes, cScSc special
case). Decodes the first image frame to an (h, w, 3) uint8 RGB array.

The encoder writes a palette-indexed frame with real LZW compression
(dictionary keyed on (prefix_code, byte), width growth and clear-code
reset at 4096) — used by tests for round-trips and by the synthetic
media corpus. tests/test_stages.py additionally decodes a
hand-constructed byte-level GIF built directly from the spec, so the
decoder is anchored to the wire format, not just to our encoder.
"""
from __future__ import annotations

import struct

import numpy as np


class _BitReader:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitpos = 0

    def read(self, nbits: int) -> int:
        out = 0
        got = 0
        while got < nbits:
            if self.pos >= len(self.data):
                return -1
            avail = 8 - self.bitpos
            take = min(nbits - got, avail)
            chunk = (self.data[self.pos] >> self.bitpos) & ((1 << take) - 1)
            out |= chunk << got
            got += take
            self.bitpos += take
            if self.bitpos == 8:
                self.bitpos = 0
                self.pos += 1
        return out


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _BitReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def reset():
        return {i: bytes([i]) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    prev: bytes | None = None
    while n_out < n_pixels:
        code = reader.read(width)
        if code < 0 or code == eoi:
            break
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # cScSc special case
        else:
            raise ValueError(f"bad LZW code {code}")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("LZW stream ended early")
    return out


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = np.empty(h, dtype=np.int64)
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    rows[np.array(order, dtype=np.int64)] = np.arange(h)
    return idx[rows]


def _parse_header(payload: bytes):
    """Header + logical screen descriptor + global color table."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, dtype=np.uint8, count=gct_size * 3, offset=pos).reshape(-1, 3)
        pos += gct_size * 3
    return sw, sh, bg, global_pal, pos


def _iter_frames(payload: bytes, pos: int, global_pal):
    """Shared container walker: yields one tuple per image frame —
    (x, y, idx array, palette, delay_ms, transparent idx, disposal).
    Both decode_gif and decode_gif_frames consume this, so container
    parsing cannot diverge between the single- and multi-frame paths."""
    delay_ms, transparent, disposal = 0, -1, 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                gflags, delay_cs, tidx = struct.unpack_from("<BHB", payload, pos + 1)
                delay_ms = delay_cs * 10
                transparent = tidx if gflags & 0x01 else -1
                disposal = (gflags >> 2) & 0x07
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            x, y, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            pal = global_pal
            if iflags & 0x80:
                lct_size = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, dtype=np.uint8, count=lct_size * 3, offset=pos).reshape(-1, 3)
                pos += lct_size * 3
            if pal is None:
                raise ValueError("no color table")
            min_code_size = payload[pos]
            pos += 1
            chunks = []
            while payload[pos] != 0:
                n = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + n])
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code_size, w * h).reshape(h, w)
            if iflags & 0x40:
                idx = _deinterlace(idx, h)
            yield x, y, idx, pal, delay_ms, transparent, disposal
            delay_ms, transparent, disposal = 0, -1, 0
        elif b == 0x3B:  # trailer
            return
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a payload -> (h, w, 3) uint8 RGB
    (the image-descriptor rect, uncomposed)."""
    _sw, _sh, _bg, global_pal, pos = _parse_header(payload)
    for _x, _y, idx, pal, _d, _t, _disp in _iter_frames(payload, pos, global_pal):
        return pal[idx]
    raise ValueError("no image frame")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    table: dict = {}
    next_code = eoi + 1
    w.write(clear, width)
    prev = -1  # current prefix CODE
    for v in np.asarray(indices, dtype=np.int64).tolist():
        if prev < 0:
            prev = v
            continue
        key = (prev, v)
        if key in table:
            prev = table[key]
            continue
        w.write(prev, width)
        table[key] = next_code
        next_code += 1
        # mirror of the decoder rule one entry later (the decoder lags
        # the encoder's table by one entry at read time): decoder bumps
        # when its table size reaches 2^width, encoder at 2^width + 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            w.write(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = v
    if prev >= 0:
        w.write(prev, width)
    w.write(eoi, width)
    return w.flush()


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(h, w) uint8 palette indices + (n<=256, 3) uint8 palette ->
    single-frame GIF89a bytes with real LZW compression."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    ncol = len(palette)
    pal_bits = max(1, int(np.ceil(np.log2(max(ncol, 2)))))
    pal_size = 1 << pal_bits
    pal = np.zeros((pal_size, 3), dtype=np.uint8)
    pal[:ncol] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code_size = max(2, pal_bits)
    out.append(min_code_size)
    data = _lzw_encode(indices.reshape(-1), min_code_size)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def encode_gif_animated(frames, palette: np.ndarray, delays_ms=None) -> bytes:
    """Animated GIF89a: list of (h, w) uint8 index frames (all the same
    shape) + shared palette; per-frame graphic-control extensions carry
    the delays (centisecond resolution, as the format defines)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = frames[0].shape
    ncol = len(palette)
    pal_bits = max(1, int(np.ceil(np.log2(max(ncol, 2)))))
    pal_size = 1 << pal_bits
    pal = np.zeros((pal_size, 3), dtype=np.uint8)
    pal[:ncol] = palette
    if delays_ms is None:
        delays_ms = [100] * len(frames)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    min_code_size = max(2, pal_bits)
    for frame, delay in zip(frames, delays_ms):
        # graphic control: disposal=1 (leave), no transparency
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, max(0, int(delay) // 10), 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code_size)
        data = _lzw_encode(frame.reshape(-1), min_code_size)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif_frames(payload: bytes):
    """All frames of a GIF payload -> list of (delay_ms, (H, W, 3)
    uint8 RGB) composed onto the logical-screen canvas: sub-rectangle
    frames overlay the previous canvas (disposal 0/1), disposal 2
    restores the background color in the frame rect, disposal 3
    restores the pre-frame canvas, transparent pixels keep the
    underlying canvas. Frame rects extending past the logical screen
    are clipped (as the spec permits renderers to do)."""
    sw, sh, bg, global_pal, pos = _parse_header(payload)
    bg_rgb = global_pal[bg] if global_pal is not None and bg < len(global_pal) else np.zeros(3, np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames = []
    for x, y, idx, pal, delay_ms, transparent, disposal in _iter_frames(payload, pos, global_pal):
        # clip the frame rect to the logical screen
        vis_h = max(0, min(idx.shape[0], sh - y))
        vis_w = max(0, min(idx.shape[1], sw - x))
        idx_v = idx[:vis_h, :vis_w]
        saved = canvas[y : y + vis_h, x : x + vis_w].copy() if disposal == 3 else None
        region = canvas[y : y + vis_h, x : x + vis_w]
        rgb = pal[idx_v]
        if transparent >= 0:
            opaque = idx_v != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore background in the frame rect
            canvas[y : y + vis_h, x : x + vis_w] = bg_rgb
        elif disposal == 3:  # restore the pre-frame canvas
            canvas[y : y + vis_h, x : x + vis_w] = saved
    if not frames:
        raise ValueError("no image frame")
    return frames
