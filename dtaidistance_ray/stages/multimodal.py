"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height/duration, codec). Decode / feature-extract /
resize / frame-sample run as actor-pool map_batches stages: the actor
loads its codec once in __init__, batches stay small because rows are
large, and outputs are fixed-shape feature columns.

Decoders: the container ships no image/audio libraries, but the
header-only formats need none — BMP (24-bit uncompressed), PPM (P6)
and WAV (PCM16) are decoded/encoded here in pure NumPy byte parsing
(round-trip property-tested), so the decode stage is REAL for those
codecs. PNG (zlib inflate + all five scanline filters, incl. Paeth) is
also decoded for real with stdlib zlib + NumPy, as is baseline JPEG
(sequential DCT, Huffman entropy coding, 4:4:4 / 4:2:0 — see
codec/jpeg.py), and GIF87a/89a (own LZW with variable code widths,
interlace, local/global palettes — codec/gif.py, anchored to a
hand-constructed spec-level byte fixture in tests). Compressed audio
is real too: G.711 mu-law/A-law and
IMA ADPCM WAV payloads (format tags 7/6/0x11) decode through own
codecs (codec/g711.py, codec/ima_adpcm.py) asserted byte-exact
against CPython's independent `audioop` implementation in tests.
Video is real for animated GIF and for MJPEG-in-AVI (codec/avi.py
RIFF container walk + per-frame baseline JPEG decode): frame
sampling replays the true container timeline and digests/features
come from decoded RGB. The remaining compressed codecs (opus, h264,
heic) are declared stubs: ``DecodeImage.decode_real`` raises
NotImplementedError for them; the image stub path substitutes a
deterministic fake decode (seeded by the payload hash) so the
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is exercised end-to-end, while ``SampleFrames`` emits
explicit ``unsupported:<codec>`` marker rows for opaque video codecs
rather than fake frame digests.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from .pool import auto_pool


# ---------------------------------------------------------------------------
# pure-NumPy codecs (no external libraries)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP (BGR rows,
    bottom-up, 4-byte padded)."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + img_size, 0, 0, 54,
        40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up, RGB->BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h, offset=offset)
    rows = data.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        # bound the scan: past end-of-buffer the slice is b'' and
        # isspace() is False, which looped forever on truncated headers
        while end < len(payload) and not payload[end : end + 1].isspace():
            end += 1
        if end >= len(payload) or end == pos:
            raise ValueError("truncated PPM header")
        parts.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return data.reshape(h, w, 3)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB -> real PNG (8-bit truecolor, zlib IDAT).

    filter_type applies one of the five standard scanline filters to
    every row (0=None default; 1..4 exercised by the round-trip tests).
    """
    import zlib

    h, w, _ = pixels.shape
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = px[y].reshape(-1)
        left = np.concatenate([np.zeros(bpp, dtype=np.uint8), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.uint8), prev[:-bpp]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            filt = row - left
        elif filter_type == 2:  # Up
            filt = row - prev
        elif filter_type == 3:  # Average
            filt = row - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
        elif filter_type == 4:  # Paeth
            filt = row - _paeth_predict(left, prev, upleft)
        else:
            raise ValueError(f"bad filter {filter_type}")
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth_predict(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    a = left.astype(np.int16)
    b = up.astype(np.int16)
    c = upleft.astype(np.int16)
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decode (pure stdlib-zlib + NumPy): 8-bit greyscale /
    truecolor / truecolor-alpha, non-interlaced, all five scanline
    filters (Paeth included). Returns (H, W, 3) uint8 RGB (alpha
    dropped, grey replicated). Palette / 16-bit / interlaced PNGs are
    out of scope and raise ValueError."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    w = h = None
    channels = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNGs supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported color type {color}")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ft = int(rows[y, 0])
        cur = rows[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[y] = cur
        elif ft == 1:  # Sub: prefix sum per byte lane modulo 256
            lanes = cur.reshape(-1, bpp).astype(np.uint64)
            np.cumsum(lanes, axis=0, out=lanes)
            out[y] = (lanes & 0xFF).astype(np.uint8).reshape(-1)
        elif ft == 2:  # Up
            out[y] = cur + prev
        elif ft == 3:  # Average (sequential left dependency)
            row = out[y]
            row[:bpp] = cur[:bpp] + (prev[:bpp] // 2)
            for i in range(bpp, stride):
                row[i] = np.uint8(
                    (int(cur[i]) + (int(row[i - bpp]) + int(prev[i])) // 2) & 0xFF
                )
        elif ft == 4:  # Paeth (sequential left dependency)
            row = out[y]
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                row[i] = np.uint8((int(cur[i]) + pred) & 0xFF)
        else:
            raise ValueError(f"bad scanline filter {ft}")
    img = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    if channels == 2:  # grey+alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    if channels == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16."""
    samples = np.asarray(samples, dtype="<i2")
    data = samples.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def encode_wav_g711(samples: np.ndarray, rate: int = 8000, law: str = "ulaw") -> bytes:
    """int16 mono samples -> RIFF/WAVE with G.711 companding
    (format tag 7 = mu-law, 6 = A-law; 8 bits per sample)."""
    from ..codec.g711 import ulaw_encode, alaw_encode

    fmt_tag = 7 if law == "ulaw" else 6
    data = (ulaw_encode if law == "ulaw" else alaw_encode)(samples)
    # RIFF chunks are word-aligned: an odd data chunk carries a pad
    # byte NOT counted in its size (readers rely on fact for length)
    pad = b"\x00" if len(data) % 2 else b""
    hdr = struct.pack(
        "<4sI4s4sIHHIIHHH4sII4sI",
        b"RIFF", 50 + len(data) + len(pad), b"WAVE",
        b"fmt ", 18, fmt_tag, 1, rate, rate, 1, 8, 0,
        b"fact", 4, len(data),
        b"data", len(data),
    )
    return hdr + data + pad


def encode_wav_ima_adpcm(samples: np.ndarray, rate: int = 8000, block_align: int = 256) -> bytes:
    """int16 mono samples -> RIFF/WAVE IMA ADPCM (format tag 0x11),
    standard block layout (4-byte header + low-nibble-first codes)."""
    from ..codec.ima_adpcm import encode_wav_blocks

    n = len(samples)
    data, spb = encode_wav_blocks(samples, block_align)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHHHH4sII4sI",
        b"RIFF", 52 + len(data), b"WAVE",
        b"fmt ", 20, 0x11, 1, rate, rate * block_align // spb, block_align, 4, 2, spb,
        b"fact", 4, n,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes):
    """RIFF/WAVE mono -> (samples int16 array, sample rate).

    Handles format tags 1 (PCM16), 6 (A-law), 7 (mu-law) and
    0x11 (IMA ADPCM) via the own-implementation codecs in codec/."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    rate = None
    fmt = None
    block_align = None
    fact_samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt, channels, rate, _brate, block_align = struct.unpack_from("<HHIIH", payload, pos + 8)
            if fmt not in (1, 6, 7, 0x11) or channels != 1:
                raise ValueError("unsupported WAV format/channels")
        elif cid == b"fact":
            fact_samples = struct.unpack_from("<I", payload, pos + 8)[0]
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            raw = payload[pos + 8 : pos + 8 + size]
            if fmt == 1:
                return np.frombuffer(raw, dtype="<i2", count=size // 2), rate
            if fmt in (6, 7):
                from ..codec.g711 import alaw_decode, ulaw_decode

                dec = ulaw_decode(raw) if fmt == 7 else alaw_decode(raw)
                # fact (when present) is authoritative, INCLUDING 0:
                # tools may pad the data chunk of an empty recording
                return dec[: fact_samples if fact_samples is not None else len(dec)], rate
            from ..codec.ima_adpcm import decode_wav_blocks

            spb = (block_align - 4) * 2 + 1
            n = fact_samples if fact_samples is not None else (len(raw) // block_align) * spb
            return decode_wav_blocks(raw, block_align, n), rate
        pos += 8 + size + (size & 1)
    raise ValueError("no data chunk")

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
        ("codec", pa.string()),
    ]
)


def synth_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    types = ["image", "audio", "video"]
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms", "codec")}
    for i in range(n):
        mt = types[i % 3]
        rows["media_id"].append(f"m{i:08d}")
        rows["media_type"].append(mt)
        rows["payload"].append(rng.bytes(256 + int(rng.integers(0, 1024))))
        rows["width"].append(int(rng.integers(64, 1024)) if mt != "audio" else 0)
        rows["height"].append(int(rng.integers(64, 1024)) if mt != "audio" else 0)
        rows["duration_ms"].append(int(rng.integers(1000, 60000)) if mt != "image" else 0)
        # codec labels the stage does NOT implement (jpeg is real now):
        # this corpus exists to exercise the stub-decode plumbing path
        rows["codec"].append({"image": "heic", "audio": "opus", "video": "h264"}[mt])
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synth_media_table_real(n: int, seed: int = 0) -> pa.Table:
    """Media corpus with REAL decodable payloads: images are actual
    BMP/PPM/PNG/JPEG bytes of seeded pixel arrays, audio rows are
    actual WAV PCM16 bytes of seeded waveforms — the decode stages
    parse them for real (no codec library involved; BMP/PPM/WAV are
    plain bytes, PNG/JPEG come from our own codecs)."""
    from ..codec.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms", "codec")}
    for i in range(n):
        kind = i % 5
        rows["media_id"].append(f"m{i:08d}")
        if kind in (0, 1, 2, 3):  # image
            h = int(rng.integers(8, 40))
            w = int(rng.integers(8, 40))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            codec = {0: "bmp", 1: "ppm", 2: "png", 3: "jpeg"}[kind]
            if kind == 0:
                payload = encode_bmp(px)
            elif kind == 1:
                payload = encode_ppm(px)
            elif kind == 3:  # real baseline JPEG, both subsampling modes
                payload = encode_jpeg(px, quality=90, subsampling="420" if i % 2 else "444")
            else:  # real compressed PNG, varied scanline filters
                payload = encode_png(px, filter_type=i % 5)
            rows["media_type"].append("image")
            rows["payload"].append(payload)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(0)
            rows["codec"].append(codec)
        else:  # audio
            rate = 16000
            n_samp = int(rng.integers(rate // 4, rate))
            t = np.arange(n_samp) / rate
            freq = float(rng.uniform(100, 2000))
            wave = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
            rows["media_type"].append("audio")
            rows["payload"].append(encode_wav_pcm16(wave, rate))
            rows["width"].append(0)
            rows["height"].append(0)
            rows["duration_ms"].append(int(1000 * n_samp / rate))
            rows["codec"].append("wav")
    return pa.table(rows, schema=MEDIA_SCHEMA)


#: audio codecs the stage decodes for real (all carried in WAV
#: containers; the codec column distinguishes the companding scheme)
REAL_AUDIO_CODECS = frozenset({"wav", "ulaw", "alaw", "adpcm", "flac"})


def synth_media_table_gif(n: int, seed: int = 0) -> pa.Table:
    """Image corpus of REAL GIF payloads: seeded palette-indexed frames
    LZW-compressed by the own encoder (codec/gif.py); every third row
    uses a smooth gradient index pattern (stresses the LZW dictionary)
    and a sub-256-color palette."""
    from ..codec.gif import encode_gif

    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms", "codec")}
    for i in range(n):
        h = int(rng.integers(4, 48))
        w = int(rng.integers(4, 48))
        ncol = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        if i % 3 == 0:
            idx = (np.add.outer(np.arange(h), np.arange(w)) % ncol).astype(np.uint8)
        else:
            idx = rng.integers(0, ncol, size=(h, w), dtype=np.uint8)
        rows["media_id"].append(f"g{i:08d}")
        rows["media_type"].append("image")
        rows["payload"].append(encode_gif(idx, pal))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(0)
        rows["codec"].append("gif")
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synth_video_table_gif(n: int, seed: int = 0) -> pa.Table:
    """Video corpus of REAL animated-GIF payloads: seeded index frames
    with varying per-frame delays, LZW-compressed by the own encoder.
    duration_ms is the true sum of frame delays."""
    from ..codec.gif import encode_gif_animated

    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms", "codec")}
    for i in range(n):
        h = int(rng.integers(6, 24))
        w = int(rng.integers(6, 24))
        nframes = int(rng.integers(2, 9))
        ncol = int(rng.integers(2, 65))
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        frames = [rng.integers(0, ncol, size=(h, w), dtype=np.uint8) for _ in range(nframes)]
        delays = (rng.integers(5, 40, size=nframes) * 10).tolist()  # whole centiseconds
        rows["media_id"].append(f"v{i:08d}")
        rows["media_type"].append("video")
        rows["payload"].append(encode_gif_animated(frames, pal, delays))
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(int(sum(delays)))
        rows["codec"].append("gif")
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _mjpeg_source_frames(rng: np.random.Generator):
    """One video's pre-encode source frames + timing, drawn from the
    corpus RNG stream. Smooth gradients with a per-frame brightness
    offset: JPEG-friendly (quality-90 mean error < 0.1) yet with
    frame means spanning ~45..215, so a fake decode (uniform-random
    pixels, mean ~127.5) cannot pass the tolerance oracle."""
    h = int(rng.integers(2, 7)) * 8
    w = int(rng.integers(2, 7)) * 8
    nframes = int(rng.integers(3, 11))
    rate, scale = [(30, 1), (25, 1), (30000, 1001), (15, 1)][int(rng.integers(0, 4))]
    gy = np.linspace(0, float(rng.uniform(20, 60)), h)
    gx = np.linspace(0, float(rng.uniform(20, 60)), w)
    grad = np.add.outer(gy, gx)[:, :, None]
    frames = []
    for _ in range(nframes):
        b = float(rng.uniform(40, 175))
        px = np.clip(grad + b + rng.normal(0, 1.5, size=(h, w, 3)), 0, 255)
        frames.append(px.astype(np.uint8))
    return frames, rate, scale


def synth_video_table_mjpeg(n: int, seed: int = 0) -> pa.Table:
    """Video corpus of REAL MJPEG-in-AVI payloads: seeded gradient
    frames JPEG-encoded by the own codec (codec/jpeg.py) and packed
    into AVI RIFF containers (codec/avi.py) at varied frame rates
    (incl. NTSC 30000/1001). duration_ms is the true container
    timeline length."""
    from ..codec.avi import encode_avi_mjpeg

    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms", "codec")}
    for i in range(n):
        frames, rate, scale = _mjpeg_source_frames(rng)
        h, w, _ = frames[0].shape
        rows["media_id"].append(f"j{i:08d}")
        rows["media_type"].append("video")
        rows["payload"].append(
            encode_avi_mjpeg(frames, rate=rate, scale=scale, quality=90, subsampling="420" if i % 2 else "444")
        )
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(int(round(len(frames) * 1000 * scale / rate)))
        rows["codec"].append("mjpeg")
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synth_flac_wave(rng, i: int):
    """Deterministic source wave + encode parameters for corpus row i:
    cycles every subframe type the encoder emits (constant / verbatim /
    fixed0-4 / LPC), Rice partition orders 0-2, mono plus all three
    stereo decorrelation modes, and rates 8000/16000/44100."""
    rate = (8000, 16000, 44100)[i % 3]
    n_samp = int(rng.integers(rate // 8, rate // 3))
    n_samp -= n_samp % 8  # keep every partition order 0-2 valid
    t = np.arange(n_samp) / rate
    freq = float(rng.uniform(100, 2000))
    mode = ("fixed2", "constant", "verbatim", "fixed1", "fixed3", "lpc", "fixed4")[i % 7]
    if mode == "constant":
        wave = np.full(n_samp, int(rng.integers(-2000, 2000)), dtype=np.int16)
    else:
        wave = (np.sin(2 * np.pi * freq * t) * 11000 + rng.normal(0, 150, n_samp)).astype(np.int16)
    porder = i % 3
    stereo = None
    if i % 4 == 3:
        stereo = ("independent", "left_side", "right_side", "mid_side")[(i // 4) % 4]
        right = np.roll(wave, 7) // 2
        wave = np.stack([wave.astype(np.int16), right.astype(np.int16)], axis=1)
    return wave, rate, mode, porder, stereo


def synth_audio_table_flac(n: int, seed: int = 0) -> pa.Table:
    """Audio corpus of REAL FLAC payloads compressed by the own
    encoder (codec/flac.py) across every subframe type, Rice partition
    orders 0-2 and all stereo decorrelation modes; the decode stage
    losslessly recovers the PCM (golden features are recomputed from
    the pre-encode sources, fully decoder-independent)."""
    from ..codec.flac import encode_flac

    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms", "codec")}
    for i in range(n):
        wave, rate, mode, porder, stereo = synth_flac_wave(rng, i)
        kwargs = dict(mode=mode, partition_order=porder, blocksize=4096)
        if stereo is not None:
            kwargs["stereo_mode"] = stereo
        payload = encode_flac(wave, rate, **kwargs)
        rows["media_id"].append(f"f{i:08d}")
        rows["media_type"].append("audio")
        rows["payload"].append(payload)
        rows["width"].append(0)
        rows["height"].append(0)
        rows["duration_ms"].append(int(1000 * len(wave) / rate))
        rows["codec"].append("flac")
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synth_audio_table_g711(n: int, seed: int = 0) -> pa.Table:
    """Audio corpus of REAL compressed payloads: seeded waveforms
    encoded as G.711 mu-law / A-law and IMA ADPCM WAV files (format
    tags 7/6/0x11) by the own encoders — the decode stage undoes the
    companding for real. Rate 8000 Hz (the G.711 telephony rate)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in ("media_id", "media_type", "payload", "width", "height", "duration_ms", "codec")}
    for i in range(n):
        rate = 8000
        n_samp = int(rng.integers(rate // 4, rate))
        t = np.arange(n_samp) / rate
        freq = float(rng.uniform(100, 2000))
        wave = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
        codec = ("ulaw", "alaw", "adpcm")[i % 3]
        if codec == "adpcm":
            payload = encode_wav_ima_adpcm(wave, rate)
        else:
            payload = encode_wav_g711(wave, rate, law=codec)
        rows["media_id"].append(f"a{i:08d}")
        rows["media_type"].append("audio")
        rows["payload"].append(payload)
        rows["width"].append(0)
        rows["height"].append(0)
        rows["duration_ms"].append(int(1000 * n_samp / rate))
        rows["codec"].append(codec)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def decode_audio_payload(payload: bytes):
    """Audio payload -> (mono float64 samples in [-1, 1), rate).

    Container dispatch: RIFF/WAVE (PCM16 / G.711 / IMA ADPCM via
    decode_wav) or native FLAC (own codec/flac.py decoder; lossless, so
    features computed from the decode are bit-equal to features from
    the pre-encode source — the decoder-independent golden anchor).
    Stereo FLAC downmixes by the channel mean."""
    if payload[:4] == b"fLaC":
        from ..codec.flac import decode_flac

        samples, rate = decode_flac(payload)
        x = samples.astype(np.float64)
        if x.ndim == 2:
            x = x.mean(axis=1)
        return x / 32768.0, rate
    samples, rate = decode_wav(payload)
    return samples.astype(np.float64) / 32768.0, rate


class AudioFeatures:
    """Actor-pool stage: audio payloads -> (rms, zero-crossing rate,
    dominant frequency via numpy FFT) — a real decode + real features,
    no audio library needed: PCM16 parses directly, G.711 / IMA ADPCM /
    FLAC payloads run through the own codecs in codec/."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload, codec in zip(batch["media_id"], batch["payload"], batch["codec"]):
            if codec not in REAL_AUDIO_CODECS:
                continue  # opus etc. stay stubbed
            x, rate = decode_audio_payload(bytes(payload))
            if len(x) == 0:
                # fact=0 empty recording (decode_wav supports it): all-zero
                # features, not an rfft crash on the whole batch
                rows.append((mid, 0.0, 0.0, 0.0))
                continue
            rms = float(np.sqrt(np.mean(x * x)))
            zcr = (
                float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
                if len(x) > 1
                else 0.0
            )
            spec = np.abs(np.fft.rfft(x))
            if len(spec) > 1:
                dom_hz = float(np.fft.rfftfreq(len(x), 1.0 / rate)[int(np.argmax(spec[1:])) + 1])
            else:
                dom_hz = 0.0  # too short for a non-DC bin
            rows.append((mid, round(rms, 6), round(zcr, 6), round(dom_hz, 2)))
        return pd.DataFrame(rows, columns=["media_id", "rms", "zcr", "dominant_hz"])


def audio_features(ds, concurrency=None, batch_size: int = 32):
    concurrency = concurrency or auto_pool()
    return ds.filter(expr="media_type == 'audio'").map_batches(
        AudioFeatures, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
    )


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: pixels seeded by payload hash."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class DecodeImage:
    """Actor-pool stage: decode image payloads to a fixed-size thumbnail
    feature column. batch_size must be SMALL (payloads are large);
    callers pass e.g. batch_size=32, concurrency=(2, 8), num_cpus=1."""

    REAL_CODECS = {"bmp", "ppm", "png", "jpeg", "gif"}

    def __init__(self, thumb: int = 8, use_real_codec: bool = False):
        self.thumb = thumb
        self.use_real_codec = use_real_codec
        # compressed-codec path would load PIL/libjpeg here, once per actor

    def decode_real(self, payload: bytes, codec: str) -> np.ndarray:
        """Real decode: BMP/PPM header parsing, PNG (stdlib zlib) and
        baseline JPEG (codec/jpeg.py) — all pure NumPy. The remaining
        audio/video compressed codecs stay stubbed."""
        if codec == "bmp":
            return decode_bmp(payload)
        if codec == "ppm":
            return decode_ppm(payload)
        if codec == "png":
            return decode_png(payload)
        if codec == "jpeg":
            from ..codec.jpeg import decode_jpeg

            return decode_jpeg(payload)
        if codec == "gif":
            from ..codec.gif import decode_gif

            return decode_gif(payload)
        raise NotImplementedError(
            f"codec {codec!r} needs an external library (not in this "
            "container); install the codec lib and wire it here (payload -> HxWx3 uint8)"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        thumbs = []
        means = []
        codecs = batch["codec"] if "codec" in batch.columns else [""] * len(batch)
        for payload, w, h, codec in zip(
            batch["payload"], batch["width"], batch["height"], codecs
        ):
            if codec in self.REAL_CODECS:
                px = self.decode_real(bytes(payload), codec)
            elif self.use_real_codec:
                px = self.decode_real(bytes(payload), codec)
            else:
                px = _fake_pixels(payload, max(1, int(h) % 32 + 1), max(1, int(w) % 32 + 1))
            # resize-by-pooling to thumb x thumb (plumbing is real; the
            # pixels are fake until a codec is wired in)
            ys = np.linspace(0, px.shape[0], self.thumb + 1).astype(int)
            xs = np.linspace(0, px.shape[1], self.thumb + 1).astype(int)
            t = np.zeros((self.thumb, self.thumb, 3), dtype=np.float32)
            for yi in range(self.thumb):
                for xi in range(self.thumb):
                    block = px[ys[yi] : max(ys[yi] + 1, ys[yi + 1]), xs[xi] : max(xs[xi] + 1, xs[xi + 1])]
                    t[yi, xi] = block.reshape(-1, 3).mean(axis=0)
            thumbs.append(t.ravel().tolist())
            means.append(float(px.mean()))
        out = batch[["media_id"]].copy()
        out["thumb_vec"] = thumbs
        out["pixel_mean"] = means
        return out


class SampleFrames:
    """Video frame sampling stage (every k-th second): emits one row per
    sampled frame (flat_map-shaped expansion via map_batches).

    Animated GIF and MJPEG-AVI payloads sample for REAL: the frame
    displayed at each tick t = k*every_ms (per-frame GCE delays /
    container frame rate define the timeline) is decoded
    (codec/gif.py, codec/avi.py + codec/jpeg.py) and digested from
    its composed RGB canvas. Opaque codecs (h264, opus) emit one
    explicit ``unsupported:<codec>`` marker row per video at
    frame_ms = -1 — never fake digests."""

    def __init__(self, every_ms: int = 5000):
        self.every_ms = every_ms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..codec.avi import frame_index_at, parse_avi
        from ..codec.gif import decode_gif_frames
        from ..codec.jpeg import decode_jpeg

        rows = []
        codecs = batch["codec"] if "codec" in batch.columns else [""] * len(batch)
        for mid, payload, dur, codec in zip(
            batch["media_id"], batch["payload"], batch["duration_ms"], codecs
        ):
            if codec == "gif":
                frames = decode_gif_frames(bytes(payload))
                delays = np.array([d for d, _ in frames], dtype=np.int64)
                starts = np.concatenate([[0], np.cumsum(delays)[:-1]])
                total = int(delays.sum())
                for t in range(0, max(total, 1), self.every_ms):
                    fi = int(np.searchsorted(starts, t, side="right")) - 1
                    digest = hashlib.blake2b(frames[fi][1].tobytes(), digest_size=8).hexdigest()
                    rows.append((mid, t, digest))
                continue
            if codec == "mjpeg":
                # lazy parse + memoized per-frame decode (the
                # VideoFrameFeatures pattern): only frames landing on
                # ticks are JPEG-decoded — an eager decode_avi_mjpeg
                # paid the full frame count for ~duration/every_ms uses
                info = parse_avi(bytes(payload))
                decoded: dict = {}
                for t in range(0, max(info.duration_ms, 1), self.every_ms):
                    fi = frame_index_at(info, t)
                    if fi not in decoded:
                        decoded[fi] = hashlib.blake2b(
                            decode_jpeg(info.frame_chunks[fi]).tobytes(), digest_size=8
                        ).hexdigest()
                    rows.append((mid, t, decoded[fi]))
                continue
            rows.append((mid, -1, f"unsupported:{codec}"))
        return pd.DataFrame(rows, columns=["media_id", "frame_ms", "frame_digest"])


def decode_images(ds, thumb: int = 8, concurrency=None, batch_size: int = 32):
    """image rows -> thumbnail feature vectors (actor pool, small
    batches because payload rows are large)."""
    concurrency = concurrency or auto_pool()
    return ds.filter(expr="media_type == 'image'").map_batches(
        DecodeImage,
        fn_constructor_kwargs={"thumb": thumb},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class VideoFrameFeatures:
    """Actor-pool stage: MJPEG-AVI payloads -> per-sampled-frame rows
    carrying three independently verifiable facts:

    - ``frame_idx`` / ``frame_ms``: tick replay off the REAL container
      frame rate (strh dwScale/dwRate) — checkable from fps alone;
    - ``chunk_digest``: blake2b of the raw JPEG bytes of the selected
      ``00dc`` chunk — checkable by any independent RIFF walker
      without a JPEG decoder;
    - ``frame_mean`` / ``frame_std``: statistics of the DECODED RGB
      frame — checkable within JPEG-loss tolerance against the
      pre-encode source frames (a fake decode cannot pass).

    Each sampled frame is decoded once even when several ticks land on
    it (MJPEG frames are independent keyframes, so no inter-frame
    state is needed — the property that makes this stage trivially
    batch-parallel)."""

    def __init__(self, every_ms: int = 250):
        self.every_ms = every_ms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from ..codec.avi import frame_index_at, parse_avi
        from ..codec.jpeg import decode_jpeg

        every_ms = self.every_ms
        rows = []
        for mid, payload, codec in zip(batch["media_id"], batch["payload"], batch["codec"]):
            if codec != "mjpeg":
                continue
            info = parse_avi(bytes(payload))
            decoded: dict[int, np.ndarray] = {}
            for t in range(0, max(info.duration_ms, 1), every_ms):
                fi = frame_index_at(info, t)
                if fi not in decoded:
                    decoded[fi] = decode_jpeg(info.frame_chunks[fi])
                px = decoded[fi]
                rows.append(
                    (
                        mid,
                        t,
                        fi,
                        hashlib.blake2b(info.frame_chunks[fi], digest_size=8).hexdigest(),
                        float(px.mean()),
                        float(px.std()),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=["media_id", "frame_ms", "frame_idx", "chunk_digest", "frame_mean", "frame_std"],
        )


def video_frame_features(ds, every_ms: int = 250, concurrency=None, batch_size: int = 16):
    """MJPEG video rows -> per-sampled-frame feature rows (actor pool,
    small batches because each row fans out to many decoded frames)."""
    concurrency = concurrency or auto_pool()
    return ds.filter(expr="media_type == 'video'").map_batches(
        VideoFrameFeatures,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_video_frames(ds, every_ms: int = 5000, concurrency=None):
    concurrency = concurrency or auto_pool()
    return ds.filter(expr="media_type == 'video'").map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pandas",
        batch_size=32,
        concurrency=concurrency,
    )
