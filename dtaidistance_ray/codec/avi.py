"""AVI (RIFF) container codec for MJPEG video — pure stdlib + NumPy.

Own implementation from the public Microsoft AVI RIFF file format
(``MainAVIHeader`` / ``AVIStreamHeader`` / ``BITMAPINFOHEADER`` C
layouts; ``LIST hdrl`` / ``LIST strl`` / ``LIST movi`` / ``idx1``
chunk structure). Frames are baseline JPEG payloads (codec/jpeg.py)
carried in ``NNdc`` chunks: "MJPEG-in-AVI" composes the RIFF chunk
walking already proven by the WAV/G.711 work (including the
odd-chunk pad byte rule) with the own JPEG codec — no new entropy
coding. The decoder also handles the spec's optional ``LIST rec``
grouping inside ``movi`` and skips non-video streams (``NNwb``
audio chunks).

The reference library has no media operators; this is a
north-rule/LLM-pipeline component. The decoder is anchored to a
hand-assembled spec-level byte fixture in tests/test_codec.py
(container built with raw struct.pack, not this encoder).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(cid: bytes, data: bytes) -> bytes:
    """RIFF chunk: id + size + data, padded to word alignment (the pad
    byte is NOT counted in the declared size)."""
    pad = b"\x00" if len(data) % 2 else b""
    return cid + struct.pack("<I", len(data)) + data + pad


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def encode_avi_mjpeg(
    frames,
    rate: int = 30,
    scale: int = 1,
    quality: int = 90,
    subsampling: str = "420",
) -> bytes:
    """(H, W, 3) uint8 RGB frames -> MJPEG AVI bytes.

    ``rate/scale`` is the frame rate (e.g. 30000/1001 for NTSC).
    Every frame is an independently decodable baseline JPEG
    (codec/jpeg.py), i.e. every frame is a keyframe — the defining
    property of MJPEG.
    """
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    h, w, _ = frames[0].shape
    jpegs = []
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one (H, W, 3) shape")
        jpegs.append(encode_jpeg(np.asarray(f, dtype=np.uint8), quality=quality, subsampling=subsampling))

    usec_per_frame = int(round(1_000_000 * scale / rate))
    max_size = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        usec_per_frame,
        max_size * rate // max(scale, 1),  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,
        len(jpegs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4h",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        scale,
        rate,
        0,  # dwStart
        len(jpegs),  # dwLength (in frames)
        max_size,  # dwSuggestedBufferSize
        -1,  # dwQuality (default)
        0,  # dwSampleSize (0 = variable-size samples)
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",
        w * h * 3,  # biSizeImage (advisory for compressed)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = bytearray()
    idx_entries = []
    for j in jpegs:
        # idx1 offsets are measured from the 'movi' fourcc (first chunk = 4)
        idx_entries.append((4 + len(movi_payload), len(j)))
        movi_payload.extend(_chunk(b"00dc", j))
    movi = _list(b"movi", bytes(movi_payload))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


@dataclass
class AviInfo:
    """Parsed AVI video-stream info: dimensions, frame timing
    (``rate/scale`` frames per second) and the raw per-frame payload
    bytes of the first video stream, in presentation order."""

    width: int
    height: int
    scale: int
    rate: int
    handler: bytes
    frame_chunks: list = field(default_factory=list)

    @property
    def n_frames(self) -> int:
        return len(self.frame_chunks)

    @property
    def ms_per_frame(self) -> float:
        return 1000.0 * self.scale / self.rate

    @property
    def duration_ms(self) -> int:
        return int(round(self.n_frames * self.ms_per_frame))


def _walk(payload: bytes, pos: int, end: int):
    """Yield (chunk id, data offset, size) over a RIFF chunk run."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def parse_avi(payload: bytes) -> AviInfo:
    """Parse an AVI container: header walk for the first ``vids``
    stream's timing/dimensions, then collect that stream's frame
    chunks from ``LIST movi`` (recursing into ``LIST rec`` groups,
    skipping audio ``NNwb`` and other streams' chunks)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    info = None
    vids_stream = None
    stream_idx = -1

    def parse_hdrl(pos: int, end: int):
        nonlocal info, vids_stream, stream_idx
        for cid, dpos, size in _walk(payload, pos, end):
            if cid == b"LIST" and payload[dpos : dpos + 4] == b"strl":
                stream_idx += 1
                strh = strf = None
                for scid, sdpos, ssize in _walk(payload, dpos + 4, dpos + size):
                    if scid == b"strh":
                        strh = payload[sdpos : sdpos + ssize]
                    elif scid == b"strf":
                        strf = payload[sdpos : sdpos + ssize]
                if strh is not None and strh[:4] == b"vids" and vids_stream is None:
                    handler = strh[4:8]
                    scale, rate = struct.unpack_from("<II", strh, 20)
                    w = h = 0
                    if strf is not None and len(strf) >= 12:
                        w, h = struct.unpack_from("<ii", strf, 4)
                    vids_stream = stream_idx
                    info = AviInfo(width=w, height=abs(h), scale=max(scale, 1), rate=max(rate, 1), handler=handler)

    def parse_movi(pos: int, end: int):
        want = None if vids_stream is None else f"{vids_stream:02d}".encode()
        for cid, dpos, size in _walk(payload, pos, end):
            if cid == b"LIST" and payload[dpos : dpos + 4] == b"rec ":
                parse_movi(dpos + 4, dpos + size)
            elif cid[2:4] in (b"dc", b"db") and (want is None or cid[:2] == want):
                if info is not None and size > 0:
                    info.frame_chunks.append(payload[dpos : dpos + size])

    movi_spans = []
    for cid, dpos, size in _walk(payload, 12, len(payload)):
        if cid != b"LIST":
            continue
        ltype = payload[dpos : dpos + 4]
        if ltype == b"hdrl":
            parse_hdrl(dpos + 4, dpos + size)
        elif ltype == b"movi":
            movi_spans.append((dpos + 4, dpos + size))
    if info is None:
        raise ValueError("AVI has no video (vids) stream header")
    for pos, end in movi_spans:
        parse_movi(pos, end)
    return info


def decode_avi_mjpeg(payload: bytes):
    """MJPEG AVI -> (list of (H, W, 3) uint8 RGB frames, AviInfo)."""
    from .jpeg import decode_jpeg

    info = parse_avi(payload)
    if info.handler not in (b"MJPG", b"mjpg", b"dmb1"):
        raise ValueError(f"not an MJPEG AVI (handler {info.handler!r})")
    return [decode_jpeg(c) for c in info.frame_chunks], info


def frame_index_at(info: AviInfo, t_ms: int) -> int:
    """Frame displayed at tick ``t_ms``: frame i covers
    [i*scale/rate, (i+1)*scale/rate) seconds (integer arithmetic —
    no float drift over long timelines)."""
    if info.n_frames == 0:
        raise ValueError("no frames")
    return min(t_ms * info.rate // (info.scale * 1000), info.n_frames - 1)
