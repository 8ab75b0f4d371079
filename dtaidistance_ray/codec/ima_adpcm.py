"""IMA / DVI ADPCM codec (4-bit), pure Python + NumPy tables.

Own implementation from the public IMA ADPCM algorithm (the
Interactive Multimedia Association's 1992 reference recursion — the
same algorithm CPython's `audioop.lin2adpcm/adpcm2lin` implements).
Two packings are provided:

- raw stream, HIGH nibble first (`encode_raw`/`decode_raw`) —
  byte-compatible with `audioop`, which tests use as the independent
  oracle (exact byte + state equality on random waveforms).
- WAV container blocks (`decode_wav_blocks`/`encode_wav_blocks`),
  LOW nibble first with the standard 4-byte per-block header
  (int16 predictor, uint8 step index, reserved) — the layout WAV
  format tag 0x11 files carry (mono).

The recursion is inherently sequential (predictor + step index feed
forward), so the per-sample loop is plain Python; payloads decode in
actor-pool stages where the per-batch loop is not the bottleneck.
"""
from __future__ import annotations

import numpy as np

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int32)
# step sizes: s[0]=7, s[i+1] = floor(s[i] * 1.1) with the published
# rounding, i.e. the canonical 89-entry table
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)


def decode_nibbles(nibbles, state=(0, 0)):
    """Decode a sequence of 4-bit codes -> (int16 array, final state).

    state = (predicted value, step index), as audioop's state tuple.
    """
    valpred, index = int(state[0]), int(state[1])
    out = np.empty(len(nibbles), dtype=np.int16)
    step_t, idx_t = STEP_TABLE, INDEX_TABLE
    for i, delta in enumerate(nibbles):
        step = int(step_t[index])
        index += int(idx_t[delta])
        index = 0 if index < 0 else (88 if index > 88 else index)
        mag = delta & 7
        vpdiff = step >> 3
        if mag & 4:
            vpdiff += step
        if mag & 2:
            vpdiff += step >> 1
        if mag & 1:
            vpdiff += step >> 2
        valpred = valpred - vpdiff if delta & 8 else valpred + vpdiff
        valpred = -32768 if valpred < -32768 else (32767 if valpred > 32767 else valpred)
        out[i] = valpred
    return out, (valpred, index)


def encode_nibbles(samples, state=(0, 0)):
    """int16 samples -> (list of 4-bit codes, final state)."""
    valpred, index = int(state[0]), int(state[1])
    nibbles = []
    step_t, idx_t = STEP_TABLE, INDEX_TABLE
    step = int(step_t[index])
    for val in np.asarray(samples, dtype=np.int16):
        diff = int(val) - valpred
        sign = 8 if diff < 0 else 0
        if sign:
            diff = -diff
        delta = 0
        vpdiff = step >> 3
        if diff >= step:
            delta = 4
            diff -= step
            vpdiff += step
        s2 = step >> 1
        if diff >= s2:
            delta |= 2
            diff -= s2
            vpdiff += s2
        s4 = step >> 2
        if diff >= s4:
            delta |= 1
            vpdiff += s4
        valpred = valpred - vpdiff if sign else valpred + vpdiff
        valpred = -32768 if valpred < -32768 else (32767 if valpred > 32767 else valpred)
        delta |= sign
        index += int(idx_t[delta])
        index = 0 if index < 0 else (88 if index > 88 else index)
        step = int(step_t[index])
        nibbles.append(delta)
    return nibbles, (valpred, index)


def _unpack_high_first(data: bytes) -> np.ndarray:
    b = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(2 * len(b), dtype=np.uint8)
    out[0::2] = b >> 4
    out[1::2] = b & 0x0F
    return out


def _unpack_low_first(data: bytes) -> np.ndarray:
    b = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(2 * len(b), dtype=np.uint8)
    out[0::2] = b & 0x0F
    out[1::2] = b >> 4
    return out


def _pack(nibbles, high_first: bool) -> bytes:
    n = np.asarray(nibbles, dtype=np.uint8)
    if len(n) % 2:
        n = np.concatenate([n, np.zeros(1, dtype=np.uint8)])
    a, b = (n[0::2], n[1::2])
    return ((a << 4) | b).astype(np.uint8).tobytes() if high_first else ((b << 4) | a).astype(np.uint8).tobytes()


def decode_raw(data: bytes, state=(0, 0)):
    """audioop-packed stream (high nibble first) -> (samples, state)."""
    return decode_nibbles(_unpack_high_first(data), state)


def encode_raw(samples, state=(0, 0)):
    """int16 samples -> (audioop-packed bytes, state).

    Matches audioop byte-for-byte, including its quirk of never
    flushing a trailing half-byte: an odd sample count emits
    floor(n/2) bytes (the last nibble is dropped, though the state
    reflects it). The WAV block packer pads instead.
    """
    nibbles, st = encode_nibbles(samples, state)
    if len(nibbles) % 2:
        nibbles = nibbles[:-1]
    return _pack(nibbles, high_first=True), st


def encode_wav_blocks(samples: np.ndarray, block_align: int = 256):
    """int16 mono samples -> standard WAV IMA-ADPCM data blocks.

    Each block: <int16 first sample> <uint8 step index> <uint8 0>,
    then (block_align-4)*2 nibble codes, LOW nibble first. The first
    sample is stored verbatim; the recursion continues from it.
    Returns (data bytes, samples_per_block).
    """
    samples = np.asarray(samples, dtype=np.int16)
    spb = (block_align - 4) * 2 + 1
    chunks = []
    index = 0
    for start in range(0, len(samples), spb):
        blk = samples[start : start + spb]
        first = int(blk[0])
        hdr = int(first & 0xFFFF).to_bytes(2, "little") + bytes([index, 0])
        body = blk[1:]
        nibbles, (_, index) = encode_nibbles(body, (first, index))
        nibbles = list(nibbles) + [0] * ((block_align - 4) * 2 - len(nibbles))
        chunks.append(hdr + _pack(nibbles, high_first=False))
    return b"".join(chunks), spb


def decode_wav_blocks(data: bytes, block_align: int, n_samples: int) -> np.ndarray:
    """Standard WAV IMA-ADPCM mono data blocks -> int16 samples."""
    spb = (block_align - 4) * 2 + 1
    out = []
    pos = 0
    remaining = n_samples
    while remaining > 0 and pos + 4 <= len(data):
        first = int.from_bytes(data[pos : pos + 2], "little", signed=True)
        index = data[pos + 2]
        if index > 88:  # STEP_TABLE has 89 entries; anything else is corrupt
            raise ValueError(
                f"IMA ADPCM block at byte {pos}: step index {index} out of range 0..88"
            )
        body = data[pos + 4 : pos + block_align]
        nibbles = _unpack_low_first(body)[: min(remaining, spb) - 1]
        dec, _ = decode_nibbles(nibbles, (first, index))
        out.append(np.concatenate([np.array([first], dtype=np.int16), dec]))
        remaining -= len(out[-1])
        pos += block_align
    return np.concatenate(out) if out else np.zeros(0, dtype=np.int16)
