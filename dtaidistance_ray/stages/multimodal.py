"""Multimodal (image/audio/video) column stages.

Binary payloads are opaque ``binary`` columns with typed metadata
(media_type, width/height/duration, codec). Decode / feature-extract /
resize / frame-sample run as actor-pool map_batches stages: the actor
loads its codec once in __init__, batches stay small because rows are
large, and outputs are fixed-shape feature columns.

The image/audio libraries are not in this container, so the decoders
are STUBS: ``DecodeImage.decode_real`` raises NotImplementedError, and
the default path substitutes a deterministic fake decode (seeded by the
payload hash) so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

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
        rows["codec"].append({"image": "jpeg", "audio": "opus", "video": "h264"}[mt])
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic stand-in decode: pixels seeded by payload hash."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class DecodeImage:
    """Actor-pool stage: decode image payloads to a fixed-size thumbnail
    feature column. batch_size must be SMALL (payloads are large);
    callers pass e.g. batch_size=32, concurrency=(2, 8), num_cpus=1."""

    def __init__(self, thumb: int = 8, use_real_codec: bool = False):
        self.thumb = thumb
        self.use_real_codec = use_real_codec
        # real path would load PIL/libjpeg here, once per actor

    def decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image codecs are not available in this container; "
            "install Pillow and wire it here (payload -> HxWx3 uint8)"
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        thumbs = []
        means = []
        for payload, w, h in zip(batch["payload"], batch["width"], batch["height"]):
            if self.use_real_codec:
                px = self.decode_real(payload)
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
    sampled frame (flat_map-shaped expansion via map_batches)."""

    def __init__(self, every_ms: int = 5000):
        self.every_ms = every_ms

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for mid, payload, dur in zip(batch["media_id"], batch["payload"], batch["duration_ms"]):
            for t in range(0, int(dur), self.every_ms):
                rows.append((mid, t, hashlib.blake2b(payload + t.to_bytes(4, "big"), digest_size=8).hexdigest()))
        return pd.DataFrame(rows, columns=["media_id", "frame_ms", "frame_digest"])


def decode_images(ds, thumb: int = 8, concurrency=2, batch_size: int = 32):
    """image rows -> thumbnail feature vectors (actor pool, small
    batches because payload rows are large)."""
    return ds.filter(expr="media_type == 'image'").map_batches(
        DecodeImage,
        fn_constructor_kwargs={"thumb": thumb},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_video_frames(ds, every_ms: int = 5000, concurrency=2):
    return ds.filter(expr="media_type == 'video'").map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pandas",
        batch_size=32,
        concurrency=concurrency,
    )
