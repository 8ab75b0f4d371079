"""Distinct-count operators: exact (gate-checked) and HyperLogLog.

``distinct_users_per_type`` is the correctness surface: per-block
dedup packs each block's unique (key, member) sets into one row per
key, keyed fan-in tree rounds union them (np.unique of concatenations
— associative, order-free), and only the bounded remainder reaches the
driver. Exactness is absolute, but the state grows with true
cardinality — the right tool when distincts fit a worker (usual for
per-key user sets), the wrong one at extreme cardinality.

``HllSketch`` is the 100-TB path for that extreme: fixed 2^p registers
per key regardless of cardinality, associative merge = elementwise
max. Standard HyperLogLog (Flajolet et al. 2007) with the linear-
counting small-range correction; ~1.04/sqrt(m) relative error. The
sketch is property-tested (error bound + merge associativity +
partition invariance); it has no SQL oracle because no two HLL
implementations agree bit-for-bit (DuckDB's approx_count_distinct is
its own variant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import rollup_scan as _rs

# splitmix64 finalizer — the same public-domain mix used elsewhere in
# the engine; avalanches sequential ids
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(30)
    x = (x * _M1) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(27)
    x = (x * _M2) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x ^= x >> np.uint64(31)
    return x


class HllSketch:
    """Registers-only HyperLogLog: p index bits, 64-p rank bits."""

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, h: np.ndarray) -> "HllSketch":
        h = h.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        # rank = leading zeros of the remaining 64-p bits + 1 (capped)
        nbits = 64 - self.p
        lz = np.full(len(h), nbits, dtype=np.uint8)
        nz = rest != 0
        # count leading zeros via float64 exponent trick is lossy past
        # 2^53; use a vectorized bit-scan instead (log2 on uint64 is
        # exact for the leading-bit position)
        top = np.zeros(len(h), dtype=np.int64)
        r = rest[nz]
        for shift in (32, 16, 8, 4, 2, 1):
            s = np.uint64(shift)
            r = r | (r >> s)
        # r now has all bits below the leading bit set; popcount gives
        # the leading-bit position. SWAR popcount: 12 vector ops
        # instead of up to 64 shift/mask passes.
        m1 = np.uint64(0x5555555555555555)
        m2 = np.uint64(0x3333333333333333)
        m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
        v = r - ((r >> np.uint64(1)) & m1)
        v = (v & m2) + ((v >> np.uint64(2)) & m2)
        v = (v + (v >> np.uint64(4))) & m4
        pc = (
            (v * np.uint64(0x0101010101010101)) >> np.uint64(56)
        ).astype(np.int64)
        top[nz] = pc  # leading-bit position + 1 (1-based from LSB)
        lz_nz = (64 - top[nz]).astype(np.uint8)
        lz[nz] = lz_nz
        rank = np.minimum(lz + 1, nbits + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_ints(self, values: np.ndarray) -> "HllSketch":
        return self.add_hashed(_mix64(np.asarray(values)))

    def merge(self, other: "HllSketch") -> "HllSketch":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        # standard HLL bias constants: the asymptotic formula only holds
        # for m >= 128 (p >= 7); small register counts use the published
        # exact values (Flajolet et al. 2007, figure 3)
        if m <= 16:
            alpha = 0.673
        elif m <= 32:
            alpha = 0.697
        elif m <= 64:
            alpha = 0.709
        else:
            alpha = 0.7213 / (1.0 + 1.079 / m)
        e = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if e <= 2.5 * m:
            zeros = int(np.sum(self.registers == 0))
            if zeros:
                e = m * np.log(m / zeros)  # linear counting
        return float(e)

    def pack(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def unpack(cls, blob: bytes, p: int = 14) -> "HllSketch":
        s = cls(p)
        s.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        return s


def _empty_sets() -> pd.DataFrame:
    return pd.DataFrame({"key": pd.Series(dtype=object), "members": pd.Series(dtype=object)})


def _distinct_partial(batch: pd.DataFrame, key_col: str, val_col: str) -> pd.DataFrame:
    if not len(batch):
        return _empty_sets()
    rows = {"key": [], "members": []}
    for k, g in batch.groupby(key_col, sort=True):
        rows["key"].append(k)
        rows["members"].append(np.unique(g[val_col].to_numpy(np.int64)).tobytes())
    return pd.DataFrame(rows)


def _distinct_merge(batch: pd.DataFrame) -> pd.DataFrame:
    if not len(batch):
        return _empty_sets()
    rows = {"key": [], "members": []}
    for k, g in batch.groupby("key", sort=True):
        u = np.unique(np.concatenate([np.frombuffer(b, np.int64) for b in g["members"]]))
        rows["key"].append(k)
        rows["members"].append(u.tobytes())
    return pd.DataFrame(rows)


def distinct_exact(ds, key_col: str, val_col: str) -> pd.DataFrame:
    """Exact per-key distinct counts via packed unique-set tree merge."""
    from functools import partial as _p

    parts = ds.map_batches(
        _p(_distinct_partial, key_col=key_col, val_col=val_col), batch_format="pandas"
    )
    from .vocab import _tree_reduce_keyed

    packed = _tree_reduce_keyed(parts, _distinct_merge, key="key")
    return pd.DataFrame(
        {
            "key": packed["key"],
            "n_distinct": [len(np.frombuffer(b, np.int64)) for b in packed["members"]],
        }
    )


def distinct_users_per_type(sf_dir: str) -> pd.DataFrame:
    from .events import read_events

    ds = read_events(sf_dir, columns=["event_type", "user_id"])
    out = distinct_exact(ds, "event_type", "user_id")
    out = out.rename(columns={"key": "event_type"})
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out


DISTINCT_USERS_SQL = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""


def hll_distinct_users_per_type(sf_dir: str, p: int = 14) -> pd.DataFrame:
    """HLL estimate per event_type — the fixed-state path; returns the
    estimate and the sketch's nominal relative standard error."""
    from .events import read_events

    ds = read_events(sf_dir, columns=["event_type", "user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"key": pd.Series(dtype=object), "reg": pd.Series(dtype=object)})
        rows = {"key": [], "reg": []}
        for k, g in batch.groupby("event_type", sort=True):
            rows["key"].append(k)
            rows["reg"].append(HllSketch(p).add_ints(g["user_id"].to_numpy()).pack())
        return pd.DataFrame(rows)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"key": pd.Series(dtype=object), "reg": pd.Series(dtype=object)})
        rows = {"key": [], "reg": []}
        for k, g in batch.groupby("key", sort=True):
            s = HllSketch.unpack(g["reg"].iloc[0], p)
            for b in g["reg"].iloc[1:]:
                s.merge(HllSketch.unpack(b, p))
            rows["key"].append(k)
            rows["reg"].append(s.pack())
        return pd.DataFrame(rows)

    from .vocab import _tree_reduce_keyed

    packed = _tree_reduce_keyed(ds.map_batches(partial, batch_format="pandas"), merge, key="key")
    rse = 1.04 / np.sqrt(1 << p)
    return pd.DataFrame(
        {
            "event_type": packed["key"],
            "approx_distinct": [HllSketch.unpack(b, p).estimate() for b in packed["reg"]],
            "rel_std_err": rse,
        }
    )


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): d x w int64
    counters; point queries are min over rows — one-sided error
    (never an undercount), overcount <= eps*N with prob 1-delta for
    w = ceil(e/eps), d = ceil(ln 1/delta). Merge is elementwise add
    (associative, order-free), so per-block partials tree-merge into
    a bit-identical sketch under ANY partitioning — the fixed-state
    frequency path when the exact vocab table would not fit."""

    def __init__(self, depth: int = 4, width: int = 1 << 12):
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64)
        # row salts: splitmix64 of the row index (public-domain mix)
        self.salts = _mix64(np.arange(1, depth + 1, dtype=np.uint64))

    def _cols(self, values: np.ndarray) -> np.ndarray:
        h = _mix64(np.asarray(values, dtype=np.uint64))
        return np.stack(
            [(_mix64(h ^ s) % np.uint64(self.width)).astype(np.int64) for s in self.salts]
        )

    def add_ints(self, values: np.ndarray, counts: np.ndarray = None) -> "CountMinSketch":
        if len(values) == 0:
            return self
        cols = self._cols(values)
        c = np.ones(len(values), dtype=np.int64) if counts is None else counts.astype(np.int64)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[r], c)
        return self

    def query_ints(self, values: np.ndarray) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._cols(values)
        est = self.table[np.arange(self.depth)[:, None], cols]
        return est.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.table += other.table
        return self

    def pack(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def unpack(cls, blob: bytes, depth: int = 4, width: int = 1 << 12) -> "CountMinSketch":
        s = cls(depth, width)
        s.table = np.frombuffer(blob, dtype=np.int64).reshape(depth, width).copy()
        return s


def cms_token_counts(tok_path: str, probe_tokens: np.ndarray,
                     depth: int = 4, width: int = 1 << 12) -> pd.DataFrame:
    """CMS frequency estimates for the probe tokens over the token
    table: per-block sketches (map-only, vectorized bincount feed),
    fan-in tree merge of fixed-size byte blobs, point queries on the
    merged sketch. Returns (token, est_count) with the one-sided CMS
    guarantee est >= true."""
    import ray.data as rd

    ds = rd.read_parquet(tok_path, columns=["tokens"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"key": pd.Series(dtype=object), "blob": pd.Series(dtype=object)})
        flat = np.concatenate([np.asarray(t, dtype=np.int64) for t in batch["tokens"]]) \
            if len(batch) else np.zeros(0, np.int64)
        # bincount-compress first: one add per DISTINCT token per block
        uniq, cnt = np.unique(flat, return_counts=True)
        s = CountMinSketch(depth, width).add_ints(uniq, cnt)
        return pd.DataFrame({"key": ["cms"], "blob": [s.pack()]})

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"key": pd.Series(dtype=object), "blob": pd.Series(dtype=object)})
        s = CountMinSketch.unpack(batch["blob"].iloc[0], depth, width)
        for b in batch["blob"].iloc[1:]:
            s.merge(CountMinSketch.unpack(b, depth, width))
        return pd.DataFrame({"key": ["cms"], "blob": [s.pack()]})

    from .vocab import _tree_reduce_keyed

    packed = _tree_reduce_keyed(ds.map_batches(partial, batch_format="pandas"), merge, key="key")
    probe = np.asarray(probe_tokens, dtype=np.int64)
    if not len(packed):
        # empty corpus: every count is exactly 0 (not an IndexError)
        return pd.DataFrame({"token": probe, "est_count": np.zeros(len(probe), np.int64)})
    s = CountMinSketch.unpack(packed["blob"].iloc[0], depth, width)
    return pd.DataFrame({"token": probe, "est_count": s.query_ints(probe)})
