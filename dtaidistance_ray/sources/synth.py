"""Deterministic synthetic token-table source.

Schema is exactly the BASELINE.json input_hint:
    (doc_id: string, tokens: list<int32>, n_tok: int32, source: string)

Generation is counter-based (splitmix64 on the global row index), so a
row's content depends only on (seed, row_index) — independent of batch
boundaries, partitioning, and parallelism. ``token_table`` builds the
table as a Ray Dataset via ``ray.data.range(n).map_batches``;
``token_table_arrow`` builds the identical table driver-side for
oracles/tests; equality of the two is asserted in tests.

Sources are Zipf-skewed (source_000 is hot) to exercise the rollup
stage's skew handling. Lengths are cubic-skewed in [min_len, max_len]
(many short, few long) to exercise banded-DP work leveling.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG construction)."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


@dataclass(frozen=True)
class TokenTableSpec:
    num_rows: int
    seed: int = 42
    num_sources: int = 20
    vocab: int = 32000
    min_len: int = 8
    max_len: int = 256
    # event-time span covered by the synthetic corpus (seconds)
    ts_base: int = 1_700_000_000
    ts_span: int = 7 * 24 * 3600

    @staticmethod
    def for_sf(sf: float, **kw) -> "TokenTableSpec":
        return TokenTableSpec(num_rows=int(sf * 2_000_000), **kw)


def _source_cdf(spec: TokenTableSpec) -> np.ndarray:
    w = 1.0 / np.arange(1, spec.num_sources + 1)  # Zipf(1)
    return np.cumsum(w / w.sum())


def generate_batch(row_ids: np.ndarray, spec: TokenTableSpec) -> pa.Table:
    """Generate rows for the given global row indices (any order/subset)."""
    i = row_ids.astype(np.uint64)
    h1 = splitmix64(i * _U64(0x100000001B3) + _U64(spec.seed))
    h2 = splitmix64(h1)
    h3 = splitmix64(h2)

    cdf = _source_cdf(spec)
    # clamp: cumsum of normalized weights can end a few ULPs below 1.0,
    # and a u01 draw in [cdf[-1], 1) would index one past the last
    # source (round-5 review finding — parts-in-1e16 per row, but the
    # module's contract is bit-determinism at 100-TB row counts)
    src_idx = np.minimum(
        np.searchsorted(cdf, _u01(h1), side="right"), spec.num_sources - 1
    )
    u_len = _u01(h2)
    n_tok = (spec.min_len + np.floor((spec.max_len - spec.min_len + 1) * u_len**3)).astype(
        np.int32
    )
    n_tok = np.minimum(n_tok, spec.max_len)

    # tokens: key = (row_id << 20) + position, hashed — position-stable
    total = int(n_tok.sum())
    flat_row = np.repeat(i, n_tok)
    offsets32 = np.zeros(len(i) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets32[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets32[:-1], n_tok)
    with np.errstate(over="ignore"):
        hk = splitmix64((flat_row << _U64(20)) + pos.astype(np.uint64) + _U64(spec.seed * 7919))
    toks = (hk % _U64(spec.vocab)).astype(np.int32)

    doc_id = np.array([f"d{int(k):010d}" for k in row_ids])
    source = np.array([f"source_{int(k):03d}" for k in src_idx])

    if offsets32[-1] <= np.iinfo(np.int32).max:
        tokens_arr = pa.ListArray.from_arrays(
            pa.array(offsets32, type=pa.int32()), pa.array(toks)
        )
    else:
        # one generate_batch call past 2^31-1 total tokens (driver-side
        # oracle path at large sf) overflows int32 list offsets — switch
        # to large_list instead of crashing (round-5 review finding);
        # block-sized batches below the ceiling keep the int32 layout
        tokens_arr = pa.LargeListArray.from_arrays(
            pa.array(offsets32, type=pa.int64()), pa.array(toks)
        )
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "tokens": tokens_arr,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array(source, type=pa.string()),
        }
    )


def derive_ts(doc_row_ids: np.ndarray, spec: TokenTableSpec) -> np.ndarray:
    """Deterministic synthetic event time for a row (seconds).

    Kept separate from the canonical input schema: the bucketize stage
    derives it (a production table would carry a real ts column).
    """
    h = splitmix64(doc_row_ids.astype(np.uint64) * _U64(0x9E3779B1) + _U64(spec.seed ^ 0xABCD))
    return (spec.ts_base + (_u01(h) * spec.ts_span).astype(np.int64)).astype(np.int64)


def token_table_arrow(spec: TokenTableSpec) -> pa.Table:
    """Driver-side generation (oracle / small tests)."""
    return generate_batch(np.arange(spec.num_rows, dtype=np.int64), spec)


def token_table(spec: TokenTableSpec, override_num_blocks: int | None = None):
    """Ray Dataset of the synthetic token table (streaming generation)."""
    import ray.data as rd

    n = spec.num_rows
    if override_num_blocks is None:
        override_num_blocks = max(8, n // 8192)
    ds = rd.range(n, override_num_blocks=override_num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return generate_batch(batch["id"].to_numpy(), spec)

    return ds.map_batches(gen, batch_format="pyarrow")
