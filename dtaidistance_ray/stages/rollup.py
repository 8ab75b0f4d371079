"""Rollup / downsample / retention stages (Ray Data).

The downsample core: per (source, time-bucket) group, continuous
aggregates (count/sum/min/max/mean over token values — exact under any
partitioning because they are integer sums) plus a DBA representative
series (reference dtw_barycenter.py:66-243 semantics via our kernels).

Shuffle plan: ONE groupby per tier keyed (source, bucket); aggregates
and the DBA representative are computed in the same map_groups pass so
the shuffle is not paid twice. Tier t+1 consumes tier t representatives
with a coarser bucket — the same key layout, so the sort order is
reused. Skew: a hot source is still split across buckets; hot
(source, bucket) groups are the scan path's job (stages/rollup_scan.py:
per-block combiner partials — the salt is the physical block — merged
through associative (sum, count) DBA accumulators exactly).

Determinism: members are processed in sorted doc_id order (tier 0) /
child-bucket order (tier >= 1), so the pipeline's output is bit-equal
to a single-process run of the same kernels — asserted in
tests/test_rollup.py at parallelism 1 vs 4.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.dba import dba_loop
from ..settings import DTWSettings
from ..sources.synth import TokenTableSpec, derive_ts
from ..codec import dod_encode, gorilla_encode


TIER_SCHEMA_COLS = [
    "source",
    "bucket",
    "agg_count",
    "agg_n_tok_sum",
    "agg_token_sum",
    "agg_token_min",
    "agg_token_max",
    "agg_token_mean",
    "repr_series",
    "gap_filled",
]


@dataclass(frozen=True)
class RollupConfig:
    """Retention policy + DBA knobs for the rollup pipeline."""

    tier_widths: tuple = (3600, 4 * 3600, 24 * 3600)  # seconds per bucket
    dba_max_it: int = 2
    dba_thr: float = 0.001
    dtw: DTWSettings = field(default_factory=lambda: DTWSettings(window=16))

    def settings_hash(self) -> str:
        import hashlib

        payload = f"{self.tier_widths}|{self.dba_max_it}|{self.dba_thr}|{sorted(self.dtw.manifest_dict().items())}"
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


def add_event_time(batch: pa.Table, spec: TokenTableSpec) -> pa.Table:
    """Derive the synthetic event time from doc_id ("d%010d" -> row id).

    A production token table would carry a real ts column; the stage
    uses it if present.
    """
    if "ts" in batch.column_names:
        return batch
    ids = np.array([int(d[1:]) for d in batch["doc_id"].to_pylist()], dtype=np.int64)
    ts = derive_ts(ids, spec)
    return batch.append_column("ts", pa.array(ts, type=pa.int64()))


def bucketize(ds, width: int, spec: TokenTableSpec):
    """Add the tier-0 bucket column: bucket = ts // width."""

    def fn(batch: pa.Table) -> pa.Table:
        batch = add_event_time(batch, spec)
        bucket = pa.array(np.asarray(batch["ts"]) // width, type=pa.int64())
        return batch.append_column("bucket", bucket)

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-group reduction (aggregates + DBA representative in one pass)
# ---------------------------------------------------------------------------


def _rollup_group_base(g: pd.DataFrame, cfg: RollupConfig) -> pd.DataFrame:
    g = g.sort_values("doc_id", kind="mergesort")
    seqs = [np.asarray(t, dtype=np.float64) for t in g["tokens"]]
    flat = np.concatenate(seqs) if seqs else np.empty(0)
    repr_series = dba_loop(
        seqs, c=None, max_it=cfg.dba_max_it, thr=cfg.dba_thr, settings=cfg.dtw
    )
    return pd.DataFrame(
        {
            "source": [g["source"].iloc[0]],
            "bucket": [int(g["bucket"].iloc[0])],
            "agg_count": [len(g)],
            "agg_n_tok_sum": [int(flat.size)],
            "agg_token_sum": [int(flat.sum())],
            "agg_token_min": [float(flat.min())],
            "agg_token_max": [float(flat.max())],
            "agg_token_mean": [float(flat.sum()) / flat.size],
            "repr_series": [repr_series.tolist()],
            "gap_filled": [False],
        }
    )


def rollup_base_tier(bucketed_ds, cfg: RollupConfig):
    """Tier 0: groupby (source, bucket) -> aggregates + DBA representative."""
    return bucketed_ds.groupby(["source", "bucket"]).map_groups(
        lambda g: _rollup_group_base(g, cfg), batch_format="pandas"
    )


def promote_frame(
    df: pd.DataFrame, ratio: int, cfg: RollupConfig, order_free: bool = False
) -> pd.DataFrame:
    """Promote one source's tier rows to the next tier: vectorized
    aggregate merge + co-batched DBA rounds over ALL groups at once
    (kernels.dba_scan), with per-group convergence freezing mirroring
    dba_loop. Deterministic given the input rows (canonical sort inside);
    the single-process oracle calls this same function per source.

    Accumulation is member-order deterministic (kernels.dba_scan float
    path): every call with the same per-group child lists produces
    IDENTICAL bits whatever the task sharding, so the staged, fused,
    exchange and single-process-oracle promotions all agree exactly.
    ``order_free`` is retained for API stability and ignored — the
    deterministic plan is batching-independent AND uses the fast
    width-bucketed DP, so there is nothing left to opt into."""
    from ..kernels.dba_scan import scan_dba_partials

    df = df[~df["gap_filled"]].copy()
    df["child_bucket"] = df["bucket"]
    df["bucket"] = df["child_bucket"] // ratio
    df = df.sort_values(["source", "bucket", "child_bucket"], kind="mergesort")
    aggs = (
        df.groupby(["source", "bucket"], sort=True)
        .agg(
            agg_count=("agg_count", "sum"),
            agg_n_tok_sum=("agg_n_tok_sum", "sum"),
            agg_token_sum=("agg_token_sum", "sum"),
            agg_token_min=("agg_token_min", "min"),
            agg_token_max=("agg_token_max", "max"),
        )
        .reset_index()
    )
    aggs["agg_token_mean"] = aggs["agg_token_sum"] / aggs["agg_n_tok_sum"]
    keys = list(zip(df["source"], (int(b) for b in df["bucket"])))
    seqs = [np.asarray(r, dtype=np.float64) for r in df["repr_series"]]
    centers: dict = {}
    for k, s in zip(keys, seqs):
        if k not in centers:
            centers[k] = s  # first child in canonical order (dba_loop c=None)
    final = dict(centers)
    active = dict(centers)
    for _ in range(cfg.dba_max_it):
        if not active:
            break
        parts = scan_dba_partials(keys, seqs, active, cfg.dtw, order_free=False)
        nxt: dict = {}
        for k, (sums, counts) in parts.items():
            avg = np.zeros_like(sums)
            nz = counts > 0
            avg[nz] = sums[nz] / counts[nz]
            final[k] = avg
            # zero-length center (group seeded by an empty-token row):
            # nothing to update — treat as converged, keep it frozen
            diff = float(np.abs(avg - active[k]).sum()) / len(avg) if len(avg) else 0.0
            if cfg.dba_thr is None or diff > cfg.dba_thr:
                nxt[k] = avg
        active = nxt
    aggs["repr_series"] = [
        final[(s, int(b))].tolist() for s, b in zip(aggs["source"], aggs["bucket"])
    ]
    aggs["gap_filled"] = False
    for c in ("agg_count", "agg_n_tok_sum", "agg_token_sum"):
        aggs[c] = aggs[c].astype("int64")
    return aggs[TIER_SCHEMA_COLS]


def rollup_next_tier(tier_ds, child_width: int, width: int, cfg: RollupConfig):
    """Tier t+1 from tier t: coarser buckets over representatives.

    One task per source: groups never straddle tasks, the per-group
    order is canonical, the tiny shuffle gives cheap parallelism, and
    each task runs ONE co-batched DP over all of its groups."""
    ratio = width // child_width
    # tier datasets are often single-block (from_pandas); map_groups
    # parallelism is per-block, so split first (tiny rows, cheap)
    return (
        tier_ds.repartition(32)
        .groupby("source")
        .map_groups(lambda g: promote_frame(g, ratio, cfg), batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# gap-fill + encode
# ---------------------------------------------------------------------------


def gap_fill_frame(g: pd.DataFrame, lo: int = None, hi: int = None,
                   source: str = None) -> pd.DataFrame:
    """One source's tier rows -> rows for missing buckets in the grid.

    Default grid is [min, max] of the present rows (whole-source call);
    range-sharded callers pass explicit [lo, hi] (and the source name,
    so an all-gap shard with zero present rows still fills)."""
    if lo is None:
        g = g.sort_values("bucket", kind="mergesort")
        lo, hi = int(g["bucket"].min()), int(g["bucket"].max())
    elif len(g) == 0:
        return pd.DataFrame(
            {
                "source": source,
                "bucket": np.arange(lo, hi + 1, dtype=np.int64),
                "agg_count": 0,
                "agg_n_tok_sum": 0,
                "agg_token_sum": 0,
                "agg_token_min": np.nan,
                "agg_token_max": np.nan,
                "agg_token_mean": np.nan,
                "repr_series": [[] for _ in range(hi - lo + 1)],
                "gap_filled": True,
            }
        )
    else:
        g = g.sort_values("bucket", kind="mergesort")
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    missing = np.setdiff1d(grid, g["bucket"].to_numpy(), assume_unique=False)
    if len(missing) == 0:
        return g
    fill_df = pd.DataFrame(
        {
            "source": g["source"].iloc[0],
            "bucket": missing,
            "agg_count": 0,
            "agg_n_tok_sum": 0,
            "agg_token_sum": 0,
            "agg_token_min": np.nan,
            "agg_token_max": np.nan,
            "agg_token_mean": np.nan,
            "repr_series": [[] for _ in missing],
            "gap_filled": True,
        }
    )
    out = pd.concat([g, fill_df], ignore_index=True)
    return out.sort_values("bucket", kind="mergesort")


def gap_fill_tier(tier_ds):
    """Per source, emit rows for missing buckets in [min, max] with
    agg_count = 0 / null aggregates / empty representative."""
    return tier_ds.groupby("source").map_groups(gap_fill_frame, batch_format="pandas")


def encode_frame(batch: pd.DataFrame) -> pd.DataFrame:
    """Add the Gorilla XOR payload column for the representatives."""
    batch = batch.copy()
    batch["repr_gorilla"] = [
        gorilla_encode(np.asarray(r, dtype=np.float64)) for r in batch["repr_series"]
    ]
    return batch


def encode_tier(tier_ds):
    """Add the Gorilla XOR payload column for the representative series
    (the delta-of-delta time grid is a separate per-source artifact —
    see tier_time_index)."""
    return tier_ds.map_batches(encode_frame, batch_format="pandas")


def tier_time_index(tier_ds, width: int):
    """Small per-source index: delta-of-delta encoded bucket-start
    timestamps (the tier's time grid, typically ~1 bit per bucket)."""

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["bucket"].unique()) * width
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_buckets": [len(ts)],
                "ts_dod": [dod_encode(ts)],
            }
        )

    return tier_ds.groupby("source").map_groups(fn, batch_format="pandas")
