"""Flagship pipeline: rollup + downsample + retention over a token table.

End-to-end:  token table (doc_id, tokens, n_tok, source)
  -> bucketize by event time (tier-0 width)
  -> per (source, bucket): continuous aggregates + DBA representative
  -> gap-fill missing buckets per source
  -> Gorilla/delta-of-delta encode
  -> per-shard checkpointed parquet (lineage manifest, resumable)
  -> promote: tier t representatives -> tier t+1 (coarser buckets)

``rollup_oracle`` is the single-process reference implementation (same
kernels, same canonical ordering); the distributed pipeline's output is
bit-equal to it at every tier — the north rule's "rolled-up point
equality per retention tier".
"""

from __future__ import annotations

import time
import zlib
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.synth import TokenTableSpec, token_table, token_table_arrow, derive_ts
from ..stages.rollup import (
    RollupConfig,
    _rollup_group_base,
    bucketize,
    encode_frame,
    encode_tier,
    gap_fill_frame,
    gap_fill_tier,
    promote_frame,
    rollup_base_tier,
    rollup_next_tier,
)
from ..state.checkpoint import completed_shards, write_shard_atomic


def source_shard(source: str, num_shards: int) -> int:
    """Stable shard id (crc32, process-independent)."""
    return zlib.crc32(source.encode()) % num_shards


def _parquet_fingerprint(input_path: str) -> str:
    """Cheap content identity for a parquet input: sorted relative file
    names + sizes + mtimes, crc32-folded. Distinguishes two different
    datasets run under the same synth spec without reading the data."""
    import os

    acc = zlib.crc32(b"pq")
    n_files = 0
    if os.path.isdir(input_path):
        for root, _dirs, files in os.walk(input_path):
            _dirs.sort()  # os.walk yields dirs in arbitrary os.listdir
            # order; unsorted traversal would make the fold order (and
            # so the fingerprint) nondeterministic for partitioned
            # (nested-dir) inputs, silently defeating resume validation
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                rel = os.path.relpath(p, input_path)
                acc = zlib.crc32(
                    f"{rel}:{st.st_size}:{int(st.st_mtime)}".encode(), acc
                )
                n_files += 1
    elif os.path.exists(input_path):
        st = os.stat(input_path)
        acc = zlib.crc32(f"{st.st_size}:{int(st.st_mtime)}".encode(), acc)
        n_files = 1
    return f"parquet:{input_path}:{n_files}:{acc:08x}"


def build_tiers(
    ds, spec: TokenTableSpec, cfg: RollupConfig, use_scan: bool = True
) -> Dict[int, "object"]:
    """Datasets per tier (no gap-fill/encode), tier i keyed by bucket of
    width cfg.tier_widths[i].

    Tier 0 (the only tier whose input is large) defaults to the
    scan-based combiner path (stages.rollup_scan) — no full-data
    shuffle; upper tiers consume the tiny tier-0 result via per-group
    map_groups. use_scan=False keeps the shuffle path (used by tests to
    assert both produce bit-identical output)."""
    import time as _time

    timings: Dict[str, float] = {}
    tiers: Dict[int, object] = {}
    t0 = _time.perf_counter()
    b = bucketize(ds, cfg.tier_widths[0], spec)
    if use_scan:
        from ..stages.rollup_scan import LAST_TIMINGS, scan_rollup_base_tier

        tiers[0] = scan_rollup_base_tier(b, cfg)
        timings.update({f"tier0_{k}": v for k, v in LAST_TIMINGS.items()})
    else:
        tiers[0] = rollup_base_tier(b, cfg)
    timings["tier0"] = round(_time.perf_counter() - t0, 2)
    for t in range(1, len(cfg.tier_widths)):
        t0 = _time.perf_counter()
        # materialize: each tier is tiny (one row per (source, bucket))
        # and the next tier chains on it — never recompute upstream
        tiers[t] = rollup_next_tier(
            tiers[t - 1], cfg.tier_widths[t - 1], cfg.tier_widths[t], cfg
        ).materialize()
        timings[f"tier{t}"] = _time.perf_counter() - t0
    tiers["timings"] = timings  # type: ignore[assignment]
    return tiers


def _fused_plan(cfg: RollupConfig):
    widths = cfg.tier_widths
    ratios = [widths[t] // widths[t - 1] for t in range(1, len(widths))]
    r_cum = [1]
    for r in ratios:
        r_cum.append(r_cum[-1] * r)
    return ratios, r_cum


def _fused_step(ext: pd.DataFrame, ratio_total: int, ncpu: int) -> int:
    """Range-shard width in tier-0 buckets. Shard-count trade-off: more
    shards split the hot-source straggler, fewer keep the co-batched
    DBA kernel's member batches big (tiny per-shard DPs fragment
    vectorization) — ~1.5 tasks/cpu balances."""
    import os as _os

    total_parents = int(
        sum(
            (hi // ratio_total) - (lo // ratio_total) + 1
            for lo, hi in ext.itertuples(index=False)
        )
    )
    target_tasks = int(_os.environ.get("DTAIR_FUSED_TASKS", "0")) or max(8, (3 * ncpu) // 2)
    parents_per_task = max(1, total_parents // target_tasks)
    return parents_per_task * ratio_total


def _fused_markers(ext: pd.DataFrame, step: int, ratio_total: int) -> pd.DataFrame:
    """One MARKER row per (source, range shard) carrying the gap-fill
    grid bounds; row count ~ target task count, never key-space."""
    markers = []
    for src, (lo, hi) in ext.iterrows():
        lo, hi = int(lo), int(hi)
        for rlo in range(((lo // ratio_total) * ratio_total // step) * step, hi + 1, step):
            markers.append(
                {
                    "source": src,
                    "sid": rlo // step,
                    "bucket": -1,
                    "grid_lo": max(rlo, lo),
                    "grid_hi": min(rlo + step - 1, hi),
                }
            )
    return pd.DataFrame(markers)


_SHARD_INT_COLS = {
    "bucket": "int64",
    "agg_count": "int64",
    "agg_n_tok_sum": "int64",
    "agg_token_sum": "int64",
    "gap_filled": "bool",
}


def _split_shard_marker(g: pd.DataFrame, extra_int_cols: Optional[dict] = None):
    """Shared shard-group prologue: pull the marker row's grid bounds
    and restore the int columns the marker's Nones object-ified.
    Returns (sub_rows, source, grid_lo, grid_hi)."""
    is_marker = g["bucket"].to_numpy() == -1
    m = g[is_marker].iloc[0]
    sub = g[~is_marker].drop(columns=["sid", "grid_lo", "grid_hi"])
    sub = sub.astype({**_SHARD_INT_COLS, **(extra_int_cols or {})})
    return sub, m["source"], int(m["grid_lo"]), int(m["grid_hi"])


def _gapfill_encode_tiers(
    frames: Dict[int, pd.DataFrame], src, glo: int, ghi: int, r_cum
) -> pd.DataFrame:
    """Shared shard-group epilogue: gap-fill each tier's rows to the
    shard's grid (tier-0 bucket units scaled by r_cum) and encode."""
    outs = []
    for t, fr in frames.items():
        fr = encode_frame(gap_fill_frame(fr, glo // r_cum[t], ghi // r_cum[t], src))
        fr.insert(0, "tier", t)
        outs.append(fr)
    return pd.concat(outs, ignore_index=True)


def _make_fused_per_shard(cfg: RollupConfig, ratios, r_cum):
    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        sub, src, glo, ghi = _split_shard_marker(g)
        frames = {0: sub}
        for t, ratio in enumerate(ratios, start=1):
            # promote_frame accumulation is member-order deterministic,
            # so this per-shard promotion is BIT-identical to the
            # driver path's big-batch promotion stage
            frames[t] = promote_frame(frames[t - 1], ratio, cfg)
        return _gapfill_encode_tiers(frames, src, glo, ghi, r_cum)

    return per_shard


def _downstream_fused_exchange(tier0_ds, cfg: RollupConfig):
    """downstream_fused for key-spaces too large for one driver frame:
    the SAME sid math, but the tier-0 rows reach their shard via a Ray
    groupby EXCHANGE on (source, sid) instead of a driver-built block
    list, and promotion runs inside each shard's map_groups task
    (_make_fused_per_shard). The driver holds only the per-source
    extents (bounded by #sources) and the marker rows (~task count).
    Output is bit-identical to the driver path: promote_frame's
    accumulation is member-order deterministic, so per-shard vs
    big-batch promotion cannot differ by a bit (tests/test_rollup.py
    TestKeyShardFallback). Per-shard promotion is the right batching
    HERE: this path only engages beyond DTAIR_MAX_DRIVER_KEYS keys,
    where each (source, sid) shard already holds thousands of parents —
    the small-batch DP fragmentation that motivated the driver path's
    separate promotion stage is a small-input artifact."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max as AMax
    from ray.data.aggregate import Min as AMin

    ratios, r_cum = _fused_plan(cfg)
    ratio_total = r_cum[-1]
    ext = (
        tier0_ds.groupby("source")
        .aggregate(AMin("bucket"), AMax("bucket"))
        .to_pandas()
        .rename(columns={"min(bucket)": "min", "max(bucket)": "max"})
        .set_index("source")[["min", "max"]]
        .sort_index()
    )
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    step = _fused_step(ext, ratio_total, ncpu)
    mdf = _fused_markers(ext, step, ratio_total)

    def add_sid(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["sid"] = b["bucket"] // step
        b["grid_lo"] = np.int64(-1)
        b["grid_hi"] = np.int64(-1)
        return b

    tagged = tier0_ds.map_batches(add_sid, batch_format="pandas")
    cols = [c for c in tagged.schema().names]
    for c in cols:
        if c not in mdf.columns:
            mdf[c] = None
    per_shard = _make_fused_per_shard(cfg, ratios, r_cum)
    return (
        tagged.union(rd.from_pandas(mdf[cols]))
        .groupby(["source", "sid"])
        .map_groups(per_shard, batch_format="pandas")
    )


def downstream_fused(tier0, cfg: RollupConfig):
    """Everything after tier 0 in ONE range-sharded Ray pass.

    Tier rows are one per (source, bucket) — KB-scale regardless of
    input size — and every downstream step (tier promotion chain,
    gap-fill, encode) is a pure function of a (source, bucket-range)
    shard when the range is aligned to the top tier's width: parents
    never straddle shards, and gap-fill grids clip to the source's
    global [min, max] extents (known from the tier-0 rows). So instead
    of 5+ small per-tier Ray round-trips, one map over ~4x#cpus range
    descriptors computes all remaining tiers and payloads — and the
    hot-source straggler splits across shards. Same per-range functions
    as the staged path (promote_frame / gap_fill_frame / encode_frame).
    Values are BIT-IDENTICAL to the staged path and the single-process
    oracle at every tier: promote_frame's accumulation is member-order
    deterministic (kernels.dba_scan float path), so the promotion task
    partitioning cannot shift a ULP (asserted in tests/test_rollup.py).

    tier0: Dataset or DataFrame of tier-0 rows (key-space sized). When
    the tier-0 row count exceeds ``max_driver_keys`` (default: the scan
    path's DTAIR_MAX_DRIVER_KEYS), the driver never assembles the key
    frame: _downstream_fused_exchange range-partitions on sid (a pure
    function of bucket) with a Ray groupby exchange and runs the SAME
    per_shard function per group — bit-identical output, different
    transport (round-3 review #2, second driver frame)."""
    import ray
    import ray.data as rd

    from ..stages import rollup_scan as _rs

    # SAME knob as the scan path's key-shard cutoff (one module attribute,
    # read at call time — the env var is baked into it at import; round-5
    # review: the two paths previously parsed the env independently and
    # monkeypatching one left the other stale)
    max_driver_keys = _rs._MAX_DRIVER_KEYS
    if hasattr(tier0, "to_pandas") and not isinstance(tier0, pd.DataFrame):
        tier0 = tier0.materialize()  # consumed twice: count() + to_pandas()
        try:
            n0 = tier0.count()
        except Exception:
            n0 = 0
        if n0 > max_driver_keys:
            return _downstream_fused_exchange(tier0, cfg)
    tier0_df = tier0.to_pandas() if hasattr(tier0, "to_pandas") else tier0
    ratios, r_cum = _fused_plan(cfg)
    ratio_total = r_cum[-1]

    ext = tier0_df.groupby("source")["bucket"].agg(["min", "max"])
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    step = _fused_step(ext, ratio_total, ncpu)

    # shard id = absolute bucket // step (step is a multiple of every
    # tier ratio, so parents never straddle shards); one driver-made
    # MARKER row per shard carries the gap-fill grid bounds and makes
    # all-gap shards exist in the groupby at all
    df = tier0_df.copy()
    df["sid"] = df["bucket"] // step
    mdf = _fused_markers(ext, step, ratio_total)
    if not len(df):  # empty tier0 (e.g. full resume skip): empty result
        # with the SAME schema as the non-empty path (tier + tier
        # columns + encoded payload, no sid/grid bookkeeping) so
        # consumers like the metrics tier_counts groupby("tier") work
        empty = tier0_df.iloc[0:0].copy()
        empty["repr_gorilla"] = pd.Series([], dtype=object)
        empty.insert(0, "tier", pd.Series([], dtype="int64"))
        return rd.from_pandas(empty)

    # ---- stage P: co-batched tier promotion ------------------------
    # The DBA promotion kernel's per-row numpy dispatch floor amortizes
    # with BATCH size, and the deterministic member-order accumulation
    # (kernels.dba_scan) makes the result bit-identical under ANY task
    # partitioning — so promote in FEW, BIG tasks (each co-batching all
    # its shards' parents in one width-plan DP per tier per round)
    # instead of per encode shard: the per-shard plan measured ~9x the
    # kernel core-seconds of the well-batched tier-0 sweep at sf0.1.
    # Shard frames round-robin into tasks for balance; parents never
    # straddle sid shards, so any grouping of whole shards is valid.
    shard_frames = [g for _, g in df.groupby(["source", "sid"], sort=True)]
    promo_tasks = min(16, max(2, ncpu // 2), max(1, len(shard_frames)))
    # greedy longest-first work balancing (DP work ~ sum of repr
    # lengths) — round-robin row counts leave a ~20% straggler when one
    # source's reprs run long
    weights = np.array(
        [sum(len(r) for r in g["repr_series"]) for g in shard_frames], dtype=np.int64
    )
    buckets: list = [[] for _ in range(promo_tasks)]
    loads = np.zeros(promo_tasks, dtype=np.int64)
    for o in np.argsort(-weights):
        kmin = int(np.argmin(loads))
        buckets[kmin].append(int(o))
        loads[kmin] += weights[o]
    promo_parts = [
        pd.concat([shard_frames[o] for o in bkt], ignore_index=True)
        for bkt in buckets
        if bkt
    ]

    def _promote_chain(part: pd.DataFrame) -> Dict[int, pd.DataFrame]:
        frames: Dict[int, pd.DataFrame] = {}
        cur = part
        for t, ratio in enumerate(ratios, start=1):
            cur = promote_frame(cur, ratio, cfg)
            frames[t] = cur
        return frames

    if len(promo_parts) > 1:
        promote_remote = ray.remote(_promote_chain)
        promoted = ray.get([promote_remote.remote(p) for p in promo_parts])
    else:  # single shard (or 2-cpu host): inline beats a Ray round-trip
        promoted = [_promote_chain(promo_parts[0])]
    tiers_df: Dict[int, pd.DataFrame] = {0: df.drop(columns=["sid"])}
    for t in range(1, len(cfg.tier_widths)):
        tiers_df[t] = pd.concat([p[t] for p in promoted], ignore_index=True)

    # ---- stage E: per-shard gap-fill + encode ----------------------
    # tier t bucket b spans tier-0 buckets [b*r_cum[t], ...), so its
    # shard is (b * r_cum[t]) // step — whole rows, never straddling.
    stacked = []
    for t, fr in tiers_df.items():
        fr = fr.copy()
        fr.insert(0, "tier", np.int64(t))
        fr["sid"] = (fr["bucket"] * r_cum[t]) // step
        stacked.append(fr)
    all_rows = pd.concat(stacked, ignore_index=True)
    all_rows["grid_lo"] = np.int64(-1)
    all_rows["grid_hi"] = np.int64(-1)
    mdf["tier"] = np.int64(-1)
    for c in all_rows.columns:
        if c not in mdf.columns:
            mdf[c] = None
    both = pd.concat([all_rows, mdf[all_rows.columns]], ignore_index=True)

    ntiers = len(cfg.tier_widths)

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        sub, src, glo, ghi = _split_shard_marker(g, {"tier": "int64"})
        frames = {
            t: sub[sub["tier"] == t].drop(columns=["tier"]) for t in range(ntiers)
        }
        return _gapfill_encode_tiers(frames, src, glo, ghi, r_cum)

    def per_chunk(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [per_shard(g) for _, g in batch.groupby(["source", "sid"], sort=True)],
            ignore_index=True,
        )

    # The shard of every row is already known here (sid is a pure
    # function of bucket and tier), so a groupby SHUFFLE would be pure
    # overhead: build one block per task chunk directly (round-robin
    # over the (source, sid) groups for balance) and run a shuffle-free
    # map_batches. At key-spaces too large for the driver frame this
    # becomes a range-partitioned exchange on sid — same math, see
    # _downstream_fused_exchange.
    groups = [g for _, g in both.groupby(["source", "sid"], sort=True)]
    nchunks = max(1, min(len(groups), max(8, 2 * ncpu)))
    chunks = [
        pd.concat(groups[i::nchunks], ignore_index=True) for i in range(nchunks)
    ]
    # raw tasks + from_pandas_refs instead of from_pandas().map_batches:
    # the chunk list is already task-shaped (bounded by 2 x ncpu), so a
    # streaming-executor launch here is pure fixed cost (same argument
    # as rollup_scan._ref_tree_reduce); the returned Dataset wraps the
    # computed block refs and downstream consumers read them directly.
    chunk_task = ray.remote(per_chunk)
    return rd.from_pandas_refs([chunk_task.remote(c) for c in chunks])


def run_flagship(
    spec: TokenTableSpec,
    cfg: Optional[RollupConfig] = None,
    out_dir: Optional[str] = None,
    num_shards: int = 16,
    resume: bool = True,
    input_path: Optional[str] = None,
) -> dict:
    """Run the full pipeline; returns metrics (and writes checkpointed
    parquet when out_dir is given).

    input_path: read the token table from parquet (the production
    shape) instead of generating it inline — bench uses this so both
    scaling levels consume identical bytes."""
    cfg = cfg or RollupConfig()
    t0 = time.perf_counter()
    if input_path is not None:
        # fingerprint the ACTUAL input so checkpoint-resume cannot skip
        # shards computed from different data run under the same spec
        input_fp = _parquet_fingerprint(input_path)
    else:
        input_fp = f"synth:{spec.num_rows}:{spec.seed}:{spec.num_sources}:{spec.vocab}"
    shash = cfg.settings_hash()

    metrics: dict = {"tiers": {}, "skipped_shards": {}, "num_rows": spec.num_rows}
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    if input_path is not None:
        import ray.data as rd

        ds = rd.read_parquet(input_path)
    else:
        # ~1 block per CPU: big fragments vectorize the scan kernel best
        ds = token_table(spec, override_num_blocks=max(8, ncpu))

    skip: Dict[int, set] = {}
    if out_dir and resume:
        for t in range(len(cfg.tier_widths)):
            skip[t] = completed_shards(out_dir, t, shash, input_fp, num_shards=num_shards)
            metrics["skipped_shards"][t] = sorted(skip[t])
        done_all = set.intersection(*skip.values()) if skip else set()
        if done_all:
            # prune finished sources at the read: shard is a pure function
            # of source, so the filter pushes to the first map stage.
            def drop_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                # shard is a function of source: hash the batch's few
                # DISTINCT sources, then one vectorized is_in filter
                uniq = pc.unique(batch["source"]).to_pylist()
                bad = [s for s in uniq if source_shard(s, num_shards) in done_all]
                if not bad:
                    return batch
                keep = pc.invert(pc.is_in(batch["source"], value_set=pa.array(bad)))
                return batch.filter(keep)

            ds = ds.map_batches(drop_done, batch_format="pyarrow")

    if out_dir is None:
        # metrics path: tier 0 scan, then ONE fused per-source pass for
        # the rest (bit-identical rows, none of the per-tier round-trips)
        import time as _time

        timings: Dict[str, float] = {}
        t0s = _time.perf_counter()
        b = bucketize(ds, cfg.tier_widths[0], spec)
        from ..stages.rollup_scan import LAST_TIMINGS, scan_rollup_base_tier

        tier0 = scan_rollup_base_tier(b, cfg)
        timings.update({f"tier0_{k}": v for k, v in LAST_TIMINGS.items()})
        timings["tier0"] = round(_time.perf_counter() - t0s, 2)
        t0s = _time.perf_counter()
        fused = downstream_fused(tier0, cfg)

        def tier_counts(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.groupby("tier", as_index=False).size()

        parts = fused.map_batches(tier_counts, batch_format="pandas").to_pandas()
        rows_per_tier = parts.groupby("tier")["size"].sum()
        for t in range(len(cfg.tier_widths)):
            metrics["tiers"][t] = {"rows": int(rows_per_tier.get(t, 0))}
        timings["downstream_fused"] = round(_time.perf_counter() - t0s, 2)
        metrics["phase_timings"] = timings
        metrics["wall_time_s"] = time.perf_counter() - t0
        metrics["sequences_per_sec"] = spec.num_rows / metrics["wall_time_s"]
        metrics["settings_hash"] = shash
        metrics["input_fingerprint"] = input_fp
        return metrics

    tiers = build_tiers(ds, spec, cfg)
    metrics["phase_timings"] = tiers.pop("timings", {})
    from ..state.checkpoint import prune_invalid_shards

    for t in range(len(cfg.tier_widths)):
        pt0 = time.perf_counter()
        # drop shard dirs from other lineages/schemes BEFORE writing:
        # the recompute only overwrites ids its sources hash to, so a
        # stale-scheme leftover (e.g. post-compaction shard under the
        # old count) would otherwise hold duplicate rows at rest
        pruned = prune_invalid_shards(out_dir, t, shash, input_fp, num_shards)
        if pruned:
            metrics.setdefault("pruned_shards", {})[t] = pruned
        tier_ds = encode_tier(gap_fill_tier(tiers[t]))
        # checkpointed write: one task per shard, atomic rename + manifest
        def write_shard(g: pd.DataFrame, tier=t) -> pd.DataFrame:
            ws = time.perf_counter()
            shard = int(g["shard"].iloc[0])
            g = g.sort_values(["source", "bucket"], kind="mergesort").drop(columns=["shard"])
            table = pa.Table.from_pandas(g, preserve_index=False)
            m = write_shard_atomic(
                out_dir, tier, shard, table, shash, input_fp,
                time.perf_counter() - ws, num_shards=num_shards,
            )
            return pd.DataFrame({"shard": [shard], "rows": [m.num_rows]})

        def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
            batch["shard"] = [source_shard(s, num_shards) for s in batch["source"]]
            return batch

        written = (
            tier_ds.map_batches(add_shard, batch_format="pandas")
            .groupby("shard")
            .map_groups(write_shard, batch_format="pandas")
        )
        rows = written.to_pandas()
        metrics["tiers"][t] = {
            "rows": int(rows["rows"].sum()) if len(rows) else 0,
            "shards_written": len(rows),
        }
        metrics["phase_timings"][f"gapfill_encode_write_t{t}"] = round(
            time.perf_counter() - pt0, 2
        )
    metrics["wall_time_s"] = time.perf_counter() - t0
    metrics["sequences_per_sec"] = spec.num_rows / metrics["wall_time_s"]
    metrics["settings_hash"] = shash
    metrics["input_fingerprint"] = input_fp
    return metrics


# ---------------------------------------------------------------------------
# single-process oracle (same kernels, canonical order, no Ray)
# ---------------------------------------------------------------------------


def rollup_oracle(spec: TokenTableSpec, cfg: Optional[RollupConfig] = None) -> Dict[int, pd.DataFrame]:
    """Reference run for tier-equality tests: same kernels and ordering,
    plain pandas on the driver."""
    cfg = cfg or RollupConfig()
    table = token_table_arrow(spec)
    df = table.to_pandas()
    ids = np.array([int(d[1:]) for d in df["doc_id"]], dtype=np.int64)
    df["ts"] = derive_ts(ids, spec)
    df["bucket"] = df["ts"] // cfg.tier_widths[0]

    def apply_groups(frame: pd.DataFrame, keys, fn) -> pd.DataFrame:
        out = [fn(g) for _, g in frame.groupby(keys, sort=True)]
        return pd.concat(out, ignore_index=True)

    from ..stages.rollup import promote_frame

    tiers: Dict[int, pd.DataFrame] = {}
    tiers[0] = apply_groups(df, ["source", "bucket"], lambda g: _rollup_group_base(g, cfg))
    for t in range(1, len(cfg.tier_widths)):
        ratio = cfg.tier_widths[t] // cfg.tier_widths[t - 1]
        # same per-source promotion function as the pipeline (bit-equal:
        # the co-batched DP accumulation order is fixed per source)
        parts = [
            promote_frame(g, ratio, cfg)
            for _, g in tiers[t - 1].groupby("source", sort=True)
        ]
        tiers[t] = pd.concat(parts, ignore_index=True)
    # gap-fill (same semantics as stages.rollup.gap_fill_tier)
    for t in tiers:
        filled = []
        for _, g in tiers[t].groupby("source", sort=True):
            g = g.sort_values("bucket", kind="mergesort")
            lo, hi = int(g["bucket"].min()), int(g["bucket"].max())
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            missing = np.setdiff1d(grid, g["bucket"].to_numpy())
            if len(missing):
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
                g = pd.concat([g, fill_df], ignore_index=True)
            filled.append(g.sort_values("bucket", kind="mergesort"))
        tiers[t] = pd.concat(filled, ignore_index=True)
    return tiers
