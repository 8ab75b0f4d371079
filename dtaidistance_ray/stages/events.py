"""Event-stream rollup operators over the TPC-H-ish ``events`` table.

These exercise the same rollup engine shapes (time bucketing, grouped
continuous aggregates, gap-fill, tier promotion, sessionization) on a
real timestamped table, so every one of them has a DuckDB SQL oracle.

Exactness strategy: ``value`` is 2-decimal data, so all sums are
computed as scaled int64 cents (exact under any partitioning /
summation order) and divided back to doubles at the end; the oracle SQL
uses the identical formulation, so value-hashes match bit-for-bit with
no rounding tolerance games.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def read_events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _add_hour(batch: pa.Table) -> pa.Table:
    return batch.append_column("bucket", pc.floor_temporal(batch["ts"], unit="hour"))


def _cents(values) -> np.ndarray:
    """Exact integer cents for a float value column. This rounding is
    the repo's bit-exactness contract with the DuckDB oracles (int cent
    sums are associative under any partitioning; float sums are not) —
    every partial that sums values must go through THIS helper so a
    convention change cannot diverge between stages."""
    return np.round(np.asarray(values) * 100).astype(np.int64)


def _fold_frames(keys, spec, *frames):
    """Merge partial-aggregate frames: concat + one pandas groupby.
    Exact for sum/min/max under any partitioning and fold order (int
    cent sums are associative, min/max idempotent-commutative)."""
    frames = [f for f in frames if f is not None and len(f)]
    if not frames:
        return pd.DataFrame(columns=list(keys) + list(spec))
    df = pd.concat(frames, ignore_index=True)
    return df.groupby(list(keys), as_index=False, sort=False).agg(spec)


def merge_partials(parts, keys, spec, fan_in=32, max_driver_rows=2_000_000):
    """Size-aware partial-merge physical plan for BOUNDED key-spaces
    (hour/day grids, nations, deciles, shard counters): merge the tiny
    per-block partial frames with a fan-in TREE of Ray tasks instead of
    a Dataset hash groupby-aggregate — the hash path pays a full
    all-to-all exchange (~1-3 s fixed on this host, measured in the
    round-3 gate) to merge a table of a few thousand rows. Here the
    pipeline stays map-only: ``to_pandas_refs()`` leaves each partial
    block in the object store, groups of ``fan_in`` refs fold in remote
    tasks (log depth — at 100k blocks that is 4 levels), and the driver
    folds only the final <= fan_in partials, so it holds at most
    fan_in x key-space rows at any moment.

    UNBOUNDED keys (users, tokens, pairs) must keep
    ``Dataset.groupby().aggregate()``; the max_driver_rows guard makes a
    mis-tagged caller fail loudly instead of OOMing the driver at scale.

    ``spec`` maps existing partial column -> "sum" | "min" | "max"
    (partials already carry their output names, so refolds compose)."""
    import ray

    refs = parts.to_pandas_refs()
    if len(refs) > fan_in:
        fold = ray.remote(_fold_frames)
        while len(refs) > fan_in:
            refs = [
                fold.remote(keys, spec, *refs[i : i + fan_in])
                for i in range(0, len(refs), fan_in)
            ]
    out = _fold_frames(keys, spec, *ray.get(list(refs)))
    if len(out) > max_driver_rows:
        raise ValueError(
            f"merge_partials: {len(out)} merged rows exceeds max_driver_rows="
            f"{max_driver_rows}; this key-space is not bounded - use "
            "Dataset.groupby().aggregate() for it"
        )
    return out


MAX_DRIVER_GRID_ROWS = 2_000_000


def _guard_driver_rows(n: int, label: str, max_rows: int | None = None) -> None:
    """Loud-fail guard for every driver-frame assembly (same contract
    as merge_partials.max_driver_rows): the paths that assemble a
    bounded (type x hour/day) grid on the driver must raise — not
    silently serialize — when a corpus with an unbounded key-space is
    mis-routed onto them."""
    limit = MAX_DRIVER_GRID_ROWS if max_rows is None else max_rows
    if n > limit:
        raise ValueError(
            f"{label}: {n} driver rows exceeds max {limit}; this key-space "
            "is not bounded - use the distributed (groupby/exchange) plan"
        )


def _per_type(grid: pd.DataFrame, fn) -> pd.DataFrame:
    """Apply ``fn`` per event_type over a BOUNDED (type x hour/day) grid
    frame (the merged output of the distributed rollup). The sequential
    scans these feed (EWMA, Holt, CUSUM, rolling windows) are inherently
    per-type ordered recurrences over rows = #types x #span — key-space
    bounded, so a shuffle to co-partition them is pure overhead; the
    heavy lifting (raw events -> grid) already ran distributed."""
    _guard_driver_rows(len(grid), "_per_type")
    parts = [fn(g) for _, g in grid.groupby("event_type", sort=False)]
    if not parts:
        return grid.iloc[0:0]
    return pd.concat(parts, ignore_index=True)


def _pre_topk_take(b: pa.Table, order_cols, k: int) -> pa.Table:
    """Per-batch pre-top-k: keep a block's top-k rows under the given
    ``[(column, descending), ...]`` order so only k rows per block reach
    the global sort. One np.lexsort with the PRIMARY key last (lexsort
    convention); descending columns are sign-negated, which is the
    subtle part every hand-rolled copy risks getting wrong — numeric
    (int/float) columns only."""
    keys = tuple(
        (-v if desc else v)
        for col, desc in reversed(order_cols)
        for v in (b[col].to_numpy(zero_copy_only=False),)
    )
    return b.take(pa.array(np.lexsort(keys)[:k]))


def _grouped_reduceat(key: np.ndarray):
    """Sort-based group boundaries for exact reduceat folds: returns
    (order, starts, uniq_positions) so callers can reduce any column
    with np.<op>.reduceat(col[order], starts) — int64 sums stay int64
    (np.bincount's float64 weights path would round above 2^53)."""
    order = np.argsort(key, kind="stable")
    sk = key[order]
    if not len(sk):  # empty batch: every downstream reduceat/take no-ops
        return order, np.array([], dtype=np.int64), sk
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    return order, starts, sk[starts]


def _arrow_grouped(b: pa.Table, key_cols, within=None):
    """Composite grouping for an Arrow batch with NO pandas
    conversion: string keys via dictionary CODES (Python strings are
    never materialized), numeric/temporal keys via np.unique
    factorization, mixed-radix composition into one int64 key, one
    stable sort. Returns (order, starts, key_arrays): feed any value
    column through ``np.<op>.reduceat(col[order], starts)`` for exact
    per-group folds; ``key_arrays`` maps each key column to its
    per-group values (Arrow array for strings, numpy otherwise),
    ready for ``pa.table``. Generalizes _hourly_partial_arrow — the
    combiner template every numeric partial stage shares."""
    factors = []
    for c in key_cols:
        col = b[c].combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) or pa.types.is_dictionary(col.type):
            enc = col if pa.types.is_dictionary(col.type) else pc.dictionary_encode(col)
            factors.append((enc.indices.to_numpy().astype(np.int64), enc.dictionary, True))
        else:
            v = col.to_numpy(zero_copy_only=False)
            u, inv = np.unique(v, return_inverse=True)
            factors.append((inv.reshape(-1).astype(np.int64), u, False))
    key = factors[0][0]
    for codes, u, _ in factors[1:]:
        key = key * max(len(u), 1) + codes
    if within is None:
        order, starts, uk = _grouped_reduceat(key)
    else:
        # rows ordered by (key, *within) — argmin/argmax-style partials
        # (open/close candidates) read group boundaries as first/last
        order = np.lexsort(tuple(reversed(within)) + (key,))
        sk = key[order]
        if len(sk):
            starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
            uk = sk[starts]
        else:
            starts = np.array([], dtype=np.int64)
            uk = sk
    idxs = {}
    rem = uk
    for c, (_, u, _arrow) in list(zip(key_cols, factors))[:0:-1]:
        n = max(len(u), 1)
        idxs[c] = rem % n
        rem = rem // n
    idxs[key_cols[0]] = rem
    key_arrays = {}
    for c, (_, u, is_arrow) in zip(key_cols, factors):
        key_arrays[c] = u.take(pa.array(idxs[c])) if is_arrow else u[idxs[c]]
    return order, starts, key_arrays


def _group_sizes(order: np.ndarray, starts: np.ndarray) -> np.ndarray:
    return np.diff(np.r_[starts, len(order)]).astype(np.int64)


def _session_breaks(uid: np.ndarray, ts: np.ndarray, gap_s: int):
    """Session-boundary rule shared by sessionize / session_intervals
    (and mirrored by the SQL oracles' lag() window): rows sorted by
    (user_id, ts); a session starts at each user's first row or when
    the gap to the previous event exceeds gap_s. Returns (new_user,
    new_sess) boolean arrays. One definition — the two ops (and their
    oracles) must never drift apart on this invariant."""
    gaps = np.empty(len(uid))
    if len(uid):
        gaps[0] = np.inf
        gaps[1:] = (ts[1:] - ts[:-1]) / np.timedelta64(1, "s")
    new_user = np.empty(len(uid), dtype=bool)
    if len(uid):
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
    return new_user, new_user | (gaps > gap_s)


def _bucket_mod(col: str, n: int, name: str = "user_bucket"):
    """Arrow-in/out pre-shuffle bucketing stage: name = col % n.
    Keeping the block Arrow means the groupby exchange moves Arrow
    buffers, not pickled pandas frames."""

    def add(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.int64) % n
        return b.append_column(name, pa.array(v, type=pa.int64()))

    return add


def _bucket_div(col: str, width: int, name: str = "shard", offset: int = 0):
    """Arrow-in/out range-shard stage: name = (col - offset) // width."""

    def add(b: pa.Table) -> pa.Table:
        v = (b[col].to_numpy(zero_copy_only=False).astype(np.int64) - offset) // width
        return b.append_column(name, pa.array(v, type=pa.int64()))

    return add


def _hourly_partial_arrow(b: pa.Table) -> pa.Table:
    """Arrow-native combiner for the hourly rollup: zero-copy numpy
    views of the three pruned columns, event_type grouped via its
    DICTIONARY CODES (never materializing Python strings — the whole
    point of skipping the pandas conversion), one stable sort + exact
    reduceat folds per batch."""
    et = pc.dictionary_encode(b["event_type"]).combine_chunks()
    codes = et.indices.to_numpy().astype(np.int64)
    names = et.dictionary
    buck = b["bucket"].combine_chunks().to_numpy()  # datetime64, zero-copy
    val = b["value"].to_numpy(zero_copy_only=False)
    cents = _cents(val)
    ub, binv = np.unique(buck, return_inverse=True)
    key = codes * len(ub) + binv
    order, starts, uk = _grouped_reduceat(key)
    return pa.table(
        {
            "event_type": names.take(pa.array(uk // len(ub))),
            "bucket": pa.array(ub[uk % len(ub)]),
            "n_events": np.diff(np.r_[starts, len(key)]).astype(np.int64),
            "cents": np.add.reduceat(cents[order], starts),
            "value_min": np.minimum.reduceat(val[order], starts),
            "value_max": np.maximum.reduceat(val[order], starts),
        }
    )


def _hourly_partials_df(sf_dir: str) -> pd.DataFrame:
    """Combiner pattern: per-batch partial aggregates inside map_batches
    (#groups x #blocks tiny partial rows), merged by the size-aware
    fan-in tree (merge_partials) — the (event_type, hour) key-space is
    BOUNDED, so a hash groupby's all-to-all exchange is the wrong
    physical plan at both test and 100-TB scale (round-3 review #1).
    Exact (integer cent sums, min/max) under any partitioning; the
    driver holds at most fan_in x key-space rows."""
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])
    parts = ds.map_batches(_add_hour, batch_format="pyarrow").map_batches(
        _hourly_partial_arrow, batch_format="pyarrow"
    )
    return merge_partials(
        parts,
        ["event_type", "bucket"],
        {"n_events": "sum", "cents": "sum", "value_min": "min", "value_max": "max"},
    )


def rollup_hourly(sf_dir: str):
    """count/sum/min/max/mean of value per (event_type, hour)."""
    out = _hourly_partials_df(sf_dir)
    out["n_events"] = out["n_events"].astype("int64")
    out["value_sum"] = out["cents"] / 100.0
    out["value_mean"] = out["cents"] / 100.0 / out["n_events"]
    return out[
        ["event_type", "bucket", "n_events", "value_sum", "value_min", "value_max", "value_mean"]
    ]


ROLLUP_HOURLY_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum,
       min(value) AS value_min,
       max(value) AS value_max,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 / count(*) AS value_mean
FROM events GROUP BY 1, 2
"""


def rollup_daily_from_hourly(sf_dir: str):
    """Tier promotion: hourly partials -> daily aggregates (sums of
    sums, min of mins) — the continuous-aggregate pattern."""
    hourly = _hourly_partials_df(sf_dir)
    hourly["day"] = hourly["bucket"].dt.floor("D")
    out = hourly.groupby(["event_type", "day"], as_index=False).agg(
        n_events=("n_events", "sum"),
        cents=("cents", "sum"),
        value_min=("value_min", "min"),
        value_max=("value_max", "max"),
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["value_sum"] = out["cents"] / 100.0
    return out[["event_type", "day", "n_events", "value_sum", "value_min", "value_max"]]


ROLLUP_DAILY_SQL = """
SELECT event_type,
       date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum,
       min(value) AS value_min,
       max(value) AS value_max
FROM events GROUP BY 1, 2
"""


def _dense_hourly_frame(g: pd.DataFrame, value_col: str) -> pd.DataFrame:
    """Dense per-type hourly grid over the type's [min, max] span with
    ``value_col`` left-joined (NaN where the hour is missing) — the
    shared scaffold of every gap-fill mode (zero/lerp/LOCF)."""
    g = g.sort_values("bucket")
    grid = pd.date_range(g["bucket"].min(), g["bucket"].max(), freq="1h")
    out = pd.DataFrame({"bucket": grid})
    out["event_type"] = g["event_type"].iloc[0]
    return out.merge(g[["bucket", value_col]], on="bucket", how="left")


def rollup_hourly_gapfill(sf_dir: str):
    """Hourly counts per event_type with missing hours filled
    (n_events = 0) over each type's [min, max] hour range.

    Physical plan: per-batch partial counts (combiner) merged by the
    bounded-key fan-in tree — no all-to-all; the (type, hour) grid and
    the gap-fill itself are key-space-sized, so the fill runs on the
    driver frame directly."""
    ds = read_events(sf_dir, columns=["ts", "event_type"])
    ds = ds.map_batches(_add_hour, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        # Arrow-native count combiner (dictionary codes, no strings)
        et = pc.dictionary_encode(b["event_type"]).combine_chunks()
        codes = et.indices.to_numpy().astype(np.int64)
        buck = b["bucket"].combine_chunks().to_numpy()
        ub, binv = np.unique(buck, return_inverse=True)
        key = codes * len(ub) + binv
        _, starts, uk = _grouped_reduceat(key)
        return pa.table(
            {
                "event_type": et.dictionary.take(pa.array(uk // len(ub))),
                "bucket": pa.array(ub[uk % len(ub)]),
                "n_events": np.diff(np.r_[starts, len(key)]).astype(np.int64),
            }
        )

    hourly = merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "bucket"],
        {"n_events": "sum"},
    )

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        out = _dense_hourly_frame(g, "n_events")
        out["n_events"] = out["n_events"].fillna(0).astype("int64")
        return out[["event_type", "bucket", "n_events"]]

    if hourly.empty:
        # deliberate loud failure for an empty corpus (the object-dtype
        # empty frame would otherwise die in the .dt accessor below with
        # a misleading dtype error — round-5 review finding)
        raise ValueError("rollup_hourly_gapfill: no hourly rows to gap-fill")
    # merge_partials guards the SPARSE frame; densifying to each type's
    # full [min, max] hour span can multiply rows, so guard the DENSE
    # size (computable from the bounds) before building it. One grouper,
    # reused by the guard agg and the fill loop (the frame can be up to
    # MAX_DRIVER_GRID_ROWS — don't factorize event_type twice).
    gb = hourly.groupby("event_type")
    spans = gb["bucket"].agg(["min", "max"])
    dense_rows = int(
        ((spans["max"] - spans["min"]).dt.total_seconds() // 3600 + 1).sum()
    )
    _guard_driver_rows(dense_rows, "rollup_hourly_gapfill dense grid")
    return pd.concat([fill(g) for _, g in gb], ignore_index=True)


ROLLUP_GAPFILL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
)
SELECT g.event_type, g.bucket,
       CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events
FROM grid g LEFT JOIN hourly h
  ON g.event_type = h.event_type AND g.bucket = h.bucket
"""


def sessionize(sf_dir: str, gap_s: int = 1800, n_buckets: int = 64):
    """Session stats per user: a new session starts when the gap to the
    previous event exceeds gap_s.

    Scale shape: users are an UNBOUNDED key, and per-user map_groups
    pays ~4.5 ms of Ray machinery per group — a Python-call count that
    grows with the data. Instead, users hash into ``n_buckets`` coarse
    partitions (bounded group count; the shuffle co-locates each user's
    events because bucket is a function of user) and the per-bucket
    function is fully VECTORIZED: one sort by (user, ts), one diff, a
    boolean new-session mask (user boundary | gap), one C-level pandas
    groupby-agg. Results are identical to the per-user formulation."""
    ds = read_events(sf_dir, columns=["ts", "user_id", "value"])

    def sess_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy()
        _, new_sess = _session_breaks(uid, ts, gap_s)
        g = g.assign(
            _new_sess=new_sess.astype(np.int64),
            _cents=_cents(g["value"].to_numpy()),
        )
        out = g.groupby("user_id", as_index=False, sort=True).agg(
            n_sessions=("_new_sess", "sum"),
            n_events=("_new_sess", "size"),
            _cents=("_cents", "sum"),
        )
        out["user_id"] = out["user_id"].astype("int64")
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["value_sum"] = out["_cents"] / 100.0
        return out[["user_id", "n_sessions", "n_events", "value_sum"]]

    return (
        ds.map_batches(_bucket_mod("user_id", n_buckets), batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(sess_bucket, batch_format="pandas")
    )


SESSIONIZE_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               OR epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id,
       CAST(sum(new_sess) AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum
FROM ordered GROUP BY user_id
"""


def top_users_by_value(sf_dir: str, k: int = 20):
    """Fully distributed top-k over an UNBOUNDED key (user): per-batch
    partial cents sums (combiner) -> Ray groupby-aggregate (the
    shuffle; exact int64 cents under any partitioning) -> per-block
    pre-top-k (k rows per block survive) -> global sort.limit(k).
    The driver never holds a per-user table — the round-2 review's
    driver-merge of per-user partials is gone."""
    from ray.data.aggregate import Sum

    ds = read_events(sf_dir, columns=["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        order, starts, keys = _arrow_grouped(b, ["user_id"])
        cents = _cents(b["value"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "user_id": keys["user_id"].astype(np.int64),
                "cents": np.add.reduceat(cents[order], starts).astype(np.int64),
                "n_events": _group_sizes(order, starts),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n_events", alias_name="n_events"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "value_sum": pc.divide(pc.cast(b["cents"], pa.float64()), 100.0),
                "n_events": pc.cast(b["n_events"], pa.int64()),
            }
        )

    def pre_topk(b: pa.Table) -> pa.Table:
        return _pre_topk_take(b, [("value_sum", True), ("user_id", False)], k)

    scored = agg.map_batches(finish, batch_format="pyarrow")
    survivors = scored.map_batches(pre_topk, batch_format="pyarrow")
    return survivors.sort(["value_sum", "user_id"], descending=[True, False]).limit(k)


TOP_USERS_SQL = """
SELECT user_id,
       sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id
ORDER BY value_sum DESC, user_id LIMIT 20
"""


def rolling_hourly_avg(sf_dir: str, window_h: int = 24):
    """Sliding-window aggregate: per event_type, the trailing
    ``window_h``-hour moving average of hourly event counts over the
    gap-filled hour grid (windows shorter than window_h at the head
    average what exists — SQL ROWS BETWEEN semantics).

    Scale shape: the heavy reduction (raw events -> hourly counts) is
    the distributed rollup; the window pass then runs per event_type
    over the BOUNDED hourly grid (rows = #types x #hours, independent
    of event count) as a vectorized pandas rolling() inside map_groups.
    At key-spaces where even the grid is large, the window is a
    range-partitioned prefix-sum with halo rows — the operator contract
    (sorted grid in, same-length window column out) is unchanged."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        avg = g["n_events"].rolling(window=window_h, min_periods=1).mean()
        out = g[["event_type", "bucket", "n_events"]].copy()
        out["avg_24h"] = np.round(avg.to_numpy(), 6)
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return _per_type(hourly, roll)


ROLLING_HOURLY_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket,
         CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket = h.bucket
)
SELECT event_type, bucket, n_events,
       ROUND(AVG(CAST(n_events AS DOUBLE)) OVER (
         PARTITION BY event_type ORDER BY bucket
         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW), 6) AS avg_24h
FROM filled
"""


def events_asof_hourly_baseline(sf_dir: str, n_buckets: int = 64):
    """As-of join: each event joined to the LATEST COMPLETED hourly
    rollup row of its event_type strictly before the event's hour
    (the 'how is this event doing vs the last known baseline' shape).
    Emits per event the baseline hour and its count; events in their
    type's first hour have no baseline and are dropped (ASOF inner).

    Scale shape: the small side (hourly rollup — bounded by the
    key-space) is BROADCAST via ray.put and merged per batch with
    pandas merge_asof (vectorized binary search per batch; no shuffle
    of the big side at all). A two-big-sides as-of would instead
    range-co-partition on (type, time) with halo rows — same contract.
    """
    import ray

    hourly = _hourly_partials_df(sf_dir)[["event_type", "bucket", "n_events"]]
    hourly = hourly.sort_values("bucket", kind="mergesort").reset_index(drop=True)
    hourly["bucket"] = hourly["bucket"].astype("datetime64[ns]")
    hourly["n_events"] = hourly["n_events"].astype("int64")
    href = ray.put(hourly)

    class AsofJoiner:
        def __init__(self):
            self.hourly = ray.get(href)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b = batch[["event_id", "ts", "event_type"]].copy()
            # strictly-before semantics: compare against the event's own
            # hour, exclusive -> allow_exact_matches=False on the hour
            # (unify timestamp resolution: parquet us vs pandas ns)
            b["hour"] = b["ts"].dt.floor("h").astype("datetime64[ns]")
            b = b.sort_values("hour", kind="mergesort")
            m = pd.merge_asof(
                b,
                self.hourly.rename(
                    columns={"bucket": "baseline_hour", "n_events": "baseline_events"}
                ),
                left_on="hour",
                right_on="baseline_hour",
                by="event_type",
                allow_exact_matches=False,
            )
            m = m.dropna(subset=["baseline_events"])
            out = pd.DataFrame(
                {
                    "event_id": m["event_id"].astype("int64"),
                    "event_type": m["event_type"],
                    "ts": m["ts"],
                    "baseline_hour": m["baseline_hour"],
                    "baseline_events": m["baseline_events"].astype("int64"),
                }
            )
            return out

    # value is never used by the join or the output — keep it out of
    # the big-side projection (parquet decode + convert + copy per batch)
    ds = read_events(sf_dir, columns=["event_id", "ts", "event_type"])
    from .pool import auto_pool

    return ds.map_batches(AsofJoiner, batch_format="pandas", concurrency=auto_pool())


EVENTS_ASOF_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT e.event_id, e.event_type, e.ts,
       h.bucket AS baseline_hour,
       h.n_events AS baseline_events
FROM events e ASOF JOIN hourly h
  ON e.event_type = h.event_type AND date_trunc('hour', e.ts) > h.bucket
"""


def session_intervals(sf_dir: str, gap_s: int = 1800, n_buckets: int = 64):
    """Session INTERVALS per user: (user_id, session_id, session_start,
    session_end, n_events) — same bucketed, fully vectorized session
    detection as sessionize, but emitting one row per session with its
    time bounds (the right side of the range join below)."""
    ds = read_events(sf_dir, columns=["ts", "user_id"])


    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy()
        new_user, new_sess = _session_breaks(uid, ts, gap_s)
        # session ordinal within user: cumulative new-session count per
        # user (vectorized: global cumsum minus the user's offset)
        global_sid = np.cumsum(new_sess)
        user_start = np.flatnonzero(new_user)
        run_lens = np.diff(np.append(user_start, len(g)))
        first_of_user = np.repeat(global_sid[user_start] - 1, run_lens)
        sid = (global_sid - first_of_user).astype(np.int64)
        f = pd.DataFrame({"user_id": uid, "session_id": sid, "ts": g["ts"].to_numpy()})
        out = f.groupby(["user_id", "session_id"], as_index=False, sort=True).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (
        ds.map_batches(_bucket_mod("user_id", n_buckets), batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(intervals, batch_format="pandas")
    )


def events_in_sessions(sf_dir: str, gap_s: int = 1800):
    """RANGE JOIN: each event matched to the session interval of its
    user that contains its timestamp — equi-join on the user key
    (Ray's partitioned hash ``Dataset.join``; both sides co-partition,
    nothing driver-side) followed by a vectorized interval filter
    (``session_start <= ts <= session_end``). The per-user fan-out is
    each user's session count, so the intermediate stays linear-ish;
    with huge per-key interval counts the filter would move into an
    in-group merge_asof on session_start — same contract."""
    import ray

    ds = read_events(sf_dir, columns=["event_id", "ts", "user_id"])
    sess = session_intervals(sf_dir, gap_s)
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    joined = ds.join(
        sess,
        join_type="inner",
        num_partitions=max(2, min(32, ncpu)),
        on=("user_id",),
    )

    def in_range(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less_equal(b["session_start"], b["ts"]),
            pc.less_equal(b["ts"], b["session_end"]),
        )
        out = b.filter(keep)
        return pa.table(
            {
                "event_id": pc.cast(out["event_id"], pa.int64()),
                "user_id": pc.cast(out["user_id"], pa.int64()),
                "session_id": pc.cast(out["session_id"], pa.int64()),
                "session_start": out["session_start"],
                "session_end": out["session_end"],
            }
        )

    return joined.map_batches(in_range, batch_format="pyarrow")


EVENTS_IN_SESSIONS_SQL = """
WITH ordered AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch(ts - lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT event_id, user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
), sessions AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         min(ts) AS session_start, max(ts) AS session_end
  FROM numbered GROUP BY user_id, session_id
)
SELECT e.event_id, e.user_id, s.session_id, s.session_start, s.session_end
FROM events e JOIN sessions s
  ON e.user_id = s.user_id
 AND e.ts BETWEEN s.session_start AND s.session_end
"""


SESSION_INTERVALS_SQL = """
WITH ordered AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch(ts - lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM ordered
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM numbered GROUP BY user_id, session_id
"""


def top_users_per_type(sf_dir: str, k: int = 3):
    """Windowed rank / top-k PER GROUP: the k users with the highest
    exact cents sum within each event_type (ties broken by user_id).

    Scale shape: per-batch (type, user) partial sums (combiner) -> Ray
    groupby-aggregate on the composite key (exact int64 cents; the
    per-(type, user) key is unbounded but never driver-held) -> a
    bounded per-TYPE map_groups takes each type's top k (group count =
    #types; inside is one vectorized sort/head)."""
    from ray.data.aggregate import Sum

    ds = read_events(sf_dir, columns=["event_type", "user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        order, starts, keys = _arrow_grouped(b, ["event_type", "user_id"])
        cents = _cents(b["value"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "event_type": keys["event_type"],
                "user_id": keys["user_id"].astype(np.int64),
                "cents": np.add.reduceat(cents[order], starts).astype(np.int64),
                "n_events": _group_sizes(order, starts),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "user_id"])
        .aggregate(Sum("cents", alias_name="cents"), Sum("n_events", alias_name="n_events"))
    )

    def pre_topk(df: pd.DataFrame) -> pd.DataFrame:
        # post-aggregate rows are unique per (type, user), so a per-BLOCK
        # top-k per type is a safe superset of the global top-k — without
        # it the final per-type group holds O(users) rows in one task
        # (the unbounded-key pathology this module bans elsewhere)
        df = df.sort_values(
            ["event_type", "cents", "user_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("event_type", sort=False).head(k)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "user_id"], ascending=[False, True], kind="mergesort").head(k)
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "user_id": g["user_id"].astype("int64"),
                "value_sum": g["cents"] / 100.0,
                "n_events": g["n_events"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )
        return out

    survivors = agg.map_batches(pre_topk, batch_format="pandas")
    return survivors.groupby("event_type").map_groups(topk, batch_format="pandas")


TOP_USERS_PER_TYPE_SQL = """
WITH sums AS (
  SELECT event_type, user_id,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, user_id
), ranked AS (
  SELECT event_type, user_id, cents, n_events,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents DESC, user_id) AS rank
  FROM sums
)
SELECT event_type, user_id, cents / 100.0 AS value_sum, n_events,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


def hourly_anomalies(sf_dir: str, window_h: int = 24, min_prior: int = 8, z_thr: float = 3.0):
    """Rolling z-score anomaly detection on the gap-filled hourly
    series: per event_type, each hour's count is scored against the
    mean/sample-std of the PRECEDING ``window_h`` hours (current hour
    excluded — the classic self-exclusion that keeps a spike from
    masking itself). Hours with fewer than ``min_prior`` prior hours
    are unscored (dropped) so the output is NaN-free.

    Scale shape: identical to rolling_hourly_avg — the raw-events
    reduction is the distributed rollup; the window pass runs over the
    BOUNDED (type x hour) grid. z is rounded at 6 on both engines and
    the flag is derived from the ROUNDED z, so the threshold decision
    is bit-deterministic."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        x = g["n_events"].astype("float64")
        prior = x.shift(1)
        # window moments from EXACT integer sums (counts < 2^26, so S1,
        # S2 and S1*S1 are exact in float64) with the variance expanded
        # in the same operation order as the SQL oracle — z is then
        # bit-equal across engines, unlike pandas' sliding rolling.std
        # vs DuckDB's stddev_samp (different algorithms, ulp drift)
        cnt = prior.rolling(window=window_h, min_periods=min_prior).count()
        s1 = prior.rolling(window=window_h, min_periods=min_prior).sum()
        s2 = (prior * prior).rolling(window=window_h, min_periods=min_prior).sum()
        mean = s1 / cnt
        var = (s2 - (s1 * s1) / cnt) / (cnt - 1)
        ok = cnt.notna() & (cnt >= min_prior) & (var > 0)
        out = g.loc[ok, ["event_type", "bucket", "n_events"]].copy()
        z = ((x - mean) / np.sqrt(var))[ok]
        out["z"] = np.round(z.to_numpy(), 6)
        out["is_anomaly"] = (np.abs(out["z"].to_numpy()) > z_thr).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return _per_type(hourly, score)


HOURLY_ANOMALIES_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket,
         CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket = h.bucket
), scored AS (
  SELECT event_type, bucket, n_events,
         CAST(sum(n_events) OVER w AS DOUBLE) AS s1,
         CAST(sum(n_events * n_events) OVER w AS DOUBLE) AS s2,
         CAST(count(*) OVER w AS DOUBLE) AS cnt
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
), zval AS (
  -- variance expanded from exact integer window sums, SAME operation
  -- order as the engine: (s2 - (s1*s1)/cnt) / (cnt-1)
  SELECT event_type, bucket, n_events, cnt,
         (s2 - (s1 * s1) / cnt) / (cnt - 1) AS var,
         (n_events - s1 / cnt) AS dev
  FROM scored
)
SELECT event_type, bucket, n_events,
       round(dev / sqrt(var), 6) AS z,
       CAST(abs(round(dev / sqrt(var), 6)) > 3.0 AS BIGINT) AS is_anomaly
FROM zval
WHERE cnt >= 8 AND var > 0
"""


def ohlc_hourly(sf_dir: str):
    """OHLC tumbling-window downsample per (event_type, hour): open =
    value of the earliest event (ties broken by event_id), close = the
    latest, plus high/low/count — the classic financial continuous
    aggregate.

    Scale shape: open/close are NOT plain min/max but they ARE
    associative once each partial carries its arg keys — every block
    emits one candidate row per touched (type, hour) with the block's
    own (open_ts, open_id, open), (close_ts, close_id, close), high,
    low, n; the merge picks the lexicographically smallest/largest
    (ts, id) pair among candidates. Partial rows ~ groups x blocks
    (key-space bounded). The merge shuffles partials into n_buckets
    hash buckets of (type, hour) — NOT one Ray group per (type, hour),
    which would pay per-group Python-call overhead growing with the
    time span — and each bucket merges all its groups vectorized
    (sort + drop_duplicates, the same kernel as the partial). Values
    pass through untouched (no arithmetic), so the oracle match is
    trivially bit-exact."""
    ds = read_events(sf_dir, columns=["ts", "event_type", "event_id", "value"])
    ds = ds.map_batches(_add_hour, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks().to_numpy()
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        val = b["value"].to_numpy(zero_copy_only=False)
        # within=(ts, event_id): each group's first/last sorted row IS
        # the block's open/close candidate (argmin/argmax by (ts, id))
        order, starts, keys = _arrow_grouped(
            b, ["event_type", "bucket"], within=(ts.view("i8"), eid)
        )
        ends = (np.r_[starts[1:], len(order)] - 1) if len(starts) else starts
        fi, li = order[starts], order[ends]
        sval = val[order]
        return pa.table(
            {
                "event_type": keys["event_type"],
                "bucket": pa.array(keys["bucket"]),
                "high": np.maximum.reduceat(sval, starts) if len(starts) else sval[:0],
                "low": np.minimum.reduceat(sval, starts) if len(starts) else sval[:0],
                "n_events": _group_sizes(order, starts),
                "open_ts": pa.array(ts[fi]),
                "open_id": eid[fi],
                "open": val[fi],
                "close_ts": pa.array(ts[li]),
                "close_id": eid[li],
                "close": val[li],
            }
        )

    def add_merge_bucket(b: pa.Table) -> pa.Table:
        # content-based hash (block-local dictionary codes are NOT
        # consistent across blocks): crc32 per unique type string,
        # golden-ratio mix with the hour int64
        et = pc.dictionary_encode(b["event_type"].combine_chunks())
        codes = et.indices.to_numpy().astype(np.int64)
        h = np.array(
            [zlib.crc32(s.encode()) for s in et.dictionary.to_pylist()], dtype=np.uint64
        )
        buck = b["bucket"].combine_chunks().to_numpy().view("i8").astype(np.uint64)
        mix = h[codes] * np.uint64(0x9E3779B97F4A7C15) ^ buck * np.uint64(0xC2B2AE3D27D4EB4F)
        return b.append_column("merge_bucket", pa.array((mix % 64).astype(np.int64)))

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["event_type", "bucket"]
        g = g.sort_values(["open_ts", "open_id"], kind="mergesort")
        opens = g.drop_duplicates(keys, keep="first")[keys + ["open"]]
        g = g.sort_values(["close_ts", "close_id"], kind="mergesort")
        closes = g.drop_duplicates(keys, keep="last")[keys + ["close"]]
        aggs = g.groupby(keys, as_index=False).agg(
            high=("high", "max"), low=("low", "min"), n_events=("n_events", "sum")
        )
        out = aggs.merge(opens, on=keys).merge(closes, on=keys)
        out["n_events"] = out["n_events"].astype("int64")
        return out[keys + ["open", "high", "low", "close", "n_events"]]

    parts = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        add_merge_bucket, batch_format="pyarrow"
    )
    return parts.groupby("merge_bucket").map_groups(merge_bucket, batch_format="pandas")


OHLC_HOURLY_SQL = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, value,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_open,
         row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_close
  FROM events
)
SELECT event_type, bucket,
       max(CASE WHEN rn_open = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_close = 1 THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_events
FROM ranked GROUP BY 1, 2
"""


def counter_increase(sf_dir: str, n_buckets: int = 64):
    """PromQL-style increase() with counter-reset handling: per user,
    events ordered by (ts, event_id); each step contributes
    (v[i] - v[i-1]) when the counter moved forward, else v[i] (the
    post-reset level — the monitoring-systems convention). Exact int64
    cents arithmetic so the per-user sums are bit-equal to the oracle
    under any partitioning.

    Scale shape: same bucketed co-partitioning as sessionize — users
    hash into n_buckets bounded groups, the per-bucket pass is one
    vectorized sort + diff + boolean mask (no per-user Python calls)."""
    ds = read_events(sf_dir, columns=["ts", "user_id", "event_id", "value"])


    def inc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        c = _cents(g["value"].to_numpy())
        delta = np.empty(len(g), dtype=np.int64)
        delta[0] = 0
        delta[1:] = c[1:] - c[:-1]
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = uid[1:] != uid[:-1]
        reset = (~first) & (delta < 0)
        contrib = np.where(first, 0, np.where(reset, c, delta))
        out = (
            pd.DataFrame({"user_id": uid, "_c": contrib, "_r": reset.astype(np.int64)})
            .groupby("user_id", as_index=False, sort=True)
            .agg(_cents=("_c", "sum"), n_resets=("_r", "sum"), n_events=("_c", "size"))
        )
        out["user_id"] = out["user_id"].astype("int64")
        out["increase"] = out["_cents"] / 100.0
        out["n_resets"] = out["n_resets"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "increase", "n_resets", "n_events"]]

    return (
        ds.map_batches(_bucket_mod("user_id", n_buckets), batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(inc_bucket, batch_format="pandas")
    )


COUNTER_INCREASE_SQL = """
WITH d AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS c,
         lag(CAST(round(value * 100) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pc
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN pc IS NULL THEN 0
                     WHEN c >= pc THEN c - pc
                     ELSE c END) AS BIGINT) / 100.0 AS increase,
       CAST(sum(CASE WHEN pc IS NOT NULL AND c < pc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resets,
       CAST(count(*) AS BIGINT) AS n_events
FROM d GROUP BY user_id
"""


def rollup_hourly_lerp(sf_dir: str):
    """Linear-interpolation gap-fill of the hourly value-sum series per
    event_type (complement of the LOCF-style count gap-fill): missing
    hours get prev + (next - prev) * frac with frac computed from epoch
    hours — the numeric gap-fill a metrics store applies to sparse
    gauges. Present hours pass through exactly.

    Exactness: sums travel as int64 cents; interior hours always have
    both neighbors (the grid spans each type's [min, max]); both
    engines evaluate pc + (nc - pc) * ((h - ph) / (nh - ph)) in f64 in
    the same operation order, so filled values are bit-equal.

    Scale shape: raw events reduce through the distributed combiner +
    groupby (bounded key-space); the fill pass runs per event_type over
    the bounded (type x hour) grid."""
    hourly = _hourly_partials_df(sf_dir)

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        out = _dense_hourly_frame(g, "cents")
        # epoch hours via a second-resolution cast (unit-safe: the
        # Arrow round-trip may hand us us- or ns-precision datetimes)
        h = (out["bucket"].astype("datetime64[s]").astype("int64") // 3600).to_numpy(np.int64)
        present = out["cents"].notna().to_numpy()
        c = out["cents"].to_numpy(np.float64)  # NaN where missing
        # prev/next present index per row (grid edges are present)
        idx = np.arange(len(out))
        prev = np.maximum.accumulate(np.where(present, idx, -1))
        nxt = len(out) - 1 - np.maximum.accumulate(np.where(present[::-1], idx, -1))[::-1]
        frac = (h - h[prev]).astype(np.float64) / (h[nxt] - h[prev] + (prev == nxt)).astype(
            np.float64
        )
        lerp = c[prev] + (c[nxt] - c[prev]) * frac
        out["value_sum"] = np.where(present, c, lerp) / 100.0
        out["filled"] = (~present).astype("int64")
        return out[["event_type", "bucket", "value_sum", "filled"]]

    return fill_grouped_hourly(hourly, fill)


def fill_grouped_hourly(hourly: pd.DataFrame, fn):
    """Apply a per-type grid function over the merged hourly partials
    via a Ray Dataset (bounded groups: one per event_type)."""
    import ray.data as rd

    ds = rd.from_pandas(hourly)
    return ds.groupby("event_type").map_groups(fn, batch_format="pandas")


ROLLUP_LERP_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), joined AS (
  SELECT g.event_type, g.bucket,
         CAST(epoch(g.bucket) AS BIGINT) // 3600 AS h,
         hr.cents
  FROM grid g LEFT JOIN hourly hr
    ON g.event_type = hr.event_type AND g.bucket = hr.bucket
), nb AS (
  SELECT event_type, bucket, h, cents,
         last_value(cents IGNORE NULLS) OVER w_prev AS pc,
         last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS) OVER w_prev AS ph,
         first_value(cents IGNORE NULLS) OVER w_next AS nc,
         first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS) OVER w_next AS nh
  FROM joined
  WINDOW
    w_prev AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, bucket,
       CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
            ELSE CAST(pc AS DOUBLE)
                 + (CAST(nc AS DOUBLE) - CAST(pc AS DOUBLE))
                   * (CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE))
       END / 100.0 AS value_sum,
       CAST(cents IS NULL AS BIGINT) AS filled
FROM nb
"""


def hourly_ewma(sf_dir: str, alpha: float = 0.25):
    """Exponentially weighted moving average of the gap-filled hourly
    counts per event_type: e[0] = x[0]; e[t] = alpha*x[t] +
    (1-alpha)*e[t-1]. alpha = 0.25 and 0.75 are exact binary fractions
    and both engines evaluate the recurrence in the same f64 operation
    order, so the stream is bit-equal to the recursive-CTE oracle with
    no rounding.

    Scale shape: the sequential recurrence runs per event_type over the
    bounded hourly grid (a Python loop over ~10^3-10^4 floats per
    group — bounded by the time span, not the row count)."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        x = g["n_events"].to_numpy(np.float64)
        e = np.empty(len(x))
        if len(x):
            e[0] = x[0]
            for t in range(1, len(x)):
                e[t] = alpha * x[t] + (1.0 - alpha) * e[t - 1]
        g["ewma"] = e
        g["n_events"] = g["n_events"].astype("int64")
        return g[["event_type", "bucket", "n_events", "ewma"]]

    return _per_type(hourly, smooth)


HOURLY_EWMA_SQL = """
WITH RECURSIVE hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket,
         CAST(coalesce(h.n_events, 0) AS BIGINT) AS n_events,
         row_number() OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS rn
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket = h.bucket
), e AS (
  SELECT event_type, bucket, rn, n_events, CAST(n_events AS DOUBLE) AS ewma
  FROM filled WHERE rn = 1
  UNION ALL
  SELECT f.event_type, f.bucket, f.rn, f.n_events,
         0.25 * CAST(f.n_events AS DOUBLE) + 0.75 * e.ewma
  FROM filled f JOIN e ON f.event_type = e.event_type AND f.rn = e.rn + 1
)
SELECT event_type, bucket, n_events, ewma FROM e
"""


def _xcorr_pair_chunk(pairs, series, max_lag):
    """Per-pair lag profile for one chunk of type pairs. ``series`` maps
    type -> (hour int64 array, count int64 array). Exact int64 moments;
    the f64 expression matches the SQL oracle operation-for-operation."""
    rows = []
    for pa, pb in pairs:
        ha, xa = series[pa]
        hb, xb = series[pb]
        da = dict(zip(ha, xa))
        db = dict(zip(hb, xb))
        for lag in range(-max_lag, max_lag + 1):
            hs = sorted(set(da) & {h - lag for h in db})
            if len(hs) < 2:
                continue
            a = np.array([da[t] for t in hs], dtype=np.int64)
            b = np.array([db[t + lag] for t in hs], dtype=np.int64)
            n = np.int64(len(hs))
            Sa, Sb = a.sum(), b.sum()
            Saa, Sbb, Sab = (a * a).sum(), (b * b).sum(), (a * b).sum()
            va = float(n) * float(Saa) - float(Sa) * float(Sa)
            vb = float(n) * float(Sbb) - float(Sb) * float(Sb)
            if va <= 0 or vb <= 0:
                continue
            corr = (float(n) * float(Sab) - float(Sa) * float(Sb)) / (
                np.sqrt(va) * np.sqrt(vb)
            )
            rows.append((pa, pb, lag, int(n), round(corr, 6)))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "lag", "n_overlap", "corr"])


def hourly_xcorr_lags(sf_dir: str, max_lag: int = 6, max_types: int = 16):
    """Lead-lag detection between event types: for every unordered type
    pair (a < b) and every lag in [-max_lag, +max_lag], the Pearson
    correlation of the two gap-filled hourly count series with b
    shifted by `lag` hours; reports the full lag profile. corr > 0 at
    lag L means "a at hour t tracks b at hour t+L" — the classic
    which-metric-leads question.

    Exactness: every moment (n, Sa, Sb, Saa, Sbb, Sab) over each
    overlap window is an exact int64 sum of counts/products; both
    engines then evaluate the SAME f64 expression
    (n*Sab - Sa*Sb) / (sqrt(n*Saa - Sa*Sa) * sqrt(n*Sbb - Sb*Sb))
    on those exact integers, so the correlations are bit-equal
    (rounded at 6 only to absorb nothing — kept for display hygiene,
    both sides round identically).

    Scale shape: the raw-events reduction is the distributed gap-fill;
    the pair stage works on the BOUNDED (type x hour) grid. The pair
    count is O(#types^2), so types are CAPPED at the ``max_types``
    highest-volume ones (deterministic tie-break on name; the fixtures'
    5 types are far under the cap, so the oracle is unaffected) — with
    hundreds of event types the profile covers the heavy hitters
    instead of exploding quadratically. Pair chunks run as Ray tasks
    against a ray.put broadcast of the per-type series when the pair
    count warrants it; small pair sets fold inline."""
    import ray

    hourly = rollup_hourly_gapfill(sf_dir)
    _guard_driver_rows(len(hourly), "hourly_xcorr_lags grid")
    vol = (
        hourly.groupby("event_type", as_index=False)["n_events"]
        .sum()
        .sort_values(["n_events", "event_type"], ascending=[False, True], kind="mergesort")
    )
    types = sorted(vol["event_type"].head(max_types))
    sub = hourly[hourly["event_type"].isin(types)]
    hrs = (
        sub["bucket"].astype("datetime64[s]").astype("int64") // 3600
    ).to_numpy(np.int64)
    cnt = sub["n_events"].to_numpy(np.int64)
    et = sub["event_type"].to_numpy()
    series = {t: (hrs[et == t], cnt[et == t]) for t in types}
    pairs = [(a, b) for i, a in enumerate(types) for b in types[i + 1 :]]

    chunks = [pairs[i : i + 16] for i in range(0, len(pairs), 16)]
    if len(chunks) <= 1:
        out = _xcorr_pair_chunk(pairs, series, max_lag)
    else:
        sref = ray.put(series)  # broadcast once; Ray derefs it per task
        fn = ray.remote(_xcorr_pair_chunk)
        out = pd.concat(
            ray.get([fn.remote(ch, sref, max_lag) for ch in chunks]),
            ignore_index=True,
        )
    out["lag"] = out["lag"].astype("int64")
    out["n_overlap"] = out["n_overlap"].astype("int64")
    return out


HOURLY_XCORR_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type,
         CAST(epoch(g.bucket) AS BIGINT) // 3600 AS h,
         CAST(coalesce(hr.n_events, 0) AS BIGINT) AS x
  FROM grid g LEFT JOIN hourly hr
    ON g.event_type = hr.event_type AND g.bucket = hr.bucket
), types AS (
  SELECT DISTINCT event_type FROM filled
), pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a JOIN types b ON a.event_type < b.event_type
), lags AS (
  SELECT unnest(generate_series(-6, 6)) AS lag
), moments AS (
  SELECT p.ta, p.tb, l.lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(fa.x) AS BIGINT) AS sa,
         CAST(sum(fb.x) AS BIGINT) AS sb,
         CAST(sum(fa.x * fa.x) AS BIGINT) AS saa,
         CAST(sum(fb.x * fb.x) AS BIGINT) AS sbb,
         CAST(sum(fa.x * fb.x) AS BIGINT) AS sab
  FROM pairs p
  CROSS JOIN lags l
  JOIN filled fa ON fa.event_type = p.ta
  JOIN filled fb ON fb.event_type = p.tb AND fb.h = fa.h + l.lag
  GROUP BY 1, 2, 3
)
SELECT ta AS type_a, tb AS type_b, CAST(lag AS BIGINT) AS lag,
       n AS n_overlap,
       round((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 6) AS corr
FROM moments
WHERE n >= 2
  AND CAST(n AS DOUBLE) * CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0
  AND CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
"""


def hourly_cusum_changepoints(
    sf_dir: str, train_h: int = 168, k: float = 0.5, h_thr: float = 5.0
):
    """CUSUM changepoint detection (Page 1954) on the gap-filled hourly
    counts per event_type: standardize each post-training hour against
    the first ``train_h`` hours' baseline moments, then run the classic
    one-sided pair cpos[t] = max(0, cpos[t-1] + z_t - k) / cneg[t] =
    max(0, cneg[t-1] - z_t - k); an alarm fires when either exceeds
    ``h_thr`` — drift detection a metrics store runs on every series.

    Exactness: baseline mu/sd come from exact integer sums evaluated in
    the oracle's operation order; both engines then run the SAME f64
    recurrence (no per-step rounding), so every cpos/cneg is bit-equal;
    reported values are rounded at 6 on both sides and the alarm flag
    is derived from the ROUNDED statistic (the bit-deterministic
    threshold trick used by the z-score anomaly stage).

    Scale shape: distributed gap-fill reduction, then a bounded
    per-type sequential scan over the hourly grid (time-span bounded,
    row-count independent)."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        def empty():
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "bucket": pd.Series(dtype="datetime64[us]"),
                    "n_events": pd.Series(dtype="int64"),
                    "cpos": pd.Series(dtype="float64"),
                    "cneg": pd.Series(dtype="float64"),
                    "alarm": pd.Series(dtype="int64"),
                }
            )

        if len(g) <= train_h:
            return empty()
        x = g["n_events"].to_numpy(np.int64)
        tr = x[:train_h]
        n = np.int64(train_h)
        s1 = tr.sum()
        s2 = (tr * tr).sum()
        # sample variance from exact integer sums, oracle op order
        var = (float(s2) - (float(s1) * float(s1)) / float(n)) / (float(n) - 1.0)
        if var <= 0:
            return empty()
        mu = float(s1) / float(n)
        sd = np.sqrt(var)
        m = len(x) - train_h
        cpos = np.empty(m)
        cneg = np.empty(m)
        p = 0.0
        q = 0.0
        for i in range(m):
            z = (float(x[train_h + i]) - mu) / sd
            p = max(0.0, p + z - k)
            q = max(0.0, q - z - k)
            cpos[i] = p
            cneg[i] = q
        out = g.iloc[train_h:][["event_type", "bucket", "n_events"]].copy()
        out["cpos"] = np.round(cpos, 6)
        out["cneg"] = np.round(cneg, 6)
        out["alarm"] = (
            (out["cpos"].to_numpy() > h_thr) | (out["cneg"].to_numpy() > h_thr)
        ).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return _per_type(hourly, scan)


HOURLY_CUSUM_SQL = """
WITH RECURSIVE hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket,
         CAST(coalesce(hr.n_events, 0) AS BIGINT) AS n_events,
         row_number() OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS rn
  FROM grid g LEFT JOIN hourly hr
    ON g.event_type = hr.event_type AND g.bucket = hr.bucket
), base AS (
  SELECT event_type,
         CAST(sum(n_events) AS DOUBLE) AS s1,
         CAST(sum(n_events * n_events) AS DOUBLE) AS s2,
         CAST(count(*) AS DOUBLE) AS n
  FROM filled WHERE rn <= 168 GROUP BY event_type
  HAVING count(*) = 168
     AND (CAST(sum(n_events * n_events) AS DOUBLE)
          - CAST(sum(n_events) AS DOUBLE) * CAST(sum(n_events) AS DOUBLE) / 168.0)
         / 167.0 > 0
), c AS (
  SELECT f.event_type, f.bucket, f.rn, f.n_events,
         greatest(0.0, (CAST(f.n_events AS DOUBLE) - b.s1 / b.n)
                        / sqrt((b.s2 - (b.s1 * b.s1) / b.n) / (b.n - 1.0)) - 0.5) AS cpos,
         greatest(0.0, -((CAST(f.n_events AS DOUBLE) - b.s1 / b.n)
                        / sqrt((b.s2 - (b.s1 * b.s1) / b.n) / (b.n - 1.0))) - 0.5) AS cneg
  FROM filled f JOIN base b USING (event_type)
  WHERE f.rn = 169
  UNION ALL
  SELECT f.event_type, f.bucket, f.rn, f.n_events,
         greatest(0.0, c.cpos + (CAST(f.n_events AS DOUBLE) - b.s1 / b.n)
                        / sqrt((b.s2 - (b.s1 * b.s1) / b.n) / (b.n - 1.0)) - 0.5),
         greatest(0.0, c.cneg - (CAST(f.n_events AS DOUBLE) - b.s1 / b.n)
                        / sqrt((b.s2 - (b.s1 * b.s1) / b.n) / (b.n - 1.0)) - 0.5)
  FROM filled f
  JOIN c ON f.event_type = c.event_type AND f.rn = c.rn + 1
  JOIN base b ON b.event_type = f.event_type
)
SELECT event_type, bucket, n_events,
       round(cpos, 6) AS cpos, round(cneg, 6) AS cneg,
       CAST(round(cpos, 6) > 5.0 OR round(cneg, 6) > 5.0 AS BIGINT) AS alarm
FROM c
"""


def hourly_holt(sf_dir: str, alpha: float = 0.5, beta: float = 0.25):
    """Holt double-exponential smoothing (level + trend) of the
    gap-filled hourly counts per event_type, with the one-step-ahead
    forecast each hour — the standard short-horizon capacity-planning
    smoother. l[t] = a*x[t] + (1-a)*(l[t-1]+b[t-1]);
    b[t] = beta*(l[t]-l[t-1]) + (1-beta)*b[t-1]; init l0=x0, b0=x1-x0.

    alpha/beta are exact binary fractions and both engines evaluate the
    coupled recurrence in the same f64 operation order, so every
    level/trend/forecast is bit-equal to the recursive-CTE oracle
    (rounded at 6 identically on both sides for display hygiene).

    Scale shape: distributed gap-fill reduction, bounded per-type
    sequential scan (time-span bounded)."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        x = g["n_events"].to_numpy(np.float64)
        if len(x) < 2:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "bucket": pd.Series(dtype="datetime64[us]"),
                    "n_events": pd.Series(dtype="int64"),
                    "level": pd.Series(dtype="float64"),
                    "trend": pd.Series(dtype="float64"),
                    "forecast": pd.Series(dtype="float64"),
                }
            )
        m = len(x) - 1
        level = np.empty(m)
        trend = np.empty(m)
        fcast = np.empty(m)
        pl = x[0]
        pb = x[1] - x[0]
        for i in range(m):
            xi = x[i + 1]
            f = pl + pb
            l = alpha * xi + (1.0 - alpha) * (pl + pb)
            b = beta * (l - pl) + (1.0 - beta) * pb
            fcast[i] = f
            level[i] = l
            trend[i] = b
            pl, pb = l, b
        out = g.iloc[1:][["event_type", "bucket", "n_events"]].copy()
        # no rounding: the recurrence is bit-equal across engines, and
        # rounding would actually BREAK parity (Holt's exact binary
        # fractions hit exact half-way points at the 6th decimal, where
        # numpy rounds half-even but SQL rounds half-away)
        out["level"] = level
        out["trend"] = trend
        out["forecast"] = fcast
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return _per_type(hourly, smooth)


HOURLY_HOLT_SQL = """
WITH RECURSIVE hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket,
         CAST(coalesce(hr.n_events, 0) AS BIGINT) AS n_events,
         row_number() OVER (PARTITION BY g.event_type ORDER BY g.bucket) AS rn
  FROM grid g LEFT JOIN hourly hr
    ON g.event_type = hr.event_type AND g.bucket = hr.bucket
), init AS (
  SELECT f1.event_type,
         CAST(f1.n_events AS DOUBLE) AS l0,
         CAST(f2.n_events AS DOUBLE) - CAST(f1.n_events AS DOUBLE) AS b0
  FROM filled f1 JOIN filled f2
    ON f1.event_type = f2.event_type AND f1.rn = 1 AND f2.rn = 2
), h AS (
  SELECT f.event_type, f.bucket, f.rn, f.n_events,
         i.l0 + i.b0 AS forecast,
         0.5 * CAST(f.n_events AS DOUBLE) + 0.5 * (i.l0 + i.b0) AS level,
         0.25 * ((0.5 * CAST(f.n_events AS DOUBLE) + 0.5 * (i.l0 + i.b0)) - i.l0)
           + 0.75 * i.b0 AS trend
  FROM filled f JOIN init i USING (event_type)
  WHERE f.rn = 2
  UNION ALL
  SELECT f.event_type, f.bucket, f.rn, f.n_events,
         h.level + h.trend,
         0.5 * CAST(f.n_events AS DOUBLE) + 0.5 * (h.level + h.trend),
         0.25 * ((0.5 * CAST(f.n_events AS DOUBLE) + 0.5 * (h.level + h.trend)) - h.level)
           + 0.75 * h.trend
  FROM filled f JOIN h ON f.event_type = h.event_type AND f.rn = h.rn + 1
)
SELECT event_type, bucket, n_events, level, trend, forecast
FROM h
"""


def hourly_trend(sf_dir: str):
    """Per-type OLS trend of the gap-filled hourly counts: slope
    (events/hour), intercept, and R^2 over hours RELATIVE to each
    type's first hour (keeps every moment small enough that n*Sxx is
    exact in f64). All moments (n, Sx, Sxx, Sy, Syy, Sxy) are exact
    int64 sums over the bounded grid, and both engines evaluate
      slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
      intercept = (Sy - slope*Sx) / n
      r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx*Sx) * (n*Syy - Sy*Sy))
    in the same f64 operation order — bit-equal, no rounding.

    Scale shape: distributed gap-fill reduction; the fit is a bounded
    per-type vectorized pass (constant output rows)."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def fit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        y = g["n_events"].to_numpy(np.int64)
        n = np.int64(len(y))
        if n < 2:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "n_hours": pd.Series(dtype="int64"),
                    "slope": pd.Series(dtype="float64"),
                    "intercept": pd.Series(dtype="float64"),
                    "r2": pd.Series(dtype="float64"),
                }
            )
        x = np.arange(n, dtype=np.int64)
        Sx = x.sum()
        Sxx = (x * x).sum()
        Sy = y.sum()
        Syy = (y * y).sum()
        Sxy = (x * y).sum()
        nf = float(n)
        cov = nf * float(Sxy) - float(Sx) * float(Sy)
        varx = nf * float(Sxx) - float(Sx) * float(Sx)
        vary = nf * float(Syy) - float(Sy) * float(Sy)
        slope = cov / varx
        intercept = (float(Sy) - slope * float(Sx)) / nf
        r2 = (cov * cov) / (varx * vary) if vary > 0 else np.nan
        out = pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_hours": [int(n)],
                "slope": [slope],
                "intercept": [intercept],
                "r2": [r2],
            }
        )
        return out.dropna(subset=["r2"])

    return _per_type(hourly, fit)


HOURLY_TREND_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, b.lo, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type,
         (CAST(epoch(g.bucket) AS BIGINT) - CAST(epoch(g.lo) AS BIGINT)) // 3600 AS x,
         CAST(coalesce(hr.n_events, 0) AS BIGINT) AS y
  FROM grid g LEFT JOIN hourly hr
    ON g.event_type = hr.event_type AND g.bucket = hr.bucket
), mom AS (
  SELECT event_type,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(x) AS DOUBLE) AS sx,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(y * y) AS DOUBLE) AS syy,
         CAST(sum(x * y) AS DOUBLE) AS sxy
  FROM filled GROUP BY event_type
  HAVING count(*) >= 2
     AND CAST(count(*) AS DOUBLE) * CAST(sum(y * y) AS DOUBLE)
         - CAST(sum(y) AS DOUBLE) * CAST(sum(y) AS DOUBLE) > 0
)
SELECT event_type, n_hours,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM mom
"""


def value_percentiles_daily(sf_dir: str):
    """Exact p50/p90/p99 of value per (event_type, day), computed the
    100-TB way: a VALUE HISTOGRAM, not a sort. Per-block combiner
    counts (type, day, cents) occurrences; one Ray groupby-aggregate
    merges the histograms (key-space = types x days x distinct cents —
    bounded by the value domain, not the row count); the percentile
    pick is then a cumsum + searchsorted over each group's histogram.
    No stage ever holds, sorts, or shuffles the raw rows by value.

    Exactness: ranks use the inverse-CDF convention rank = ceil(q*n)
    evaluated in EXACT integer arithmetic ((q_num*n + 99) // 100) on
    both engines, so there is no float boundary to disagree on; the
    picked cents are integers and divide back to 2-decimal doubles
    identically."""
    from ray.data.aggregate import Sum

    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"].combine_chunks(), unit="day")
        c = _cents(b["value"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "event_type": b["event_type"].combine_chunks(),
                "day": day,
                "c": pa.array(c),
            }
        )
        order, starts, keys = _arrow_grouped(t, ["event_type", "day", "c"])
        return pa.table(
            {
                "event_type": keys["event_type"],
                "day": pa.array(keys["day"]),
                "c": keys["c"],
                "cnt": _group_sizes(order, starts),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day", "c"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("c", kind="mergesort")
        c = g["c"].to_numpy(np.int64)
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        ranks = [(50 * n + 99) // 100, (90 * n + 99) // 100, (99 * n + 99) // 100]
        vals = [float(c[np.searchsorted(cum, r)]) / 100.0 for r in ranks]
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "day": [g["day"].iloc[0]],
                "n_events": [n],
                "p50": [vals[0]],
                "p90": [vals[1]],
                "p99": [vals[2]],
            }
        )

    return hist.groupby(["event_type", "day"]).map_groups(pick, batch_format="pandas")


VALUE_PERCENTILES_SQL = """
WITH cents AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), hist AS (
  SELECT event_type, day, c, CAST(count(*) AS BIGINT) AS cnt
  FROM cents GROUP BY 1, 2, 3
), cum AS (
  SELECT event_type, day, c,
         CAST(sum(cnt) OVER (PARTITION BY event_type, day ORDER BY c) AS BIGINT) AS cm,
         CAST(sum(cnt) OVER (PARTITION BY event_type, day) AS BIGINT) AS n
  FROM hist
)
SELECT event_type, day, n AS n_events,
       min(CASE WHEN cm >= (50 * n + 99) // 100 THEN c END) / 100.0 AS p50,
       min(CASE WHEN cm >= (90 * n + 99) // 100 THEN c END) / 100.0 AS p90,
       min(CASE WHEN cm >= (99 * n + 99) // 100 THEN c END) / 100.0 AS p99
FROM cum GROUP BY event_type, day, n
"""


def funnel_stages(sf_dir: str, n_buckets: int = 64):
    """Per-user ordered funnel view -> click -> purchase: the first
    view, the first click STRICTLY AFTER it, the first purchase
    strictly after that; reports the stage reached (0-3) and exact
    microsecond latencies from the first view (-1 sentinel where the
    stage was not reached, keeping the schema NULL-free for hashing).

    Scale shape: users hash into n_buckets co-partitions (the
    sessionize pattern); within a bucket the three passes are C-level
    pandas groupby-min + merge + boolean filters — no per-user Python.
    The timestamps compared are raw int64 microseconds, so there is no
    float arithmetic to disagree with the oracle about."""
    ds = read_events(sf_dir, columns=["ts", "user_id", "event_type"])


    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(us=g["ts"].astype("datetime64[us]").astype("int64"))
        users = pd.DataFrame({"user_id": np.unique(g["user_id"].to_numpy(np.int64))})
        v = (
            g[g["event_type"] == "view"]
            .groupby("user_id", as_index=False)
            .agg(t1=("us", "min"))
        )
        gc = g[g["event_type"] == "click"].merge(v, on="user_id")
        c = (
            gc[gc["us"] > gc["t1"]]
            .groupby("user_id", as_index=False)
            .agg(t2=("us", "min"))
        )
        gp = g[g["event_type"] == "purchase"].merge(c, on="user_id")
        p = (
            gp[gp["us"] > gp["t2"]]
            .groupby("user_id", as_index=False)
            .agg(t3=("us", "min"))
        )
        out = users.merge(v, on="user_id", how="left").merge(
            c, on="user_id", how="left"
        ).merge(p, on="user_id", how="left")
        has_v = out["t1"].notna().to_numpy()
        has_c = out["t2"].notna().to_numpy()
        has_p = out["t3"].notna().to_numpy()
        out["funnel_stage"] = (
            has_v.astype(np.int64) + has_c.astype(np.int64) + has_p.astype(np.int64)
        )
        t1 = out["t1"].to_numpy(np.float64)
        out["us_view_to_click"] = np.where(
            has_c, out["t2"].to_numpy(np.float64) - t1, -1
        ).astype(np.int64)
        out["us_view_to_purchase"] = np.where(
            has_p, out["t3"].to_numpy(np.float64) - t1, -1
        ).astype(np.int64)
        out["user_id"] = out["user_id"].astype("int64")
        return out[["user_id", "funnel_stage", "us_view_to_click", "us_view_to_purchase"]]

    return (
        ds.map_batches(_bucket_mod("user_id", n_buckets), batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(funnel, batch_format="pandas")
    )


FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
), u AS (
  SELECT DISTINCT user_id FROM events
)
SELECT u.user_id,
       CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
                 WHEN c.t2 IS NOT NULL THEN 2
                 WHEN v.t1 IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage,
       CAST(coalesce(epoch_us(c.t2) - epoch_us(v.t1), -1) AS BIGINT)
         AS us_view_to_click,
       CAST(coalesce(epoch_us(p.t3) - epoch_us(v.t1), -1) AS BIGINT)
         AS us_view_to_purchase
FROM u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
"""


def seasonal_anomalies(sf_dir: str, min_peers: int = 10, z_thr: float = 3.0):
    """Seasonality-aware anomaly detection: each gap-filled hour is
    scored against the OTHER hours sharing its hour-of-day within the
    same event_type (self-excluded peer group) — catching
    "abnormal for 3am" spikes that a flat rolling window normalizes
    away.

    Exactness: per (type, hour-of-day) peer moments are exact integer
    sums; the self-excluded mean/variance are evaluated in the same
    f64 operation order as the oracle; z is rounded at 6 on both sides
    and the flag derives from the rounded z (the bit-deterministic
    threshold pattern).

    Scale shape: distributed gap-fill reduction; scoring is a bounded
    per-type vectorized pass over the (hour-of-day x hour) grid."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        x = g["n_events"].to_numpy(np.int64)
        hod = g["bucket"].dt.hour.to_numpy(np.int64)
        s1 = np.zeros(24, dtype=np.int64)
        s2 = np.zeros(24, dtype=np.int64)
        cnt = np.zeros(24, dtype=np.int64)
        np.add.at(s1, hod, x)
        np.add.at(s2, hod, x * x)
        np.add.at(cnt, hod, 1)
        # self-excluded moments, oracle operation order
        m = cnt[hod].astype(np.float64) - 1.0
        ls1 = (s1[hod] - x).astype(np.float64)
        ls2 = (s2[hod] - x * x).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            var = (ls2 - (ls1 * ls1) / m) / (m - 1.0)
            mean = ls1 / m
            z = (x.astype(np.float64) - mean) / np.sqrt(var)
        ok = (cnt[hod] - 1 >= min_peers) & (var > 0)
        out = g.loc[ok, ["event_type", "bucket", "n_events"]].copy()
        out["hod"] = hod[ok]
        out["z"] = np.round(z[ok], 6)
        out["is_anomaly"] = (np.abs(out["z"].to_numpy()) > z_thr).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["hod"] = out["hod"].astype("int64")
        return out

    return _per_type(hourly, score)


SEASONAL_ANOMALIES_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket,
         CAST(coalesce(hr.n_events, 0) AS BIGINT) AS x,
         CAST(hour(g.bucket) AS BIGINT) AS hod
  FROM grid g LEFT JOIN hourly hr
    ON g.event_type = hr.event_type AND g.bucket = hr.bucket
), peer AS (
  SELECT event_type, hod,
         CAST(sum(x) AS BIGINT) AS s1,
         CAST(sum(x * x) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS cnt
  FROM filled GROUP BY 1, 2
), scored AS (
  SELECT f.event_type, f.bucket, f.x, f.hod,
         CAST(p.cnt AS DOUBLE) - 1.0 AS m,
         CAST(p.s1 - f.x AS DOUBLE) AS ls1,
         CAST(p.s2 - f.x * f.x AS DOUBLE) AS ls2
  FROM filled f JOIN peer p USING (event_type, hod)
  WHERE p.cnt - 1 >= 10
), zval AS (
  SELECT event_type, bucket, x, hod,
         (ls2 - (ls1 * ls1) / m) / (m - 1.0) AS var,
         (CAST(x AS DOUBLE) - ls1 / m) AS dev
  FROM scored
)
SELECT event_type, bucket, x AS n_events, hod,
       round(dev / sqrt(var), 6) AS z,
       CAST(abs(round(dev / sqrt(var), 6)) > 3.0 AS BIGINT) AS is_anomaly
FROM zval
WHERE var > 0
"""


def retention_cohorts(sf_dir: str, n_buckets: int = 64):
    """Retention cohort triangle: each user is assigned to the cohort
    of their first active day; for every (cohort_day, day_offset) the
    operator reports how many cohort members were active again
    ``day_offset`` days later, plus the cohort size and the retention
    ratio — the classic DAU cohort analysis a rollup engine feeds.

    Exactness: days are whole multiples of 86400s, so the offset is an
    exact int64 division of the ns delta; counts are integers under
    any partitioning; the ratio is round(n/size, 6) on both sides.

    Scale shape: users hash into n_buckets co-partitions (each user's
    full history lands in one group — the sessionize/funnel pattern),
    the per-bucket pass emits one partial row per (cohort_day, offset)
    seen in the bucket, and the final groupby-aggregate merge runs over
    a key-space bounded by days^2/2 — independent of user count and
    row count. The driver only holds the merged triangle."""

    ds = read_events(sf_dir, columns=["ts", "user_id"])


    def cohort_partial(g: pd.DataFrame) -> pd.DataFrame:
        day_ns = g["ts"].dt.floor("D").astype("datetime64[ns]").astype("int64")
        ud = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(np.int64), "day_ns": day_ns}
        ).drop_duplicates()
        fst = ud.groupby("user_id", as_index=False).agg(cohort_ns=("day_ns", "min"))
        j = ud.merge(fst, on="user_id")
        j["day_offset"] = (j["day_ns"] - j["cohort_ns"]) // (86_400 * 10**9)
        out = j.groupby(["cohort_ns", "day_offset"], as_index=False).agg(
            n_users=("user_id", "size")
        )
        return out

    parts = (
        ds.map_batches(_bucket_mod("user_id", n_buckets), batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(cohort_partial, batch_format="pandas")
    )
    # (cohort day x day offset) is a bounded grid: fan-in tree, no shuffle
    merged = merge_partials(parts, ["cohort_ns", "day_offset"], {"n_users": "sum"})
    base = merged[merged["day_offset"] == 0][["cohort_ns", "n_users"]].rename(
        columns={"n_users": "cohort_size"}
    )
    out = merged.merge(base, on="cohort_ns")
    out["cohort_day"] = out["cohort_ns"].astype("datetime64[ns]")
    out["n_users"] = out["n_users"].astype("int64")
    out["cohort_size"] = out["cohort_size"].astype("int64")
    out["day_offset"] = out["day_offset"].astype("int64")
    out["retention_pct"] = np.round(
        out["n_users"].to_numpy(np.float64) / out["cohort_size"].to_numpy(np.float64),
        6,
    )
    return out[["cohort_day", "day_offset", "n_users", "cohort_size", "retention_pct"]]


RETENTION_COHORTS_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), fst AS (
  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1
), joined AS (
  SELECT f.cohort_day,
         CAST(date_diff('day', f.cohort_day, u.day) AS BIGINT) AS day_offset
  FROM ud u JOIN fst f USING (user_id)
), counts AS (
  SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
  FROM joined GROUP BY 1, 2
)
SELECT c.cohort_day, c.day_offset, c.n_users,
       c0.n_users AS cohort_size,
       round(CAST(c.n_users AS DOUBLE) / c0.n_users, 6) AS retention_pct
FROM counts c JOIN counts c0
  ON c0.cohort_day = c.cohort_day AND c0.day_offset = 0
"""


def user_interarrival_stats(sf_dir: str, n_buckets: int = 64):
    """Per-user inter-arrival gap statistics (engagement cadence):
    consecutive events per user ordered by (ts, event_id); reports the
    gap count, exact mean gap in microseconds, the discrete p50 gap
    (rank (50*n+99)//100 over the sorted gaps — the engine's standard
    inverse-CDF convention), and the max gap. Users with fewer than
    two events have no gaps and are omitted, matching the oracle.

    Exactness: gaps are int64 microsecond differences; the mean is the
    single f64 division of the exact int sum — the same operation
    order as the oracle; p50/max are integers.

    Scale shape: bucketed user co-partitioning (sessionize pattern);
    the per-bucket pass is two vectorized sorts + cumcount — no
    per-user Python."""
    ds = read_events(sf_dir, columns=["ts", "user_id", "event_id"])


    def gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame(
            {"user_id": uid[1:][same], "gap_us": (us[1:] - us[:-1])[same]}
        )
        if not len(df):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_gaps": pd.Series([], dtype="int64"),
                    "mean_gap_us": pd.Series([], dtype="float64"),
                    "p50_gap_us": pd.Series([], dtype="int64"),
                    "max_gap_us": pd.Series([], dtype="int64"),
                }
            )
        agg = df.groupby("user_id", as_index=False, sort=True).agg(
            n_gaps=("gap_us", "size"),
            sum_gap=("gap_us", "sum"),
            max_gap_us=("gap_us", "max"),
        )
        d2 = df.sort_values(["user_id", "gap_us"], kind="mergesort").reset_index(drop=True)
        rk = d2.groupby("user_id").cumcount().to_numpy(np.int64) + 1
        n = d2["user_id"].map(agg.set_index("user_id")["n_gaps"]).to_numpy(np.int64)
        sel = rk == (50 * n + 99) // 100
        p50 = d2.loc[sel, ["user_id", "gap_us"]].rename(columns={"gap_us": "p50_gap_us"})
        out = agg.merge(p50, on="user_id")
        out["mean_gap_us"] = out["sum_gap"].to_numpy(np.float64) / out[
            "n_gaps"
        ].to_numpy(np.float64)
        for c in ("user_id", "n_gaps", "p50_gap_us", "max_gap_us"):
            out[c] = out[c].astype("int64")
        return out[["user_id", "n_gaps", "mean_gap_us", "p50_gap_us", "max_gap_us"]]

    return (
        ds.map_batches(_bucket_mod("user_id", n_buckets), batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(gaps_bucket, batch_format="pandas")
    )


USER_INTERARRIVAL_SQL = """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), gaps AS (
  SELECT user_id, us - prev AS gap FROM ordered WHERE prev IS NOT NULL
), ranked AS (
  SELECT user_id, gap,
         row_number() OVER (PARTITION BY user_id ORDER BY gap) AS rk,
         count(*) OVER (PARTITION BY user_id) AS n,
         sum(gap) OVER (PARTITION BY user_id) AS s,
         max(gap) OVER (PARTITION BY user_id) AS mx
  FROM gaps
)
SELECT user_id,
       CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(max(s) AS DOUBLE) / CAST(max(n) AS DOUBLE) AS mean_gap_us,
       CAST(min(CASE WHEN rk >= (50 * n + 99) // 100 THEN gap END) AS BIGINT)
         AS p50_gap_us,
       CAST(max(mx) AS BIGINT) AS max_gap_us
FROM ranked GROUP BY user_id
"""


def dau_wau_stickiness(sf_dir: str, n_buckets: int = 64):
    """DAU / WAU / stickiness per day: distinct active users that day,
    distinct users active in the trailing 7-day window, and the
    DAU/WAU ratio — the standard engagement rollup.

    The rolling distinct count never runs a windowed-distinct shuffle:
    users hash into n_buckets co-partitions; within a bucket each
    distinct (user, active-day) expands to the <=7 window days it
    covers, the (user, window-day) pairs dedup locally, and the bucket
    emits exact integer partial counts per day. The final merge is a
    groupby-sum over a key-space bounded by the calendar — counting a
    user once per window is guaranteed because all of a user's rows
    live in one bucket.

    Exactness: integer counts under any partitioning; stickiness is
    round() of one f64 division of exact ints — bit-equal to the
    oracle. Days beyond the data's max day are not emitted, and days
    with an empty trailing window are absent on both sides."""

    ds = read_events(sf_dir, columns=["ts", "user_id"])


    # global day bounds: tiny exact reduction (2 ints)

    def day_bounds(b: pa.Table) -> pa.Table:
        ns = (
            pc.floor_temporal(b["ts"].combine_chunks(), unit="day")
            .cast(pa.timestamp("ns"))
            .to_numpy()
            .view("i8")
        )
        return pa.table({"lo": [int(ns.min())], "hi": [int(ns.max())]})

    bounds = ds.map_batches(day_bounds, batch_format="pyarrow").to_pandas()
    day_ns = 86_400 * 10**9
    hi_d = int(bounds["hi"].max()) // day_ns

    def window_partial(g: pd.DataFrame) -> pd.DataFrame:
        d = g["ts"].dt.floor("D").astype("datetime64[ns]").astype("int64") // day_ns
        ud = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(np.int64), "d": d.to_numpy()}
        ).drop_duplicates()
        # DAU partials
        dau = ud.groupby("d", as_index=False).agg(dau=("user_id", "size"))
        # expand each active day to the window days it covers
        u = np.repeat(ud["user_id"].to_numpy(), 7)
        wd = (ud["d"].to_numpy()[:, None] + np.arange(7)[None, :]).ravel()
        keep = wd <= hi_d
        cover = pd.DataFrame({"user_id": u[keep], "d": wd[keep]}).drop_duplicates()
        wau = cover.groupby("d", as_index=False).agg(wau=("user_id", "size"))
        out = wau.merge(dau, on="d", how="left")
        out["dau"] = out["dau"].fillna(0).astype("int64")
        out["wau"] = out["wau"].astype("int64")
        return out

    parts = (
        ds.map_batches(_bucket_mod("user_id", n_buckets), batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(window_partial, batch_format="pandas")
    )
    # days are a bounded key: fan-in tree merge, no all-to-all
    merged = merge_partials(parts, ["d"], {"dau": "sum", "wau": "sum"})
    merged["day"] = (merged["d"] * day_ns).astype("datetime64[ns]")
    merged["dau"] = merged["dau"].astype("int64")
    merged["wau"] = merged["wau"].astype("int64")
    merged["stickiness"] = np.round(
        merged["dau"].to_numpy(np.float64) / merged["wau"].to_numpy(np.float64), 6
    )
    return merged[["day", "dau", "wau", "stickiness"]]


DAU_WAU_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
), dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
), bounds AS (
  SELECT max(day) AS hi FROM ud
), cover AS (
  SELECT DISTINCT u.user_id, u.day + (INTERVAL 1 DAY) * o.k AS wday
  FROM ud u, (SELECT unnest(generate_series(0, 6)) AS k) o, bounds b
  WHERE u.day + (INTERVAL 1 DAY) * o.k <= b.hi
), wau AS (
  SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau FROM cover GROUP BY 1
)
SELECT w.day, CAST(coalesce(d.dau, 0) AS BIGINT) AS dau, w.wau,
       round(CAST(coalesce(d.dau, 0) AS DOUBLE) / w.wau, 6) AS stickiness
FROM wau w LEFT JOIN dau d USING (day)
"""


def out_of_order_audit(sf_dir: str, shard_width: int = 1024):
    """Watermark / out-of-order arrival audit: treating event_id as the
    arrival sequence, an event is LATE when its timestamp is behind the
    running maximum timestamp of everything that arrived before it
    (within its event_type stream). Reports per (event_type, day of the
    event's own ts): event count, late count, and the worst skew in
    microseconds — the numbers that size a streaming watermark.

    Scale shape: the running max is a classic sequential prefix, made
    distributed the engine's usual way — arrival ids hash into ORDERED
    range shards (event_id // shard_width); pass 1 collects per-shard
    max timestamps (bounded partial rows), the driver prefix-scans that
    bounded list into an incoming-watermark per shard, and pass 2
    co-partitions rows by shard and applies a vectorized cummax with
    the broadcast incoming prefix. No stage ever orders the full
    stream globally.

    Exactness: timestamps are int64 microseconds throughout; counts and
    max-skews are integers under any partitioning."""

    import ray

    ds = read_events(sf_dir, columns=["ts", "event_id", "event_type"])

    def p1(b: pa.Table) -> pa.Table:
        shard = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64) // shard_width
        us = b["ts"].combine_chunks().cast(pa.timestamp("us")).to_numpy().view("i8")
        t = pa.table(
            {"event_type": b["event_type"].combine_chunks(), "shard": pa.array(shard)}
        )
        order, starts, keys = _arrow_grouped(t, ["event_type", "shard"])
        return pa.table(
            {
                "event_type": keys["event_type"],
                "shard": keys["shard"],
                "max_us": np.maximum.reduceat(us[order], starts)
                if len(starts)
                else us[:0],
            }
        )

    parts = merge_partials(
        ds.map_batches(p1, batch_format="pyarrow"),
        ["event_type", "shard"],
        {"max_us": "max"},
    )
    # bounded driver prefix-scan: one row per (type, shard)
    parts = parts.sort_values(["event_type", "shard"], kind="mergesort")
    incoming: dict = {}
    for et, g in parts.groupby("event_type"):
        run = -1
        for shard, mx in zip(g["shard"], g["max_us"]):
            incoming[(et, int(shard))] = run
            run = max(run, int(mx))
    inc_ref = ray.put(incoming)

    def shard_audit(g: pd.DataFrame) -> pd.DataFrame:
        # ray.get on the broadcast ref: per-node object-store hit, the
        # prefix table is shipped once per node, not once per group
        incoming_map = ray.get(inc_ref)
        g = g.sort_values("event_id", kind="mergesort")
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        inc = incoming_map.get(
            (g["event_type"].iloc[0], int(g["shard"].iloc[0])), -1
        )
        run = np.maximum.accumulate(us)
        prevmax = np.empty(len(us), dtype=np.int64)
        prevmax[0] = inc
        prevmax[1:] = np.maximum(run[:-1], inc)
        late = (prevmax >= 0) & (us < prevmax)
        skew = np.where(late, prevmax - us, 0)
        out = pd.DataFrame(
            {
                "event_type": g["event_type"].to_numpy(),
                "day": g["ts"].dt.floor("D").to_numpy(),
                "n_events": 1,
                "n_late": late.astype(np.int64),
                "max_skew_us": skew,
            }
        )
        return out.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("n_events", "sum"),
            n_late=("n_late", "sum"),
            max_skew_us=("max_skew_us", "max"),
        )

    audited = (
        ds.map_batches(_bucket_div("event_id", shard_width, name="shard"), batch_format="pyarrow")
        .groupby(["event_type", "shard"])
        .map_groups(shard_audit, batch_format="pandas")
    )
    # (type x day) is bounded: fan-in tree merge of the audited partials
    merged = merge_partials(
        audited,
        ["event_type", "day"],
        {"n_events": "sum", "n_late": "sum", "max_skew_us": "max"},
    )
    for c in ("n_events", "n_late", "max_skew_us"):
        merged[c] = merged[c].astype("int64")
    return merged


OUT_OF_ORDER_SQL = """
WITH o AS (
  SELECT event_type, ts, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prevmax
  FROM events
)
SELECT event_type, date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN prevmax IS NOT NULL AND us < prevmax
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(max(CASE WHEN prevmax IS NOT NULL AND us < prevmax
                     THEN prevmax - us ELSE 0 END) AS BIGINT) AS max_skew_us
FROM o GROUP BY 1, 2
"""


def hourly_median_bands(sf_dir: str, window: int = 24, k: float = 1.5):
    """Rolling median + IQR (Tukey) anomaly bands over the gap-filled
    hourly grid: per event_type and hour, the trailing-24h median, q1,
    q3 and an outlier flag for counts outside [q1 - 1.5*IQR,
    q3 + 1.5*IQR]. Robust to the single spikes that wreck mean/std
    bands.

    Exactness: counts are small exact ints; quantile_cont's linear
    interpolation a + (b-a)*frac with frac in {0, .25, .5, .75} is an
    exact binary operation on exactly-representable ints, and numpy's
    'linear' percentile computes the identical expression — so med/q1/
    q3 and the flag are bit-equal with no rounding games.

    Scale shape: the grid is calendar-bounded per type; the per-type
    pass builds all full windows in one strided view (head windows,
    <24 rows, in a bounded loop)."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def bands(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        x = g["n_events"].to_numpy(np.float64)
        n = len(x)
        med = np.empty(n)
        q1 = np.empty(n)
        q3 = np.empty(n)
        head = min(window - 1, n)
        for i in range(head):
            w = x[: i + 1]
            q1[i], med[i], q3[i] = np.percentile(w, [25, 50, 75], method="linear")
        if n >= window:
            sw = np.lib.stride_tricks.sliding_window_view(x, window)
            qq = np.percentile(sw, [25, 50, 75], axis=1, method="linear")
            q1[window - 1 :], med[window - 1 :], q3[window - 1 :] = qq[0], qq[1], qq[2]
        iqr = q3 - q1
        out = g[["event_type", "bucket", "n_events"]].copy()
        out["med"] = med
        out["q1"] = q1
        out["q3"] = q3
        out["is_outlier"] = (
            (x < q1 - k * iqr) | (x > q3 + k * iqr)
        ).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return _per_type(hourly, bands)


HOURLY_MEDIAN_BANDS_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket,
         CAST(coalesce(h.n_events, 0) AS BIGINT) AS x
  FROM grid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.bucket = h.bucket
), q AS (
  SELECT event_type, bucket, x,
         median(x) OVER w AS med,
         quantile_cont(x, 0.25) OVER w AS q1,
         quantile_cont(x, 0.75) OVER w AS q3
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket, x AS n_events, med, q1, q3,
       CAST(x < q1 - 1.5 * (q3 - q1) OR x > q3 + 1.5 * (q3 - q1) AS BIGINT)
         AS is_outlier
FROM q
"""


def last_touch_attribution(sf_dir: str, window_s: int = 3600, n_buckets: int = 64):
    """Last-touch attribution: each purchase is credited to the most
    recent view-or-click by the same user within the trailing hour
    (lexicographic (ts, event_id) precedence; 'none' when no touch
    qualifies). Reports purchases per (day, attributed_type).

    Scale shape: bucketed user co-partitioning; within a bucket the
    latest-preceding-touch is one vectorized grouped cummax over the
    (user, ts, event_id) sort — no per-purchase scan. Partial counts
    merge through a distributed groupby-sum over the bounded
    (day x type) key-space.

    Exactness: the window test is pure int64 microseconds; counts are
    integers under any partitioning."""

    ds = read_events(sf_dir, columns=["ts", "user_id", "event_id", "event_type"])


    win_us = window_s * 1_000_000

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort").reset_index(drop=True)
        et = g["event_type"].to_numpy()
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        touch = (et == "view") | (et == "click")
        idx = pd.Series(np.where(touch, np.arange(len(g)), -1))
        last = idx.groupby(g["user_id"].to_numpy()).cummax().to_numpy()
        purch = et == "purchase"
        cand = last[purch]
        pus = us[purch]
        valid = (cand >= 0) & (pus - us[np.clip(cand, 0, None)] <= win_us)
        att = np.where(valid, et[np.clip(cand, 0, None)], "none")
        out = pd.DataFrame(
            {
                "day": g.loc[purch, "ts"].dt.floor("D").to_numpy(),
                "attributed_type": att,
                "n_purchases": 1,
            }
        )
        return out.groupby(["day", "attributed_type"], as_index=False).agg(
            n_purchases=("n_purchases", "sum")
        )

    parts = (
        ds.map_batches(_bucket_mod("user_id", n_buckets), batch_format="pyarrow")
        .groupby("user_bucket")
        .map_groups(attribute, batch_format="pandas")
    )
    # (day x attributed type) is bounded: fan-in tree merge
    merged = merge_partials(parts, ["day", "attributed_type"], {"n_purchases": "sum"})
    merged["n_purchases"] = merged["n_purchases"].astype("int64")
    return merged


LAST_TOUCH_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), att AS (
  SELECT p.event_id, date_trunc('day', p.ts) AS day,
         coalesce((
           SELECT t.event_type FROM events t
           WHERE t.user_id = p.user_id
             AND t.event_type IN ('view', 'click')
             AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id))
             AND epoch_us(p.ts) - epoch_us(t.ts) <= 3600000000
           ORDER BY t.ts DESC, t.event_id DESC LIMIT 1
         ), 'none') AS attributed_type
  FROM p
)
SELECT day, attributed_type, CAST(count(*) AS BIGINT) AS n_purchases
FROM att GROUP BY 1, 2
"""


def props_extract_rollup(sf_dir: str):
    """Semi-structured payload rollup: parse the JSON ``props`` column
    (``{"k": int}``) and aggregate per (event_type, k-decile) — the
    log-analytics shape where a free-form properties blob feeds a
    typed rollup. A vectorized regex PREFILTERS candidate rows (the
    fast path — most rows either obviously lack a k or obviously have
    one), then each HIT is validated with a real JSON parse that
    mirrors the oracle's ``json_valid(props)`` exactly: malformed JSON
    containing a '"k": N' substring is dropped, a nested-only k is
    dropped (json_extract '$.k' is top-level), duplicate top-level k
    keys take the FIRST occurrence (DuckDB/yyjson semantics — Python's
    plain json.loads would keep the last, hence the pairs hook), and
    non-integer k (float/bool/string) is dropped on BOTH sides (the
    oracle requires json_type = BIGINT/UBIGINT).

    Exactness: k is integer, all aggregates are exact ints merged by a
    distributed groupby-sum/min/max over the bounded (type x decile)
    key-space."""
    import json as _json


    ds = read_events(sf_dir, columns=["event_type", "props"])

    def first_top_k(s: str):
        # first top-level "k" whose value is a JSON integer, else None
        try:
            pairs = _json.loads(s, object_pairs_hook=lambda p: p)
            for key, v in pairs:
                if key == "k":
                    return v if type(v) is int else None
        except Exception:
            return None
        return None

    def partial(b: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(
            b["props"].combine_chunks(), r'"k"\s*:\s*-?\d+'
        )
        sub = b.filter(pc.fill_null(hit, False))
        ks = [first_top_k(s) for s in sub["props"].to_pylist()]
        ok = np.fromiter((k is not None for k in ks), dtype=bool, count=len(ks))
        kv = np.array([k for k in ks if k is not None], dtype=np.int64)
        et = sub["event_type"].combine_chunks().filter(pa.array(ok))
        # SQL integer division TRUNCATES toward zero (DuckDB -4//10 = 0);
        # Python's // floors (-1) — mirror the oracle for negative k
        dec = np.sign(kv) * (np.abs(kv) // 10)
        t = pa.table({"event_type": et, "k_decile": pa.array(dec)})
        order, starts, keys = _arrow_grouped(t, ["event_type", "k_decile"])
        sk = kv[order]
        empty = sk[:0]
        return pa.table(
            {
                "event_type": keys["event_type"],
                "k_decile": keys["k_decile"],
                "n": _group_sizes(order, starts),
                "sum_k": np.add.reduceat(sk, starts) if len(starts) else empty,
                "min_k": np.minimum.reduceat(sk, starts) if len(starts) else empty,
                "max_k": np.maximum.reduceat(sk, starts) if len(starts) else empty,
            }
        )

    # (type x decile) is bounded: fan-in tree merge, no all-to-all
    merged = merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "k_decile"],
        {"n": "sum", "sum_k": "sum", "min_k": "min", "max_k": "max"},
    )
    for c in ("k_decile", "n", "sum_k", "min_k", "max_k"):
        merged[c] = merged[c].astype("int64")
    return merged


PROPS_EXTRACT_SQL = """
WITH x AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
  WHERE json_valid(props)
    AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
)
SELECT event_type, CAST(k // 10 AS BIGINT) AS k_decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM x GROUP BY 1, 2
"""


def _ntile_of_rank(r0: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) tile (1-based) for 0-based global ranks ``r0`` over
    ``n`` rows: the first ``n % k`` tiles hold ``n//k + 1`` rows each,
    the remaining tiles ``n//k`` (front-loaded remainder — the ANSI /
    DuckDB distribution, NOT the even-spread ((r*k)//n)+1 mapping)."""
    big = n // k + 1
    rem = n % k
    cut = rem * big  # ranks below cut live in a big tile
    small = max(1, n // k)  # n//k == 0 only when n < k, where every rank < cut
    return np.where(r0 < cut, r0 // big + 1, rem + (r0 - cut) // small + 1).astype(np.int64)


def _add_global_ntile(users_ds, col: str, out_col: str, k: int = 5, nshards: int = 256, tie_col: str = "user_id"):
    """Exact global ntile(k) over an UNBOUNDED row set, no global sort:
    rows range-shard by value ((v - vmin) // width), pass 1 collects
    per-shard counts (bounded rows), the driver prefix-scans them into
    a per-shard rank offset (broadcast once), and pass 2 co-partitions
    by shard and ranks locally — global_rank = offset + local index,
    mapped to the SQL NTILE distribution — the FIRST n mod k tiles get
    ceil(n/k) rows, the rest floor(n/k) (front-loaded remainder, per
    DuckDB/ANSI; an even-spread ((rank-1)*k)//n+1 mapping differs
    whenever k does not divide n). Ordering is (value, tie_col), so
    ties are deterministic. A skewed value can make one shard hot;
    sub-split hot shards on (value, user_id hash) if that bites."""
    import ray
    from ray.data.aggregate import Max as AMax
    from ray.data.aggregate import Min as AMin

    # this stage consumes its input THREE times (min/max scan, shard
    # counts, rank pass); materialize once so the upstream DAG — which
    # may itself be a chain of ntile passes (RFM chains three) — does
    # not re-execute per consumer. The blocks live in the object store
    # (distributed, spillable), never on the driver.
    users_ds = users_ds.materialize()
    mm = users_ds.aggregate(AMin(col), AMax(col))
    vmin, vmax = int(mm[f"min({col})"]), int(mm[f"max({col})"])
    width = max(1, (vmax - vmin + 1) // nshards)

    def p1(b: pa.Table) -> pa.Table:
        sh = (b[col].to_numpy(zero_copy_only=False).astype(np.int64) - vmin) // width
        u, cnt = np.unique(sh, return_counts=True)
        return pa.table({"shard": u, "cnt": cnt.astype(np.int64)})

    parts = merge_partials(
        users_ds.map_batches(p1, batch_format="pyarrow"), ["shard"], {"cnt": "sum"}
    ).sort_values("shard", kind="mergesort")
    n = int(parts["cnt"].sum())
    offs = {}
    run = 0
    for s, c in zip(parts["shard"], parts["cnt"]):
        offs[int(s)] = run
        run += int(c)
    offs_ref = ray.put(offs)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offs_ref)[int(g["_shard"].iloc[0])]
        g = g.sort_values([col, tie_col], kind="mergesort").reset_index(drop=True)
        r0 = off + np.arange(0, len(g), dtype=np.int64)  # 0-based global rank
        g[out_col] = _ntile_of_rank(r0, n, k)
        return g.drop(columns=["_shard"])

    return (
        users_ds.map_batches(_bucket_div(col, width, name="_shard", offset=vmin), batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(rank_group, batch_format="pandas")
    )


def user_rfm_segments(sf_dir: str):
    """User RFM segmentation: recency (hours since the user's last
    event, vs the global max), frequency (event count), monetary (exact
    int-cents value sum), each labeled with its exact global quintile —
    the classic user-lifecycle rollup.

    Scale shape: per-user aggregates are combiner partials + one
    groupby (the unavoidable shuffle on the unbounded user key); each
    quintile is the range-sharded global-ntile above — three orderings,
    three co-partitions, no global sort and no driver user table."""
    from ray.data.aggregate import Max, Sum

    ds = read_events(sf_dir, columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["value"].to_numpy(zero_copy_only=False))
        us = b["ts"].combine_chunks().cast(pa.timestamp("us")).to_numpy().view("i8")
        order, starts, keys = _arrow_grouped(b, ["user_id"])
        return pa.table(
            {
                "user_id": keys["user_id"].astype(np.int64),
                "last_us": np.maximum.reduceat(us[order], starts)
                if len(starts)
                else us[:0],
                "f_cnt": _group_sizes(order, starts),
                "m_cents": np.add.reduceat(cents[order], starts)
                if len(starts)
                else cents[:0],
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("last_us", alias_name="last_us"),
            Sum("f_cnt", alias_name="f_cnt"),
            Sum("m_cents", alias_name="m_cents"),
        )
    )
    gmax = int(agg.aggregate(Max("last_us"))["max(last_us)"])

    def finish(b: pa.Table) -> pa.Table:
        last_us = b["last_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "r_hours": (gmax - last_us) // 3_600_000_000,
                "f_cnt": pc.cast(b["f_cnt"], pa.int64()),
                "m_cents": pc.cast(b["m_cents"], pa.int64()),
            }
        )

    users = agg.map_batches(finish, batch_format="pyarrow")
    for col, out in (("r_hours", "r_q"), ("f_cnt", "f_q"), ("m_cents", "m_q")):
        users = _add_global_ntile(users, col, out)

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "r_hours": b["r_hours"],
                "f_cnt": b["f_cnt"],
                "m_value": pc.divide(pc.cast(b["m_cents"], pa.float64()), 100.0),
                "r_q": pc.cast(b["r_q"], pa.int64()),
                "f_q": pc.cast(b["f_q"], pa.int64()),
                "m_q": pc.cast(b["m_q"], pa.int64()),
            }
        )

    return users.map_batches(finalize, batch_format="pyarrow")


RFM_SQL = """
WITH u AS (
  SELECT user_id,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
         CAST(count(*) AS BIGINT) AS f_cnt,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m_cents
  FROM events GROUP BY user_id
), mx AS (SELECT max(last_us) AS g FROM u)
SELECT u.user_id,
       CAST((mx.g - u.last_us) // 3600000000 AS BIGINT) AS r_hours,
       u.f_cnt,
       u.m_cents / 100.0 AS m_value,
       CAST(ntile(5) OVER (ORDER BY (mx.g - u.last_us) // 3600000000, u.user_id)
            AS BIGINT) AS r_q,
       CAST(ntile(5) OVER (ORDER BY u.f_cnt, u.user_id) AS BIGINT) AS f_q,
       CAST(ntile(5) OVER (ORDER BY u.m_cents, u.user_id) AS BIGINT) AS m_q
FROM u, mx
"""


# ---------------------------------------------------------------------------
# Prometheus-style mergeable value histograms + histogram_quantile
# ---------------------------------------------------------------------------

# Fixed cumulative-histogram boundaries ("le" buckets) for events.value
# (observed range ~0.01-490). The LAST bucket also absorbs any value
# above it (both engine and oracle clamp identically), so the sketch
# stays fixed-size under any future value range.
_HIST_BOUNDS = np.array([5.0, 10.0, 20.0, 50.0, 100.0, 150.0, 200.0, 300.0, 400.0, 500.0])
_HIST_QS = (0.5, 0.9, 0.99)


def _add_day(batch: pa.Table) -> pa.Table:
    return batch.append_column("day", pc.floor_temporal(batch["ts"], unit="day"))


def _hist_partial_arrow(b: pa.Table) -> pa.Table:
    """Arrow-native histogram combiner: per-batch (event_type, day,
    le_idx) counts. This is the canonical TSDB continuous-aggregate
    sketch — a FIXED-size mergeable vector per key, so partials are
    bounded by key-space x #buckets regardless of row count, and merging
    is an exact integer sum under any partitioning."""
    et = pc.dictionary_encode(b["event_type"]).combine_chunks()
    codes = et.indices.to_numpy().astype(np.int64)
    names = et.dictionary
    day = b["day"].combine_chunks().to_numpy()
    val = b["value"].to_numpy(zero_copy_only=False)
    nb = len(_HIST_BOUNDS)
    # bucket i holds values in (bounds[i-1], bounds[i]]; clamp overflow
    idx = np.minimum(np.searchsorted(_HIST_BOUNDS, val, side="left"), nb - 1)
    ud, dinv = np.unique(day, return_inverse=True)
    key = (codes * len(ud) + dinv) * nb + idx
    order, starts, uk = _grouped_reduceat(key)
    return pa.table(
        {
            "event_type": names.take(pa.array(uk // (len(ud) * nb))),
            "day": pa.array(ud[(uk // nb) % len(ud)]),
            "le_idx": (uk % nb).astype(np.int64),
            "n": np.diff(np.r_[starts, len(key)]).astype(np.int64),
        }
    )


def _hist_partials_df(sf_dir: str) -> pd.DataFrame:
    """(event_type, day, le_idx) -> n, merged by the bounded-key fan-in
    tree (#types x #days x 10 buckets rows — never a hash exchange)."""
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])
    parts = ds.map_batches(_add_day, batch_format="pyarrow").map_batches(
        _hist_partial_arrow, batch_format="pyarrow"
    )
    return merge_partials(parts, ["event_type", "day", "le_idx"], {"n": "sum"})


def value_histogram_daily(sf_dir: str) -> pd.DataFrame:
    """Dense daily value histogram per event_type: one row per
    (event_type, day, le) with the bucket count and the cumulative
    count — the exact storage layout a continuous aggregate would
    persist (all buckets materialized, so tier merges are blind
    vector adds)."""
    df = _hist_partials_df(sf_dir)
    nb = len(_HIST_BOUNDS)
    grid = df[["event_type", "day"]].drop_duplicates()
    dense = grid.merge(
        pd.DataFrame({"le_idx": np.arange(nb, dtype=np.int64)}), how="cross"
    )
    out = dense.merge(df, on=["event_type", "day", "le_idx"], how="left")
    out["bucket_n"] = out["n"].fillna(0).astype("int64")
    out = out.sort_values(["event_type", "day", "le_idx"], kind="mergesort")
    out["cum_n"] = (
        out.groupby(["event_type", "day"], sort=False)["bucket_n"].cumsum().astype("int64")
    )
    out["le"] = _HIST_BOUNDS[out["le_idx"].to_numpy()]
    return out[["event_type", "day", "le", "bucket_n", "cum_n"]].reset_index(drop=True)


VALUE_HISTOGRAM_SQL = """
WITH counts AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CASE WHEN value <= 5 THEN 5.0 WHEN value <= 10 THEN 10.0
              WHEN value <= 20 THEN 20.0 WHEN value <= 50 THEN 50.0
              WHEN value <= 100 THEN 100.0 WHEN value <= 150 THEN 150.0
              WHEN value <= 200 THEN 200.0 WHEN value <= 300 THEN 300.0
              WHEN value <= 400 THEN 400.0 ELSE 500.0 END AS le,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3),
grid AS (SELECT DISTINCT event_type, day FROM counts),
bounds AS (SELECT * FROM (VALUES (5.0), (10.0), (20.0), (50.0), (100.0),
                                 (150.0), (200.0), (300.0), (400.0), (500.0)) AS t(le)),
dense AS (
  SELECT g.event_type, g.day, b.le, COALESCE(c.n, 0) AS n
  FROM grid g CROSS JOIN bounds b
  LEFT JOIN counts c ON c.event_type = g.event_type AND c.day = g.day AND c.le = b.le)
SELECT event_type, day, le,
       CAST(n AS BIGINT) AS bucket_n,
       CAST(sum(n) OVER (PARTITION BY event_type, day ORDER BY le) AS BIGINT) AS cum_n
FROM dense
"""


def histogram_quantile(sf_dir: str) -> pd.DataFrame:
    """p50/p90/p99 per (event_type, day) estimated FROM the histogram
    sketch with Prometheus ``histogram_quantile`` semantics: find the
    bucket holding rank q*total, linearly interpolate inside it
    (lowest bucket interpolates from 0). The float expression below is
    written in the exact association the SQL oracle uses, so values
    hash-match bit-for-bit."""
    df = _hist_partials_df(sf_dir)
    nb = len(_HIST_BOUNDS)
    rows = {"event_type": [], "day": [], "q": [], "quantile": []}
    for (et, day), g in df.groupby(["event_type", "day"], sort=False):
        g = g.sort_values("le_idx", kind="mergesort")
        idxs = g["le_idx"].to_numpy()
        n = g["n"].to_numpy().astype(np.int64)
        cum = np.cumsum(n)
        total = float(cum[-1])
        for q in _HIST_QS:
            r = q * total
            i = int(np.searchsorted(cum, r, side="left"))  # first cum >= r
            j = int(idxs[i])
            lo = 0.0 if j == 0 else float(_HIST_BOUNDS[j - 1])
            hi = float(_HIST_BOUNDS[j])
            cbelow = float(cum[i] - n[i])
            rows["event_type"].append(et)
            rows["day"].append(day)
            rows["q"].append(q)
            rows["quantile"].append(lo + (hi - lo) * (r - cbelow) / float(n[i]))
    return pd.DataFrame(rows)


HISTOGRAM_QUANTILE_SQL = """
WITH counts AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CASE WHEN value <= 5 THEN 0 WHEN value <= 10 THEN 1
              WHEN value <= 20 THEN 2 WHEN value <= 50 THEN 3
              WHEN value <= 100 THEN 4 WHEN value <= 150 THEN 5
              WHEN value <= 200 THEN 6 WHEN value <= 300 THEN 7
              WHEN value <= 400 THEN 8 ELSE 9 END AS idx,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3),
cum AS (
  SELECT event_type, day, idx, n,
         sum(n) OVER (PARTITION BY event_type, day ORDER BY idx) AS cum,
         sum(n) OVER (PARTITION BY event_type, day) AS total
  FROM counts),
bounds AS (SELECT * FROM (VALUES
  (0, 0.0, 5.0), (1, 5.0, 10.0), (2, 10.0, 20.0), (3, 20.0, 50.0),
  (4, 50.0, 100.0), (5, 100.0, 150.0), (6, 150.0, 200.0), (7, 200.0, 300.0),
  (8, 300.0, 400.0), (9, 400.0, 500.0)) AS t(idx, lo, hi)),
sel AS (
  SELECT c.event_type, c.day, q.q,
         q.q * CAST(c.total AS DOUBLE) AS r,
         b.lo, b.hi, CAST(c.n AS DOUBLE) AS n,
         CAST(c.cum - c.n AS DOUBLE) AS cbelow, c.idx
  FROM cum c JOIN bounds b ON b.idx = c.idx
  CROSS JOIN (VALUES (0.5), (0.9), (0.99)) AS q(q)
  WHERE CAST(c.cum AS DOUBLE) >= q.q * CAST(c.total AS DOUBLE))
SELECT event_type, day, q,
       arg_min(lo + (hi - lo) * (r - cbelow) / n, idx) AS quantile
FROM sel GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# SLO multi-window burn rate (SRE error-budget alerting)
# ---------------------------------------------------------------------------


def _slo_partial_arrow(threshold: float):
    def partial(b: pa.Table) -> pa.Table:
        et = pc.dictionary_encode(b["event_type"]).combine_chunks()
        codes = et.indices.to_numpy().astype(np.int64)
        names = et.dictionary
        buck = b["bucket"].combine_chunks().to_numpy()
        val = b["value"].to_numpy(zero_copy_only=False)
        bad = (val > threshold).astype(np.int64)
        ub, binv = np.unique(buck, return_inverse=True)
        key = codes * len(ub) + binv
        order, starts, uk = _grouped_reduceat(key)
        return pa.table(
            {
                "event_type": names.take(pa.array(uk // len(ub))),
                "bucket": pa.array(ub[uk % len(ub)]),
                "n": np.diff(np.r_[starts, len(key)]).astype(np.int64),
                "bad": np.add.reduceat(bad[order], starts),
            }
        )

    return partial


def slo_burn_rate(
    sf_dir: str,
    window_h: int = 24,
    threshold: float = 100.0,
    alert_factor: float = 2.0,
) -> pd.DataFrame:
    """Multi-window SLO burn rate: per (event_type, hour), the 1-hour
    bad-event ratio (value > threshold) over the trailing
    ``window_h``-hour ratio — the SRE error-budget alerting pattern
    (a burn > alert_factor means the budget is burning faster than the
    long window's run rate). Hours with no traffic or an all-good long
    window are omitted (ratio undefined), matching the oracle's WHERE.

    Scale shape: raw events reduce to (type, hour, n, bad) combiner
    partials merged by the bounded-key fan-in tree; the window pass is
    an exact integer prefix-sum over the gap-filled per-type grid
    (#types x #hours rows, independent of event count)."""
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])
    parts = ds.map_batches(_add_hour, batch_format="pyarrow").map_batches(
        _slo_partial_arrow(threshold), batch_format="pyarrow"
    )
    hourly = merge_partials(
        parts, ["event_type", "bucket"], {"n": "sum", "bad": "sum"}
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort")
        grid = pd.date_range(g["bucket"].min(), g["bucket"].max(), freq="h")
        idx = g.set_index("bucket").reindex(grid)
        n = idx["n"].fillna(0).to_numpy(np.int64)
        bad = idx["bad"].fillna(0).to_numpy(np.int64)
        cn, cb = np.cumsum(n), np.cumsum(bad)
        n24 = cn - np.r_[np.zeros(min(window_h, len(cn)), np.int64), cn[:-window_h]][: len(cn)]
        bad24 = cb - np.r_[np.zeros(min(window_h, len(cb)), np.int64), cb[:-window_h]][: len(cb)]
        out = pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "bucket": grid,
                "n": n,
                "bad": bad,
                "n_24": n24,
                "bad_24": bad24,
            }
        )
        out = out[(out["n"] > 0) & (out["bad_24"] > 0)].reset_index(drop=True)
        # written in the oracle's exact float association for bit parity
        out["burn_rate"] = (
            out["bad"].to_numpy(np.float64) / out["n"].to_numpy()
        ) / (out["bad_24"].to_numpy(np.float64) / out["n_24"].to_numpy())
        out["alert"] = out["burn_rate"] > alert_factor
        return out

    return _per_type(hourly, per_type)


SLO_BURN_RATE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) AS bad
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket,
         CAST(coalesce(h.n, 0) AS BIGINT) AS n,
         CAST(coalesce(h.bad, 0) AS BIGINT) AS bad
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket = h.bucket
), win AS (
  SELECT event_type, bucket, n, bad,
         CAST(sum(n) OVER w AS BIGINT) AS n_24,
         CAST(sum(bad) OVER w AS BIGINT) AS bad_24
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket, n, bad, n_24, bad_24,
       (CAST(bad AS DOUBLE) / n) / (CAST(bad_24 AS DOUBLE) / n_24) AS burn_rate,
       (CAST(bad AS DOUBLE) / n) / (CAST(bad_24 AS DOUBLE) / n_24) > 2.0 AS alert
FROM win WHERE n > 0 AND bad_24 > 0
"""


def rollup_hourly_locf(sf_dir: str):
    """LOCF (last-observation-carried-forward) gap-fill of the hourly
    value-sum series per event_type — the staleness-aware fill a
    metrics store applies to gauges that only report on change: missing
    hours repeat the previous observed value and carry an ``age_h``
    staleness column (hours since the last observation; 0 when
    present). Complements the zero-fill (counts) and lerp (numeric)
    gap-fills.

    Exactness: sums travel as int64 cents; both engines emit
    carried/100.0 (one f64 division of an exact integer) — bit-equal.

    Scale shape: raw events reduce through the distributed combiner +
    bounded-key fan-in tree; the fill pass runs per event_type over the
    bounded (type x hour) grid."""
    hourly = _hourly_partials_df(sf_dir)

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        out = _dense_hourly_frame(g, "cents")
        h = (out["bucket"].astype("datetime64[s]").astype("int64") // 3600).to_numpy(np.int64)
        present = out["cents"].notna().to_numpy()
        c = out["cents"].to_numpy(np.float64)
        idx = np.arange(len(out))
        prev = np.maximum.accumulate(np.where(present, idx, -1))  # grid lo is present
        out["value_sum"] = c[prev] / 100.0
        out["age_h"] = (h - h[prev]).astype("int64")
        out["filled"] = (~present).astype("int64")
        return out[["event_type", "bucket", "value_sum", "age_h", "filled"]]

    return fill_grouped_hourly(hourly, fill)


ROLLUP_LOCF_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         sum(CAST(round(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), joined AS (
  SELECT g.event_type, g.bucket,
         CAST(epoch(g.bucket) AS BIGINT) // 3600 AS h,
         hr.cents
  FROM grid g LEFT JOIN hourly hr
    ON g.event_type = hr.event_type AND g.bucket = hr.bucket
), nb AS (
  SELECT event_type, bucket, h, cents,
         last_value(cents IGNORE NULLS) OVER w AS pc,
         last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS) OVER w AS ph
  FROM joined
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, bucket,
       CAST(pc AS DOUBLE) / 100.0 AS value_sum,
       h - ph AS age_h,
       CAST(cents IS NULL AS BIGINT) AS filled
FROM nb
"""


def daily_mann_kendall(sf_dir: str):
    """Mann-Kendall nonparametric trend test per event_type over the
    gap-filled DAILY counts (summed from the gap-filled hourly grid):
    S = sum over day pairs i<j of sign(y_j - y_i), Kendall's tau-b
    (tie-corrected), and the normal-approximation z statistic with the
    standard tie-corrected variance — the robust "is this series
    trending" companion to the parametric OLS fit (hourly_trend).

    Exactness: S, the tie counts and both variance terms are exact
    int64; tau_b and z are evaluated in the same f64 operation order in
    both engines (one product, one sqrt, one division) — bit-equal.
    Types whose days are all tied (n0 == n1) are excluded identically.

    Scale shape: raw events -> grid is the distributed combiner + tree
    merge; the O(days^2) pair scan runs vectorized per type over the
    bounded day span (150 days -> 11k pairs)."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def mk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort")
        d = g["bucket"].to_numpy().astype("datetime64[D]")
        ud, inv = np.unique(d, return_inverse=True)
        y = np.zeros(len(ud), dtype=np.int64)
        np.add.at(y, inv, g["n_events"].to_numpy(np.int64))
        n = len(ud)
        empty = pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "n_days": pd.Series(dtype="int64"),
                "s": pd.Series(dtype="int64"),
                "tau_b": pd.Series(dtype="float64"),
                "z": pd.Series(dtype="float64"),
            }
        )
        if n < 2:
            return empty
        diff_sign = np.sign(y[None, :] - y[:, None])
        s = int(diff_sign[np.triu_indices(n, 1)].sum())
        _, t = np.unique(y, return_counts=True)
        t = t.astype(np.int64)
        n0 = n * (n - 1) // 2
        n1 = int((t * (t - 1) // 2).sum())
        if n0 <= n1:  # all days tied: tau/z undefined
            return empty
        tau_b = float(s) / np.sqrt(float(n0 - n1) * float(n0))
        var_num = n * (n - 1) * (2 * n + 5) - int((t * (t - 1) * (2 * t + 5)).sum())
        var_s = float(var_num) / 18.0
        if s > 0:
            z = float(s - 1) / np.sqrt(var_s)
        elif s < 0:
            z = float(s + 1) / np.sqrt(var_s)
        else:
            z = 0.0
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_days": [int(n)],
                "s": [s],
                "tau_b": [tau_b],
                "z": [z],
            }
        )

    return _per_type(hourly, mk)


MANN_KENDALL_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filledh AS (
  SELECT g.event_type, g.bucket, CAST(coalesce(h.n_events, 0) AS BIGINT) AS y
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket = h.bucket
), daily AS (
  SELECT event_type, date_trunc('day', bucket) AS day,
         CAST(sum(y) AS BIGINT) AS y
  FROM filledh GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
), svals AS (
  SELECT event_type, CAST(sum(sg) AS BIGINT) AS s FROM pairs GROUP BY 1
), nn AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1
), ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tb
  FROM (SELECT event_type, y, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
)
SELECT n.event_type, n.n AS n_days, v.s AS s,
       CAST(v.s AS DOUBLE)
         / sqrt(CAST(n.n * (n.n - 1) // 2 - t.n1 AS DOUBLE)
                * CAST(n.n * (n.n - 1) // 2 AS DOUBLE)) AS tau_b,
       CASE
         WHEN v.s > 0 THEN CAST(v.s - 1 AS DOUBLE)
           / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tb AS DOUBLE) / 18.0)
         WHEN v.s < 0 THEN CAST(v.s + 1 AS DOUBLE)
           / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - t.tb AS DOUBLE) / 18.0)
         ELSE 0.0
       END AS z
FROM nn n
JOIN svals v ON n.event_type = v.event_type
JOIN ties t ON n.event_type = t.event_type
WHERE n.n >= 2 AND n.n * (n.n - 1) // 2 > t.n1
"""


def hourly_seasonal_decompose(sf_dir: str):
    """Classical additive seasonal decomposition of the gap-filled
    hourly counts per event_type: trend = centered 25-hour moving
    average (full windows only), seasonal = per hour-of-day mean of the
    detrended values (uncentered, documented spec), residual =
    (y - trend) - seasonal. The moving-average + seasonal-means
    construction is the classical "decompose" step STL refines.

    Exactness: the moving window sum and the per-hod numerators stay
    exact int64 (seasonal = (25*sum(y) - sum(movsum)) / (25*count) —
    a single f64 division of exact integers; trend = movsum/25.0), and
    the residual is evaluated as (y - trend) - seasonal in both engines
    — bit-equal, no rounding tolerance.

    Scale shape: distributed gap-fill reduction; the decomposition is a
    bounded per-type vectorized pass (cumsum window + 24-slot fold)."""
    hourly = rollup_hourly_gapfill(sf_dir)

    def decompose(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        y = g["n_events"].to_numpy(np.int64)
        n = len(y)
        cols = ["event_type", "bucket", "n_events", "trend", "seasonal", "resid"]
        if n < 25:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in zip(
                cols, ["object", "datetime64[us]", "int64", "float64", "float64", "float64"])})
        cs = np.concatenate([[0], np.cumsum(y)])
        movsum = cs[25:] - cs[:-25]  # full 25h windows, centers 12..n-13
        center = np.arange(12, n - 12)
        hod = g["bucket"].dt.hour.to_numpy(np.int64)[center]
        yy = y[center]
        s_y = np.zeros(24, dtype=np.int64)
        s_m = np.zeros(24, dtype=np.int64)
        cnt = np.zeros(24, dtype=np.int64)
        np.add.at(s_y, hod, yy)
        np.add.at(s_m, hod, movsum)
        np.add.at(cnt, hod, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            seas_tab = (25 * s_y - s_m).astype(np.float64) / (25 * cnt).astype(np.float64)
        trend = movsum.astype(np.float64) / 25.0
        seasonal = seas_tab[hod]
        resid = (yy.astype(np.float64) - trend) - seasonal
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "bucket": g["bucket"].iloc[center].to_numpy(),
                "n_events": yy,
                "trend": trend,
                "seasonal": seasonal,
                "resid": resid,
            }
        )

    return _per_type(hourly, decompose)


SEASONAL_DECOMPOSE_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM hourly GROUP BY 1
), grid AS (
  SELECT b.event_type, unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS bucket
  FROM bounds b
), filled AS (
  SELECT g.event_type, g.bucket, CAST(coalesce(h.n_events, 0) AS BIGINT) AS y
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.bucket = h.bucket
), win AS (
  SELECT event_type, bucket, y,
         CAST(sum(y) OVER w AS BIGINT) AS movsum,
         count(*) OVER w AS wcnt,
         CAST(extract(hour FROM bucket) AS BIGINT) AS hod
  FROM filled
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), full_win AS (
  SELECT * FROM win WHERE wcnt = 25
), seas AS (
  SELECT event_type, hod,
         CAST(25 * sum(y) - sum(movsum) AS DOUBLE)
           / CAST(25 * count(*) AS DOUBLE) AS seasonal
  FROM full_win GROUP BY 1, 2
), trended AS (
  SELECT f.event_type, f.bucket, f.y, f.hod,
         CAST(f.movsum AS DOUBLE) / 25.0 AS trend
  FROM full_win f
)
SELECT t.event_type, t.bucket, t.y AS n_events,
       t.trend AS trend, s.seasonal AS seasonal,
       (CAST(t.y AS DOUBLE) - t.trend) - s.seasonal AS resid
FROM trended t JOIN seas s
  ON t.event_type = s.event_type AND t.hod = s.hod
"""


def profile_dtw_anomaly(sf_dir: str, window: int = 4, max_it: int = 10, k: int = 5):
    """DTW daily-profile anomaly detection — the engine's own elastic
    kernels applied to the events table: each full day's 24-hour
    gap-filled count profile is z-normalized (shape, not volume), a
    DBA barycenter per event_type summarizes the typical diurnal
    shape (seeded at the first full day, reference dba_loop
    semantics), and each day is scored by its banded DTW distance to
    the barycenter; the k most anomalous days per type are emitted.
    Golden verified against the reference dtaidistance library
    (dtw.distance + dtw_barycenter.dba_loop) in tools/make_goldens.py.

    Scale shape: raw events -> grid is the distributed combiner +
    fan-in tree; profiles are key-space-bounded (#types x #days x 24)
    so the DBA/DTW pass is a bounded per-type vectorized loop — the
    same structure the flagship runs distributed when the key-space
    is unbounded."""
    from ..kernels.dba import dba_loop
    from ..kernels.elastic import distance as dtw_distance
    from ..settings import DTWSettings

    hourly = rollup_hourly_gapfill(sf_dir)
    _guard_driver_rows(len(hourly), "profile_dtw_anomaly grid")
    settings = DTWSettings(window=window)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bucket", kind="mergesort").reset_index(drop=True)
        day = g["bucket"].dt.floor("D")
        cols = ["event_type", "day", "rnk", "dist"]
        profs, days = [], []
        for d, gd in g.groupby(day, sort=True):
            if len(gd) != 24:
                continue  # partial first/last day
            x = gd["n_events"].to_numpy(np.float64)
            sd = x.std()
            if sd == 0:
                continue  # flat day: shape undefined
            profs.append((x - x.mean()) / sd)
            days.append(d)
        if not profs:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "day": pd.Series(dtype="datetime64[us]"),
                    "rnk": pd.Series(dtype="int64"),
                    "dist": pd.Series(dtype="float64"),
                }
            )
        # z-normalized count profiles carry EXACT float DP ties; the
        # batched kernel resolves them reference-identically (verified
        # row patch + sqrt-space tie rule, see dba_partial docstring)
        center = dba_loop(profs, c=profs[0], max_it=max_it, thr=0.001, settings=settings)
        dists = np.array([dtw_distance(p, center, settings) for p in profs])
        order = np.lexsort((np.arange(len(dists)), -dists))[:k]  # d desc, day asc
        return pd.DataFrame(
            {
                "event_type": g["event_type"].iloc[0],
                "day": [days[i] for i in order],
                "rnk": np.arange(1, len(order) + 1, dtype=np.int64),
                "dist": dists[order],
            }
        )[cols]

    return _per_type(hourly, score)


def rate_limit_audit(sf_dir: str, quota_per_day: int = 2, k: int = 20):
    """Rate-limit / abuse audit: count events per (user, day), flag
    days above the quota, and emit the top-k offending users by number
    of over-quota days (ties: higher peak daily rate, then lower
    user_id). The per-(user, day) key-space is unbounded, so the
    physical plan is the unbounded-key one: per-block Arrow combiner
    partials -> Ray hash groupby-aggregate -> per-block pre-top-k ->
    global sort.limit — the driver never holds the (user, day) table.

    Exactness: counts are exact int64; the ranking is integer-ordered.
    An input where nobody exceeds the quota yields an empty result
    (every stage is empty-block-safe)."""
    from ray.data.aggregate import Max, Sum

    ds = read_events(sf_dir, columns=["ts", "user_id"])
    cols = {"user_id": "int64", "days_over": "int64", "peak_per_day": "int64"}

    def empty() -> pd.DataFrame:
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b["ts"], unit="day").combine_chunks().to_numpy()
        uid = b["user_id"].combine_chunks().to_numpy()
        ud, dinv = np.unique(day, return_inverse=True)
        key = uid * len(ud) + dinv
        _, starts, uk = _grouped_reduceat(key)
        return pa.table(
            {
                "user_id": (uk // len(ud)).astype(np.int64),
                "day": pa.array(ud[uk % len(ud)]),
                "n": np.diff(np.r_[starts, len(key)]).astype(np.int64),
            }
        )

    per_day = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def over(b: pa.Table) -> pa.Table:
        if "n" not in b.column_names or not len(b):
            return pa.Table.from_pandas(empty(), preserve_index=False)
        b = b.filter(pc.greater(b["n"], quota_per_day))
        if not len(b):
            return pa.Table.from_pandas(empty(), preserve_index=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order, starts, keys = _arrow_grouped(b, ["user_id"])
        sn = n[order]
        return pa.table(
            {
                "user_id": keys["user_id"].astype(np.int64),
                "days_over": _group_sizes(order, starts),
                "peak_per_day": np.maximum.reduceat(sn, starts)
                if len(starts)
                else sn[:0],
            }
        )

    offenders = (
        per_day.map_batches(over, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Sum("days_over", alias_name="days_over"),
            Max("peak_per_day", alias_name="peak_per_day"),
        )
    )

    order_cols = ["days_over", "peak_per_day", "user_id"]

    def pre_topk(b: pa.Table) -> pa.Table:
        if not len(b) or "days_over" not in b.column_names:
            return pa.table({c: pa.array([], type=pa.int64()) for c in ("user_id", "days_over", "peak_per_day")})
        return _pre_topk_take(
            b, [("days_over", True), ("peak_per_day", True), ("user_id", False)], k
        )

    out = offenders.map_batches(pre_topk, batch_format="pyarrow").to_pandas()
    if not len(out):
        return pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("user_id", "days_over", "peak_per_day")}
        )
    out = (
        out.sort_values(order_cols, ascending=[False, False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out[["user_id", "days_over", "peak_per_day"]]


RATE_LIMIT_SQL_TMPL = """
WITH per_day AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), offenders AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS days_over,
         CAST(max(n) AS BIGINT) AS peak_per_day
  FROM per_day WHERE n > {quota}
  GROUP BY 1
)
SELECT user_id, days_over, peak_per_day
FROM offenders
ORDER BY days_over DESC, peak_per_day DESC, user_id ASC
LIMIT {k}
"""

RATE_LIMIT_SQL = RATE_LIMIT_SQL_TMPL.format(quota=2, k=20)


def value_benford(sf_dir: str):
    """Benford first-digit audit over event values — the classic
    fabricated-data / instrumentation-bug screen: distribution of the
    leading digit of |value| in cents (values with |cents| = 0
    excluded), per event_type, with the Benford expectation
    log10(1 + 1/d) and the absolute deviation.

    Exactness: digit counts are exact int64 from integer cents; the
    share and expectation are single f64 divisions / log10 calls in
    the same operation order both sides.

    Scale shape: map-only per-block (type, digit) bincount partials
    (bounded key-space: #types x 9) merged by the fan-in tree."""
    ds = read_events(sf_dir, columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        et = pc.dictionary_encode(b["event_type"]).combine_chunks()
        codes = et.indices.to_numpy().astype(np.int64)
        cents = np.abs(_cents(b["value"].to_numpy(zero_copy_only=False)))
        keep = cents > 0
        codes = codes[keep]
        c = cents[keep]
        # leading digit via string-free arithmetic: divide by 10 until < 10
        while c.size and c.max() >= 10:
            big = c >= 10
            c = np.where(big, c // 10, c)
        key = codes * 9 + (c - 1)
        _, starts, uk = _grouped_reduceat(key)
        return pa.table(
            {
                "event_type": et.dictionary.take(pa.array(uk // 9)),
                "digit": (uk % 9 + 1).astype(np.int64),
                "n": np.diff(np.r_[starts, len(key)]).astype(np.int64),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow")
    df = merge_partials(parts, ["event_type", "digit"], {"n": "sum"})

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        # dense 1..9 grid so absent digits show share 0
        out = pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64)})
        out["event_type"] = g["event_type"].iloc[0]
        out = out.merge(g[["digit", "n"]], on="digit", how="left")
        out["n"] = out["n"].fillna(0).astype("int64")
        total = np.int64(out["n"].sum())
        out["share"] = out["n"].to_numpy(np.float64) / np.float64(total)
        out["benford"] = np.log10(1.0 + 1.0 / out["digit"].to_numpy(np.float64))
        out["abs_dev"] = np.abs(out["share"].to_numpy() - out["benford"].to_numpy())
        return out[["event_type", "digit", "n", "share", "benford", "abs_dev"]]

    return _per_type(df, finalize)


VALUE_BENFORD_SQL = """
WITH cents AS (
  SELECT event_type, abs(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events
), digits AS (
  SELECT event_type,
         CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM cents WHERE c > 0
), counts AS (
  SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
  FROM digits GROUP BY 1, 2
), totals AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM counts GROUP BY 1
), expect(digit, benford) AS (
  -- log10(1 + 1/d) as shortest-round-trip double literals so both
  -- engines carry the IDENTICAL doubles (libm log10 differs by 1 ulp
  -- between numpy and DuckDB for some digits)
  VALUES (1, 0.3010299956639812),\n         (2, 0.17609125905568124),\n         (3, 0.12493873660829992),\n         (4, 0.09691001300805642),\n         (5, 0.07918124604762482),\n         (6, 0.06694678963061323),\n         (7, 0.05799194697768673),\n         (8, 0.05115252244738129),\n         (9, 0.04575749056067514)
), grid AS (
  SELECT t.event_type, e.digit, e.benford, t.total
  FROM totals t CROSS JOIN expect e
)
SELECT g.event_type, g.digit,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n,
       CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(g.total AS DOUBLE) AS share,
       g.benford AS benford,
       abs(CAST(coalesce(c.n, 0) AS DOUBLE) / CAST(g.total AS DOUBLE) - g.benford) AS abs_dev
FROM grid g LEFT JOIN counts c
  ON g.event_type = c.event_type AND g.digit = c.digit
"""


def _add_day_as_bucket(batch: pa.Table) -> pa.Table:
    return batch.append_column("bucket", pc.floor_temporal(batch["ts"], unit="day"))


_CUBE_SENTINEL_DAY = pd.Timestamp("1970-01-01").as_unit("us")


def grouping_sets_cube(sf_dir: str) -> pd.DataFrame:
    """CUBE(event_type, day) over events: all four grains ((type, day),
    (type), (day), ()) of count / exact-cent sum / min / max from ONE
    scan of the data.

    Physical plan: only the FINEST grain (event_type x day -- bounded
    key-space) touches the raw table, as per-batch Arrow combiner
    partials merged by the bounded-key fan-in tree; the three coarser
    grains are re-rollups of that merged frame (sums of sums, min of
    mins -- associative and exact on integer cents), so the cube costs
    one pass instead of one all-to-all per grain. At 100 TB the scan
    dominates and the re-rollup is O(types x days) driver work behind
    the loud-fail guard. Grouped-out dimensions are emitted as
    'ALL' / the 1970-01-01 sentinel plus a grouping_id in the SQL
    GROUPING() convention (grouping(event_type)*2 + grouping(day))."""
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])
    parts = ds.map_batches(_add_day_as_bucket, batch_format="pyarrow").map_batches(
        _hourly_partial_arrow, batch_format="pyarrow"
    )
    fine = merge_partials(
        parts,
        ["event_type", "bucket"],
        {"n_events": "sum", "cents": "sum", "value_min": "min", "value_max": "max"},
    )
    _guard_driver_rows(len(fine), "grouping_sets_cube")
    fine = fine.rename(columns={"bucket": "day"})
    fine["day"] = fine["day"].astype("datetime64[us]")
    spec = dict(
        n_events=("n_events", "sum"),
        cents=("cents", "sum"),
        value_min=("value_min", "min"),
        value_max=("value_max", "max"),
    )
    g_et = fine.groupby("event_type", as_index=False).agg(**spec)
    g_et["day"] = _CUBE_SENTINEL_DAY
    g_day = fine.groupby("day", as_index=False).agg(**spec)
    g_day["event_type"] = "ALL"
    g_all = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "day": [_CUBE_SENTINEL_DAY],
            "n_events": [int(fine["n_events"].sum())],
            "cents": [int(fine["cents"].sum())],
            "value_min": [fine["value_min"].min()],
            "value_max": [fine["value_max"].max()],
        }
    )
    outs = []
    for df, gid in ((fine, 0), (g_et, 1), (g_day, 2), (g_all, 3)):
        o = df.copy()
        o["grouping_id"] = np.int64(gid)
        o["n_events"] = o["n_events"].astype("int64")
        o["value_sum"] = o["cents"] / 100.0
        outs.append(
            o[
                [
                    "event_type",
                    "day",
                    "grouping_id",
                    "n_events",
                    "value_sum",
                    "value_min",
                    "value_max",
                ]
            ]
        )
    out = pd.concat(outs, ignore_index=True)
    out["day"] = out["day"].astype("datetime64[us]")
    return out


GROUPING_SETS_CUBE_SQL = """
WITH base AS (
  SELECT event_type,
         date_trunc('day', ts) AS day,
         value,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(day, TIMESTAMP '1970-01-01') AS day,
       CAST(grouping(event_type) * 2 + grouping(day) AS BIGINT) AS grouping_id,
       CAST(count(*) AS BIGINT) AS n_events,
       sum(cents) / 100.0 AS value_sum,
       min(value) AS value_min,
       max(value) AS value_max
FROM base
GROUP BY CUBE (event_type, day)
"""
