"""Scan-based tier-0 rollup: combiner partials instead of a data shuffle.

The map_groups formulation (stages.rollup.rollup_base_tier) shuffles the
full token table to co-locate groups. At 100 TB that shuffle is the
bottleneck — and it is unnecessary, because every per-group quantity the
tier needs is an associative partial:

  aggregates   count/sum/min/max of integer tokens   (order-free exact)
  DBA sweep    (sum[t], count[t]) accumulators       (order-free exact
               for integer members; kernels/dba_scan.py)

So tier 0 runs as rounds of *scans*:

  round C   map_batches partial stats per (source, bucket) fragment
            -> raw-task fan-in tree merge (_ref_tree_reduce) -> bounded
            driver fold -> continuous aggregates + initial centers
            (tokens of the min-doc_id row, the reference dba_loop
            c=None seed)
  round k   broadcast active centers (ray.put, fetched once per WORKER
            per round — _WORKER_CENTERS_CACHE)
            -> map_batches: cross-group batched DP partials
            -> distributed fan-in tree merge of (sums, counts) vectors
            -> finalize new centers; groups with mean abs change <= thr
            freeze (reference dba_loop convergence, dtw_barycenter.py:149-160)

Only (key, accumulator) rows ever shuffle — KB-scale per block — while
the token data streams through map_batches untouched. Skew: a hot
(source, bucket) group no longer lands in one task; its members are
swept wherever their blocks are and the partials merge, which is the
salting story with salt = physical block (exact, not approximate).

Scale note: the driver never folds more than _MERGE_THRESHOLD_ROWS
partial rows (the tree merge fans the rest in distributedly), and the
final merged state is K x len(center) floats — K = #groups is
independent of row count. For key-spaces too large for one driver,
range-partition the keys and run the rounds per key-shard — the round
structure is unchanged.

Output is bit-identical to rollup_base_tier / the single-process oracle
(asserted in tests/test_rollup.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import pandas as pd

from ..kernels.dba_scan import scan_dba_partials
from ..settings import DTWSettings
from .rollup import RollupConfig


def _key_of(src, bucket) -> Tuple[str, int]:
    return (src, int(bucket))


def _pack_centers(centers: Dict) -> Tuple[list, np.ndarray, np.ndarray]:
    """Dict -> (keys, offsets, flat) for cheap broadcast/deserialize:
    two numpy arrays unpickle in O(1) passes vs thousands of objects."""
    keys = list(centers.keys())
    offsets = np.zeros(len(keys) + 1, dtype=np.int64)
    for n, k in enumerate(keys):
        offsets[n + 1] = offsets[n] + len(centers[k])
    flat = np.empty(int(offsets[-1]), dtype=np.float64)
    for n, k in enumerate(keys):
        flat[offsets[n] : offsets[n + 1]] = centers[k]
    return keys, offsets, flat


def _unpack_centers(packed) -> Dict:
    keys, offsets, flat = packed
    return {k: flat[offsets[n] : offsets[n + 1]] for n, k in enumerate(keys)}


def _batch_arrays(batch) -> Tuple[list, list]:
    """pyarrow batch -> (group keys, token views) without pandas
    object-column conversion; token views are zero-copy slices of the
    Arrow values buffer."""
    import pyarrow as pa

    tok = batch.column("tokens")
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    offs = tok.offsets.to_numpy()
    flat = tok.values.to_numpy().astype(np.float64)
    seqs = [flat[offs[i] : offs[i + 1]] for i in range(len(tok))]
    srcs = batch.column("source").to_pylist()
    buckets = batch.column("bucket").to_numpy()
    keys = [(s, int(b)) for s, b in zip(srcs, buckets)]
    return keys, seqs


def _stats_partial(batch) -> pd.DataFrame:
    """Vectorized per-fragment stats, emitted as ONE packed row per block.

    Per-row token sum/min/max come from reduceat over the Arrow offsets;
    a pandas groupby folds rows into per-(source, bucket) partials. The
    partials then leave the task as a handful of binary blobs (pickled
    key list + fixed-layout numeric arrays + concatenated min-doc token
    vectors) instead of #keys rows with Python-list token columns: at
    sf0.1 that is 64 rows total vs ~215k object-typed rows, which was
    the dominant cost of the stats phase (driver-observed 11-48 s; now
    ~1 s).

    Zero-length token rows are guarded (reduceat would otherwise read
    the NEXT row's first element / raise at the tail): empty rows get
    sum 0, min +inf, max -inf, and only non-empty row starts are passed
    to reduceat — consecutive non-empty starts still delimit exactly
    one row's tokens because the empty rows between them contribute no
    elements."""
    import pickle

    import pyarrow as pa

    tok = batch.column("tokens")
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    offs = tok.offsets.to_numpy()
    flat = tok.values.to_numpy()
    n = len(tok)
    row_len = np.diff(offs)
    nonempty = row_len > 0
    row_sum = np.zeros(n, dtype=np.int64)
    row_min = np.full(n, np.inf)
    row_max = np.full(n, -np.inf)
    if flat.size:
        starts = offs[:-1][nonempty]
        row_sum[nonempty] = np.add.reduceat(flat.astype(np.int64), starts)
        row_min[nonempty] = np.minimum.reduceat(flat, starts)
        row_max[nonempty] = np.maximum.reduceat(flat, starts)
    df = pd.DataFrame(
        {
            "source": batch.column("source").to_pandas(),
            "bucket": batch.column("bucket").to_numpy(),
            "doc_id": batch.column("doc_id").to_pandas(),
            "row_len": row_len,
            "row_sum": row_sum,
            "row_min": row_min,
            "row_max": row_max,
            "row_idx": np.arange(n),
        }
    )
    g = df.groupby(["source", "bucket"], sort=False)
    out = g.agg(
        agg_count=("row_len", "size"),
        agg_n_tok_sum=("row_len", "sum"),
        agg_token_sum=("row_sum", "sum"),
        agg_token_min=("row_min", "min"),
        agg_token_max=("row_max", "max"),
        min_pos=("doc_id", "idxmin"),
    ).reset_index()
    min_idx = df["row_idx"].iloc[out["min_pos"]].to_numpy()
    keys = list(zip(out["source"], (int(b) for b in out["bucket"])))
    # integer aggregates travel as int64 (a float64 round-trip would
    # silently lose exactness above 2^53, breaking the bit-exact
    # integer-sum tier invariant at extreme scale); min/max stay f64
    nums_int = np.stack(
        [
            out["agg_count"].to_numpy(np.int64),
            out["agg_n_tok_sum"].to_numpy(np.int64),
            out["agg_token_sum"].to_numpy(np.int64),
        ]
    )
    nums_f = np.stack(
        [
            out["agg_token_min"].to_numpy(np.float64),
            out["agg_token_max"].to_numpy(np.float64),
        ]
    )
    min_ids = df["doc_id"].iloc[out["min_pos"]].tolist()
    tok_lens = row_len[min_idx]
    tok_offs = np.zeros(len(min_idx) + 1, dtype=np.int64)
    np.cumsum(tok_lens, out=tok_offs[1:])
    tok_flat = np.empty(int(tok_offs[-1]), dtype=np.float64)
    for p, i in enumerate(min_idx):
        tok_flat[tok_offs[p] : tok_offs[p + 1]] = flat[offs[i] : offs[i + 1]]
    return pd.DataFrame(
        {
            "keys": [pickle.dumps((keys, min_ids))],
            "nums_int": [nums_int.tobytes()],
            "nums_f": [nums_f.tobytes()],
            "tok_offs": [tok_offs.tobytes()],
            "tok_flat": [tok_flat.tobytes()],
        }
    )


# Per-worker-process cache of the current round's unpacked centers:
# a worker runs many sweep tasks per round (blocks/cpus waves), and
# re-fetching + re-unpacking the broadcast per task measured ~0.17 s
# each under concurrent plasma access at sf0.5 (38 s of setup across
# one round). Keyed by ObjectRef so a new round's broadcast evicts the
# previous one (bounded memory: exactly one packed center set).
_WORKER_CENTERS_CACHE: Dict = {}


def _make_sweep_fn(centers_ref, dtw: DTWSettings):
    """Stateless sweep task: centers fetched from the object store ONCE
    PER WORKER PROCESS per round (broadcast via ray.put, cached in
    _WORKER_CENTERS_CACHE across the worker's tasks, never shipped per
    batch).

    Each task emits ONE row whose payload is a SPARSE slice of the
    broadcast center layout: the ascending slot indices of the groups
    the fragment touched plus their concatenated float64-sum /
    int64-count segments. Fan-in merges and the final driver fold
    scatter-add the segments (exact — integer member values sum in any
    order); the layout itself always comes from the round's broadcast,
    never travels in partial rows. Sparse emission bounds the exchange
    volume by the data a task actually saw instead of key-space x
    task-count (the dense full-layout blobs measured 4.5 GB/round at
    sf0.5; at 100-TB key-spaces a task touches a vanishing fraction of
    the keys)."""

    def sweep(batch) -> pd.DataFrame:
        import time as _time

        t0 = _time.perf_counter()
        packed, centers = _worker_packed(centers_ref)
        pkeys, poffsets, pflat = packed
        keys, seqs = _batch_arrays(batch)
        t1 = _time.perf_counter()
        # order_free: member token values are integers, so the width-
        # bucketed batching's regrouped bin additions are exact
        parts = scan_dba_partials(keys, seqs, centers, dtw, order_free=True)
        t2 = _time.perf_counter()
        # SPARSE emission: only the groups this fragment touched leave
        # the task — (ascending slot index list, concatenated per-group
        # sum/count segments). At 100-TB key-spaces a task sees a tiny
        # slice of the keys, so the dense full-layout blob (key-space x
        # center-len floats PER TASK) was the exchange-volume bottleneck
        # of the only wide step (measured 4.5 GB/round at sf0.5).
        slot = {k: n for n, k in enumerate(pkeys)}
        gs = np.array(sorted(slot[g] for g in parts), dtype=np.int64)
        glens = np.diff(poffsets)
        seg_off = np.zeros(len(gs) + 1, dtype=np.int64)
        np.cumsum(glens[gs], out=seg_off[1:])
        seg_sums = np.empty(int(seg_off[-1]), dtype=np.float64)
        seg_counts = np.empty(int(seg_off[-1]), dtype=np.int64)
        for p, n in enumerate(gs):
            s_, c_ = parts[pkeys[n]]
            seg_sums[seg_off[p] : seg_off[p + 1]] = s_
            seg_counts[seg_off[p] : seg_off[p + 1]] = c_
        return pd.DataFrame(
            {
                "gidx": [gs.tobytes()],
                "sums": [seg_sums.tobytes()],
                "counts": [seg_counts.tobytes()],
                "task_kernel_s": [t2 - t1],
                "task_kernel_max": [t2 - t1],
                "task_setup_s": [t1 - t0],
                "task_members": [len(seqs)],
            }
        )

    return sweep


def _worker_packed(centers_ref):
    """Fetch + unpack the round's broadcast centers once per worker
    process (cached across the worker's tasks; a new round's ref evicts
    the previous entry)."""
    import ray

    cache_key = centers_ref.hex() if hasattr(centers_ref, "hex") else id(centers_ref)
    cached = _WORKER_CENTERS_CACHE.get(cache_key)
    if cached is None:
        packed = ray.get(centers_ref)
        cached = (packed, _unpack_centers(packed))
        _WORKER_CENTERS_CACHE.clear()
        _WORKER_CENTERS_CACHE[cache_key] = cached
    return cached


def _flat_ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate [starts[i], starts[i]+lens[i]) ranges, vectorized."""
    lens = lens.astype(np.int64)
    n = int(lens.sum())
    if n == 0:
        return np.empty(0, dtype=np.int64)
    base = np.repeat(starts - np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    return base + np.arange(n, dtype=np.int64)


def _scatter_sparse_rows(
    batch: pd.DataFrame,
    poffsets: np.ndarray,
    out_sums: np.ndarray,
    out_counts: np.ndarray,
) -> None:
    """Accumulate sparse sweep-partial rows into a FULL-layout pair of
    accumulators (exact: integer member values sum in any order)."""
    glens = np.diff(poffsets)
    for gb, sb, cb in zip(batch["gidx"], batch["sums"], batch["counts"]):
        gs = np.frombuffer(gb, dtype=np.int64)
        if not len(gs):
            continue
        dst = _flat_ranges(poffsets[gs], glens[gs])
        out_sums[dst] += np.frombuffer(sb, dtype=np.float64)
        out_counts[dst] += np.frombuffer(cb, dtype=np.int64)


def _make_merge_sweep(centers_ref):
    """Associative fan-in of sparse sweep partial rows: scatter-add the
    segments of up to _MERGE_FANIN rows into one union-sparse row.
    The group layout comes from the round's broadcast (worker-cached) —
    partial rows never carry it."""

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        packed, _ = _worker_packed(centers_ref)
        _, poffsets, _ = packed
        glens = np.diff(poffsets)
        union = np.unique(
            np.concatenate([np.frombuffer(b, dtype=np.int64) for b in batch["gidx"]])
        )
        seg_off = np.zeros(len(union) + 1, dtype=np.int64)
        np.cumsum(glens[union], out=seg_off[1:])
        S = np.zeros(int(seg_off[-1]), dtype=np.float64)
        C = np.zeros(int(seg_off[-1]), dtype=np.int64)
        pos_of = np.zeros(len(glens), dtype=np.int64)
        pos_of[union] = np.arange(len(union))
        for gb, sb, cb in zip(batch["gidx"], batch["sums"], batch["counts"]):
            gs = np.frombuffer(gb, dtype=np.int64)
            if not len(gs):
                continue
            dst = _flat_ranges(seg_off[pos_of[gs]], glens[gs])
            S[dst] += np.frombuffer(sb, dtype=np.float64)
            C[dst] += np.frombuffer(cb, dtype=np.int64)
        return pd.DataFrame(
            {
                "gidx": [union.tobytes()],
                "sums": [S.tobytes()],
                "counts": [C.tobytes()],
                "task_kernel_s": [float(batch["task_kernel_s"].sum())],
                "task_kernel_max": [float(batch["task_kernel_max"].max())],
                "task_setup_s": [float(batch["task_setup_s"].sum())],
                "task_members": [int(batch["task_members"].sum())],
            }
        )

    return merge


LAST_TIMINGS: Dict[str, float] = {}

import os as _os

# CPUs reserved per sweep task (tunable; 2 halves concurrency on
# SMT hosts where 1-per-thread thrashes the memory system)
_SWEEP_NUM_CPUS = float(_os.environ.get("DTAIR_SWEEP_NUM_CPUS", "1"))
# target sweep blocks per CPU (higher = finer straggler splitting at
# the cost of smaller per-task batches for the vectorized kernel)
_BLOCKS_PER_CPU = float(_os.environ.get("DTAIR_BLOCKS_PER_CPU", "0"))
# Tree-merge knobs: partial rows (one per input block) are merged by
# distributed map_batches rounds of fan-in _MERGE_FANIN until at most
# _MERGE_THRESHOLD_ROWS remain for the final driver fold — the driver
# never holds more than that many partial rows, regardless of cluster
# size (round-2 review: the all-blocks driver merge was the one
# remaining single-node structure in the flagship path). The merges
# are associative and exact (int64 counters, f64 sums of integer
# member values), so the tree shape cannot change any result bit.
_MERGE_FANIN = int(_os.environ.get("DTAIR_MERGE_FANIN", "16"))
_MERGE_THRESHOLD_ROWS = int(_os.environ.get("DTAIR_MERGE_THRESHOLD", "8"))
# Key-shard fallback: the per-round merged state is keys x center
# floats on the driver. When the (source, bucket) key-space can exceed
# _MAX_DRIVER_KEYS, the key space hash-partitions into shards and the
# same rounds run per shard (per-key independence makes the output
# bit-identical under ANY key partition) — the last single-driver
# structure in the flagship path, sharded behind this threshold
# (round-3 review #2). Rows >= keys always, so the cheap row count
# gates the (only-at-scale) distinct-key planning pass.
_MAX_DRIVER_KEYS = int(_os.environ.get("DTAIR_MAX_DRIVER_KEYS", "2000000"))


def _fold_stats_rows(stats_parts: pd.DataFrame) -> Dict[Tuple, dict]:
    """Associative fold of packed stats-partial rows into a per-key
    dict (shared by the driver fold and the tree-merge rounds)."""
    import pickle

    merged: Dict[Tuple, dict] = {}
    for kblob, niblob, nfblob, oblob, fblob in zip(
        stats_parts["keys"],
        stats_parts["nums_int"],
        stats_parts["nums_f"],
        stats_parts["tok_offs"],
        stats_parts["tok_flat"],
    ):
        keys, min_ids = pickle.loads(kblob)
        nums_int = np.frombuffer(niblob, dtype=np.int64).reshape(3, len(keys))
        nums_f = np.frombuffer(nfblob, dtype=np.float64).reshape(2, len(keys))
        tok_offs = np.frombuffer(oblob, dtype=np.int64)
        tok_flat = np.frombuffer(fblob, dtype=np.float64)
        for p, k in enumerate(keys):
            m = merged.get(k)
            if m is None:
                merged[k] = {
                    "agg_count": int(nums_int[0, p]),
                    "agg_n_tok_sum": int(nums_int[1, p]),
                    "agg_token_sum": int(nums_int[2, p]),
                    "agg_token_min": nums_f[0, p],
                    "agg_token_max": nums_f[1, p],
                    "min_doc_id": min_ids[p],
                    "min_doc_tokens": tok_flat[tok_offs[p] : tok_offs[p + 1]],
                }
            else:
                m["agg_count"] += int(nums_int[0, p])
                m["agg_n_tok_sum"] += int(nums_int[1, p])
                m["agg_token_sum"] += int(nums_int[2, p])
                m["agg_token_min"] = min(m["agg_token_min"], nums_f[0, p])
                m["agg_token_max"] = max(m["agg_token_max"], nums_f[1, p])
                if min_ids[p] < m["min_doc_id"]:
                    m["min_doc_id"] = min_ids[p]
                    m["min_doc_tokens"] = tok_flat[tok_offs[p] : tok_offs[p + 1]]
    return merged


def _repack_stats(merged: Dict[Tuple, dict]) -> pd.DataFrame:
    """Per-key dict -> ONE packed stats-partial row (inverse of the
    _stats_partial packing; used by the tree-merge rounds)."""
    import pickle

    keys = sorted(merged.keys())
    nums_int = np.array(
        [
            [merged[k]["agg_count"] for k in keys],
            [merged[k]["agg_n_tok_sum"] for k in keys],
            [merged[k]["agg_token_sum"] for k in keys],
        ],
        dtype=np.int64,
    )
    nums_f = np.array(
        [
            [merged[k]["agg_token_min"] for k in keys],
            [merged[k]["agg_token_max"] for k in keys],
        ],
        dtype=np.float64,
    )
    min_ids = [merged[k]["min_doc_id"] for k in keys]
    toks = [np.asarray(merged[k]["min_doc_tokens"], dtype=np.float64) for k in keys]
    tok_offs = np.zeros(len(keys) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in toks], out=tok_offs[1:])
    tok_flat = np.concatenate(toks) if toks else np.zeros(0, dtype=np.float64)
    return pd.DataFrame(
        {
            "keys": [pickle.dumps((keys, min_ids))],
            "nums_int": [nums_int.tobytes()],
            "nums_f": [nums_f.tobytes()],
            "tok_offs": [tok_offs.tobytes()],
            "tok_flat": [tok_flat.tobytes()],
        }
    )


def _merge_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    return _repack_stats(_fold_stats_rows(batch))


def _ref_tree_reduce(
    block_refs,
    leaf_fn,
    merge_fn,
    label: str,
    num_cpus: Optional[float] = None,
):
    """Scan-reduce over the materialized input's Arrow block refs with
    PLAIN RAY TASKS: one leaf task per block (whole-block kernel calls
    amortize the width-bucketed DP best and emit ONE partial row each),
    then fan-in folds of _MERGE_FANIN refs until <=
    _MERGE_THRESHOLD_ROWS one-row frames remain for the driver fold.

    Replaces the map_batches/materialize `_tree_reduce` formulation,
    which paid a streaming-executor launch + materialize + count per
    stage AND per fan-in round — ~0.2-0.6 s each of
    parallelism-INDEPENDENT wall on this host, the round-4 fixed-cost
    tax that bounded raw 8->32 scaling (~4 s total across the stats
    pass + two sweep rounds). The input refs are fetched once by the
    caller and reused by every round, so after the single input
    materialize barrier the whole tier-0 reduction is raw-task
    scheduling (microseconds per task).

    Leaves are barriered (ray.wait) before the folds on purpose:
    overlapping merges with compute stragglers was A/B'd in round 3
    and measured WORSE at 32p (15.2-17.8 s vs 11.3-12.1 s flagship,
    same window) under blob-deserialize contention. All folds are
    associative and exact (int64 counters, f64 sums of integer member
    values), so the tree shape cannot change any result bit
    (tests/test_rollup.py test_bounded_driver_rows_bit_identical)."""
    import time as _time

    import ray

    if not block_refs:
        for k, v in (("exec", 0.0), ("merge_wall", 0.0), ("merge_rounds", 0), ("driver_rows", 0)):
            LAST_TIMINGS[f"{label}_{k}"] = v
        return pd.DataFrame()
    _t0 = _time.perf_counter()

    def _leaf(block):
        # empty blocks (e.g. checkpoint-resume drop_done filtered a
        # block to zero rows, possibly with a degenerate schema) were
        # silently skipped by the old map_batches batching; skip them
        # here too instead of handing leaf_fn a schema-less table
        if block.num_rows == 0:
            return pd.DataFrame()
        return leaf_fn(block)

    leaf = ray.remote(num_cpus=(num_cpus or 1))(_leaf)
    refs = [leaf.remote(r) for r in block_refs]
    ray.wait(refs, num_returns=len(refs), fetch_local=False)
    LAST_TIMINGS[f"{label}_exec"] = round(_time.perf_counter() - _t0, 2)
    _t0 = _time.perf_counter()

    def _fold(*frames):
        frames = [f for f in frames if len(f)]
        if not frames:
            return pd.DataFrame()
        return merge_fn(pd.concat(frames, ignore_index=True))

    fold = ray.remote(_fold)
    rounds = 0
    while len(refs) > max(1, _MERGE_THRESHOLD_ROWS):  # floor 1: one row can't reduce
        refs = [
            fold.remote(*refs[i : i + _MERGE_FANIN])
            for i in range(0, len(refs), _MERGE_FANIN)
        ]
        rounds += 1
    frames = [f for f in ray.get(list(refs)) if len(f)]
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    # The fan-in loop bounds the number of partial FRAMES; the driver-row
    # guarantee additionally relies on every leaf/merge fn emitting ONE
    # packed row per frame (the documented contract). Enforce it loudly
    # (cf. merge_partials.max_driver_rows) instead of silently holding
    # threshold x rows-per-frame rows if a future leaf emits per-key rows.
    if len(out) > max(1, _MERGE_THRESHOLD_ROWS):
        raise ValueError(
            f"_ref_tree_reduce[{label}]: driver fold received {len(out)} rows from "
            f"{len(frames)} frames (> threshold {_MERGE_THRESHOLD_ROWS}); a leaf or "
            "merge fn emits multi-row frames - pack partials to one row per frame "
            "or reduce them distributedly before this fan-in"
        )
    LAST_TIMINGS[f"{label}_merge_wall"] = round(_time.perf_counter() - _t0, 2)
    LAST_TIMINGS[f"{label}_merge_rounds"] = rounds
    LAST_TIMINGS[f"{label}_driver_rows"] = int(len(out))
    return out


def scan_rollup_base_tier(bucketed_ds, cfg: RollupConfig, cache: bool = True):
    """Tier-0 rollup via combiner scans; returns a Ray Dataset with the
    same schema (and bit-identical content) as rollup_base_tier.

    The raw-task reduction (_ref_tree_reduce) operates on the input's
    Arrow block refs, so the input is ALWAYS executed and its blocks
    pinned in the object store for the duration of the tier-0 run —
    there is no streaming tier-0 path anymore (the multi-round sweep
    re-reads every block each round, so streaming would re-execute the
    upstream pipeline per round). ``cache=False`` only skips the
    parallelism repartition and the key-shard planning scan, using the
    input's own block layout as-is; it does NOT avoid materialization."""
    import time as _time

    import ray
    import ray.data as rd

    LAST_TIMINGS.clear()
    _t = _time.perf_counter()

    # Sweep tasks are compute-bound and the batched kernel amortizes
    # best over LARGE fragments (more members per size class) — callers
    # should feed ~1 block per CPU (run_flagship generates the token
    # table that way); we only repartition when the input is clearly
    # under-parallel.
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    ds = bucketed_ds.materialize() if cache else bucketed_ds
    try:
        if _BLOCKS_PER_CPU > 0:
            want = max(2, int(ncpu * _BLOCKS_PER_CPU))
            if cache and ds.num_blocks() != want:
                ds = ds.repartition(want).materialize()
        elif cache and ds.num_blocks() < max(2, ncpu // 2):
            ds = ds.repartition(ncpu).materialize()
    except Exception:
        pass
    LAST_TIMINGS["materialize"] = round(_time.perf_counter() - _t, 2)

    # ---- key-shard dispatch (round-3 review #2) -------------------
    # rows >= distinct keys, so small inputs skip planning entirely;
    # big ones pay one cheap 2-column scan for an UPPER BOUND on the
    # key count (sum of per-block distincts — no shuffle), then the
    # key space hash-partitions and the same rounds run per shard.
    # Per-key independence (stats fold and DBA rounds never couple
    # keys) makes the union bit-identical to the unsharded run.
    nshards = 1
    if cache:
        try:
            nrows = ds.count()
        except Exception:
            nrows = 0
        if nrows > _MAX_DRIVER_KEYS:
            ub = _distinct_keys_upper_bound(ds)
            nshards = max(1, -(-ub // _MAX_DRIVER_KEYS))
    if nshards > 1:
        import ray.data as rd

        LAST_TIMINGS["key_shards"] = nshards
        # SINGLE-PASS split (round-4 review #3): each input block is
        # read by exactly one remote task that partitions its rows into
        # nshards sub-tables (num_returns=nshards object refs); the
        # per-shard datasets are assembled from those refs with
        # from_arrow_refs. The materialized input is scanned ONCE —
        # the old path re-filtered the full dataset once per shard.
        split = ray.remote(num_returns=nshards)(_split_block_by_key_shard)
        block_refs = ds.to_arrow_refs()
        LAST_TIMINGS["key_shard_split_tasks"] = len(block_refs)
        try:
            LAST_TIMINGS["key_shard_input_blocks"] = int(ds.num_blocks())
        except Exception:
            LAST_TIMINGS["key_shard_input_blocks"] = len(block_refs)
        per_shard: list[list] = [[] for _ in range(nshards)]
        for ref in block_refs:
            out_refs = split.remote(ref, nshards)
            for s, r in enumerate(out_refs):
                per_shard[s].append(r)
        outs = []
        agg_timings: dict = {}
        for s in range(nshards):
            sub = rd.from_arrow_refs(per_shard[s])
            outs.append(_scan_rollup_single(sub, cfg))
            # accumulate per-shard timings: each _scan_rollup_single call
            # overwrites the shared keys, so without this the reported
            # tier-0 phase costs were the LAST shard's only (round-5
            # review finding); shards run sequentially, so summed walls
            # are the true totals
            for tk, tv in LAST_TIMINGS.items():
                if not tk.startswith("key_shard") and isinstance(tv, (int, float)):
                    agg_timings[tk] = round(agg_timings.get(tk, 0) + tv, 4)
        LAST_TIMINGS.update(agg_timings)
        out0 = outs[0]
        return out0.union(*outs[1:]) if len(outs) > 1 else out0
    return _scan_rollup_single(ds, cfg)


def _key_shard_of(sources, buckets, nshards: int) -> np.ndarray:
    """Deterministic shard of each (source, bucket) key: crc32 of the
    source (computed once per distinct source in the batch) mixed with
    the bucket by a splitmix step — uniform under bucket locality and
    source skew alike (a RANGE partition would need a quantile pass and
    still hot-spot on a skewed source; hash needs neither)."""
    import zlib as _zlib

    codes, uniques = pd.factorize(pd.Series(sources), sort=False)
    src_h = np.array(
        [_zlib.crc32(str(u).encode()) for u in uniques], dtype=np.uint64
    )[codes]
    h = src_h * np.uint64(0x9E3779B97F4A7C15) + np.asarray(
        buckets, dtype=np.uint64
    ) * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(31)
    return (h % np.uint64(nshards)).astype(np.int64)


def _split_block_by_key_shard(block, nshards: int):
    """One input block -> nshards Arrow sub-tables (remote task body;
    num_returns=nshards). Arrow in/out: a pandas roundtrip would
    re-infer the token list column (tensor ext. type on uniform
    lengths) and break the zero-copy offsets access in _stats_partial."""
    import pyarrow as _pa

    shard = _key_shard_of(
        block["source"].to_pandas(), block["bucket"].to_numpy(), nshards
    )
    return tuple(block.filter(_pa.array(shard == s)) for s in range(nshards))


def _distinct_keys_upper_bound(ds) -> int:
    """Sum of per-block distinct (source, bucket) counts — an upper
    bound on the global key count (keys split across blocks multi-count)
    from one map-only scan of two tiny columns; over-sharding is safe."""
    def per_block(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [b[["source", "bucket"]].drop_duplicates().shape[0]]})

    parts = ds.select_columns(["source", "bucket"]).map_batches(
        per_block, batch_format="pandas"
    )
    return int(sum(r["n"] for r in parts.take_all()))


def _scan_rollup_single(ds, cfg: RollupConfig):
    """One key-shard's (or the whole key-space's) scan rollup; see
    scan_rollup_base_tier."""
    import time as _time

    import ray
    import ray.data as rd

    _t = _time.perf_counter()
    # ONE ref fetch serves the stats pass and every sweep round: the
    # bucketized blocks are already Arrow (bucketize emits pyarrow), so
    # to_arrow_refs is a metadata pass, and everything after the input
    # materialize barrier is raw-task scheduling — no per-round
    # streaming-executor launches (round-4 review #5 fixed-cost tax).
    block_refs = ds.to_arrow_refs()
    LAST_TIMINGS["block_refs_wall"] = round(_time.perf_counter() - _t, 2)
    _t = _time.perf_counter()
    # one packed partial row per block; distributed fan-in rounds keep
    # the final driver fold bounded to _MERGE_THRESHOLD_ROWS rows
    stats_parts = _ref_tree_reduce(block_refs, _stats_partial, _merge_stats_batch, "stats")
    LAST_TIMINGS["stats_scan"] = round(_time.perf_counter() - _t, 2)
    _t = _time.perf_counter()
    if "keys" not in stats_parts.columns:  # zero-block input (full resume skip)
        stats_parts = pd.DataFrame(
            {c: [] for c in ("keys", "nums_int", "nums_f", "tok_offs", "tok_flat")}
        )
    merged_stats: Dict[Tuple, dict] = _fold_stats_rows(stats_parts)
    from .rollup import TIER_SCHEMA_COLS

    if not merged_stats:  # empty input (e.g. full resume skip)
        return rd.from_pandas(pd.DataFrame({c: [] for c in TIER_SCHEMA_COLS}))
    keys_sorted = sorted(merged_stats.keys())
    stats = pd.DataFrame(
        [
            {"source": k[0], "bucket": k[1], **merged_stats[k]}
            for k in keys_sorted
        ]
    )
    centers: Dict = {
        k: np.asarray(merged_stats[k]["min_doc_tokens"], dtype=np.float64)
        for k in keys_sorted
    }
    final_centers: Dict = dict(centers)
    active = dict(centers)

    for rnd in range(cfg.dba_max_it):
        if not active:
            break
        _t = _time.perf_counter()
        packed = _pack_centers(active)
        pkeys, poffsets, _pflat = packed
        centers_ref = ray.put(packed)
        parts = _ref_tree_reduce(
            block_refs,
            _make_sweep_fn(centers_ref, cfg.dtw),
            _make_merge_sweep(centers_ref),
            f"sweep{rnd}",
            num_cpus=_SWEEP_NUM_CPUS,
        )
        LAST_TIMINGS[f"sweep_round{rnd}"] = round(_time.perf_counter() - _t, 2)
        if len(parts):
            LAST_TIMINGS[f"sweep_round{rnd}_kernel_max"] = round(
                float(parts["task_kernel_max"].max()), 2
            )
            LAST_TIMINGS[f"sweep_round{rnd}_kernel_sum"] = round(
                float(parts["task_kernel_s"].sum()), 2
            )
            LAST_TIMINGS[f"sweep_round{rnd}_setup_sum"] = round(
                float(parts["task_setup_s"].sum()), 2
            )
        # merge: scatter-add the (bounded) final sparse partial rows
        # into the full layout (exact: member values are integers)
        total = int(poffsets[-1])
        big_sums = np.zeros(total, dtype=np.float64)
        big_counts = np.zeros(total, dtype=np.int64)
        if len(parts):
            _scatter_sparse_rows(parts, poffsets, big_sums, big_counts)
        next_active: Dict = {}
        for n, k in enumerate(pkeys):
            sums = big_sums[poffsets[n] : poffsets[n + 1]]
            counts = big_counts[poffsets[n] : poffsets[n + 1]]
            if not counts.any() and not sums.any():
                # group had no members in this round's fragments (cannot
                # happen for tier 0's own groups, but keep it safe)
                continue
            avg = np.zeros_like(sums)
            nz = counts > 0
            avg[nz] = sums[nz] / counts[nz]  # empty bins -> 0.0 (C reference)
            final_centers[k] = avg
            prev = active[k]
            diff = float(np.abs(avg - prev).sum()) / len(avg) if len(avg) else 0.0
            if cfg.dba_thr is None or diff > cfg.dba_thr:
                next_active[k] = avg
        active = next_active

    out = stats.drop(columns=["min_doc_id", "min_doc_tokens"]).copy()
    out["agg_token_mean"] = out["agg_token_sum"] / out["agg_n_tok_sum"]
    out["repr_series"] = [
        final_centers[_key_of(s, b)].tolist() for s, b in zip(out["source"], out["bucket"])
    ]
    out["gap_filled"] = False
    from .rollup import TIER_SCHEMA_COLS

    return rd.from_pandas(out[TIER_SCHEMA_COLS])
