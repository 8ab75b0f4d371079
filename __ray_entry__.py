"""Driver contract for the graft builder (Ray Data target).

entry()      — flagship rollup+downsample on a small deterministic token
               table (Ray already initialised by the driver).
queries()    — one callable per implemented operator/pipeline
               (SURVEY.md §2 + training-data ops); each takes sf_dir.
oracle_sql() — DuckDB-equivalent SQL for every SQL-expressible query;
               non-SQL ops (DTW/DBA/sketches) are rows-only checks.

No ray.init()/shutdown() here (driver owns the session). The token
table is not part of the driver's testdata, so token queries synthesize
it deterministically (sources.synth) and materialize a parquet copy
under /tmp for the DuckDB oracle to read.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_TOK_DIR = "/tmp/dtair_tokens"


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base[2:] if base.startswith("sf") else "0.01"


def _token_spec(sf_dir: str):
    from dtaidistance_ray.sources.synth import TokenTableSpec

    sf = float(_sf_of(sf_dir))
    # correctness-sized table: 10% of the bench-sized table, floor 400
    return TokenTableSpec(num_rows=max(400, int(sf * 200_000)))


def _spec_fp(sf_dir: str) -> str:
    """Stable fingerprint of everything that shapes the /tmp cached
    artifacts: spec fields + RollupConfig.settings_hash() + retention
    keeps. A code/default change invalidates the caches instead of
    silently serving stale data across sessions."""
    import zlib
    from dataclasses import asdict

    from dtaidistance_ray.stages.rollup import RollupConfig

    spec = _token_spec(sf_dir)
    key = (
        repr(sorted(asdict(spec).items()))
        + RollupConfig().settings_hash()
        + repr(_RETENTION_KEEPS)
    )
    return f"{zlib.crc32(key.encode()) & 0xFFFFFFFF:08x}"


def _ensure_swept_store(sf_dir: str) -> tuple:
    """Build-once store + retention sweep shared by the serve / compact
    / stats queries (was triplicated with hardcoded keeps — round-5
    review finding). Returns (out_dir, max_bucket0). The marker embeds
    the spec/config fingerprint so stale stores rebuild."""
    import json as _json

    from dtaidistance_ray.pipelines.flagship import run_flagship
    from dtaidistance_ray.state.checkpoint import expire_checkpoint

    tok = _ensure_token_parquet(sf_dir)
    out = os.path.join("/tmp/dtair_store", f"sf{_sf_of(sf_dir)}")
    marker = os.path.join(out, "_swept.json")
    fp = _spec_fp(sf_dir)
    m = None
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                m = _json.load(f)
            if m.get("spec_fp") != fp:
                m = None
        except (ValueError, OSError):
            m = None
    if m is None:
        import shutil as _sh

        if os.path.isdir(out):
            _sh.rmtree(out)
        run_flagship(_token_spec(sf_dir), out_dir=out, num_shards=8, input_path=tok)
        m = expire_checkpoint(out, keeps=_RETENTION_KEEPS)
        m["spec_fp"] = fp
        with open(marker, "w") as f:
            _json.dump(m, f)
    return out, int(m["max_bucket0"])


def _ensure_token_parquet(sf_dir: str) -> str:
    """Materialize the synthetic token table (+ts/bucket cols) for the
    DuckDB oracle; driver-side pyarrow only, cached per sf."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dtaidistance_ray.sources.synth import derive_ts, token_table_arrow

    spec = _token_spec(sf_dir)
    path = os.path.join(_TOK_DIR, f"sf{_sf_of(sf_dir)}.parquet")
    fp_path = path + ".fp"
    fp = _spec_fp(sf_dir)
    # sidecar fingerprint guards the cache: the parquet's NAME is baked
    # into 40+ oracle SQL strings, but its CONTENT depends on spec /
    # config code — without this, a code change silently served a stale
    # table across sessions (round-5 review finding)
    if os.path.exists(path):
        try:
            if open(fp_path).read().strip() == fp:
                return path
        except OSError:
            pass
    os.makedirs(_TOK_DIR, exist_ok=True)
    t = token_table_arrow(spec)
    ids = np.arange(spec.num_rows, dtype=np.int64)
    ts = derive_ts(ids, spec)
    t = t.append_column("ts", pa.array(ts, type=pa.int64()))
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    with open(fp_path, "w") as fh:
        fh.write(fp)
    return path


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; returns the tier-0 rollup."""
    from dtaidistance_ray.pipelines.flagship import build_tiers
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages.rollup import RollupConfig, encode_tier, gap_fill_tier

    spec = _token_spec("/root/testdata/sf0.001")
    cfg = RollupConfig()
    tiers = build_tiers(token_table(spec), spec, cfg)
    return encode_tier(gap_fill_tier(tiers[0]))


# ---------------------------------------------------------------------------
# token-table queries (synthetic input; SQL oracles read the /tmp copy)
# ---------------------------------------------------------------------------



_TIERS_CACHE: dict = {}


def _build_tiers_cached(sf_dir: str):
    """Materialized tier Datasets, cached per sf for the gate session:
    seven rollup queries project the SAME three tiers — rebuilding them
    per query re-ran the whole scan pipeline each time. Deterministic:
    the cached result is bit-identical to a fresh build (asserted by
    the tier-equality tests), so this is a pure gate-latency saving."""
    key = _sf_of(sf_dir)
    if key not in _TIERS_CACHE:
        from dtaidistance_ray.pipelines.flagship import build_tiers
        from dtaidistance_ray.sources.synth import token_table
        from dtaidistance_ray.stages.rollup import RollupConfig

        spec = _token_spec(sf_dir)
        cfg = RollupConfig()
        tiers = build_tiers(token_table(spec), spec, cfg)
        _TIERS_CACHE[key] = {
            t: tiers[t].materialize() for t in range(len(cfg.tier_widths))
        }
    return _TIERS_CACHE[key]


def _q_tokens_pack_sequences(sf_dir: str):
    """Greedy fixed-budget sequence packing per source (the canonical
    pretraining packer); value-identical recursive-CTE oracle."""
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages.packing import pack_sequences

    _ensure_token_parquet(sf_dir)
    ds = token_table(_token_spec(sf_dir)).select_columns(["doc_id", "n_tok", "source"])
    return pack_sequences(ds)


def _sql_tokens_pack_sequences(sf: str) -> str:
    from dtaidistance_ray.stages.packing import (
        DEFAULT_PACK_BUDGET,
        PACK_SEQUENCES_SQL_TMPL,
    )

    return PACK_SEQUENCES_SQL_TMPL.format(
        tok_path=f"{_TOK_DIR}/sf{sf}.parquet", budget=DEFAULT_PACK_BUDGET
    )


def _q_source_kl_drift(sf_dir: str):
    """Per-source token-distribution KL drift vs the corpus; the heavy
    reduction is the vocab-bounded packed-partial tree (stages/vocab)."""
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages.vocab import source_kl_drift

    _ensure_token_parquet(sf_dir)
    ds = token_table(_token_spec(sf_dir))
    out = source_kl_drift(ds)
    out["kl_to_corpus"] = out["kl_to_corpus"].round(6)
    return out


def _q_length_ks_drift(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages.vocab import length_ks_drift

    _ensure_token_parquet(sf_dir)
    ds = token_table(_token_spec(sf_dir))
    return length_ks_drift(ds)


def _sql_length_ks_drift(sf: str) -> str:
    from dtaidistance_ray.stages.vocab import length_ks_drift_sql

    return length_ks_drift_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _sql_source_kl_drift(sf: str) -> str:
    from dtaidistance_ray.stages.vocab import source_kl_drift_sql

    sql = source_kl_drift_sql(f"{_TOK_DIR}/sf{sf}.parquet")
    return f"SELECT source, n_tokens, round(kl_to_corpus, 6) AS kl_to_corpus FROM ({sql})"


def _q_doc_bigram_xent(sf_dir: str):
    """CCNet-style bigram cross-entropy per doc (broadcast unigrams +
    hash-partitioned bigram join; stages/vocab.doc_bigram_xent)."""
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages.vocab import doc_bigram_xent

    _ensure_token_parquet(sf_dir)
    return doc_bigram_xent(token_table(_token_spec(sf_dir)))


def _sql_doc_bigram_xent(sf: str) -> str:
    from dtaidistance_ray.stages.vocab import doc_bigram_xent_sql

    return doc_bigram_xent_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_tokens_stats_by_source(sf_dir: str):
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Count, Max, Min, Sum

    from dtaidistance_ray.sources.synth import token_table

    _ensure_token_parquet(sf_dir)
    spec = _token_spec(sf_dir)
    ds = token_table(spec)

    def per_row(batch: pd.DataFrame) -> pd.DataFrame:
        sums = [int(np.asarray(t).sum()) for t in batch["tokens"]]
        mins = [int(np.asarray(t).min()) for t in batch["tokens"]]
        maxs = [int(np.asarray(t).max()) for t in batch["tokens"]]
        return pd.DataFrame(
            {
                "source": batch["source"],
                "n_tok": batch["n_tok"].astype("int64"),
                "tok_sum": pd.array(sums, dtype="int64"),
                "tok_min": pd.array(mins, dtype="int64"),
                "tok_max": pd.array(maxs, dtype="int64"),
            }
        )

    out = (
        ds.map_batches(per_row, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tok", alias_name="n_tok_sum"),
            Sum("tok_sum", alias_name="token_sum"),
            Min("tok_min", alias_name="token_min"),
            Max("tok_max", alias_name="token_max"),
        )
    )

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("n_docs", "n_tok_sum", "token_sum", "token_min", "token_max"):
            batch[c] = batch[c].astype("int64")
        return batch

    return out.map_batches(fix, batch_format="pandas")


def _sql_tokens_stats_by_source(sf: str) -> str:
    return f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tok_sum,
       CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS token_sum,
       CAST(min(list_aggregate(tokens, 'min')) AS BIGINT) AS token_min,
       CAST(max(list_aggregate(tokens, 'max')) AS BIGINT) AS token_max
FROM read_parquet('{_TOK_DIR}/sf{sf}.parquet')
GROUP BY source
"""


def _q_tokens_rollup_tier0_aggs(sf_dir: str):
    """Tier-0 continuous aggregates (SQL-checkable projection of the
    flagship rollup; the DBA representative is covered rows-only)."""
    import pandas as pd


    _ensure_token_parquet(sf_dir)
    t0 = _build_tiers_cached(sf_dir)[0]

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[
            ["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]
        ].copy()
        # int/int division is bit-deterministic in both engines: no rounding
        out["agg_token_mean"] = batch["agg_token_mean"]
        for c in ("agg_count", "agg_n_tok_sum", "agg_token_sum"):
            out[c] = out[c].astype("int64")
        return out

    return t0.map_batches(project, batch_format="pandas")


def _sql_tokens_rollup_tier0(sf: str) -> str:
    return f"""
SELECT source,
       CAST(ts // 3600 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS agg_count,
       CAST(sum(n_tok) AS BIGINT) AS agg_n_tok_sum,
       CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS agg_token_sum,
       CAST(sum(list_aggregate(tokens, 'sum')) AS DOUBLE) / sum(n_tok)
           AS agg_token_mean
FROM read_parquet('{_TOK_DIR}/sf{sf}.parquet')
GROUP BY 1, 2
"""


def _q_tokens_rollup_tier1_aggs(sf_dir: str):
    import pandas as pd


    _ensure_token_parquet(sf_dir)
    t1 = _build_tiers_cached(sf_dir)[1]

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]].copy()
        for c in ("agg_count", "agg_n_tok_sum", "agg_token_sum"):
            out[c] = out[c].astype("int64")
        return out

    return t1.map_batches(project, batch_format="pandas")


def _sql_tokens_rollup_tier1(sf: str) -> str:
    return f"""
SELECT source,
       CAST(ts // 14400 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS agg_count,
       CAST(sum(n_tok) AS BIGINT) AS agg_n_tok_sum,
       CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS agg_token_sum
FROM read_parquet('{_TOK_DIR}/sf{sf}.parquet')
GROUP BY 1, 2
"""


def _tier_full_view(tier: int):
    """Flatten one gap-filled + Gorilla-encoded tier into a fully
    hash-checkable view: one row per (source, bucket) carrying every
    scalar aggregate (int64-exact), the gap flag, the representative
    length, and crc32 of the Gorilla payload (bit-exact stand-in for
    the binary column the gate cannot hash directly). Gap rows'
    null float aggregates are encoded as 0.0 alongside gap_filled=1
    so the view is NaN-free (NaN hashing is writer-dependent)."""
    import zlib

    import pandas as pd

    def view(batch: pd.DataFrame) -> pd.DataFrame:
        gap = batch["gap_filled"].fillna(False).astype(bool)
        out = pd.DataFrame(
            {
                "tier": tier,
                "source": batch["source"],
                "bucket": batch["bucket"].astype("int64"),
                "agg_count": batch["agg_count"].fillna(0).astype("int64"),
                "agg_n_tok_sum": batch["agg_n_tok_sum"].fillna(0).astype("int64"),
                "agg_token_sum": batch["agg_token_sum"].fillna(0).astype("int64"),
                "agg_token_min": batch["agg_token_min"].where(~gap, 0.0).round(6).astype("float64"),
                "agg_token_max": batch["agg_token_max"].where(~gap, 0.0).round(6).astype("float64"),
                "agg_token_mean": batch["agg_token_mean"].where(~gap, 0.0).round(6).astype("float64"),
                "gap_filled": gap.astype("int64"),
                "repr_len": [len(r) for r in batch["repr_series"]],
                "payload_crc": [zlib.crc32(bytes(p)) for p in batch["repr_gorilla"]],
            }
        )
        out["tier"] = out["tier"].astype("int64")
        out["repr_len"] = out["repr_len"].astype("int64")
        out["payload_crc"] = out["payload_crc"].astype("int64")
        return out

    return view


def _q_tokens_rollup_tier_full(sf_dir: str, tier: int):
    """Full rollup of one tier incl. DBA representative + gap-fill +
    Gorilla payload, flattened via _tier_full_view so the gate can
    hash it against a rollup_oracle golden (DTW/DBA are non-SQL)."""
    from dtaidistance_ray.stages.rollup import RollupConfig, encode_tier, gap_fill_tier

    cfg = RollupConfig()
    tiers = _build_tiers_cached(sf_dir)
    enc = encode_tier(gap_fill_tier(tiers[tier]))
    return enc.map_batches(_tier_full_view(tier), batch_format="pandas")


def _q_tokens_rollup_tier0_full(sf_dir: str):
    return _q_tokens_rollup_tier_full(sf_dir, 0)


def _q_tokens_rollup_tier2_full(sf_dir: str):
    return _q_tokens_rollup_tier_full(sf_dir, 2)


_RETENTION_KEEPS = (48, 42, None)  # tier0: last 48 x 1h; tier1: last 42 x 4h; tier2: all


def _q_tokens_retention_expiry(sf_dir: str):
    """Retention-policy expiry view: the union of rolled-up rows each
    tier still SERVES after applying its TTL (tier-0 keeps the last 48
    hourly buckets, tier-1 the last 42 four-hour buckets, tier-2 is
    kept forever) — the storage picture a retention sweep leaves
    behind, as a hash-checkable query.

    Cutoffs derive exactly from the tier-0 max bucket: tier widths are
    integer multiples of 3600 and ``ts`` is integer seconds, so
    ``max(ts)//w == (max(ts)//3600) // (w//3600)`` — no float time
    arithmetic. Per-tier filtering is a map-only pass over the already
    bounded tier datasets (one row per (source, bucket)); nothing
    re-reads the raw token table."""
    import pandas as pd

    from dtaidistance_ray.stages.rollup import RollupConfig

    cfg = RollupConfig()
    tiers = _build_tiers_cached(sf_dir)
    mb0 = int(tiers[0].max("bucket"))

    def project(tier: int, cut):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]]
            if cut is not None:
                out = out[out["bucket"] > cut]
            out = out.copy()
            out.insert(0, "tier", tier)
            for c in ("tier", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
                out[c] = out[c].astype("int64")
            return out

        return fn

    parts = []
    for t, keep in enumerate(_RETENTION_KEEPS):
        w_h = cfg.tier_widths[t] // 3600
        cut = None if keep is None else mb0 // w_h - keep
        parts.append(tiers[t].map_batches(project(t, cut), batch_format="pandas"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _sql_tokens_retention_expiry(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH mx AS (
  SELECT CAST(max(ts) // 3600 AS BIGINT) AS mb0 FROM read_parquet('{tok}')
), t0 AS (
  SELECT source, CAST(ts // 3600 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS agg_count,
         CAST(sum(n_tok) AS BIGINT) AS agg_n_tok_sum,
         CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS agg_token_sum
  FROM read_parquet('{tok}') GROUP BY 1, 2
), t1 AS (
  SELECT source, CAST(ts // 14400 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS agg_count,
         CAST(sum(n_tok) AS BIGINT) AS agg_n_tok_sum,
         CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS agg_token_sum
  FROM read_parquet('{tok}') GROUP BY 1, 2
), t2 AS (
  SELECT source, CAST(ts // 86400 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS agg_count,
         CAST(sum(n_tok) AS BIGINT) AS agg_n_tok_sum,
         CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS agg_token_sum
  FROM read_parquet('{tok}') GROUP BY 1, 2
)
SELECT CAST(0 AS BIGINT) AS tier, t0.* FROM t0, mx WHERE bucket > mb0 - 48
UNION ALL
SELECT CAST(1 AS BIGINT) AS tier, t1.* FROM t1, mx WHERE bucket > mb0 // 4 - 42
UNION ALL
SELECT CAST(2 AS BIGINT) AS tier, t2.* FROM t2
"""


def _q_tokens_gap_serve_parent(sf_dir: str):
    """Tiered-storage miss path: for every tier-0 gap bucket (hole in
    a source's hourly grid), the tier-1 parent aggregate that would
    serve a read of that hour — parent doc count and mean token value
    (0 / 0.0 when the whole 4-hour parent is also empty).

    Scale shape: the gap-filled tier-0 stream is filtered map-only;
    the tier-1 side is a bounded (source x 4h-bucket) table broadcast
    once via ray.put and merged per batch inside an autoscaling actor
    pool — no shuffle join. The parent mean is one f64 division of
    exact int sums, bit-equal to the oracle."""
    import numpy as np
    import pandas as pd
    import ray

    from dtaidistance_ray.stages.pool import auto_pool
    from dtaidistance_ray.stages.rollup import gap_fill_tier

    tiers = _build_tiers_cached(sf_dir)
    t1 = tiers[1].to_pandas()[["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]]
    t1 = t1.rename(columns={"bucket": "parent_bucket"})
    ref = ray.put(t1)

    class ServeParent:
        def __init__(self, ref):
            self.t1 = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if "gap_filled" in batch.columns:
                gap = batch["gap_filled"].fillna(False).astype(bool)
            else:
                gap = pd.Series(False, index=batch.index)
            g = batch.loc[gap, ["source", "bucket"]].copy()
            g["bucket"] = g["bucket"].astype("int64")
            g["parent_bucket"] = g["bucket"] // 4
            m = g.merge(self.t1, on=["source", "parent_bucket"], how="left")
            m["parent_count"] = m["agg_count"].fillna(0).astype("int64")
            nts = m["agg_n_tok_sum"].to_numpy(np.float64)
            tsum = m["agg_token_sum"].to_numpy(np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = np.where(np.nan_to_num(nts) > 0, tsum / nts, 0.0)
            m["parent_token_mean"] = mean
            return m[["source", "bucket", "parent_bucket", "parent_count", "parent_token_mean"]]

    return gap_fill_tier(tiers[0]).map_batches(
        ServeParent,
        fn_constructor_args=(ref,),
        batch_format="pandas",
        concurrency=auto_pool(),
    )


def _sql_tokens_gap_serve_parent(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH t0 AS (
  SELECT source, CAST(ts // 3600 AS BIGINT) AS bucket
  FROM read_parquet('{tok}') GROUP BY 1, 2
), bounds AS (
  SELECT source, min(bucket) AS lo, max(bucket) AS hi FROM t0 GROUP BY 1
), grid AS (
  SELECT b.source, unnest(generate_series(b.lo, b.hi)) AS bucket FROM bounds b
), gaps AS (
  SELECT g.source, g.bucket FROM grid g ANTI JOIN t0 USING (source, bucket)
), t1 AS (
  SELECT source, CAST(ts // 14400 AS BIGINT) AS parent_bucket,
         CAST(count(*) AS BIGINT) AS agg_count,
         CAST(sum(n_tok) AS BIGINT) AS n_ts,
         CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS t_s
  FROM read_parquet('{tok}') GROUP BY 1, 2
)
SELECT gaps.source, CAST(gaps.bucket AS BIGINT) AS bucket,
       CAST(gaps.bucket // 4 AS BIGINT) AS parent_bucket,
       CAST(coalesce(t1.agg_count, 0) AS BIGINT) AS parent_count,
       coalesce(CAST(t1.t_s AS DOUBLE) / t1.n_ts, 0.0) AS parent_token_mean
FROM gaps LEFT JOIN t1
  ON gaps.source = t1.source AND gaps.bucket // 4 = t1.parent_bucket
"""


def _q_tokens_downsample_fidelity(sf_dir: str):
    """Downsample-fidelity audit: for each tier-1 bucket, the maximum
    absolute deviation between any child tier-0 hourly token mean and
    the parent 4-hour mean — how much information the coarser tier
    loses per bucket. Means are single f64 divisions of exact integer
    sums, so deviations and their max are bit-deterministic.

    Scale shape: a map-only pass over the bounded tier-0 table that
    re-derives the parent sums per batch-local group plus a final
    bounded (source x parent-bucket) groupby merge — the raw token
    table is never re-read."""
    import numpy as np
    import pandas as pd

    tiers = _build_tiers_cached(sf_dir)

    def child_rows(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]].copy()
        for c in ("bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
            out[c] = out[c].astype("int64")
        out["parent_bucket"] = out["bucket"] // 4
        return out

    # the tier-0 table is bounded by (source x hour); one distributed
    # pass emits child rows, the parent-side sums re-aggregate exactly
    children = tiers[0].map_batches(child_rows, batch_format="pandas").to_pandas()
    par = children.groupby(["source", "parent_bucket"], as_index=False).agg(
        n_children=("bucket", "size"),
        p_ntok=("agg_n_tok_sum", "sum"),
        p_tsum=("agg_token_sum", "sum"),
    )
    j = children.merge(par, on=["source", "parent_bucket"])
    child_mean = j["agg_token_sum"].to_numpy(np.float64) / j["agg_n_tok_sum"].to_numpy(
        np.float64
    )
    parent_mean = j["p_tsum"].to_numpy(np.float64) / j["p_ntok"].to_numpy(np.float64)
    j["dev"] = np.abs(child_mean - parent_mean)
    out = j.groupby(["source", "parent_bucket"], as_index=False).agg(
        n_children=("dev", "size"), max_abs_dev=("dev", "max")
    )
    out["parent_bucket"] = out["parent_bucket"].astype("int64")
    out["n_children"] = out["n_children"].astype("int64")
    return out


def _sql_tokens_downsample_fidelity(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH t0 AS (
  SELECT source, CAST(ts // 3600 AS BIGINT) AS bucket,
         CAST(sum(n_tok) AS BIGINT) AS n_ts,
         CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS t_s
  FROM read_parquet('{tok}') GROUP BY 1, 2
), par AS (
  SELECT source, bucket // 4 AS parent_bucket,
         CAST(count(*) AS BIGINT) AS n_children,
         CAST(sum(n_ts) AS BIGINT) AS p_ntok,
         CAST(sum(t_s) AS BIGINT) AS p_tsum
  FROM t0 GROUP BY 1, 2
)
SELECT t0.source, CAST(par.parent_bucket AS BIGINT) AS parent_bucket,
       max(par.n_children) AS n_children,
       max(abs(CAST(t0.t_s AS DOUBLE) / t0.n_ts
               - CAST(par.p_tsum AS DOUBLE) / par.p_ntok)) AS max_abs_dev
FROM t0 JOIN par ON t0.source = par.source AND t0.bucket // 4 = par.parent_bucket
GROUP BY 1, 2
"""


def _q_tokens_source_skew(sf_dir: str):
    """Hot-source skew report: per hourly bucket, the dominant source
    and its share of the bucket's documents — the signal a shuffle
    planner uses to decide which keys need salting. Ties break to the
    lexicographically-smallest source on both sides.

    Scale shape: derives from the bounded tier-0 table; one vectorized
    argmax per bucket over a frame whose size is (source x hour)."""
    import numpy as np

    tiers = _build_tiers_cached(sf_dir)
    t0 = tiers[0].to_pandas()[["source", "bucket", "agg_count"]]
    t0["bucket"] = t0["bucket"].astype("int64")
    t0 = t0.sort_values(["bucket", "agg_count", "source"],
                        ascending=[True, False, True], kind="mergesort")
    total = t0.groupby("bucket", as_index=False).agg(
        total_docs=("agg_count", "sum"), n_sources=("source", "size")
    )
    top = t0.drop_duplicates("bucket", keep="first")[["bucket", "source", "agg_count"]]
    top = top.rename(columns={"source": "top_source", "agg_count": "top_docs"})
    out = total.merge(top, on="bucket")
    out["top_share"] = np.round(
        out["top_docs"].to_numpy(np.float64) / out["total_docs"].to_numpy(np.float64), 6
    )
    for c in ("bucket", "total_docs", "n_sources", "top_docs"):
        out[c] = out[c].astype("int64")
    return out[["bucket", "total_docs", "n_sources", "top_source", "top_docs", "top_share"]]


def _sql_tokens_source_skew(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH t0 AS (
  SELECT source, CAST(ts // 3600 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS docs
  FROM read_parquet('{tok}') GROUP BY 1, 2
), ranked AS (
  SELECT bucket, source, docs,
         row_number() OVER (PARTITION BY bucket ORDER BY docs DESC, source) AS rk,
         sum(docs) OVER (PARTITION BY bucket) AS total_docs,
         count(*) OVER (PARTITION BY bucket) AS n_sources
  FROM t0
)
SELECT bucket, CAST(total_docs AS BIGINT) AS total_docs,
       CAST(n_sources AS BIGINT) AS n_sources,
       source AS top_source, docs AS top_docs,
       round(CAST(docs AS DOUBLE) / total_docs, 6) AS top_share
FROM ranked WHERE rk = 1
"""


def _q_tokens_incremental_refresh(sf_dir: str):
    """Gate proof of the incremental-refresh path: build the tier-0
    rollup from the FIRST 80% of the time range only, then refresh it
    with the remaining rows via pipelines.refresh.refresh_tier0
    (dirty-group recompute + clean pass-through). The oracle is the
    plain full-table tier-0 aggregate — a correct refresh is
    indistinguishable from a full rerun, which is exactly the claim."""
    import pandas as pd
    import ray.data as rd

    from dtaidistance_ray.pipelines.refresh import refresh_tier0
    from dtaidistance_ray.stages.rollup import RollupConfig, bucketize
    from dtaidistance_ray.stages.rollup_scan import scan_rollup_base_tier

    path = _ensure_token_parquet(sf_dir)
    cfg = RollupConfig()
    comb = rd.read_parquet(path)
    # exact integer cutoff at 80% of the span (built-in reductions are
    # empty-block-safe; the old per-block int(min) lambda raised on
    # NaN from an empty block — round-5 review finding)
    lo, hi = int(comb.min("ts")), int(comb.max("ts"))
    cut = lo + (hi - lo) * 4 // 5

    old = rd.read_parquet(path).filter(expr=f"ts < {cut}")
    delta = rd.read_parquet(path).filter(expr=f"ts >= {cut}")
    existing = scan_rollup_base_tier(bucketize(old, cfg.tier_widths[0], None), cfg)
    refreshed, _dk = refresh_tier0(existing, comb, delta, cfg, None)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]].copy()
        for c in ("bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
            out[c] = out[c].astype("int64")
        out["agg_token_mean"] = batch["agg_token_mean"]
        return out

    return refreshed.map_batches(project, batch_format="pandas")


def _q_tokens_late_arrival_refresh(sf_dir: str):
    """Watermark / late-arrival re-rollup (the out-of-order companion
    to tokens_incremental_refresh): 1/16 of documents (numeric doc-id
    suffix % 16 == 7 — deterministic, arrival order independent of ts)
    arrive LATE, i.e. after the watermark (the on-time subset's max ts)
    but with timestamps scattered across the WHOLE history. Each late
    row dirties its (source, hour) bucket; refresh_tier0 recomputes
    exactly those groups from the combined input and passes every clean
    group through byte-identical — nothing rescans clean history. The
    oracle is the plain full-table tier-0 aggregate: a correct
    late-arrival refresh is indistinguishable from a full rerun.

    Scale shape: the dirty-key set is bounded by the delta's key-space
    and broadcast once; at 100 TB a late trickle dirties a vanishing
    fraction of groups and the recompute scan reads only those rows
    (asserted sparse in tests/test_rollup.py)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as _pc
    import ray.data as rd

    from dtaidistance_ray.pipelines.refresh import refresh_tier0
    from dtaidistance_ray.stages.rollup import RollupConfig, bucketize
    from dtaidistance_ray.stages.rollup_scan import scan_rollup_base_tier

    path = _ensure_token_parquet(sf_dir)
    cfg = RollupConfig()
    comb = rd.read_parquet(path)

    def _is_late(batch):

        n = _pc.cast(
            _pc.utf8_slice_codeunits(batch["doc_id"], 1, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.array(n % 16 == 7)

    def on_time(batch: pa.Table) -> pa.Table:
        return batch.filter(_pc.invert(_is_late(batch)))

    def late(batch: pa.Table) -> pa.Table:
        return batch.filter(_is_late(batch))

    old = rd.read_parquet(path).map_batches(on_time, batch_format="pyarrow")
    delta = rd.read_parquet(path).map_batches(late, batch_format="pyarrow")
    existing = scan_rollup_base_tier(bucketize(old, cfg.tier_widths[0], None), cfg)
    refreshed, _dk = refresh_tier0(existing, comb, delta, cfg, None)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]].copy()
        for c in ("bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
            out[c] = out[c].astype("int64")
        out["agg_token_mean"] = batch["agg_token_mean"]
        return out

    return refreshed.map_batches(project, batch_format="pandas")


def _q_tokens_source_coactivity(sf_dir: str):
    """Cross-source co-activity: Pearson correlation between every
    pair of sources' hourly ingest-count series over the GLOBAL hour
    grid (absent hours count 0) — which sources spike together, the
    signal behind shared-fate partitioning / co-location decisions.

    Exactness: all five moments (n, Sx, Sy, Sxx, Syy, Sxy) are exact
    int64 sums over the aligned grid; r is evaluated float-last in the
    identical operation order as the SQL (cast numerator, cast each
    variance factor, multiply, sqrt) and rounded at 6 on both sides.

    Scale shape: the aligned matrix is (sources x calendar hours) —
    bounded by key-space, not row count; moments come from one integer
    matmul over it. (At extreme per-hour counts the int64 variance
    factors would need object-int promotion; documented, not hit at
    any tested scale.)"""
    import numpy as np
    import pandas as pd

    tiers = _build_tiers_cached(sf_dir)
    t0 = tiers[0].to_pandas()[["source", "bucket", "agg_count"]]
    t0["bucket"] = t0["bucket"].astype("int64")
    lo, hi = int(t0["bucket"].min()), int(t0["bucket"].max())
    srcs = sorted(t0["source"].unique())
    grid_n = hi - lo + 1
    X = np.zeros((len(srcs), grid_n), dtype=np.int64)
    si = {s: i for i, s in enumerate(srcs)}
    X[
        t0["source"].map(si).to_numpy(np.int64),
        t0["bucket"].to_numpy(np.int64) - lo,
    ] = t0["agg_count"].to_numpy(np.int64)
    S = X.sum(axis=1)
    G = X @ X.T  # exact int64 Gram: Sxy for every pair, Sxx on the diagonal
    rows = []
    n = np.int64(grid_n)
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            f1 = n * G[i, i] - S[i] * S[i]
            f2 = n * G[j, j] - S[j] * S[j]
            num = np.float64(n * G[i, j] - S[i] * S[j])
            den = np.sqrt(np.float64(f1) * np.float64(f2))
            r = round(float(num / den), 6) if den > 0 else 0.0
            rows.append((srcs[i], srcs[j], int(n), r))
    return pd.DataFrame(rows, columns=["source_a", "source_b", "n_hours", "r"])


def _sql_tokens_source_coactivity(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH t0 AS (
  SELECT source, CAST(ts // 3600 AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c
  FROM read_parquet('{tok}') GROUP BY 1, 2
), bounds AS (
  SELECT min(b) AS lo, max(b) AS hi FROM t0
), grid AS (
  SELECT unnest(generate_series(lo, hi)) AS b FROM bounds
), srcs AS (
  SELECT DISTINCT source FROM t0
), filled AS (
  SELECT s.source, g.b, CAST(coalesce(t0.c, 0) AS BIGINT) AS x
  FROM srcs s CROSS JOIN grid g
  LEFT JOIN t0 ON t0.source = s.source AND t0.b = g.b
), mom AS (
  SELECT f1.source AS source_a, f2.source AS source_b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(f1.x) AS BIGINT) AS sx, CAST(sum(f2.x) AS BIGINT) AS sy,
         CAST(sum(f1.x * f1.x) AS BIGINT) AS sxx,
         CAST(sum(f2.x * f2.x) AS BIGINT) AS syy,
         CAST(sum(f1.x * f2.x) AS BIGINT) AS sxy
  FROM filled f1 JOIN filled f2 ON f1.b = f2.b AND f1.source < f2.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n AS n_hours,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE 0.0 END AS r
FROM mom
"""


def _q_tokens_source_mix_shift(sf_dir: str):
    """Daily source-mix shift: the L1 distance between consecutive
    days' source-share vectors — the drift alarm for a training-data
    mixture. Shares are rationals n_s/T, so the L1 sum is computed as
    the EXACT integer numerator sum_s |n_s*T' - n'_s*T| over the
    common denominator T*T'; only the final ratio is one f64 division
    (rounded at 6 on both sides). No float summation order to disagree
    about.

    Scale shape: per-block (source, day) count partials inside
    map_batches, merged by a distributed groupby-sum over a key-space
    bounded by sources x calendar days; the driver holds only that
    bounded table for the vectorized consecutive-day pass."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = _ensure_token_parquet(sf_dir)
    ds = rd.read_parquet(path, columns=["source", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "source": batch["source"],
                "day": batch["ts"].to_numpy(np.int64) // 86400,
            }
        )
        out = b.groupby(["source", "day"], as_index=False).size()
        return out.rename(columns={"size": "c"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["source", "day"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    piv = counts.pivot_table(index="source", columns="day", values="c",
                             aggfunc="sum", fill_value=0).astype(np.int64)
    days = np.array(sorted(piv.columns), dtype=np.int64)
    M = piv[days].to_numpy(np.int64)
    T = M.sum(axis=0)
    rows = []
    for k in range(1, len(days)):
        if days[k] != days[k - 1] + 1 or T[k] == 0 or T[k - 1] == 0:
            continue
        num = int(np.abs(M[:, k] * T[k - 1] - M[:, k - 1] * T[k]).sum())
        den = int(T[k]) * int(T[k - 1])
        rows.append((int(days[k]), num, den, round(float(np.float64(num) / np.float64(den)), 6)))
    return pd.DataFrame(rows, columns=["day", "l1_num", "denom", "mix_shift"])


def _sql_tokens_source_mix_shift(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH d AS (
  SELECT source, CAST(ts // 86400 AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS c
  FROM read_parquet('{tok}') GROUP BY 1, 2
), tot AS (
  SELECT day, CAST(sum(c) AS BIGINT) AS t FROM d GROUP BY 1
), srcs AS (
  SELECT DISTINCT source FROM d
), pairs AS (
  SELECT s.source, cur.day,
         CAST(coalesce(dc.c, 0) AS BIGINT) AS c_cur,
         CAST(coalesce(dp.c, 0) AS BIGINT) AS c_prev,
         cur.t AS t_cur, prev.t AS t_prev
  FROM srcs s
  CROSS JOIN tot cur
  JOIN tot prev ON prev.day = cur.day - 1
  LEFT JOIN d dc ON dc.source = s.source AND dc.day = cur.day
  LEFT JOIN d dp ON dp.source = s.source AND dp.day = cur.day - 1
)
SELECT day,
       CAST(sum(abs(c_cur * t_prev - c_prev * t_cur)) AS BIGINT) AS l1_num,
       CAST(max(t_cur) * max(t_prev) AS BIGINT) AS denom,
       round(CAST(sum(abs(c_cur * t_prev - c_prev * t_cur)) AS DOUBLE)
             / (max(t_cur) * max(t_prev)), 6) AS mix_shift
FROM pairs GROUP BY day
"""


def _q_tokens_source_availability(sf_dir: str):
    """Availability / gaps-and-islands report per source: over the
    source's own hourly [min, max] range — hours present, hours
    missing, the number of distinct outage islands, the longest
    island, and the availability ratio (one f64 division of exact
    ints, rounded at 6).

    Scale shape: a vectorized run-length pass over each source's
    bounded bucket list from the cached tier-0 table; no raw re-read."""
    import numpy as np
    import pandas as pd

    tiers = _build_tiers_cached(sf_dir)
    t0 = tiers[0].to_pandas()[["source", "bucket"]]
    t0["bucket"] = t0["bucket"].astype("int64")
    rows = []
    for s, g in t0.groupby("source"):
        b = np.sort(g["bucket"].to_numpy(np.int64))
        span = int(b[-1] - b[0] + 1)
        present = len(b)
        missing = span - present
        d = np.diff(b)
        holes = d[d > 1] - 1
        rows.append(
            (
                s,
                span,
                present,
                missing,
                int(len(holes)),
                int(holes.max()) if len(holes) else 0,
                round(float(np.float64(present) / np.float64(span)), 6),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "source",
            "span_hours",
            "present_hours",
            "missing_hours",
            "n_gaps",
            "longest_gap_hours",
            "availability",
        ],
    )


def _sql_tokens_source_availability(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH t0 AS (
  SELECT DISTINCT source, CAST(ts // 3600 AS BIGINT) AS b
  FROM read_parquet('{tok}')
), isl AS (
  -- islands of consecutive present hours: bucket - dense row number
  SELECT source, b, b - row_number() OVER (PARTITION BY source ORDER BY b) AS grp
  FROM t0
), islands AS (
  SELECT source, min(b) AS lo, max(b) AS hi
  FROM isl GROUP BY source, grp
), gaps AS (
  -- a gap sits between consecutive islands
  SELECT source,
         lead(lo) OVER (PARTITION BY source ORDER BY lo) - hi - 1 AS gap_len
  FROM islands
), agg AS (
  SELECT source,
         CAST(max(b) - min(b) + 1 AS BIGINT) AS span_hours,
         CAST(count(*) AS BIGINT) AS present_hours
  FROM t0 GROUP BY source
), gagg AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(coalesce(max(gap_len), 0) AS BIGINT) AS longest_gap_hours
  FROM gaps WHERE gap_len IS NOT NULL AND gap_len > 0 GROUP BY source
)
SELECT a.source, a.span_hours, a.present_hours,
       a.span_hours - a.present_hours AS missing_hours,
       CAST(coalesce(g.n_gaps, 0) AS BIGINT) AS n_gaps,
       CAST(coalesce(g.longest_gap_hours, 0) AS BIGINT) AS longest_gap_hours,
       round(CAST(a.present_hours AS DOUBLE) / a.span_hours, 6) AS availability
FROM agg a LEFT JOIN gagg g USING (source)
"""


def _q_tokens_source_hhi(sf_dir: str):
    """Daily source-concentration (Herfindahl-Hirschman index): per
    day, sum of squared source shares — an exact rational sum(n_s^2) /
    T^2 with integer numerator and denominator; the index itself is
    one f64 division rounded at 6. 1/n_sources (perfect balance) ..
    1.0 (single source)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = _ensure_token_parquet(sf_dir)
    ds = rd.read_parquet(path, columns=["source", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {"source": batch["source"], "day": batch["ts"].to_numpy(np.int64) // 86400}
        )
        return b.groupby(["source", "day"], as_index=False).size().rename(columns={"size": "c"})

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["source", "day"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    counts["c"] = counts["c"].astype("int64")
    out = counts.groupby("day", as_index=False).agg(
        n_sources=("source", "size"),
        hhi_num=("c", lambda x: int((x.to_numpy(np.int64) ** 2).sum())),
        total=("c", "sum"),
    )
    out["day"] = out["day"].astype("int64")
    out["n_sources"] = out["n_sources"].astype("int64")
    out["hhi_num"] = out["hhi_num"].astype("int64")
    out["denom"] = (out["total"].astype("int64") ** 2).astype("int64")
    out["hhi"] = np.round(
        out["hhi_num"].to_numpy(np.float64) / out["denom"].to_numpy(np.float64), 6
    )
    return out[["day", "n_sources", "hhi_num", "denom", "hhi"]]


def _sql_tokens_source_hhi(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH d AS (
  SELECT source, CAST(ts // 86400 AS BIGINT) AS day, CAST(count(*) AS BIGINT) AS c
  FROM read_parquet('{tok}') GROUP BY 1, 2
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_sources,
       CAST(sum(c * c) AS BIGINT) AS hhi_num,
       CAST(sum(c) * sum(c) AS BIGINT) AS denom,
       round(CAST(sum(c * c) AS DOUBLE) / (sum(c) * sum(c)), 6) AS hhi
FROM d GROUP BY day
"""


_ACF_LAGS = (1, 24)


def _q_tokens_source_acf(sf_dir: str):
    """Ingest-rate autocorrelation per source at lags 1h and 24h over
    the zero-filled hourly grid — lag-1 measures burst persistence,
    lag-24 daily seasonality strength. Pearson over the overlap window
    from exact int64 moments, float-last in the oracle's operation
    order, rounded at 6. Degenerate (zero-variance) overlaps report
    r = 0.0 on both sides.

    Scale shape: per-source bounded grid from the cached tier-0 table;
    one vectorized dot per (source, lag)."""
    import numpy as np
    import pandas as pd

    tiers = _build_tiers_cached(sf_dir)
    t0 = tiers[0].to_pandas()[["source", "bucket", "agg_count"]]
    t0["bucket"] = t0["bucket"].astype("int64")
    rows = []
    for s, g in t0.groupby("source"):
        b = g["bucket"].to_numpy(np.int64)
        lo, hi = int(b.min()), int(b.max())
        x = np.zeros(hi - lo + 1, dtype=np.int64)
        x[b - lo] = g["agg_count"].to_numpy(np.int64)
        for lag in _ACF_LAGS:
            if len(x) <= lag:
                continue
            a, c = x[:-lag], x[lag:]
            n = np.int64(len(a))
            sx, sy = a.sum(), c.sum()
            sxx = (a * a).sum()
            syy = (c * c).sum()
            sxy = (a * c).sum()
            f1 = n * sxx - sx * sx
            f2 = n * syy - sy * sy
            if f1 > 0 and f2 > 0:
                r = round(
                    float(
                        np.float64(n * sxy - sx * sy)
                        / np.sqrt(np.float64(f1) * np.float64(f2))
                    ),
                    6,
                )
            else:
                r = 0.0
            rows.append((s, lag, int(n), r))
    return pd.DataFrame(rows, columns=["source", "lag", "n_pairs", "r"])


def _sql_tokens_source_acf(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH t0 AS (
  SELECT source, CAST(ts // 3600 AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c
  FROM read_parquet('{tok}') GROUP BY 1, 2
), bounds AS (
  SELECT source, min(b) AS lo, max(b) AS hi FROM t0 GROUP BY 1
), grid AS (
  SELECT bo.source, unnest(generate_series(bo.lo, bo.hi)) AS b FROM bounds bo
), filled AS (
  SELECT g.source, g.b, CAST(coalesce(t0.c, 0) AS BIGINT) AS x
  FROM grid g LEFT JOIN t0 ON t0.source = g.source AND t0.b = g.b
), lags AS (
  SELECT unnest([1, 24]) AS lag
), mom AS (
  SELECT f1.source, l.lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(f1.x) AS BIGINT) AS sx, CAST(sum(f2.x) AS BIGINT) AS sy,
         CAST(sum(f1.x * f1.x) AS BIGINT) AS sxx,
         CAST(sum(f2.x * f2.x) AS BIGINT) AS syy,
         CAST(sum(f1.x * f2.x) AS BIGINT) AS sxy
  FROM lags l
  JOIN filled f1 ON TRUE
  JOIN filled f2 ON f2.source = f1.source AND f2.b = f1.b + l.lag
  GROUP BY 1, 2
)
SELECT source, CAST(lag AS BIGINT) AS lag, n AS n_pairs,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            ELSE 0.0 END AS r
FROM mom
"""


def _q_tokens_rollup_tier3_aggs(sf_dir: str):
    """Ad-hoc continuous-aggregate promotion PAST the configured
    tiers: weekly (7-day) aggregates promoted from the daily tier-2
    via the same associative rollup_next_tier path — sums of sums stay
    exact integers, so the promoted week equals a direct groupby of
    the raw table (the SQL oracle)."""
    import pandas as pd

    from dtaidistance_ray.stages.rollup import RollupConfig, rollup_next_tier

    cfg = RollupConfig()
    tiers = _build_tiers_cached(sf_dir)
    t3 = rollup_next_tier(tiers[2], cfg.tier_widths[2], 7 * 86400, cfg)

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]].copy()
        for c in ("bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
            out[c] = out[c].astype("int64")
        return out

    return t3.map_batches(project, batch_format="pandas")


def _sql_tokens_rollup_tier3(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
SELECT source, CAST(ts // 604800 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS agg_count,
       CAST(sum(n_tok) AS BIGINT) AS agg_n_tok_sum,
       CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS agg_token_sum
FROM read_parquet('{tok}') GROUP BY 1, 2
"""


def _q_tokens_serve_range(sf_dir: str):
    """End-to-end gate proof of the storage engine's full loop: build
    the checkpointed tiered store (run_flagship), apply the retention
    sweep (expire_checkpoint, tier-0 keeps 48h / tier-1 42x4h), then
    SERVE the last 73 hours for every source through the tiered read
    path — per hour, the finest retained tier and its exact
    aggregates. The oracle re-derives the same picture from the raw
    table and the TTL rules alone, so a bug anywhere in write, sweep,
    or read breaks the hash."""

    import pandas as pd

    from dtaidistance_ray.pipelines.serve import serve_range

    out, mb0 = _ensure_swept_store(sf_dir)

    import glob as _glob

    import pyarrow.parquet as _pq

    srcs = set()
    for fp in _glob.glob(f"{out}/tier=2/shard=*/*.parquet"):
        srcs |= set(_pq.read_table(fp, columns=["source"])["source"].to_pylist())
    frames = []
    for s in sorted(srcs):
        r = serve_range(out, s, mb0 - 72, mb0 + 1)
        r.insert(0, "source", s)
        frames.append(r[["source", "hour", "served_tier", "agg_count", "agg_n_tok_sum", "agg_token_sum"]])
    res = pd.concat(frames, ignore_index=True)
    for c in ("hour", "served_tier", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
        res[c] = res[c].astype("int64")
    return res


def _q_tokens_store_compaction(sf_dir: str):
    """Gate proof of store compaction: take the swept tiered store,
    COMPACT every tier's shards into 3 (atomic tier-dir swap, lineage
    manifests with a compaction record), then serve the same 73-hour
    grid per source through the compacted layout. The oracle is the
    SAME raw-table TTL-rule re-derivation as tokens_serve_range — so
    compaction must preserve every served aggregate byte-for-byte or
    the hash breaks."""
    import glob as _glob
    import json as _json
    import shutil as _shutil

    import pandas as pd
    import pyarrow.parquet as _pq

    from dtaidistance_ray.pipelines.serve import serve_range
    from dtaidistance_ray.state.checkpoint import compact_store

    src_store, mb0 = _ensure_swept_store(sf_dir)

    out = os.path.join("/tmp/dtair_store_compact", f"sf{_sf_of(sf_dir)}")
    cmarker = os.path.join(out, "_compacted.json")
    fp = _spec_fp(sf_dir)
    stale = True
    if os.path.exists(cmarker):
        try:
            with open(cmarker) as f:
                stale = _json.load(f).get("spec_fp") != fp
        except (ValueError, OSError):
            stale = True
    if stale:
        if os.path.isdir(out):
            _shutil.rmtree(out)
        _shutil.copytree(src_store, out)
        os.remove(os.path.join(out, "_swept.json"))
        metrics = compact_store(out, target_shards=3)
        metrics["spec_fp"] = fp
        with open(cmarker, "w") as f:
            _json.dump(metrics, f)

    srcs = set()
    for fp in _glob.glob(f"{out}/tier=2/shard=*/*.parquet"):
        srcs |= set(_pq.read_table(fp, columns=["source"])["source"].to_pylist())
    frames = []
    for s in sorted(srcs):
        r = serve_range(out, s, mb0 - 72, mb0 + 1)
        r.insert(0, "source", s)
        frames.append(
            r[["source", "hour", "served_tier", "agg_count", "agg_n_tok_sum", "agg_token_sum"]]
        )
    res = pd.concat(frames, ignore_index=True)
    for c in ("hour", "served_tier", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
        res[c] = res[c].astype("int64")
    return res


def _q_tokens_store_stats(sf_dir: str):
    """Store-integrity gate: per-tier row count and bucket span of the
    SWEPT tiered store, cross-checked against the manifests (a manifest
    whose num_rows disagrees with its parquet fails loudly here). The
    oracle re-derives each tier's surviving (source, bucket) group count
    and span from the raw table + TTL rules alone."""
    import pandas as pd

    from dtaidistance_ray.state.checkpoint import store_stats

    out, _mb0 = _ensure_swept_store(sf_dir)

    res = pd.DataFrame(store_stats(out))
    for c in res.columns:
        res[c] = res[c].astype("int64")
    return res


def _sql_tokens_store_stats(sf: str) -> str:
    # store tiers are GAP-FILLED per source span (gap_fill_tier), so the
    # surviving row count per (source, tier) is the clipped span length:
    # [max(lo, cutoff+1), hi], cutoff = mb0//ratio - keep
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH mx AS (
  SELECT CAST(max(ts) // 3600 AS BIGINT) AS mb0 FROM read_parquet('{tok}')
), spans AS (
  SELECT source, CAST(min(ts) // 3600 AS BIGINT) AS lo0,
         CAST(max(ts) // 3600 AS BIGINT) AS hi0
  FROM read_parquet('{tok}') GROUP BY source
), tiers AS (
  SELECT 0 AS tier, 1 AS ratio, 48 AS keep UNION ALL
  SELECT 1, 4, 42 UNION ALL
  SELECT 2, 24, NULL
), per AS (
  SELECT t.tier,
         CASE WHEN t.keep IS NULL THEN s.lo0 // t.ratio
              ELSE greatest(s.lo0 // t.ratio, mx.mb0 // t.ratio - t.keep + 1)
         END AS lo,
         s.hi0 // t.ratio AS hi
  FROM spans s, tiers t, mx
)
SELECT CAST(tier AS BIGINT) AS tier,
       CAST(sum(greatest(hi - lo + 1, 0)) AS BIGINT) AS n_rows,
       CAST(min(CASE WHEN hi >= lo THEN lo END) AS BIGINT) AS min_bucket,
       CAST(max(CASE WHEN hi >= lo THEN hi END) AS BIGINT) AS max_bucket
FROM per GROUP BY tier
"""


def _sql_tokens_serve_range(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH mx AS (
  SELECT CAST(max(ts) // 3600 AS BIGINT) AS mb0 FROM read_parquet('{tok}')
), spans AS (
  SELECT source, CAST(min(ts) AS BIGINT) AS mnts, CAST(max(ts) AS BIGINT) AS mxts
  FROM read_parquet('{tok}') GROUP BY 1
), grid AS (
  SELECT s.source, unnest(generate_series(mx.mb0 - 72, mx.mb0)) AS hour,
         s.mnts, s.mxts, mx.mb0
  FROM spans s, mx
), a0 AS (
  SELECT source, CAST(ts // 3600 AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(n_tok) AS BIGINT) AS nt,
         CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS tk
  FROM read_parquet('{tok}') GROUP BY 1, 2
), a1 AS (
  SELECT source, CAST(ts // 14400 AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(n_tok) AS BIGINT) AS nt,
         CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS tk
  FROM read_parquet('{tok}') GROUP BY 1, 2
), a2 AS (
  SELECT source, CAST(ts // 86400 AS BIGINT) AS b, CAST(count(*) AS BIGINT) AS c,
         CAST(sum(n_tok) AS BIGINT) AS nt,
         CAST(sum(list_aggregate(tokens, 'sum')) AS BIGINT) AS tk
  FROM read_parquet('{tok}') GROUP BY 1, 2
), pick AS (
  SELECT g.source, g.hour,
         CASE WHEN g.hour BETWEEN g.mnts // 3600 AND g.mxts // 3600
                   AND g.hour > g.mb0 - 48 THEN 0
              WHEN g.hour // 4 BETWEEN g.mnts // 14400 AND g.mxts // 14400
                   AND g.hour // 4 > g.mb0 // 4 - 42 THEN 1
              WHEN g.hour // 24 BETWEEN g.mnts // 86400 AND g.mxts // 86400 THEN 2
              ELSE -1 END AS served_tier
  FROM grid g
)
SELECT p.source, CAST(p.hour AS BIGINT) AS hour,
       CAST(p.served_tier AS BIGINT) AS served_tier,
       CAST(coalesce(a0.c, a1.c, a2.c, 0) AS BIGINT) AS agg_count,
       CAST(coalesce(a0.nt, a1.nt, a2.nt, 0) AS BIGINT) AS agg_n_tok_sum,
       CAST(coalesce(a0.tk, a1.tk, a2.tk, 0) AS BIGINT) AS agg_token_sum
FROM pick p
LEFT JOIN a0 ON p.served_tier = 0 AND a0.source = p.source AND a0.b = p.hour
LEFT JOIN a1 ON p.served_tier = 1 AND a1.source = p.source AND a1.b = p.hour // 4
LEFT JOIN a2 ON p.served_tier = 2 AND a2.source = p.source AND a2.b = p.hour // 24
"""


def _q_tokens_busy_hours(sf_dir: str):
    """Global top-20 busiest ingest hours (rows + token volume): the
    capacity-planning view. Bounded-key bincount partials per block ->
    tiny groupby sum -> per-block pre-top-k -> sort.limit(k): the
    distributed top-k shape even though hours are key-bounded here."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages.rollup import RollupConfig, bucketize

    k = 20
    spec = _token_spec(sf_dir)
    _ensure_token_parquet(sf_dir)
    ds = bucketize(token_table(spec), RollupConfig().tier_widths[0], spec)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("bucket", as_index=False).agg(
            n_docs=("bucket", "size"), n_tokens=("n_tok", "sum")
        )
        return g

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens"))
    )

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("bucket", "n_docs", "n_tokens"):
            batch[c] = batch[c].astype("int64")
        return batch.sort_values(
            ["n_docs", "bucket"], ascending=[False, True], kind="mergesort"
        ).head(k)

    return (
        agg.map_batches(pre, batch_format="pandas")
        .sort(["n_docs", "bucket"], descending=[True, False])
        .limit(k)
    )


def _sql_tokens_busy_hours(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
SELECT CAST(ts // 3600 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM read_parquet('{tok}')
GROUP BY bucket
ORDER BY n_docs DESC, bucket LIMIT 20
"""


def _q_tokens_source_freshness(sf_dir: str):
    """Freshness/staleness alert view: per source, the last ingested
    hourly bucket, hours stale relative to the global max, and the
    alert flag (stale > 24h) — the ops surface a rollup pipeline pages
    on. Map-side per-block max partials -> tiny groupby max; the global
    max is a second bounded reduction, not a driver scan."""
    import pandas as pd
    from ray.data.aggregate import Max

    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages.rollup import RollupConfig, bucketize

    spec = _token_spec(sf_dir)
    _ensure_token_parquet(sf_dir)
    ds = bucketize(token_table(spec), RollupConfig().tier_widths[0], spec)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("source", as_index=False).agg(last_bucket=("bucket", "max"))

    per_src = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(Max("last_bucket", alias_name="last_bucket"))
        .to_pandas()
    )
    per_src["last_bucket"] = per_src["last_bucket"].astype("int64")
    gmax = int(per_src["last_bucket"].max())
    per_src["hours_stale"] = (gmax - per_src["last_bucket"]).astype("int64")
    per_src["alert"] = per_src["hours_stale"] > 24
    return per_src.sort_values("source").reset_index(drop=True)


def _sql_tokens_source_freshness(sf: str) -> str:
    tok = f"{_TOK_DIR}/sf{sf}.parquet"
    return f"""
WITH s AS (
  SELECT source, CAST(max(ts) // 3600 AS BIGINT) AS last_bucket
  FROM read_parquet('{tok}') GROUP BY source
), mx AS (SELECT max(last_bucket) AS g FROM s)
SELECT s.source, s.last_bucket,
       CAST(mx.g - s.last_bucket AS BIGINT) AS hours_stale,
       (mx.g - s.last_bucket) > 24 AS alert
FROM s, mx
"""


def _q_tokens_repr_fidelity(sf_dir: str):
    """Rollup fidelity audit: banded DTW distance from each MEMBER
    sequence to its bucket's tier-0 DBA representative, over a
    deterministic sample of (source, bucket) groups — the quality
    metric that justifies serving representatives instead of raw
    members. Non-SQL (DTW); golden verified against the reference
    library's dtw.distance to the single-process oracle's
    representatives (independent of the distributed scan).

    Scale shape: the sampled reprs broadcast as a small dict; members
    filter map-side and score per batch with the engine's kernel —
    the raw corpus never leaves the map stage."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.kernels.elastic import distance as dtw_distance
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages.rollup import RollupConfig, bucketize

    cfg = RollupConfig()
    tiers = _build_tiers_cached(sf_dir)
    t0 = tiers[0].to_pandas()[["source", "bucket", "repr_series"]]
    t0["bucket"] = t0["bucket"].astype("int64")
    sample = {}
    for s in ("source_000", "source_001", "source_002"):
        g = t0[t0["source"] == s].sort_values("bucket").head(5)
        for _, r in g.iterrows():
            sample[(s, int(r["bucket"]))] = np.asarray(r["repr_series"], dtype=np.float64)

    spec = _token_spec(sf_dir)
    ds = bucketize(token_table(spec), cfg.tier_widths[0], spec)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, toks, src, bkt in zip(
            batch["doc_id"], batch["tokens"], batch["source"], batch["bucket"]
        ):
            key = (src, int(bkt))
            rep = sample.get(key)
            if rep is None:
                continue
            d = dtw_distance(np.asarray(toks, dtype=np.float64), rep, cfg.dtw)
            rows.append((did, src, int(bkt), round(float(d), 6)))
        return pd.DataFrame(rows, columns=["doc_id", "source", "bucket", "dist_to_repr"])

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    out["bucket"] = out["bucket"].astype("int64")
    return out.sort_values(["source", "bucket", "doc_id"]).reset_index(drop=True)


def _q_tokens_repr_drift(sf_dir: str):
    """Representative drift: banded+pruned DTW distance between each
    source's CONSECUTIVE daily (tier-2) DBA representatives — how much
    a source's shape changed day over day, computed on the rolled-up
    product instead of the raw corpus (the whole point of keeping
    representatives). Non-SQL (DTW); golden verified against the
    reference library's dtw.distance over the single-process oracle's
    tier-2 representatives.

    Scale shape: the pair list is bounded by (source x days); the DTW
    work is distributed via map_batches over the pair rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dtaidistance_ray.kernels.elastic import distance as dtw_distance
    from dtaidistance_ray.settings import DTWSettings

    tiers = _build_tiers_cached(sf_dir)
    t2 = tiers[2].to_pandas()[["source", "bucket", "repr_series"]]
    t2["bucket"] = t2["bucket"].astype("int64")
    rows = []
    for s, g in t2.groupby("source"):
        g = g.sort_values("bucket", kind="mergesort")
        reprs = list(g["repr_series"])
        buckets = g["bucket"].tolist()
        for k in range(1, len(buckets)):
            rows.append((s, buckets[k - 1], buckets[k], reprs[k - 1], reprs[k]))
    pairs = pd.DataFrame(rows, columns=["source", "prev_bucket", "bucket", "a", "b"])

    settings = DTWSettings(window=32, use_pruning=True)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        d = [
            round(
                float(
                    dtw_distance(
                        np.asarray(a, dtype=np.float64),
                        np.asarray(b, dtype=np.float64),
                        settings,
                    )
                ),
                6,
            )
            for a, b in zip(batch["a"], batch["b"])
        ]
        out = batch[["source", "prev_bucket", "bucket"]].copy()
        out["len_prev"] = [len(a) for a in batch["a"]]
        out["len_cur"] = [len(b) for b in batch["b"]]
        out["d"] = d
        for c in ("prev_bucket", "bucket", "len_prev", "len_cur"):
            out[c] = out[c].astype("int64")
        return out

    if not len(pairs):
        import pandas as _pd

        return _pd.DataFrame(
            columns=["source", "prev_bucket", "bucket", "len_prev", "len_cur", "d"]
        )
    return rd.from_pandas(pairs).map_batches(score, batch_format="pandas")


def _q_dtw_distance_matrix(sf_dir: str):
    """All-pairs banded+pruned DTW over a 48-series sample of the token
    table (condensed pair rows). Non-SQL; parity vs the reference
    library is asserted in tests/test_kernel_parity.py."""
    from dtaidistance_ray.stages.distance_matrix import distance_matrix_sample

    return distance_matrix_sample(_token_spec(sf_dir), n=48)


def _q_subsequence_knn(sf_dir: str):
    from dtaidistance_ray.stages.search import subsequence_knn_tokens

    return subsequence_knn_tokens(_token_spec(sf_dir), k=10)


def _q_tokens_lttb(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_lttb

    _ensure_token_parquet(sf_dir)
    return tokens_lttb(_token_spec(sf_dir))


def _sql_tokens_lttb(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_lttb_sql

    return tokens_lttb_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_tokens_paa(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_paa

    _ensure_token_parquet(sf_dir)
    return tokens_paa(_token_spec(sf_dir))


def _q_tokens_derivative(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_derivative

    _ensure_token_parquet(sf_dir)
    return tokens_derivative(_token_spec(sf_dir))


def _q_tokens_znormal(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_znormal

    _ensure_token_parquet(sf_dir)
    return tokens_znormal(_token_spec(sf_dir))


def _q_tokens_logdomain_stats(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_logdomain_stats

    _ensure_token_parquet(sf_dir)
    return tokens_logdomain_stats(_token_spec(sf_dir))


def _q_hierarchical_clusters(sf_dir: str):
    """Hierarchical clustering of a 24-series token sample; returns
    (series_idx, prototype_idx) — parity with the reference clustering
    is covered in tests/test_ops_parity.py (rows-only here)."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.sources.synth import generate_batch
    from dtaidistance_ray.stages.clustering import Hierarchical
    from dtaidistance_ray import DTWSettings

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(24, dtype=np.int64), spec)
    seqs = [np.asarray(x, dtype=np.float64) for x in t["tokens"].to_pylist()]
    clusters = Hierarchical(settings=DTWSettings(window=16), max_dist=80.0).fit(seqs)
    rows = [
        {"series_idx": int(m), "prototype_idx": int(p)}
        for p, members in clusters.items()
        for m in members
    ]
    return pd.DataFrame(rows).sort_values("series_idx").reset_index(drop=True)


def _q_kmeans_clusters(sf_dir: str):
    """k-means (DTW assignment + DBA update) over a 40-series sample."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.sources.synth import generate_batch
    from dtaidistance_ray.stages.clustering import KMeans
    from dtaidistance_ray import DTWSettings

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(40, dtype=np.int64), spec)
    seqs = [np.asarray(x, dtype=np.float64) for x in t["tokens"].to_pylist()]
    km = KMeans(k=4, max_it=3, seed=7, settings=DTWSettings(window=16))
    clusters = km.fit(seqs)
    rows = [
        {"series_idx": int(m), "cluster": int(c)}
        for c, members in clusters.items()
        for m in members
    ]
    return pd.DataFrame(rows).sort_values("series_idx").reset_index(drop=True)


def _q_nw_align_tokens(sf_dir: str):
    """Needleman-Wunsch alignment scores of token sequence pairs
    (sequence alignment on symbols; parity in tests)."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.kernels.alignment import needleman_wunsch
    from dtaidistance_ray.sources.synth import generate_batch

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(20, dtype=np.int64), spec)
    seqs = [list(np.asarray(x) % 16) for x in t["tokens"].to_pylist()]
    rows = []
    for i in range(len(seqs)):
        for j in range(i + 1, min(i + 4, len(seqs))):
            v, _, _ = needleman_wunsch(seqs[i], seqs[j])
            rows.append({"i": i, "j": j, "nw_score": float(v)})
    return pd.DataFrame(rows)


def _q_symbolize_tokens(sf_dir: str):
    """Codebook symbolization of token sequences (SymbolAlignment
    align2 + hangover; parity in tests/test_symbolization.py). Symbol
    arrays are emitted comma-joined so the rows hash in the gate."""
    import pandas as pd

    from dtaidistance_ray.stages.symbolization import symbolize_tokens

    spec = _token_spec(sf_dir)
    ds = symbolize_tokens(spec, codebook_size=3, n_docs=30)

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        batch["symbols"] = [",".join(str(int(v)) for v in s) for s in batch["symbols"]]
        batch["symbol_seq"] = [
            ",".join(str(int(v)) for v in s) for s in batch["symbol_seq"]
        ]
        return batch

    return ds.map_batches(join, batch_format="pandas")


def _q_subsequence_alignment(sf_dir: str):
    """Query-in-series matches over token sequences (free start/end)."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.sources.synth import generate_batch
    from dtaidistance_ray.stages.search import subsequence_alignment_matches

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(12, dtype=np.int64), spec)
    docs = t.to_pandas()
    rows = []
    for doc_id, toks in zip(docs["doc_id"], docs["tokens"]):
        toks = np.asarray(toks, dtype=np.float64)
        if len(toks) < 24:
            continue
        query = toks[5:15]
        for m in subsequence_alignment_matches(toks, query, k=2):
            rows.append(
                {
                    "doc_id": doc_id,
                    "start": m["start"],
                    "end": m["end"],
                    "value": round(m["value"], 6),
                }
            )
    return pd.DataFrame(rows)


def _q_tokens_rollup_time_index(sf_dir: str):
    """Per-source delta-of-delta time-grid index of every tier
    (the tier's bucket-start timestamps compressed to ~1 bit/bucket),
    reduced to (tier, source, n_buckets, crc32(ts_dod)) so the gate can
    hash it against a rollup_oracle golden."""
    import zlib

    import pandas as pd

    from dtaidistance_ray.stages.rollup import RollupConfig, gap_fill_tier, tier_time_index

    cfg = RollupConfig()
    tiers = _build_tiers_cached(sf_dir)

    def view(tier):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "tier": tier,
                    "source": batch["source"],
                    "n_buckets": batch["n_buckets"].astype("int64"),
                    "ts_dod_crc": [zlib.crc32(bytes(p)) for p in batch["ts_dod"]],
                }
            )
            out["tier"] = out["tier"].astype("int64")
            out["ts_dod_crc"] = out["ts_dod_crc"].astype("int64")
            return out

        return fn

    parts = [
        tier_time_index(gap_fill_tier(tiers[t]), cfg.tier_widths[t]).map_batches(
            view(t), batch_format="pandas"
        )
        for t in range(len(cfg.tier_widths))
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _q_subsequence_knee_matches(sf_dir: str):
    """Knee-stopped match streams (DetectKnee EWMA criterion): all
    matches of a planted query inside each series until the value curve
    knees — the reference best_matches_knee semantics over the token
    table (parity with the reference iterator in
    tests/test_subsequence.py)."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.sources.synth import generate_batch
    from dtaidistance_ray.stages.search import SubsequenceAlignment

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(12, dtype=np.int64), spec)
    docs = t.to_pandas()
    rows = []
    for doc_id, toks in zip(docs["doc_id"], docs["tokens"]):
        toks = np.asarray(toks, dtype=np.float64)
        if len(toks) < 24:
            continue
        query = toks[5:15]
        sa = SubsequenceAlignment(query, toks)
        for rank, m in enumerate(sa.best_matches_knee(alpha=0.3)):
            rows.append(
                {
                    "doc_id": doc_id,
                    "rank": rank,
                    "idx": int(m.idx),
                    "start": int(m.segment[0]),
                    "end": int(m.segment[1]),
                    "value": round(float(m.value), 6),
                }
            )
    out = pd.DataFrame(rows)
    for c in ("rank", "idx", "start", "end"):
        out[c] = out[c].astype("int64")
    return out


def _q_local_concurrences(sf_dir: str):
    """Recurring-pattern mining (LoCo) within token sequences."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.sources.synth import generate_batch
    from dtaidistance_ray.stages.loco import LocalConcurrences

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(8, dtype=np.int64), spec)
    rows = []
    for doc_id, toks in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
        s = np.asarray(toks, dtype=np.float64)
        if len(s) < 24:
            continue
        lc = LocalConcurrences(s)
        lc.estimate_settings_from_std(s, tau_std=0.5)
        for m in lc.kbest_matches(k=2, minlen=3):
            rows.append(
                {
                    "doc_id": doc_id,
                    "row": m["row"],
                    "col": m["col"],
                    "path_len": len(m["path"]),
                }
            )
    return pd.DataFrame(rows)


def _q_multimodal_decode(sf_dir: str):
    """Multimodal plumbing: synthetic media table -> image thumbnail
    features via the actor-pool decode stage (codec stubbed). The
    thumbnail vector is emitted as a crc32 digest column so the result
    is hashable by the correctness gate (raw vectors are exercised in
    tests/test_stages.py)."""
    import zlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dtaidistance_ray.stages.multimodal import decode_images, synth_media_table

    ds = decode_images(rd.from_arrow(synth_media_table(90, seed=3)), thumb=4)

    def digest(batch: pd.DataFrame) -> pd.DataFrame:
        batch["thumb_crc"] = [
            zlib.crc32(np.asarray(v, dtype=np.float64).round(6).tobytes())
            for v in batch["thumb_vec"]
        ]
        batch["thumb_crc"] = batch["thumb_crc"].astype("int64")
        return batch[["media_id", "thumb_crc", "pixel_mean"]]

    return ds.map_batches(digest, batch_format="pandas")


def _q_warping_path_prob(sf_dir: str):
    """Probabilistic warping-path sampling over token pairs
    (kernels/elastic.warping_path_prob — the reference's C-only
    dtw.warping_path_prob, dtw.py:1041): 5 seeded samples per pair in
    long format (pair, sample, step, i, j), avg = dtw distance /
    len(s1) (the reference test's temperature, tests/test_warping.py:67).
    Deterministic via a per-(pair, sample) np.random.default_rng seed.
    The golden check proves monotone-path validity, corner endpoints,
    sampled cost >= the reference dtw.distance (optimal lower bound),
    and that sampling actually explores (>= 2 distinct paths for some
    pair)."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.kernels import distance
    from dtaidistance_ray.kernels.elastic import warping_path_prob
    from dtaidistance_ray.sources.synth import generate_batch

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(12, dtype=np.int64), spec)
    seqs = [np.asarray(x, dtype=np.float64) for x in t["tokens"].to_pylist()]
    rows = []
    for p in range(6):
        s1, s2 = seqs[2 * p], seqs[2 * p + 1]
        avg = distance(s1, s2) / len(s1)
        for sample in range(5):
            rng = np.random.default_rng(1_000_000 + 1000 * p + sample)
            path = warping_path_prob(s1, s2, avg, rng=rng)
            for step, (i, j) in enumerate(path):
                rows.append(
                    {"pair": p, "sample": sample, "step": step, "i": int(i), "j": int(j)}
                )
    return pd.DataFrame(rows)


def _q_warping_path_lowmem(sf_dir: str):
    """Hirschberg low-memory warping paths for token sequence pairs
    (kernels/lowmem.py) — long format (pair, step, i, j). The golden
    check proves path validity + cost-optimality against the reference
    dtw.distance (the path cost must equal the DTW distance)."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.kernels.lowmem import warping_path_fast
    from dtaidistance_ray.sources.synth import generate_batch

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(12, dtype=np.int64), spec)
    seqs = [np.asarray(x, dtype=np.float64) for x in t["tokens"].to_pylist()]
    rows = []
    for p in range(0, 12, 2):
        path = warping_path_fast(seqs[p], seqs[p + 1], use_lowmem=64)
        for step, (i, j) in enumerate(path):
            rows.append({"pair": p // 2, "step": step, "i": int(i), "j": int(j)})
    return pd.DataFrame(rows)


def _q_dtw_weighted_matrix(sf_dir: str):
    """Weighted-DTW distance matrix (kernels/weighted.py) over an
    8-sequence token sample with a deterministic dead-zone weight
    profile on sequence 0; condensed (i, j, d) rows rounded to 6."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.kernels.weighted import distance_matrix
    from dtaidistance_ray.sources.synth import generate_batch

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(8, dtype=np.int64), spec)
    seqs = [np.asarray(x, dtype=np.float64)[:24] % 64 for x in t["tokens"].to_pylist()]
    w = np.full((len(seqs[0]), 8), np.inf)
    w[:, 2:6] = 0.0
    w[4:12, 2:6] = 8.0  # dead zone of width 8 on points 4..11
    m = distance_matrix(seqs, {0: w}, window=8)
    rows = [
        {"i": i, "j": j, "d": round(float(m[i, j]), 6)}
        for i in range(len(seqs))
        for j in range(i + 1, len(seqs))
    ]
    return pd.DataFrame(rows)


def _q_multimodal_decode_real(sf_dir: str):
    """REAL image decode: BMP/PPM payloads parsed in pure NumPy by the
    decode stage; thumbnails digested for hashability (true-pixel
    parity is asserted in tests/test_stages.py and the golden check)."""
    import zlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dtaidistance_ray.stages.multimodal import decode_images, synth_media_table_real

    ds = decode_images(rd.from_arrow(synth_media_table_real(90, seed=11)), thumb=4)

    def digest(batch: pd.DataFrame) -> pd.DataFrame:
        batch["thumb_crc"] = [
            zlib.crc32(np.asarray(v, dtype=np.float64).round(4).tobytes())
            for v in batch["thumb_vec"]
        ]
        batch["thumb_crc"] = batch["thumb_crc"].astype("int64")
        batch["pixel_mean"] = batch["pixel_mean"].round(6)
        return batch[["media_id", "thumb_crc", "pixel_mean"]]

    return ds.map_batches(digest, batch_format="pandas")


def _q_multimodal_decode_gif(sf_dir: str):
    """REAL GIF decode: own-LZW payloads (codec/gif.py) decoded by the
    image stage; thumbnails digested for hashability. The golden check
    recomputes pixel means from the PRE-ENCODE source arrays (same
    seed), never via the decoder — a decoder bug cannot self-verify."""
    import zlib

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dtaidistance_ray.stages.multimodal import decode_images, synth_media_table_gif

    ds = decode_images(rd.from_arrow(synth_media_table_gif(60, seed=17)), thumb=4)

    def digest(batch: pd.DataFrame) -> pd.DataFrame:
        batch["thumb_crc"] = [
            zlib.crc32(np.asarray(v, dtype=np.float64).round(4).tobytes())
            for v in batch["thumb_vec"]
        ]
        batch["thumb_crc"] = batch["thumb_crc"].astype("int64")
        batch["pixel_mean"] = batch["pixel_mean"].round(6)
        return batch[["media_id", "thumb_crc", "pixel_mean"]]

    return ds.map_batches(digest, batch_format="pandas")


def _q_events_profile_dtw_anomaly(sf_dir: str):
    """DTW daily-profile anomaly detection over events: z-normalized
    24h count profiles per (type, day), DBA barycenter per type, banded
    DTW distance to it, top-5 anomalous days. The engine's own elastic
    kernels on the relational table; golden verified against the
    reference dtaidistance library (dtw.distance +
    dtw_barycenter.dba_loop) over a DuckDB-derived grid."""
    from dtaidistance_ray.stages import events

    out = events.profile_dtw_anomaly(sf_dir)
    out = out.copy()
    out["dist"] = out["dist"].round(9)
    return out


def _q_multimodal_gif_frames(sf_dir: str):
    """REAL video frame sampling: animated-GIF payloads decoded frame
    by frame (per-frame GCE delays define the timeline); the frame
    displayed at each 200 ms tick is digested from its composed RGB
    canvas. Golden verified against the pre-encode source frames
    regenerated from the corpus seed (decoder-independent)."""
    import ray.data as rd

    from dtaidistance_ray.stages.multimodal import sample_video_frames, synth_video_table_gif

    return sample_video_frames(rd.from_arrow(synth_video_table_gif(40, seed=19)), every_ms=200)


def _q_multimodal_video_mjpeg(sf_dir: str):
    """REAL video decode: MJPEG-in-AVI payloads (codec/avi.py RIFF
    container + codec/jpeg.py per-frame baseline JPEG). Frame ticks
    replay the true container frame rate (incl. NTSC 30000/1001);
    each sampled row carries the raw-chunk digest (verified by an
    independent RIFF walk in tools/make_goldens.py) and decoded-pixel
    mean/std (verified within JPEG-loss tolerance against the
    pre-encode source frames regenerated from the corpus seed — a
    fake decode cannot pass)."""
    import pandas as pd
    import ray.data as rd

    from dtaidistance_ray.stages.multimodal import synth_video_table_mjpeg, video_frame_features

    ds = video_frame_features(rd.from_arrow(synth_video_table_mjpeg(36, seed=23)), every_ms=100)

    def stable(batch: pd.DataFrame) -> pd.DataFrame:
        batch["frame_mean"] = batch["frame_mean"].round(4)
        batch["frame_std"] = batch["frame_std"].round(4)
        return batch

    return ds.map_batches(stable, batch_format="pandas")


def _q_multimodal_audio_features(sf_dir: str):
    """REAL audio decode: WAV PCM16 payloads -> rms / zero-crossing
    rate / dominant frequency (numpy FFT)."""
    import ray.data as rd

    from dtaidistance_ray.stages.multimodal import audio_features, synth_media_table_real

    return audio_features(rd.from_arrow(synth_media_table_real(90, seed=11)))


def _q_multimodal_audio_g711(sf_dir: str):
    """REAL compressed-audio decode: G.711 mu-law / A-law and IMA
    ADPCM WAV payloads (format tags 7/6/0x11) decoded by own codecs
    (codec/g711.py, codec/ima_adpcm.py — exhaustively byte-equal to
    CPython's independent audioop implementation in tests) -> rms /
    zero-crossing rate / dominant frequency. Golden verified by an
    audioop-based independent decode in tools/make_goldens.py."""
    import ray.data as rd

    from dtaidistance_ray.stages.multimodal import audio_features, synth_audio_table_g711

    return audio_features(rd.from_arrow(synth_audio_table_g711(90, seed=13)))


def _q_multimodal_audio_flac(sf_dir: str):
    """REAL FLAC decode: payloads compressed by the own encoder across
    every subframe type (constant/verbatim/fixed0-4/LPC), Rice
    partition orders 0-2 and all stereo decorrelation modes, decoded
    by the own spec-anchored decoder (codec/flac.py; hand-built
    bitstream fixtures in tests/test_codec.py) -> rms / zero-crossing
    rate / dominant frequency. Golden verified decoder-independently:
    tools/make_goldens.py recomputes the features from the PRE-ENCODE
    source samples (lossless codec => bit-equal doubles)."""
    import ray.data as rd

    from dtaidistance_ray.stages.multimodal import audio_features, synth_audio_table_flac

    return audio_features(rd.from_arrow(synth_audio_table_flac(90, seed=17)))


def _q_explain_pairs(sf_dir: str):
    """DSW warping-path explanations (stages/explain.py ExplainPair)
    for token sequence pairs — one row per simplified segment."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from dtaidistance_ray.stages.explain import explain_pairs_dataset
    from dtaidistance_ray.sources.synth import generate_batch

    spec = _token_spec(sf_dir)
    t = generate_batch(np.arange(12, dtype=np.int64), spec)
    seqs = [np.asarray(x, dtype=np.float64) for x in t["tokens"].to_pylist()]
    pairs = rd.from_pandas(
        pd.DataFrame(
            {
                "pair_id": list(range(6)),
                "series_from": [seqs[2 * p] for p in range(6)],
                "series_to": [seqs[2 * p + 1] for p in range(6)],
            }
        )
    ).repartition(4)
    return explain_pairs_dataset(pairs, delta_rel=1, delta_abs=2.0)


def _q_tokens_storage_efficiency(sf_dir: str):
    """Storage-efficiency report per (tier, source): buckets, points,
    Gorilla payload bytes vs raw float64 bytes, compression ratio —
    the observability surface every compressed tiered store needs.
    Bounded key space (tiers x sources): per-block partials + tiny
    groupby sum; golden = the single-process oracle's rows encoded
    with the same codec and reduced the same way."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    from dtaidistance_ray.stages.rollup import RollupConfig, encode_tier, gap_fill_tier

    cfg = RollupConfig()
    tiers = _build_tiers_cached(sf_dir)
    parts = None
    for t in range(len(cfg.tier_widths)):
        enc = encode_tier(gap_fill_tier(tiers[t]))

        def pf(batch: pd.DataFrame, tier=t) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "tier": np.full(len(batch), tier, dtype=np.int64),
                    "source": batch["source"].to_numpy(),
                    "n_buckets": np.ones(len(batch), dtype=np.int64),
                    "n_points": pd.array(
                        [len(r) for r in batch["repr_series"]], dtype="int64"
                    ),
                    "payload_bytes": pd.array(
                        [len(bytes(p)) for p in batch["repr_gorilla"]], dtype="int64"
                    ),
                }
            )

        d = enc.map_batches(pf, batch_format="pandas")
        parts = d if parts is None else parts.union(d)
    out = parts.groupby(["tier", "source"]).aggregate(
        Sum("n_buckets", alias_name="n_buckets"),
        Sum("n_points", alias_name="n_points"),
        Sum("payload_bytes", alias_name="payload_bytes"),
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("tier", "n_buckets", "n_points", "payload_bytes"):
            batch[c] = batch[c].astype("int64")
        batch["raw_bytes"] = batch["n_points"] * 8
        batch["ratio"] = (batch["payload_bytes"] / batch["raw_bytes"]).round(6)
        return batch

    return out.map_batches(finalize, batch_format="pandas")


def _q_tokens_rollup_payload_crc(sf_dir: str):
    """Gorilla-encoded representative payloads of every tier, reduced
    to crc32 per (tier, source, bucket) — hash-checks the encode path
    end-to-end in the gate (golden = the single-process oracle's rows
    encoded with the same codec)."""
    import zlib

    import pandas as pd

    from dtaidistance_ray.stages.rollup import RollupConfig, encode_tier, gap_fill_tier

    cfg = RollupConfig()
    tiers = _build_tiers_cached(sf_dir)

    def crc(tier):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            out = batch[["source", "bucket"]].copy()
            out.insert(0, "tier", tier)
            out["payload_crc"] = [zlib.crc32(bytes(p)) for p in batch["repr_gorilla"]]
            out["payload_crc"] = out["payload_crc"].astype("int64")
            out["tier"] = out["tier"].astype("int64")
            out["bucket"] = out["bucket"].astype("int64")
            return out

        return fn

    # the staged per-tier path: bit-exact vs the single-process oracle
    # (the fused metrics path may differ by float-summation ULPs on
    # upper-tier averages — see downstream_fused docstring)
    parts = [
        encode_tier(gap_fill_tier(tiers[t])).map_batches(
            crc(t), batch_format="pandas"
        )
        for t in range(len(cfg.tier_widths))
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _q_minhash_signatures(sf_dir: str):
    """MinHash signatures in long format (doc_id, perm, sig) — the
    permutation slots become rows so the values hash in the gate."""
    import numpy as np
    import pandas as pd

    from dtaidistance_ray.stages import dedup

    ds = dedup.minhash_signatures(sf_dir)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([np.asarray(s, dtype=np.int64) for s in batch["minhash"]])
        n, p = sigs.shape
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy().astype(np.int64), p),
                "perm": np.tile(np.arange(p, dtype=np.int64), n),
                "sig": sigs.reshape(-1),
            }
        )

    return ds.map_batches(explode, batch_format="pandas")


def _q_tokens_rollup_tier0_repr(sf_dir: str):
    """Tier-0 DBA representatives in long format (source, bucket, pos,
    val rounded 6) — the non-SQL half of the rollup, checked against a
    golden produced by the single-process oracle (pipelines.flagship.
    rollup_oracle, an independent pandas-only code path)."""
    import numpy as np
    import pandas as pd


    t0 = _build_tiers_cached(sf_dir)[0]

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"source": [], "bucket": [], "pos": [], "val": []}
        for src, bkt, rep in zip(batch["source"], batch["bucket"], batch["repr_series"]):
            rep = np.asarray(rep, dtype=np.float64)
            rows["source"].extend([src] * len(rep))
            rows["bucket"].extend([int(bkt)] * len(rep))
            rows["pos"].extend(range(len(rep)))
            rows["val"].extend(np.round(rep, 6))
        out = pd.DataFrame(rows)
        out["bucket"] = out["bucket"].astype("int64")
        out["pos"] = out["pos"].astype("int64")
        return out

    return t0.map_batches(explode, batch_format="pandas")


# ---------------------------------------------------------------------------
# golden oracles: non-SQL-expressible queries checked against committed
# parquet goldens (regenerated by tools/make_goldens.py, which verifies
# them against the reference library / independent recomputations where
# possible — provenance in goldens/PROVENANCE.md). The SQL is a plain
# read of the golden file, so the driver's DuckDB hashes golden rows
# against the live Ray run.
# ---------------------------------------------------------------------------

_GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

GOLDEN_QUERIES = (
    "dtw_distance_matrix",
    "subsequence_knn",
    "hierarchical_clusters_tokens",
    "kmeans_clusters_tokens",
    "nw_align_tokens",
    "symbolize_tokens",
    "subsequence_alignment_tokens",
    "subsequence_knee_matches_tokens",
    "local_concurrences_tokens",
    "doc_lang_id",
    "doc_fingerprints",
    "minhash_signatures",
    "simhash_signatures",
    "minhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
    "multimodal_decode",
    "tokens_rollup_tier0_repr",
    "warping_path_lowmem_tokens",
    "warping_path_prob_tokens",
    "dtw_weighted_matrix",
    "explain_pairs_tokens",
    "multimodal_decode_real",
    "multimodal_audio_features",
    "multimodal_audio_g711",
    "multimodal_audio_flac",
    "multimodal_decode_gif",
    "multimodal_gif_frames",
    "multimodal_video_mjpeg",
    "events_profile_dtw_anomaly",
    "ann_ivf_topk",
    "ann_pq_topk",
    "tokens_rollup_payload_crc",
    "tokens_storage_efficiency",
    "tokens_rollup_tier0_full",
    "tokens_rollup_tier2_full",
    "tokens_rollup_time_index",
    "embedding_pca_top",
    "tokens_repr_drift",
    "tokens_repr_fidelity",
    "bpe_train_merges",
    "bpe_encode_documents",
)


def _golden_oracles() -> dict[str, str]:
    out = {}
    for name in GOLDEN_QUERIES:
        path = os.path.join(_GOLDEN_DIR, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = f"SELECT * FROM read_parquet('{path}')"
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from dtaidistance_ray.stages import ann, bpe, dedup, events, text
    from dtaidistance_ray.stages.relational import lineitem_pricing_summary, revenue_by_nation

    return {
        # events-table rollup engine (SQL oracles)
        "rollup_events_hourly": events.rollup_hourly,
        "rollup_events_daily_from_hourly": events.rollup_daily_from_hourly,
        "rollup_events_hourly_gapfill": events.rollup_hourly_gapfill,
        "events_rolling_hourly_avg": events.rolling_hourly_avg,
        "events_hourly_anomalies": events.hourly_anomalies,
        "events_asof_hourly_baseline": events.events_asof_hourly_baseline,
        "events_in_sessions": events.events_in_sessions,
        "events_session_intervals": events.session_intervals,
        "events_top_users_per_type": events.top_users_per_type,
        "events_sessionize": events.sessionize,
        "events_top_users_by_value": events.top_users_by_value,
        "events_distinct_users": _q_events_distinct_users,
        "events_ohlc_hourly": events.ohlc_hourly,
        "events_counter_increase": events.counter_increase,
        "rollup_events_hourly_lerp": events.rollup_hourly_lerp,
        "rollup_events_hourly_locf": events.rollup_hourly_locf,
        "events_daily_mann_kendall": events.daily_mann_kendall,
        "events_seasonal_decompose": events.hourly_seasonal_decompose,
        "events_rate_limit_audit": events.rate_limit_audit,
        "events_value_benford": events.value_benford,
        "events_hourly_ewma": events.hourly_ewma,
        "events_hourly_xcorr_lags": events.hourly_xcorr_lags,
        "events_hourly_cusum": events.hourly_cusum_changepoints,
        "events_hourly_holt": events.hourly_holt,
        "events_hourly_trend": events.hourly_trend,
        "events_value_percentiles_daily": events.value_percentiles_daily,
        "events_funnel_stages": events.funnel_stages,
        "events_seasonal_anomalies": events.seasonal_anomalies,
        "events_retention_cohorts": events.retention_cohorts,
        "events_user_interarrival": events.user_interarrival_stats,
        "events_dau_wau_stickiness": events.dau_wau_stickiness,
        "events_out_of_order_audit": events.out_of_order_audit,
        "events_hourly_median_bands": events.hourly_median_bands,
        "events_last_touch_attribution": events.last_touch_attribution,
        "events_props_extract": events.props_extract_rollup,
        "events_user_rfm": events.user_rfm_segments,
        "events_value_histogram_daily": events.value_histogram_daily,
        "events_histogram_quantile": events.histogram_quantile,
        "events_slo_burn_rate": events.slo_burn_rate,
        "events_grouping_sets_cube": events.grouping_sets_cube,
        # relational ops
        "lineitem_pricing_summary": lineitem_pricing_summary,
        "revenue_by_nation": revenue_by_nation,
        "customers_dormant": _q_customers_dormant,
        "suppliers_of_large_parts": _q_suppliers_of_large_parts,
        # text / training-data ops
        "dedup_exact_documents": text.dedup_exact,
        "doc_token_counts": text.token_counts,
        "doc_quality_scores": text.quality_scores,
        "doc_lang_id": text.lang_id,
        "doc_fingerprints": text.fingerprints,
        "documents_stratified_sample": text.stratified_sample,
        "documents_decontaminate": text.decontaminate,
        "doc_repetition_scores": text.repetition_scores,
        "doc_dup_window_ratio": text.dup_window_ratio,
        "doc_curriculum_deciles": text.curriculum_deciles,
        "bpe_train_merges": bpe.bpe_train_merges,
        "bpe_encode_documents": bpe.bpe_encode_documents,
        # near-dup suite
        "minhash_signatures": _q_minhash_signatures,
        "minhash_dedup_pairs": dedup.minhash_dedup_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_apply_survivors": dedup.dedup_apply,
        "simhash_signatures": dedup.simhash_signatures,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        # similarity search
        "ann_cosine_topk": ann.ann_topk,
        "ann_ivf_topk": ann.ivf_topk,
        "ann_pq_topk": ann.pq_topk,
        "embedding_label_centroids": ann.label_centroids,
        "znormal_embeddings": ann.znormal_embeddings,
        "embedding_covariance": ann.embedding_covariance,
        "embedding_pca_top": ann.pca_top_components,
        "embedding_near_dup_pairs": ann.embedding_near_dup_pairs,
        # token-table engine (synthetic input)
        "tokens_stats_by_source": _q_tokens_stats_by_source,
        "tokens_pack_sequences": _q_tokens_pack_sequences,
        "source_token_kl_drift": _q_source_kl_drift,
        "source_length_ks_drift": _q_length_ks_drift,
        "doc_bigram_xent": _q_doc_bigram_xent,
        "tokens_rollup_tier0_aggs": _q_tokens_rollup_tier0_aggs,
        "tokens_rollup_tier1_aggs": _q_tokens_rollup_tier1_aggs,
        "tokens_retention_expiry": _q_tokens_retention_expiry,
        "tokens_gap_serve_parent": _q_tokens_gap_serve_parent,
        "tokens_downsample_fidelity": _q_tokens_downsample_fidelity,
        "tokens_source_skew": _q_tokens_source_skew,
        "tokens_incremental_refresh": _q_tokens_incremental_refresh,
        "tokens_late_arrival_refresh": _q_tokens_late_arrival_refresh,
        "tokens_source_coactivity": _q_tokens_source_coactivity,
        "tokens_source_mix_shift": _q_tokens_source_mix_shift,
        "tokens_source_availability": _q_tokens_source_availability,
        "tokens_source_hhi": _q_tokens_source_hhi,
        "tokens_source_acf": _q_tokens_source_acf,
        "tokens_repr_drift": _q_tokens_repr_drift,
        "tokens_repr_fidelity": _q_tokens_repr_fidelity,
        "tokens_source_freshness": _q_tokens_source_freshness,
        "tokens_busy_hours": _q_tokens_busy_hours,
        "tokens_rollup_tier3_aggs": _q_tokens_rollup_tier3_aggs,
        "tokens_serve_range": _q_tokens_serve_range,
        "tokens_store_compaction": _q_tokens_store_compaction,
        "tokens_store_stats": _q_tokens_store_stats,
        "tokens_rollup_tier0_full": _q_tokens_rollup_tier0_full,
        "tokens_rollup_time_index": _q_tokens_rollup_time_index,
        "tokens_rollup_tier2_full": _q_tokens_rollup_tier2_full,
        "tokens_rollup_tier0_repr": _q_tokens_rollup_tier0_repr,
        "tokens_rollup_payload_crc": _q_tokens_rollup_payload_crc,
        "tokens_storage_efficiency": _q_tokens_storage_efficiency,
        "warping_path_lowmem_tokens": _q_warping_path_lowmem,
        "warping_path_prob_tokens": _q_warping_path_prob,
        "dtw_weighted_matrix": _q_dtw_weighted_matrix,
        "explain_pairs_tokens": _q_explain_pairs,
        "multimodal_decode_real": _q_multimodal_decode_real,
        "multimodal_audio_features": _q_multimodal_audio_features,
        "multimodal_audio_g711": _q_multimodal_audio_g711,
        "multimodal_audio_flac": _q_multimodal_audio_flac,
        "multimodal_decode_gif": _q_multimodal_decode_gif,
        "multimodal_gif_frames": _q_multimodal_gif_frames,
        "multimodal_video_mjpeg": _q_multimodal_video_mjpeg,
        "events_profile_dtw_anomaly": _q_events_profile_dtw_anomaly,
        "dtw_distance_matrix": _q_dtw_distance_matrix,
        "subsequence_knn": _q_subsequence_knn,
        # vocabulary analytics (corpus-scale text ops)
        "token_heavy_hitters": _q_token_heavy_hitters,
        "vocab_coverage_curve": _q_vocab_coverage,
        "distinct_tokens_daily": _q_distinct_tokens_daily,
        "source_token_entropy": _q_source_entropy,
        "source_zipf_slope": _q_zipf_slope,
        "source_vocab_overlap": _q_source_vocab_overlap,
        "token_percentiles": _q_token_percentiles,
        "token_doc_frequency": _q_token_doc_frequency,
        "bigram_collocations": _q_bigram_collocations,
        # per-series preprocessing (§2.2)
        "tokens_derivative": _q_tokens_derivative,
        "tokens_paa_downsample": _q_tokens_paa,
        "tokens_lttb_downsample": _q_tokens_lttb,
        "tokens_sax_symbols": _q_tokens_sax,
        "tokens_matrix_profile": _q_tokens_matrix_profile,
        "tokens_motifs_discords": _q_tokens_motifs_discords,
        "tokens_ngram_novelty": _q_tokens_ngram_novelty,
        "tokens_znormal": _q_tokens_znormal,
        "tokens_logdomain_stats": _q_tokens_logdomain_stats,
        "tokens_positional_stats": _q_tokens_positional_stats,
        "tokens_rollup_length_p95": _q_tokens_rollup_length_p95,
        # clustering / alignment / multimodal
        "hierarchical_clusters_tokens": _q_hierarchical_clusters,
        "kmeans_clusters_tokens": _q_kmeans_clusters,
        "nw_align_tokens": _q_nw_align_tokens,
        "multimodal_decode": _q_multimodal_decode,
        "symbolize_tokens": _q_symbolize_tokens,
        "subsequence_alignment_tokens": _q_subsequence_alignment,
        "subsequence_knee_matches_tokens": _q_subsequence_knee_matches,
        "local_concurrences_tokens": _q_local_concurrences,
    }


def oracle_sql() -> dict[str, str]:
    from dtaidistance_ray.stages import ann, events, text
    from dtaidistance_ray.stages.relational import (
        CUSTOMERS_DORMANT_SQL,
        LINEITEM_PRICING_SQL,
        REVENUE_BY_NATION_SQL,
        SUPPLIERS_OF_LARGE_PARTS_SQL,
    )

    # correctness gate runs at sf0.01; materialize the oracle's token
    # parquet for that sf regardless of call order
    try:
        _ensure_token_parquet("/root/testdata/sf0.01")
    except Exception:
        pass
    sf = "0.01"
    return {
        "rollup_events_hourly": events.ROLLUP_HOURLY_SQL,
        "rollup_events_daily_from_hourly": events.ROLLUP_DAILY_SQL,
        "rollup_events_hourly_gapfill": events.ROLLUP_GAPFILL_SQL,
        "events_rolling_hourly_avg": events.ROLLING_HOURLY_SQL,
        "events_hourly_anomalies": events.HOURLY_ANOMALIES_SQL,
        "events_asof_hourly_baseline": events.EVENTS_ASOF_SQL,
        "events_in_sessions": events.EVENTS_IN_SESSIONS_SQL,
        "events_session_intervals": events.SESSION_INTERVALS_SQL,
        "events_top_users_per_type": events.TOP_USERS_PER_TYPE_SQL,
        "events_sessionize": events.SESSIONIZE_SQL,
        "events_top_users_by_value": events.TOP_USERS_SQL,
        "events_distinct_users": _sql_events_distinct_users(),
        "events_ohlc_hourly": events.OHLC_HOURLY_SQL,
        "events_counter_increase": events.COUNTER_INCREASE_SQL,
        "rollup_events_hourly_lerp": events.ROLLUP_LERP_SQL,
        "rollup_events_hourly_locf": events.ROLLUP_LOCF_SQL,
        "events_daily_mann_kendall": events.MANN_KENDALL_SQL,
        "events_seasonal_decompose": events.SEASONAL_DECOMPOSE_SQL,
        "events_rate_limit_audit": events.RATE_LIMIT_SQL,
        "events_value_benford": events.VALUE_BENFORD_SQL,
        "events_hourly_ewma": events.HOURLY_EWMA_SQL,
        "events_hourly_xcorr_lags": events.HOURLY_XCORR_SQL,
        "events_hourly_cusum": events.HOURLY_CUSUM_SQL,
        "events_hourly_holt": events.HOURLY_HOLT_SQL,
        "events_hourly_trend": events.HOURLY_TREND_SQL,
        "events_value_percentiles_daily": events.VALUE_PERCENTILES_SQL,
        "events_funnel_stages": events.FUNNEL_SQL,
        "events_seasonal_anomalies": events.SEASONAL_ANOMALIES_SQL,
        "events_retention_cohorts": events.RETENTION_COHORTS_SQL,
        "events_user_interarrival": events.USER_INTERARRIVAL_SQL,
        "events_dau_wau_stickiness": events.DAU_WAU_SQL,
        "events_out_of_order_audit": events.OUT_OF_ORDER_SQL,
        "events_hourly_median_bands": events.HOURLY_MEDIAN_BANDS_SQL,
        "events_last_touch_attribution": events.LAST_TOUCH_SQL,
        "events_props_extract": events.PROPS_EXTRACT_SQL,
        "events_user_rfm": events.RFM_SQL,
        "events_value_histogram_daily": events.VALUE_HISTOGRAM_SQL,
        "events_histogram_quantile": events.HISTOGRAM_QUANTILE_SQL,
        "events_slo_burn_rate": events.SLO_BURN_RATE_SQL,
        "events_grouping_sets_cube": events.GROUPING_SETS_CUBE_SQL,
        "lineitem_pricing_summary": LINEITEM_PRICING_SQL,
        "revenue_by_nation": REVENUE_BY_NATION_SQL,
        "customers_dormant": CUSTOMERS_DORMANT_SQL,
        "suppliers_of_large_parts": SUPPLIERS_OF_LARGE_PARTS_SQL,
        "dedup_exact_documents": text.DEDUP_EXACT_SQL,
        "documents_decontaminate": text.DECONTAMINATE_SQL,
        "doc_repetition_scores": text.REPETITION_SQL,
        "doc_dup_window_ratio": text.DUPWIN_SQL,
        "doc_curriculum_deciles": text.CURRICULUM_SQL,
        "doc_token_counts": text.TOKEN_COUNTS_SQL,
        "doc_quality_scores": text.QUALITY_SQL,
        "documents_stratified_sample": text.STRATIFIED_SAMPLE_SQL,
        "ann_cosine_topk": ann.ANN_TOPK_SQL,
        "embedding_label_centroids": ann.LABEL_CENTROIDS_SQL,
        "znormal_embeddings": ann.ZNORMAL_SQL,
        "embedding_covariance": ann.EMB_COVARIANCE_SQL,
        "tokens_stats_by_source": _sql_tokens_stats_by_source(sf),
        "tokens_pack_sequences": _sql_tokens_pack_sequences(sf),
        "source_token_kl_drift": _sql_source_kl_drift(sf),
        "source_length_ks_drift": _sql_length_ks_drift(sf),
        "doc_bigram_xent": _sql_doc_bigram_xent(sf),
        "tokens_rollup_tier0_aggs": _sql_tokens_rollup_tier0(sf),
        "tokens_rollup_tier1_aggs": _sql_tokens_rollup_tier1(sf),
        "tokens_retention_expiry": _sql_tokens_retention_expiry(sf),
        "tokens_gap_serve_parent": _sql_tokens_gap_serve_parent(sf),
        "tokens_downsample_fidelity": _sql_tokens_downsample_fidelity(sf),
        "tokens_source_skew": _sql_tokens_source_skew(sf),
        "tokens_incremental_refresh": _sql_tokens_rollup_tier0(sf),
        "tokens_late_arrival_refresh": _sql_tokens_rollup_tier0(sf),
        "tokens_source_coactivity": _sql_tokens_source_coactivity(sf),
        "tokens_source_mix_shift": _sql_tokens_source_mix_shift(sf),
        "tokens_source_availability": _sql_tokens_source_availability(sf),
        "tokens_source_hhi": _sql_tokens_source_hhi(sf),
        "tokens_source_acf": _sql_tokens_source_acf(sf),
        "tokens_rollup_tier3_aggs": _sql_tokens_rollup_tier3(sf),
        "tokens_serve_range": _sql_tokens_serve_range(sf),
        "tokens_store_compaction": _sql_tokens_serve_range(sf),
        "tokens_store_stats": _sql_tokens_store_stats(sf),
        "tokens_source_freshness": _sql_tokens_source_freshness(sf),
        "tokens_busy_hours": _sql_tokens_busy_hours(sf),
        "token_heavy_hitters": _sql_token_heavy_hitters(sf),
        "vocab_coverage_curve": _sql_vocab_coverage(sf),
        "distinct_tokens_daily": _sql_distinct_tokens_daily(sf),
        "source_token_entropy": _sql_source_entropy(sf),
        "source_zipf_slope": _sql_zipf_slope(sf),
        "source_vocab_overlap": _sql_source_vocab_overlap(sf),
        "token_percentiles": _sql_token_percentiles(sf),
        "token_doc_frequency": _sql_token_doc_frequency(sf),
        "bigram_collocations": _sql_bigram_collocations(sf),
        "tokens_derivative": _sql_tokens_derivative(sf),
        "tokens_paa_downsample": _sql_tokens_paa(sf),
        "tokens_lttb_downsample": _sql_tokens_lttb(sf),
        "tokens_sax_symbols": _sql_tokens_sax(sf),
        "tokens_matrix_profile": _sql_tokens_matrix_profile(sf),
        "tokens_motifs_discords": _sql_tokens_motifs_discords(sf),
        "tokens_ngram_novelty": _sql_tokens_ngram_novelty(sf),
        "tokens_znormal": _sql_tokens_znormal(sf),
        "tokens_positional_stats": _sql_tokens_positional_stats(sf),
        "tokens_rollup_length_p95": _sql_tokens_rollup_length_p95(sf),
        "tokens_logdomain_stats": _sql_tokens_logdomain(sf),
        "dedup_clusters": _sql_dedup_clusters(),
        "dedup_apply_survivors": _sql_dedup_apply(),
        **_golden_oracles(),
    }


def _q_token_heavy_hitters(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    return vocab.heavy_hitters(token_table(_token_spec(sf_dir)))


def _q_vocab_coverage(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    return vocab.vocab_coverage(token_table(_token_spec(sf_dir)))


def _sql_vocab_coverage(sf: str) -> str:
    from dtaidistance_ray.stages.vocab import vocab_coverage_sql

    return vocab_coverage_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_source_entropy(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    return vocab.source_entropy(token_table(_token_spec(sf_dir)))


def _sql_source_entropy(sf: str) -> str:
    from dtaidistance_ray.stages.vocab import source_entropy_sql

    return source_entropy_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_zipf_slope(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    return vocab.zipf_slope(token_table(_token_spec(sf_dir)))


def _sql_zipf_slope(sf: str) -> str:
    from dtaidistance_ray.stages.vocab import zipf_slope_sql

    return zipf_slope_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_source_vocab_overlap(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    spec = _token_spec(sf_dir)
    return vocab.source_vocab_overlap(token_table(spec), spec)


def _sql_source_vocab_overlap(sf: str) -> str:
    from dtaidistance_ray.stages.vocab import source_vocab_overlap_sql

    return source_vocab_overlap_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_distinct_tokens_daily(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    spec = _token_spec(sf_dir)
    return vocab.distinct_tokens_daily(token_table(spec), spec)


def _sql_distinct_tokens_daily(sf: str) -> str:
    from dtaidistance_ray.stages.vocab import distinct_tokens_daily_sql

    return distinct_tokens_daily_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_token_percentiles(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    return vocab.token_percentiles(token_table(_token_spec(sf_dir)))


def _q_token_doc_frequency(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    return vocab.doc_frequency(token_table(_token_spec(sf_dir)))


def _q_bigram_collocations(sf_dir: str):
    from dtaidistance_ray.sources.synth import token_table
    from dtaidistance_ray.stages import vocab

    _ensure_token_parquet(sf_dir)
    return vocab.bigram_collocations(token_table(_token_spec(sf_dir)))


def _sql_bigram_collocations(sf: str) -> str:
    from dtaidistance_ray.stages import vocab

    return vocab.bigram_collocations_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_customers_dormant(sf_dir: str):
    from dtaidistance_ray.stages.relational import customers_dormant

    return customers_dormant(sf_dir)


def _q_suppliers_of_large_parts(sf_dir: str):
    from dtaidistance_ray.stages.relational import suppliers_of_large_parts

    return suppliers_of_large_parts(sf_dir)


def _sql_dedup_clusters() -> str:
    from dtaidistance_ray.stages.dedup import dedup_clusters_sql

    return dedup_clusters_sql(os.path.join(_GOLDEN_DIR, "minhash_dedup_pairs.parquet"))


def _sql_dedup_apply() -> str:
    from dtaidistance_ray.stages.dedup import dedup_apply_sql

    return dedup_apply_sql(os.path.join(_GOLDEN_DIR, "minhash_dedup_pairs.parquet"))


def _q_events_distinct_users(sf_dir: str):
    from dtaidistance_ray.stages.sketch import distinct_users_per_type

    return distinct_users_per_type(sf_dir)


def _sql_events_distinct_users() -> str:
    from dtaidistance_ray.stages.sketch import DISTINCT_USERS_SQL

    return DISTINCT_USERS_SQL


def _sql_token_heavy_hitters(sf: str) -> str:
    from dtaidistance_ray.stages import vocab

    return vocab.heavy_hitters_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _sql_token_percentiles(sf: str) -> str:
    from dtaidistance_ray.stages import vocab

    return vocab.token_percentiles_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _sql_token_doc_frequency(sf: str) -> str:
    from dtaidistance_ray.stages import vocab

    return vocab.doc_frequency_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _sql_tokens_derivative(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_derivative_sql

    return tokens_derivative_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _sql_tokens_paa(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_paa_sql

    return tokens_paa_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_tokens_matrix_profile(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_matrix_profile

    return tokens_matrix_profile(_token_spec(sf_dir))


def _sql_tokens_matrix_profile(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_matrix_profile_sql

    return tokens_matrix_profile_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_tokens_sax(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_sax

    return tokens_sax(_token_spec(sf_dir))


def _sql_tokens_sax(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_sax_sql

    return tokens_sax_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_tokens_ngram_novelty(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_ngram_novelty

    _ensure_token_parquet(sf_dir)
    return tokens_ngram_novelty(_token_spec(sf_dir))


def _sql_tokens_ngram_novelty(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_ngram_novelty_sql

    return tokens_ngram_novelty_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_tokens_motifs_discords(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_motifs_discords

    _ensure_token_parquet(sf_dir)
    return tokens_motifs_discords(_token_spec(sf_dir))


def _sql_tokens_motifs_discords(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_motifs_discords_sql

    return tokens_motifs_discords_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_tokens_rollup_length_p95(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_rollup_length_p95

    _ensure_token_parquet(sf_dir)
    return tokens_rollup_length_p95(_token_spec(sf_dir))


def _sql_tokens_rollup_length_p95(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_rollup_length_p95_sql

    return tokens_rollup_length_p95_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _q_tokens_positional_stats(sf_dir: str):
    from dtaidistance_ray.stages.series_ops import tokens_positional_stats

    _ensure_token_parquet(sf_dir)
    return tokens_positional_stats(_token_spec(sf_dir))


def _sql_tokens_positional_stats(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_positional_stats_sql

    return tokens_positional_stats_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _sql_tokens_znormal(sf: str) -> str:
    from dtaidistance_ray.stages.series_ops import tokens_znormal_sql

    return tokens_znormal_sql(f"{_TOK_DIR}/sf{sf}.parquet")


def _sql_tokens_logdomain(sf: str) -> str:
    return f"""
SELECT source,
       ROUND(sum(ROUND(list_aggregate(
           list_transform(CAST(tokens AS DOUBLE[]),
                          x -> CASE WHEN x = 0 THEN 0.0
                                    WHEN x > 0 THEN ln(1 + x)
                                    ELSE -ln(1 - x) END),
           'sum'), 6)), 4) AS ld_total,
       CAST(count(*) AS BIGINT) AS n_docs
FROM read_parquet('{_TOK_DIR}/sf{sf}.parquet')
GROUP BY source
"""
