"""Per-series preprocessing queries over the token table (SURVEY §2.2
operators as Ray stages, with SQL oracles where expressible).

Outputs are long-format (doc_id, pos, value) so DuckDB can mirror them
with unnest + window functions. Token values are integers, so the
derivative's quarter-steps and the z-scores' int/sqrt arithmetic are
bit-deterministic across engines (no rounding games needed for the
derivative; z-scores round at 6 to absorb sqrt library differences).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..kernels.preprocessing import derivative, znormal


def _token_ds(spec):
    from ..sources.synth import token_table

    return token_table(spec)


def tokens_derivative(spec, limit_docs: int = 200):
    """Keogh DDTW derivative per sequence, long format; deterministic
    doc subset (first limit_docs by doc_id)."""
    ds = _token_ds(spec)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
            if int(doc_id[1:]) >= limit_docs:
                continue
            d = derivative(np.asarray(toks, dtype=np.float64))
            for pos, v in enumerate(d):
                rows.append((doc_id, pos + 1, float(v)))
        return pd.DataFrame(rows, columns=["doc_id", "pos", "dval"])

    out = ds.map_batches(fn, batch_format="pandas")

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        batch["pos"] = batch["pos"].astype("int64")
        return batch

    return out.map_batches(fix, batch_format="pandas")


def tokens_derivative_sql(tok_path: str, limit_docs: int = 200) -> str:
    return f"""
WITH flat AS (
  SELECT doc_id,
         unnest(CAST(tokens AS DOUBLE[])) AS val,
         unnest(generate_series(1, len(tokens))) AS pos,
         len(tokens) AS n
  FROM read_parquet('{tok_path}')
  WHERE CAST(substr(doc_id, 2) AS BIGINT) < {limit_docs}
), w AS (
  SELECT doc_id, pos, n, val,
         lag(val) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
         lead(val) OVER (PARTITION BY doc_id ORDER BY pos) AS next
  FROM flat
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       CASE WHEN pos = 1 THEN next - val
            WHEN pos = n THEN val - prev
            ELSE ((val - prev) + (next - prev) / 2) / 2 END AS dval
FROM w
"""


def tokens_znormal(spec, limit_docs: int = 200):
    """Per-sequence z-normalization, long format (population std)."""
    ds = _token_ds(spec)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
            if int(doc_id[1:]) >= limit_docs:
                continue
            z = znormal(np.asarray(toks, dtype=np.float64))
            for pos, v in enumerate(z):
                rows.append((doc_id, pos + 1, round(float(v), 6)))
        return pd.DataFrame(rows, columns=["doc_id", "pos", "zval"])

    out = ds.map_batches(fn, batch_format="pandas")

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        batch["pos"] = batch["pos"].astype("int64")
        return batch

    return out.map_batches(fix, batch_format="pandas")


def tokens_znormal_sql(tok_path: str, limit_docs: int = 200) -> str:
    return f"""
WITH flat AS (
  SELECT doc_id,
         unnest(CAST(tokens AS DOUBLE[])) AS val,
         unnest(generate_series(1, len(tokens))) AS pos
  FROM read_parquet('{tok_path}')
  WHERE CAST(substr(doc_id, 2) AS BIGINT) < {limit_docs}
), stats AS (
  SELECT doc_id, avg(val) AS mu,
         sqrt(avg(val * val) - avg(val) * avg(val)) AS sd
  FROM flat GROUP BY doc_id
)
SELECT f.doc_id, CAST(f.pos AS BIGINT) AS pos,
       ROUND((f.val - s.mu) / s.sd, 6) AS zval
FROM flat f JOIN stats s USING (doc_id)
"""


def tokens_logdomain_stats(spec):
    """log-domain transform then per-source aggregate — exercises the
    logdomain kernel with an exactly mirrorable SQL oracle."""
    from ray.data.aggregate import Count, Sum

    ds = _token_ds(spec)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.preprocessing import logdomain

        sums = []
        for toks in batch["tokens"]:
            sums.append(round(float(logdomain(np.asarray(toks, dtype=np.float64)).sum()), 6))
        return pd.DataFrame({"source": batch["source"], "ld_sum": sums})

    out = (
        ds.map_batches(fn, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("ld_sum", alias_name="ld_total"), Count(alias_name="n_docs"))
    )

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        batch["ld_total"] = batch["ld_total"].round(4)
        batch["n_docs"] = batch["n_docs"].astype("int64")
        return batch

    return out.map_batches(fix, batch_format="pandas")


def tokens_paa(spec, n_seg: int = 8, limit_docs: int = 200):
    """Piecewise Aggregate Approximation per sequence: the classic
    timeseries downsample (Keogh et al. 2001) — n_seg equal index
    segments, each represented by its mean. Segment j of an n-point
    series covers positions with floor(idx * n_seg / n) == j, so the
    mapping is pure integer arithmetic and the means are exact ratios
    of integer token sums — bit-deterministic across engines, no
    rounding. Map-only; long format (doc_id, seg, paa)."""
    ds = _token_ds(spec)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
            if int(doc_id[1:]) >= limit_docs:
                continue
            t = np.asarray(toks, dtype=np.int64)
            n = len(t)
            if n == 0:
                continue
            seg = (np.arange(n, dtype=np.int64) * n_seg) // n
            sums = np.bincount(seg, weights=None, minlength=n_seg).astype(np.int64)
            tot = np.zeros(n_seg, dtype=np.int64)
            np.add.at(tot, seg, t)
            for j in range(n_seg):
                if sums[j]:
                    rows.append((doc_id, j, tot[j] / sums[j]))
        return pd.DataFrame(rows, columns=["doc_id", "seg", "paa"])

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        batch["seg"] = batch["seg"].astype("int64")
        batch["paa"] = batch["paa"].astype("float64")
        return batch

    return ds.map_batches(fn, batch_format="pandas").map_batches(fix, batch_format="pandas")


def tokens_paa_sql(tok_path: str, n_seg: int = 8, limit_docs: int = 200) -> str:
    return f"""
WITH flat AS (
  SELECT doc_id,
         unnest(CAST(tokens AS BIGINT[])) AS val,
         unnest(generate_series(0, len(tokens) - 1)) AS idx,
         len(tokens) AS n
  FROM read_parquet('{tok_path}')
  WHERE CAST(substr(doc_id, 2) AS BIGINT) < {limit_docs} AND len(tokens) > 0
)
SELECT doc_id,
       CAST((idx * {n_seg}) // n AS BIGINT) AS seg,
       CAST(sum(val) AS DOUBLE) / count(*) AS paa
FROM flat
GROUP BY doc_id, (idx * {n_seg}) // n
"""
