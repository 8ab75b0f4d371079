"""Sequence packing: greedy fill of fixed token budgets per source.

The canonical pretraining-data op: short tokenized documents are packed
back-to-back into fixed-budget training rows (budget = context length)
to avoid padding waste. Greedy first-fit in canonical order (doc_id)
— the industry-standard streaming packer: a document that would
overflow the current pack closes it and starts the next; a document
longer than the budget gets a pack of its own.

100-TB shape: packing is a sequential scan BY DEFINITION (each pack
depends on the previous fill), so the parallelism unit is the
partition key — ``groupby(source).map_groups`` packs every source
independently, and a giant source is sub-sharded upstream by
(source, shard) exactly like the rollup's bucketized keys. The scan
itself touches only (doc_id, n_tok) — the token arrays never move.
The per-group Python loop is O(rows) on int64 scalars; vectorizing a
reset-cumsum exactly is not possible in one pass, and the loop is
~50ns/row — never the bottleneck against the read.

Oracle: a recursive CTE walking row_number order per source (see
PACK_SEQUENCES_SQL_TMPL), value-identical by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_PACK_BUDGET = 512


def pack_group(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    df = df.sort_values("doc_id")
    n = df["n_tok"].to_numpy(np.int64)
    pack = np.empty(len(n), dtype=np.int64)
    fill = np.empty(len(n), dtype=np.int64)
    cur = 0
    pid = 0
    for i, v in enumerate(n.tolist()):
        if i == 0:
            cur = v
        elif cur + v > budget:
            pid += 1
            cur = v
        else:
            cur += v
        pack[i] = pid
        fill[i] = cur
    return pd.DataFrame(
        {
            "source": df["source"].to_numpy(),
            "doc_id": df["doc_id"].to_numpy(),
            "n_tok": n,
            "pack_id": pack,
            "fill_after": fill,
        }
    )


def pack_sequences(ds, budget: int = DEFAULT_PACK_BUDGET):
    """(doc_id, n_tok, source) Dataset -> pack assignment per doc."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pack_group(df, budget)

    return ds.groupby("source").map_groups(fn, batch_format="pandas")


PACK_SEQUENCES_SQL_TMPL = """
WITH RECURSIVE ordered AS (
  SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM read_parquet('{tok_path}')
),
packed AS (
  SELECT source, doc_id, n_tok, rn,
         CAST(0 AS BIGINT) AS pack_id, n_tok AS fill_after
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.doc_id, o.n_tok, o.rn,
         CASE WHEN p.fill_after + o.n_tok > {budget}
              THEN p.pack_id + 1 ELSE p.pack_id END,
         CASE WHEN p.fill_after + o.n_tok > {budget}
              THEN o.n_tok ELSE p.fill_after + o.n_tok END
  FROM packed p JOIN ordered o ON o.source = p.source AND o.rn = p.rn + 1
)
SELECT source, doc_id, n_tok, pack_id, fill_after FROM packed
"""
