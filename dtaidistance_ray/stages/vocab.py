"""Vocabulary analytics over the token table (corpus-scale text ops).

Three training-data pipeline operators over the canonical
``(doc_id, tokens:list<int32>, n_tok, source)`` table:

- ``heavy_hitters``     — per-source top-k most frequent tokens
- ``token_percentiles`` — exact per-source discrete percentiles of the
                          token-value distribution
- ``doc_frequency``     — per-token document frequency + term frequency
                          (the df/tf table behind IDF weighting)

100-TB shape: every operator reduces through a **vocab-bounded key
space** (``num_sources x vocab`` for the per-source ops, ``vocab`` for
df/tf — independent of row count). Each block collapses its token
occurrences into ONE packed sparse row per source (int64 token ids +
int64 counts as binary blobs) via ``np.bincount``; packed rows merge in
distributed fan-in rounds (the flagship's tree-reduce pattern,
``rollup_scan.py``) until a bounded number reach the driver. Ray's
native ``groupby.aggregate`` is deliberately NOT used here: with ~1e5+
(source, token) groups its per-group Python path costs ~30 s/block at
sf0.01 where the packed merge costs milliseconds.

Counts accumulate in int64 throughout (``np.add.at``, never float
``bincount`` weights), so sums stay exact beyond 2^53 occurrences.

Percentile semantics mirror DuckDB ``quantile_disc``: 1-based rank
``ceil(p * n)`` over the sorted multiset (verified empirically,
including float-edge cases where ``p*n`` is integral in exact
arithmetic but not in binary) — computed from the histogram's
cumulative counts, exact because the value domain is bounded ints.

No reference counterpart (dtaidistance has no text layer); these are
engine-native corpus-analytics ops required by the north rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import rollup_scan as _rs

PCTS = (0.25, 0.5, 0.9, 0.99)
_PCT_COLS = ("p25", "p50", "p90", "p99")


def _flat_tokens(batch: pa.Table):
    """(sources, flat_token_values, row_lengths) from an Arrow batch.

    ``flatten()`` (not ``.values``) so zero-copy *slices* of a list
    column — which keep the parent buffer but offset into it — yield
    exactly this batch's values.
    """
    import pyarrow.compute as pc

    col = batch.column("tokens").combine_chunks()
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    src = batch.column("source").to_pandas().to_numpy()
    return src, vals, lens


def _empty_packed() -> pd.DataFrame:
    return pd.DataFrame({"source": pd.Series(dtype=object), "toks": pd.Series(dtype=object), "cnts": pd.Series(dtype=object)})


def _partial_counts_packed(batch: pa.Table) -> pd.DataFrame:
    """Block combiner: ONE packed sparse (token ids, counts) row per source."""
    src, vals, lens = _flat_tokens(batch)
    if len(src) == 0:
        return _empty_packed()
    usrc, src_code = np.unique(src, return_inverse=True)
    flat_src = np.repeat(src_code, lens)
    vocab_b = int(vals.max()) + 1 if len(vals) else 1
    cnt = np.bincount(flat_src * vocab_b + vals, minlength=len(usrc) * vocab_b)
    rows = {"source": [], "toks": [], "cnts": []}
    for si, s in enumerate(usrc):
        seg = cnt[si * vocab_b : (si + 1) * vocab_b]
        nz = np.flatnonzero(seg)
        rows["source"].append(s)
        rows["toks"].append(nz.astype(np.int64).tobytes())
        rows["cnts"].append(seg[nz].astype(np.int64).tobytes())
    return pd.DataFrame(rows)


def _merge_packed(batch: pd.DataFrame) -> pd.DataFrame:
    """Associative merge of packed rows: one output row per source."""
    if not len(batch):
        return _empty_packed()
    rows = {"source": [], "toks": [], "cnts": []}
    for s, g in batch.groupby("source", sort=True):
        toks = np.concatenate([np.frombuffer(b, np.int64) for b in g["toks"]])
        cnts = np.concatenate([np.frombuffer(b, np.int64) for b in g["cnts"]])
        ut, inv = np.unique(toks, return_inverse=True)
        acc = np.zeros(len(ut), dtype=np.int64)
        np.add.at(acc, inv, cnts)
        rows["source"].append(s)
        rows["toks"].append(ut.tobytes())
        rows["cnts"].append(acc.tobytes())
    return pd.DataFrame(rows)


def _tree_reduce_keyed(parts_ds, merge_fn, key: str = "source") -> pd.DataFrame:
    """Fan-in map_batches rounds (sorted by key so each fan-in batch is
    key-homogeneous and actually contracts) until a bounded number of
    rows remain; the driver folds only that bounded remainder. Stalls
    (rows already one-per-key) break out — the remainder is then
    key-bounded by construction."""
    parts = parts_ds.materialize()
    nb = parts.count()
    while nb > max(1, _rs._MERGE_THRESHOLD_ROWS):
        parts = (
            parts.sort(key)
            .map_batches(merge_fn, batch_size=_rs._MERGE_FANIN, batch_format="pandas")
            .materialize()
        )
        nb2 = parts.count()
        if nb2 >= nb:
            break
        nb = nb2
    return merge_fn(parts.to_pandas())


def _source_token_counts(ds) -> pd.DataFrame:
    """Decoded (source, token, cnt) frame — vocab x sources bounded."""
    parts = ds.map_batches(_partial_counts_packed, batch_format="pyarrow")
    packed = _tree_reduce_keyed(parts, _merge_packed)
    frames = [
        pd.DataFrame(
            {
                "source": r["source"],
                "token": np.frombuffer(r["toks"], np.int64),
                "cnt": np.frombuffer(r["cnts"], np.int64),
            }
        )
        for _, r in packed.iterrows()
    ]
    if not frames:
        return pd.DataFrame({"source": [], "token": [], "cnt": []})
    return pd.concat(frames, ignore_index=True)


def heavy_hitters(ds, k: int = 20) -> pd.DataFrame:
    """Per-source top-k tokens by occurrence count.

    Rank ties break on ascending token id (matches the SQL oracle's
    ``ORDER BY cnt DESC, token``). The final contraction runs over the
    vocab-bounded counts frame, never over occurrences.
    """
    cnts = _source_token_counts(ds)
    if not len(cnts):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "rnk": pd.Series(dtype="int64"),
                "token": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
    out = []
    for s, g in cnts.groupby("source", sort=True):
        g = g.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort").head(k)
        out.append(
            pd.DataFrame(
                {
                    "source": g["source"].to_numpy(),
                    "rnk": np.arange(1, len(g) + 1, dtype=np.int64),
                    "token": g["token"].to_numpy(np.int64),
                    "cnt": g["cnt"].to_numpy(np.int64),
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def heavy_hitters_sql(parquet_path: str, k: int = 20) -> str:
    return f"""
SELECT source, rnk, token, cnt FROM (
    SELECT source, CAST(token AS BIGINT) AS token, CAST(cnt AS BIGINT) AS cnt,
           CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY cnt DESC, token) AS BIGINT) AS rnk
    FROM (
        SELECT source, token, count(*) AS cnt
        FROM (
            SELECT source, unnest(tokens) AS token
            FROM read_parquet('{parquet_path}')
        )
        GROUP BY source, token
    )
) WHERE rnk <= {k}
"""


def token_percentiles(ds) -> pd.DataFrame:
    """Exact per-source discrete percentiles (p25/p50/p90/p99) of token values.

    Histogram route: cumulative-count rank lookup over the vocab-bounded
    counts — exact (no sampling, no sketch error) because the value
    domain is bounded integers, where a sort-based engine would shuffle
    every occurrence to order it.
    """
    cnts = _source_token_counts(ds)
    rows = {"source": [], "n_values": []}
    for c in _PCT_COLS:
        rows[c] = []
    for s, g in cnts.groupby("source", sort=True):
        g = g.sort_values("token", kind="mergesort")
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        toks = g["token"].to_numpy(np.int64)
        n = int(cum[-1])
        rows["source"].append(s)
        rows["n_values"].append(n)
        for p, c in zip(PCTS, _PCT_COLS):
            # DuckDB quantile_disc: value at 1-based rank ceil(p*n)
            rank = int(np.ceil(np.float64(p) * n))
            rows[c].append(int(toks[np.searchsorted(cum, rank)]))
    out = pd.DataFrame(rows)
    for c in ("n_values",) + _PCT_COLS:
        out[c] = out[c].astype("int64")
    return out


def token_percentiles_sql(parquet_path: str) -> str:
    pct_cols = ",\n       ".join(
        f"CAST(quantile_disc(token, {p}) AS BIGINT) AS {c}" for p, c in zip(PCTS, _PCT_COLS)
    )
    return f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_values,
       {pct_cols}
FROM (
    SELECT source, unnest(tokens) AS token
    FROM read_parquet('{parquet_path}')
)
GROUP BY source
"""


def _empty_df_tf() -> pd.DataFrame:
    return pd.DataFrame({"toks": pd.Series(dtype=object), "df": pd.Series(dtype=object), "tf": pd.Series(dtype=object)})


def _partial_df_tf_packed(batch: pa.Table) -> pd.DataFrame:
    """Block combiner for df/tf: one packed sparse row per block."""
    _, vals, lens = _flat_tokens(batch)
    if len(lens) == 0 or len(vals) == 0:
        return _empty_df_tf()
    vocab_b = int(vals.max()) + 1
    tf = np.bincount(vals, minlength=vocab_b)
    # df: count each token once per doc — dedupe (row, token) pairs
    row_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    uniq = np.unique(row_of * vocab_b + vals)
    df = np.bincount(uniq % vocab_b, minlength=vocab_b)
    nz = np.flatnonzero(tf)
    return pd.DataFrame(
        {
            "toks": [nz.astype(np.int64).tobytes()],
            "df": [df[nz].astype(np.int64).tobytes()],
            "tf": [tf[nz].astype(np.int64).tobytes()],
        }
    )


def _merge_df_tf(batch: pd.DataFrame) -> pd.DataFrame:
    if not len(batch):
        return _empty_df_tf()
    toks = np.concatenate([np.frombuffer(b, np.int64) for b in batch["toks"]])
    ut, inv = np.unique(toks, return_inverse=True)
    accs = {}
    for c in ("df", "tf"):
        vals = np.concatenate([np.frombuffer(b, np.int64) for b in batch[c]])
        acc = np.zeros(len(ut), dtype=np.int64)
        np.add.at(acc, inv, vals)
        accs[c] = acc
    return pd.DataFrame({"toks": [ut.tobytes()], "df": [accs["df"].tobytes()], "tf": [accs["tf"].tobytes()]})


def doc_frequency(ds) -> pd.DataFrame:
    """Per-token document frequency (docs containing) and term frequency.

    The df/tf table is the input to IDF weighting and stopword mining;
    output is vocab-bounded. Per-doc dedup happens inside the block
    combiner, so the tree-merge carries at most ``vocab`` packed
    entries per block regardless of corpus size.
    """
    parts = ds.map_batches(_partial_df_tf_packed, batch_format="pyarrow")
    # keyless: every merge round contracts fan-in rows to one
    parts = parts.materialize()
    nb = parts.count()
    while nb > max(1, _rs._MERGE_THRESHOLD_ROWS):
        parts = parts.map_batches(
            _merge_df_tf, batch_size=_rs._MERGE_FANIN, batch_format="pandas"
        ).materialize()
        nb = parts.count()
    final = _merge_df_tf(parts.to_pandas())
    if not len(final):
        return pd.DataFrame({"token": [], "df": [], "tf": []})
    r = final.iloc[0]
    return pd.DataFrame(
        {
            "token": np.frombuffer(r["toks"], np.int64),
            "df": np.frombuffer(r["df"], np.int64),
            "tf": np.frombuffer(r["tf"], np.int64),
        }
    )


_BIGRAM_SHIFT = np.int64(1) << np.int64(32)  # pair key = a*2^32 + b (vocab << 2^31)


def _empty_bigram() -> pd.DataFrame:
    return pd.DataFrame({"keys": pd.Series(dtype=object), "cnts": pd.Series(dtype=object)})


def _partial_bigrams_packed(batch: pa.Table) -> pd.DataFrame:
    """Block combiner: one packed sparse (pair key, count) row per block.

    Adjacent-pair extraction is two vectorized gathers over the flat
    token buffer: drop each row's last position for the left operand,
    its right neighbour (same row by construction) is the right one.
    """
    _, vals, lens = _flat_tokens(batch)
    if len(vals) == 0:
        return _empty_bigram()
    mask = np.ones(len(vals), dtype=bool)
    ends = lens.cumsum()
    mask[ends[lens > 0] - 1] = False
    left_idx = np.flatnonzero(mask)
    if len(left_idx) == 0:
        return _empty_bigram()
    keys = vals[left_idx] * _BIGRAM_SHIFT + vals[left_idx + 1]
    uk, cnt = np.unique(keys, return_counts=True)
    return pd.DataFrame({"keys": [uk.tobytes()], "cnts": [cnt.astype(np.int64).tobytes()]})


def _merge_bigrams(batch: pd.DataFrame) -> pd.DataFrame:
    if not len(batch):
        return _empty_bigram()
    keys = np.concatenate([np.frombuffer(b, np.int64) for b in batch["keys"]])
    cnts = np.concatenate([np.frombuffer(b, np.int64) for b in batch["cnts"]])
    uk, inv = np.unique(keys, return_inverse=True)
    acc = np.zeros(len(uk), dtype=np.int64)
    np.add.at(acc, inv, cnts)
    return pd.DataFrame({"keys": [uk.tobytes()], "cnts": [acc.tobytes()]})


def bigram_collocations(ds, k: int = 100) -> pd.DataFrame:
    """Top-k adjacent token bigrams with exact marginal counts.

    Collocation mining for training-data analysis: the PMI of a pair is
    ``log(n_bigrams * cnt / (left_cnt * right_cnt))`` — every factor is
    emitted as an exact int64 so the score is reproducible bit-for-bit
    (no cross-engine libm-log drift in the gate). ``left_cnt`` /
    ``right_cnt`` are the bigram-position marginals (occurrences of the
    token as a left / right element), computed from the pair table, so
    the whole op reduces through the vocab²-bounded (observed-pairs)
    key space: block combiners pack unique pairs, fan-in rounds merge,
    and only the bounded remainder reaches the driver.

    No reference counterpart (engine-native corpus analytics).
    """
    parts = ds.map_batches(_partial_bigrams_packed, batch_format="pyarrow")
    parts = parts.materialize()
    nb = parts.count()
    while nb > max(1, _rs._MERGE_THRESHOLD_ROWS):
        parts = parts.map_batches(
            _merge_bigrams, batch_size=_rs._MERGE_FANIN, batch_format="pandas"
        ).materialize()
        nb = parts.count()
    final = _merge_bigrams(parts.to_pandas())
    if not len(final):
        cols = ["rnk", "token_a", "token_b", "cnt", "left_cnt", "right_cnt", "n_bigrams"]
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    r = final.iloc[0]
    keys = np.frombuffer(r["keys"], np.int64)
    cnt = np.frombuffer(r["cnts"], np.int64)
    tok_a = keys // _BIGRAM_SHIFT
    tok_b = keys % _BIGRAM_SHIFT
    ua, ia = np.unique(tok_a, return_inverse=True)
    left_acc = np.zeros(len(ua), dtype=np.int64)
    np.add.at(left_acc, ia, cnt)
    ub, ib = np.unique(tok_b, return_inverse=True)
    right_acc = np.zeros(len(ub), dtype=np.int64)
    np.add.at(right_acc, ib, cnt)
    n = int(cnt.sum())
    order = np.lexsort((tok_b, tok_a, -cnt))[:k]
    return pd.DataFrame(
        {
            "rnk": np.arange(1, len(order) + 1, dtype=np.int64),
            "token_a": tok_a[order],
            "token_b": tok_b[order],
            "cnt": cnt[order],
            "left_cnt": left_acc[ia[order]],
            "right_cnt": right_acc[ib[order]],
            "n_bigrams": np.full(len(order), n, dtype=np.int64),
        }
    )


def bigram_collocations_sql(parquet_path: str, k: int = 100) -> str:
    return f"""
WITH cnts AS (
    SELECT token_a, token_b, count(*) AS cnt FROM (
        SELECT unnest(tokens[:-2]) AS token_a, unnest(tokens[2:]) AS token_b
        FROM read_parquet('{parquet_path}')
    ) GROUP BY token_a, token_b
)
SELECT * FROM (
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token_a, token_b) AS BIGINT) AS rnk,
           CAST(token_a AS BIGINT) AS token_a,
           CAST(token_b AS BIGINT) AS token_b,
           CAST(cnt AS BIGINT) AS cnt,
           CAST(sum(cnt) OVER (PARTITION BY token_a) AS BIGINT) AS left_cnt,
           CAST(sum(cnt) OVER (PARTITION BY token_b) AS BIGINT) AS right_cnt,
           CAST(sum(cnt) OVER () AS BIGINT) AS n_bigrams
    FROM cnts
) WHERE rnk <= {k}
"""


def doc_frequency_sql(parquet_path: str) -> str:
    return f"""
SELECT CAST(token AS BIGINT) AS token,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS tf
FROM (
    SELECT doc_id, unnest(tokens) AS token
    FROM read_parquet('{parquet_path}')
)
GROUP BY token
"""


def source_kl_drift(ds) -> pd.DataFrame:
    """Per-source token-distribution drift: KL(source dist || corpus
    dist) in nats, plus the source's token mass.

    The heavy work is the same vocab-bounded packed-partial reduction
    as the df/tf table (_source_token_counts) — the corpus never
    shuffles by token; the KL itself is an O(sources x vocab) driver
    fold over the bounded counts frame. Support of every source is a
    subset of the corpus support, so the log ratio is always finite.
    The canonical data-quality gate for mixture rebalancing: a source
    whose drift jumps between snapshots changed its content
    distribution."""
    cnts = _source_token_counts(ds)
    if not len(cnts):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_tokens": pd.Series(dtype="int64"),
                "kl_to_corpus": pd.Series(dtype="float64"),
            }
        )
    corpus = cnts.groupby("token", sort=True)["cnt"].sum()
    total = float(corpus.sum())
    q = corpus / total
    rows = {"source": [], "n_tokens": [], "kl_to_corpus": []}
    for s, g in cnts.groupby("source", sort=True):
        n = float(g["cnt"].sum())
        p = g["cnt"].to_numpy(np.float64) / n
        qg = q.loc[g["token"]].to_numpy(np.float64)
        rows["source"].append(s)
        rows["n_tokens"].append(int(n))
        rows["kl_to_corpus"].append(round(float(np.sum(p * np.log(p / qg))), 9))
    out = pd.DataFrame(rows)
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out


def source_kl_drift_sql(parquet_path: str) -> str:
    return f"""
WITH tok AS (
  SELECT source, unnest(tokens) AS token FROM read_parquet('{parquet_path}')
),
sc AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
stot AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1),
ct AS (SELECT token, sum(c) AS cc FROM sc GROUP BY 1),
tot AS (SELECT sum(c) AS nn FROM sc)
SELECT s.source,
       CAST(st.n AS BIGINT) AS n_tokens,
       ROUND(sum((s.c / st.n) * ln((s.c / st.n) / (ct.cc / tot.nn))), 9) AS kl_to_corpus
FROM sc s
JOIN stot st USING (source)
JOIN ct USING (token)
CROSS JOIN tot
GROUP BY 1, st.n
"""


def doc_bigram_xent(ds, num_partitions: int | None = None):
    """Per-document cross-entropy under the corpus bigram model with
    add-one smoothing (the CCNet-style perplexity quality filter):

        xent(d) = -(1/m) * sum_i [ ln(c2(w_i, w_{i+1}) + 1)
                                   - ln(c1(w_i) + V) ]

    Architecture (the one stage family that genuinely needs a JOIN):
    the unigram table is vocab-bounded -> broadcast once; the bigram
    table is NOT (up to vocab^2) -> it stays a Dataset and each doc's
    exploded bigrams meet their counts in a hash-partitioned
    ``Dataset.join`` on the packed pair key, then re-aggregate per
    doc_id. No driver-side structure scales with the corpus. xent is
    rounded at 4 decimals: the float ln-sum order differs between
    engines (and between runs of either), a ~1e-13 noise that 4
    decimals absorb with ~1e-9 headroom.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    if num_partitions is None:
        # join width follows the cluster (no fixed config ceiling)
        from .pool import ncpus

        num_partitions = max(2, min(64, ncpus()))

    # corpus unigram counts (vocab-bounded) -> broadcast
    uni = _source_token_counts(ds)
    g = uni.groupby("token", sort=True)["cnt"].sum()
    toks = g.index.to_numpy(np.int64)
    c1 = g.to_numpy(np.int64)
    V = len(toks)
    uni_ref = ray.put((toks, c1, np.int64(V)))

    # corpus bigram counts (unbounded key space, up to vocab^2 distinct
    # pairs): unlike the vocab-bounded ops above, this table must NEVER
    # fold onto the driver (round-5 review finding: the previous fan-in
    # tree contracted it into one driver-resident packed row, ~16 GB at
    # a dense 32k vocab). Shape: per-block packed combiners are SPLIT by
    # bkey % nshards (still packed — the shuffle moves 16 B/key blobs,
    # not per-bigram rows; a plain groupby-sum over unpacked rows
    # measured 3.5x slower), one keyed exchange co-locates each shard,
    # and the per-shard merge UNPACKS INSIDE ITS TASK into the joinable
    # (bkey, c2) rows. Per-task memory = distinct_bigrams / nshards.
    # Counts are int64 sums — associative, exact under any partitioning.
    parts = ds.map_batches(_partial_bigrams_packed, batch_format="pyarrow").materialize()

    def _shard_split(batch: pd.DataFrame) -> pd.DataFrame:
        out_s, out_k, out_c = [], [], []
        for kb, cb in zip(batch.get("keys", ()), batch.get("cnts", ())):
            bk = np.frombuffer(kb, np.int64)
            bc = np.frombuffer(cb, np.int64)
            sh = (bk % num_partitions).astype(np.int64)
            order = np.argsort(sh, kind="stable")
            sh_s, bk_s, bc_s = sh[order], bk[order], bc[order]
            starts = np.flatnonzero(np.r_[True, sh_s[1:] != sh_s[:-1]])
            ends = np.r_[starts[1:], len(sh_s)]
            for s, e in zip(starts, ends):
                out_s.append(int(sh_s[s]))
                out_k.append(bk_s[s:e].tobytes())
                out_c.append(bc_s[s:e].tobytes())
        return pd.DataFrame(
            {
                "shard": pd.array(out_s, dtype="int64"),
                "keys": pd.Series(out_k, dtype=object),
                "cnts": pd.Series(out_c, dtype=object),
            }
        )

    def _merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        keys = np.concatenate([np.frombuffer(b, np.int64) for b in g["keys"]])
        cnts = np.concatenate([np.frombuffer(b, np.int64) for b in g["cnts"]])
        uk, inv = np.unique(keys, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, cnts)
        return pd.DataFrame({"bkey": uk, "c2": acc})

    if parts.count() == 0:
        bigrams = rd.from_pandas(
            pd.DataFrame({"bkey": pd.Series(dtype="int64"), "c2": pd.Series(dtype="int64")})
        )
    else:
        bigrams = (
            parts.map_batches(_shard_split, batch_format="pandas")
            .groupby("shard")
            .map_groups(_merge_shard, batch_format="pandas")
        )

    def explode(batch: pa.Table) -> pd.DataFrame:
        src, vals, lens = _flat_tokens(batch)
        doc = batch.column("doc_id").to_pandas().to_numpy()
        if len(vals) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype=object), "bkey": pd.Series(dtype="int64")})
        mask = np.ones(len(vals), dtype=bool)
        ends = lens.cumsum()
        mask[ends[lens > 0] - 1] = False
        li = np.flatnonzero(mask)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(doc, np.maximum(lens - 1, 0)),
                "bkey": vals[li] * _BIGRAM_SHIFT + vals[li + 1],
            }
        )

    doc_bigrams = ds.map_batches(explode, batch_format="pyarrow")
    joined = doc_bigrams.join(
        bigrams, join_type="inner", num_partitions=num_partitions, on=("bkey",)
    )

    class LpScorer:
        def __init__(self):
            self.toks, self.c1, self.V = ray.get(uni_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            w1 = (batch["bkey"].to_numpy(np.int64) // _BIGRAM_SHIFT).astype(np.int64)
            pos = np.searchsorted(self.toks, w1)
            lp = np.log(batch["c2"].to_numpy(np.float64) + 1.0) - np.log(
                self.c1[pos].astype(np.float64) + float(self.V)
            )
            return pd.DataFrame({"doc_id": batch["doc_id"], "lp": lp})

    from .pool import auto_pool

    scored = joined.map_batches(LpScorer, batch_format="pandas", concurrency=auto_pool())
    agg = scored.groupby("doc_id").aggregate(
        Sum("lp", alias_name="lp_sum"), Count(alias_name="n_bigrams")
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": batch["n_bigrams"].astype("int64"),
                "xent": np.round(-batch["lp_sum"].to_numpy() / batch["n_bigrams"].to_numpy(), 4),
            }
        )
        return out

    return agg.map_batches(finalize, batch_format="pandas")


def doc_bigram_xent_sql(parquet_path: str) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(CAST(tokens AS BIGINT[])) AS w,
         unnest(generate_series(1, len(tokens))) AS pos
  FROM read_parquet('{parquet_path}')
),
big AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
c2 AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2),
c1 AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
vocab AS (SELECT count(*) AS v FROM c1)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-avg(ln(c2.c + 1) - ln(c1.c + vocab.v)), 4) AS xent
FROM big g
JOIN c2 ON c2.w1 = g.w1 AND c2.w2 = g.w2
JOIN c1 ON c1.w = g.w1
CROSS JOIN vocab
GROUP BY g.doc_id
"""


def length_ks_drift(ds) -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov drift of the sequence-LENGTH
    distribution, per source vs the whole corpus: D = sup_l
    |F_source(l) - F_corpus(l)| over the shared length grid, plus the
    length where the sup is attained (ties -> smallest length). The
    structural companion to source_kl_drift: KL watches WHAT tokens a
    source emits, KS watches the SHAPE of its documents.

    Scale: lengths are a BOUNDED domain, so per-block (source, n_tok)
    partial counts reduce through one Ray groupby-aggregate and the
    ECDF fold runs over a sources x lengths frame that never grows with
    row count. ECDF values are exact-int ratios evaluated in the same
    f64 order as the SQL oracle, and D is a max over bit-equal values —
    no rounding needed."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "n_tok": batch["n_tok"].to_pandas().astype(np.int64),
            }
        )
        return df.groupby(["source", "n_tok"], as_index=False).agg(cnt=("n_tok", "size"))

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "n_tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    if not len(hist):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_docs": pd.Series(dtype="int64"),
                "ks_d": pd.Series(dtype="float64"),
                "ks_at_len": pd.Series(dtype="int64"),
            }
        )
    lengths = np.sort(hist["n_tok"].unique())
    corpus = (
        hist.groupby("n_tok")["cnt"].sum().reindex(lengths, fill_value=0).to_numpy(np.int64)
    )
    ccum = corpus.cumsum()
    nc = float(ccum[-1])
    rows = {"source": [], "n_docs": [], "ks_d": [], "ks_at_len": []}
    for s, g in hist.groupby("source", sort=True):
        scnt = (
            g.set_index("n_tok")["cnt"].reindex(lengths, fill_value=0).to_numpy(np.int64)
        )
        scum = scnt.cumsum()
        ns = float(scum[-1])
        diff = np.abs(scum.astype(np.float64) / ns - ccum.astype(np.float64) / nc)
        k = int(np.argmax(diff))  # first max -> smallest length
        rows["source"].append(s)
        rows["n_docs"].append(int(scum[-1]))
        rows["ks_d"].append(float(diff[k]))
        rows["ks_at_len"].append(int(lengths[k]))
    return pd.DataFrame(rows)


def length_ks_drift_sql(parquet_path: str) -> str:
    return f"""
WITH h AS (
  SELECT source, CAST(n_tok AS BIGINT) AS n_tok, CAST(count(*) AS BIGINT) AS cnt
  FROM read_parquet('{parquet_path}') GROUP BY 1, 2
), lens AS (
  SELECT DISTINCT n_tok FROM h
), srcs AS (
  SELECT source, CAST(sum(cnt) AS BIGINT) AS ns FROM h GROUP BY 1
), grid AS (
  SELECT s.source, s.ns, l.n_tok FROM srcs s CROSS JOIN lens l
), scum AS (
  SELECT g.source, g.ns, g.n_tok,
         CAST(sum(coalesce(h.cnt, 0)) OVER (PARTITION BY g.source ORDER BY g.n_tok)
              AS BIGINT) AS cs
  FROM grid g LEFT JOIN h ON h.source = g.source AND h.n_tok = g.n_tok
), ccum AS (
  SELECT l.n_tok,
         CAST(sum(coalesce(t.cnt, 0)) OVER (ORDER BY l.n_tok) AS BIGINT) AS cc
  FROM lens l LEFT JOIN (SELECT n_tok, sum(cnt) AS cnt FROM h GROUP BY 1) t
    ON t.n_tok = l.n_tok
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS nc FROM h
), diff AS (
  SELECT s.source, s.ns, s.n_tok,
         abs(CAST(s.cs AS DOUBLE) / CAST(s.ns AS DOUBLE)
             - CAST(c.cc AS DOUBLE) / CAST(t.nc AS DOUBLE)) AS d
  FROM scum s JOIN ccum c USING (n_tok) CROSS JOIN tot t
), ranked AS (
  SELECT source, ns, n_tok, d,
         row_number() OVER (PARTITION BY source ORDER BY d DESC, n_tok ASC) AS rk
  FROM diff
)
SELECT source, ns AS n_docs, d AS ks_d, CAST(n_tok AS BIGINT) AS ks_at_len
FROM ranked WHERE rk = 1
"""


def vocab_coverage(ds, n_points: int = 10) -> pd.DataFrame:
    """Vocabulary coverage curve per source: the cumulative share of all
    token occurrences covered by the top-r tokens, sampled at decile
    ranks r = ceil(d/n_points * n_distinct). The classic tokenizer-audit
    curve (how head-heavy is each source's vocabulary?).

    Reduces through the same vocab-bounded packed partials as
    heavy_hitters — per-block bincount, fan-in tree merge — so the final
    contraction sorts at most num_sources x vocab rows. Rank ties break
    on ascending token id (matches the SQL window ORDER BY). cum/total
    are exact int64; coverage is one IEEE int/int division.
    """
    cnts = _source_token_counts(ds)
    out = []
    for s, g in cnts.groupby("source", sort=True):
        g = g.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        cum = g["cnt"].to_numpy(np.int64).cumsum()
        n = len(g)
        total = int(cum[-1])
        d = np.arange(1, n_points + 1, dtype=np.int64)
        rnk = (d * n + n_points - 1) // n_points  # ceil(d*n/n_points), exact ints
        out.append(
            pd.DataFrame(
                {
                    "source": s,
                    "decile": d,
                    "rnk": rnk,
                    "cum_cnt": cum[rnk - 1],
                    "total_cnt": np.int64(total),
                    "coverage": cum[rnk - 1] / total,
                }
            )
        )
    if not out:
        return pd.DataFrame(
            {"source": [], "decile": [], "rnk": [], "cum_cnt": [], "total_cnt": [], "coverage": []}
        )
    return pd.concat(out, ignore_index=True)


def vocab_coverage_sql(parquet_path: str, n_points: int = 10) -> str:
    return f"""
WITH c AS (
    SELECT source, token, count(*) AS cnt
    FROM (SELECT source, unnest(tokens) AS token
          FROM read_parquet('{parquet_path}'))
    GROUP BY source, token
), r AS (
    SELECT source,
           CAST(row_number() OVER w AS BIGINT) AS rnk,
           CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
           CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_distinct,
           CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS total_cnt
    FROM c
    WINDOW w AS (PARTITION BY source ORDER BY cnt DESC, token)
), d AS (
    SELECT CAST(unnest(generate_series(1, {n_points})) AS BIGINT) AS decile
)
SELECT r.source, d.decile, r.rnk, r.cum_cnt, r.total_cnt,
       CAST(r.cum_cnt AS DOUBLE) / r.total_cnt AS coverage
FROM r JOIN d
  ON r.rnk = (d.decile * r.n_distinct + {n_points} - 1) // {n_points}
"""


def _empty_bitmap() -> pd.DataFrame:
    return pd.DataFrame({"gkey": pd.Series(dtype=object), "bm": pd.Series(dtype=object)})


def _merge_bitmaps(batch: pd.DataFrame) -> pd.DataFrame:
    """Associative OR-merge of fixed-size bitmap rows per group key."""
    if not len(batch):
        return _empty_bitmap()
    rows = {"gkey": [], "bm": []}
    for k, g in batch.groupby("gkey", sort=True):
        acc = np.frombuffer(g["bm"].iloc[0], np.uint8).copy()
        for b in g["bm"].iloc[1:]:
            acc |= np.frombuffer(b, np.uint8)
        rows["gkey"].append(k)
        rows["bm"].append(acc.tobytes())
    return pd.DataFrame(rows)


def distinct_tokens_daily(ds, spec) -> pd.DataFrame:
    """Exact distinct-token continuous aggregate per (source, day):
    how much of the vocabulary each source exercises each day — the
    canonical "distinct count inside a rollup tier" problem.

    100-TB shape: distinct state must be MERGEABLE, not enumerable —
    per block each (source, day) group collapses to ONE fixed-size
    bitmap (vocab/8 bytes, ~4 KB at 32k vocab; exact because the token
    domain is bounded), bitmaps merge by elementwise OR in keyed fan-in
    tree rounds, and the driver folds only the bounded remainder
    (sources x days groups, row-count-independent). For unbounded
    domains the HLL path (stages/sketch.py) is the same shape with
    fixed registers instead of bitmaps.
    """
    from ..sources.synth import derive_ts

    nbytes = (spec.vocab + 7) // 8

    def partials(batch: pa.Table) -> pd.DataFrame:
        src, vals, lens = _flat_tokens(batch)
        if len(src) == 0:
            return _empty_bitmap()
        ids = batch.column("doc_id").to_pandas().str.slice(1).astype(np.int64).to_numpy()
        day = derive_ts(ids, spec) // 86400
        gkey = np.char.add(np.char.add(src.astype(str), "|"), day.astype(str))
        flat_key = np.repeat(gkey, lens)
        rows = {"gkey": [], "bm": []}
        order = np.argsort(flat_key, kind="mergesort")
        fk, fv = flat_key[order], vals[order]
        bounds = np.flatnonzero(np.r_[True, fk[1:] != fk[:-1], True])
        for a, b in zip(bounds[:-1], bounds[1:]):
            bits = np.zeros(nbytes * 8, dtype=np.uint8)
            bits[fv[a:b]] = 1
            rows["gkey"].append(fk[a])
            rows["bm"].append(np.packbits(bits).tobytes())
        return pd.DataFrame(rows)

    parts = ds.map_batches(partials, batch_format="pyarrow")
    packed = _tree_reduce_keyed(parts, _merge_bitmaps, key="gkey")
    if not len(packed):
        return pd.DataFrame({"source": [], "day": [], "n_distinct": []})
    src_day = packed["gkey"].str.split("|", expand=True)
    return pd.DataFrame(
        {
            "source": src_day[0].to_numpy(),
            "day": src_day[1].astype(np.int64).to_numpy(),
            "n_distinct": [
                int(np.unpackbits(np.frombuffer(b, np.uint8)).sum()) for b in packed["bm"]
            ],
        }
    ).sort_values(["source", "day"]).reset_index(drop=True)


def distinct_tokens_daily_sql(parquet_path: str) -> str:
    return f"""
SELECT source, CAST(ts // 86400 AS BIGINT) AS day,
       CAST(count(DISTINCT token) AS BIGINT) AS n_distinct
FROM (SELECT source, ts, unnest(tokens) AS token
      FROM read_parquet('{parquet_path}'))
GROUP BY source, day
"""


def source_entropy(ds) -> pd.DataFrame:
    """Per-source unigram Shannon entropy (nats) + distinct-token count:
    the standard corpus-diversity score behind mixture weighting (a
    low-entropy source is templated/repetitive; a high-entropy one is
    diverse). Same vocab-bounded packed-partial reduction as the KL
    drift op; the entropy itself is an O(sources x vocab) driver fold
    over the bounded counts frame."""
    cnts = _source_token_counts(ds)
    if not len(cnts):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_tokens": pd.Series(dtype="int64"),
                "n_distinct": pd.Series(dtype="int64"),
                "entropy_nats": pd.Series(dtype="float64"),
            }
        )
    rows = {"source": [], "n_tokens": [], "n_distinct": [], "entropy_nats": []}
    for s, g in cnts.groupby("source", sort=True):
        n = float(g["cnt"].sum())
        p = g["cnt"].to_numpy(np.float64) / n
        rows["source"].append(s)
        rows["n_tokens"].append(int(n))
        rows["n_distinct"].append(len(g))
        rows["entropy_nats"].append(round(float(-np.sum(p * np.log(p))), 9))
    out = pd.DataFrame(rows)
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out


def source_entropy_sql(parquet_path: str) -> str:
    return f"""
WITH sc AS (
  SELECT source, token, count(*) AS c
  FROM (SELECT source, unnest(tokens) AS token FROM read_parquet('{parquet_path}'))
  GROUP BY 1, 2
), stot AS (SELECT source, sum(c) AS n FROM sc GROUP BY 1)
SELECT s.source,
       CAST(st.n AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       ROUND(-sum((s.c / st.n) * ln(s.c / st.n)), 9) AS entropy_nats
FROM sc s JOIN stot st USING (source)
GROUP BY 1, st.n
"""


def zipf_slope(ds) -> pd.DataFrame:
    """Per-source Zipf fit: OLS slope/intercept of ln(freq) on ln(rank)
    over the full rank-frequency curve (rank ties break on ascending
    token id, matching the SQL row_number). A natural-text source sits
    near slope -1; templated or synthetic sources deviate — the classic
    corpus-sanity fingerprint.

    Same vocab-bounded packed-partial reduction as the other vocabulary
    ops; the OLS is a driver fold over at most num_sources x vocab
    counts. Both sides round to 6 decimals (ln-sum order is
    engine-dependent at the last ulp)."""
    cnts = _source_token_counts(ds)
    if not len(cnts):
        return pd.DataFrame(
            {
                "source": pd.Series(dtype=object),
                "n_distinct": pd.Series(dtype="int64"),
                "slope": pd.Series(dtype="float64"),
                "intercept": pd.Series(dtype="float64"),
            }
        )
    rows = {"source": [], "n_distinct": [], "slope": [], "intercept": []}
    for s, g in cnts.groupby("source", sort=True):
        g = g.sort_values(["cnt", "token"], ascending=[False, True], kind="mergesort")
        n = len(g)
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(g["cnt"].to_numpy(np.float64))
        sx, sy = float(x.sum()), float(y.sum())
        sxx, sxy = float((x * x).sum()), float((x * y).sum())
        denom = n * sxx - sx * sx
        # n == 1 (single distinct token): x-variance is 0 and the OLS is
        # undefined — DuckDB's 0/0 is NULL, which lands as NaN in the
        # oracle frame, so NaN here is exact parity (intercept follows:
        # NaN * 0 is NaN in IEEE, matching SQL NULL propagation).
        slope = (n * sxy - sx * sy) / denom if denom else float("nan")
        intercept = (sy - slope * sx) / n
        rows["source"].append(s)
        rows["n_distinct"].append(n)
        rows["slope"].append(round(slope, 6))
        rows["intercept"].append(round(intercept, 6))
    out = pd.DataFrame(rows)
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out


def zipf_slope_sql(parquet_path: str) -> str:
    return f"""
WITH sc AS (
  SELECT source, token, count(*) AS c
  FROM (SELECT source, unnest(tokens) AS token FROM read_parquet('{parquet_path}'))
  GROUP BY 1, 2
), r AS (
  SELECT source,
         ln(row_number() OVER (PARTITION BY source ORDER BY c DESC, token)) AS x,
         ln(CAST(c AS DOUBLE)) AS y
  FROM sc
), m AS (
  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM r GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_distinct,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept
FROM m
"""


def source_vocab_overlap(ds, spec) -> pd.DataFrame:
    """Pairwise vocabulary overlap between sources: |A∩B|, |A∪B| and
    exact Jaccard over each source's distinct-token SET — the
    set-similarity matrix behind source grouping / near-duplicate
    source detection.

    Distributed shape: each block collapses to at most num_sources
    fixed-size bitmaps (vocab/8 bytes), bitmaps OR-merge in keyed
    fan-in rounds, and the pairwise AND/popcount runs on the driver
    over num_sources bitmaps only — never over token occurrences.
    (For unbounded vocab this becomes a theta/HLL intersection sketch;
    the bounded-domain bitmap is its exact analog.)"""
    nbytes = (spec.vocab + 7) // 8

    def partials(batch: pa.Table) -> pd.DataFrame:
        src, vals, lens = _flat_tokens(batch)
        if len(src) == 0:
            return _empty_bitmap()
        flat_src = np.repeat(src, lens)
        rows = {"gkey": [], "bm": []}
        order = np.argsort(flat_src, kind="mergesort")
        fs, fv = flat_src[order], vals[order]
        bounds = np.flatnonzero(np.r_[True, fs[1:] != fs[:-1], True])
        for a, b in zip(bounds[:-1], bounds[1:]):
            bits = np.zeros(nbytes * 8, dtype=np.uint8)
            bits[fv[a:b]] = 1
            rows["gkey"].append(fs[a])
            rows["bm"].append(np.packbits(bits).tobytes())
        return pd.DataFrame(rows)

    parts = ds.map_batches(partials, batch_format="pyarrow")
    packed = _tree_reduce_keyed(parts, _merge_bitmaps, key="gkey")
    if not len(packed):
        return pd.DataFrame(
            {"source_a": [], "source_b": [], "n_inter": [], "n_union": [], "jaccard": []}
        )
    packed = packed.sort_values("gkey").reset_index(drop=True)
    names = packed["gkey"].tolist()
    bms = [np.frombuffer(b, np.uint8) for b in packed["bm"]]
    pops = [int(np.unpackbits(b).sum()) for b in bms]
    out = {"source_a": [], "source_b": [], "n_inter": [], "n_union": [], "jaccard": []}
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            inter = int(np.unpackbits(bms[i] & bms[j]).sum())
            if inter == 0:
                continue  # mirror the SQL inner join (no zero-overlap rows)
            union = pops[i] + pops[j] - inter
            out["source_a"].append(names[i])
            out["source_b"].append(names[j])
            out["n_inter"].append(inter)
            out["n_union"].append(union)
            out["jaccard"].append(inter / union)
    df = pd.DataFrame(out)
    for c in ("n_inter", "n_union"):
        df[c] = df[c].astype("int64")
    return df


def source_vocab_overlap_sql(parquet_path: str) -> str:
    return f"""
WITH s AS (
  SELECT DISTINCT source, token
  FROM (SELECT source, unnest(tokens) AS token FROM read_parquet('{parquet_path}'))
), sizes AS (
  SELECT source, count(*) AS n FROM s GROUP BY 1
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
  FROM s a JOIN s b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b,
       CAST(i.n_inter AS BIGINT) AS n_inter,
       CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union,
       CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""
