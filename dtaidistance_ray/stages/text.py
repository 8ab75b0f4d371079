"""Text analysis operators over the ``documents`` table.

Large-scale training-data pipeline components: exact dedup, token
counting, quality scoring, language ID, document fingerprinting. The
stateful stages (compiled regexes, stopword tables) are actor pools —
the callable classes compile state once per actor in ``__init__``.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
from .pool import auto_pool


def read_documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def dedup_exact(sf_dir: str):
    """Exact dedup by content hash: keep the smallest doc_id per md5(text).

    Hash-partitioned groupby on the digest — the canonical exact-dedup
    shuffle; at scale the digest is the ONE partition key and survivors
    never co-locate full texts (only hash + id move)."""
    from ray.data.aggregate import Count, Min

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch["text_md5"] = [hashlib.md5(t.encode()).hexdigest() for t in batch["text"]]
        return batch[["doc_id", "text_md5"]]

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_md5,
       CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
"""


# BPE-ish pre-tokenizer: words, integer runs, or single non-space
# symbols. SHARED with stages.bpe (the BPE learner/encoder must
# tokenize under exactly the convention TokenCounter counts with).
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


class TokenCounter:
    """Whitespace + BPE-ish regex token counting (actor-pool stage)."""

    def __init__(self):
        self.ws = re.compile(r"\s+")
        self.bpeish = re.compile(BPEISH_PATTERN)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"]
        batch["ws_tokens"] = [len(self.ws.split(t.strip())) if t.strip() else 0 for t in texts]
        batch["bpeish_tokens"] = [len(self.bpeish.findall(t)) for t in texts]
        batch["n_chars_check"] = [len(t) for t in texts]
        return batch[["doc_id", "ws_tokens", "bpeish_tokens", "n_chars_check"]]


def token_counts(sf_dir: str):
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(TokenCounter, batch_format="pandas", concurrency=auto_pool())


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS BIGINT)
           AS bpeish_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_check
FROM documents
"""


class QualityScorer:
    """Length / punctuation / stopword-ratio quality heuristics."""

    STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "that", "for", "it")

    def __init__(self):
        self.word = re.compile(r"[A-Za-z]+")
        self.punct = re.compile(r"[.,;:!?]")
        self.stop = set(self.STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t in batch["text"]:
            words = self.word.findall(t.lower())
            nw = len(words)
            npunct = len(self.punct.findall(t))
            nstop = sum(1 for w in words if w in self.stop)
            nchars = len(t)
            rows.append(
                (
                    nw,
                    npunct,
                    round(npunct / nchars, 6) if nchars else 0.0,
                    round(nstop / nw, 6) if nw else 0.0,
                )
            )
        out = pd.DataFrame(
            rows, columns=["n_words", "n_punct", "punct_ratio", "stopword_ratio"]
        )
        out.insert(0, "doc_id", batch["doc_id"].to_numpy())
        return out


def quality_scores(sf_dir: str):
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(QualityScorer, batch_format="pandas", concurrency=auto_pool())


QUALITY_SQL = r"""
WITH w AS (
  SELECT doc_id, text,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
         len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
             x -> x IN ('the','and','of','a','to','in','is','that','for','it'))) AS n_stop
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_punct AS BIGINT) AS n_punct,
       CASE WHEN length(text) = 0 THEN 0.0
            ELSE ROUND(CAST(n_punct AS DOUBLE) / length(text), 6) END AS punct_ratio,
       CASE WHEN n_words = 0 THEN 0.0
            ELSE ROUND(CAST(n_stop AS DOUBLE) / n_words, 6) END AS stopword_ratio
FROM w
"""


class LangId:
    """Character n-gram language heuristic (en/de/fr/es + other).

    Deterministic scoring against tiny built-in trigram profiles; a
    rows-only correctness check (not SQL-expressible) — accuracy vs the
    table's ``lang`` column is reported as a metric column."""

    PROFILES = {
        "en": ["the", "and", "ing", " th", "he ", "ion", " of", "of ", "ed ", "is "],
        "de": ["der", "ein", "ich", "sch", "und", " de", "die", "en ", "ch ", "cht"],
        "fr": ["les", " de", "de ", "ent", "ion", "que", " le", "la ", "des", "ait"],
        "es": [" de", "de ", "los", "la ", "que", "ión", "ent", "el ", " la", "ado"],
    }

    def __init__(self):
        self.tables = {
            lang: {g: i for i, g in enumerate(grams)} for lang, grams in self.PROFILES.items()
        }

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for t in batch["text"]:
            t = t.lower()
            grams = [t[i : i + 3] for i in range(max(0, len(t) - 2))]
            best, best_score = "other", 2
            for lang, table in self.tables.items():
                score = sum(1 for g in grams if g in table)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        out = batch[["doc_id"]].copy()
        out["pred_lang"] = preds
        if "lang" in batch.columns:
            out["actual_lang"] = batch["lang"].to_numpy()
        return out


def lang_id(sf_dir: str):
    ds = read_documents(sf_dir, columns=["doc_id", "text", "lang"])
    return ds.map_batches(LangId, batch_format="pandas", concurrency=auto_pool())


class Fingerprinter:
    """Rolling polynomial hash fingerprint (Karp-Rabin, base 256 mod
    2^61-1) + crc32. Base 256 makes the polynomial value of the whole
    byte string equal to its big-endian integer interpretation, so the
    entire per-document hash is ONE C bigint modulo — no per-byte
    Python loop (≈100x the bytes/s of the Horner loop it replaces)."""

    MOD = (1 << 61) - 1

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = []
        crcs = []
        for t in batch["text"]:
            raw = t.encode()
            fps.append(int.from_bytes(raw, "big") % self.MOD)
            crcs.append(zlib.crc32(raw))
        out = batch[["doc_id"]].copy()
        out["fingerprint"] = pd.array(fps, dtype="int64")
        out["crc32"] = pd.array(crcs, dtype="int64")
        return out


def fingerprints(sf_dir: str):
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(Fingerprinter, batch_format="pandas", concurrency=auto_pool())


# per-stratum keep thresholds on the first 16 hash bits, as 4 hex chars:
# majority language downsampled hard, the rest kept at high rate — the
# classic training-mix rebalancing. threshold hex = floor(rate * 65536).
STRATA_THRESHOLDS = {"en": "3333"}  # 0.2
DEFAULT_THRESHOLD = "cccc"  # 0.8


def stratified_sample(sf_dir: str):
    """Deterministic stratified corpus sample: keep a doc iff the first
    16 bits of md5(doc_id) fall under its language stratum's threshold.

    Hash-gated sampling is the 100-TB-correct shape: membership is a
    pure row-local predicate (map-only, no shuffle, no RNG state, no
    coordination), re-runs and resumes pick the identical sample, and
    the mix is rebalanced per stratum (majority lang 20%, rest 80%).
    The text column is never read — predicate needs only doc_id/lang.
    """

    ds = read_documents(sf_dir, columns=["doc_id", "lang", "source", "n_chars"])

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        pref = np.array(
            [hashlib.md5(str(int(d)).encode()).hexdigest()[:4] for d in batch["doc_id"]]
        )
        thr = (
            batch["lang"]
            .map(lambda l: STRATA_THRESHOLDS.get(l, DEFAULT_THRESHOLD))
            .to_numpy()
        )
        out = batch.loc[pref < thr, ["doc_id", "lang", "source", "n_chars"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_chars"] = out["n_chars"].astype("int64")
        return out

    return ds.map_batches(keep, batch_format="pandas")


STRATIFIED_SAMPLE_SQL = f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
       CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE WHEN lang = 'en' THEN '{STRATA_THRESHOLDS["en"]}'
             ELSE '{DEFAULT_THRESHOLD}' END
"""


# ---------------------------------------------------------------------------
# Cross-corpus decontamination (benchmark-leak filtering)
# ---------------------------------------------------------------------------

DECON_NGRAM = 5
DECON_EVAL_MOD = 23  # doc_id % MOD == 0 -> member of the "eval" corpus


def _word_grams(text: str, n: int = DECON_NGRAM) -> set:
    """Distinct lowercase word n-grams of one document (whitespace
    tokenization; equivalent to the oracle's regexp split on \\s+)."""
    w = text.lower().split()
    if len(w) < n:
        return set()
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


class DecontaminateScorer:
    """Counts, per document, how many of its distinct word n-grams
    appear in the broadcast eval-set gram set (actor-pool stage: the
    eval grams are fetched from the object store once per actor).

    100-TB shape: the eval corpus (benchmark/test sets) is the SMALL
    side — typically MBs against TBs of training data — so this is the
    canonical broadcast-filter: `ray.put` the gram set once, stream the
    corpus through a map-only stage; no shuffle, no join. Exact string
    membership (a Python frozenset; C-level hashing per lookup) rather
    than 64-bit fingerprints keeps the result bit-reproducible by the
    SQL oracle with no collision caveat.
    """

    def __init__(self, grams_ref):
        import ray

        self.grams = ray.get(grams_ref) if hasattr(grams_ref, "hex") else grams_ref

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hits = []
        for t in batch["text"]:
            g = _word_grams(t)
            hits.append(len(g & self.grams) if g else 0)
        doc_id = batch["doc_id"].astype("int64")
        is_eval = (doc_id % DECON_EVAL_MOD == 0).astype("int64")
        n_hit = pd.Series(hits, index=batch.index, dtype="int64")
        return pd.DataFrame(
            {
                "doc_id": doc_id,
                "n_hit": n_hit,
                "is_eval": is_eval,
                "contaminated": ((n_hit > 0) & (is_eval == 0)).astype("int64"),
            }
        )


def decontaminate(sf_dir: str):
    """Flag training documents sharing word 5-grams with the eval set.

    The eval set is carved deterministically from the same table
    (doc_id % 23 == 0) so the op needs no external data; in production
    the eval side would be the held-out benchmark corpus. Two passes:
    a bounded read of the (small) eval side to build the gram set, then
    a streamed map-only scoring pass over the full corpus."""
    import ray

    def eval_only(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["doc_id"] % DECON_EVAL_MOD == 0]

    eval_df = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(eval_only, batch_format="pandas")
        .to_pandas()  # the eval side is small by construction
    )
    grams: set = set()
    for t in eval_df["text"]:
        grams |= _word_grams(t)
    grams_ref = ray.put(frozenset(grams))
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        DecontaminateScorer,
        fn_constructor_args=(grams_ref,),
        batch_format="pandas",
        concurrency=auto_pool(),
    )


DECONTAMINATE_SQL = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - {DECON_NGRAM - 2}),
                               i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4]))) AS g
  FROM words WHERE len(ws) >= {DECON_NGRAM}
),
doc_grams AS (SELECT DISTINCT doc_id, g FROM grams),
eval_grams AS (SELECT DISTINCT g FROM doc_grams WHERE doc_id % {DECON_EVAL_MOD} = 0),
hits AS (
  SELECT dg.doc_id, count(*) AS n_hit
  FROM doc_grams dg JOIN eval_grams e USING (g)
  GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(d.doc_id % {DECON_EVAL_MOD} = 0 AS BIGINT) AS is_eval,
       CAST(coalesce(h.n_hit, 0) > 0 AND d.doc_id % {DECON_EVAL_MOD} <> 0 AS BIGINT)
           AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Intra-document repetition (Gopher-style quality rule)
# ---------------------------------------------------------------------------

REP_NGRAM = 3


class RepetitionScorer:
    """Per-document repeated-n-gram ratio: 1 - distinct/total word
    trigrams — the standard boilerplate/repetition signal (high for
    template spam and looping generations). Map-only; word splitting
    is the same whitespace tokenization as the decontamination op, so
    the SQL oracle shares its list_transform n-gram builder."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        total = []
        distinct = []
        for t in batch["text"]:
            w = t.lower().split()
            n = len(w) - REP_NGRAM + 1
            if n <= 0:
                total.append(0)
                distinct.append(0)
                continue
            grams = [" ".join(w[i : i + REP_NGRAM]) for i in range(n)]
            total.append(n)
            distinct.append(len(set(grams)))
        total = pd.Series(total, index=batch.index, dtype="int64")
        distinct = pd.Series(distinct, index=batch.index, dtype="int64")
        ratio = pd.Series(0.0, index=batch.index, dtype="float64")
        nz = total > 0
        ratio[nz] = 1.0 - distinct[nz] / total[nz]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_grams": total,
                "n_distinct": distinct,
                "rep_ratio": ratio.round(6),
            }
        )


def repetition_scores(sf_dir: str):
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        RepetitionScorer, batch_format="pandas", concurrency=auto_pool()
    )


REPETITION_SQL = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws) - {REP_NGRAM - 2}),
                               i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS g
  FROM words WHERE len(ws) >= {REP_NGRAM}
),
agg AS (
  SELECT doc_id, count(*) AS n_grams, count(DISTINCT g) AS n_distinct
  FROM grams GROUP BY 1
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       round(CASE WHEN a.n_grams > 0
                  THEN 1.0 - a.n_distinct / CAST(a.n_grams AS DOUBLE)
                  ELSE 0.0 END, 6) AS rep_ratio
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


DUPWIN_N = 8


def dup_window_ratio(sf_dir: str):
    """Cross-document duplicated-window ratio: the fraction of each
    document's 8-word windows that occur anywhere else in the corpus —
    the C4/RefinedWeb-style boilerplate signal (near-identical intros,
    templates, quoted chunks) that intra-doc repetition scoring misses.

    Distributed shape: explode windows -> corpus-wide count (hash
    shuffle on the window key; nothing driver-side) -> partitioned hash
    join back to (doc, window) -> per-doc combiner partials -> tiny
    groupby sum. Windows travel as strings here so the DuckDB oracle
    can mirror the keys exactly; at 100 TB you hash each window to a
    uint64 first (same multiply-shift path as the MinHash shingles,
    dedup.py) and the shuffle carries 8 bytes per window instead of
    ~50. dup_ratio is one IEEE int/int division."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def windows(batch: pd.DataFrame) -> pd.DataFrame:
        rows_d, rows_w = [], []
        for did, t in zip(batch["doc_id"], batch["text"]):
            ws = t.lower().split()
            for i in range(len(ws) - DUPWIN_N + 1):
                rows_d.append(did)
                rows_w.append(" ".join(ws[i : i + DUPWIN_N]))
        return pd.DataFrame({"doc_id": pd.array(rows_d, dtype="int64"), "win": rows_w})

    from .pool import ncpus

    w = docs.map_batches(windows, batch_format="pandas")
    counts = w.groupby("win").aggregate(Count(alias_name="c"))
    joined = w.join(
        counts, join_type="inner", num_partitions=max(2, min(32, ncpus())), on=("win",)
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass: no per-group Python lambda on the
        # corpus-wide post-join stream (round-5 review finding)
        return (
            batch.assign(dup=(batch["c"].to_numpy() > 1).astype("int64"))
            .groupby("doc_id", as_index=False)
            .agg(n_win=("c", "size"), dup_win=("dup", "sum"))
        )

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum("n_win", alias_name="n_win"), Sum("dup_win", alias_name="dup_win"))
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("doc_id", "n_win", "dup_win"):
            batch[c] = batch[c].astype("int64")
        batch["dup_ratio"] = batch["dup_win"] / batch["n_win"]
        return batch

    return out.map_batches(finalize, batch_format="pandas")


DUPWIN_SQL = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '') AS ws
  FROM documents
), idx AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, greatest(len(ws) - {DUPWIN_N - 1}, 0))) AS i
  FROM d
), w AS (
  SELECT doc_id, array_to_string(ws[i:i + {DUPWIN_N - 1}], ' ') AS win FROM idx
), c AS (
  SELECT win, count(*) AS c FROM w GROUP BY 1
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_win,
       CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_win,
       CAST(sum(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_ratio
FROM w JOIN c USING (win)
GROUP BY w.doc_id
"""


def curriculum_deciles(sf_dir: str):
    """Curriculum binning: every document labeled with its exact global
    DECILE of stopword ratio (the cheap fluency proxy) — the difficulty
    schedule a curriculum-ordered training run samples from.

    Reuses the range-sharded global-ntile stage (events._add_global_ntile:
    per-shard counts -> broadcast prefix offsets -> co-partitioned local
    rank) — no global sort, no driver doc table. The ratio is already
    rounded to 6 decimals by the quality scorer, so the integer sort key
    round(r * 1e6) is an exact monotone transform and ties break on
    doc_id exactly as the SQL ntile ordering does."""
    from .events import _add_global_ntile

    scored = quality_scores(sf_dir)

    def key(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[["doc_id", "n_words", "stopword_ratio"]].copy()
        batch["doc_id"] = batch["doc_id"].astype("int64")
        batch["srs_key"] = (
            np.round(batch["stopword_ratio"].to_numpy() * 1e6).astype(np.int64)
        )
        return batch

    keyed = scored.map_batches(key, batch_format="pandas")
    ranked = _add_global_ntile(
        keyed, "srs_key", "difficulty_decile", k=10, tie_col="doc_id"
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("doc_id", "n_words", "difficulty_decile"):
            batch[c] = batch[c].astype("int64")
        return batch[["doc_id", "n_words", "stopword_ratio", "difficulty_decile"]]

    return ranked.map_batches(finalize, batch_format="pandas")


CURRICULUM_SQL = r"""
WITH w AS (
  SELECT doc_id, text,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_words,
         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
             x -> x IN ('the','and','of','a','to','in','is','that','for','it'))) AS n_stop
  FROM documents
), q AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         CASE WHEN n_words = 0 THEN 0.0
              ELSE ROUND(CAST(n_stop AS DOUBLE) / n_words, 6) END AS stopword_ratio
  FROM w
)
SELECT doc_id, n_words, stopword_ratio,
       CAST(ntile(10) OVER (ORDER BY stopword_ratio, doc_id) AS BIGINT)
           AS difficulty_decile
FROM q
"""
