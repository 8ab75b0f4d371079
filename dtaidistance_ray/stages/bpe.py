"""Byte-pair-encoding vocabulary learning + distributed encode over the
``documents`` table.

The tokens-axis op a training-data pipeline needs next to token
counting (text.py) and vocabulary analytics (vocab.py): LEARN a BPE
merge table from the corpus, then ENCODE every document with it.

Scale design (the part that must hold at 100 TB):

- The corpus-sized work is ONE map-only pass that reduces the corpus
  to a word-frequency table: per-batch ``Counter`` partials over the
  pre-tokenized words, folded with the size-aware ``merge_partials``
  fan-in tree (events.py:50). Only ``(word, count)`` rows ever move —
  never document text. The word table is Heaps-law bounded (vocabulary
  grows ~O(sqrt(corpus))), and the ``max_driver_rows`` guard makes a
  corpus that violates the assumption fail loudly instead of OOMing
  the driver.
- Merge learning runs on the word-frequency table on the driver —
  this is how production BPE trainers work at any scale (they train
  on word counts, not on the raw corpus), so the iterative part is
  vocab-bounded, not corpus-bounded.
- Encoding is an actor-pool ``map_batches`` stage: the learned merge
  ranks are ``ray.put`` ONCE and fetched per actor in ``__init__``
  (broadcast, not re-shipped per batch), and per-word encodings are
  memoized per actor — under a Zipfian word distribution the memo hit
  rate makes encode ~O(distinct words), not O(tokens).

Algorithm references (public): Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units" (ACL 2016) —
the classic learn loop (count adjacent symbol pairs weighted by word
frequency, merge the most frequent, repeat); the rank-greedy encoder
is the standard GPT-2-style "apply the lowest-rank applicable merge
until none applies". Tie-breaks are defined here as
(count DESC, pair ASC) so the merge table is fully deterministic.

No reference-repo counterpart (dtaidistance has no text ops); this is
a north-rule LLM-pipeline component like text.py / vocab.py.
"""

from __future__ import annotations

import re
import zlib
from collections import Counter

import pandas as pd
import pyarrow as pa

from .pool import auto_pool

# Same pre-tokenizer convention as text.TokenCounter ("bpeish") —
# enforced by sharing the pattern constant, not a comment.
from .text import BPEISH_PATTERN as _BPEISH_PATTERN

_WORD_RE = re.compile(_BPEISH_PATTERN)

# End-of-word sentinel appended to a word's final symbol (Sennrich
# convention) so merges never cross word boundaries and the encoder
# can reconstruct word boundaries from the token stream.
_EOW = "</w>"


def _word_count_partial(batch: pa.Table) -> pd.DataFrame:
    c: Counter = Counter()
    for text in batch.column("text").to_pylist():
        c.update(_WORD_RE.findall(text))
    if not c:
        return pd.DataFrame({"word": pd.Series([], dtype=object), "count": pd.Series([], dtype="int64")})
    words, counts = zip(*c.items())
    return pd.DataFrame({"word": list(words), "count": pd.Series(counts, dtype="int64")})


def word_counts(ds, via: str = "tree", min_count: int = 1) -> pd.DataFrame:
    """Reduce a documents Dataset to a (word, count) frequency table.

    ``via="tree"`` (default): map-only partials + the merge_partials
    fan-in tree — fastest when the vocabulary fits on the driver, and
    it loud-fails above ``max_driver_rows`` instead of OOMing.

    ``via="shuffle"``: the unbounded-key scale path — Dataset hash
    groupby on the word (per-batch Counter partials still pre-combine,
    so only (word, count) rows shuffle, never text), with the
    ``min_count`` threshold applied DISTRIBUTEDLY before collection.
    This is the path for web-scale corpora whose raw vocabulary
    (typos, codes, rare strings) exceeds the driver bound: production
    BPE trainers threshold rare words anyway, and post-threshold
    vocabularies are Zipf-bounded to driver size.

    Returns a driver-side frame sorted by (count DESC, word ASC)."""
    parts = ds.map_batches(_word_count_partial, batch_format="pyarrow")
    if via == "shuffle":
        from ray.data.aggregate import Sum

        agg = parts.groupby("word").aggregate(Sum("count", alias_name="count"))
        if min_count > 1:
            import pyarrow.compute as pc

            agg = agg.map_batches(
                lambda t: t.filter(pc.greater_equal(t.column("count"), min_count)),
                batch_format="pyarrow",
            )
        wc = agg.to_pandas()
    else:
        from .events import merge_partials

        wc = merge_partials(parts, keys=["word"], spec={"count": "sum"})
        if min_count > 1:
            wc = wc[wc["count"] >= min_count]
    return wc.sort_values(["count", "word"], ascending=[False, True], kind="mergesort").reset_index(
        drop=True
    )


def _word_symbols(word: str) -> tuple[str, ...]:
    syms = list(word)
    syms[-1] = syms[-1] + _EOW
    return tuple(syms)


def learn_bpe(wc: pd.DataFrame, num_merges: int = 200, min_freq: int = 2) -> list[tuple[str, str]]:
    """Learn a deterministic BPE merge list from a word-count table.

    Classic Sennrich learn loop over the word-frequency dict. Each
    iteration recounts pair statistics from scratch — O(num_merges x
    distinct-words x word-length), which is fine because this runs on
    the vocab-bounded word table on the driver, never on the corpus.
    Tie-break: (count DESC, (left, right) ASC). Stops early when the
    best pair's frequency drops below ``min_freq``."""
    vocab: dict[tuple[str, ...], int] = {
        _word_symbols(w): int(c) for w, c in zip(wc["word"], wc["count"])
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        if freq < min_freq:
            break
        merges.append((left, right))
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    """Rank-greedy BPE encode of one word: repeatedly apply the
    lowest-rank applicable merge (GPT-2-style) until none applies."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


class BpeEncoder:
    """Actor-pool encode stage: merge ranks broadcast once per actor
    (``ray.put`` ref in ``fn_constructor_kwargs``), per-word encodings
    memoized per actor (Zipf => memo does most of the work)."""

    def __init__(self, merges_ref):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.memo: dict[str, tuple[str, ...]] = {}

    def _encode(self, word: str) -> tuple[str, ...]:
        toks = self.memo.get(word)
        if toks is None:
            toks = encode_word(word, self.ranks)
            self.memo[word] = toks
        return toks

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch.column("doc_id").to_pylist()
        out = {"doc_id": doc_ids, "n_words": [], "n_bpe_tokens": [], "n_single_char": [], "token_crc": []}
        for text in batch.column("text").to_pylist():
            words = _WORD_RE.findall(text)
            n_tok = 0
            n_single = 0
            crc = 0
            for w in words:
                toks = self._encode(w)
                n_tok += len(toks)
                for t in toks:
                    if len(t) == 1 or (len(t) == 1 + len(_EOW) and t.endswith(_EOW)):
                        n_single += 1
                    crc = zlib.crc32(t.encode(), crc)
            out["n_words"].append(len(words))
            out["n_bpe_tokens"].append(n_tok)
            out["n_single_char"].append(n_single)
            out["token_crc"].append(crc)
        df = pd.DataFrame(out)
        for c in ("doc_id", "n_words", "n_bpe_tokens", "n_single_char", "token_crc"):
            df[c] = df[c].astype("int64")
        return df


def bpe_train_merges(sf_dir: str, num_merges: int = 200, min_freq: int = 2) -> pd.DataFrame:
    """Learn BPE merges from the documents table; returns the merge
    table (rank, left, right, merged, freq-at-merge not included —
    rank order IS the artifact)."""
    from .text import read_documents

    ds = read_documents(sf_dir, columns=["text"])
    wc = word_counts(ds)
    merges = learn_bpe(wc, num_merges=num_merges, min_freq=min_freq)
    return pd.DataFrame(
        {
            "rank": pd.Series(range(len(merges)), dtype="int64"),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
            "merged": [m[0] + m[1] for m in merges],
        }
    )


def bpe_encode_documents(sf_dir: str, num_merges: int = 200, min_freq: int = 2):
    """Train on the corpus' word-count table, then encode every
    document with the learned merges (broadcast ranks, actor pool,
    per-word memo). Returns a per-doc Dataset: word count, BPE token
    count, single-character-token count (fallback indicator) and a
    CRC32 over the token stream (order-sensitive digest — any encoder
    divergence changes it)."""
    import ray

    from .text import read_documents

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    # the corpus-sized counting pass only needs the text column; the
    # doc_id+text dataset is for the encode stage below
    wc = word_counts(read_documents(sf_dir, columns=["text"]))
    merges = learn_bpe(wc, num_merges=num_merges, min_freq=min_freq)
    merges_ref = ray.put(merges)
    return ds.map_batches(
        BpeEncoder,
        batch_format="pyarrow",
        concurrency=auto_pool(),
        fn_constructor_kwargs={"merges_ref": merges_ref},
    )
