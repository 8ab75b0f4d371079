"""Near-duplicate detection suite over the ``documents`` table.

MinHash+LSH, SimHash, and n-gram Jaccard verification — the standard
large-scale training-data dedup stack, expressed Ray-Data-first:

  shingle-hash per batch (vectorized rolling hash, one pass)
    -> minhash signatures (uint64 multiply-shift, no Python bignums)
    -> explode to (band, band_hash, doc_id) rows
    -> count-aggregate hot buckets (vectorized; no per-singleton
       Python group calls) -> candidate pairs from hot buckets only
    -> exact shingle-set Jaccard per pair via a co-partitioned
       groupby join on stored sketches (the corpus is NEVER
       materialized on the driver and no stage holds all texts)
    -> survivors = pairs above threshold

Deterministic (fixed hash seeds). Shingle identity is the 64-bit
rolling hash of the k-byte window of the normalized text; Jaccard is
computed on the hashed shingle *sets*, which equals string-set Jaccard
up to 64-bit collisions (~n^2/2^64, negligible).

Batch format note: these stages run ``batch_format="pandas"``
deliberately — normalization (str.lower + unicode-whitespace split)
needs Python strings regardless, so a pyarrow batch would pay the same
materialization one line later. The per-doc cost is instead amortized
BATCH-FLAT: one Horner fold over the concatenated normalized buffers
per batch and one reduceat minhash fold per permutation
(_batch_shingle_hashes / MinHasher.sigs_from_sets), so no hot path
loops per document. An Arrow-kernel normalize (utf8_lower +
replace_substring_regex) was considered and rejected: re2's ASCII
``\\s`` and utf8_lower diverge from Python str semantics on exotic
unicode, which would silently fork the stage path from the public
shingle_hash_array semantics.

Scale notes (100 TB):
  - signatures / sketches are map-only streams;
  - the LSH groupby shuffles only (doc_id, band, band_hash) rows;
  - hot buckets + candidate pairs are collision-sized (<< corpus) —
    the only driver-held state is the hot-bucket key set;
  - verification joins shingle sketches to pairs by doc id via
    union+groupby (each sketch travels once, keyed) — no broadcast
    of texts, no full-table reads.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
from .pool import auto_pool

_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for the rolling hash


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _normalize(text: str) -> bytes:
    # collapse whitespace, lowercase — same canonical form on every path
    return " ".join(text.lower().split()).encode("utf-8")


def shingle_hash_array(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique uint64 hashes of the k-byte shingles of the
    normalized text (vectorized: sliding windows + Horner over k
    columns + splitmix finalizer; no per-shingle Python)."""
    t = _normalize(text)
    if not t:
        return np.zeros(0, dtype=np.uint64)
    b = np.frombuffer(t, dtype=np.uint8)
    if len(b) < k:
        w = b[None, :]
    else:
        w = np.lib.stride_tricks.sliding_window_view(b, k)
    h = np.zeros(len(w), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(w.shape[1]):
            h = h * _B + w[:, j].astype(np.uint64)
    return np.unique(_splitmix(h))


def _batch_shingle_hashes(texts, k: int):
    """Sorted unique shingle-hash sets for a WHOLE batch in one pass:
    normalized byte buffers are concatenated and the k-byte Horner fold
    runs over the single flat array (k vector ops per batch instead of
    k per doc), windows straddling doc boundaries are sliced away by
    offset arithmetic. Bit-identical to shingle_hash_array per doc
    (asserted in tests/test_stages.py); docs shorter than k keep the
    scalar path (whole-buffer hash, rare)."""
    bufs = [_normalize(t) for t in texts]
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    offs = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.frombuffer(b"".join(bufs), dtype=np.uint8) if offs[-1] else np.zeros(0, np.uint8)
    n_win = max(0, len(flat) - k + 1)
    h = np.zeros(n_win, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = h * _B + flat[j : n_win + j].astype(np.uint64)
        h = _splitmix(h)
    out = []
    for d in range(len(bufs)):
        ln = int(lens[d])
        if ln == 0:
            out.append(np.zeros(0, dtype=np.uint64))
        elif ln < k:
            out.append(shingle_hash_array(texts[d], k))
        else:
            s = int(offs[d])
            out.append(np.unique(h[s : s + ln - k + 1]))
    return out


class ShingleSketcher:
    """(doc_id, shingles) sketch rows; shingles stored as int64 views of
    the sorted uint64 hash sets (Arrow has no uint64 list comfort)."""

    def __init__(self, k: int = 5):
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        out["shingles"] = [
            s.view(np.int64) for s in _batch_shingle_hashes(list(batch["text"]), self.k)
        ]
        return out


def document_sketches(sf_dir: str, k: int = 5):
    from .text import read_documents

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        ShingleSketcher, fn_constructor_kwargs={"k": k},
        batch_format="pandas", concurrency=auto_pool(),
    )


class MinHasher:
    """num_perm multiply-shift minhash signatures over shingle hashes —
    pure uint64 vector math (a_i odd, wraparound multiply), coefficient
    vectors built once per actor."""

    def __init__(self, num_perm: int = 64, seed: int = 1234, k: int = 5):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        h = shingle_hash_array(text, self.k)
        if not len(h):
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = h[:, None] * self.a[None, :] + self.b[None, :]
        return vals.min(axis=0)

    def signatures_batch(self, texts) -> np.ndarray:
        """(n_docs, num_perm) signatures for a whole batch (see
        sigs_from_sets; sets come from the batch-flat hash pass)."""
        return self.sigs_from_sets(_batch_shingle_hashes(texts, self.k))

    def sigs_from_sets(self, sets) -> np.ndarray:
        """(n_docs, num_perm) signatures from precomputed shingle-hash
        sets: each permutation is ONE vector multiply-add over the
        concatenated sets with a minimum.reduceat fold per doc — no
        per-doc Python matrix. Bit-identical to signature() per doc
        (wraparound uint64 math is associative and order-free under
        min)."""
        lens = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
        out = np.zeros((len(sets), self.num_perm), dtype=np.uint64)
        nonempty = lens > 0
        if not nonempty.any():
            return out
        cat = np.concatenate([s for s in sets if len(s)])
        starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(lens[nonempty][:-1], out=starts[1:])
        with np.errstate(over="ignore"):
            for i in range(self.num_perm):
                v = cat * self.a[i] + self.b[i]
                out[nonempty, i] = np.minimum.reduceat(v, starts)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        sigs = self.signatures_batch(list(batch["text"]))
        out["minhash"] = [s.view(np.int64) for s in sigs]
        return out


def minhash_signatures(sf_dir: str, num_perm: int = 64):
    from .text import read_documents

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        MinHasher, fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pandas", concurrency=auto_pool(),
    )


class SketchSigner(MinHasher):
    """One corpus pass emitting BOTH the shingle sketch and the minhash
    signature per doc (the shingle sets are the expensive part; the
    dedup pipeline needs both, and two separate stages would read and
    normalize the corpus twice).

    Scale note: a SketchSigner output holds ~8 bytes per normalized
    text byte (one uint64 per shingle per doc), so it must only ever be
    CONSUMED STREAMING — materializing it pins more than the corpus
    size in the object store. minhash_dedup_pairs therefore materializes
    only the (doc_id, minhash) signatures and recomputes sketches for
    the collision-sized candidate set in a second filtered pass
    (CandidateSketcher)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sets = _batch_shingle_hashes(list(batch["text"]), self.k)
        sigs = self.sigs_from_sets(sets)
        out = batch[["doc_id"]].copy()
        out["shingles"] = [s.view(np.int64) for s in sets]
        out["minhash"] = [s.view(np.int64) for s in sigs]
        return out


class CandidateSketcher:
    """Shingle sketches for CANDIDATE docs only: the broadcast id filter
    runs BEFORE shingling, so the verification pass streams the corpus
    but pays normalization/hashing (and emits sketch bytes) only for
    the collision-sized candidate set — the 100-TB-safe alternative to
    materializing every doc's sketch."""

    def __init__(self, ids_ref, k: int = 5):
        import ray

        self.ids = ray.get(ids_ref)  # sorted int64 candidate doc ids
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mask = np.isin(batch["doc_id"].to_numpy(np.int64), self.ids)
        sub = batch[mask]
        sets = _batch_shingle_hashes(list(sub["text"]), self.k)
        out = sub[["doc_id"]].copy()
        out["shingles"] = [s.view(np.int64) for s in sets]
        return out


def _explode_bands(bands: int, rows_per_band: int):
    """Signature rows -> (doc_id, band, band_hash) rows, vectorized:
    fold each band's slice with the same Horner+finalize used for
    shingles (one uint64 matrix pass per batch)."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "band": pd.Series(dtype="int64"),
                "band_hash": pd.Series(dtype="int64"),
            }
        )
        if not len(batch):
            return empty
        sigs = np.stack([np.asarray(s, dtype=np.int64) for s in batch["minhash"]])
        # Drop the all-zero sentinel signature (doc with an EMPTY shingle
        # set: normalized text shorter than k bytes). Shingle-set Jaccard
        # is undefined for empty sets, and at scale every such doc lands
        # in the SAME band_hash bucket — one synthetic hot bucket emitting
        # C(m, 2) candidate pairs that verification can never score above
        # the threshold (round-5 review finding). Byte-identical empty /
        # tiny docs are exact-dedup's job (text.dedup_exact_documents).
        nonzero = sigs.any(axis=1)
        if not nonzero.all():
            batch = batch[nonzero]
            sigs = sigs[nonzero]
            if not len(batch):
                return empty
        sigs = sigs.view(np.uint64).reshape(len(batch), bands, rows_per_band)
        h = np.zeros((len(batch), bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(rows_per_band):
                h = h * _B + sigs[:, :, j]
        h = _splitmix(h)
        doc = np.repeat(batch["doc_id"].to_numpy().astype(np.int64), bands)
        band = np.tile(np.arange(bands, dtype=np.int64), len(batch))
        return pd.DataFrame(
            {"doc_id": doc, "band": band, "band_hash": h.reshape(-1).view(np.int64)}
        )

    return explode


def minhash_lsh_candidates(sf_dir: str, num_perm: int = 64, bands: int = 16, sigs=None):
    """LSH banding: explode signatures to (band, band_hash) keys, find
    buckets with >=2 docs via a vectorized count aggregate, emit
    candidate pairs only from those hot buckets (i < j), distinct.

    Singleton buckets (the overwhelming majority) never reach a
    per-group Python call: the count aggregate is the vectorized
    shuffle, the hot-bucket key set is collision-sized and broadcast.

    sigs: optional precomputed signature dataset (doc_id, minhash
    [, extra columns]) — minhash_dedup_pairs passes its materialized
    signature-only pass so the signatures aren't recomputed here."""
    import ray
    from ray.data.aggregate import Count

    rows_per_band = num_perm // bands
    if sigs is None:
        sigs = minhash_signatures(sf_dir, num_perm)
    # materialized: consumed twice (bucket counts, then the hot filter);
    # without this the signature pass would re-run. (band, hash, id)
    # rows are ~24 B/doc/band — object-store-resident and spillable,
    # far smaller than the corpus at any scale.
    exploded = sigs.map_batches(
        _explode_bands(bands, rows_per_band), batch_format="pandas"
    ).materialize()

    counts = exploded.groupby(["band", "band_hash"]).aggregate(Count(alias_name="n"))
    hot = counts.filter(expr="n >= 2").select_columns(["band", "band_hash"]).to_pandas()
    hot_ref = ray.put(hot.reset_index(drop=True))

    class HotFilter:
        """Keeps rows whose (band, band_hash) bucket is hot — a
        vectorized 2-column hash merge against the broadcast hot-key
        frame (the per-row Python set lookup flagged in round 2 cost
        ~1 us/row; merge is ~20 ns/row)."""

        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = batch.merge(self.hot, on=["band", "band_hash"], how="inner")
            return m

    survivors = exploded.map_batches(HotFilter, batch_format="pandas", concurrency=auto_pool())

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy().astype(np.int64))
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": pd.Series(dtype="int64"), "doc_b": pd.Series(dtype="int64")}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    cand = survivors.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs produced by multiple bands — vectorized aggregate,
    # not a per-pair map_groups
    from ray.data.aggregate import Count as _C

    return (
        cand.groupby(["doc_a", "doc_b"])
        .aggregate(_C(alias_name="_n"))
        .drop_columns(["_n"])
    )


def verify_pairs_jaccard(pairs_ds, sketches_ds, cand_ids: set):
    """Exact shingle-set Jaccard per candidate pair with NO driver-held
    texts: sketches of candidate docs are joined to pair rows by doc id
    via union + groupby (each sketch travels once, keyed), then the two
    sides meet in a per-pair group.

    cand_ids bounds the sketch stream to candidate docs (collision-
    sized); the filter itself is a streaming map over the sketch
    dataset."""
    import ray
    import ray.data as rd

    ids_ref = ray.put(np.asarray(sorted(cand_ids), dtype=np.int64))

    class IdFilter:
        """Vectorized membership against the broadcast sorted candidate
        id array (np.isin w/ sorted unique side = searchsorted)."""

        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            mask = np.isin(
                batch["doc_id"].to_numpy(np.int64), self.ids, assume_unique=False
            )
            return batch[mask]

    sk = sketches_ds.map_batches(IdFilter, batch_format="pandas", concurrency=auto_pool())

    # side rows: each pair contributes (key=doc_a, pair payload) and
    # (key=doc_b, ...); each sketch contributes (key=doc_id, shingles)
    NB = np.int64(64)  # bounded group count for both shuffles below

    def pair_sides(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["doc_a"].to_numpy().astype(np.int64)
        b = batch["doc_b"].to_numpy().astype(np.int64)
        key = np.concatenate([a, b])
        return pd.DataFrame(
            {
                "key": key,
                "key_bucket": key % NB,
                "doc_a": np.concatenate([a, a]),
                "doc_b": np.concatenate([b, b]),
                "side": np.concatenate(
                    [np.zeros(len(a), np.int64), np.ones(len(b), np.int64)]
                ),
                "shingles": [np.zeros(0, dtype=np.int64)] * (2 * len(a)),
            }
        )

    def sketch_side(batch: pd.DataFrame) -> pd.DataFrame:
        key = batch["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "key": key,
                "key_bucket": key % NB,
                "doc_a": np.int64(-1),
                "doc_b": np.int64(-1),
                "side": np.int64(-1),
                "shingles": list(batch["shingles"]),
            }
        )

    unioned = pairs_ds.map_batches(pair_sides, batch_format="pandas").union(
        sk.map_batches(sketch_side, batch_format="pandas")
    )

    # the co-partition key is a HASH BUCKET of the doc id, not the doc
    # id itself: the group count is bounded (64) instead of growing
    # with the candidate set, and the per-bucket attach is one
    # vectorized pandas merge (doc-id map_groups paid ~4.5 ms of Ray
    # machinery per candidate doc)
    def attach_bucket(g: pd.DataFrame) -> pd.DataFrame:
        is_sketch = g["side"].to_numpy() == -1
        sk_rows = g[is_sketch][["key", "shingles"]].rename(columns={"shingles": "_sh"})
        p = g[~is_sketch].drop(columns=["shingles"])
        m = p.merge(sk_rows, on="key", how="inner")
        out = pd.DataFrame(
            {
                "doc_a": m["doc_a"].astype("int64"),
                "doc_b": m["doc_b"].astype("int64"),
                "side": m["side"].astype("int64"),
                "shingles": m["_sh"],
            }
        )
        out["pair_bucket"] = (
            out["doc_a"].to_numpy(np.int64) * np.int64(1000003)
            + out["doc_b"].to_numpy(np.int64)
        ) % NB
        return out

    sided = unioned.groupby("key_bucket").map_groups(attach_bucket, batch_format="pandas")

    # same bucketing trick for the per-pair scoring: pairs co-locate by
    # a hash of (doc_a, doc_b), the bucket sorts once and walks its
    # pairs with numpy set ops (two rows per pair: side 0 carries
    # doc_a's shingles, side 1 doc_b's)
    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_a", "doc_b", "side"], kind="mergesort")
        a = g["doc_a"].to_numpy(np.int64)
        b = g["doc_b"].to_numpy(np.int64)
        sh = g["shingles"].to_numpy()
        out_a, out_b, out_j = [], [], []
        i, n = 0, len(g)
        while i < n:
            if i + 1 < n and a[i + 1] == a[i] and b[i + 1] == b[i]:
                sa = np.asarray(sh[i], dtype=np.int64)
                sb = np.asarray(sh[i + 1], dtype=np.int64)
                inter = np.intersect1d(sa, sb, assume_unique=True).size
                union = sa.size + sb.size - inter
                out_a.append(int(a[i]))
                out_b.append(int(b[i]))
                # union == 0 means BOTH shingle sets are empty, i.e. two
                # byte-identical (post-normalization) tiny docs: jaccard
                # of two equal sets is 1, not 0 (round-5 review finding;
                # banding no longer emits such pairs, but verify_pairs is
                # a public entry point fed by arbitrary pair datasets).
                out_j.append(round(inter / union, 6) if union else 1.0)
                i += 2
            else:
                i += 1  # sketch missing for one side: pair unverifiable
        return pd.DataFrame(
            {
                "doc_a": pd.array(out_a, dtype="int64"),
                "doc_b": pd.array(out_b, dtype="int64"),
                "jaccard": pd.array(out_j, dtype="float64"),
            }
        )

    return sided.groupby("pair_bucket").map_groups(score_bucket, batch_format="pandas")


def minhash_dedup_pairs(sf_dir: str, threshold: float = 0.6):
    """Full MinHash-LSH dedup: candidates -> exact shingle Jaccard ->
    threshold. No stage materializes the corpus; the only driver-side
    state is the (collision-sized) candidate pair list."""
    import ray
    import ray.data as rd

    from .text import read_documents

    # pass 1 (streaming -> bounded materialize): ONLY the (doc_id,
    # minhash) signatures pin in the object store — num_perm uint64s
    # per doc, a small constant per doc. Materializing the shingle
    # sketches here instead would pin ~8 bytes per normalized text
    # byte, i.e. MORE than the corpus (round-5 review finding).
    sigs = (
        read_documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(MinHasher, batch_format="pandas", concurrency=auto_pool())
        .materialize()
    )
    cand = minhash_lsh_candidates(sf_dir, sigs=sigs)
    cand_df = cand.to_pandas()  # collision-sized, not corpus-sized
    if not len(cand_df):
        # keep the return type a Dataset on both branches
        return rd.from_pandas(cand_df.assign(jaccard=pd.Series(dtype="float64")))
    cand_ids = set(cand_df["doc_a"].astype(int)) | set(cand_df["doc_b"].astype(int))
    pairs_ds = rd.from_pandas(cand_df)
    # pass 2 (streaming): recompute sketches with the candidate filter
    # BEFORE shingling — sketch bytes exist only for candidate docs
    ids_ref = ray.put(np.asarray(sorted(cand_ids), dtype=np.int64))
    sketches = read_documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        CandidateSketcher,
        fn_constructor_kwargs={"ids_ref": ids_ref},
        batch_format="pandas",
        concurrency=auto_pool(),
    )
    verified = verify_pairs_jaccard(pairs_ds, sketches, cand_ids)
    return verified.filter(expr=f"jaccard >= {threshold}")


class SimHasher:
    """64-bit SimHash over word unigrams (hash-weighted majority).

    Vectorized: the batch's words are factorized, each UNIQUE word is
    hashed once (with a per-actor cache across batches — Zipf vocab
    means high hit rates), sign-bit rows are gathered and folded per
    document with one reduceat."""

    # Cache inserts stop at this size: the Zipf head (which carries the
    # hit rate) is cached long before the cap, while the unbounded tail
    # of ids / numbers / typos would otherwise grow actor RSS for the
    # life of the pool (round-5 review finding). 2^20 entries ~ 80 MB.
    CACHE_CAP = 1 << 20

    def __init__(self):
        import re

        self.word = re.compile(r"\w+")
        self.cache: dict = {}
        self.shifts = np.arange(64, dtype=np.uint64)

    def _word_hash(self, w: str) -> int:
        h = self.cache.get(w)
        if h is None:
            import hashlib

            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            if len(self.cache) < self.CACHE_CAP:
                self.cache[w] = h
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        words_per_doc = [self.word.findall(t.lower()) for t in batch["text"]]
        lens = np.array([len(w) for w in words_per_doc], dtype=np.int64)
        all_words = [w for ws in words_per_doc for w in ws]
        vals = np.zeros(len(batch), dtype=np.int64)
        if all_words:
            codes, uniques = pd.factorize(np.asarray(all_words, dtype=object))
            uh = np.array([self._word_hash(w) for w in uniques], dtype=np.uint64)
            signs = (
                ((uh[:, None] >> self.shifts[None, :]) & np.uint64(1)).astype(np.int8)
                * 2
                - 1
            ).astype(np.int32)
            per_word = signs[codes]  # (n_words, 64)
            offs = np.zeros(len(batch) + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            acc = np.zeros((len(batch), 64), dtype=np.int64)
            nz = lens > 0
            if nz.any():
                acc[nz] = np.add.reduceat(per_word, offs[:-1][nz], axis=0)[: nz.sum()]
                # reduceat over only-nonempty starts: consecutive starts
                # delimit exactly one doc's words (empty docs add none)
            bits = (acc > 0).astype(np.uint64)
            v = (bits << self.shifts[None, :]).sum(axis=1, dtype=np.uint64)
            vals = v.view(np.int64)
        out = batch[["doc_id"]].copy()
        out["simhash"] = vals
        return out


def simhash_signatures(sf_dir: str):
    from .text import read_documents

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=auto_pool())


def ngram_jaccard_pairs(sf_dir: str, sample_ids: List[int] | None = None, k: int = 5):
    """Exact all-pairs n-gram Jaccard over a bounded id sample (the
    brute-force oracle for the LSH path); same sketch-join verification
    machinery — the corpus never lands on the driver."""
    import ray.data as rd

    if sample_ids is None:
        from .text import read_documents

        ids_ds = read_documents(sf_dir, columns=["doc_id"])
        # bounded: smallest 100 ids via per-block pre-top-k then global
        lows = ids_ds.map_batches(
            lambda b: b.nsmallest(100, "doc_id"), batch_format="pandas"
        ).to_pandas()
        sample_ids = sorted(lows["doc_id"].astype(int).nsmallest(100))
    ids = sorted(int(i) for i in sample_ids)
    ia, ib = np.triu_indices(len(ids), k=1)
    arr = np.asarray(ids, dtype=np.int64)
    pairs = rd.from_pandas(pd.DataFrame({"doc_a": arr[ia], "doc_b": arr[ib]}))
    return verify_pairs_jaccard(pairs, document_sketches(sf_dir, k), set(ids))


def _uf_find(parent: dict, x: int) -> int:
    root = x
    while parent[root] != root:
        root = parent[root]
    while parent[x] != root:  # path compression
        parent[x], x = root, parent[x]
    return root


def _uf_edges_to_forest(a_vals, b_vals) -> pd.DataFrame:
    """Union-find over an edge list -> ONE packed spanning-forest row
    (node ids + component roots, roots canonicalized to the min node)."""
    parent: dict = {}
    for a, b in zip(a_vals, b_vals):
        a, b = int(a), int(b)
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = _uf_find(parent, a), _uf_find(parent, b)
        if ra != rb:
            # union by min keeps the root the component minimum
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    nodes = np.array(sorted(parent), dtype=np.int64)
    roots = np.array([_uf_find(parent, int(n)) for n in nodes], dtype=np.int64)
    return pd.DataFrame({"nodes": [nodes.tobytes()], "roots": [roots.tobytes()]})


def _empty_forest() -> pd.DataFrame:
    return pd.DataFrame({"nodes": pd.Series(dtype=object), "roots": pd.Series(dtype=object)})


def _forest_partial(batch: pd.DataFrame) -> pd.DataFrame:
    if not len(batch):
        return _empty_forest()
    return _uf_edges_to_forest(batch["doc_a"].to_numpy(), batch["doc_b"].to_numpy())


def _forest_merge(batch: pd.DataFrame) -> pd.DataFrame:
    """Associative merge: a forest's (node, root) pairs ARE edges, so
    merging = union-find over the concatenated forests. Forest size is
    bounded by distinct nodes, never by input edge count."""
    if not len(batch):
        return _empty_forest()
    a = np.concatenate([np.frombuffer(b, np.int64) for b in batch["nodes"]])
    b = np.concatenate([np.frombuffer(r, np.int64) for r in batch["roots"]])
    return _uf_edges_to_forest(a, b)


def dedup_clusters(sf_dir: str, threshold: float = 0.6) -> pd.DataFrame:
    """Connected components over the verified near-dup pairs: each doc
    in >=1 pair gets cluster_id = min doc_id of its component (the
    canonical survivor for near-dup collapse).

    100-TB shape: single pass, no iteration — each block's edges
    collapse to a spanning forest (<= distinct-nodes rows of state),
    forests merge associatively in fan-in tree rounds, and the driver
    folds only the bounded remainder. The pair list itself is
    collision-sized (LSH output), not corpus-sized.
    """
    from . import rollup_scan as _rs

    pairs = minhash_dedup_pairs(sf_dir, threshold).select_columns(["doc_a", "doc_b"])
    parts = pairs.map_batches(_forest_partial, batch_format="pandas").materialize()
    nb = parts.count()
    while nb > max(1, _rs._MERGE_THRESHOLD_ROWS):
        parts = parts.map_batches(
            _forest_merge, batch_size=_rs._MERGE_FANIN, batch_format="pandas"
        ).materialize()
        nb = parts.count()
    final = _forest_merge(parts.to_pandas())
    if not len(final):
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "cluster_id": pd.Series(dtype="int64")}
        )
    r = final.iloc[0]
    return pd.DataFrame(
        {
            "doc_id": np.frombuffer(r["nodes"], np.int64),
            "cluster_id": np.frombuffer(r["roots"], np.int64),
        }
    )


def dedup_clusters_sql(pairs_parquet: str) -> str:
    """Recursive-CTE oracle over a verified pairs table (the gate feeds
    it the independently-verified minhash_dedup_pairs golden)."""
    return f"""
WITH RECURSIVE
edges AS (
  SELECT CAST(doc_a AS BIGINT) AS a, CAST(doc_b AS BIGINT) AS b
  FROM read_parquet('{pairs_parquet}')
  UNION
  SELECT CAST(doc_b AS BIGINT), CAST(doc_a AS BIGINT)
  FROM read_parquet('{pairs_parquet}')
),
cc(doc, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.doc
)
SELECT doc AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM cc GROUP BY doc
"""


def dedup_apply(sf_dir: str, threshold: float = 0.6):
    """Near-dup collapse applied to the corpus: keep every document
    that is not a non-survivor cluster member (survivor = the min
    doc_id of its component, dedup_clusters semantics).

    100-TB shape: the drop set is collision-sized (only docs that
    appear in a verified near-dup pair and are not their component's
    min), so it broadcasts; the corpus streams through a map-only
    ``np.isin`` filter — no join, no shuffle, and the output keeps the
    input's partitioning for downstream stages."""
    import ray

    from .text import read_documents

    clusters = dedup_clusters(sf_dir, threshold)
    drop = clusters.loc[
        clusters["doc_id"] != clusters["cluster_id"], "doc_id"
    ].to_numpy(np.int64)
    drop.sort()
    drop_ref = ray.put(drop)

    class SurvivorFilter:
        def __init__(self):
            self.drop = ray.get(drop_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["doc_id"].to_numpy(np.int64)
            keep = ~np.isin(ids, self.drop, assume_unique=False)
            out = batch.loc[keep, ["doc_id", "source", "n_chars"]].copy()
            out["doc_id"] = out["doc_id"].astype("int64")
            out["n_chars"] = out["n_chars"].astype("int64")
            return out

    ds = read_documents(sf_dir, columns=["doc_id", "source", "n_chars"])
    from .pool import auto_pool

    return ds.map_batches(
        SurvivorFilter, batch_format="pandas", concurrency=auto_pool()
    )


def dedup_apply_sql(pairs_parquet: str) -> str:
    """Survivor corpus oracle: documents minus non-min cluster members
    (recursive-CTE components over the verified pairs golden)."""
    return f"""
WITH RECURSIVE
edges AS (
  SELECT CAST(doc_a AS BIGINT) AS a, CAST(doc_b AS BIGINT) AS b
  FROM read_parquet('{pairs_parquet}')
  UNION
  SELECT CAST(doc_b AS BIGINT), CAST(doc_a AS BIGINT)
  FROM read_parquet('{pairs_parquet}')
),
cc(doc, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, cc.lbl FROM cc JOIN edges e ON e.a = cc.doc
),
clusters AS (
  SELECT doc AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY doc
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source,
       CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
WHERE c.doc_id IS NULL OR c.doc_id = c.cluster_id
"""
