"""Near-duplicate detection suite over the ``documents`` table.

MinHash+LSH, SimHash, and n-gram Jaccard verification — the standard
large-scale training-data dedup stack, expressed Ray-Data-first:

  shingle+minhash per batch (vectorized, one pass)
    -> explode to (band_id, band_hash, doc_id) rows
    -> groupby band bucket -> candidate pairs
    -> verify exact n-gram Jaccard per pair
    -> survivors = pairs above threshold

Deterministic (fixed hash seeds); SQL oracles are provided for the
pair-verification outputs where expressible, the sketch stages are
rows-only checks.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pandas as pd

_MERSENNE = (1 << 61) - 1


def _shingles(text: str, k: int = 5) -> set:
    t = re.sub(r"\s+", " ", text.lower()).strip()
    if len(t) < k:
        return {t} if t else set()
    return {t[i : i + k] for i in range(len(t) - k + 1)}


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    sh = _shingles(text, k)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    out = np.empty(len(sh), dtype=np.uint64)
    for i, s in enumerate(sh):
        out[i] = int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
    return out


class MinHasher:
    """num_perm universal-hash minhash signatures; state (the a/b
    coefficient vectors) built once per actor."""

    def __init__(self, num_perm: int = 64, seed: int = 1234, k: int = 5):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k).astype(object)  # python ints: 61-bit mul
        vals = (h[:, None] * self.a.astype(object) + self.b.astype(object)) % _MERSENNE
        return vals.min(axis=0).astype(np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch["text"]]
        out = batch[["doc_id"]].copy()
        out["minhash"] = [s.astype(np.int64) for s in sigs]
        return out


def minhash_signatures(sf_dir: str, num_perm: int = 64):
    from .text import read_documents

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(
        MinHasher, fn_constructor_kwargs={"num_perm": num_perm},
        batch_format="pandas", concurrency=2,
    )


def minhash_lsh_candidates(sf_dir: str, num_perm: int = 64, bands: int = 16):
    """LSH banding: explode signatures to (band, band_hash) keys, group,
    emit candidate pairs per bucket (i < j)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(sf_dir, num_perm)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for doc_id, sig in zip(batch["doc_id"], batch["minhash"]):
            sig = np.asarray(sig)
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                recs.append((int(doc_id), b, bh))
        return pd.DataFrame(recs, columns=["doc_id", "band", "band_hash"])

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(int(d) for d in g["doc_id"]))
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(out, columns=["doc_a", "doc_b"])

    cand = exploded.groupby(["band", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # dedupe candidate pairs produced by multiple bands
    return cand.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


class JaccardVerifier:
    """Exact k-shingle Jaccard for candidate pairs; texts fetched from a
    broadcast doc_id -> text lookup (small side via ray.put)."""

    def __init__(self, docs_ref, k: int = 5):
        import ray

        self.docs = ray.get(docs_ref)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sims = []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sa = _shingles(self.docs[int(a)], self.k)
            sb = _shingles(self.docs[int(b)], self.k)
            inter = len(sa & sb)
            union = len(sa | sb)
            sims.append(round(inter / union, 6) if union else 0.0)
        batch["jaccard"] = sims
        return batch


def minhash_dedup_pairs(sf_dir: str, threshold: float = 0.6):
    """Full MinHash-LSH dedup: candidates -> exact Jaccard -> threshold."""
    import ray

    from .text import read_documents

    docs_df = read_documents(sf_dir, columns=["doc_id", "text"]).to_pandas()
    docs_ref = ray.put(dict(zip(docs_df["doc_id"].astype(int), docs_df["text"])))
    cand = minhash_lsh_candidates(sf_dir)
    verified = cand.map_batches(
        JaccardVerifier, fn_constructor_kwargs={"docs_ref": docs_ref},
        batch_format="pandas", concurrency=2,
    )
    return verified.filter(lambda r: r["jaccard"] >= threshold)


class SimHasher:
    """64-bit SimHash over word unigrams (hash-weighted majority)."""

    def __init__(self):
        self.word = re.compile(r"\w+")

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in self.word.findall(text.lower()):
            h = np.uint64(
                int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
            )
            bits = (h >> shifts) & np.uint64(1)
            acc += np.where(bits == 1, 1, -1)
        v = 0
        for i in range(64):
            if acc[i] > 0:
                v |= 1 << i
        return v

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[["doc_id"]].copy()
        vals = []
        for t in batch["text"]:
            v = self.simhash(t)
            vals.append(v - (1 << 64) if v >= (1 << 63) else v)  # int64 wrap
        out["simhash"] = pd.array(vals, dtype="int64")
        return out


def simhash_signatures(sf_dir: str):
    from .text import read_documents

    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pandas", concurrency=2)


def ngram_jaccard_pairs(sf_dir: str, sample_ids: List[int] | None = None, k: int = 5):
    """Exact all-pairs n-gram Jaccard over a bounded id sample (the
    brute-force oracle for the LSH path)."""
    import ray
    import ray.data as rd

    from .text import read_documents

    docs_df = read_documents(sf_dir, columns=["doc_id", "text"]).to_pandas()
    if sample_ids is None:
        sample_ids = sorted(docs_df["doc_id"].astype(int))[:100]
    docs_ref = ray.put(
        dict(zip(docs_df["doc_id"].astype(int), docs_df["text"]))
    )
    ids = sorted(sample_ids)
    pair_rows = [{"doc_a": a, "doc_b": b} for i, a in enumerate(ids) for b in ids[i + 1 :]]
    pairs = rd.from_items(pair_rows)
    return pairs.map_batches(
        JaccardVerifier, fn_constructor_kwargs={"docs_ref": docs_ref, "k": k},
        batch_format="pandas", concurrency=2,
    )
