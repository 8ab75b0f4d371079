"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k (numpy matmul per batch against a broadcast
query matrix) as the exact baseline, an LSH-bucketed near-duplicate
variant as the scale path, plus per-label centroids and z-normalization
(the preprocessing.znormal analogue on vectors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def read_embeddings(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


def _stack(batch_col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in batch_col])


class CosineScorer:
    """Scores batches against a broadcast query matrix (ray.put once,
    fetched in __init__ — never re-shipped per batch)."""

    def __init__(self, query_ref):
        import ray

        q = ray.get(query_ref)  # (nq, dim) float64
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _stack(batch["embedding"])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.q.T  # (batch, nq)
        out = pd.DataFrame(
            {
                "vec_id": np.repeat(batch["vec_id"].to_numpy(), self.q.shape[0]),
                "query_id": np.tile(np.arange(self.q.shape[0]), len(batch)),
                "cos_sim": np.round(sims.ravel(), 6),
            }
        )
        return out


def ann_topk(sf_dir: str, k: int = 10):
    """Top-k cosine neighbors of the min-vec_id embedding (deterministic
    query). Per-batch scoring is a matmul; global top-k via sort+limit
    on the rounded score (ties broken by vec_id, matching the oracle)."""
    import ray

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    qrow = ds.sort("vec_id").limit(1).to_pandas()
    q = np.asarray(list(qrow["embedding"])[0], dtype=np.float64)[None, :]
    qref = ray.put(q)
    scored = ds.map_batches(
        CosineScorer, fn_constructor_kwargs={"query_ref": qref},
        batch_format="pandas", concurrency=2,
    ).drop_columns(["query_id"])
    return scored.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)


ANN_TOPK_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
)
SELECT e.vec_id,
       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
FROM embeddings e, q
ORDER BY cos_sim DESC, e.vec_id LIMIT 10
"""


def label_centroids(sf_dir: str):
    """Per-label mean vector in long format (label, pos, mean_val) —
    partial sums per batch, tiny groupby of partials (combiner pattern)."""
    from ray.data.aggregate import Sum

    ds = read_embeddings(sf_dir, columns=["label", "embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for label, g in batch.groupby("label"):
            m = _stack(g["embedding"])
            sums = m.sum(axis=0)
            for pos in range(m.shape[1]):
                out.append((int(label), pos + 1, sums[pos], len(g)))
        return pd.DataFrame(out, columns=["label", "pos", "val_sum", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["label", "pos"])
        .aggregate(Sum("val_sum", alias_name="val_sum"), Sum("n", alias_name="n"))
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["mean_val"] = (batch["val_sum"] / batch["n"]).round(6)
        batch["pos"] = batch["pos"].astype("int64")
        return batch[["label", "pos", "mean_val"]]

    return agg.map_batches(finish, batch_format="pandas")


LABEL_CENTROIDS_SQL = """
SELECT label,
       CAST(pos AS BIGINT) AS pos,
       ROUND(avg(val), 6) AS mean_val
FROM (
  SELECT label,
         unnest(CAST(embedding AS DOUBLE[])) AS val,
         unnest(generate_series(1, len(embedding))) AS pos
  FROM embeddings
)
GROUP BY label, pos
"""


def znormal_embeddings(sf_dir: str):
    """Per-vector z-normalization, long format — the rollup engine's
    znormal preprocessing applied to vector rows (population std, as the
    reference preprocessing.znormal uses np.std)."""
    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])

    def zn(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for vec_id, e in zip(batch["vec_id"], batch["embedding"]):
            v = np.asarray(e, dtype=np.float64)
            mu = v.mean()
            sd = v.std()
            z = (v - mu) / sd if sd > 0 else v - mu
            for pos in range(len(v)):
                out.append((int(vec_id), pos + 1, round(z[pos], 6)))
        return pd.DataFrame(out, columns=["vec_id", "pos", "zval"])

    return ds.map_batches(zn, batch_format="pandas")


ZNORMAL_SQL = """
WITH flat AS (
  SELECT vec_id,
         unnest(CAST(embedding AS DOUBLE[])) AS val,
         unnest(generate_series(1, len(embedding))) AS pos
  FROM embeddings
), stats AS (
  SELECT vec_id, avg(val) AS mu,
         sqrt(avg(val * val) - avg(val) * avg(val)) AS sd
  FROM flat GROUP BY vec_id
)
SELECT f.vec_id, CAST(f.pos AS BIGINT) AS pos,
       ROUND(CASE WHEN s.sd > 0 THEN (f.val - s.mu) / s.sd ELSE f.val - s.mu END, 6) AS zval
FROM flat f JOIN stats s USING (vec_id)
"""


class LshBucketer:
    """Random-hyperplane LSH: nbits-bit signature per vector; vectors
    sharing a bucket are near-duplicate candidates."""

    def __init__(self, dim: int, nbits: int = 16, seed: int = 99):
        rng = np.random.default_rng(seed)
        self.planes = rng.normal(size=(dim, nbits))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = _stack(batch["embedding"])
        bits = (m @ self.planes) > 0
        sig = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)
        out = batch[["vec_id"]].copy()
        out["bucket"] = sig
        return out


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.35, nbits: int = 4):
    """LSH-bucketed near-duplicate mining: bucket groupby -> in-bucket
    exact cosine -> pairs above threshold. The bucket groupby keeps the
    candidate set linear-ish instead of the full n^2 cross join."""
    import ray

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    first = ds.limit(1).to_pandas()
    dim = len(np.asarray(list(first["embedding"])[0]))
    emb_df = ds.to_pandas()
    lookup = {
        int(v): np.asarray(e, dtype=np.float64)
        for v, e in zip(emb_df["vec_id"], emb_df["embedding"])
    }
    lookup_ref = ray.put(lookup)

    buckets = ds.map_batches(
        LshBucketer, fn_constructor_kwargs={"dim": dim, "nbits": nbits},
        batch_format="pandas", concurrency=2,
    )

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # lookup comes from the object store (zero-copy local fetch)
        table = ray.get(lookup_ref)
        ids = sorted(int(v) for v in g["vec_id"])
        rows = []
        if len(ids) > 1:
            m = np.stack([table[i] for i in ids])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ m.T
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    s = round(float(sims[i, j]), 6)
                    if s >= threshold:
                        rows.append((ids[i], ids[j], s))
        return pd.DataFrame(rows, columns=["vec_a", "vec_b", "cos_sim"])

    return buckets.groupby("bucket").map_groups(score_bucket, batch_format="pandas")
