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
import pyarrow.compute as pc
from .pool import auto_pool


def read_embeddings(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=columns)


def _stack(batch_col, dim: int = 0) -> np.ndarray:
    """(B, dim) float64 matrix from an embedding column.

    ``dim`` is the row width used for a ZERO-ROW batch — Arrow cannot
    tell the list width of an empty list column, and np.stack([])
    raises, so scorers that know their width (query / centroid /
    plane matrix) pass it to keep downstream matmuls shape-correct
    when an empty block reaches them (round-5 review finding).

    Arrow input (ChunkedArray / ListArray of float) takes the ZERO-COPY
    path: one flat buffer view + reshape, no per-row Python objects —
    use batch_format="pyarrow" in every embedding stage. The pandas
    row-loop fallback remains only for driver-side odds and ends."""
    if isinstance(batch_col, pa.ChunkedArray):
        batch_col = batch_col.combine_chunks()
    if len(batch_col) == 0:
        return np.zeros((0, dim), dtype=np.float64)
    if isinstance(batch_col, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        arr = batch_col
        if isinstance(arr, pa.FixedSizeListArray):
            dim = arr.type.list_size
            flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            return flat.reshape(len(arr), dim)
        offs = arr.offsets.to_numpy()
        widths = np.diff(offs)
        dim = int(widths[0]) if len(widths) else 0
        flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        if len(widths) and (widths == dim).all() and offs[0] == 0:
            return flat[: len(arr) * dim].reshape(len(arr), dim)
        return np.stack([flat[o:e] for o, e in zip(offs[:-1], offs[1:])])
    return np.stack([np.asarray(v, dtype=np.float64) for v in batch_col])


class CosineScorer:
    """Scores batches against a broadcast query matrix (ray.put once,
    fetched in __init__ — never re-shipped per batch)."""

    def __init__(self, query_ref):
        import ray

        q = ray.get(query_ref)  # (nq, dim) float64
        qn = np.linalg.norm(q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0  # zero-vector query scores 0 everywhere, not NaN
        self.q = q / qn

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack(batch["embedding"], dim=self.q.shape[1])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.q.T  # (batch, nq)
        n = batch.num_rows
        return pa.table(
            {
                "vec_id": np.repeat(batch["vec_id"].to_numpy(), self.q.shape[0]),
                "query_id": np.tile(np.arange(self.q.shape[0]), n),
                "cos_sim": np.round(sims.ravel(), 6),
            }
        )


def ann_topk(sf_dir: str, k: int = 10):
    """Top-k cosine neighbors of the min-vec_id embedding (deterministic
    query). Per-batch scoring is a matmul; the query row comes from a
    Min aggregate + expression filter (no full sort), and the global
    top-k sorts only per-block pre-top-k survivors (k rows per block,
    not the full score table)."""
    import ray
    from ray.data.aggregate import Min

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    min_id = ds.aggregate(Min("vec_id"))["min(vec_id)"]
    qrow = ds.filter(expr=f"vec_id == {int(min_id)}").take(1)
    q = np.asarray(qrow[0]["embedding"], dtype=np.float64)[None, :]
    qref = ray.put(q)
    scored = ds.map_batches(
        CosineScorer, fn_constructor_kwargs={"query_ref": qref},
        batch_format="pyarrow", concurrency=auto_pool(),
    ).drop_columns(["query_id"])

    def pre_topk(b: pa.Table) -> pa.Table:
        from .events import _pre_topk_take

        return _pre_topk_take(b, [("cos_sim", True), ("vec_id", False)], k)

    survivors = scored.map_batches(pre_topk, batch_format="pyarrow")
    return survivors.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)


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
    from .events import merge_partials

    ds = read_embeddings(sf_dir, columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        # vectorized per-label vector sums: zero-copy matrix, one sort,
        # row-wise reduceat (no per-label or per-pos Python loops)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "val_sum": pa.array([], pa.float64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        m = _stack(batch["embedding"])
        labels = batch["label"].to_numpy()
        order = np.argsort(labels, kind="stable")
        sl = labels[order]
        starts = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
        ul = sl[starts]
        sums = np.add.reduceat(m[order], starts, axis=0)
        n = np.diff(np.r_[starts, len(sl)])
        dim = m.shape[1]
        return pa.table(
            {
                "label": np.repeat(ul.astype(np.int64), dim),
                "pos": np.tile(np.arange(1, dim + 1, dtype=np.int64), len(ul)),
                "val_sum": sums.ravel(),
                "n": np.repeat(n.astype(np.int64), dim),
            }
        )

    # (label x pos) is bounded: fan-in tree merge, no all-to-all
    agg = merge_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "pos"],
        {"val_sum": "sum", "n": "sum"},
    )
    agg["mean_val"] = (agg["val_sum"] / agg["n"]).round(6)
    agg["pos"] = agg["pos"].astype("int64")
    return agg[["label", "pos", "mean_val"]]


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

    def zn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "zval": pa.array([], pa.float64()),
                }
            )
        m = _stack(batch["embedding"])  # (n, dim) zero-copy
        mu = m.mean(axis=1, keepdims=True)
        sd = m.std(axis=1, keepdims=True)
        z = np.where(sd > 0, (m - mu) / np.where(sd > 0, sd, 1.0), m - mu)
        n, dim = m.shape
        return pa.table(
            {
                "vec_id": np.repeat(batch["vec_id"].to_numpy().astype(np.int64), dim),
                "pos": np.tile(np.arange(1, dim + 1, dtype=np.int64), n),
                "zval": np.round(z, 6).ravel(),
            }
        )

    return ds.map_batches(zn, batch_format="pyarrow")


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


def _kmeans_centroids(sample: np.ndarray, nlist: int, iters: int = 8, seed: int = 5) -> np.ndarray:
    """Small driver-side spherical k-means for IVF coarse quantization
    (deterministic; the sample is bounded, not the corpus)."""
    rng = np.random.default_rng(seed)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0  # zero embeddings must not poison centroids
    sample = sample / norms
    nlist = min(nlist, len(sample))  # choice(replace=False) needs n >= nlist
    cent = sample[rng.choice(len(sample), size=nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(nlist):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


class IvfScorer:
    """IVF probe stage: assigns each vector to its nearest coarse
    centroid, keeps only vectors in the query's nprobe nearest lists,
    scores those against the query — per-batch matmuls, centroids +
    query broadcast once per actor."""

    def __init__(self, state_ref, k: int):
        import ray

        cent, q, probe_lists = ray.get(state_ref)
        self.cent = cent
        qn = float(np.linalg.norm(q))
        self.q = q / (qn if qn else 1.0)  # zero-vector query: 0s, not NaN
        self.probe = probe_lists
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack(batch["embedding"], dim=self.cent.shape[1])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        assign = np.argmax(mn @ self.cent.T, axis=1)
        keep = np.isin(assign, self.probe)
        if not keep.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "cos_sim": pa.array([], pa.float64())}
            )
        sims = np.round(mn[keep] @ self.q, 6)
        ids = batch["vec_id"].to_numpy().astype(np.int64)[keep]
        # per-block pre-top-k: only k survivors per batch reach the sort
        order = np.lexsort((ids, -sims))[: self.k]
        return pa.table({"vec_id": ids[order], "cos_sim": sims[order]})


def ivf_topk(sf_dir: str, k: int = 10, nlist: int = 16, nprobe: int = 4,
             train_size: int = 2048):
    """Approximate top-k cosine neighbors via IVF coarse quantization —
    the scale path next to the exact ``ann_topk`` baseline. Centroids
    train on a bounded streamed sample (driver-side numpy k-means);
    the corpus pass is one map_batches that probes nprobe/nlist of the
    space. Recall vs the exact baseline is asserted in tests."""
    import ray
    from ray.data.aggregate import Min

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    sample_df = ds.limit(train_size).to_pandas()  # bounded sample, not the corpus
    sample = _stack(sample_df["embedding"])
    cent = _kmeans_centroids(sample, nlist)

    min_id = ds.aggregate(Min("vec_id"))["min(vec_id)"]
    qrow = ds.filter(expr=f"vec_id == {int(min_id)}").take(1)
    q = np.asarray(qrow[0]["embedding"], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe_lists = np.argsort(-(cent @ qn))[:nprobe].astype(np.int64)
    state_ref = ray.put((cent, q, probe_lists))

    scored = ds.map_batches(
        IvfScorer, fn_constructor_kwargs={"state_ref": state_ref, "k": k},
        batch_format="pyarrow", concurrency=auto_pool(),
    )
    return scored.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(k)


class LshBander:
    """Banded random-hyperplane LSH: ``bands`` independent
    ``bits_per_band``-bit bucket signatures per vector (a pair is a
    candidate if ANY band's buckets match — union recall, like MinHash
    banding), plus a ``refine_bits``-bit refinement signature used only
    to sub-split oversized buckets (see score_group). One matmul per
    batch computes every bit."""

    def __init__(self, dim: int, bands: int = 4, bits_per_band: int = 4, seed: int = 99):
        rng = np.random.default_rng(seed)
        # first band's planes == the legacy nbits=4 signature layout
        self.planes = rng.normal(size=(dim, bands * bits_per_band))
        self.bands = bands
        self.bpb = bits_per_band

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack(batch["embedding"], dim=self.planes.shape[0])
        n = len(m)
        bits = ((m @ self.planes) > 0).reshape(n, self.bands, self.bpb)
        sig = (bits * (1 << np.arange(self.bpb))).sum(axis=2).astype(np.int64)
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        emb = batch["embedding"].combine_chunks()
        rep = emb.take(pa.array(np.tile(np.arange(n, dtype=np.int64), self.bands)))
        return pa.table(
            {
                "band": np.repeat(np.arange(self.bands, dtype=np.int64), n),
                "bucket": sig.T.reshape(-1),
                "vec_id": np.tile(ids, self.bands),
                "embedding": rep,
            }
        )


_REFINE_SEED = 101
_REFINE_PLANES = 32


def _score_group_fn(threshold: float, cap: int, leaf_sizes=None):
    """In-bucket exact cosine with a HARD bucket-size cap: groups larger
    than ``cap`` are recursively median-split on deterministic random
    projections (median split halves the group exactly, so every
    scored leaf is <= cap no matter how degenerate the cluster — a
    pure hyperplane-bit refinement cannot split a tight cluster, whose
    members all share direction). The all-pairs matmul is therefore
    O(cap^2) per leaf regardless of key skew. Pairs straddling a split
    are dropped — the deterministic, documented recall trade that
    keeps a single dominant cluster from exploding into O((n/16)^2)
    work (round-2 review, stages/ann.py:278). Deterministic: the
    projection planes are seed-fixed and the median is computed on the
    full group, which map_groups always sees whole."""
    empty = pd.DataFrame(
        {
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "cos_sim": pd.Series(dtype="float64"),
        }
    )
    plane_cache: dict = {}

    def score_group(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return empty
        order = np.argsort(g["vec_id"].to_numpy().astype(np.int64), kind="stable")
        ids = g["vec_id"].to_numpy().astype(np.int64)[order]
        m = _stack(g["embedding"].to_numpy()[order])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        dim = m.shape[1]
        planes = plane_cache.get(dim)
        if planes is None:
            planes = np.random.default_rng(_REFINE_SEED).normal(size=(dim, _REFINE_PLANES))
            plane_cache[dim] = planes
        frames = []

        def emit(idx: np.ndarray):
            if leaf_sizes is not None:
                leaf_sizes.append(len(idx))
            sims = np.round(m[idx] @ m[idx].T, 6)
            ia, ib = np.triu_indices(len(idx), k=1)
            keep = sims[ia, ib] >= threshold
            if keep.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_a": ids[idx[ia[keep]]],
                            "vec_b": ids[idx[ib[keep]]],
                            "cos_sim": sims[ia, ib][keep],
                        }
                    )
                )

        def rec(idx: np.ndarray, level: int):
            if len(idx) <= cap:
                if len(idx) >= 2:
                    emit(idx)
                return
            proj = m[idx] @ planes[:, level % _REFINE_PLANES]
            med = np.median(proj)
            left = proj <= med
            if left.all() or not left.any():
                # all projections equal (exact duplicates): positional
                # halves on the id-sorted order keep the bound hard
                half = len(idx) // 2
                rec(idx[:half], level + 1)
                rec(idx[half:], level + 1)
                return
            rec(idx[left], level + 1)
            rec(idx[~left], level + 1)

        rec(np.arange(len(ids)), 0)
        if not frames:
            return empty
        return pd.concat(frames, ignore_index=True)

    return score_group


def embedding_near_dup_pairs(
    sf_dir: str,
    threshold: float = 0.35,
    bands: int = 4,
    bits_per_band: int = 4,
    cap: int = 512,
):
    """Banded-LSH near-duplicate mining: per-band bucket groupby ->
    capped in-bucket exact cosine -> distinct pairs above threshold.

    Scale shape: the groupby shuffles (band, bucket) keyed rows (the
    embedding travels with its row — no driver materialization, no
    broadcast of the corpus); per-group work is bounded by the
    sub-split cap even under a single dominant cluster; candidates are
    the union over ``bands`` independent signatures (higher recall than
    one wide signature) and de-duplicated by a vectorized aggregate."""
    from ray.data.aggregate import Max

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    first = ds.limit(1).take(1)
    dim = len(np.asarray(first[0]["embedding"]))

    banded = ds.map_batches(
        LshBander,
        fn_constructor_kwargs={"dim": dim, "bands": bands, "bits_per_band": bits_per_band},
        batch_format="pyarrow", concurrency=auto_pool(),
    )
    pairs = banded.groupby(["band", "bucket"]).map_groups(
        _score_group_fn(threshold, cap), batch_format="pandas"
    )
    # the same pair can surface from several bands: distinct via a
    # vectorized aggregate (cos_sim identical on every copy)
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(Max("cos_sim", alias_name="cos_sim"))


def _cov_partial(batch: pa.Table) -> pd.DataFrame:
    """Block combiner for covariance: one packed (n, sum, X^T X) row.

    The Gram matrix accumulates per block in one BLAS matmul; only
    dim + dim^2 floats leave each block regardless of row count."""
    col = batch.column("embedding").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    if n == 0:
        return pd.DataFrame({"n": pd.Series(dtype="int64"), "s": pd.Series(dtype=object), "g": pd.Series(dtype=object)})
    m = flat.reshape(n, -1)
    return pd.DataFrame(
        {
            "n": [n],
            "s": [m.sum(axis=0).tobytes()],
            "g": [(m.T @ m).tobytes()],
        }
    )


def _cov_merge(batch: pa.Table) -> pa.Table:
    if not len(batch):
        return pa.table(
            {"n": pa.array([], type=pa.int64()), "s": pa.array([], type=pa.binary()), "g": pa.array([], type=pa.binary())}
        )
    s = np.sum([np.frombuffer(b, np.float64) for b in batch["s"].to_pylist()], axis=0)
    g = np.sum([np.frombuffer(b, np.float64) for b in batch["g"].to_pylist()], axis=0)
    n = int(pc.sum(batch["n"]).as_py())
    return pa.table({"n": [n], "s": [s.tobytes()], "g": [g.tobytes()]})


def _cov_reduce(sf_dir: str):
    """(n, mean, population covariance) of the embedding corpus via
    packed partials + keyless fan-in tree rounds (bounded driver rows)."""
    from . import rollup_scan as _rs

    ds = read_embeddings(sf_dir, columns=["embedding"])
    parts = ds.map_batches(_cov_partial, batch_format="pyarrow").materialize()
    nb = parts.count()
    while nb > max(1, _rs._MERGE_THRESHOLD_ROWS):
        parts = parts.map_batches(
            _cov_merge, batch_size=_rs._MERGE_FANIN, batch_format="pyarrow"
        ).materialize()
        nb = parts.count()
    final = _cov_merge(pa.Table.from_pandas(parts.to_pandas(), preserve_index=False))
    r = final.to_pylist()[0]
    n = int(r["n"])
    s = np.frombuffer(r["s"], np.float64)
    dim = len(s)
    g = np.frombuffer(r["g"], np.float64).reshape(dim, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return n, mean, cov


def embedding_covariance(sf_dir: str) -> pd.DataFrame:
    """Population covariance matrix of the embedding columns, long
    format (i, j, cov) — the input to PCA whitening / drift monitoring.

    100-TB shape: the reduction state is dim + dim^2 floats per block
    (Gram-matrix partials, merged associatively in fan-in rounds); the
    corpus itself never aggregates beyond one matmul per block. Values
    round to 6 dp on both sides of the gate (same contract as
    label_centroids — float sum order across engines differs in the
    last ulps)."""
    _, _, cov = _cov_reduce(sf_dir)
    dim = cov.shape[0]
    ii, jj = np.meshgrid(np.arange(1, dim + 1), np.arange(1, dim + 1), indexing="ij")
    return pd.DataFrame(
        {
            "i": ii.ravel().astype(np.int64),
            "j": jj.ravel().astype(np.int64),
            "cov": np.round(cov.ravel(), 6),
        }
    )


EMB_COVARIANCE_SQL = """
WITH flat AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS val
  FROM embeddings
)
SELECT CAST(a.pos AS BIGINT) AS i,
       CAST(b.pos AS BIGINT) AS j,
       ROUND(covar_pop(a.val, b.val), 6) AS cov
FROM flat a JOIN flat b ON a.vec_id = b.vec_id
GROUP BY a.pos, b.pos
"""


def pca_top_components(sf_dir: str, k: int = 4) -> pd.DataFrame:
    """Top-k principal components (long format: component, pos, loading,
    explained variance) from the distributed covariance reduction.

    The eigendecomposition runs on the driver over the dim x dim
    covariance — dim is model-bounded (64..4096), never data-bounded,
    so this is the textbook split: O(N·dim²) distributed, O(dim³)
    local. Sign convention: largest-|loading| entry positive, ties to
    the earlier position (deterministic across BLAS builds)."""
    _, _, cov = _cov_reduce(sf_dir)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    rows = []
    for rank, idx in enumerate(order, start=1):
        vec = v[:, idx]
        j = np.argmax(np.abs(np.round(vec, 12)))  # round: tie-stability
        if vec[j] < 0:
            vec = -vec
        for pos in range(len(vec)):
            rows.append((rank, pos + 1, round(float(vec[pos]), 6), round(float(w[idx]), 6)))
    return pd.DataFrame(rows, columns=["component", "pos", "loading", "variance"])


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the memory-compression scale path
# ---------------------------------------------------------------------------


def _pq_train(sample: np.ndarray, m_sub: int = 32, codebook_k: int = 64,
              iters: int = 10, seed: int = 17):
    """Per-subspace L2 Lloyd k-means codebooks over a bounded,
    L2-normalized training sample (deterministic seed). Returns the
    subspace boundary offsets and the list of (k, d_sub) codebooks."""
    rng = np.random.default_rng(seed)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    sample = sample / norms
    d = sample.shape[1]
    bounds = [(j * d) // m_sub for j in range(m_sub + 1)]
    books = []
    for j in range(m_sub):
        X = sample[:, bounds[j] : bounds[j + 1]]
        k = min(codebook_k, len(X))
        C = X[rng.choice(len(X), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d2, axis=1)
            for c in range(k):
                mem = X[a == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books.append(C)
    return bounds, books


class PqScorer:
    """PQ encode + asymmetric-distance scan in one pass: each vector is
    quantized to ``m_sub`` uint8 codes (4 bytes vs a 3 KB float row —
    THE memory story for 100-TB embedding search) and its approximate
    distance to the query is the sum of the per-subspace lookup-table
    entries. Codebooks and the query's tables are broadcast once per
    actor. Encoding uses the direct ``((x - C)^2).sum`` form, the same
    float expression as the golden's independent recompute, so argmin
    tie-breaks are bit-reproducible (a matmul expansion rounds
    differently and can flip exact ties)."""

    def __init__(self, model_ref):
        import ray

        self.bounds, self.books, self.tables = ray.get(model_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _stack(batch["embedding"], dim=int(self.bounds[-1]))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        dist = np.zeros(len(m), dtype=np.float64)
        for j, C in enumerate(self.books):
            X = m[:, self.bounds[j] : self.bounds[j + 1]]
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            codes = np.argmin(d2, axis=1)
            dist += self.tables[j][codes]
        return pa.table(
            {
                "vec_id": batch["vec_id"].to_numpy().astype(np.int64),
                "approx_dist": np.round(dist, 6),
            }
        )


def pq_topk(sf_dir: str, k: int = 10, m_sub: int = 32, codebook_k: int = 64,
            train_size: int = 2048):
    """Approximate top-k neighbors by PQ asymmetric distance (ascending
    squared-L2 on normalized vectors == descending cosine). Codebooks
    train on a bounded sample; the corpus pass is one map_batches with
    per-block pre-top-k; the global sort sees only k rows per block."""
    import ray
    from ray.data.aggregate import Min

    ds = read_embeddings(sf_dir, columns=["vec_id", "embedding"])
    sample = np.stack(
        [np.asarray(e, dtype=np.float64) for e in ds.limit(train_size).to_pandas()["embedding"]]
    )
    bounds, books = _pq_train(sample, m_sub=m_sub, codebook_k=codebook_k)
    min_id = ds.aggregate(Min("vec_id"))["min(vec_id)"]
    q = np.asarray(
        ds.filter(expr=f"vec_id == {int(min_id)}").take(1)[0]["embedding"], dtype=np.float64
    )
    qn = np.linalg.norm(q)
    q = q / (qn if qn else 1.0)
    tables = [
        ((q[bounds[j] : bounds[j + 1]][None, :] - C) ** 2).sum(-1)
        for j, C in enumerate(books)
    ]
    model_ref = ray.put((bounds, books, tables))
    scored = ds.map_batches(
        PqScorer, fn_constructor_args=(model_ref,),
        batch_format="pyarrow", concurrency=auto_pool(),
    )

    def pre_topk(b: pa.Table) -> pa.Table:
        from .events import _pre_topk_take

        return _pre_topk_take(b, [("approx_dist", False), ("vec_id", False)], k)

    survivors = scored.map_batches(pre_topk, batch_format="pyarrow")
    return survivors.sort(["approx_dist", "vec_id"]).limit(k)
