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


def _limit_docs_filter(batch: pd.DataFrame, limit_docs: int) -> pd.DataFrame:
    """Vectorized "first limit_docs docs by id" prefilter: parse ids once
    per batch (str.slice + astype) instead of a per-row Python int()
    over the whole corpus — at scale the discarded rows dominate these
    stages' cost, so the filter must be the cheap part."""
    ids = batch["doc_id"].str.slice(1).astype("int64").to_numpy()
    return batch[ids < limit_docs]


def tokens_derivative(spec, limit_docs: int = 200):
    """Keogh DDTW derivative per sequence, long format; deterministic
    doc subset (first limit_docs by doc_id)."""
    ds = _token_ds(spec)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _limit_docs_filter(batch, limit_docs)
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
            t = np.asarray(toks, dtype=np.float64)
            if len(t) == 0:
                continue  # SQL: no flat rows, no output
            if len(t) == 1:
                # SQL oracle convention: a single-point series has one
                # (pos=1, NULL) row; the derivative kernel needs >= 2
                # points (reference semantics) and would IndexError
                rows.append((doc_id, 1, np.nan))
                continue
            d = derivative(t)
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
        batch = _limit_docs_filter(batch, limit_docs)
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
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
        batch = _limit_docs_filter(batch, limit_docs)
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
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


def _lttb_indices(y: np.ndarray, m: int) -> np.ndarray:
    """Largest-Triangle-Three-Buckets downsample indices (Steinarsson
    2013), deterministic variant: middle buckets split 1..n-2 by
    integer floor division; argmax tie -> smallest index. All triangle
    areas are exact in float64 (integer token values x integer
    indices), so the selection is bit-deterministic and the SQL oracle
    reproduces it with the same expressions."""
    n = len(y)
    B = m - 2
    # bucket of middle index i (1..n-2) is ((i-1)*B) // (n-2); the
    # bucket-j range is therefore the ceil-boundary interval below
    # (the same definition the SQL oracle states directly)
    def _lo(j: int) -> int:
        return 1 + (j * (n - 2) + B - 1) // B

    sel = np.empty(m, dtype=np.int64)
    sel[0] = 0
    xa = 0
    for j in range(B):
        lo = _lo(j)
        hi = _lo(j + 1)
        if j < B - 1:
            nlo = _lo(j + 1)
            nhi = _lo(j + 2)
            nidx = np.arange(nlo, nhi, dtype=np.int64)
            ax = float(nidx.sum()) / len(nidx)
            ay = float(y[nlo:nhi].sum()) / (nhi - nlo)
        else:
            ax = float(n - 1)
            ay = float(y[n - 1])
        ya = float(y[xa])
        cidx = np.arange(lo, hi, dtype=np.int64)
        area = np.abs(
            (float(xa) - ax) * (y[lo:hi] - ya)
            - (float(xa) - cidx.astype(np.float64)) * (ya - ay)
        )
        xa = lo + int(np.argmax(area))  # first max -> smallest index
        sel[j + 1] = xa
    sel[m - 1] = n - 1
    return sel


def tokens_lttb(spec, m: int = 12, limit_docs: int = 150):
    """LTTB downsample per sequence, long format (doc_id, rank, idx,
    val); series with n <= m pass through unchanged. Map-only."""
    ds = _token_ds(spec)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _limit_docs_filter(batch, limit_docs)
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
            y = np.asarray(toks, dtype=np.float64)
            n = len(y)
            if n <= m:
                for i in range(n):
                    rows.append((doc_id, i, i, float(y[i])))
                continue
            sel = _lttb_indices(y, m)
            for r, i in enumerate(sel):
                rows.append((doc_id, r, int(i), float(y[i])))
        return pd.DataFrame(rows, columns=["doc_id", "rank", "idx", "val"])

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("rank", "idx"):
            batch[c] = batch[c].astype("int64")
        return batch

    return ds.map_batches(fn, batch_format="pandas").map_batches(fix, batch_format="pandas")


def tokens_lttb_sql(tok_path: str, m: int = 12, limit_docs: int = 150) -> str:
    B = m - 2
    area = (
        "abs((CAST(s.idx AS DOUBLE) - nx.ax) * (c.val - s.val)"
        " - (CAST(s.idx AS DOUBLE) - CAST(c.idx AS DOUBLE)) * (s.val - nx.ay))"
    )
    sub = (
        "(SELECT {pick} FROM cand c JOIN nxt nx"
        " ON nx.doc_id = s.doc_id AND nx.j = s.j + 1"
        " WHERE c.doc_id = s.doc_id AND c.b = s.j + 1"
        f" ORDER BY {area} DESC, c.idx LIMIT 1)"
    )
    return f"""
WITH RECURSIVE flat AS (
  SELECT doc_id,
         unnest(generate_series(0, len(tokens) - 1)) AS idx,
         unnest(CAST(tokens AS DOUBLE[])) AS val,
         len(tokens) AS n
  FROM read_parquet('{tok_path}')
  WHERE CAST(substr(doc_id, 2) AS BIGINT) < {limit_docs}
),
big AS (SELECT * FROM flat WHERE n > {m}),
small AS (
  SELECT doc_id, CAST(idx AS BIGINT) AS rank, CAST(idx AS BIGINT) AS idx, val
  FROM flat WHERE n <= {m}
),
cand AS (
  SELECT doc_id, idx, val, n, ((idx - 1) * {B}) // (n - 2) AS b
  FROM big WHERE idx >= 1 AND idx <= n - 2
),
nxt AS (
  SELECT doc_id, b - 1 AS j, avg(CAST(idx AS DOUBLE)) AS ax, avg(val) AS ay
  FROM cand WHERE b >= 1 GROUP BY doc_id, b
  UNION ALL
  SELECT doc_id, {B} - 1, CAST(n - 1 AS DOUBLE), val FROM big WHERE idx = n - 1
),
sel(doc_id, j, idx, val) AS (
  SELECT doc_id, -1, 0, val FROM big WHERE idx = 0
  UNION ALL
  SELECT s.doc_id, s.j + 1, {sub.format(pick="c.idx")}, {sub.format(pick="c.val")}
  FROM sel s WHERE s.j + 1 < {B}
)
SELECT doc_id, CAST(j + 1 AS BIGINT) AS rank, CAST(idx AS BIGINT) AS idx, val FROM sel
UNION ALL
SELECT doc_id, CAST({m} - 1 AS BIGINT), CAST(n - 1 AS BIGINT), val FROM big WHERE idx = n - 1
UNION ALL
SELECT * FROM small
"""


def tokens_sax(spec, n_seg: int = 8, limit_docs: int = 200):
    """SAX symbolization (Lin/Keogh et al. 2003): z-normalize each
    series by its own full-series moments, PAA to n_seg segments, then
    quantize against the standard-normal breakpoints for a 4-letter
    alphabet. Complements the PAA downsample and the reference-parity
    SymbolAlignment stage with the classic index-friendly symbol
    stream. Map-only; long format (doc_id, seg, zpaa, sym).

    Exactness: token sums are exact int64, so mu / msq are exact-ratio
    doubles; sd is one correctly-rounded IEEE sqrt; z is rounded at 6
    on BOTH engines and the letter is derived from the ROUNDED z
    against exact decimal breakpoints — so the quantization decision is
    bit-deterministic (same trick as the anomaly flags). Constant
    series (sd == 0) are skipped on both sides."""
    ds = _token_ds(spec)
    brk = (-0.67449, 0.0, 0.67449)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _limit_docs_filter(batch, limit_docs)
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
            t = np.asarray(toks, dtype=np.int64)
            n = len(t)
            if n == 0:
                continue
            mu = float(t.sum()) / n
            msq = float((t * t).sum()) / n
            var = msq - mu * mu
            if var <= 0:
                continue
            sd = np.sqrt(var)
            seg = (np.arange(n, dtype=np.int64) * n_seg) // n
            cnt = np.bincount(seg, minlength=n_seg)
            tot = np.zeros(n_seg, dtype=np.int64)
            np.add.at(tot, seg, t)
            for j in range(n_seg):
                if cnt[j]:
                    z = round((float(tot[j]) / cnt[j] - mu) / sd, 6)
                    sym = "abcd"[int(z >= brk[0]) + int(z >= brk[1]) + int(z >= brk[2])]
                    rows.append((doc_id, j, z, sym))
        return pd.DataFrame(rows, columns=["doc_id", "seg", "zpaa", "sym"])

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        batch["seg"] = batch["seg"].astype("int64")
        batch["zpaa"] = batch["zpaa"].astype("float64")
        return batch

    return ds.map_batches(fn, batch_format="pandas").map_batches(fix, batch_format="pandas")


def tokens_sax_sql(tok_path: str, n_seg: int = 8, limit_docs: int = 200) -> str:
    return f"""
WITH flat AS (
  SELECT doc_id,
         unnest(CAST(tokens AS BIGINT[])) AS val,
         unnest(generate_series(0, len(tokens) - 1)) AS idx,
         len(tokens) AS n
  FROM read_parquet('{tok_path}')
  WHERE CAST(substr(doc_id, 2) AS BIGINT) < {limit_docs} AND len(tokens) > 0
), stats AS (
  SELECT doc_id,
         CAST(sum(val) AS DOUBLE) / count(*) AS mu,
         CAST(sum(val * val) AS DOUBLE) / count(*) AS msq
  FROM flat GROUP BY doc_id
), paa AS (
  SELECT doc_id,
         CAST((idx * {n_seg}) // n AS BIGINT) AS seg,
         CAST(sum(val) AS DOUBLE) / count(*) AS paa
  FROM flat GROUP BY doc_id, (idx * {n_seg}) // n
), z AS (
  SELECT p.doc_id, p.seg,
         round((p.paa - s.mu) / sqrt(s.msq - s.mu * s.mu), 6) AS zpaa
  FROM paa p JOIN stats s USING (doc_id)
  WHERE s.msq - s.mu * s.mu > 0
)
SELECT doc_id, seg, zpaa,
       CASE WHEN zpaa < -0.67449 THEN 'a'
            WHEN zpaa < 0.0 THEN 'b'
            WHEN zpaa < 0.67449 THEN 'c'
            ELSE 'd' END AS sym
FROM z
"""


def tokens_matrix_profile(spec, m: int = 16, limit_docs: int = 40):
    """Self-join matrix profile (Yeh et al. 2016, brute-force exact):
    for every length-m window i of each series, the z-normalized
    Euclidean distance to its nearest non-trivial neighbor window j
    (exclusion zone |i - j| >= m) and that neighbor's index — the
    motif/discord primitive modern timeseries stacks build on and the
    reference library does not ship.

    Exactness: with integer tokens every window moment (Sx, Sxx, and
    the cross sum Sxy) is an exact int64, so both engines evaluate the
    SAME closed form on exact integers:
      corr = (m*Sxy - Sx*Sy) / (sqrt(m*Sxx - Sx^2) * sqrt(m*Syy - Sy^2))
      d    = sqrt(greatest(2m * (1 - corr), 0))
    in identical f64 operation order — distances are bit-equal to the
    SQL oracle, and the argmin tie-break (smallest j) is therefore
    bit-deterministic. Zero-variance windows are excluded on both
    sides.

    Scale shape: each series is one row, so the stage is map-only and
    embarrassingly parallel across docs; per doc the O(p^2) profile is
    one int64 Gram matmul over the window matrix (vectorized, no
    Python pair loop). Series longer than one block would chunk the
    window axis across tasks with the same exact-integer partials —
    documented here, not needed for row-shaped token tables."""
    ds = _token_ds(spec)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = _limit_docs_filter(batch, limit_docs)
        rows = []
        for doc_id, toks in zip(batch["doc_id"], batch["tokens"]):
            t = np.asarray(toks, dtype=np.int64)
            n = len(t)
            p = n - m + 1
            if p < m + 1:  # need at least one non-trivial neighbor
                continue
            # window matrix and exact integer moments
            W = np.lib.stride_tricks.sliding_window_view(t, m)  # p x m
            Sx = W.sum(axis=1)  # int64
            Sxx = (W * W).sum(axis=1)
            G = W @ W.T  # int64 Gram: Sxy for every pair
            varx = m * Sxx - Sx * Sx  # int64, exact
            ok = varx > 0
            # closed form in f64, fixed operation order (matches SQL)
            mf = float(m)
            sd = np.sqrt((mf * Sxx.astype(np.float64)) - Sx.astype(np.float64) ** 2)
            num = mf * G.astype(np.float64) - np.outer(
                Sx.astype(np.float64), Sx.astype(np.float64)
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                corr = num / np.outer(sd, sd)
            d2 = 2.0 * mf * (1.0 - corr)
            d = np.sqrt(np.maximum(d2, 0.0))
            # exclusion zone + invalid windows -> +inf
            idx = np.arange(p)
            excl = np.abs(idx[:, None] - idx[None, :]) < m
            d[excl] = np.inf
            d[~ok, :] = np.inf
            d[:, ~ok] = np.inf
            nn_j = np.argmin(d, axis=1)  # first min -> smallest j
            nn_d = d[idx, nn_j]
            for i in range(p):
                if ok[i] and np.isfinite(nn_d[i]):
                    rows.append((doc_id, i, int(nn_j[i]), float(nn_d[i])))
        return pd.DataFrame(rows, columns=["doc_id", "wpos", "nn_pos", "nn_dist"])

    def fix(batch: pd.DataFrame) -> pd.DataFrame:
        batch["wpos"] = batch["wpos"].astype("int64")
        batch["nn_pos"] = batch["nn_pos"].astype("int64")
        batch["nn_dist"] = batch["nn_dist"].astype("float64")
        return batch

    return ds.map_batches(fn, batch_format="pandas").map_batches(fix, batch_format="pandas")


def tokens_matrix_profile_sql(tok_path: str, m: int = 16, limit_docs: int = 40) -> str:
    return f"""
WITH flat AS (
  SELECT doc_id,
         unnest(CAST(tokens AS BIGINT[])) AS val,
         unnest(generate_series(0, len(tokens) - 1)) AS idx,
         len(tokens) AS n
  FROM read_parquet('{tok_path}')
  WHERE CAST(substr(doc_id, 2) AS BIGINT) < {limit_docs}
    AND len(tokens) >= {m} * 2
), wmom AS (
  -- per-window exact integer moments via a ROWS window frame
  SELECT doc_id, idx AS wpos,
         CAST(sum(val) OVER w AS BIGINT) AS sx,
         CAST(sum(val * val) OVER w AS BIGINT) AS sxx,
         CAST(count(*) OVER w AS BIGINT) AS cnt,
         n
  FROM flat
  WINDOW w AS (PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND {m} - 1 FOLLOWING)
), win AS (
  SELECT doc_id, wpos, sx, sxx
  FROM wmom
  WHERE cnt = {m} AND wpos <= n - {m}
    AND {m} * sxx - sx * sx > 0
), diag AS (
  -- every non-trivial aligned product x[i+k]*x[j+k]: one row per
  -- (position pair on a diagonal); |delta| >= m IS the exclusion zone
  SELECT a.doc_id, a.idx AS ai, a.idx - b.idx AS delta,
         a.val * b.val AS prod
  FROM flat a JOIN flat b
    ON a.doc_id = b.doc_id AND abs(a.idx - b.idx) >= {m}
), diagsum AS (
  -- Sxy(i, j=i-delta) is a length-m sliding sum along each diagonal
  -- (exact integer sums, order-free)
  SELECT doc_id, delta, ai AS i,
         CAST(sum(prod) OVER w AS BIGINT) AS sxy,
         CAST(count(*) OVER w AS BIGINT) AS cnt
  FROM diag
  WINDOW w AS (PARTITION BY doc_id, delta ORDER BY ai
               ROWS BETWEEN CURRENT ROW AND {m} - 1 FOLLOWING)
), pair AS (
  SELECT wa.doc_id, wa.wpos AS i, wb.wpos AS j,
         wa.sx AS sxi, wa.sxx AS sxxi, wb.sx AS sxj, wb.sxx AS sxxj,
         d.sxy
  FROM diagsum d
  JOIN win wa ON wa.doc_id = d.doc_id AND wa.wpos = d.i
  JOIN win wb ON wb.doc_id = d.doc_id AND wb.wpos = d.i - d.delta
  WHERE d.cnt = {m}
), dist AS (
  SELECT doc_id, i, j,
         sqrt(greatest(2.0 * {m}.0 * (1.0 -
           ({m}.0 * CAST(sxy AS DOUBLE)
            - CAST(sxi AS DOUBLE) * CAST(sxj AS DOUBLE))
           / (sqrt({m}.0 * CAST(sxxi AS DOUBLE)
                   - CAST(sxi AS DOUBLE) * CAST(sxi AS DOUBLE))
              * sqrt({m}.0 * CAST(sxxj AS DOUBLE)
                     - CAST(sxj AS DOUBLE) * CAST(sxj AS DOUBLE)))), 0.0)) AS d
  FROM pair
), ranked AS (
  SELECT doc_id, i, j, d,
         row_number() OVER (PARTITION BY doc_id, i ORDER BY d, j) AS rk
  FROM dist
)
SELECT doc_id, CAST(i AS BIGINT) AS wpos, CAST(j AS BIGINT) AS nn_pos, d AS nn_dist
FROM ranked WHERE rk = 1
"""


def tokens_positional_stats(spec):
    """Positional token statistics: mean token value by (source, position)
    across the whole corpus — the curriculum/format signal a training-data
    pipeline uses to spot position-dependent drift (e.g. headers, BOS
    artifacts).

    100-TB shape: the (source, pos) key space is bounded by
    num_sources x max_len regardless of row count, so the heavy work is a
    per-block partial reduction (one bincount over the flattened token
    buffer — zero-copy Arrow list offsets/values, no per-row loop) and the
    shuffle moves only key-space-sized partial rows into a tiny groupby
    sum. Sums are exact int64; the final mean is a single IEEE int/int
    division, bit-deterministic across engines.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    ds = _token_ds(spec)
    maxlen = int(spec.max_len)

    def partials(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tok = batch.column("tokens").combine_chunks()
        # flatten() (not .values) so zero-copy SLICES of a list column —
        # which keep the parent buffer but offset into it — yield exactly
        # this batch's values (same pattern as vocab._flat_tokens)
        lens = pc.list_value_length(tok).to_numpy(zero_copy_only=False).astype(np.int64)
        vals = tok.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        # source_%03d -> int code, vectorized
        src = batch.column("source").to_pandas().str.slice(7).astype(np.int64).to_numpy()
        flat_src = np.repeat(src, lens)
        ends = np.cumsum(lens)
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(ends - lens, lens)
        if len(src) == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "pos": pa.array([], type=pa.int64()),
                    "tok_sum": pa.array([], type=pa.int64()),
                    "n_cover": pa.array([], type=pa.int64()),
                }
            )
        key = flat_src * maxlen + pos
        size = (int(src.max()) + 1) * maxlen
        cnt = np.bincount(key, minlength=size)
        # per-block sums stay far below 2^53, so the float64 weighted
        # bincount is exact; cast back to int64 for the exact global sum
        ssum = np.bincount(key, weights=vals.astype(np.float64), minlength=size)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "source": pa.array([f"source_{k // maxlen:03d}" for k in nz]),
                "pos": pa.array(nz % maxlen + 1, type=pa.int64()),
                "tok_sum": pa.array(ssum[nz].astype(np.int64)),
                "n_cover": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["source", "pos"])
        .aggregate(Sum("tok_sum", alias_name="tok_sum"), Sum("n_cover", alias_name="n_cover"))
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        batch["tok_sum"] = batch["tok_sum"].astype("int64")
        batch["n_cover"] = batch["n_cover"].astype("int64")
        batch["mean_val"] = batch["tok_sum"] / batch["n_cover"]
        return batch

    return out.map_batches(finalize, batch_format="pandas")


def tokens_positional_stats_sql(tok_path: str) -> str:
    return f"""
WITH flat AS (
  SELECT source,
         unnest(generate_series(1, len(tokens))) AS pos,
         unnest(CAST(tokens AS BIGINT[])) AS val
  FROM read_parquet('{tok_path}')
)
SELECT source, CAST(pos AS BIGINT) AS pos,
       CAST(sum(val) AS BIGINT) AS tok_sum,
       CAST(count(*) AS BIGINT) AS n_cover,
       CAST(sum(val) AS DOUBLE) / count(*) AS mean_val
FROM flat
GROUP BY source, pos
"""


def tokens_rollup_length_p95(spec):
    """Percentile continuous aggregate: exact p95 sequence length per
    (source, hourly bucket). Percentiles don't merge as scalars, so the
    mergeable tier state is a bounded-domain HISTOGRAM of n_tok (the
    exact analog of the t-digest pattern: fixed-size, associative
    merge) — per block each (source, bucket) group collapses to one
    sparse (value, count) blob, blobs merge in keyed fan-in tree
    rounds, and only the bounded remainder (sources x hours groups)
    reaches the driver, where the percentile is an integer inverse-CDF
    rank over the histogram's cumulative counts (DuckDB quantile_disc
    semantics: value at 1-based rank ceil(p*n)).
    """
    import pyarrow as pa

    from ..sources.synth import token_table
    from ..stages.rollup import bucketize
    from .vocab import _tree_reduce_keyed

    ds = bucketize(token_table(spec), 3600, spec)

    def partials(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0:
            return pd.DataFrame({"gkey": pd.Series(dtype=object), "hist": pd.Series(dtype=object)})
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pylist(),
                "bucket": batch["bucket"].to_numpy(zero_copy_only=False),
                "n_tok": batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        rows = {"gkey": [], "hist": []}
        for (s, b), g in df.groupby(["source", "bucket"], sort=True):
            vals, cnts = np.unique(g["n_tok"].to_numpy(), return_counts=True)
            rows["gkey"].append(f"{s}|{b}")
            rows["hist"].append(
                np.concatenate([vals, cnts]).astype(np.int64).tobytes()
            )
        return pd.DataFrame(rows)

    def merge(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"gkey": pd.Series(dtype=object), "hist": pd.Series(dtype=object)})
        rows = {"gkey": [], "hist": []}
        for k, g in batch.groupby("gkey", sort=True):
            vs, cs = [], []
            for blob in g["hist"]:
                a = np.frombuffer(blob, np.int64)
                vs.append(a[: len(a) // 2])
                cs.append(a[len(a) // 2 :])
            vals = np.concatenate(vs)
            cnts = np.concatenate(cs)
            uv, inv = np.unique(vals, return_inverse=True)
            acc = np.zeros(len(uv), dtype=np.int64)
            np.add.at(acc, inv, cnts)
            rows["gkey"].append(k)
            rows["hist"].append(np.concatenate([uv, acc]).tobytes())
        return pd.DataFrame(rows)

    parts = ds.map_batches(partials, batch_format="pyarrow")
    packed = _tree_reduce_keyed(parts, merge, key="gkey")
    if not len(packed):
        return pd.DataFrame({"source": [], "bucket": [], "n_seq": [], "p95_len": []})
    out = {"source": [], "bucket": [], "n_seq": [], "p95_len": []}
    for k, blob in zip(packed["gkey"], packed["hist"]):
        s, b = k.rsplit("|", 1)
        a = np.frombuffer(blob, np.int64)
        vals, cnts = a[: len(a) // 2], a[len(a) // 2 :]
        n = int(cnts.sum())
        rank = int(np.ceil(np.float64(0.95) * n))
        cum = np.cumsum(cnts)
        out["source"].append(s)
        out["bucket"].append(int(b))
        out["n_seq"].append(n)
        out["p95_len"].append(int(vals[np.searchsorted(cum, rank)]))
    df = pd.DataFrame(out)
    for c in ("bucket", "n_seq", "p95_len"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["source", "bucket"]).reset_index(drop=True)


def tokens_rollup_length_p95_sql(tok_path: str) -> str:
    return f"""
SELECT source, CAST(ts // 3600 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_seq,
       CAST(quantile_disc(n_tok, 0.95) AS BIGINT) AS p95_len
FROM read_parquet('{tok_path}')
GROUP BY source, bucket
"""


def tokens_motifs_discords(spec, k: int = 25, m: int = 16, limit_docs: int = 40):
    """Top-k motifs (smallest matrix-profile distance: the most
    conserved repeated window shapes) and top-k discords (largest:
    the most anomalous windows) over the corpus — the two standard
    consumers of a matrix profile.

    Distributed top-k shape on both ends: per-block pre-top-k (k rows
    per block survive) then global sort.limit(k) — the profile itself
    never leaves the cluster. All distances are the bit-deterministic
    exact-integer closed form of tokens_matrix_profile, so ranking and
    ties (doc_id, wpos asc) match the SQL oracle exactly."""
    # materialized: consumed by BOTH picks() sorts below — without this
    # the O(p^2)-per-doc profile lineage re-executes per consumer
    mp = tokens_matrix_profile(spec, m=m, limit_docs=limit_docs).materialize()

    def picks(descending: bool, kind: str):
        def pre(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.sort_values(
                ["nn_dist", "doc_id", "wpos"],
                ascending=[not descending, True, True],
                kind="mergesort",
            ).head(k)

        top = (
            mp.map_batches(pre, batch_format="pandas")
            .sort(["nn_dist", "doc_id", "wpos"], descending=[descending, False, False])
            .limit(k)
            .to_pandas()
        )
        top.insert(0, "kind", kind)
        top["rnk"] = np.arange(1, len(top) + 1, dtype=np.int64)
        return top

    out = pd.concat([picks(False, "motif"), picks(True, "discord")], ignore_index=True)
    return out


def tokens_motifs_discords_sql(tok_path: str, k: int = 25, m: int = 16, limit_docs: int = 40) -> str:
    mp = tokens_matrix_profile_sql(tok_path, m=m, limit_docs=limit_docs)
    return f"""
WITH mp AS ({mp})
SELECT * FROM (
  SELECT 'motif' AS kind, doc_id, wpos, nn_pos, nn_dist,
         CAST(row_number() OVER (ORDER BY nn_dist, doc_id, wpos) AS BIGINT) AS rnk
  FROM mp ORDER BY nn_dist, doc_id, wpos LIMIT {k}
)
UNION ALL
SELECT * FROM (
  SELECT 'discord' AS kind, doc_id, wpos, nn_pos, nn_dist,
         CAST(row_number() OVER (ORDER BY nn_dist DESC, doc_id, wpos) AS BIGINT) AS rnk
  FROM mp ORDER BY nn_dist DESC, doc_id, wpos LIMIT {k}
)
"""


def tokens_ngram_novelty(spec, n: int = 8, limit_docs: int = 2000):
    """Corpus freshness over time: per day, the number of distinct
    token n-gram shingles appearing that day and the fraction of them
    appearing for the FIRST time (global first-seen day == that day) —
    the curve that says when a stream stops contributing new content.

    Novelty is estimated over a DETERMINISTIC 1/16 shingle sample
    (first token % 16 == 0) — the standard scale answer: the estimate's
    key space shrinks 16x while staying exactly reproducible (and
    SQL-mirrorable; a hash-based sampler would be the 100-TB variant).
    Distributed shape: sampled shingles explode map-side (day, shingle)
    and dedup per block; one groupby co-partitions each shingle's days
    to mark first-seen (min over its bounded day list); a final tiny
    groupby by day counts. Shingles travel as joined-int strings so the
    SQL oracle mirrors the keys exactly. novelty is one IEEE int/int
    division."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..sources.synth import derive_ts

    ds = _token_ds(spec)

    def shingles(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        if not len(df):
            return pd.DataFrame({"day": pd.Series(dtype="int64"), "win": pd.Series(dtype=object)})
        ids = df["doc_id"].str.slice(1).astype(np.int64).to_numpy()
        keep = ids < limit_docs
        df = df[keep]
        days = derive_ts(ids[keep], spec) // 86400
        rows_d, rows_w = [], []
        for day, toks in zip(days, df["tokens"]):
            t = np.asarray(toks)
            for i in np.flatnonzero(t[: max(len(t) - n + 1, 0)] % 16 == 0):
                rows_d.append(int(day))
                rows_w.append(",".join(map(str, t[i : i + n])))
        out = pd.DataFrame({"day": pd.array(rows_d, dtype="int64"), "win": rows_w})
        return out.drop_duplicates()

    pairs = ds.map_batches(shingles, batch_format="pyarrow")

    # ONE Ray group per distinct shingle would pay the per-group Python
    # machinery (~ms/group) linearly in corpus size; hash shingles into
    # a BOUNDED bucket count instead (a (win, day) pair always lands
    # whole in one bucket) and first-seen marking is one vectorized
    # groupby-transform inside each bucket — identical results.
    NB = 64

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["wb"] = (
            pd.util.hash_pandas_object(df["win"], index=False).to_numpy()
            % np.uint64(NB)
        ).astype(np.int64)
        return df

    def dedup_mark(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["win", "day"])
        md = g.groupby("win")["day"].transform("min")
        return pd.DataFrame(
            {"day": g["day"], "is_new": (g["day"] == md.to_numpy()).astype(np.int64)}
        )

    marked = (
        pairs.map_batches(add_bucket, batch_format="pandas")
        .groupby("wb")
        .map_groups(dedup_mark, batch_format="pandas")
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("day", as_index=False).agg(
            n_windows=("is_new", "size"), n_new=("is_new", "sum")
        )

    out = (
        marked.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("n_windows", alias_name="n_windows"), Sum("n_new", alias_name="n_new"))
    )

    def finalize(batch: pd.DataFrame) -> pd.DataFrame:
        for c in ("day", "n_windows", "n_new"):
            batch[c] = batch[c].astype("int64")
        batch["novelty"] = batch["n_new"] / batch["n_windows"]
        return batch

    return out.map_batches(finalize, batch_format="pandas")


def tokens_ngram_novelty_sql(tok_path: str, n: int = 8, limit_docs: int = 2000) -> str:
    return f"""
WITH d AS (
  SELECT CAST(ts // 86400 AS BIGINT) AS day, tokens
  FROM read_parquet('{tok_path}')
  WHERE CAST(substr(doc_id, 2) AS BIGINT) < {limit_docs}
), idx AS (
  SELECT day, tokens,
         unnest(generate_series(1, greatest(len(tokens) - {n - 1}, 0))) AS i
  FROM d
), w AS (
  SELECT DISTINCT day, array_to_string(tokens[i:i + {n - 1}], ',') AS win
  FROM idx WHERE tokens[i] % 16 = 0
), m AS (
  SELECT win, min(day) AS md FROM w GROUP BY 1
)
SELECT w.day,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(sum(CASE WHEN w.day = m.md THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN w.day = m.md THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
FROM w JOIN m USING (win)
GROUP BY w.day
"""
