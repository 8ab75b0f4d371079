"""Local mirror of the driver's correctness gate: run each queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + schema + order-insensitive value compare).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (list, np.ndarray)):
            df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"schema: ray={sorted(got.columns)} sql={sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows: ray={len(got)} sql={len(want)}")
    g, w = canon(got), canon(want)
    if len(g) == len(w):
        for c in g.columns:
            a, b = g[c].to_numpy(), w[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = np.array_equal(a.astype(float), b.astype(float), equal_nan=True)
            else:
                eq = (pd.Series(a) == pd.Series(b)).all()
            if not eq:
                idx = next(
                    (k for k in range(len(a)) if not _cell_eq(a[k], b[k])), None
                )
                problems.append(
                    f"col {c}: first mismatch at row {idx}: ray={a[idx]!r} sql={b[idx]!r}"
                )
    return problems


def _cell_eq(x, y) -> bool:
    try:
        if isinstance(x, float) and isinstance(y, float) and np.isnan(x) and np.isnan(y):
            return True
        return bool(x == y)
    except Exception:
        return False


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    results = {}
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            results[name] = [f"RAY ERROR: {type(e).__name__}: {e}"]
            print(f"FAIL {name}: {results[name][0][:200]}")
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            results[name] = []
            print(f"ok   {name}: rows={len(got)} (rows-only, {dt:.1f}s)")
            continue
        try:
            want = con.sql(sqls[name]).df()
        except Exception as e:
            results[name] = [f"SQL ERROR: {e}"]
            print(f"FAIL {name}: {results[name][0][:300]}")
            continue
        problems = compare(name, got, want)
        results[name] = problems
        status = "ok  " if not problems else "FAIL"
        print(f"{status} {name}: rows={len(got)} ({dt:.1f}s)" + ("" if not problems else f" -> {problems}"))
    ray.shutdown()
    nfail = sum(1 for v in results.values() if v)
    print(f"\n{len(results) - nfail}/{len(results)} passed")
    sys.exit(1 if nfail else 0)


if __name__ == "__main__":
    main()
