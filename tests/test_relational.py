"""Relational suite (TPC-H-ish) vs DuckDB at sf0.001 — the same SQL
the driver gate uses, run in-process. Covers the aggregate queries and
the native hash-partitioned semi/anti joins."""

import duckdb
import pandas as pd
import pytest

from dtaidistance_ray.stages import relational

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ["customer", "orders", "supplier", "part", "lineitem", "nation"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _run(q):
    r = q(SF)
    return r.to_pandas() if hasattr(r, "to_pandas") else r


class TestRelational:
    def test_pricing_summary(self, ray_session):
        got = _canon(_run(relational.lineitem_pricing_summary))
        want = _canon(_duck(relational.LINEITEM_PRICING_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_revenue_by_nation(self, ray_session):
        got = _canon(_run(relational.revenue_by_nation))
        want = _canon(_duck(relational.REVENUE_BY_NATION_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_customers_dormant_anti_join(self, ray_session):
        # sf0.001 has no dormant customers at the default cutoff; use a
        # later one so the anti-join output is non-trivial here
        cutoff = "1999-01-01"
        got = _canon(relational.customers_dormant(SF, cutoff_date=cutoff).to_pandas())
        want = _canon(_duck(relational.customers_dormant_sql(cutoff)))
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_suppliers_of_large_parts_semi_join(self, ray_session):
        got = _canon(_run(relational.suppliers_of_large_parts))
        want = _canon(_duck(relational.SUPPLIERS_OF_LARGE_PARTS_SQL))
        assert len(want) > 0  # predicate must actually select
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
