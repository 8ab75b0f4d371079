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


class TestDedupClusters:
    def test_forest_reduce_matches_recursive_sql(self, ray_session):
        """Spanning-forest tree reduce vs DuckDB recursive CTE on a
        synthetic edge list with chains, a star, and singleton pairs —
        across different block partitionings."""
        import os
        import tempfile

        import duckdb
        import numpy as np
        import ray.data as rd

        from dtaidistance_ray.stages import dedup
        from dtaidistance_ray.stages import rollup_scan as _rs

        rng = np.random.default_rng(7)
        # chain 0-1-2-...-30, star around 100, random small pairs
        edges = [(i, i + 1) for i in range(30)]
        edges += [(100, 100 + i) for i in range(1, 12)]
        edges += [(int(a), int(b)) for a, b in rng.integers(200, 260, size=(40, 2)) if a != b]
        df = pd.DataFrame(edges, columns=["doc_a", "doc_b"])
        with tempfile.TemporaryDirectory() as td:
            pq_path = os.path.join(td, "pairs.parquet")
            df.to_parquet(pq_path, index=False)
            want = (
                duckdb.connect()
                .execute(dedup.dedup_clusters_sql(pq_path))
                .df()
                .sort_values(["doc_id"])
                .reset_index(drop=True)
            )
        for nblocks in (1, 5, 23):
            pairs = rd.from_pandas(df).repartition(nblocks)
            parts = pairs.map_batches(dedup._forest_partial, batch_format="pandas").materialize()
            nb = parts.count()
            while nb > 1:
                parts = parts.map_batches(
                    dedup._forest_merge, batch_size=_rs._MERGE_FANIN, batch_format="pandas"
                ).materialize()
                nb2 = parts.count()
                if nb2 >= nb:
                    break
                nb = nb2
            final = dedup._forest_merge(parts.to_pandas())
            r = final.iloc[0]
            got = (
                pd.DataFrame(
                    {
                        "doc_id": np.frombuffer(r["nodes"], np.int64),
                        "cluster_id": np.frombuffer(r["roots"], np.int64),
                    }
                )
                .sort_values(["doc_id"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, want[["doc_id", "cluster_id"]], check_dtype=False)

    def test_cluster_root_is_component_min(self):
        from dtaidistance_ray.stages import dedup

        f = dedup._uf_edges_to_forest([5, 3, 9], [3, 1, 5])
        import numpy as np

        nodes = np.frombuffer(f.iloc[0]["nodes"], np.int64)
        roots = np.frombuffer(f.iloc[0]["roots"], np.int64)
        assert dict(zip(nodes, roots)) == {1: 1, 3: 1, 5: 1, 9: 1}


class TestRevenueByNationJoinPath:
    def test_forced_partitioned_join_matches_broadcast(self, ray_session):
        """The size-thresholded broadcast->join cutoff (round-3 review
        #3): forcing the partitioned customer-join path (threshold 0)
        must produce exactly the broadcast path's result."""
        broadcast = _canon(relational.revenue_by_nation(SF))
        joined = _canon(relational.revenue_by_nation(SF, broadcast_row_limit=0))
        pd.testing.assert_frame_equal(joined, broadcast, check_exact=True)
        want = _canon(_duck(relational.REVENUE_BY_NATION_SQL))
        pd.testing.assert_frame_equal(joined, want, check_dtype=False)
