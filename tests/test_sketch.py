"""Distinct-count operators: exact tree-merge vs DuckDB, HLL properties.

The exact path is the gate surface (events_distinct_users); the HLL
sketch is property-tested — error bound, merge associativity, and
partition invariance (same registers regardless of how the input is
split), which is what makes it a safe distributed combiner.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from dtaidistance_ray.stages.sketch import (
    DISTINCT_USERS_SQL,
    HllSketch,
    distinct_exact,
    distinct_users_per_type,
)

SF_DIR = "/root/testdata/sf0.001"


class TestDistinctExact:
    def test_vs_duckdb(self, ray_session):
        out = (
            distinct_users_per_type(SF_DIR)
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
        )
        oracle = (
            con.execute(DISTINCT_USERS_SQL)
            .df()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, oracle)

    def test_block_count_invariance(self, ray_session):
        import ray

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 5, 4000).astype(str),
                "v": rng.integers(0, 900, 4000),
            }
        )
        expect = df.groupby("k")["v"].nunique().rename("n_distinct")
        for nblocks in (1, 7):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            got = distinct_exact(ds, "k", "v").set_index("key")["n_distinct"]
            assert got.sort_index().tolist() == expect.sort_index().tolist()


class TestHll:
    def test_error_bound(self):
        rng = np.random.default_rng(0)
        for true_n in (50, 5_000, 200_000):
            vals = rng.integers(0, 2**62, true_n * 3) % true_n  # dupes on purpose
            s = HllSketch(p=12).add_ints(np.unique(vals) if True else vals)
            est = s.estimate()
            true = len(np.unique(vals))
            assert abs(est - true) / true < 5 * (1.04 / np.sqrt(1 << 12))

    def test_merge_equals_single_pass_and_associative(self):
        rng = np.random.default_rng(1)
        vals = rng.integers(0, 2**62, 30_000)
        whole = HllSketch(p=10).add_ints(vals)
        a = HllSketch(p=10).add_ints(vals[:9_000])
        b = HllSketch(p=10).add_ints(vals[9_000:21_000])
        c = HllSketch(p=10).add_ints(vals[21_000:])
        left = HllSketch.unpack(a.pack(), 10).merge(b).merge(c)
        right = a.merge(HllSketch.unpack(b.pack(), 10).merge(c))
        assert np.array_equal(left.registers, whole.registers)
        assert np.array_equal(right.registers, whole.registers)

    def test_pack_roundtrip(self):
        s = HllSketch(p=8).add_ints(np.arange(1000))
        t = HllSketch.unpack(s.pack(), 8)
        assert np.array_equal(s.registers, t.registers)
        assert s.estimate() == t.estimate()


class TestCountMin:
    def test_one_sided_and_bound(self):
        from dtaidistance_ray.stages.sketch import CountMinSketch

        rng = np.random.default_rng(2)
        # zipf-ish stream over a 50k-token vocab
        vals = (rng.zipf(1.3, 200_000) % 50_000).astype(np.int64)
        s = CountMinSketch(depth=4, width=1 << 12).add_ints(
            *np.unique(vals, return_counts=True)
        )
        uniq, true = np.unique(vals, return_counts=True)
        est = s.query_ints(uniq)
        assert (est >= true).all()  # CMS never undercounts
        eps = np.e / (1 << 12)
        # Markov bound per row, amplified by depth=4: generous 10x slack
        assert (est - true <= 10 * eps * len(vals)).all()

    def test_merge_partition_invariance(self):
        from dtaidistance_ray.stages.sketch import CountMinSketch

        rng = np.random.default_rng(3)
        vals = rng.integers(0, 1 << 20, 60_000)
        whole = CountMinSketch(2, 1 << 10).add_ints(vals)
        a = CountMinSketch(2, 1 << 10).add_ints(vals[:13_000])
        b = CountMinSketch(2, 1 << 10).add_ints(vals[13_000:40_111])
        c = CountMinSketch(2, 1 << 10).add_ints(vals[40_111:])
        merged = CountMinSketch.unpack(a.pack(), 2, 1 << 10).merge(b).merge(c)
        assert np.array_equal(merged.table, whole.table)
        # counted adds equal single adds
        u, cnt = np.unique(vals, return_counts=True)
        counted = CountMinSketch(2, 1 << 10).add_ints(u, cnt)
        assert np.array_equal(counted.table, whole.table)

    def test_distributed_matches_exact_heavy_hitters(self, ray_session):
        import __ray_entry__ as E
        from dtaidistance_ray.stages.sketch import cms_token_counts

        sf = "/root/testdata/sf0.001"
        path = E._ensure_token_parquet(sf)
        import duckdb

        exact = duckdb.sql(
            f"""SELECT t AS token, CAST(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(tokens) AS t FROM read_parquet('{path}'))
                GROUP BY 1 ORDER BY c DESC LIMIT 20"""
        ).df()
        got = cms_token_counts(path, exact["token"].to_numpy())
        j = exact.merge(got, on="token")
        assert (j["est_count"] >= j["c"]).all()
        # heavy hitters are far above the eps*N noise floor: estimates tight
        n_total = duckdb.sql(
            f"SELECT sum(n_tok) FROM read_parquet('{path}')"
        ).fetchone()[0]
        assert (j["est_count"] - j["c"] <= np.e / (1 << 12) * n_total * 10).all()
