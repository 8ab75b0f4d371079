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
