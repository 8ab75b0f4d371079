"""Vocabulary analytics (heavy hitters / percentiles / df-tf) vs DuckDB.

Runs the exact oracle SQL the driver gate uses, in-process, against the
same deterministic token table — plus invariance checks (block-count
independence) and a direct probe of the quantile_disc rank semantics.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from dtaidistance_ray.sources.synth import TokenTableSpec, token_table, token_table_arrow
from dtaidistance_ray.stages import vocab

SPEC = TokenTableSpec(num_rows=700, vocab=500, max_len=64)
PQ = "/tmp/dtair_test_vocab.parquet"


@pytest.fixture(scope="module")
def tok_parquet():
    import pyarrow.parquet as pq

    pq.write_table(token_table_arrow(SPEC), PQ)
    return PQ


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _duck(sql: str) -> pd.DataFrame:
    return duckdb.connect().execute(sql).df()


class TestVocab:
    def test_heavy_hitters_vs_duckdb(self, ray_session, tok_parquet):
        got = _canon(vocab.heavy_hitters(token_table(SPEC), k=15))
        want = _canon(_duck(vocab.heavy_hitters_sql(tok_parquet, k=15)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_percentiles_vs_duckdb(self, ray_session, tok_parquet):
        got = _canon(vocab.token_percentiles(token_table(SPEC)))
        want = _canon(_duck(vocab.token_percentiles_sql(tok_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_doc_frequency_vs_duckdb(self, ray_session, tok_parquet):
        got = _canon(vocab.doc_frequency(token_table(SPEC)))
        want = _canon(_duck(vocab.doc_frequency_sql(tok_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # df <= tf always; df <= num docs
        assert (got["df"] <= got["tf"]).all()
        assert (got["df"] <= SPEC.num_rows).all()

    def test_vocab_coverage_vs_duckdb(self, ray_session, tok_parquet):
        got = _canon(vocab.vocab_coverage(token_table(SPEC)))
        want = _canon(_duck(vocab.vocab_coverage_sql(tok_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # coverage is monotone in decile and ends at exactly 1.0
        for _, g in got.groupby("source"):
            c = g.sort_values("decile")["coverage"].to_numpy()
            assert (np.diff(c) >= 0).all() and c[-1] == 1.0

    def test_block_count_invariance(self, ray_session):
        """Partial-count combiner must be partitioning-independent."""
        a = _canon(vocab.heavy_hitters(token_table(SPEC, override_num_blocks=3)))
        b = _canon(vocab.heavy_hitters(token_table(SPEC, override_num_blocks=17)))
        pd.testing.assert_frame_equal(a, b)

    def test_tree_reduce_stall_guard(self, ray_session, tok_parquet, monkeypatch):
        """Threshold below the per-source floor: rounds stall at one row
        per source; the guard must break out with a correct result."""
        from dtaidistance_ray.stages import rollup_scan as _rs

        monkeypatch.setattr(_rs, "_MERGE_THRESHOLD_ROWS", 1)
        got = _canon(vocab.token_percentiles(token_table(SPEC)))
        want = _canon(_duck(vocab.token_percentiles_sql(PQ)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_bigram_collocations_vs_duckdb(self, ray_session, tok_parquet):
        got = _canon(vocab.bigram_collocations(token_table(SPEC), k=50))
        want = _canon(_duck(vocab.bigram_collocations_sql(tok_parquet, k=50)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_bigram_edge_rows(self, ray_session):
        """Rows with 0 or 1 token contribute no bigrams; merge rounds
        (threshold=1) and block partitioning must not change the result."""
        import ray.data as rd
        from dtaidistance_ray.stages import rollup_scan as _rs

        df = pd.DataFrame(
            {
                "doc_id": np.arange(6),
                "tokens": [[1, 2, 1, 2], [], [7], [2, 1], [1, 2], [9, 9, 9]],
                "n_tok": [4, 0, 1, 2, 2, 3],
                "source": ["s"] * 6,
            }
        )
        ds = rd.from_pandas(df).repartition(4)
        got = vocab.bigram_collocations(ds, k=10)
        # bigrams: (1,2)x3, (2,1)x2, (9,9)x2 — n=7
        top = got.set_index(["token_a", "token_b"])["cnt"].to_dict()
        assert top == {(1, 2): 3, (2, 1): 2, (9, 9): 2}
        assert (got["n_bigrams"] == 7).all()
        row12 = got[(got.token_a == 1) & (got.token_b == 2)].iloc[0]
        assert row12["left_cnt"] == 3 and row12["right_cnt"] == 3

    def test_quantile_disc_rank_semantics(self):
        """Our histogram rank must equal DuckDB quantile_disc at awkward n."""
        for n in (3, 7, 40, 70, 997):
            vals = list(range(1, n + 1))
            for p in vocab.PCTS:
                duck = (
                    duckdb.connect()
                    .execute(
                        f"SELECT quantile_disc(x, {p}) FROM (SELECT unnest({vals}) AS x)"
                    )
                    .fetchone()[0]
                )
                ours = int(np.ceil(np.float64(p) * n))  # value == 1-based rank here
                assert duck == ours, (n, p, duck, ours)


class TestSourceKlDrift:
    def test_vs_sql_and_properties(self, ray_session):
        import duckdb

        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = E.queries()["source_token_kl_drift"](sf).sort_values("source").reset_index(drop=True)
        sql = E.oracle_sql()["source_token_kl_drift"].replace("sf0.01.parquet", "sf0.001.parquet")
        con = duckdb.connect()
        want = con.execute(sql).df().sort_values("source").reset_index(drop=True)
        assert got[sorted(got.columns)].equals(want[sorted(want.columns)])
        # KL is non-negative, and strictly positive unless a source IS
        # the corpus distribution
        assert (got["kl_to_corpus"] >= 0).all()
        assert got["kl_to_corpus"].max() > 0


class TestDocBigramXent:
    def test_vs_sql_oracle(self, ray_session):
        import duckdb

        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = (
            E.queries()["doc_bigram_xent"](sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        sql = E.oracle_sql()["doc_bigram_xent"].replace("sf0.01.parquet", "sf0.001.parquet")
        want = (
            duckdb.connect().execute(sql).df().sort_values("doc_id").reset_index(drop=True)
        )
        assert got[sorted(got.columns)].equals(want[sorted(want.columns)])
        # cross-entropy under add-one smoothing is positive and bounded
        # by ln of the smoothed denominator
        assert (got["xent"] > 0).all()


class TestLengthKsDrift:
    def test_vs_sql_and_bounds(self, ray_session):
        import duckdb

        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        got = (
            E.queries()["source_length_ks_drift"](sf)
            .sort_values("source")
            .reset_index(drop=True)
        )
        sql = E.oracle_sql()["source_length_ks_drift"].replace(
            "sf0.01.parquet", "sf0.001.parquet"
        )
        want = (
            duckdb.connect().execute(sql).df().sort_values("source").reset_index(drop=True)
        )
        assert got[sorted(got.columns)].equals(want[sorted(want.columns)])
        assert got["ks_d"].between(0, 1).all()

    def test_ks_hand_computed(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from dtaidistance_ray.stages.vocab import length_ks_drift

        # source a: lengths all 8; source b: lengths all 32
        # corpus = 4x len-8 + 4x len-32 -> F_c(8) = 0.5
        # F_a(8) = 1.0 -> D_a = 0.5 at len 8; F_b(8) = 0 -> D_b = 0.5 at len 8
        df = pd.DataFrame(
            {
                "source": ["a"] * 4 + ["b"] * 4,
                "n_tok": np.array([8] * 4 + [32] * 4, dtype=np.int32),
            }
        )
        got = length_ks_drift(rd.from_pandas(df)).sort_values("source")
        assert got["ks_d"].tolist() == [0.5, 0.5]
        assert got["ks_at_len"].tolist() == [8, 8]
        assert got["n_docs"].tolist() == [4, 4]


class TestDistinctTokensDaily:
    def test_vs_duckdb_and_partition_invariance(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from dtaidistance_ray.sources.synth import derive_ts

        spec = SPEC
        t = token_table_arrow(spec)
        ids = np.arange(spec.num_rows, dtype=np.int64)
        t2 = t.append_column("ts", pa.array(derive_ts(ids, spec), type=pa.int64()))
        path = "/tmp/dtair_test_vocab_ts.parquet"
        pq.write_table(t2, path)

        got = _canon(vocab.distinct_tokens_daily(token_table(spec), spec))
        want = _canon(_duck(vocab.distinct_tokens_daily_sql(path)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # block-count invariance: the bitmap OR-merge is associative
        got2 = _canon(
            vocab.distinct_tokens_daily(token_table(spec, override_num_blocks=3), spec)
        )
        pd.testing.assert_frame_equal(got2, got)


class TestSourceEntropy:
    def test_vs_sql_and_bounds(self, ray_session, tok_parquet):
        got = _canon(vocab.source_entropy(token_table(SPEC)))
        want = _canon(_duck(vocab.source_entropy_sql(tok_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # 0 <= H <= ln(n_distinct), with equality iff uniform
        assert (got["entropy_nats"] >= 0).all()
        assert (got["entropy_nats"] <= np.log(got["n_distinct"]) + 1e-9).all()


class TestZipfSlope:
    def test_vs_sql_and_sanity(self, ray_session, tok_parquet):
        got = _canon(vocab.zipf_slope(token_table(SPEC)))
        want = _canon(_duck(vocab.zipf_slope_sql(tok_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # frequency is non-increasing in rank, so the fit slope is <= 0
        assert (got["slope"] <= 0).all()


class TestSourceVocabOverlap:
    def test_vs_duckdb_and_set_identities(self, ray_session, tok_parquet):
        got = _canon(vocab.source_vocab_overlap(token_table(SPEC), SPEC))
        want = _canon(_duck(vocab.source_vocab_overlap_sql(tok_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # set identities: 0 < inter <= union, 0 < jaccard <= 1
        assert (got["n_inter"] > 0).all() and (got["n_inter"] <= got["n_union"]).all()
        assert (got["jaccard"] > 0).all() and (got["jaccard"] <= 1).all()


class TestZeroLengthRows:
    """Zero-length token rows (min_len=0 spec) through the newest ops —
    the repo's historical bite-point (reduceat gaps, empty flattens)."""

    SPEC0 = TokenTableSpec(num_rows=500, min_len=0, max_len=24, vocab=100)

    @pytest.fixture(scope="class")
    def tok0_parquet(self):
        import pyarrow.parquet as pq

        path = "/tmp/dtair_test_vocab_zero.parquet"
        pq.write_table(token_table_arrow(self.SPEC0), path)
        return path

    def test_positional_stats(self, ray_session, tok0_parquet):
        from dtaidistance_ray.stages.series_ops import (
            tokens_positional_stats,
            tokens_positional_stats_sql,
        )

        got = _canon(tokens_positional_stats(self.SPEC0).to_pandas())
        want = _canon(_duck(tokens_positional_stats_sql(tok0_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_vocab_coverage(self, ray_session, tok0_parquet):
        got = _canon(vocab.vocab_coverage(token_table(self.SPEC0)))
        want = _canon(_duck(vocab.vocab_coverage_sql(tok0_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_entropy_and_zipf(self, ray_session, tok0_parquet):
        got = _canon(vocab.source_entropy(token_table(self.SPEC0)))
        want = _canon(_duck(vocab.source_entropy_sql(tok0_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        got = _canon(vocab.zipf_slope(token_table(self.SPEC0)))
        want = _canon(_duck(vocab.zipf_slope_sql(tok0_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_overlap(self, ray_session, tok0_parquet):
        got = _canon(vocab.source_vocab_overlap(token_table(self.SPEC0), self.SPEC0))
        want = _canon(_duck(vocab.source_vocab_overlap_sql(tok0_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestRound5ReviewFixes:
    def test_zipf_slope_single_token_source(self, ray_session):
        """One distinct token: x-variance is 0 and the OLS slope is 0/0 —
        DuckDB yields NULL (NaN in the frame); the engine must match
        instead of raising ZeroDivisionError (round-5 review finding)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "source": pa.array(["s0", "s0"]),
                "tokens": pa.array([[7, 7, 7], [7]], pa.list_(pa.int64())),
            }
        )
        got = vocab.zipf_slope(rd.from_arrow(t))
        assert len(got) == 1 and got["n_distinct"].iloc[0] == 1
        assert np.isnan(got["slope"].iloc[0]) and np.isnan(got["intercept"].iloc[0])
        p = "/tmp/dtair_test_zipf_single.parquet"
        pq.write_table(t, p)
        want = _duck(vocab.zipf_slope_sql(p))
        assert np.isnan(want["slope"].iloc[0]) and np.isnan(want["intercept"].iloc[0])

    def test_heavy_hitters_empty_tokens(self, ray_session):
        """All-empty token lists: typed empty frame, not a concat crash."""
        import pyarrow as pa
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "source": pa.array(["s0"]),
                "tokens": pa.array([[]], pa.list_(pa.int64())),
            }
        )
        got = vocab.heavy_hitters(rd.from_arrow(t))
        assert len(got) == 0
        assert list(got.columns) == ["source", "rnk", "token", "cnt"]

    def test_doc_bigram_xent_distributed_table_matches_sql(self, ray_session, tok_parquet):
        """The bigram table now builds via distributed unpack +
        groupby-sum (never a driver fold); results must stay identical
        to the SQL oracle."""
        got = _canon(vocab.doc_bigram_xent(token_table(SPEC)).to_pandas())
        want = _canon(_duck(vocab.doc_bigram_xent_sql(tok_parquet)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
