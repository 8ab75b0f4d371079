"""Flagship rollup pipeline: tier equality vs single-process oracle,
partitioning invariance, gap-fill semantics, checkpoint/resume."""

import os
import numpy as np
import pandas as pd
import pytest

from dtaidistance_ray.pipelines.flagship import (
    build_tiers,
    rollup_oracle,
    run_flagship,
)
from dtaidistance_ray.sources.synth import TokenTableSpec, token_table, token_table_arrow
from dtaidistance_ray.stages.rollup import RollupConfig, encode_tier, gap_fill_tier
from dtaidistance_ray.codec import gorilla_decode

SPEC = TokenTableSpec(num_rows=300, num_sources=5, max_len=48, ts_span=24 * 3600)
CFG = RollupConfig(tier_widths=(3600, 4 * 3600, 24 * 3600), dba_max_it=2)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["source", "bucket"], kind="mergesort").reset_index(drop=True)
    return df[sorted(df.columns)]


class TestSynthSource:
    def test_ray_matches_driver_generation(self, ray_session):
        ds = token_table(SPEC, override_num_blocks=7)
        got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = token_table_arrow(SPEC).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert list(got.columns) == ["doc_id", "tokens", "n_tok", "source"]
        assert (got["doc_id"] == want["doc_id"]).all()
        assert (got["n_tok"] == want["n_tok"]).all()
        assert (got["source"] == want["source"]).all()
        for a, b in zip(got["tokens"], want["tokens"]):
            np.testing.assert_array_equal(a, b)

    def test_token_array_equality_invariant(self, ray_session):
        # per-row invariant (BASELINE.json input_hint): tokens survive the
        # pipeline head end-to-end unchanged
        from dtaidistance_ray.stages.rollup import bucketize

        ds = bucketize(token_table(SPEC, override_num_blocks=4), 3600, SPEC)
        got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
        want = token_table_arrow(SPEC).to_pandas().sort_values("doc_id").reset_index(drop=True)
        for a, b in zip(got["tokens"], want["tokens"]):
            np.testing.assert_array_equal(a, b)
        assert (got["n_tok"].to_numpy() == np.array([len(t) for t in got["tokens"]])).all()

    def test_skewed_sources(self):
        t = token_table_arrow(TokenTableSpec(num_rows=5000, num_sources=10))
        counts = pd.Series(t["source"].to_pylist()).value_counts()
        assert counts.iloc[0] > 2.5 * counts.iloc[-1]  # Zipf skew present


class TestTierEquality:
    @pytest.fixture(scope="class")
    def oracle(self):
        return rollup_oracle(SPEC, CFG)

    def test_tier_equality_vs_oracle(self, ray_session, oracle):
        ds = token_table(SPEC, override_num_blocks=5)
        tiers = build_tiers(ds, SPEC, CFG)
        for t in range(3):
            got = _canon(gap_fill_tier(tiers[t]).to_pandas())
            want = _canon(oracle[t])
            assert len(got) == len(want), f"tier {t} row count"
            for col in ["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]:
                assert (got[col].to_numpy() == want[col].to_numpy()).all(), f"tier {t} {col}"
            for col in ["agg_token_min", "agg_token_max", "agg_token_mean"]:
                np.testing.assert_array_equal(
                    got[col].to_numpy(), want[col].to_numpy(), err_msg=f"tier {t} {col}"
                )
            for a, b in zip(got["repr_series"], want["repr_series"]):
                # bit-exact: integer-sum associativity + canonical order
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"tier {t}")

    def test_partitioning_invariance(self, ray_session, oracle):
        # different block counts -> identical tier-0 output
        for blocks in (1, 11):
            ds = token_table(SPEC, override_num_blocks=blocks)
            got = _canon(gap_fill_tier(build_tiers(ds, SPEC, CFG)[0]).to_pandas())
            want = _canon(oracle[0])
            for a, b in zip(got["repr_series"], want["repr_series"]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gap_fill(self, ray_session, oracle):
        t0 = oracle[0]
        gaps = t0[t0["gap_filled"]]
        real = t0[~t0["gap_filled"]]
        assert (gaps["agg_count"] == 0).all()
        assert gaps["agg_token_mean"].isna().all()
        # grid is contiguous per source
        for src, g in t0.groupby("source"):
            b = g["bucket"].to_numpy()
            assert (np.diff(np.sort(b)) == 1).all()
        assert len(real) > 0

    def test_encode_roundtrip(self, ray_session):
        ds = token_table(SPEC, override_num_blocks=3)
        t0 = encode_tier(gap_fill_tier(build_tiers(ds, SPEC, CFG)[0]))
        df = t0.to_pandas()
        for r, enc in zip(df["repr_series"], df["repr_gorilla"]):
            np.testing.assert_array_equal(gorilla_decode(enc), np.asarray(r))


class TestTreeMerge:
    def test_bounded_driver_rows_bit_identical(self, ray_session, monkeypatch):
        """With the merge threshold patched to 1 and fan-in 2, the
        distributed tree merge runs multiple fan-in rounds, the driver
        fold receives exactly 1 partial row, and the tier output stays
        BIT-identical to the default path (associative exact merges)."""
        from dtaidistance_ray.pipelines.flagship import bucketize
        from dtaidistance_ray.stages import rollup_scan

        ds = token_table(SPEC, override_num_blocks=9)
        base = _canon(
            rollup_scan.scan_rollup_base_tier(
                bucketize(ds, CFG.tier_widths[0], SPEC), CFG
            ).to_pandas()
        )
        monkeypatch.setattr(rollup_scan, "_MERGE_THRESHOLD_ROWS", 1)
        monkeypatch.setattr(rollup_scan, "_MERGE_FANIN", 2)
        ds2 = token_table(SPEC, override_num_blocks=9)
        got = _canon(
            rollup_scan.scan_rollup_base_tier(
                bucketize(ds2, CFG.tier_widths[0], SPEC), CFG
            ).to_pandas()
        )
        t = rollup_scan.LAST_TIMINGS
        assert t["stats_driver_rows"] == 1
        assert t["stats_merge_rounds"] >= 2  # 9 blocks, fan-in 2
        assert t["sweep0_driver_rows"] == 1
        assert len(got) == len(base)
        for col in ("source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
            assert (got[col].to_numpy() == base[col].to_numpy()).all(), col
        for a, b in zip(got["repr_series"], base["repr_series"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCheckpointResume:
    def test_resume_skips_completed_shards(self, ray_session, tmp_path):
        out = str(tmp_path / "rollup_out")
        spec = TokenTableSpec(num_rows=120, num_sources=4, max_len=32, ts_span=12 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 7200), dba_max_it=1)
        m1 = run_flagship(spec, cfg, out_dir=out, num_shards=4)
        assert sum(v["rows"] for v in m1["tiers"].values()) > 0
        assert all(len(v) == 0 for v in m1["skipped_shards"].values())
        m2 = run_flagship(spec, cfg, out_dir=out, num_shards=4)
        # all shards of the final tier were skipped on resume
        assert len(m2["skipped_shards"][0]) > 0
        assert m2["skipped_shards"] == {
            t: m2["skipped_shards"][t] for t in m2["skipped_shards"]
        }

    def test_changed_settings_invalidate(self, ray_session, tmp_path):
        out = str(tmp_path / "rollup_out2")
        spec = TokenTableSpec(num_rows=60, num_sources=3, max_len=24, ts_span=6 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 7200), dba_max_it=1)
        run_flagship(spec, cfg, out_dir=out, num_shards=2)
        cfg2 = RollupConfig(tier_widths=(3600, 7200), dba_max_it=2)
        m = run_flagship(spec, cfg2, out_dir=out, num_shards=2)
        assert all(len(v) == 0 for v in m["skipped_shards"].values())


class TestEmptyTokenRows:
    """Arbitrary parquet input may contain zero-length token rows; the
    scan kernels must neither corrupt stats (reduceat gap bug) nor hang
    (an empty member can never step in the batched traceback)."""

    def test_stats_partial_guards_empty_rows(self):
        import pyarrow as pa
        import pickle
        from dtaidistance_ray.stages.rollup_scan import _stats_partial

        batch = pa.table(
            {
                "doc_id": ["d1", "d2", "d3", "d4"],
                "tokens": [[5.0, 7.0], [], [11.0], []],  # empty mid + tail
                "source": ["a", "a", "b", "b"],
                "bucket": [0, 0, 1, 1],
            }
        )
        out = _stats_partial(batch)
        keys, min_ids = pickle.loads(out["keys"].iloc[0])
        nums_int = np.frombuffer(out["nums_int"].iloc[0], dtype=np.int64).reshape(
            3, len(keys)
        )
        stats = dict(zip(keys, nums_int.T))
        # (a,0): two docs, one empty -> sum 12 (NOT 12+11 via gap bug)
        assert stats[("a", 0)][2] == 12
        assert stats[("a", 0)][0] == 2  # count includes the empty doc
        assert stats[("b", 1)][2] == 11
        # integer aggregates are exact int64 end-to-end (no f64 2^53 loss)
        assert nums_int.dtype == np.int64

    def test_scan_dba_skips_empty_members(self):
        from dtaidistance_ray.kernels.dba_scan import scan_dba_partials
        from dtaidistance_ray import DTWSettings

        keys = [("g", 0)] * 3
        seqs = [np.array([1.0, 2, 3, 4]), np.zeros(0), np.array([2.0, 3, 4, 5])]
        centers = {("g", 0): np.array([1.0, 2, 3, 4])}
        with_empty = scan_dba_partials(keys, seqs, centers, DTWSettings())
        without = scan_dba_partials(keys[:2], [seqs[0], seqs[2]], centers, DTWSettings())
        np.testing.assert_array_equal(with_empty[("g", 0)][0], without[("g", 0)][0])
        np.testing.assert_array_equal(with_empty[("g", 0)][1], without[("g", 0)][1])
        # empty center: reported with empty accumulators, no hang
        out = scan_dba_partials(keys, seqs, {("g", 0): np.zeros(0)}, DTWSettings())
        assert out[("g", 0)][0].shape == (0,)

    def test_width_plan_bit_equal_and_edge_safe(self):
        """order_free width-bucketed batching must be bit-identical to
        the class plan for integer members, incl. empty members/centers
        and extreme length mixes."""
        from dtaidistance_ray.kernels.dba_scan import scan_dba_partials
        from dtaidistance_ray import DTWSettings

        rng = np.random.default_rng(0)
        keys, seqs = [], []
        for i in range(300):
            keys.append(("s", i % 7))
            n = [0, 1, 3, 8, 40, 256][i % 6]
            seqs.append(rng.integers(0, 32000, n).astype(np.float64))
        centers = {
            ("s", b): rng.integers(0, 32000, [1, 5, 17, 250, 0, 64, 9][b]).astype(
                np.float64
            )
            for b in range(7)
        }
        s = DTWSettings(window=16)
        old = scan_dba_partials(keys, seqs, centers, s)
        new = scan_dba_partials(keys, seqs, centers, s, order_free=True)
        for k in old:
            np.testing.assert_array_equal(old[k][0], new[k][0])
            np.testing.assert_array_equal(old[k][1], new[k][1])

    def test_promote_survives_empty_min_doc_center(self, ray_session, tmp_path):
        """A group whose min-doc row has ZERO tokens seeds an empty
        center; promotion must freeze it (diff 0/0 guard), not crash."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from dtaidistance_ray.pipelines.flagship import run_flagship
        from dtaidistance_ray.sources.synth import token_table_arrow

        spec = TokenTableSpec(num_rows=400, seed=7)
        t = token_table_arrow(spec)
        tok = t["tokens"].combine_chunks()
        lists = tok.to_pylist()
        for i in range(0, len(lists), 13):  # row 0 IS a min-doc
            lists[i] = []
        t = t.set_column(
            t.schema.get_field_index("tokens"), "tokens", pa.array(lists, type=tok.type)
        )
        d = tmp_path / "zl"
        d.mkdir()
        pq.write_table(t, str(d / "part-0.parquet"))
        m = run_flagship(spec, out_dir=None, input_path=str(d))
        assert all(v["rows"] > 0 for v in m["tiers"].values())


class TestFusedDownstream:
    def test_fused_rows_match_staged(self, ray_session):
        # BIT-exact at every tier: tier 0 by integer-sum associativity,
        # tier >= 1 by promote_frame's member-order deterministic
        # accumulation (batch/shard partitioning cannot shift a ULP)
        import pandas as pd
        from dtaidistance_ray.pipelines.flagship import build_tiers, downstream_fused
        from dtaidistance_ray.stages.rollup import encode_tier, gap_fill_tier

        spec = TokenTableSpec(num_rows=150, num_sources=4, max_len=32, ts_span=12 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 7200), dba_max_it=2)
        tiers = build_tiers(token_table(spec), spec, cfg)
        fused = downstream_fused(tiers[0], cfg).to_pandas()

        def canon(df):
            df = df.copy()
            df["repr_series"] = df["repr_series"].map(lambda v: tuple(np.asarray(v, dtype=np.float64)))
            df["repr_gorilla"] = df["repr_gorilla"].map(bytes)
            return df.sort_values(["source", "bucket"], kind="mergesort").reset_index(drop=True)

        from dtaidistance_ray.codec.gorilla import gorilla_decode

        for t in (0, 1):
            staged = canon(encode_tier(gap_fill_tier(tiers[t])).to_pandas())
            got = canon(fused[fused["tier"] == t].drop(columns=["tier"]))
            got = got.reset_index(drop=True)[staged.columns]
            pd.testing.assert_frame_equal(got, staged, check_dtype=False)
            for _, a in got.iterrows():
                ra = np.asarray(a["repr_series"])
                if len(ra):
                    np.testing.assert_array_equal(gorilla_decode(a["repr_gorilla"]), ra)

    def test_run_flagship_metrics_path(self, ray_session):
        spec = TokenTableSpec(num_rows=120, num_sources=3, max_len=24, ts_span=6 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 7200), dba_max_it=1)
        m = run_flagship(spec, cfg, out_dir=None)
        assert m["tiers"][0]["rows"] > 0 and m["tiers"][1]["rows"] > 0
        assert "downstream_fused" in m["phase_timings"]

    def test_fused_sparse_sources_all_gap_shards(self, ray_session):
        # sparse input: most tier-0 buckets missing, so some range
        # shards contain ZERO present rows and must still emit their
        # gap rows (explicit-grid gap_fill_frame path)
        import pandas as pd
        from dtaidistance_ray.pipelines.flagship import build_tiers, downstream_fused
        from dtaidistance_ray.stages.rollup import encode_tier, gap_fill_tier

        spec = TokenTableSpec(
            num_rows=40, num_sources=2, max_len=16, ts_span=14 * 24 * 3600
        )
        cfg = RollupConfig(tier_widths=(3600, 14400, 57600), dba_max_it=1)
        tiers = build_tiers(token_table(spec), spec, cfg)
        fused = downstream_fused(tiers[0], cfg).to_pandas()
        for t in range(3):
            staged = (
                encode_tier(gap_fill_tier(tiers[t]))
                .to_pandas()
                .sort_values(["source", "bucket"], kind="mergesort")
                .reset_index(drop=True)
            )
            got = (
                fused[fused["tier"] == t]
                .drop(columns=["tier"])
                .sort_values(["source", "bucket"], kind="mergesort")
                .reset_index(drop=True)
            )
            assert len(got) == len(staged), (t, len(got), len(staged))
            pd.testing.assert_frame_equal(
                got[["source", "bucket", "agg_count", "gap_filled"]],
                staged[["source", "bucket", "agg_count", "gap_filled"]],
                check_dtype=False,
            )


class TestCliSurface:
    def test_cli_subprocess_smoke(self, tmp_path):
        """The `ray job submit` surface end-to-end in a fresh process:
        checkpointed write, manifest lineage, JSON metrics on stdout."""
        import json
        import subprocess
        import sys

        out_dir = tmp_path / "rollup_out"
        r = subprocess.run(
            [
                sys.executable, "-m", "dtaidistance_ray.cli",
                "--rows", "400", "--out", str(out_dir),
                "--num-shards", "2", "--num-cpus", "4",
            ],
            capture_output=True, text=True, timeout=600,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        metrics = json.loads(r.stdout.strip().splitlines()[-1])
        assert metrics["num_rows"] == 400
        parts = list(out_dir.glob("tier=*/shard=*/part-0.parquet"))
        assert parts, "no checkpointed parquet written"
        manifests = list(out_dir.glob("tier=*/shard=*/_manifest.json"))
        assert manifests, "no lineage manifests written"


class TestRetentionExpiry:
    def test_policy_view(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_retention_expiry"](sf).to_pandas()
        t0 = df[df["tier"] == 0]
        t1 = df[df["tier"] == 1]
        t2 = df[df["tier"] == 2]
        # TTL windows honoured: surviving bucket span bounded by the keep
        mb0 = t0["bucket"].max()
        assert t0["bucket"].min() > mb0 - 48 and len(t0["bucket"].unique()) <= 48
        assert t1["bucket"].min() > mb0 // 4 - 42
        # tier-2 is forever: full history (first bucket present)
        assert len(t2) > 0 and t2["bucket"].min() == t2["bucket"].min()
        # conservation inside the surviving window: tier-1 sums over its
        # children equal the tier-0 sums for fully-covered 4h buckets
        cover = t0.groupby([t0["source"], t0["bucket"] // 4]).agg(
            n=("agg_count", "sum"), s=("agg_token_sum", "sum"), c=("bucket", "size")
        )
        full = cover[cover["c"] == 4].reset_index()
        j = full.merge(
            t1, left_on=["source", "bucket"], right_on=["source", "bucket"]
        )
        assert len(j) > 0
        assert (j["n"] == j["agg_count"]).all() and (j["s"] == j["agg_token_sum"]).all()


class TestGapServeParent:
    def test_miss_path(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_gap_serve_parent"](sf).to_pandas()
        t0 = E.queries()["tokens_rollup_tier0_aggs"](sf).to_pandas()
        # gap rows are exactly the holes: never a bucket present in tier 0
        present = set(zip(t0["source"], t0["bucket"]))
        assert not any((s, b) in present for s, b in zip(df["source"], df["bucket"]))
        assert (df["parent_bucket"] == df["bucket"] // 4).all()
        # a served parent always has positive mean (tokens are positive)
        served = df[df["parent_count"] > 0]
        assert (served["parent_token_mean"] > 0).all()
        # empty parents report the 0/0.0 sentinel pair consistently
        empty = df[df["parent_count"] == 0]
        assert (empty["parent_token_mean"] == 0.0).all()


class TestFidelityAndSkew:
    def test_downsample_fidelity(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_downsample_fidelity"](sf)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        assert (df["max_abs_dev"] >= 0).all()
        assert df["n_children"].between(1, 4).all()
        # single-child parents have zero deviation by construction
        solo = df[df["n_children"] == 1]
        if len(solo):
            assert (solo["max_abs_dev"] == 0).all()

    def test_source_skew(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_source_skew"](sf)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        assert df["bucket"].is_unique
        assert (df["top_docs"] <= df["total_docs"]).all()
        # the dominant share is at least the uniform share (top_share
        # is rounded to 6 dp, so allow that rounding times n_sources)
        assert (
            df["top_share"] * df["n_sources"] >= 1.0 - 1e-5 * df["n_sources"]
        ).all()


class TestIncrementalRefresh:
    def test_bit_equal_to_full_rerun(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from dtaidistance_ray.pipelines.refresh import refresh_tier0
        from dtaidistance_ray.sources.synth import derive_ts, token_table_arrow
        from dtaidistance_ray.stages.rollup import bucketize
        from dtaidistance_ray.stages.rollup_scan import scan_rollup_base_tier

        at = token_table_arrow(SPEC)
        ids = np.array([int(d[1:]) for d in at["doc_id"].to_pylist()], dtype=np.int64)
        ts = derive_ts(ids, SPEC)
        at = at.append_column("ts", pa.array(ts, pa.int64()))
        cut = int(np.quantile(ts, 0.8))
        old = rd.from_arrow(at.filter(pa.array(ts < cut)))
        delta_tbl = at.filter(pa.array(ts >= cut))
        delta = rd.from_arrow(delta_tbl)
        comb = rd.from_arrow(at)

        existing = scan_rollup_base_tier(bucketize(old, 3600, SPEC), CFG)
        refreshed, dk = refresh_tier0(existing, comb, delta, CFG, SPEC)
        full = scan_rollup_base_tier(bucketize(comb, 3600, SPEC), CFG)

        got = _canon(refreshed.to_pandas())
        want = _canon(full.to_pandas())
        assert len(got) == len(want)
        for col in ["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]:
            assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
        for col in ["agg_token_min", "agg_token_max", "agg_token_mean"]:
            np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy())
        for a, b in zip(got["repr_series"], want["repr_series"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # the dirty set is exactly the delta's (source, hour) groups
        want_dirty = set(
            zip(delta_tbl["source"].to_pylist(),
                (delta_tbl["ts"].to_numpy() // 3600).tolist())
        )
        assert set(zip(dk["source"], dk["bucket"])) == want_dirty
        # refresh really skipped clean groups: pass-through rows ==
        # total minus dirty
        assert len(got) - len(dk) == len(
            existing.to_pandas().merge(
                dk, on=["source", "bucket"], how="left", indicator=True
            ).query("_merge == 'left_only'")
        )


class TestSequentialMicroBatchIngest:
    def test_four_microbatches_bit_equal_to_one_shot(self, ray_session):
        """Streaming micro-batch loop: ingest the table as four
        time-ordered deltas, each applied with refresh_tier0 against the
        running tier-0 state; the final state must be bit-identical to
        the one-shot batch rollup. This is the continuous-ingest story
        (arrivals -> dirty buckets -> incremental recompute) iterated,
        not just a single refresh step."""
        import pyarrow as pa
        import ray.data as rd

        from dtaidistance_ray.pipelines.refresh import refresh_tier0
        from dtaidistance_ray.sources.synth import derive_ts, token_table_arrow
        from dtaidistance_ray.stages.rollup import bucketize
        from dtaidistance_ray.stages.rollup_scan import scan_rollup_base_tier

        at = token_table_arrow(SPEC)
        ids = np.array([int(d[1:]) for d in at["doc_id"].to_pylist()], dtype=np.int64)
        ts = derive_ts(ids, SPEC)
        at = at.append_column("ts", pa.array(ts, pa.int64()))
        qs = np.quantile(ts, [0.25, 0.5, 0.75]).astype(np.int64)
        edges = [ts.min() - 1, *qs.tolist(), ts.max() + 1]
        slices = [
            at.filter(pa.array((ts > edges[i]) & (ts <= edges[i + 1])))
            for i in range(4)
        ]
        assert all(s.num_rows > 0 for s in slices)

        state = scan_rollup_base_tier(
            bucketize(rd.from_arrow(slices[0]), 3600, SPEC), CFG
        ).materialize()
        seen = slices[0]
        for delta_tbl in slices[1:]:
            seen = pa.concat_tables([seen, delta_tbl])
            state, _ = refresh_tier0(
                state, rd.from_arrow(seen), rd.from_arrow(delta_tbl), CFG, SPEC
            )
            state = state.materialize()

        full = scan_rollup_base_tier(bucketize(rd.from_arrow(at), 3600, SPEC), CFG)
        got = _canon(state.to_pandas())
        want = _canon(full.to_pandas())
        assert len(got) == len(want)
        for col in ["source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"]:
            assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
        for col in ["agg_token_min", "agg_token_max", "agg_token_mean"]:
            np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy())
        for a, b in zip(got["repr_series"], want["repr_series"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSourceAnalytics:
    def test_coactivity_bounds(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_source_coactivity"](sf)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        assert (df["r"].abs() <= 1.0 + 1e-9).all()
        # every unordered pair exactly once
        assert (df["source_a"] < df["source_b"]).all()
        assert not df.duplicated(["source_a", "source_b"]).any()

    def test_mix_shift_exactness(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_source_mix_shift"](sf)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        # L1 of two probability vectors is in [0, 2]
        assert (df["l1_num"] >= 0).all()
        assert (df["l1_num"] <= 2 * df["denom"]).all()
        assert np.allclose(df["mix_shift"], (df["l1_num"] / df["denom"]).round(6))


class TestAvailabilityAndHhi:
    def test_availability(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_source_availability"](sf)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        assert (df["present_hours"] + df["missing_hours"] == df["span_hours"]).all()
        assert (df["longest_gap_hours"] <= df["missing_hours"]).all()
        assert ((df["n_gaps"] == 0) == (df["missing_hours"] == 0)).all()
        assert (df["availability"] <= 1.0).all() and (df["availability"] > 0).all()

    def test_hhi(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_source_hhi"](sf)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        # HHI bounds: [1/n, 1]
        assert (df["hhi"] <= 1.0).all()
        assert (df["hhi"] * df["n_sources"] >= 1.0 - 1e-5 * df["n_sources"]).all()
        assert (df["hhi_num"] <= df["denom"]).all()


class TestSourceAcf:
    def test_bounds_and_kernel(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_source_acf"](sf)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        assert (df["r"].abs() <= 1.0 + 1e-9).all()
        assert set(df["lag"]) <= {1, 24}
        # kernel cross-check on a hand series: acf of perfect period-2
        # alternation at lag 1 is -1
        x = np.array([5, 0] * 20, dtype=np.int64)
        a, c = x[:-1], x[1:]
        n = len(a)
        num = n * (a * c).sum() - a.sum() * c.sum()
        den = np.sqrt(
            float(n * (a * a).sum() - a.sum() ** 2)
            * float(n * (c * c).sum() - c.sum() ** 2)
        )
        assert round(num / den, 6) == -1.0


class TestExpireCheckpoint:
    def test_retention_sweep(self, ray_session, tmp_path):
        from dtaidistance_ray.state.checkpoint import (
            completed_shards,
            expire_checkpoint,
            read_manifest,
        )
        import glob

        import pyarrow.parquet as pq

        out = str(tmp_path / "store")
        spec = TokenTableSpec(num_rows=400, num_sources=4, max_len=24, ts_span=96 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 14400, 86400), dba_max_it=1)
        run_flagship(spec, cfg, out_dir=out, num_shards=4)
        shash = cfg.settings_hash()
        fp = f"synth:{spec.num_rows}:{spec.seed}:{spec.num_sources}:{spec.vocab}"
        valid_before = completed_shards(out, 0, shash, fp)
        assert valid_before  # sources hash into a subset of the 4 shards

        # sweep: keep last 10 hourly buckets, last 4 four-hour buckets
        m = expire_checkpoint(out, keeps=(10, 4, None))
        mb0 = m["max_bucket0"]
        assert m["expired"][0]["rows_dropped"] > 0
        for f in glob.glob(f"{out}/tier=0/shard=*/part-0.parquet"):
            b = pq.read_table(f, columns=["bucket"])["bucket"].to_pylist()
            assert all(x > mb0 - 10 for x in b)
        for f in glob.glob(f"{out}/tier=1/shard=*/part-0.parquet"):
            b = pq.read_table(f, columns=["bucket"])["bucket"].to_pylist()
            assert all(x > mb0 // 4 - 4 for x in b)
        # tier-2 untouched, manifests still validate (resume-safe) and
        # carry the retention lineage on swept shards
        assert 2 not in m["expired"]
        assert completed_shards(out, 0, shash, fp) == valid_before
        swept = [read_manifest(out, 0, s) for s in valid_before]
        assert any(mm and "retention" in mm for mm in swept)
        # manifest row counts match the files
        for s in valid_before:
            mm = read_manifest(out, 0, s)
            f = f"{out}/tier=0/shard={s}/{mm['file']}"
            assert mm["num_rows"] == pq.read_table(f).num_rows
        # idempotent: second sweep with the same policy drops nothing
        m2 = expire_checkpoint(out, keeps=(10, 4, None))
        assert m2["expired"].get(0, {"rows_dropped": 0})["rows_dropped"] == 0


class TestReprDrift:
    def test_drift_semantics(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        df = E.queries()["tokens_repr_drift"](sf)
        df = df.to_pandas() if hasattr(df, "to_pandas") else df
        t2 = E.queries()["tokens_rollup_tier2_full"](sf).to_pandas()
        real = t2[t2["gap_filled"] == 0]
        # one drift row per consecutive pair of REAL tier-2 buckets
        want_pairs = sum(max(0, len(g) - 1) for _, g in real.groupby("source"))
        assert len(df) == want_pairs
        assert (df["d"] >= 0).all()
        assert (df["prev_bucket"] < df["bucket"]).all()


class TestTier3Promotion:
    def test_weekly_promotion_conserves(self, ray_session):
        import __ray_entry__ as E

        sf = "/root/testdata/sf0.001"
        t3 = E.queries()["tokens_rollup_tier3_aggs"](sf).to_pandas()
        t2 = E.queries()["tokens_rollup_tier0_aggs"](sf).to_pandas()
        # conservation: weekly sums equal the sums of the hourly tier
        assert t3["agg_count"].sum() == t2["agg_count"].sum()
        assert t3["agg_token_sum"].sum() == t2["agg_token_sum"].sum()
        # weekly buckets are the hourly buckets / 168
        assert set(t3["bucket"]) == set(t2["bucket"] // 168)


class TestServeRange:
    def test_tiered_read_path(self, ray_session, tmp_path):
        from dtaidistance_ray.pipelines.serve import serve_range
        from dtaidistance_ray.state.checkpoint import expire_checkpoint

        out = str(tmp_path / "store")
        spec = TokenTableSpec(num_rows=600, num_sources=3, max_len=24, ts_span=120 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 14400, 86400), dba_max_it=1)
        run_flagship(spec, cfg, out_dir=out, num_shards=4)
        m = expire_checkpoint(out, keeps=(12, 12, None))
        mb0 = m["max_bucket0"]

        import glob

        import pyarrow.parquet as pq

        srcs = set()
        for f in glob.glob(f"{out}/tier=2/shard=*/*.parquet"):
            srcs |= set(pq.read_table(f, columns=["source"])["source"].to_pylist())
        src = sorted(srcs)[0]

        res = serve_range(out, src, mb0 - 60, mb0 + 1)
        assert len(res) == 61
        # the recent window is served by tier 0, older hours by coarser tiers
        recent = res[res["hour"] > mb0 - 12]
        assert (recent[recent["served_tier"] >= 0]["served_tier"] <= 1).any()
        old = res[res["hour"] <= mb0 - 50]
        assert (old["served_tier"] != 0).all()  # tier-0 TTL expired there
        assert set(res["served_tier"]) <= {-1, 0, 1, 2}
        # served values equal the store's rows for that tier/bucket
        hit = res[res["served_tier"] == 2].head(1)
        if len(hit):
            b = int(hit["bucket"].iloc[0])
            rows = []
            for f in glob.glob(f"{out}/tier=2/shard=*/*.parquet"):
                df = pq.read_table(f).to_pandas()
                rows.append(df[(df["source"] == src) & (df["bucket"] == b)])
            want = pd.concat(rows)
            assert int(hit["agg_count"].iloc[0]) == int(want["agg_count"].iloc[0])

        # crashed-swap leftovers must be INVISIBLE to the serve path: a
        # shard=N.old-* dir holding a stale pre-sweep copy used to be
        # matched by the shard glob and served expired buckets back to
        # life (round-5 review finding)
        import shutil

        live = glob.glob(f"{out}/tier=0/shard=*")[0]
        stale = f"{out}/tier=0/{os.path.basename(live)}.old-deadbeef"
        shutil.copytree(live, stale)
        # poison the stale copy so any read of it would shift results
        for f in glob.glob(f"{stale}/*.parquet"):
            df = pq.read_table(f).to_pandas()
            df["agg_count"] = df["agg_count"] + 10_000
            df.to_parquet(f, index=False)
        res2 = serve_range(out, src, mb0 - 60, mb0 + 1)
        pd.testing.assert_frame_equal(res2, res)
        shutil.rmtree(stale)


class TestCompaction:
    def test_compact_preserves_serves_and_layout(self, ray_session, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from dtaidistance_ray.pipelines.serve import serve_range
        from dtaidistance_ray.state.checkpoint import compact_store, expire_checkpoint

        out = str(tmp_path / "store")
        spec = TokenTableSpec(num_rows=600, num_sources=3, max_len=24, ts_span=120 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 14400, 86400), dba_max_it=1)
        run_flagship(spec, cfg, out_dir=out, num_shards=6)
        m = expire_checkpoint(out, keeps=(12, 12, None))
        mb0 = m["max_bucket0"]

        srcs = set()
        for f in glob.glob(f"{out}/tier=2/shard=*/*.parquet"):
            srcs |= set(pq.read_table(f, columns=["source"])["source"].to_pylist())
        before = {s: serve_range(out, s, mb0 - 60, mb0 + 1) for s in sorted(srcs)}
        rows_before = {
            t: sum(
                pq.read_table(f).num_rows
                for f in glob.glob(f"{out}/tier={t}/shard=*/*.parquet")
            )
            for t in (0, 1, 2)
        }

        metrics = compact_store(out, target_shards=2)
        # layout: exactly 2 shards per tier, no .old/.tmp leftovers
        for t in (0, 1, 2):
            names = sorted(
                os.path.basename(d) for d in glob.glob(f"{out}/tier={t}/shard=*")
            )
            assert names == ["shard=0", "shard=1"]
            assert metrics["tiers"][t]["shards_after"] == 2
            assert metrics["tiers"][t]["rows"] == rows_before[t]
        assert not glob.glob(f"{out}/tier=*.old-*") and not glob.glob(f"{out}/tier=*.tmp-*")
        # row conservation per tier
        for t in (0, 1, 2):
            got = sum(
                pq.read_table(f).num_rows
                for f in glob.glob(f"{out}/tier={t}/shard=*/*.parquet")
            )
            assert got == rows_before[t]
        # every served aggregate identical after compaction
        for s, want in before.items():
            got = serve_range(out, s, mb0 - 60, mb0 + 1)
            pd.testing.assert_frame_equal(got, want)
        # manifests carry the compaction lineage record
        import json

        with open(f"{out}/tier=0/shard=0/_manifest.json") as f:
            man = json.load(f)
        assert man["compaction"]["merged_from"] >= 1
        assert man["settings_hash"] != "mixed"
        # idempotent: compacting again conserves rows and serves; a crashed
        # compaction's leftover dirs are ignored by readers and cleared here
        os.makedirs(f"{out}/tier=0.old-dead/shard=9", exist_ok=True)
        os.makedirs(f"{out}/tier=1.tmp-dead", exist_ok=True)
        # second pass goes through the SEQUENTIAL path (first used the
        # parallel ray.remote path, Ray being up) — both must serve equal
        compact_store(out, target_shards=2, parallel=False)
        assert not glob.glob(f"{out}/tier=*.old-*") and not glob.glob(f"{out}/tier=*.tmp-*")
        for s, want in before.items():
            pd.testing.assert_frame_equal(serve_range(out, s, mb0 - 60, mb0 + 1), want)
        # retention audit records must not duplicate across compactions:
        # rows_dropped summed over ALL shard manifests still equals the
        # expire sweep's count after TWO compact cycles (the union used
        # to be copied into every output shard, multiplying the records
        # ~target_shards-fold per cycle — round-5 review finding)
        for t in (0, 1):
            exp = m["expired"].get(t)
            if not exp:
                continue
            tot = 0
            for mp in glob.glob(f"{out}/tier={t}/shard=*/_manifest.json"):
                with open(mp) as fh:
                    tot += sum(
                        r.get("rows_dropped", 0)
                        for r in json.load(fh).get("retention", [])
                    )
            assert tot == exp["rows_dropped"]


class TestStoreStats:
    def test_integrity_and_fault_injection(self, ray_session, tmp_path):
        import glob
        import json

        from dtaidistance_ray.state.checkpoint import store_stats

        out = str(tmp_path / "store")
        spec = TokenTableSpec(num_rows=400, num_sources=3, max_len=24, ts_span=48 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 14400, 86400), dba_max_it=1)
        run_flagship(spec, cfg, out_dir=out, num_shards=4)
        rows = store_stats(out)
        assert [r["tier"] for r in rows] == [0, 1, 2]
        assert all(r["n_rows"] > 0 and r["min_bucket"] <= r["max_bucket"] for r in rows)
        # fault injection: doctor one manifest's num_rows -> loud failure
        mp = sorted(glob.glob(f"{out}/tier=0/shard=*/_manifest.json"))[0]
        m = json.load(open(mp))
        m["num_rows"] += 1
        json.dump(m, open(mp, "w"))
        with pytest.raises(AssertionError, match="tier 0"):
            store_stats(out)


class TestServePruning:
    def test_manifest_zone_map_prunes_reads(self, ray_session, tmp_path, monkeypatch):
        import glob

        import pyarrow.parquet as real_pq

        from dtaidistance_ray.pipelines import serve as serve_mod
        from dtaidistance_ray.pipelines.serve import serve_range

        out = str(tmp_path / "store")
        spec = TokenTableSpec(num_rows=600, num_sources=4, max_len=24, ts_span=96 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 14400, 86400), dba_max_it=1)
        run_flagship(spec, cfg, out_dir=out, num_shards=8)
        mb0 = max(
            int(real_pq.read_table(f, columns=["bucket"])["bucket"].to_pandas().max())
            for f in glob.glob(f"{out}/tier=0/shard=*/*.parquet")
        )

        opened = []

        class CountingPq:
            @staticmethod
            def read_table(path, **kw):
                opened.append(path)
                return real_pq.read_table(path, **kw)

        monkeypatch.setattr(serve_mod, "pq", CountingPq)
        res = serve_range(out, "source_000", mb0 - 24, mb0 + 1)
        assert len(res) == 25
        # zone-map pruning: at most one parquet opened per tier (the
        # shard whose manifest lists the source), not one per shard
        assert len(opened) <= 3, opened
        # served values still correct: identical to the unpruned filter path
        monkeypatch.setattr(serve_mod, "pq", real_pq)
        for d in glob.glob(f"{out}/tier=*/shard=*/_manifest.json"):
            os.rename(d, d + ".hidden")
        want = serve_range(out, "source_000", mb0 - 24, mb0 + 1)
        pd.testing.assert_frame_equal(res, want)


class TestCrashRecovery:
    """The checkpoint store's atomic swaps must leave a recoverable
    layout at EVERY crash point (the round-3 review found two windows
    where a crash + the next sweep's leftover-clearing lost data).
    Simulate each crash state by hand-arranging the dirs, then assert
    the next sweep/compaction restores the tier bit-identically."""

    def _build(self, tmp_path):
        out = str(tmp_path / "store")
        spec = TokenTableSpec(num_rows=300, num_sources=3, max_len=24, ts_span=48 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 14400, 86400), dba_max_it=1)
        run_flagship(spec, cfg, out_dir=out, num_shards=3)
        return out

    def _tier_rows(self, out, t):
        import glob

        import pyarrow.parquet as pq

        tabs = [
            pq.read_table(f)
            for f in sorted(glob.glob(f"{out}/tier={t}/shard=*/*.parquet"))
            if ".old-" not in f and ".tmp-" not in f
        ]
        import pyarrow as pa

        df = pa.concat_tables(tabs).to_pandas()
        return df.sort_values(list(df.columns)[:3]).reset_index(drop=True)

    def test_compact_crash_between_renames_recovers_tier(self, ray_session, tmp_path):
        import glob
        import shutil

        from dtaidistance_ray.state.checkpoint import compact_store

        out = self._build(tmp_path)
        want = self._tier_rows(out, 0)
        # crash state: tier=0 renamed away, staged tmp present, no tier=0
        os.rename(f"{out}/tier=0", f"{out}/tier=0.old-crash1")
        shutil.copytree(f"{out}/tier=1", f"{out}/tier=0.tmp-crash1")
        assert not os.path.isdir(f"{out}/tier=0")
        compact_store(out, target_shards=2, parallel=False)
        # the old copy was restored BEFORE leftover clearing, then compacted
        assert not glob.glob(f"{out}/tier=*.old-*") and not glob.glob(f"{out}/tier=*.tmp-*")
        got = self._tier_rows(out, 0)
        pd.testing.assert_frame_equal(got, want)

    def test_expire_crash_orphan_tmp_promoted(self, ray_session, tmp_path):
        import glob
        import shutil

        from dtaidistance_ray.state.checkpoint import (
            _recover_shard_leftovers,
            expire_checkpoint,
            store_stats,
        )

        out = self._build(tmp_path)
        tier_dir = f"{out}/tier=0"
        shard = sorted(os.listdir(tier_dir))[0]
        final = os.path.join(tier_dir, shard)
        # crash state A (old expire code): final rmtree'd, complete tmp orphan
        shutil.copytree(final, final + ".tmp-crashA")
        shutil.rmtree(final)
        _recover_shard_leftovers(tier_dir)
        assert os.path.isdir(final) and not glob.glob(f"{tier_dir}/shard=*.tmp-*")
        store_stats(out)  # manifests still consistent with parquet
        # crash state B (new ordering): final -> .old, tmp not yet renamed
        shutil.copytree(final, final + ".tmp-crashB")
        os.rename(final, final + ".old-crashB")
        expire_checkpoint(out, keeps=(10**9, None, None))  # sweep triggers recovery
        assert os.path.isdir(final)
        assert not glob.glob(f"{tier_dir}/shard=*.tmp-*")
        assert not glob.glob(f"{tier_dir}/shard=*.old-*")
        store_stats(out)
        # crash state C: swap completed, stale .old left behind -> cleared
        shutil.copytree(final, final + ".old-crashC")
        _recover_shard_leftovers(tier_dir)
        assert os.path.isdir(final) and not glob.glob(f"{tier_dir}/shard=*.old-*")
        store_stats(out)


class TestKeyShardFallback:
    """Round-3 review #2: the flagship's two remaining driver frames
    (the scan fold's merged key state; downstream_fused's tier0_df)
    must shard behind a key-count threshold — forced here on small
    data, asserting BIT-identical tiers (per-key independence makes
    the output invariant under any key partition)."""

    def test_scan_key_shards_bit_identical(self, ray_session, monkeypatch):
        from dtaidistance_ray.pipelines.flagship import bucketize
        from dtaidistance_ray.stages import rollup_scan

        spec = TokenTableSpec(num_rows=200, num_sources=5, max_len=24, ts_span=24 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 14400), dba_max_it=2)
        ds = token_table(spec, override_num_blocks=8)
        base = _canon(
            rollup_scan.scan_rollup_base_tier(
                bucketize(ds, cfg.tier_widths[0], spec), cfg
            ).to_pandas()
        )
        # key space here is ~5 sources x 24 hours; threshold 20 forces
        # ceil(upper_bound/20) >= 4 shards
        monkeypatch.setattr(rollup_scan, "_MAX_DRIVER_KEYS", 20)
        ds2 = token_table(spec, override_num_blocks=8)
        got = _canon(
            rollup_scan.scan_rollup_base_tier(
                bucketize(ds2, cfg.tier_widths[0], spec), cfg
            ).to_pandas()
        )
        assert rollup_scan.LAST_TIMINGS.get("key_shards", 1) >= 4
        # single-pass split: exactly one split task per input block —
        # the input is scanned once, not once per shard
        assert rollup_scan.LAST_TIMINGS["key_shard_split_tasks"] == (
            rollup_scan.LAST_TIMINGS["key_shard_input_blocks"]
        )
        assert len(got) == len(base)
        for col in ("source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
            assert (got[col].to_numpy() == base[col].to_numpy()).all(), col
        for a, b in zip(got["repr_series"], base["repr_series"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_exchange_bit_identical(self, ray_session, monkeypatch):
        from dtaidistance_ray.pipelines.flagship import (
            _downstream_fused_exchange,
            build_tiers,
            downstream_fused,
        )
        from dtaidistance_ray.stages import rollup_scan

        spec = TokenTableSpec(num_rows=150, num_sources=4, max_len=32, ts_span=12 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 7200), dba_max_it=2)
        tiers = build_tiers(token_table(spec), spec, cfg)

        def canon(df):
            df = df.copy()
            df["repr_series"] = df["repr_series"].map(
                lambda v: tuple(np.asarray(v, dtype=np.float64))
            )
            df["repr_gorilla"] = df["repr_gorilla"].map(bytes)
            return df.sort_values(
                ["tier", "source", "bucket"], kind="mergesort"
            ).reset_index(drop=True)

        want = canon(downstream_fused(tiers[0], cfg).to_pandas())
        got = canon(_downstream_fused_exchange(tiers[0], cfg).to_pandas())
        pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
        # and the dispatcher itself switches on the threshold (same
        # module attribute as the scan path's key-shard cutoff)
        monkeypatch.setattr(rollup_scan, "_MAX_DRIVER_KEYS", 1)
        got2 = canon(downstream_fused(tiers[0], cfg).to_pandas())
        pd.testing.assert_frame_equal(got2[want.columns], want, check_dtype=False)


class TestLateArrivalRefresh:
    def test_out_of_order_dirty_sparse_and_bit_equal(self, ray_session):
        """Watermark semantics: late-arriving docs (arrival independent
        of ts) dirty only their own (source, hour) groups — scattered
        BELOW the watermark — and the refreshed tier equals a full
        rerun bit-for-bit while the dirty set stays sparse."""
        import ray.data as rd

        import __ray_entry__ as E
        from dtaidistance_ray.pipelines.refresh import dirty_keys, refresh_tier0
        from dtaidistance_ray.stages.rollup import bucketize
        from dtaidistance_ray.stages.rollup_scan import scan_rollup_base_tier

        sf = "/root/testdata/sf0.001"
        path = E._ensure_token_parquet(sf)
        cfg = RollupConfig()
        comb = rd.read_parquet(path)
        full = _canon(
            scan_rollup_base_tier(bucketize(comb, cfg.tier_widths[0], None), cfg).to_pandas()
        )

        got = (
            E.queries()["tokens_late_arrival_refresh"](sf)
            .to_pandas()
            .sort_values(["source", "bucket"])
            .reset_index(drop=True)
        )
        want = full[got.columns].sort_values(["source", "bucket"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)

        # dirty set: sparse, and genuinely out-of-order (buckets below
        # the on-time watermark get re-rolled)
        import pyarrow as pa
        import pyarrow.compute as pc_

        def late_filter(b):
            n = pc_.cast(
                pc_.utf8_slice_codeunits(b["doc_id"], 1, 99), pa.int64()
            ).to_numpy(zero_copy_only=False)
            return b.filter(pa.array(n % 16 == 7))

        delta = rd.read_parquet(path).map_batches(late_filter, batch_format="pyarrow")
        dk = dirty_keys(delta, cfg, None)
        total_groups = len(full)
        assert 0 < len(dk) < total_groups // 2  # sparse
        watermark_bucket = int(full["bucket"].max())
        assert (dk["bucket"] < watermark_bucket).any()  # below the watermark


class TestTaskRetryBitExact:
    def test_worker_crash_retry_bit_identical(self, ray_session, tmp_path):
        """Kill ONE worker process mid-pipeline (os._exit from inside a
        map_batches task) and let Ray's task retry re-execute its
        lineage: tier-0 output must stay BIT-identical to the fault-free
        run. This is the at-scale claim the member-order-deterministic
        accumulation (kernels/dba_scan) makes testable — retries can
        re-partition/reorder work arbitrarily without changing a bit."""
        from dtaidistance_ray.stages.rollup import bucketize
        from dtaidistance_ray.stages.rollup_scan import scan_rollup_base_tier
        import pyarrow as pa

        base = _canon(
            scan_rollup_base_tier(
                bucketize(token_table(SPEC, override_num_blocks=6), CFG.tier_widths[0], SPEC),
                CFG,
            ).to_pandas()
        )

        marker = str(tmp_path / "crash_once")

        def crash_once(batch: pa.Table) -> pa.Table:
            import os as _os

            try:
                fd = _os.open(marker, _os.O_CREAT | _os.O_EXCL)
                _os.close(fd)
            except FileExistsError:
                return batch
            _os._exit(1)  # hard worker death, not an application exception

        ds = token_table(SPEC, override_num_blocks=6).map_batches(
            crash_once, batch_format="pyarrow"
        )
        got = _canon(
            scan_rollup_base_tier(bucketize(ds, CFG.tier_widths[0], SPEC), CFG).to_pandas()
        )
        assert os.path.exists(marker), "fault never fired"
        assert len(got) == len(base)
        for col in ("source", "bucket", "agg_count", "agg_n_tok_sum", "agg_token_sum"):
            assert (got[col].to_numpy() == base[col].to_numpy()).all(), col
        for a, b in zip(got["repr_series"], base["repr_series"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTaskRetryFullPath:
    def test_worker_crash_full_flagship_path_bit_identical(self, ray_session, tmp_path):
        """Same worker-death injection, but through the WHOLE flagship
        DAG — tier-0 scan plus the fused downstream pass (tier
        promotion, gap-fill, Gorilla encode) — so the retry exercises
        the actor-pool / map_groups stages too. Every tier row,
        including encoded payload bytes, must be bit-identical."""
        import pyarrow as pa
        from dtaidistance_ray.pipelines.flagship import downstream_fused
        from dtaidistance_ray.stages.rollup import bucketize
        from dtaidistance_ray.stages.rollup_scan import scan_rollup_base_tier

        spec = TokenTableSpec(num_rows=150, num_sources=4, max_len=32, ts_span=12 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 7200), dba_max_it=2)

        def full(ds):
            tier0 = scan_rollup_base_tier(bucketize(ds, cfg.tier_widths[0], spec), cfg)
            df = downstream_fused(tier0, cfg).to_pandas()
            df["repr_series"] = df["repr_series"].map(
                lambda v: tuple(np.asarray(v, dtype=np.float64))
            )
            df["repr_gorilla"] = df["repr_gorilla"].map(bytes)
            return df.sort_values(
                ["tier", "source", "bucket"], kind="mergesort"
            ).reset_index(drop=True)

        base = full(token_table(spec, override_num_blocks=5))

        marker = str(tmp_path / "crash_once_full")

        def crash_once(batch: pa.Table) -> pa.Table:
            import os as _os

            try:
                fd = _os.open(marker, _os.O_CREAT | _os.O_EXCL)
                _os.close(fd)
            except FileExistsError:
                return batch
            _os._exit(1)

        got = full(
            token_table(spec, override_num_blocks=5).map_batches(
                crash_once, batch_format="pyarrow"
            )
        )
        assert os.path.exists(marker), "fault never fired"
        pd.testing.assert_frame_equal(got, base, check_dtype=False)


class TestTaskRetryWritePath:
    def test_worker_crash_during_shard_write_store_consistent(self, ray_session, tmp_path):
        """Sink-side fault injection: a write task dies AFTER leaving a
        half-written tmp dir but BEFORE the atomic rename; Ray's retry
        re-runs the write. The store must end fully consistent — every
        shard's manifest validates, the orphan tmp dir is ignored by
        completed_shards, and total persisted rows equal the tier's."""
        import pyarrow as pa
        from dtaidistance_ray.pipelines.flagship import build_tiers, source_shard
        from dtaidistance_ray.state.checkpoint import completed_shards, write_shard_atomic

        spec = TokenTableSpec(num_rows=150, num_sources=4, max_len=32, ts_span=12 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 7200), dba_max_it=1)
        out = str(tmp_path / "store")
        marker = str(tmp_path / "crash_write")
        num_shards = 4

        tier0 = encode_tier(gap_fill_tier(build_tiers(token_table(spec), spec, cfg)[0]))
        expect_rows = tier0.count()

        def add_shard(b: pd.DataFrame) -> pd.DataFrame:
            b["shard"] = [source_shard(s, num_shards) for s in b["source"]]
            return b

        def write_shard(g: pd.DataFrame) -> pd.DataFrame:
            import os as _os

            shard = int(g["shard"].iloc[0])
            try:
                fd = _os.open(marker, _os.O_CREAT | _os.O_EXCL)
                _os.close(fd)
                # die mid-write: orphan tmp dir, final rename never runs
                tmpdir = f"{out}/tier=0/shard={shard}.tmp-dead"
                _os.makedirs(tmpdir, exist_ok=True)
                with open(f"{tmpdir}/part-0.parquet", "wb") as f:
                    f.write(b"partial garbage")
                _os._exit(1)
            except FileExistsError:
                pass
            g = g.sort_values(["source", "bucket"], kind="mergesort").drop(columns=["shard"])
            t = pa.Table.from_pandas(g, preserve_index=False)
            m = write_shard_atomic(out, 0, shard, t, "h", "fp", 0.0)
            return pd.DataFrame({"shard": [m.shard], "rows": [m.num_rows]})

        written = (
            tier0.map_batches(add_shard, batch_format="pandas")
            .groupby("shard")
            .map_groups(write_shard, batch_format="pandas")
            .to_pandas()
        )
        assert os.path.exists(marker), "fault never fired"
        assert written["rows"].sum() == expect_rows
        done = completed_shards(out, 0, "h", "fp")
        assert done == set(written["shard"]), "orphan tmp confused the manifest scan"
        # every persisted shard parquet is readable and row-complete
        total = 0
        for s in sorted(done):
            t = pd.read_parquet(f"{out}/tier=0/shard={s}/part-0.parquet")
            total += len(t)
        assert total == expect_rows


class TestCLIMaintenanceVerbs:
    def test_stats_and_serve_without_rerun(self, ray_session, tmp_path, capsys):
        """--stats / --serve operate on an existing store (no pipeline
        rerun, no Ray requirement): stats mirror store_stats, served
        hours mirror serve_range."""
        import json

        from dtaidistance_ray.cli import main as cli_main
        from dtaidistance_ray.pipelines.flagship import run_flagship
        from dtaidistance_ray.sources.synth import TokenTableSpec
        from dtaidistance_ray.state.checkpoint import store_stats

        out = str(tmp_path / "cli_store")
        spec = TokenTableSpec(num_rows=400)
        run_flagship(spec, out_dir=out, num_shards=4)
        assert cli_main(["--out", out, "--stats"]) == 0
        got = json.loads(capsys.readouterr().out)
        want = store_stats(out)
        assert got["stats"] == json.loads(json.dumps(want, default=str))
        t0 = [r for r in want if r["tier"] == 0][0]
        lo = int(t0["min_bucket"])
        assert cli_main(["--out", out, "--serve", "source_000", str(lo), str(lo + 4)]) == 0
        served = json.loads(capsys.readouterr().out)["serve"]
        assert [r["hour"] for r in served] == list(range(lo, lo + 4))
        assert all(r["served_tier"] in (-1, 0, 1, 2) for r in served)


class TestRound5ReviewFixes:
    """Regressions for the round-5 maintenance-path review findings:
    .old- swap leftovers crashing compact_store/store_stats, recovery
    order discarding a completed rewrite, stale-scheme resume after
    compaction duplicating rows, nondeterministic nested-dir input
    fingerprints, and the fused empty-tier0 schema mismatch."""

    def _small_store(self, tmp_path, num_shards=4):
        out = str(tmp_path / "store")
        spec = TokenTableSpec(num_rows=120, num_sources=4, max_len=24, ts_span=12 * 3600)
        cfg = RollupConfig(tier_widths=(3600, 7200), dba_max_it=1)
        run_flagship(spec, cfg, out_dir=out, num_shards=num_shards)
        return out, spec, cfg

    def test_old_leftover_does_not_crash_maintenance(self, ray_session, tmp_path):
        import glob

        from dtaidistance_ray.state.checkpoint import compact_store, store_stats

        out, _, _ = self._small_store(tmp_path)
        # crashed expire swap state: a .old- copy next to the live shard
        os.makedirs(f"{out}/tier=0/shard=0.old-dead", exist_ok=True)
        stats = store_stats(out, tiers=(0, 1))  # used to raise ValueError
        assert stats[0]["n_rows"] > 0
        compact_store(out, target_shards=2, parallel=False)  # ditto
        assert not glob.glob(f"{out}/tier=0/shard=*.old-*")

    def test_recovery_promotes_complete_tmp_over_old(self, tmp_path):
        import json

        from dtaidistance_ray.state.checkpoint import _recover_shard_leftovers

        tier_dir = str(tmp_path / "tier=0")
        for name, rows in (("shard=5.old-aa", 10), ("shard=5.tmp-bb", 7)):
            d = os.path.join(tier_dir, name)
            os.makedirs(d)
            with open(os.path.join(d, "_manifest.json"), "w") as f:
                json.dump({"num_rows": rows}, f)
        _recover_shard_leftovers(tier_dir)
        # the COMPLETE .tmp- rewrite wins (it is the finished retention
        # work); plain sorted order would restore the stale .old- copy
        with open(os.path.join(tier_dir, "shard=5", "_manifest.json")) as f:
            assert json.load(f)["num_rows"] == 7
        assert sorted(os.listdir(tier_dir)) == ["shard=5"]

    def test_resume_after_compaction_recomputes_not_duplicates(self, ray_session, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from dtaidistance_ray.state.checkpoint import (
            compact_store,
            completed_shards,
            store_stats,
        )

        out, spec, cfg = self._small_store(tmp_path, num_shards=4)
        rows_before = {
            t: sum(
                pq.read_table(f).num_rows
                for f in glob.glob(f"{out}/tier={t}/shard=*/*.parquet")
            )
            for t in (0, 1)
        }
        compact_store(out, target_shards=2, parallel=False)
        # compacted manifests record the NEW scheme; a resume under the
        # stale pre-compaction count must validate NOTHING...
        m = run_flagship(spec, cfg, out_dir=out, num_shards=4)
        assert all(len(v) == 0 for v in m["skipped_shards"].values())
        # ...and the full recompute leaves a consistent, non-duplicated
        # store (overwrite-in-place): same rows per tier as originally
        stats = store_stats(out, tiers=(0, 1))
        for t in (0, 1):
            got = sum(
                pq.read_table(f).num_rows
                for f in glob.glob(f"{out}/tier={t}/shard=*/*.parquet")
            )
            assert got == rows_before[t], t
        # and a SAME-scheme resume still skips everything
        shash, fp = m["settings_hash"], m["input_fingerprint"]
        assert completed_shards(out, 0, shash, fp, num_shards=4)
        assert not completed_shards(out, 0, shash, fp, num_shards=2)

    def test_fingerprint_nested_dirs_deterministic(self, tmp_path):
        from dtaidistance_ray.pipelines.flagship import _parquet_fingerprint

        root = tmp_path / "pq"
        for sub in ("b=2", "a=1", "c=3"):
            (root / sub).mkdir(parents=True)
            (root / sub / "part-0.parquet").write_bytes(sub.encode() * 10)
        fp1 = _parquet_fingerprint(str(root))
        fp2 = _parquet_fingerprint(str(root))
        assert fp1 == fp2
        (root / "a=1" / "part-0.parquet").write_bytes(b"changed!!")
        assert _parquet_fingerprint(str(root)) != fp1

    def test_fused_empty_tier0_schema(self, ray_session):
        from dtaidistance_ray.pipelines.flagship import downstream_fused
        from dtaidistance_ray.stages.rollup import TIER_SCHEMA_COLS

        empty = pd.DataFrame({c: [] for c in TIER_SCHEMA_COLS})
        fused = downstream_fused(empty, CFG)

        def tier_counts(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.groupby("tier", as_index=False).size()

        parts = fused.map_batches(tier_counts, batch_format="pandas").to_pandas()
        assert len(parts) == 0  # no KeyError: 'tier' on the empty block
        cols = fused.schema().names
        assert cols[0] == "tier" and "repr_gorilla" in cols and "sid" not in cols
