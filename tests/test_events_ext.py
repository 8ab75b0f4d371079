"""Extended events-table timeseries operators vs DuckDB at sf0.001 —
the same SQL the driver gate uses, run in-process: OHLC downsample,
counter increase() with resets, linear-interpolation gap-fill, EWMA.
Values are asserted EXACTLY (check_exact) — these operators are
designed bit-equal to their oracles."""

import duckdb
import numpy as np
import pandas as pd

from dtaidistance_ray.stages import events

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _run(q):
    r = q(SF)
    return r.to_pandas() if hasattr(r, "to_pandas") else r


class TestEventsExtended:
    def test_ohlc_hourly(self, ray_session):
        got = _canon(_run(events.ohlc_hourly))
        want = _canon(_duck(events.OHLC_HOURLY_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # open/close come from real rows: every value within [low, high]
        assert (got["open"] >= got["low"]).all() and (got["open"] <= got["high"]).all()
        assert (got["close"] >= got["low"]).all() and (got["close"] <= got["high"]).all()

    def test_counter_increase(self, ray_session):
        got = _canon(_run(events.counter_increase))
        want = _canon(_duck(events.COUNTER_INCREASE_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert (got["increase"] >= 0).all()

    def test_counter_increase_reset_semantics(self, ray_session):
        # hand-check one user against a sequential replay
        ev = pd.read_parquet(f"{SF}/events.parquet")
        uid = ev["user_id"].iloc[0]
        mine = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
        c = np.round(mine["value"].to_numpy() * 100).astype(np.int64)
        inc = 0
        resets = 0
        for i in range(1, len(c)):
            if c[i] >= c[i - 1]:
                inc += c[i] - c[i - 1]
            else:
                inc += c[i]
                resets += 1
        got = _run(events.counter_increase)
        row = got[got["user_id"] == uid].iloc[0]
        assert row["increase"] == inc / 100.0
        assert row["n_resets"] == resets

    def test_hourly_lerp(self, ray_session):
        got = _canon(_run(events.rollup_hourly_lerp))
        want = _canon(_duck(events.ROLLUP_LERP_SQL))
        # bit-equal including the interpolated rows
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # filled rows exist and lie between their neighbors' hull
        assert got["filled"].sum() > 0

    def test_hourly_ewma(self, ray_session):
        got = _canon(_run(events.hourly_ewma))
        want = _canon(_duck(events.HOURLY_EWMA_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # EWMA stays inside the data's convex hull per type
        for _, g in got.groupby("event_type"):
            lo, hi = g["n_events"].min(), g["n_events"].max()
            assert (g["ewma"] >= lo - 1e-9).all() and (g["ewma"] <= hi + 1e-9).all()


class TestTimeseriesAnalytics:
    def test_xcorr_lags(self, ray_session):
        got = _canon(_run(events.hourly_xcorr_lags))
        want = _canon(_duck(events.HOURLY_XCORR_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        assert got["corr"].between(-1.0000001, 1.0000001).all()
        # zero lag of a pair with itself would be 1; cross pairs need not be,
        # but every (pair) must include the full lag grid where overlap >= 2
        assert got["lag"].between(-6, 6).all()

    def test_cusum(self, ray_session):
        got = _canon(_run(events.hourly_cusum_changepoints))
        want = _canon(_duck(events.HOURLY_CUSUM_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        assert (got["cpos"] >= 0).all() and (got["cneg"] >= 0).all()

    def test_cusum_detects_injected_shift(self, ray_session):
        # pure-kernel sanity: a mean shift after the training window
        # must raise the positive CUSUM over threshold
        rng = np.random.default_rng(7)
        x = np.concatenate([rng.poisson(5, 200), rng.poisson(25, 48)])
        mu = x[:168].mean()
        sd = x[:168].std(ddof=1)
        p = 0.0
        alarms = 0
        for v in x[168:]:
            p = max(0.0, p + (v - mu) / sd - 0.5)
            alarms += p > 5.0
        assert alarms > 0

    def test_holt(self, ray_session):
        got = _canon(_run(events.hourly_holt))
        want = _canon(_duck(events.HOURLY_HOLT_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # one-step-ahead forecast equals previous level + previous trend
        for _, g in got.groupby("event_type"):
            g = g.sort_values("bucket")
            f = (g["level"] + g["trend"]).to_numpy()[:-1]
            assert np.array_equal(f, g["forecast"].to_numpy()[1:])


class TestPercentilesAndFunnel:
    def test_percentiles_vs_sql_and_sorted_oracle(self, ray_session):
        got = _canon(_run(events.value_percentiles_daily))
        want = _canon(_duck(events.VALUE_PERCENTILES_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # cross-check one group against a plain sorted-array percentile
        ev = pd.read_parquet(f"{SF}/events.parquet")
        ev["day"] = ev["ts"].dt.floor("D")
        et, day = got.iloc[0]["event_type"], got.iloc[0]["day"]
        vals = np.sort(
            np.round(
                ev[(ev["event_type"] == et) & (ev["day"] == day)]["value"].to_numpy() * 100
            ).astype(np.int64)
        )
        n = len(vals)
        row = got[(got["event_type"] == et) & (got["day"] == day)].iloc[0]
        for q, col in [(50, "p50"), (90, "p90"), (99, "p99")]:
            rank = (q * n + 99) // 100
            assert row[col] == vals[rank - 1] / 100.0
        assert (got["p50"] <= got["p90"]).all() and (got["p90"] <= got["p99"]).all()

    def test_funnel_vs_sql(self, ray_session):
        got = _canon(_run(events.funnel_stages))
        want = _canon(_duck(events.FUNNEL_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # stage monotonicity: purchase latency >= click latency when both present
        both = got[(got["us_view_to_click"] >= 0) & (got["us_view_to_purchase"] >= 0)]
        assert (both["us_view_to_purchase"] > both["us_view_to_click"]).all()
        assert got["funnel_stage"].between(0, 3).all()


class TestRetentionCohorts:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.retention_cohorts))
        want = _canon(_duck(events.RETENTION_COHORTS_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # triangle invariants: offset-0 row is the full cohort; counts
        # never exceed the cohort; ratio in (0, 1]
        base = got[got["day_offset"] == 0]
        assert (base["n_users"] == base["cohort_size"]).all()
        assert (got["n_users"] <= got["cohort_size"]).all()
        assert (got["retention_pct"] > 0).all() and (got["retention_pct"] <= 1).all()

    def test_hand_built(self, ray_session, tmp_path):
        # u1 active day0+day1+day3, u2 active day0 only, u3 active day1+day2
        ts = pd.to_datetime(
            [
                "2024-01-01 05:00",  # u1 day0
                "2024-01-01 07:00",  # u1 day0 (dup day)
                "2024-01-02 01:00",  # u1 day1
                "2024-01-04 12:00",  # u1 day3
                "2024-01-01 09:00",  # u2 day0
                "2024-01-02 03:00",  # u3 day1 (cohort starts day1)
                "2024-01-03 03:00",  # u3 day2
            ]
        )
        df = pd.DataFrame(
            {
                "event_id": range(7),
                "ts": ts,
                "user_id": [1, 1, 1, 1, 2, 3, 3],
                "event_type": ["view"] * 7,
                "value": [1.0] * 7,
                "props": [""] * 7,
            }
        )
        df.to_parquet(tmp_path / "events.parquet")
        got = events.retention_cohorts(str(tmp_path)).sort_values(
            ["cohort_day", "day_offset"]
        ).reset_index(drop=True)
        d0 = pd.Timestamp("2024-01-01")
        d1 = pd.Timestamp("2024-01-02")
        want = pd.DataFrame(
            {
                "cohort_day": [d0, d0, d0, d1, d1],
                "day_offset": [0, 1, 3, 0, 1],
                "n_users": [2, 1, 1, 1, 1],
                "cohort_size": [2, 2, 2, 1, 1],
                "retention_pct": [1.0, 0.5, 0.5, 1.0, 1.0],
            }
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestUserInterarrival:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.user_interarrival_stats))
        want = _canon(_duck(events.USER_INTERARRIVAL_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        assert (got["p50_gap_us"] <= got["max_gap_us"]).all()
        assert (got["mean_gap_us"] <= got["max_gap_us"]).all()
        assert (got["n_gaps"] >= 1).all()

    def test_hand_built(self, ray_session, tmp_path):
        # u1 gaps: 10us, 30us, 20us -> sorted [10,20,30], n=3,
        # p50 rank=(150+99)//100=2 -> 20; u2 single event -> omitted
        base = pd.Timestamp("2024-01-01")
        ts = [
            base,
            base + pd.Timedelta(microseconds=10),
            base + pd.Timedelta(microseconds=40),
            base + pd.Timedelta(microseconds=60),
            base + pd.Timedelta(hours=1),
        ]
        df = pd.DataFrame(
            {
                "event_id": range(5),
                "ts": ts,
                "user_id": [1, 1, 1, 1, 2],
                "event_type": ["view"] * 5,
                "value": [1.0] * 5,
                "props": [""] * 5,
            }
        )
        df.to_parquet(tmp_path / "events.parquet")
        got = events.user_interarrival_stats(str(tmp_path)).to_pandas()
        assert len(got) == 1
        r = got.iloc[0]
        assert r["user_id"] == 1 and r["n_gaps"] == 3
        assert r["p50_gap_us"] == 20 and r["max_gap_us"] == 30
        assert r["mean_gap_us"] == 60.0 / 3


class TestDauWau:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.dau_wau_stickiness))
        want = _canon(_duck(events.DAU_WAU_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        assert (got["dau"] <= got["wau"]).all()
        assert (got["stickiness"] <= 1.0).all()

    def test_hand_built(self, ray_session, tmp_path):
        # u1 active day0; u2 active day0 and day8; grid ends day8.
        # day0: dau=2 wau=2; days1-6: dau=0 wau=2 (both windows cover);
        # day7: only u2's day8? no - u2 active day0 covers day0..6,
        # day8 covers day8..; day7 window [1..7] has nobody -> absent.
        # day8: dau=1 wau=1.
        ts = pd.to_datetime(["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-09 10:00"])
        df = pd.DataFrame(
            {
                "event_id": range(3),
                "ts": ts,
                "user_id": [1, 2, 2],
                "event_type": ["view"] * 3,
                "value": [1.0] * 3,
                "props": [""] * 3,
            }
        )
        df.to_parquet(tmp_path / "events.parquet")
        got = events.dau_wau_stickiness(str(tmp_path)).sort_values("day").reset_index(drop=True)
        days = (got["day"] - pd.Timestamp("2024-01-01")).dt.days.tolist()
        assert days == [0, 1, 2, 3, 4, 5, 6, 8]
        assert got["dau"].tolist() == [2, 0, 0, 0, 0, 0, 0, 1]
        assert got["wau"].tolist() == [2, 2, 2, 2, 2, 2, 2, 1]
        assert got.iloc[0]["stickiness"] == 1.0 and got.iloc[1]["stickiness"] == 0.0


class TestOutOfOrderAudit:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.out_of_order_audit))
        want = _canon(_duck(events.OUT_OF_ORDER_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        assert (got["n_late"] <= got["n_events"]).all()
        assert ((got["n_late"] > 0) <= (got["max_skew_us"] > 0)).all()

    def test_shard_width_invariance(self, ray_session):
        # the distributed prefix must not depend on the shard width
        a = _canon(events.out_of_order_audit(SF, shard_width=7))
        b = _canon(events.out_of_order_audit(SF, shard_width=4096))
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


class TestMedianBands:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.hourly_median_bands))
        want = _canon(_duck(events.HOURLY_MEDIAN_BANDS_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        assert (got["q1"] <= got["med"]).all() and (got["med"] <= got["q3"]).all()
        # inliers sit inside the Tukey fences
        inl = got[got["is_outlier"] == 0]
        iqr = inl["q3"] - inl["q1"]
        assert (inl["n_events"] >= inl["q1"] - 1.5 * iqr).all()
        assert (inl["n_events"] <= inl["q3"] + 1.5 * iqr).all()


class TestLastTouchAttribution:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.last_touch_attribution))
        want = _canon(_duck(events.LAST_TOUCH_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # total attributed purchases equals total purchase events
        n = _duck("SELECT CAST(count(*) AS BIGINT) AS n FROM events WHERE event_type='purchase'")
        assert got["n_purchases"].sum() == n["n"].iloc[0]
        assert set(got["attributed_type"]) <= {"view", "click", "none"}

    def test_hand_built(self, ray_session, tmp_path):
        base = pd.Timestamp("2024-01-01 12:00:00")
        rows = [
            # u1: view at t, purchase at t+30min -> attributed to view
            (0, base, 1, "view"),
            (1, base + pd.Timedelta(minutes=30), 1, "purchase"),
            # u2: click at t, view at t+1min, purchase at t+2min -> view (latest)
            (2, base, 2, "click"),
            (3, base + pd.Timedelta(minutes=1), 2, "view"),
            (4, base + pd.Timedelta(minutes=2), 2, "purchase"),
            # u3: view 2h before purchase -> outside window -> none
            (5, base - pd.Timedelta(hours=2), 3, "view"),
            (6, base, 3, "purchase"),
            # u4: purchase with no touches -> none
            (7, base, 4, "purchase"),
        ]
        df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
        df["value"] = 1.0
        df["props"] = ""
        df.to_parquet(tmp_path / "events.parquet")
        got = events.last_touch_attribution(str(tmp_path))
        got = got.sort_values("attributed_type").reset_index(drop=True)
        want = pd.DataFrame(
            {
                "day": [pd.Timestamp("2024-01-01")] * 2,
                "attributed_type": ["none", "view"],
                "n_purchases": [2, 2],
            }
        )
        pd.testing.assert_frame_equal(got[["day", "attributed_type", "n_purchases"]], want, check_dtype=False)


class TestPropsExtract:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.props_extract_rollup))
        want = _canon(_duck(events.PROPS_EXTRACT_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        assert (got["min_k"] <= got["max_k"]).all()
        assert (got["min_k"] >= got["k_decile"] * 10).all()
        assert (got["max_k"] < (got["k_decile"] + 1) * 10).all()
        assert (got["sum_k"] >= got["n"] * got["min_k"]).all()
        assert (got["sum_k"] <= got["n"] * got["max_k"]).all()


class TestPropsExtractJsonValidity:
    def test_malformed_and_edge_json_matches_oracle(self, ray_session, tmp_path):
        """Engine must mirror the oracle's json_valid + json_type filter:
        malformed JSON carrying a '"k": N' substring, nested-only k,
        duplicate top-level k (DuckDB takes the FIRST), and non-integer
        k must agree on both sides (round-3 advice)."""
        import duckdb

        props = [
            '{"k": 5}',                      # plain: kept, k=5
            'bad {"k": 7}',                  # malformed: dropped by json_valid
            '{"a": {"k": 9}}',               # nested only: dropped ($.k top-level)
            '{"k": 11, "k": 13}',            # duplicate: first wins -> 11
            '{"k": true}',                   # bool: dropped (json_type)
            '{"k": 2.5}',                    # float: dropped (json_type)
            '{"k": "3"}',                    # string: dropped (json_type)
            '{"a": {"k": 1}, "k": 17}',      # nested + top-level: top-level 17
            '{"x": 1}',                      # no k: dropped
            '{"k": -4}',                     # negative int: kept
        ]
        df = pd.DataFrame({"event_type": ["t"] * len(props), "props": props})
        df.to_parquet(tmp_path / "events.parquet")
        got = _canon(events.props_extract_rollup(str(tmp_path)))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
        )
        want = _canon(con.execute(events.PROPS_EXTRACT_SQL).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
        # the kept set is exactly {5, 11, 17, -4}
        assert int(got["n"].sum()) == 4
        assert int(got["sum_k"].sum()) == 5 + 11 + 17 - 4


class TestValueHistogram:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.value_histogram_daily))
        want = _canon(_duck(events.VALUE_HISTOGRAM_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # dense layout: every (type, day) carries all 10 buckets, cum is
        # monotone and ends at the group total
        g = _run(events.value_histogram_daily)
        sizes = g.groupby(["event_type", "day"])["le"].size()
        assert (sizes == len(events._HIST_BOUNDS)).all()
        for _, grp in g.groupby(["event_type", "day"]):
            cn = grp.sort_values("le")["cum_n"].to_numpy()
            assert (np.diff(cn) >= 0).all()
            assert cn[-1] == grp["bucket_n"].sum()

    def test_quantile_vs_sql(self, ray_session):
        got = _canon(_run(events.histogram_quantile))
        want = _canon(_duck(events.HISTOGRAM_QUANTILE_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hand_built_interpolation(self, ray_session, tmp_path):
        # type a: values [5, 5, 7.5, 600] -> buckets idx0 x2, idx1, idx9
        # (600 clamps into the last bucket); type b: one tiny value ->
        # first-bucket interpolation from lo=0.
        base = pd.Timestamp("2024-01-01")
        df = pd.DataFrame(
            {
                "event_id": range(5),
                "ts": [base] * 5,
                "user_id": [1] * 5,
                "event_type": ["a", "a", "a", "a", "b"],
                "value": [5.0, 5.0, 7.5, 600.0, 0.01],
                "props": [""] * 5,
            }
        )
        df.to_parquet(tmp_path / "events.parquet")
        hist = events.value_histogram_daily(str(tmp_path))
        a = hist[hist["event_type"] == "a"].sort_values("le")
        np.testing.assert_array_equal(
            a["bucket_n"].to_numpy(), [2, 1, 0, 0, 0, 0, 0, 0, 0, 1]
        )
        np.testing.assert_array_equal(
            a["cum_n"].to_numpy(), [2, 3, 3, 3, 3, 3, 3, 3, 3, 4]
        )
        q = events.histogram_quantile(str(tmp_path))
        qa = {r["q"]: r["quantile"] for _, r in q[q["event_type"] == "a"].iterrows()}
        # p50: rank 2.0 lands in bucket (0,5], 2 of 2 below -> 5.0
        assert qa[0.5] == 5.0
        # p90: rank 3.6 in the clamp bucket (400,500], 3 below, n=1
        assert qa[0.9] == 400.0 + 100.0 * 0.6
        assert qa[0.99] == 400.0 + 100.0 * (3.96 - 3.0)
        qb = {r["q"]: r["quantile"] for _, r in q[q["event_type"] == "b"].iterrows()}
        # single value in the lowest bucket: quantile = 5*q (lo=0 rule)
        for qq in (0.5, 0.9, 0.99):
            assert qb[qq] == 5.0 * qq


class TestSloBurnRate:
    def test_vs_sql(self, ray_session):
        got = _canon(_run(events.slo_burn_rate))
        want = _canon(_duck(events.SLO_BURN_RATE_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        g = _run(events.slo_burn_rate)
        assert (g["bad"] <= g["n"]).all() and (g["bad_24"] <= g["n_24"]).all()
        assert (g["burn_rate"] >= 0).all()

    def test_hand_built_alert(self, ray_session, tmp_path):
        # 24 steady hours (3 events, 1 bad each) then an hour of 100%
        # bad: burn = (3/3)/(26/72) > 2 fires the alert ONLY there.
        base = pd.Timestamp("2024-01-01")
        rows = []
        for h in range(24):
            rows += [(base + pd.Timedelta(hours=h), 200.0)]
            rows += [(base + pd.Timedelta(hours=h, minutes=m), 1.0) for m in (10, 20)]
        rows += [(base + pd.Timedelta(hours=24, minutes=m), 200.0) for m in (0, 10, 20)]
        df = pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "ts": [r[0] for r in rows],
                "user_id": [1] * len(rows),
                "event_type": ["a"] * len(rows),
                "value": [r[1] for r in rows],
                "props": [""] * len(rows),
            }
        )
        df.to_parquet(tmp_path / "events.parquet")
        got = events.slo_burn_rate(str(tmp_path))
        assert len(got) == 25
        spike = got[got["bucket"] == base + pd.Timedelta(hours=24)].iloc[0]
        assert spike["n"] == 3 and spike["bad"] == 3
        assert spike["n_24"] == 72 and spike["bad_24"] == 26
        assert spike["alert"] and spike["burn_rate"] == (3.0 / 3) / (26.0 / 72)
        rest = got[got["bucket"] != base + pd.Timedelta(hours=24)]
        assert not rest["alert"].any()
        assert (rest["burn_rate"] == 1.0).all()


class TestEmptyBatchCombiners:
    def test_arrow_combiners_accept_empty_batches(self):
        # Ray Data can hand a combiner an empty block (empty input file,
        # upstream filter); the shared reduceat helper must no-op.
        import pyarrow as pa

        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "bucket": pa.array([], pa.timestamp("us")),
                "day": pa.array([], pa.timestamp("us")),
                "value": pa.array([], pa.float64()),
            }
        )
        assert events._hourly_partial_arrow(empty).num_rows == 0
        assert events._hist_partial_arrow(empty).num_rows == 0
        assert events._slo_partial_arrow(100.0)(empty).num_rows == 0


class TestSession10Timeseries:
    def test_locf_gapfill(self, ray_session):
        got = _canon(_run(events.rollup_hourly_locf))
        want = _canon(_duck(events.ROLLUP_LOCF_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # LOCF semantics: present rows have age 0; filled rows positive
        assert (got.loc[got["filled"] == 0, "age_h"] == 0).all()
        assert (got.loc[got["filled"] == 1, "age_h"] > 0).all()

    def test_mann_kendall(self, ray_session):
        got = _canon(_run(events.daily_mann_kendall))
        want = _canon(_duck(events.MANN_KENDALL_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert got["tau_b"].between(-1, 1).all()

    def test_mann_kendall_hand_values(self):
        # textbook check on a tiny synthetic grid, engine fed via a
        # monkeypatched gap-fill: y = [1,2,2,3] over 4 days ->
        # S = 5, n0 = 6, n1 = 1 (one tied pair)
        import unittest.mock as um

        hourly = pd.DataFrame(
            {
                "event_type": "t",
                "bucket": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
                ),
                "n_events": [1, 2, 2, 3],
            }
        )
        with um.patch.object(events, "rollup_hourly_gapfill", lambda sf: hourly):
            res = events.daily_mann_kendall("unused")
        assert int(res["s"].iloc[0]) == 5
        assert int(res["n_days"].iloc[0]) == 4
        n0, n1 = 6, 1
        assert res["tau_b"].iloc[0] == 5 / np.sqrt(float(n0 - n1) * float(n0))

    def test_seasonal_decompose(self, ray_session):
        got = _canon(_run(events.hourly_seasonal_decompose))
        want = _canon(_duck(events.SEASONAL_DECOMPOSE_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # decomposition identity holds exactly as evaluated
        lhs = (got["n_events"].astype(float) - got["trend"]) - got["seasonal"]
        assert np.array_equal(lhs.to_numpy(), got["resid"].to_numpy())

    def test_seasonal_decompose_short_series_excluded(self):
        # a type with < 25 gap-filled hours contributes no rows
        import unittest.mock as um

        hourly = pd.DataFrame(
            {
                "event_type": "short",
                "bucket": pd.date_range("2024-01-01", periods=10, freq="1h"),
                "n_events": np.arange(10),
            }
        )
        with um.patch.object(events, "rollup_hourly_gapfill", lambda sf: hourly):
            out = events.hourly_seasonal_decompose("unused")
        assert len(out) == 0

    def test_mann_kendall_constant_series_excluded(self):
        # all days tied (n0 == n1): tau/z undefined -> excluded, as in SQL
        import unittest.mock as um

        hourly = pd.DataFrame(
            {
                "event_type": "flat",
                "bucket": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
                "n_events": [5, 5, 5],
            }
        )
        with um.patch.object(events, "rollup_hourly_gapfill", lambda sf: hourly):
            out = events.daily_mann_kendall("unused")
        assert len(out) == 0

    def test_rate_limit_audit(self, ray_session):
        got = _canon(_run(events.rate_limit_audit))
        want = _canon(_duck(events.RATE_LIMIT_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        if len(got):
            assert (got["peak_per_day"] > 2).all()

    def test_rate_limit_audit_empty_when_quota_high(self, ray_session):
        # nobody exceeds an absurd quota: every stage must tolerate
        # empty blocks and the result is a typed empty frame
        out = events.rate_limit_audit(SF, quota_per_day=10**6)
        assert len(out) == 0
        assert list(out.columns) == ["user_id", "days_over", "peak_per_day"]

    def test_value_benford(self, ray_session):
        got = _canon(_run(events.value_benford))
        want = _canon(_duck(events.VALUE_BENFORD_SQL))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # shares sum to 1 per type; benford column is the exact table
        for _, g in got.groupby("event_type"):
            assert abs(g["share"].sum() - 1.0) < 1e-12
