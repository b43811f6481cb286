"""Semantics tests for the CDP report operators on hand-crafted event
histories (the oracle gate covers engine parity; these pin the meaning)."""

from __future__ import annotations

from datetime import datetime

import pytest


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type)"""
    spark.createDataFrame(
        [(i, datetime.fromisoformat(ts), u, t, 0.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


class TestRetention:
    def test_cohort_matrix(self, spark, tmp_path):
        # user 1: first week W0 (Mon 2024-01-01), active W0 and W2
        # user 2: first week W1, active W1 only
        sf = _write_events(
            spark,
            tmp_path,
            [
                (1, "2024-01-02T10:00:00", 1, "click"),
                (2, "2024-01-16T10:00:00", 1, "click"),
                (3, "2024-01-10T10:00:00", 2, "click"),
            ],
        )
        from jitsu_spark.operators.reports import retention_cohorts

        out = {
            (str(r["cohort_week"].date()), r["week_offset"]): r["n_users"]
            for r in retention_cohorts(spark, sf).collect()
        }
        assert out[("2024-01-01", 0)] == 1  # user 1 in their cohort week
        assert out[("2024-01-01", 2)] == 1  # user 1 back two weeks later
        assert out[("2024-01-08", 0)] == 1  # user 2
        assert ("2024-01-01", 1) not in out  # user 1 skipped week 1


class TestTransitions:
    def test_markov_counts_and_terminals(self, spark, tmp_path):
        sf = _write_events(
            spark,
            tmp_path,
            [
                (1, "2024-01-01T00:00:01", 1, "signup"),
                (2, "2024-01-01T00:00:02", 1, "click"),
                (3, "2024-01-01T00:00:03", 1, "purchase"),
                (4, "2024-01-01T00:00:01", 2, "signup"),
            ],
        )
        from jitsu_spark.operators.reports import event_transitions

        out = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in event_transitions(spark, sf).collect()
        }
        # user 2's lone signup is terminal -> excluded; user 1 yields 2 edges
        assert out == {("signup", "click"): 1, ("click", "purchase"): 1}

    def test_same_timestamp_breaks_ties_by_event_id(self, spark, tmp_path):
        sf = _write_events(
            spark,
            tmp_path,
            [
                (2, "2024-01-01T00:00:01", 1, "b"),
                (1, "2024-01-01T00:00:01", 1, "a"),
            ],
        )
        from jitsu_spark.operators.reports import event_transitions

        out = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in event_transitions(spark, sf).collect()
        }
        assert out == {("a", "b"): 1}


class TestAnomaly:
    def test_spike_flagged(self, spark, tmp_path):
        rows = []
        eid = 0
        # 40 quiet minutes with alternating 1-2 events, then a 50x spike
        for m in range(40):
            for k in range(1 + (m % 2)):
                eid += 1
                rows.append((eid, f"2024-01-01T01:{m:02d}:05", 1, "click"))
        for k in range(50):
            eid += 1
            rows.append((eid, "2024-01-01T01:40:05", 1, "click"))
        sf = _write_events(spark, tmp_path, rows)
        from jitsu_spark.operators.reports import metrics_anomaly

        out = {str(r["minute"]): r for r in metrics_anomaly(spark, sf).collect()}
        spike = out["2024-01-01 01:40:00"]
        assert spike["is_anomaly"] is True and spike["z"] > 3
        quiet_flags = [
            r["is_anomaly"] for k, r in out.items() if k != "2024-01-01 01:40:00"
        ]
        assert not any(quiet_flags)


    def test_day_partitioned_window_matches_global_at_midnight(self, spark, tmp_path):
        """The scorer's day partitions + overlap tail must be equivalent
        to one global trailing window, including frames that cross
        midnight; the plan must show a PARTITION BY (no single-task
        global sort)."""
        rows, eid = [], 0
        # 23:35-23:59 of day 1 then 00:00-00:30 of day 2, varying counts
        for m in range(35, 60):
            for _ in range(1 + m % 3):
                eid += 1
                rows.append((eid, f"2024-01-01T23:{m:02d}:10", 1, "click"))
        for m in range(0, 31):
            for _ in range(1 + m % 4):
                eid += 1
                rows.append((eid, f"2024-01-02T00:{m:02d}:10", 1, "click"))
        sf = _write_events(spark, tmp_path, rows)
        from pyspark.sql import functions as F

        from jitsu_spark.operators.reports import (
            ANOMALY_TRAIL_MIN,
            ANOMALY_Z,
            metrics_anomaly,
        )
        from jitsu_spark.tables import load_table

        got = {
            str(r["minute"]): (r["baseline"], r["z"], r["is_anomaly"])
            for r in metrics_anomaly(spark, sf).collect()
        }
        # reference: one global unpartitioned time-range window
        ev = load_table(spark, sf, "events")
        per_min = ev.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
            F.count(F.lit(1)).alias("n_events")
        )
        w = (
            f"OVER (ORDER BY minute RANGE BETWEEN INTERVAL"
            f" {ANOMALY_TRAIL_MIN} MINUTES PRECEDING AND INTERVAL 1 MINUTE"
            " PRECEDING)"
        )
        expect = {
            str(r["minute"]): (r["baseline"], r["z"], r["is_anomaly"])
            for r in per_min.selectExpr(
                "minute", "n_events",
                f"avg(n_events) {w} AS b", f"stddev_samp(n_events) {w} AS sd",
            )
            .where(F.col("sd").isNotNull() & (F.col("sd") > 0))
            .selectExpr(
                "minute",
                "round(b, 4) AS baseline",
                "round((n_events - b) / sd, 4) AS z",
                f"abs((n_events - b) / sd) > {ANOMALY_Z} AS is_anomaly",
            )
            .collect()
        }
        assert got == expect
        # early day-2 minutes (frame crosses midnight) are present
        assert "2024-01-02 00:05:00" in got
        plan = metrics_anomaly(spark, sf)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Window" in plan and "_day" in plan  # partitioned window


class TestSeriesCorrelation:
    def test_perfectly_correlated_series(self, spark, tmp_path):
        rows = []
        eid = 0
        for m in range(10):
            for k in range(m + 1):  # 'a' count ramps 1..10
                eid += 1
                rows.append((eid, f"2024-01-01T01:{m:02d}:05", 1, "a"))
            for k in range(2 * (m + 1)):  # 'b' = 2x 'a' -> corr 1.0
                eid += 1
                rows.append((eid, f"2024-01-01T01:{m:02d}:05", 1, "b"))
        sf = _write_events(spark, tmp_path, rows)
        from jitsu_spark.operators.reports import series_correlation

        (r,) = series_correlation(spark, sf).collect()
        assert (r["type_a"], r["type_b"]) == ("a", "b")
        assert r["n_minutes"] == 10
        assert r["corr"] == pytest.approx(1.0)


class TestAnomalyOnRollup:
    def test_rollup_scorer_matches_batch(self, spark, tmp_path):
        """Scoring the rollup totals == scoring raw per-minute counts."""
        rows = []
        eid = 0
        for m in range(35):
            for k in range(1 + (m % 3)):
                eid += 1
                rows.append((eid, f"2024-01-01T02:{m:02d}:01", 1, "click"))
        sf = _write_events(spark, tmp_path, rows)
        from pyspark.sql import functions as F

        from jitsu_spark.operators.reports import metrics_anomaly
        from jitsu_spark.streaming.metrics import anomaly_on_rollup
        from jitsu_spark.tables import load_table

        ev = load_table(spark, sf, "events")
        rollup = ev.groupBy(
            F.date_trunc("minute", "ts").alias("period"),
            F.col("event_type").alias("status"),
        ).agg(F.count(F.lit(1)).alias("events"))
        got = {
            str(r["minute"]): (r["n_events"], r["z"])
            for r in anomaly_on_rollup(rollup).collect()
        }
        want = {
            str(r["minute"]): (r["n_events"], r["z"])
            for r in metrics_anomaly(spark, sf).collect()
        }
        assert got == want and want


class TestAudienceOverlap:
    def test_jaccard_of_user_sets(self, spark, tmp_path):
        # users 1,2,3 do 'click'; users 2,3 do 'purchase' -> J = 2/3
        rows = [
            (1, "2024-01-01T00:00:01", 1, "click"),
            (2, "2024-01-01T00:00:02", 2, "click"),
            (3, "2024-01-01T00:00:03", 3, "click"),
            (4, "2024-01-01T00:00:04", 2, "purchase"),
            (5, "2024-01-01T00:00:05", 3, "purchase"),
            (6, "2024-01-01T00:00:06", 3, "purchase"),  # dup user ignored
        ]
        sf = _write_events(spark, tmp_path, rows)
        from jitsu_spark.operators.reports import audience_overlap

        (r,) = audience_overlap(spark, sf).collect()
        assert (r["type_a"], r["type_b"]) == ("click", "purchase")
        assert r["n_both"] == 2
        assert r["jaccard"] == 0.6667


class TestSessionizeNativeTwin:
    def test_session_window_twin_equals_lag_form(self, spark, sf_dir):
        """Spark's built-in session_window reproduces the lag/cumsum
        sessionization exactly on the corpus."""
        from jitsu_spark.operators.events_ops import (
            sessionize_df,
            sessionize_native_df,
        )
        from jitsu_spark.tables import load_table

        ev = load_table(spark, sf_dir, "events")
        got = sorted(map(tuple, sessionize_native_df(ev).collect()))
        want = sorted(map(tuple, sessionize_df(ev).collect()))
        assert got == want and len(got) > 0

    def test_boundary_conventions_agree(self, spark):
        """At an EXACT gap-width spacing both forms keep the session
        (session_window's end bound is inclusive, matching the lag
        form's strict > test); one second past the gap both split."""
        import datetime as dt

        from jitsu_spark.operators.events_ops import (
            SESSION_GAP_MIN,
            sessionize_df,
            sessionize_native_df,
        )

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        gap = dt.timedelta(minutes=SESSION_GAP_MIN)
        at_gap = spark.createDataFrame(
            [("u", t0, 1), ("u", t0 + gap, 2)],
            "user_id string, ts timestamp, event_id long",
        )
        past_gap = spark.createDataFrame(
            [("u", t0, 1), ("u", t0 + gap + dt.timedelta(seconds=1), 2)],
            "user_id string, ts timestamp, event_id long",
        )
        assert sessionize_df(at_gap).first()["n_sessions"] == 1
        assert sessionize_native_df(at_gap).first()["n_sessions"] == 1
        assert sessionize_df(past_gap).first()["n_sessions"] == 2
        assert sessionize_native_df(past_gap).first()["n_sessions"] == 2


class TestAudienceOverlapSketch:
    def test_bounds_hold_at_sf(self, spark, sf_dir):
        from jitsu_spark.operators.reports import audience_overlap_sketch

        rows = audience_overlap_sketch(spark, sf_dir).collect()
        assert rows
        assert all(r.union_est_ok and r.inter_est_ok for r in rows)

    def test_bounds_hold_in_estimation_mode(self, spark, tmp_path):
        """20k users per pair pushes the HLL out of its sparse-exact
        regime; the 5%-of-union bound must still hold (lgk=14 gives
        ~0.8% relative error — 5% is a >5-sigma margin)."""
        import pyspark.sql.functions as F

        ev = spark.range(60000).selectExpr(
            "concat('u', CAST(id % 40000 AS STRING)) AS user_id",
            "CASE WHEN id % 3 = 0 THEN 'view'"
            " WHEN id % 3 = 1 THEN 'click' ELSE 'buy' END AS event_type",
            "CAST(id AS DOUBLE) AS value",
            "id AS event_id",
            "timestamp('2024-05-01 12:00:00') + make_interval(0,0,0,0,0,0,id % 86400) AS ts",
            "'{}' AS props",
        )
        d = str(tmp_path / "sfx")
        import os

        os.makedirs(d, exist_ok=True)
        ev.write.mode("overwrite").parquet(d + "/events.parquet")
        from jitsu_spark.operators.reports import audience_overlap_sketch

        rows = audience_overlap_sketch(spark, d).collect()
        assert len(rows) == 3
        assert all(r.union_est_ok and r.inter_est_ok for r in rows)
        # sanity: these audiences genuinely are estimation-scale
        assert all(r.exact_union > 16384 for r in rows)
