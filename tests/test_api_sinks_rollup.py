"""API destination sinks, events log, incremental rollup, UDF harness."""

from __future__ import annotations

import datetime as dt
import json


class TestWebhook:
    def test_webhook_batches(self, spark, tmp_path):
        from jitsu_spark.sinks_api import CaptureTransport, webhook_sink

        cap = CaptureTransport(str(tmp_path / "cap"))
        df = spark.createDataFrame(
            [(str(i), f"e{i}") for i in range(7)], "message_id string, event string"
        ).coalesce(1)
        webhook_sink(
            df, "https://hook.example/x", {"X-Auth": "k"},
            batch_size=3, transport=cap,
        )
        sizes = sorted(len(b) for _, _, b in cap.requests)
        assert sizes == [1, 3, 3]
        url, headers, _ = cap.requests[0]
        assert url == "https://hook.example/x"
        assert headers == {"X-Auth": "k"}

    def test_mapped_destination_uses_mapping(self, spark, tmp_path):
        from jitsu_spark.events.destinations import mixpanel_events
        from jitsu_spark.sinks_api import CaptureTransport, mapped_destination_sink

        cap = CaptureTransport(str(tmp_path / "cap"))
        events = [
            {"messageId": "m1", "type": "track", "event": "E",
             "anonymousId": "a1"},
            {"messageId": "m2", "type": "identify", "userId": "u1",
             "anonymousId": "a1", "traits": {}},
        ]
        df = spark.createDataFrame(
            [(json.dumps(e),) for e in events], "event string"
        ).coalesce(1)
        mapped_destination_sink(
            df, mixpanel_events, "https://api.mixpanel.test", transport=cap
        )
        payloads = [p for _, _, batch in cap.requests for p in batch]
        ops = sorted(p["op"] for p in payloads)
        assert ops == ["engage-set", "import", "merge"]


def test_events_log_append_and_tail(spark, tmp_path):
    from pyspark.sql import functions as F

    from jitsu_spark.sinks_api import append_events_log, make_log_rows

    log_dir = str(tmp_path / "events_log")
    entries = [
        {"actor_id": "c1", "timestamp": dt.datetime(2024, 1, 1, 0, 0, i),
         "level": "info", "message": f"msg{i}"}
        for i in range(5)
    ]
    append_events_log(make_log_rows(spark, entries), log_dir)
    tail = (
        spark.read.parquet(log_dir)
        .orderBy(F.desc("timestamp"))
        .limit(2)
        .collect()
    )
    assert [r.message for r in tail] == ["msg4", "msg3"]


def test_rollup_store_merges_batches(spark, tmp_path):
    from jitsu_spark.operators.rollup import RollupStore, rollup_batch

    ev1 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 10), "track"),
         (2, dt.datetime(2024, 1, 1, 0, 0, 50), "track")],
        "event_id long, ts timestamp, event_type string",
    )
    ev2 = spark.createDataFrame(
        [(3, dt.datetime(2024, 1, 1, 0, 0, 59), "track"),
         (4, dt.datetime(2024, 1, 1, 0, 1, 5), "page")],
        "event_id long, ts timestamp, event_type string",
    )
    store = RollupStore(spark, str(tmp_path))
    store.merge_batch(rollup_batch(ev1))
    store.merge_batch(rollup_batch(ev2))
    from jitsu_spark.operators.rollup import finalize_uniq

    got = {
        (str(r.period), r.status): (r.events, r.uniq_events)
        for r in finalize_uniq(store.read()).collect()
    }
    # events sum across batches; the HLL states union (uniqMerge), so the
    # distinct estimate spans both batches, not an additive upper bound
    assert got[("2024-01-01 00:00:00", "track")] == (3, 3)
    assert got[("2024-01-01 00:01:00", "page")] == (1, 1)


def test_rollup_hll_union_no_double_count(spark, tmp_path):
    """Re-delivering the same events in a second batch must not inflate the
    distinct count (the property the additive round-1 scheme lacked)."""
    from jitsu_spark.operators.rollup import (
        RollupStore,
        finalize_uniq,
        rollup_batch,
    )

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 10), "track"),
         (2, dt.datetime(2024, 1, 1, 0, 0, 50), "track")],
        "event_id long, ts timestamp, event_type string",
    )
    store = RollupStore(spark, str(tmp_path))
    store.merge_batch(rollup_batch(ev))
    store.merge_batch(rollup_batch(ev))  # redelivery
    row = finalize_uniq(store.read()).collect()[0]
    assert row.events == 4  # counters are additive by design
    assert row.uniq_events == 2  # HLL union dedups


def test_udf_test_harness():
    from jitsu_spark.plans.chain import run_function_test

    def fn(event, ctx):
        ctx.log(f"got {event['messageId']}")
        ctx.store.set("last", event["messageId"])
        return {**event, "seen": True}

    out = run_function_test(fn, {"messageId": "m1", "type": "track"})
    assert out["error"] is None
    assert out["events"][0]["seen"] is True
    assert out["logs"] == ["got m1"]
    assert out["store"].get("last") == "m1"


class TestQuantileSketch:
    def test_estimate_within_one_bin_of_rank_statistic(self, spark, sf_dir):
        """The sketch's error contract: the estimate lies within one bin
        width of the rank-r ORDER STATISTIC (r = ceil(q*n)) — the value
        whose bucket the cumulative histogram locates. (Against the
        interpolated continuous percentile no histogram can bound error
        by bin width: in a sparse tail adjacent order statistics can be
        many bins apart.)"""
        import math

        from jitsu_spark.operators.rollup import (
            Q_BINS,
            Q_HI,
            Q_LO,
            Q_QUANTILES,
            quantile_sketch_rollup,
        )
        from jitsu_spark.tables import load_table

        width = (Q_HI - Q_LO) / Q_BINS
        got = {
            r["status"]: r
            for r in quantile_sketch_rollup(spark, sf_dir).collect()
        }
        vals: dict[str, list] = {}
        for r in (
            load_table(spark, sf_dir, "events")
            .select("event_type", "value")
            .collect()
        ):
            vals.setdefault(r["event_type"], []).append(r["value"])
        assert set(got) == set(vals) and len(got) > 0
        for status, row in got.items():
            xs = sorted(vals[status])
            n = len(xs)
            for q in Q_QUANTILES:
                est = row[f"p{int(q*100)}_est"]
                exact_r = xs[math.ceil(q * n) - 1]
                assert abs(est - exact_r) <= width + 1e-9, (
                    status,
                    q,
                    est,
                    exact_r,
                )

    def test_merge_is_exact_for_any_split(self, spark, sf_dir):
        """Merging per-batch histogram states equals the single-pass
        state bit-for-bit, for a 3-way as well as the entry's 2-way
        split (integer-sum associativity — the property t-digest merge
        lacks)."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.rollup import quantile_sketch_batch
        from jitsu_spark.tables import load_table

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "value"
        )
        single = sorted(
            map(tuple, quantile_sketch_batch(ev).collect())
        )
        parts = [
            quantile_sketch_batch(ev.where(F.col("event_id") % 3 == k))
            for k in range(3)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        merged = sorted(
            map(
                tuple,
                u.groupBy("status", "bucket")
                .agg(F.sum("cnt").alias("cnt"))
                .collect(),
            )
        )
        assert merged == single
