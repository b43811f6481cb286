"""Sink compaction + retry replay integration + new destination mappings
+ streaming session windows."""

from __future__ import annotations

import datetime as dt
import glob
import json


def test_compaction_reduces_files(spark, tmp_path):
    from jitsu_spark.sinks import WarehouseSink

    sink = WarehouseSink(spark, str(tmp_path))
    # many tiny appends -> many files in one date partition
    for i in range(5):
        df = spark.createDataFrame(
            [(f"m{i}", dt.datetime(2024, 1, 1, 0, 0, i), "x")],
            "message_id string, ts timestamp, v string",
        ).coalesce(1)
        sink.append(df, "t")
    files_before = glob.glob(str(tmp_path / "t" / "*/*.parquet"))
    assert len(files_before) >= 5
    sink.compact("t")
    files_after = glob.glob(str(tmp_path / "t" / "*/*.parquet"))
    assert len(files_after) < len(files_before)
    assert sink.read("t").count() == 5  # no data loss


def test_retry_replay_through_dst_only_stage(spark, tmp_path):
    """W2+P4 end-to-end: failed events recorded, re-injected when due, and
    replayed through the dst-only pipeline stage into the warehouse."""
    from pyspark.sql import functions as F

    from jitsu_spark.plans.chain import ConnectionConfig, compile_pipeline
    from jitsu_spark.sinks import WarehouseSink
    from jitsu_spark.streaming.retries import RetryStore

    store = RetryStore(spark, str(tmp_path / "retry"))
    failed = spark.createDataFrame(
        [
            (
                "m1",
                0,
                json.dumps({"messageId": "m1", "type": "track", "event": "E",
                            "timestamp": "2024-01-01T00:00:01.000Z"}),
                "upstream 500",
            )
        ],
        "message_id string, attempt int, event string, err string",
    )
    store.record_failures(failed, "err", "2024-01-01 00:00:00")
    due = store.due("2024-01-01 00:10:00")
    assert due.count() == 1

    cfg = ConnectionConfig(
        connection_id="c1",
        functions=[lambda e, c: (_ for _ in ()).throw(RuntimeError("no udfs on replay"))],
        layout="segment-single-table",
    )
    out = compile_pipeline(cfg, stage="dst-only")(due.select("event"))
    sink = WarehouseSink(spark, str(tmp_path / "wh"))
    routed = out.withColumn(
        "message_id", F.get_json_object("event", "$.message_id")
    ).withColumn(
        "ts", F.get_json_object("event", "$.timestamp").cast("timestamp")
    )
    sink.write_routed(routed)
    assert sink.read("events").count() == 1


class TestUdfStageRetryReplay:
    """Port of the rotor chain retry scenarios (`functions-chain.test.ts`
    `retry`/`drop_retry` connections, expectations retry_0/retry_1/
    drop_retry_0): a UDF RetryError forwards the partial event this
    attempt (or drops it, for the drop variant), marks the row
    retryable, and the replay re-runs the WHOLE user pipeline
    (udf-n-dst per functionFilter) with ctx.retries incremented."""

    @staticmethod
    def _chain():
        from jitsu_spark.plans.chain import RetryError

        def f1(e, ctx):
            return {
                **e,
                "first": "1st",
                "retries": ctx.retries,
                "counter": e.get("counter", 0) + 1,
            }

        def f2retry(e, ctx):
            e = {**e, "second": "2nd", "counter": e.get("counter", 0) + 1}
            if ctx.retries < 1:
                raise RetryError("Function runs successfully only on 2nd attempt")
            return e

        def f3(e, ctx):
            return {**e, "third": "3rd", "counter": e.get("counter", 0) + 1}

        return [f1, f2retry, f3]

    def test_first_attempt_partial_then_replay_full(self, spark):
        from jitsu_spark.plans.chain import (
            ConnectionConfig,
            compile_chain,
            function_filter,
            is_retryable_error,
        )

        df = spark.createDataFrame(
            [(json.dumps({"type": "track", "properties": {}}),)],
            "event string",
        )
        cfg = ConnectionConfig(connection_id="retry", functions=self._chain())

        # attempt 0: partial event delivered (f2 contributed nothing),
        # error marks the row retryable — the retry_0 expectation
        (row0,) = compile_chain(cfg)(df).collect()
        ev0 = json.loads(row0.event)
        assert ev0 == {
            "type": "track", "properties": {},
            "first": "1st", "retries": 0, "counter": 2, "third": "3rd",
        }
        assert is_retryable_error(row0._error)
        assert row0._error.startswith("RetryError")

        # the failed stage is the udf pipeline -> whole chain re-runs
        stage = function_filter("udf.PIPELINE")
        assert stage == "udf-n-dst"

        # attempt 1: full success — the retry_1 expectation
        (row1,) = compile_chain(cfg, retries=1)(df).collect()
        ev1 = json.loads(row1.event)
        assert ev1 == {
            "type": "track", "properties": {},
            "first": "1st", "retries": 1, "counter": 3,
            "second": "2nd", "third": "3rd",
        }
        assert row1._error is None

    def test_drop_retry_suppresses_first_attempt(self, spark):
        from jitsu_spark.plans.chain import (
            ConnectionConfig,
            RetryError,
            compile_chain,
        )

        def f1(e, ctx):
            return {**e, "first": "1st", "retries": ctx.retries,
                    "counter": e.get("counter", 0) + 1}

        def f2dropretry(e, ctx):
            e = {**e, "second": "2nd", "counter": e.get("counter", 0) + 1}
            if ctx.retries < 1:
                raise RetryError("2nd attempt only", drop=True)
            return e

        def f3(e, ctx):
            return {**e, "third": "3rd", "counter": e.get("counter", 0) + 1}

        df = spark.createDataFrame(
            [(json.dumps({"type": "track", "properties": {}}),)],
            "event string",
        )
        cfg = ConnectionConfig(
            connection_id="drop_retry", functions=[f1, f2dropretry, f3]
        )
        # attempt 0: dropped from DELIVERY, but the chain emits a
        # `_dropped` tombstone carrying the ORIGINAL event + retryable
        # error — previously the event vanished entirely and was never
        # requeued, breaking the "Drop & RetryError: still requeued"
        # contract (round-9 spine review finding #1)
        from jitsu_spark.plans.chain import is_retryable_error

        (tomb,) = compile_chain(cfg)(df).collect()
        assert tomb._dropped is True
        assert is_retryable_error(tomb._error)
        assert json.loads(tomb.event) == {"type": "track", "properties": {}}
        # and the DELIVERY path (compile_pipeline's filter) ships nothing
        from jitsu_spark.plans.chain import compile_pipeline

        assert compile_pipeline(cfg)(df).collect() == []
        # attempt 1: delivered in full — the drop_retry_0 expectation
        (row,) = compile_chain(cfg, retries=1)(df).collect()
        assert json.loads(row.event) == {
            "type": "track", "properties": {},
            "first": "1st", "retries": 1, "counter": 3,
            "second": "2nd", "third": "3rd",
        }

    def test_function_filter_port(self):
        from jitsu_spark.plans.chain import function_filter

        assert function_filter("udf.PIPELINE") == "udf-n-dst"
        assert function_filter("udf.myfn") == "udf-n-dst"
        assert function_filter("builtin.destination.webhook") == "dst-only"
        assert function_filter("builtin.transformation.x") == "all"
        assert function_filter(None) == "all"

    def test_replay_through_udf_n_dst_pipeline(self, spark, tmp_path):
        """End-to-end with the RetryStore: the retryable failure is
        recorded with the udf function id, comes due, and replays through
        compile_pipeline at the udf-n-dst stage with retries=1."""
        from pyspark.sql import functions as F

        from jitsu_spark.plans.chain import (
            ConnectionConfig,
            compile_chain,
            compile_pipeline,
            function_filter,
        )
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.retries import RetryStore

        event = {
            "messageId": "m1", "type": "track", "event": "E",
            "timestamp": "2024-01-01T00:00:01.000Z", "properties": {},
        }
        df = spark.createDataFrame([(json.dumps(event),)], "event string")
        cfg = ConnectionConfig(connection_id="c1", functions=self._chain(),
                               layout="segment-single-table")

        processed = compile_chain(cfg)(df)
        # rotor requeues the ORIGINAL message, not the partial result —
        # the partial result went to the destination this attempt already
        errors = processed.where(
            F.col("_error").startswith("RetryError")
        ).select(
            F.get_json_object("event", "$.messageId").alias("message_id"),
            F.col("_error").alias("err"),
        )
        originals = df.select(
            F.get_json_object("event", "$.messageId").alias("message_id"),
            "event",
        )
        failures = originals.join(errors, "message_id").select(
            "message_id",
            F.lit(0).alias("attempt"),
            "event",
            "err",
            F.lit("udf.PIPELINE").alias("function_id"),
        )
        store = RetryStore(spark, str(tmp_path / "retry"))
        store.record_failures(failures, "err", "2024-01-01 00:00:00")
        due = store.due("2024-01-01 00:20:00")
        (due_row,) = due.collect()
        assert due_row.function_id == "udf.PIPELINE"

        stage = function_filter(due_row.function_id)
        out = compile_pipeline(cfg, stage=stage, retries=1)(due.select("event"))
        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        routed = out.withColumn(
            "message_id", F.get_json_object("event", "$.message_id")
        ).withColumn(
            "ts", F.get_json_object("event", "$.timestamp").cast("timestamp")
        )
        sink.write_routed(routed)
        # segment-single-table routes tracks to the "events" table
        stored = sink.read("events").collect()
        assert len(stored) == 1
        ev = json.loads(stored[0].event)
        assert ev["counter"] == 3 and ev["second"] == "2nd"


class TestNewMappings:
    def test_posthog_identify_alias(self):
        from jitsu_spark.events.destinations import posthog_events

        ops = posthog_events(
            {"type": "identify", "userId": "u1", "anonymousId": "a1",
             "traits": {"plan": "pro"}}
        )
        assert [o["op"] for o in ops] == ["identify", "alias"]
        assert ops[0]["properties"]["$anon_distinct_id"] == "a1"
        assert ops[1] == {"op": "alias", "distinct_id": "a1", "alias": "u1"}

    def test_posthog_page_capture(self):
        from jitsu_spark.events.destinations import posthog_events

        (op,) = posthog_events({"type": "page", "anonymousId": "a1"})
        assert op["event"] == "$pageview" and op["distinct_id"] == "a1"

    def test_june_track_prefixes(self):
        from jitsu_spark.events.destinations import june_events

        (p,) = june_events(
            {
                "type": "track", "event": "Order", "userId": "u1",
                "properties": {"width": 1, "amount": 9},
                "context": {"campaign": {"source": "g"},
                            "screen": {"width": 800},
                            "traits": {"email": "x@y.z"}},
            }
        )
        props = p["properties"]
        assert "width" not in props  # filtered (june-destination.ts:30)
        assert props["amount"] == 9
        assert props["campaign_source"] == "g"
        assert props["screen_width"] == 800
        assert p["email"] == "x@y.z"

    def test_facebook_conversion_hashing(self):
        import hashlib

        from jitsu_spark.events.destinations import (
            facebook_conversion_events,
            facebook_hash,
            sanitize_phone,
        )

        assert facebook_hash("  X@Y.Z ") == hashlib.sha256(b"x@y.z").hexdigest()
        assert sanitize_phone("+00 1 (555) 123") == "1555123"
        (p,) = facebook_conversion_events(
            {
                "type": "track", "event": "Purchase", "messageId": "m1",
                "userId": "u1",
                "properties": {"value": 9.5},
                "context": {
                    "ip": "1.2.3.4", "userAgent": "UA",
                    "traits": {"email": "X@y.z", "phone": "+0 555"},
                    "clientIds": {"fbp": "fb.1"},
                    "page": {"url": "https://x.io"},
                },
            }
        )
        assert p["event_name"] == "Purchase"
        ud = p["user_data"]
        assert ud["em"] == hashlib.sha256(b"x@y.z").hexdigest()
        assert ud["ph"] == hashlib.sha256(b"555").hexdigest()
        assert ud["client_ip_address"] == "1.2.3.4"  # unhashed per API
        assert ud["fbp"] == "fb.1"
        assert p["custom_data"] == {"value": 9.5}

    def test_facebook_identify_ignored(self):
        from jitsu_spark.events.destinations import facebook_conversion_events

        assert facebook_conversion_events({"type": "identify"}) == []

    def test_segment_proxy_passthrough(self):
        from jitsu_spark.events.destinations import segment_proxy_events

        (p,) = segment_proxy_events({"type": "track", "a": 1, "$table": "x"})
        assert p == {"type": "track", "a": 1}


def test_sessionize_stream(spark, tmp_path):
    import os

    from jitsu_spark.streaming.metrics import sessionize_stream
    from jitsu_spark.streaming.source import file_event_stream

    src = str(tmp_path / "in")
    os.makedirs(src)
    events = [
        {"message_id": "m1", "user_id": "u1", "timestamp": "2024-01-01T00:00:00Z"},
        {"message_id": "m2", "user_id": "u1", "timestamp": "2024-01-01T00:10:00Z"},
        # 40-min gap -> new session
        {"message_id": "m3", "user_id": "u1", "timestamp": "2024-01-01T00:50:00Z"},
    ]
    with open(os.path.join(src, "b.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    out = sessionize_stream(file_event_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (str(r.session_start), r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    )
    assert rows == [("2024-01-01 00:00:00", 2), ("2024-01-01 00:50:00", 1)]
