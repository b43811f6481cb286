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
