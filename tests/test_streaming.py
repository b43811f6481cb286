"""Streaming spine tests: file stream -> layout -> routed dedup sink;
stateful user recognition; streaming metrics rollup.

Mirrors the reference's user-recognition scenario test
(`libs/core-functions/__tests__/user-recognition.test.ts:9-70`) under true
streaming execution (two micro-batches via maxFilesPerTrigger=1)."""

from __future__ import annotations

import json
import os

import pytest

# r13: long end-to-end file — excluded from the default pytest profile
# (pytest.ini addopts -m "not slow"); run with -m slow / -m "slow or not slow".
pytestmark = pytest.mark.slow


def _write_events(path: str, events: list[dict], name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


BATCH1 = [
    # 3 anonymous events for anon1, one for anon2
    {"message_id": "m1", "anonymous_id": "anon1", "timestamp": "2024-01-01T00:00:01Z"},
    {"message_id": "m2", "anonymous_id": "anon1", "timestamp": "2024-01-01T00:00:02Z"},
    {"message_id": "m3", "anonymous_id": "anon1", "timestamp": "2024-01-01T00:00:03Z"},
    {"message_id": "m5", "anonymous_id": "anon2", "timestamp": "2024-01-01T00:00:05Z"},
]
BATCH2 = [
    # identify arrives in a LATER micro-batch -> backfill must come from state
    {
        "message_id": "m4",
        "anonymous_id": "anon1",
        "user_id": "u42",
        "traits": {"email": "x@y.z"},
        "timestamp": "2024-01-01T00:00:04Z",
    },
]


def test_user_recognition_stream_backfills_across_batches(spark, tmp_path):
    from jitsu_spark.streaming.source import file_event_stream
    from jitsu_spark.streaming.user_recognition import user_recognition_stream

    src = str(tmp_path / "in")
    _write_events(src, BATCH1, "b1.json")
    _write_events(src, BATCH2, "b2.json")

    stream = file_event_stream(spark, src, max_files_per_trigger=1)
    out = user_recognition_stream(
        stream.select("message_id", "anonymous_id", "user_id", "traits", "timestamp")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ur_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.message_id: r for r in spark.sql("SELECT * FROM ur_out").collect()}

    # identify (m4) emitted, plus m1-m3 re-emitted with backfilled identity
    for m in ("m1", "m2", "m3"):
        assert rows[m].user_id == "u42", m
        assert json.loads(rows[m].traits_json) == {"email": "x@y.z"}
        assert rows[m].backfilled
    assert rows["m4"].user_id == "u42" and not rows["m4"].backfilled
    # anon2 never identified -> still buffered in state, not emitted
    assert "m5" not in rows


def test_user_recognition_state_ttl_flushes_anonymous(spark, tmp_path):
    """W4: a key that never identifies is flushed (still anonymous) when
    its state times out — the Mongo TTL eviction analogue."""
    import time

    from jitsu_spark.streaming.source import file_event_stream
    from jitsu_spark.streaming.user_recognition import user_recognition_stream

    src = str(tmp_path / "in")
    _write_events(src, BATCH1, "b1.json")
    time.sleep(0.2)
    # a later batch for an unrelated key lets expired timers fire
    _write_events(
        src,
        [{"message_id": "mz", "anonymous_id": "anonZ", "user_id": "uZ",
          "timestamp": "2024-01-01T00:01:00Z"}],
        "b2.json",
    )
    stream = file_event_stream(spark, src, max_files_per_trigger=1)
    out = user_recognition_stream(
        stream.select("message_id", "anonymous_id", "user_id", "traits", "timestamp"),
        lookback_ms=1,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ur_ttl_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.message_id: r for r in spark.sql("SELECT * FROM ur_ttl_out").collect()}
    # anon1/anon2 buffers expired -> flushed WITHOUT identity
    for m in ("m1", "m2", "m3", "m5"):
        assert m in rows, m
        assert rows[m].user_id is None
    assert rows["mz"].user_id == "uZ"


def test_pipeline_end_to_end_exactly_once(spark, tmp_path):
    """File stream -> typed projection -> routed upsert sink, with a
    duplicated message across batches (at-least-once) deduped by MERGE."""
    from pyspark.sql import functions as F

    from jitsu_spark.sinks import WarehouseSink
    from jitsu_spark.streaming.pipeline import run_pipeline
    from jitsu_spark.streaming.source import file_event_stream

    src = str(tmp_path / "in")
    _write_events(
        src,
        [
            {"message_id": "m1", "type": "track", "event": "Order Completed",
             "timestamp": "2024-01-01T00:00:01Z"},
            {"message_id": "m2", "type": "page", "timestamp": "2024-01-01T00:00:02Z"},
        ],
        "b1.json",
    )
    _write_events(
        src,
        [  # m1 redelivered; m3 new
            {"message_id": "m1", "type": "track", "event": "Order Completed",
             "timestamp": "2024-01-01T00:00:01Z"},
            {"message_id": "m3", "type": "track", "event": "Signup",
             "timestamp": "2024-01-01T00:00:03Z"},
        ],
        "b2.json",
    )

    def transform(df):
        # minimal segment-single-table projection + routing column
        return df.select(
            "message_id",
            "type",
            "event",
            F.col("timestamp"),
            F.lit("events").alias("_table"),
        )

    sink = WarehouseSink(spark, str(tmp_path / "wh"))
    q = run_pipeline(
        file_event_stream(spark, src, max_files_per_trigger=1),
        sink,
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=transform,
    )
    q.awaitTermination(120)

    rows = sink.read("events").collect()
    assert sorted(r.message_id for r in rows) == ["m1", "m2", "m3"]


def test_ur_backfill_upserts_over_originals(spark, tmp_path):
    """The reference's core UR contract (`user-recognition.ts:25-30`):
    re-emitted backfills are upserts — the warehouse ends with ONE row per
    message, carrying the identity. Full loop: UR stream -> routed MERGE
    sink across two micro-batches."""
    from pyspark.sql import functions as F

    from jitsu_spark.sinks import WarehouseSink
    from jitsu_spark.streaming.source import file_event_stream
    from jitsu_spark.streaming.user_recognition import user_recognition_stream

    src = str(tmp_path / "in")
    _write_events(src, BATCH1, "b1.json")
    _write_events(src, BATCH2, "b2.json")
    sink = WarehouseSink(spark, str(tmp_path / "wh"))

    out = user_recognition_stream(
        file_event_stream(spark, src, max_files_per_trigger=1).select(
            "message_id", "anonymous_id", "user_id", "traits", "timestamp"
        )
    )

    def load(batch, batch_id):
        routed = batch.withColumn("_table", F.lit("events"))
        sink.write_routed(routed, timestamp_col="timestamp")

    q = (
        out.writeStream.foreachBatch(load)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {r.message_id: r for r in sink.read("events").collect()}
    # batch1 emitted nothing for anon1 (buffered); batch2 re-emitted m1-m3
    # with identity; the MERGE keeps exactly one row per message
    assert sink.read("events").count() == 4  # m1-m4 (m5 still buffered)
    for m in ("m1", "m2", "m3", "m4"):
        assert rows[m].user_id == "u42", m


def test_metrics_rollup_stream(spark, tmp_path):
    from jitsu_spark.streaming.metrics import metrics_rollup_stream
    from jitsu_spark.streaming.source import file_event_stream

    src = str(tmp_path / "in")
    _write_events(
        src,
        [
            {"message_id": "m1", "type": "track", "timestamp": "2024-01-01T00:00:10Z"},
            {"message_id": "m2", "type": "track", "timestamp": "2024-01-01T00:00:50Z"},
            {"message_id": "m3", "type": "page", "timestamp": "2024-01-01T00:01:10Z"},
        ],
        "b1.json",
    )
    stream = file_event_stream(spark, src).withColumnRenamed("type", "status")
    out = metrics_rollup_stream(stream, status_col="status")
    # complete mode: a single availableNow batch never advances the
    # watermark past its own windows, so append would emit nothing here.
    q = (
        out.writeStream.format("memory")
        .queryName("metrics_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.period), r.status): (r.events, r.uniq_messages)
        for r in spark.sql("SELECT * FROM metrics_out").collect()
    }
    assert got[("2024-01-01 00:00:00", "track")] == (2, 2)
    assert got[("2024-01-01 00:01:00", "page")] == (1, 1)


class TestKafkaContract:
    """S2 stays a config-swap (no broker/jars in the sandbox); this pins
    the swap itself: the source options must match the rotor consumer
    semantics (`rotor.ts:59-72,228-237`, topic naming kafka-config.ts:
    71-90) and the envelope decode must match IngestMessage
    (async-request.d.ts:6-24), exercised through the file-stream twin."""

    def test_source_options_match_rotor_consumer(self):
        from jitsu_spark.streaming.source import kafka_source_options

        opts = kafka_source_options("k1:9092,k2:9092")
        assert opts == {
            "kafka.bootstrap.servers": "k1:9092,k2:9092",
            "subscribe": "destination-messages",  # kafka-config.ts topic
            "startingOffsets": "earliest",  # at-least-once resume
        }
        # backpressure knob only when configured, as a string option
        with_bp = kafka_source_options("k:9092", max_offsets_per_trigger=5000)
        assert with_bp["maxOffsetsPerTrigger"] == "5000"

    def test_envelope_decode_via_file_twin(self, spark):
        import datetime as dt
        import json as _json

        from jitsu_spark.streaming.source import decode_ingest_messages

        envelope = {
            "messageId": "m1",
            "connectionId": "c1",
            "writeKey": "wk",
            "ingestType": "browser",
            "messageCreated": "2024-01-01T00:00:00Z",
            "httpPayload": _json.dumps({"type": "track", "event": "E"}),
        }
        raw = spark.createDataFrame(
            [(_json.dumps(envelope).encode(), dt.datetime(2024, 1, 1))],
            "value binary, timestamp timestamp",
        )
        (row,) = decode_ingest_messages(raw).collect()
        assert row.message_id == "m1"
        assert row.connection_id == "c1"
        assert row.write_key == "wk"
        assert _json.loads(row.payload_json)["event"] == "E"


def test_recognize_orders_across_arrow_chunks():
    """Round-9 spine review finding #9: a key's micro-batch rows can
    arrive as MULTIPLE Arrow chunks; 'latest identity wins' must follow
    timestamps across chunks, not chunk arrival order."""
    import pandas as pd

    from jitsu_spark.streaming.user_recognition import _recognize

    class FakeState:
        hasTimedOut = False
        exists = False

        def update(self, v):
            self.value = v

        def setTimeoutDuration(self, ms):
            pass

    def chunk(rows):
        return pd.DataFrame(
            rows,
            columns=["message_id", "anonymous_id", "user_id", "traits",
                     "timestamp"],
        ).assign(timestamp=lambda d: pd.to_datetime(d["timestamp"]))

    # chunk 1 carries the NEWER identify (u_new); chunk 2 the OLDER one
    # (u_old). Timestamp order must make u_new the resolved identity.
    c1 = chunk([("m2", "anon", "u_new", None, "2024-01-01T10:00:00")])
    c2 = chunk([("m1", "anon", "u_old", None, "2024-01-01T09:00:00")])
    state = FakeState()
    out = pd.concat(
        list(_recognize(("anon",), iter([c1, c2]), state, 1000))
    )
    # both rows emitted; the resolved identity (state) is the NEWER one
    assert set(out["message_id"]) == {"m1", "m2"}
    _buffered, user_id, _traits = state.value
    assert user_id == "u_new"
    # the later-timestamped identify wins for rows processed after it
    by_mid = out.set_index("message_id")
    assert by_mid.loc["m2", "user_id"] == "u_new"
