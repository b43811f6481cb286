"""End-to-end environment test — the reference's e2e harness
(`e2e/src/env.ts:36-60`, a testcontainers skeleton wiring console ->
ingest -> rotor -> bulker -> warehouse) re-expressed over this engine's
real components in one flow:

  config store (config-as-data) -> ingest capture (the HTTP collector's
  file twin) -> per-connection function chain + layout -> warehouse
  MERGE sink -> SQL gateway query + schema introspection, with capture
  REDELIVERY proving the at-least-once -> exactly-once contract the
  whole spine is built on.
"""

from __future__ import annotations

import json


def _capture(tmp_path, events):
    p = tmp_path / "ingest_capture.jsonl"
    with open(p, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    return str(p)


EVENTS = [
    {"message_id": "m1", "type": "track", "event": "Order Completed",
     "timestamp": "2024-03-01T10:00:01.000Z", "userId": "u1",
     "properties": {"total": 99.5}},
    {"message_id": "m2", "type": "page",
     "timestamp": "2024-03-01T10:00:02.000Z", "userId": "u1"},
    {"message_id": "m3", "type": "track", "event": "Order Completed",
     "timestamp": "2024-03-01T10:00:03.000Z", "userId": "u2",
     "properties": {"total": 10.0}},
]


def test_full_pipeline_env(spark, tmp_path):
    from jitsu_spark.gateway import (
        LIST_ALL_TABLES,
        guarded_query,
        schema_response,
    )
    from jitsu_spark.plans.chain import ConnectionConfig
    from jitsu_spark.plans.config_store import ConfigStore, StreamConfig, fan_out
    from jitsu_spark.sinks import WarehouseSink

    # 1. console: config-as-data — one stream, two connections; c_main
    # runs a user function (server-side enrich) ahead of the single-table
    # layout, c_tracks filters to track events with the segment layout.
    def enrich(event, ctx):
        props = dict(event.get("properties") or {})
        props["env"] = "e2e"
        event["properties"] = props
        ctx.logs.append("enriched %s" % event.get("message_id"))
        return event

    store = ConfigStore(
        streams=[StreamConfig(stream_id="s1", write_keys=["wk-e2e"])],
        connections=[
            ConnectionConfig(
                connection_id="c_main",
                layout="segment-single-table",
                functions=[enrich],
            ),
            ConnectionConfig(
                connection_id="c_tracks",
                layout="segment",
                events_filter="track",
            ),
        ],
    )
    sinks = {
        "c_main": WarehouseSink(spark, str(tmp_path / "wh_main")),
        "c_tracks": WarehouseSink(spark, str(tmp_path / "wh_tracks")),
    }

    # 2. ingest: the HTTP collector's capture, read as the batch the
    # rotor consumes
    cap = _capture(tmp_path, EVENTS)
    batch = spark.read.text(cap).selectExpr("value AS event")

    # 3. rotor: fan the batch through every connection's chain + layout
    written = fan_out(batch, store, sinks)
    assert written["c_main"] == ["events"]
    assert sorted(written["c_tracks"]) == ["Order Completed", "tracks"]

    # 4. warehouse state: all events landed; the UDF ran ahead of layout
    main = sinks["c_main"].read("events")
    assert main.count() == 3
    # the single-table layout flattens properties to the top level, so
    # the UDF's enrichment lands as a top-level column
    envs = {
        json.loads(r["event"]).get("env")
        for r in main.select("event").collect()
    }
    assert envs == {"e2e"}
    assert sinks["c_tracks"].read("tracks").count() == 2

    # 5. redelivery: the at-least-once capture replays; MERGE dedup on
    # message_id keeps the warehouse exactly-once
    fan_out(batch, store, sinks)
    assert sinks["c_main"].read("events").count() == 3
    assert sinks["c_tracks"].read("tracks").count() == 2

    # 6. query surface: the loaded table through the guarded SQL gateway
    # (allowlist enforced) and schema introspection (fail-closed)
    sinks["c_main"].read("events").createOrReplaceTempView("wh_events")
    rows = guarded_query(
        spark,
        "SELECT message_id FROM wh_events ORDER BY message_id",
        limit=2,
        allowed_tables={"wh_events"},
    ).collect()
    assert [r["message_id"] for r in rows] == ["m1", "m2"]
    schema = schema_response(spark, {"wh_events"})
    assert "wh_events" in schema and any(
        c["name"] == "message_id" for c in schema["wh_events"]
    )
    assert schema_response(spark, None) == {}
    assert "wh_events" in schema_response(spark, LIST_ALL_TABLES)

    import pytest
    from jitsu_spark.gateway import SqlGatewayError

    with pytest.raises(SqlGatewayError):
        guarded_query(
            spark,
            "SELECT * FROM secret_table",
            allowed_tables={"wh_events"},
        )
    spark.catalog.dropTempView("wh_events")
