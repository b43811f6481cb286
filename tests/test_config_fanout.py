"""Config-store fan-out tests: one staged batch -> N connection pipelines
(§2.9 multi-destination fan-out; J4 config lookup)."""

from __future__ import annotations

import json


def _events_df(spark):
    events = [
        {"message_id": "m1", "type": "track", "event": "Order Completed",
         "timestamp": "2024-01-01T00:00:01.000Z", "properties": {"v": 1}},
        {"message_id": "m2", "type": "page",
         "timestamp": "2024-01-01T00:00:02.000Z"},
    ]
    return spark.createDataFrame([(json.dumps(e),) for e in events], "event string")


def test_fanout_two_connections(spark, tmp_path):
    from jitsu_spark.plans.chain import ConnectionConfig
    from jitsu_spark.plans.config_store import ConfigStore, StreamConfig, fan_out
    from jitsu_spark.sinks import WarehouseSink

    store = ConfigStore(
        streams=[StreamConfig(stream_id="s1", write_keys=["wk1"])],
        connections=[
            ConnectionConfig(connection_id="c_single", layout="segment-single-table"),
            ConnectionConfig(connection_id="c_tracks", layout="segment",
                             events_filter="track"),
        ],
    )
    sinks = {
        "c_single": WarehouseSink(spark, str(tmp_path / "wh1")),
        "c_tracks": WarehouseSink(spark, str(tmp_path / "wh2")),
    }
    written = fan_out(_events_df(spark), store, sinks)
    # single-table layout: both events -> events table
    assert written["c_single"] == ["events"]
    assert sinks["c_single"].read("events").count() == 2
    # segment layout + track filter: page dropped, track fans to 2 tables
    assert sorted(written["c_tracks"]) == ["Order Completed", "tracks"]
    assert sinks["c_tracks"].read("tracks").count() == 1


def test_config_json_roundtrip(tmp_path):
    from jitsu_spark.plans.config_store import ConfigStore

    doc = {
        "streams": [{"stream_id": "s1", "write_keys": ["wk"]}],
        "connections": [
            {"connection_id": "c1", "layout": "passthrough", "events_filter": "*"}
        ],
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(doc))
    store = ConfigStore.from_json(str(p))
    assert set(store.connections) == {"c1"}
    assert store.compile_all().keys() == {"c1"}


def test_annotate_connection_broadcast(spark):
    from jitsu_spark.plans.chain import ConnectionConfig
    from jitsu_spark.plans.config_store import (
        ConfigStore,
        StreamConfig,
        annotate_connection,
    )

    store = ConfigStore(
        [StreamConfig("s1")],
        [ConnectionConfig(connection_id="c1", layout="segment")],
    )
    ev = spark.createDataFrame([("m1", "c1"), ("m2", "cX")],
                               "message_id string, connection_id string")
    out = {r.message_id: r.layout
           for r in annotate_connection(ev, store.connections_df(spark)).collect()}
    assert out == {"m1": "segment", "m2": None}


def test_dst_only_stage_skips_udfs(spark):
    from jitsu_spark.plans.chain import ConnectionConfig, compile_pipeline

    def boom(e, ctx):
        raise RuntimeError("must not run on retry")

    cfg = ConnectionConfig(connection_id="c1", functions=[boom],
                           layout="segment-single-table")
    rows = compile_pipeline(cfg, stage="dst-only")(_events_df(spark)).collect()
    assert len(rows) == 2  # UDF skipped, layout still applied
