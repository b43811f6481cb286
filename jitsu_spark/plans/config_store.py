"""Config as data: connection/function config tables and the per-connection
fan-out compiler.

Reference: the console exports connection/function/stream snapshots that
rotor holds in in-memory stores and joins per event (J4,
`services/rotor/src/lib/message-handler.ts:66-72`,
`webapps/console/pages/api/admin/export/[name]/index.ts:45-513` — S11).
One Kafka message is handled once per `connection_ids` entry (§2.9,
`rotor.ts:134-136`) — the multi-destination fan-out.

Spark shape: config is a tiny DataFrame/JSON document versioned at job
start (no long-poll — a new config version compiles a new plan). Pipelines
are COMPILED from config (SURVEY §7 design stance): each enabled
connection yields one DataFrame transform; the enriched stream is staged
once and every connection's chain reads the staged batch, so a stream
feeding N destinations is one scan + N cheap projections, not N scans —
the mitigation SURVEY §4 calls out for per-connection dynamic pipelines.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import WarehouseSink
from .chain import ConnectionConfig, compile_pipeline


@dataclass
class StreamConfig:
    """Stream (event source) config slice — writeKey auth + routing
    (`webapps/console/lib/schema/index.ts:121-131`)."""

    stream_id: str
    write_keys: list[str] = field(default_factory=list)


class ConfigStore:
    """Versioned engine config: streams + connections (JSON document)."""

    def __init__(self, streams: list[StreamConfig], connections: list[ConnectionConfig]):
        self.streams = {s.stream_id: s for s in streams}
        self.connections = {c.connection_id: c for c in connections}

    @classmethod
    def from_json(cls, path: str) -> ConfigStore:
        with open(path) as f:
            doc = json.load(f)
        streams = [StreamConfig(**s) for s in doc.get("streams", [])]
        conns = [ConnectionConfig(**c) for c in doc.get("connections", [])]
        return cls(streams, conns)

    def connections_df(self, spark: SparkSession) -> DataFrame:
        """The J4 lookup side: a broadcastable config dimension."""
        rows = [
            (c.connection_id, c.layout, c.events_filter)
            for c in self.connections.values()
        ]
        return spark.createDataFrame(
            rows, "connection_id string, layout string, events_filter string"
        )

    def compile_all(self) -> dict[str, Callable[[DataFrame], DataFrame]]:
        """connection_id -> compiled pipeline (chain + layout)."""
        return {
            cid: compile_pipeline(cfg) for cid, cfg in self.connections.items()
        }


def annotate_connection(events: DataFrame, config_df: DataFrame) -> DataFrame:
    """J4 — enrich events with their connection config via broadcast join
    (the rotor in-memory store lookup, zero shuffle of the stream)."""
    return events.join(F.broadcast(config_df), "connection_id", "left")


def fan_out(
    batch: DataFrame,
    store: ConfigStore,
    sinks: dict[str, WarehouseSink],
    event_col: str = "event",
) -> dict[str, list[str]]:
    """Run one (micro-)batch through every connection's pipeline.

    The batch is cached once; each connection's compiled transform is a
    plan over the cached data (one materialization, N projections). Returns
    {connection_id: [tables written]}.
    """
    pipelines = store.compile_all()
    batch = batch.cache()
    written: dict[str, list[str]] = {}
    try:
        for cid, transform in pipelines.items():
            out = transform(batch.select(event_col))
            sink = sinks[cid]
            # layout output is (_table, event-json); parse ts lazily at the
            # sink edge for date partitioning
            routed = out.withColumn(
                "message_id", F.get_json_object(event_col, "$.message_id")
            ).withColumn(
                "ts",
                F.coalesce(
                    F.get_json_object(event_col, "$.timestamp").cast("timestamp"),
                    F.current_timestamp(),
                ),
            )
            written[cid] = sink.write_routed(routed)
        return written
    finally:
        batch.unpersist()
