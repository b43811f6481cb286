"""API destinations: per-row HTTP emitters (webhook & friends) and the
events-log sink.

Reference:
- S7 webhook destination posts the whole event JSON to a URL with custom
  headers (`libs/core-functions/src/functions/webhook-destination.ts:6-33`).
- S5's API family (mixpanel/ga4/...) is the same transport pattern behind
  a mapping function (jitsu_spark.events.destinations).
- S8 events-log sink buffers function logs and flushes periodically
  (`libs/core-functions/src/functions/lib/clickhouse-logger.ts:25-83`).

Spark shape: emission runs inside `foreachPartition` — each executor task
opens one transport (connection pool) for its partition and streams rows
through it; nothing is collected to the driver. The transport is injected
so tests (and air-gapped runs) use a capture transport; production wires
urllib/requests here. Batching mirrors the reference's batchSize
(`destinations.tsx:110`).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

Transport = Callable[[str, dict, list[dict]], None]  # (url, headers, batch)


class CaptureTransport:
    """Test/air-gap transport: records each (url, headers, batch) request
    as a JSON line under `capture_dir`. foreachPartition closures execute
    in executor workers, so an in-memory list would never reach the test
    process — a shared-filesystem spool does (and is what an audit-mode
    destination would write anyway)."""

    def __init__(self, capture_dir: str):
        self.capture_dir = capture_dir

    def __call__(self, url: str, headers: dict, batch: list[dict]) -> None:
        import os
        import uuid

        os.makedirs(self.capture_dir, exist_ok=True)
        path = os.path.join(self.capture_dir, f"{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump({"url": url, "headers": headers, "batch": batch}, f)

    @property
    def requests(self) -> list[tuple[str, dict, list[dict]]]:
        import os

        out = []
        if not os.path.isdir(self.capture_dir):
            return out
        for name in sorted(os.listdir(self.capture_dir)):
            with open(os.path.join(self.capture_dir, name)) as f:
                r = json.load(f)
            out.append((r["url"], r["headers"], r["batch"]))
        return out


def _default_transport(url: str, headers: dict, batch: list[dict]) -> None:
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(batch).encode(),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    urllib.request.urlopen(req, timeout=2.0)  # FETCH_TIMEOUT_MS (rotor.ts:26)


def webhook_sink(
    df: DataFrame,
    url: str,
    headers: dict[str, str] | None = None,
    batch_size: int = 500,  # destinations.tsx:110
    transport: Transport | None = None,
    payload_col: str | None = None,
) -> None:
    """POST each row (or its `payload_col` JSON) to `url` in batches.

    Runs on executors via foreachPartition; with the default transport each
    partition keeps one HTTP connection.
    """
    headers = headers or {}
    send = transport or _default_transport

    def emit(rows: Iterator[Row]) -> None:
        batch: list[dict] = []
        for row in rows:
            if payload_col is not None:
                batch.append(json.loads(row[payload_col]))
            else:
                batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                send(url, headers, batch)
                batch = []
        if batch:
            send(url, headers, batch)

    df.foreachPartition(emit)


def devnull_sink(df: DataFrame) -> int:
    """The reference's `/dev/null` destination (`destinations.tsx:789-797`):
    sends nothing anywhere, but the connection's function chain still
    runs — count() cannot skip the chain's mapInPandas stage (it changes
    cardinality), so every row materializes, side effects (ctx.store
    writes, events-log rows) execute, and the count feeds metrics."""
    return df.count()


def mapped_destination_sink(
    df: DataFrame,
    map_fn: Callable[[dict], list[dict] | dict | None],
    url: str,
    headers: dict[str, str] | None = None,
    batch_size: int = 500,
    transport: Transport | None = None,
    event_col: str = "event",
) -> None:
    """API-destination family: map each event through a destination mapping
    (e.g. events.destinations.mixpanel_events) then POST the payloads."""
    headers = headers or {}
    send = transport or _default_transport

    def emit(rows: Iterator[Row]) -> None:
        batch: list[dict] = []
        for row in rows:
            out = map_fn(json.loads(row[event_col]))
            if out is None:
                continue
            batch.extend(out if isinstance(out, list) else [out])
            if len(batch) >= batch_size:
                send(url, headers, batch)
                batch = []
        if batch:
            send(url, headers, batch)

    df.foreachPartition(emit)


# ---------------------------------------------------------------------------
# S8: events log — append-only log table with level/actor/message columns
# (`events-log-init.ts:46-60` schema: actorId, type, timestamp, level,
# message). Periodic flush becomes micro-batch append; tail reads are L2.
# ---------------------------------------------------------------------------


def append_events_log(
    log_df: DataFrame,
    log_dir: str,
) -> None:
    """Append function-log rows; partitioned by date for the tail query's
    partition pruning (ORDER BY timestamp DESC LIMIT n touches only the
    newest partitions)."""
    (
        log_df.withColumn("_p_date", F.to_date("timestamp"))
        .write.mode("append")
        .partitionBy("_p_date")
        .parquet(log_dir)
    )


def make_log_rows(spark, entries: list[dict[str, Any]]) -> DataFrame:
    return spark.createDataFrame(
        [
            (
                e.get("actor_id"),
                e.get("type", "function"),
                e["timestamp"],
                e.get("level", "info"),
                e.get("message", ""),
            )
            for e in entries
        ],
        "actor_id string, type string, timestamp timestamp, level string, message string",
    )


# ---------------------------------------------------------------------------
# S6: MongoDB destination (`libs/core-functions/src/functions/
# mongodb-destination.ts`): URI built from config parts (`buildUrl`,
# :8-25), one client per destination (singleton, :44-53), each event
# insertOne'd into the configured collection (:55-57), errors -> retryable.
# Spark shape: foreachPartition with one client per partition and batched
# insert_many (the per-event insertOne amortized); the client factory is
# injected so tests (and this container, which has no mongo driver) use a
# capture spool — the same seam CaptureTransport provides for webhooks.
# ---------------------------------------------------------------------------


def mongodb_url(config: dict) -> str:
    """Port of buildUrl (mongodb-destination.ts:8-25)."""
    if config.get("url"):
        return config["url"]
    if not config.get("hosts"):
        raise ValueError("Hosts are not specified")
    if not config.get("database"):
        raise ValueError("Database is not specified")
    uri = config.get("protocol", "mongodb") + "://"
    if config.get("username") and config.get("password"):
        uri += f"{config['username']}:{config['password']}@"
    uri += ",".join(config["hosts"])
    uri += "/" + config["database"]
    if config.get("options"):
        from urllib.parse import urlencode

        uri += "?" + urlencode(config["options"])
    return uri


def _default_mongo_inserter(config: dict):
    """Production inserter: one pymongo client per partition. Gated behind
    import-try — the driver is not bundled here; tests inject a capture."""
    try:
        from pymongo import MongoClient  # noqa: F401
    except ImportError as e:  # pragma: no cover - driver absent in CI image
        raise NotImplementedError(
            "pymongo is not installed; inject `inserter` (see CaptureInserter)"
        ) from e

    # one pooled client per executor process, created lazily on first
    # insert and reused across batches AND partitions — the reference's
    # singleton client (mongodb-destination.ts:44-53). The previous form
    # opened + closed a client PER BATCH: a 1M-event partition at
    # batch_size=500 paid 2000 TLS/auth handshakes (round-9 review #10).
    holder: dict = {}

    def insert(collection: str, docs: list[dict]) -> None:  # pragma: no cover
        client = holder.get("client")
        if client is None:
            client = MongoClient(mongodb_url(config))
            holder["client"] = client
        client.get_default_database()[collection].insert_many(docs)

    return insert


class CaptureInserter:
    """Test/air-gap inserter: spools (collection, docs) to JSON files, the
    executor-safe pattern CaptureTransport uses."""

    def __init__(self, capture_dir: str):
        self.capture_dir = capture_dir

    def __call__(self, collection: str, docs: list[dict]) -> None:
        import os
        import uuid

        os.makedirs(self.capture_dir, exist_ok=True)
        path = os.path.join(self.capture_dir, f"{uuid.uuid4().hex}.json")
        with open(path, "w") as f:
            json.dump({"collection": collection, "docs": docs}, f)

    @property
    def inserts(self) -> list[tuple[str, list[dict]]]:
        import os

        out = []
        if not os.path.isdir(self.capture_dir):
            return out
        for name in sorted(os.listdir(self.capture_dir)):
            with open(os.path.join(self.capture_dir, name)) as f:
                r = json.load(f)
            out.append((r["collection"], r["docs"]))
        return out


def mongodb_sink(
    df: DataFrame,
    config: dict,
    inserter: Callable[[str, list[dict]], None] | None = None,
    batch_size: int = 500,
    event_col: str | None = None,
) -> None:
    """Insert each event document into `config['collection']`.

    Executor-side foreachPartition; rows become documents either from a
    JSON `event_col` or from the row itself."""
    collection = config["collection"]
    insert = inserter or _default_mongo_inserter(config)

    def emit(rows: Iterator[Row]) -> None:
        batch: list[dict] = []
        for row in rows:
            doc = (
                json.loads(row[event_col])
                if event_col is not None
                else row.asDict(recursive=True)
            )
            batch.append(doc)
            if len(batch) >= batch_size:
                insert(collection, batch)
                batch = []
        if batch:
            insert(collection, batch)

    df.foreachPartition(emit)
