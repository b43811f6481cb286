"""Airbyte-protocol connector output as a Spark source (S10 depth).

The reference runs Airbyte-compatible connector images and consumes the
Airbyte message protocol — JSONL on stdout where each line is one of
`{"type": "RECORD", "record": {"stream", "data", "emitted_at"}}`,
`{"type": "STATE", "state": {"data"}}`, `{"type": "LOG", "log":
{"level", "message"}}` — and loads records to the warehouse under the
sync's stream settings (`webapps/console/lib/schema/index.ts:228-245`:
per-stream sync_mode full_refresh|incremental, optional table_name and
cursor_field; SyncOptionsType adds tableNamePrefix/toSameCase).

Spark shape: the captured message stream (a JSONL file/directory — the
connector's stdout tee'd to storage, which is also how a 1000-executor
cluster would consume a fleet of connector pods) reads distributed via
spark.read.json with an explicit schema; records route per stream to
the warehouse sink (full_refresh = overwrite, incremental = MERGE
upsert), and the LAST state message is the cursor checkpoint persisted
only after the load commits — the Airbyte at-least-once contract, which
the MERGE dedup turns into exactly-once, same as the event spine.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AIRBYTE_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "record",
            T.StructType(
                [
                    T.StructField("stream", T.StringType()),
                    T.StructField("namespace", T.StringType()),
                    T.StructField("data", T.StringType()),
                    T.StructField("emitted_at", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "state",
            T.StructType([T.StructField("data", T.StringType())]),
        ),
        T.StructField(
            "log",
            T.StructType(
                [
                    T.StructField("level", T.StringType()),
                    T.StructField("message", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_airbyte_messages(spark: SparkSession, path: str) -> DataFrame:
    """Parse a captured connector output (JSONL) into typed messages.
    `data`/state payloads stay as JSON text (schemas vary per stream;
    per-stream projection happens downstream). The raw line rides along
    as `_raw` so scans that only need one message type can gate the JSON
    parse on a cheap substring probe (`discovered_streams`)."""
    raw = spark.read.text(path)
    return raw.select(
        F.from_json(
            "value",
            AIRBYTE_MESSAGE_SCHEMA,
            {"mode": "PERMISSIVE"},
        ).alias("m"),
        F.col("value").alias("_raw"),
    ).select("m.*", "_raw")


def stream_records(messages: DataFrame, stream: str) -> DataFrame:
    """RECORD rows for one stream: (data JSON, emitted_at timestamp)."""
    return (
        messages.where(
            (F.col("type") == "RECORD") & (F.col("record.stream") == stream)
        )
        .select(
            F.col("record.data").alias("data"),
            F.timestamp_millis(F.col("record.emitted_at")).alias("emitted_at"),
        )
    )


def _record_stream_names(messages: DataFrame) -> DataFrame:
    """Distinct RECORD stream names. When the frame still carries its
    raw line, a `"RECORD"` substring probe gates the JSON parse — on a
    10 GB capture the discovery pass is then one substring scan plus
    from_json over only the RECORD lines (Catalyst pushes the raw-line
    filter below the parse projection; plan-asserted in
    tests/test_airbyte.py)."""
    pre = (
        messages.where(F.col("_raw").contains('"RECORD"'))
        if "_raw" in messages.columns
        else messages
    )
    return (
        pre.where(F.col("type") == "RECORD")
        .select(F.col("record.stream").alias("stream"))
        .distinct()
    )


def discovered_streams(messages: DataFrame) -> list[str]:
    """Stream names present in the capture (small: one row per stream)."""
    return sorted(r.stream for r in _record_stream_names(messages).collect())


def _local_capture_path(file_uri: str) -> str | None:
    """Decode an `input_file_name()` value to a driver-openable posix
    path, or None for non-posix schemes. input_file_name returns a
    URI-ENCODED path (spaces and special chars become %XX), so the raw
    value must be unquoted before open() — and hdfs://s3a:// capture
    stores can't be opened driver-locally at all (they take the
    Spark-side tail instead)."""
    from urllib.parse import unquote, urlparse

    p = urlparse(file_uri)
    if p.scheme in ("", "file"):
        return unquote(p.path) if p.path else unquote(file_uri)
    return None


def _last_state_line(local_path: str) -> str | None:
    """Stream ONE local capture file line-by-line keeping only the most
    recent STATE line — O(1) memory however large the connector run was.
    The cheap `"STATE"` substring probe gates the JSON parse so a 10 GB
    capture of RECORD lines costs one pass of substring checks, not
    10 GB of json.loads."""
    last = None
    with open(local_path, encoding="utf-8", errors="replace") as f:
        for line in f:
            if '"STATE"' not in line:
                continue
            try:
                msg = json.loads(line)
            except ValueError:
                continue
            if msg.get("type") == "STATE":
                last = line
    return last


def _last_state_line_spark(spark: SparkSession, file_uri: str) -> str | None:
    """Distributed tail for non-posix capture stores (hdfs://, s3a://):
    read just the winning file, gate on the `"STATE"` substring before
    parsing, and take the line at the highest
    monotonically_increasing_id — ids rise with (split, in-split offset)
    for the text source, so the max id over STATE lines is the
    file-order last. Only the single winning row is collected."""
    rows = (
        spark.read.text(file_uri)
        .select(F.monotonically_increasing_id().alias("pos"), "value")
        .where(F.col("value").contains('"STATE"'))
        .where(
            F.from_json("value", AIRBYTE_MESSAGE_SCHEMA)["type"] == "STATE"
        )
        .orderBy(F.desc("pos"))
        .limit(1)
        .collect()
    )
    return rows[0]["value"] if rows else None


def latest_state(spark: SparkSession, path: str) -> dict | None:
    """The LAST state message's payload — the cursor checkpoint to
    persist after the load commits (Airbyte: records preceding a STATE
    are durable once that state is saved).

    "Last" is defined by exact (file, line number) order, with files
    ordered NUMERIC-AWARE (digit runs compare as integers) — plain
    lexicographic descent would crown `part-9` over `part-10` and
    persist a stale cursor from the earlier capture file.

    Scale (r5 review): the old form read every capture file WHOLE
    (`wholetext=True` — one row per file) to get line positions, so a
    10 GB connector run materialized 10 GB in one task. Now discovery
    is a distributed LINE scan (split-friendly: Hadoop's line reader
    keeps lines intact across splits; order within a file is NOT needed
    here, only which files contain STATE), and the within-file "last"
    comes from streaming ONLY the winning file — an O(1)-memory driver
    tail for posix paths (URI-decoded first; r6 advice), a Spark-side
    tail for object-store schemes. The only collect is the distinct
    file list — one row per capture file.

    Robustness (r6 advice): files are tried in DESCENDING natural order
    — if the naturally-last file's tail line fails the strict parse or
    lacks state.data, an earlier capture file's valid cursor is returned
    instead of dropping a stale-but-valid checkpoint."""
    lines = spark.read.text(path).select(
        F.input_file_name().alias("file"),
        F.col("value").alias("line"),
    )
    parsed = lines.where(F.col("line").contains('"STATE"')).select(
        "file", F.from_json("line", AIRBYTE_MESSAGE_SCHEMA).alias("m")
    ).where(F.col("m.type") == "STATE")
    files = [r.file for r in parsed.select("file").distinct().collect()]

    def natural_key(name: str) -> list:
        # 'part-10' -> ['part-', 10, ''] so digit runs order numerically
        return [
            int(tok) if tok.isdigit() else tok
            for tok in re.split(r"(\d+)", name)
        ]

    for fname in sorted(files, key=natural_key, reverse=True):
        local = _local_capture_path(fname)
        if local is not None:
            last_line = _last_state_line(local)
        else:
            last_line = _last_state_line_spark(spark, fname)
        if last_line is None:
            continue
        try:
            data = json.loads(last_line)["state"]["data"]
            if data is None:
                continue
            # protocol-conformant connectors emit state.data as a JSON
            # OBJECT; this repo's fixtures json.dumps it into a string.
            # json.loads(dict) raised TypeError, which the except below
            # swallowed — silently LOSING the checkpoint and forcing a
            # full re-extract every run (round-9 sources review #3)
            return data if isinstance(data, dict) else json.loads(data)
        except (ValueError, KeyError, TypeError):
            continue
    return None


def connector_logs(messages: DataFrame) -> DataFrame:
    """LOG messages as events-log rows (S8 shape)."""
    return messages.where(F.col("type") == "LOG").select(
        F.lower(F.col("log.level")).alias("level"),
        F.col("log.message").alias("message"),
    )


def target_table_name(
    stream: str,
    settings: dict,
    table_name_prefix: str = "",
    to_same_case: bool = False,
) -> str:
    """SyncOptionsType naming: explicit table_name wins, else the stream
    name; prefix applies either way; toSameCase folds to lowercase."""
    name = settings.get("table_name") or stream
    name = f"{table_name_prefix}{name}"
    return name.lower() if to_same_case else name


def run_airbyte_sync(
    spark: SparkSession,
    capture_path: str,
    sync_options: dict,
    sink,
) -> dict:
    """Load a captured connector run into the warehouse per the sync's
    stream settings. Returns {stream: {table, rows, mode}} plus the
    state checkpoint under "_state".

    full_refresh replaces the table; incremental MERGEs on the
    configured primary key (default message surrogate = a hash of the
    record payload — connectors without a PK cannot dedup, matching the
    reference's primary-key requirement for deduplication)."""
    messages = read_airbyte_messages(spark, capture_path)
    prefix = sync_options.get("tableNamePrefix", "") or ""
    same_case = bool(sync_options.get("toSameCase"))
    report: dict = {}
    for stream, settings in (sync_options.get("streams") or {}).items():
        recs = stream_records(messages, stream)
        table = target_table_name(stream, settings, prefix, same_case)
        mode = settings.get("sync_mode", "full_refresh")
        pk = settings.get("primary_key") or ["_record_hash"]
        out = recs.select(
            F.col("data").alias("event"),
            F.col("emitted_at").alias("ts"),
            F.sha2(F.col("data"), 256).alias("_record_hash"),
        )
        n = out.count()
        if mode == "incremental":
            sink.upsert(out, table, primary_key=pk, timestamp_col="ts")
        else:
            sink.replace(out, table)
        report[stream] = {"table": table, "rows": n, "mode": mode}
    report["_state"] = latest_state(spark, capture_path)
    return report
