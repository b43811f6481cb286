"""Spark execution of the data layouts.

Two paths, chosen by schema dynamism:

1. `apply_layout` — the general path for open-schema JSON events: Arrow-
   batched mapInPandas over (event JSON string) rows emitting
   (_table, event JSON string). Dynamic recursive key-renaming over
   arbitrary JSON is the one semantic Spark's built-ins can't express, so
   this is a legitimate pandas-UDF hot spot. Output is routed per `_table`
   by the sink (foreachBatch partitionBy), mirroring the reference's
   bulker POST per table (`bulker-destination.ts:340-385`).

2. Typed fast path — when the event schema is known (as with the testdata
   `events` table), the layout collapses to a plan-time `select`: zero
   Python, full codegen, filter/projection pushdown intact. These power the
   oracle-checked queries below.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..tables import load_table
from .layout_core import map_event

LAYOUT_OUT_SCHEMA = StructType(
    [
        StructField("_table", StringType(), False),
        StructField("event", StringType(), False),
    ]
)


def apply_layout(
    events_json: DataFrame,
    layout: str = "segment-single-table",
    keep_original_names: bool = False,
    json_col: str = "event",
) -> DataFrame:
    """events_json: DataFrame with a JSON-string event column -> rows of
    (_table, event) after layout mapping (track may fan out to 2 rows)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tables, payloads = [], []
            for raw in pdf[json_col]:
                # malformed input must not kill the task: dead-letter it,
                # mirroring the reference's retry/DLQ stance (SURVEY W2).
                try:
                    mapped = map_event(json.loads(raw), layout, keep_original_names)
                except (ValueError, TypeError, AttributeError) as ex:
                    tables.append("_malformed")
                    payloads.append(
                        json.dumps({"error": str(ex)[:200], "raw": str(raw)[:2000]})
                    )
                    continue
                for table, row in mapped:
                    tables.append(table or "events")
                    payloads.append(json.dumps(row, separators=(",", ":")))
            yield pd.DataFrame({"_table": tables, "event": payloads})

    return events_json.mapInPandas(run, LAYOUT_OUT_SCHEMA)


# ---------------------------------------------------------------------------
# Typed fast-path queries over the testdata `events` table (oracle-checked).
# ---------------------------------------------------------------------------


def layout_single_table_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 `segment-single-table` on a typed stream: plan-time projection.

    The testdata events map onto track events (event name = event_type,
    properties = props). Everything is a select expression — the layout
    costs nothing at runtime (`bulker-destination.ts:165-261` semantics,
    typed-schema specialization).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("message_id"),
        F.lit("track").alias("type"),
        F.col("event_type").alias("event"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("user_id"),
        F.col("value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.lit("events").alias("_table"),
    )


LAYOUT_SINGLE_TABLE_SQL = """
SELECT CAST(event_id AS VARCHAR) AS message_id,
       'track' AS type,
       event_type AS event,
       make_timestamp(epoch_ns(ts) // 1000) AS timestamp,
       CAST(user_id AS VARCHAR) AS user_id,
       value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       'events' AS _table
FROM events
"""


def layout_segment_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 `segment` multi-table fan-out on a typed stream: every named track
    event lands in `tracks` AND its per-event-name table
    (`bulker-destination.ts:263-267`; plural naming `:310-323`).

    explode(array(...)) doubles rows at the plan level — no shuffle; the
    `_table` column then drives partitioned sink routing.
    """
    ev = load_table(spark, sf_dir, "events")
    fanned = ev.select(
        F.col("event_id").cast("string").alias("message_id"),
        F.col("ts").alias("timestamp"),
        F.col("user_id").cast("string").alias("user_id"),
        F.explode(
            F.array(F.lit("tracks"), F.col("event_type"))
        ).alias("_table"),
        F.col("event_type").alias("event"),
    )
    return fanned


LAYOUT_SEGMENT_FANOUT_SQL = """
SELECT CAST(event_id AS VARCHAR) AS message_id,
       make_timestamp(epoch_ns(ts) // 1000) AS timestamp,
       CAST(user_id AS VARCHAR) AS user_id,
       t._table AS _table,
       event_type AS event
FROM events, unnest(['tracks', event_type]) AS t(_table)
"""


def layout_jitsu_legacy_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 `jitsu-legacy` on a typed stream (`bulker-destination.ts:57-152`):
    classic flat schema — `eventn_ctx_event_id`, `src='jitsu'`,
    `utc_time`/`_timestamp`, user promoted to columns, track properties
    spliced at top level. Plan-time projection, zero runtime cost."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("eventn_ctx_event_id"),
        F.col("event_type").alias("event_type"),
        F.lit("jitsu").alias("src"),
        F.col("ts").alias("utc_time"),
        F.col("ts").alias("_timestamp"),
        F.col("user_id").cast("string").alias("user_id"),
        # track props spliced at top level (value + props.k here)
        F.col("value"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


LAYOUT_JITSU_LEGACY_SQL = """
SELECT CAST(event_id AS VARCHAR) AS eventn_ctx_event_id,
       event_type,
       'jitsu' AS src,
       make_timestamp(epoch_ns(ts) // 1000) AS utc_time,
       make_timestamp(epoch_ns(ts) // 1000) AS _timestamp,
       CAST(user_id AS VARCHAR) AS user_id,
       value,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


QUERIES = {
    "layout_single_table_typed": layout_single_table_typed,
    "layout_segment_fanout": layout_segment_fanout,
    "layout_jitsu_legacy_typed": layout_jitsu_legacy_typed,
}

ORACLE = {
    "layout_single_table_typed": LAYOUT_SINGLE_TABLE_SQL,
    "layout_segment_fanout": LAYOUT_SEGMENT_FANOUT_SQL,
    "layout_jitsu_legacy_typed": LAYOUT_JITSU_LEGACY_SQL,
}
