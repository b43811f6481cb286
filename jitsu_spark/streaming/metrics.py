"""Streaming metrics rollup — the ClickHouse AggregatingMergeTree path.

Reference: per-function status counts are minute-truncated and buffered
(`services/rotor/src/lib/metrics.ts:140-196`), landed into ClickHouse
`Null`-engine tables whose materialized views maintain `sumState(events)` /
`uniqState(messageId)` grouped by (minute, connection, status)
(`webapps/console/prisma/metrics.sql:71-110`); billing uses hourly
`uniq(messageId)` (`metrics.sql:2-29`).

Spark shape (SURVEY §2.6 A2-A4): a windowed streaming aggregation with a
watermark. Spark's partial aggregation is the `sumState` half; HLL++
(`approx_count_distinct`) is `uniqState`. Output mode `update` + an
upsert sink equals ClickHouse's merge-on-read: per-window rows converge
to their final value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def metrics_rollup_stream(
    events: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "timestamp",
    status_col: str = "status",
) -> DataFrame:
    """Per-minute (status) counts — streaming form of A2/A3."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 minute").alias("w"), F.col(status_col))
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.approx_count_distinct("message_id").alias("uniq_messages"),
        )
        .select(
            F.col("w.start").alias("period"),
            status_col,
            "events",
            "uniq_messages",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "timestamp",
    user_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via native session windows: per-user
    sessions close after `gap` of inactivity. The batch twin is the
    operators.events_ops.sessionize gaps-and-islands query; here Spark's
    session_window state machine merges windows incrementally — state per
    open session only, emitted on watermark close."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def active_events_hourly_stream(
    events: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "timestamp",
    workspace_col: str = "connection_id",
) -> DataFrame:
    """Billing metric (A4): approx distinct messages per workspace-hour."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), F.col(workspace_col))
        .agg(F.approx_count_distinct("message_id").alias("active_events"))
        .select(F.col("w.start").alias("hour"), workspace_col, "active_events")
    )


def anomaly_on_rollup(rollup: DataFrame) -> DataFrame:
    """Alerting pass over the (merged) rollup store: total the per-status
    minute counts and z-score them against the trailing baseline — run
    inside foreachBatch after the rollup MERGE, so every micro-batch
    re-evaluates the affected minutes. Reuses the batch scorer verbatim
    (operators.reports.score_minute_series)."""
    from ..operators.reports import score_minute_series

    per_min = (
        rollup.groupBy(F.col("period").alias("minute"))
        .agg(F.sum("events").cast("long").alias("n_events"))
    )
    return score_minute_series(per_min)
