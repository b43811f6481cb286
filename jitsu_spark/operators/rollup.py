"""Incremental materialized-view aggregation (A3 batch form).

Reference: ClickHouse `AggregatingMergeTree` MVs maintain
`sumState(events)` / `uniqState(messageId)` per (minute, connection,
status) as rows arrive (`webapps/console/prisma/metrics.sql:71-110`);
readers finish with `sumMerge`/`uniqMerge`.

Spark shape: the MV is a rollup table keyed by the group-by columns; each
incremental batch computes its partial aggregate and MERGEs into the
rollup, summing counters on key match. `approx_count_distinct` plays
`uniq`; for exact mergeability across batches the rollup keeps HLL-free
additive counters plus a per-batch distinct count (an upper bound, like
ClickHouse's uniqState merge is an estimate). The streaming twin is
jitsu_spark.streaming.metrics (update-mode windowed agg).

Scale: the rollup table is tiny (bounded by key cardinality), so the MERGE
reads/rewrites only touched date partitions via WarehouseSink.upsert
semantics; the batch-side aggregation is partial-agg + one small shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks import WarehouseSink
from ..tables import load_table


def rollup_batch(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """One batch's partial rollup: per-minute per-status counters."""
    return events.groupBy(
        F.date_trunc("minute", F.col(ts_col)).alias("period"),
        F.col("event_type").alias("status"),
    ).agg(
        F.count(F.lit(1)).alias("events"),
        F.approx_count_distinct("event_id").alias("uniq_events"),
    )


class RollupStore:
    """MERGE-maintained rollup table: counters add on key collision."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.sink = WarehouseSink(spark, base_dir)
        self.spark = spark

    def merge_batch(self, batch_rollup: DataFrame, table: str = "metrics_rollup"):
        if not self.sink.exists(table):
            combined = batch_rollup
        else:
            existing = self.sink.read(table).select(
                "period", "status", "events", "uniq_events"
            )
            combined = (
                existing.unionByName(
                    batch_rollup.select("period", "status", "events", "uniq_events")
                )
                .groupBy("period", "status")
                .agg(
                    F.sum("events").alias("events"),
                    # additive upper bound on merge, as uniqMerge estimates
                    F.sum("uniq_events").alias("uniq_events"),
                )
            )
        self.sink.upsert(
            combined,
            table,
            primary_key=["period", "status"],
            timestamp_col="period",
        )

    def read(self, table: str = "metrics_rollup") -> DataFrame:
        return self.sink.read(table)


def incremental_rollup_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked: folding the events table through the incremental
    rollup in two arbitrary batches equals a single direct GROUP BY for the
    additive counters (sums are associative; this is the property
    AggregatingMergeTree relies on)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    cut = ev.agg(F.expr("percentile_approx(event_id, 0.5)")).collect()[0][0]
    b1 = rollup_batch(ev.where(F.col("event_id") <= cut))
    b2 = rollup_batch(ev.where(F.col("event_id") > cut))
    merged = (
        b1.unionByName(b2)
        .groupBy("period", "status")
        .agg(F.sum("events").alias("events"))
    )
    return merged.orderBy("period", "status")


INCREMENTAL_ROLLUP_SQL = """
SELECT date_trunc('minute', ts) AS period,
       event_type AS status,
       count(*) AS events
FROM events
GROUP BY 1, 2
ORDER BY period, status
"""

QUERIES = {"incremental_rollup_equivalence": incremental_rollup_equivalence}
ORACLE = {"incremental_rollup_equivalence": INCREMENTAL_ROLLUP_SQL}
