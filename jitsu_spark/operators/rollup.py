"""Incremental materialized-view aggregation (A3 batch form).

Reference: ClickHouse `AggregatingMergeTree` MVs maintain
`sumState(events)` / `uniqState(messageId)` per (minute, connection,
status) as rows arrive (`webapps/console/prisma/metrics.sql:71-110`);
readers finish with `sumMerge`/`uniqMerge`.

Spark shape: the MV is a rollup table keyed by the group-by columns; each
incremental batch computes its partial aggregate and MERGEs into the
rollup, summing counters on key match. Distinct counts are MERGEABLE
Datasketches HLL state: `hll_sketch_agg` plays `uniqState` (the sketch is
a binary column of the rollup table), `hll_union_agg` plays `uniqMerge`
on key collision, and readers finish with `hll_sketch_estimate` — the
same state/merge/finalize split as AggregatingMergeTree, so re-merging N
batches equals one pass (no additive-upper-bound drift). The streaming
twin is jitsu_spark.streaming.metrics (update-mode windowed agg).

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
    """One batch's partial rollup: per-minute per-status counters plus the
    mergeable HLL state for the distinct count (uniqState analog)."""
    return events.groupBy(
        F.date_trunc("minute", F.col(ts_col)).alias("period"),
        F.col("event_type").alias("status"),
    ).agg(
        F.count(F.lit(1)).alias("events"),
        F.hll_sketch_agg(F.col("event_id").cast("string")).alias("uniq_state"),
    )


def finalize_uniq(rollup: DataFrame) -> DataFrame:
    """Reader-side finalize: uniqMerge's estimate step."""
    return rollup.withColumn(
        "uniq_events", F.hll_sketch_estimate("uniq_state")
    ).drop("uniq_state")


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
                "period", "status", "events", "uniq_state"
            )
            combined = (
                existing.unionByName(
                    batch_rollup.select("period", "status", "events", "uniq_state")
                )
                .groupBy("period", "status")
                .agg(
                    F.sum("events").alias("events"),
                    # uniqMerge: HLL union of the stored + batch state
                    F.hll_union_agg("uniq_state").alias("uniq_state"),
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
    rollup in two arbitrary batches equals a single direct GROUP BY — for
    the additive counters (sums are associative) AND the distinct count,
    whose HLL states are hll_union_agg-merged across the two batches then
    estimated (the uniqState/uniqMerge round trip). Per-group cardinalities
    at oracle SF sit far below the sketch's exact (coupon) range, so the
    merged estimate is exactly count(distinct) and the hash compare is
    deterministic."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    # split by id parity: two interleaved "days" of traffic with no
    # median-finding pre-scan (the batch boundary is arbitrary anyway)
    b1 = rollup_batch(ev.where(F.col("event_id") % 2 == 0))
    b2 = rollup_batch(ev.where(F.col("event_id") % 2 == 1))
    merged = (
        b1.unionByName(b2)
        .groupBy("period", "status")
        .agg(
            F.sum("events").alias("events"),
            F.hll_union_agg("uniq_state").alias("uniq_state"),
        )
        .select(
            "period",
            "status",
            "events",
            F.hll_sketch_estimate("uniq_state").alias("uniq_events"),
        )
    )
    return merged.orderBy("period", "status")


INCREMENTAL_ROLLUP_SQL = """
SELECT date_trunc('minute', ts) AS period,
       event_type AS status,
       count(*) AS events,
       count(DISTINCT event_id) AS uniq_events
FROM events
GROUP BY 1, 2
ORDER BY period, status
"""

QUERIES = {"incremental_rollup_equivalence": incremental_rollup_equivalence}
ORACLE = {"incremental_rollup_equivalence": INCREMENTAL_ROLLUP_SQL}
