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


def rollup_batch(
    events: DataFrame, ts_col: str = "ts", extra_keys: tuple = ()
) -> DataFrame:
    """One batch's partial rollup: per-minute per-status counters plus the
    mergeable HLL state for the distinct count (uniqState analog).

    `extra_keys` prepends grouping columns — e.g. a batch/arm id — so N
    logical batches can roll up in ONE pass over the events instead of N
    filtered scans (r12; the equivalence entry below)."""
    return events.groupBy(
        *[F.col(k) for k in extra_keys],
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
    from ..plans.scan import fan_out_scan

    ev = fan_out_scan(
        load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    )
    # split by id parity: two interleaved "days" of traffic with no
    # median-finding pre-scan (the batch boundary is arbitrary anyway).
    # r12: the two batches ride an `arm` grouping column through ONE
    # rollup_batch pass — the previous two filtered scans each walked
    # the whole events table, and AQE coalesced their byte-small but
    # HLL-CPU-heavy aggregate exchanges to a single task (measured: the
    # arm-final + merge stages ran 0.4 + 0.5 s single-core). One
    # explicit exchange keyed on (period, status) satisfies BOTH the
    # per-arm rollup grouping (a superset of the partition keys) and
    # the merge grouping — zero further exchanges, and a user
    # repartition is exempt from AQE coalescing. Per-arm HLL states
    # still merge via hll_union_agg (the uniqState/uniqMerge round
    # trip under test is unchanged).
    n_part = spark.sparkContext.defaultParallelism
    arms = rollup_batch(
        ev.withColumn("arm", F.col("event_id") % 2).repartition(
            n_part,
            F.date_trunc("minute", F.col("ts")),
            F.col("event_type"),
        ),
        extra_keys=("arm",),
    )
    merged = (
        arms
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

# -- mergeable quantile sketch (round 9) -------------------------------------
#
# The quantile counterpart of the HLL round trip above: ClickHouse MVs
# also maintain `quantileState(...)` / finish with `quantileMerge`
# (AggregatingMergeTree, the same metrics.sql machinery). The mergeable
# state here is a fixed-bin histogram over DECLARED value bounds — bin
# counts are integers, so merging N batch sketches (elementwise sum) is
# EXACTLY the single-pass sketch (no drift, unlike t-digest whose merge
# is order-sensitive), and the estimate step (cumulative histogram +
# linear interpolation inside the target bin) is plain arithmetic both
# engines replay identically — so unlike most sketches this one is
# fully oracle-checkable. Estimate error is bounded by one bin width
# against the rank-r ORDER STATISTIC (r = ceil(q*n); pinned in tests —
# no histogram can bound error vs the interpolated continuous
# percentile, whose adjacent order statistics may be many bins apart in
# a sparse tail). Scale: state is O(groups x bins) integers; the batch
# side is one partial-agg shuffle.

Q_BINS = 500
Q_LO = 0.0
Q_HI = 500.0  # events.value sits in (0, ~490]; out-of-range clamps
Q_QUANTILES = (0.5, 0.9, 0.99)

_BUCKET_EXPR = (
    f"least(greatest(CAST(floor((value - {Q_LO}) / ({Q_HI} - {Q_LO})"
    f" * {Q_BINS}) AS INT), 0), {Q_BINS - 1})"
)


def quantile_sketch_batch(events: DataFrame) -> DataFrame:
    """One batch's quantile state: (status, bucket, cnt)."""
    return (
        events.selectExpr(
            "event_type AS status", f"{_BUCKET_EXPR} AS bucket"
        )
        .groupBy("status", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quantile_sketch_estimate(state: DataFrame) -> DataFrame:
    """Finalize: per status, the interpolated quantile estimates from
    the (status, bucket, cnt) histogram state. rank r = ceil(q*n); the
    estimate interpolates linearly inside the first bucket whose
    cumulative count reaches r. The cumulative window is bounded by the
    DECLARED bin count (<= Q_BINS rows per status), the small-value-
    space regime of plans/cumsum."""
    from pyspark.sql import Window

    w = Window.partitionBy("status").orderBy("bucket")
    cum = state.select(
        "status",
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy("status")
        ).alias("n"),
    )
    width = (Q_HI - Q_LO) / Q_BINS
    qs = ", ".join(str(q) for q in Q_QUANTILES)
    hit = (
        cum.selectExpr("*", f"explode(array({qs})) AS q")
        .selectExpr("*", "CAST(ceil(q * n) AS BIGINT) AS r")
        .where("cum >= r AND cum - cnt < r")
        .selectExpr(
            "status",
            "n",
            "q",
            f"round({Q_LO} + (bucket + (r - (cum - cnt)) / cnt)"
            f" * {width}, 4) AS est",
        )
    )
    aggs = [
        F.max(F.when(F.col("q") == q, F.col("est"))).alias(
            f"p{int(q * 100)}_est"
        )
        for q in Q_QUANTILES
    ]
    return hit.groupBy("status").agg(F.max("n").alias("n"), *aggs)


def quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked: two arbitrary batch sketches, merged by summing
    bin counts (the quantileState/quantileMerge round trip), then
    estimated — equal to the single-pass histogram estimate the oracle
    computes directly, because histogram merge is exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    b1 = quantile_sketch_batch(ev.where(F.col("event_id") % 2 == 0))
    b2 = quantile_sketch_batch(ev.where(F.col("event_id") % 2 == 1))
    merged = (
        b1.unionByName(b2)
        .groupBy("status", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return quantile_sketch_estimate(merged).orderBy("status")


def _quantile_sketch_duck() -> str:
    width = (Q_HI - Q_LO) / Q_BINS
    qs = ", ".join(str(q) for q in Q_QUANTILES)
    est_cols = ", ".join(
        f"max(CASE WHEN q = {q} THEN est END) AS p{int(q * 100)}_est"
        for q in Q_QUANTILES
    )
    return f"""
WITH state AS (
  SELECT event_type AS status,
         least(greatest(CAST(floor((value - {Q_LO}) / ({Q_HI} - {Q_LO})
               * {Q_BINS}) AS INT), 0), {Q_BINS - 1}) AS bucket,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT status, bucket, cnt,
         sum(cnt) OVER (PARTITION BY status ORDER BY bucket) AS cum,
         sum(cnt) OVER (PARTITION BY status) AS n
  FROM state
),
hit AS (
  SELECT status, n, q,
         round({Q_LO} + (bucket + (CAST(ceil(q * n) AS BIGINT)
               - (cum - cnt)) * 1.0 / cnt) * {width}, 4) AS est
  FROM cum, unnest([{qs}]) AS t(q)
  WHERE cum >= CAST(ceil(q * n) AS BIGINT)
    AND cum - cnt < CAST(ceil(q * n) AS BIGINT)
)
SELECT status, CAST(max(n) AS BIGINT) AS n, {est_cols}
FROM hit GROUP BY status ORDER BY status
"""


QUANTILE_SKETCH_SQL = _quantile_sketch_duck()

QUERIES = {
    "incremental_rollup_equivalence": incremental_rollup_equivalence,
    "quantile_sketch_rollup": quantile_sketch_rollup,
}
ORACLE = {
    "incremental_rollup_equivalence": INCREMENTAL_ROLLUP_SQL,
    "quantile_sketch_rollup": QUANTILE_SKETCH_SQL,
}
