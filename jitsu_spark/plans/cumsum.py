"""Distributed prefix sums over value histograms (round 8).

The repo's percentile/rank machinery reduces a corpus to a DISTINCT-
VALUE histogram (bounded by value space, not row count) and then runs
`sum(cnt) OVER (ORDER BY value)` — a cumulative window with no
PARTITION BY, which Spark plans as a single-partition sort. That is
fine while the value space is small (counts, days, score buckets), but
some value spaces grow with the corpus (rounded monetary sums, Gumbel
keys): at 10^7-10^8 distinct values the one-task sort becomes the same
bottleneck the round-8 zipf fix removed.

`histogram_cnt_better` computes the identical quantity with NO global
single-partition stage:

1. group to the (value, cnt) histogram (partial-agg friendly);
2. `repartitionByRange` on the value (equal values land together,
   partitions hold contiguous ranges) + sortWithinPartitions;
3. one tiny per-partition total aggregate -> driver cumsum -> broadcast
   offsets (n_partitions rows — metadata scale);
4. one Arrow pass adds offset + local running sum.

Output per distinct value: `cnt_better` = rows with a strictly better
value, and `n_total` — exactly the percent_rank() inputs, so a DuckDB
`percent_rank()` oracle stays the correctness twin bit-for-bit
(cnt_better/(n_total-1) is the same integer division on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Histograms at or below this take the plain cumulative window (one task
# sorting <= this many SKINNY (v, cnt) rows — milliseconds); above it,
# the range-partitioned distributed prefix. 2^20 rows x ~16 bytes is a
# ~16 MB single-task sort, far inside executor budgets.
WINDOW_FORM_MAX_ROWS = 1 << 20


def histogram_cnt_better(
    df: DataFrame,
    value_col: str,
    ascending: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """(v, cnt, cnt_better, n_total) for every DISTINCT value of
    `value_col` in `df` — `cnt_better` counts rows whose value is
    strictly better (smaller when ascending, larger when descending).
    No single-partition sort at any width."""
    from .topk import persist_bounded

    spark = df.sparkSession
    # persist the histogram BEFORE range partitioning: repartitionByRange
    # runs a separate boundary-sampling job over its input, and the
    # totals/prefix stages walk it again — without the cache each pass
    # would re-evaluate the histogram's full corpus lineage (measured 3x
    # on dsir_select). The cache is value-histogram-sized by definition.
    hist = persist_bounded(
        df.groupBy(F.col(value_col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
    )
    # Size-gate (the maybe_broadcast convention): the distributed path
    # costs ~4 extra jobs of fixed overhead, which DOMINATES on small
    # value spaces (measured 3x wall on sub-second rank stages at test
    # SF), while the single-task window only hurts once the histogram is
    # genuinely large. The count materializes the cache either way, and
    # both branches produce identical values.
    n_hist = hist.count()
    direction = "" if ascending else "DESC"
    if n_hist <= WINDOW_FORM_MAX_ROWS:
        return hist.selectExpr(
            "v",
            "cnt",
            f"coalesce(sum(cnt) OVER (ORDER BY v {direction}"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L)"
            " AS cnt_better",
            "sum(cnt) OVER () AS n_total",
        )
    order = F.col("v").asc() if ascending else F.col("v").desc()
    n_parts = partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = persist_bounded(
        hist.repartitionByRange(n_parts, order).sortWithinPartitions(order)
    )
    totals = (
        ranged.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("cnt").alias("t"))
        .collect()  # n_partitions rows — metadata scale
    )
    by_pid = {r["pid"]: r["t"] for r in totals}
    offsets, acc = {}, 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    n_total = acc
    bc = spark.sparkContext.broadcast(offsets)

    def prefix(batches):
        import numpy as np
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run = bc.value.get(pid, 0)
        for pdf in batches:
            if not len(pdf):
                continue
            c = pdf["cnt"].to_numpy()
            out = pd.DataFrame(
                {
                    "v": pdf["v"].values,
                    "cnt": c,
                    "cnt_better": run
                    + np.concatenate(([0], np.cumsum(c)[:-1])),
                }
            )
            run += int(c.sum())
            yield out

    vtype = dict(ranged.dtypes)["v"]
    return ranged.mapInPandas(
        prefix, f"v {vtype}, cnt long, cnt_better long"
    ).withColumn("n_total", F.lit(n_total))
