"""Scan fan-out for unsplittable-input skew (optimization guide §2.5).

A parquet file with a single row group yields ONE scan task no matter
what `spark.sql.files.maxPartitionBytes` says, so every expression in
the stage above it (regex tokenization, JSON extraction, shingle
explosion, hashing) runs on one core while the rest of the cluster
idles — the classic "one huge unsplittable file" input-skew case. The
fix is the guide's: repartition immediately after the read, but ONLY
when the scan actually under-parallelizes; at production scale the same
table arrives as thousands of splits and the helper is a no-op, so no
gratuitous full-data shuffle is ever added.

Apply this to scans feeding heavy per-row compute, not to plain
scan->aggregate paths whose partial aggregation is already cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, min_fill: float = 0.5) -> DataFrame:
    """Round-robin repartition `df` to the cluster's default parallelism
    when its current plan yields fewer than `min_fill` * parallelism
    partitions; otherwise return it unchanged.

    The partition probe reads the physical plan only (no job). Safe for
    keyed aggregations/joins above it (results are partitioning-
    independent); do NOT use under order- or partition-sensitive
    operators (collect_list order, monotonically_increasing_id,
    input_file_name).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= max(1, int(target * min_fill)):
        return df
    return df.repartition(target)
