"""Skew-handling utilities: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the two cases it can't:

1. Skewed AGGREGATION keys (one connection/user producing most events —
   the monitoring pipeline's reality): two-phase salted aggregate.
2. Broadcast-impossible skewed joins where one hot key floods a task:
   replicate the small side per salt.

Both are plan-level rewrites using only built-in expressions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: list[str],
    salt_buckets: int = 16,
    count_col: str = "events",
) -> DataFrame:
    """Two-phase count: shuffle (key, salt) first — hot keys spread over
    `salt_buckets` reducers — then a tiny second shuffle re-combines.
    Equivalent to groupBy(keys).count() for any data distribution."""
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(count_col))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[], list[Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """General two-phase aggregation for associative aggregates: caller
    provides the partial aggregates and a builder for the re-combine
    stage (sum of partial sums, max of partial maxes, ...)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs())


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where `big` has hot keys and `small` cannot broadcast:
    big rows get a random salt in [0, buckets); small rows are replicated
    once per salt (explode) — each hot key's rows land on `buckets`
    different reducers instead of one. Output == big.join(small, key)."""
    big_s = big.withColumn(
        "_salt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)),
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = big_s.join(small_s, [key, "_salt"])
    return out.drop("_salt")
