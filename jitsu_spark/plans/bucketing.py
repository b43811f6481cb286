"""Bucketed co-located table layouts: pre-shuffle ONCE at write time.

The event store's hottest access pattern is per-user: sessionization,
identity windows, profile folds, user-keyed joins — every one starts by
hash-partitioning the corpus on user_id. Spark's bucketed tables move
that shuffle to WRITE time: `bucketBy(n, "user_id")` persists the table
already clustered (and optionally sorted) on the key, and every
downstream operator that needs ClusteredDistribution(user_id) — windows,
aggregations, and joins against other tables bucketed the same way —
reads it with NO exchange at all. At 100 TB that converts the per-query
corpus shuffle into a one-time layout cost amortized over every
consumer, the same economics as the reference storing events pre-keyed
in its warehouse tables (SURVEY §1.4 mapping; the 240-way pmod layout in
`operators/profiles.append_profiles_raw` is the hash-partitioned cousin
of the same idea).

Caveats encoded here rather than discovered in production:
- bucket counts are a LAYOUT contract: joins co-locate only when both
  sides share the bucket count (or one is a multiple);
- sortBy only eliminates the window sort when each bucket holds ONE
  file per write (Spark reads multi-file buckets as unsorted), so the
  win to rely on is exchange elimination, not sort elimination;
- bucketed tables need the session catalog (saveAsTable), not bare
  parquet paths — the bucketing metadata lives in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load_table

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    buckets: int = DEFAULT_BUCKETS,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist `df` as a parquet table bucketed (and optionally sorted)
    on `bucket_cols` — the one-time shuffle every co-located consumer
    then skips."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_events_table(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "events_by_user",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Materialize the events table bucketed by user_id (sorted within
    buckets by user_id, ts) and return the catalog-backed frame. Every
    per-user operator fed from this frame plans with ZERO exchanges on
    user_id (asserted in tests/test_bucketing.py)."""
    write_bucketed(
        load_table(spark, sf_dir, "events"),
        table_name,
        ["user_id"],
        buckets=buckets,
        sort_cols=["user_id", "ts"],
    )
    return spark.table(table_name)
