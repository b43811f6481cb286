"""Warehouse sink semantics — the bulker contract re-expressed on Spark.

Reference (external Go service `jitsucom/bulker`, invoked from
`libs/core-functions/src/functions/bulker-destination.ts:364-380`; options at
`webapps/console/lib/schema/destinations.tsx:134-147`):

- modes `batch` / `stream` (S4): micro-batch cadence vs per-event — here both
  are `foreachBatch` writes, differing only in trigger interval.
- dedup: `deduplicate: true` upserts on `primaryKey` (default `message_id`)
  within `deduplicateWindow` (default 31 days) of `timestampColumn`.
- schema evolution: new columns extend the table DDL unless `schemaFreeze`
  (`destinations.tsx:144`) — mapped to parquet `mergeSchema` on read and
  `allowMissingColumns` union on write.
- multi-table routing: the layout emits a `_table` column
  (`bulker-destination.ts:340-385`); one physical table per value.

Scale design: tables are laid out as parquet partitioned by `_p_date`
(UTC date of the event timestamp). An upsert then only rewrites the date
partitions the incoming batch actually touches — bounded by the dedup
window — using dynamic partition overwrite, never the whole table. On a
lakehouse table format this same operation is a `MERGE INTO` whose file
pruning does the equivalent partition-level rewrite; the API here is
format-agnostic so swapping the physical layer does not change callers.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_PRIMARY_KEY = ["message_id"]  # destinations.tsx:137
DEFAULT_DEDUP_WINDOW_DAYS = 31  # destinations.tsx:139
PARTITION_COL = "_p_date"


class WarehouseSink:
    """A directory-backed warehouse: one sub-directory per table."""

    def __init__(self, spark: SparkSession, base_dir: str, schema_freeze: bool = False):
        self.spark = spark
        self.base_dir = base_dir
        self.schema_freeze = schema_freeze

    def _path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def exists(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(
            f.startswith(PARTITION_COL) or f.endswith(".parquet")
            for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        # mergeSchema=True is the read-side half of schema evolution: older
        # files simply lack the newer columns (null-filled).
        return self.spark.read.option(
            "mergeSchema", str(not self.schema_freeze).lower()
        ).parquet(self._path(table))

    # -- append (deduplicate: false) -----------------------------------

    def append(self, df: DataFrame, table: str, timestamp_col: str = "ts") -> None:
        df = self._conform(df, table, timestamp_col)
        df.write.mode("append").partitionBy(PARTITION_COL).parquet(self._path(table))

    # -- replace (full_refresh sync mode) ------------------------------

    def replace(self, df: DataFrame, table: str, timestamp_col: str = "ts") -> None:
        """Swap the table's entire contents — the Airbyte full_refresh
        contract (a sync replaces the table; contrast with upsert's
        incremental MERGE)."""
        df = self._conform(df, table, timestamp_col)
        df.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(
            self._path(table)
        )

    # -- upsert (deduplicate: true) ------------------------------------

    def upsert(
        self,
        df: DataFrame,
        table: str,
        primary_key: list[str] | None = None,
        timestamp_col: str = "ts",
        dedup_window_days: int = DEFAULT_DEDUP_WINDOW_DAYS,
    ) -> None:
        """MERGE-by-primary-key within the dedup window.

        Newer rows win (max_by on the timestamp column); rows already in
        the table outside the touched date partitions are untouched on
        disk. This is the idempotence that turns at-least-once delivery
        into exactly-once results (SURVEY §2.10 W1).
        """
        pk = primary_key or DEFAULT_PRIMARY_KEY
        df = self._conform(df, table, timestamp_col)
        batch = _latest_per_key(df, pk, timestamp_col)

        if not self.exists(table):
            batch.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(
                self._path(table)
            )
            return

        # Only date partitions within the dedup window of the batch's own
        # span can contain a conflicting primary key — read just those.
        dates = [
            r[0]
            for r in batch.select(PARTITION_COL).distinct().collect()
        ]
        lo = (
            F.lit(min(dates)).cast("date") - F.expr(f"INTERVAL {dedup_window_days} DAYS")
        )
        hi = F.lit(max(dates)).cast("date")
        existing = self.read(table).where(F.col(PARTITION_COL).between(lo, hi))

        existing_dates = {
            r[0] for r in existing.select(PARTITION_COL).distinct().collect()
        }
        merged = _latest_per_key(
            existing.unionByName(batch, allowMissingColumns=not self.schema_freeze),
            pk,
            timestamp_col,
        ).cache()
        try:
            # Collect the surviving date set BEFORE the write: `merged`'s
            # lineage reads the table's current files, and any
            # recomputation after the dynamic overwrite would re-scan
            # files the write just replaced (FILE_NOT_EXIST). The collect
            # also fully materializes the cache the write then reuses.
            merged_dates = {
                r[0] for r in merged.select(PARTITION_COL).distinct().collect()
            }
            # Dynamic overwrite replaces exactly the partitions present in
            # `merged`; everything else on disk stays as-is.
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(PARTITION_COL)
                .parquet(self._path(table))
            )
        finally:
            merged.unpersist()
        # A key whose NEWER row lands in a different date partition
        # leaves its old partition without any surviving row — dynamic
        # overwrite never touches a partition absent from `merged`, so
        # the stale duplicate would survive on disk (round-4 twin
        # finding: the warehouse MERGE updates in place, the parquet
        # path must match). Drop partitions inside the window that the
        # merge emptied. (Directory removal = this local/posix layout;
        # an HDFS deployment issues the same delete via FileSystem.)
        import shutil

        for d in existing_dates - merged_dates:
            shutil.rmtree(
                os.path.join(self._path(table), f"{PARTITION_COL}={d}"),
                ignore_errors=True,
            )
        # overwrite + deletion invalidate any cached file listing for
        # this table path — refresh so subsequent reads in the same
        # session never chase replaced part files
        self.spark.catalog.refreshByPath(self._path(table))

    # -- multi-table routing (bulker-destination.ts:340-385) -----------

    def write_routed(
        self,
        df: DataFrame,
        table_col: str = "_table",
        deduplicate: bool = True,
        primary_key: list[str] | None = None,
        timestamp_col: str = "ts",
    ) -> list[str]:
        """Route one layouted batch into its per-table destinations.

        The distinct table list is tiny (bounded by event-name
        cardinality); per-table writes reuse the cached routed batch, so
        the source is scanned once.
        """
        df = df.cache()
        try:
            tables = [r[0] for r in df.select(table_col).distinct().collect()]
            for t in tables:
                part = df.where(F.col(table_col) == t).drop(table_col)
                if deduplicate:
                    self.upsert(part, t, primary_key, timestamp_col)
                else:
                    self.append(part, t, timestamp_col)
            return tables
        finally:
            df.unpersist()

    def compact(self, table: str, target_files_per_partition: int = 1) -> None:
        """Small-file compaction: streaming appends leave one file per
        micro-batch per partition; periodic compaction rewrites each date
        partition down to `target_files_per_partition` files. The lakehouse
        OPTIMIZE analogue — read amplification on a 100 TB table is driven
        by file count as much as bytes."""
        df = self.read(table).repartition(
            target_files_per_partition, F.col(PARTITION_COL)
        )
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COL)
            .parquet(self._path(table))
        )

    def _conform(self, df: DataFrame, table: str, timestamp_col: str) -> DataFrame:
        df = df.withColumn(PARTITION_COL, F.to_date(F.col(timestamp_col)))
        if self.schema_freeze and self.exists(table):
            # schemaFreeze: incoming columns unknown to the table are
            # dropped instead of extending the schema.
            known = set(self.read(table).columns)
            df = df.select(*[c for c in df.columns if c in known])
        return df


def _latest_per_key(df: DataFrame, pk: list[str], timestamp_col: str) -> DataFrame:
    """One row per primary key, newest timestamp wins.

    max_by over a struct of all columns keeps this a hash aggregate
    (partial-agg friendly, single shuffle on the key) instead of a window
    sort — the shape that survives skewed keys at scale with AQE.
    """
    others = [c for c in df.columns if c not in pk]
    packed = df.groupBy(*pk).agg(
        F.expr(
            f"max_by(struct({', '.join(others)}), {timestamp_col})"
        ).alias("_row")
    )
    return packed.select(*pk, *[F.col(f"_row.{c}").alias(c) for c in others])
