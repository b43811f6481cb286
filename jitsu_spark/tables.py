"""Catalog of the driver-provided parquet tables (TESTDATA.md).

At 100 TB these would be partitioned/clustered external tables; the loader
keeps the access path identical (spark.read.parquet) so filters and column
pruning push down to the scan either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables that should always broadcast in joins.
DIM_TABLES = {"region", "nation", "supplier", "part", "customer"}


# DuckDB-side expression matching the Spark-side ns->us truncation below.
EVENTS_TS_US_SQL = "make_timestamp(epoch_ns(ts) // 1000)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark has no ns timestamp
        # type, so read it as a long and truncate to microseconds. Oracle SQL
        # must mirror this with EVENTS_TS_US_SQL when ts appears raw in the
        # output (date_trunc'd outputs are unaffected).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        # Only the driver's testdata carries TIMESTAMP(NANOS) (surfacing as
        # bigint under nanosAsLong); synthetic fixtures written by tests use
        # plain timestamps and need no truncation.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() sees the same
    names the DuckDB oracle does."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
