"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)       -> flagship query on sf0.001 (smoke check).
queries()          -> {name: (spark, sf_dir) -> DataFrame} per SURVEY.md §2 operator.
oracle_sql()       -> {name: ANSI SQL} DuckDB-equivalent for the hash compare.

Implementation lives in jitsu_spark/; this file only aggregates the
registries so the driver has one import point.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jitsu_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    # The media near-dup pair oracles read the deterministic parquet
    # hash stores; guarantee they exist for the driver's correctness SF
    # before any DuckDB runs (Spark-free pandas builders, idempotent,
    # ~1s at sf0.01) so the compare can never race the Spark build.
    try:
        from jitsu_spark.multimodal import CANON_ORACLE_SF, ensure_media_stores

        ensure_media_stores(CANON_ORACLE_SF)
    except Exception:
        pass  # a store-dependent oracle will surface the error itself
    return dict(ORACLES)
