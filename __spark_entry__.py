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
    return dict(ORACLES)
