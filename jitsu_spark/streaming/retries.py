"""Retry / dead-letter machinery.

Reference (`services/rotor/src/lib/retries.ts:6-52`, `rotor.ts:156-199`):
failed events are re-queued to a retry topic with headers
`retry_time/retries/original_topic/error`; backoff is exponential base
10 min (10 -> 100 -> 1000 min) capped at 24h; after `MESSAGES_RETRY_COUNT=3`
attempts the event goes to the dead-letter topic.

Spark shape (SURVEY §2.10 W2): a `retries` table with a `next_attempt_at`
column plus a periodic re-inject job that returns due rows and appends the
over-limit ones to a `dlq` table. Kafka topics become append-only tables;
the backoff math is identical. All timestamps are injected (`now`) so the
job is deterministic and replayable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RETRY_COUNT = 3  # retries.ts:6  MESSAGES_RETRY_COUNT
RETRY_BASE_MIN = 10  # retries.ts:10  exponential base, minutes
RETRY_CAP_MIN = 1440  # retries.ts:11  24h cap


def backoff_minutes(attempt: F.Column) -> F.Column:
    """10^attempt minutes, capped at 24h: 10, 100, 1000, then 1440."""
    return F.least(
        F.pow(F.lit(RETRY_BASE_MIN), attempt + 1).cast("long"),
        F.lit(RETRY_CAP_MIN).cast("long"),
    )


class RetryStore:
    """retries/ and dlq/ append-only tables under `base_dir`."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.retry_dir = os.path.join(base_dir, "retries")
        self.dlq_dir = os.path.join(base_dir, "dlq")

    def record_failures(self, failed: DataFrame, error_col: str, now: str) -> None:
        """Append failed events with scheduled next attempt.

        `failed` must carry an `attempt` column (0 on first failure) —
        the analogue of the `retries` Kafka header.
        """
        (
            failed.withColumn("error", F.col(error_col))
            .withColumn("failed_at", F.lit(now).cast("timestamp"))
            .withColumn(
                "next_attempt_at",
                F.lit(now).cast("timestamp")
                + (backoff_minutes(F.col("attempt")) * F.expr("INTERVAL 1 MINUTE")),
            )
            .write.mode("append")
            .parquet(self.retry_dir)
        )

    def due(self, now: str) -> DataFrame:
        """Rows ready to re-process: latest attempt per message, due, and
        under the attempt limit. Reading only the latest attempt per
        message_id keeps a message that failed repeatedly from being
        re-injected once per historical failure."""
        if not os.path.isdir(self.retry_dir):
            return self._empty()
        r = self.spark.read.parquet(self.retry_dir)
        latest = r.groupBy("message_id").agg(F.max("attempt").alias("attempt"))
        return (
            r.join(latest, ["message_id", "attempt"])
            .where(F.col("next_attempt_at") <= F.lit(now).cast("timestamp"))
            .where(F.col("attempt") < F.lit(RETRY_COUNT))
        )

    def dead_letter(self, now: str) -> DataFrame:
        """Rows that exhausted their attempts; append them to the DLQ
        table and return them."""
        if not os.path.isdir(self.retry_dir):
            return self._empty()
        r = self.spark.read.parquet(self.retry_dir)
        latest = r.groupBy("message_id").agg(F.max("attempt").alias("attempt"))
        dead = (
            r.join(latest, ["message_id", "attempt"])
            .where(F.col("next_attempt_at") <= F.lit(now).cast("timestamp"))
            .where(F.col("attempt") >= F.lit(RETRY_COUNT))
        )
        dead.write.mode("append").parquet(self.dlq_dir)
        return dead

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "message_id string, attempt int, error string, "
            "failed_at timestamp, next_attempt_at timestamp"
        )
