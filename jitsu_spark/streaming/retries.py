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

    # attempt value for resolution tombstones: always the per-message
    # max, so latest-per-message selection lands on the tombstone
    RESOLVED_ATTEMPT = 10_000

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
            .withColumn("resolved", F.lit(False))
            .write.mode("append")
            .parquet(self.retry_dir)
        )

    def record_success(self, message_ids: DataFrame, now: str) -> None:
        """Acknowledge replayed messages that SUCCEEDED: append a
        resolution tombstone per message so neither `due` nor
        `dead_letter` ever returns them again. Without the ack, a
        successfully replayed message stayed 'due' forever — infinite
        redelivery for non-idempotent API destinations (round-9 spine
        review finding #4). `message_ids` is any frame with a
        message_id column."""
        if not os.path.isdir(self.retry_dir):
            return
        r = self._read()
        tomb = (
            r.join(
                message_ids.select("message_id").distinct(),
                "message_id",
                "left_semi",
            )
            .groupBy("message_id")
            .agg(*[F.max(c).alias(c) for c in r.columns if c not in
                   ("message_id", "attempt", "resolved", "error",
                    "failed_at", "next_attempt_at")])
            .withColumn("attempt", F.lit(self.RESOLVED_ATTEMPT))
            .withColumn("error", F.lit("__resolved__"))
            .withColumn("resolved", F.lit(True))
            # the ack is stamped with ITS OWN time: recency selection in
            # `_latest_unresolved` keys on recorded time, so a FRESH
            # failure after the ack re-opens the message
            .withColumn("failed_at", F.lit(now).cast("timestamp"))
            .withColumn("next_attempt_at", F.lit(now).cast("timestamp"))
            .select(*r.columns)
        )
        # localize before appending: the tombstone's lineage reads the
        # very directory it is about to extend (bounded: acked ids only)
        rows = tomb.collect()
        if rows:
            self.spark.createDataFrame(rows, tomb.schema).write.mode(
                "append"
            ).parquet(self.retry_dir)

    def _read(self) -> DataFrame:
        # mergeSchema: pre-round-9 stores lack the `resolved` column;
        # nulls coalesce to false (unresolved) everywhere below
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.retry_dir
        )

    def _latest_unresolved(self) -> DataFrame:
        """The most recent record per message, resolved rows dropped.
        Recency = (failed_at, resolved, attempt): recorded time first —
        so a fresh failure AFTER an ack re-opens the message — with the
        tombstone winning a same-timestamp tie (conservative: never
        redeliver on an ambiguous ordering)."""
        r = self._read()
        if "resolved" not in r.columns:
            r = r.withColumn("resolved", F.lit(False))
        r = r.withColumn(
            "resolved", F.coalesce(F.col("resolved"), F.lit(False))
        )
        latest = (
            r.groupBy("message_id")
            .agg(
                F.max_by(
                    F.struct(*[c for c in r.columns if c != "message_id"]),
                    F.struct("failed_at", "resolved", "attempt"),
                ).alias("s")
            )
            .select("message_id", "s.*")
        )
        return latest.where(~F.col("resolved"))

    def due(self, now: str) -> DataFrame:
        """Rows ready to re-process: latest attempt per message,
        unresolved, due, and under the attempt limit. Reading only the
        latest attempt per message_id keeps a message that failed
        repeatedly from being re-injected once per historical failure;
        a success tombstone (`record_success`) makes the message
        disappear from every future run."""
        if not os.path.isdir(self.retry_dir):
            return self._empty()
        return (
            self._latest_unresolved()
            .where(F.col("next_attempt_at") <= F.lit(now).cast("timestamp"))
            .where(F.col("attempt") < F.lit(RETRY_COUNT))
        )

    def dead_letter(self, now: str) -> DataFrame:
        """Rows that exhausted their attempts; append them to the DLQ
        table ONCE (a resolution tombstone marks them dead-lettered, so
        repeated periodic runs don't re-append the same rows — round-9
        spine review finding #4) and return them."""
        if not os.path.isdir(self.retry_dir):
            return self._empty()
        dead = (
            self._latest_unresolved()
            .where(F.col("next_attempt_at") <= F.lit(now).cast("timestamp"))
            .where(F.col("attempt") >= F.lit(RETRY_COUNT))
        )
        # LOCALIZE first: both writes below touch paths in `dead`'s
        # lineage (appending to retry_dir invalidates any cached plan
        # over it, so a post-append action would re-evaluate WITH the
        # tombstones visible and return nothing). The dead set is
        # bounded by the exhausted-message count.
        rows = dead.collect()
        if not rows:
            return self._empty()
        local = self.spark.createDataFrame(rows, dead.schema)
        local.write.mode("append").parquet(self.dlq_dir)
        tomb = (
            local.withColumn("attempt", F.lit(self.RESOLVED_ATTEMPT))
            .withColumn("error", F.lit("__dead_lettered__"))
            .withColumn("resolved", F.lit(True))
        )
        tomb.write.mode("append").parquet(self.retry_dir)
        return local

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame(
            [], "message_id string, attempt int, error string, "
            "failed_at timestamp, next_attempt_at timestamp"
        )
