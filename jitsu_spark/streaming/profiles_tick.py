"""Live profile tick — the streaming twin of the batch incremental
profile build (round 9, VERDICT r8 #8).

The reference runs its profile builder as a periodic loop
(`services/profiles/src/builder.ts:135-194`): every ~60 s each instance
finds users with NEW events since its watermark, re-runs their
ProfileFunctions over the user's FULL history (`builder.ts:305-342`),
upserts the profiles table, and advances the watermark. The Spark form
replaces the hand-rolled watermark with Structured Streaming's file
checkpoint: a file stream over the 240-way raw store
(`operators/profiles.append_profiles_raw`) delivers exactly the
not-yet-processed appends, and `foreachBatch` runs the tick:

1. changed users = distinct user_id in the micro-batch (the appends);
2. full history for those users is read back from the RAW STORE, pruned
   to exactly the hash partitions the changed users live in
   (`pmod(hash(user_id), 240)` — the reference's instance-sharding
   arithmetic as partition pruning);
3. `build_profiles` over that slice — with `untrusted=True`, the
   ProfileFunctions run in the forked 512 MB / 5 s isolate
   (`plans/isolate.IsolatedProfileRunner`), so a memory-bomb or spin in
   one user's function yields that user's `_error` row mid-stream while
   the tick completes;
4. the profiles store upserts per hash partition: only partitions
   holding changed users are rewritten, survivors first durably staged
   then swapped in by directory rename (the round-9 erasure discipline —
   never overwrite files a live lineage may re-read).

Twin contract (pinned in `tests/test_streaming_profiles.py`): after the
stream drains, the profiles store equals `build_profiles` over the full
event history — for ANY split of the feed into micro-batches — because
each tick recomputes changed users from full history rather than folding
deltas. That is the same discipline as `streaming/sessions.py`, with
recompute-from-history instead of incremental state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.profiles import (
    PROFILE_SCHEMA,
    RAW_PARTITIONS,
    build_profiles,
    default_profile_fn,
)

_PART = "_partition_id"


def _with_partition(df: DataFrame) -> DataFrame:
    return df.withColumn(
        _PART, F.pmod(F.hash("user_id"), F.lit(RAW_PARTITIONS))
    )


def upsert_profiles_store(
    spark: SparkSession, profiles_dir: str, profs: DataFrame
) -> int:
    """MERGE the freshly-built profiles into the hash-partitioned store:
    only the partitions containing updated users are rewritten. Returns
    the number of partitions touched."""
    profs = _with_partition(profs)
    if not os.path.isdir(profiles_dir):
        profs.write.mode("overwrite").partitionBy(_PART).parquet(
            profiles_dir
        )
        return sum(
            1
            for n in os.listdir(profiles_dir)
            if n.startswith(f"{_PART}=")
        )
    parts = [r[0] for r in profs.select(_PART).distinct().collect()]
    if not parts:
        return 0
    existing = spark.read.parquet(profiles_dir).where(
        F.col(_PART).isin(parts)
    )
    keys = profs.select("user_id")
    merged = existing.join(keys, "user_id", "left_anti").unionByName(
        profs, allowMissingColumns=True
    )
    tmp = profiles_dir + ".__tick_tmp__"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy(_PART).parquet(tmp)
    try:
        for p in parts:
            new_dir = os.path.join(tmp, f"{_PART}={p}")
            old_dir = os.path.join(profiles_dir, f"{_PART}={p}")
            trash = old_dir + ".__tick_old__"
            shutil.rmtree(trash, ignore_errors=True)
            if os.path.isdir(old_dir):
                os.rename(old_dir, trash)
            if os.path.isdir(new_dir):
                os.rename(new_dir, old_dir)
            shutil.rmtree(trash, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.catalog.refreshByPath(profiles_dir)
    return len(parts)


class LiveProfileTicker:
    """foreachBatch tick over the raw-store file stream.

    `profile_fn`/`untrusted`/`timeout_sec`/`memory_mb` pass straight to
    `build_profiles` — untrusted functions get the forked isolate and
    contained per-user `_error` rows, exactly as in the batch build."""

    def __init__(
        self,
        spark: SparkSession,
        raw_dir: str,
        profiles_dir: str,
        profile_fn=default_profile_fn,
        untrusted: bool = False,
        timeout_sec: float | None = None,
        memory_mb: float | None = None,
    ):
        self.spark = spark
        self.raw_dir = raw_dir
        self.profiles_dir = profiles_dir
        self.profile_fn = profile_fn
        self.untrusted = untrusted
        self.timeout_sec = timeout_sec
        self.memory_mb = memory_mb
        self.ticks = 0

    def tick(self, batch: DataFrame, batch_id: int) -> None:
        changed = batch.select("user_id").distinct().persist()
        try:
            # <= 240 rows: the changed users' hash partitions, collected
            # as pruning literals (the user set itself stays a
            # distributed semi-join — never an isin list)
            parts = sorted(
                r[0]
                for r in changed.select(
                    F.pmod(
                        F.hash("user_id"), F.lit(RAW_PARTITIONS)
                    ).alias("p")
                )
                .distinct()
                .collect()
            )
            if not parts:
                return
            history = (
                self.spark.read.parquet(self.raw_dir)
                .where(F.col(_PART).isin(parts))
                .join(changed, "user_id", "left_semi")
            )
            self._run_tick(history)
        finally:
            changed.unpersist()

    def _run_tick(self, history: DataFrame) -> None:
        profs = build_profiles(
            history.select("user_id", "ts", "event_id", "event_type"),
            profile_fn=self.profile_fn,
            untrusted=self.untrusted,
            timeout_sec=self.timeout_sec,
            memory_mb=self.memory_mb,
        )
        upsert_profiles_store(self.spark, self.profiles_dir, profs)
        self.ticks += 1

    def stream(self, checkpoint_dir: str, max_files_per_trigger: int = 1):
        """Start the raw-store file stream driving `tick` per
        micro-batch. The stream checkpoint IS the watermark: restarts
        resume from unprocessed raw-store files."""
        schema = (
            self.spark.read.parquet(self.raw_dir)
            .drop(_PART)
            .schema
        )
        src = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(self.raw_dir + f"/{_PART}=*")
        )
        return (
            src.writeStream.foreachBatch(self.tick)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


def read_profiles_store(spark: SparkSession, profiles_dir: str) -> DataFrame:
    cols = [f.name for f in PROFILE_SCHEMA.fields]
    df = spark.read.parquet(profiles_dir)
    extra = [c for c in df.columns if c not in cols and c != _PART]
    return df.select(*cols, *extra)
