"""Profile builder — the reference's batch UDAF over per-user event history.

A1 (`services/profiles/src/builder.ts:135-194`): every run, find users with
new events since the watermark, re-run a user-defined ProfileFunction over
each user's full history, upsert one profile row per user. U4: the
ProfileFunction receives (events, user) and returns arbitrary properties
(`types/protocols/profile.d.ts:8-16`).

Spark shape (SURVEY §3.3): changed-users filter -> semi join -> groupBy
(user_id).applyInPandas(profile_fn) -> MERGE INTO profiles. applyInPandas
is the UDAF surface: arbitrary pandas code over one user's history, Arrow-
batched, executing in parallel across the user-hash shuffle — the 240-way
hash partitioning the reference does manually (`profiles-functions.ts:87`)
is Spark's shuffle for free.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..tables import load_table

PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_event_types", LongType()),
        StructField("last_event_type", StringType()),
        StructField("longest_run", LongType()),
        StructField("updated_at", TimestampType()),
    ]
)


def default_profile_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    """The built-in ProfileFunction: history stats incl. longest same-type
    run — a genuinely order-sensitive fold over the user's event sequence
    (the kind of logic ProfileFunctions exist for). Vectorized: run
    boundaries via a shifted comparison, run lengths via diff of boundary
    indices — no Python-level loop over events."""
    import numpy as np

    pdf = pdf.sort_values(["ts", "event_id"])
    types = pdf["event_type"].to_numpy()
    if len(types):
        bounds = np.flatnonzero(types[1:] != types[:-1])
        edges = np.concatenate(([-1], bounds, [len(types) - 1]))
        longest = int(np.diff(edges).max())
    else:
        longest = 1
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "n_event_types": [pdf["event_type"].nunique()],
            "last_event_type": [types[-1] if len(types) else None],
            "longest_run": [longest if len(types) else 0],
            "updated_at": [pdf["ts"].max()],
        }
    )


def _default_profiles_partition(batches):
    """Partition-level vectorized form of default_profile_fn: one pandas
    pass per shuffle partition instead of one Python call per user.
    Per-group applyInPandas costs ~ms of interpreter overhead per user —
    with millions of small user histories that overhead IS the job, so the
    built-in profile runs as segment arithmetic over a user-sorted
    partition (requires a prior repartition(user_id))."""
    import numpy as np

    chunks = [c for c in batches if len(c)]
    if not chunks:
        return
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    u = pdf["user_id"].to_numpy()
    t = pdf["event_type"].to_numpy()
    n = len(pdf)
    user_change = u[1:] != u[:-1]
    user_starts = np.flatnonzero(np.concatenate(([True], user_change)))
    user_ends = np.concatenate((user_starts[1:], [n])) - 1
    # runs of equal event_type within a user
    new_run = np.concatenate(([True], user_change | (t[1:] != t[:-1])))
    run_starts = np.flatnonzero(new_run)
    run_lens = np.concatenate((run_starts[1:], [n])) - run_starts
    run_user = np.searchsorted(user_starts, run_starts, side="right") - 1
    longest = np.zeros(len(user_starts), dtype=np.int64)
    np.maximum.at(longest, run_user, run_lens)
    ntypes = (
        pdf.drop_duplicates(["user_id", "event_type"])
        .groupby("user_id", sort=True)
        .size()
        .to_numpy()
    )
    yield pd.DataFrame(
        {
            "user_id": u[user_starts],
            "n_events": (user_ends - user_starts + 1).astype("int64"),
            "n_event_types": ntypes,
            "last_event_type": t[user_ends],
            "longest_run": longest,
            "updated_at": pdf["ts"].to_numpy()[user_ends],
        }
    )


# Worker-process slot for the live profile isolate: each build_profiles
# call mints a token; the first group a worker serves under a NEW token
# closes the previous build's child and forks its own. PySpark workers run
# one task at a time, so at most one live child per worker, reused across
# every group (and task) of the same build — the reference reuses one
# isolate per connection the same way (profiles-udf-wrapper.ts:44-55).
# `refs` counts the task closures currently leasing the runner: when the
# last lease is garbage-collected after its task, the child is closed
# rather than idling until the next untrusted build reaches the worker
# (r8 review finding #5 — applyInPandas has no task-completion hook, so
# closure GC is the release signal; a later task of the same build just
# respawns lazily).
_ACTIVE_PROFILE_RUNNER: dict = {"token": None, "runner": None, "refs": 0}


def _release_profile_runner(token: str) -> None:
    slot = _ACTIVE_PROFILE_RUNNER
    if slot["token"] == token:
        slot["refs"] -= 1
        if slot["refs"] <= 0 and slot["runner"] is not None:
            slot["runner"].close()
            slot.update(token=None, runner=None, refs=0)


class _RunnerLease:
    """One task closure's handle on the worker's profile isolate.
    Pickled per task; on first use in a worker it acquires (or spawns)
    the runner and registers a GC finalizer that releases it."""

    def __init__(self, profile_fn, timeout_sec, memory_mb, token: str):
        self._fn = profile_fn
        self._timeout = timeout_sec
        self._memory_mb = memory_mb
        self._token = token
        self._acquired = False

    def runner(self):
        slot = _ACTIVE_PROFILE_RUNNER
        if slot["token"] != self._token:
            if slot["runner"] is not None:
                slot["runner"].close()
            from ..plans.isolate import IsolatedProfileRunner

            slot.update(
                token=self._token,
                runner=IsolatedProfileRunner(
                    self._fn, self._timeout, self._memory_mb
                ),
                refs=0,
            )
        if not self._acquired:
            import weakref

            slot["refs"] += 1
            self._acquired = True
            weakref.finalize(self, _release_profile_runner, self._token)
        return slot["runner"]


def build_profiles(
    events: DataFrame,
    profile_fn: Callable[[pd.DataFrame], pd.DataFrame] = default_profile_fn,
    schema: StructType = PROFILE_SCHEMA,
    since: str | None = None,
    assume_clustered: bool = False,
    untrusted: bool = False,
    timeout_sec: float | None = None,
    memory_mb: float | None = None,
) -> DataFrame:
    """Run the profile UDAF; with `since`, only users with new events are
    recomputed (the reference's incremental watermark, `builder.ts:305-342`)
    but each recomputed user still sees FULL history.

    `assume_clustered=True` skips the user_id repartition on the fast
    path — valid ONLY when the caller guarantees every user's rows share
    one scan partition (a `plans/bucketing` user_id-bucketed table: one
    read partition per bucket). The partition fold concatenates its
    Arrow batches before segmenting, so bucket-complete input is the
    whole requirement; the profile build then plans with ZERO exchanges
    (asserted in tests/test_bucketing.py).

    `untrusted=True` (U4): the ProfileFunction runs inside a forked
    isolate at the reference's 512 MB / 5 s budget
    (`profiles-udf-wrapper.ts:51,231`) — RLIMIT_AS catches C-extension
    allocations, a parent watchdog SIGKILLs native spins, and a contained
    failure yields one null-profile row with `_error` set (route through
    `profile_error_log_rows` for the events-log) while every other user's
    profile is computed normally. The returned schema gains an `_error`
    string column. Where fork isolation is unavailable (non-Linux) the
    function runs in-process with a try/except guard — Python-level
    exceptions are still contained, hard OOM is not."""
    if since is not None:
        changed = (
            events.where(F.col("ts") > F.lit(since).cast("timestamp"))
            .select("user_id")
            .distinct()
        )
        events = events.join(changed, "user_id", "left_semi")
    if untrusted and profile_fn is default_profile_fn:
        # the built-in is trusted by definition — run the vectorized fast
        # path, but keep the untrusted-schema contract (callers branching
        # on `untrusted` always see the `_error` column)
        pruned = events.select("user_id", "ts", "event_id", "event_type")
        if not assume_clustered:
            pruned = pruned.repartition("user_id")
        return pruned.mapInPandas(
            _default_profiles_partition, schema
        ).withColumn("_error", F.lit(None).cast("string"))
    if untrusted:
        import uuid

        from ..plans.isolate import (
            PROFILE_UDF_MEMORY_MB,
            PROFILE_UDF_TIMEOUT_SEC,
            supports_isolation,
        )

        timeout_sec = (
            PROFILE_UDF_TIMEOUT_SEC if timeout_sec is None else timeout_sec
        )
        memory_mb = PROFILE_UDF_MEMORY_MB if memory_mb is None else memory_mb
        out_schema = StructType(
            list(schema.fields) + [StructField("_error", StringType())]
        )
        null_cols = [f.name for f in schema.fields if f.name != "user_id"]
        expected_cols = [f.name for f in schema.fields]
        token = uuid.uuid4().hex
        isolated = supports_isolation()
        fn = profile_fn
        lease = _RunnerLease(fn, timeout_sec, memory_mb, token)

        def _coerce_result_types(
            out: pd.DataFrame, fields
        ) -> pd.DataFrame:
            """Coerce each result column to its declared Spark type so an
            incompatible cell (e.g. a string in a long column) becomes
            THIS user's `_error` row instead of failing the whole batch
            in the parent worker's Arrow conversion — the exact failure
            mode shape-validation exists to contain (round-9 ADVICE).
            Raises on an incoercible cell; the caller traps it."""
            for f in fields:
                c, t = f.name, f.dataType.simpleString()
                col = out[c]
                if t in ("bigint", "int", "smallint", "tinyint"):
                    num = pd.to_numeric(col, errors="raise")
                    nn = num.dropna()
                    if len(nn) and not (nn % 1 == 0).all():
                        raise ValueError(
                            f"non-integer value in {t} column {c!r}"
                        )
                    out[c] = num.astype("Int64")
                elif t in ("double", "float"):
                    out[c] = pd.to_numeric(col, errors="raise").astype(
                        "float64"
                    )
                elif t == "string":
                    out[c] = col.map(
                        lambda v: v
                        if v is None or isinstance(v, str)
                        else str(v)
                    )
                elif t.startswith("timestamp") or t == "date":
                    out[c] = pd.to_datetime(col, errors="raise")
                elif t == "boolean":
                    for v in col.dropna():
                        if not isinstance(v, bool) and type(v).__name__ not in (
                            "bool_",
                        ):
                            raise ValueError(
                                f"non-boolean value {v!r} in column {c!r}"
                            )
                # nested array/map/struct types: left to Arrow validation
            return out

        def guarded(pdf: pd.DataFrame) -> pd.DataFrame:
            if isolated:
                out, err = lease.runner().run(pdf)
            else:
                try:
                    out, err = fn(pdf), None
                except Exception as ex:
                    out, err = None, f"{type(ex).__name__}: {ex}"
            # Shape-validate BEFORE handing the frame to Arrow: a
            # malformed ProfileFunction result (None, non-DataFrame,
            # missing columns) must be contained as this USER's error
            # row, not crash the whole batch in the parent worker's
            # Arrow conversion (r8 review finding #1).
            if err is None:
                if not isinstance(out, pd.DataFrame):
                    err = (
                        "ProfileResultError: ProfileFunction returned "
                        f"{type(out).__name__}, expected DataFrame"
                    )
                else:
                    missing = [
                        c for c in expected_cols if c not in out.columns
                    ]
                    if missing:
                        err = (
                            "ProfileResultError: result missing columns "
                            f"{missing}"
                        )
            if err is None:
                out = out[expected_cols].copy()
                try:
                    out = _coerce_result_types(out, schema.fields)
                except Exception as ex:
                    err = (
                        "ProfileResultError: type coercion failed: "
                        f"{type(ex).__name__}: {ex}"
                    )
            if err is None:
                out["_error"] = None
                return out
            row = {c: [None] for c in null_cols}
            row["user_id"] = [pdf["user_id"].iloc[0]]
            row["_error"] = [err]
            return pd.DataFrame(row)

        return events.groupBy("user_id").applyInPandas(guarded, out_schema)
    if profile_fn is default_profile_fn:
        # Fast path for the built-in: prune to the consumed columns (Arrow
        # ships only these), hash-shuffle by user, vectorize per partition.
        pruned = events.select("user_id", "ts", "event_id", "event_type")
        if not assume_clustered:
            pruned = pruned.repartition("user_id")
        return pruned.mapInPandas(_default_profiles_partition, schema)
    return events.groupBy("user_id").applyInPandas(profile_fn, schema)


def profile_error_log_rows(profiles: DataFrame) -> DataFrame:
    """Events-log rows for contained ProfileFunction failures (the
    reference logs the disposal reason per connection,
    `profiles-udf-wrapper.ts:262-266`): one level=error row per failed
    user, shaped for sinks_api.append_events_log."""
    return (
        profiles.where(F.col("_error").isNotNull())
        .select(
            F.col("user_id").cast("string").alias("actor_id"),
            F.col("_error").alias("message"),
        )
        .withColumn("level", F.lit("error"))
        .withColumn("type", F.lit("profile"))
        .withColumn("timestamp", F.current_timestamp())
    )


def profile_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked entry: full profile build over the events table."""
    return build_profiles(load_table(spark, sf_dir, "events"))


RAW_PARTITIONS = 240  # profiles-functions.ts:12-13


def append_profiles_raw(events: DataFrame, raw_dir: str) -> None:
    """S9 — the profile builder's raw event store: events tee'd per user
    with a hash partition id (`libs/core-functions/src/functions/
    profiles-functions.ts:55-101`, partition = hash(userId)%240 at `:87`).

    On disk the partition column prunes per-instance scans: a builder
    instance responsible for partitions [a,b) reads only those directories,
    which is the reference's instance-sharding re-expressed as partition
    pruning. Retention (profileWindowDays=365) is a periodic
    delete-old-partitions job, mirroring the TTL'd Mongo collections.
    """
    (
        events.withColumn(
            "_partition_id", F.pmod(F.hash("user_id"), F.lit(RAW_PARTITIONS))
        )
        .write.mode("append")
        .partitionBy("_partition_id")
        .parquet(raw_dir)
    )


def read_profiles_raw(
    spark: SparkSession, raw_dir: str, partition_range: tuple[int, int] | None = None
) -> DataFrame:
    df = spark.read.parquet(raw_dir)
    if partition_range is not None:
        lo, hi = partition_range
        df = df.where(F.col("_partition_id").between(lo, hi - 1))
    return df


# The SQL oracle reproduces the UDAF exactly — longest run via
# gaps-and-islands (two row_numbers), proving the pandas path == relational
# semantics.
PROFILE_BUILD_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
  FROM events
),
islands AS (
  SELECT user_id, event_type, count(*) AS run_len
  FROM ordered
  GROUP BY user_id, event_type, rn - rn_t
)
SELECT e.user_id,
       count(*) AS n_events,
       count(DISTINCT event_type) AS n_event_types,
       arg_max(event_type, printf('%020d', epoch_us(ts)) || printf('%012d', event_id)) AS last_event_type,
       (SELECT max(run_len) FROM islands i WHERE i.user_id = e.user_id) AS longest_run,
       max(make_timestamp(epoch_ns(ts) // 1000)) AS updated_at
FROM events e
GROUP BY e.user_id
"""


QUERIES = {"profile_build": profile_build}
ORACLE = {"profile_build": PROFILE_BUILD_SQL}
