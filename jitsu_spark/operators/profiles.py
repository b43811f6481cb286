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
    (the kind of logic ProfileFunctions exist for)."""
    pdf = pdf.sort_values(["ts", "event_id"])
    types = pdf["event_type"].to_numpy()
    longest = run = 1
    for i in range(1, len(types)):
        run = run + 1 if types[i] == types[i - 1] else 1
        longest = max(longest, run)
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


def build_profiles(
    events: DataFrame,
    profile_fn: Callable[[pd.DataFrame], pd.DataFrame] = default_profile_fn,
    schema: StructType = PROFILE_SCHEMA,
    since: str | None = None,
) -> DataFrame:
    """Run the profile UDAF; with `since`, only users with new events are
    recomputed (the reference's incremental watermark, `builder.ts:305-342`)
    but each recomputed user still sees FULL history."""
    if since is not None:
        changed = (
            events.where(F.col("ts") > F.lit(since).cast("timestamp"))
            .select("user_id")
            .distinct()
        )
        events = events.join(changed, "user_id", "left_semi")
    return events.groupBy("user_id").applyInPandas(profile_fn, schema)


def profile_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked entry: full profile build over the events table."""
    return build_profiles(load_table(spark, sf_dir, "events"))


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
