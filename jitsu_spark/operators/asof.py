"""As-of (temporal) join — attribute each event to the latest prior state.

Spark has no native ASOF JOIN (DuckDB/Pandas do; Flink has temporal joins).
The scalable composition is union + running `last(...ignorenulls)` window:
tag state rows and probe rows, union them, and let a single
partition-by-key window carry the latest state forward to every probe row.

Scale notes (100 TB stance):
- ONE shuffle total (hash by key for the window), vs the naive
  range-join (probe x state inequality join) which explodes to
  O(|probe| * |state per key|) pairs before the argmax. The window form
  is linear in input rows and streams within each key partition.
- The window frame is (unboundedPreceding -> currentRow) with a running
  `last` — Spark evaluates it in one pass per partition, no buffering of
  the whole key group.
- Skewed keys (one user with millions of events) can be salted only if
  state is replicated per salt; for event data the per-key cardinality is
  bounded by user activity, so the hash window is the right default.

Reference anchor: user recognition (`libs/core-functions/src/functions/
user-recognition.ts`) stitches *backwards* (anonymous events get the
LATER identify); this operator is the forward/attribution twin — each
event gets the latest state at-or-before its timestamp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table


def asof_backward(
    probe: DataFrame,
    state: DataFrame,
    keys: list[str],
    ts: str = "ts",
    state_cols: list[str] | None = None,
) -> DataFrame:
    """For each probe row, append the state row values at the greatest
    state.ts <= probe.ts with matching keys (NULLs when no prior state).

    `state` must be unique per (keys, ts) — pre-aggregate upstream if not.
    Output = probe columns + `<col>_asof` for each state col.
    """
    from pyspark.sql.types import StructField, StructType

    state_cols = state_cols or [
        c for c in state.columns if c not in keys and c != ts
    ]
    probe_cols = [c for c in probe.columns if c not in keys and c != ts]
    # The state row is carried as ONE struct so the newest state row wins
    # atomically — carrying columns independently with last(ignorenulls)
    # would back-fill a legitimately-NULL column of the newest state row
    # from an older row, mixing columns of different state rows (diverges
    # from ASOF JOIN semantics for nullable state columns).
    state_struct_type = StructType(
        [StructField("__ts", state.schema[ts].dataType)]
        + [StructField(c, state.schema[c].dataType) for c in state_cols]
    )
    s_tag = state.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_kind"),
        F.struct(
            F.col(ts).alias("__ts"), *[F.col(c) for c in state_cols]
        ).alias("_state"),
        *[
            F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in probe_cols
        ],
    )
    p_tag = probe.select(
        *keys,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast(state_struct_type).alias("_state"),
        *[F.col(c) for c in probe_cols],
    )

    # state sorts before probes at equal ts (_kind 0 < 1) -> ">=" semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = s_tag.unionByName(p_tag).select(
        *keys,
        "_ts",
        "_kind",
        F.last("_state", ignorenulls=True).over(w).alias("_st"),
        *probe_cols,
    )
    return filled.where(F.col("_kind") == 1).select(
        *keys,
        F.col("_ts").alias(ts),
        *probe_cols,
        F.col("_st.__ts").alias(f"{ts}_asof"),
        *[F.col(f"_st.{c}").alias(f"{c}_asof") for c in state_cols],
    )


def asof_signup_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute each purchase to the user's most recent prior (or
    simultaneous) signup: the ASOF-LEFT-JOIN contract, oracle-checked
    against DuckDB's native ASOF JOIN.

    Purchases with no prior signup keep NULL attribution (left semantics).
    """
    ev = load_table(spark, sf_dir, "events")
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_backward(purchases, signups, keys=["user_id"], ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_asof").alias("signup_ts"),
        "signup_event_id_asof",
        (F.unix_micros("ts") - F.unix_micros("ts_asof")).alias(
            "us_since_signup"
        ),
        "value",
    )


ASOF_SIGNUP_SQL = """
WITH ev AS (
  SELECT event_id, user_id, event_type, value,
         make_timestamp(epoch_ns(ts) // 1000) AS ts
  FROM events
),
s AS (
  SELECT user_id, ts, max(event_id) AS signup_event_id
  FROM ev WHERE event_type = 'signup' GROUP BY 1, 2
),
p AS (
  SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts,
       s.ts AS signup_ts,
       s.signup_event_id AS signup_event_id_asof,
       epoch_us(p.ts) - epoch_us(s.ts) AS us_since_signup,
       p.value
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
"""


QUERIES = {"asof_signup_attribution": asof_signup_attribution}
ORACLE = {"asof_signup_attribution": ASOF_SIGNUP_SQL}
