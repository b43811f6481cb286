"""Workspace throttle / shard load-shedding gates.

Reference: workspaces carry `featuresEnabled` strings like "throttle=30"
or "shard=2"; the admin export parses them with `getNumericOption`
(`webapps/console/pages/api/admin/export/[name]/index.ts:552-562`, capped
at 100) and attaches throttlePercent/shardNumber to each exported stream
(`:355-358`) for the ingest layer to enforce.

Spark shape: both gates are pure column predicates (codegen, no shuffle,
pushed to the scan when the key is a scan column):
- throttle: drop `percent`% of a workspace's events. The reference sheds
  with Math.random; here the verdict is a deterministic md5 bucket of the
  event id, so replays and retries of the same event get the same verdict
  (at-least-once delivery stays idempotent) while the kept fraction still
  converges to (100 - percent)%.
- shard: keep the rows whose key hashes to this worker's shard — the
  horizontal-partitioning twin of the same bucket arithmetic.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_numeric_option(
    name: str, features_enabled: list[str] | None, default: int | None = None
) -> int | None:
    """Port of `getNumericOption` (export/[name]/index.ts:552-562): find
    the first feature string starting with `name`, take its first number,
    cap at 100."""
    for f in features_enabled or []:
        if f.startswith(name):
            m = re.search(r"(\d+)", f)
            if m:
                return min(100, int(m.group(1)))
    return default


def _percent_bucket(key: Column) -> Column:
    """Deterministic 0-99 bucket from the event key (md5, same family as
    operators.sampling)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 7), 16, 10)
        .cast("long")
        % 100
    )


def throttle_gate(
    df: DataFrame, percent: int | None, key: str = "message_id"
) -> DataFrame:
    """Shed `percent`% of events deterministically by event key.

    percent=None/0 is a no-op; percent>=100 drops everything."""
    if not percent:
        return df
    return df.where(_percent_bucket(F.col(key)) >= int(min(100, percent)))


def shard_filter(
    df: DataFrame, shard_number: int, total_shards: int, key: str = "stream_id"
) -> DataFrame:
    """Keep only this shard's rows: hash(key) % total == shard_number."""
    if total_shards <= 1:
        return df
    return df.where(
        F.pmod(F.xxhash64(F.col(key)), F.lit(total_shards))
        == int(shard_number)
    )


def _percent_bucket_duck(expr: str) -> str:
    """DuckDB mirror of _percent_bucket (same md5 arithmetic family as
    operators.sampling)."""
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 7))::UBIGINT"
        " AS BIGINT) % 100"
    )


def workspace_throttle_gate(
    df: DataFrame,
    workspace_throttle: dict[str, int],
    workspace_col: str = "workspace_id",
    key: str = "message_id",
) -> DataFrame:
    """Apply per-workspace throttle percents in one predicate: the
    percent map compiles into the plan as a literal lookup (workspaces
    are config-scale, not data-scale), so the gate stays a scan-level
    filter with no join."""
    gated = {w: p for w, p in workspace_throttle.items() if p}
    if not gated:
        return df
    pct = F.lit(0)
    for w, p in sorted(gated.items()):
        pct = F.when(F.col(workspace_col) == w, F.lit(int(min(100, p)))).otherwise(pct)
    return df.where(_percent_bucket(F.col(key)) >= pct)


# ---------------------------------------------------------------------------
# Registry queries (driver-checked): the shed gates over the events table.
# ---------------------------------------------------------------------------

THROTTLE_PCT = 30


def throttle_shed_events(spark, sf_dir: str):
    """Shed THROTTLE_PCT% of events deterministically by event_id — the
    single-workspace gate as a correctness-gated query."""
    from ..tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return throttle_gate(ev, THROTTLE_PCT, key="event_id").select(
        "event_id", "user_id", "event_type"
    )


THROTTLE_SHED_SQL = f"""
SELECT event_id, user_id, event_type
FROM events
WHERE {_percent_bucket_duck('event_id')} >= {THROTTLE_PCT}
"""


def workspace_throttle_events(spark, sf_dir: str):
    """Per-workspace shedding: workspaces derived as user_id % 3 with
    percents {{w0: 50, w2: 100}} (w1 untouched) — exercises the literal
    CASE gate end to end."""
    from ..tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "workspace_id",
        F.concat(
            F.lit("w"), F.pmod(F.col("user_id"), F.lit(3)).cast("string")
        ),
    )
    gated = workspace_throttle_gate(
        ev, {"w0": 50, "w2": 100}, key="event_id"
    )
    return gated.groupBy("workspace_id").agg(
        F.count(F.lit(1)).alias("n_kept")
    )


WORKSPACE_THROTTLE_SQL = f"""
WITH ev AS (
  SELECT event_id, 'w' || CAST(user_id % 3 AS VARCHAR) AS workspace_id
  FROM events
)
SELECT workspace_id, count(*) AS n_kept
FROM ev
WHERE {_percent_bucket_duck('event_id')} >=
      CASE workspace_id WHEN 'w0' THEN 50 WHEN 'w2' THEN 100 ELSE 0 END
GROUP BY 1
"""


QUERIES = {
    "throttle_shed_events": throttle_shed_events,
    "workspace_throttle_events": workspace_throttle_events,
}

ORACLE = {
    "throttle_shed_events": THROTTLE_SHED_SQL,
    "workspace_throttle_events": WORKSPACE_THROTTLE_SQL,
}
