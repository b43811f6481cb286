"""Size-gated join hints.

`broadcast()` is only correct-at-scale when the build side is genuinely
bounded (a dimension table, a probe list, a centroid set). For sides that
grow with the data (per-user identity maps, per-doc aggregates, `customer`
at high SF) an unconditional hint becomes an executor OOM at 100x. The gate
reads Catalyst's own size estimate from the optimized logical plan — no job
is triggered — and falls back to a plain join (letting AQE pick the
strategy at runtime) when the side is too big or the estimate is
unavailable.

`SPARK_GRAFT_BROADCAST_MAX` (bytes) overrides the default threshold; tests
force it to 0 to assert the fallback engages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Matches Spark's own spark.sql.autoBroadcastJoinThreshold default (10 MB).
DEFAULT_BROADCAST_MAX_BYTES = 10 << 20


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for the optimized logical plan.

    Plan-time statistics only (file sizes x selectivity heuristics); no
    Spark job runs. Returns None when the JVM call fails (e.g. a plan
    that cannot be optimized without execution)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(stats.sizeInBytes())
    except Exception:
        return None


def broadcast_threshold_bytes() -> int:
    raw = os.environ.get("SPARK_GRAFT_BROADCAST_MAX")
    return int(raw) if raw is not None else DEFAULT_BROADCAST_MAX_BYTES


def maybe_broadcast(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """`broadcast(df)` if Catalyst estimates it under the threshold, else
    `df` unchanged (plain join; AQE may still re-plan a broadcast at
    runtime from *measured* sizes, which is exactly the desired behavior
    for growing sides)."""
    limit = broadcast_threshold_bytes() if max_bytes is None else max_bytes
    size = plan_size_bytes(df)
    if size is not None and size <= limit:
        return F.broadcast(df)
    return df
