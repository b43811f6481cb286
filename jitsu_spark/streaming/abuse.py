"""Stateful streaming burst detection — the streaming twin of
`operators.events_ops.user_burst_detection`.

The batch form scans history with a RANGE window; a live abuse gate
cannot wait for the nightly scan. This operator keys the stream by
user_id (`applyInPandasWithState`, the same stateful machinery as user
recognition) and keeps, per user, only the event times inside the
trailing BURST_WINDOW_SEC of that user's newest event — so state is
bounded by the user's own 5-minute activity, not by history. Each
micro-batch merges its events into the retained times, recomputes the
max trailing-window count with one two-pointer sweep, and emits the
user's running maximum + flag. Idle users are dropped by a
processing-time state timeout (W4's TTL pattern).

Semantics parity: over any in-order event feed, the emitted running
max_burst equals the batch operator's `max_burst` for that user no
matter how the feed is split into micro-batches (pinned in
`tests/test_streaming_abuse.py`). Events arriving later than
BURST_WINDOW_SEC out of order can undercount (their window's older
times were pruned) — the same watermark assumption the pipeline's other
stateful ops document.

Reference context: the volumetric complement of the UA bot filter
(`libs/core-functions/src/functions/lib/ua.ts:6,22`) run as a live
gate rather than a report.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..operators.events_ops import BURST_FLAG_COUNT, BURST_WINDOW_SEC

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("batch_events", LongType()),
        StructField("max_burst", LongType()),
        StructField("flagged", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("times", ArrayType(DoubleType())),
        StructField("max_burst", LongType()),
    ]
)

IDLE_TIMEOUT_MS = 4 * BURST_WINDOW_SEC * 1000


def _detect(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    times, max_burst = state.get if state.exists else ([], 0)
    times = list(times)
    new = 0
    for pdf in pdfs:
        for t in pdf["ts"]:
            times.append(t.timestamp())
            new += 1
    if not times:
        return
    times.sort()
    # max count in any [t - W, t] — one two-pointer sweep (the batch
    # RANGE frame's inclusive bounds, so parity is exact)
    best, lo = int(max_burst), 0
    for i, t in enumerate(times):
        while times[lo] < t - BURST_WINDOW_SEC:
            lo += 1
        best = max(best, i - lo + 1)
    # retain only times still inside a possible future window
    cutoff = times[-1] - BURST_WINDOW_SEC
    keep = [t for t in times if t >= cutoff]
    state.update((keep, best))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "batch_events": new,
                "max_burst": best,
                "flagged": best > BURST_FLAG_COUNT,
            }
        ]
    )


def burst_detection_stream(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with at least (user_id, ts). Emits
    one (user_id, batch_events, max_burst, flagged) row per active user
    per micro-batch."""
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _detect,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
