"""Stateful streaming burst detection — the streaming twin of
`operators.events_ops.user_burst_detection`.

The batch form scans history with a RANGE window; a live abuse gate
cannot wait for the nightly scan. This operator keys the stream by
user_id (`applyInPandasWithState`, the same stateful machinery as user
recognition) and keeps, per user, PER-SECOND EVENT COUNTS for the
trailing BURST_WINDOW_SEC of that user's newest event — at most
BURST_WINDOW_SEC+1 integers per key, a hard bound that does NOT grow
with the user's event rate. (Raw-timestamp state would be "bounded by
the user's own 5-minute activity", but the keys this operator exists to
catch are exactly the ones with pathological 5-minute activity: a 10k
events/s abuser would pin ~3M floats re-sorted per micro-batch in one
task.) Each micro-batch folds its events into the second buckets,
recomputes the max trailing-window count with one prefix-sum sweep over
the occupied seconds, and emits the user's running maximum + flag. Idle
users are dropped by a processing-time state timeout (W4's TTL
pattern).

Semantics parity: the trailing window is evaluated at 1-second
granularity — count of events in the 301 seconds [s - W, s] for every
occupied second s — which equals the batch operator's RANGE frame
exactly whenever event times are whole seconds (the flag threshold
never needs sub-second anchoring). Over any in-order event feed the
emitted running max_burst then equals the batch `max_burst` no matter
how the feed is split into micro-batches (pinned in
`tests/test_streaming_abuse.py`). Events arriving later than
BURST_WINDOW_SEC out of order can undercount (their window's older
buckets were pruned) — the same watermark assumption the pipeline's
other stateful ops document.

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

# state = (seconds, counts) parallel arrays over the OCCUPIED seconds of
# the trailing window (sorted ascending) + the running max: never more
# than BURST_WINDOW_SEC + 1 entries, whatever the event rate.
STATE_SCHEMA = StructType(
    [
        StructField("seconds", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("max_burst", LongType()),
    ]
)

IDLE_TIMEOUT_MS = 4 * BURST_WINDOW_SEC * 1000


def _detect(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    if state.hasTimedOut:
        state.remove()
        return
    secs, cnts, max_burst = (
        state.get if state.exists else ([], [], 0)
    )
    chunks = [np.asarray(secs, dtype=np.int64)]
    weights = [np.asarray(cnts, dtype=np.int64)]
    new = 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        ev_secs = pdf["ts"].astype("int64").to_numpy() // 1_000_000_000
        chunks.append(ev_secs)
        weights.append(np.ones(len(ev_secs), dtype=np.int64))
        new += len(ev_secs)
    if new == 0 and not len(chunks[0]):
        return
    # fold this batch's events into the per-second buckets
    all_secs = np.concatenate(chunks)
    all_w = np.concatenate(weights)
    secs_u, inv = np.unique(all_secs, return_inverse=True)
    counts = np.zeros(len(secs_u), dtype=np.int64)
    np.add.at(counts, inv, all_w)
    # max count in the 301 seconds [s - W, s] for every occupied s —
    # prefix-sum sweep over occupied seconds only (the batch RANGE
    # frame's inclusive bounds at 1-second granularity)
    prefix = np.concatenate(([0], np.cumsum(counts)))
    lo = np.searchsorted(secs_u, secs_u - BURST_WINDOW_SEC, side="left")
    windows = prefix[1 : len(secs_u) + 1] - prefix[lo]
    best = max(int(max_burst), int(windows.max()))
    # retain only seconds still inside a possible future window
    cutoff = int(secs_u[-1]) - BURST_WINDOW_SEC
    keep = secs_u >= cutoff
    state.update((secs_u[keep].tolist(), counts[keep].tolist(), best))
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
