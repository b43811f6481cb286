"""Live sessionization — the streaming twin of
`operators.events_ops.sessionize_df`.

The batch form assigns sessions with a lag/cumsum window over history; a
live CDP emits a SESSION-CLOSED record the moment a user goes idle (the
row session-analytics destinations and audience triggers consume).
This operator keys the stream by user_id (`applyInPandasWithState`) and
keeps ONE open session per user: (start_us, last_us, n_events,
entry struct). Each micro-batch folds its events in event order; an
event more than SESSION_GAP_MIN after the previous one CLOSES the open
session (emitting its summary row) and starts the next. A user idle
past the processing-time timeout has their open session flushed as
closed — the state-timeout close the reference's TTL'd event buffers
imply (`libs/core-functions/src/functions/lib/store.ts:7`,
user-recognition buffers `user-recognition.ts:24-82`).

State is O(1) per user — four scalars and the entry key — regardless of
event rate (contrast the burst detector's bounded bucket array).

Semantics parity: over an in-order feed, the closed-session rows
(n_events, duration, entry type) equal the batch `sessionize_df`
sessions for that user no matter how the feed splits into
micro-batches, with the SAME strict-> gap convention — pinned in
`tests/test_streaming_sessions.py`. Out-of-order events beyond the gap
horizon can mis-split (the standard watermark assumption documented by
the pipeline's other stateful ops).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.events_ops import SESSION_GAP_MIN

GAP_US = SESSION_GAP_MIN * 60 * 1_000_000
# flush an open session once the user has been idle well past the gap
IDLE_FLUSH_MS = 2 * SESSION_GAP_MIN * 60 * 1000

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("duration_sec", LongType()),
        StructField("entry_event_type", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("entry_event_type", StringType()),
    ]
)


def _row(user_id, start_us, last_us, n_events, entry):
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "n_events": n_events,
        "duration_sec": (last_us - start_us) // 1_000_000,
        "entry_event_type": entry,
    }


def _fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    if state.hasTimedOut:
        start_us, last_us, n, entry = state.get
        state.remove()
        yield pd.DataFrame([_row(user_id, start_us, last_us, n, entry)])
        return
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return
    pdf = (pd.concat(chunks) if len(chunks) > 1 else chunks[0]).sort_values(
        ["ts", "event_id"]
    )
    us = pdf["ts"].astype("int64").to_numpy() // 1_000
    types = pdf["event_type"].to_numpy()
    open_s = state.get if state.exists else None
    closed: list[dict] = []
    for i in range(len(pdf)):
        t = int(us[i])
        if open_s is None:
            open_s = (t, t, 1, types[i])
        else:
            start_us, last_us, n, entry = open_s
            # strict > gap test: an event exactly GAP after the previous
            # one stays in the session (the batch lag-window convention)
            if t - last_us > GAP_US:
                closed.append(
                    _row(user_id, start_us, last_us, n, entry)
                )
                open_s = (t, t, 1, types[i])
            else:
                open_s = (start_us, t, n + 1, entry)
    state.update(tuple(open_s))
    state.setTimeoutDuration(IDLE_FLUSH_MS)
    if closed:
        yield pd.DataFrame(closed)


def session_close_stream(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with (user_id, ts, event_id,
    event_type). Emits one closed-session row per session, at the
    moment a later event proves the gap — or at the idle-flush timeout
    for the trailing open session."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fold,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
