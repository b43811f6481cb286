"""User recognition as a stateful streaming operator.

Reference (`libs/core-functions/src/functions/user-recognition.ts:24-82`):
per anonymousId, anonymous events are buffered (TTL `lookbackWindowDays=30`,
`:16`); when an identified event with the same anonymousId arrives, the
buffered events are evicted, get `userId` + traits deep-merged in, and are
re-emitted alongside the identified event. Downstream exactly-once relies on
the sink's dedup-by-message_id upsert (`:25-30`) — re-emits are upserts.

Spark shape: `applyInPandasWithState` keyed by `anonymous_id`. State =
(buffered anonymous events, resolved identity). The 30-day TTL maps to a
processing-time state timeout; on timeout the buffer is flushed as-is
(still anonymous) and the state dropped — matching the reference's Mongo
TTL eviction. State is partitioned by key across executors, so the
operator scales with the key cardinality, and per-key buffers stay small
(a browsing session's worth of events).

Batch equivalent (same semantics over a bounded table):
jitsu_spark.operators.identity.user_recognition_backfill.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("message_id", StringType()),
        StructField("anonymous_id", StringType()),
        StructField("user_id", StringType()),
        StructField("traits_json", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("backfilled", BooleanType()),
    ]
)

# state: buffered events (as JSON strings), resolved user_id, merged traits
STATE_SCHEMA = StructType(
    [
        StructField("buffered", ArrayType(StringType())),
        StructField("user_id", StringType()),
        StructField("traits_json", StringType()),
    ]
)

LOOKBACK_DAYS_DEFAULT = 30  # user-recognition.ts:16


def _row_json(row: dict[str, Any]) -> str:
    r = dict(row)
    ts = r.get("timestamp")
    r["timestamp"] = None if ts is None or pd.isna(ts) else ts.isoformat()
    return json.dumps(r, default=str)


def _emit(rows: list[dict[str, Any]]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])
    out["timestamp"] = pd.to_datetime(out["timestamp"])
    return out


def _recognize(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    lookback_ms: int,
) -> Iterator[pd.DataFrame]:
    anonymous_id = key[0]
    if state.hasTimedOut:
        buffered, _, _ = state.get
        rows = [json.loads(b) for b in buffered]
        state.remove()
        if rows:
            yield _emit(
                [
                    {
                        "message_id": r["message_id"],
                        "anonymous_id": anonymous_id,
                        "user_id": None,
                        "traits_json": None,
                        "timestamp": r["timestamp"],
                        "backfilled": False,
                    }
                    for r in rows
                ]
            )
        return

    buffered, user_id, traits_json = (
        state.get if state.exists else ([], None, None)
    )
    buffered = list(buffered)
    traits: dict[str, Any] = json.loads(traits_json) if traits_json else {}
    out: list[dict[str, Any]] = []

    def _clean(v):
        # pandas materializes SQL NULLs as None or NaN depending on dtype
        return None if v is None or (isinstance(v, float) and pd.isna(v)) else v

    # concatenate the key's Arrow chunks BEFORE sorting: a large group
    # spans multiple chunks, and per-chunk sorts leave CHUNK ARRIVAL
    # order across them — "latest identity wins" then depended on which
    # chunk an identify landed in, not on its timestamp (round-9 spine
    # review finding #9). The group is one user's micro-batch slice —
    # the same bounded buffer the state already holds.
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        all_rows = pd.DataFrame()
    else:
        all_rows = pd.concat(chunks, ignore_index=True).sort_values(
            "timestamp", kind="mergesort"
        )
    for pdf in ([all_rows] if len(all_rows) else []):
        for row in pdf.to_dict("records"):
            row_traits = _clean(row.get("traits")) or {}
            if isinstance(row_traits, str):
                row_traits = json.loads(row_traits) if row_traits else {}
            if _clean(row.get("user_id")):
                # identify: latest identity wins, traits deep-merge
                user_id = row["user_id"]
                traits = {**traits, **row_traits}
                # evict + re-emit the buffer with identity backfilled
                for b in buffered:
                    ev = json.loads(b)
                    out.append(
                        {
                            "message_id": ev["message_id"],
                            "anonymous_id": anonymous_id,
                            "user_id": user_id,
                            "traits_json": json.dumps(traits),
                            "timestamp": ev["timestamp"],
                            "backfilled": True,
                        }
                    )
                buffered = []
                out.append(
                    {
                        "message_id": row["message_id"],
                        "anonymous_id": anonymous_id,
                        "user_id": user_id,
                        "traits_json": json.dumps(traits),
                        "timestamp": row["timestamp"],
                        "backfilled": False,
                    }
                )
            elif user_id is not None:
                # identity already known: enrich in-line, no buffering
                merged = {**traits, **row_traits}
                out.append(
                    {
                        "message_id": row["message_id"],
                        "anonymous_id": anonymous_id,
                        "user_id": user_id,
                        "traits_json": json.dumps(merged),
                        "timestamp": row["timestamp"],
                        "backfilled": True,
                    }
                )
            else:
                buffered.append(
                    _row_json(
                        {"message_id": row["message_id"], "timestamp": row["timestamp"]}
                    )
                )

    state.update((buffered, user_id, json.dumps(traits) if traits else None))
    state.setTimeoutDuration(lookback_ms)
    if out:
        yield _emit(out)


def user_recognition_stream(
    events: DataFrame,
    lookback_days: int = LOOKBACK_DAYS_DEFAULT,
    lookback_ms: int | None = None,
) -> DataFrame:
    """events: streaming DataFrame with at least
    (message_id, anonymous_id, user_id, traits, timestamp).
    `lookback_ms` overrides the TTL directly (tests exercise the
    timeout-flush path with millisecond TTLs)."""
    if lookback_ms is None:
        lookback_ms = lookback_days * 24 * 3600 * 1000

    def fn(key, pdfs, state):
        return _recognize(key, pdfs, state, lookback_ms)

    return (
        events.groupBy("anonymous_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
