"""One scheduler tick, end to end (S10 composition, round 4).

The pieces exist and are separately tested — `scheduler.due_syncs` (cron
+ timezone), `airbyte.run_airbyte_sync` (capture -> per-stream
full_refresh/incremental MERGE), `sync.SyncState` (cursor / connection
state / last-run persistence) — but the thing a user actually runs is
the COMPOSED path the reference's scheduler fires per job
(`webapps/console/lib/server/sync.ts:653-742` -> `/sources/run?syncId=`):

    tick(now):
      for each sync due at `now`:
        state  = last persisted Airbyte connection state
        capture = run the connector WITH that state  (capture_provider)
        load it (full_refresh replace / incremental MERGE)
        persist the capture's last STATE + last_run = now

At-least-once holds across crashes: state persists only after the load
commits, so a crashed tick re-runs the connector from the previous
state and re-merges an already-loaded slice — the MERGE dedup makes
that idempotent (the same W1 contract as the event spine).

`capture_provider(sync_id, state) -> path` abstracts the connector
invocation (a real deployment execs the connector image with
`--state`; tests and file-based sources drop a JSONL capture).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .airbyte import run_airbyte_sync
from .scheduler import SyncJobSpec, due_syncs
from .sync import SyncState


@dataclass(frozen=True)
class ScheduledSync:
    """A sync as the scheduler sees it: cron spec + stream settings."""

    spec: SyncJobSpec
    sync_options: dict = field(default_factory=dict)


def scheduler_tick(
    spark: SparkSession,
    syncs: list[ScheduledSync],
    capture_provider: Callable[[str, dict | None], str],
    sink,
    state: SyncState,
    now: dt.datetime,
) -> dict:
    """Run every sync due at `now`; returns {sync_id: report} where the
    report is `run_airbyte_sync`'s per-stream summary plus the persisted
    state. Syncs not due are untouched (their connector never runs)."""
    due = due_syncs(
        [s.spec for s in syncs],
        {
            s.spec.sync_id: lr
            for s in syncs
            if (lr := state.get_last_run(s.spec.sync_id)) is not None
        },
        now,
    )
    by_id = {s.spec.sync_id: s for s in syncs}
    reports: dict = {}
    for sync_id in due:
        sync = by_id[sync_id]
        prior = state.get_airbyte_state(sync_id)
        capture_path = capture_provider(sync_id, prior)
        report = run_airbyte_sync(
            spark, capture_path, sync.sync_options, sink
        )
        # checkpoint ONLY after the load committed (at-least-once;
        # records preceding a STATE are durable once it is saved)
        if report.get("_state") is not None:
            state.set_airbyte_state(sync_id, report["_state"])
        state.set_last_run(sync_id, now)
        reports[sync_id] = report
    return reports
