"""End-to-end scheduler tick (round 4): due_syncs -> connector capture
(with fed-back state) -> incremental MERGE -> STATE + last-run persist,
composed in `sources/tick.scheduler_tick`. The two-tick test is the
user-visible contract: the second tick resumes from the first's STATE,
redelivered records dedup via the MERGE, and a not-due sync's connector
never runs."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from jitsu_spark.sinks import WarehouseSink
from jitsu_spark.sources.scheduler import SyncJobSpec
from jitsu_spark.sources.sync import SyncState
from jitsu_spark.sources.tick import ScheduledSync, scheduler_tick

# r13: long end-to-end file — excluded from the default pytest profile
# (pytest.ini addopts -m "not slow"); run with -m slow / -m "slow or not slow".
pytestmark = pytest.mark.slow

T1 = dt.datetime(2024, 5, 1, 12, 0, tzinfo=dt.timezone.utc)
T2 = dt.datetime(2024, 5, 1, 12, 1, tzinfo=dt.timezone.utc)

USERS = [
    {"id": 1, "email": "a@x.io"},
    {"id": 2, "email": "b@x.io"},
    {"id": 3, "email": "c@x.io"},
    {"id": 4, "email": "d@x.io"},
    {"id": 5, "email": "e@x.io"},
]


class FakeConnector:
    """An Airbyte-protocol connector twin: invoked with the previously
    persisted state, emits records AFTER that cursor (plus one
    redelivered record to exercise the at-least-once overlap) and a
    final STATE message."""

    def __init__(self, capture_root):
        self.capture_root = str(capture_root)
        self.invocations = []

    def __call__(self, sync_id: str, state: dict | None) -> str:
        self.invocations.append((sync_id, state))
        cursor = (state or {}).get("users", {}).get("cursor", 0)
        # redeliver the last already-synced record (overlap), then new
        emit = [u for u in USERS if u["id"] >= max(cursor, 1) and u["id"] <= cursor + 2]
        path = os.path.join(
            self.capture_root, f"{sync_id}-run{len(self.invocations)}"
        )
        os.makedirs(path)
        with open(os.path.join(path, "out.jsonl"), "w") as f:
            for u in emit:
                f.write(
                    json.dumps(
                        {
                            "type": "RECORD",
                            "record": {
                                "stream": "users",
                                "data": json.dumps(u),
                                "emitted_at": 1714564800000 + u["id"] * 1000,
                            },
                        }
                    )
                    + "\n"
                )
            new_cursor = max((u["id"] for u in emit), default=cursor)
            f.write(
                json.dumps(
                    {
                        "type": "STATE",
                        "state": {
                            "data": json.dumps({"users": {"cursor": new_cursor}})
                        },
                    }
                )
                + "\n"
            )
        return path


@pytest.fixture
def harness(spark, tmp_path):
    sink = WarehouseSink(spark, str(tmp_path / "wh"))
    state = SyncState(str(tmp_path / "state"))
    connector = FakeConnector(tmp_path / "captures")
    syncs = [
        ScheduledSync(
            SyncJobSpec("s-users", "* * * * *"),  # due every minute
            {
                "streams": {
                    "users": {
                        "sync_mode": "incremental",
                        "primary_key": ["_record_hash"],
                    }
                }
            },
        ),
        ScheduledSync(
            SyncJobSpec("s-rare", "0 0 1 1 *"),  # not due at T1/T2
            {"streams": {"orders": {"sync_mode": "full_refresh"}}},
        ),
    ]
    return sink, state, connector, syncs


def _user_ids(spark, sink):
    return sorted(
        json.loads(r.event)["id"] for r in sink.read("users").collect()
    )


class TestTwoTickResume:
    def test_second_tick_resumes_from_first_state(self, spark, harness):
        sink, state, connector, syncs = harness

        r1 = scheduler_tick(spark, syncs, connector, sink, state, T1)
        assert set(r1) == {"s-users"}  # the rare sync did not run
        assert connector.invocations == [("s-users", None)]
        assert _user_ids(spark, sink) == [1, 2]
        assert state.get_airbyte_state("s-users") == {"users": {"cursor": 2}}
        assert state.get_last_run("s-users") == T1

        r2 = scheduler_tick(spark, syncs, connector, sink, state, T2)
        assert set(r2) == {"s-users"}
        # the connector was invoked WITH the persisted state
        assert connector.invocations[-1] == (
            "s-users",
            {"users": {"cursor": 2}},
        )
        # record 2 was redelivered (overlap) and 3, 4 are new; the MERGE
        # dedups the overlap — no duplicate rows
        assert _user_ids(spark, sink) == [1, 2, 3, 4]
        assert state.get_airbyte_state("s-users") == {"users": {"cursor": 4}}
        assert state.get_last_run("s-users") == T2

    def test_same_minute_retick_is_a_noop(self, spark, harness):
        sink, state, connector, syncs = harness
        scheduler_tick(spark, syncs, connector, sink, state, T1)
        n = len(connector.invocations)
        r = scheduler_tick(spark, syncs, connector, sink, state, T1)
        assert r == {} and len(connector.invocations) == n

    def test_crash_between_load_and_checkpoint_is_idempotent(
        self, spark, harness
    ):
        """At-least-once: if the tick crashed after the MERGE but before
        the STATE persisted, the next tick re-runs the connector from
        the OLD state and re-merges the slice — row set unchanged."""
        sink, state, connector, syncs = harness
        scheduler_tick(spark, syncs, connector, sink, state, T1)
        rows_after_t1 = _user_ids(spark, sink)
        # simulate the crash: roll the checkpoint back to pre-tick
        state.set_airbyte_state("s-users", None)
        state.set_last_run("s-users", T1 - dt.timedelta(minutes=5))
        scheduler_tick(spark, syncs, connector, sink, state, T1)
        assert _user_ids(spark, sink) == rows_after_t1  # no duplicates
