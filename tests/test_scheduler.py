"""Sync scheduler semantics (`jitsu_spark/sources/scheduler.py`) — cron +
timezone evaluation and the Cloud Scheduler reconcile diff
(`webapps/console/lib/server/sync.ts:653-742`), plus the devnull
destination (`destinations.tsx:789-797`)."""

from __future__ import annotations

import datetime as dt

import pytest

from jitsu_spark.sources.scheduler import (
    CronSchedule,
    SyncJobSpec,
    due_syncs,
    reconcile_jobs,
)

UTC = dt.timezone.utc


def _utc(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s).replace(tzinfo=UTC)


class TestCronSchedule:
    def test_every_minute(self):
        c = CronSchedule("* * * * *")
        assert c.matches(_utc("2024-03-15T10:23:00"))

    def test_specific_time(self):
        c = CronSchedule("30 9 * * *")
        assert c.matches(_utc("2024-03-15T09:30:00"))
        assert not c.matches(_utc("2024-03-15T09:31:00"))

    def test_steps_ranges_lists(self):
        c = CronSchedule("*/15 8-10 * * 1,3,5")  # Mon/Wed/Fri
        assert c.matches(_utc("2024-03-15T08:45:00"))  # a Friday
        assert not c.matches(_utc("2024-03-16T08:45:00"))  # Saturday
        assert not c.matches(_utc("2024-03-15T08:50:00"))
        assert not c.matches(_utc("2024-03-15T11:00:00"))

    def test_dow_seven_is_sunday(self):
        assert CronSchedule("0 0 * * 7").matches(_utc("2024-03-17T00:00:00"))
        assert CronSchedule("0 0 * * 0").matches(_utc("2024-03-17T00:00:00"))

    def test_dom_dow_either_matches_when_both_restricted(self):
        # classic cron: "0 0 13 * 5" fires on the 13th AND on Fridays
        c = CronSchedule("0 0 13 * 5")
        assert c.matches(_utc("2024-09-13T00:00:00"))  # Friday the 13th
        assert c.matches(_utc("2024-09-20T00:00:00"))  # a Friday, not 13th
        assert c.matches(_utc("2024-08-13T00:00:00"))  # 13th, a Tuesday
        assert not c.matches(_utc("2024-08-14T00:00:00"))

    def test_timezone_wall_clock(self):
        # 9am New York is 13:00/14:00 UTC depending on DST — both honored
        c = CronSchedule("0 9 * * *", "America/New_York")
        assert c.matches(_utc("2024-01-15T14:00:00"))  # EST (UTC-5)
        assert c.matches(_utc("2024-07-15T13:00:00"))  # EDT (UTC-4)
        assert not c.matches(_utc("2024-07-15T14:00:00"))

    def test_next_run(self):
        c = CronSchedule("0 */6 * * *")
        assert c.next_run(_utc("2024-03-15T07:01:00")) == _utc(
            "2024-03-15T12:00:00"
        )
        # strictly after: an exact-match anchor advances to the next slot
        assert c.next_run(_utc("2024-03-15T12:00:00")) == _utc(
            "2024-03-15T18:00:00"
        )

    def test_invalid_rejected(self):
        with pytest.raises(ValueError):
            CronSchedule("61 * * * *")
        with pytest.raises(ValueError):
            CronSchedule("* * * *")


class TestReconcile:
    def test_create_delete_update_diff(self):
        desired = {
            "s1": SyncJobSpec("s1", "0 * * * *"),
            "s2": SyncJobSpec("s2", "0 9 * * *", "America/New_York"),
            "s3": SyncJobSpec("s3", "*/5 * * * *"),
        }
        existing = {
            "s2": SyncJobSpec("s2", "0 9 * * *", "Etc/UTC"),  # tz changed
            "s3": SyncJobSpec("s3", "*/5 * * * *"),  # unchanged
            "s4": SyncJobSpec("s4", "0 0 * * *"),  # orphaned
        }
        diff = reconcile_jobs(desired, existing)
        assert diff == {"create": ["s1"], "delete": ["s4"], "update": ["s2"]}


class TestDueSyncs:
    def test_due_after_last_run(self):
        specs = [
            SyncJobSpec("hourly", "0 * * * *"),
            SyncJobSpec("daily", "0 9 * * *"),
        ]
        last = {
            "hourly": _utc("2024-03-15T09:00:00"),
            "daily": _utc("2024-03-15T09:00:00"),
        }
        now = _utc("2024-03-15T10:00:30")
        assert due_syncs(specs, last, now) == ["hourly"]

    def test_never_ran_fires_on_recent_match(self):
        specs = [SyncJobSpec("s", "0 * * * *")]
        assert due_syncs(specs, {}, _utc("2024-03-15T10:00:30")) == ["s"]


def test_devnull_sink_runs_chain_side_effects(spark, tmp_path):
    """devnull delivers nothing but the connected function chain still
    executes — pinned via a durable ctx.store side effect."""
    import json

    from jitsu_spark.plans.chain import ConnectionConfig, compile_chain
    from jitsu_spark.plans.store import FileTtlStore
    from jitsu_spark.sinks_api import devnull_sink

    store_root = str(tmp_path / "store")

    def remember(e, ctx):
        ctx.store.set(f"seen:{e['message_id']}", True)
        return e

    df = spark.createDataFrame(
        [(json.dumps({"message_id": "m1"}),)], "event string"
    )
    cfg = ConnectionConfig(
        connection_id="c", functions=[remember], store_dir=store_root
    )
    n = devnull_sink(compile_chain(cfg)(df))
    assert n == 1
    assert FileTtlStore(store_root, "c").get("seen:m1") is True


class TestCronProperties:
    """Property checks: next_run always lands on a matching instant,
    strictly after the anchor, and no earlier match exists in between."""

    def test_next_run_is_first_match(self):
        import random

        rng = random.Random(7)
        exprs = [
            "* * * * *", "*/7 * * * *", "30 9 * * *", "0 */6 * * *",
            "15 14 1 * *", "0 0 * * 0", "*/10 2-4 * * 1-5",
        ]
        for expr in exprs:
            c = CronSchedule(expr)
            for _ in range(5):
                anchor = dt.datetime(
                    2024, rng.randint(1, 12), rng.randint(1, 28),
                    rng.randint(0, 23), rng.randint(0, 59), tzinfo=UTC,
                )
                nxt = c.next_run(anchor)
                assert nxt > anchor
                assert c.matches(nxt), (expr, anchor, nxt)
                # no earlier match strictly between anchor and nxt
                probe = (anchor + dt.timedelta(minutes=1)).replace(
                    second=0, microsecond=0
                )
                while probe < nxt:
                    assert not c.matches(probe), (expr, anchor, probe, nxt)
                    probe += dt.timedelta(minutes=1)

    def test_dst_spring_forward_skips_missing_time(self):
        # 2024-03-10 02:30 does not exist in America/New_York (2am jumps
        # to 3am): the documented contract skips the vanished occurrence
        # — next fire is Mar 11 02:30 EDT (06:30 UTC), and never twice
        c = CronSchedule("30 2 * * *", "America/New_York")
        nxt = c.next_run(_utc("2024-03-09T12:00:00"))
        assert nxt == _utc("2024-03-11T06:30:00")
        assert c.next_run(nxt) == _utc("2024-03-12T06:30:00")

    def test_dst_fall_back_fires_once(self):
        # 2024-11-03 01:30 occurs twice in America/New_York; the schedule
        # fires on the FIRST occurrence (05:30 UTC, EDT) and next lands a
        # day later — no double fire
        c = CronSchedule("30 1 * * *", "America/New_York")
        nxt = c.next_run(_utc("2024-11-03T00:00:00"))
        assert nxt == _utc("2024-11-03T05:30:00")
        assert c.next_run(nxt) == _utc("2024-11-04T06:30:00")

    def test_dst_fall_back_multi_slot_no_replay(self):
        # round-3 review: with several slots per hour, the repeated hour
        # must not replay EARLIER slots either — chaining fires each
        # local slot exactly once across the transition
        c = CronSchedule("0,30 * * * *", "America/New_York")
        fires = []
        t = _utc("2024-11-03T04:45:00")  # 00:45 EDT
        for _ in range(5):
            t = c.next_run(t)
            fires.append(t)
        local = [f.astimezone(c._tz).strftime("%H:%M") for f in fires]
        assert local == ["01:00", "01:30", "02:00", "02:30", "03:00"]
        assert len(set(fires)) == len(fires)

    def test_explicit_full_range_is_restricted(self):
        # Vixie rule: '1-31' written out participates in the either-or
        # rule (unlike '*'): "0 0 1-31 * 1" fires EVERY day, not Mondays
        c = CronSchedule("0 0 1-31 * 1")
        assert c.matches(_utc("2024-08-14T00:00:00"))  # a Wednesday
        # but "0 0 * * 1" stays Monday-only
        assert not CronSchedule("0 0 * * 1").matches(
            _utc("2024-08-14T00:00:00")
        )
