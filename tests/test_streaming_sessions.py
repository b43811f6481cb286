"""Live sessionization (`jitsu_spark/streaming/sessions.py`): session
closes emitted on gap proof, cross-batch state carry, parity with the
batch sessionize operator."""

from __future__ import annotations

import datetime as dt
import json

import pandas as pd
import pytest

# r13: long end-to-end file — excluded from the default pytest profile
# (pytest.ini addopts -m "not slow"); run with -m slow / -m "slow or not slow".
pytestmark = pytest.mark.slow


def _ev(i, ts, user, etype="click"):
    return {
        "event_id": i,
        "ts": ts,
        "user_id": user,
        "event_type": etype,
        "value": 0.0,
        "props": "{}",
    }


def _write(src_dir, rows, fname, order):
    import os

    os.makedirs(src_dir, exist_ok=True)
    path = os.path.join(src_dir, fname)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    base = 1_700_000_000
    os.utime(path, (base + order, base + order))


class _FakeState:
    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._value = None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v
        self.exists = True

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self.exists = False


class TestFoldDirect:
    """_fold contracts without Spark in the loop."""

    def _pdf(self, specs):
        return pd.DataFrame(
            {
                "ts": pd.to_datetime([s[0] for s in specs]),
                "event_id": range(len(specs)),
                "event_type": [s[1] for s in specs],
            }
        )

    def test_gap_closes_session_and_carries_state(self):
        from jitsu_spark.streaming.sessions import _fold

        state = _FakeState()
        out = list(
            _fold(
                (1,),
                iter(
                    [
                        self._pdf(
                            [
                                ("2024-01-01 10:00:00", "view"),
                                ("2024-01-01 10:10:00", "click"),
                                # > 30 min gap: closes the first session
                                ("2024-01-01 11:00:00", "buy"),
                            ]
                        )
                    ]
                ),
                state,
            )
        )
        assert len(out) == 1
        row = out[0].iloc[0]
        assert row.n_events == 2
        assert row.duration_sec == 600
        assert row.entry_event_type == "view"
        # the open session carries
        start_us, last_us, n, entry = state.get
        assert n == 1 and entry == "buy"

    def test_exact_gap_boundary_stays_in_session(self):
        from jitsu_spark.streaming.sessions import _fold

        state = _FakeState()
        out = list(
            _fold(
                (1,),
                iter(
                    [
                        self._pdf(
                            [
                                ("2024-01-01 10:00:00", "view"),
                                # exactly 30 min later: strict > test keeps it
                                ("2024-01-01 10:30:00", "click"),
                            ]
                        )
                    ]
                ),
                state,
            )
        )
        assert out == []
        assert state.get[2] == 2  # both events in the open session

    def test_timeout_flushes_open_session(self):
        from jitsu_spark.streaming.sessions import _fold

        state = _FakeState()
        list(
            _fold(
                (1,),
                iter([self._pdf([("2024-01-01 10:00:00", "view")])]),
                state,
            )
        )
        state.hasTimedOut = True
        out = list(_fold((1,), iter([]), state))
        assert len(out) == 1
        assert out[0].iloc[0].n_events == 1
        assert not state.exists


class TestSparkStream:
    def _run(self, spark, tmp_path, batches):
        from jitsu_spark.streaming.sessions import session_close_stream

        src = str(tmp_path / "in")
        for n, rows in enumerate(batches):
            _write(src, rows, f"b{n}.jsonl", n)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long,"
                " event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        import uuid

        name = f"sess_out_{uuid.uuid4().hex[:8]}"
        q = (
            session_close_stream(stream)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.sql(f"SELECT * FROM {name}").toPandas()

    def test_closed_sessions_match_batch_operator(self, spark, tmp_path):
        """Sessions fully closed by later events match the batch
        lag-window sessionization (count and per-session shape) however
        the in-order feed splits into micro-batches."""
        rows = []
        i = 0
        # user 7: three sessions (gaps of 40 and 90 min), the last left open
        for hour, minutes in ((10, (0, 5, 10)), (11, (0, 2)), (13, (0,))):
            for m in minutes:
                rows.append(_ev(i, f"2024-01-01T{hour:02d}:{m:02d}:00", 7))
                i += 1
        batches = [rows[:2], rows[2:4], rows[4:]]
        out = self._run(spark, tmp_path, batches)
        u7 = out[out.user_id == 7].sort_values("session_start")
        # two CLOSED sessions (the third stays open past stream end)
        assert list(u7.n_events) == [3, 2]
        assert list(u7.duration_sec) == [600, 120]

        # batch parity on the closed prefix: first two sessions' event
        # counts from the batch operator match
        import pyspark.sql.functions as F

        from jitsu_spark.operators.events_ops import sessionize_df

        ev = spark.createDataFrame(
            [
                (
                    r["event_id"],
                    dt.datetime.fromisoformat(r["ts"]),
                    r["user_id"],
                    r["event_type"],
                )
                for r in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        batch = sessionize_df(ev).where(F.col("user_id") == 7).first()
        assert batch.n_sessions == 3  # two closed + the open trailer
        assert batch.n_events == 6
