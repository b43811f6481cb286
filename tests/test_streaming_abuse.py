"""Stateful streaming burst detection: cross-batch state carry and
exact parity with the batch RANGE-window operator."""

from __future__ import annotations

import json

import pytest

# r13: long end-to-end file — excluded from the default pytest profile
# (pytest.ini addopts -m "not slow"); run with -m slow / -m "slow or not slow".
pytestmark = pytest.mark.slow


def _write_events(src_dir, rows, fname, order):
    """The file source triggers in modification-time order; files written
    within the same second would otherwise race — pin distinct mtimes."""
    import os

    os.makedirs(src_dir, exist_ok=True)
    path = os.path.join(src_dir, fname)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    base = 1_700_000_000
    os.utime(path, (base + order, base + order))


def _ev(i, ts, user):
    return {
        "event_id": i,
        "ts": ts,
        "user_id": user,
        "event_type": "click",
        "value": 0.0,
        "props": "{}",
    }


class TestStreamingBurst:
    def _run(self, spark, tmp_path, batches):
        from jitsu_spark.streaming.abuse import burst_detection_stream

        src = str(tmp_path / "in")
        for n, rows in enumerate(batches):
            _write_events(src, rows, f"b{n}.jsonl", n)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long,"
                " event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        import uuid

        name = f"burst_out_{uuid.uuid4().hex[:8]}"
        out = burst_detection_stream(stream)
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        return spark.sql(f"SELECT * FROM {name}").toPandas()

    def test_burst_spanning_batches_is_detected(self, spark, tmp_path):
        """15 events in batch 1 + 10 more within the same 5-minute
        window in batch 2: neither batch alone crosses the 20-event
        flag, the carried state does."""
        b1 = [_ev(i, f"2024-01-01T11:00:{i:02d}", 1) for i in range(15)]
        b2 = [
            _ev(100 + i, f"2024-01-01T11:01:{i:02d}", 1) for i in range(10)
        ]
        out = self._run(spark, tmp_path, [b1, b2])
        u1 = out[out.user_id == 1].sort_values("max_burst")
        assert list(u1.max_burst) == [15, 25]
        assert list(u1.flagged) == [False, True]

    def test_running_max_matches_batch_operator(self, spark, tmp_path):
        """Parity: however the in-order feed is split into micro-batches,
        the final running max_burst equals the batch RANGE-window
        operator's max_burst over the union."""
        import datetime as dt

        rows = []
        i = 0
        for minute in (0, 1, 2, 9, 10, 30):
            for s in range(0, 40, 7):
                rows.append(
                    _ev(i, f"2024-01-01T11:{minute:02d}:{s:02d}", 7)
                )
                i += 1
        # split 3 ways, in time order
        batches = [rows[:6], rows[6:13], rows[13:]]
        out = self._run(spark, tmp_path, batches)
        stream_max = int(out[out.user_id == 7].max_burst.max())

        from jitsu_spark.operators.events_ops import user_burst_detection

        spark.createDataFrame(
            [
                (
                    r["event_id"],
                    dt.datetime.fromisoformat(r["ts"]),
                    r["user_id"],
                    r["event_type"],
                    r["value"],
                    r["props"],
                )
                for r in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        batch_max = int(
            user_burst_detection(spark, str(tmp_path))
            .toPandas()
            .set_index("user_id")
            .loc[7, "max_burst"]
        )
        assert stream_max == batch_max


class _FakeState:
    """Minimal GroupState stand-in for driving _detect directly."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._value = None
        self.removed = False

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v
        self.exists = True

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self.removed = True
        self.exists = False


class TestBoundedState:
    def test_100k_in_window_events_keep_state_bounded(self):
        """An abuser firing 100k events inside one 5-minute window must
        not grow state past the per-second bucket bound
        (BURST_WINDOW_SEC + 1 entries) — raw-timestamp state would hold
        all 100k."""
        import numpy as np
        import pandas as pd

        from jitsu_spark.operators.events_ops import BURST_WINDOW_SEC
        from jitsu_spark.streaming.abuse import _detect

        state = _FakeState()
        rng = np.random.default_rng(7)
        total = 0
        for _ in range(4):  # 4 micro-batches of 25k events, same window
            secs = rng.integers(0, BURST_WINDOW_SEC, size=25_000)
            pdf = pd.DataFrame(
                {"ts": pd.to_datetime(1_700_000_000 + secs, unit="s")}
            )
            out = list(_detect((9,), iter([pdf]), state))
            total += 25_000
            secs_kept, counts_kept, best = state.get
            assert len(secs_kept) <= BURST_WINDOW_SEC + 1
            assert len(counts_kept) == len(secs_kept)
            assert out[0]["flagged"].iloc[0]
        # every event is inside one window -> running max is exact
        assert best == total

    def test_bucketed_sweep_matches_raw_two_pointer(self):
        """Property-ish check: for whole-second event times, the
        per-second prefix-sum sweep equals the raw two-pointer sweep the
        operator previously ran (and the batch RANGE frame)."""
        import numpy as np
        import pandas as pd

        from jitsu_spark.operators.events_ops import BURST_WINDOW_SEC
        from jitsu_spark.streaming.abuse import _detect

        rng = np.random.default_rng(3)
        for trial in range(5):
            secs = np.sort(
                rng.integers(0, 4 * BURST_WINDOW_SEC, size=200)
            )
            # raw two-pointer over event list
            best, lo = 0, 0
            for i, t in enumerate(secs):
                while secs[lo] < t - BURST_WINDOW_SEC:
                    lo += 1
                best = max(best, i - lo + 1)
            state = _FakeState()
            pdf = pd.DataFrame(
                {"ts": pd.to_datetime(1_700_000_000 + secs, unit="s")}
            )
            out = list(_detect((1,), iter([pdf]), state))
            assert int(out[0]["max_burst"].iloc[0]) == best
