"""U4 profile-UDF isolation (`jitsu_spark/plans/isolate.py`
IsolatedProfileRunner): untrusted ProfileFunctions run in a forked child
at the reference's 512 MB / 5 s budget
(`services/profiles/src/lib/profiles-udf-wrapper.ts:51,231`). A
memory-bomb or spinning ProfileFunction must be contained — one
null-profile row with `_error` set for the bombed user, normal profiles
for everyone else, and the batch completes."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jitsu_spark.operators.profiles import (
    PROFILE_SCHEMA,
    build_profiles,
    default_profile_fn,
    profile_error_log_rows,
)
from jitsu_spark.plans.isolate import (
    IsolatedProfileRunner,
    supports_isolation,
)

pytestmark = pytest.mark.skipif(
    not supports_isolation(), reason="fork/RLIMIT isolation is Linux-only"
)


def _bomb_if_user_7(pdf: pd.DataFrame) -> pd.DataFrame:
    # C-extension allocation (numpy mallocs past tracemalloc) for one
    # specific user; everyone else gets the normal profile.
    if int(pdf["user_id"].iloc[0]) == 7:
        import numpy as np

        hoard = []
        for _ in range(400):
            hoard.append(np.ones((4 << 20,), dtype=np.float64))  # 32 MB
    return default_profile_fn(pdf)


def _py_spin(pdf: pd.DataFrame) -> pd.DataFrame:
    while True:
        pass


class TestRunnerDirect:
    def _pdf(self, user_id=1, n=3):
        return pd.DataFrame(
            {
                "user_id": [user_id] * n,
                "ts": pd.to_datetime(["2024-01-01"] * n),
                "event_id": range(n),
                "event_type": ["page"] * n,
            }
        )

    def test_normal_call_round_trips(self):
        runner = IsolatedProfileRunner(default_profile_fn)
        try:
            out, err = runner.run(self._pdf())
            assert err is None
            assert int(out["n_events"].iloc[0]) == 3
        finally:
            runner.close()

    def test_alloc_bomb_contained_and_child_replaced(self):
        runner = IsolatedProfileRunner(_bomb_if_user_7, memory_mb=64)
        try:
            out, err = runner.run(self._pdf(user_id=7))
            assert out is None
            assert err is not None and "Memory" in err
            # fresh child serves the next user
            out2, err2 = runner.run(self._pdf(user_id=8))
            assert err2 is None and int(out2["n_events"].iloc[0]) == 3
        finally:
            runner.close()

    def test_python_spin_killed(self):
        runner = IsolatedProfileRunner(_py_spin, timeout_sec=0.5)
        try:
            out, err = runner.run(self._pdf())
            assert out is None
            assert err is not None and "Timeout" in err
        finally:
            runner.close()


class TestSparkBatch:
    def test_bomb_contained_batch_completes(self, spark):
        rows = []
        for uid in range(1, 11):
            for i in range(4):
                rows.append((uid, f"2024-01-0{1 + i % 3}", i, "page"))
        events = spark.createDataFrame(
            rows, "user_id long, ts string, event_id long, event_type string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        profiles = build_profiles(
            events,
            profile_fn=_bomb_if_user_7,
            untrusted=True,
            memory_mb=64,
        ).cache()
        got = {r["user_id"]: r for r in profiles.collect()}
        # every user produced exactly one row
        assert sorted(got) == list(range(1, 11))
        # the bombed user is the error row, everyone else is a profile
        assert got[7]["_error"] is not None and "Memory" in got[7]["_error"]
        assert got[7]["n_events"] is None
        for uid in range(1, 11):
            if uid == 7:
                continue
            assert got[uid]["_error"] is None
            assert got[uid]["n_events"] == 4
        # the events-log side channel carries exactly the failure
        logs = profile_error_log_rows(profiles).collect()
        assert len(logs) == 1
        assert logs[0]["actor_id"] == "7"
        assert logs[0]["level"] == "error"
        assert logs[0]["type"] == "profile"
        profiles.unpersist()

    def test_bad_dtype_contained_per_user(self, spark):
        """A ProfileFunction returning a string in a long column (right
        shape, wrong cell type) becomes THAT user's `_error` row — not
        an Arrow conversion crash that fails the whole batch (round-9
        ADVICE #3)."""

        def bad_dtype_for_user_3(pdf: pd.DataFrame) -> pd.DataFrame:
            out = default_profile_fn(pdf)
            if int(pdf["user_id"].iloc[0]) == 3:
                out = out.copy()
                out["n_events"] = ["not-a-number"]
            return out

        events = spark.createDataFrame(
            [(uid, "2024-01-01", i, "page") for uid in (1, 2, 3) for i in range(2)],
            "user_id long, ts string, event_id long, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r["user_id"]: r
            for r in build_profiles(
                events, profile_fn=bad_dtype_for_user_3, untrusted=True
            ).collect()
        }
        assert sorted(got) == [1, 2, 3]
        assert got[3]["_error"] is not None and "coercion" in got[3]["_error"]
        assert got[3]["n_events"] is None
        for uid in (1, 2):
            assert got[uid]["_error"] is None
            assert got[uid]["n_events"] == 2

    def test_benign_coercion_passes(self, spark):
        """Numpy float counts that are integral coerce cleanly into long
        columns instead of erroring (coercion, not rejection)."""

        def floaty(pdf: pd.DataFrame) -> pd.DataFrame:
            out = default_profile_fn(pdf)
            out = out.copy()
            out["n_events"] = out["n_events"].astype("float64")
            return out

        events = spark.createDataFrame(
            [(1, "2024-01-01", 0, "page"), (1, "2024-01-01", 1, "page")],
            "user_id long, ts string, event_id long, event_type string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        row = build_profiles(
            events, profile_fn=floaty, untrusted=True
        ).collect()[0]
        assert row["_error"] is None
        assert row["n_events"] == 2

    def test_schema_gains_error_column_only(self, spark):
        events = spark.createDataFrame(
            [(1, "2024-01-01", 0, "page")],
            "user_id long, ts string, event_id long, event_type string",
        )
        out = build_profiles(
            events, profile_fn=lambda pdf: default_profile_fn(pdf), untrusted=True
        )
        assert out.columns == [f.name for f in PROFILE_SCHEMA.fields] + [
            "_error"
        ]
