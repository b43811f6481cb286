"""Bucketed co-located layouts (`jitsu_spark/plans/bucketing.py`):
results identical to the scan-based path, and the user_id exchange gone
from every per-user operator fed from the bucketed table."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def bucketed_events(spark):
    from jitsu_spark.plans.bucketing import bucketed_events_table

    tbl = bucketed_events_table(spark, SF_DIR, table_name="t_events_bucketed")
    yield tbl
    spark.sql("DROP TABLE IF EXISTS t_events_bucketed")


class TestBucketedSessionize:
    def test_results_match_scan_path(self, spark, bucketed_events):
        from jitsu_spark.operators.events_ops import sessionize, sessionize_df

        got = sorted(map(tuple, sessionize_df(bucketed_events).collect()))
        want = sorted(map(tuple, sessionize(spark, SF_DIR).collect()))
        assert got == want and len(got) > 0

    def test_no_user_id_exchange(self, spark, bucketed_events):
        """The whole point: the write-time bucketing satisfies the
        window's ClusteredDistribution(user_id), so the plan has no
        hash exchange at all — the scan path has exactly one."""
        from jitsu_spark.operators.events_ops import sessionize, sessionize_df

        bucketed_plan = _plan(sessionize_df(bucketed_events))
        # formatted plans print the Exchange node and its
        # hashpartitioning arguments on separate lines — assert on both
        assert "Exchange" not in bucketed_plan
        assert "hashpartitioning(user_id" not in bucketed_plan
        scan_plan = _plan(sessionize(spark, SF_DIR))
        assert "hashpartitioning(user_id" in scan_plan

    def test_bucketed_profile_build_is_exchange_free(
        self, spark, bucketed_events
    ):
        """r6 review item 5: the profile UDAF fed the bucketed table
        with assume_clustered skips its user_id repartition — results
        identical to the scan path, zero Exchange anywhere in the plan."""
        from jitsu_spark.operators.profiles import build_profiles, profile_build

        fast = build_profiles(bucketed_events, assume_clustered=True)
        plan = _plan(fast)
        assert "Exchange" not in plan
        assert "hashpartitioning(user_id" not in plan
        got = sorted(map(tuple, fast.collect()))
        want = sorted(map(tuple, profile_build(spark, SF_DIR).collect()))
        assert got == want and len(got) > 0
        # the scan path keeps its explicit user_id shuffle
        assert "hashpartitioning(user_id" in _plan(profile_build(spark, SF_DIR))

    def test_bucketed_funnel_only_rolls_up(self, spark, bucketed_events):
        """r6 review item 5: all three funnel window stages + the
        per-user aggregate read the write-time clustering; the only
        exchange left is the final SinglePartition rollup of 4 counters."""
        from jitsu_spark.operators.reports import (
            funnel_3step_windowed,
            funnel_3step_windowed_df,
        )

        fast = funnel_3step_windowed_df(bucketed_events)
        plan = _plan(fast)
        assert "hashpartitioning(user_id" not in plan
        # exactly ONE exchange node survives, and it's the rollup
        assert plan.count("+- Exchange") == 1 and "SinglePartition" in plan
        got = fast.collect()
        want = funnel_3step_windowed(spark, SF_DIR).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert "hashpartitioning(user_id" in _plan(
            funnel_3step_windowed(spark, SF_DIR)
        )

    def test_cobucketed_self_join_is_shuffle_free(self, spark, bucketed_events):
        """Two frames from the same bucketed table join on user_id with
        no exchange on either side (co-located join)."""
        from pyspark.sql import functions as F

        a = bucketed_events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        b = bucketed_events.groupBy("user_id").agg(
            F.max("ts").alias("last_ts")
        )
        joined = a.join(b, "user_id")
        plan = _plan(joined)
        assert "hashpartitioning(user_id" not in plan
        assert joined.count() > 0

    def test_bucketed_incremental_profile_build_no_user_shuffle(
        self, spark, bucketed_events
    ):
        """r7 review item 7: the INCREMENTAL profile tick (`since`
        watermark + changed-user semi-join) fed the bucketed table also
        plans with no user_id shuffle — the changed-user distinct and
        the semi-join both read the write-time clustering (a broadcast
        of the small changed-user list is allowed; a corpus
        hashpartitioning exchange is not). Results match the scan path."""
        from jitsu_spark.operators.profiles import build_profiles
        from jitsu_spark.tables import load_table

        since = "2024-01-10 00:00:00"
        fast = build_profiles(
            bucketed_events, since=since, assume_clustered=True
        )
        plan = _plan(fast)
        assert "hashpartitioning(user_id" not in plan
        assert "Exchange hashpartitioning" not in plan
        got = sorted(map(tuple, fast.collect()))
        want = sorted(
            map(
                tuple,
                build_profiles(
                    load_table(spark, SF_DIR, "events"), since=since
                ).collect(),
            )
        )
        assert got == want and len(got) > 0
