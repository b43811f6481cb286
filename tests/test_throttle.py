"""Workspace throttle/shard gates (`jitsu_spark/plans/throttle.py`) —
`getNumericOption` parsing and the deterministic shed/shard predicates
(export/[name]/index.ts:355-358, 552-562)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jitsu_spark.plans.throttle import (
    parse_numeric_option,
    shard_filter,
    throttle_gate,
    workspace_throttle_gate,
)


class TestParseNumericOption:
    def test_finds_and_caps(self):
        assert parse_numeric_option("throttle", ["throttle=30"]) == 30
        assert parse_numeric_option("throttle", ["throttle=250"]) == 100
        assert parse_numeric_option("shard", ["throttle=30", "shard=2"]) == 2

    def test_default_when_absent(self):
        assert parse_numeric_option("throttle", []) is None
        assert parse_numeric_option("throttle", None, 7) == 7
        assert parse_numeric_option("throttle", ["throttle"]) is None


def _events(spark, n=1000, workspace="w1"):
    return spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("message_id"),
        F.lit(workspace).alias("workspace_id"),
    )


class TestThrottleGate:
    def test_sheds_about_the_fraction(self, spark):
        df = _events(spark, 2000)
        kept = throttle_gate(df, 30).count()
        assert abs(kept / 2000 - 0.70) < 0.05

    def test_deterministic_across_runs(self, spark):
        df = _events(spark, 500)
        a = {r.message_id for r in throttle_gate(df, 50).collect()}
        b = {
            r.message_id
            for r in throttle_gate(df.repartition(7), 50).collect()
        }
        assert a == b  # same verdict per event, any partitioning, any run

    def test_edge_percents(self, spark):
        df = _events(spark, 100)
        assert throttle_gate(df, None).count() == 100
        assert throttle_gate(df, 0).count() == 100
        assert throttle_gate(df, 100).count() == 0


class TestShardFilter:
    def test_partitions_completely_and_disjointly(self, spark):
        df = _events(spark, 300).withColumnRenamed("message_id", "stream_id")
        parts = [
            {r.stream_id for r in shard_filter(df, s, 3).collect()}
            for s in range(3)
        ]
        assert sum(len(p) for p in parts) == 300
        assert parts[0] | parts[1] | parts[2] == {
            r.stream_id for r in df.collect()
        }

    def test_single_shard_noop(self, spark):
        df = _events(spark, 10).withColumnRenamed("message_id", "stream_id")
        assert shard_filter(df, 0, 1).count() == 10


class TestWorkspaceGate:
    def test_per_workspace_fractions(self, spark):
        df = _events(spark, 1000, "w_throttled").unionByName(
            _events(spark, 1000, "w_free")
        )
        out = workspace_throttle_gate(df, {"w_throttled": 40})
        by_ws = {
            r.workspace_id: r["count"]
            for r in out.groupBy("workspace_id").count().collect()
        }
        assert by_ws["w_free"] == 1000  # untouched
        assert abs(by_ws["w_throttled"] / 1000 - 0.60) < 0.06

    def test_empty_map_noop_plan(self, spark):
        df = _events(spark, 10)
        assert workspace_throttle_gate(df, {}) is df

    def test_no_join_in_plan(self, spark):
        df = _events(spark, 100)
        out = workspace_throttle_gate(df, {"w1": 10, "w2": 90})
        plan = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Join" not in plan  # literal lookup, scan-level filter
