"""Physical-plan audits (the .explain contract) + skew utilities.

These are regression tests for the scale properties the engine promises:
filters reach the parquet scan, dimension joins broadcast, the geo range
join is a hash join (not a nested loop), and salted rewrites preserve
results.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


class TestPlanShape:
    def test_q6_filters_pushed_to_scan(self, spark, sf_dir):
        from jitsu_spark.operators.relational import q6_forecast_revenue

        plan = _plan(q6_forecast_revenue(spark, sf_dir))
        assert "PushedFilters:" in plan
        # the shipdate range must reach the reader, not sit in a Filter only
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
        assert "l_shipdate" in pushed and "l_quantity" in pushed

    def test_q5_broadcasts_dimensions(self, spark, sf_dir):
        from jitsu_spark.operators.relational import q5_region_revenue

        plan = _plan(q5_region_revenue(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 4  # supplier/customer/nation/region
        assert "BroadcastNestedLoopJoin" not in plan

    def test_geo_range_join_is_hash_not_nested_loop(self, spark, sf_dir):
        from jitsu_spark.operators.geo import geo_enrich_range_join

        plan = _plan(geo_enrich_range_join(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q1_reads_only_needed_columns(self, spark, sf_dir):
        from jitsu_spark.operators.relational import q1_pricing_summary

        plan = _plan(q1_pricing_summary(spark, sf_dir))
        schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "l_partkey" not in schema_line  # unused columns pruned
        assert "l_quantity" in schema_line

    def test_layout_projection_is_narrow(self, spark, sf_dir):
        """The typed layout is a pure projection: no shuffle at all."""
        from jitsu_spark.events.layouts import layout_single_table_typed

        plan = _plan(layout_single_table_typed(spark, sf_dir))
        assert "Exchange" not in plan


class TestSkew:
    def test_salted_count_equals_plain_count(self, spark):
        df = spark.createDataFrame(
            [("hot",)] * 500 + [("a",), ("b",)], "k string"
        )
        from jitsu_spark.functions.skew import salted_count

        got = {r.k: r.events for r in salted_count(df, ["k"]).collect()}
        assert got == {"hot": 500, "a": 1, "b": 1}

    def test_salted_agg_sum(self, spark):
        from jitsu_spark.functions.skew import salted_agg

        df = spark.range(1000).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("v")
        )
        out = salted_agg(
            df,
            ["k"],
            partial_aggs=[F.sum("v").alias("_s"), F.max("v").alias("_m")],
            final_aggs=lambda: [
                F.sum("_s").alias("total"),
                F.max("_m").alias("vmax"),
            ],
        )
        expect = {
            r.k: (r.total, r.vmax)
            for r in df.groupBy("k")
            .agg(F.sum("v").alias("total"), F.max("v").alias("vmax"))
            .collect()
        }
        got = {r.k: (r.total, r.vmax) for r in out.collect()}
        assert got == expect

    def test_salted_join_equals_plain_join(self, spark):
        from jitsu_spark.functions.skew import salted_join

        big = spark.createDataFrame(
            [("hot", i) for i in range(300)] + [("cold", 0)], "k string, v int"
        )
        small = spark.createDataFrame(
            [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, tag string"
        )
        got = sorted(
            (r.k, r.v, r.tag) for r in salted_join(big, small, "k").collect()
        )
        expect = sorted(
            (r.k, r.v, r.tag) for r in big.join(small, "k").collect()
        )
        assert got == expect
