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


class TestSizeGatedBroadcast:
    """plans/hints.maybe_broadcast: hint under the threshold, plain join +
    AQE above it (the fallback the 100x plan needs)."""

    def test_broadcasts_under_threshold(self, spark, sf_dir):
        from jitsu_spark.operators.relational import q5_region_revenue

        plan = _plan(q5_region_revenue(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= 4

    def test_fallback_engages_when_threshold_zero(self, spark, sf_dir, monkeypatch):
        monkeypatch.setenv("SPARK_GRAFT_BROADCAST_MAX", "0")
        from jitsu_spark.operators.identity import identity_stitch

        plan = _plan(identity_stitch(spark, sf_dir))
        # with the hint gated off, no *hinted* broadcast remains in the
        # pre-AQE plan; the join degrades to a shuffle join Spark may still
        # re-plan adaptively from measured sizes
        assert "ResolvedHint" not in plan

    def test_plan_size_estimate_available(self, spark, sf_dir):
        from jitsu_spark.plans.hints import plan_size_bytes
        from jitsu_spark.tables import load_table

        n = plan_size_bytes(load_table(spark, sf_dir, "nation"))
        li = plan_size_bytes(load_table(spark, sf_dir, "lineitem"))
        assert n is not None and li is not None and n < li

    def test_maybe_broadcast_object_identity(self, spark, monkeypatch):
        from jitsu_spark.plans.hints import maybe_broadcast

        df = spark.range(10)
        monkeypatch.setenv("SPARK_GRAFT_BROADCAST_MAX", "0")
        assert maybe_broadcast(df) is df  # gated off -> unchanged
        monkeypatch.delenv("SPARK_GRAFT_BROADCAST_MAX")
        assert maybe_broadcast(df) is not df  # hinted


class TestNoDriverMaterialization:
    def test_embedding_cosine_dups_never_collects(self):
        """The near-dup candidate stage must stay distributed: no
        .collect() of the embeddings table, no driver-built broadcast
        (the round-1 scale-killer, VERDICT 'What's wrong' #4)."""
        import inspect

        from jitsu_spark.operators import similarity

        src = inspect.getsource(similarity.embedding_cosine_dups)
        assert ".collect()" not in src
        assert "sparkContext.broadcast" not in src


class TestJaccardDfCap:
    def test_hot_shingle_fanout_bounded(self, spark):
        """A shingle in many docs is dropped from the join side once its
        document frequency exceeds the cap; rare-shingle pairs survive."""
        from jitsu_spark.operators.dedup import jaccard_pairs_from_shingles

        rows = []
        # 40 docs all share one hot shingle (plus a unique one each)
        for d in range(40):
            rows += [(d, "the_hot_shingle"), (d, f"uniq_{d}")]
        # two docs that are true near-dups via rare shingles
        rows += [(100, "rare_a"), (100, "rare_b"), (100, "rare_c"),
                 (101, "rare_a"), (101, "rare_b"), (101, "rare_c")]
        sh = spark.createDataFrame(rows, "doc_id long, shingle string")

        capped = jaccard_pairs_from_shingles(sh, max_doc_frequency=10)
        got = [(r.doc_a, r.doc_b, r.jaccard) for r in capped.collect()]
        # hot-shingle-only overlaps (jaccard 1/3 anyway) produce no rows;
        # with the hot shingle anti-joined the 40x40/2 fan-out never forms
        assert got == [(100, 101, 1.0)]

    def test_cap_noop_matches_uncapped(self, spark):
        from jitsu_spark.operators.dedup import jaccard_pairs_from_shingles

        rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "z")]
        sh = spark.createDataFrame(rows, "doc_id long, shingle string")
        uncapped = sorted(
            map(tuple, jaccard_pairs_from_shingles(sh).collect())
        )
        capped = sorted(
            map(
                tuple,
                jaccard_pairs_from_shingles(sh, max_doc_frequency=10**9).collect(),
            )
        )
        assert uncapped == capped == [(1, 2, 1.0)]


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


class TestExtendedRelationalPlans:
    """Plan audits for the relational_ext shapes: semi/anti joins stay
    narrow, scalar subqueries broadcast, pair-derivation partial-aggregates."""

    def test_q21_single_fact_pass_no_self_join(self, spark, sf_dir):
        """r12: the EXISTS/NOT-EXISTS self-joins folded into per-order
        window counts over ONE lineitem scan — the fact table must appear
        exactly once and the per-order facts come from Window, not
        semi/anti self-join shuffles."""
        from jitsu_spark.operators.relational_ext import q21_waiting_suppliers

        plan = _plan(q21_waiting_suppliers(spark, sf_dir))
        scans = [
            l
            for l in plan.splitlines()
            if "Location:" in l and "lineitem" in l
        ]
        assert len(scans) == 1, plan
        assert "Window" in plan
        assert "LeftSemi" not in plan and "LeftAnti" not in plan

    def test_q22_scalar_avg_is_broadcast(self, spark, sf_dir):
        from jitsu_spark.operators.relational_ext import q22_idle_customers

        plan = _plan(q22_idle_customers(spark, sf_dir))
        # the 1-row avg crossJoin plans as a broadcast nested loop of one
        # row, and the NOT EXISTS as a left-anti
        assert "BroadcastNestedLoopJoin" in plan
        assert "LeftAnti" in plan

    def test_q16_reads_only_needed_lineitem_columns(self, spark, sf_dir):
        from jitsu_spark.operators.relational_ext import (
            q16_supplier_count_by_part,
        )

        plan = _plan(q16_supplier_count_by_part(spark, sf_dir))
        li_schemas = [
            l
            for l in plan.splitlines()
            if "ReadSchema" in l and "l_partkey" in l
        ]
        assert li_schemas, "lineitem scan missing"
        # the pair derivation must not drag the lineitem payload along
        assert all("l_extendedprice" not in l for l in li_schemas)

    def test_q13_left_join_preserves_orderless_customers(self, spark, sf_dir):
        from jitsu_spark.operators.relational_ext import (
            q13_order_count_distribution,
        )

        rows = {
            r.c_count: r.custdist
            for r in q13_order_count_distribution(spark, sf_dir).collect()
        }
        assert sum(rows.values()) > 0
        # distribution totals the whole customer table (outer join kept all)
        from jitsu_spark.tables import load_table

        assert sum(rows.values()) == load_table(spark, sf_dir, "customer").count()


class TestQualityFilterPlans:
    def test_single_scan_ops_have_no_exchange(self, spark, sf_dir):
        """Gopher flags / PII redact / chunking are map-only: zero shuffles."""
        from jitsu_spark.operators.quality_filters import (
            chunk_documents,
            gopher_quality_flags,
            pii_redact,
        )

        for op in (gopher_quality_flags, pii_redact, chunk_documents):
            plan = _plan(op(spark, sf_dir))
            assert "Exchange" not in plan, op.__name__

    def test_quality_scans_prune_to_id_and_text(self, spark, sf_dir):
        from jitsu_spark.operators.quality_filters import gopher_quality_flags

        plan = _plan(gopher_quality_flags(spark, sf_dir))
        schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "text" in schema_line
        for unused in ("lang", "source", "n_chars"):
            assert unused not in schema_line

    def test_percentile_gate_windows_only_over_histogram(self, spark, sf_dir):
        """The served gate must never sort the corpus in a per-source window
        task: its Window nodes sit ABOVE the value-histogram HashAggregate
        (deeper = executes first), inside the broadcast build side — the
        corpus probe side is scan + project only."""
        from jitsu_spark.operators.quality_filters import quality_percentile_gate

        plan = _plan(quality_percentile_gate(spark, sf_dir))
        tree = plan.split("\n\n")[0]
        assert "BroadcastHashJoin" in tree
        assert "SortMergeJoin" not in plan
        # the probe branch (printed before the BroadcastExchange) is window-free
        probe_side = tree.split("BroadcastExchange")[0]
        assert "Window" not in probe_side
        # the build side's windows run over the aggregate, not a raw scan
        build_side = tree.split("BroadcastExchange")[1]
        assert build_side.index("Window") < build_side.index("HashAggregate")

    def test_contamination_broadcasts_heldout_side(self, spark, sf_dir):
        from jitsu_spark.operators.quality_filters import contamination_check

        plan = _plan(contamination_check(spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # one aggregate after the join: no join-back of per-doc totals
        # (formatted plans list each node twice: tree + detail section)
        import re

        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2


class TestReportPlans:
    def test_funnel_single_user_shuffle(self, spark, sf_dir):
        """Three chained windows + final agg must reuse ONE user_id
        exchange — no per-step shuffles, no self-joins."""
        from jitsu_spark.operators.reports import funnel_3step_windowed

        plan = _plan(funnel_3step_windowed(spark, sf_dir))
        import re

        # one hash exchange on user_id + the final single-partition agg
        exchanges = re.findall(r"\(\d+\) Exchange", plan)
        assert len(exchanges) <= 2, plan[:2000]
        assert "Join" not in plan

    def test_transitions_single_shuffle_before_tiny_agg(self, spark, sf_dir):
        from jitsu_spark.operators.reports import event_transitions

        plan = _plan(event_transitions(spark, sf_dir))
        assert "Join" not in plan
        schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        for unused in ("value", "props"):
            assert unused not in schema_line

    def test_anomaly_aggregates_before_window(self, spark, sf_dir):
        """The trailing window must run over the minute aggregate, not raw
        events: the plan has the HashAggregate below the Window."""
        from jitsu_spark.operators.reports import metrics_anomaly

        plan = _plan(metrics_anomaly(spark, sf_dir))
        tree = plan.split("(1)")[0]
        win_pos = tree.index("Window")
        agg_pos = tree.rindex("HashAggregate")
        assert agg_pos > win_pos  # deeper in the tree = executes first


class TestClusteringPlans:
    """Scale audits for the round-4 cluster-curation family: the corpus
    never shuffles for centroid assignment (broadcast K-row side) or for
    rate application (broadcast 20-row rates)."""

    def test_cluster_assignment_broadcasts_centroids(self, spark, sf_dir):
        from jitsu_spark.operators.clustering import embedding_cluster_assign

        plan = _plan(embedding_cluster_assign(spark, sf_dir))
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
        # MAP-SIDE argmax: no window, no hash exchange of the corpus —
        # the fold over the packed centroid array replaces the N*K
        # window shuffle. (Formatted plans print the Exchange node and
        # its hashpartitioning arguments on separate lines, so assert
        # on the argument string, not the simple-mode concatenation.)
        assert "Window" not in plan
        assert "hashpartitioning" not in plan

    def test_temperature_rates_broadcast_onto_scan(self, spark, sf_dir):
        from jitsu_spark.operators.sampling import temperature_resample

        plan = _plan(temperature_resample(spark, sf_dir))
        # the corpus-side join against the derived rates must broadcast;
        # a SortMergeJoin here would shuffle 100 TB against 20 rows
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_prune_rank_sort_is_band_bounded(self, spark, sf_dir):
        """The two-phase rank must never sort a whole cluster in one task:
        every row_number window is partitioned by (cluster_id, pband) —
        one similarity band per sort task — and the verdict joins back via
        broadcast, not a corpus shuffle."""
        import re

        from jitsu_spark.operators.clustering import cluster_prototype_prune

        plan = _plan(cluster_prototype_prune(spark, sf_dir))
        rn_specs = re.findall(
            r"row_number\(\) windowspecdefinition\([^)]*\)", plan
        )
        assert rn_specs
        assert all("pband" in s for s in rn_specs), rn_specs
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_quota_rank_sort_is_bucket_bounded(self, spark, sf_dir):
        """Same audit for the balanced-sample quota pick: row_number is
        keyed by (cluster_id, bucket), with non-contributing buckets
        pruned before the window."""
        import re

        from jitsu_spark.operators.clustering import cluster_balanced_sample

        plan = _plan(cluster_balanced_sample(spark, sf_dir))
        rn_specs = re.findall(
            r"row_number\(\) windowspecdefinition\([^)]*\)", plan
        )
        assert rn_specs
        assert all("bucket" in s for s in rn_specs), rn_specs
        assert "SortMergeJoin" not in plan
