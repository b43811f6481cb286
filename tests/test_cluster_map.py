"""Materialized near-dup cluster map (round 4): `build_cluster_map` runs
the shingle -> LSH -> components pass ONCE; every consumer fed from the
stored map must be bit-identical to its standalone (recomputing) twin,
and the from-store plans must contain ZERO shingle work — the whole
point is that a composed pipeline does one shingle scan total."""

from __future__ import annotations


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _formatted_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


class TestLshClusterMap:
    def test_consumers_from_store_match_standalone(self, spark, sf_dir, tmp_path):
        from jitsu_spark.operators.corpus import corpus_dedup_suite
        from jitsu_spark.operators.dedup import dedup_keep_list, near_dup_clusters
        from jitsu_spark.operators.packing import leakage_safe_split

        store = str(tmp_path / "cluster_map")
        suite = corpus_dedup_suite(spark, sf_dir, store)

        assert _rows(suite["near_dup_clusters"]) == _rows(
            near_dup_clusters(spark, sf_dir)
        )
        assert _rows(suite["dedup_keep_list"]) == _rows(
            dedup_keep_list(spark, sf_dir)
        )
        assert _rows(suite["leakage_safe_split"]) == _rows(
            leakage_safe_split(spark, sf_dir)
        )

    def test_from_store_plans_have_no_shingle_scan(self, spark, sf_dir, tmp_path):
        """The stored-map consumers must read parquet + join — no
        tokenization, no minhash, no label-propagation lineage. A single
        shingle artifact in the plan means the map was recomputed."""
        from jitsu_spark.operators.dedup import (
            build_cluster_map,
            dedup_keep_list,
            load_cluster_map,
        )
        from jitsu_spark.operators.packing import leakage_safe_split

        store = str(tmp_path / "cm_plan")
        build_cluster_map(spark, sf_dir, store)
        clusters = load_cluster_map(spark, store)

        for df in (
            dedup_keep_list(spark, sf_dir, clusters=clusters),
            leakage_safe_split(spark, sf_dir, clusters=clusters),
        ):
            plan = _formatted_plan(spark, df)
            for marker in ("regexp_extract_all", "Generate", "explode"):
                assert marker not in plan, f"shingle work leaked: {marker}"
            assert "documents.parquet" in plan or "documents" in plan

    def test_standalone_registry_twin_unchanged(self, spark, sf_dir):
        """Default (clusters=None) recomputes, keeping the registry
        (spark, sf_dir) callable contract and the oracle shape — the new
        parameter must be invisible to the driver."""
        import inspect

        from jitsu_spark.operators.dedup import QUERIES, dedup_keep_list
        from jitsu_spark.operators.packing import QUERIES as PACK_QUERIES

        for q in (QUERIES["dedup_keep_list"], PACK_QUERIES["leakage_safe_split"]):
            sig = inspect.signature(q)
            assert sig.parameters["clusters"].default is None
        df = dedup_keep_list(spark, sf_dir)
        assert df.columns == ["doc_id", "source", "reason", "is_kept"]


class TestSemanticClusterMap:
    def test_semantic_keep_list_from_store_matches(self, spark, sf_dir, tmp_path):
        from jitsu_spark.operators.similarity import (
            build_semantic_cluster_map,
            load_semantic_cluster_map,
            semantic_dedup_keep_list,
        )

        store = str(tmp_path / "sem_map")
        build_semantic_cluster_map(spark, sf_dir, store)
        clusters = load_semantic_cluster_map(spark, store)
        assert _rows(
            semantic_dedup_keep_list(spark, sf_dir, clusters=clusters)
        ) == _rows(semantic_dedup_keep_list(spark, sf_dir))

    def test_semantic_from_store_plan_has_no_gemm(self, spark, sf_dir, tmp_path):
        from jitsu_spark.operators.similarity import (
            build_semantic_cluster_map,
            load_semantic_cluster_map,
            semantic_dedup_keep_list,
        )

        store = str(tmp_path / "sem_plan")
        build_semantic_cluster_map(spark, sf_dir, store)
        clusters = load_semantic_cluster_map(spark, store)
        plan = _formatted_plan(
            spark, semantic_dedup_keep_list(spark, sf_dir, clusters=clusters)
        )
        # the GEMM pair stage is a mapInPandas (ArrowEvalPython /
        # MapInPandas) node; from the store there must be none
        for marker in ("MapInPandas", "ArrowEval", "collect_list"):
            assert marker not in plan, f"GEMM pass leaked: {marker}"


def test_registry_entry_memoized_and_identical(spark, sf_dir):
    """r7: the registry entry serves the per-(process, dataset) memo —
    bit-identical to the live LSH/components pass, built exactly once."""
    from jitsu_spark.operators.dedup import (
        _CLUSTER_MEMO,
        near_dup_clusters,
        near_dup_clusters_live,
    )

    a = sorted(map(tuple, near_dup_clusters(spark, sf_dir).collect()))
    live = sorted(map(tuple, near_dup_clusters_live(spark, sf_dir).collect()))
    assert a == live and len(a) > 0
    n_keys = len(_CLUSTER_MEMO)
    b = sorted(map(tuple, near_dup_clusters(spark, sf_dir).collect()))
    assert b == a and len(_CLUSTER_MEMO) == n_keys


def test_pair_core_memoized_and_identical(spark, sf_dir):
    """r9: ngram_jaccard_dups / containment_dup_pairs share one
    memoized pair-core store — the inverted-index self-join builds once
    per (process, dataset, cap), and the served projections are
    bit-identical to the live computation."""
    from jitsu_spark.operators.dedup import (
        _PAIR_COUNTS_MEMO,
        _default_df_cap,
        _pair_shingle_counts,
        _shingle_rows,
        containment_dup_pairs,
        ensure_pair_shingle_counts,
        ngram_jaccard_dups,
    )
    from jitsu_spark.plans.store_builds import BUILDS

    jac = sorted(map(tuple, ngram_jaccard_dups(spark, sf_dir).collect()))
    n_builds = sum(
        1 for b in BUILDS if b["family"] == "pair_shingle_counts"
    )
    n_keys = len(_PAIR_COUNTS_MEMO)
    # second consumer with the same cap: no new build, no new memo key
    containment_dup_pairs(spark, sf_dir).collect()
    assert (
        sum(1 for b in BUILDS if b["family"] == "pair_shingle_counts")
        == n_builds
    )
    assert len(_PAIR_COUNTS_MEMO) == n_keys
    # served frame matches the live pair core exactly
    live = sorted(
        map(
            tuple,
            _pair_shingle_counts(
                _shingle_rows(spark, sf_dir), _default_df_cap(sf_dir)
            ).collect(),
        )
    )
    served = sorted(
        map(
            tuple,
            ensure_pair_shingle_counts(
                spark, sf_dir, _default_df_cap(sf_dir)
            ).collect(),
        )
    )
    assert served == live and len(jac) > 0
