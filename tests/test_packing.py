"""Sequence packing + leakage-safe split semantics
(`jitsu_spark/operators/packing.py`). The oracle proves Spark==DuckDB;
these prove the contracts."""

from __future__ import annotations

from collections import defaultdict


def test_bins_fill_to_budget_in_order(spark, sf_dir):
    from jitsu_spark.operators.packing import (
        PACK_BUDGET_TOKENS,
        sequence_pack_bins,
    )

    rows = sequence_pack_bins(spark, sf_dir).collect()
    assert rows
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    for docs in by_source.values():
        docs.sort(key=lambda r: r.doc_id)
        # bin ids are non-decreasing in pack order and start at 0
        bins = [r.bin_id for r in docs]
        assert bins[0] == 0
        assert all(a <= b for a, b in zip(bins, bins[1:]))
        # a bin closes only once the budget is reached: tokens BEFORE the
        # last doc of each bin are under (bin_id + 1) * budget
        cum = 0
        for r in docs:
            assert r.bin_id == cum // PACK_BUDGET_TOKENS
            cum += r.n_tokens


def test_split_never_separates_near_dup_clusters(spark, sf_dir):
    from jitsu_spark.operators.dedup import near_dup_clusters
    from jitsu_spark.operators.packing import leakage_safe_split

    split = {
        r.doc_id: r.split
        for r in leakage_safe_split(spark, sf_dir).collect()
    }
    clusters = defaultdict(set)
    for r in near_dup_clusters(spark, sf_dir).collect():
        clusters[r.cluster_id].add(r.doc_id)
    checked = 0
    for members in clusters.values():
        sides = {split[d] for d in members}
        assert len(sides) == 1, f"cluster straddles splits: {members}"
        checked += len(members)
    assert checked > 0  # the corpus has near-dup clusters to protect


def test_split_covers_all_docs_with_expected_shares(spark, sf_dir):
    from jitsu_spark.operators.packing import leakage_safe_split
    from jitsu_spark.tables import load_table

    out = leakage_safe_split(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == n_docs
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_tokenize_pack_bins_respect_budget_atomicity(spark, sf_dir):
    """Composed trained-tokenizer packing: per (source, bin), tokens
    BEFORE the final doc stay under budget (a doc may straddle and close
    its bin — document atomicity), and trained counts genuinely differ
    from the whitespace proxy so the composition changes bin edges."""
    from pyspark.sql import functions as F

    from jitsu_spark.operators.packing import (
        PACK_BUDGET_TOKENS,
        sequence_pack_bins,
        tokenize_pack_pipeline,
    )

    packed = tokenize_pack_pipeline(spark, sf_dir).cache()
    by_bin = (
        packed.groupBy("source", "bin_id")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.max("n_tokens").alias("last_max"),
        )
        .collect()
    )
    assert by_bin
    for r in by_bin:
        # tokens minus SOME doc (>= the straddler) must fit the budget
        assert r["total"] - r["last_max"] < PACK_BUDGET_TOKENS

    proxy = sequence_pack_bins(spark, sf_dir).selectExpr(
        "doc_id", "n_tokens AS ws_tokens"
    )
    diff = (
        packed.join(proxy, "doc_id")
        .where("n_tokens <> ws_tokens")
        .count()
    )
    packed.unpersist()
    assert diff > 0  # the trained tokenizer actually compresses
