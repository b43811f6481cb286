"""Corpus snapshot diff (`jitsu_spark/operators/corpus.py`): incremental
versioning — added/removed/changed between two snapshots, hashed map-side
so document bodies never shuffle."""

from __future__ import annotations

from tests.conftest import SF_DIR


class TestSnapshotDiff:
    def test_statuses_exact_on_synthetic_snapshots(self, spark):
        from jitsu_spark.operators.corpus import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
        )
        new = spark.createDataFrame(
            [(2, "b"), (3, "c2"), (4, "d")], "doc_id long, text string"
        )
        got = {(r.doc_id, r.status) for r in snapshot_diff(old, new).collect()}
        # 2 is unchanged and must be absent
        assert got == {(1, "removed"), (3, "changed"), (4, "added")}

    def test_registry_entry_exercises_all_statuses(self, spark):
        from jitsu_spark.operators.corpus import (
            DIFF_ADDED_GE,
            DIFF_CHANGED_HI,
            DIFF_CHANGED_LO,
            DIFF_REMOVED_LT,
            corpus_snapshot_diff,
        )
        from jitsu_spark.operators.sampling import _bucket
        from jitsu_spark.tables import load_table
        from pyspark.sql import functions as F

        diff = corpus_snapshot_diff(spark, SF_DIR)
        by_status = {
            r["status"]: r["n"]
            for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        assert set(by_status) == {"added", "removed", "changed"}

        # counts must equal the bucket-derivation exactly
        docs = load_table(spark, SF_DIR, "documents").select(
            _bucket(F.col("doc_id")).alias("b")
        )
        want = docs.selectExpr(
            f"sum(CASE WHEN b >= {DIFF_ADDED_GE} THEN 1 ELSE 0 END) AS added",
            f"sum(CASE WHEN b < {DIFF_REMOVED_LT} THEN 1 ELSE 0 END) AS removed",
            f"sum(CASE WHEN b BETWEEN {DIFF_CHANGED_LO} AND {DIFF_CHANGED_HI - 1}"
            " THEN 1 ELSE 0 END) AS changed",
        ).first()
        assert by_status == {
            "added": want["added"],
            "removed": want["removed"],
            "changed": want["changed"],
        }

    def test_bodies_hashed_below_the_join(self, spark):
        """The full-outer join's inputs are (doc_id, md5) projections —
        the text column must not appear above the scans in the plan, so
        only 32-char hashes shuffle."""
        from jitsu_spark.operators.corpus import corpus_snapshot_diff

        df = corpus_snapshot_diff(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        join_kind = "SortMergeJoin" if "SortMergeJoin" in plan else "BroadcastHashJoin"
        assert join_kind in plan and "FullOuter" in plan
        # every Exchange input projection carries a hash, never raw text
        for seg in plan.split("Exchange")[1:]:
            head = seg.splitlines()[0]
            assert "text#" not in head
