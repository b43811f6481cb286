"""Composed crawl->training-shards pipeline (operators/
training_pipeline.py): per-stage attrition sanity and COMPOSITIONAL
EQUALITY — each stage of the one-job plan must equal the standalone
stage operator run on the previous stage's survivors (written out as a
real documents table, the way a stage-per-job pipeline would hand them
over). Oracle parity is covered by tools/check_oracle.py."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jitsu_spark.operators.training_pipeline import (
    TP_BUDGET_PER_MILLE,
    TP_SHARDS,
    _stages,
    training_data_pipeline,
    training_pipeline_shards,
)

SF = "/root/testdata/sf0.001"


def _write_docs(spark, df, path):
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return str(path)


class TestAttrition:
    def test_monotone_and_labeled(self, spark):
        rows = {
            r.stage: r
            for r in training_data_pipeline(spark, SF).collect()
        }
        assert list(rows) == [
            "input", "gopher_gate", "exact_dedup", "paragraph_dedup",
            "token_budget",
        ]
        docs = [rows[s].n_docs for s in rows]
        toks = [rows[s].n_tokens for s in rows]
        assert docs == sorted(docs, reverse=True) and docs[-1] > 0
        assert toks == sorted(toks, reverse=True)

    def test_shards_cover_selected_exactly(self, spark):
        sel = {
            r.stage: r for r in training_data_pipeline(spark, SF).collect()
        }["token_budget"]
        shards = training_pipeline_shards(spark, SF).collect()
        assert len(shards) <= TP_SHARDS
        assert sum(r.n_docs for r in shards) == sel.n_docs
        assert sum(r.n_tokens for r in shards) == sel.n_tokens
        # positions are the 0..n-1 permutation, round-robin sharded
        assert min(r.min_pos for r in shards) == 0
        assert max(r.max_pos for r in shards) == sel.n_docs - 1


@pytest.mark.slow  # r13: >30s stage-equality sweeps; run with -m slow
class TestCompositionalEquality:
    def test_gate_stage_equals_gopher_flags(self, spark):
        from jitsu_spark.operators.quality_filters import (
            gopher_quality_flags,
        )

        composed = {
            r.doc_id for r in _stages(spark, SF)["gated"].collect()
        }
        standalone = {
            r.doc_id
            for r in gopher_quality_flags(spark, SF)
            .where("keep")
            .collect()
        }
        assert composed == standalone

    def test_paragraph_stage_equals_standalone_entry(
        self, spark, tmp_path
    ):
        """Write the exact-dedup survivors out as a documents table and
        run the STANDALONE paragraph entry on it: same kept-paragraph
        counts and token mass as the composed stage."""
        from jitsu_spark.operators.paragraphs import paragraph_dedup_docs
        from jitsu_spark.operators.text_ops import TOKENS

        s = _stages(spark, SF)
        sf2 = _write_docs(
            spark, s["exact"].select("doc_id", "source", "text"), tmp_path
        )
        standalone = {
            (r.doc_id, r.n_pars_kept, r.n_tok)
            for r in paragraph_dedup_docs(spark, sf2)
            .selectExpr(
                "doc_id",
                "n_pars_kept",
                f"CAST(size({TOKENS.replace('text', 'text_deduped')})"
                " AS BIGINT) AS n_tok",
            )
            .collect()
        }
        composed = {
            (r.doc_id, r.n_pars_kept, r.n_tok)
            for r in s["rebuilt"].collect()
        }
        assert composed == standalone and composed

    def test_budget_and_shards_equal_standalone_entries(
        self, spark, tmp_path
    ):
        """Hand the rebuilt docs to the standalone token-budget and
        shuffle-order entries: same selected set, same shard manifest."""
        from jitsu_spark.operators.sampling import (
            token_budget_over,
            training_shuffle_order,
        )
        from jitsu_spark.operators.sampling import _bucket

        s = _stages(spark, SF)
        scored = s["rebuilt"].select("doc_id", "source", "n_tok").withColumn(
            "bucket", _bucket(F.col("doc_id"))
        )
        standalone_sel = {
            r.doc_id
            for r in token_budget_over(scored, TP_BUDGET_PER_MILLE)
            .where("selected")
            .collect()
        }
        composed_sel = {
            r.doc_id for r in s["selected"].collect()
        }
        assert composed_sel == standalone_sel

        # shards: the standalone shuffle-order entry on the selected set
        sel_docs = s["selected"].selectExpr(
            "doc_id", "source", "'x' AS text", "n_tok"
        )
        sf2 = _write_docs(spark, sel_docs, tmp_path)
        order = training_shuffle_order(spark, sf2)
        standalone = {
            (r.shard, r.n_docs, r.n_tokens)
            for r in order.join(s["selected"], "doc_id")
            .selectExpr("doc_id", "n_tok", f"pos % {TP_SHARDS} AS shard")
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tok").alias("n_tokens"),
            )
            .collect()
        }
        composed = {
            (r.shard, r.n_docs, r.n_tokens)
            for r in training_pipeline_shards(spark, SF).collect()
        }
        assert composed == standalone
