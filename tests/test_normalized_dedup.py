"""Normalization-aware exact dedup (CCNet-style fold): case and
punctuation variants of the same content hash together; genuinely
different content does not."""

from __future__ import annotations

from jitsu_spark.operators.dedup import normalized_dedup_map


def test_case_and_punct_variants_merge(spark, tmp_path):
    rows = [
        (1, "Hello, World!  This is FINE.", "a"),
        (2, "hello world this is fine", "a"),      # normalized twin of 1
        (3, "hello world; this -- is fine?!", "a"),  # another twin
        (4, "a genuinely different document", "a"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in normalized_dedup_map(spark, str(tmp_path)).collect()
    }
    assert out[1]["canonical_id"] == 1 and out[1]["is_duplicate"] is False
    assert out[2]["canonical_id"] == 1 and out[2]["is_duplicate"] is True
    assert out[3]["canonical_id"] == 1 and out[3]["group_size"] == 3
    assert out[4]["canonical_id"] == 4 and out[4]["group_size"] == 1
