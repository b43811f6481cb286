"""Streaming corpus-ingestion gate: quality filter + content dedup on a
document stream, and batch/stream gate agreement."""

from __future__ import annotations

import json
import os

GOOD_TEXT = (
    "the quick brown fox jumps over a lazy dog and then runs far away to "
    "find some food in the deep green forest where many other animals live "
    "quietly among old tall trees near the wide cold river bank"
)


def _write_docs(path, docs):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "shard0.json"), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def test_gate_drops_low_quality_and_dups(spark, tmp_path):
    from jitsu_spark.streaming.corpus_gate import document_stream, gated_documents

    src = str(tmp_path / "in")
    _write_docs(
        src,
        [
            {"doc_id": 1, "text": GOOD_TEXT, "source": "a",
             "ingested_at": "2024-01-01T00:00:01Z"},
            # exact duplicate content, later arrival -> deduped
            {"doc_id": 2, "text": GOOD_TEXT, "source": "a",
             "ingested_at": "2024-01-01T00:00:02Z"},
            # too short -> gated out
            {"doc_id": 3, "text": "hello world", "source": "b",
             "ingested_at": "2024-01-01T00:00:03Z"},
        ],
    )
    out = gated_documents(document_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_gate_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id FROM corpus_gate_out").collect()
    assert [r.doc_id for r in rows] == [1]


def test_stream_gate_matches_batch_keep(spark, tmp_path):
    """The streaming gate expression IS the batch keep column."""
    from pyspark.sql import functions as F

    from jitsu_spark.operators.quality_filters import gopher_quality_flags
    from jitsu_spark.streaming.corpus_gate import gate_expr

    docs = spark.createDataFrame(
        [
            (1, GOOD_TEXT),
            (2, "hello world"),
            (3, " ".join(["spam ham"] * 40)),
        ],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    batch = {
        r["doc_id"]: r["keep"]
        for r in gopher_quality_flags(spark, str(tmp_path)).collect()
    }
    stream_side = {
        r["doc_id"]: r["k"]
        for r in docs.select("doc_id", F.expr(gate_expr()).alias("k")).collect()
    }
    assert batch == stream_side
