"""Streaming HLL audience sketch: merged estimates equal exact distinct
counts at test cardinality, replay is idempotent, compaction preserves
estimates."""

from __future__ import annotations


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_type STRING, user_id STRING")


def _ests(spark, d):
    from jitsu_spark.streaming.audience_sketch import read_audience_estimates

    return {
        r.event_type: r.est_users
        for r in read_audience_estimates(spark, d).collect()
    }


def test_cross_batch_union_and_replay(spark, tmp_path):
    from jitsu_spark.streaming.audience_sketch import process_audience_batch

    d = str(tmp_path / "sk")
    b1 = _batch(spark, [("view", f"u{i}") for i in range(30)])
    b2 = _batch(
        spark,
        [("view", f"u{i}") for i in range(20, 50)]  # 20 overlap, 20 new
        + [("click", f"u{i}") for i in range(10)],
    )
    process_audience_batch(b1, d)
    process_audience_batch(b2, d)
    assert _ests(spark, d) == {"view": 50, "click": 10}

    # at-least-once replay: register maxima make the union idempotent
    process_audience_batch(b2, d)
    assert _ests(spark, d) == {"view": 50, "click": 10}


def test_compaction_preserves_estimates(spark, tmp_path):
    from jitsu_spark.streaming.audience_sketch import (
        compact_audience_store,
        process_audience_batch,
    )

    d = str(tmp_path / "sk")
    for lo in (0, 25, 50):
        process_audience_batch(
            _batch(spark, [("buy", f"u{i}") for i in range(lo, lo + 40)]), d
        )
    before = _ests(spark, d)
    assert before == {"buy": 90}
    compact_audience_store(spark, d)
    assert _ests(spark, d) == before
    # one row per type after compaction
    assert spark.read.parquet(d).count() == 1
