"""training_shuffle_order pins: positions form an exact 0..N-1
permutation in md5 order, shards are round-robin balanced, and the
assignment is independent of input partitioning (determinism)."""

from __future__ import annotations

import hashlib

import pytest

from jitsu_spark.operators.sampling import (
    N_ORDER_SHARDS,
    training_shuffle_order,
)


def _write(spark, tmp_path, n=37, parts=1):
    rows = [(i, f"doc {i} text", "a") for i in range(n)]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).repartition(parts).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_positions_are_md5_permutation(spark, tmp_path):
    n = 37
    sf = _write(spark, tmp_path, n=n)
    out = {r["doc_id"]: r for r in training_shuffle_order(spark, sf).collect()}
    assert sorted(r["pos"] for r in out.values()) == list(range(n))
    # position order == md5-of-id order, computed independently here
    want = sorted(range(n), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    for pos, doc_id in enumerate(want):
        assert out[doc_id]["pos"] == pos
        assert out[doc_id]["shard"] == pos % N_ORDER_SHARDS


@pytest.mark.slow  # r13: >30s rewrite-and-recompute sweep; run with -m slow
def test_order_is_partitioning_independent(spark, tmp_path):
    a = {
        (r["doc_id"], r["pos"])
        for r in training_shuffle_order(
            spark, _write(spark, tmp_path, n=64, parts=1)
        ).collect()
    }
    b = {
        (r["doc_id"], r["pos"])
        for r in training_shuffle_order(
            spark, _write(spark, tmp_path, n=64, parts=7)
        ).collect()
    }
    assert a == b


def test_shards_balanced_within_one(spark, tmp_path):
    sf = _write(spark, tmp_path, n=100)
    sizes = [
        r["cnt"]
        for r in training_shuffle_order(spark, sf)
        .groupBy("shard")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    ]
    assert len(sizes) == N_ORDER_SHARDS
    assert max(sizes) - min(sizes) <= 1
