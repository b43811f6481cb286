"""Freshness contracts of the r12 construction memos.

`plan_fingerprint` keys the query-vocab and PQ-artifact memos; a memo hit
may only serve the SAME logical computation over the SAME bytes, so a
rewritten input file (same path) or different literal rows must miss.
"""

import os

import pytest
from pyspark.sql import functions as F  # noqa: F401

from jitsu_spark.plans.hints import plan_fingerprint
from jitsu_spark.operators.text_ops import _query_vocab, _VOCAB_MEMO


def test_fingerprint_distinguishes_local_rows(spark):
    a = spark.createDataFrame([(1, "x y")], "query_id int, text string")
    b = spark.createDataFrame([(1, "x z")], "query_id int, text string")
    fa, fb = plan_fingerprint(a), plan_fingerprint(b)
    assert fa is not None and fb is not None
    assert fa != fb
    # NOTE: a fresh createDataFrame of the SAME rows hashes differently
    # (LocalRelation fingerprints are instance-specific) — that is why
    # _default_queries_df memoizes the frame itself; the same DataFrame
    # object must fingerprint stably:
    assert plan_fingerprint(a) == fa


def test_default_queries_df_is_session_stable(spark):
    from jitsu_spark.operators.text_ops import _default_queries_df

    d1 = _default_queries_df(spark)
    d2 = _default_queries_df(spark)
    assert plan_fingerprint(d1) == plan_fingerprint(d2)


def test_fingerprint_tracks_file_rewrites(spark, tmp_path):
    p = str(tmp_path / "q.parquet")
    spark.createDataFrame(
        [(1, "alpha beta")], "query_id int, text string"
    ).write.mode("overwrite").parquet(p)
    f1 = plan_fingerprint(spark.read.parquet(p))
    # independent reads of the same unchanged path hash identically —
    # file-backed plans, unlike local relations, fingerprint stably
    assert plan_fingerprint(spark.read.parquet(p)) == f1
    spark.createDataFrame(
        [(1, "gamma delta")], "query_id int, text string"
    ).write.mode("overwrite").parquet(p)
    f2 = plan_fingerprint(spark.read.parquet(p))
    assert f1 is not None and f2 is not None
    assert f1 != f2


def test_query_vocab_never_stale_after_rewrite(spark, tmp_path):
    p = str(tmp_path / "q2.parquet")
    spark.createDataFrame(
        [(1, "alpha beta")], "query_id int, text string"
    ).write.mode("overwrite").parquet(p)
    v1 = _query_vocab(spark.read.parquet(p))
    assert v1 == ["alpha", "beta"]
    # warm hit serves the memo
    assert _query_vocab(spark.read.parquet(p)) == v1
    os.utime(p)  # even a metadata-only touch must invalidate
    spark.createDataFrame(
        [(1, "gamma beta")], "query_id int, text string"
    ).write.mode("overwrite").parquet(p)
    assert _query_vocab(spark.read.parquet(p)) == ["beta", "gamma"]


def test_query_vocab_escapes_hostile_terms(spark):
    _VOCAB_MEMO.clear()
    q = spark.createDataFrame(
        [(1, "it's a\\path")], "query_id int, text string"
    )
    vocab = _query_vocab(q)
    assert vocab == ["a\\\\path", "it\\'s"]
