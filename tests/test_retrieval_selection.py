"""Semantics tests for the round-7 retrieval/selection/attribution
operators on hand-crafted inputs (the oracle gate covers engine parity;
these pin the meaning)."""

from __future__ import annotations

from datetime import datetime

import pytest


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang)"""
    spark.createDataFrame(
        [(i, t, lang, f"src{i % 3}", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    spark.createDataFrame(
        [
            (i, datetime.fromisoformat(ts), u, t, v, "{}")
            for i, ts, u, t, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


class TestBm25:
    def test_ranking_and_bounds(self, spark, tmp_path):
        from jitsu_spark.operators.text_ops import BM25_TOPK, bm25_topk

        # doc 1 saturates query-1 terms, doc 2 has one hit, doc 3 none;
        # filler docs keep idf finite
        rows = [(1, "spark window merge spark window merge spark", "en")]
        rows += [(2, "spark alpha beta gamma delta epsilon zeta", "en")]
        rows += [(3, "alpha beta gamma delta", "en")]
        rows += [(i, "alpha beta gamma", "en") for i in range(4, 30)]
        sf = _write_docs(spark, tmp_path, rows)
        out = bm25_topk(spark, sf).toPandas()
        q1 = out[out.query_id == 1].sort_values("rank")
        assert list(q1.doc_id)[:2] == [1, 2]
        assert 3 not in set(out.doc_id)
        # ranks are 1..k, scores non-increasing, never more than k rows
        for qid, g in out.groupby("query_id"):
            g = g.sort_values("rank")
            assert list(g["rank"]) == list(range(1, len(g) + 1))
            assert len(g) <= BM25_TOPK
            assert (g.score.diff().dropna() <= 0).all()

    def test_exactly_topk_when_more_match(self, spark, tmp_path):
        from jitsu_spark.operators.text_ops import BM25_TOPK, bm25_topk

        rows = [(i, "spark filler%d" % i, "en") for i in range(40)]
        sf = _write_docs(spark, tmp_path, rows)
        out = bm25_topk(spark, sf).toPandas()
        q1 = out[out.query_id == 1]
        assert len(q1) == BM25_TOPK


class TestDsir:
    def test_target_vocab_scores_higher(self, spark, tmp_path):
        from jitsu_spark.operators.sampling import dsir_select

        # target (en) vocabulary is disjoint from the raw-only vocabulary;
        # a non-en doc WRITTEN IN the target vocabulary must outscore a
        # non-en doc written in the raw-only vocabulary — DSIR selects by
        # content resemblance, not by the lang label itself.
        en = "alpha beta gamma delta alpha beta gamma delta"
        other = "omega psi chi phi omega psi chi phi"
        rows = [(i, en, "en") for i in range(10)]
        rows += [(i + 10, other, "de") for i in range(10)]
        rows += [(100, en, "fr"), (101, other, "fr")]
        sf = _write_docs(spark, tmp_path, rows)
        out = (
            dsir_select(spark, sf)
            .toPandas()
            .set_index("doc_id")[["sum_log_ratio", "avg_log_ratio"]]
        )
        # both the paper's summed weight and the normalized diagnostic
        # must rank the target-vocabulary doc above the raw-only doc
        assert out.loc[100, "sum_log_ratio"] > out.loc[101, "sum_log_ratio"]
        assert out.loc[100, "avg_log_ratio"] > out.loc[101, "avg_log_ratio"]

    def test_keep_is_a_key_threshold(self, spark, tmp_path):
        from jitsu_spark.operators.sampling import dsir_select

        rows = [(i, f"tok{i} tok{i + 1} tok{i + 2} alpha", "en" if i % 2 else "de") for i in range(40)]
        sf = _write_docs(spark, tmp_path, rows)
        out = dsir_select(spark, sf).toPandas()
        kept = out[out.keep]
        dropped = out[~out.keep]
        assert 0 < len(kept) < len(out)
        # Gumbel-top-k: every kept key strictly dominates every dropped key
        assert kept.gumbel_key.min() > dropped.gumbel_key.max()
        # percent_rank >= 0.8 keeps roughly the top fifth
        assert len(kept) <= max(2, int(0.3 * len(out)))


class TestEventPaths:
    def test_session_split_and_ordering(self, spark, tmp_path):
        from jitsu_spark.operators.reports import event_path_topk

        sf = _write_events(
            spark,
            tmp_path,
            [
                # user 1, session A: click then view (ordered by ts)
                (1, "2024-01-01T10:00:00", 1, "click", 0.0),
                (2, "2024-01-01T10:05:00", 1, "view", 0.0),
                # > 30 min gap -> session B, same path
                (3, "2024-01-01T12:00:00", 1, "click", 0.0),
                (4, "2024-01-01T12:10:00", 1, "view", 0.0),
                # user 2: one single-event session
                (5, "2024-01-01T09:00:00", 2, "signup", 0.0),
            ],
        )
        out = event_path_topk(spark, sf).toPandas()
        got = dict(zip(out.path, out.n_sessions))
        assert got == {"click>view": 2, "signup": 1}

    def test_topk_bound_and_tiebreak(self, spark, tmp_path):
        from jitsu_spark.operators.reports import PATH_TOPK, event_path_topk

        # 20 distinct single-event paths, one session each -> ties broken
        # by path ascending, exactly PATH_TOPK rows survive
        rows = [
            (i, "2024-01-01T10:00:00", i, f"t{i:02d}", 0.0) for i in range(20)
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = event_path_topk(spark, sf).toPandas()
        assert len(out) == PATH_TOPK
        assert list(out.path) == sorted(f"t{i:02d}" for i in range(PATH_TOPK))


class TestAttribution:
    def test_linear_and_last_touch_credit(self, spark, tmp_path):
        from jitsu_spark.operators.reports import attribution_multi_touch

        sf = _write_events(
            spark,
            tmp_path,
            [
                # user 1: view then click inside the 7-day window, then buys
                (1, "2024-01-08T08:00:00", 1, "view", 0.0),
                (2, "2024-01-08T09:00:00", 1, "click", 0.0),
                (3, "2024-01-08T10:00:00", 1, "purchase", 100.0),
                # user 2: no touches -> direct
                (4, "2024-01-08T10:00:00", 2, "purchase", 40.0),
                # user 3: touch OUTSIDE the window and one AFTER the buy
                (5, "2023-12-01T10:00:00", 3, "click", 0.0),
                (6, "2024-01-08T11:00:00", 3, "view", 0.0),
                (7, "2024-01-08T10:30:00", 3, "purchase", 10.0),
            ],
        )
        out = (
            attribution_multi_touch(spark, sf)
            .toPandas()
            .set_index("channel")
        )
        # linear: user 1 splits 50/50; users 2,3 are direct
        assert out.loc["view", "linear_revenue"] == pytest.approx(50.0)
        assert out.loc["click", "linear_revenue"] == pytest.approx(50.0)
        assert out.loc["direct", "linear_revenue"] == pytest.approx(50.0)
        # last touch: the click (latest touch before the buy) takes all 100
        assert out.loc["click", "last_touch_revenue"] == pytest.approx(100.0)
        assert out.loc["view", "last_touch_revenue"] == pytest.approx(0.0)
        assert out.loc["direct", "last_touch_revenue"] == pytest.approx(50.0)
        assert out.loc["direct", "n_touches"] == 0

    def test_revenue_conservation(self, spark, sf_dir):
        """Both attribution schemes are conservative: channel credits sum
        to the total purchase value, on the real testdata."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.reports import attribution_multi_touch
        from jitsu_spark.tables import load_table

        total = (
            load_table(spark, sf_dir, "events")
            .where(F.col("event_type") == "purchase")
            .agg(F.sum("value"))
            .first()[0]
        )
        out = attribution_multi_touch(spark, sf_dir).toPandas()
        assert out.linear_revenue.sum() == pytest.approx(total, rel=1e-6)
        assert out.last_touch_revenue.sum() == pytest.approx(total, rel=1e-6)


class TestHybridRrf:
    def test_fusion_semantics(self, spark, sf_dir):
        from jitsu_spark.operators.text_ops import (
            HYBRID_FUSED_K,
            RRF_K,
            hybrid_search_rrf,
        )

        out = hybrid_search_rrf(spark, sf_dir).toPandas()
        assert set(out.groupby("query_id")["rank"].max()) <= {HYBRID_FUSED_K}
        # rrf recomputes exactly from the arm ranks
        for _, r in out.iterrows():
            expect = 0.0
            if r.sparse_rank == r.sparse_rank and r.sparse_rank is not None:
                expect += 1.0 / (RRF_K + r.sparse_rank)
            if r.dense_rank == r.dense_rank and r.dense_rank is not None:
                expect += 1.0 / (RRF_K + r.dense_rank)
            assert abs(r.rrf - expect) < 1e-12
        # a document top-1 in BOTH arms would dominate; weaker invariant
        # that always holds: fused rank 1 has the maximal rrf per query
        for _, g in out.groupby("query_id"):
            assert g.loc[g["rank"].idxmin(), "rrf"] == g.rrf.max()

    def test_single_arm_documents_fuse(self, spark, sf_dir):
        from jitsu_spark.operators.text_ops import hybrid_search_rrf

        out = hybrid_search_rrf(spark, sf_dir).toPandas()
        only_dense = out[out.sparse_rank.isna()]
        # the corpus is word soup: some fused docs come from one arm only,
        # and their rrf is exactly the single-arm term
        if len(only_dense):
            r = only_dense.iloc[0]
            assert abs(r.rrf - 1.0 / (60 + r.dense_rank)) < 1e-12


class TestParameterizedQueries:
    """r8: bm25_topk_df / hybrid_search_rrf_df accept an arbitrary
    (query_id, text) workload — the registry's fixed set is just one
    instance of the same plan."""

    def test_bm25_custom_workload_matches_fixed_entry(self, spark, tmp_path):
        from jitsu_spark.operators.text_ops import (
            _default_queries_df,
            bm25_topk,
            bm25_topk_df,
        )
        from jitsu_spark.tables import load_table

        rows = [(1, "spark window merge spark", "en")]
        rows += [(2, "hash join order hash", "en")]
        rows += [(i, "alpha beta gamma", "en") for i in range(3, 25)]
        sf = _write_docs(spark, tmp_path, rows)
        fixed = bm25_topk(spark, sf).toPandas()
        param = bm25_topk_df(
            load_table(spark, sf, "documents"), _default_queries_df(spark)
        ).toPandas()
        assert sorted(map(tuple, fixed.values.tolist())) == sorted(
            map(tuple, param.values.tolist())
        )

    def test_many_query_workload(self, spark, tmp_path):
        from jitsu_spark.operators.text_ops import (
            bm25_topk_df,
            hybrid_search_rrf_df,
        )
        from jitsu_spark.tables import load_table

        vocab = [f"tok{i}" for i in range(40)]
        rows = [
            (d, " ".join(vocab[(d + j) % 40] for j in range(6)), "en")
            for d in range(60)
        ]
        sf = _write_docs(spark, tmp_path, rows)
        docs = load_table(spark, sf, "documents")
        queries = spark.createDataFrame(
            [(q, f"tok{q % 40} tok{(q + 1) % 40}") for q in range(50)],
            "query_id int, text string",
        )
        out = bm25_topk_df(docs, queries, k=5).toPandas()
        assert set(out.query_id) == set(range(50))
        assert (out.groupby("query_id")["rank"].max() <= 5).all()
        fused = hybrid_search_rrf_df(
            docs, queries, arm_k=8, fused_k=3
        ).toPandas()
        assert set(fused.query_id) == set(range(50))
        assert (fused.groupby("query_id")["rank"].max() <= 3).all()
        # every fused doc carries at least one arm rank
        assert (
            fused.sparse_rank.notna() | fused.dense_rank.notna()
        ).all()
