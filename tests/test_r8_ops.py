"""Round-8 operators: RFM segmentation, session entry stats, shingle
containment pairs, Matryoshka truncation audit, n-gram novelty curve."""

from __future__ import annotations

import datetime as dt

import pytest


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        [(d, t, lang, "src", len(t)) for d, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


class TestRfm:
    def test_scores_and_segments(self, spark, tmp_path):
        from jitsu_spark.operators.reports import rfm_segments

        rows = []
        eid = 0
        # 10 users: user u has u+1 events of value 10, last event u days
        # before the anchor (user 9 is the anchor's owner)
        for u in range(10):
            for k in range(u + 1):
                rows.append(
                    (
                        eid,
                        dt.datetime(2024, 3, 10 - (9 - u)) - dt.timedelta(hours=k),
                        u,
                        "click",
                        10.0,
                        "{}",
                    )
                )
                eid += 1
        sf = _write_events(spark, tmp_path, rows)
        out = rfm_segments(spark, sf).toPandas().set_index("user_id")
        assert len(out) == 10
        for c in ("r_score", "f_score", "m_score"):
            assert out[c].between(1, 5).all()
        # user 9: most recent, most frequent, most monetary -> champion
        assert out.loc[9, "r_score"] == 5
        assert out.loc[9, "f_score"] == 5
        assert out.loc[9, "segment"] == "champion"
        # user 0: oldest, least frequent -> hibernating
        assert out.loc[0, "r_score"] == 1
        assert out.loc[0, "segment"] == "hibernating"
        # monetary is frequency * 10 here, so m mirrors f
        assert (out.m_score == out.f_score).all()

    def test_tie_stability(self, spark, tmp_path):
        """Equal metrics => equal scores (percent_rank is tie-stable)."""
        from jitsu_spark.operators.reports import rfm_segments

        ts = dt.datetime(2024, 3, 1)
        rows = [(i, ts, i, "click", 5.0, "{}") for i in range(6)]
        sf = _write_events(spark, tmp_path, rows)
        out = rfm_segments(spark, sf).toPandas()
        assert out.r_score.nunique() == 1
        assert out.f_score.nunique() == 1
        assert out.m_score.nunique() == 1


class TestSessionStats:
    def test_bounce_and_depth(self, spark, tmp_path):
        from jitsu_spark.operators.reports import session_stats_report

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            # user 1: a 3-event session entered via 'view' (120 s long)
            (0, t0, 1, "view", 0.0, "{}"),
            (1, t0 + dt.timedelta(seconds=60), 1, "click", 0.0, "{}"),
            (2, t0 + dt.timedelta(seconds=120), 1, "buy", 0.0, "{}"),
            # user 1, second session (gap > 30 min): 1-event bounce via 'view'
            (3, t0 + dt.timedelta(hours=2), 1, "view", 0.0, "{}"),
            # user 2: 1-event bounce via 'click'
            (4, t0, 2, "click", 0.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        out = (
            session_stats_report(spark, sf)
            .toPandas()
            .set_index("entry_event_type")
        )
        assert out.loc["view", "n_sessions"] == 2
        assert out.loc["view", "bounce_rate"] == pytest.approx(0.5)
        assert out.loc["view", "avg_events"] == pytest.approx(2.0)
        assert out.loc["view", "avg_duration_sec"] == pytest.approx(60.0)
        assert out.loc["click", "n_sessions"] == 1
        assert out.loc["click", "bounce_rate"] == pytest.approx(1.0)


class TestContainment:
    def test_subset_doc_caught_where_jaccard_misses(self, spark, tmp_path):
        from jitsu_spark.operators.dedup import (
            containment_dup_pairs,
            ngram_jaccard_dups,
        )

        short = "alpha beta gamma delta epsilon zeta"
        filler = " ".join(f"w{i}" for i in range(40))
        rows = [
            (1, short, "en"),
            (2, short + " " + filler, "en"),  # short fully contained
            (3, "other words entirely here now", "en"),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        pairs = containment_dup_pairs(spark, sf).toPandas()
        got = {(r.doc_a, r.doc_b) for r in pairs.itertuples()}
        assert (1, 2) in got
        row = pairs.set_index(["doc_a", "doc_b"]).loc[(1, 2)]
        assert row["containment_a"] == pytest.approx(1.0)
        assert row["jaccard"] < 0.8  # symmetric measure misses it
        jac = ngram_jaccard_dups(spark, sf).toPandas()
        assert (1, 2) not in {(r.doc_a, r.doc_b) for r in jac.itertuples()}


class TestMrlTruncation:
    def test_energy_monotone_and_full_is_one(self, spark, sf_dir):
        from jitsu_spark.operators.embedding_prep import (
            MRL_PREFIX_DIMS,
            embedding_dim_truncation_report,
        )

        out = (
            embedding_dim_truncation_report(spark, sf_dir)
            .toPandas()
            .sort_values("dim_prefix")
        )
        assert list(out.dim_prefix) == list(MRL_PREFIX_DIMS)
        # energy is non-decreasing in prefix length; full prefix = all of it
        assert out.avg_energy_frac.is_monotonic_increasing
        assert out.iloc[-1].avg_energy_frac == pytest.approx(1.0)
        assert out.iloc[-1].avg_cos == pytest.approx(1.0)
        assert (out.min_energy_frac <= out.avg_energy_frac).all()
        # cos = sqrt(energy): avg_cos >= avg_energy for fracs in [0,1]
        assert (out.avg_cos >= out.avg_energy_frac - 1e-9).all()


class TestNovelty:
    def test_first_doc_fully_novel_dup_fully_stale(self, spark, tmp_path):
        from jitsu_spark.operators.corpus_stats import ngram_novelty_curve

        a = "one two three four five six seven"
        rows = [
            (1, a, "en"),
            (2, a, "en"),  # exact dup: zero novelty
            (3, a + " eight nine ten", "en"),  # extends a: partial novelty
        ]
        sf = _write_docs(spark, tmp_path, rows)
        out = (
            ngram_novelty_curve(spark, sf).toPandas().set_index("doc_id")
        )
        assert out.loc[1, "novel_frac"] == pytest.approx(1.0)
        assert out.loc[2, "novel_frac"] == pytest.approx(0.0)
        assert 0.0 < out.loc[3, "novel_frac"] < 1.0
        # novel counts sum to the corpus's distinct shingle count
        assert out.n_novel.sum() == out.loc[1, "n_distinct_grams"] + 3


class TestEngagement:
    def test_l7_l28_histogram(self, spark, tmp_path):
        from jitsu_spark.operators.events_ops import engagement_histogram

        rows = []
        eid = 0
        # user 1 active every day of the trailing 28; user 2 only on the
        # anchor day; user 3 only 40 days ago (outside both windows)
        anchor = dt.datetime(2024, 3, 1)
        for d in range(28):
            rows.append((eid, anchor - dt.timedelta(days=d), 1, "c", 0.0, "{}"))
            eid += 1
        rows.append((eid, anchor, 2, "c", 0.0, "{}")); eid += 1
        rows.append((eid, anchor - dt.timedelta(days=40), 3, "c", 0.0, "{}"))
        sf = _write_events(spark, tmp_path, rows)
        out = engagement_histogram(spark, sf).toPandas()
        l7 = out[out.window_days == 7].set_index("days_active")["n_users"]
        l28 = out[out.window_days == 28].set_index("days_active")["n_users"]
        assert l7.loc[7] == 1 and l7.loc[1] == 1  # user1 full, user2 one day
        assert l28.loc[28] == 1 and l28.loc[1] == 1
        assert 3 not in set(
            out.days_active[out.n_users > 2]
        )  # user 3 contributes nowhere
        assert out.n_users.sum() == 4  # 2 users x 2 windows


class TestDedupCascade:
    def test_monotone_attrition_and_stage_rules(self, spark, tmp_path):
        from jitsu_spark.operators.dedup import dedup_cascade_report

        short = "alpha beta gamma delta epsilon zeta"
        filler = " ".join(f"w{i}" for i in range(40))
        rows = [
            (1, short, "en"),                     # survives everything
            (2, short, "en"),                     # exact dup of 1
            (3, short + " " + filler, "en"),      # superset of 1
            (4, "totally different text here with words", "en"),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        out = (
            dedup_cascade_report(spark, sf)
            .toPandas()
            .sort_values("stage_order")
            .set_index("stage")
        )
        assert list(out.index) == ["raw", "exact", "containment", "near_dup"]
        assert out.loc["raw", "n_docs"] == 4
        assert out.loc["exact", "n_docs"] == 3          # doc 2 dropped
        # the CONTAINED doc 1 drops (its content lives inside doc 3)
        assert out.loc["containment", "n_docs"] == 2
        assert out.n_docs.is_monotonic_decreasing
        assert out.n_tokens.is_monotonic_decreasing
        assert out.loc["raw", "doc_pct"] == 1.0


class TestTimeToConvert:
    def test_latency_percentiles(self, spark, tmp_path):
        from jitsu_spark.operators.events_ops import funnel_time_to_convert

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: signup then purchase 2h later (and an earlier
            # purchase that must NOT count)
            (0, t0 - dt.timedelta(hours=5), 1, "purchase", 1.0, "{}"),
            (1, t0, 1, "signup", 0.0, "{}"),
            (2, t0 + dt.timedelta(hours=2), 1, "purchase", 1.0, "{}"),
            # user 2: signup, converts 10h later (first of two purchases)
            (3, t0, 2, "signup", 0.0, "{}"),
            (4, t0 + dt.timedelta(hours=10), 2, "purchase", 1.0, "{}"),
            (5, t0 + dt.timedelta(hours=20), 2, "purchase", 1.0, "{}"),
            # user 3: signup, never purchases
            (6, t0, 3, "signup", 0.0, "{}"),
            # user 4: purchase without signup
            (7, t0, 4, "purchase", 1.0, "{}"),
        ]
        sf = _write_events(spark, tmp_path, rows)
        row = funnel_time_to_convert(spark, sf).first()
        assert row.n_converted == 2
        assert row.p50_hours == pytest.approx(6.0)  # interp of 2 and 10
        assert row.max_hours == pytest.approx(10.0)


class TestPmi:
    def test_collocated_pair_ranks_first(self, spark, tmp_path):
        from jitsu_spark.operators.corpus_stats import collocation_pmi_topk

        # "alpha beta" always adjacent; "gamma"/"delta" frequent but
        # never adjacent to each other
        rows = [(i, "alpha beta gamma delta gamma delta " * 2, "en") for i in range(5)]
        rows += [(10 + i, "gamma epsilon delta zeta " * 3, "en") for i in range(5)]
        sf = _write_docs(spark, tmp_path, rows)
        out = collocation_pmi_topk(spark, sf).toPandas()
        assert (out.pair_cnt >= 5).all()
        assert list(out["rank"]) == list(range(1, len(out) + 1))
        top = out.iloc[0]
        # the perfectly-collocated pair beats the frequent-but-mixed
        # ones — asserted on the PAIR, not the (tautological) rank-1
        # pmi value (r8 review finding)
        assert (top.w1, top.w2) == ("alpha", "beta")
        mixed = out[(out.w1 == "gamma") & (out.w2 == "delta")]
        assert mixed.empty or (mixed.pmi < top.pmi).all()


class TestWinnowing:
    def test_shared_substring_guarantee(self, spark, tmp_path):
        """Winnowing's defining property (Schleimer et al. 2003): two
        documents sharing a token run of length >= w + k - 1 share at
        least one selected fingerprint."""
        from jitsu_spark.operators.text_ops import (
            WINNOW_K,
            WINNOW_W,
            winnowing_fingerprints,
        )

        shared_run = " ".join(f"s{i}" for i in range(WINNOW_W + WINNOW_K - 1))
        rows = [
            (1, "aa bb cc " + shared_run + " dd ee ff", "en"),
            (2, "xx yy zz qq " + shared_run + " rr", "en"),
            (3, "totally unrelated words only here now", "en"),
        ]
        sf = _write_docs(spark, tmp_path, rows)
        out = winnowing_fingerprints(spark, sf).toPandas()
        fps = {d: set(g.fp) for d, g in out.groupby("doc_id")}
        assert fps[1] & fps[2], "shared run must yield a shared fingerprint"
        assert not (fps[1] & fps[3])
        assert not (fps[2] & fps[3])

    def test_selection_density_and_positions(self, spark, tmp_path):
        from jitsu_spark.operators.text_ops import winnowing_fingerprints

        text = " ".join(f"t{i}" for i in range(60))  # all-distinct grams
        sf = _write_docs(spark, tmp_path, [(1, text, "en")])
        out = winnowing_fingerprints(spark, sf).toPandas()
        n_grams = 60 - 2
        # winnowing selects ~2/(w+1) of positions; bounds are loose but
        # must hold for any hash assignment
        assert len(out) <= n_grams
        assert len(out) >= (n_grams // 4) // 2
        assert out.pos.between(0, n_grams - 1).all()
        # a doc too short for one gram yields nothing
        sf2 = _write_docs(spark, tmp_path, [(9, "just two", "en")])
        assert winnowing_fingerprints(spark, sf2).count() == 0


class TestTfidf:
    def test_salient_term_ranks_first(self, spark, tmp_path):
        from jitsu_spark.operators.corpus_stats import load_table_docs  # noqa: F401
        from jitsu_spark.operators.text_ops import TFIDF_TOPK, tfidf_top_terms

        common = "the of and to in"
        rows = [(i, common + " filler", "en") for i in range(9)]
        # doc 9: a rare term repeated — highest tf*idf by construction
        rows.append((9, common + " zebra zebra zebra", "en"))
        sf = _write_docs(spark, tmp_path, rows)
        out = tfidf_top_terms(spark, sf).toPandas()
        d9 = out[out.doc_id == 9].sort_values("rank")
        assert d9.iloc[0].term == "zebra"
        assert d9.iloc[0].tf == 3
        # ubiquitous terms score ln(N/N)=0
        ubiq = out[(out.doc_id == 9) & (out.term == "the")]
        assert ubiq.empty or (ubiq.score == 0.0).all()
        assert (out.groupby("doc_id")["rank"].max() <= TFIDF_TOPK).all()
