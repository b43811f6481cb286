"""Unit tests for the pre-training quality-filter operators: hand-built
documents with known features, PII redaction goldens, chunk-boundary
arithmetic, and a synthetic contamination scenario. Oracle parity is
covered by tools/check_oracle.py; these pin the semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jitsu_spark.operators.quality_filters import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    pii_redact_df,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, text): doc 1 passes every Gopher rule
        (1, "the quick brown fox jumps over a lazy dog and then "
            "runs far away to find some food in the deep green forest "
            "where many other animals live quietly among old tall trees"),
        # doc 2: too short
        (2, "hello world"),
        # doc 3: repetitive (one bigram dominates)
        (3, " ".join(["spam ham"] * 40)),
        # doc 4: PII-laden
        (4, "contact john.doe@example.com or 10.0.0.1 ref 123456789 now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    )


def _gopher(spark, docs_df):
    from jitsu_spark.operators import quality_filters as qf

    toks = docs_df.selectExpr("doc_id", f"{qf.TOKENS} AS t")
    # reuse the query body via a temp parquet round-trip is overkill; call
    # the same expressions the operator uses
    return {
        r["doc_id"]: r
        for r in toks.selectExpr(
            "doc_id",
            "size(t) AS n_words",
            f"size(filter(t, x -> x IN ({qf._SW}))) AS n_stopwords",
        ).collect()
    }


class TestGopherFlags:
    def test_good_doc_kept_short_doc_dropped(self, spark, docs, tmp_path):
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.quality_filters import gopher_quality_flags

        out = {
            r["doc_id"]: r for r in gopher_quality_flags(spark, str(tmp_path)).collect()
        }
        assert out[1]["keep"] is True
        assert out[2]["keep"] is False and out[2]["ok_words"] is False
        # repetitive doc 3 still passes Gopher word rules (repetition is
        # repetition_stats' job) but fails stopwords
        assert out[3]["ok_stopwords"] is False

    def test_mean_word_len_is_token_mean(self, spark, docs, tmp_path):
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.quality_filters import gopher_quality_flags

        row = (
            gopher_quality_flags(spark, str(tmp_path))
            .where("doc_id = 2")
            .collect()[0]
        )
        # "hello world" -> (5 + 5) / 2
        assert row["mean_word_len"] == 5.0


class TestRepetition:
    def test_dominant_bigram_flagged(self, spark, docs, tmp_path):
        docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.quality_filters import repetition_stats

        out = {r["doc_id"]: r for r in repetition_stats(spark, str(tmp_path)).collect()}
        # doc 3 = "spam ham spam ham ..." x40: bigram "spam ham" appears 40
        # times, "ham spam" 39 times, of 79 total
        r3 = out[3]
        assert r3["n_bigrams"] == 79
        assert r3["top_bigram_cnt"] == 40
        assert r3["n_distinct_bigrams"] == 2
        assert r3["keep"] is False
        # natural doc 1 passes
        assert out[1]["keep"] is True
        # 1-token docs produce no row
        assert all(d in (1, 2, 3, 4) for d in out)


class TestPiiRedact:
    def test_counts_and_redaction(self, spark, docs):
        out = {r["doc_id"]: r for r in pii_redact_df(docs).collect()}
        r4 = out[4]
        assert r4["n_email"] == 1
        assert r4["n_ipv4"] == 1
        assert r4["n_long_digits"] == 1
        assert r4["has_pii"] is True
        assert (
            r4["redacted_text"]
            == "contact <email> or <ipv4> ref <long_digits> now"
        )
        r1 = out[1]
        assert r1["has_pii"] is False
        assert "fox" in r1["redacted_text"]

    def test_short_digit_runs_untouched(self, spark):
        df = spark.createDataFrame(
            [(1, "version 12345678 of 2024")], "doc_id long, text string"
        )
        row = pii_redact_df(df).collect()[0]
        assert row["n_long_digits"] == 0
        assert row["redacted_text"] == "version 12345678 of 2024"


class TestChunking:
    def test_window_arithmetic(self, spark, tmp_path):
        n = 100
        text = " ".join(f"tok{i}" for i in range(n))
        spark.createDataFrame([(1, text)], "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.quality_filters import chunk_documents

        rows = sorted(
            chunk_documents(spark, str(tmp_path)).collect(),
            key=lambda r: r["chunk_id"],
        )
        # starts at 0, 48, 96 -> window sizes 64, 52, 4
        assert [r["chunk_id"] for r in rows] == [0, 1, 2]
        assert [r["n_chunk_tokens"] for r in rows] == [
            CHUNK_TOKENS,
            n - CHUNK_STRIDE,
            n - 2 * CHUNK_STRIDE,
        ]
        # overlap: consecutive chunks share CHUNK_TOKENS - CHUNK_STRIDE tokens
        assert CHUNK_TOKENS - CHUNK_STRIDE == 16

    def test_empty_doc_drops_out(self, spark, tmp_path):
        spark.createDataFrame(
            [(1, "one two"), (2, "")], "doc_id long, text string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.quality_filters import chunk_documents

        out = chunk_documents(spark, str(tmp_path)).collect()
        assert {r["doc_id"] for r in out} == {1}


class TestContamination:
    def test_train_doc_sharing_test_shingles_flagged(self, spark, tmp_path):
        from jitsu_spark.operators.quality_filters import TEST_BUCKET_MIN
        from jitsu_spark.operators.sampling import _bucket

        # find one doc id hashing into the test bucket and one into train
        ids = spark.range(0, 2000).select(
            F.col("id"), _bucket(F.col("id")).alias("b")
        )
        test_id = ids.where(F.col("b") >= TEST_BUCKET_MIN).first()["id"]
        train_id = ids.where(F.col("b") < TEST_BUCKET_MIN).first()["id"]
        shared = "alpha beta gamma delta epsilon zeta"
        rows = [
            (test_id, shared),  # held-out doc
            (train_id, shared + " eta theta"),  # contaminated train doc
        ]
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.quality_filters import contamination_check

        out = contamination_check(spark, str(tmp_path)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["doc_id"] == train_id
        # train doc has 6 shingles; 4 of them (the shared prefix) held out
        assert r["n_shingles"] == 6
        assert r["n_contaminated"] == 4
        assert r["flagged"] is True


class TestUrlStats:
    def test_url_extraction(self, spark):
        from jitsu_spark.operators.text_ops import url_stats_df

        df = spark.createDataFrame(
            [
                (1, "see https://example.com/page and http://other.org x"),
                (2, "no links here"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in url_stats_df(df).collect()}
        assert out[1]["n_urls"] == 2
        assert out[1]["first_domain"] == "example.com"
        assert out[2]["n_urls"] == 0


class TestBpeTokens:
    def test_pretoken_splits(self, spark, tmp_path):
        spark.createDataFrame(
            [(1, "hello world, 42 times!")], "doc_id long, text string"
        ).withColumn("source", F.lit("s")).write.mode("overwrite").parquet(
            f"{tmp_path}/documents.parquet"
        )
        from jitsu_spark.operators.text_ops import bpe_token_count

        r = bpe_token_count(spark, str(tmp_path)).collect()[0]
        # "hello" " world" "," " 42" " times" "!" -> 6 BPE pretokens
        assert r["n_bpe_tokens"] == 6
        assert r["n_ws_tokens"] == 4


class TestNearDupClusters:
    def test_clusters_from_duplicated_docs(self, spark, tmp_path):
        base = " ".join(f"w{i}" for i in range(60))
        rows = [
            (1, base),
            (2, base),                      # exact dup of 1
            (3, base + " extra tail"),      # near dup of 1
            (4, " ".join(f"z{i}" for i in range(60))),  # unrelated
        ]
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.dedup import near_dup_clusters

        out = {r["doc_id"]: r for r in near_dup_clusters(spark, str(tmp_path)).collect()}
        # 1, 2 (and likely 3) cluster together under canonical doc 1;
        # doc 4 shares no bands and is absent (singleton)
        assert out[1]["cluster_id"] == 1 and out[1]["is_canonical"] is True
        assert out[2]["cluster_id"] == 1 and out[2]["is_canonical"] is False
        assert 4 not in out
        assert out[1]["cluster_size"] == len(out)


class TestPercentileGate:
    def test_worst_quartile_dropped_per_source(self, spark, tmp_path):
        # source A: sw_ratios 0.0, 0.1, 0.2, 0.3 -> percent_rank 0, 1/3, 2/3, 1
        rows = []
        for i, n_stop in enumerate([0, 1, 2, 3]):
            text = " ".join(["the"] * n_stop + ["word"] * (10 - n_stop))
            rows.append((i, text, "A"))
        spark.createDataFrame(rows, "doc_id long, text string, source string").write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.quality_filters import quality_percentile_gate

        out = {r["doc_id"]: r for r in quality_percentile_gate(spark, str(tmp_path)).collect()}
        assert out[0]["keep"] is False  # rank 0 < 0.25
        assert out[1]["keep"] is True and abs(out[1]["pct_rank"] - 1 / 3) < 1e-6
        assert out[3]["keep"] is True and out[3]["pct_rank"] == 1.0

    def test_scale_form_matches_window_twin(self, spark, sf_dir):
        """The broadcast-threshold form must reproduce the window form's
        pct_rank and keep EXACTLY (same doubles, not just same decisions)."""
        from jitsu_spark.operators.quality_filters import (
            quality_percentile_gate,
            quality_percentile_gate_window,
        )

        got = sorted(map(tuple, quality_percentile_gate(spark, sf_dir).collect()))
        want = sorted(
            map(tuple, quality_percentile_gate_window(spark, sf_dir).collect())
        )
        assert got == want

    def test_scale_form_ties_and_singletons(self, spark, tmp_path):
        """Tied sw_ratios share the min rank (percent_rank semantics) and a
        single-doc source gets pct_rank 0.0, in both forms."""
        rows = [
            # source A: two tied at the bottom, one above
            (1, "word word word word", "A"),
            (2, "word word word word", "A"),
            (3, "the word word word", "A"),
            # source B: a single document
            (4, "the the word word", "B"),
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.quality_filters import (
            quality_percentile_gate,
            quality_percentile_gate_window,
        )

        got = sorted(map(tuple, quality_percentile_gate(spark, str(tmp_path)).collect()))
        want = sorted(
            map(tuple, quality_percentile_gate_window(spark, str(tmp_path)).collect())
        )
        assert got == want
        by_id = {t[0]: t for t in got}
        assert by_id[1][3] == by_id[2][3] == 0.0  # tied min rank
        assert by_id[3][3] == 1.0
        assert by_id[4][3] == 0.0 and by_id[4][4] is False  # singleton source


class TestEmbeddingNormStats:
    def test_zero_vector_detected(self, spark, tmp_path):
        rows = [
            (1, [3.0, 4.0], 0),
            (2, [0.0, 0.0], 0),
            (3, [1.0, 0.0], 1),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        from jitsu_spark.operators.quality_filters import embedding_norm_stats

        out = {r["label"]: r for r in embedding_norm_stats(spark, str(tmp_path)).collect()}
        assert out[0]["n_vectors"] == 2
        assert out[0]["max_norm"] == 5.0
        assert out[0]["n_zero"] == 1
        assert out[1]["avg_norm"] == 1.0 and out[1]["n_zero"] == 0
        assert out[0]["dim"] == 2


class TestDedupKeepList:
    def test_reasons_and_keep_flags(self, spark, tmp_path):
        base = " ".join(f"w{i}" for i in range(60))
        rows = [
            (1, base, "a"),
            (2, base, "a"),                              # near-dup of 1
            (3, " ".join(f"z{i}" for i in range(60)), "b"),  # singleton
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        from jitsu_spark.operators.dedup import dedup_keep_list

        out = {r["doc_id"]: r for r in dedup_keep_list(spark, str(tmp_path)).collect()}
        assert out[1]["reason"] == "canonical" and out[1]["is_kept"] is True
        assert out[2]["reason"] == "near_dup" and out[2]["is_kept"] is False
        assert out[3]["reason"] == "singleton" and out[3]["is_kept"] is True


class TestQualityFunnelReport:
    def test_funnel_is_cumulative_and_consistent(self, spark, sf_dir):
        """Stages chain: each stage's n_in is the previous stage's
        n_kept, kept counts never increase, and drop_rate matches."""
        from jitsu_spark.operators.quality_filters import (
            FUNNEL_STAGES,
            quality_funnel_report,
        )
        from jitsu_spark.tables import load_table

        rows = sorted(
            quality_funnel_report(spark, sf_dir).collect(),
            key=lambda r: r["stage_idx"],
        )
        assert [r["stage"] for r in rows] == FUNNEL_STAGES
        n_docs = load_table(spark, sf_dir, "documents").count()
        assert rows[0]["n_in"] == rows[0]["n_kept"] == n_docs
        for prev, cur in zip(rows, rows[1:]):
            assert cur["n_in"] == prev["n_kept"]
            assert cur["n_kept"] <= cur["n_in"]
            assert cur["drop_rate"] == round(
                1.0 - cur["n_kept"] / cur["n_in"], 4
            )
        # the funnel actually drops something on the synthetic corpus
        assert rows[-1]["n_kept"] < n_docs

    def test_matches_component_filters(self, spark, sf_dir):
        """The funnel's terminal survivor count equals composing the
        standalone filter entries by hand."""
        from jitsu_spark.operators.quality_filters import (
            gopher_quality_flags,
            quality_funnel_report,
            repetition_stats,
        )
        from jitsu_spark.operators.text_ops import lang_id_heuristic

        lang_ok = {
            r["doc_id"]
            for r in lang_id_heuristic(spark, sf_dir).collect()
            if r["lang_pred"] == "en"
        }
        gopher_ok = {
            r["doc_id"]
            for r in gopher_quality_flags(spark, sf_dir).collect()
            if r["keep"]
        }
        rep_ok = {
            r["doc_id"]
            for r in repetition_stats(spark, sf_dir).collect()
            if r["keep"]
        }
        want = len(lang_ok & gopher_ok & rep_ok)
        rows = {r["stage"]: r for r in quality_funnel_report(spark, sf_dir).collect()}
        assert rows["repetition"]["n_kept"] == want


class TestC4PageFilter:
    """Raffel 2020 C4 rules on crafted pages (the synthetic corpus has
    no punctuation/newlines, so the rules only fire here)."""

    def _report(self, spark, tmp_path, pages):
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(pages)], "doc_id long, text string"
        )
        d = str(tmp_path / "c4")
        (
            df.withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("web"))
            .withColumn("n_chars", F.length("text"))
            .write.parquet(d + "/documents.parquet")
        )
        from jitsu_spark.operators.quality_filters import (
            c4_page_filter_report,
        )

        return {
            r["doc_id"]: r
            for r in c4_page_filter_report(spark, d).collect()
        }

    def test_line_rules(self, spark, tmp_path):
        good = "this is a fine sentence."
        pages = [
            # 5 good lines -> kept page
            "\n".join([good] * 5),
            # terminal punctuation missing -> every line dropped
            "\n".join(["this line never ends"] * 5),
            # too few words per line
            "\n".join(["too short."] * 5),
            # javascript warning line dropped, rest kept but only 4
            # sentences survive -> page dropped
            "\n".join([good] * 4 + ["please enable javascript to view."]),
            # lorem ipsum anywhere kills the page
            "\n".join([good] * 5) + "\nlorem ipsum dolor sit amet.",
            # code brace kills the page
            "\n".join([good] * 5) + "\nfunction f() { return 1; }",
        ]
        got = self._report(spark, tmp_path, pages)
        assert got[0]["page_kept"] and got[0]["n_kept_lines"] == 5
        assert not got[1]["page_kept"] and got[1]["n_kept_lines"] == 0
        assert not got[2]["page_kept"] and got[2]["n_kept_lines"] == 0
        assert not got[3]["page_kept"] and got[3]["n_kept_lines"] == 4
        assert not got[4]["page_kept"] and got[4]["has_lorem_ipsum"]
        assert not got[5]["page_kept"] and got[5]["has_brace"]

    def test_quote_terminal_and_multi_sentence_lines(self, spark, tmp_path):
        pages = [
            # lines ending in a quote are kept; two sentences in one
            # line both count toward the 5-sentence floor
            '\n'.join(
                [
                    'he said "hello there everyone."',
                    "first sentence here. second sentence too.",
                    "one more good line.",
                    "and a final good line.",
                ]
            ),
        ]
        got = self._report(spark, tmp_path, pages)
        assert got[0]["n_kept_lines"] == 4
        assert got[0]["n_sentences"] == 5
        assert got[0]["page_kept"]


class TestThresholdSweep:
    """quality_threshold_sweep: selection curve over the gate score."""

    def test_monotone_and_anchored(self, spark, sf_dir):
        from jitsu_spark.operators.quality_filters import (
            quality_threshold_sweep,
        )
        from jitsu_spark.tables import load_table

        rows = sorted(
            quality_threshold_sweep(spark, sf_dir).collect(),
            key=lambda r: r.threshold,
        )
        total = load_table(spark, sf_dir, "documents").count()
        assert float(rows[0].threshold) == 0.0
        assert rows[0].n_docs == total and float(rows[0].doc_pct) == 1.0
        docs = [r.n_docs for r in rows]
        toks = [r.n_tokens for r in rows]
        assert docs == sorted(docs, reverse=True)
        assert toks == sorted(toks, reverse=True)

    def test_boundary_is_inclusive_ge(self, spark, sf_dir):
        """Survivors at threshold t are exactly the docs with
        sw_ratio micro-units >= t — the grid cell boundary includes
        its own value (integer arithmetic, no float drift)."""
        from jitsu_spark.operators.quality_filters import (
            _SW_MU,
            SWEEP_STEP_MU,
            quality_threshold_sweep,
        )
        from jitsu_spark.tables import load_table

        t_mu = 3 * SWEEP_STEP_MU  # threshold 0.06
        direct = (
            load_table(spark, sf_dir, "documents")
            .selectExpr(f"{_SW_MU} AS sw_mu")
            .where(f"sw_mu >= {t_mu}")
            .count()
        )
        swept = {
            float(r.threshold): r.n_docs
            for r in quality_threshold_sweep(spark, sf_dir).collect()
        }
        assert swept[0.06] == direct

    def test_zero_token_doc_kept_at_threshold_zero(self, spark, tmp_path):
        """A zero-token document has no stopword ratio; its score
        coalesces to 0 so threshold 0.00 keeps the WHOLE corpus
        (doc_pct == 1.0 exactly) instead of silently excluding it
        from every threshold row (round-10 review finding)."""
        from jitsu_spark.operators.quality_filters import (
            quality_threshold_sweep,
        )

        spark.createDataFrame(
            [
                (1, "the and of plenty stopwords here", 33),
                (2, "", 0),          # zero tokens
                (3, "   ", 3),       # whitespace only -> zero tokens
            ],
            "doc_id BIGINT, text STRING, n_chars BIGINT",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        rows = {
            float(r.threshold): r
            for r in quality_threshold_sweep(
                spark, str(tmp_path)
            ).collect()
        }
        assert rows[0.0].n_docs == 3
        assert float(rows[0.0].doc_pct) == 1.0
        # the empty docs carry a 0 score: any positive threshold drops them
        assert rows[0.02].n_docs == 1


class TestCharEntropy:
    def test_known_values_and_boilerplate_ordering(self, spark, tmp_path):
        """Entropy pins: a single repeated char has H=0; a uniform
        2-char string has H=ln 2; repetitive boilerplate scores below
        natural-looking text. Empty docs drop out (no char rows)."""
        import math

        spark.createDataFrame(
            [
                (1, "aaaaaaaa", 8),
                (2, "abababab", 8),
                (3, "the quick brown fox jumps over the lazy dogs", 45),
                (4, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaabbbbb", 45),
                (5, "", 0),
            ],
            "doc_id BIGINT, text STRING, n_chars BIGINT",
        ).write.parquet(str(tmp_path / "documents.parquet"))
        from jitsu_spark.operators.quality_filters import (
            char_entropy_report,
        )

        rows = {
            r.doc_id: r
            for r in char_entropy_report(spark, str(tmp_path)).collect()
        }
        assert set(rows) == {1, 2, 3, 4}  # empty doc has no char rows
        assert rows[1].entropy_nats == 0.0
        assert rows[1].n_distinct_chars == 1
        assert rows[2].entropy_nats == round(math.log(2), 4)
        # same length, same alphabet size ordering: boilerplate < prose
        assert rows[4].entropy_nats < rows[3].entropy_nats
        assert rows[3].n_chars_text == len(
            "the quick brown fox jumps over the lazy dogs"
        )
