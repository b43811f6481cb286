"""Semantic pins for paragraph-level dedup (operators/paragraphs.py):
corpus-wide first-occurrence election, within-doc repeats, all-boilerplate
drop-out, ordered rebuild, and the source-overlap matrix. Oracle parity is
covered by tools/check_oracle.py; these pin the semantics on hand-built
corpora where the expected output is known by construction."""

from __future__ import annotations

import pytest

from jitsu_spark.operators.paragraphs import (
    PAR_WORDS,
    paragraph_dedup_docs,
    paragraph_dup_stats,
    source_overlap_matrix,
)


def _block(word: str) -> str:
    """One full paragraph window made of a single repeated word."""
    return " ".join([word] * PAR_WORDS)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


P, Q, R = _block("alpha"), _block("bravo"), _block("carol")


class TestParagraphDedup:
    def test_first_occurrence_wins_across_docs(self, spark, tmp_path):
        sf = _write_docs(
            spark,
            tmp_path,
            [
                (1, f"{P} {Q}", "a"),  # P first here (doc 1, pidx 0)
                (2, f"{P} {R}", "a"),  # P repeats -> only R survives
            ],
        )
        out = {
            r["doc_id"]: r for r in paragraph_dedup_docs(spark, sf).collect()
        }
        assert out[1]["text_deduped"] == f"{P} {Q}"
        assert out[1]["n_pars"] == 2 and out[1]["n_pars_kept"] == 2
        assert out[2]["text_deduped"] == R
        assert out[2]["n_pars"] == 2 and out[2]["n_pars_kept"] == 1

    def test_within_doc_repeat_keeps_first(self, spark, tmp_path):
        sf = _write_docs(spark, tmp_path, [(1, f"{P} {P} {Q}", "a")])
        out = paragraph_dedup_docs(spark, sf).collect()[0]
        assert out["text_deduped"] == f"{P} {Q}"
        assert out["n_pars"] == 3 and out["n_pars_kept"] == 2

    def test_all_boilerplate_doc_drops_out(self, spark, tmp_path):
        sf = _write_docs(
            spark, tmp_path, [(1, P, "a"), (2, P, "a")]
        )
        out = {
            r["doc_id"]: r for r in paragraph_dedup_docs(spark, sf).collect()
        }
        assert 1 in out and 2 not in out

    def test_rebuild_preserves_paragraph_order(self, spark, tmp_path):
        # doc 2 keeps pidx 0 and 2 (its pidx 1 = P repeats doc 1's);
        # rebuild must emit them in original order, not election order
        sf = _write_docs(
            spark, tmp_path, [(1, P, "a"), (2, f"{Q} {P} {R}", "a")]
        )
        out = {
            r["doc_id"]: r for r in paragraph_dedup_docs(spark, sf).collect()
        }
        assert out[2]["text_deduped"] == f"{Q} {R}"

    def test_partial_tail_window_is_its_own_paragraph(self, spark, tmp_path):
        # a trailing sub-window paragraph ("alpha alpha" != full P) is a
        # distinct paragraph and survives
        tail = "alpha alpha"
        sf = _write_docs(spark, tmp_path, [(1, f"{P} {tail}", "a")])
        out = paragraph_dedup_docs(spark, sf).collect()[0]
        assert out["n_pars"] == 2 and out["n_pars_kept"] == 2
        assert out["text_deduped"] == f"{P} {tail}"


class TestIncrementalGate:
    def test_store_paragraph_wins_regardless_of_doc_id(self, spark):
        """A store paragraph suppresses a batch occurrence even when the
        batch doc_id is smaller — store-first semantics, not min-id."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.paragraphs import (
            paragraph_gate_against_store,
        )

        batch = spark.createDataFrame(
            [
                (1, 0, P),  # in store -> stripped
                (1, 1, Q),  # fresh -> kept
                (5, 0, Q),  # batch repeat of doc 1's -> stripped
                (5, 1, R),  # fresh -> kept
            ],
            "doc_id long, pidx long, par string",
        )
        store = spark.createDataFrame([(P,)], "par string").select(
            F.md5("par").alias("par_hash")
        )
        out = {
            r["doc_id"]: r
            for r in paragraph_gate_against_store(batch, store).collect()
        }
        assert out[1]["text_deduped"] == Q
        assert out[1]["n_pars"] == 2 and out[1]["n_pars_kept"] == 1
        assert out[5]["text_deduped"] == R

    def test_batch_doc_fully_in_store_drops_out(self, spark):
        from pyspark.sql import functions as F

        from jitsu_spark.operators.paragraphs import (
            paragraph_gate_against_store,
        )

        batch = spark.createDataFrame(
            [(7, 0, P)], "doc_id long, pidx long, par string"
        )
        store = spark.createDataFrame([(P,)], "par string").select(
            F.md5("par").alias("par_hash")
        )
        assert paragraph_gate_against_store(batch, store).count() == 0


class TestStreamingParagraphGate:
    def _batch(self, spark, rows):
        import datetime as dt

        return spark.createDataFrame(
            [
                (i, t, "web", dt.datetime(2024, 5, 1, 12, 0, s))
                for s, (i, t) in enumerate(rows)
            ],
            "doc_id long, text string, source string,"
            " ingested_at timestamp",
        )

    def test_cross_batch_strip_and_replay_idempotent(self, spark, tmp_path):
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            process_paragraph_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        store = str(tmp_path / "pars")

        b1 = self._batch(spark, [(1, f"{P} {Q}")])
        b2 = self._batch(spark, [(2, f"{P} {R}"), (3, P)])

        process_paragraph_batch_durable(b1, store, sink)
        process_paragraph_batch_durable(b2, store, sink)
        rows = {
            r["doc_id"]: r for r in sink.read("corpus_stripped").collect()
        }
        # doc 1 kept whole; doc 2 stripped to R; doc 3 all-boilerplate
        assert rows[1]["text_deduped"] == f"{P} {Q}"
        assert rows[2]["text_deduped"] == R
        assert 3 not in rows

        # replay of batch 2 (at-least-once): everything already in the
        # store -> nothing merges, corpus unchanged
        process_paragraph_batch_durable(b2, store, sink)
        after = {
            r["doc_id"]: r["text_deduped"]
            for r in sink.read("corpus_stripped").collect()
        }
        assert after == {1: f"{P} {Q}", 2: R}

    def test_intra_batch_duplicate_delivery_counts_once(
        self, spark, tmp_path
    ):
        """A doc delivered twice within one micro-batch (at-least-once
        source) must not double its paragraph accounting."""
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            process_paragraph_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh3"))
        store = str(tmp_path / "pars3")
        b = self._batch(spark, [(1, f"{P} {Q}"), (1, f"{P} {Q}")])
        process_paragraph_batch_durable(b, store, sink)
        rows = sink.read("corpus_stripped").collect()
        assert len(rows) == 1
        assert rows[0]["n_pars"] == 2 and rows[0]["n_pars_kept"] == 2

    def test_seeded_store_strips_first_batch(self, spark, tmp_path):
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            build_paragraph_store,
            process_paragraph_batch_durable,
        )

        # seed from a batch corpus holding P
        spark.createDataFrame(
            [(100, P, "a")], "doc_id long, text string, source string"
        ).write.mode("overwrite").parquet(
            f"{tmp_path}/seed/documents.parquet"
        )
        store = str(tmp_path / "pars2")
        build_paragraph_store(spark, str(tmp_path / "seed"), store)

        sink = WarehouseSink(spark, str(tmp_path / "wh2"))
        process_paragraph_batch_durable(
            self._batch(spark, [(1, f"{P} {Q}")]), store, sink
        )
        rows = sink.read("corpus_stripped").collect()
        assert len(rows) == 1 and rows[0]["text_deduped"] == Q


class TestParagraphStats:
    def test_cross_source_dup_billed_to_repeater(self, spark, tmp_path):
        sf = _write_docs(
            spark,
            tmp_path,
            [
                (1, f"{P} {Q}", "a"),  # both first occurrences
                (2, f"{P} {R}", "b"),  # P is a's; R is first
            ],
        )
        out = {
            r["source"]: r for r in paragraph_dup_stats(spark, sf).collect()
        }
        assert out["a"]["n_paragraphs"] == 2
        assert out["a"]["n_dup_occurrences"] == 0
        assert out["b"]["n_paragraphs"] == 2
        assert out["b"]["n_first_occurrences"] == 1
        assert out["b"]["n_dup_occurrences"] == 1
        assert out["b"]["dup_ratio"] == pytest.approx(0.5)


class TestSourceOverlap:
    def test_pairwise_shared_counts_and_jaccard(self, spark, tmp_path):
        # a: {P, Q}  b: {P, R}  c: {R}
        sf = _write_docs(
            spark,
            tmp_path,
            [
                (1, f"{P} {Q}", "a"),
                (2, f"{P} {R}", "b"),
                (3, R, "c"),
            ],
        )
        out = {
            (r["s1"], r["s2"]): r
            for r in source_overlap_matrix(spark, sf).collect()
        }
        assert out[("a", "b")]["n_shared"] == 1
        # |a ∪ b| = 3 -> jaccard 1/3
        assert out[("a", "b")]["jaccard"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[("b", "c")]["n_shared"] == 1
        assert out[("b", "c")]["jaccard"] == pytest.approx(0.5)
        # zero-overlap pairs are absent (inner semantics)
        assert ("a", "c") not in out
        # pairs are emitted once, source-name ordered
        assert ("b", "a") not in out

    def test_duplicate_occurrences_counted_once(self, spark, tmp_path):
        # P appears twice in a and once in b: distinct-set overlap is 1
        sf = _write_docs(
            spark,
            tmp_path,
            [(1, f"{P} {P}", "a"), (2, f"{P} {Q}", "b")],
        )
        out = {
            (r["s1"], r["s2"]): r
            for r in source_overlap_matrix(spark, sf).collect()
        }
        assert out[("a", "b")]["n_shared"] == 1
        # |a|=1, |b|=2, union=2
        assert out[("a", "b")]["jaccard"] == pytest.approx(0.5)


class TestParagraphGateBloom:
    """The paragraph gate with the healed bloom summary: identical
    stripping to the plain gate, replay-idempotent, and a
    seeded-elsewhere store is covered by healing."""

    def _batch(self, spark, rows):
        import datetime as dt

        return spark.createDataFrame(
            [
                (i, t, "web", dt.datetime(2024, 5, 1, 12, 0, s))
                for s, (i, t) in enumerate(rows)
            ],
            "doc_id long, text string, source string,"
            " ingested_at timestamp",
        )

    def test_matches_plain_gate_and_replays(self, spark, tmp_path):
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            process_paragraph_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        store = str(tmp_path / "pars")
        bl = str(tmp_path / "bloom")

        b1 = self._batch(spark, [(1, f"{P} {Q}")])
        b2 = self._batch(spark, [(2, f"{P} {R}"), (3, P)])
        process_paragraph_batch_durable(
            b1, store, sink, bloom_summary_dir=bl
        )
        process_paragraph_batch_durable(
            b2, store, sink, bloom_summary_dir=bl
        )
        rows = {
            r["doc_id"]: r["text_deduped"]
            for r in sink.read("corpus_stripped").collect()
        }
        # identical to the plain gate: doc 1 whole, 2 stripped to R,
        # 3 all-boilerplate dropped
        assert rows == {1: f"{P} {Q}", 2: R}

        # replay (at-least-once): corpus unchanged
        process_paragraph_batch_durable(
            b2, store, sink, bloom_summary_dir=bl
        )
        after = {
            r["doc_id"]: r["text_deduped"]
            for r in sink.read("corpus_stripped").collect()
        }
        assert after == {1: f"{P} {Q}", 2: R}

    def test_heals_store_seeded_elsewhere(self, spark, tmp_path, sf_dir):
        """build_paragraph_store (a bloom-unaware writer) seeds the
        store; the bloom-enabled gate's first batch must still strip
        the seeded boilerplate (healing covers the seed files)."""
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            process_paragraph_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        store = str(tmp_path / "pars")
        bl = str(tmp_path / "bloom")
        import pyspark.sql.functions as F

        spark.createDataFrame([(P,)], "par string").select(
            F.md5("par").alias("par_hash")
        ).withColumn("bucket", F.lit(0)).write.partitionBy(
            "bucket"
        ).parquet(store)

        b = self._batch(spark, [(9, f"{P} {Q}")])
        process_paragraph_batch_durable(
            b, store, sink, bloom_summary_dir=bl
        )
        rows = {
            r["doc_id"]: r["text_deduped"]
            for r in sink.read("corpus_stripped").collect()
        }
        assert rows == {9: Q}


class TestNewlineSplitter:
    """split_mode='newline' (r11): the production splitter — split on
    '\\n', trim, drop empties, pidx = original line index — and the
    newline registry entry's equivalence to the window entry."""

    def test_trim_empty_drop_and_pidx(self, spark):
        from jitsu_spark.operators.paragraphs import paragraphs_of_docs

        docs = spark.createDataFrame(
            [(1, "  first par \n\n second par\n   \nthird")],
            "doc_id long, text string",
        )
        rows = sorted(
            (r.pidx, r.par)
            for r in paragraphs_of_docs(docs, "newline").collect()
        )
        # blanks (line 1 and the whitespace-only line 3) drop; indices
        # keep the ORIGINAL line positions so rebuild order survives
        assert rows == [(0, "first par"), (2, "second par"), (4, "third")]

    def test_unknown_mode_raises(self, spark):
        from jitsu_spark.operators.paragraphs import paragraphs_of_docs

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="split_mode"):
            paragraphs_of_docs(docs, "sentences")

    def test_newline_entry_matches_window_entry(self, spark, sf_dir):
        """The newline fixture is the window paragraphs re-joined with
        '\\n', so the two entries elect the SAME survivors: equal
        (doc_id, n_pars, n_pars_kept) and equal texts modulo
        separator."""
        from jitsu_spark.operators.paragraphs import (
            paragraph_dedup_docs,
            paragraph_dedup_newline,
        )

        win = {
            r.doc_id: (r.n_pars, r.n_pars_kept, r.text_deduped)
            for r in paragraph_dedup_docs(spark, sf_dir).collect()
        }
        nl = {
            r.doc_id: (r.n_pars, r.n_pars_kept, r.text_deduped)
            for r in paragraph_dedup_newline(spark, sf_dir).collect()
        }
        assert win.keys() == nl.keys() and len(win) > 0
        for d, (np_w, nk_w, t_w) in win.items():
            np_n, nk_n, t_n = nl[d]
            assert (np_w, nk_w) == (np_n, nk_n)
            assert t_n.replace("\n", " ") == t_w

    def test_durable_gate_newline_mode(self, spark, tmp_path):
        """The streaming paragraph gate strips with the production
        splitter when split_mode='newline': stored paragraphs win, the
        rebuild re-joins with '\\n'."""
        from jitsu_spark.operators.paragraphs import (
            PAR_SEP,
            paragraph_gate_against_store,
            paragraphs_of_docs,
        )

        batch = spark.createDataFrame(
            [(10, "shared boiler\nfresh body ten"),
             (11, "fresh body eleven\nshared boiler\nfresh body eleven")],
            "doc_id long, text string",
        )
        store = spark.createDataFrame(
            [("shared boiler",)], "par string"
        ).selectExpr("md5(par) AS par_hash")
        got = {
            r.doc_id: (r.n_pars, r.n_pars_kept, r.text_deduped)
            for r in paragraph_gate_against_store(
                paragraphs_of_docs(batch, "newline"),
                store,
                PAR_SEP["newline"],
            ).collect()
        }
        assert got[10] == (2, 1, "fresh body ten")
        # within-batch repeat of 'fresh body eleven' keeps first only
        assert got[11] == (3, 1, "fresh body eleven")
