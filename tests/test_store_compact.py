"""Gate-store compaction (`operators/store_compact.py`): verdict
equality before/after, file-count reduction, partition layout
preservation, bloom coverage surviving the rewrite without a re-heal,
and the flat (unpartitioned) signature store."""

from __future__ import annotations

import pyspark.sql.functions as F

from jitsu_spark.operators import bloom as B
from jitsu_spark.operators import dedup as D
from jitsu_spark.operators.store_compact import compact_gate_store


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def _seed_fp_store(spark, store_dir, n_batches=4, per_batch=6):
    """Seed + append several micro-batches so every bucket holds
    multiple small files (the shape compaction exists for)."""
    for b in range(n_batches):
        docs = _docs(
            spark,
            [
                (b * 100 + i, f"content {b}-{i}")
                for i in range(per_batch)
            ],
        )
        v = D.fingerprint_verdicts(spark, docs, store_dir)
        D.append_fingerprints(spark, v, store_dir)


class TestFingerprintCompaction:
    def test_verdicts_equal_and_files_reduced(self, spark, tmp_path):
        store = str(tmp_path / "fp")
        _seed_fp_store(spark, store)
        probe = _docs(
            spark,
            [(900, "content 1-3"), (901, "content 2-0"), (902, "fresh")],
        )
        before = {
            (r.doc_id, r.verdict, r.canonical_id)
            for r in D.fingerprint_verdicts(spark, probe, store).collect()
        }
        n_before = len(B._store_data_files(spark, store))
        stats = compact_gate_store(spark, store)
        after = {
            (r.doc_id, r.verdict, r.canonical_id)
            for r in D.fingerprint_verdicts(spark, probe, store).collect()
        }
        assert after == before
        assert stats["files_before"] == n_before
        assert stats["files_after"] < stats["files_before"]
        # partition layout preserved: still bucket=N dirs, 1 file each
        files = B._store_data_files(spark, store)
        assert files and all(f.startswith("bucket=") for f in files)
        per_bucket: dict = {}
        for f in files:
            per_bucket.setdefault(f.split("/")[0], []).append(f)
        assert all(len(v) == 1 for v in per_bucket.values())

    def test_empty_store_noop(self, spark, tmp_path):
        stats = compact_gate_store(spark, str(tmp_path / "nostore"))
        assert stats == {"files_before": 0, "files_after": 0, "rows": 0}

    def test_replay_duplicate_rows_collapse(self, spark, tmp_path):
        """A crash-replayed append (identical rows twice) collapses to
        one copy under compaction's distinct — rows drop, verdicts
        hold."""
        store = str(tmp_path / "fp")
        docs = _docs(spark, [(1, "once"), (2, "twice")])
        v = D.fingerprint_verdicts(spark, docs, store)
        D.append_fingerprints(spark, v, store)
        D.append_fingerprints(spark, v, store)  # replay
        raw_rows = spark.read.parquet(store).count()
        stats = compact_gate_store(spark, store)
        assert raw_rows == 4 and stats["rows"] == 2
        got = {
            r.doc_id: r.verdict
            for r in D.fingerprint_verdicts(
                spark, _docs(spark, [(9, "twice"), (10, "new")]), store
            ).collect()
        }
        assert got == {9: "dup_of_corpus", 10: "new"}


class TestBloomCoverageSurvivesCompaction:
    def test_no_reheal_and_verdicts_identical(self, spark, tmp_path):
        store = str(tmp_path / "fp")
        bloom = str(tmp_path / "bloom")
        _seed_fp_store(spark, store, n_batches=3)

        probe = _docs(
            spark, [(900, "content 0-1"), (901, "entirely fresh")]
        )
        before = {
            (r.doc_id, r.verdict)
            for r in B.fingerprint_verdicts_bloom(
                spark, probe, store, bloom
            ).collect()
        }

        compact_gate_store(spark, store, bloom_dir=bloom)

        # coverage records exist for every current store file -> the
        # next load has NOTHING to heal: words dir file count unchanged
        words_before = set(B._store_data_files(spark, bloom + "/words"))
        covered = {
            r.file
            for r in spark.read.parquet(bloom + "/covered").collect()
        }
        assert set(B._store_data_files(spark, store)) <= covered
        B.load_bloom_healed(
            spark, store, bloom, keys_of=lambda df: df, col="text_hash"
        )
        assert set(B._store_data_files(spark, bloom + "/words")) == words_before

        stats: dict = {}
        after = {
            (r.doc_id, r.verdict)
            for r in B.fingerprint_verdicts_bloom(
                spark, probe, store, bloom, _stats=stats
            ).collect()
        }
        assert after == before
        # the stored dup still bloom-confirms; no false negative
        assert ("900", "dup_of_corpus") not in after  # type sanity
        assert {v for _, v in after} == {"dup_of_corpus", "new"}


class TestFlatSignatureStore:
    def test_unpartitioned_store_compacts_to_one_file(self, spark, tmp_path):
        store = str(tmp_path / "sig")
        corpus = _docs(
            spark,
            [(i, f"some shingled content body {i} with words") for i in range(8)],
        )
        D.build_signature_store(corpus, store)
        # a few appends -> several flat files
        for b in range(2):
            batch = _docs(
                spark,
                [(100 + b * 10 + i, f"fresh batch {b} doc {i} text body")
                 for i in range(3)],
            )
            v = D.near_dup_verdicts_against_store(
                batch, D.load_signature_store(spark, store)
            )
            D.append_signatures(v, batch, store)
        probe = _docs(
            spark,
            [(900, "some shingled content body 3 with words"),
             (901, "completely unrelated probe text here")],
        )
        before = {
            (r.doc_id, r.verdict)
            for r in D.near_dup_verdicts_against_store(
                probe, D.load_signature_store(spark, store)
            ).collect()
        }
        stats = compact_gate_store(spark, store)
        assert stats["files_after"] == 1 < stats["files_before"]
        after = {
            (r.doc_id, r.verdict)
            for r in D.near_dup_verdicts_against_store(
                probe, D.load_signature_store(spark, store)
            ).collect()
        }
        assert after == before


class TestBloomSummaryCompaction:
    def test_words_collapse_probe_invariant(self, spark, tmp_path):
        """Many appended words files collapse to one; every probe
        verdict (and the healed-load words themselves) are identical
        before and after."""
        store = str(tmp_path / "fp")
        bloom = str(tmp_path / "bloom")
        _seed_fp_store(spark, store, n_batches=3)
        # several heals/appends -> several words files
        B.load_bloom_healed(
            spark, store, bloom, keys_of=lambda df: df, col="text_hash"
        )
        B.append_bloom(
            spark,
            spark.createDataFrame([("ab" * 16,)], "text_hash STRING"),
            bloom,
        )
        B.append_bloom(
            spark,
            spark.createDataFrame([("cd" * 16,)], "text_hash STRING"),
            bloom,
        )
        before_words = {
            (r.word_idx, r.bits)
            for r in B._read_words(spark, bloom).collect()
        }
        probe = _docs(
            spark, [(900, "content 0-1"), (901, "never stored")]
        )
        before = {
            (r.doc_id, r.verdict)
            for r in B.fingerprint_verdicts_bloom(
                spark, probe, store, bloom
            ).collect()
        }
        from jitsu_spark.operators.store_compact import (
            compact_bloom_summary,
        )

        stats = compact_bloom_summary(spark, bloom)
        assert stats["words"]["files_after"] == 1
        assert stats["words"]["files_before"] > 1
        after_words = {
            (r.word_idx, r.bits)
            for r in B._read_words(spark, bloom).collect()
        }
        assert after_words == before_words
        after = {
            (r.doc_id, r.verdict)
            for r in B.fingerprint_verdicts_bloom(
                spark, probe, store, bloom
            ).collect()
        }
        assert after == before
        # params survived intact: same-width access still validates
        B._PARAMS_MEMO.clear()
        B.append_bloom(
            spark,
            spark.createDataFrame([("ef" * 16,)], "text_hash STRING"),
            bloom,
        )


class TestConcurrentWriterDuringCompaction:
    def test_raced_file_never_claimed_covered(
        self, spark, tmp_path, monkeypatch
    ):
        """A file appended by a concurrent writer in the worst window
        (after the pre-heal, before the coverage write) must NOT be
        recorded covered — its keys were never healed. The move list is
        the coverage record, so this holds structurally; the raced
        file heals on the NEXT load and its duplicates are still
        caught."""
        from jitsu_spark.operators import store_compact as SC

        store = str(tmp_path / "fp")
        bloom = str(tmp_path / "bloom")
        _seed_fp_store(spark, store, n_batches=2)

        raced = _docs(spark, [(700, "raced-in mid-compaction")])
        real_move_in = SC._move_in

        def racing_move_in(spark_, staging, store_dir):
            # the concurrent writer lands AFTER the pre-heal and the
            # old-files listing, BEFORE the coverage record
            v = D.fingerprint_verdicts(spark_, raced, store_dir)
            D.append_fingerprints(spark_, v, store_dir)
            return real_move_in(spark_, staging, store_dir)

        monkeypatch.setattr(SC, "_move_in", racing_move_in)
        SC.compact_gate_store(spark, store, bloom_dir=bloom)

        covered = {
            r.file
            for r in spark.read.parquet(bloom + "/covered").collect()
        }
        current = set(B._store_data_files(spark, store))
        uncovered = current - covered
        assert uncovered, "the raced file must be outside the coverage set"

        # next healed load ORs the raced file in (words grow) and the
        # duplicate of its content is still caught — no false negative
        words_before = set(B._store_data_files(spark, bloom + "/words"))
        dup = _docs(spark, [(800, "raced-in mid-compaction")])
        got = {
            r.doc_id: r.verdict
            for r in B.fingerprint_verdicts_bloom(
                spark, dup, store, bloom
            ).collect()
        }
        assert got == {800: "dup_of_corpus"}
        assert set(B._store_data_files(spark, bloom + "/words")) > words_before
