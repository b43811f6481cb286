"""Incremental near-dup gate (operators/dedup.py round 7): minhash
signature store probed by new batches — python-reference parity, disk
store roundtrip with append, and the audited join direction."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _python_reference(store_sig, new_sig, n_hashes, bands, rows_per_band,
                      threshold):
    """Independent reimplementation: band collision -> component
    agreement -> best candidate -> verdict."""
    import hashlib

    def band_keys(sig):
        out = []
        for b in range(bands):
            key = "_".join(
                str(sig[f"h{j}"])
                for j in range(b * rows_per_band, (b + 1) * rows_per_band)
            )
            out.append((b, hashlib.md5(key.encode()).hexdigest()))
        return out

    store_buckets = {}
    for r in store_sig:
        for bk in band_keys(r):
            store_buckets.setdefault(bk, set()).add(r["doc_id"])
    store_by_id = {r["doc_id"]: r for r in store_sig}
    want = {}
    for r in new_sig:
        cands = set()
        for bk in band_keys(r):
            cands |= store_buckets.get(bk, set())
        best = None
        for sid in sorted(cands):
            s = store_by_id[sid]
            est = sum(
                1 for j in range(n_hashes) if s[f"h{j}"] == r[f"h{j}"]
            ) / float(n_hashes)
            if best is None or est > best[1]:
                best = (sid, est)
        if best is None:
            want[r["doc_id"]] = ("new", None, None)
        else:
            verdict = (
                "near_dup_of_corpus" if best[1] >= threshold else "new"
            )
            want[r["doc_id"]] = (verdict, best[0], round(best[1], 4))
    return want


class TestNearDupGate:
    def test_matches_python_reference(self, spark):
        from jitsu_spark.operators.dedup import (
            BANDS,
            NEAR_DUP_EST_THRESHOLD,
            NEW_CRAWL_BUCKET_GE,
            NUM_HASHES,
            ROWS_PER_BAND,
            _shingles_of,
            _signatures_from_shingles,
            near_dup_gate_incremental,
        )
        from jitsu_spark.operators.sampling import _bucket
        from jitsu_spark.tables import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, SF_DIR, "documents")
        b = _bucket(F.col("doc_id"))
        store_sig = _signatures_from_shingles(
            _shingles_of(docs.where(b < NEW_CRAWL_BUCKET_GE))
        ).collect()
        new_sig = _signatures_from_shingles(
            _shingles_of(docs.where(b >= NEW_CRAWL_BUCKET_GE))
        ).collect()
        want = _python_reference(
            store_sig, new_sig, NUM_HASHES, BANDS, ROWS_PER_BAND,
            NEAR_DUP_EST_THRESHOLD,
        )
        got = {
            r["doc_id"]: (r["verdict"], r["matched_id"], r["est_jaccard"])
            for r in near_dup_gate_incremental(spark, SF_DIR).collect()
        }
        assert got == want and len(got) > 0

    def test_store_roundtrip_and_append(self, spark, tmp_path):
        """Disk store: probe verdicts equal the in-plan form; after
        appending the batch's 'new' signatures, re-probing the SAME
        batch matches every previously-new doc to itself at est 1.0."""
        from jitsu_spark.operators.dedup import (
            NEW_CRAWL_BUCKET_GE,
            append_signatures,
            build_signature_store,
            load_signature_store,
            near_dup_verdicts_against_store,
        )
        from jitsu_spark.operators.sampling import _bucket
        from jitsu_spark.tables import load_table
        from pyspark.sql import functions as F

        docs = load_table(spark, SF_DIR, "documents")
        b = _bucket(F.col("doc_id"))
        store_dir = str(tmp_path / "sigstore")
        build_signature_store(docs.where(b < NEW_CRAWL_BUCKET_GE), store_dir)
        new_docs = docs.where(b >= NEW_CRAWL_BUCKET_GE)
        v1 = near_dup_verdicts_against_store(
            new_docs, load_signature_store(spark, store_dir)
        )
        rows1 = {r["doc_id"]: r for r in v1.collect()}
        assert rows1 and {"new", "near_dup_of_corpus"} >= {
            r["verdict"] for r in rows1.values()
        }
        append_signatures(v1, new_docs, store_dir)
        v2 = near_dup_verdicts_against_store(
            new_docs, load_signature_store(spark, store_dir)
        )
        for r in v2.collect():
            prev = rows1[r["doc_id"]]
            if prev["verdict"] == "new":
                # its own signature is now stored: an exact match wins —
                # itself, or the min-id member of its identical-signature
                # group when several batch docs shared a signature (the
                # gate checks batch-vs-store only, so equal batch docs
                # were all 'new' and all appended)
                assert r["verdict"] == "near_dup_of_corpus"
                assert r["est_jaccard"] == 1.0
                assert r["matched_id"] <= r["doc_id"]

    def test_store_streams_batch_broadcasts(self, spark):
        from jitsu_spark.operators.dedup import near_dup_gate_incremental

        plan = near_dup_gate_incremental(spark, SF_DIR)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "Cartesian" not in plan and "NestedLoop" not in plan


class TestStreamingNearGate:
    """The durable streaming gate composed with the near-dup signature
    store: exact dups AND near-dups of ingested content are dropped
    across batches; replay stays idempotent."""

    GOOD = (
        "the data pipeline processes a table of events and the result "
        "lands in a warehouse with a schema to query and the numbers "
        "stay the same for every run of the job and the report is ready"
    )

    def _batch(self, spark, rows):
        import datetime as dt

        return spark.createDataFrame(
            [
                (i, t, "web", dt.datetime(2024, 5, 1, 12, 0, s))
                for s, (i, t) in enumerate(rows)
            ],
            "doc_id long, text string, source string, ingested_at timestamp",
        )

    def test_near_dups_dropped_across_batches(self, spark, tmp_path):
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            gate_expr,
            process_gated_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        fp, sig = str(tmp_path / "fp"), str(tmp_path / "sig")

        near_variant = self.GOOD + " indeed"   # 1 extra word: near, not exact
        far_text = (
            "completely different content about machine learning models "
            "and the training corpus with tokens and vectors and layers "
            "plus gradients and batches and steps until the loss converges "
            "and the metrics look stable for the final evaluation run of "
            "the model on the held out set"
        )
        b1 = self._batch(spark, [(1, self.GOOD)]).where(gate_expr())
        b2 = self._batch(
            spark,
            [(2, self.GOOD), (3, near_variant), (4, far_text)],
        ).where(gate_expr())

        process_gated_batch_durable(b1, fp, sink, signature_store_dir=sig)
        process_gated_batch_durable(b2, fp, sink, signature_store_dir=sig)
        docs = {r.doc_id for r in sink.read("corpus").collect()}
        # 2 is an exact dup of 1, 3 a NEAR dup of 1, 4 genuinely new
        assert docs == {1, 4}

        # replay of batch 2 (at-least-once): corpus unchanged
        process_gated_batch_durable(b2, fp, sink, signature_store_dir=sig)
        assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 4}

    def test_without_signature_store_near_dups_pass(self, spark, tmp_path):
        """Control: the exact-only gate admits the near variant —
        proving the drop above comes from the signature gate."""
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            gate_expr,
            process_gated_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh2"))
        fp = str(tmp_path / "fp2")
        near_variant = self.GOOD + " indeed"
        b1 = self._batch(spark, [(1, self.GOOD)]).where(gate_expr())
        b2 = self._batch(spark, [(3, near_variant)]).where(gate_expr())
        process_gated_batch_durable(b1, fp, sink)
        process_gated_batch_durable(b2, fp, sink)
        assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 3}


class TestGateReviewRegressions:
    """Round-7 review findings: sub-3-token docs must pass the composed
    gate (absence from the near verdicts is not a rejection), and a
    crash between the signature and fingerprint appends must not open a
    window that admits later near-duplicates."""

    GOOD = TestStreamingNearGate.GOOD

    def _batch(self, spark, rows):
        import datetime as dt

        return spark.createDataFrame(
            [
                (i, t, "web", dt.datetime(2024, 5, 1, 12, 0, s))
                for s, (i, t) in enumerate(rows)
            ],
            "doc_id long, text string, source string, ingested_at timestamp",
        )

    def test_short_doc_survives_composed_gate(self, spark, tmp_path):
        """A doc with < 3 tokens has no shingles and no near-verdict
        row; the composed gate must still ingest it (exact gate only),
        not silently drop it."""
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            process_gated_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        fp, sig = str(tmp_path / "fp"), str(tmp_path / "sig")
        # NOTE: deliberately NOT filtered by gate_expr — the function is
        # the public foreachBatch API and must be safe standalone
        b = self._batch(spark, [(1, "two tokens"), (2, self.GOOD)])
        process_gated_batch_durable(b, fp, sink, signature_store_dir=sig)
        assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 2}
        # and an exact replay of the short doc is still deduplicated
        process_gated_batch_durable(
            self._batch(spark, [(3, "two tokens")]),
            fp,
            sink,
            signature_store_dir=sig,
        )
        assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 2}

    def test_crash_between_appends_blocks_later_near_dups(
        self, spark, tmp_path
    ):
        """Simulate the crash window: corpus MERGEd + signatures
        appended, fingerprints NOT. The replay must stay idempotent and
        later near-dups of the batch's content must still be rejected."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.dedup import (
            append_signatures,
            load_signature_store,
            near_dup_verdicts_against_store,
        )
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            process_gated_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        fp, sig = str(tmp_path / "fp"), str(tmp_path / "sig")
        b = self._batch(spark, [(1, self.GOOD)])

        # crash-window state: corpus has the doc, signature store has
        # its signature, fingerprint store does not exist yet
        sink.upsert(
            b.withColumn("content_hash", F.md5("text")),
            "corpus",
            primary_key=["content_hash"],
            timestamp_col="ingested_at",
        )
        empty_store = spark.range(0).selectExpr(
            "id AS doc_id",
            *[
                f"CAST(NULL AS LONG) AS h{j}"
                for j in range(
                    __import__(
                        "jitsu_spark.operators.dedup", fromlist=["NUM_HASHES"]
                    ).NUM_HASHES
                )
            ],
        )
        verdicts = near_dup_verdicts_against_store(
            b.select("doc_id", "text"), empty_store
        )
        append_signatures(verdicts, b.select("doc_id", "text"), sig)

        # replay the batch through the real gate: no duplicates, no crash
        process_gated_batch_durable(b, fp, sink, signature_store_dir=sig)
        assert {r.doc_id for r in sink.read("corpus").collect()} == {1}

        # a later NEAR duplicate is rejected by the signature store
        near = self._batch(spark, [(9, self.GOOD + " indeed")])
        process_gated_batch_durable(near, fp, sink, signature_store_dir=sig)
        assert {r.doc_id for r in sink.read("corpus").collect()} == {1}

    def test_replay_backfills_fingerprints_for_exact_only_callers(
        self, spark, tmp_path
    ):
        """r8 review fix: after the crash window (corpus MERGEd +
        signatures appended, fingerprints absent), the replay must
        BACKFILL the exact fingerprints — otherwise an exact-only
        caller sharing the fingerprint store admits exact duplicates
        of corpus content forever."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.dedup import (
            NUM_HASHES,
            append_signatures,
            near_dup_verdicts_against_store,
        )
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            process_gated_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        fp, sig = str(tmp_path / "fp"), str(tmp_path / "sig")
        b = self._batch(spark, [(1, self.GOOD)])

        # crash-window state (as in the test above)
        sink.upsert(
            b.withColumn("content_hash", F.md5("text")),
            "corpus",
            primary_key=["content_hash"],
            timestamp_col="ingested_at",
        )
        empty_store = spark.range(0).selectExpr(
            "id AS doc_id",
            *[f"CAST(NULL AS LONG) AS h{j}" for j in range(NUM_HASHES)],
        )
        verdicts = near_dup_verdicts_against_store(
            b.select("doc_id", "text"), empty_store
        )
        append_signatures(verdicts, b.select("doc_id", "text"), sig)

        # replay through the composed gate: fingerprints get backfilled
        process_gated_batch_durable(b, fp, sink, signature_store_dir=sig)
        stored = spark.read.parquet(fp)
        assert {r.canonical_id for r in stored.collect()} == {1}

        # an EXACT duplicate via an exact-only gate (no signature store)
        # sharing the fingerprint store is now rejected
        dup = self._batch(spark, [(7, self.GOOD)])
        process_gated_batch_durable(dup, fp, sink)
        assert {r.doc_id for r in sink.read("corpus").collect()} == {1}

    def test_genuinely_new_near_dup_is_not_backfilled(
        self, spark, tmp_path
    ):
        """Control: a near-dup of OTHER stored content (its own doc_id
        absent from the signature store) must NOT get a fingerprint —
        its content is not in the corpus."""
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.streaming.corpus_gate import (
            process_gated_batch_durable,
        )

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        fp, sig = str(tmp_path / "fp"), str(tmp_path / "sig")
        b1 = self._batch(spark, [(1, self.GOOD)])
        process_gated_batch_durable(b1, fp, sink, signature_store_dir=sig)
        near = self._batch(spark, [(5, self.GOOD + " indeed")])
        process_gated_batch_durable(near, fp, sink, signature_store_dir=sig)
        stored = spark.read.parquet(fp)
        assert {r.canonical_id for r in stored.collect()} == {1}
