"""Bloom store-summary tests: exactness vs the unsummarized gate, the
no-false-negative guarantee, candidate pruning, the all-fresh scan
skip, heal-based coverage of stores written by OTHER paths, append
idempotence, and crash-window over-coverage."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from jitsu_spark.operators import bloom as B
from jitsu_spark.operators import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_gate_matches_unsummarized_verdicts(spark, sf_dir):
    """The registry entry's verdicts are bit-identical to running
    dedup.verdicts_against_store on the same store/batch split — the
    bloom is a pruning structure, never a semantics change."""
    from jitsu_spark.tables import load_table
    from jitsu_spark.operators.sampling import _bucket

    docs = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    store = (
        docs.where(b < B.STORE_MILLE)
        .select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    batch = docs.where(b >= B.STORE_MILLE).select("doc_id", "text")

    expect = {
        (r.doc_id, r.verdict, r.canonical_id)
        for r in D.verdicts_against_store(batch, store).collect()
    }
    got_rows = B.bloom_dedup_gate(spark, sf_dir).collect()
    got = {(r.doc_id, r.verdict, r.canonical_id) for r in got_rows}
    assert got == expect and len(got_rows) == len(expect)


def test_no_false_negatives(spark, sf_dir):
    """Every dup_of_corpus verdict must be bloom_candidate — a stored
    hash always has all K bits set."""
    rows = B.bloom_dedup_gate(spark, sf_dir).collect()
    assert rows, "empty gate output"
    for r in rows:
        if r.verdict == "dup_of_corpus":
            assert r.bloom_candidate


def test_bloom_prunes_fresh_content(spark):
    """Content absent from the store is (overwhelmingly, at these
    parameters) bloom-negative: the confirm join's probe side shrinks.
    With m=2^17, k=5 and a tiny store the fp probability is ~0, so the
    assertion is deterministic in practice."""
    store = _docs(spark, [(i, f"stored text {i}") for i in range(50)])
    batch = _docs(
        spark, [(100 + i, f"fresh text {i}") for i in range(40)]
    ).select("doc_id", F.md5("text").alias("text_hash"))
    words = B.bloom_words(
        store.select(F.md5("text").alias("text_hash"))
    )
    probed = B.bloom_probe(batch, words)
    n_cand = probed.where("bloom_candidate").count()
    assert n_cand == 0
    assert probed.count() == 40


def _seed_store(spark, corpus, store_dir):
    fp = (
        corpus.select("doc_id", F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("canonical_id"))
    )
    fp.withColumn(
        "bucket",
        F.pmod(
            F.conv(F.substring("text_hash", 1, 2), 16, 10).cast("int"),
            F.lit(D.FP_PREFIX_BUCKETS),
        ),
    ).write.partitionBy("bucket").mode("overwrite").parquet(store_dir)


def test_durable_verdicts_match_and_skip_scan(spark, tmp_path):
    """fingerprint_verdicts_bloom == fingerprint_verdicts on a mixed
    batch — with NO pre-seeded summary (the healed loader self-seeds
    from the store's files); an all-fresh batch then skips the store."""
    store_dir = str(tmp_path / "fp")
    bloom_dir = str(tmp_path / "bloom")
    _seed_store(
        spark, _docs(spark, [(i, f"seed doc {i}") for i in range(30)]),
        store_dir,
    )

    # mixed batch: 2 corpus dups, 1 intra-batch dup pair, 2 fresh
    batch = _docs(
        spark,
        [
            (100, "seed doc 3"),
            (101, "seed doc 7"),
            (102, "same new text"),
            (103, "same new text"),
            (104, "totally fresh"),
        ],
    )
    stats: dict = {}
    got = {
        (r.doc_id, r.verdict)
        for r in B.fingerprint_verdicts_bloom(
            spark, batch, store_dir, bloom_dir, _stats=stats
        ).collect()
    }
    expect = {
        (r.doc_id, r.verdict)
        for r in D.fingerprint_verdicts(spark, batch, store_dir).collect()
    }
    assert got == expect
    assert stats["store_scanned"] and stats["n_candidates"] == 2

    # all-fresh batch: zero candidates -> the store is never read
    fresh = _docs(spark, [(200 + i, f"unseen {i}") for i in range(5)])
    stats = {}
    v = B.fingerprint_verdicts_bloom(
        spark, fresh, store_dir, bloom_dir, _stats=stats
    )
    assert stats == {"store_scanned": False, "n_candidates": 0}
    assert {r.verdict for r in v.collect()} == {"new"}


def test_heals_store_written_by_other_paths(spark, tmp_path):
    """THE review scenario: the store gains content through a path the
    summary never saw (here: a plain batch-ingest append AFTER the
    summary already exists). The healed loader must cover the delta —
    a duplicate of the late content is caught, never admitted."""
    store_dir = str(tmp_path / "fp")
    bloom_dir = str(tmp_path / "bloom")
    _seed_store(spark, _docs(spark, [(1, "early content")]), store_dir)
    # first probe materializes the summary for the current store
    B.fingerprint_verdicts_bloom(
        spark, _docs(spark, [(50, "unrelated probe")]), store_dir, bloom_dir
    )

    # a BATCH ingest (plain dedup path, no bloom awareness) appends
    late = _docs(spark, [(2, "late bypass content")])
    D.append_fingerprints(
        spark, D.fingerprint_verdicts(spark, late, store_dir), store_dir
    )

    # duplicate of the bypass content: a trusted-stale summary would
    # answer 'new' (false negative); healing must answer dup_of_corpus
    dup = _docs(spark, [(3, "late bypass content")])
    stats: dict = {}
    v = {
        r.doc_id: r.verdict
        for r in B.fingerprint_verdicts_bloom(
            spark, dup, store_dir, bloom_dir, _stats=stats
        ).collect()
    }
    assert v == {3: "dup_of_corpus"}
    assert stats["n_candidates"] == 1


def test_prewarm_idempotent_and_crash_overcoverage(spark, tmp_path):
    """A replayed pre-warm append ORs the same bits (summary
    unchanged); bits for content whose store write never landed
    (crash window) only over-cover — the doc still reads 'new'."""
    store_dir = str(tmp_path / "fp")
    bloom_dir = str(tmp_path / "bloom")
    fp = spark.createDataFrame(
        [("deadbeef" * 4, 1)], "text_hash STRING, canonical_id BIGINT"
    )
    B.append_bloom(spark, fp, bloom_dir)
    once = {
        (r.word_idx, r.bits)
        for r in B._read_words(spark, bloom_dir).collect()
    }
    B.append_bloom(spark, fp, bloom_dir)  # replay
    twice = {
        (r.word_idx, r.bits)
        for r in B._read_words(spark, bloom_dir).collect()
    }
    assert once == twice

    # crash window: doc's bits are in the bloom, fingerprint never
    # landed (empty store dir). The doc must come back 'new'.
    doc = _docs(spark, [(9, "crashed mid-append")])
    B.append_bloom(
        spark, doc.select(F.md5("text").alias("text_hash")), bloom_dir
    )
    v = B.fingerprint_verdicts_bloom(spark, doc, store_dir, bloom_dir)
    assert [r.verdict for r in v.collect()] == ["new"]


def test_first_use_on_existing_store_self_seeds(spark, tmp_path, sf_dir):
    """No summary on disk + a pre-existing store -> the first load
    seeds the summary from the store and verdicts match the plain
    gate (the enable-bloom-later migration path)."""
    store_dir = str(tmp_path / "fp")
    D.build_fingerprint_store(spark, sf_dir, store_dir)
    from jitsu_spark.tables import load_table

    batch = load_table(spark, sf_dir, "documents").limit(5).select(
        "doc_id", "text"
    )
    stats: dict = {}
    got = {
        (r.doc_id, r.verdict)
        for r in B.fingerprint_verdicts_bloom(
            spark, batch, store_dir, str(tmp_path / "bloom"), _stats=stats
        ).collect()
    }
    expect = {
        (r.doc_id, r.verdict)
        for r in D.fingerprint_verdicts(spark, batch, store_dir).collect()
    }
    assert got == expect and stats["store_scanned"]


def test_durable_gate_with_bloom_exactly_once(spark, tmp_path):
    """The streaming gate with bloom_summary_dir: same corpus as the
    plain gate, exactly-once under replay, and the summary tracks the
    store across batches."""
    import datetime as dt

    from jitsu_spark.sinks import WarehouseSink
    from jitsu_spark.streaming.corpus_gate import process_gated_batch_durable

    def batch(rows):
        return spark.createDataFrame(
            [
                (i, t, "web", dt.datetime(2024, 5, 1, 12, 0, s))
                for s, (i, t) in enumerate(rows)
            ],
            "doc_id long, text string, source string,"
            " ingested_at timestamp",
        )

    sink = WarehouseSink(spark, str(tmp_path / "wh"))
    fp, bl = str(tmp_path / "fp"), str(tmp_path / "bloom")

    b1 = batch([(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    b2 = batch([(3, "alpha beta gamma"), (4, "fresh new content")])
    process_gated_batch_durable(b1, fp, sink, bloom_summary_dir=bl)
    process_gated_batch_durable(b2, fp, sink, bloom_summary_dir=bl)
    assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 2, 4}

    # at-least-once replay: corpus unchanged
    process_gated_batch_durable(b2, fp, sink, bloom_summary_dir=bl)
    assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 2, 4}

    # the healed summary covers the store: a dup-only batch is caught
    # via the bloom path and nothing new lands
    b3 = batch([(5, "fresh new content")])
    process_gated_batch_durable(b3, fp, sink, bloom_summary_dir=bl)
    assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 2, 4}


GOOD = (
    "the quick brown fox jumps over the lazy dog while the sun shines "
    "bright in the clear blue sky and the birds sing their morning songs "
    "to welcome a brand new day of adventures in the quiet forest"
)
FAR = (
    "completely different content about machine learning models and the "
    "training corpus with tokens and vectors and layers plus gradients "
    "and batches and steps until the loss converges and the metrics look "
    "stable for the final evaluation run of the model on the held out set"
)


def _sig_of(spark, docs):
    from jitsu_spark.operators.dedup import (
        _shingles_of,
        _signatures_from_shingles,
    )

    return _signatures_from_shingles(_shingles_of(docs))


def test_band_bloom_collision_guarantee(spark, tmp_path):
    """near_store_may_collide heals from the signature store itself:
    False for content sharing no band key with the store (the provable
    skip) even when the store was written with NO bloom awareness;
    True for a near variant of stored content."""
    sig_dir = str(tmp_path / "sig")
    bl = str(tmp_path / "nbloom")
    # signature store written by a plain (bloom-unaware) append
    _sig_of(spark, _docs(spark, [(1, GOOD)])).write.parquet(sig_dir)

    near = _sig_of(spark, _docs(spark, [(2, GOOD + " indeed")]))
    far = _sig_of(spark, _docs(spark, [(3, FAR)]))

    assert B.near_store_may_collide(spark, far, sig_dir, bl) is False
    assert B.near_store_may_collide(spark, near, sig_dir, bl) is True
    # exact replay of stored content collides on every band
    assert (
        B.near_store_may_collide(
            spark, _sig_of(spark, _docs(spark, [(1, GOOD)])), sig_dir, bl
        )
        is True
    )
    # bypass append AFTER the summary exists: healing must cover it
    _sig_of(spark, _docs(spark, [(9, FAR)])).write.mode("append").parquet(
        sig_dir
    )
    assert B.near_store_may_collide(spark, far, sig_dir, bl) is True


def test_composed_gate_with_near_bloom(spark, tmp_path):
    """The composed exact+near durable gate with BOTH bloom summaries:
    identical admissions to the unsummarized gate (near variant
    dropped, far text admitted), exactly-once under replay."""
    import datetime as dt

    from jitsu_spark.sinks import WarehouseSink
    from jitsu_spark.streaming.corpus_gate import process_gated_batch_durable

    def batch(rows):
        return spark.createDataFrame(
            [
                (i, t, "web", dt.datetime(2024, 5, 1, 12, 0, s))
                for s, (i, t) in enumerate(rows)
            ],
            "doc_id long, text string, source string,"
            " ingested_at timestamp",
        )

    sink = WarehouseSink(spark, str(tmp_path / "wh"))
    fp, sig = str(tmp_path / "fp"), str(tmp_path / "sig")
    bl, nbl = str(tmp_path / "bloom"), str(tmp_path / "nbloom")
    kw = dict(
        signature_store_dir=sig, bloom_summary_dir=bl, near_bloom_dir=nbl
    )

    b1 = batch([(1, GOOD)])
    b2 = batch([(2, GOOD), (3, GOOD + " indeed"), (4, FAR)])
    process_gated_batch_durable(b1, fp, sink, **kw)
    process_gated_batch_durable(b2, fp, sink, **kw)
    # 2 exact dup of 1, 3 near dup of 1, 4 genuinely new
    assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 4}

    # replay: corpus unchanged (healing + MERGE both idempotent)
    process_gated_batch_durable(b2, fp, sink, **kw)
    assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 4}

    # a later near variant of doc 4 is caught through the bloom path
    b3 = batch([(5, FAR + " truly")])
    process_gated_batch_durable(b3, fp, sink, **kw)
    assert {r.doc_id for r in sink.read("corpus").collect()} == {1, 4}


class TestBloomProperty:
    """Property check against an independent pure-Python bloom: the
    Spark probe's candidate bit must EQUAL the reference for arbitrary
    unicode content (not just no-false-negatives) — pinning the
    double-hash position math on both sides of the oracle."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _texts = st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",), max_codepoint=0x2FFF
            ),
            max_size=24,
        ),
        min_size=0,
        max_size=8,
        unique=True,
    )

    @staticmethod
    def _py_candidate(store_hashes: set, h: str) -> bool:
        bits = set()
        for s in store_hashes:
            h1, h2 = int(s[:12], 16), int(s[12:24], 16) * 2 + 1
            for i in range(B.K_HASH):
                bits.add((h1 + i * h2) % B.M_BITS)
        h1, h2 = int(h[:12], 16), int(h[12:24], 16) * 2 + 1
        return all(
            (h1 + i * h2) % B.M_BITS in bits for i in range(B.K_HASH)
        )

    @settings(max_examples=8, deadline=None)
    @given(store=_texts, batch=_texts)
    def test_probe_matches_python_reference(self, spark, store, batch):
        import hashlib

        if not batch:
            return
        md5 = lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
        store_h = {md5(t) for t in store}
        words = B.bloom_words(
            spark.createDataFrame(
                [(h,) for h in store_h] or [(None,)],
                "text_hash STRING",
            ).where("text_hash IS NOT NULL")
        )
        probed = B.bloom_probe(
            spark.createDataFrame(
                [(md5(t),) for t in batch], "text_hash STRING"
            ),
            words,
        )
        got = {r.text_hash: r.bloom_candidate for r in probed.collect()}
        expect = {md5(t): self._py_candidate(store_h, md5(t)) for t in batch}
        assert got == expect


def test_params_persisted_and_width_mismatch_raises(spark, tmp_path):
    """The durable summary records (m, k, word_bits) on first write and
    every later access validates against them: probing words built at
    one width with positions computed at another would produce REAL
    false negatives, so a mismatch is a loud error, never a silent
    reinterpretation."""
    bloom_dir = str(tmp_path / "bloom")
    fp = spark.createDataFrame(
        [("deadbeef" * 4,)], "text_hash STRING"
    )
    B.append_bloom(spark, fp, bloom_dir)
    params = spark.read.parquet(bloom_dir + "/params").collect()
    assert {(r.m_bits, r.k_hash, r.word_bits) for r in params} == {
        (B.M_BITS, B.K_HASH, B.WORD_BITS)
    }
    # replayed append: identical params row collapses, no error
    B.append_bloom(spark, fp, bloom_dir)
    # a different width against the same summary dir must raise
    with pytest.raises(ValueError, match="false negatives"):
        B.append_bloom(spark, fp, bloom_dir, m_bits=B.M_BITS * 2)
    with pytest.raises(ValueError, match="false negatives"):
        B.load_bloom_healed(
            spark, str(tmp_path / "nostore"), bloom_dir,
            keys_of=lambda df: df, k_hash=B.K_HASH + 1,
        )


def test_custom_width_roundtrip_no_false_negatives(spark):
    """bloom_words/bloom_probe honor a caller-sized (m, k): every
    stored key is a candidate at the custom width too (the guarantee is
    width-independent as long as build and probe agree)."""
    m, k = 1 << 12, 3
    store = _docs(spark, [(i, f"sized text {i}") for i in range(64)])
    hashes = store.select(F.md5("text").alias("text_hash"))
    words = B.bloom_words(hashes, m_bits=m, k_hash=k)
    assert words.count() <= -(-m // B.WORD_BITS)
    probed = B.bloom_probe(hashes, words, m_bits=m, k_hash=k)
    assert probed.where("NOT bloom_candidate").count() == 0


def test_store_listing_via_hadoop_fs(spark, tmp_path):
    """_store_data_files goes through the Hadoop FileSystem API (the
    listing spark.read resolves), returns store-relative paths, and []
    for a store that does not exist yet."""
    store_dir = str(tmp_path / "fp")
    assert B._store_data_files(spark, store_dir) == []
    spark.createDataFrame(
        [("ab" * 16, 1)], "text_hash STRING, canonical_id BIGINT"
    ).write.parquet(store_dir)
    files = B._store_data_files(spark, store_dir)
    assert files and all(f.endswith(".parquet") for f in files)
    assert all("/" not in f or not f.startswith("/") for f in files)
    # file:// scheme (an explicitly non-local-walk path) lists the same
    assert B._store_data_files(spark, "file://" + store_dir) == files
