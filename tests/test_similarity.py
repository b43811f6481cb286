"""Semantic (non-oracle) checks for the similarity family: the oracle proves
Spark==DuckDB on the same algorithm; these prove the algorithm itself is
sane (recall, self-consistency)."""

from __future__ import annotations


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from jitsu_spark.operators.similarity import (
        ann_ivf_topk,
        cosine_topk_bruteforce,
    )

    exact = _pairs(cosine_topk_bruteforce(spark, sf_dir))
    approx = _pairs(ann_ivf_topk(spark, sf_dir))
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    # The synthetic embeddings are ~uniform (no cluster structure), which is
    # IVF's worst case: nprobe=3 of ~13 cells scans ~23% of the corpus.
    # Require recall well above that scan fraction to prove the probe order
    # is doing real work (measured ~0.46 on this data).
    assert recall >= 0.35, f"IVF recall {recall:.2f} too low"


class TestZeroNormBoundary:
    """`_with_norm` drops zero-norm vectors by construction (they have no
    cosine direction; their NaN scores ordered differently across the
    argbest fold, the windowed twins, and DuckDB)."""

    def test_zero_vector_excluded_everywhere(self, spark, tmp_path):
        rows = [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 0.0], 1),  # degenerate: no direction
            (3, [0.0, 1.0], 1),
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        from jitsu_spark.operators.similarity import (
            _with_norm,
            cosine_topk_bruteforce,
        )
        from jitsu_spark.tables import load_table

        emb = load_table(spark, str(tmp_path), "embeddings")
        assert _with_norm(emb).count() == 3
        assert _with_norm(emb, drop_zero=False).count() == 4
        out = cosine_topk_bruteforce(spark, str(tmp_path))
        ids = {r.query_id for r in out.collect()} | {
            r.neighbor_id for r in out.collect()
        }
        assert 2 not in ids  # neither queries nor candidates
        # no NaN sims anywhere
        assert all(r.sim == r.sim for r in out.collect())

    def test_zero_norm_centroid_dropped_from_pack(self, spark):
        from pyspark.sql import functions as F

        from jitsu_spark.operators.similarity import _packed_centroids

        cents = spark.createDataFrame(
            [(0, [1.0, 0.0], 1.0), (1, [0.0, 0.0], 0.0)],
            "centroid_id int, c_emb array<double>, c_norm double",
        )
        packed = _packed_centroids(cents).collect()[0]["cents"]
        assert [c["centroid_id"] for c in packed] == [0]


class TestRegistryIvfFixedK:
    """The oracle-checked `ann_ivf_topk` must be scale-safe too: its
    centroid side is exactly IVF_ORACLE_K rows (a constant, independent
    of corpus size) and the assignment join broadcasts that O(K) side —
    the corpus never shuffles against it. (Round-3 stride centroids made
    K = N/40, an O(N^2/40) assignment; retired this round.)"""

    def test_centroid_count_is_constant_k(self, spark, sf_dir):
        from jitsu_spark.operators.similarity import (
            IVF_ORACLE_K,
            _fixed_k_centroids,
            _with_norm,
        )
        from jitsu_spark.tables import load_table

        emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
        assert _fixed_k_centroids(emb).count() == IVF_ORACLE_K

    def test_centroid_filter_independent_of_corpus_size(self, spark, sf_dir):
        """Shrinking the corpus must not shrink K's *definition*: the
        centroid predicate is `vec_id < K`, not a function of N."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.similarity import (
            IVF_ORACLE_K,
            _fixed_k_centroids,
            _with_norm,
        )
        from jitsu_spark.tables import load_table

        emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
        half = emb.where(F.col("vec_id") % 2 == 0)
        # same K-bound predicate regardless of input cardinality
        assert _fixed_k_centroids(half).count() <= IVF_ORACLE_K
        assert (
            _fixed_k_centroids(emb)
            .where(F.col("centroid_id") >= IVF_ORACLE_K)
            .count()
            == 0
        )

    def test_assignment_broadcasts_centroid_side(self, spark, sf_dir):
        from jitsu_spark.operators.similarity import (
            _assignments,
            _fixed_k_centroids,
            _with_norm,
        )
        from jitsu_spark.tables import load_table

        emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
        plan = (
            _assignments(emb, _fixed_k_centroids(emb))
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
        # map-side argbest fold: the corpus must not be window-shuffled
        # (the pre-fold form exchanged and sorted N*K scored rows)
        assert "Window" not in plan
        assert "Exchange hashpartitioning" not in plan


def test_lsh_recall_vs_jaccard(spark, sf_dir):
    from jitsu_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_dups

    jac = {(r.doc_a, r.doc_b) for r in ngram_jaccard_dups(spark, sf_dir).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, sf_dir).collect()}
    if jac:
        recall = len(jac & lsh) / len(jac)
        assert recall >= 0.8, f"LSH recall {recall:.2f} too low"


def test_lsh_recall_report_sampled_truth(spark, sf_dir, monkeypatch):
    """Above the size threshold the report's ground truth runs on a
    deterministic md5-bucket doc sample with candidates restricted to
    sampled pairs — the sampled report must equal the full report
    recomputed over exactly those sampled docs."""
    from pyspark.sql import functions as F

    import jitsu_spark.operators.dedup as dd
    from jitsu_spark.operators.sampling import _bucket

    monkeypatch.setattr(dd, "TRUTH_FULL_MAX_DOCS", 0)  # force sampled path
    got = dd.lsh_recall_report(spark, sf_dir).collect()[0]

    in_sample = lambda c: _bucket(c) < dd.TRUTH_SAMPLE_PER_MILLE  # noqa: E731
    truth = (
        dd.ngram_jaccard_dups(spark, sf_dir)
        .where(in_sample(F.col("doc_a")) & in_sample(F.col("doc_b")))
        .select("doc_a", "doc_b")
    )
    cand = dd.minhash_lsh_pairs(spark, sf_dir).where(
        in_sample(F.col("doc_a")) & in_sample(F.col("doc_b"))
    )
    n_true = truth.count()
    n_cand = cand.count()
    n_hits = truth.join(cand, ["doc_a", "doc_b"]).count()
    assert (got.n_true, got.n_candidates, got.n_hits) == (n_true, n_cand, n_hits)
    # estimates live in [0, 1] (null only if the sample has no true pairs)
    if n_true:
        assert 0.0 <= got.recall <= 1.0


class TestSimhashNearDups:
    def test_banded_pairs_equal_bruteforce(self, spark, sf_dir):
        """The pigeonhole claim: the banded self-join finds EXACTLY the
        pairs a quadratic popcount scan finds (python reference over the
        collected fingerprints)."""
        from jitsu_spark.operators.dedup import (
            SIMHASH_HAMMING_MAX,
            simhash,
            simhash_hamming_pairs,
        )

        fp = {
            r["doc_id"]: r["simhash"]
            for r in simhash(spark, sf_dir).collect()
        }
        ids = sorted(fp)
        want = {
            (a, b, bin(fp[a] ^ fp[b]).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if bin(fp[a] ^ fp[b]).count("1") <= SIMHASH_HAMMING_MAX
        }
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_hamming_pairs(simhash(spark, sf_dir)).collect()
        }
        assert got == want and len(got) > 0

    def test_no_cartesian_product(self, spark, sf_dir):
        from jitsu_spark.operators.dedup import simhash_near_dups

        plan = simhash_near_dups(spark, sf_dir)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Cartesian" not in plan and "NestedLoop" not in plan

    def test_wider_fingerprint_constants(self, spark):
        """The production 64-bit/<=3/4-band configuration runs through
        the same code path (synthetic fingerprints, python-checked)."""
        from jitsu_spark.operators.dedup import simhash_hamming_pairs

        rows = [
            (1, 0x0123456789ABCD00),
            (2, 0x0123456789ABCD01),  # hamming 1 from doc 1
            (3, 0x0123456789ABCD07),  # hamming 2 from doc 2, 3 from doc 1
            (4, 0x7FFFFFFFFFFFFFFF),
        ]
        fp = spark.createDataFrame(rows, "doc_id long, simhash long")
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash_hamming_pairs(
                fp, n_bits=64, max_hamming=3, n_bands=4
            ).collect()
        }
        assert got == {(1, 2): 1, (1, 3): 3, (2, 3): 2}


def test_default_df_cap_regimes(sf_dir):
    """Below DF_CAP_MIN_DOCS the corpus-derived cap is None — the exact,
    oracle-checked regime test SF must stay in."""
    import jitsu_spark.operators.dedup as dd

    assert dd._default_df_cap(sf_dir) is None  # test SF: 500 docs


def test_default_df_cap_floor_and_scale(sf_dir, monkeypatch):
    import jitsu_spark.operators.dedup as dd
    from jitsu_spark.operators import similarity as sim

    monkeypatch.setattr(dd, "DF_CAP_MIN_DOCS", 100)
    assert dd._default_df_cap(sf_dir) == 1  # 500 docs -> floor of 1

    monkeypatch.setattr(sim, "_corpus_rows", lambda *a, **k: 50_000_000)
    assert dd._default_df_cap(sf_dir) == 50_000  # 0.1% of N

    monkeypatch.setattr(sim, "_corpus_rows", lambda *a, **k: None)
    assert dd._default_df_cap(sf_dir) is None  # non-parquet fallback


def test_knn_self_exclusion(spark, sf_dir):
    from jitsu_spark.operators.similarity import cosine_topk_bruteforce

    for r in cosine_topk_bruteforce(spark, sf_dir).collect():
        assert r.query_id != r.neighbor_id
        assert -1.0001 <= r.sim <= 1.0001


def test_kmeans_centroids_beat_fixed_k_sampling(spark, sf_dir):
    """Refined centroids must not quantize worse than the deterministic
    fixed-K sample: mean distance-to-nearest-centroid (the k-means
    objective) should drop."""
    from pyspark.sql import functions as F

    from jitsu_spark.operators.similarity import (
        IVF_ORACLE_K,
        DOT,
        kmeans_centroids,
    )
    from jitsu_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")

    def mean_sq_dist(centroids):
        d2 = (
            f"{DOT.format(a='embedding', b='embedding')} "
            f"- 2 * {DOT.format(a='embedding', b='c_emb')} "
            f"+ {DOT.format(a='c_emb', b='c_emb')}"
        )
        scored = emb.crossJoin(F.broadcast(centroids)).withColumn(
            "d2", F.expr(d2)
        )
        return (
            scored.groupBy("vec_id")
            .agg(F.min("d2").alias("best"))
            .agg(F.avg("best"))
            .first()[0]
        )

    fixed = emb.where(F.col("vec_id") < IVF_ORACLE_K).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
    )
    refined = kmeans_centroids(emb, k=IVF_ORACLE_K, max_iter=5)
    assert refined.count() == IVF_ORACLE_K
    assert mean_sq_dist(refined) <= mean_sq_dist(fixed) * 1.001


class TestBlockGridBound:
    """embedding_cosine_dups per-task memory: the block count must grow
    with the corpus so a packed block never exceeds MAX_BLOCK_ROWS
    (expected) vectors — at any N."""

    def test_n_blocks_bounds_rows_per_block(self):
        from jitsu_spark.operators.similarity import (
            MAX_BLOCK_ROWS,
            N_BLOCKS_MIN,
            _n_blocks,
        )

        for n in (0, 1, 1000, MAX_BLOCK_ROWS, 10**6, 10**8, 10**10):
            blocks = _n_blocks(n)
            assert blocks >= N_BLOCKS_MIN
            # expected rows per block bounded at any corpus size
            assert n / blocks <= MAX_BLOCK_ROWS

    def test_n_blocks_monotonic(self):
        from jitsu_spark.operators.similarity import _n_blocks

        sizes = [10**k for k in range(3, 11)]
        got = [_n_blocks(n) for n in sizes]
        assert got == sorted(got)

    def test_packed_blocks_respect_bound_on_data(self, spark, sf_dir, monkeypatch):
        """With the bound forced tiny, the actual packed rows stay near it
        and results are unchanged (coverage is partition-independent)."""
        import jitsu_spark.operators.similarity as sim

        base = {
            (r.vec_a, r.vec_b, r.sim)
            for r in sim.embedding_cosine_dups(spark, sf_dir).collect()
        }
        monkeypatch.setattr(sim, "MAX_BLOCK_ROWS", 50)
        monkeypatch.setattr(sim, "N_BLOCKS_MIN", 8)
        small = {
            (r.vec_a, r.vec_b, r.sim)
            for r in sim.embedding_cosine_dups(spark, sf_dir).collect()
        }
        assert small == base


class TestStoredIvf:
    def test_stored_probe_consistent_and_prunes(self, spark, sf_dir, tmp_path):
        """Serving-path contract: fixed-K codebook persisted with the
        cells; probing the store reproduces exactly what searching the
        same cells in-memory with the same codebook yields; the probe
        list reaches the store scan as a dynamic partition filter."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.similarity import (
            N_QUERIES,
            _load_codebook,
            _probe_cells,
            _search_cells,
            _with_norm,
            ann_ivf_topk_stored,
            build_ivf_store,
        )
        from jitsu_spark.tables import load_table

        store = str(tmp_path / "ivf_store")
        build_ivf_store(spark, sf_dir, store, k=8)
        stored = ann_ivf_topk_stored(spark, sf_dir, store)
        got = {
            (r["query_id"], r["neighbor_id"], r["sim"]) for r in stored.collect()
        }

        emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
        centroids = _load_codebook(spark, store)
        queries = emb.where(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm").alias("q_norm"),
        )
        cells = spark.read.parquet(store + "/cells")
        expect = {
            (r["query_id"], r["neighbor_id"], r["sim"])
            for r in _search_cells(
                cells, _probe_cells(queries, centroids)
            ).collect()
        }
        assert got == expect and len(got) > 0
        # the probe list must reach the store scan as a partition filter
        plan = stored._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        scan_lines = [
            l for l in plan.splitlines() if "PartitionFilters" in l
        ]
        assert any("dynamicpruning" in l for l in scan_lines), scan_lines

    def test_codebook_is_fixed_k_independent_of_corpus(self, spark, sf_dir, tmp_path):
        """The round-2 scale bug: stride centroids made K = N/40. The
        serving codebook must be exactly the configured K no matter the
        corpus size, and the assignment pass must broadcast the O(K)
        centroid side (never shuffle the corpus against it)."""
        from jitsu_spark.operators.similarity import (
            _assignments,
            _load_codebook,
            _with_norm,
            build_ivf_store,
        )
        from jitsu_spark.tables import load_table

        store = str(tmp_path / "ivf_k")
        build_ivf_store(spark, sf_dir, store, k=8)
        assert spark.read.parquet(store + "/codebook").count() == 8

        emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
        plan = _assignments(emb, _load_codebook(spark, store))._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


class TestBinaryQuantization:
    def test_codes_match_sign_pattern(self, spark, tmp_path):
        """Crafted vector: bits set exactly where the component is > 0."""
        from jitsu_spark.operators.similarity import _binary_codes

        vec = [(1.0 if i % 3 == 0 else -1.0) for i in range(64)]
        vec[10] = 0.0  # zero is NOT positive -> bit clear
        emb = spark.createDataFrame(
            [(0, vec)], "vec_id long, embedding array<float>"
        )
        row = _binary_codes(emb).first()
        expect_lo = sum(
            1 << i for i in range(32) if vec[i] > 0
        )
        expect_hi = sum(
            1 << (i - 32) for i in range(32, 64) if vec[i] > 0
        )
        assert row["code_lo"] == expect_lo
        assert row["code_hi"] == expect_hi

    def test_identical_vector_is_hamming_zero_rank_one(self, spark, tmp_path):
        from jitsu_spark.operators.similarity import binary_hamming_topk

        base = [float(((i * 7) % 5) - 2) or 1.0 for i in range(64)]
        other = [-v for v in base]
        rows = [(0, base), (100, list(base)), (101, other), (102, other)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        out = binary_hamming_topk(spark, str(tmp_path)).toPandas()
        top = out[(out.query_id == 0) & (out["rank"] == 1)].iloc[0]
        assert top.neighbor_id == 100 and top.hamming == 0

    def test_shortlist_recall_floor(self, spark, sf_dir):
        """64-bit sign codes as a FIRST-STAGE filter: a Hamming top-50
        shortlist retains >= 50% of the exact cosine top-5 (0.7 measured;
        random baseline is ~10%). The serving pattern is shortlist ->
        float rerank, so shortlist recall is the metric that matters."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.similarity import (
            N_QUERIES,
            _binary_codes,
            cosine_topk_bruteforce,
        )
        from jitsu_spark.tables import load_table

        codes = _binary_codes(load_table(spark, sf_dir, "embeddings"))
        q = codes.where(F.col("vec_id") < N_QUERIES).selectExpr(
            "vec_id AS query_id", "code_lo AS q_lo", "code_hi AS q_hi"
        )
        ham = (
            codes.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
            .selectExpr(
                "query_id",
                "vec_id",
                "bit_count(code_lo ^ q_lo) + bit_count(code_hi ^ q_hi)"
                " AS hamming",
            )
            .toPandas()
        )
        cos = cosine_topk_bruteforce(spark, sf_dir).toPandas()
        truth = cos.groupby("query_id").neighbor_id.apply(set)
        recalls = []
        for qid, g in ham.groupby("query_id"):
            short = set(g.nsmallest(50, ["hamming", "vec_id"]).vec_id)
            recalls.append(len(short & truth[qid]) / len(truth[qid]))
        assert sum(recalls) / len(recalls) >= 0.5


class TestSimhashNegativePrints:
    def test_sign_bit_prints_still_pair(self, spark):
        """64-bit fingerprints with the sign bit set (negative BIGINT)
        must band-join against positive prints sharing band bits — the
        div/% form returned negative band keys and silently missed them
        (r7 review finding)."""
        from jitsu_spark.operators.dedup import simhash_hamming_pairs

        a = -(1 << 63) + 5  # sign bit set, low band bits 0b101
        b = 5               # positive, identical low bits -> hamming 1
        fp = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, simhash long"
        )
        out = simhash_hamming_pairs(
            fp, n_bits=64, max_hamming=3, n_bands=4
        ).collect()
        assert len(out) == 1 and out[0]["hamming"] == 1
