"""IVF-PQ serving index (`jitsu_spark/operators/pq.py`): byte-coded
cells + ADC scoring + exact refine. No SQL oracle (k-means training is
iterative); the contract is the recall floor vs exact cosine top-k, the
store shape, and the plan/scan audits."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def pq_store(spark, sf_dir, tmp_path_factory):
    from jitsu_spark.operators.pq import build_ivfpq_store

    store = str(tmp_path_factory.mktemp("pq") / "store")
    build_ivfpq_store(spark, sf_dir, store)
    return store


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def _unit_q(spark, sf_dir, limit=None):
    from pyspark.sql import functions as F

    from jitsu_spark.operators.pq import unit_queries
    from jitsu_spark.operators.similarity import _with_norm
    from jitsu_spark.tables import load_table

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    if limit is not None:
        emb = emb.where(F.col("vec_id") < limit)
    return unit_queries(emb)


class TestStoreShape:
    def test_codes_are_m_bytes_per_vector(self, spark, sf_dir, pq_store):
        from jitsu_spark.operators.pq import PQ_KSUB

        from jitsu_spark.tables import load_table

        cells = spark.read.parquet(pq_store + "/cells")
        emb = load_table(spark, sf_dir, "embeddings")
        n_corpus = emb.count()
        dim = len(emb.first().embedding)
        assert cells.count() == n_corpus  # every vector encoded once
        row = cells.first()
        # m adapts to the dimension (dsub ~ 8) and codes stay in-range
        from jitsu_spark.operators.pq import _default_m

        assert len(row.codes) == _default_m(dim)
        assert all(0 <= c < PQ_KSUB for c in row.codes)

    def test_pq_codebooks_complete(self, spark, sf_dir, pq_store):
        from jitsu_spark.operators.pq import PQ_KSUB, _default_m
        from jitsu_spark.tables import load_table

        dim = len(load_table(spark, sf_dir, "embeddings").first().embedding)
        pq = spark.read.parquet(pq_store + "/pq_codebooks")
        assert pq.count() == _default_m(dim) * PQ_KSUB

    def test_cells_partitioned_by_centroid(self, spark, pq_store):
        import os

        parts = [
            d
            for d in os.listdir(pq_store + "/cells")
            if d.startswith("centroid_id=")
        ]
        assert len(parts) > 1  # multiple prunable cell partitions


class TestQuery:
    def test_refined_recall_floor(self, spark, sf_dir, pq_store):
        from jitsu_spark.operators.pq import ann_ivfpq_topk_stored
        from jitsu_spark.operators.similarity import cosine_topk_bruteforce

        exact = _pairs(cosine_topk_bruteforce(spark, sf_dir))
        approx = _pairs(ann_ivfpq_topk_stored(spark, sf_dir, pq_store))
        assert len(approx) > 0
        recall = len(exact & approx) / len(exact)
        # measured 0.48 at sf0.01 with refine=4 — the nprobe=3/16 float
        # IVF ceiling is ~0.46 on this near-uniform corpus, so the
        # refine step fully recovers the float index's recall
        assert recall >= 0.3, f"PQ+refine recall {recall:.2f} too low"

    def test_refine_beats_pure_adc(self, spark, sf_dir, pq_store):
        from jitsu_spark.operators.pq import ann_ivfpq_topk_stored
        from jitsu_spark.operators.similarity import cosine_topk_bruteforce

        exact = _pairs(cosine_topk_bruteforce(spark, sf_dir))
        adc = _pairs(
            ann_ivfpq_topk_stored(spark, sf_dir, pq_store, refine_factor=0)
        )
        refined = _pairs(ann_ivfpq_topk_stored(spark, sf_dir, pq_store))
        assert len(exact & refined) >= len(exact & adc)

    def test_query_deterministic(self, spark, sf_dir, pq_store):
        from jitsu_spark.operators.pq import ann_ivfpq_topk_stored

        a = ann_ivfpq_topk_stored(spark, sf_dir, pq_store).collect()
        b = ann_ivfpq_topk_stored(spark, sf_dir, pq_store).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_probed_scan_is_partition_pruned(self, spark, sf_dir, pq_store):
        """The cell scan must carry the probe list as a partition filter
        — a query touches nprobe/K of the files, not all of them."""
        from pyspark.sql import functions as F

        cells = spark.read.parquet(pq_store + "/cells").where(
            F.col("centroid_id").isin([0, 1, 2])
        )
        plan = cells._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "PartitionFilters" in plan
        assert "centroid_id" in plan.split("PartitionFilters", 1)[1][:200]


class TestBulkQueryPath:
    """`ann_ivfpq_topk_bulk` — the distributed table-build + cogrouped
    scoring swap for large query sets. Contract: identical results to the
    driver-side stored path for the same queries, full coverage when the
    whole corpus queries itself, and a plan that scores via cogroup (no
    Q-sized broadcast)."""

    def _unit_queries(self, spark, sf_dir, limit=None):
        return _unit_q(spark, sf_dir, limit)

    def test_bulk_matches_stored_path_exactly(self, spark, sf_dir, pq_store):
        """Full-tuple parity (ids AND sims): guaranteed by construction —
        both paths share `_probe_cells_pq`, `_adc_table_block`, and
        `_refine_exact`, so identical rounding, not dataset luck."""
        from jitsu_spark.operators.pq import (
            ann_ivfpq_topk_bulk,
            ann_ivfpq_topk_stored,
        )
        from jitsu_spark.operators.similarity import N_QUERIES

        stored = sorted(
            map(tuple, ann_ivfpq_topk_stored(spark, sf_dir, pq_store).collect())
        )
        bulk = sorted(
            map(
                tuple,
                ann_ivfpq_topk_bulk(
                    spark,
                    sf_dir,
                    pq_store,
                    self._unit_queries(spark, sf_dir, limit=N_QUERIES),
                ).collect(),
            )
        )
        assert bulk == stored

    def test_full_corpus_self_join_covers_every_query(
        self, spark, sf_dir, pq_store
    ):
        from pyspark.sql import functions as F

        from jitsu_spark.operators.pq import TOP_K, ann_ivfpq_topk_bulk
        from jitsu_spark.tables import load_table

        n = load_table(spark, sf_dir, "embeddings").count()
        out = ann_ivfpq_topk_bulk(
            spark, sf_dir, pq_store, self._unit_queries(spark, sf_dir)
        )
        per_q = out.groupBy("query_id").count()
        stats = per_q.agg(
            F.count(F.lit(1)).alias("nq"),
            F.min("count").alias("mn"),
            F.max("count").alias("mx"),
        ).collect()[0]
        assert stats.nq == n  # every vector got an answer
        assert stats.mx <= TOP_K
        assert stats.mn >= 1
        # no self-matches
        assert out.where(F.col("query_id") == F.col("neighbor_id")).count() == 0

    def test_scoring_is_cogrouped_not_broadcast(self, spark, sf_dir, pq_store):
        from jitsu_spark.operators.pq import ann_ivfpq_topk_bulk

        df = ann_ivfpq_topk_bulk(
            spark, sf_dir, pq_store, self._unit_queries(spark, sf_dir)
        )
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "FlatMapCoGroupsInPandas" in plan

    def test_per_cell_pruning_is_lossless(self, spark, sf_dir, pq_store):
        """refine_factor=0 pure-ADC ranking from the bulk path equals the
        stored path's pure-ADC ranking — the per-cell top-C cut keeps
        every global survivor."""
        from jitsu_spark.operators.pq import (
            ann_ivfpq_topk_bulk,
            ann_ivfpq_topk_stored,
        )
        from jitsu_spark.operators.similarity import N_QUERIES

        stored = _pairs(
            ann_ivfpq_topk_stored(spark, sf_dir, pq_store, refine_factor=0)
        )
        bulk = _pairs(
            ann_ivfpq_topk_bulk(
                spark,
                sf_dir,
                pq_store,
                self._unit_queries(spark, sf_dir, limit=N_QUERIES),
                refine_factor=0,
            )
        )
        assert bulk == stored


class TestSaltedCogroup:
    def test_bucket_count_invariance(self, spark, sf_dir, pq_store):
        """The query-hash salt is a pure parallelism/memory knob: any
        bucket count yields identical results (a query's tables all land
        in one bucket, so per-cell pruning stays lossless)."""
        from jitsu_spark.operators.pq import ann_ivfpq_topk_bulk
        from jitsu_spark.operators.similarity import N_QUERIES

        outs = []
        for buckets in (1, 5):
            q = _unit_q(spark, sf_dir, limit=N_QUERIES)
            outs.append(
                sorted(
                    map(
                        tuple,
                        ann_ivfpq_topk_bulk(
                            spark,
                            sf_dir,
                            pq_store,
                            q,
                            query_salt_buckets=buckets,
                        ).collect(),
                    )
                )
            )
        assert outs[0] == outs[1]


class TestSaltSizing:
    def test_buckets_scale_with_query_count(self):
        from jitsu_spark.operators.pq import (
            SALT_MAX_BUCKETS,
            salt_buckets_for,
        )

        assert salt_buckets_for(10) == 1  # interactive: no replication
        assert salt_buckets_for(2_000) == 1  # sf0.1 corpus self-join
        assert salt_buckets_for(20_000) == 4
        assert salt_buckets_for(1_000_000) == SALT_MAX_BUCKETS
        assert salt_buckets_for(None) == 8  # unknown Q -> safe middle


class TestExcludeSelf:
    def test_self_matches_kept_when_disabled(self, spark, sf_dir, pq_store):
        """exclude_self=False: a query whose id collides with a corpus
        vec_id keeps that vector as a legitimate neighbor (it IS its own
        nearest, sim ~1.0) — the external-query-set contract."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.pq import ann_ivfpq_topk_bulk

        q = _unit_q(spark, sf_dir, limit=5)
        out = ann_ivfpq_topk_bulk(
            spark, sf_dir, pq_store, q, exclude_self=False
        )
        selfs = out.where(F.col("query_id") == F.col("neighbor_id"))
        got = {r.query_id: r.sim for r in selfs.collect()}
        assert set(got) == {0, 1, 2, 3, 4}
        assert all(abs(s - 1.0) < 1e-3 for s in got.values())


class TestLloydMemory:
    def test_train_at_cap_under_memory_ceiling(self):
        """Training at PQ_TRAIN_MAX_SAMPLE with d=256, k=16 must stay
        within ~1 GB beyond the sample itself: the retired broadcast form
        materialized an (n, k, d) float64 temp (~3.3 GB/iteration) — an
        OOM on a normal 8-16 GB driver exactly when the cap engages.
        Runs in a subprocess so other tests' high-water marks can't mask
        a regression."""
        import subprocess
        import sys

        script = r"""
import resource
import numpy as np
import sys
sys.path.insert(0, ".")
from jitsu_spark.operators.pq import PQ_TRAIN_MAX_SAMPLE, _lloyd
rng = np.random.default_rng(0)
sample = rng.standard_normal((PQ_TRAIN_MAX_SAMPLE, 256))
before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
centers = _lloyd(sample, 16, 3, seed=7)
after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
assert centers.shape == (16, 256)
delta_mb = (after - before) / 1024.0  # ru_maxrss is KB on linux
assert delta_mb < 1024, f"_lloyd grew rss by {delta_mb:.0f} MB"
print(f"ok delta={delta_mb:.0f}MB")
"""
        proc = subprocess.run(
            [sys.executable, "-c", script],
            capture_output=True,
            text=True,
            cwd=".",
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr
        assert "ok" in proc.stdout

    def test_lloyd_seeded_deterministic(self):
        import numpy as np

        from jitsu_spark.operators.pq import _lloyd

        rng = np.random.default_rng(1)
        sample = rng.standard_normal((500, 16))
        a = _lloyd(sample, 8, 5, seed=3)
        b = _lloyd(sample, 8, 5, seed=3)
        assert (a == b).all()

    def test_pairwise_d2_matches_naive(self):
        """GEMM expansion equals the naive broadcast form to float
        tolerance (argmin ties aside, which the synthetic corpus lacks)."""
        import numpy as np

        from jitsu_spark.operators.pq import _pairwise_d2

        rng = np.random.default_rng(2)
        x = rng.standard_normal((100, 32))
        c = rng.standard_normal((7, 32))
        naive = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        got = _pairwise_d2(x, c)
        assert np.allclose(got, naive, atol=1e-9)
        assert (got.argmin(axis=1) == naive.argmin(axis=1)).all()


class TestRecallReport:
    def test_full_probe_recovers_exact_and_default_is_partial(
        self, spark, sf_dir
    ):
        from jitsu_spark.operators.pq import pq_recall_report
        from jitsu_spark.operators.similarity import N_QUERIES, NPROBE, TOP_K

        row = pq_recall_report(spark, sf_dir).collect()[0]
        assert row.n_queries == N_QUERIES
        assert (row.top_k, row.nprobe) == (TOP_K, NPROBE)
        # full probe removes probe loss; the remaining gap is shortlist
        # quantization loss (near-uniform corpus, d=64/m=8 — measured
        # 0.76 at this SF; real clustered embeddings sit far higher)
        assert row.recall_full_probe >= 0.7
        # partial probe trades recall for scan fraction — floor only:
        # ADC top-k is not monotone in probe count, so no hard
        # r_nprobe <= r_full ordering (round-9 ADVICE #5)
        assert row.recall_at_nprobe >= 0.2
        assert row.recall_floor_ok


class TestStoreMemo:
    def test_stat_failure_disables_memoization(self, tmp_path):
        from jitsu_spark.operators.pq import _dataset_key

        assert _dataset_key(str(tmp_path / "missing")) is None
        # a real dataset dir fingerprints to a concrete key
        p = tmp_path / "embeddings.parquet"
        p.write_bytes(b"x")
        key = _dataset_key(str(tmp_path))
        assert key is not None and key[1]


class TestApproxNearDups:
    """`embedding_near_dups_from_store`: the sub-quadratic ANN swap for
    the exact all-pairs near-dup op. At full probe depth every
    above-threshold pair whose members rank each other top-k must
    surface; recall vs the exact op is pinned."""

    def test_recall_vs_exact_at_full_probe(self, spark, sf_dir, pq_store):
        from jitsu_spark.operators.pq import embedding_near_dups_from_store
        from jitsu_spark.operators.similarity import (
            DEFAULT_IVF_K,
            embedding_cosine_dups,
        )

        exact = {
            (r.vec_a, r.vec_b)
            for r in embedding_cosine_dups(spark, sf_dir).collect()
        }
        approx = {
            (r.vec_a, r.vec_b)
            for r in embedding_near_dups_from_store(
                spark, sf_dir, pq_store, nprobe=DEFAULT_IVF_K
            ).collect()
        }
        assert approx <= exact or not exact  # no false positives
        if exact:
            recall = len(approx & exact) / len(exact)
            assert recall >= 0.9, (recall, exact - approx)

    def test_pairs_are_canonical_and_unique(self, spark, sf_dir, pq_store):
        from pyspark.sql import functions as F

        from jitsu_spark.operators.pq import embedding_near_dups_from_store

        out = embedding_near_dups_from_store(spark, sf_dir, pq_store)
        assert out.where(F.col("vec_a") >= F.col("vec_b")).count() == 0
        assert (
            out.groupBy("vec_a", "vec_b").count().where("count > 1").count()
            == 0
        )


class TestStoreAppend:
    """`append_to_ivfpq_store`: FAISS add() — encode new batches with the
    stored codebooks, no retrain, findable on the next probe."""

    def _new_batch(self, spark, sf_dir, n=8, offset=10_000_000):
        import numpy as np

        from jitsu_spark.tables import load_table

        base = load_table(spark, sf_dir, "embeddings").limit(n).collect()
        rng = np.random.default_rng(11)
        rows = []
        for r in base:
            v = np.array(r["embedding"], dtype=np.float64)
            v = v + rng.normal(0, 0.01, size=v.shape)
            rows.append((int(r["vec_id"]) + offset, [float(x) for x in v]))
        return rows

    def test_append_matches_independent_numpy_encode(
        self, spark, sf_dir, tmp_path
    ):
        import numpy as np

        from jitsu_spark.operators.pq import (
            _load_centers_map,
            _load_pq_books,
            _pq_dirs,
            append_to_ivfpq_store,
            build_ivfpq_store,
        )
        from jitsu_spark.operators.similarity import _load_codebook

        store = str(tmp_path / "store")
        build_ivfpq_store(spark, sf_dir, store)
        cells_path = _pq_dirs(store)["cells"]
        n_before = spark.read.parquet(cells_path).count()

        rows = self._new_batch(spark, sf_dir)
        new_df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        append_to_ivfpq_store(spark, store, new_df)

        cells = spark.read.parquet(cells_path)
        assert cells.count() == n_before + len(rows)

        got = {
            r["vec_id"]: (r["centroid_id"], tuple(r["codes"]))
            for r in cells.where("vec_id >= 10000000").collect()
        }
        assert len(got) == len(rows)

        centers = _load_centers_map(_load_codebook(spark, store))
        books = _load_pq_books(spark, store)
        m, _, dsub = books.shape
        for vid, emb in rows:
            v = np.array(emb)
            u = v / np.linalg.norm(v)
            d2 = {
                cid: float(((u - c) ** 2).sum()) for cid, c in centers.items()
            }
            want_cell = min(d2, key=lambda c: (d2[c], c))
            res = u - centers[want_cell]
            want_codes = tuple(
                int(
                    (
                        (res[j * dsub : (j + 1) * dsub] - books[j]) ** 2
                    ).sum(axis=1).argmin()
                )
                for j in range(m)
            )
            assert got[vid] == (want_cell, want_codes), vid

    def test_zero_norm_vectors_are_surfaced_not_eaten(
        self, spark, sf_dir, tmp_path
    ):
        """r6 advice: the old boundary filter silently dropped zero-norm
        vectors, so the FAISS-add caller could not detect loss. Default
        errors with the vec_ids; 'skip' reports them and the cell count
        reconciles with the returned 'appended'."""
        import pytest

        from jitsu_spark.operators.pq import (
            _pq_dirs,
            append_to_ivfpq_store,
            build_ivfpq_store,
        )

        store = str(tmp_path / "store")
        build_ivfpq_store(spark, sf_dir, store)
        cells_path = _pq_dirs(store)["cells"]
        n_before = spark.read.parquet(cells_path).count()

        rows = self._new_batch(spark, sf_dir, n=4)
        dim = len(rows[0][1])
        rows_with_zero = rows + [(20_000_001, [0.0] * dim)]
        new_df = spark.createDataFrame(
            rows_with_zero, "vec_id long, embedding array<double>"
        )
        with pytest.raises(ValueError, match="20000001"):
            append_to_ivfpq_store(spark, store, new_df)
        # the failed call appended nothing
        assert spark.read.parquet(cells_path).count() == n_before

        report = append_to_ivfpq_store(
            spark, store, new_df, on_zero_norm="skip"
        )
        assert report == {
            "appended": len(rows),
            "dropped_zero_norm": [20_000_001],
        }
        assert (
            spark.read.parquet(cells_path).count()
            == n_before + report["appended"]
        )

    def test_appended_vectors_findable_end_to_end(self, spark, sf_dir, tmp_path):
        """Grow the corpus table alongside the index (the index-beside-
        table contract): bulk-probe with the new vectors as queries —
        each must surface ITSELF as top-1 with sim ~ 1 through the full
        probe/ADC/refine path."""
        import numpy as np

        from jitsu_spark.operators.pq import (
            append_to_ivfpq_store,
            ann_ivfpq_topk_bulk,
            build_ivfpq_store,
        )
        from jitsu_spark.tables import load_table

        store = str(tmp_path / "store")
        build_ivfpq_store(spark, sf_dir, store)
        rows = self._new_batch(spark, sf_dir, n=5)
        new_df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        append_to_ivfpq_store(spark, store, new_df)

        # corpus table including the appended raw vectors
        grown_dir = str(tmp_path / "grown")
        load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        ).unionByName(new_df).write.parquet(f"{grown_dir}/embeddings.parquet")

        queries = spark.createDataFrame(
            [
                (vid, [float(x) for x in np.array(v) / np.linalg.norm(v)])
                for vid, v in rows
            ],
            "query_id long, q array<double>",
        )
        top = ann_ivfpq_topk_bulk(
            spark, grown_dir, store, queries, exclude_self=False
        )
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id")
        )
        best = {
            r["query_id"]: (r["neighbor_id"], r["sim"])
            for r in top.withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .collect()
        }
        for vid, _ in rows:
            nb, sim = best[vid]
            assert nb == vid and sim >= 0.9999, (vid, nb, sim)


class TestOpq:
    def test_rotation_improves_and_is_orthonormal(self, spark, sf_dir):
        import numpy as np

        from jitsu_spark.operators.pq import (
            PQ_KSUB,
            _default_m,
            _opq_sample,
            train_opq,
        )

        sample = _opq_sample(spark, sf_dir)
        rot, books, errs = train_opq(
            sample, _default_m(sample.shape[1]), PQ_KSUB
        )
        # R stays orthogonal through every Procrustes update
        assert np.allclose(rot.T @ rot, np.eye(rot.shape[0]), atol=1e-8)
        # iteration 1 IS plain PQ (identity rotation); later iterations
        # only improve, and the final error beats the baseline by >= 5%
        assert all(b <= a + 1e-12 for a, b in zip(errs, errs[1:]))
        assert errs[-1] <= 0.95 * errs[0]
        # the returned (rot, books) pair is CONSISTENT: encoding under
        # the returned rotation reproduces exactly the reported final
        # error (r7 review finding — no post-fit rotation update)
        from jitsu_spark.operators.pq import _encode_decode

        xr = sample @ rot
        err = float(((xr - _encode_decode(xr, books)) ** 2).sum(axis=1).mean())
        assert err == errs[-1]

    def test_distributed_rotation_matches_driver(self, spark, sf_dir):
        import numpy as np

        from pyspark.sql import functions as F

        from jitsu_spark.operators.pq import apply_opq_rotation
        from jitsu_spark.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings").where(
            F.col("vec_id") < 20
        )
        rng = np.random.default_rng(7)
        q, _ = np.linalg.qr(rng.normal(size=(64, 64)))
        out = {
            r["vec_id"]: np.array(r["embedding"])
            for r in apply_opq_rotation(emb, q).collect()
        }
        for r in emb.select("vec_id", "embedding").collect():
            expect = np.array(r["embedding"], dtype=np.float64) @ q
            assert np.allclose(out[r["vec_id"]], expect, atol=1e-12)

    def test_training_is_deterministic(self, spark, sf_dir):
        import numpy as np

        from jitsu_spark.operators.pq import (
            PQ_KSUB,
            _default_m,
            _opq_sample,
            train_opq,
        )

        sample = _opq_sample(spark, sf_dir)
        m = _default_m(sample.shape[1])
        r1, b1, e1 = train_opq(sample, m, PQ_KSUB, iters=3)
        r2, b2, e2 = train_opq(sample, m, PQ_KSUB, iters=3)
        assert np.array_equal(r1, r2)
        assert np.array_equal(b1, b2)
        assert e1 == e2
