"""ZCA whitening (`operators/embedding_prep.py`): the post-condition IS
the contract — whitened vectors have ~zero mean and ~identity
covariance — plus determinism and the one-pass fit shape."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def whitening_store(spark, sf_dir, tmp_path_factory):
    from jitsu_spark.operators.embedding_prep import build_whitening_model

    store = str(tmp_path_factory.mktemp("whiten") / "model")
    build_whitening_model(spark, sf_dir, store)
    return store


def _whitened_matrix(spark, sf_dir, store):
    from jitsu_spark.operators.embedding_prep import apply_whitening

    rows = apply_whitening(spark, sf_dir, store).collect()
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_whitened_mean_zero_cov_identity(spark, sf_dir, whitening_store):
    mat = _whitened_matrix(spark, sf_dir, whitening_store)
    n, d = mat.shape
    assert n > 0 and d >= 8
    assert np.abs(mat.mean(axis=0)).max() < 1e-8
    cov = (mat.T @ mat) / n
    # identity within the eps floor's tolerance
    off = cov - np.eye(d)
    assert np.abs(off).max() < 1e-2, np.abs(off).max()


def test_fit_matches_numpy_reference(spark, sf_dir):
    from jitsu_spark.operators.embedding_prep import fit_whitening
    from jitsu_spark.tables import load_table

    mean, w = fit_whitening(spark, sf_dir)
    ref = np.array(
        [
            r.embedding
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    assert np.abs(mean - ref.mean(axis=0)).max() < 1e-9
    cov = np.cov(ref, rowvar=False, bias=True)
    # W whitens the reference covariance too: W C W^T ~ I
    out = w @ cov @ w.T
    assert np.abs(out - np.eye(len(mean))).max() < 1e-2


def test_deterministic(spark, sf_dir):
    from jitsu_spark.operators.embedding_prep import fit_whitening

    m1, w1 = fit_whitening(spark, sf_dir)
    m2, w2 = fit_whitening(spark, sf_dir)
    assert np.array_equal(m1, m2) and np.allclose(w1, w2, atol=1e-12)


def test_moment_partials_sort_key_unique_under_ties(spark):
    """r6 advice: partitions engineered to tie on the old (n, s[:2])
    sort key must still reduce in a unique, stable order — the partition
    id is the key now, and repeated runs stay byte-identical."""
    from jitsu_spark.operators.embedding_prep import _moment_partials

    # 4 partitions with IDENTICAL contents: n and s tie exactly
    rows = [([1.0, 2.0, 3.0],), ([4.0, 5.0, 6.0],)]
    df = spark.createDataFrame(
        rows * 4, "embedding array<double>"
    ).repartition(4)
    parts = _moment_partials(df).collect()
    pids = [r["pid"] for r in parts]
    assert len(pids) == len(set(pids))  # genuinely unique sort key
    ns = {r["n"] for r in parts}
    runs = []
    for _ in range(2):
        ordered = sorted(_moment_partials(df).collect(), key=lambda r: r["pid"])
        s = np.sum([np.array(r["s"]) for r in ordered], axis=0)
        runs.append(s.tobytes())
    assert runs[0] == runs[1]
    assert ns  # partials actually produced


def test_whitening_preserves_row_count_and_ids(spark, sf_dir, whitening_store):
    from jitsu_spark.operators.embedding_prep import apply_whitening
    from jitsu_spark.tables import load_table

    out = apply_whitening(spark, sf_dir, whitening_store)
    src = load_table(spark, sf_dir, "embeddings")
    assert out.count() == src.count()
    assert (
        out.select("vec_id").distinct().count()
        == src.select("vec_id").distinct().count()
    )


class TestInt8Quantize:
    def test_quantization_bounds_and_zero_vector(self, spark, tmp_path):
        rows = [
            (1, [1.27, -1.27, 0.635], 0),
            (2, [0.0, 0.0, 0.0], 0),  # zero vector: scale 0, q all 0
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
        from jitsu_spark.operators.embedding_prep import (
            embedding_int8_quantize,
        )

        out = {
            r.vec_id: r
            for r in embedding_int8_quantize(spark, str(tmp_path)).collect()
        }
        r1 = out[1]
        assert r1.dim == 3
        assert abs(r1.scale - 1.27 / 127) < 1e-6  # absmax / 127
        # max error bounded by half a quantization step
        assert r1.max_abs_err <= r1.scale / 2 + 1e-9
        assert r1.mse <= (r1.scale / 2) ** 2 + 1e-12
        r2 = out[2]
        assert r2.scale == 0.0 and r2.max_abs_err == 0.0 and r2.mse == 0.0

    def test_error_bound_holds_on_corpus(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from jitsu_spark.operators.embedding_prep import (
            embedding_int8_quantize,
        )

        out = embedding_int8_quantize(spark, sf_dir)
        bad = out.where(
            F.col("max_abs_err") > F.col("scale") / 2 + 1e-9
        ).count()
        assert bad == 0 and out.count() > 0


class TestPca:
    def test_post_conditions_on_report(self, spark, sf_dir):
        """Projected mean ~ 0; projected variance equals the component's
        eigenvalue share; ratios strictly descending and in (0, 1]."""
        from jitsu_spark.operators.embedding_prep import (
            PCA_K,
            pca_project_report,
        )

        rows = pca_project_report(spark, sf_dir).collect()
        assert [r["component"] for r in rows] == list(range(PCA_K))
        ratios = [r["explained_var_ratio"] for r in rows]
        assert all(0 < r <= 1 for r in ratios)
        assert all(a >= b for a, b in zip(ratios, ratios[1:]))
        for r in rows:
            assert abs(r["mean_p"]) <= 0.001
        # var_p (3 dp) must equal the eigenvalue the fit reports
        import numpy as np

        from jitsu_spark.operators.embedding_prep import fit_pca

        _, _, evals = fit_pca(spark, sf_dir)
        for r, ev in zip(rows, evals):
            assert abs(r["var_p"] - ev) < 2e-3

    def test_basis_orthonormal_and_projection_decorrelated(self, spark, sf_dir):
        import numpy as np

        from jitsu_spark.operators.embedding_prep import (
            fit_pca,
            pca_project,
        )
        from jitsu_spark.tables import load_table

        mean, comps, evals = fit_pca(spark, sf_dir, k=8)
        assert np.allclose(comps @ comps.T, np.eye(8), atol=1e-10)
        # sign convention: largest-|coord| entry positive per component
        top = np.abs(comps).argmax(axis=1)
        assert (comps[np.arange(8), top] > 0).all()

        proj = pca_project(
            load_table(spark, sf_dir, "embeddings"), mean, comps
        )
        mat = np.array([r["embedding"] for r in proj.collect()])
        cov = np.cov(mat.T, bias=True)
        off = cov - np.diag(np.diag(cov))
        assert np.abs(off).max() < 1e-8  # decorrelated
        assert np.allclose(np.diag(cov), evals, rtol=1e-8)

    def test_projection_preserves_ids_and_dim(self, spark, sf_dir):
        from jitsu_spark.operators.embedding_prep import fit_pca, pca_project
        from jitsu_spark.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        mean, comps, _ = fit_pca(spark, sf_dir, k=4)
        out = pca_project(emb, mean, comps)
        rows = out.collect()
        assert len(rows) == emb.count()
        assert all(len(r["embedding"]) == 4 for r in rows)


class TestPcaFixedBasis:
    """Round-10 frozen-basis projection (`pca_project_fixed_basis`):
    the oracle-checked APPLY half of the PCA learn/apply split."""

    def test_projection_bounded_and_all_vectors_covered(self, spark):
        """Construction invariants that hold on ANY corpus: every vector
        yields exactly 4 components, and |proj| <= ||x||·||c|| + |offset|
        (Cauchy-Schwarz with the unit-norm frozen basis). The
        variance==eigenvalue post-condition holds only at the FITTING
        SF (sf0.01, pinned below) — the near-uniform synthetic
        embeddings have no transferable principal directions, so a
        cross-SF eigenvalue match would be testing noise."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.embedding_prep import (
            pca_project_fixed_basis,
        )
        from tests.conftest import SF_DIR

        df = pca_project_fixed_basis(spark, SF_DIR)
        n_vec = df.select("vec_id").distinct().count()
        per = df.groupBy("vec_id").count().where("count != 4").count()
        assert n_vec > 0 and per == 0
        # synthetic embeddings are unit-scale; a generous hard bound
        assert df.agg(F.max(F.abs("proj"))).first()[0] < 10.0

    def test_variance_matches_eigenvalue_at_fitting_sf(self, spark):
        from pyspark.sql import functions as F

        from jitsu_spark.operators.embedding_prep import (
            pca_project_fixed_basis,
        )
        from jitsu_spark.operators.pca_fixed import EIGENVALUES

        stats = (
            pca_project_fixed_basis(spark, "/root/testdata/sf0.01")
            .groupBy("component")
            .agg(F.var_pop("proj").alias("v"))
            .orderBy("component")
            .collect()
        )
        vs = [r["v"] for r in stats]
        assert all(a >= b for a, b in zip(vs, vs[1:])), vs  # descending
        for v, ev in zip(vs, EIGENVALUES):
            assert abs(v - ev) / ev < 0.02, (v, ev)

    def test_basis_rows_unit_norm(self):
        import numpy as np

        from jitsu_spark.operators.pca_fixed import COMPONENTS

        for row in COMPONENTS:
            assert abs(np.linalg.norm(row) - 1.0) < 1e-3
