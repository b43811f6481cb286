"""Embedding preparation: ZCA whitening (round 4).

Whitening is the standard hygiene step before similarity indexing
(Jegou & Chum, "Negative evidences and co-occurrences in image
retrieval: the benefit of PCA and whitening", ECCV 2012): decorrelate
dimensions and equalize variance so cosine/L2 distances aren't
dominated by a few high-variance axes — it measurably improves both
brute-force and PQ recall on real embedding distributions.

Spark mapping (the classic two-phase big-data linear algebra shape):
- FIT distributed: mean and covariance come from ONE pass — each
  partition accumulates (count, sum(x), X^T X) with numpy and emits a
  single partial row; the driver sums the partials and runs the d x d
  eigendecomposition (d=256 -> trivial). No corpus collect, no shuffle
  of vectors; the partials are O(d^2) per partition.
- APPLY distributed: W (vec - mean) as a vectorized per-batch GEMM in
  one mapInPandas pass with the O(d^2) model broadcast.

Model persists as parquet beside the other stores (`build_ivf_store`
pattern). No SQL oracle (eigendecomposition); the contract is the
mathematical post-condition — whitened covariance == identity — tested
directly, plus determinism.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

WHITEN_EPS = 1e-5  # eigenvalue floor: don't explode near-null directions


def _moment_partials(df: DataFrame) -> DataFrame:
    """Per-partition (pid, n, sum, flattened X^T X) — the sufficient
    statistics for mean + covariance in one corpus pass. The partition
    id rides along as a genuinely unique sort key for the driver-side
    reduction (r6 advice: sorting on (n, s[:2]) can tie, leaving the
    float-sum order — and thus the last bits of the moments —
    partition-arrival-dependent)."""

    def acc(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        s = None
        xtx = None
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            n += len(mat)
            s = mat.sum(axis=0) if s is None else s + mat.sum(axis=0)
            part = mat.T @ mat
            xtx = part if xtx is None else xtx + part
        if n:
            yield pd.DataFrame(
                {
                    "pid": [pid],
                    "n": [n],
                    "s": [s.tolist()],
                    "xtx": [xtx.ravel().tolist()],
                }
            )

    return df.mapInPandas(
        acc, "pid int, n long, s array<double>, xtx array<double>"
    )


def corpus_moments(
    spark: SparkSession, sf_dir: str
) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, cov) of the embedding corpus from one distributed pass
    — the shared FIT input for whitening and PCA. Partials are summed in
    partition-id order — a unique key, so the float reduction is
    byte-reproducible regardless of collect() arrival order."""
    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    parts = sorted(_moment_partials(emb).collect(), key=lambda r: r["pid"])
    n = sum(r["n"] for r in parts)
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    d = len(s)
    xtx = np.sum(
        [np.array(r["xtx"]).reshape(d, d) for r in parts], axis=0
    )
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    return n, mean, cov


def fit_whitening(
    spark: SparkSession, sf_dir: str, eps: float = WHITEN_EPS
) -> tuple[np.ndarray, np.ndarray]:
    """(mean, W): W = U diag(1/sqrt(l + eps)) U^T (ZCA whitening)."""
    _, mean, cov = corpus_moments(spark, sf_dir)
    evals, evecs = np.linalg.eigh(cov)  # symmetric -> deterministic eigh
    w = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, 0) + eps)) @ evecs.T
    return mean, w


def build_whitening_model(
    spark: SparkSession, sf_dir: str, store_dir: str, eps: float = WHITEN_EPS
) -> None:
    mean, w = fit_whitening(spark, sf_dir, eps)
    d = len(mean)
    spark.createDataFrame(
        [(d, mean.tolist(), w.ravel().tolist())],
        "dim int, mean array<double>, w array<double>",
    ).write.mode("overwrite").parquet(store_dir)


def apply_whitening(
    spark: SparkSession, sf_dir: str, store_dir: str
) -> DataFrame:
    """(vec_id, embedding array<double>): whitened vectors, one
    vectorized GEMM pass with the O(d^2) model broadcast."""
    row = spark.read.parquet(store_dir).first()
    d = row["dim"]
    mean = np.array(row["mean"])
    w = np.array(row["w"]).reshape(d, d)
    b = spark.sparkContext.broadcast((mean, w))

    def project(batches):
        import pandas as pd

        m, wt = b.value[0], b.value[1].T
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            out = (mat - m) @ wt
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "embedding": list(out)}
            )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return emb.mapInPandas(project, "vec_id long, embedding array<double>")


def whitening_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only check — eigendecomposition has no SQL
    form): per-dimension mean/variance of the whitened corpus, i.e. the
    whitening post-condition as a queryable report (mean ~ 0, var ~ 1
    up to the eps floor). Fit + project in-line; one corpus pass each."""
    mean, w = fit_whitening(spark, sf_dir)
    b = spark.sparkContext.broadcast((mean, w))

    def project(batches):
        import pandas as pd

        m, wt = b.value[0], b.value[1].T
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            out = (mat - m) @ wt
            yield pd.DataFrame({"embedding": list(out)})

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("embedding")
    )
    proj = emb.mapInPandas(project, "embedding array<double>")
    return (
        proj.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.round(F.avg("x"), 3).alias("mean_w"),
            F.round(F.var_pop("x"), 3).alias("var_w"),
        )
        # self-certifying invariant (r8): the whitening post-condition —
        # mean 0 and UNIT variance — carried per row, so the rows-only
        # check transports the pass/fail signal in-plan. Two-sided: an
        # upper bound alone would certify a transform that deflates
        # variance everywhere (r8 review finding #8). The lower bound is
        # 0.9, not 1-eps: the eps floor only depresses variance on
        # near-null eigen-directions, and a direction damped below 0.9
        # means the data genuinely has a degenerate axis — worth a red
        # row in that dimension's report either way.
        .withColumn(
            "whitened_ok",
            (F.abs(F.col("mean_w")) <= 0.001)
            & F.col("var_w").between(0.9, 1.001),
        )
        .orderBy("dim")
    )


# ---------------------------------------------------------------------------
# Distributed PCA (round 5): top-k projection — the dimensionality-
# reduction half of the same moment machinery whitening uses. The classic
# pre-indexing trade (Jegou & Chum 2012 again): project 256-d embeddings
# to the k dominant axes before PQ/IVF so codebooks spend bits on signal,
# and store 16x less for curation passes that only need coarse geometry.
# FIT is the shared one-pass moments + a driver d x d eigh (d=256 —
# trivial); APPLY is one broadcast-GEMM mapInPandas pass, same shape as
# apply_whitening. Sign convention: each component's largest-|coord| axis
# is made positive, so the fitted basis is unique, not eigh-luck.
# ---------------------------------------------------------------------------

PCA_K = 16


def _pca_from_cov(
    cov: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(components (k,d), evals (k,)) — top-k principal axes in
    descending-variance order, sign-normalized."""
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    top = np.abs(comps).argmax(axis=1)
    signs = np.sign(comps[np.arange(len(comps)), top])
    signs[signs == 0] = 1.0
    return comps * signs[:, None], evals[order]


def fit_pca(
    spark: SparkSession, sf_dir: str, k: int = PCA_K
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean, components (k,d), evals (k,))."""
    _, mean, cov = corpus_moments(spark, sf_dir)
    comps, evals = _pca_from_cov(cov, k)
    return mean, comps, evals


def pca_project(
    emb: DataFrame, mean: np.ndarray, comps: np.ndarray
) -> DataFrame:
    """(vec_id, embedding array<double> of dim k): (x - mean) @ comps^T
    as one vectorized GEMM pass with the O(k*d) model broadcast."""
    b = emb.sparkSession.sparkContext.broadcast((mean, comps))

    def project(batches):
        import pandas as pd

        m, ct = b.value[0], b.value[1].T
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            out = (mat - m) @ ct
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "embedding": list(out)}
            )

    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).mapInPandas(project, "vec_id long, embedding array<double>")


def pca_project_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only — eigendecomposition has no SQL form):
    per-component diagnostics of the top-k projection — explained-
    variance ratio plus the projected corpus's empirical mean/variance,
    i.e. the PCA post-conditions (mean ~ 0, var == its eigenvalue,
    ratios descending) as a queryable report. One corpus pass to fit,
    one to project."""
    _, mean, cov = corpus_moments(spark, sf_dir)
    comps, evals = _pca_from_cov(cov, PCA_K)
    total_var = float(np.trace(cov))
    proj = pca_project(
        load_table(spark, sf_dir, "embeddings"), mean, comps
    )
    ratios = spark.createDataFrame(
        [
            (i, round(float(v) / total_var, 4), round(float(v), 3))
            for i, v in enumerate(evals)
        ],
        "component int, explained_var_ratio double, eigenvalue double",
    )
    stats = (
        proj.select(F.posexplode("embedding").alias("component", "x"))
        .groupBy("component")
        .agg(
            F.round(F.avg("x"), 3).alias("mean_p"),
            F.round(F.var_pop("x"), 3).alias("var_p"),
        )
    )
    from ..plans.hints import maybe_broadcast

    return (
        stats.join(maybe_broadcast(ratios), "component")
        # self-certifying invariant (r8): the PCA post-condition — each
        # projected component's empirical variance equals its eigenvalue
        # (and is centered) — computed in-plan at join time so the
        # rows-only check transports the signal.
        .withColumn(
            "var_matches_eigenvalue",
            (F.abs(F.col("var_p") - F.col("eigenvalue")) <= 0.002)
            & (F.abs(F.col("mean_p")) <= 0.001),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Symmetric int8 scalar quantization (round 5): the storage-prep pass an
# embedding corpus runs before indexing — float32 -> int8 + one scale per
# vector is a 4x footprint cut (the standard serving trade; FAISS
# ScalarQuantizer QT_8bit family). Pure expressions: absmax fold, explicit
# half-up rounding (CAST(floor(x/scale + 0.5))) so Spark and DuckDB round
# identically (their round() tie rules differ), reconstruction error via
# the same sequential-fold dot both engines agree on bit-for-bit.
# ---------------------------------------------------------------------------


def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector quantization audit: (vec_id, dim, scale, max_abs_err,
    mse) under symmetric int8 (q = round(x/scale), scale = absmax/127).
    Zero vectors quantize to all-zero with scale 0. One map-only scan —
    quantizing 100 TB is embarrassingly parallel; the quantized arrays
    themselves are a projection away (this entry emits the scalar audit
    columns the hash gate can compare)."""
    from .similarity import DOT

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    absmax = (
        "aggregate(embedding, CAST(0.0 AS DOUBLE),"
        " (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"
    )
    q = (
        "CASE WHEN scale = 0.0D THEN transform(embedding, x -> 0)"
        " ELSE transform(embedding, x ->"
        " CAST(floor(CAST(x AS DOUBLE) / scale + 0.5D) AS INT)) END"
    )
    err = "zip_with(embedding, q, (x, qi) -> CAST(x AS DOUBLE) - qi * scale)"
    return (
        emb.selectExpr("vec_id", "embedding", f"{absmax} / 127.0D AS scale")
        .selectExpr("vec_id", "embedding", "scale", f"{q} AS q")
        .selectExpr("vec_id", "embedding", "scale", f"{err} AS err")
        .selectExpr(
            "vec_id",
            "size(embedding) AS dim",
            "round(scale, 8) AS scale",
            "round(aggregate(err, CAST(0.0 AS DOUBLE),"
            " (a, e) -> greatest(a, abs(e))), 8) AS max_abs_err",
            f"round({DOT.format(a='err', b='err')} / size(embedding), 10)"
            " AS mse",
        )
    )


INT8_QUANT_SQL = """
WITH scaled AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
           AS scale
  FROM embeddings
),
quant AS (
  SELECT vec_id, e, scale,
         CASE WHEN scale = 0.0 THEN list_transform(e, x -> 0)
              ELSE list_transform(e, x -> CAST(floor(x / scale + 0.5) AS INT))
         END AS q
  FROM scaled
),
errs AS (
  SELECT vec_id, e, scale,
         list_transform(range(1, len(e) + 1), i -> e[i] - q[i] * scale)
           AS err
  FROM quant
)
SELECT vec_id,
       CAST(len(e) AS INT) AS dim,
       round(scale, 8) AS scale,
       round(list_max(list_transform(err, x -> abs(x))), 8) AS max_abs_err,
       round(list_dot_product(err, err) / len(e), 10) AS mse
FROM errs
"""




# ---------------------------------------------------------------------------
# Matryoshka-style truncation audit (round 8; Kusupati et al. 2022,
# "Matryoshka Representation Learning"). Serving stacks truncate
# embeddings to prefix dimensions for cheap first-stage retrieval; the
# decision needs the ENERGY CURVE: the fraction of each vector's squared
# norm its first d coordinates carry. cos(truncated, full) for a
# zero-padded truncation is exactly sqrt(energy_frac), so the report also
# answers "how much cosine fidelity does a d-dim prefix keep".
#
# Scale: one map-only scan (per-prefix sequential folds, codegen), a
# 4-row-per-vector stack, and a prefix-count-sized aggregate — no
# shuffle beyond the final tiny groupBy.
# ---------------------------------------------------------------------------

MRL_PREFIX_DIMS = (8, 16, 32, 64)


def embedding_dim_truncation_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(dim_prefix, n_vectors, avg_energy_frac, min_energy_frac,
    avg_cos): per prefix length, the mean/min energy fraction and the
    mean cosine between the truncated and full vector. Zero-norm
    vectors are excluded at the boundary (no defined direction), the
    same convention as the cosine ops."""
    from .similarity import DOT

    def prefix_sq(d: int) -> str:
        return DOT.format(
            a=f"slice(embedding, 1, {d})", b=f"slice(embedding, 1, {d})"
        )

    emb = load_table(spark, sf_dir, "embeddings")
    per = emb.selectExpr(
        "vec_id",
        f"{DOT.format(a='embedding', b='embedding')} AS full_e",
        *[f"{prefix_sq(d)} AS e{d}" for d in MRL_PREFIX_DIMS],
    ).where("full_e > 0")
    stacked = per.selectExpr(
        "full_e",
        f"stack({len(MRL_PREFIX_DIMS)}, "
        + ", ".join(f"{d}, e{d}" for d in MRL_PREFIX_DIMS)
        + ") AS (dim_prefix, e)",
    )
    return (
        stacked.groupBy("dim_prefix")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(F.expr("e / full_e")), 6).alias(
                "avg_energy_frac"
            ),
            F.round(F.min(F.expr("e / full_e")), 6).alias(
                "min_energy_frac"
            ),
            F.round(F.avg(F.expr("sqrt(e / full_e)")), 6).alias("avg_cos"),
        )
        .orderBy("dim_prefix")
    )


def _mrl_duck() -> str:
    dot = "list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"
    cases = " ".join(
        f"WHEN {d} THEN {dot.format(a=f'embedding[1:{d}]', b=f'embedding[1:{d}]')}"
        for d in MRL_PREFIX_DIMS
    )
    dims = ", ".join(str(d) for d in MRL_PREFIX_DIMS)
    return f"""
WITH per AS (
  SELECT vec_id, embedding,
         {dot.format(a="embedding", b="embedding")} AS full_e
  FROM embeddings
  WHERE {dot.format(a="embedding", b="embedding")} > 0
), stacked AS (
  SELECT full_e, u.d AS dim_prefix,
         CASE u.d {cases} END AS e
  FROM per, unnest([{dims}]) AS u(d)
)
SELECT dim_prefix, count(*) AS n_vectors,
       round(avg(e / full_e), 6) AS avg_energy_frac,
       round(min(e / full_e), 6) AS min_energy_frac,
       round(avg(sqrt(e / full_e)), 6) AS avg_cos
FROM stacked
GROUP BY 1
"""


MRL_TRUNCATION_SQL = _mrl_duck()


# ---------------------------------------------------------------------------
# Fixed-basis projection (round 10, VERDICT r9 #5): the learn/apply
# split applied to PCA. Fitting (eigendecomposition) stays rows-only in
# `pca_project_report`; the APPLY pass a serving pipeline runs per batch
# — project every vector onto a FROZEN basis — is oracle-checked here
# end to end. The artifact (`pca_fixed.py`, auto-generated) is the
# sf0.01 fit's top-4 sign-normalized components rounded to 6 decimals,
# with centering folded into per-component scalar offsets
# (y_k = x·c_k - mean·c_k). Both engines evaluate the identical
# sequential-fold dot (Spark `aggregate`, DuckDB `list_dot_product` —
# the bit-agreement `embedding_int8_quantize` already relies on).
# ---------------------------------------------------------------------------


def pca_project_fixed_basis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, component, proj): every embedding projected onto the
    frozen 4-component basis. One map-only scan (4 sequential folds of
    64 terms per row, whole-stage codegen) + a 4-way stack — no
    shuffle, no Python; projecting 100 TB is embarrassingly parallel
    and the model rides as literal arrays in the plan."""
    from .pca_fixed import COMPONENTS, OFFSETS
    from .similarity import DOT

    emb = load_table(spark, sf_dir, "embeddings")
    ys = []
    for k, (comp, off) in enumerate(zip(COMPONENTS, OFFSETS)):
        arr = "array(" + ", ".join(f"{repr(c)}D" for c in comp) + ")"
        dot = DOT.format(a="embedding", b=arr)
        ys.append(f"round({dot} - ({repr(off)}D), 6) + 0.0D AS y{k}")
    stack = (
        f"stack({len(COMPONENTS)}, "
        + ", ".join(f"{k}, y{k}" for k in range(len(COMPONENTS)))
        + ") AS (component, proj)"
    )
    return emb.selectExpr("vec_id", *ys).selectExpr("vec_id", stack)


def _pca_fixed_duck() -> str:
    from .pca_fixed import COMPONENTS, OFFSETS

    arms = []
    for k, (comp, off) in enumerate(zip(COMPONENTS, OFFSETS)):
        lst = "[" + ", ".join(repr(c) for c in comp) + "]::DOUBLE[]"
        arms.append(
            f"SELECT vec_id, {k} AS component,"
            f" round(list_dot_product(embedding::DOUBLE[], {lst})"
            f" - ({repr(off)}), 6) + 0.0 AS proj FROM embeddings"
        )
    return "\nUNION ALL\n".join(arms)


QUERIES: dict = {
    "whitening_report": whitening_report,
    "embedding_dim_truncation_report": embedding_dim_truncation_report,
    "embedding_int8_quantize": embedding_int8_quantize,
    "pca_project_report": pca_project_report,
    "pca_project_fixed_basis": pca_project_fixed_basis,
}
ORACLE: dict = {
    # whitening_report stays rows-only (eigendecomposition has no SQL form)
    "embedding_int8_quantize": INT8_QUANT_SQL,
    "embedding_dim_truncation_report": MRL_TRUNCATION_SQL,
    "pca_project_fixed_basis": _pca_fixed_duck(),
}
