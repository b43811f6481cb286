"""Model-based quality scoring: train a linear quality classifier on
in-engine features and score every document — the "quality classifier"
stage of the classic pre-training pipelines (GPT-3's LR filter over
WebText-vs-CommonCrawl, CCNet/RedPajama's fasttext gate), expressed
Spark-first: features and scoring are JVM-side expressions, training is
`pyspark.ml` LogisticRegression (distributed L-BFGS — one treeAggregate
gradient pass per iteration, no per-row Python).

Shape of the operator:
  1. features  — the deterministic 64-d feature-hash embedding
     (`text_embed.feature_hash_embed`, zero-shuffle HOF scan).
  2. weak label — median split on stopword ratio, the median computed on
     the TRAIN buckets only (no held-out leakage). Balanced by
     construction, so accuracy is a meaningful metric with a 0.5 floor.
  3. train     — LogisticRegression on the md5-bucket train split
     (buckets < 800), capped at an ABSOLUTE `QM_TRAIN_MAX_SAMPLE` rows
     (the `pq.PQ_TRAIN_MAX_SAMPLE` bounded-training contract): the cap
     bucket threshold is derived from the parquet FOOTER row count
     (metadata-only, no scan), so at 100 TB the classifier trains on a
     fixed ~100k-row deterministic sample regardless of N, while
     SCORING stays a single full-corpus map pass: the fitted model is
     folded into a JVM sigmoid(dot) expression — no transform, no
     corpus materialization (r6 advice). Once the cap engages, the label threshold
     switches from exact `percentile` to `percentile_approx` so no
     single task buffers the train set's values; at test SF the cap is
     a no-op and the exact form (the parity regime) runs.
  4. score     — P(high quality) for every doc + its held-out flag, so
     downstream gates (`quality_percentile_gate`, temperature sampling)
     can consume the calibrated column directly.

Rows-only registry entry: iterative L-BFGS has no SQL form.

Determinism regime: this entry is TOLERANCE-checked, not
bit-deterministic — L-BFGS gradients are treeAggregate float sums whose
combine order depends on partition layout, so 4-dp probabilities can
differ across repartitionings of the same data. Given a FITTED model,
the scoring pass itself IS deterministic (pure JVM transform); the
hard gates in `tests/test_quality_model.py` therefore pin held-out
accuracy (well above the 0.5 balanced baseline), probability bounds,
prediction/probability consistency, the no-leakage threshold contract,
the absolute-cap row bound, and fixed-model scoring determinism —
never exact probability bits across layouts.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .sampling import _bucket
from .text_ops import TOKENS, _SW

TRAIN_BUCKET_LT = 800     # md5 buckets 0..799 train; 800..999 held out
# Absolute bound on the iterative (L-BFGS) stage: the train sample never
# exceeds ~this many rows no matter the corpus size. 100k 64-d float64
# vectors ≈ 51 MB — comfortably a driver-adjacent working set for the
# treeAggregate passes, same envelope as pq.PQ_TRAIN_MAX_SAMPLE.
QM_TRAIN_MAX_SAMPLE = 100_000
# Cap-bucket granularity. Per-mille would floor the achievable fraction
# at 1/1000 of the pool (still 80M rows at 1e11 docs); a 60-bit md5
# slice mod 1e9 keeps the expected sample within ~2x of the absolute
# target for any corpus up to ~1e13 train rows.
CAP_SCALE = 1_000_000_000

_SW_RATIO = (
    f"size(filter({TOKENS}, x -> x IN ({_SW})))"
    f" / CAST(greatest(size({TOKENS}), 1) AS DOUBLE)"
)


def _cap_bucket(key) -> "F.Column":
    """Fine-grained deterministic bucket in [0, CAP_SCALE): 60-bit md5
    prefix (15 hex digits) mod 1e9, salted so it is independent of the
    train/held-out `sampling._bucket` split (which reads digits 1-7 of
    the unsalted key)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(key.cast("string"), F.lit(":cap"))), 1, 15),
            16,
            10,
        ).cast("long")
        % CAP_SCALE
    )


def _train_cap(n_corpus_rows: int | None) -> int:
    """Cap-bucket threshold (out of CAP_SCALE) that bounds the expected
    train-sample size at QM_TRAIN_MAX_SAMPLE absolute rows (the
    `salt_buckets_for` footer-stats pattern in reverse). The train split
    keeps TRAIN_BUCKET_LT/1000 of the corpus, so the cap applies to
    n * TRAIN_BUCKET_LT/1000 candidate rows. Returns CAP_SCALE (cap
    disabled — the exact, oracle-parity regime) when the corpus is
    small or its size is unknown."""
    if n_corpus_rows is None:
        return CAP_SCALE
    n_train = n_corpus_rows * TRAIN_BUCKET_LT // 1000
    if n_train <= QM_TRAIN_MAX_SAMPLE:
        return CAP_SCALE
    return max(1, math.ceil(CAP_SCALE * QM_TRAIN_MAX_SAMPLE / n_train))


def _featurized(docs: DataFrame) -> DataFrame:
    """(doc_id, embedding, sw_ratio, is_train) in one pass over the
    corpus scan; embedding is referenced once per consumer row, honoring
    the live-HOF consumer contract in `text_embed`."""
    from .text_embed import feature_hash_embed

    with_ratio = docs.selectExpr(
        "doc_id", "text", f"{_SW_RATIO} AS sw_ratio"
    )
    return feature_hash_embed(with_ratio, keep=("sw_ratio",)).withColumn(
        "is_train", _bucket(F.col("doc_id")) < TRAIN_BUCKET_LT
    )


def train_quality_classifier(
    feats: DataFrame,
    train_cap: int = CAP_SCALE,
    seed: int = 7,
):
    """Fit the LR model on the train buckets; returns (model, threshold).

    The label threshold (median stopword ratio) is computed on the SAME
    capped train set the model sees — held-out rows influence neither.
    `train_cap` is the cap-bucket threshold out of CAP_SCALE (derive it
    with `_train_cap(footer_rows)`); when it engages (< CAP_SCALE) the
    threshold uses `percentile_approx` so no task buffers the whole
    train set — below the cap the exact `percentile` runs (the parity
    regime)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    train = feats.where("is_train")
    if train_cap < CAP_SCALE:
        # independent salted md5 slice so the cap is uncorrelated with
        # the train/held-out split
        train = train.where(_cap_bucket(F.col("doc_id")) < train_cap)
    # materialize the capped train vectors FIRST (one featurize pass —
    # the live-HOF embedding is expensive to evaluate, and both the
    # threshold scan and every L-BFGS iteration read from here), then
    # take the label threshold from the materialized frame. The
    # materialized set is bounded by the absolute cap, so this holds
    # ~QM_TRAIN_MAX_SAMPLE rows at any corpus size.
    vecs = train.select(
        array_to_vector("embedding").alias("features"), "sw_ratio"
    ).localCheckpoint(eager=True)
    median_expr = (
        "percentile_approx(sw_ratio, 0.5, 10000)"
        if train_cap < CAP_SCALE
        else "percentile(sw_ratio, 0.5)"
    )
    thr = vecs.agg(F.expr(median_expr).alias("t")).first()["t"]
    labeled = vecs.select(
        "features",
        (F.col("sw_ratio") >= F.lit(thr)).cast("double").alias("label"),
    )
    lr = LogisticRegression(
        maxIter=30, regParam=1e-3, standardization=True, tol=1e-7
    )
    model = lr.fit(labeled)
    return model, float(thr)


def score_quality(feats: DataFrame, model, thr: float) -> DataFrame:
    """One full-corpus map pass: (doc_id, prob, pred, label, is_holdout).
    prob is P(label=1) = P(stopword-profile 'high quality'); label is
    the weak heuristic truth for evaluation.

    The fitted model is FOLDED INTO A JVM EXPRESSION — margin =
    dot(embedding, coefficients) + intercept via zip_with/aggregate over
    a literal coefficient array; prob = sigmoid(margin), pred =
    margin > 0 (LR's default 0.5 probability threshold). No
    `model.transform`, no Python, and crucially NO materialization of
    the featurized corpus: the r6 form localCheckpoint(eager)ed the
    full (doc_id, 64-d embedding) frame to stop transform's 3x live-HOF
    re-evaluation, which at the 100 TB design point parks a corpus-
    scale working set in non-replicated executor block storage and
    makes any executor loss fatal (checkpoint truncates lineage). The
    expression form keeps full lineage (fault-tolerant, storage-free);
    its cost is the margin chain evaluated twice per row (prob + pred —
    HOF subexpressions are exempt from Spark's subexpression
    elimination), a bounded, embarrassingly-parallel map cost instead
    of a corpus-sized storage + recovery liability."""
    coefs = [float(w) for w in model.coefficients]
    intercept = float(model.intercept)
    coef_lit = F.array(*[F.lit(w) for w in coefs])
    margin = F.aggregate(
        F.zip_with(F.col("embedding"), coef_lit, lambda e, w: e * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) + F.lit(intercept)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return feats.select(
        "doc_id",
        F.round(prob, 4).alias("prob"),
        (margin > 0).cast("int").alias("pred"),
        (F.col("sw_ratio") >= F.lit(thr)).cast("int").alias("label"),
        (~F.col("is_train")).alias("is_holdout"),
    )


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only — see module docstring): train on the
    md5 train buckets with the footer-derived absolute cap, score the
    whole corpus."""
    from .similarity import _corpus_rows

    docs = load_table(spark, sf_dir, "documents")
    feats = _featurized(docs)
    cap = _train_cap(_corpus_rows(sf_dir, "documents"))
    model, thr = train_quality_classifier(feats, train_cap=cap)
    return score_quality(feats, model, thr)


QUERIES = {"quality_classifier_score": quality_classifier_score}
ORACLE: dict = {}
