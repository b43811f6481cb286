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
     (buckets < 800), capped at TRAIN_CAP_PER_MILLE of the corpus: at
     100 TB the classifier trains on a bounded deterministic sample (the
     bounded-training contract `pq.PQ_TRAIN_MAX_SAMPLE` set), while
     SCORING stays a single full-corpus map pass through the fitted
     model's JVM transform.
  4. score     — P(high quality) for every doc + its held-out flag, so
     downstream gates (`quality_percentile_gate`, temperature sampling)
     can consume the calibrated column directly.

Rows-only registry entry: iterative L-BFGS has no SQL form. The hard
gates live in `tests/test_quality_model.py`: held-out accuracy well
above the 0.5 balanced baseline, probability bounds, prediction/
probability consistency, and the no-leakage threshold contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .sampling import _bucket
from .text_ops import TOKENS, _SW
from .text_embed import feature_hash_embed

TRAIN_BUCKET_LT = 800     # md5 buckets 0..799 train; 800..999 held out
TRAIN_CAP_PER_MILLE = 1000  # bench SF trains on every train-bucket doc;
# production sets this well below 1000 so the iterative stage touches a
# fixed fraction of the corpus regardless of N (scoring is always full)

_SW_RATIO = (
    f"size(filter({TOKENS}, x -> x IN ({_SW})))"
    f" / CAST(greatest(size({TOKENS}), 1) AS DOUBLE)"
)


def _featurized(docs: DataFrame) -> DataFrame:
    """(doc_id, embedding, sw_ratio, is_train) in one pass over the
    corpus scan; embedding is referenced once per consumer row, honoring
    the live-HOF consumer contract in `text_embed`."""
    with_ratio = docs.selectExpr(
        "doc_id", "text", f"{_SW_RATIO} AS sw_ratio"
    )
    return feature_hash_embed(with_ratio, keep=("sw_ratio",)).withColumn(
        "is_train", _bucket(F.col("doc_id")) < TRAIN_BUCKET_LT
    )


def train_quality_classifier(
    feats: DataFrame,
    cap_per_mille: int = TRAIN_CAP_PER_MILLE,
    seed: int = 7,
):
    """Fit the LR model on the train buckets; returns (model, threshold).

    The label threshold (median stopword ratio) is computed on the SAME
    capped train set the model sees — held-out rows influence neither."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    train = feats.where("is_train")
    if cap_per_mille < 1000:
        # second independent md5 (salted key) so the cap is uncorrelated
        # with the train/held-out split
        train = train.where(
            _bucket(F.concat(F.col("doc_id").cast("string"), F.lit(":cap")))
            < cap_per_mille
        )
    # materialize the capped train vectors FIRST (one featurize pass —
    # the live-HOF embedding is expensive to evaluate, and both the
    # threshold scan and every L-BFGS iteration read from here), then
    # take the label threshold from the materialized frame.
    vecs = train.select(
        array_to_vector("embedding").alias("features"), "sw_ratio"
    ).localCheckpoint(eager=True)
    # exact percentile: the buffer is bounded by the train cap contract;
    # swap percentile_approx in when cap_per_mille shrinks at scale
    thr = vecs.agg(F.expr("percentile(sw_ratio, 0.5)").alias("t")).first()["t"]
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
    """One full-corpus transform pass: (doc_id, prob, pred, label,
    is_holdout). prob is P(label=1) = P(stopword-profile 'high quality');
    label is the weak heuristic truth for evaluation."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    scored = model.transform(
        feats.select(
            "doc_id",
            "sw_ratio",
            "is_train",
            array_to_vector("embedding").alias("features"),
        )
    )
    return scored.select(
        "doc_id",
        F.round(vector_to_array("probability")[1], 4).alias("prob"),
        F.col("prediction").cast("int").alias("pred"),
        (F.col("sw_ratio") >= F.lit(thr)).cast("int").alias("label"),
        (~F.col("is_train")).alias("is_holdout"),
    )


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only — see module docstring): train on the
    md5 train buckets, score the whole corpus."""
    docs = load_table(spark, sf_dir, "documents")
    feats = _featurized(docs)
    model, thr = train_quality_classifier(feats)
    return score_quality(feats, model, thr)


QUERIES = {"quality_classifier_score": quality_classifier_score}
ORACLE: dict = {}
