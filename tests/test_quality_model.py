"""Model-based quality classifier (`jitsu_spark/operators/quality_model.py`):
distributed LR training on hash features, full-corpus JVM scoring."""

from __future__ import annotations

import pytest
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def scored(spark):
    from jitsu_spark.operators.quality_model import quality_classifier_score

    df = quality_classifier_score(spark, SF_DIR).cache()
    df.count()
    yield df
    df.unpersist()


class TestQualityClassifier:
    def test_learns_well_above_balanced_baseline(self, scored):
        from pyspark.sql import functions as F

        row = scored.where("is_holdout").agg(
            F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc"),
            F.avg("label").alias("pos_rate"),
            F.count("*").alias("n"),
        ).first()
        # median-split labels are balanced by construction -> 0.5 floor;
        # measured 0.75 at sf0.001, 0.82 at sf0.01 — gate with margin
        assert row["n"] > 50
        assert 0.35 <= row["pos_rate"] <= 0.65
        assert row["acc"] >= 0.65

    def test_probabilities_and_predictions_consistent(self, scored):
        from pyspark.sql import functions as F

        bad = scored.where(
            (F.col("prob") < 0) | (F.col("prob") > 1)
            | ((F.col("pred") == 1) & (F.col("prob") < 0.4999))
            | ((F.col("pred") == 0) & (F.col("prob") > 0.5001))
        ).count()
        assert bad == 0

    def test_every_doc_scored_once(self, scored, spark):
        from jitsu_spark.tables import load_table

        n_docs = load_table(spark, SF_DIR, "documents").count()
        assert scored.count() == n_docs
        assert scored.select("doc_id").distinct().count() == n_docs

    def test_threshold_has_no_holdout_leakage(self, spark):
        """The label threshold equals the train-bucket median computed
        independently — held-out rows contribute nothing."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.quality_model import (
            TRAIN_BUCKET_LT,
            _SW_RATIO,
            _featurized,
            train_quality_classifier,
        )
        from jitsu_spark.operators.sampling import _bucket
        from jitsu_spark.tables import load_table

        docs = load_table(spark, SF_DIR, "documents")
        _, thr = train_quality_classifier(_featurized(docs))
        want = (
            docs.where(_bucket(F.col("doc_id")) < TRAIN_BUCKET_LT)
            .selectExpr(f"{_SW_RATIO} AS r")
            .agg(F.expr("percentile(r, 0.5)"))
            .first()[0]
        )
        assert abs(thr - want) < 1e-12

    def test_train_cap_bounds_the_iterative_stage(self, spark):
        """An engaged cap trains on a strict deterministic subset (the
        100 TB contract: bounded training, full scoring) and still
        produces a usable model."""
        from jitsu_spark.operators.quality_model import (
            CAP_SCALE,
            _featurized,
            score_quality,
            train_quality_classifier,
        )
        from jitsu_spark.tables import load_table

        feats = _featurized(load_table(spark, SF_DIR, "documents"))
        model, thr = train_quality_classifier(feats, train_cap=CAP_SCALE * 3 // 10)
        assert model.n_iterations > 0
        n_train_full = feats.where("is_train").count()
        assert model.n_train < n_train_full
        out = score_quality(feats, model, thr)
        assert out.count() == feats.count()

    def test_cap_derivation_is_absolute(self):
        """The footer-derived cap bounds the EXPECTED train sample at
        QM_TRAIN_MAX_SAMPLE absolute rows for any corpus size — the
        round-5 weak item: per-mille (relative) caps still trained on
        100 GB at 100 TB. Synthetic footer counts stand in for the
        parquet metadata (the derivation consumes only n_rows)."""
        from jitsu_spark.operators.quality_model import (
            CAP_SCALE,
            QM_TRAIN_MAX_SAMPLE,
            TRAIN_BUCKET_LT,
            _train_cap,
        )

        # small/unknown corpora: cap disabled (exact parity regime)
        assert _train_cap(None) == CAP_SCALE
        assert _train_cap(50_000) == CAP_SCALE
        assert _train_cap(QM_TRAIN_MAX_SAMPLE * 1000 // TRAIN_BUCKET_LT) == CAP_SCALE
        # large corpora: expected sample = n_train * cap / CAP_SCALE
        # stays within 2x of the absolute target — at 1e8, 1e11 (the
        # ~100 TB regime) and 1e13 rows alike
        for n in (10**8, 10**11, 10**13):
            cap = _train_cap(n)
            assert cap < CAP_SCALE
            n_train = n * TRAIN_BUCKET_LT // 1000
            expected = n_train * cap / CAP_SCALE
            assert expected <= 2 * QM_TRAIN_MAX_SAMPLE, (n, cap, expected)
            # and the cap never starves training either
            assert expected >= QM_TRAIN_MAX_SAMPLE / 2, (n, cap, expected)

    def test_engaged_cap_filters_rows_and_uses_approx_median(self, spark):
        """When the cap engages, the train filter keeps ~cap/CAP_SCALE
        of the pool and the threshold comes from percentile_approx —
        equal to the exact median on the same capped subset within the
        10k-accuracy sketch tolerance."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.quality_model import (
            CAP_SCALE,
            _cap_bucket,
            _featurized,
            train_quality_classifier,
        )
        from jitsu_spark.tables import load_table

        feats = _featurized(load_table(spark, SF_DIR, "documents"))
        cap = CAP_SCALE // 2
        _, thr = train_quality_classifier(feats, train_cap=cap)
        capped = feats.where("is_train").where(_cap_bucket(F.col("doc_id")) < cap)
        n_pool = feats.where("is_train").count()
        n_capped = capped.count()
        assert 0 < n_capped < n_pool
        # percentile_approx returns an actual data value while the exact
        # percentile interpolates between middle order statistics — only
        # the sketch's real guarantee is asserted (r6 advice): thr lies
        # within the exact [0.499, 0.501] quantile band
        lo, hi = capped.agg(
            F.expr("percentile(sw_ratio, 0.499)"),
            F.expr("percentile(sw_ratio, 0.501)"),
        ).first()
        assert lo - 1e-12 <= thr <= hi + 1e-12

    def test_fixed_model_scoring_is_deterministic(self, spark):
        """Determinism regime (module docstring, r7): TRAINING is
        byte-deterministic (doc_id-sorted sample, order-fixed numpy
        IRLS) and scoring under a fixed model is a pure JVM map —
        identical coefficients AND identical rows across
        repartitionings of the input."""
        import numpy as np

        from jitsu_spark.operators.quality_model import (
            _featurized,
            score_quality,
            train_quality_classifier,
        )
        from jitsu_spark.tables import load_table

        feats = _featurized(load_table(spark, SF_DIR, "documents"))
        model, thr = train_quality_classifier(feats)
        model2, thr2 = train_quality_classifier(
            _featurized(
                load_table(spark, SF_DIR, "documents").repartition(7, "doc_id")
            )
        )
        assert thr == thr2
        assert np.array_equal(model.coefficients, model2.coefficients)
        assert model.intercept == model2.intercept
        a = score_quality(feats, model, thr)
        b = score_quality(feats.repartition(7, "doc_id"), model, thr)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_scoring_is_one_map_pass(self, spark):
        """Full-corpus scoring never shuffles AND never materializes:
        no Exchange in the plan (features are map-side HOFs; the model
        is a row-local expression), no ExistingRDD scan (r6 advice: a
        corpus-scale localCheckpoint hides behind a no-Exchange check —
        the lineage must reach the parquet source so executor loss
        recomputes instead of failing the job)."""
        from jitsu_spark.operators.quality_model import (
            _featurized,
            score_quality,
            train_quality_classifier,
        )
        from jitsu_spark.tables import load_table

        feats = _featurized(load_table(spark, SF_DIR, "documents"))
        model, thr = train_quality_classifier(feats)
        out = score_quality(feats, model, thr)
        plan = out._jdf.queryExecution().explainString(
            out.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Exchange" not in plan
        assert "ExistingRDD" not in plan
        assert "Scan parquet" in plan


class TestFixedModelScoring:
    """Round-10 frozen-artifact scoring (`quality_score_fixed_model`):
    the oracle-checked APPLY half of the learn/apply split."""

    def test_frozen_artifact_shape(self):
        from jitsu_spark.operators.quality_model import (
            FIXED_COEF_INT,
            FIXED_INTERCEPT,
        )

        assert len(FIXED_COEF_INT) == 64
        assert any(c != 0 for c in FIXED_COEF_INT)
        float(FIXED_INTERCEPT)  # literal text parses as a double

    def test_scores_consistent_and_bounded(self, spark):
        from jitsu_spark.operators.quality_model import (
            quality_score_fixed_model,
        )

        rows = quality_score_fixed_model(spark, SF_DIR).collect()
        assert len(rows) > 0
        for r in rows:
            assert 0.0 <= r["prob"] <= 1.0
            assert r["pred"] == (1 if r["margin"] > 0 else 0)
            # prob/margin consistency through the sigmoid
            assert (r["prob"] > 0.5) == (r["margin"] > 0) or r["prob"] == 0.5

    def test_frozen_model_agrees_with_live_training_direction(self, spark):
        """The frozen artifact is the sf0.01 fit; on any corpus drawn
        from the same synthetic generator its predictions should
        correlate strongly with a live-trained model's (same features,
        same weak-label family) — a drift canary, not an equality."""
        from pyspark.sql import functions as F

        from jitsu_spark.operators.quality_model import (
            quality_classifier_score,
            quality_score_fixed_model,
        )

        live = quality_classifier_score(spark, SF_DIR).select(
            "doc_id", F.col("pred").alias("live_pred")
        )
        frozen = quality_score_fixed_model(spark, SF_DIR).select(
            "doc_id", F.col("pred").alias("frozen_pred")
        )
        agree = (
            live.join(frozen, "doc_id")
            .agg(
                F.avg(
                    (F.col("live_pred") == F.col("frozen_pred")).cast(
                        "double"
                    )
                ).alias("a")
            )
            .first()["a"]
        )
        assert agree >= 0.8, agree
