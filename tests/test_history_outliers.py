"""Semantics tests for SCD2 attribute history and the robust MAD length
outlier filter (oracle parity covered by the contract gate)."""

from __future__ import annotations

from datetime import datetime

import pytest


class TestScd2:
    def test_change_points_and_intervals(self, spark, tmp_path):
        from jitsu_spark.operators.events_ops import scd2_user_attribute

        rows = [
            # user 1: k = 5, 5, 7, 7, 5 -> three validity intervals
            (1, "2024-01-01T10:00:00", 1, 5),
            (2, "2024-01-01T11:00:00", 1, 5),
            (3, "2024-01-01T12:00:00", 1, 7),
            (4, "2024-01-01T13:00:00", 1, 7),
            (5, "2024-01-01T14:00:00", 1, 5),
            # user 2: constant -> a single open-ended row
            (6, "2024-01-01T10:00:00", 2, 9),
            (7, "2024-01-01T11:00:00", 2, 9),
        ]
        spark.createDataFrame(
            [
                (i, datetime.fromisoformat(ts), u, "view", 0.0, '{"k": %d}' % k)
                for i, ts, u, k in rows
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
        out = (
            scd2_user_attribute(spark, str(tmp_path))
            .toPandas()
            .sort_values(["user_id", "valid_from"])
            .reset_index(drop=True)
        )
        u1 = out[out.user_id == 1]
        assert list(u1.attr) == [5, 7, 5]
        # each interval closes exactly where the next opens
        assert list(u1.valid_to)[:2] == list(u1.valid_from)[1:]
        assert list(u1.is_current) == [False, False, True]
        u2 = out[out.user_id == 2]
        assert len(u2) == 1 and bool(u2.is_current.iloc[0])


class TestMadOutliers:
    def _write(self, spark, tmp_path, rows):
        spark.createDataFrame(
            [(i, t, "en", s, len(t)) for i, t, s in rows],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
        return str(tmp_path)

    def test_flags_only_the_outlier(self, spark, tmp_path):
        from jitsu_spark.operators.quality_filters import length_outlier_mad

        # 9 docs of 7-11 tokens (median 9, MAD 1), one of 100 tokens: the
        # mega-doc flags, the rest do not (a mean/stddev z-score would
        # drag everyone)
        lens = [8, 9, 10, 9, 8, 10, 9, 11, 7]
        rows = [(i, " ".join(["w"] * n), "s0") for i, n in enumerate(lens)]
        rows.append((9, " ".join(["w"] * 100), "s0"))
        out = (
            length_outlier_mad(spark, self._write(spark, tmp_path, rows))
            .toPandas()
            .set_index("doc_id")
        )
        assert bool(out.loc[9, "flagged"])
        assert not out.drop(index=9).flagged.any()
        assert out.loc[9, "robust_z"] > 3.5

    def test_degenerate_source_mad_zero(self, spark, tmp_path):
        from jitsu_spark.operators.quality_filters import length_outlier_mad

        # all-equal lengths: MAD = 0, robust_z undefined (NULL), any
        # deviation would flag — none exists here
        rows = [(i, "a b c", "s0") for i in range(5)]
        out = length_outlier_mad(
            spark, self._write(spark, tmp_path, rows)
        ).toPandas()
        assert not out.flagged.any()
        assert out.robust_z.isna().all()
