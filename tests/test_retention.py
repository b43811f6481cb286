"""Retention sweep + GDPR erasure (`jitsu_spark/operators/retention.py`):
metadata-only TTL, partition-pruned user deletion, untouched partitions
left byte-identical on disk."""

from __future__ import annotations

import datetime as dt
import os

import pytest


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _listing(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[p] = os.stat(p).st_mtime_ns
    return out


class TestSweep:
    def test_expired_partitions_dropped_metadata_only(self, spark, tmp_path):
        from jitsu_spark.operators.retention import (
            sweep_expired_date_partitions,
        )
        from jitsu_spark.sinks import WarehouseSink

        sink = WarehouseSink(spark, str(tmp_path))
        rows = [
            (i, dt.datetime(2024, 1, 1 + i), i, "click", 1.0, "{}")
            for i in range(6)
        ]
        sink.append(_events(spark, rows), "events")
        table_dir = str(tmp_path / "events")
        before = _listing(table_dir)
        dropped = sweep_expired_date_partitions(
            spark, table_dir, keep_days=3, today=dt.date(2024, 1, 7)
        )
        assert dropped == ["2024-01-01", "2024-01-02", "2024-01-03"]
        remaining = {r.event_id for r in sink.read("events").collect()}
        assert remaining == {3, 4, 5}
        # surviving files untouched byte-for-byte (mtime unchanged)
        after = _listing(table_dir)
        for p, m in after.items():
            assert before[p] == m

    def test_non_date_partition_never_swept(self, spark, tmp_path):
        from jitsu_spark.operators.retention import (
            sweep_expired_date_partitions,
        )

        os.makedirs(tmp_path / "t" / "_p_date=not-a-date")
        dropped = sweep_expired_date_partitions(
            spark, str(tmp_path / "t"), 1, dt.date(2030, 1, 1)
        )
        assert dropped == []
        assert os.path.isdir(tmp_path / "t" / "_p_date=not-a-date")


class TestPurgeWarehouse:
    def test_only_touched_partitions_rewritten(self, spark, tmp_path):
        from jitsu_spark.operators.retention import purge_user_from_table
        from jitsu_spark.sinks import WarehouseSink

        sink = WarehouseSink(spark, str(tmp_path))
        rows = [
            # user 1 on Jan 1 and Jan 2; user 2 on Jan 2 and Jan 3
            (0, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
            (1, dt.datetime(2024, 1, 2), 1, "view", 1.0, "{}"),
            (2, dt.datetime(2024, 1, 2), 2, "click", 1.0, "{}"),
            (3, dt.datetime(2024, 1, 3), 2, "buy", 1.0, "{}"),
        ]
        sink.append(_events(spark, rows), "events")
        table_dir = str(tmp_path / "events")
        before = _listing(table_dir)
        audit = purge_user_from_table(sink, "events", 1)
        assert audit["rows_deleted"] == 2
        # Jan 2 had survivors (rewritten); Jan 1 emptied (dropped)
        assert audit["partitions_rewritten"] == 1
        assert audit["partitions_dropped"] == 1
        left = sink.read("events").collect()
        assert {r.user_id for r in left} == {2}
        assert {r.event_id for r in left} == {2, 3}
        # Jan 3 (no user-1 rows) is byte-identical; Jan 1 dir is GONE
        # (emptied); Jan 2 was rewritten
        after = _listing(table_dir)
        jan3_before = {p: m for p, m in before.items() if "2024-01-03" in p}
        for p, m in jan3_before.items():
            assert after[p] == m
        assert not os.path.isdir(
            os.path.join(table_dir, "_p_date=2024-01-01")
        )

    def test_null_timestamp_rows_are_purged(self, spark, tmp_path):
        """A null event timestamp lands in the __HIVE_DEFAULT_PARTITION__
        directory; the purge must erase those rows too — NULL isin()
        semantics and str(None) naming previously skipped the partition
        while the audit claimed success (round-9 review finding #2)."""
        from jitsu_spark.operators.retention import purge_user_from_table
        from jitsu_spark.sinks import WarehouseSink

        sink = WarehouseSink(spark, str(tmp_path))
        rows = [
            (0, dt.datetime(2024, 1, 1), 1, "click", 1.0, "{}"),
            (1, None, 1, "view", 1.0, "{}"),  # null ts -> null _p_date
            (2, None, 2, "click", 1.0, "{}"),
            (3, dt.datetime(2024, 1, 2), 2, "buy", 1.0, "{}"),
        ]
        sink.append(_events(spark, rows), "events")
        assert os.path.isdir(
            os.path.join(
                str(tmp_path / "events"), "_p_date=__HIVE_DEFAULT_PARTITION__"
            )
        )
        audit = purge_user_from_table(sink, "events", 1)
        assert audit["rows_deleted"] == 2
        left = sink.read("events").collect()
        assert {r.event_id for r in left} == {2, 3}
        # user 2's null-ts row survived the default-partition rewrite
        assert any(r.event_id == 2 for r in left)

    def test_missing_user_is_noop(self, spark, tmp_path):
        from jitsu_spark.operators.retention import purge_user_from_table
        from jitsu_spark.sinks import WarehouseSink

        sink = WarehouseSink(spark, str(tmp_path))
        sink.append(
            _events(spark, [(0, dt.datetime(2024, 1, 1), 1, "c", 1.0, "{}")]),
            "events",
        )
        before = _listing(str(tmp_path / "events"))
        audit = purge_user_from_table(sink, "events", 99)
        assert audit["rows_deleted"] == 0
        assert _listing(str(tmp_path / "events")) == before


class TestPurgeRaw:
    def test_single_hash_partition_rewritten(self, spark, tmp_path):
        from jitsu_spark.operators.profiles import append_profiles_raw
        from jitsu_spark.operators.retention import (
            purge_user_from_raw,
            raw_partition_of,
        )

        raw = str(tmp_path / "raw")
        rows = [
            (i, dt.datetime(2024, 1, 1), u, "click", 1.0, "{}")
            for i, u in enumerate([1, 1, 2, 3, 4, 5])
        ]
        append_profiles_raw(_events(spark, rows), raw)
        before = _listing(raw)
        pid = raw_partition_of(spark, 1)
        audit = purge_user_from_raw(spark, raw, 1)
        assert audit == {
            "partition_id": pid,
            "rows_deleted": 2,
            "partitions_touched": 1,
        }
        left = spark.read.parquet(raw)
        assert {r.user_id for r in left.collect()} == {2, 3, 4, 5}
        # every OTHER hash partition byte-identical
        after = _listing(raw)
        for p, m in before.items():
            if f"_partition_id={pid}" not in p:
                assert after[p] == m

    def test_purge_user_audit_frame(self, spark, tmp_path):
        from jitsu_spark.operators.profiles import append_profiles_raw
        from jitsu_spark.operators.retention import purge_user
        from jitsu_spark.sinks import WarehouseSink

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        rows = [
            (0, dt.datetime(2024, 1, 1), 7, "click", 1.0, "{}"),
            (1, dt.datetime(2024, 1, 2), 8, "view", 1.0, "{}"),
        ]
        sink.append(_events(spark, rows), "events")
        raw = str(tmp_path / "raw")
        append_profiles_raw(_events(spark, rows), raw)
        audit = {
            r.store: r.rows_deleted
            for r in purge_user(
                spark, sink, ["events"], 7, raw_dir=raw
            ).collect()
        }
        assert audit == {"warehouse:events": 1, "profiles_raw": 1}
        assert {r.user_id for r in sink.read("events").collect()} == {8}
        assert {
            r.user_id for r in spark.read.parquet(raw).collect()
        } == {8}
