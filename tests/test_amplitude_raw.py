"""Amplitude mapping + profiles raw-store tests."""

from __future__ import annotations

from jitsu_spark.events.destinations import amplitude_events
from jitsu_spark.plans.chain import FunctionContext


class TestAmplitude:
    def test_identify(self):
        (e,) = amplitude_events(
            {"type": "identify", "userId": "u1", "messageId": "m1",
             "traits": {"plan": "pro"}}
        )
        assert e["event_type"] == "$identify"
        assert e["user_properties"] == {"$set": {"plan": "pro"}}
        assert e["user_id"] == "u1"

    def test_group(self):
        (e,) = amplitude_events(
            {"type": "group", "userId": "u1", "groupId": "g1",
             "traits": {"name": "Acme"}}
        )
        assert e["event_type"] == "$groupidentify"
        assert e["groups"] == {"group": "g1"}

    def test_track_session_reuse(self):
        ctx = FunctionContext()
        e1 = amplitude_events(
            {"type": "track", "event": "A", "anonymousId": "d1",
             "messageId": "m1", "timestamp": "t1"}, ctx
        )[0]
        e2 = amplitude_events(
            {"type": "track", "event": "B", "anonymousId": "d1",
             "messageId": "m2", "timestamp": "t2"}, ctx
        )[0]
        # same device within the session window -> same session id
        assert e1["session_id"] == e2["session_id"] == "t1"
        assert e1["device_id"] == "d1"

    def test_anonymous_identify_dropped(self):
        assert amplitude_events({"type": "identify"}) == []


def test_profiles_raw_partition_pruning(spark, tmp_path, sf_dir):
    from jitsu_spark.operators.profiles import (
        RAW_PARTITIONS,
        append_profiles_raw,
        read_profiles_raw,
    )
    from jitsu_spark.tables import load_table

    raw_dir = str(tmp_path / "raw")
    ev = load_table(spark, sf_dir, "events").limit(500)
    append_profiles_raw(ev, raw_dir)
    full = read_profiles_raw(spark, raw_dir)
    assert full.count() == 500
    pids = [r[0] for r in full.select("_partition_id").distinct().collect()]
    assert all(0 <= p < RAW_PARTITIONS for p in pids)
    # per-instance slice reads a strict subset
    half = read_profiles_raw(spark, raw_dir, (0, RAW_PARTITIONS // 2))
    assert 0 < half.count() < 500
