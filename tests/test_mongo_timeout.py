"""S6 MongoDB destination (captured-inserter integration) and the U2
per-function timeout guard."""

from __future__ import annotations

import time

import pytest

from jitsu_spark.sinks_api import CaptureInserter, mongodb_sink, mongodb_url


class TestMongoUrl:
    def test_build_from_parts(self):
        # mongodb-destination.ts:8-25
        assert (
            mongodb_url(
                {
                    "protocol": "mongodb",
                    "hosts": ["h1:27017", "h2:27017"],
                    "database": "jitsu",
                    "username": "u",
                    "password": "p",
                    "options": {"replicaSet": "rs0"},
                }
            )
            == "mongodb://u:p@h1:27017,h2:27017/jitsu?replicaSet=rs0"
        )

    def test_url_passthrough(self):
        assert mongodb_url({"url": "mongodb://x/db"}) == "mongodb://x/db"

    def test_missing_parts_raise(self):
        with pytest.raises(ValueError, match="Hosts"):
            mongodb_url({"database": "d"})
        with pytest.raises(ValueError, match="Database"):
            mongodb_url({"hosts": ["h"]})


def test_mongodb_sink_batches_documents(spark, tmp_path):
    cap = CaptureInserter(str(tmp_path / "spool"))
    df = spark.createDataFrame(
        [(f"m{i}", i) for i in range(10)], "message_id string, n int"
    ).coalesce(2)
    mongodb_sink(df, {"collection": "events"}, inserter=cap, batch_size=3)
    inserts = cap.inserts
    assert all(c == "events" for c, _ in inserts)
    docs = [d for _, batch in inserts for d in batch]
    assert sorted(d["message_id"] for d in docs) == sorted(
        f"m{i}" for i in range(10)
    )
    assert max(len(b) for _, b in inserts) <= 3


def test_mongodb_sink_json_event_col(spark, tmp_path):
    cap = CaptureInserter(str(tmp_path / "spool2"))
    df = spark.createDataFrame(
        [('{"messageId": "m1", "type": "track"}',)], "event string"
    )
    mongodb_sink(df, {"collection": "c"}, inserter=cap, event_col="event")
    assert cap.inserts[0][1][0]["messageId"] == "m1"


def test_default_inserter_requires_driver():
    from jitsu_spark.sinks_api import _default_mongo_inserter

    try:
        import pymongo  # noqa: F401

        pytest.skip("pymongo present in this image")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="pymongo"):
        _default_mongo_inserter({"url": "mongodb://x/db"})


class TestUdfTimeout:
    def test_slow_function_times_out(self):
        from jitsu_spark.plans.chain import (
            FunctionContext,
            run_user_chain,
        )

        def slow(event, ctx):
            time.sleep(0.5)
            return event

        evs, err = run_user_chain(
            {"messageId": "m1"}, [slow], FunctionContext(), timeout_sec=0.1
        )
        # timeout forwards the partial result with the error recorded,
        # like any mid-chain failure (functions-chain.ts:352-358)
        assert err is not None and "exceeded" in err
        assert evs == [{"messageId": "m1"}]

    def test_fast_function_unaffected(self):
        from jitsu_spark.plans.chain import FunctionContext, run_user_chain

        evs, err = run_user_chain(
            {"messageId": "m1"},
            [lambda e, c: {**e, "ok": True}],
            FunctionContext(),
            timeout_sec=1.0,
        )
        assert err is None and evs[0]["ok"] is True

    def test_timeout_inside_spark_stage(self, spark):
        from jitsu_spark.plans.chain import ConnectionConfig, compile_chain

        def slow(event, ctx):
            time.sleep(0.5)
            return event

        chain = compile_chain(
            ConnectionConfig(
                connection_id="c1",
                functions=[slow],
                function_timeout_sec=0.1,
            )
        )
        df = spark.createDataFrame([('{"type": "track"}',)], "event string")
        row = chain(df).collect()[0]
        assert row._error is not None and "exceeded" in row._error
