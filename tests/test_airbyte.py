"""Airbyte message protocol (`jitsu_spark/sources/airbyte.py`) — parse a
captured connector run, route per-stream records under SyncOptionsType
settings (schema/index.ts:228-245), checkpoint the last STATE."""

from __future__ import annotations

import json
import os


def _write_capture(tmp_path, lines):
    path = str(tmp_path / "capture")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "out.jsonl"), "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    return path


def _rec(stream, data, at=1704067200000):
    return {
        "type": "RECORD",
        "record": {"stream": stream, "data": json.dumps(data), "emitted_at": at},
    }


CAPTURE = [
    {"type": "LOG", "log": {"level": "INFO", "message": "starting"}},
    _rec("users", {"id": 1, "email": "a@x.io"}),
    _rec("users", {"id": 2, "email": "b@x.io"}),
    {"type": "STATE", "state": {"data": json.dumps({"users": {"cursor": 2}})}},
    _rec("orders", {"order_id": 10, "total": 99.5}),
    _rec("users", {"id": 3, "email": "c@x.io"}),
    {"type": "STATE", "state": {"data": json.dumps({"users": {"cursor": 3}, "orders": {"cursor": 10}})}},
    {"type": "LOG", "log": {"level": "ERROR", "message": "rate limited once"}},
]


class TestParsing:
    def test_streams_and_records(self, spark, tmp_path):
        from jitsu_spark.sources.airbyte import (
            discovered_streams,
            read_airbyte_messages,
            stream_records,
        )

        msgs = read_airbyte_messages(spark, _write_capture(tmp_path, CAPTURE))
        assert discovered_streams(msgs) == ["orders", "users"]
        users = stream_records(msgs, "users").collect()
        assert len(users) == 3
        assert json.loads(users[0].data)["email"] == "a@x.io"
        assert str(users[0].emitted_at).startswith("2024-01-01")

    def test_latest_state_wins(self, spark, tmp_path):
        from jitsu_spark.sources.airbyte import latest_state

        path = _write_capture(tmp_path, CAPTURE)
        assert latest_state(spark, path) == {
            "users": {"cursor": 3},
            "orders": {"cursor": 10},
        }

    def test_latest_state_ordered_by_file_then_line(self, spark, tmp_path):
        """Round-3 review: with multiple capture files the checkpoint
        must come from the LAST line of the LAST file, regardless of
        how Spark packs input splits (a big early file must not win)."""
        from jitsu_spark.sources.airbyte import latest_state

        path = str(tmp_path / "cap")
        os.makedirs(path)
        # earlier file: much larger, carries a stale cursor
        with open(os.path.join(path, "part-000.jsonl"), "w") as f:
            for i in range(500):
                f.write(json.dumps(_rec("users", {"id": i})) + "\n")
            f.write(
                json.dumps(
                    {"type": "STATE",
                     "state": {"data": json.dumps({"users": {"cursor": 1}})}}
                )
                + "\n"
            )
        # later file: tiny, carries the real final cursor
        with open(os.path.join(path, "part-001.jsonl"), "w") as f:
            f.write(
                json.dumps(
                    {"type": "STATE",
                     "state": {"data": json.dumps({"users": {"cursor": 500}})}}
                )
                + "\n"
            )
        assert latest_state(spark, path) == {"users": {"cursor": 500}}

    def test_latest_state_numeric_aware_file_order(self, spark, tmp_path):
        """Round-4 ADVICE: unpadded numeric file names must order
        numerically — lexicographic descent crowns part-9 over part-10
        and persists a stale cursor from the earlier capture file."""
        from jitsu_spark.sources.airbyte import latest_state

        path = str(tmp_path / "cap")
        os.makedirs(path)

        def _state_line(cursor):
            return (
                json.dumps(
                    {"type": "STATE",
                     "state": {"data": json.dumps({"users": {"cursor": cursor}})}}
                )
                + "\n"
            )

        # part-9 sorts AFTER part-10 lexicographically but BEFORE it
        # numerically; the real final cursor lives in part-10.
        with open(os.path.join(path, "part-9.jsonl"), "w") as f:
            f.write(_state_line(9))
        with open(os.path.join(path, "part-10.jsonl"), "w") as f:
            f.write(_state_line(100))
        assert latest_state(spark, path) == {"users": {"cursor": 100}}

    def test_no_state_returns_none(self, spark, tmp_path):
        from jitsu_spark.sources.airbyte import latest_state

        path = _write_capture(tmp_path, [_rec("users", {"id": 1})])
        assert latest_state(spark, path) is None

    def test_connector_logs(self, spark, tmp_path):
        from jitsu_spark.sources.airbyte import (
            connector_logs,
            read_airbyte_messages,
        )

        msgs = read_airbyte_messages(spark, _write_capture(tmp_path, CAPTURE))
        logs = {(r.level, r.message) for r in connector_logs(msgs).collect()}
        assert logs == {("info", "starting"), ("error", "rate limited once")}


class TestStateRobustness:
    """Round-6 ADVICE: URI-encoded paths, non-posix fallback, and
    descending-file retry when the last file's state is unusable."""

    def test_latest_state_with_uri_encoded_path(self, spark, tmp_path):
        """input_file_name() URI-encodes paths (space -> %20); the driver
        tail must decode before open() or it raises FileNotFoundError."""
        from jitsu_spark.sources.airbyte import latest_state

        path = str(tmp_path / "cap with space")
        os.makedirs(path)
        with open(os.path.join(path, "out.jsonl"), "w") as f:
            for line in CAPTURE:
                f.write(json.dumps(line) + "\n")
        assert latest_state(spark, path) == {
            "users": {"cursor": 3},
            "orders": {"cursor": 10},
        }

    def test_local_capture_path_decoding(self):
        from jitsu_spark.sources.airbyte import _local_capture_path

        assert (
            _local_capture_path("file:/tmp/cap%20with%20space/out.jsonl")
            == "/tmp/cap with space/out.jsonl"
        )
        assert _local_capture_path("/tmp/plain/out.jsonl") == "/tmp/plain/out.jsonl"
        # object-store schemes route to the Spark-side tail
        assert _local_capture_path("s3a://bucket/cap/out.jsonl") is None
        assert _local_capture_path("hdfs://nn/cap/out.jsonl") is None

    def test_spark_side_tail_matches_driver_tail(self, spark, tmp_path):
        """The non-posix fallback tail returns the same file-order-last
        STATE line as the O(1) driver reader (exercised here over file:
        since the sandbox has no object store — the code path is scheme-
        agnostic: read one file, max monotonically_increasing_id)."""
        from jitsu_spark.sources.airbyte import (
            _last_state_line,
            _last_state_line_spark,
        )

        path = _write_capture(tmp_path, CAPTURE)
        f = os.path.join(path, "out.jsonl")
        assert _last_state_line_spark(spark, f).strip() == _last_state_line(
            f
        ).strip()

    def test_falls_back_to_earlier_file_on_bad_state(self, spark, tmp_path):
        """If the naturally-last file's last STATE line lacks state.data,
        the previous file's valid cursor wins instead of returning None."""
        from jitsu_spark.sources.airbyte import latest_state

        path = str(tmp_path / "cap")
        os.makedirs(path)
        with open(os.path.join(path, "part-0.jsonl"), "w") as f:
            f.write(
                json.dumps(
                    {"type": "STATE",
                     "state": {"data": json.dumps({"users": {"cursor": 7}})}}
                )
                + "\n"
            )
        with open(os.path.join(path, "part-1.jsonl"), "w") as f:
            # STATE-typed but with a null payload: parses permissively,
            # fails the strict data extraction
            f.write(json.dumps({"type": "STATE", "state": {}}) + "\n")
        assert latest_state(spark, path) == {"users": {"cursor": 7}}

    def test_all_states_bad_returns_none(self, spark, tmp_path):
        from jitsu_spark.sources.airbyte import latest_state

        path = str(tmp_path / "cap")
        os.makedirs(path)
        with open(os.path.join(path, "part-0.jsonl"), "w") as f:
            f.write(json.dumps({"type": "STATE", "state": {}}) + "\n")
        assert latest_state(spark, path) is None

    def test_discovery_probe_gates_json_parse(self, spark, tmp_path):
        """r6 review item 9: stream discovery filters on the raw line's
        '"RECORD"' substring BELOW the from_json projection, so a huge
        capture's non-record lines never pay the JSON parse."""
        from jitsu_spark.sources.airbyte import (
            _record_stream_names,
            read_airbyte_messages,
        )

        msgs = read_airbyte_messages(spark, _write_capture(tmp_path, CAPTURE))
        plan = _record_stream_names(msgs)._jdf.queryExecution(
        ).optimizedPlan().toString()
        assert "Contains" in plan
        # deeper tree nodes print later: the Contains filter must sit
        # BELOW (after) the from_json projection in the optimized plan
        assert plan.index("Contains") > plan.index("from_json")


class TestNaming:
    def test_table_name_rules(self):
        from jitsu_spark.sources.airbyte import target_table_name

        assert target_table_name("Users", {}) == "Users"
        assert target_table_name("Users", {"table_name": "crm_users"}) == "crm_users"
        assert (
            target_table_name("Users", {}, table_name_prefix="src_")
            == "src_Users"
        )
        assert (
            target_table_name("Users", {}, "src_", to_same_case=True)
            == "src_users"
        )


class TestSyncRun:
    def test_full_refresh_and_incremental(self, spark, tmp_path):
        from jitsu_spark.sinks import WarehouseSink
        from jitsu_spark.sources.airbyte import run_airbyte_sync

        sink = WarehouseSink(spark, str(tmp_path / "wh"))
        opts = {
            "tableNamePrefix": "ab_",
            "toSameCase": True,
            "streams": {
                "users": {"sync_mode": "incremental"},
                "orders": {"sync_mode": "full_refresh"},
            },
        }
        cap = _write_capture(tmp_path, CAPTURE)
        report = run_airbyte_sync(spark, cap, opts, sink)
        assert report["users"] == {"table": "ab_users", "rows": 3, "mode": "incremental"}
        assert report["orders"]["mode"] == "full_refresh"
        assert report["_state"]["users"]["cursor"] == 3
        assert sink.read("ab_users").count() == 3
        assert sink.read("ab_orders").count() == 1

        # re-running the same capture is idempotent for incremental
        # (record-hash MERGE) and stable for full_refresh (replace)
        run_airbyte_sync(spark, cap, opts, sink)
        assert sink.read("ab_users").count() == 3
        assert sink.read("ab_orders").count() == 1


class TestLargeCapture:
    def test_large_capture_state_without_wholefile_rows(self, spark, tmp_path):
        """r5 review: a big connector run must not materialize whole
        capture files as single rows. 60k record lines across 3 files
        (~8 MB) resolve the cursor correctly, and the within-file tail
        read streams with O(1) memory (`_last_state_line`)."""
        cap = tmp_path / "cap"
        cap.mkdir()
        for part in range(3):
            with open(cap / f"part-{part}.jsonl", "w") as f:
                for i in range(20_000):
                    f.write(
                        json.dumps(_rec("users", {"id": part * 20_000 + i,
                                                  "pad": "x" * 80}))
                        + "\n"
                    )
                f.write(
                    json.dumps(
                        {"type": "STATE",
                         "state": {"data": json.dumps(
                             {"users": {"cursor": (part + 1) * 20_000}})}}
                    )
                    + "\n"
                )
        from jitsu_spark.sources.airbyte import (
            _last_state_line,
            latest_state,
            read_airbyte_messages,
        )

        # the last file's last STATE wins, numeric-aware
        assert latest_state(spark, str(cap)) == {"users": {"cursor": 60_000}}
        # record loads stay distributed: the message read is a plain
        # line scan (splittable), never a wholetext one-row-per-file read
        msgs = read_airbyte_messages(spark, str(cap))
        assert msgs.where("type = 'RECORD'").count() == 60_000
        plan = msgs._jdf.queryExecution().optimizedPlan().toString()
        assert "wholetext" not in plan.lower()
        # the tail reader streams one file and finds its last STATE line
        line = _last_state_line(str(cap / "part-2.jsonl"))
        assert json.loads(json.loads(line)["state"]["data"]) == {
            "users": {"cursor": 60_000}
        }


def test_latest_state_accepts_object_data(spark, tmp_path):
    """Round-9 sources review #3: protocol-conformant connectors emit
    state.data as a JSON OBJECT (not a dumped string); the object form
    must yield the cursor, not a silently-swallowed TypeError."""
    import json

    from jitsu_spark.sources.airbyte import latest_state

    p = tmp_path / "cap"
    p.mkdir()
    (p / "part-0.jsonl").write_text(
        "\n".join(
            [
                json.dumps({"type": "RECORD", "record": {"stream": "u",
                                                          "data": {"id": 1}}}),
                json.dumps({"type": "STATE",
                            "state": {"data": {"users": {"cursor": 7}}}}),
            ]
        )
    )
    assert latest_state(spark, str(p)) == {"users": {"cursor": 7}}
