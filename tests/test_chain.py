"""Function-chain semantics tests — modeled on the reference's
`services/rotor/__tests__/functions-chain.test.ts` and the FuncReturn
contract (`types/protocols/functions.d.ts:178-180`)."""

from __future__ import annotations

import json

import pytest

from jitsu_spark.plans.chain import (
    ConnectionConfig,
    DropError,
    FunctionContext,
    InMemoryTtlStore,
    compile_chain,
    compile_pipeline,
    passes_event_filter,
    run_user_chain,
)


def _ctx():
    return FunctionContext(props={"token": "t"})


class TestFuncReturn:
    def test_dict_replaces_event(self):
        out, err = run_user_chain({"a": 1}, [lambda e, c: {**e, "b": 2}], _ctx())
        assert out == [{"a": 1, "b": 2}] and err is None

    @pytest.mark.parametrize("ret", ["drop", None, False, []])
    def test_drop_values(self, ret):
        out, err = run_user_chain({"a": 1}, [lambda e, c: ret], _ctx())
        assert out == [] and err is None

    def test_true_passes_through(self):
        out, _ = run_user_chain({"a": 1}, [lambda e, c: True], _ctx())
        assert out == [{"a": 1}]

    def test_last_function_fans_out(self):
        out, _ = run_user_chain(
            {"a": 1}, [lambda e, c: [{"i": 1}, {"i": 2}]], _ctx()
        )
        assert out == [{"i": 1}, {"i": 2}]

    def test_mid_chain_multiplication_is_in_chain_error(self):
        # udf-wrapper-code.ts:99-110 — the violation is thrown and caught
        # by the same error path: error recorded, event passes through
        out, err = run_user_chain(
            {"a": 1},
            [lambda e, c: [{"i": 1}, {"i": 2}], lambda e, c: {**e, "next": 1}],
            _ctx(),
        )
        assert out == [{"a": 1, "next": 1}]
        assert "allowed to multiply" in err

    def test_error_forwards_partial_result(self):
        # functions-chain.ts:352-358
        def boom(e, c):
            raise RuntimeError("api down")

        out, err = run_user_chain(
            {"a": 1}, [lambda e, c: {**e, "stage1": True}, boom], _ctx()
        )
        assert out == [{"a": 1, "stage1": True}]
        assert "api down" in err

    def test_failed_function_is_identity_chain_continues(self):
        # the rotor chain test's `error_0` expectation: function1 and
        # function3 both run, the failing function2 contributes nothing
        def f1(e, c):
            return {**e, "first": "1st", "counter": e.get("counter", 0) + 1}

        def f2boom(e, c):
            raise RuntimeError("Function is not meant to run")

        def f3(e, c):
            return {**e, "third": "3rd", "counter": e.get("counter", 0) + 1}

        out, err = run_user_chain({"type": "track"}, [f1, f2boom, f3], _ctx())
        assert out == [
            {"type": "track", "first": "1st", "counter": 2, "third": "3rd"}
        ]
        assert "not meant to run" in err

    def test_pass_through_discards_in_place_mutations(self):
        # deepCopy parity (udf-wrapper-code.ts:97 + :125-130): functions
        # receive a COPY, and a pass-through return (True/undefined)
        # forwards the ORIGINAL event — in-place mutations only persist
        # when the function RETURNS the mutated event
        def mutate_and_true(e, c):
            e["enriched"] = 1
            return True

        out, err = run_user_chain({"a": 1}, [mutate_and_true], _ctx())
        assert out == [{"a": 1}] and err is None

        def mutate_and_return(e, c):
            e["enriched"] = 1
            return e

        out, err = run_user_chain({"a": 1}, [mutate_and_return], _ctx())
        assert out == [{"a": 1, "enriched": 1}] and err is None

    def test_retryable_name_matched_exactly(self):
        from jitsu_spark.plans.chain import is_retryable_error

        assert is_retryable_error("RetryError: upstream 500")
        assert is_retryable_error("Drop & RetryError: later")
        assert not is_retryable_error("RetryErrorBudgetExhausted: permanent")
        assert not is_retryable_error("ValueError: nope")
        assert not is_retryable_error(None)

    def test_failed_mutation_does_not_leak(self):
        # udf-wrapper-code.ts:97 deepCopy: a function that mutates the
        # event then throws must not leak the partial mutation
        def mutate_then_boom(e, c):
            e["poison"] = True
            raise RuntimeError("late failure")

        out, err = run_user_chain({"a": 1}, [mutate_then_boom], _ctx())
        assert out == [{"a": 1}]
        assert "late failure" in err

    def test_drop_error_drops_silently(self):
        def dropper(e, c):
            raise DropError()

        out, err = run_user_chain({"a": 1}, [dropper], _ctx())
        assert out == [] and err is None

    def test_ctx_store_and_props(self):
        def fn(e, ctx):
            seen = ctx.store.get("seen") or 0
            ctx.store.set("seen", seen + 1)
            ctx.log("hello")
            return {**e, "token": ctx.props["token"], "seen": seen}

        ctx = _ctx()
        out1, _ = run_user_chain({}, [fn], ctx)
        out2, _ = run_user_chain({}, [fn], ctx)
        assert out1 == [{"token": "t", "seen": 0}]
        assert out2 == [{"token": "t", "seen": 1}]
        assert ctx.logs == ["hello", "hello"]


class TestEventContextFields:
    """FullContext parity (functions.d.ts:127-175): geo/ua/headers are
    request-scoped (refreshed per event from its context block);
    source/destination/connection/workspace are connection constants."""

    def test_per_event_geo_ua_headers(self, spark):
        import json

        def read_ctx(e, ctx):
            return {
                **e,
                "seen_country": (ctx.geo.get("country") or {}).get("code"),
                "seen_browser": (ctx.ua.get("browser") or {}).get("name"),
                "seen_header": ctx.headers.get("x-forwarded-for"),
            }

        events = [
            {
                "message_id": "m1",
                "context": {
                    "geo": {"country": {"code": "AT"}},
                    "ua": {"browser": {"name": "Firefox"}},
                    "headers": {"x-forwarded-for": "1.2.3.4"},
                },
            },
            {"message_id": "m2"},  # no context: fields reset to empty
        ]
        df = spark.createDataFrame(
            [(json.dumps(e),) for e in events], "event string"
        ).coalesce(1)
        cfg = ConnectionConfig(connection_id="c", functions=[read_ctx])
        out = {
            json.loads(r.event)["message_id"]: json.loads(r.event)
            for r in compile_chain(cfg)(df).collect()
        }
        assert out["m1"]["seen_country"] == "AT"
        assert out["m1"]["seen_browser"] == "Firefox"
        assert out["m1"]["seen_header"] == "1.2.3.4"
        assert out["m2"]["seen_country"] is None
        assert out["m2"]["seen_header"] is None

    def test_connection_scoped_constants(self, spark):
        import json

        def read_ctx(e, ctx):
            return {
                **e,
                "src": ctx.source.get("id"),
                "dst": ctx.destination.get("type"),
                "conn": ctx.connection.get("id"),
                "ws": ctx.workspace.get("id"),
            }

        df = spark.createDataFrame(
            [(json.dumps({"message_id": "m1"}),)], "event string"
        )
        cfg = ConnectionConfig(
            connection_id="conn-9",
            functions=[read_ctx],
            source={"id": "site-a", "type": "browser"},
            destination={"id": "wh-1", "type": "postgres"},
            workspace={"id": "ws-7"},
        )
        (row,) = compile_chain(cfg)(df).collect()
        ev = json.loads(row.event)
        assert ev["src"] == "site-a"
        assert ev["dst"] == "postgres"
        assert ev["conn"] == "conn-9"
        assert ev["ws"] == "ws-7"


class TestEventFilter:
    # lib/index.ts:231-242
    def test_star_keeps_all(self):
        assert passes_event_filter({"type": "page"}, "*")

    def test_empty_drops_page_screen(self):
        assert not passes_event_filter({"type": "page"}, "")
        assert not passes_event_filter({"type": "screen"}, "")
        assert passes_event_filter({"type": "track"}, "")

    def test_csv_matches_type_or_name(self):
        assert passes_event_filter({"type": "track"}, "track,identify")
        assert passes_event_filter(
            {"type": "track", "event": "Order Completed"}, "Order Completed"
        )
        assert not passes_event_filter({"type": "page"}, "track")


def test_ttl_store_expiry():
    import time

    store = InMemoryTtlStore()
    store.set("k", "v", 0)  # expires immediately
    time.sleep(0.01)
    assert store.get("k") is None
    store.set("k", "v2")
    assert store.get("k") == "v2"
    store.delete("k")
    assert store.get("k") is None


def test_ttl_stores_agree_on_units(tmp_path):
    """Round-3 review: the in-memory double and the durable store MUST
    interpret set()'s opts identically — a UDF tested against one keeps
    the same TTLs on the other (seconds, duration strings, dict opts,
    legacy ttl_days)."""
    from jitsu_spark.plans.store import FileTtlStore

    mem = InMemoryTtlStore()
    dur = FileTtlStore(str(tmp_path), "c")
    for opts, kw in [
        (3600, {}),
        ("1h", {}),
        ({"ttl": "2d"}, {}),
        ("inf", {}),
        (None, {"ttl_days": 7}),
        (None, {}),
    ]:
        mem.set("k", "v", opts, **kw)
        dur.set("k", "v", opts, **kw)
        m, d = mem.ttl("k"), dur.ttl("k")
        assert m == d or abs(m - d) <= 1, (opts, kw, m, d)


def test_compiled_chain_on_dataframe(spark):
    events = [
        {"message_id": "m1", "type": "track", "event": "Sign Up"},
        {"message_id": "m2", "type": "page"},
        {"message_id": "m3", "type": "track", "event": "Order Completed"},
    ]
    df = spark.createDataFrame(
        [(json.dumps(e),) for e in events], "event string"
    )

    def tag(e, ctx):
        return {**e, "tagged": True}

    cfg = ConnectionConfig(
        connection_id="c1", events_filter="track", functions=[tag]
    )
    out = [json.loads(r.event) for r in compile_chain(cfg)(df).collect()]
    assert {e["message_id"] for e in out} == {"m1", "m3"}
    assert all(e["tagged"] for e in out)


def test_chain_log_side_channel(spark, tmp_path):
    """ctx.log lines surface as events-log rows (U1 -> S8)."""
    from pyspark.sql import functions as F

    from jitsu_spark.plans.chain import chain_log_rows
    from jitsu_spark.sinks_api import append_events_log

    def noisy(e, ctx):
        ctx.log(f"processing {e['message_id']}")
        return e

    def maybe_boom(e, ctx):
        if e["message_id"] == "m2":
            raise RuntimeError("mapping failed")
        return e

    events = [{"message_id": "m1"}, {"message_id": "m2"}]
    df = spark.createDataFrame([(json.dumps(e),) for e in events], "event string")
    cfg = ConnectionConfig(connection_id="c", functions=[noisy, maybe_boom])
    processed = compile_chain(cfg)(df).cache()
    logs = chain_log_rows(processed)
    append_events_log(logs, str(tmp_path / "log"))
    rows = spark.read.parquet(str(tmp_path / "log"))
    by_level = {
        (r.actor_id, r.level): r.message for r in rows.collect()
    }
    assert by_level[("m1", "info")] == "processing m1"
    assert "mapping failed" in by_level[("m2", "error")]
    processed.unpersist()


def test_compiled_pipeline_layout_routing(spark):
    events = [
        {
            "messageId": "m1",
            "type": "track",
            "event": "Order Completed",
            "timestamp": "2024-01-01T00:00:01Z",
            "properties": {"revenue": 99.5},
        }
    ]
    df = spark.createDataFrame([(json.dumps(e),) for e in events], "event string")
    cfg = ConnectionConfig(connection_id="c1", layout="segment")
    rows = compile_pipeline(cfg)(df).collect()
    # segment layout fans a named track event into tracks + its own table
    # (bulker-destination.ts:263-267); properties land only in the named row
    by_table = {r._table: json.loads(r.event) for r in rows}
    assert sorted(by_table) == ["Order Completed", "tracks"]
    assert by_table["Order Completed"]["revenue"] == 99.5
    assert "revenue" not in by_table["tracks"]


class TestCryptoHelpers:
    """ctx.crypto mirrors the isolate's crypto surface (udf_wrapper.ts:78-84)."""

    def test_hash_hex_and_base64(self):
        from jitsu_spark.plans.chain import CryptoHelpers
        import hashlib, base64

        c = CryptoHelpers()
        assert c.hash("sha256", "abc") == hashlib.sha256(b"abc").hexdigest()
        assert c.hash("md5", "abc", "base64") == base64.b64encode(
            hashlib.md5(b"abc").digest()
        ).decode()

    def test_random_helpers_shapes(self):
        from jitsu_spark.plans.chain import CryptoHelpers

        c = CryptoHelpers()
        assert len(c.randomBytes(16)) == 16
        u = c.randomUUID()
        assert len(u) == 36 and u.count("-") == 4
        for _ in range(50):
            assert 0 <= c.randomInt(10) < 10
            assert 5 <= c.randomInt(5, 8) < 8

    def test_user_function_sees_crypto(self):
        from jitsu_spark.plans.chain import FunctionContext, run_user_chain

        def fn(ev, ctx):
            ev["sig"] = ctx.crypto.hash("sha256", ev["id"])
            return ev

        out, err = run_user_chain({"id": "e1"}, [fn], FunctionContext())
        assert err is None
        import hashlib

        assert out[0]["sig"] == hashlib.sha256(b"e1").hexdigest()


class TestMemoryGuard:
    """U2 opt-in allocation budget (udf_wrapper.ts:58 — 128MB isolate)."""

    def test_hog_recorded_as_error(self):
        from jitsu_spark.plans.chain import FunctionContext, run_user_chain

        def hog(ev, ctx):
            big = list(range(3_000_000))  # ~100+ MB of ints
            return {**ev, "n": len(big)}

        # timeout disabled: tracemalloc makes the hog slow enough to race
        # the 5 s wall-clock guard on a loaded host, and this test is about
        # the allocation budget only
        out, err = run_user_chain(
            {"id": 1}, [hog], FunctionContext(), timeout_sec=None, memory_mb=16
        )
        assert err is not None and "FunctionMemoryError" in err
        # partial forward: the original event survives
        assert out == [{"id": 1}]

    def test_frugal_function_passes(self):
        from jitsu_spark.plans.chain import FunctionContext, run_user_chain

        out, err = run_user_chain(
            {"id": 1}, [lambda ev, ctx: {**ev, "ok": True}], FunctionContext(),
            memory_mb=16,
        )
        assert err is None
        assert out == [{"id": 1, "ok": True}]

    def test_guard_off_by_default(self):
        from jitsu_spark.plans.chain import FunctionContext, run_user_chain

        def hog(ev, ctx):
            big = list(range(3_000_000))
            return {**ev, "n": len(big)}

        out, err = run_user_chain({"id": 1}, [hog], FunctionContext())
        assert err is None and out[0]["n"] == 3_000_000

    def test_untrusted_chain_defaults_budget_on(self, spark):
        """U2 default-on: an allocation-bomb UDF in an untrusted chain is
        killed (128 MB, udf_wrapper.ts:58), the error surfaces as an
        events-log row, and the batch still completes — kill-don't-crash,
        same contract as the 5 s wall-clock guard."""
        import json

        def bomb(e, ctx):
            big = list(range(30_000_000))  # ~1+ GB of ints
            return {**e, "n": len(big)}

        def tail(e, ctx):
            return {**e, "tail": True}

        events = [{"message_id": "m1"}, {"message_id": "m2"}]
        df = spark.createDataFrame(
            [(json.dumps(e),) for e in events], "event string"
        )
        cfg = ConnectionConfig(
            connection_id="c",
            functions=[bomb, tail],
            untrusted=True,
            function_timeout_sec=None,  # isolate the allocation budget
        )
        rows = compile_chain(cfg)(df).collect()
        out = {json.loads(r.event)["message_id"]: r for r in rows}
        # batch completed: both events delivered, bomb acted as identity,
        # the rest of the chain still ran
        assert set(out) == {"m1", "m2"}
        for r in rows:
            ev = json.loads(r.event)
            assert "n" not in ev and ev["tail"] is True
            # in-process tracemalloc guard records FunctionMemoryError;
            # the Linux subprocess isolate (round 4) surfaces the RLIMIT
            # hit as a MemoryError from inside the child — both carry
            # the MemoryError family name
            assert "MemoryError" in r._error

    def test_trusted_chain_budget_stays_off(self, spark):
        import json

        def hog(e, ctx):
            big = list(range(3_000_000))
            return {**e, "n": len(big)}

        df = spark.createDataFrame(
            [(json.dumps({"message_id": "m1"}),)], "event string"
        )
        cfg = ConnectionConfig(connection_id="c", functions=[hog])
        (row,) = compile_chain(cfg)(df).collect()
        assert row._error is None
        assert json.loads(row.event)["n"] == 3_000_000


def test_unsupported_return_is_per_event_error(spark):
    """A UDF returning an unsupported type (e.g. an int) is a recorded
    per-event error with identity pass-through — not a raised TypeError
    that poison-pills the whole mapInPandas task (round-9 spine review
    finding #5)."""
    import json as _json

    from jitsu_spark.plans.chain import ConnectionConfig, compile_chain

    def bad_return(e, ctx):
        if e.get("k") == "bad":
            return 42
        return {**e, "ok": True}

    df = spark.createDataFrame(
        [(_json.dumps({"type": "track", "k": k}),) for k in ("good", "bad")],
        "event string",
    )
    rows = {
        _json.loads(r.event)["k"]: r
        for r in compile_chain(
            ConnectionConfig(connection_id="badret", functions=[bad_return])
        )(df).collect()
    }
    assert rows["good"]._error is None
    assert _json.loads(rows["good"].event)["ok"] is True
    assert rows["bad"]._error is not None
    assert "unsupported function return" in rows["bad"]._error
    # identity pass-through: the bad event flows unmodified
    assert _json.loads(rows["bad"].event) == {"type": "track", "k": "bad"}
