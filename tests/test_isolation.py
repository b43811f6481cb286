"""U2 process isolation (`jitsu_spark/plans/isolate.py`): untrusted UDF
chains run in a forked child with an RLIMIT_AS hard cap and a parent
watchdog kill — the reference's disposable 128 MB isolate
(`udf_wrapper.ts:58,234-239`). The round-3 gap: tracemalloc misses
C-extension allocations and SIGALRM can be blocked or held off by native
code; both escapes must now be contained."""

from __future__ import annotations

import json

import pytest

from jitsu_spark.plans.chain import (
    ConnectionConfig,
    FunctionContext,
    InMemoryTtlStore,
    compile_chain,
)
from jitsu_spark.plans.isolate import IsolatedChainRunner, supports_isolation

pytestmark = pytest.mark.skipif(
    not supports_isolation(), reason="fork/RLIMIT isolation is Linux-only"
)


def _ctx_factory():
    return FunctionContext(props={}, store=InMemoryTtlStore())


def _ok(ev, ctx):
    ev["seen"] = True
    return ev


def _numpy_alloc_bomb(ev, ctx):
    # C-extension allocation: numpy mallocs outside the Python allocator,
    # invisible to tracemalloc. Chunked so no single giant request — the
    # cumulative budget has to be what stops it.
    import numpy as np

    hoard = []
    for _ in range(200):
        hoard.append(np.ones((4 << 20,), dtype=np.float64))  # 32 MB each
    return ev


def _native_spin_blocking_sigalrm(ev, ctx):
    # Hostile UDF: blocks the in-child SIGALRM guard, then spins — the
    # shape of native code SIGALRM cannot interrupt. Only the parent
    # watchdog SIGKILL can end this.
    import signal

    signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGALRM})
    while True:
        pass


class TestRunnerDirect:
    """Runner-level contracts, no Spark in the loop."""

    def test_normal_events_round_trip(self):
        r = IsolatedChainRunner([_ok], _ctx_factory, 5.0, 128)
        try:
            evs, err, logs, fetch = r.run({"type": "track", "n": 1})
            assert err is None and evs == [{"type": "track", "n": 1, "seen": True}]
            evs, err, *_ = r.run({"type": "track", "n": 2})
            assert err is None and evs[0]["n"] == 2
        finally:
            r.close()

    def test_alloc_bomb_contained_and_child_survives_batch(self):
        r = IsolatedChainRunner([_numpy_alloc_bomb], _ctx_factory, 5.0, 128)
        try:
            evs, err, *_ = r.run({"id": "bomb"})
            # RLIMIT_AS makes the malloc fail -> MemoryError recorded as
            # an in-chain error (or, worst case, the child dies and the
            # parent reports the death). On a HEAVILY loaded host the
            # chunked allocation loop can outlast the watchdog budget
            # first, in which case containment arrives as the timeout
            # kill instead — the contract under test is CONTAINMENT
            # (identity + error + the batch continues), not which guard
            # fires first (observed flake: parallel full-suite run).
            assert err is not None and (
                "MemoryError" in err or "TimeoutError" in err
            )
            assert evs == [{"id": "bomb"}]
            # the runner keeps serving the rest of the batch
            evs, err, *_ = r.run({"id": "after"})
            # chain still only has the bomb function; it errors again but
            # the call returns promptly instead of wedging the task
            assert evs == [{"id": "after"}]
        finally:
            r.close()

    def test_native_spin_killed_by_watchdog(self):
        r = IsolatedChainRunner(
            [_native_spin_blocking_sigalrm], _ctx_factory, 1.0, 128
        )
        try:
            import time

            t0 = time.time()
            evs, err, *_ = r.run({"id": "spin"})
            elapsed = time.time() - t0
            assert err is not None and "FunctionTimeoutError" in err
            assert "killed" in err
            assert evs == [{"id": "spin"}]
            # budget = 1s + grace 2s; the kill must not hang the parent
            assert elapsed < 10
        finally:
            r.close()

    def test_respawn_after_kill_serves_next_event(self):
        r = IsolatedChainRunner(
            [_native_spin_blocking_sigalrm], _ctx_factory, 1.0, 128
        )
        try:
            _, err1, *_ = r.run({"id": "a"})
            assert "FunctionTimeoutError" in err1
            # fresh child spawned transparently for the next event
            _, err2, *_ = r.run({"id": "b"})
            assert "FunctionTimeoutError" in err2
        finally:
            r.close()

    def test_python_timeout_handled_in_child_without_respawn(self):
        # a plain Python loop is interrupted by the in-child SIGALRM
        # guard: error recorded, SAME child keeps serving (no disposal)
        def py_spin(ev, ctx):
            while True:
                pass

        r = IsolatedChainRunner([py_spin], _ctx_factory, 1.0, 128)
        try:
            _, err, *_ = r.run({"id": "x"})
            assert err is not None and "FunctionTimeoutError" in err
            pid_before = r._proc.pid
            _, err2, *_ = r.run({"id": "y"})
            assert r._proc.pid == pid_before  # in-child guard, no kill
        finally:
            r.close()


class TestChainIntegration:
    """End-to-end: untrusted ConnectionConfig -> mapInPandas stage with
    hostile UDFs; the Spark batch completes, errors land in _error (the
    events-log row source), the executor survives."""

    def _events_df(self, spark, events):
        return spark.createDataFrame(
            [(json.dumps(e),) for e in events], "event string"
        )

    def test_bomb_and_spin_recorded_batch_completes(self, spark):
        def tag(ev, ctx):
            ev["tagged"] = True
            return ev

        def hostile(ev, ctx):
            if ev.get("kind") == "bomb":
                return _numpy_alloc_bomb(ev, ctx)
            if ev.get("kind") == "spin":
                return _native_spin_blocking_sigalrm(ev, ctx)
            return ev

        cfg = ConnectionConfig(
            connection_id="c-iso",
            functions=[hostile, tag],
            untrusted=True,
            function_timeout_sec=1.0,
        )
        df = self._events_df(
            spark,
            [
                {"type": "track", "kind": "ok", "n": 1},
                {"type": "track", "kind": "bomb", "n": 2},
                {"type": "track", "kind": "spin", "n": 3},
                {"type": "track", "kind": "ok", "n": 4},
            ],
        ).coalesce(1)
        rows = compile_chain(cfg)(df).collect()
        by_n = {json.loads(r.event)["n"]: r for r in rows}
        assert set(by_n) == {1, 2, 3, 4}
        # clean events fully processed by BOTH functions
        assert json.loads(by_n[1].event)["tagged"] is True
        assert json.loads(by_n[4].event)["tagged"] is True
        assert by_n[1]._error is None and by_n[4]._error is None
        # hostile events: identity + error recorded (events-log row feed).
        # The bomb is contained by WHICHEVER guard fires first: the
        # RLIMIT malloc failure (MemoryError) normally, or — when the
        # fresh fork's first cold allocation pass outlasts the tight 1 s
        # test budget — the wall-clock guard. Both are the containment
        # contract; which one wins is a timing race by construction.
        assert (
            "MemoryError" in by_n[2]._error
            or "FunctionTimeoutError" in by_n[2]._error
        ), by_n[2]._error
        # the signal-blocking spin can ONLY die by the parent watchdog
        assert "FunctionTimeoutError" in by_n[3]._error

    def test_trusted_chain_unchanged(self, spark):
        # trusted chains keep the in-process path (no fork tax) with
        # identical output semantics
        def remember(ev, ctx):
            ctx.store.set("last", ev["n"], "1h")
            ev["pid_tag"] = True
            return ev

        cfg = ConnectionConfig(
            connection_id="c-trusted", functions=[remember], untrusted=False
        )
        df = self._events_df(spark, [{"type": "track", "n": 7}]).coalesce(1)
        out = compile_chain(cfg)(df).collect()
        assert len(out) == 1 and out[0]._error is None
        assert json.loads(out[0].event)["pid_tag"] is True


def test_explicit_no_timeout_disables_watchdog_deadline():
    """An operator's function_timeout_sec=None means NO deadline — the
    runner must not invent one (the memory cap still applies)."""
    r = IsolatedChainRunner([_ok], _ctx_factory, None, 128)
    try:
        assert r._budget is None
        import time

        def slow(ev, ctx):
            time.sleep(6.5)  # longer than any default per-fn budget
            ev["done"] = True
            return ev

        r2 = IsolatedChainRunner([slow], _ctx_factory, None, 128)
        try:
            evs, err, *_ = r2.run({"x": 1})
            assert err is None and evs[0]["done"] is True
        finally:
            r2.close()
    finally:
        r.close()


class TestImportScreen:
    """U2 round-10: the udf_wrapper.ts:86-88,146-153 analog — untrusted
    function source is AST-screened before it ever enters the isolate.
    A smuggled import/open/__import__ refuses the chain with a recorded
    per-event error; the batch completes; nothing executes."""

    def test_screen_source_unit(self):
        from jitsu_spark.plans.import_screen import screen_source

        # allowed stdlib passes
        assert screen_source("def f(e, ctx):\n import json\n return e") is None
        assert (
            screen_source(
                "def f(e, ctx):\n from urllib.parse import urlparse\n return e"
            )
            is None
        )
        # sockets / files / dynamic import refused
        assert "socket" in screen_source(
            "def f(e, ctx):\n import socket\n return e"
        )
        assert "os" in screen_source("def f(e, ctx):\n import os\n return e")
        assert "'open'" in screen_source(
            "def f(e, ctx):\n open('/etc/passwd')\n return e"
        )
        assert "__import__" in screen_source(
            "def f(e, ctx):\n m = __import__('subprocess')\n return e"
        )
        assert "relative" in screen_source(
            "def f(e, ctx):\n from . import x\n return e"
        )
        # urllib.request must NOT ride in on the urllib.parse entry
        assert screen_source(
            "def f(e, ctx):\n import urllib.request\n return e"
        ) is not None

    def test_smuggled_import_refused_batch_completes(self, spark):
        """VERDICT r9 #4 done-criterion: an `import socket` chain is
        refused with an events-log row while the batch completes."""
        from jitsu_spark.plans.chain import chain_log_rows

        def exfiltrate(ev, ctx):
            import socket  # noqa: F401 — the smuggled escape hatch

            ev["leaked"] = True
            return ev

        cfg = ConnectionConfig(
            connection_id="c-screen",
            functions=[exfiltrate],
            untrusted=True,
        )
        df = spark.createDataFrame(
            [(json.dumps({"type": "track", "message_id": f"m{i}"}),) for i in range(3)],
            "event string",
        )
        processed = compile_chain(cfg)(df)
        rows = processed.collect()
        assert len(rows) == 3  # batch completed, identity pass-through
        for r in rows:
            assert "ImportScreenError" in r._error
            assert "socket" in r._error and "exfiltrate" in r._error
            assert "leaked" not in json.loads(r.event)  # never executed
        # the refusal reaches the events-log sink as level=error rows
        log = chain_log_rows(processed).collect()
        errs = [r for r in log if r.level == "error"]
        assert len(errs) == 3
        assert all("ImportScreenError" in r.message for r in errs)

    def test_clean_untrusted_chain_unaffected(self, spark):
        def enrich(ev, ctx):
            import json as _json  # allowed stdlib inside the function

            ev["blob"] = _json.dumps({"ok": True})
            return ev

        cfg = ConnectionConfig(
            connection_id="c-clean", functions=[enrich], untrusted=True
        )
        df = spark.createDataFrame(
            [(json.dumps({"type": "track", "message_id": "m1"}),)],
            "event string",
        )
        rows = compile_chain(cfg)(df).collect()
        assert rows[0]._error is None
        assert json.loads(json.loads(rows[0].event)["blob"]) == {"ok": True}


class TestImportScreenSubmodules:
    """Review regression: submodules of BARE allowlist entries must be
    admitted (collections.abc rides in on 'collections'); dotted
    entries never admit siblings through their root."""

    def test_submodule_of_bare_entry_allowed(self):
        from jitsu_spark.plans.import_screen import screen_source

        src = (
            "def f(e, c):\n"
            "    from collections.abc import Iterable\n"
            "    return e\n"
        )
        assert screen_source(src) is None

    def test_dotted_entry_does_not_leak_root(self):
        from jitsu_spark.plans.import_screen import screen_source

        src = "def f(e, c):\n    import urllib.request\n    return e\n"
        assert screen_source(src) is not None
        src2 = (
            "def f(e, c):\n"
            "    from urllib.parse import quote\n"
            "    return e\n"
        )
        assert screen_source(src2) is None
