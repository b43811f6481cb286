"""ctx.fetch — the UDF context's HTTP capability (U1).

Reference: `types/protocols/functions.d.ts:56-62` (FetchType/FetchOpts),
`libs/core-functions/src/functions/lib/index.ts:326-423` (makeFetch: 2 s
abort timeout, request/response logged with sensitive headers masked,
HTTP error statuses resolve), `services/rotor/src/lib/rotor.ts:26`
(FETCH_TIMEOUT_MS default 2000). The rotor chain tests exercise fetch
against a local HTTP server (`__tests__/simple-syrup.ts`); the live test
here does the same with http.server.
"""

from __future__ import annotations

import json
import threading

import pytest

from jitsu_spark.plans.chain import (
    DEFAULT_FETCH_TIMEOUT_SEC,
    FetchResponse,
    FetchTimeoutError,
    FunctionContext,
    run_function_test,
    run_user_chain,
)


def _fake_transport(responses):
    """Canned transport recording every call: responses is url -> FetchResponse
    or an Exception to raise."""
    calls = []

    def transport(url, method, headers, body, timeout_sec):
        calls.append(
            {
                "url": url,
                "method": method,
                "headers": headers,
                "body": body,
                "timeout_sec": timeout_sec,
            }
        )
        r = responses[url]
        if isinstance(r, Exception):
            raise r
        return r

    transport.calls = calls
    return transport


def _resp(status=200, body=b"{}", url="http://x/", **kw):
    return FetchResponse(
        url=url, status=status, statusText="OK" if status < 300 else "ERR",
        headers=kw.get("headers", {}), body=body,
    )


class TestFetch:
    def test_default_timeout_is_two_seconds(self):
        # rotor.ts:26 FETCH_TIMEOUT_MS = 2000
        assert DEFAULT_FETCH_TIMEOUT_SEC == 2.0
        t = _fake_transport({"http://a/": _resp()})
        ctx = FunctionContext(fetch_transport=t)
        ctx.fetch("http://a/")
        assert t.calls[0]["timeout_sec"] == 2.0

    def test_get_and_json(self):
        t = _fake_transport(
            {"http://api/geo": _resp(body=b'{"country": "AT"}')}
        )
        ctx = FunctionContext(fetch_transport=t)
        r = ctx.fetch("http://api/geo")
        assert r.ok and r.status == 200
        assert r.json() == {"country": "AT"}
        assert t.calls[0]["method"] == "GET"

    def test_post_with_body_and_headers(self):
        t = _fake_transport({"http://api/track": _resp(status=201)})
        ctx = FunctionContext(fetch_transport=t)
        r = ctx.fetch(
            "http://api/track",
            {
                "method": "post",
                "headers": {"Authorization": "Bearer s3cr3t"},
                "body": json.dumps({"ev": 1}),
            },
        )
        assert r.ok
        call = t.calls[0]
        assert call["method"] == "POST"
        assert call["body"] == b'{"ev": 1}'
        # the real header goes over the wire...
        assert call["headers"]["Authorization"] == "Bearer s3cr3t"
        # ...but the captured log masks it (lib/index.ts:426-431)
        assert ctx.fetch_log[0]["headers"]["Authorization"] == "*****"

    def test_http_error_status_resolves_not_raises(self):
        # WHATWG fetch semantics: 4xx/5xx resolve with ok=False
        t = _fake_transport({"http://api/missing": _resp(status=404, body=b"nope")})
        ctx = FunctionContext(fetch_transport=t)
        r = ctx.fetch("http://api/missing")
        assert not r.ok and r.status == 404
        assert r.text() == "nope"

    def test_timeout_raises_with_reference_message(self):
        # lib/index.ts:377: "Fetch request exceeded timeout ...ms and was aborted"
        t = _fake_transport({"http://slow/": TimeoutError("timed out")})
        ctx = FunctionContext(fetch_transport=t)
        with pytest.raises(FetchTimeoutError, match="2000ms and was aborted"):
            ctx.fetch("http://slow/")
        assert "aborted" in ctx.fetch_log[0]["error"]

    def test_fetch_log_captures_exchange(self):
        t = _fake_transport({"http://api/": _resp(body=b'{"ok": true}')})
        ctx = FunctionContext(fetch_transport=t)
        ctx.fetch("http://api/")
        (entry,) = ctx.fetch_log
        assert entry["type"] == "http-request"
        assert entry["status"] == 200
        assert entry["response"] == {"ok": True}
        # log=False suppresses capture (the extra.log flag)
        ctx.fetch("http://api/", log=False)
        assert len(ctx.fetch_log) == 1

    def test_udf_uses_fetch_for_enrichment(self):
        """A ported reference-style enrichment UDF: fetch an external API,
        merge the response into the event; fetch errors record like any
        mid-chain error with the event passing through."""

        def enrich(ev, ctx):
            r = ctx.fetch(f"http://geo/{ev['ip']}")
            return {**ev, "country": r.json()["country"]}

        t = _fake_transport({"http://geo/1.2.3.4": _resp(body=b'{"country": "DE"}')})
        res = run_function_test(enrich, {"ip": "1.2.3.4"}, fetch_transport=t)
        assert res["error"] is None
        assert res["events"] == [{"ip": "1.2.3.4", "country": "DE"}]

    def test_run_function_test_surfaces_fetch_log(self):
        def call_api(ev, ctx):
            ctx.fetch("http://api/x")
            return ev

        t = _fake_transport({"http://api/x": _resp()})
        res = run_function_test(call_api, {"a": 1}, fetch_transport=t)
        assert res["events"] == [{"a": 1}]
        assert res["fetch_log"][0]["url"] == "http://api/x"

    def test_fetch_failure_is_in_chain_error(self):
        def call_api(ev, ctx):
            ctx.fetch("http://down/")
            return {**ev, "called": True}

        t = _fake_transport({"http://down/": OSError("connection refused")})
        ctx = FunctionContext(fetch_transport=t)
        out, err = run_user_chain({"a": 1}, [call_api], ctx)
        assert out == [{"a": 1}]  # identity pass-through
        assert "connection refused" in err


def test_fetch_exchanges_ride_the_chain_log_channel(spark):
    """In a compiled chain, each fetch exchange lands in the _logs side
    channel as an http-request row (lib/index.ts:345-360) alongside
    ctx.log lines."""
    import json as _json

    from jitsu_spark.plans.chain import ConnectionConfig, compile_chain

    def call_api(ev, ctx):
        ctx.log("calling geo")
        ctx.fetch("http://geo/x")
        return ev

    t = _fake_transport({"http://geo/x": _resp(body=b'{"country": "AT"}')})
    cfg = ConnectionConfig(
        connection_id="c", functions=[call_api], fetch_transport=t
    )
    df = spark.createDataFrame(
        [(_json.dumps({"message_id": "m1"}),)], "event string"
    )
    (row,) = compile_chain(cfg)(df).collect()
    logs = _json.loads(row._logs)
    assert logs[0] == "calling geo"
    http = _json.loads(logs[1])
    assert http["type"] == "http-request"
    assert http["url"] == "http://geo/x" and http["status"] == 200


class TestLiveFetch:
    """End-to-end over a real socket (the simple-syrup analogue)."""

    @pytest.fixture()
    def server(self):
        from http.server import BaseHTTPRequestHandler, HTTPServer

        seen = []

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                seen.append(
                    (self.path, dict(self.headers), self.rfile.read(n))
                )
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"received": true}')

            def do_GET(self):
                self.send_response(418)
                self.end_headers()
                self.wfile.write(b"teapot")

            def log_message(self, *a):
                pass

        httpd = HTTPServer(("127.0.0.1", 0), Handler)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{httpd.server_port}", seen
        httpd.shutdown()

    def test_post_roundtrip(self, server):
        base, seen = server
        ctx = FunctionContext()
        r = ctx.fetch(
            f"{base}/hook",
            {"method": "POST", "body": '{"n": 1}',
             "headers": {"Content-Type": "application/json"}},
        )
        assert r.ok and r.json() == {"received": True}
        path, headers, body = seen[0]
        assert path == "/hook" and body == b'{"n": 1}'

    def test_error_status_resolves(self, server):
        base, _ = server
        r = FunctionContext().fetch(base + "/")
        assert r.status == 418 and not r.ok and r.text() == "teapot"
