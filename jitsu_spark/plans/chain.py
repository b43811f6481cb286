"""Config-driven function-chain compiler.

The reference interprets, per event, a chain
`[builtin.transformation.*..., udf.PIPELINE, builtin.destination.X]` built
from connection config (`services/rotor/src/lib/functions-chain.ts:103-276`,
ordering at `:204-208`) and caches it per connection. Here the chain is
*compiled once into a DataFrame plan*: builtin stages are plan-level
transforms (filters/projections Catalyst can optimize through), and the
user-function pipeline is a single Arrow-batched mapInPandas stage running
all Python UDFs in one pass — one JVM<->Python crossing for the whole
pipeline regardless of chain length.

FuncReturn semantics (P1, `types/protocols/functions.d.ts:178-180`; drop
test `libs/core-functions/src/index.ts:58-60`):
  - dict            -> replace the event
  - "drop"/None/False/[] -> drop it
  - list[dict]      -> fan out (ONLY the last function may multiply,
                       `libs/core-functions/src/functions/lib/udf-wrapper-code.ts:99-103`)
  - unchanged       -> pass through
A mid-chain error records the error and passes the event through the
failed function unchanged — the chain continues (`udf-wrapper-code.ts:
109-131`; the pipeline-level partial result then forwards to the
destination stage, `functions-chain.ts:352-358`), except Drop errors.

UDF context (U1, `functions.d.ts:127-175`): log/props/store. The TTL store
is the reference's Redis/Mongo KV (`functions.d.ts:11-22`, default TTL
31 d). Executor-side it must be an external KV or a keyed state table; the
in-memory impl here is the unit-test double (the reference tests do the
same, `__tests__/lib/mem-store.ts`).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

DROP = "drop"
DEFAULT_STORE_TTL_DAYS = 31  # libs/core-functions/src/lib/store.ts:7
UDF_TIMEOUT_SEC = 5.0  # udf_wrapper.ts:58 (isolate wall-clock limit)


class DropError(Exception):
    """`Drop & RetryError` — drop the event, no retry (functions.ts:1-28)."""


class FunctionTimeoutError(Exception):
    """U2 guard: a user function exceeded its wall-clock budget. The
    reference kills the isolate at 5 s (`udf_wrapper.ts:58,234-239`); here
    the event forwards with the error recorded, like any mid-chain
    failure."""


class FunctionMemoryError(Exception):
    """U2 guard: a user function allocated past its budget. The reference
    caps the isolate at 128 MB (`udf_wrapper.ts:58`). Untrusted chains
    enforce this for real via RLIMIT_AS in a forked child
    (plans/isolate.py — C-extension mallocs included); this in-process
    variant is the opt-in tracemalloc-based post-call check (exact
    per-call Python allocation delta; ~2x slower, the non-Linux fallback
    and the trusted-chain vetting tool)."""


UDF_MEMORY_MB = 128  # udf_wrapper.ts:58 isolate memory limit


def _call_with_memory_guard(fn, ev, ctx, memory_mb):
    import tracemalloc

    was_tracing = tracemalloc.is_tracing()
    if not was_tracing:
        tracemalloc.start()
    tracemalloc.reset_peak()
    base, _ = tracemalloc.get_traced_memory()
    try:
        r = fn(ev, ctx)
        _, peak = tracemalloc.get_traced_memory()
        if peak - base > memory_mb * 1024 * 1024:
            raise FunctionMemoryError(
                f"function allocated {(peak - base) >> 20} MB"
                f" (budget {memory_mb} MB)"
            )
        return r
    finally:
        if not was_tracing:
            tracemalloc.stop()


def _call_with_timeout(fn, ev, ctx, timeout_sec):
    """Run one user function under a wall-clock budget.

    SIGALRM-preemptive when running on a main thread (the normal Python
    worker case for mapInPandas); otherwise best-effort post-hoc (the call
    isn't interrupted, but the overrun still surfaces as the timeout
    error)."""
    if not timeout_sec:
        return fn(ev, ctx)
    import signal
    import threading

    on_main = threading.current_thread() is threading.main_thread()
    if not (on_main and hasattr(signal, "setitimer")):
        t0 = time.time()
        r = fn(ev, ctx)
        if time.time() - t0 > timeout_sec:
            raise FunctionTimeoutError(
                f"function exceeded {timeout_sec}s (post-hoc)"
            )
        return r

    def _alarm(signum, frame):
        raise FunctionTimeoutError(f"function exceeded {timeout_sec}s")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.setitimer(signal.ITIMER_REAL, timeout_sec)
    try:
        return fn(ev, ctx)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)


RETRY_ERROR_NAME = "RetryError"  # functions.ts:2
DROP_RETRY_ERROR_NAME = "Drop & RetryError"  # functions.ts:1


class RetryError(Exception):
    """Transient failure -> retry machinery (`libs/functions/src/lib/
    functions.ts:4-28`). `drop=True` is the reference's
    "Drop & RetryError": the event is dropped from THIS attempt (instead
    of passing through) but still requeued for retry."""

    def __init__(self, message: str = "", drop: bool = False):
        super().__init__(message)
        self.drop = drop
        self.name = DROP_RETRY_ERROR_NAME if drop else RETRY_ERROR_NAME


def is_retryable_error(err: str | None) -> bool:
    """True when a chain `_error` string records a RetryError — the
    stream layer requeues these through RetryStore with the chain's
    function id (udf.PIPELINE), everything else only logs. The recorded
    form is "<name>: <message>", so match the name EXACTLY — a user
    exception class that merely starts with "RetryError" (e.g.
    RetryErrorBudgetExhausted) is a permanent failure, not a requeue."""
    if not err:
        return False
    name = err.split(":", 1)[0]
    return name in (RETRY_ERROR_NAME, DROP_RETRY_ERROR_NAME)


def function_filter(error_function_id: str | None) -> str:
    """Port of `functionFilter` (`services/rotor/src/lib/
    message-handler.ts:44-52`): which chain stages a retried event
    re-runs, keyed by the function that failed. UDF failures re-run the
    whole user pipeline + destination; destination failures re-run the
    destination only."""
    fid = error_function_id or ""
    if fid.startswith("udf."):
        return "udf-n-dst"
    if fid.startswith("builtin.destination."):
        return "dst-only"
    return "all"


class InMemoryTtlStore:
    """Test double for the TTL KV store (functions.d.ts:11-22).

    SAME SetOpts surface as the durable FileTtlStore (plans/store.py):
    opts is seconds / a duration string / "inf" / {"ttl": ...}; the
    legacy ttl_days kwarg converts to seconds. A UDF written against
    this double behaves identically when store_dir flips it to the
    durable store — TTL units must never depend on which store backs
    ctx.store.

    UNIT-CHANGE NOTICE (round 3): the third positional parameter was
    `ttl_days` before round 3 and is now `opts` in SECONDS. A bare
    numeric positional argument triggers a one-time DeprecationWarning
    (`store.warn_numeric_opts`) so the 86400x shift is never silent;
    callers meaning days must use `ttl_days=` or a "3d" duration
    string."""

    def __init__(self):
        self._d: dict[str, tuple[Any, float | None]] = {}

    def get(self, key: str):
        v = self._d.get(key)
        if v is None:
            return None
        value, exp = v
        if exp is not None and exp < time.time():
            del self._d[key]
            return None
        return value

    def set(
        self, key: str, value: Any, opts: Any = None, *, ttl_days: float | None = None
    ):
        from .store import get_ttl_sec, warn_numeric_opts

        if ttl_days is not None and opts is None:
            opts = ttl_days * 86400
        else:
            warn_numeric_opts(opts)
        ttl = get_ttl_sec(opts)
        exp = None if ttl < 0 else time.time() + ttl
        self._d[key] = (value, exp)

    def getWithTTL(self, key: str) -> dict | None:
        v = self._d.get(key)
        if v is None:
            return None
        value, exp = v
        if exp is not None and exp < time.time():
            del self._d[key]
            return None
        ttl = -1 if exp is None else max(int(exp - time.time()), 0)
        return {"value": value, "ttl": ttl}

    def ttl(self, key: str) -> int:
        got = self.getWithTTL(key)
        return -2 if got is None else got["ttl"]

    def delete(self, key: str):
        self._d.pop(key, None)


DEFAULT_FETCH_TIMEOUT_SEC = 2.0  # FETCH_TIMEOUT_MS (rotor.ts:26)


@dataclass
class FetchResponse:
    """The slice of the WHATWG Response surface reference UDFs use
    (`functions.d.ts:56` FetchType -> Response; udf code reads status/
    ok/headers and awaits .json()/.text())."""

    url: str
    status: int
    statusText: str
    headers: dict[str, str]
    body: bytes = b""

    @property
    def ok(self) -> bool:
        return 200 <= self.status < 300

    def text(self) -> str:
        return self.body.decode("utf-8", errors="replace")

    def json(self) -> Any:
        return json.loads(self.text())


# Pluggable transport (same seam as sinks_api webhook `Transport`):
# (url, method, headers, body, timeout_sec) -> FetchResponse. Tests inject
# a fake; production uses urllib with the 2 s abort budget.
FetchTransport = Callable[[str, str, dict, bytes | None, float], FetchResponse]


def _urllib_fetch_transport(
    url: str, method: str, headers: dict, body: bytes | None, timeout_sec: float
) -> FetchResponse:
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
            return FetchResponse(
                url=url,
                status=resp.status,
                statusText=resp.reason or "",
                headers=dict(resp.headers),
                body=resp.read(),
            )
    except urllib.error.HTTPError as e:
        # fetch() resolves on HTTP errors — only network failures throw
        return FetchResponse(
            url=url,
            status=e.code,
            statusText=e.reason or "",
            headers=dict(e.headers or {}),
            body=e.read() if e.fp else b"",
        )


def _hide_sensitive_headers(headers: dict[str, str]) -> dict[str, str]:
    """`lib/index.ts:426-431`: mask authorization/token header values."""
    return {
        k: "*****" if "authorization" in k.lower() or "token" in k.lower() else v
        for k, v in headers.items()
    }


class FetchTimeoutError(Exception):
    """The reference aborts the request at the timeout
    (`AbortSignal.timeout`, `lib/index.ts:371-378`) and rethrows with this
    message shape."""


class CryptoHelpers:
    """The crypto namespace the reference injects into the UDF isolate
    (`udf_wrapper.ts:78-84` wiring node:crypto's hash/randomUUID/
    randomBytes/randomInt through `lib/crypto-code.ts`)."""

    @staticmethod
    def hash(algorithm: str, data, encoding: str = "hex"):
        import hashlib

        if isinstance(data, str):
            data = data.encode()
        h = hashlib.new(algorithm, data)
        if encoding == "hex":
            return h.hexdigest()
        if encoding == "base64":
            import base64

            return base64.b64encode(h.digest()).decode()
        return h.digest()

    @staticmethod
    def randomUUID() -> str:
        import uuid

        return str(uuid.uuid4())

    @staticmethod
    def randomBytes(size: int) -> bytes:
        import secrets

        return secrets.token_bytes(size)

    @staticmethod
    def randomInt(min_v: int, max_v: int | None = None) -> int:
        # node:crypto.randomInt semantics: (max) or (min, max), max exclusive
        import secrets

        if max_v is None:
            min_v, max_v = 0, min_v
        return min_v + secrets.randbelow(max_v - min_v)


@dataclass
class FunctionContext:
    """ctx passed to every user function (functions.d.ts:127-175)."""

    props: dict[str, Any] = field(default_factory=dict)
    store: Any = field(default_factory=InMemoryTtlStore)
    logs: list[str] = field(default_factory=list)
    crypto: CryptoHelpers = field(default_factory=CryptoHelpers)
    # EventContext.retries (functions.d.ts:170-171): how many retry
    # attempts preceded this run — reference UDFs branch on it
    retries: int = 0
    # EventContext request-scoped fields (functions.d.ts:127-145):
    # geo/ua/headers come from the incoming request — the chain refreshes
    # them per event from the event's context block before the first
    # function runs (set_event_context)
    geo: dict[str, Any] = field(default_factory=dict)
    ua: dict[str, Any] = field(default_factory=dict)
    headers: dict[str, Any] = field(default_factory=dict)
    # EventContext connection-scoped fields (functions.d.ts:146-169):
    # constants for a compiled chain, from the connection config
    source: dict[str, Any] = field(default_factory=dict)
    destination: dict[str, Any] = field(default_factory=dict)
    connection: dict[str, Any] = field(default_factory=dict)
    workspace: dict[str, Any] = field(default_factory=dict)

    def set_event_context(self, event: dict) -> None:
        """Refresh the request-scoped fields from the incoming event's
        context block (where ingest enrichment stores geo/ua/headers) —
        built once per message, like the reference's eventContext."""
        c = event.get("context") or {}
        self.geo = c.get("geo") or {}
        self.ua = c.get("ua") or {}
        self.headers = c.get("headers") or {}
    fetch_transport: FetchTransport = _urllib_fetch_transport
    fetch_timeout_sec: float = DEFAULT_FETCH_TIMEOUT_SEC
    # captured request/response exchanges — the analogue of the reference's
    # http-request events-log rows (lib/index.ts:345-360), also surfaced by
    # run_function_test for assertions
    fetch_log: list[dict] = field(default_factory=list)

    def log(self, msg: str) -> None:
        self.logs.append(str(msg))

    def fetch(
        self, url: str, opts: dict | None = None, log: bool = True
    ) -> FetchResponse:
        """ctx.fetch (`functions.d.ts:56-62` FetchType; impl makeFetch,
        `lib/index.ts:326-423`): HTTP call with a hard 2 s default timeout.
        HTTP error statuses resolve (like WHATWG fetch); network failures
        and timeouts raise. Each exchange is captured with sensitive
        headers masked unless `log=False` (the `extra.log` flag)."""
        opts = opts or {}
        method = (opts.get("method") or "GET").upper()
        headers = dict(opts.get("headers") or {})
        body = opts.get("body")
        if isinstance(body, str):
            body = body.encode()
        entry = None
        if log:
            entry = {
                "type": "http-request",
                "url": url,
                "method": method,
                "headers": _hide_sensitive_headers(headers),
                "body": body.decode("utf-8", errors="replace") if body else None,
            }
            self.fetch_log.append(entry)
        t0 = time.time()
        try:
            resp = self.fetch_transport(
                url, method, headers, body, self.fetch_timeout_sec
            )
        except FetchTimeoutError:
            raise
        except (TimeoutError, OSError) as ex:
            elapsed_ms = int((time.time() - t0) * 1000)
            is_timeout = isinstance(ex, TimeoutError) or "timed out" in str(ex)
            msg = (
                f"Fetch request exceeded timeout "
                f"{int(self.fetch_timeout_sec * 1000)}ms and was aborted"
                if is_timeout
                else f"{type(ex).__name__}: {ex}"
            )
            if entry is not None:
                entry.update(error=msg, elapsedMs=elapsed_ms)
            if is_timeout:
                raise FetchTimeoutError(msg) from ex
            raise
        if entry is not None:
            entry.update(
                status=resp.status,
                statusText=resp.statusText,
                elapsedMs=int((time.time() - t0) * 1000),
                response=_try_json(resp.text()),
            )
        return resp


def _try_json(text: str, cap: int = 2000) -> Any:
    """`trimResponse` + `tryJson` (lib/index.ts:398-404): log the parsed
    JSON when possible, else the (truncated) text."""
    trimmed = text[:cap]
    try:
        return json.loads(text)
    except (ValueError, TypeError):
        return trimmed


# A user function: (event dict, ctx) -> FuncReturn
UserFunction = Callable[[dict, FunctionContext], Any]


@dataclass
class ConnectionConfig:
    """The slice of connection config the chain compiler consumes
    (webapps/console/lib/schema/index.ts + destinations.tsx:126-147)."""

    connection_id: str
    events_filter: str = "*"  # P2: "*", "", or CSV of types/event names
    functions: list[UserFunction] = field(default_factory=list)
    function_props: dict[str, Any] = field(default_factory=dict)
    layout: str = "segment-single-table"
    keep_original_names: bool = False
    function_timeout_sec: float | None = UDF_TIMEOUT_SEC  # U2 guard
    # allocation budget (tracemalloc; see FunctionMemoryError). None +
    # untrusted=True -> the reference's 128 MB isolate limit applies by
    # default; None + trusted -> off (hot-path speed). Explicit values win.
    function_memory_mb: float | None = None
    # U2: mark chains carrying user-supplied code not vetted by the
    # operator. Untrusted chains run PROCESS-ISOLATED on Linux (forked
    # child per task, RLIMIT_AS hard cap at the 128 MB udf_wrapper.ts:58
    # budget, parent watchdog SIGKILL on native hangs — plans/isolate.py);
    # elsewhere they fall back to the in-process tracemalloc budget.
    # Either way an over-budget call records the error, the event passes
    # through (identity), and the batch completes.
    untrusted: bool = False
    # ctx.fetch wiring: injectable transport (tests / per-destination HTTP
    # stacks) and the per-call timeout (FETCH_TIMEOUT_MS)
    fetch_transport: FetchTransport = _urllib_fetch_transport
    fetch_timeout_sec: float = DEFAULT_FETCH_TIMEOUT_SEC
    # durable ctx.store root (plans/store.py FileTtlStore). When set, every
    # task gets a FileTtlStore namespaced by connection — state survives
    # batches, restarts, and is shared across executors via the store
    # mount, the role Redis/Mongo plays for rotor. None = in-memory double.
    store_dir: str | None = None
    # EventContext connection-scoped metadata exposed to UDFs
    # (functions.d.ts:146-169): source/destination/workspace descriptors
    source: dict = field(default_factory=dict)
    destination: dict = field(default_factory=dict)
    workspace: dict = field(default_factory=dict)


def passes_event_filter(event: dict, spec: str) -> bool:
    """P2 (`libs/core-functions/src/functions/lib/index.ts:231-242`):
    "*" keeps all; "" drops page/screen; CSV matches type or event name."""
    if spec == "*":
        return True
    etype = event.get("type")
    if spec == "":
        return etype not in ("page", "screen")
    wanted = {s.strip() for s in spec.split(",") if s.strip()}
    return etype in wanted or event.get("event") in wanted


def _deep_copy_event(o):
    """The reference's deepCopy (udf-wrapper-code.ts:52-71): a plain
    JSON-shape walk (dict/list/scalar). ~4x faster than copy.deepcopy on
    event dicts — this runs once per function call on the Python hot
    path, so the generic machinery's memo/dispatch overhead matters."""
    if isinstance(o, dict):
        return {k: _deep_copy_event(v) if isinstance(v, (dict, list)) else v
                for k, v in o.items()}
    if isinstance(o, list):
        return [_deep_copy_event(v) if isinstance(v, (dict, list)) else v
                for v in o]
    return o


def run_user_chain(
    event: dict,
    functions: list[UserFunction],
    ctx: FunctionContext,
    timeout_sec: float | None = UDF_TIMEOUT_SEC,
    memory_mb: float | None = None,
) -> tuple[list[dict], str | None]:
    """Execute the composed UDF pipeline on one event.

    Returns (events_out, error). Error semantics mirror
    `udf-wrapper-code.ts:77-131` (confirmed by the rotor chain test
    expectations, `functions-chain.test.ts` `error_0`): a failing function
    acts as IDENTITY — the error is recorded, the event passes through
    unchanged, and the chain continues with the remaining functions. Each
    function receives a deep copy of the event (`deepCopy`,
    udf-wrapper-code.ts:97) so a failed call's partial mutations don't
    leak. Mid-chain multiplication is likewise an in-chain error, not an
    abort (it's thrown and caught inside the same loop,
    udf-wrapper-code.ts:99-110). RetryError records like other errors —
    the event still flows this attempt (dropped instead when drop=True,
    the "Drop & RetryError" variant) and the recorded name marks the row
    retryable for the stream layer (is_retryable_error). Each call runs
    under the U2 wall-clock guard; pass `memory_mb` to also meter
    per-call Python allocations."""
    current: list[dict] = [event]
    first_err: str | None = None
    for i, fn in enumerate(functions):
        last = i == len(functions) - 1
        nxt: list[dict] = []
        for ev in current:
            try:
                if memory_mb:
                    r = _call_with_memory_guard(
                        lambda e, c: _call_with_timeout(fn, e, c, timeout_sec),
                        _deep_copy_event(ev),
                        ctx,
                        memory_mb,
                    )
                else:
                    r = _call_with_timeout(
                        fn, _deep_copy_event(ev), ctx, timeout_sec
                    )
                if not last and isinstance(r, list) and len(r) > 1:
                    # udf-wrapper-code.ts:99-103 — thrown, then caught by
                    # the same error path: record + identity
                    raise ValueError(
                        f"Got {len(r)} events as result of function "
                        f"#{i + 1} of {len(functions)}. Only the last "
                        "function in a chain is allowed to multiply events."
                    )
            except DropError:
                continue
            except RetryError as ex:
                # functions-chain.ts:326-329 + test expectations: the
                # event continues this attempt (drop variant removes it),
                # the recorded name marks the row for requeue
                if first_err is None:
                    first_err = f"{ex.name}: {ex}"
                if not ex.drop:
                    nxt.append(ev)
                continue
            except Exception as ex:  # record + pass through (identity)
                if first_err is None:
                    first_err = f"{type(ex).__name__}: {ex}"
                nxt.append(ev)
                continue
            if r is None or r is False or r == DROP or r == []:
                continue
            if isinstance(r, dict):
                nxt.append(r)
            elif isinstance(r, list):
                nxt.extend(r)
            elif r is True:
                nxt.append(ev)
            else:
                # unsupported return type: a PER-EVENT recorded error
                # with identity pass-through, like every other function
                # failure — raising here would escape run_user_chain and
                # poison-pill the whole mapInPandas task on one bad
                # event (round-9 spine review finding #5)
                if first_err is None:
                    first_err = (
                        "TypeError: unsupported function return: "
                        f"{type(r).__name__}"
                    )
                nxt.append(ev)
        current = nxt
        if not current:
            return [], first_err
    return current, first_err


def compile_chain(
    config: ConnectionConfig,
    store_factory: Callable[[], Any] | None = None,
    retries: int = 0,
) -> Callable[[DataFrame], DataFrame]:
    """connection config -> one DataFrame->DataFrame stage over JSON events.

    Input: DataFrame with an `event` JSON string column. Output: same shape
    plus `_error` (null unless a mid-chain UDF failed and the partial
    result was forwarded). The whole Python pipeline is ONE mapInPandas
    stage; event-filter short-circuits inside the same pass.
    """
    functions = config.functions
    spec = config.events_filter
    props = config.function_props
    timeout_sec = config.function_timeout_sec
    memory_mb = config.function_memory_mb
    if memory_mb is None and config.untrusted:
        memory_mb = UDF_MEMORY_MB  # default-on for untrusted chains
    # U2: untrusted chains get REAL isolation where the platform allows —
    # forked child with an RLIMIT_AS hard cap and a parent watchdog kill
    # (plans/isolate.py). In-process tracemalloc/SIGALRM guards remain the
    # fallback (non-Linux) and the trusted-chain opt-in.
    from .isolate import IsolatedChainRunner, supports_isolation

    use_isolation = config.untrusted and supports_isolation()

    # U2 import screen (udf_wrapper.ts:86-88,146-153 analog, round 10):
    # untrusted function source is AST-screened ONCE at compile time; a
    # smuggled `import socket` / `open` / `__import__` refuses the chain
    # with a recorded per-event error (identity pass-through, batch
    # completes, events-log row) — the function never executes.
    refusal: str | None = None
    if config.untrusted:
        from .import_screen import screen_functions

        refusal = screen_functions(functions)

    fetch_transport = config.fetch_transport
    fetch_timeout_sec = config.fetch_timeout_sec
    if store_factory is None:
        if config.store_dir:
            from .store import FileTtlStore

            store_dir, conn_id = config.store_dir, config.connection_id
            store_factory = lambda: FileTtlStore(store_dir, conn_id)  # noqa: E731
        else:
            store_factory = InMemoryTtlStore

    def make_ctx() -> FunctionContext:
        return FunctionContext(
            props=props,
            store=store_factory(),
            fetch_transport=fetch_transport,
            fetch_timeout_sec=fetch_timeout_sec,
            retries=retries,
            source=config.source,
            destination=config.destination,
            connection={"id": config.connection_id},
            workspace=config.workspace,
        )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        runner = None
        if refusal is not None:

            def run_one(ev: dict):
                return [ev], refusal, [], []

        elif use_isolation:
            runner = IsolatedChainRunner(
                functions, make_ctx, timeout_sec, memory_mb
            )
            run_one = runner.run
        else:
            ctx = make_ctx()

            def run_one(ev: dict):
                ctx.set_event_context(ev)
                # per-event capture: cleared each event so a large
                # partition holds only the current event's entries, not
                # every log line / fetch exchange since the task started
                ctx.logs.clear()
                ctx.fetch_log.clear()
                evs, err = run_user_chain(
                    ev, functions, ctx, timeout_sec, memory_mb
                )
                return evs, err, list(ctx.logs), list(ctx.fetch_log)

        try:
            for pdf in batches:
                out_events: list[str] = []
                out_errors: list[str | None] = []
                out_logs: list[str | None] = []
                out_dropped: list[bool] = []
                for raw in pdf["event"]:
                    ev = json.loads(raw)
                    if not passes_event_filter(ev, spec):
                        continue
                    evs, err, ev_logs, fetch_entries = run_one(ev)
                    # ctx.fetch exchanges ride the same side channel as
                    # http-request events-log rows (lib/index.ts:345-360)
                    ev_logs = list(ev_logs) + [
                        json.dumps(x, separators=(",", ":"), default=str)
                        for x in fetch_entries
                    ]
                    logs_json = json.dumps(ev_logs) if ev_logs else None
                    for e in evs:
                        out_events.append(json.dumps(e, separators=(",", ":")))
                        out_errors.append(err)
                        out_logs.append(logs_json)
                        out_dropped.append(False)
                    if not evs and (err is not None or logs_json is not None):
                        # a fully-dropped event with an error or logs
                        # still emits ONE tombstone row carrying the
                        # ORIGINAL event: `_dropped=True` keeps it out
                        # of delivery (compile_pipeline filters it), but
                        # the error reaches the retry layer — a
                        # "Drop & RetryError" event was previously lost
                        # forever instead of requeued, and a dropped
                        # event's logs vanished from the events log
                        # (round-9 spine review finding #1)
                        out_events.append(raw)
                        out_errors.append(err)
                        out_logs.append(logs_json)
                        out_dropped.append(True)
                yield pd.DataFrame(
                    {
                        "event": out_events,
                        "_error": out_errors,
                        "_logs": out_logs,
                        "_dropped": pd.array(out_dropped, dtype="boolean"),
                    }
                )
        finally:
            if runner is not None:
                runner.close()

    def transform(df: DataFrame) -> DataFrame:
        return df.mapInPandas(
            stage, "event string, _error string, _logs string, _dropped boolean"
        )

    return transform


def chain_log_rows(processed: DataFrame) -> DataFrame:
    """Turn the chain's per-event `_logs`/`_error` side-channel into
    events-log rows (S8): explode log lines, lift errors to level=error.
    Route the result to sinks_api.append_events_log."""
    import pyspark.sql.functions as F

    logs = (
        processed.where(F.col("_logs").isNotNull())
        .select(
            F.get_json_object("event", "$.message_id").alias("actor_id"),
            F.explode(F.from_json("_logs", "array<string>")).alias("message"),
        )
        .withColumn("level", F.lit("info"))
    )
    errors = (
        processed.where(F.col("_error").isNotNull())
        .select(
            F.get_json_object("event", "$.message_id").alias("actor_id"),
            F.col("_error").alias("message"),
        )
        .withColumn("level", F.lit("error"))
    )
    return logs.unionByName(errors).withColumn(
        "type", F.lit("function")
    ).withColumn("timestamp", F.current_timestamp())


def compile_pipeline(
    config: ConnectionConfig, stage: str = "full", retries: int = 0
) -> Callable[[DataFrame], DataFrame]:
    """Full per-connection pipeline: UDF chain + data layout, ready for
    the streaming spine's `transform` slot or batch execution. Output:
    (_table, event) rows (the destination stage's bulker contract).

    `stage` implements P4 retry-stage filtering (`function_filter`,
    message-handler.ts:44-52): a retried event whose failure came from
    the destination re-runs "dst-only" (layout+load only); a UDF failure
    re-runs "udf-n-dst" (user pipeline + destination — builtin
    transformations here are plan-level and re-apply identically, so it
    equals "full"/"all"); `retries` is the attempt count surfaced to
    UDFs as ctx.retries.
    """
    from dataclasses import replace

    from ..events.layouts import apply_layout

    if stage == "dst-only":
        config = replace(config, functions=[])
    elif stage not in ("full", "all", "udf-n-dst"):
        raise ValueError(f"unknown stage {stage!r}")
    chain = compile_chain(config, retries=retries)

    def transform(df: DataFrame) -> DataFrame:
        # errored events still reach the destination carrying their
        # partial result (functions-chain.ts:352-358); _error travels to
        # the metrics/log sink, not into the warehouse row. Tombstone
        # rows (`_dropped`) carry a dropped event's error/logs for the
        # retry and log layers and must NOT be delivered.
        import pyspark.sql.functions as F

        processed = chain(df)
        return apply_layout(
            processed.where(~F.col("_dropped")).select("event"),
            layout=config.layout,
            keep_original_names=config.keep_original_names,
        )

    return transform


# ---------------------------------------------------------------------------
# Builtin registry (U6, `libs/core-functions/src/index.ts:23-56`): name ->
# DataFrame-level transform. Builtins stay plan-level (Catalyst-visible);
# only user code pays the Python crossing.
# ---------------------------------------------------------------------------


def _builtin_user_recognition(df: DataFrame) -> DataFrame:
    from ..operators.identity import user_recognition_backfill

    return user_recognition_backfill(df)


BUILTINS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "builtin.transformation.user-recognition": _builtin_user_recognition,
}


def run_function_test(
    fn: UserFunction,
    event: dict,
    props: dict | None = None,
    store: Any | None = None,
    fetch_transport: FetchTransport | None = None,
    fetch_timeout_sec: float = DEFAULT_FETCH_TIMEOUT_SEC,
    retries: int = 0,
) -> dict:
    """U5 — the UDF test harness (`udf_wrapper.ts:322-498`, console
    `function/run`): execute one function against one event with a mock
    context; return result events, error, captured logs, the store for
    state assertions, and every ctx.fetch exchange (request + response,
    sensitive headers masked) like the console's http-request log."""
    ctx = FunctionContext(
        props=props or {},
        store=store or InMemoryTtlStore(),
        fetch_transport=fetch_transport or _urllib_fetch_transport,
        fetch_timeout_sec=fetch_timeout_sec,
        retries=retries,
    )
    events, err = run_user_chain(event, [fn], ctx)
    return {
        "events": events,
        "error": err,
        "logs": ctx.logs,
        "store": ctx.store,
        "fetch_log": ctx.fetch_log,
    }
