"""Process-isolated execution of untrusted UDF chains (U2).

The reference runs user functions in a disposable v8 isolate with a hard
128 MB memory limit and a wall-clock kill that disposes the isolate
(`libs/core-functions/src/functions/udf_wrapper.ts:58,234-239`). A shared
CPython worker cannot reproduce that with in-process guards: tracemalloc
only sees Python-API allocations (a C extension mallocs past it) and
SIGALRM only preempts Python bytecode (native code hangs through it — or
a hostile UDF simply blocks the signal).

So untrusted chains run in a forked child per task:

- RLIMIT_AS caps the child's address space at (fork-image size +
  memory_mb), so ANY allocation path — PyMem, C extension malloc, mmap —
  fails with MemoryError inside the child once the budget is spent. The
  failing call records an in-chain error (identity semantics) and the
  child keeps serving.
- A parent-side watchdog SIGKILLs the child if an event exceeds the
  chain's wall-clock budget (per-function timeout x chain length +
  grace). This is the disposal path for native spins and signal-blocking
  UDFs that in-child SIGALRM cannot interrupt.
- A killed or crashed child is respawned for the next event; the event
  that died passes through with `_error` recorded (the same mid-chain
  identity contract as any UDF failure), so the batch always completes
  and the executor survives.

The child is long-lived across events (the reference reuses an isolate
until disposal), so per-event overhead is one pipe round-trip, not a
fork. Fork start method: functions/ctx transfer by memory image — no
pickling constraint on user callables. ctx.store: use `store_dir`
(FileTtlStore) for state that must survive a respawn; the in-memory
double resets with the child that owned it, exactly like a disposed
isolate's heap.

Linux-only (fork + RLIMIT_AS + /proc); `supports_isolation()` gates the
caller, which falls back to the in-process guards elsewhere in
plans/chain.py.
"""

from __future__ import annotations

import multiprocessing
import os
import sys
from typing import Any, Callable

ISOLATE_GRACE_SEC = 2.0  # watchdog slack over the in-child budget
CHILD_JOIN_SEC = 1.0

# U4 — the reference's profile-UDF isolate budget
# (`services/profiles/src/lib/profiles-udf-wrapper.ts:51` memoryLimit: 512,
# `:231` UDF_TIMEOUT_MS default 5000).
PROFILE_UDF_MEMORY_MB = 512
PROFILE_UDF_TIMEOUT_SEC = 5.0


def supports_isolation() -> bool:
    return sys.platform.startswith("linux") and hasattr(os, "fork")


def _vm_size_bytes() -> int:
    """Current virtual address-space size — the base the RLIMIT_AS budget
    sits on top of (the forked image inherits the worker's mappings;
    capping at an absolute 128 MB would kill the child instantly)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmSize:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


def _child_main(conn, functions, ctx, timeout_sec, memory_mb) -> None:
    """Serve events over the pipe until EOF/None. Runs post-fork."""
    try:
        import resource

        base = _vm_size_bytes()
        if base and memory_mb:
            limit = base + int(memory_mb * 1024 * 1024)
            resource.setrlimit(resource.RLIMIT_AS, (limit, limit))
    except Exception:
        # cap unavailable (non-Linux libc, container policy): the parent
        # watchdog and in-child timeout still apply
        pass
    from .chain import run_user_chain

    while True:
        try:
            event = conn.recv()
        except (EOFError, OSError):
            return
        if event is None:
            return
        try:
            ctx.set_event_context(event)
            ctx.logs.clear()
            ctx.fetch_log.clear()
            evs, err = run_user_chain(event, functions, ctx, timeout_sec)
            reply = (evs, err, list(ctx.logs), list(ctx.fetch_log))
        except MemoryError:
            # allocation failure escaped the per-function catch (chain
            # bookkeeping itself starved): identity + error, keep serving
            reply = (
                [event],
                f"FunctionMemoryError: isolate exceeded {memory_mb} MB",
                [],
                [],
            )
        except BaseException as ex:  # never let the serve loop die silently
            reply = ([event], f"{type(ex).__name__}: {ex}", [], [])
        try:
            conn.send(reply)
        except (BrokenPipeError, OSError):
            return


class _ForkedRunner:
    """Shared fork/pipe/watchdog lifecycle for isolated executors: a
    long-lived forked child serves requests over a Pipe; the parent
    SIGKILLs it when a reply misses the wall-clock budget and respawns it
    lazily on the next request. Subclasses provide the child target/args
    and map `_roundtrip` statuses to their own reply contract."""

    def __init__(self, budget: float | None):
        # None budget = wait forever (an EXPLICIT no-timeout config is
        # honored — the memory cap still applies; imposing a made-up
        # budget would silently override the operator's choice).
        self._budget = budget
        self._mp = multiprocessing.get_context("fork")
        self._proc = None
        self._conn = None

    def _child_target(self) -> Callable:
        raise NotImplementedError

    def _child_args(self, child_conn) -> tuple:
        raise NotImplementedError

    def _spawn(self) -> None:
        parent_conn, child_conn = self._mp.Pipe()
        proc = self._mp.Process(
            target=self._child_target(),
            args=self._child_args(child_conn),
            daemon=True,
        )
        proc.start()
        child_conn.close()
        self._proc, self._conn = proc, parent_conn

    def _roundtrip(self, payload) -> tuple[str, Any]:
        """One request/reply: ('ok', reply) | ('timeout', None) |
        ('died', exitcode). Kills + lazily respawns on failure."""
        if self._proc is None or not self._proc.is_alive():
            self._kill()
            self._spawn()
        try:
            self._conn.send(payload)
        except (BrokenPipeError, OSError):
            self._kill()
            self._spawn()
            self._conn.send(payload)
        if not self._conn.poll(self._budget):  # None = wait forever
            # native hang / blocked SIGALRM: dispose the isolate
            # (udf_wrapper.ts:234-239); the next request gets a fresh child
            self._kill()
            return ("timeout", None)
        try:
            return ("ok", self._conn.recv())
        except (EOFError, OSError):
            # child died mid-request (hard OOM kill, segfault)
            return ("died", self._kill())

    def _kill(self) -> int | None:
        """SIGKILL + reap; returns the exit code (negative = signal)."""
        code = None
        if self._proc is not None:
            try:
                self._proc.kill()
            except Exception:
                pass
            self._proc.join(CHILD_JOIN_SEC)
            code = self._proc.exitcode
        if self._conn is not None:
            try:
                self._conn.close()
            except Exception:
                pass
        self._proc = self._conn = None
        return code

    def close(self) -> None:
        if self._conn is not None and self._proc is not None and self._proc.is_alive():
            try:
                self._conn.send(None)  # graceful EOF
                self._proc.join(CHILD_JOIN_SEC)
            except Exception:
                pass
        self._kill()


class IsolatedChainRunner(_ForkedRunner):
    """One isolated executor for a chain's user pipeline, owned by one
    Spark task. `run(event)` mirrors `run_user_chain` plus the per-event
    ctx log capture: returns (events_out, error, logs, fetch_log)."""

    def __init__(
        self,
        functions: list[Callable],
        ctx_factory: Callable[[], Any],
        timeout_sec: float | None,
        memory_mb: float | None,
    ):
        self._functions = functions
        self._ctx_factory = ctx_factory
        self._timeout = timeout_sec
        self._memory_mb = memory_mb
        # wall-clock budget for one event through the whole chain: the
        # in-child guard enforces timeout_sec per function; the watchdog
        # only fires when that guard was defeated (native code / blocked
        # signals), so it gets the full-chain budget plus grace. The
        # budget is SOUND against event multiplication: only the LAST
        # function may multiply (run_user_chain raises mid-chain), so
        # one event makes at most len(functions) calls per run.
        super().__init__(
            timeout_sec * max(1, len(functions)) + ISOLATE_GRACE_SEC
            if timeout_sec
            else None
        )

    def _child_target(self) -> Callable:
        return _child_main

    def _child_args(self, child_conn) -> tuple:
        return (
            child_conn,
            self._functions,
            self._ctx_factory(),
            self._timeout,
            self._memory_mb,
        )

    def run(self, event: dict) -> tuple[list[dict], str | None, list, list]:
        status, reply = self._roundtrip(event)
        if status == "ok":
            return reply
        if status == "timeout":
            # pass the event through with the error recorded — the batch
            # continues on a fresh child (identity semantics)
            return (
                [event],
                f"FunctionTimeoutError: isolate exceeded "
                f"{self._budget:.1f}s and was killed",
                [],
                [],
            )
        return (
            [event],
            f"FunctionMemoryError: isolate died (exit code {reply}); "
            f"memory budget {self._memory_mb} MB",
            [],
            [],
        )


def _profile_child_main(conn, profile_fn, timeout_sec, memory_mb) -> None:
    """Serve ProfileFunction calls (pandas in → pandas out) until EOF.
    Runs post-fork under the RLIMIT_AS cap; an in-child SIGALRM bounds
    Python-level spins at timeout_sec (the parent watchdog handles native
    code that defeats it)."""
    try:
        import resource

        base = _vm_size_bytes()
        if base and memory_mb:
            limit = base + int(memory_mb * 1024 * 1024)
            resource.setrlimit(resource.RLIMIT_AS, (limit, limit))
    except Exception:
        pass
    import signal

    def _raise_timeout(signum, frame):
        raise TimeoutError(
            f"ProfileFunction exceeded {timeout_sec}s"
        )  # profiles-udf-wrapper.ts:231-236

    if timeout_sec:
        signal.signal(signal.SIGALRM, _raise_timeout)
    while True:
        try:
            pdf = conn.recv()
        except (EOFError, OSError):
            return
        if pdf is None:
            return
        try:
            if timeout_sec:
                signal.setitimer(signal.ITIMER_REAL, timeout_sec)
            try:
                out = profile_fn(pdf)
            finally:
                if timeout_sec:
                    signal.setitimer(signal.ITIMER_REAL, 0.0)
            reply = (out, None)
        except MemoryError:
            reply = (
                None,
                f"ProfileMemoryError: isolate exceeded {memory_mb} MB",
            )
        except BaseException as ex:  # never let the serve loop die silently
            reply = (None, f"{type(ex).__name__}: {ex}")
        try:
            conn.send(reply)
        except (BrokenPipeError, OSError):
            return


class IsolatedProfileRunner(_ForkedRunner):
    """U4 — the reference's per-profile-UDF isolate
    (`services/profiles/src/lib/profiles-udf-wrapper.ts:51` 512 MB,
    `:231-236` 5 s timeout then dispose), as a forked child serving one
    user history per request. `run(pdf)` returns (result_pdf, error):
    on containment (OOM, timeout, exception) the result is None, the
    error carries the disposal reason, and the NEXT user gets a fresh
    child — the batch always completes."""

    def __init__(
        self,
        profile_fn: Callable,
        timeout_sec: float | None = PROFILE_UDF_TIMEOUT_SEC,
        memory_mb: float | None = PROFILE_UDF_MEMORY_MB,
    ):
        self._profile_fn = profile_fn
        self._timeout = timeout_sec
        self._memory_mb = memory_mb
        super().__init__(
            timeout_sec + ISOLATE_GRACE_SEC if timeout_sec else None
        )

    def _child_target(self) -> Callable:
        return _profile_child_main

    def _child_args(self, child_conn) -> tuple:
        return (child_conn, self._profile_fn, self._timeout, self._memory_mb)

    def run(self, pdf) -> tuple[Any, str | None]:
        status, reply = self._roundtrip(pdf)
        if status == "ok":
            return reply
        if status == "timeout":
            return (
                None,
                f"ProfileTimeoutError: isolate exceeded "
                f"{self._budget:.1f}s and was killed",
            )
        return (
            None,
            f"ProfileMemoryError: isolate died (exit code {reply}); "
            f"memory budget {self._memory_mb} MB",
        )
