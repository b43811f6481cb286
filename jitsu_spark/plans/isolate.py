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


class IsolatedChainRunner:
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
        # signals), so it gets the full-chain budget plus grace. An
        # EXPLICIT no-timeout config (None/0) is honored — no watchdog
        # deadline either (the memory cap still applies); imposing a
        # made-up budget would silently override the operator's choice.
        self._budget = (
            timeout_sec * max(1, len(functions)) + ISOLATE_GRACE_SEC
            if timeout_sec
            else None
        )
        self._mp = multiprocessing.get_context("fork")
        self._proc = None
        self._conn = None

    def _spawn(self) -> None:
        parent_conn, child_conn = self._mp.Pipe()
        ctx = self._ctx_factory()
        proc = self._mp.Process(
            target=_child_main,
            args=(
                child_conn,
                self._functions,
                ctx,
                self._timeout,
                self._memory_mb,
            ),
            daemon=True,
        )
        proc.start()
        child_conn.close()
        self._proc, self._conn = proc, parent_conn

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

    def run(self, event: dict) -> tuple[list[dict], str | None, list, list]:
        if self._proc is None or not self._proc.is_alive():
            self._kill()
            self._spawn()
        try:
            self._conn.send(event)
        except (BrokenPipeError, OSError):
            self._kill()
            self._spawn()
            self._conn.send(event)
        if not self._conn.poll(self._budget):  # None = wait forever
            # native hang / blocked SIGALRM: dispose the isolate
            # (udf_wrapper.ts:234-239) and pass the event through with
            # the error recorded — the batch continues on a fresh child
            self._kill()
            return (
                [event],
                f"FunctionTimeoutError: isolate exceeded "
                f"{self._budget:.1f}s and was killed",
                [],
                [],
            )
        try:
            return self._conn.recv()
        except (EOFError, OSError):
            # child died mid-event (hard OOM kill, segfault): identity +
            # error, fresh child for the next event
            code = self._kill()
            return (
                [event],
                f"FunctionMemoryError: isolate died (exit code {code}); "
                f"memory budget {self._memory_mb} MB",
                [],
                [],
            )

    def close(self) -> None:
        if self._conn is not None and self._proc is not None and self._proc.is_alive():
            try:
                self._conn.send(None)  # graceful EOF
                self._proc.join(CHILD_JOIN_SEC)
            except Exception:
                pass
        self._kill()
