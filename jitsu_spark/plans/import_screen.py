"""U2 import screen for untrusted function chains.

The reference's isolate refuses `require`/`import` inside user functions
unless the target is `@jitsu/functions-lib` or node `crypto`
(`services/rotor/src/lib/udf_wrapper.ts:86-88,146-153` — the wrapper
rewrites the module graph and throws on any other specifier). The forked
Python isolate (`plans/isolate.py`) enforces the memory/time/disposal
contract but, until round 10, ran operator-reviewed Python without an
equivalent screen — the last documented U2 delta (VERDICT r9 #4).

This module closes it: an AST walk over each untrusted function's source
that refuses

- `import X` / `from X import ...` unless X (or its root package) is in
  ``ALLOWED_MODULES`` — the functions-lib+crypto analog: pure-computation
  stdlib only, nothing that opens sockets, files, or processes;
- relative imports (no package context exists in the isolate);
- bare references to the dynamic-import / IO escape hatches
  (``__import__``, ``open``, ``eval``, ``exec``, ``compile``,
  ``breakpoint``) and attribute access to ``__import__``.

Module-level imports in the file that DEFINES the function are out of
scope by construction — `inspect.getsource` returns the function body
only, exactly as udf_wrapper screens the user snippet, not its host.
Refusal is a RECORDED per-event error (the chain passes events through
with `_error` set and the batch completes), never a task death —
matching every other function-failure path in `plans/chain.py`.
"""

from __future__ import annotations

import ast
import inspect
import textwrap
from collections.abc import Callable

# The `@jitsu/functions-lib` + `crypto` analog: stdlib modules a
# transformation function legitimately needs, none of which reach the
# filesystem, network, or process table. (udf_wrapper.ts:146-153 allows
# exactly two specifiers; this list is the same posture for Python.)
ALLOWED_MODULES = frozenset(
    {
        "json",
        "math",
        "re",
        "hashlib",
        "hmac",
        "base64",
        "binascii",
        "datetime",
        "time",
        "uuid",
        "random",
        "string",
        "collections",
        "itertools",
        "functools",
        "statistics",
        "decimal",
        "fractions",
        "urllib.parse",
        "unicodedata",
        "typing",
        "dataclasses",
        "copy",
        "enum",
        "zlib",
    }
)

# Dynamic-import and IO escape hatches refused as bare names
# (udf_wrapper.ts:86-88 bans the `require` identifier the same way).
BANNED_NAMES = frozenset(
    {"__import__", "open", "eval", "exec", "compile", "breakpoint"}
)


def _allowed(module: str) -> bool:
    """True when `module` or its root package is allowlisted
    (`urllib.parse` allows itself; `urllib.request` does not ride in on
    the `urllib.parse` entry — the match is exact-or-root-of-entry).

    The root rule only fires for BARE allowlist entries: 'collections'
    being listed admits 'collections.abc', but a dotted entry like
    'urllib.parse' never admits siblings through its root."""
    if module in ALLOWED_MODULES:
        return True
    root = module.split(".", 1)[0]
    return root != module and root in ALLOWED_MODULES


def screen_source(src: str) -> str | None:
    """AST-walk one function's source; return a refusal reason or None."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError as exc:  # decorated/partial extraction artifacts
        return f"ImportScreenError: unparseable function source ({exc.msg})"
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if not _allowed(alias.name):
                    return (
                        "ImportScreenError: import of "
                        f"'{alias.name}' is not in the allowed module "
                        "list for untrusted functions"
                    )
        elif isinstance(node, ast.ImportFrom):
            mod = node.module or ""
            if node.level:
                return (
                    "ImportScreenError: relative imports are not "
                    "allowed in untrusted functions"
                )
            if not _allowed(mod):
                return (
                    f"ImportScreenError: import from '{mod}' is not in "
                    "the allowed module list for untrusted functions"
                )
        elif isinstance(node, ast.Name) and node.id in BANNED_NAMES:
            return (
                f"ImportScreenError: use of '{node.id}' is not allowed "
                "in untrusted functions"
            )
        elif isinstance(node, ast.Attribute) and node.attr == "__import__":
            return (
                "ImportScreenError: attribute access to '__import__' is "
                "not allowed in untrusted functions"
            )
    return None


def screen_function(fn: Callable) -> str | None:
    """Screen one callable. Callables without retrievable Python source
    (C builtins, functools.partial) pass — they cannot smuggle an import
    statement, and the isolate's RLIMIT/timeout guards still apply."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return None
    return screen_source(src)


def screen_functions(functions: list[Callable]) -> str | None:
    """Screen a whole chain; first refusal wins, annotated with the
    offending function's name so the events-log row is actionable."""
    for fn in functions:
        reason = screen_function(fn)
        if reason is not None:
            name = getattr(fn, "__name__", repr(fn))
            return f"{reason} (function {name!r} refused before execution)"
    return None
