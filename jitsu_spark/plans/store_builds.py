"""Process-level ledger of memoized store builds.

Several registry families memoize a derived store per (process,
dataset) — the LSH cluster map, the SimHash fingerprint table, the
IVF-PQ store, the JSONL export — so whichever entry runs FIRST pays the
build and every later entry reads the memo (build-once-serve-many, the
deployment shape). That makes round-over-round per-query bench deltas
ambiguous: a query that went from 3.5 s to 0.1 s may just have stopped
being the one that paid the build. Every build site records itself
here, and `bench.py` attributes builds to the query that triggered
them in BENCH_SUMMARY's `store_builds` map, so the split stays
interpretable (r7 verdict, "What's wrong" #3).
"""

from __future__ import annotations

import time
from contextlib import contextmanager

# append-only within a process: (family, seconds)
BUILDS: list[dict] = []


@contextmanager
def timed_build(family: str):
    """Wrap a memoized store build; records its wall cost on success."""
    t0 = time.time()
    yield
    BUILDS.append(
        {"family": family, "seconds": round(time.time() - t0, 3)}
    )
