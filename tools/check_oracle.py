"""Self-check harness replicating the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, then compares row count, schema width, and an order-insensitive
value hash (columns sorted by name, rows sorted by stringified values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            # Full shortest-round-trip precision: the driver hashes exact
            # values, so 2.0 (float) must NOT collapse to the same string as
            # 2 (int) and sub-µs drift must not be rounded away.
            return repr(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return json.dumps([cell(x) for x in list(v)])
        return str(v)

    out = df.map(cell)
    if len(out):
        out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def dtype_kinds(df: pd.DataFrame) -> dict:
    """Column -> numpy dtype kind (i/u/f/b/M/O), lowercased names.

    Catches DuckDB HUGEINT->float64 vs Spark int64 class mismatches that a
    string-only compare at low precision would mask."""
    kinds = {}
    for c in df.columns:
        k = df[c].dtype.kind
        kinds[c.lower()] = "i" if k == "u" else k
    return kinds


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        normalize(df).to_csv(index=False).encode()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from jitsu_spark.session import get_spark
    from jitsu_spark.tables import TABLES

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    # Store-backed oracles (media near-dup pair stages) embed the
    # deterministic store path for the driver's canonical SF; when this
    # tool runs at another SF, re-point them and guarantee the stores
    # (Spark-free pandas builders, idempotent).
    from jitsu_spark.multimodal import adapt_store_oracles

    oracles = adapt_store_oracles(oracles, sf_dir)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"skip  {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        dt = time.time() - t0
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, ddf.columns)):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        if not problems:
            sk, dk = dtype_kinds(sdf), dtype_kinds(ddf)
            bad = {
                c: (sk[c], dk[c])
                for c in sk
                if sk[c] != dk[c]
                # object columns (strings/lists/decimals) compare by value only
                and "O" not in (sk[c], dk[c])
            }
            if bad:
                problems.append(f"dtype kind mismatch {bad}")
        if not problems and value_hash(sdf) != value_hash(ddf):
            problems.append("value hash mismatch")
            a, b = normalize(sdf), normalize(ddf)
            diff = a.compare(b) if a.shape == b.shape else None
            if diff is not None and len(diff):
                print(diff.head(10).to_string())
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}  ({dt:.1f}s)")
            failures.append(name)
        else:
            print(f"ok    {name}  rows={len(sdf)}  ({dt:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
