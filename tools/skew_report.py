"""Join/aggregation key-skew diagnostics over the testdata tables.

Usage: python tools/skew_report.py [sf_dir]

For each (table, key) pair the engine shuffles on, reports the top key's
share of rows and the p99/mean ratio — the numbers that decide whether a
salted rewrite (`functions/skew.py`) or AQE skew-join handling is needed
before a 100x scale-up. DuckDB-based (no Spark session) so it runs in
seconds and can be pointed at any sf directory.
"""

from __future__ import annotations

import sys

import duckdb

# The shuffle keys the engine actually uses (SCALING.md inventory).
KEYS = [
    ("events", "user_id"),
    ("events", "event_type"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
    ("documents", "source"),
]


def report(sf_dir: str) -> list[dict]:
    con = duckdb.connect()
    out = []
    for table, key in KEYS:
        row = con.execute(
            f"""
            WITH counts AS (
              SELECT {key} AS k, count(*) AS c
              FROM '{sf_dir}/{table}.parquet' GROUP BY 1
            )
            SELECT count(*) AS n_keys,
                   CAST(sum(c) AS BIGINT) AS n_rows,
                   CAST(max(c) AS BIGINT) AS top_key_rows,
                   round(max(c) / sum(c), 6) AS top_share,
                   round(quantile_cont(c, 0.99) / avg(c), 3) AS p99_over_mean
            FROM counts
            """
        ).fetchone()
        out.append(
            {
                "table": table,
                "key": key,
                "n_keys": row[0],
                "n_rows": row[1],
                "top_key_rows": row[2],
                "top_share": row[3],
                "p99_over_mean": row[4],
                # one reducer holding > 5% of all rows is the classic
                # straggler threshold; low-cardinality keys are exempt
                # (partial aggregation collapses them map-side before the
                # shuffle, so no reducer ever sees the raw rows)
                "skewed": row[3] is not None and row[3] > 0.05 and row[0] > 50,
            }
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rows = report(sf_dir)
    w = max(len(f"{r['table']}.{r['key']}") for r in rows)
    print(f"{'key'.ljust(w)}  n_keys  n_rows  top_share  p99/mean  skewed")
    for r in rows:
        print(
            f"{(r['table'] + '.' + r['key']).ljust(w)}  "
            f"{r['n_keys']:6d}  {r['n_rows']:6d}  "
            f"{r['top_share']:.4%}  {r['p99_over_mean']:8.3f}  "
            f"{'YES' if r['skewed'] else 'no'}"
        )


if __name__ == "__main__":
    main()
