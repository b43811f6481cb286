"""Contract tests: every queries() entry runs and matches its DuckDB oracle
at sf0.001 (fast); the driver repeats this at sf0.01."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tools.check_oracle import value_hash


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0


def test_registry_shape():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"


@pytest.fixture(scope="module")
def duck(sf_dir):
    from jitsu_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    from jitsu_spark.multimodal import adapt_store_oracles

    qs = entry_mod.queries()
    # store-backed oracles embed the canonical-SF store paths; re-point
    # them at this session's sf_dir (the same seam check_oracle uses)
    oracles = adapt_store_oracles(entry_mod.oracle_sql(), sf_dir)
    sdf = qs[name](spark, sf_dir).toPandas()
    if name not in oracles:
        pytest.skip("rows-only operator (no SQL oracle)")
    ddf = duck.execute(oracles[name]).df()
    assert len(sdf) == len(ddf), f"row count {len(sdf)} != {len(ddf)}"
    assert sorted(map(str.lower, sdf.columns)) == sorted(map(str.lower, ddf.columns))
    assert value_hash(sdf) == value_hash(ddf)


def test_approx_active_users_within_design_error(spark, sf_dir):
    """The sketch estimate tracks the exact count within HLL design
    error at any scale — the invariant that holds where cross-engine
    hash equality (exact only in the sparse regime) cannot."""
    from jitsu_spark.operators.events_ops import (
        active_users_daily,
        active_users_daily_approx,
    )

    exact = {r[0]: r[1] for r in active_users_daily(spark, sf_dir).collect()}
    approx = {
        r[0]: r[1] for r in active_users_daily_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(0.05 * n, 2), (day, n, approx[day])
