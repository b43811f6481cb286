"""Registry-wide serving-shape gate (VERDICT r11 "What's wrong" #1).

The driver's canonicalizer sorts raw cell values, so a queries() frame
exposing an array/map/struct column crashes the correctness harness
(`unhashable type: 'list'` on video_fingerprints in r11). Every
driver-facing frame must serve only atomic columns; internal stores may
keep complex types.

Schema-only check: building each DataFrame runs no jobs for ordinary
entries (iterative entries like id_graph do run their convergence loop),
so the whole registry sweeps in one small session.
"""

from __future__ import annotations

from pyspark.sql import types as T

from jitsu_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_no_complex_driver_facing_columns(spark):
    offenders = {}
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        bad = [
            f.name for f in df.schema.fields if isinstance(f.dataType, COMPLEX)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "driver-facing frames expose complex-typed columns (the driver's"
        f" canonicalizer cannot sort them): {offenders}"
    )
