"""Cloud warehouse / block-storage writer configuration (S5 depth).

The reference's bulker reaches BigQuery, Snowflake, S3, and GCS from the
same connection-config shapes (`webapps/console/lib/schema/
destinations.tsx`: bigquery `:426`, snowflake `:469`, s3 `:563`, gcs
`:597`, blockStorageSettings `:209-223`). Those services are not
reachable from this sandbox, so — like the Kafka source — the config
swap itself is the tested surface: each family maps its credential
schema to the Spark writer invocation (format, options, save mode,
MERGE strategy) as a pure function, and `capabilities` carries the
reference's documented family limitations (BigQuery/S3/GCS have stream
mode disabled; block storage cannot deduplicate or identity-stitch, so
loads are append-only).

At 100 TB each family keeps bulker's MERGE contract the scalable way:
- BigQuery: load into a staging table then `MERGE` on the primary key
  (the spark-bigquery connector's indirect write + a MERGE statement) —
  dedup happens warehouse-side, Spark never shuffles for it.
- Snowflake: same staging + `MERGE`, via the spark-snowflake connector.
- S3/GCS: append-only object layout partitioned by load date; no MERGE
  by design (the reference disables deduplication there too).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class WriterSpec:
    """One Spark write invocation, fully determined by connection config.

    `options` go on the DataFrameWriter; `hadoop_conf` entries are
    FILESYSTEM configuration (fs.s3a.* credentials, GCS auth) that Spark
    ignores as writer options — they must reach
    `spark.sparkContext.hadoopConfiguration` (or be set as
    `spark.hadoop.<key>` at session build), which `apply_hadoop_conf`
    does; `path` is the save target for path-based families (None for
    table-based connectors)."""

    format: str
    options: dict = field(default_factory=dict)
    hadoop_conf: dict = field(default_factory=dict)
    path: str | None = None
    mode: str = "append"
    # bulker's deduplicate:true contract for this family:
    #   "merge"  -> staging table + warehouse-side MERGE on primary key
    #   "append" -> family cannot dedup (block storage)
    merge_strategy: str = "merge"
    capabilities: dict = field(default_factory=dict)


def apply_hadoop_conf(spark, spec: "WriterSpec") -> None:
    """Install the spec's filesystem credentials where Hadoop reads
    them. Session-wide by necessity: Hadoop config is not per-write."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in spec.hadoop_conf.items():
        hc.set(k, v)


def write_with_spec(df, spec: "WriterSpec") -> None:
    """Execute the spec: hadoop conf, then writer options, then save."""
    apply_hadoop_conf(df.sparkSession, spec)
    writer = df.write.format(spec.format).mode(spec.mode)
    for k, v in spec.options.items():
        writer = writer.option(k, v)
    if spec.path is not None:
        writer.save(spec.path)
    else:
        writer.save()


_BLOCK_STORAGE_CAPS = {
    # destinations.tsx:563-616 limitations
    "stream_mode": False,
    "deduplicate": False,
    "identity_stitching": False,
}


def bigquery_writer(credentials: dict, table: str) -> WriterSpec:
    """bigquery credentials {project, bqDataset, keyFile}
    (destinations.tsx:440-455) -> spark-bigquery connector invocation."""
    return WriterSpec(
        format="bigquery",
        options={
            "parentProject": credentials["project"],
            "dataset": credentials["bqDataset"],
            "table": table,
            # service-account JSON rides as a credentials option; indirect
            # writes stage via GCS then load — the MERGE runs as a BQ
            # statement against the staged table
            "credentials": credentials["keyFile"],
            "writeMethod": "indirect",
        },
        merge_strategy="merge",
        capabilities={"stream_mode": False, "deduplicate": True,
                      "identity_stitching": True},
    )


def snowflake_writer(credentials: dict, table: str) -> WriterSpec:
    """snowflake credentials {account, database, defaultSchema, username,
    password, warehouse, parameters} (destinations.tsx:469-489) ->
    spark-snowflake connector invocation."""
    opts = {
        "sfUrl": f"{credentials['account']}.snowflakecomputing.com",
        "sfDatabase": credentials["database"],
        "sfSchema": credentials.get("defaultSchema", "PUBLIC"),
        "sfUser": credentials["username"],
        "sfPassword": credentials["password"],
        "sfWarehouse": credentials["warehouse"],
        "dbtable": table,
    }
    opts.update(credentials.get("parameters") or {})
    return WriterSpec(
        format="snowflake",
        options=opts,
        merge_strategy="merge",
        capabilities={"stream_mode": True, "deduplicate": True,
                      "identity_stitching": True},
    )


def _block_storage_format(settings: dict) -> tuple[str, dict]:
    """blockStorageSettings {folder, format: ndjson|ndjson_flat|csv,
    compression: gzip|none} (destinations.tsx:209-223) -> Spark sink
    format + options. ndjson maps to Spark's json source; csv to csv
    with a header, matching the bulker file layout."""
    fmt = settings.get("format", "ndjson")
    compression = settings.get("compression", "none")
    if fmt in ("ndjson", "ndjson_flat"):
        spark_fmt, opts = "json", {}
    elif fmt == "csv":
        spark_fmt, opts = "csv", {"header": "true"}
    else:
        raise ValueError(f"unknown block storage format {fmt!r}")
    if compression == "gzip":
        opts["compression"] = "gzip"
    return spark_fmt, opts


def s3_writer(credentials: dict, table: str) -> WriterSpec:
    """s3 credentials {accessKeyId, secretAccessKey, bucket, region,
    endpoint?} + blockStorageSettings (destinations.tsx:563-594)."""
    fmt, opts = _block_storage_format(credentials)
    folder = credentials.get("folder") or ""
    prefix = f"{folder.rstrip('/')}/" if folder else ""
    hadoop = {
        "fs.s3a.access.key": credentials["accessKeyId"],
        "fs.s3a.secret.key": credentials["secretAccessKey"],
        "fs.s3a.endpoint.region": credentials.get("region", "us-west-1"),
    }
    if credentials.get("endpoint"):
        hadoop["fs.s3a.endpoint"] = credentials["endpoint"]
    return WriterSpec(
        format=fmt, options=opts, hadoop_conf=hadoop,
        path=f"s3a://{credentials['bucket']}/{prefix}{table}", mode="append",
        merge_strategy="append", capabilities=dict(_BLOCK_STORAGE_CAPS),
    )


def gcs_writer(credentials: dict, table: str) -> WriterSpec:
    """gcs credentials {accessKey, bucket} + blockStorageSettings
    (destinations.tsx:597-616)."""
    fmt, opts = _block_storage_format(credentials)
    folder = credentials.get("folder") or ""
    prefix = f"{folder.rstrip('/')}/" if folder else ""
    return WriterSpec(
        format=fmt, options=opts,
        hadoop_conf={
            "google.cloud.auth.service.account.json": credentials["accessKey"]
        },
        path=f"gs://{credentials['bucket']}/{prefix}{table}", mode="append",
        merge_strategy="append", capabilities=dict(_BLOCK_STORAGE_CAPS),
    )


# ---------------------------------------------------------------------------
# Staging + MERGE statement generation (round 4): the cloud families keep
# bulker's deduplicate:true contract warehouse-side — Spark reduces the
# batch to one row per key (sinks._latest_per_key), the connector stages
# it, and ONE MERGE promotes the stage into the target inside the dedup
# window. These are the statements that run as BigQuery jobs / Snowflake
# queries; the ANSI dialect executes verbatim on Derby, which the tests
# use as a live twin to prove the generated MERGE reproduces the parquet
# WarehouseSink.upsert row-for-row (same window semantics: conflicts
# outside [batch_min - window, batch_max] are left duplicated by design).
# ---------------------------------------------------------------------------

import re as _re

_MERGE_IDENT = _re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")

MERGE_DIALECTS = {
    # identifier quote, timestamp->date expression, date literal.
    # table_q: how TABLE names are quoted — the live-twin ANSI form
    # leaves them unquoted because engines that fold unquoted
    # identifiers (Derby/Oracle upper, postgres lower) store the
    # Spark-created table under the folded name, while Spark's JDBC
    # writer QUOTES column names (case-preserved) — so columns must be
    # quoted and tables must not.
    "bigquery": {"q": "`", "table_q": "`", "to_date": "DATE({x})",
                 "date_lit": "DATE '{d}'"},
    "snowflake": {"q": '"', "table_q": '"', "to_date": "TO_DATE({x})",
                  "date_lit": "DATE '{d}'"},
    "ansi": {"q": '"', "table_q": "", "to_date": "CAST({x} AS DATE)",
             "date_lit": "DATE('{d}')"},
}

_DATE_RE = _re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _mq(name: str, q: str) -> str:
    if not _MERGE_IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    if not q:
        return name
    # qualified names quote each part (dataset.table)
    return ".".join(f"{q}{part}{q}" for part in name.split("."))


def merge_window_bounds(
    batch, timestamp_col: str = "ts", dedup_window_days: int = 31
) -> tuple[str, str]:
    """The dedup window the parquet path computes driver-side
    (sinks.WarehouseSink.upsert): [batch min date - window, batch max
    date], as ISO literals for the MERGE ON clause. One tiny agg —
    the same collect the parquet path already does for its partition
    pruning."""
    from pyspark.sql import functions as F

    row = batch.agg(
        F.date_sub(
            F.min(F.to_date(F.col(timestamp_col))), dedup_window_days
        ).alias("lo"),
        F.max(F.to_date(F.col(timestamp_col))).alias("hi"),
    ).first()
    return str(row["lo"]), str(row["hi"])


def merge_statements(
    family: str,
    target_table: str,
    staging_table: str,
    columns: list[str],
    primary_key: list[str],
    timestamp_col: str = "ts",
    window_lo: str | None = None,
    window_hi: str | None = None,
) -> list[str]:
    """The staging-promotion statements for a cloud family: one MERGE
    (window-bounded on the target's event date, newest-timestamp wins,
    unmatched source rows insert) followed by the staging DROP.

    Contract parity with `sinks.WarehouseSink.upsert`:
    - the staged batch is already one row per primary key (the Spark
      `_latest_per_key` reduction runs before staging — same as the
      JDBC sink);
    - a target row with the same key INSIDE the window: the newer
      timestamp wins (`WHEN MATCHED AND s.ts >= t.ts`);
    - a target row with the same key OUTSIDE the window: untouched, and
      the source row still inserts — window-bounded dedup leaves that
      duplicate by design, exactly like the parquet path's partition
      pruning.
    """
    d = MERGE_DIALECTS[family if family in MERGE_DIALECTS else "ansi"]
    q, tq = d["q"], d["table_q"]
    pk = [c for c in primary_key]
    for c in pk:
        if c not in columns:
            raise ValueError(f"primary key column {c!r} not in columns")
    if timestamp_col not in columns:
        raise ValueError(
            f"timestamp column {timestamp_col!r} not in columns"
        )
    non_key = [c for c in columns if c not in pk]
    t, s = _mq(target_table, tq), _mq(staging_table, tq)
    on = " AND ".join(f"t.{_mq(k, q)} = s.{_mq(k, q)}" for k in pk)
    if window_lo is not None and window_hi is not None:
        for lit in (window_lo, window_hi):
            if not _DATE_RE.match(lit):
                raise ValueError(f"window bound {lit!r} is not YYYY-MM-DD")
        t_date = d["to_date"].format(x=f"t.{_mq(timestamp_col, q)}")
        on += (
            f" AND {t_date} BETWEEN {d['date_lit'].format(d=window_lo)}"
            f" AND {d['date_lit'].format(d=window_hi)}"
        )
    ins_cols = ", ".join(_mq(c, q) for c in columns)
    ins_vals = ", ".join(f"s.{_mq(c, q)}" for c in columns)
    ts_q = _mq(timestamp_col, q)
    if non_key:
        sets = ", ".join(f"t.{_mq(c, q)} = s.{_mq(c, q)}" for c in non_key)
        matched = (
            f"WHEN MATCHED AND s.{ts_q} >= t.{ts_q} "
            f"THEN UPDATE SET {sets} "
        )
    else:
        # every column is part of the key (link/fact table): an UPDATE
        # would be a no-op and `UPDATE SET` with no assignments is a
        # parse error — emit a pure insert-if-absent MERGE
        matched = ""
    return [
        f"MERGE INTO {t} t USING {s} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})",
        f"DROP TABLE {s}",
    ]


CLOUD_WRITERS = {
    "bigquery": bigquery_writer,
    "snowflake": snowflake_writer,
    "s3": s3_writer,
    "gcs": gcs_writer,
}


def cloud_writer_spec(destination_type: str, credentials: dict, table: str) -> WriterSpec:
    """Catalog dispatch for the cloud families (the S5 ids the local
    parquet/JDBC sinks don't cover)."""
    try:
        return CLOUD_WRITERS[destination_type](credentials, table)
    except KeyError:
        raise ValueError(f"unknown cloud destination {destination_type!r}")
