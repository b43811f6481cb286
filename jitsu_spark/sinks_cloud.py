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
