"""Cloud writer config contracts (`jitsu_spark/sinks_cloud.py`) — each
reference credential schema (destinations.tsx) maps deterministically to
a Spark writer invocation, with the family limitations pinned."""

from __future__ import annotations

import pytest

from jitsu_spark.sinks_cloud import cloud_writer_spec


class TestBigQuery:
    def test_mapping(self):
        spec = cloud_writer_spec(
            "bigquery",
            {"project": "p1", "bqDataset": "d1", "keyFile": "{json}"},
            "events",
        )
        assert spec.format == "bigquery"
        assert spec.options["parentProject"] == "p1"
        assert spec.options["dataset"] == "d1"
        assert spec.options["table"] == "events"
        assert spec.options["writeMethod"] == "indirect"
        # destinations.tsx:426-436: stream mode disabled, dedup supported
        assert spec.capabilities["stream_mode"] is False
        assert spec.merge_strategy == "merge"


class TestSnowflake:
    def test_mapping_with_defaults_and_parameters(self):
        spec = cloud_writer_spec(
            "snowflake",
            {
                "account": "acme-xy12345",
                "database": "ANALYTICS",
                "username": "loader",
                "password": "pw",
                "warehouse": "LOAD_WH",
                "parameters": {"sfRole": "LOADER"},
            },
            "events",
        )
        assert spec.options["sfUrl"] == "acme-xy12345.snowflakecomputing.com"
        assert spec.options["sfSchema"] == "PUBLIC"  # zod default
        assert spec.options["sfRole"] == "LOADER"  # extra params merge
        assert spec.options["dbtable"] == "events"
        assert spec.merge_strategy == "merge"


class TestBlockStorage:
    def test_s3_ndjson_gzip(self):
        spec = cloud_writer_spec(
            "s3",
            {
                "accessKeyId": "AK", "secretAccessKey": "SK",
                "bucket": "b", "region": "eu-west-1",
                "folder": "jitsu", "format": "ndjson", "compression": "gzip",
            },
            "events",
        )
        assert spec.format == "json"
        assert spec.path == "s3a://b/jitsu/events"
        assert spec.options["compression"] == "gzip"
        # credentials are HADOOP conf, never writer options (Spark
        # silently ignores fs.* writer options)
        assert spec.hadoop_conf["fs.s3a.access.key"] == "AK"
        assert spec.hadoop_conf["fs.s3a.endpoint.region"] == "eu-west-1"
        assert not any(k.startswith("fs.") for k in spec.options)
        # destinations.tsx:563-575: append-only family
        assert spec.merge_strategy == "append"
        assert spec.capabilities["deduplicate"] is False
        assert spec.capabilities["identity_stitching"] is False

    def test_s3_custom_endpoint(self):
        spec = cloud_writer_spec(
            "s3",
            {"accessKeyId": "a", "secretAccessKey": "s", "bucket": "b",
             "endpoint": "http://minio:9000"},
            "t",
        )
        assert spec.hadoop_conf["fs.s3a.endpoint"] == "http://minio:9000"

    def test_gcs_csv(self):
        spec = cloud_writer_spec(
            "gcs",
            {"accessKey": "{json}", "bucket": "b", "format": "csv"},
            "events",
        )
        assert spec.format == "csv"
        assert spec.options["header"] == "true"
        assert spec.path == "gs://b/events"
        assert "google.cloud.auth.service.account.json" in spec.hadoop_conf
        assert not any(k.startswith("google.") for k in spec.options)

    def test_bad_format_rejected(self):
        with pytest.raises(ValueError, match="block storage format"):
            cloud_writer_spec(
                "s3",
                {"accessKeyId": "a", "secretAccessKey": "s", "bucket": "b",
                 "format": "parquet"},
                "t",
            )


def test_unknown_family_rejected():
    with pytest.raises(ValueError, match="unknown cloud destination"):
        cloud_writer_spec("clickhouse-cloud", {}, "t")


def test_writer_spec_drives_a_real_spark_write(spark, tmp_path):
    """write_with_spec executes the spec end to end — exercised with a
    local path standing in for the object store (same json format path
    the S3/GCS ndjson family uses), hadoop conf installed for real."""
    import dataclasses

    from jitsu_spark.sinks_cloud import write_with_spec

    spec = cloud_writer_spec(
        "s3",
        {"accessKeyId": "a", "secretAccessKey": "s", "bucket": "b",
         "format": "ndjson"},
        "t",
    )
    local_spec = dataclasses.replace(spec, path=str(tmp_path / "out"))
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    write_with_spec(df, local_spec)
    assert spark.read.json(local_spec.path).count() == 1
    # the credentials really landed in hadoop configuration
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("fs.s3a.access.key") == "a"
