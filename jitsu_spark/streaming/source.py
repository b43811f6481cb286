"""Stream sources for the event pipeline.

Reference topology (SURVEY §3.1): HTTP ingest -> Kafka `destination-messages`
-> rotor. Here the stream IS the engine input: Kafka in production, a file
stream for local/batch-replay (the reference's own replay story is re-reading
Kafka; ours is re-reading the staged files with the identical DataFrame
plan — batch and streaming share one transformation chain).

Kafka specifics from the reference (`services/rotor/src/lib/rotor.ts:59-72,
228-237`): subscribe `destination-messages`, at-least-once, 8 partitions
consumed concurrently -> `maxOffsetsPerTrigger` is the backpressure knob
(W6) replacing rotor's PQueue(10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The AnalyticsServerEvent core (types/protocols/analytics.d.ts:76-130)
# as a typed Spark schema: reserved columns typed, open bags as JSON
# strings (parsed on demand with get_json_object / from_json so scans
# prune to the accessed keys).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("message_id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("event", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("received_at", T.TimestampType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("anonymous_id", T.StringType()),
        T.StructField("group_id", T.StringType()),
        T.StructField("properties", T.StringType()),  # JSON bag
        T.StructField("traits", T.MapType(T.StringType(), T.StringType())),
        T.StructField("context", T.StringType()),  # JSON bag
        T.StructField("write_key", T.StringType()),
        T.StructField("connection_id", T.StringType()),
    ]
)


def file_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    schema: T.StructType = EVENT_SCHEMA,
) -> DataFrame:
    """JSON-lines file stream (one event per line) — local replay source."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def kafka_event_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "destination-messages",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source; value is the IngestMessage JSON envelope
    (types/protocols/async-request.d.ts:6-24) whose httpPayload is the
    event. Requires the spark-sql-kafka package on the cluster."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    raw = reader.load()
    env = T.StructType(
        [
            T.StructField("messageId", T.StringType()),
            T.StructField("connectionId", T.StringType()),
            T.StructField("writeKey", T.StringType()),
            T.StructField("ingestType", T.StringType()),
            T.StructField("messageCreated", T.TimestampType()),
            T.StructField("httpPayload", T.StringType()),
        ]
    )
    return raw.select(
        F.from_json(F.col("value").cast("string"), env).alias("m"),
        F.col("timestamp").alias("received_at"),
    ).select(
        F.col("m.messageId").alias("message_id"),
        F.col("m.connectionId").alias("connection_id"),
        F.col("m.writeKey").alias("write_key"),
        F.col("m.httpPayload").alias("payload_json"),
        "received_at",
    )
