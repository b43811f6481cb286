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


# The IngestMessage envelope (types/protocols/async-request.d.ts:6-24):
# one Kafka message per event, httpPayload carrying the analytics event.
INGEST_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("messageId", T.StringType()),
        T.StructField("connectionId", T.StringType()),
        T.StructField("writeKey", T.StringType()),
        T.StructField("ingestType", T.StringType()),
        T.StructField("messageCreated", T.TimestampType()),
        T.StructField("httpPayload", T.StringType()),
    ]
)

DEFAULT_KAFKA_TOPIC = "destination-messages"  # kafka-config.ts:71-90


def kafka_source_options(
    brokers: str,
    topic: str = DEFAULT_KAFKA_TOPIC,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The rotor consumer semantics (`rotor.ts:59-72,228-237`) as Spark
    Kafka source options: subscribe to the destination topic, start from
    the earliest uncommitted offset (at-least-once — Spark checkpoints
    offsets per micro-batch, the analogue of autoCommit), and bound each
    trigger (backpressure, the CONCURRENCY envelope's role). Kept as a
    pure function so the config-swap contract is testable without a
    broker or the spark-sql-kafka package."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def decode_ingest_messages(raw: DataFrame) -> DataFrame:
    """Kafka (key, value, timestamp) -> flattened IngestMessage columns.
    Works on any DataFrame with a binary/string `value` and `timestamp`
    (the file-stream twin reuses it in tests)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), INGEST_MESSAGE_SCHEMA).alias(
            "m"
        ),
        F.col("timestamp").alias("received_at"),
    ).select(
        F.col("m.messageId").alias("message_id"),
        F.col("m.connectionId").alias("connection_id"),
        F.col("m.writeKey").alias("write_key"),
        F.col("m.httpPayload").alias("payload_json"),
        "received_at",
    )


def kafka_event_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = DEFAULT_KAFKA_TOPIC,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source; value is the IngestMessage JSON envelope whose
    httpPayload is the event. Requires the spark-sql-kafka package on the
    cluster (config-swap vs the file twin; see kafka_source_options)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        brokers, topic, max_offsets_per_trigger
    ).items():
        reader = reader.option(k, v)
    return decode_ingest_messages(reader.load())
