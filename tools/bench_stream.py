"""Streaming-spine throughput benchmark: events/sec through
file-source -> chain transform -> routed MERGE sink.

Usage: python tools/bench_stream.py [n_events] [n_batches]
Prints one JSON line {"metric": "pipeline_events_per_sec", ...}.

Context: the reference rotor's delivery envelope is 10 concurrent events
per instance with per-event isolate-JS overhead (BASELINE.md); this
measures the equivalent end-to-end path (parse -> layout -> dedup MERGE ->
parquet) under micro-batch execution.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from jitsu_spark.session import get_spark
    from jitsu_spark.sinks import WarehouseSink
    from jitsu_spark.streaming.pipeline import run_pipeline
    from jitsu_spark.streaming.source import file_event_stream

    spark = get_spark("bench-stream", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="bench_stream_")
    src = os.path.join(work, "in")
    os.makedirs(src)
    per_batch = n_events // n_batches
    for b in range(n_batches):
        with open(os.path.join(src, f"b{b}.json"), "w") as f:
            for i in range(per_batch):
                eid = b * per_batch + i
                f.write(
                    json.dumps(
                        {
                            "message_id": f"m{eid}",
                            "type": "track",
                            "event": f"Event {eid % 20}",
                            "user_id": f"u{eid % 1000}",
                            "timestamp": f"2024-01-01T{eid % 24:02d}:00:00Z",
                        }
                    )
                    + "\n"
                )

    def transform(df):
        return df.select(
            "message_id",
            "type",
            "event",
            "user_id",
            "timestamp",
            F.lit("events").alias("_table"),
        )

    sink = WarehouseSink(spark, os.path.join(work, "wh"))
    t0 = time.time()
    q = run_pipeline(
        file_event_stream(spark, src, max_files_per_trigger=1),
        sink,
        checkpoint_dir=os.path.join(work, "ckpt"),
        transform=transform,
    )
    q.awaitTermination()
    elapsed = time.time() - t0
    rows = sink.read("events").count()

    # ---- UDF-stage spine (round 4): the same pipeline with a user
    # function chain per event exercising the r3 runtime — ctx.fetch
    # through a stub transport (no network; measures the runtime's fetch
    # bookkeeping) and the durable FileTtlStore as a read-mostly config
    # cache (one store read per event, a fetch+write per cold key).
    from jitsu_spark.plans.chain import (
        ConnectionConfig,
        FetchResponse,
        compile_chain,
    )

    def stub_transport(url, method, headers, body, timeout_sec):
        return FetchResponse(
            url=url, status=200, statusText="OK",
            headers={"content-type": "application/json"},
            body=b'{"flag": "on"}',
        )

    def udf_enrich(ev, ctx):
        key = f"cfg_{hash(ev.get('user_id')) % 50}"
        cached = ctx.store.get(key)
        if cached is None:
            cached = ctx.fetch("https://config.stub/flags", log=False).json()
            ctx.store.set(key, cached, "1h")
        ev["enriched"] = cached["flag"]
        return ev

    chain = compile_chain(
        ConnectionConfig(
            connection_id="bench",
            functions=[udf_enrich],
            fetch_transport=stub_transport,
            store_dir=os.path.join(work, "store"),
        )
    )
    ev_schema = (
        "message_id string, type string, event string, user_id string, "
        "timestamp string, enriched string"
    )

    def transform_udf(df):
        packed = df.select(
            F.to_json(
                F.struct("message_id", "type", "event", "user_id", "timestamp")
            ).alias("event")
        )
        out = chain(packed)
        return (
            out.select(F.from_json("event", ev_schema).alias("e"))
            .select("e.*")
            .withColumn("_table", F.lit("events"))
        )

    sink_udf = WarehouseSink(spark, os.path.join(work, "wh_udf"))
    t1 = time.time()
    q = run_pipeline(
        file_event_stream(spark, src, max_files_per_trigger=1),
        sink_udf,
        checkpoint_dir=os.path.join(work, "ckpt_udf"),
        transform=transform_udf,
    )
    q.awaitTermination()
    elapsed_udf = time.time() - t1
    rows_udf = sink_udf.read("events").count()

    print(
        json.dumps(
            {
                "metric": "pipeline_events_per_sec",
                "value": round(rows / elapsed, 1),
                "unit": "events/sec",
                "events": rows,
                "batches": n_batches,
                "wall_sec": round(elapsed, 2),
                "udf_chain_events_per_sec": round(rows_udf / elapsed_udf, 1),
                "udf_chain_wall_sec": round(elapsed_udf, 2),
                "udf_chain_events": rows_udf,
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
