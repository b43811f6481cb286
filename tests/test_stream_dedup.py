"""W5 — watermarked streaming dedup helper."""

from __future__ import annotations

import json
import os


def test_dedup_within_watermark(spark, tmp_path):
    from jitsu_spark.streaming.pipeline import dedup_within_watermark
    from jitsu_spark.streaming.source import file_event_stream

    src = str(tmp_path / "in")
    os.makedirs(src)
    events = [
        {"message_id": "m1", "type": "track", "timestamp": "2024-01-01T00:00:01Z"},
        {"message_id": "m1", "type": "track", "timestamp": "2024-01-01T00:00:01Z"},
        {"message_id": "m2", "type": "track", "timestamp": "2024-01-01T00:00:02Z"},
    ]
    with open(os.path.join(src, "b.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    out = dedup_within_watermark(file_event_stream(spark, src))
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT message_id FROM dedup_out").collect()
    assert sorted(r.message_id for r in rows) == ["m1", "m2"]
