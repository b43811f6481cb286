"""Unit tests for the scalar enrichment family (F3-F13, P6, J1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jitsu_spark.events import enrich


def test_anonymize_ip(spark):
    df = spark.createDataFrame(
        [("10.1.2.3",), ("255.255.255.255",), ("not-an-ip",)], ["ip"]
    )
    out = [r.anon for r in df.select(enrich.anonymize_ip(F.col("ip")).alias("anon")).collect()]
    assert out == ["10.1.2.0", "255.255.255.0", None]


def test_url_parts_and_utm(spark):
    url = "https://shop.example.com/cart/view?utm_source=nl&gclid=g123&x=1"
    df = spark.createDataFrame([(url,)], ["url"])
    parts = enrich.url_parts(F.col("url"))
    r = df.select(*(c.alias(k) for k, c in parts.items())).collect()[0]
    assert r.doc_host == "shop.example.com"
    assert r.doc_path == "/cart/view"
    assert "utm_source=nl" in r.doc_search
    utm = enrich.utm_from_query(F.col("url"))
    r2 = df.select(*(c.alias(k) for k, c in utm.items())).collect()[0]
    assert r2.utm_source == "nl"
    assert r2.gclid == "g123"
    assert r2.utm_campaign is None


def test_event_time_safe_clamps_future(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 00:05:00"), ("2099-01-01 00:00:00", "2024-01-02 00:00:00")],
        ["ts", "received_at"],
    ).select(F.col("ts").cast("timestamp"), F.col("received_at").cast("timestamp"))
    out = df.select(
        enrich.event_time_safe(F.col("ts"), F.col("received_at")).alias("safe")
    ).collect()
    assert str(out[0].safe) == "2024-01-01 00:00:00"
    assert str(out[1].safe) == "2024-01-02 00:00:00"  # future ts clamped


def test_screen_string_and_ids(spark):
    df = spark.createDataFrame([(1280, 720, "m1", "track")], ["w", "h", "mid", "t"])
    r = df.select(
        enrich.screen_string(F.col("w"), F.col("h")).alias("s"),
        enrich.insert_id(F.col("mid"), F.col("t")).alias("iid"),
    ).collect()[0]
    assert r.s == "1280x720"
    import hashlib

    assert r.iid == hashlib.md5(b"m1_track").hexdigest()


def test_traits_merge_context_wins(spark):
    df = spark.createDataFrame(
        [({"a": "1", "b": "2"}, {"b": "3", "c": "4"})],
        "event_traits map<string,string>, context_traits map<string,string>",
    )
    r = df.select(
        enrich.traits_merge(F.col("event_traits"), F.col("context_traits")).alias("m")
    ).collect()[0]
    assert r.m == {"a": "1", "b": "3", "c": "4"}


def test_sanitize_event_name(spark):
    df = spark.createDataFrame([("Order Completed! (v2)" + "x" * 50,)], ["n"])
    r = df.select(enrich.sanitize_event_name(F.col("n")).alias("s")).collect()[0]
    assert r.s == "Order_Completed___v2_" + "x" * 19
    assert len(r.s) == 40


def test_geo_enrich_range_join(spark):
    events = spark.createDataFrame(
        [("e1", "1.0.0.5"), ("e2", "1.0.1.7"), ("e3", "9.9.9.9")], ["id", "ip"]
    )
    ranges = spark.createDataFrame(
        [(16777216, 16777471, "AU", "Sydney"), (16777472, 16777727, "CN", "Fuzhou")],
        ["start_int", "end_int", "country", "city"],
    )
    out = {r.id: (r.country, r.city) for r in enrich.geo_enrich(events, ranges).collect()}
    assert out["e1"] == ("AU", "Sydney")
    assert out["e2"] == ("CN", "Fuzhou")
    assert out["e3"] == (None, None)
