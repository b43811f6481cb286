"""Geo-IP and user-agent enrichment as oracle-checked operators.

J1/F7: the reference resolves event IP -> geo via MaxMind
(`services/rotor/src/lib/maxmind.ts:30-44,114-220`, applied at
`message-handler.ts:84-92`). The engine's form is a broadcast range join
against an ip_ranges dimension (jitsu_spark.events.enrich.geo_enrich): the
/8-prefix equi-key turns BETWEEN into a broadcast HASH join with a residual
range filter — O(1) lookup per event, no shuffle of the event stream,
exactly what survives 100 TB.

F6/P3: UA parsing (`libs/core-functions/src/functions/lib/ua.ts:10-30`) and
bot filtering (`mixpanel-destination.ts:497-500`). Family/bot detection is
keyword dispatch -> a plan-level when/otherwise chain (whole-stage codegen),
not a Python UDF.

The testdata events carry no ip/ua columns, so both queries derive them
deterministically from event_id/user_id; the DuckDB oracle mirrors the
derivation, so the comparison checks the join/parse logic itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..events.enrich import geo_enrich
from ..tables import load_table

# Knuth multiplicative hash keeps ips spread across the /8 space.
_IP_HASH = 2654435761


def _ip_ranges(spark: SparkSession) -> DataFrame:
    """256 ranges, one per /8 block: [i*2^24, (i+1)*2^24 - 1] -> country C<i>."""
    return spark.range(256).select(
        (F.col("id") * 16777216).alias("start_int"),
        ((F.col("id") + 1) * 16777216 - 1).alias("end_int"),
        F.concat(F.lit("C"), F.col("id")).alias("country"),
        F.concat(F.lit("city"), F.col("id") % 16).alias("city"),
    )


def geo_enrich_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        ((F.col("event_id") * _IP_HASH) % 4294967296).alias("ip_int"),
    )
    # synthesize the dotted quad, then run the real ip->int->range-join path
    ip = F.concat_ws(
        ".",
        (F.col("ip_int") / 16777216).cast("long") % 256,
        (F.col("ip_int") / 65536).cast("long") % 256,
        (F.col("ip_int") / 256).cast("long") % 256,
        F.col("ip_int") % 256,
    )
    enriched = geo_enrich(ev.withColumn("ip", ip), _ip_ranges(spark))
    return enriched.select("event_id", "country", "city")


GEO_ENRICH_SQL = """
WITH ev AS (
  SELECT event_id, (event_id * 2654435761) % 4294967296 AS ip_int
  FROM events
),
ranges AS (
  SELECT i AS id, i * 16777216 AS start_int, (i + 1) * 16777216 - 1 AS end_int,
         'C' || i AS country, 'city' || (i % 16) AS city
  FROM generate_series(0, 255) AS t(i)
)
SELECT e.event_id, r.country, r.city
FROM ev e LEFT JOIN ranges r
  ON e.ip_int BETWEEN r.start_int AND r.end_int
"""


_UA_SAMPLES = [
    "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0",
    "Mozilla/5.0 (Macintosh) Version/17.0 Safari/605.1",
    "Mozilla/5.0 (X11; Linux x86_64) Firefox/121.0",
    "Googlebot/2.1 (+http://www.google.com/bot.html)",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0) Mobile/15E148",
]


def ua_parse_bot_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse UA into (browser, os, bot); drop bot traffic (P3) and count
    events per browser/os — the mixpanel destination's pre-aggregation
    view of non-bot traffic."""
    ev = load_table(spark, sf_dir, "events")
    ua = F.element_at(
        F.array(*[F.lit(s) for s in _UA_SAMPLES]),
        (F.col("user_id") % 5 + 1).cast("int"),
    )
    parsed = ev.select(
        "event_id",
        ua.alias("ua"),
    ).select(
        "event_id",
        F.when(F.col("ua").contains("Firefox"), "firefox")
        .when(F.col("ua").contains("Chrome"), "chrome")
        .when(F.col("ua").contains("Safari"), "safari")
        .otherwise("other")
        .alias("browser"),
        F.when(F.col("ua").contains("Windows"), "windows")
        .when(F.col("ua").contains("Macintosh"), "macos")
        .when(F.col("ua").contains("Linux"), "linux")
        .when(F.col("ua").contains("iPhone"), "ios")
        .otherwise("other")
        .alias("os"),
        (
            F.lower(F.col("ua")).contains("bot")
            | F.lower(F.col("ua")).contains("crawler")
            | F.lower(F.col("ua")).contains("spider")
        ).alias("bot"),
    )
    return (
        parsed.where(~F.col("bot"))
        .groupBy("browser", "os")
        .agg(F.count(F.lit(1)).alias("events"))
    )


UA_PARSE_SQL = """
WITH parsed AS (
  SELECT event_id,
         ['Mozilla/5.0 (Windows NT 10.0) Chrome/120.0',
          'Mozilla/5.0 (Macintosh) Version/17.0 Safari/605.1',
          'Mozilla/5.0 (X11; Linux x86_64) Firefox/121.0',
          'Googlebot/2.1 (+http://www.google.com/bot.html)',
          'Mozilla/5.0 (iPhone; CPU iPhone OS 17_0) Mobile/15E148'
         ][(user_id % 5 + 1)::INT] AS ua
  FROM events
),
feat AS (
  SELECT event_id,
         CASE WHEN ua LIKE '%Firefox%' THEN 'firefox'
              WHEN ua LIKE '%Chrome%' THEN 'chrome'
              WHEN ua LIKE '%Safari%' THEN 'safari'
              ELSE 'other' END AS browser,
         CASE WHEN ua LIKE '%Windows%' THEN 'windows'
              WHEN ua LIKE '%Macintosh%' THEN 'macos'
              WHEN ua LIKE '%Linux%' THEN 'linux'
              WHEN ua LIKE '%iPhone%' THEN 'ios'
              ELSE 'other' END AS os,
         (lower(ua) LIKE '%bot%' OR lower(ua) LIKE '%crawler%'
          OR lower(ua) LIKE '%spider%') AS bot
  FROM parsed
)
SELECT browser, os, count(*) AS events
FROM feat WHERE NOT bot
GROUP BY browser, os
"""


QUERIES = {
    "geo_enrich_range_join": geo_enrich_range_join,
    "ua_parse_bot_filter": ua_parse_bot_filter,
}

ORACLE = {
    "geo_enrich_range_join": GEO_ENRICH_SQL,
    "ua_parse_bot_filter": UA_PARSE_SQL,
}
