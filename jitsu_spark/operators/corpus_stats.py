"""Corpus-level n-gram statistics — the boilerplate-detection side of
web-corpus prep (RefinedWeb/CCNet-style line dedup operates on shared
lines; this corpus is single-line, so the shared unit is the word
3-gram shingle, the same unit the dedup family already hashes).

- `boilerplate_shingle_stats`: per-document, the fraction of its
  shingles that are corpus boilerplate (document frequency above a
  threshold) — the signal behind "strip the navbars/footers" filters.
- `ngram_topk`: the top-K shingles by document frequency — the corpus
  dashboard a pipeline owner watches for crawler junk and template
  explosions.

Scale: one shingle explode feeds both (the dedup family's
`_shingle_rows`); the document-frequency aggregate is partial-agg
friendly; the hot set (df > threshold) is tiny by construction and
broadcast back onto the per-doc rows — the corpus shuffles once on
shingle, never on text. Zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.hints import maybe_broadcast
from .dedup import _SHINGLE_ROWS_DUCK, _shingle_rows

BOILERPLATE_MIN_DF = 3  # a shingle in >= this many docs is boilerplate
TOPK_NGRAMS = 20


def boilerplate_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_boilerplate, boilerplate_ratio): how much
    of each document is corpus-repeated shingle material."""
    sh = _shingle_rows(spark, sf_dir)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= BOILERPLATE_MIN_DF)
        .select("shingle")
    )
    flagged = sh.join(
        maybe_broadcast(hot.withColumn("_hot", F.lit(1))), "shingle", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hot"), F.lit(0))).alias("n_boilerplate"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_boilerplate",
            F.round(F.col("n_boilerplate") / F.col("n_shingles"), 4).alias(
                "boilerplate_ratio"
            ),
        )
    )


BOILERPLATE_STATS_SQL = f"""
WITH sh AS ({_SHINGLE_ROWS_DUCK}),
hot AS (
  SELECT shingle FROM sh GROUP BY shingle
  HAVING count(*) >= {BOILERPLATE_MIN_DF}
)
SELECT s.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN h.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate,
       round(sum(CASE WHEN h.shingle IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / count(*), 4) AS boilerplate_ratio
FROM sh s LEFT JOIN hot h USING (shingle)
GROUP BY s.doc_id
"""


def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K shingles by document frequency (ties broken
    lexicographically — fully deterministic).

    The heavy cut is orderBy+limit — Spark's TakeOrdered computes a
    per-partition top-K then merges K*partitions rows on the driver, so
    the full count table is never globally sorted. The rank window runs
    over the K survivors only (a global window over all shingles would
    funnel the corpus through one partition)."""
    from pyspark.sql import Window

    sh = _shingle_rows(spark, sf_dir)
    counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    top = counts.orderBy(F.desc("df"), F.asc("shingle")).limit(TOPK_NGRAMS)
    w = Window.orderBy(F.desc("df"), F.asc("shingle"))  # <= K rows
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "shingle", "df"
    )


NGRAM_TOPK_SQL = f"""
WITH sh AS ({_SHINGLE_ROWS_DUCK}),
counts AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
SELECT rank, shingle, df FROM (
  SELECT shingle, df,
         row_number() OVER (ORDER BY df DESC, shingle ASC) AS rank
  FROM counts
) WHERE rank <= {TOPK_NGRAMS}
"""


QUERIES = {
    "boilerplate_shingle_stats": boilerplate_shingle_stats,
    "ngram_topk": ngram_topk,
}

ORACLE = {
    "boilerplate_shingle_stats": BOILERPLATE_STATS_SQL,
    "ngram_topk": NGRAM_TOPK_SQL,
}
