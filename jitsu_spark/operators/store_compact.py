"""Small-file compaction for the durable gate stores.

The incremental gates (`dedup.append_fingerprints`, `append_signatures`,
the streaming paragraph gate's hash append, `bloom.append_bloom`) are
append-only parquet: every micro-batch lands one small file per touched
partition, forever. At crawl cadence that is the classic small-file
death — a year of 1-minute batches is ~500k files per store, and the
per-batch store probe pays the file-listing + footer overhead of every
one of them. This module is the gate stores' `sinks.compact` analog
(reference parallel: the warehouse OPTIMIZE the reference leans on its
ClickHouse/BigQuery destinations for).

Design — IN-PLACE append-then-delete, never a directory swap:

1. List the store's current data files (the same Hadoop FileSystem
   listing the bloom healer uses — object-store safe).
2. Read EXACTLY those files (basePath-anchored so partition columns
   survive), collapse replay-duplicate rows (`distinct`), and APPEND
   the compacted copy — `files_per_partition` files per partition
   directory, one file for unpartitioned stores.
3. Mark the new files covered in the bloom summary (when the store has
   one): their keys are a subset of the listed files', which the
   pre-compaction heal below already covered — so no re-heal.
4. Delete the listed old files and any emptied partition dirs.

Every crash window degrades SAFELY because duplicate rows are harmless
to every gate store by contract (verdict probes reduce by min/distinct;
signature agreement is unchanged by duplicate rows — the same
concurrent-append argument `dedup.append_signatures` documents):
- crash after 2, before 3/4: the store holds two copies; verdicts are
  identical; the next heal treats the compacted files as uncovered and
  ORs them in (over-coverage, safe); the next compaction converges.
- crash during 4: some old files remain — duplicates only.
A rename-swap would instead have a window with NO store on disk, which
a gate reads as "first-ever ingest" — an under-coverage hole. Files
appended by a CONCURRENT writer during compaction are untouched: only
the initially-listed files are rewritten and deleted.

Bloom-coverage contract (VERDICT r10 #4): when `bloom_dir` is given the
store is HEALED FIRST (`load_bloom_healed`), so every listed file's
keys are in the words table before the rewrite; the compacted files can
then be recorded as covered without re-reading a single key, and the
healed-summary guarantee survives the rewrite. Without the pre-heal,
marking the new files covered could claim coverage of never-healed
keys — a structural false-negative hole this module must never open.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bloom import _store_data_files, load_bloom_healed


def _partition_col(files: list[str]) -> str | None:
    """The hive partition column of a store, inferred from its file
    paths (`bucket=3/part-...parquet` -> 'bucket'); None when flat."""
    for f in files:
        head = f.split("/", 1)[0]
        if "/" in f and "=" in head:
            return head.split("=", 1)[0]
    return None


def compact_gate_store(
    spark: SparkSession,
    store_dir: str,
    bloom_dir: str | None = None,
    keys_of=None,
    key_col: str = "text_hash",
    files_per_partition: int = 1,
) -> dict:
    """Compact an append-only gate store in place (see module
    docstring). Returns {'files_before', 'files_after', 'rows'}.

    `bloom_dir`/`keys_of`/`key_col` mirror `load_bloom_healed`'s
    parameters for stores that keep a durable summary; omit them for
    summaryless stores."""
    old_files = _store_data_files(spark, store_dir)
    if not old_files:
        return {"files_before": 0, "files_after": 0, "rows": 0}
    if bloom_dir is not None:
        # heal FIRST: every listed file's keys enter the words table, so
        # the compacted copy (a subset of those keys) is provably covered
        load_bloom_healed(
            spark, store_dir, bloom_dir,
            keys_of=keys_of if keys_of is not None else (lambda df: df),
            col=key_col,
        )

    part_col = _partition_col(old_files)
    paths = [os.path.join(store_dir, f) for f in old_files]
    df = (
        spark.read.option("basePath", store_dir).parquet(*paths).distinct()
    )
    if part_col is not None:
        out = df.repartition(F.col(part_col))
        if files_per_partition > 1:
            salt = F.pmod(
                F.hash(*[c for c in df.columns if c != part_col]),
                F.lit(files_per_partition),
            ).alias("_salt")
            out = (
                df.withColumn("_salt", salt)
                .repartition(F.col(part_col), F.col("_salt"))
                .drop("_salt")
            )
        n_rows = _append(out, store_dir, part_col)
    else:
        n_rows = _append(df.coalesce(files_per_partition), store_dir, None)

    after_append = _store_data_files(spark, store_dir)
    new_files = [f for f in after_append if f not in set(old_files)]
    if bloom_dir is not None and new_files:
        # coverage record for the compacted files BEFORE the old files
        # vanish: a crash anywhere here only over-covers (the next heal
        # re-ORs whatever looks uncovered — never a false negative)
        spark.createDataFrame(
            [(f,) for f in new_files], "file STRING"
        ).write.mode("append").parquet(bloom_dir + "/covered")

    _delete(spark, store_dir, old_files)
    spark.catalog.refreshByPath(store_dir)
    return {
        "files_before": len(old_files),
        "files_after": len(_store_data_files(spark, store_dir)),
        "rows": n_rows,
    }


def _append(df: DataFrame, store_dir: str, part_col: str | None) -> int:
    df = df.localCheckpoint()  # pin: the lineage reads files we delete
    writer = df.write.mode("append")
    if part_col is not None:
        writer = writer.partitionBy(part_col)
    writer.parquet(store_dir)
    return df.count()


def _delete(spark: SparkSession, store_dir: str, rel_files: list[str]) -> None:
    """Remove the compacted-away files (and emptied partition dirs)
    through the same Hadoop FileSystem the listing used."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = root.getFileSystem(conf)
    dirs = set()
    for rel in rel_files:
        p = jvm.org.apache.hadoop.fs.Path(os.path.join(store_dir, rel))
        fs.delete(p, False)
        if "/" in rel:
            dirs.add(rel.rsplit("/", 1)[0])
    for d in sorted(dirs, reverse=True):
        p = jvm.org.apache.hadoop.fs.Path(os.path.join(store_dir, d))
        try:
            if not fs.listFiles(p, True).hasNext():
                fs.delete(p, True)
        except Exception:
            pass  # already gone or non-empty with non-data files
