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

Design — STAGE-AND-MOVE into the live directory, never a directory
swap:

1. List the store's current data files (the same Hadoop FileSystem
   listing the bloom healer uses — object-store safe).
2. Read EXACTLY those files (basePath-anchored so partition columns
   survive), collapse replay-duplicate rows (`distinct`), and write the
   compacted copy to a SIBLING staging directory — `files_per_
   partition` files per partition directory, one file for
   unpartitioned stores.
3. Rename each staged data file into the store (metadata moves; the
   exact set of moved relative paths is therefore KNOWN — never
   inferred from a before/after listing diff, which would mis-claim a
   concurrent writer's files).
4. Mark exactly the moved files covered in the bloom summary (when the
   store has one): their keys are a subset of the listed files', which
   the pre-compaction heal below already covered — so no re-heal.
5. Delete the listed old files and any emptied partition dirs.

Every crash window degrades SAFELY because duplicate rows are harmless
to every gate store by contract (verdict probes reduce by min/distinct;
signature agreement is unchanged by duplicate rows — the same
concurrent-append argument `dedup.append_signatures` documents):
- crash during/after 3, before 4/5: the store holds up to two copies;
  verdicts are identical; the next heal treats the moved files as
  uncovered and ORs them in (over-coverage, safe); the next compaction
  converges.
- crash during 5: some old files remain — duplicates only.
A rename-swap would instead have a window with NO store on disk, which
a gate reads as "first-ever ingest" — an under-coverage hole. Files
appended by a CONCURRENT writer during compaction are untouched AND
never marked covered (step 3's explicit move list is the coverage
record): only the initially-listed files are rewritten and deleted.

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
    else:
        out = df.coalesce(files_per_partition)

    import uuid

    staging = store_dir.rstrip("/") + ".compacting-" + uuid.uuid4().hex[:8]
    writer = out.write.mode("overwrite")
    if part_col is not None:
        writer = writer.partitionBy(part_col)
    writer.parquet(staging)
    n_rows = spark.read.option("basePath", staging).parquet(staging).count()

    moved = _move_in(spark, staging, store_dir)
    if bloom_dir is not None and moved:
        # coverage record for exactly the files WE moved in, BEFORE the
        # old files vanish: a crash anywhere here only over-covers (the
        # next heal re-ORs whatever looks uncovered — never a false
        # negative), and a concurrent writer's files are never claimed
        spark.createDataFrame(
            [(f,) for f in moved], "file STRING"
        ).write.mode("append").parquet(bloom_dir + "/covered")

    _delete(spark, store_dir, old_files)
    _rmtree(spark, staging)
    spark.catalog.refreshByPath(store_dir)
    return {
        "files_before": len(old_files),
        "files_after": len(_store_data_files(spark, store_dir)),
        "rows": n_rows,
    }


def _move_in(spark: SparkSession, staging: str, store_dir: str) -> list[str]:
    """Rename every staged data file into the store, preserving the
    partition-relative path; returns the moved relative paths — the
    authoritative coverage record (a listing diff could mis-attribute a
    concurrent writer's files)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(store_dir).getFileSystem(conf)
    moved = []
    for rel in _store_data_files(spark, staging):
        src = jvm.org.apache.hadoop.fs.Path(os.path.join(staging, rel))
        dst = jvm.org.apache.hadoop.fs.Path(os.path.join(store_dir, rel))
        fs.mkdirs(dst.getParent())
        if not fs.rename(src, dst):  # pragma: no cover - fs race
            raise IOError(f"rename {src} -> {dst} failed")
        moved.append(rel)
    return moved


def _rmtree(spark: SparkSession, path: str) -> None:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).delete(p, True)


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


def compact_bloom_summary(spark: SparkSession, bloom_dir: str) -> dict:
    """Compact the durable bloom summary itself: `words/` accumulates
    one small file per heal/append forever (the exact growth pattern
    the gate stores had) and `covered/` one per heal — collapse words
    by the same bit_or the reader applies and covered/params by
    distinct, via the stage-and-move protocol above.

    Safety: words files are bit-idempotent under replay, so any crash
    window (both copies present / partial delete) changes NO probe
    outcome — the reader's groupBy(word_idx).bit_or is invariant under
    duplication. A file a concurrent healer appends during compaction
    is neither rewritten nor deleted. Coverage records are names, not
    bits: duplicates are harmless, losses impossible (only the listed
    old files are deleted, and their content moved in first)."""
    out = {}
    for sub, collapse in (
        ("words", lambda df: df.groupBy("word_idx").agg(
            F.bit_or("bits").alias("bits"))),
        ("covered", lambda df: df.distinct()),
        ("params", lambda df: df.distinct()),
    ):
        sub_dir = bloom_dir.rstrip("/") + "/" + sub
        old_files = _store_data_files(spark, sub_dir)
        if len(old_files) <= 1:
            out[sub] = {"files_before": len(old_files),
                        "files_after": len(old_files)}
            continue
        paths = [os.path.join(sub_dir, f) for f in old_files]
        df = collapse(spark.read.parquet(*paths)).coalesce(1)

        import uuid

        staging = sub_dir + ".compacting-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(staging)
        _move_in(spark, staging, sub_dir)
        _delete(spark, sub_dir, old_files)
        _rmtree(spark, staging)
        spark.catalog.refreshByPath(sub_dir)
        out[sub] = {
            "files_before": len(old_files),
            "files_after": len(_store_data_files(spark, sub_dir)),
        }
    return out
