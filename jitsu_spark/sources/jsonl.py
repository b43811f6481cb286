"""JSONL corpus source with corrupt-record quarantine.

The reference's ingest path parses every incoming message as JSON and
routes unparseable payloads to the error path instead of killing the
consumer (`services/rotor/src/lib/rotor.ts:125-137` parse,
`rotor.ts:156-199` error/DLQ routing). This is the batch-corpus member of
that family: read newline-delimited JSON at any scale, keep schema-valid
rows, and quarantine bad lines WITH the offending payload so an operator
can replay them after a fix — the standard crawl-ingest contract (a 100 TB
crawl always contains truncated/garbled lines; failing the job on line
3 billion is not an option, and silently dropping is worse).

Design: the file is read as plain text lines and parsed with `from_json`
(JVM expression, whole-stage codegen) rather than the JSON datasource's
PERMISSIVE mode — sidestepping Spark's restriction that a filter on the
internal corrupt-record column alone requires caching the frame, and
keeping good/bad routing a pure plan over one scan. A line is quarantined
when it fails to parse (from_json -> NULL struct) or when any REQUIRED
field is null after parse (from_json null-fills missing fields, which
would otherwise smuggle schema drift into the good path).

Scale: one text scan; parse + route are codegen'd expressions; the
good/bad split is two filters over the same cached-free plan (Spark reads
the file once per consumed branch — at 100 TB either materialize the
split once to parquet, as `jsonl_ingest_roundtrip` effectively does
downstream, or accept two scans of cheap line-splitting; both branches
are pure maps with zero shuffle).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_JSON_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def parse_and_route(
    lines: DataFrame, schema: str, required: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """The shared parse/route plan over any `line STRING` frame — batch
    and streaming apply the IDENTICAL expressions (the corpus-gate
    convention: one gate expression, asserted in tests)."""
    lines = lines.where(F.length(F.trim("line")) > 0)
    # from_json PERMISSIVE-fills an all-null struct for malformed lines
    # (never a NULL struct), so unparseable detection rides the corrupt-
    # record column spliced into the parse schema.
    parsed = lines.withColumn(
        "rec",
        F.from_json(
            "line",
            f"{schema}, _corrupt STRING",
            {"columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    unparseable = F.col("rec._corrupt").isNotNull()
    bad_cond = unparseable
    for c in required:
        bad_cond = bad_cond | F.col(f"rec.{c}").isNull()
    good = parsed.where(~bad_cond).select("rec.*").drop("_corrupt")
    reason = F.when(unparseable, F.lit("unparseable_json"))
    for c in required:
        reason = reason.when(
            F.col(f"rec.{c}").isNull(), F.lit(f"missing_required:{c}")
        )
    quarantine = parsed.where(bad_cond).select(
        "line", reason.alias("reason")
    )
    return good, quarantine


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    required: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): parse newline-delimited JSON under `schema`.

    good     = parsed rows with every `required` field non-null.
    quarantine = (line, reason) for unparseable lines and rows missing a
                 required field — the replayable DLQ of this source.
    """
    lines = spark.read.text(path).withColumnRenamed("value", "line")
    return parse_and_route(lines, schema, required)


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    required: tuple[str, ...] = (),
    max_files_per_trigger: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of `read_jsonl`: a file-watching text stream routed
    through the SAME parse/quarantine expressions — the continuous-crawl
    ingest form (new JSONL shards land in a directory; good rows flow to
    the corpus gate, bad lines to the replayable quarantine sink).
    Backpressure via maxFilesPerTrigger (W6's contract for file
    sources)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = reader.load(path).withColumnRenamed("value", "line")
    return parse_and_route(lines, schema, required)


def _jsonl_cache_root() -> str:
    """Per-user cache root with restrictive permissions (r8 review
    finding: a predictable world-writable /tmp path lets another local
    user pre-create/poison it). Overridable via JITSU_JSONL_CACHE_DIR;
    defaults under tempdir + uid so concurrent users never share."""
    root = os.environ.get("JITSU_JSONL_CACHE_DIR")
    if not root:
        import tempfile

        uid = os.getuid() if hasattr(os, "getuid") else "u"
        root = os.path.join(
            tempfile.gettempdir(), f"jitsu_jsonl_cache_{uid}"
        )
    os.makedirs(root, mode=0o700, exist_ok=True)
    # FAIL CLOSED on a pre-created attacker-owned root: makedirs with
    # exist_ok accepts any existing directory, so verify ownership and
    # make the chmod mandatory — a swallowed EPERM here would mean the
    # export lives in a directory another local user controls (r8
    # review finding #2).
    if hasattr(os, "getuid"):
        # lstat + symlink refusal: os.stat FOLLOWS symlinks, so an
        # attacker pre-creating a symlink at the predictable path would
        # pass the ownership check against the TARGET and redirect the
        # export (plus the chmod 0700) anywhere they choose (round-9
        # ADVICE). A symlink here is never legitimate — makedirs created
        # a real directory or the user set JITSU_JSONL_CACHE_DIR.
        import stat as _stat

        st = os.lstat(root)
        # derive the symlink answer from the SAME lstat snapshot the
        # ownership check uses (a second islink() stat would reopen the
        # race this check exists to close — round-9 review finding #6)
        if _stat.S_ISLNK(st.st_mode):
            raise RuntimeError(
                f"JSONL cache root {root} is a symlink — refusing to"
                " follow it; set JITSU_JSONL_CACHE_DIR to a real,"
                " private directory"
            )
        if st.st_uid != os.getuid():
            raise RuntimeError(
                f"JSONL cache root {root} is owned by uid {st.st_uid},"
                f" not the current user (uid {os.getuid()}) — refusing"
                " to use a directory another user controls; set"
                " JITSU_JSONL_CACHE_DIR to a private location"
            )
        os.chmod(root, 0o700)
    return root


def _jsonl_cache_dir(sf_dir: str) -> str:
    # keyed by path AND the parquet's size/mtime fingerprint (the
    # dedup-store memo convention): a regenerated dataset at the same
    # path gets a fresh export instead of a stale one (r7 review finding)
    from ..operators.dedup import _docs_dataset_key

    key = _docs_dataset_key(sf_dir) or os.path.abspath(sf_dir)
    digest = hashlib.md5(repr(key).encode()).hexdigest()[:16]
    return os.path.join(_jsonl_cache_root(), digest)


def export_documents_jsonl(spark: SparkSession, sf_dir: str) -> str:
    """Materialize `documents` as JSONL once per (process, sf_dir) — the
    fixture side of the round-trip entry. Idempotent AND race-safe:
    written to a process-unique temp dir then atomically renamed into
    place, so a concurrent process either sees the complete export or
    builds its own and loses the rename benignly."""
    from ..plans.store_builds import timed_build
    from ..tables import load_table

    out = _jsonl_cache_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    with timed_build("jsonl_export"):
        docs = load_table(spark, sf_dir, "documents")
        (
            docs.select(
                F.to_json(
                    F.struct("doc_id", "text", "lang", "source", "n_chars")
                ).alias("value")
            )
            .write.mode("overwrite")
            .text(tmp)
        )
        try:
            os.rename(tmp, out)
        except OSError:
            import shutil

            if os.path.exists(marker):
                # a concurrent builder won the rename: serve theirs
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                # stale half-export from a crashed run: replace it —
                # but TWO recoverers can race this branch too (both
                # rmtree, one renames first), so the loser checks for
                # the winner's marker before giving up (r8 review
                # finding #9)
                shutil.rmtree(out, ignore_errors=True)
                try:
                    os.rename(tmp, out)
                except OSError:
                    if not os.path.exists(marker):
                        raise
                    shutil.rmtree(tmp, ignore_errors=True)
    return out


def jsonl_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, source, n_chars, text_md5): the documents table
    after a JSONL export -> quarantined re-ingest round trip. Byte
    fidelity is provable: text_md5 must equal the md5 computed directly
    on the parquet column (the oracle), and a corrupt or field-dropping
    reader shows up as missing/garbled rows, not a silent pass."""
    path = export_documents_jsonl(spark, sf_dir)
    good, _bad = read_jsonl(
        spark,
        path,
        DOCUMENTS_JSON_SCHEMA,
        required=("doc_id", "text", "source"),
    )
    return good.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(F.col("text")).alias("text_md5"),
    )


JSONL_ROUNDTRIP_SQL = """
SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
FROM documents
"""


QUERIES = {"jsonl_ingest_roundtrip": jsonl_ingest_roundtrip}
ORACLE = {"jsonl_ingest_roundtrip": JSONL_ROUNDTRIP_SQL}
