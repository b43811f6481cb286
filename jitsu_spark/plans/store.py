"""Durable TTL key-value store for the UDF context (U1).

The reference's `ctx.store` is a Redis- or Mongo-backed KV shared by every
rotor instance and surviving restarts (`libs/core-functions/src/functions/
lib/store.ts:28-56` Redis, `:66-220` Mongo `(_id, value, expireAt)` with
last-writer-wins replaceOne and an `expireAt` TTL index). The engine's
durable analogue is filesystem-backed: one JSON blob per key bucket under
a store directory. On local mode that directory is local disk; on a
cluster it is shared storage (HDFS/NFS/fuse-mounted object store) — the
same "external shared KV" role Redis plays for rotor, with last-writer-
wins rename semantics standing in for replaceOne. For managed Redis/Mongo
deployments the store remains swappable behind the same surface.

Torn-read defense (round 4): rename is atomic on POSIX/HDFS/NFS, but a
fuse-mounted object store may implement it as copy+delete, exposing
half-written bytes to a concurrent reader. Every record therefore
carries a content checksum; a reader that sees a record whose checksum
does not verify treats it as a write-in-progress, retries briefly, and
— if the bytes never become whole — reports the key missing rather than
ever surfacing partial data. A torn write thus degrades to a lost write
(the same observable outcome as a crashed Redis SET), never a corrupt
read. Records written before round 4 (no checksum field) remain
readable.

TTL surface parity (`store.ts:10-26` + `@jitsu/protocols/functions`
TTLStore):
  - `set(key, value, opts)` — opts may be seconds (number), a duration
    string ("1h", "2d", "inf"), or `{"ttl": ...}`; default 31 days.
  - `ttl(key)` -> seconds remaining, -1 for no expiry, -2 for missing
    (Redis TTL return codes).
  - `getWithTTL(key)` -> {"value": ..., "ttl": ...} or None.
Expired keys are invisible on read and physically pruned by `prune()`
(the analogue of Mongo's TTL monitor / Redis EX).

`store_state_table` exposes the store as the keyed Spark state table
SURVEY §1.4 describes — `(namespace, key, value, expire_at)` — for
analytical reads, audits, and compaction jobs.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time
from typing import Any

DEFAULT_TTL_SEC = 60 * 60 * 24 * 31  # store.ts:7 — 31 days
MAX_ALLOWED_TTL = 2147483647  # store.ts:8 — Redis EX cap

_DURATION = re.compile(r"(\d+(?:\.\d+)?)\s*(ms|s|m|h|d|w|y)?", re.I)
_UNIT_SEC = {
    "ms": 0.001, "s": 1.0, "m": 60.0, "h": 3600.0,
    "d": 86400.0, "w": 604800.0, "y": 31557600.0,
}


def warn_numeric_opts(opts: Any) -> None:
    """One-time transition warning: before round 3 the stores' third
    positional parameter was `ttl_days`; it is now `opts` IN SECONDS
    (reference `store.ts:10-26` parity). A pre-r3 UDF calling
    `store.set(k, v, 3)` positionally now gets a TTL 86400x shorter with
    no error — surface that loudly (once per call site) so the unit
    change is never silent. Callers meaning days: `ttl_days=3`."""
    if isinstance(opts, (int, float)) and not isinstance(opts, bool):
        import warnings

        warnings.warn(
            "TtlStore.set third argument is interpreted as SECONDS "
            "(reference store.ts semantics); before round 3 it meant "
            "days. Pass ttl_days=... if you meant days, or a duration "
            'string like "3d" to be explicit.',
            DeprecationWarning,
            stacklevel=3,
        )


def get_ttl_sec(opts: Any = None) -> int:
    """`getTtlSec` (store.ts:10-26): number = seconds; string = duration
    ("1h 30m") or "inf" (-1, no expiry); dict = {"ttl": ...}; None/parse
    failure = default 31 d. Capped at the Redis max."""
    seconds: float = DEFAULT_TTL_SEC
    if isinstance(opts, bool):
        pass  # bools are ints in Python; treat as "no opts"
    elif isinstance(opts, (int, float)):
        # negative numbers: ceil() below rounds toward zero, so values
        # in (-1, 0) become 0 (expire immediately) and values <= -1 stay
        # negative, which set() maps to NO EXPIRY — the reference
        # contract (store.ts:43-47 sets EX only when ttl >= 0, after
        # Math.ceil). A round-9 review suggested erroring on negatives
        # (raw-Redis EX semantics), but both behaviors are pinned by
        # parity tests; deliberate, not a bug.
        seconds = opts
    elif isinstance(opts, str):
        if opts.lower() == "inf":
            return -1
        total, matched = 0.0, False
        for m in _DURATION.finditer(opts):
            if not m.group(1):
                continue
            matched = True
            total += float(m.group(1)) * _UNIT_SEC[(m.group(2) or "s").lower()]
        seconds = total if matched and total > 0 else DEFAULT_TTL_SEC
    elif isinstance(opts, dict):
        return get_ttl_sec(opts.get("ttl"))
    import math

    return min(math.ceil(seconds), MAX_ALLOWED_TTL)


TORN_READ_RETRIES = 5
TORN_READ_BACKOFF_SEC = 0.02


def _record_crc(rec: dict) -> str:
    """Checksum over the record's semantic payload (key/value/expire_at,
    canonical JSON) — order-independent of how the blob was serialized."""
    payload = json.dumps(
        {k: rec.get(k) for k in ("key", "value", "expire_at")},
        sort_keys=True,
        separators=(",", ":"),
    )
    return hashlib.md5(payload.encode()).hexdigest()


def _decode_record(raw: str) -> dict | None:
    """Parse + verify a record blob; None = torn/corrupt (retryable).
    Legacy records without a crc field are accepted as-is."""
    try:
        rec = json.loads(raw)
    except ValueError:
        return None
    if not isinstance(rec, dict) or "value" not in rec:
        return None
    crc = rec.get("crc")
    if crc is not None and crc != _record_crc(rec):
        return None
    return rec


class FileTtlStore:
    """Durable TTL KV over a directory; the pipeline default for
    `ctx.store` when a store path is configured.

    Layout: `<root>/<namespace>/<md5(key)>.json` holding
    `{"key", "value", "expire_at"}` (`expire_at` null = no expiry — the
    Mongo document shape, store.ts:58-62). Writes are tmp+rename so
    concurrent writers from different tasks/processes are last-writer-wins
    atomic, matching replaceOne(upsert) semantics."""

    def __init__(self, root: str, namespace: str = "default"):
        self._dir = os.path.join(root, _safe_name(namespace))
        os.makedirs(self._dir, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(
            self._dir, hashlib.md5(key.encode()).hexdigest() + ".json"
        )

    def _read(self, key: str) -> dict | None:
        path = self._path(key)
        rec = None
        for attempt in range(TORN_READ_RETRIES):
            try:
                with open(path) as f:
                    raw = f.read()
            except FileNotFoundError:
                return None
            rec = _decode_record(raw)
            if rec is not None:
                break
            # checksum/parse failure = a non-atomic mount exposed a
            # write in progress; give the copy a moment to complete
            time.sleep(TORN_READ_BACKOFF_SEC)
        if rec is None:
            # never became whole: the writer died mid-copy. A torn write
            # degrades to a LOST write (key missing) — partial data is
            # never surfaced.
            return None
        exp = rec.get("expire_at")
        if exp is not None and exp < time.time():
            self.delete(key)
            return None
        return rec

    def get(self, key: str):
        rec = self._read(key)
        return None if rec is None else rec["value"]

    def getWithTTL(self, key: str) -> dict | None:
        rec = self._read(key)
        if rec is None:
            return None
        exp = rec.get("expire_at")
        ttl = -1 if exp is None else max(int(exp - time.time()), 0)
        return {"value": rec["value"], "ttl": ttl}

    def set(self, key: str, value: Any, opts: Any = None, *, ttl_days: float | None = None):
        # ttl_days keeps the InMemoryTtlStore call shape working.
        # NOTE: `opts` as a bare number means SECONDS (store.ts parity);
        # pre-r3 this slot meant days — warn_numeric_opts flags it once.
        if ttl_days is not None and opts is None:
            opts = ttl_days * 86400
        else:
            warn_numeric_opts(opts)
        ttl = get_ttl_sec(opts)
        rec = {
            "key": key,
            "value": value,
            "expire_at": None if ttl < 0 else time.time() + ttl,
        }
        rec["crc"] = _record_crc(rec)  # torn-read detection (module note)
        path = self._path(key)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())  # bytes durable before they're visible
        os.replace(tmp, path)  # atomic last-writer-wins (POSIX/HDFS/NFS)

    def delete(self, key: str) -> None:
        try:
            os.remove(self._path(key))
        except FileNotFoundError:
            pass

    # reference surface name (`del` is reserved in Python)
    def ttl(self, key: str) -> int:
        rec = self._read(key)
        if rec is None:
            return -2
        exp = rec.get("expire_at")
        return -1 if exp is None else max(int(exp - time.time()), 0)

    def prune(self) -> int:
        """Physically remove expired entries (the Mongo TTL-monitor /
        Redis-EX role); returns the number pruned."""
        removed = 0
        now = time.time()
        for name in os.listdir(self._dir):
            if not name.endswith(".json"):
                continue
            path = os.path.join(self._dir, name)
            try:
                with open(path) as f:
                    rec = json.load(f)
            except (FileNotFoundError, ValueError):
                continue
            exp = rec.get("expire_at")
            if exp is not None and exp < now:
                try:
                    os.remove(path)
                    removed += 1
                except FileNotFoundError:
                    pass
        return removed


def _safe_name(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", name)


def store_state_table(spark, root: str):
    """The SURVEY §1.4 keyed state-table view of the store:
    `(namespace, key, value, expire_at)` with expired keys filtered — for
    audits, backfills, and compaction jobs. Values surface as JSON text
    (they are arbitrary UDF payloads)."""
    import pyspark.sql.functions as F

    schema = "namespace string, key string, value string, expire_at double"
    has_files = any(
        name.endswith(".json")
        for ns in (os.listdir(root) if os.path.isdir(root) else [])
        if os.path.isdir(os.path.join(root, ns))
        for name in os.listdir(os.path.join(root, ns))
    )
    if not has_files:
        return spark.createDataFrame([], schema)
    raw = spark.read.text(os.path.join(root, "*", "*.json"))
    return (
        raw.select(
            F.regexp_extract(
                F.input_file_name(), r".*/([^/]+)/[^/]+\.json$", 1
            ).alias("namespace"),
            F.get_json_object("value", "$.key").alias("key"),
            F.get_json_object("value", "$.value").alias("value"),
            F.get_json_object("value", "$.expire_at")
            .cast("double")
            .alias("expire_at"),
        )
        .where(
            F.col("expire_at").isNull()
            | (F.col("expire_at") >= F.lit(time.time()))
        )
        # torn/corrupt blobs parse to null keys — never surface them
        .where(F.col("key").isNotNull())
    )
