"""Durable TTL KV store (U1 depth) — `jitsu_spark/plans/store.py`.

Semantics ported from `libs/core-functions/src/functions/lib/store.ts`:
getTtlSec parsing (:10-26), Redis TTL return codes (-1 no expiry, -2
missing), Mongo `(key, value, expireAt)` last-writer-wins documents
(:58-62), and the in-memory reference double (`createMemoryStore`,
:238-290). The cross-batch test is the engine's analogue of rotor's
store surviving across events and instances.
"""

from __future__ import annotations

import json
import time

from jitsu_spark.plans.store import (
    DEFAULT_TTL_SEC,
    FileTtlStore,
    get_ttl_sec,
    store_state_table,
)


class TestGetTtlSec:
    def test_default_31_days(self):
        assert get_ttl_sec() == DEFAULT_TTL_SEC == 31 * 86400

    def test_number_is_seconds(self):
        assert get_ttl_sec(120) == 120
        assert get_ttl_sec(0.5) == 1  # Math.ceil

    def test_duration_strings(self):
        assert get_ttl_sec("1h") == 3600
        assert get_ttl_sec("2d") == 2 * 86400
        assert get_ttl_sec("90s") == 90
        assert get_ttl_sec("1h 30m") == 5400

    def test_inf_means_no_expiry(self):
        assert get_ttl_sec("inf") == -1
        assert get_ttl_sec("INF") == -1

    def test_dict_opts(self):
        assert get_ttl_sec({"ttl": "1h"}) == 3600
        assert get_ttl_sec({}) == DEFAULT_TTL_SEC

    def test_capped_at_redis_max(self):
        assert get_ttl_sec(10**12) == 2147483647


class TestFileTtlStore:
    def test_get_set_delete_roundtrip(self, tmp_path):
        s = FileTtlStore(str(tmp_path), "conn1")
        assert s.get("k") is None
        s.set("k", {"n": 1, "tags": ["a"]})
        assert s.get("k") == {"n": 1, "tags": ["a"]}
        s.delete("k")
        assert s.get("k") is None

    def test_ttl_codes(self, tmp_path):
        s = FileTtlStore(str(tmp_path), "conn1")
        assert s.ttl("missing") == -2
        s.set("forever", 1, "inf")
        assert s.ttl("forever") == -1
        s.set("hour", 1, "1h")
        assert 3590 < s.ttl("hour") <= 3600

    def test_get_with_ttl(self, tmp_path):
        s = FileTtlStore(str(tmp_path), "c")
        assert s.getWithTTL("k") is None
        s.set("k", "v", 60)
        got = s.getWithTTL("k")
        assert got["value"] == "v" and 0 <= got["ttl"] <= 60

    def test_expiry_invisible_on_read(self, tmp_path):
        s = FileTtlStore(str(tmp_path), "c")
        s.set("k", "v", -0.5)  # already expired
        assert s.get("k") is None
        assert s.ttl("k") == -2

    def test_negative_ttl_means_no_expiry(self, tmp_path):
        # Redis semantics (store.ts:43-47): EX only when ttl >= 0
        s = FileTtlStore(str(tmp_path), "c")
        s.set("k", 1, -5)
        assert s.ttl("k") == -1

    def test_prune_removes_expired_only(self, tmp_path):
        s = FileTtlStore(str(tmp_path), "c")
        s.set("dead", 1, 0)  # expires immediately
        s.set("alive", 2, "1h")
        time.sleep(0.05)
        assert s.prune() == 1
        assert s.get("alive") == 2

    def test_durable_across_instances(self, tmp_path):
        FileTtlStore(str(tmp_path), "c").set("k", [1, 2, 3])
        assert FileTtlStore(str(tmp_path), "c").get("k") == [1, 2, 3]

    def test_namespaces_isolated(self, tmp_path):
        a = FileTtlStore(str(tmp_path), "conn-a")
        b = FileTtlStore(str(tmp_path), "conn-b")
        a.set("k", "from-a")
        assert b.get("k") is None

    def test_last_writer_wins(self, tmp_path):
        a = FileTtlStore(str(tmp_path), "c")
        b = FileTtlStore(str(tmp_path), "c")
        a.set("k", "first")
        b.set("k", "second")
        assert a.get("k") == "second"

    def test_ttl_days_compat_kwarg(self, tmp_path):
        s = FileTtlStore(str(tmp_path), "c")
        s.set("k", "v", ttl_days=1)
        assert 86000 < s.ttl("k") <= 86400


class TestCrossBatchPersistence:
    """The VERDICT's 'done' bar: set in micro-batch 1, get in micro-batch
    2 from a different task, expiry honored — mirroring rotor's shared
    Redis store across events and restarts."""

    def test_state_flows_between_batches(self, spark, tmp_path):
        from jitsu_spark.plans.chain import ConnectionConfig, compile_chain

        store_root = str(tmp_path / "store")

        def counter(ev, ctx):
            seen = ctx.store.get("total") or 0
            ctx.store.set("total", seen + 1)
            return {**ev, "seen_before": seen}

        cfg = ConnectionConfig(
            connection_id="c1", functions=[counter], store_dir=store_root
        )
        chain = compile_chain(cfg)

        def run_batch(events):
            df = spark.createDataFrame(
                [(json.dumps(e),) for e in events], "event string"
            ).coalesce(1)
            return [json.loads(r.event) for r in chain(df).collect()]

        out1 = run_batch([{"message_id": "m1", "type": "track"}])
        # batch 2 is a fresh job — fresh Python workers, fresh store
        # instances; only the store directory is shared
        out2 = run_batch([{"message_id": "m2", "type": "track"}])
        assert out1[0]["seen_before"] == 0
        assert out2[0]["seen_before"] == 1

    def test_expiry_honored_across_batches(self, spark, tmp_path):
        from jitsu_spark.plans.chain import ConnectionConfig, compile_chain

        store_root = str(tmp_path / "store")

        def writer(ev, ctx):
            ctx.store.set("blip", "here", 0.2)  # 1s after ceil
            return ev

        def reader(ev, ctx):
            return {**ev, "blip": ctx.store.get("blip")}

        df1 = spark.createDataFrame([(json.dumps({"a": 1}),)], "event string")
        compile_chain(
            ConnectionConfig(connection_id="c", functions=[writer], store_dir=store_root)
        )(df1).collect()
        time.sleep(1.5)
        out = compile_chain(
            ConnectionConfig(connection_id="c", functions=[reader], store_dir=store_root)
        )(df1).collect()
        assert json.loads(out[0].event)["blip"] is None


def test_store_state_table_view(spark, tmp_path):
    root = str(tmp_path / "store")
    a = FileTtlStore(root, "conn-a")
    a.set("k1", {"n": 1}, "1h")
    a.set("k2", "plain", "inf")
    a.set("gone", "x", 0)  # expires immediately
    FileTtlStore(root, "conn-b").set("k1", [1, 2])

    rows = store_state_table(spark, root).collect()
    by = {(r.namespace, r.key): r for r in rows}
    assert set(by) == {("conn-a", "k1"), ("conn-a", "k2"), ("conn-b", "k1")}
    assert json.loads(by[("conn-a", "k1")].value) == {"n": 1}
    assert by[("conn-a", "k2")].expire_at is None
    assert json.loads(by[("conn-b", "k1")].value) == [1, 2]


def test_store_state_table_empty(spark, tmp_path):
    df = store_state_table(spark, str(tmp_path / "nothing"))
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == [
        "namespace", "key", "value", "expire_at",
    ]


class TestNumericOptsTransitionWarning:
    """Round-4 ADVICE: the stores' third positional parameter changed
    meaning from ttl_days to opts-in-seconds in round 3; a bare numeric
    must emit a DeprecationWarning so the 86400x unit shift is never
    silent (while still applying SECONDS, the store.ts contract)."""

    def test_file_store_warns_on_bare_numeric(self, tmp_path):
        import warnings

        s = FileTtlStore(str(tmp_path / "s"), "c")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            s.set("k", "v", 3)
        assert any(
            issubclass(w.category, DeprecationWarning)
            and "SECONDS" in str(w.message)
            for w in caught
        )
        # semantics unchanged: 3 means 3 seconds
        assert 0 < s.ttl("k") <= 3

    def test_in_memory_store_warns_on_bare_numeric(self):
        import warnings

        from jitsu_spark.plans.chain import InMemoryTtlStore

        s = InMemoryTtlStore()
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            s.set("k", "v", 3)
        assert any(
            issubclass(w.category, DeprecationWarning) for w in caught
        )
        assert 0 < s.ttl("k") <= 3

    def test_no_warning_for_strings_dicts_or_ttl_days(self, tmp_path):
        import warnings

        s = FileTtlStore(str(tmp_path / "s2"), "c")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            s.set("a", 1, "1h")
            s.set("b", 1, {"ttl": 60})
            s.set("c", 1, ttl_days=1)
            s.set("d", 1)
        assert not [
            w for w in caught if issubclass(w.category, DeprecationWarning)
        ]


class TestTornReadDefense:
    """Round-4: on mounts where rename is copy+delete (object stores), a
    reader may see half-written bytes. The checksum + bounded retry must
    guarantee a reader NEVER surfaces partial data: it either gets the
    whole record (write completed during retry) or key-missing (writer
    died mid-copy)."""

    def test_torn_blob_never_surfaces(self, tmp_path):
        s = FileTtlStore(str(tmp_path / "s"), "c")
        s.set("k", {"full": "record", "n": 42}, "1h")
        path = s._path("k")
        with open(path) as f:
            whole = f.read()
        # simulate a non-atomic rename caught mid-copy: a valid-JSON
        # PREFIX would be the worst case (parses, but wrong payload) —
        # construct one by truncating inside the value then closing
        # braces, plus a plain truncation
        for torn in (whole[: len(whole) // 2], whole[:20] + '"}'):
            with open(path, "w") as f:
                f.write(torn)
            assert s.get("k") is None  # lost, never corrupt
        # a healthy rewrite fully restores the key
        s.set("k", "fresh", "1h")
        assert s.get("k") == "fresh"

    def test_read_heals_when_copy_completes_mid_retry(self, tmp_path, monkeypatch):
        import jitsu_spark.plans.store as st

        s = FileTtlStore(str(tmp_path / "s2"), "c")
        s.set("k", {"v": 1}, "1h")
        path = s._path("k")
        with open(path) as f:
            whole = f.read()
        with open(path, "w") as f:
            f.write(whole[: len(whole) // 2])  # torn now

        calls = {"n": 0}

        def complete_write(_sec):
            calls["n"] += 1
            with open(path, "w") as f:
                f.write(whole)  # the mount finishes the copy

        monkeypatch.setattr(st.time, "sleep", complete_write)
        assert s.get("k") == {"v": 1}
        assert calls["n"] >= 1  # the retry path actually engaged

    def test_tampered_payload_with_stale_crc_rejected(self, tmp_path):
        s = FileTtlStore(str(tmp_path / "s3"), "c")
        s.set("k", "original", "1h")
        path = s._path("k")
        with open(path) as f:
            rec = json.load(f)
        rec["value"] = "mangled-by-partial-overwrite"
        with open(path, "w") as f:
            json.dump(rec, f)  # crc now stale
        assert s.get("k") is None

    def test_legacy_record_without_crc_still_readable(self, tmp_path):
        s = FileTtlStore(str(tmp_path / "s4"), "c")
        with open(s._path("k"), "w") as f:
            json.dump({"key": "k", "value": "old", "expire_at": None}, f)
        assert s.get("k") == "old"
        assert s.ttl("k") == -1

