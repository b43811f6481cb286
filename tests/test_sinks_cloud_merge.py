"""Round-4: the cloud families' staging+MERGE statements actually
EXECUTE. `merge_statements` generates the BigQuery/Snowflake promotion
SQL; the ANSI dialect runs verbatim against embedded Derby as a live
twin, and the merged table must match `sinks.WarehouseSink.upsert`
(the parquet path) row-for-row on the same batches — including the
window-bounded dedup semantics (a conflicting key OUTSIDE the window
stays duplicated in BOTH engines, by design)."""

from __future__ import annotations

import datetime as dt

import pytest

from jitsu_spark.sinks import WarehouseSink, _latest_per_key
from jitsu_spark.sinks_cloud import (
    MERGE_DIALECTS,
    merge_statements,
    merge_window_bounds,
)
from jitsu_spark.sinks_jdbc import JdbcWarehouseSink

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
T1 = dt.datetime(2024, 3, 2, 0, 0, 0)
T_OLD = dt.datetime(2023, 6, 1, 0, 0, 0)  # far outside any 31 d window

COLS = ["message_id", "ts", "payload"]
PK = ["message_id"]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "message_id string, ts timestamp, payload string"
    )


@pytest.fixture
def derby(spark, tmp_path):
    return JdbcWarehouseSink(
        spark,
        url=f"jdbc:derby:{tmp_path}/twin;create=true",
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )


def _cloud_style_upsert(derby, df, table, window_days=31):
    """The exact flow a cloud connector runs: Spark reduces the batch to
    one row per key, stages it, then the GENERATED MERGE promotes it."""
    batch = _latest_per_key(df, PK, "ts")
    if not derby.exists(table):
        batch.write.option(
            "createTableColumnTypes",
            "message_id VARCHAR(256), payload VARCHAR(4096)",
        ).jdbc(derby.url, table, mode="overwrite", properties=derby.properties)
        return
    stage = f"{table}__stage"
    batch.write.option(
        "createTableColumnTypes",
        "message_id VARCHAR(256), payload VARCHAR(4096)",
    ).jdbc(derby.url, stage, mode="overwrite", properties=derby.properties)
    lo, hi = merge_window_bounds(batch, "ts", window_days)
    for sql in merge_statements(
        "ansi", table, stage, COLS, PK, "ts", window_lo=lo, window_hi=hi
    ):
        derby._execute(sql)


def _rows_jdbc(derby, table):
    return {
        (r.message_id, r.ts, r.payload) for r in derby.read(table).collect()
    }


def _rows_parquet(wh, table):
    return {
        (r.message_id, r.ts, r.payload)
        for r in wh.read(table).select(*COLS).collect()
    }


class TestGeneratedMergeExecutesAsTwin:
    def test_merge_matches_parquet_path_row_for_row(self, spark, tmp_path, derby):
        wh = WarehouseSink(spark, str(tmp_path / "wh"))
        b1 = _df(spark, [("m1", T0, "a"), ("m2", T0, "b")])
        # exact redelivery of m2, update of m1 (newer), brand-new m3 —
        # plus an in-batch duplicate of m3 the reduction must collapse
        b2 = _df(
            spark,
            [
                ("m1", T1, "A2"),
                ("m2", T0, "b"),
                ("m3", T0, "c-old"),
                ("m3", T1, "c-new"),
            ],
        )
        for batch in (b1, b2):
            wh.upsert(batch, "ev")
            _cloud_style_upsert(derby, batch, "ev_twin")
        assert _rows_jdbc(derby, "ev_twin") == _rows_parquet(wh, "ev")
        got = {m: (t, p) for m, t, p in _rows_jdbc(derby, "ev_twin")}
        assert got == {
            "m1": (T1, "A2"),  # newer wins
            "m2": (T0, "b"),  # redelivery idempotent
            "m3": (T1, "c-new"),  # in-batch dup collapsed to newest
        }

    def test_window_semantics_match_out_of_window_dup_survives(
        self, spark, tmp_path, derby
    ):
        """A key whose existing row is OLDER than the dedup window is not
        merged — both engines keep both rows (window-bounded dedup)."""
        wh = WarehouseSink(spark, str(tmp_path / "whw"))
        old = _df(spark, [("mX", T_OLD, "ancient")])
        new = _df(spark, [("mX", T0, "fresh"), ("mY", T0, "y")])
        for batch in (old, new):
            wh.upsert(batch, "evw")
            _cloud_style_upsert(derby, batch, "evw_twin")
        twin, parquet = _rows_jdbc(derby, "evw_twin"), _rows_parquet(wh, "evw")
        assert twin == parquet
        assert len([r for r in twin if r[0] == "mX"]) == 2  # dup by design

    def test_in_window_conflict_merges_in_both(self, spark, tmp_path, derby):
        wh = WarehouseSink(spark, str(tmp_path / "whi"))
        first = _df(spark, [("mZ", T0, "v1")])
        second = _df(spark, [("mZ", T1, "v2")])
        for batch in (first, second):
            wh.upsert(batch, "evi")
            _cloud_style_upsert(derby, batch, "evi_twin")
        twin, parquet = _rows_jdbc(derby, "evi_twin"), _rows_parquet(wh, "evi")
        assert twin == parquet == {("mZ", T1, "v2")}


class TestDialectForms:
    def test_families_differ_only_in_quoting_and_date_fns(self):
        kw = dict(
            target_table="dataset.events",
            staging_table="dataset.events__stage",
            columns=COLS,
            primary_key=PK,
            timestamp_col="ts",
            window_lo="2024-03-01",
            window_hi="2024-03-02",
        )
        bq = merge_statements("bigquery", **kw)[0]
        sf = merge_statements("snowflake", **kw)[0]
        ansi = merge_statements("ansi", **kw)[0]
        assert "`dataset`.`events`" in bq and "DATE(t.`ts`)" in bq
        assert '"dataset"."events"' in sf and 'TO_DATE(t."ts")' in sf
        assert "MERGE INTO dataset.events t" in ansi  # tables unquoted
        # normalize quoting + the date function: all three collapse to
        # the same statement — ONE merge contract, three spellings
        def normal(s):
            return (
                s.replace("`", "")
                .replace('"', "")
                .replace("TO_DATE(t.ts)", "D(t.ts)")
                .replace("DATE(t.ts)", "D(t.ts)")
                .replace("CAST(t.ts AS DATE)", "D(t.ts)")
                .replace("DATE('2024-03-01')", "DATE '2024-03-01'")
                .replace("DATE('2024-03-02')", "DATE '2024-03-02'")
            )

        assert normal(bq) == normal(sf) == normal(ansi)

    def test_statement_validation(self):
        with pytest.raises(ValueError, match="identifier"):
            merge_statements("ansi", "t; DROP", "s", COLS, PK)
        with pytest.raises(ValueError, match="primary key"):
            merge_statements("ansi", "t", "s", ["a", "b"], ["missing"])
        with pytest.raises(ValueError, match="YYYY-MM-DD"):
            merge_statements(
                "ansi", "t", "s", COLS, PK,
                window_lo="2024-01-01' OR 1=1 --", window_hi="2024-01-02",
            )

    def test_drop_staging_is_emitted(self):
        stmts = merge_statements("snowflake", "t", "t__stage", COLS, PK)
        assert stmts[1] == 'DROP TABLE "t__stage"'
        assert len(stmts) == 2

    def test_all_cloud_families_have_a_dialect_or_default(self):
        # the merge-capable families resolve to a real dialect
        assert "bigquery" in MERGE_DIALECTS and "snowflake" in MERGE_DIALECTS


class TestClickhouseReplacingInsertTwin:
    """ClickHouse has no MERGE: deduplicate:true = ReplacingMergeTree
    ORDER BY pk + INSERT-only promotion + newest-wins at read (FINAL).
    The ANSI twin executes the generated INSERT promotion on Derby and
    the FINAL-read emulation must match WarehouseSink.upsert for
    in-window data; the GLOBAL-dedup divergence on out-of-window
    conflicts is pinned explicitly (capabilities.dedup_is_global)."""

    def _ch_style_upsert(self, derby, df, table):
        from jitsu_spark.sinks_cloud import replacing_insert_statements

        batch = _latest_per_key(df, PK, "ts")
        opts = {
            "createTableColumnTypes":
                "message_id VARCHAR(256), payload VARCHAR(4096)",
        }
        if not derby.exists(table):
            batch.write.options(**opts).jdbc(
                derby.url, table, mode="overwrite", properties=derby.properties
            )
            return
        stage = f"{table}__stage"
        batch.write.options(**opts).jdbc(
            derby.url, stage, mode="overwrite", properties=derby.properties
        )
        for sql in replacing_insert_statements("ansi", table, stage, COLS, PK):
            derby._execute(sql)

    def _final_read(self, spark, derby, table):
        from jitsu_spark.sinks_cloud import final_read_sql

        sql = final_read_sql("ansi", table, COLS, PK)
        df = spark.read.jdbc(
            derby.url, f"({sql}) q", properties=derby.properties
        )
        return {(r.message_id, r.ts, r.payload) for r in df.collect()}

    def test_final_read_matches_parquet_upsert_in_window(
        self, spark, tmp_path, derby
    ):
        wh = WarehouseSink(spark, str(tmp_path / "whch"))
        b1 = _df(spark, [("m1", T0, "a"), ("m2", T0, "b")])
        b2 = _df(
            spark,
            [
                ("m1", T1, "A2"),
                ("m2", T0, "b"),  # byte-identical redelivery
                ("m3", T0, "c-old"),
                ("m3", T1, "c-new"),  # in-batch dup -> reduction collapses
            ],
        )
        for batch in (b1, b2):
            wh.upsert(batch, "evch")
            self._ch_style_upsert(derby, batch, "evch_twin")
        final = self._final_read(spark, derby, "evch_twin")
        assert final == _rows_parquet(wh, "evch")
        assert {m for m, _, _ in final} == {"m1", "m2", "m3"}
        # the BASE table keeps every inserted version (dedup is at read
        # / background merge, not at insert) — the eventual-dedup flag
        base = _rows_jdbc(derby, "evch_twin")
        assert len([r for r in base if r[0] == "m1"]) == 2

    def test_global_dedup_divergence_out_of_window(
        self, spark, tmp_path, derby
    ):
        """ReplacingMergeTree dedups the whole key space: the conflict the
        31-day-window MERGE families leave duplicated COLLAPSES here —
        the documented family divergence (capabilities.dedup_is_global)."""
        wh = WarehouseSink(spark, str(tmp_path / "whchw"))
        old = _df(spark, [("mX", T_OLD, "ancient")])
        new = _df(spark, [("mX", T0, "fresh")])
        for batch in (old, new):
            wh.upsert(batch, "evchw")
            self._ch_style_upsert(derby, batch, "evchw_twin")
        final = self._final_read(spark, derby, "evchw_twin")
        assert final == {("mX", T0, "fresh")}  # global newest-wins
        parquet = _rows_parquet(wh, "evchw")
        assert len(parquet) == 2  # window-bounded MERGE keeps both

    def test_clickhouse_statement_forms(self):
        from jitsu_spark.sinks_cloud import (
            final_read_sql,
            replacing_insert_statements,
        )

        stmts = replacing_insert_statements(
            "clickhouse", "events", "events__stage", COLS, PK,
            include_ddl=True,
            column_types={
                "message_id": "String", "ts": "DateTime64(3)",
                "payload": "String",
            },
        )
        assert stmts[0].startswith("CREATE TABLE IF NOT EXISTS `events`")
        assert "ENGINE = ReplacingMergeTree(`ts`)" in stmts[0]
        assert "ORDER BY (`message_id`)" in stmts[0]
        assert stmts[1].startswith("INSERT INTO `events`")
        assert stmts[2] == "DROP TABLE `events__stage`"
        assert final_read_sql("clickhouse", "events", COLS, PK).endswith(
            "FROM `events` FINAL"
        )

    def test_merge_statements_refuse_clickhouse(self):
        with pytest.raises(ValueError, match="no MERGE"):
            merge_statements("clickhouse", "t", "s", COLS, PK)

    def test_writer_spec_flags_and_url(self):
        from jitsu_spark.sinks_cloud import cloud_writer_spec

        spec = cloud_writer_spec(
            "clickhouse",
            {
                "protocol": "clickhouse-secure",
                "hosts": ["ch1.example.com", "ch2.example.com:9001"],
                "username": "default",
                "password": "pw",
                "database": "newjitsu_metrics",
            },
            "events",
        )
        assert spec.format == "jdbc"
        # JDBC bridge: the driver is HTTP(S)-only, so the secure native
        # protocol maps to 8443; explicit ports pass through untouched
        assert spec.options["url"] == (
            "jdbc:clickhouse://ch1.example.com:8443,ch2.example.com:9001"
            "/newjitsu_metrics"
        )
        assert spec.options["ssl"] == "true"
        assert spec.merge_strategy == "replacing_insert"
        caps = spec.capabilities
        assert caps["dedup_is_global"] and caps["dedup_is_eventual"]
        assert caps["read_requires_final"] and not caps["stream_mode"]

    def test_replacing_insert_refuses_merge_families(self):
        from jitsu_spark.sinks_cloud import (
            final_read_sql,
            replacing_insert_statements,
        )

        for family in ("snowflake", "bigquery"):
            with pytest.raises(ValueError, match="MERGE family"):
                replacing_insert_statements(family, "t", "s", COLS, PK)
            with pytest.raises(ValueError, match="MERGE family"):
                final_read_sql(family, "t", COLS, PK)

    def test_on_cluster_ddl(self):
        from jitsu_spark.sinks_cloud import replacing_insert_statements

        stmts = replacing_insert_statements(
            "clickhouse", "events", "events__stage", COLS, PK,
            include_ddl=True, cluster="main",
            column_types={
                "message_id": "String", "ts": "DateTime64(3)",
                "payload": "String",
            },
        )
        assert "ON CLUSTER `main` " in stmts[0]

    def test_ddl_requires_full_column_types(self):
        from jitsu_spark.sinks_cloud import replacing_insert_statements

        with pytest.raises(ValueError, match="column_types"):
            replacing_insert_statements(
                "clickhouse", "t", "s", COLS, PK, include_ddl=True,
                column_types={"ts": "DateTime"},
            )
        with pytest.raises(ValueError, match="ClickHouse-specific"):
            replacing_insert_statements(
                "ansi", "t", "s", COLS, PK, include_ddl=True,
                column_types={c: "X" for c in COLS},
            )


class TestMergeEdgeCases:
    def test_all_key_columns_emit_insert_only_merge(self):
        stmts = merge_statements(
            "ansi", "link_t", "link_t__stage", ["a", "b"], ["a", "b"],
            timestamp_col="a",
        )
        assert "WHEN MATCHED" not in stmts[0]  # no empty UPDATE SET
        assert "WHEN NOT MATCHED THEN INSERT" in stmts[0]

    def test_all_key_merge_executes_on_derby(self, spark, derby):
        import datetime as dt

        df = spark.createDataFrame(
            [("k1", dt.datetime(2024, 3, 1))], "message_id string, ts timestamp"
        )
        df.write.option(
            "createTableColumnTypes", "message_id VARCHAR(64)"
        ).jdbc(derby.url, "linkt", mode="overwrite", properties=derby.properties)
        df.write.option(
            "createTableColumnTypes", "message_id VARCHAR(64)"
        ).jdbc(derby.url, "linkt__stage", mode="overwrite", properties=derby.properties)
        for sql in merge_statements(
            "ansi", "linkt", "linkt__stage", ["message_id", "ts"],
            ["message_id", "ts"], timestamp_col="ts",
        ):
            derby._execute(sql)
        assert derby.read("linkt").count() == 1  # idempotent, no dup

    def test_timestamp_col_must_be_in_columns(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="timestamp column"):
            merge_statements("ansi", "t", "s", ["a", "b"], ["a"],
                             timestamp_col="ts")


class TestErasureStatements:
    """Round-9: per-user DELETE generation for the JDBC/cloud families,
    Derby-twinned against the parquet purge path row-for-row."""

    def _user_df(self, spark, rows):
        return spark.createDataFrame(
            rows, "message_id string, ts timestamp, user_id string,"
            " payload string"
        )

    def test_purge_user_matches_parquet_path_row_for_row(
        self, spark, tmp_path, derby
    ):
        from jitsu_spark.operators.retention import purge_user
        from jitsu_spark.sinks import WarehouseSink

        wh = WarehouseSink(spark, str(tmp_path / "whp"))
        batch = self._user_df(
            spark,
            [
                ("m1", T0, "alice", "a1"),
                ("m2", T0, "bob", "b1"),
                ("m3", T1, "alice", "a2"),
                ("m4", T1, "carol", "c1"),
            ],
        )
        wh.upsert(batch, "evp")
        derby.upsert(batch, "evp_twin")
        audit_pq = purge_user(spark, wh, ["evp"], "alice").collect()
        audit_db = purge_user(spark, derby, ["evp_twin"], "alice").collect()
        assert audit_pq[0]["rows_deleted"] == 2
        assert audit_db[0]["rows_deleted"] == 2
        left = {
            (r.message_id, r.ts, r.user_id, r.payload)
            for r in wh.read("evp").select(
                "message_id", "ts", "user_id", "payload"
            ).collect()
        }
        right = {
            (r.message_id, r.ts, r.user_id, r.payload)
            for r in derby.read("evp_twin").collect()
        }
        assert left == right == {
            ("m2", T0, "bob", "b1"),
            ("m4", T1, "carol", "c1"),
        }

    def test_purge_missing_table_and_absent_user_are_noops(
        self, spark, derby
    ):
        assert derby.purge_user("nosuch", "alice") == {
            "table": "nosuch",
            "rows_deleted": 0,
            "partitions_touched": 0,
        }
        batch = self._user_df(spark, [("m1", T0, "bob", "b")])
        derby.upsert(batch, "evn_twin")
        assert derby.purge_user("evn_twin", "alice")["rows_deleted"] == 0
        assert len(derby.read("evn_twin").collect()) == 1

    def test_dialect_forms(self):
        from jitsu_spark.sinks_cloud import erasure_statements

        assert erasure_statements("bigquery", "ds.events", 42) == [
            "DELETE FROM `ds`.`events` WHERE `user_id` = 42"
        ]
        assert erasure_statements("snowflake", "events", "u1") == [
            'DELETE FROM "events" WHERE "user_id" = \'u1\''
        ]
        assert erasure_statements("ansi", "events", "u1") == [
            "DELETE FROM events WHERE \"user_id\" = 'u1'"
        ]
        assert erasure_statements("clickhouse", "events", "u1") == [
            "ALTER TABLE `events` DELETE WHERE `user_id` = 'u1'"
        ]
        assert erasure_statements(
            "clickhouse", "events", "u1", lightweight=True
        ) == ["DELETE FROM `events` WHERE `user_id` = 'u1'"]

    def test_literal_quoting_blocks_injection(self):
        from jitsu_spark.sinks_cloud import erasure_statements

        got = erasure_statements("ansi", "events", "x'; DROP TABLE t; --")
        assert got == [
            "DELETE FROM events WHERE \"user_id\" = 'x''; DROP TABLE t; --'"
        ]
        import pytest as _pt

        with _pt.raises(ValueError):
            erasure_statements("ansi", "events", 1.5)
        with _pt.raises(ValueError):
            erasure_statements("ansi", "events", True)
        with _pt.raises(ValueError):
            erasure_statements("ansi", "events", "a\x00b")
        with _pt.raises(ValueError):
            erasure_statements("ansi", "events", "a\nb")

    def test_backslash_escaping_per_dialect(self):
        """Backslash is an escape character in ClickHouse / Snowflake /
        BigQuery string literals: quote-doubling alone lets a trailing
        backslash-quote terminate the literal early (round-9 review
        finding #1). Each family must escape the backslash in its own
        dialect; ANSI leaves it literal (backslash is not special)."""
        from jitsu_spark.sinks_cloud import erasure_statements

        evil = "\\' OR 1=1 --"
        # clickhouse/snowflake: backslash doubled, quote doubled — the
        # engine lexes \\ as one backslash and '' as one quote
        assert erasure_statements("clickhouse", "t", evil) == [
            "ALTER TABLE `t` DELETE WHERE `user_id` = '\\\\'' OR 1=1 --'"
        ]
        assert erasure_statements("snowflake", "t", evil) == [
            "DELETE FROM \"t\" WHERE \"user_id\" = '\\\\'' OR 1=1 --'"
        ]
        # bigquery: standard-SQL strings — backslash escapes only
        assert erasure_statements("bigquery", "t", "it's") == [
            "DELETE FROM `t` WHERE `user_id` = 'it\\'s'"
        ]
        assert erasure_statements("bigquery", "t", evil) == [
            "DELETE FROM `t` WHERE `user_id` = '\\\\\\' OR 1=1 --'"
        ]
        # ansi/Derby: backslash is an ordinary character, left alone
        assert erasure_statements("ansi", "t", "a\\b") == [
            "DELETE FROM t WHERE \"user_id\" = 'a\\b'"
        ]

    def test_hostile_identities_round_trip_on_derby(self, spark, derby):
        """Identities containing quotes and backslashes delete exactly
        their own rows when the generated ANSI DELETE runs on a real
        engine — the escaping contract proven live, not just by string
        equality."""
        hostile = ["o'brien", "a\\'b", "x''y", "back\\slash"]
        rows = [
            (f"m{i}", T0, uid, f"p{i}") for i, uid in enumerate(hostile)
        ] + [("mk", T0, "keeper", "pk")]
        batch = self._user_df(spark, rows)
        derby.upsert(batch, "evh_twin")
        for i, uid in enumerate(hostile):
            audit = derby.purge_user("evh_twin", uid)
            assert audit["rows_deleted"] == 1, uid
        left = {r.user_id for r in derby.read("evh_twin").collect()}
        assert left == {"keeper"}
