"""SQL gateway guard tests — mirrors the reference's validation rules
(`webapps/console/pages/api/[workspaceId]/sql/query.ts:124-158`)."""

from __future__ import annotations

import pytest

from jitsu_spark.gateway import (
    SqlGatewayError,
    guarded_query,
    query_response,
    validate_select,
)


class TestValidate:
    def test_select_ok(self):
        validate_select("SELECT 1")
        validate_select("WITH t AS (SELECT 1) SELECT * FROM t")

    @pytest.mark.parametrize(
        "sql",
        [
            "DROP TABLE events",
            "INSERT INTO events VALUES (1)",
            "SELECT 1; DROP TABLE events",
            "UPDATE events SET x = 1",
            "CREATE TABLE t AS SELECT 1",
        ],
    )
    def test_non_select_rejected(self, sql):
        with pytest.raises(SqlGatewayError):
            validate_select(sql)

    def test_keywords_inside_literals_are_fine(self):
        validate_select("SELECT 'DROP TABLE x; --' AS s, '; ; ;' AS t")

    def test_comment_hidden_statement_rejected(self):
        with pytest.raises(SqlGatewayError):
            validate_select("SELECT 1 /* */ ; DELETE FROM events")

    def test_table_whitelist(self):
        validate_select("SELECT * FROM events", {"events"})
        with pytest.raises(SqlGatewayError, match="not allowed"):
            validate_select("SELECT * FROM secrets", {"events"})
        # CTE names are not tables
        validate_select(
            "WITH x AS (SELECT * FROM events) SELECT * FROM x", {"events"}
        )
        with pytest.raises(SqlGatewayError, match="not allowed"):
            validate_select(
                "SELECT * FROM events JOIN secrets ON true", {"events"}
            )
        # comma-separated FROM list must not slip past the whitelist
        with pytest.raises(SqlGatewayError, match="not allowed"):
            validate_select("SELECT * FROM events, secrets", {"events"})
        # ... including when the entries carry aliases (textual fallback)
        with pytest.raises(SqlGatewayError, match="secrets"):
            validate_select("SELECT * FROM events a, secrets b", {"events"})
        with pytest.raises(SqlGatewayError, match="secrets"):
            validate_select(
                "SELECT * FROM events AS a, secrets AS b", {"events"}
            )
        # an alias must never be mistaken for a table or a clause keyword
        validate_select(
            "SELECT * FROM events e WHERE e.event_id > 0", {"events"}
        )

    def test_quoted_identifiers_fail_closed_without_session(self):
        """Round-4 ADVICE: _strip() blanks quoted identifiers, so
        `FROM \\`secret\\`` contributed no FROM-head match and bypassed
        the textual allowlist. Without a parser a quoted identifier is
        unresolvable — reject it outright."""
        for q in (
            "SELECT * FROM `secret`",
            'SELECT * FROM "secret"',
            "SELECT * FROM events, `secret`",
            'SELECT * FROM events JOIN "secret" ON true',
            'WITH x AS (SELECT * FROM "secret") SELECT * FROM x',
        ):
            with pytest.raises(SqlGatewayError, match="quoted identifier"):
                validate_select(q, {"events"})
        # quoted STRINGS and quotes inside comments are fine — only
        # identifier quoting is unresolvable
        validate_select(
            "SELECT * FROM events WHERE name = 'a\"b`c'", {"events"}
        )
        validate_select(
            "SELECT * FROM events -- `comment` \"quoted\"", {"events"}
        )
        # with no allowlist the fallback never rejects quoting
        validate_select("SELECT * FROM `events`")


class TestPlanResolvedWhitelist:
    """Catalyst-parsed table resolution (`referenced_tables`) — the strict
    path used whenever a SparkSession is supplied."""

    def test_comma_from_list(self, spark):
        with pytest.raises(SqlGatewayError, match="secrets"):
            validate_select(
                "SELECT * FROM events, secrets", {"events"}, spark=spark
            )

    def test_scalar_subquery_table(self, spark):
        with pytest.raises(SqlGatewayError, match="secrets"):
            validate_select(
                "SELECT (SELECT max(x) FROM secrets) FROM events",
                {"events"},
                spark=spark,
            )

    def test_cte_body_tables_are_validated(self, spark):
        # UnresolvedWith keeps CTE definition plans in cteRelations (not
        # children), so a naive child walk never sees `secrets` — the
        # round-2 bypass: WITH x AS (SELECT * FROM secrets) SELECT * FROM x
        with pytest.raises(SqlGatewayError, match="secrets"):
            validate_select(
                "WITH x AS (SELECT * FROM secrets) SELECT * FROM x",
                {"events"},
                spark=spark,
            )
        # nested CTE bodies too
        with pytest.raises(SqlGatewayError, match="secrets"):
            validate_select(
                "WITH x AS (WITH y AS (SELECT * FROM secrets) "
                "SELECT * FROM y) SELECT * FROM x",
                {"events"},
                spark=spark,
            )
        # CTE over an allowed table still passes
        validate_select(
            "WITH x AS (SELECT * FROM events) SELECT * FROM x",
            {"events"},
            spark=spark,
        )

    def test_decoy_cte_cannot_shadow_real_table(self, spark):
        # round-3 review bypass: a subquery-scoped CTE named after a
        # forbidden table must not excuse the OUTER reference to the
        # real table
        with pytest.raises(SqlGatewayError, match="secret"):
            validate_select(
                "SELECT * FROM secret, "
                "(WITH secret AS (SELECT 1 AS x) SELECT x FROM secret) s",
                {"events"},
                spark=spark,
            )
        # the textual fallback fails closed on the same shape
        with pytest.raises(SqlGatewayError, match="secret"):
            validate_select(
                "SELECT * FROM secret, "
                "(WITH secret AS (SELECT 1 AS x) SELECT x FROM secret) s",
                {"events"},
            )
        # scoping is positional, not just nested: a top-level WITH binding
        # still covers the whole statement
        validate_select(
            "WITH x AS (SELECT * FROM events) "
            "SELECT * FROM x, (SELECT * FROM x) y",
            {"events"},
            spark=spark,
        )

    def test_cte_and_alias_still_pass(self, spark):
        validate_select(
            "WITH x AS (SELECT * FROM events) "
            "SELECT * FROM x a, events b WHERE a.event_id = b.event_id",
            {"events"},
            spark=spark,
        )

    def test_guarded_query_uses_plan_resolution(self, spark):
        spark.range(3).createOrReplaceTempView("hundred")
        spark.range(3).createOrReplaceTempView("secrets")
        with pytest.raises(SqlGatewayError, match="secrets"):
            guarded_query(
                spark,
                "SELECT * FROM hundred, secrets",
                allowed_tables={"hundred"},
            )


def test_limit_cap_and_offset(spark):
    spark.range(100).createOrReplaceTempView("hundred")
    df = guarded_query(
        spark,
        "SELECT id FROM hundred ORDER BY id",
        limit=1000,
        offset=10,
        server_limit=50,
        allowed_tables={"hundred"},
    )
    rows = [r.id for r in df.collect()]
    assert len(rows) == 50
    assert rows[0] == 10


def test_user_limit_below_cap_respected(spark):
    spark.range(100).createOrReplaceTempView("hundred")
    df = guarded_query(spark, "SELECT id FROM hundred ORDER BY id", limit=5)
    assert df.count() == 5


def test_query_response_shape(spark):
    resp = query_response(guarded_query(spark, "SELECT 1 AS one"))
    assert resp["rows"] == 1
    assert resp["meta"] == [{"name": "one", "type": "int"}]
    assert resp["data"] == [{"#": 1, "one": 1}]


def test_forward_cte_reference_reads_real_table(spark):
    """Spark resolves a FORWARD reference inside an earlier CTE def to
    the REAL table (verified live: WITH a AS (SELECT * FROM secret),
    secret AS (SELECT 99) reads the actual `secret`). Binding is
    positional, so that form must be rejected when `secret` is not
    allowlisted."""
    with pytest.raises(SqlGatewayError, match="secret"):
        validate_select(
            "WITH a AS (SELECT * FROM secret), secret AS (SELECT 99 AS x) "
            "SELECT * FROM a",
            {"events"},
            spark=spark,
        )
    # backward reference (the legal SQL shape) still passes
    validate_select(
        "WITH b AS (SELECT * FROM events), a AS (SELECT * FROM b) "
        "SELECT * FROM a",
        {"events"},
        spark=spark,
    )


def test_backslash_escapes_fail_closed_without_session():
    """Round-4 review: Spark's lexer honors backslash escapes inside
    string literals while the textual walker only knows '' doubling —
    a crafted literal can hide a FROM clause from every textual check.
    Without a parser the only safe answer is rejection."""
    with pytest.raises(SqlGatewayError, match="backslash"):
        validate_select(
            "SELECT 'a\\'' AS c, x FROM secret WHERE 'z' = 'z' --'",
            {"t1"},
        )
    # no allowlist -> the fallback never rejects (shape checks only)
    validate_select("SELECT 'a\\nb' AS c")


def test_schema_response_golden(spark):
    """`schema_response` mirrors the reference's information_schema
    scan (`sql/schema.ts:38-63`): {table: [{name, type}, ...]} keyed by
    allowlisted table, columns in table order, absent tables skipped
    (fail-closed, never guessed)."""
    from jitsu_spark.gateway import schema_response

    spark.sql("SELECT 1 AS a, 'x' AS b, CAST(2.5 AS DOUBLE) AS c").createOrReplaceTempView(
        "gw_schema_t1"
    )
    spark.range(3).createOrReplaceTempView("gw_schema_t2")
    resp = schema_response(
        spark, {"gw_schema_t1", "gw_schema_t2", "not_a_table"}
    )
    assert resp == {
        "gw_schema_t1": [
            {"name": "a", "type": "int"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": "double"},
        ],
        "gw_schema_t2": [{"name": "id", "type": "bigint"}],
    }
    # full-catalog enumeration needs the EXPLICIT sentinel; a missing
    # or empty allowlist denies everything (r6 advice: fail-closed)
    from jitsu_spark.gateway import LIST_ALL_TABLES

    everything = schema_response(spark, LIST_ALL_TABLES)
    assert "gw_schema_t1" in everything and "gw_schema_t2" in everything
    assert schema_response(spark, None) == {}
    assert schema_response(spark, set()) == {}
    import pytest as _pytest

    with _pytest.raises(TypeError):
        schema_response(spark)  # allowlist can no longer be omitted
    spark.catalog.dropTempView("gw_schema_t1")
    spark.catalog.dropTempView("gw_schema_t2")


class TestRound9GatewayFindings:
    def test_nested_with_validates_in_linear_time(self, spark):
        """Round-9 review #1: the CTE walk was exponential in WITH
        nesting depth (double traversal via innerChildren) — a ~25-level
        chain DoS'd the gateway. Depth 14 must validate in seconds."""
        import time

        from jitsu_spark.gateway import validate_select

        sql = "SELECT 1 AS x"
        for i in range(14):
            sql = f"WITH c{i} AS ({sql}) SELECT * FROM c{i}"
        t0 = time.time()
        validate_select(sql, {"events"}, spark=spark)
        assert time.time() - t0 < 15

    def test_window_clause_is_not_a_cte_without_session(self):
        """Round-9 review #2: `WINDOW secret AS (ORDER BY x)` whitelisted
        the table name `secret` in the no-session fallback — fail-open."""
        import pytest

        from jitsu_spark.gateway import SqlGatewayError, validate_select

        q = (
            "SELECT max(x) OVER secret FROM secret"
            " WINDOW secret AS (ORDER BY x)"
        )
        with pytest.raises(SqlGatewayError, match="secret"):
            validate_select(q, {"events"})

    def test_from_operand_functions_accepted_without_session(self):
        """Round-9 review #7: EXTRACT/SUBSTRING/TRIM's FROM operand was
        scanned as a table reference, rejecting valid queries."""
        from jitsu_spark.gateway import validate_select

        validate_select("SELECT EXTRACT(DAY FROM ts) FROM events", {"events"})
        validate_select(
            "SELECT SUBSTRING(name FROM 1 FOR 2) FROM events", {"events"}
        )
        validate_select(
            "SELECT TRIM(LEADING ' ' FROM name) FROM events", {"events"}
        )

    def test_real_ctes_still_validate_without_session(self):
        import pytest

        from jitsu_spark.gateway import SqlGatewayError, validate_select

        validate_select(
            "WITH c AS (SELECT * FROM events) SELECT * FROM c", {"events"}
        )
        with pytest.raises(SqlGatewayError, match="secret"):
            validate_select(
                "WITH c AS (SELECT * FROM secret) SELECT * FROM c",
                {"events"},
            )

    def test_trailing_semicolon_executes(self, spark):
        """Round-9 review #4: a trailing ';' passed validation but broke
        the subselect embedding with a parse error."""
        from jitsu_spark.gateway import guarded_query

        rows = guarded_query(spark, "SELECT id FROM range(5);").collect()
        assert len(rows) == 5
