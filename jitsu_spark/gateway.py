"""Guarded SQL SELECT gateway.

Reference (`webapps/console/pages/api/[workspaceId]/sql/query.ts:39-158`):
parse user SQL, require a single SELECT statement over whitelisted tables,
cap the LIMIT at a server limit (default 50, `:10`), inject OFFSET,
regenerate SQL, execute, and return `{meta, data, rows}`.

Spark shape: validate the statement shape (single statement, SELECT/WITH
only — checked on a comment- and string-literal-stripped view of the text,
so keywords hiding in literals can't fool the guard), check referenced
tables against the session catalog whitelist, then wrap the query as a
subselect with the capped LIMIT/OFFSET. The wrap — rather than AST LIMIT
surgery — preserves the user query verbatim and lets Catalyst push the
limit down (CollectLimit / GlobalLimit over the inner plan).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SERVER_LIMIT = 50  # sql/query.ts:10


class SqlGatewayError(ValueError):
    pass


_STRING_OR_COMMENT = re.compile(
    r"""
      '(?:[^']|'')*'          # single-quoted literal ('' escape)
    | "(?:[^"]|"")*"          # double-quoted identifier
    | `[^`]*`                 # backtick identifier
    | --[^\n]*                # line comment
    | /\*.*?\*/               # block comment
    """,
    re.S | re.X,
)


def _strip(sql: str) -> str:
    """Replace literals/comments with spaces so structural checks see only
    real SQL tokens (same purpose as the reference's astify step)."""
    return _STRING_OR_COMMENT.sub(" ", sql)


def referenced_tables(spark: SparkSession, sql: str) -> set[str]:
    """All table names the query references, resolved from Catalyst's parsed
    logical plan (not regex): walks the tree collecting `UnresolvedRelation`
    leaves — including comma-separated FROM lists, JOINs, expression
    subqueries — and subtracts CTE names bound by `UnresolvedWith`.

    This is the analogue of the reference's astify step
    (`sql/query.ts:39-70`), which also resolves tables from the parsed AST
    rather than the raw text."""
    plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    tables: set[str] = set()

    def walk(node, bound: frozenset[str]) -> None:
        """`bound` is the set of CTE names in scope for THIS subtree —
        scoping matters: a decoy CTE named after a forbidden table inside
        a subquery must not excuse references to the real table outside
        that subquery's scope (round-3 review bypass)."""
        cls = node.getClass().getSimpleName()
        if cls == "UnresolvedRelation":
            name = node.tableName().lower()
            if name not in bound:
                tables.add(name)
        if cls == "UnresolvedWith":
            # CTE definition plans live in cteRelations (surfaced only via
            # innerChildren, not children), so they must be walked explicitly
            # or `WITH x AS (SELECT * FROM secret) SELECT * FROM x` would
            # never surface `secret`. Binding is POSITIONAL: a definition
            # sees only the names declared before it (plus itself, for
            # recursive CTEs) — Spark resolves a forward reference to the
            # REAL table (verified live), so `WITH a AS (SELECT * FROM
            # secret), secret AS (...)` reads the real `secret` inside `a`
            # and must be validated as such. The main body sees all names.
            it = node.cteRelations().iterator()
            entries = []
            while it.hasNext():
                entry = it.next()
                entries.append((entry._1().lower(), entry._2()))
            preceding: set[str] = set()
            for name, defn in entries:
                walk(defn, bound | preceding | {name})
                preceding.add(name)
            bound = bound | {n for n, _ in entries}
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next(), bound)
        sit = node.subqueries().iterator()
        while sit.hasNext():
            walk(sit.next(), bound)
        # Catch any other plan-carrying fields hidden from children()
        # (views, command payloads) the same way explain() does. Skip
        # UnresolvedWith: its innerChildren ARE the cteRelations walked
        # above with correct positional binding — walking them twice
        # made the traversal EXPONENTIAL in CTE nesting depth (a ~25-
        # level WITH chain, a few hundred bytes of SQL, pinned the
        # driver for hours: a gateway DoS — round-9 review #1).
        if cls != "UnresolvedWith":
            try:
                iit = node.innerChildren().iterator()
                while iit.hasNext():
                    inner = iit.next()
                    if inner.getClass().getName().startswith(
                        "org.apache.spark.sql.catalyst.plans.logical"
                    ):
                        walk(inner, bound)
            except Exception:
                pass  # innerChildren not reachable on this node type

    walk(plan, frozenset())
    return tables


def validate_select(
    sql: str,
    allowed_tables: set[str] | None = None,
    spark: SparkSession | None = None,
) -> None:
    stripped = _strip(sql)
    if ";" in stripped.rstrip().rstrip(";"):
        raise SqlGatewayError("only a single statement is allowed")
    first = stripped.strip().split(None, 1)
    if not first or first[0].upper() not in ("SELECT", "WITH"):
        raise SqlGatewayError("only SELECT queries are allowed")
    forbidden = re.findall(
        r"\b(INSERT|UPDATE|DELETE|MERGE|DROP|CREATE|ALTER|TRUNCATE|GRANT|COPY|CALL|SET)\b",
        stripped,
        re.I,
    )
    if forbidden:
        raise SqlGatewayError(f"forbidden keyword: {forbidden[0].upper()}")
    if allowed_tables is not None:
        allowed = {a.lower() for a in allowed_tables}
        if spark is not None:
            refs = referenced_tables(spark, sql)
        else:
            # Fail closed on quoted identifiers BEFORE stripping: _strip()
            # blanks backtick/double-quoted identifiers, so `FROM `secret``
            # would contribute no FROM-head match and silently bypass the
            # allowlist. Without a parser we cannot resolve what a quoted
            # identifier names, so any one in the statement (outside
            # comments and string literals) is rejected outright — the
            # Catalyst path (spark != None) handles them correctly.
            # Backslashes first: Spark's default lexer honors \' inside
            # string literals while this walker only knows '' doubling —
            # a crafted `'a\''` makes the two disagree about where the
            # literal ends and hides a FROM clause from every check
            # below. No parser, no way to resolve it: fail closed.
            if "\\" in sql:
                raise SqlGatewayError(
                    "backslash escapes cannot be validated without a "
                    "session"
                )
            no_comments = re.sub(
                r"'(?:[^']|'')*'|--[^\n]*|/\*.*?\*/", " ", sql, flags=re.S
            )
            if re.search(r'[`"]', no_comments):
                raise SqlGatewayError(
                    "quoted identifiers cannot be validated without a "
                    "session; use unquoted table names"
                )
            # textual fallback when no session is available: FROM/JOIN
            # heads plus comma-continued FROM-list entries. Each entry may
            # carry an alias (`FROM t1 a, t2 b`) — the alias is consumed so
            # the comma chain keeps matching and every table is validated;
            # a clause keyword is never mistaken for an alias.
            # Mask paren groups that contain no SELECT (innermost-out):
            # two fail-open/fail-noisy holes lived in raw text —
            # `... WINDOW w AS (ORDER BY x)` parsed as a CTE named `w`
            # (whitelisting an arbitrary table name: fail-OPEN), and
            # `EXTRACT(DAY FROM ts)` fed `ts` to the FROM-scan
            # (rejecting valid queries). Masking removes both: window
            # specs and function argument lists vanish, while CTE bodies
            # and FROM-subqueries (they contain SELECT) survive for the
            # scans below (round-9 review #2/#7).
            masked = stripped
            while True:
                changed = [False]

                def _mask(m, changed=changed):
                    if re.search(r"\bSELECT\b", m.group(1), re.I):
                        # protect: sentinel brackets survive this pass
                        return "\x00" + m.group(1) + "\x01"
                    changed[0] = True
                    return " __g__ "

                masked = re.sub(r"\(([^()]*)\)", _mask, masked)
                if not changed[0]:
                    break
            masked = masked.replace("\x00", "(").replace("\x01", ")")
            # Only CTEs defined at the statement's top level (paren depth
            # 0) may excuse a table name — a decoy `WITH secret AS (...)`
            # nested inside a subquery must not whitelist the real
            # `secret` table referenced outside it. Fail-closed: nested
            # legitimate CTEs may be re-validated as tables and rejected.
            cte_names = set()
            depth = 0
            for m in re.finditer(r"\b(\w+)\s+AS\s*\(|\(|\)", masked, re.I):
                if m.group(0) == "(":
                    depth += 1
                elif m.group(0) == ")":
                    depth -= 1
                else:
                    if depth == 0:
                        cte_names.add(m.group(1).lower())
                    depth += 1  # the definition's own open paren
            kw = (
                r"(?:WHERE|GROUP|ORDER|HAVING|LIMIT|OFFSET|UNION|EXCEPT"
                r"|INTERSECT|JOIN|ON|USING|INNER|LEFT|RIGHT|FULL|CROSS"
                r"|NATURAL|SELECT|WITH|AS)"
            )
            entry = rf"[\w.]+(?:\s+(?:AS\s+)?(?!{kw}\b)\w+)?"
            refs = set()
            for m in re.finditer(
                rf"\b(?:FROM|JOIN)\s+({entry}(?:\s*,\s*{entry})*)",
                masked,
                re.I,
            ):
                for t in m.group(1).split(","):
                    t = t.strip().split()[0].lower()
                    if t and t not in cte_names:
                        refs.add(t)
        for t in sorted(refs - allowed):
            raise SqlGatewayError(f"table not allowed: {t}")


def guarded_query(
    spark: SparkSession,
    sql: str,
    limit: int | None = None,
    offset: int = 0,
    server_limit: int = DEFAULT_SERVER_LIMIT,
    allowed_tables: set[str] | None = None,
) -> DataFrame:
    """Validate + cap + run. The user's LIMIT (if any) still applies inside
    the subselect; the outer LIMIT enforces the server cap regardless
    (`query.ts:138-155` semantics)."""
    validate_select(sql, allowed_tables, spark=spark)
    eff = server_limit if limit is None else min(limit, server_limit)
    # validation tolerates a trailing ';' (single statement), but the
    # subselect embedding would turn it into a parse error — the most
    # common user habit breaking the endpoint (round-9 review #4)
    sql = sql.rstrip().rstrip(";").rstrip()
    outer = f"SELECT * FROM ({sql}) __gw LIMIT {int(eff)}"
    if offset:
        outer += f" OFFSET {int(offset)}"
    return spark.sql(outer)


def sql_gateway_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 registry entry: a user SELECT asking for 1000 rows is capped at
    the server limit (50) with OFFSET injected — `query.ts:138-155`."""
    from .tables import register_views

    register_views(spark, sf_dir)
    return guarded_query(
        spark,
        "SELECT event_id, user_id, event_type FROM events ORDER BY event_id",
        limit=1000,
        offset=10,
        allowed_tables={"events"},
    )


SQL_GATEWAY_SQL = """
SELECT event_id, user_id, event_type FROM events ORDER BY event_id
LIMIT 50 OFFSET 10
"""

QUERIES = {"sql_gateway_limit": sql_gateway_limit}
ORACLE = {"sql_gateway_limit": SQL_GATEWAY_SQL}


# Explicit opt-in sentinel for schema_response: enumerate every catalog
# table. A *value* (not a default) so a caller that forgets to thread
# the session allowlist denies everything instead of leaking the full
# catalog schema (r6 advice: None defaulted to list-everything —
# fail-open on an endpoint documented as fail-closed).
LIST_ALL_TABLES = object()


def schema_response(spark: SparkSession, allowed_tables) -> dict:
    """Schema-introspection companion to the query endpoint — the
    reference pairs `sql/query.ts` with an `information_schema.columns`
    scan returning `{table: [{name, type}, ...]}` ordered by table name
    and ordinal position (`sql/schema.ts:38-63`).

    Spark shape: `spark.catalog.listColumns` over the session catalog,
    restricted to the same allowlist the query gateway enforces
    (fail-closed: an allowlisted name missing from the catalog is
    skipped, never guessed; a None/empty allowlist denies everything —
    pass the module sentinel `LIST_ALL_TABLES` to opt into full-catalog
    enumeration). listColumns preserves the table's column order — the
    ordinal_position analogue."""
    if allowed_tables is LIST_ALL_TABLES:
        names = sorted(t.name.lower() for t in spark.catalog.listTables())
    elif not allowed_tables:
        return {}
    else:
        names = sorted(t.lower() for t in allowed_tables)
    out: dict[str, list[dict[str, str]]] = {}
    for t in names:
        if not spark.catalog.tableExists(t):
            continue
        out[t] = [
            {"name": c.name, "type": c.dataType}
            for c in spark.catalog.listColumns(t)
        ]
    return out


def query_response(df: DataFrame) -> dict:
    """The reference's response shape (`query.ts:78-84`): column meta,
    row data (with a '#' index), row count."""
    rows = df.collect()
    return {
        "meta": [
            {"name": f.name, "type": f.dataType.simpleString()}
            for f in df.schema.fields
        ],
        "data": [
            {"#": i + 1, **r.asDict(recursive=True)} for i, r in enumerate(rows)
        ],
        "rows": len(rows),
    }
