"""Round-9 plan-audit gate (`tools/explain_all.py --assert`): the
unpushed-filter detector must FIRE on a scan whose Filter parent holds a
pushable predicate while PushedFilters is empty, and stay quiet when the
filter was pushed or is genuinely unpushable (computed column)."""

from __future__ import annotations

from tools.explain_all import unpushed_filter_findings

# A minimal formatted-explain shape: header tree + detail sections.
_PLAN_TEMPLATE = """== Physical Plan ==
* Filter (3)
+- * ColumnarToRow (2)
   +- Scan parquet  (1)

(1) Scan parquet
Output [2]: [user_id#1L, ts#2]
Batched: true
Location: InMemoryFileIndex [file:/x]
PushedFilters: {pushed}
ReadSchema: struct<user_id:bigint,ts:timestamp>

(2) ColumnarToRow [codegen id : 1]
Input [2]: [user_id#1L, ts#2]

(3) Filter [codegen id : 1]
Input [2]: [user_id#1L, ts#2]
Condition : {cond}
"""


def _plan(pushed: str, cond: str) -> str:
    return _PLAN_TEMPLATE.format(pushed=pushed, cond=cond)


class TestUnpushedFilterDetector:
    def test_fires_on_unpushed_isnotnull(self):
        plan = _plan("[]", "(isnotnull(user_id#1L) AND (user_id#1L = 7))")
        got = unpushed_filter_findings("q", plan)
        assert len(got) == 1 and "PushedFilters:[]" in got[0]

    def test_fires_on_unpushed_comparison(self):
        plan = _plan("[]", "(user_id#1L > 5)")
        assert len(unpushed_filter_findings("q", plan)) == 1

    def test_quiet_when_pushed(self):
        plan = _plan(
            "[IsNotNull(user_id), EqualTo(user_id,7)]",
            "(isnotnull(user_id#1L) AND (user_id#1L = 7))",
        )
        assert unpushed_filter_findings("q", plan) == []

    def test_quiet_on_computed_column_filter(self):
        # predicate over a derived value — not pushable, not a finding
        plan = _plan("[]", "(size(split(text#9,  , -1), true) > 5)")
        assert unpushed_filter_findings("q", plan) == []

    def test_quiet_when_no_filter_parent(self):
        plan = """== Physical Plan ==
* HashAggregate (3)
+- * ColumnarToRow (2)
   +- Scan parquet  (1)

(1) Scan parquet
Output [1]: [user_id#1L]
PushedFilters: []
ReadSchema: struct<user_id:bigint>

(2) ColumnarToRow [codegen id : 1]
Input [1]: [user_id#1L]

(3) HashAggregate [codegen id : 1]
Input [1]: [user_id#1L]
"""
        assert unpushed_filter_findings("q", plan) == []
