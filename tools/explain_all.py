"""Dump formatted physical plans of every registry query to PLANS.md —
and (round 9, VERDICT r8 #10) gate on them.

Usage:
  python tools/explain_all.py [sf_dir]            # regenerate PLANS.md
  python tools/explain_all.py [sf_dir] --assert   # regenerate + FAIL if
        (a) any registry entry lacks a PLANS.md section, or
        (b) any parquet scan shows empty PushedFilters while a Filter
            directly above it holds a pushable predicate on one of the
            scan's own columns (isnotnull / literal comparison on a bare
            column) — the signature of a filter that SHOULD have reached
            the scan.

The output is the artifact to review after any operator change: every
scan should show pruned ReadSchema + PushedFilters, dim joins should be
BroadcastHashJoin, and WholeStageCodegen spans should cover the
expression work. With --assert the review is a gate, not a document.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Known-clean scans where the Filter above a PushedFilters:[] scan is
# genuinely unpushable (predicates over computed columns only). Add
# entries as "<query_name>:<scan_ordinal>" after manual review.
ALLOWLIST: set[str] = set()


def _scan_sections(plan: str) -> list[dict]:
    """Parse a formatted explain string into scan records:
    {id, schema_cols, pushed_empty} per `Scan parquet` node."""
    out = []
    for m in re.finditer(
        r"\((\d+)\) Scan parquet[^\n]*\n(?:.*?\n)*?ReadSchema: struct<([^\n]*)>",
        plan,
    ):
        block = m.group(0)
        cols = re.findall(r"(\w+):", m.group(2))
        pushed_empty = bool(
            re.search(r"PushedFilters: \[\]", block)
        )
        out.append(
            {"id": int(m.group(1)), "cols": set(cols), "pushed_empty": pushed_empty}
        )
    return out


def _filter_conditions(plan: str) -> dict[int, str]:
    """{node_id: condition} for every Filter node in the detail section."""
    conds = {}
    for m in re.finditer(
        r"\((\d+)\) Filter[^\n]*\n(?:Input[^\n]*\n)?Condition : (.*)", plan
    ):
        conds[int(m.group(1))] = m.group(2)
    return conds


def _tree_edges(plan: str) -> dict[int, int]:
    """child_id -> parent_id from the header tree (indentation +
    node-ids in parentheses). The formatted header lists each operator
    as '<indent>Op (id)'; the parent is the nearest shallower line
    above."""
    edges: dict[int, int] = {}
    stack: list[tuple[int, int]] = []  # (indent, id)
    for line in plan.splitlines():
        m = re.match(r"^([ +\-*:]*)([A-Za-z][\w ]*?) \((\d+)\)\s*$", line)
        if not m:
            if line.startswith("(1) ") or line.startswith("("):
                break  # detail section begins
            continue
        indent = len(m.group(1))
        nid = int(m.group(3))
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if stack:
            edges[nid] = stack[-1][1]
        stack.append((indent, nid))
    return edges


# nodes the walk-up in unpushed_filter_findings looks through when
# hunting the scan's first "real" ancestor
PASSTHROUGH_NODES = ("ColumnarToRow", "InputAdapter", "Project")


def _node_name(plan: str, nid: int) -> str:
    m = re.search(rf"\(({nid})\) (\w[\w ]*)", plan)
    return m.group(2).strip() if m else ""


def unpushed_filter_findings(name: str, plan: str) -> list[str]:
    """The (b) check: empty-PushedFilters scans whose nearest
    non-passthrough ancestor is a Filter with a pushable predicate on a
    scan column."""
    findings = []
    scans = _scan_sections(plan)
    conds = _filter_conditions(plan)
    edges = _tree_edges(plan)
    for i, scan in enumerate(s for s in scans if s["pushed_empty"]):
        key = f"{name}:{i}"
        nid = scan["id"]
        # walk up through passthrough nodes to the first "real" ancestor
        cur = edges.get(nid)
        hops = 0
        while cur is not None and hops < 6:
            nname = _node_name(plan, cur)
            if nname in PASSTHROUGH_NODES:
                cur = edges.get(cur)
                hops += 1
                continue
            break
        if cur is None or cur not in conds:
            continue
        cond = conds[cur]
        pushable = False
        for col in scan["cols"]:
            if re.search(rf"isnotnull\({col}#\d+\)", cond):
                pushable = True
            if re.search(
                rf"\({col}#\d+L? (=|<|>|<=|>=) [^()\s]+\)", cond
            ):
                pushable = True
        if pushable and key not in ALLOWLIST:
            findings.append(
                f"{name}: scan ({nid}) has PushedFilters:[] under Filter"
                f" ({cur}) with pushable predicate: {cond[:120]}"
            )
    return findings


def main() -> None:
    args = sys.argv[1:]
    do_assert = "--assert" in args
    if do_assert:
        args.remove("--assert")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from jitsu_spark.registry import QUERIES
    from jitsu_spark.session import get_spark

    spark = get_spark("explain-all", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md",
    )
    findings: list[str] = []
    missing: list[str] = []
    with open(out_path, "w") as f:
        f.write(
            "# PLANS — formatted physical plans of every registry query\n\n"
            f"Generated by `python tools/explain_all.py {sf_dir}`. Reviewed\n"
            "properties: pruned ReadSchema, PushedFilters at scans, broadcast\n"
            "dim joins, whole-stage codegen coverage. `--assert` turns the\n"
            "review into a gate (missing sections / unpushed filters fail).\n"
        )
        for name in QUERIES:
            try:
                df = QUERIES[name](spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(mode)
            except Exception as ex:  # noqa: BLE001 - recorded, not hidden
                missing.append(f"{name}: plan generation failed: {ex}")
                f.write(f"\n## {name}\n\nPLAN GENERATION FAILED: {ex}\n")
                continue
            f.write(f"\n## {name}\n\n```\n{plan}\n```\n")
            findings.extend(unpushed_filter_findings(name, plan))
    print(f"wrote {out_path} ({len(QUERIES)} entries)")
    if do_assert:
        ok = True
        if missing:
            ok = False
            print("MISSING SECTIONS / FAILED PLANS:")
            for m in missing:
                print("  " + m)
        if findings:
            ok = False
            print("UNPUSHED-FILTER FINDINGS:")
            for m in findings:
                print("  " + m)
        if not ok:
            spark.stop()
            raise SystemExit(1)
        print("assert mode: all entries planned, no unpushed filters")
    spark.stop()


if __name__ == "__main__":
    main()
