"""Physical-plan audit: for every registered query, EXECUTE the query
(so AQE finalizes), then aggregate shuffle exchanges, broadcast joins,
sorts, WholeStageCodegen coverage, scan-level column pruning and pushed
filters across ALL SQL executions the query triggered. Writes PLANS.md.

Aggregating over the session's SQLAppStatusStore — every execution
recorded between before/after markers — is what makes the audit see
through lineage truncation: a ``localCheckpoint(eager=True)`` (and any
internal ``collect``/``count`` of an iterative operator) is its OWN
SQL execution holding the full PRE-checkpoint physical plan, while the
final frame's plan starts at a ``Scan ExistingRDD``. Auditing only the
final frame (what this tool did through round 6) reported "0 shuffles,
0 scans" for exactly the iterative operators (pagerank, bpe_train,
near_dup_clusters, ...) where a plan regression would hide.

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_finance_pipeline_spark import get_spark  # noqa: E402

#: tree line: optional indent/branch art, optional codegen star, node
#: name, then the detail-section id — e.g. "   +- * HashAggregate (8)"
_TREE_NODE = re.compile(r"^[\s:+\-*]*?(\*\s)?([A-Za-z][A-Za-z0-9 ]*?)\s+\((\d+)\)")


def parse_execution(desc: str) -> dict:
    """Audit ONE execution's physicalPlanDescription (formatted-mode
    string from the SQL status store): counts come from the FINAL
    (post-AQE) plan tree only, with exchange kinds resolved through
    the per-node detail blocks."""
    # tree = header + final plan; drop the "== Initial Plan ==" branch
    # (the initial plan repeats the same logical nodes under different
    # ids, so ids must be collected from the FINAL tree, not details)
    tree = desc.split("+- == Initial Plan ==")[0]
    tree = tree.split("\n\n(")[0]
    # detail blocks: "(<id>) <Name>" headers start at column 0 (tree
    # lines never do — even root nodes carry a name before the id)
    blocks: dict[str, str] = {}
    cur: str | None = None
    for line in desc.splitlines():
        m = re.match(r"^\((\d+)\) (.+)$", line)
        if m:
            cur = m.group(1)
            blocks[cur] = m.group(2) + "\n"
        elif cur is not None:
            blocks[cur] += line + "\n"

    nodes: list[tuple[str, str]] = []  # (name, id)
    for line in tree.splitlines():
        m = _TREE_NODE.match(line)
        if m:
            nodes.append((m.group(2).strip(), m.group(3)))

    out = {
        "exchanges": 0,
        "single_part": 0,
        "broadcasts": 0,
        "sorts": 0,
        "scans": [],
        "pushed": [],
        "codegen": set(),
    }
    final_ids = set()
    for name, nid in nodes:
        final_ids.add(nid)
        blk = blocks.get(nid, "")
        # tree names may carry arguments ("BroadcastHashJoin Inner
        # BuildRight", "SortMergeJoin ...") — dispatch on first token
        head = name.split()[0]
        if head == "Exchange":
            if "SinglePartition" in blk:
                out["single_part"] += 1
            else:
                out["exchanges"] += 1
        elif head in ("BroadcastHashJoin", "BroadcastNestedLoopJoin"):
            out["broadcasts"] += 1
        elif head == "Sort":
            out["sorts"] += 1
        elif name.startswith("Scan parquet"):
            cols = re.search(r"Output \[(\d+)\]", blk)
            out["scans"].append(int(cols.group(1)) if cols else -1)
            pf = re.search(r"PushedFilters: \[([^\]\n]*)", blk)
            if pf and pf.group(1).strip():
                out["pushed"].append(pf.group(1).rstrip("]"))
    # codegen ids only annotate final-plan nodes, so details-wide scan
    # is safe — but restrict to final ids anyway for non-AQE plans
    for nid in final_ids:
        for cg in re.findall(r"\[codegen id : (\d+)\]", blocks.get(nid, "")):
            out["codegen"].add(cg)
    return out


def audit_executions(store, after_id: int) -> tuple[dict, int]:
    """Aggregate parse_execution over every execution with id >
    *after_id*; returns (aggregate, new max id)."""
    agg = {
        "execs": 0,
        "exchanges": 0,
        "single_part": 0,
        "broadcasts": 0,
        "sorts": 0,
        "codegen": 0,
        "scans": [],
        "pushed": [],
    }
    max_id = after_id
    execs = store.executionsList()
    for i in range(execs.size()):
        e = execs.apply(i)
        eid = e.executionId()
        if eid <= after_id:
            continue
        max_id = max(max_id, eid)
        one = parse_execution(str(e.physicalPlanDescription()))
        agg["execs"] += 1
        for k in ("exchanges", "single_part", "broadcasts", "sorts"):
            agg[k] += one[k]
        agg["codegen"] += len(one["codegen"])
        agg["scans"].extend(one["scans"])
        agg["pushed"].extend(one["pushed"])
    return agg, max_id


def _max_exec_id(store) -> int:
    execs = store.executionsList()
    n = execs.size()
    return execs.apply(n - 1).executionId() if n else -1


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    store = spark._jsparkSession.sharedState().statusStore()
    lines = [
        "# PLANS — physical-plan audit of every registered query",
        "",
        f"Generated by `tools/audit_plans.py` at `{sf_dir}`. Per query,",
        "aggregated across EVERY SQL execution the query triggers",
        "(localCheckpoint materializations and iterative operators'",
        "internal actions included — each holds the full pre-checkpoint",
        "plan, so lineage truncation cannot hide a shuffle): shuffle",
        "exchange count (hash/range; single-partition exchanges counted",
        "separately), broadcast joins, sorts, distinct WholeStageCodegen",
        "spans, per-scan column pruning (columns read) and non-empty",
        "pushed filters.",
        "",
        "Plans are captured AFTER driving each query to completion",
        "(`collect()`), so AdaptiveSparkPlan is final: counts are the",
        "post-AQE executed plan, including runtime coalescing and any",
        "AQE join re-planning — not the static estimate.",
        "",
        "| query | execs | shuffles | 1-part exch | bcast joins | sorts | codegen spans | scans (cols read) | pushed filters |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    last_id = _max_exec_id(store)
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        df.collect()  # drive to completion so AQE finalizes the plan
        a, last_id = audit_executions(store, last_id)
        scan_desc = "; ".join(f"{c} cols" for c in a["scans"][:12])
        if len(a["scans"]) > 12:
            scan_desc += f"; +{len(a['scans']) - 12} more"
        pushed = "; ".join(dict.fromkeys(p for p in a["pushed"] if p))[:60] or "—"
        lines.append(
            f"| {name} | {a['execs']} | {a['exchanges']} | {a['single_part']} "
            f"| {a['broadcasts']} | {a['sorts']} | {a['codegen']} "
            f"| {scan_desc or '—'} | {pushed} |"
        )
        print(
            f"# {name}: execs={a['execs']} shuffles={a['exchanges']} "
            f"scans={len(a['scans'])}",
            file=sys.stderr,
        )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(entrymod.queries())} queries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
