"""Generate PLANS.md: the formatted physical plan of each flagship query
with the scale-relevant facts extracted (pushed filters, read schema,
join strategies, exchange count, codegen span count).

The exchange-budget regression gate lives in tests/test_plans.py; this
report is the human-readable companion — what the plans LOOK like, so a
reviewer can check the claims (filters reach the scan, dims broadcast,
no SinglePartition on data-sized tables) without running Spark.

Run: python scripts/plan_report.py  (writes /root/repo/PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fts_errors_clustering_spark.plans.registry import all_queries
from fts_errors_clustering_spark.session import get_spark

SF = "/root/testdata/sf0.001"

#: flagship set: one per family, each plan annotated with why it is the
#: plan you'd want at 100 TB
SHOW = [
    ("flagship_top_error_users",
     "filter -> partial agg -> top-N; the error filter reaches the scan"),
    ("local_supplier_revenue",
     "TPC-H Q5: every dim side BroadcastHashJoin, ONE fact shuffle"),
    ("shipping_priority_topk",
     "TPC-H Q3: pushed date predicates, TakeOrderedAndProject top-10"),
    ("latest_event_per_user",
     "CDC compaction: exactly one hash exchange, one window pass"),
    ("global_value_rank",
     "two-phase global rank: NO SinglePartition exchange anywhere"),
    ("minhash_near_dups",
     "LSH: signature/band shuffles are doc_id+ints, never text bodies"),
    ("bm25_search",
     "query-term-pruned postings: the IN-list reaches the token scan"),
    ("events_asof_latest_order",
     "as-of join as union+window: ONE shuffle, no range explosion"),
    ("skew_join_segments",
     "salted big-big join: salt visible in BOTH SortMergeJoin key lists"),
    ("packed_sequences",
     "sequence packing on bucket prefix-sums, no global sort"),
    ("pareto_frontier_parts",
     "2-D skyline via two-phase prefix max: no global sort, no quadratic "
     "dominance join; threshold side is one row per distinct price"),
    ("user_funnel_conversion",
     "ordered funnel: three dictionary-pruned event_type scans to "
     "user-sized step aggregates; O(1) driver materialization, so the "
     "RETURNED plan is a 3-row local relation (facts below reflect that)"),
    ("last_touch_attribution",
     "attribution: ONE user-keyed window exchange (sortable-key running "
     "max enforces strict-before in-frame), bounded type-level agg, "
     "O(types) total window — no event self-join, single event scan"),
    ("ab_test_lift",
     "A/B readout: one user-keyed window exchange, per-user groupBy "
     "REUSES the window partitioning (no second user shuffle), 1-row "
     "final aggregate; variants derive from the key itself"),
    ("nelson_aalen_hazard",
     "survival curve: one user-keyed window exchange + broadcast 1-row "
     "censor time; the at-risk prefix AND the integer micro-hazard "
     "cumulative sum run the two-phase bucket composition (within-bucket "
     "windows + literal-map offsets) — NO single-partition window over "
     "the user-cardinality duration table (r10 rework)"),
    ("ab_test_ranksum",
     "Mann-Whitney: one user-keyed decimal-sum exchange, distinct-value "
     "collapse, WITHIN-bucket prefix-rank window (global_value_rank "
     "composition, no single-partition rank scan), 1-row moment "
     "aggregate from four integers"),
    ("ab_test_logrank",
     "log-rank: the hazard's user window + 24h-bounded conversion, both "
     "at-risk prefix processes from ONE shared bucket-offsets collect "
     "(bucket_prefix_offsets_multi), censor/arm totals broadcast 1-row "
     "aggregates, 1-row O/E/V final — no single-partition duration sort"),
]


def facts(plan: str, simple: str) -> list[str]:
    out = []
    n_ex = plan.count("Exchange")
    out.append(f"- physical `Exchange` mentions: {n_ex} "
               f"(tree+detail; see tests/test_plans.py budgets)")
    import re as _re
    spans = len(set(_re.findall(r"\*\((\d+)\)", simple)))
    out.append(f"- whole-stage-codegen spans (simple-mode `*(n)`): {spans}")
    for strat in ("BroadcastHashJoin", "SortMergeJoin",
                  "BroadcastNestedLoopJoin", "CartesianProduct"):
        c = plan.count(strat)
        if c:
            out.append(f"- `{strat}`: {c}")
    if "SinglePartition" in plan:
        out.append("- `SinglePartition`: PRESENT (1-row scalar aggregate "
                   "unless noted — data-sized single partitions are a bug)")
    pushed = sorted(set(re.findall(r"PushedFilters: \[([^\]]*)\]", plan)))
    pushed = [p for p in pushed if p.strip()]
    if pushed:
        out.append(f"- pushed filters: `{'; '.join(pushed)[:300]}`")
    reads = sorted(set(re.findall(r"ReadSchema: struct<([^>]*)>", plan)))
    if reads:
        cols = {c.split(":")[0] for r in reads for c in r.split(",") if c}
        out.append(f"- columns read across scans (pruned): "
                   f"`{', '.join(sorted(cols))[:300]}`")
    return out


def main() -> None:
    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    defs = all_queries()
    lines = [
        "# PLANS — flagship physical plans, annotated",
        "",
        "Generated by `scripts/plan_report.py` at sf0.001 (plan SHAPE is",
        "scale-invariant up to AQE thresholds; budgets are pinned in",
        "`tests/test_plans.py`). Each entry: the claim, the extracted",
        "facts, then the formatted plan.",
        "",
    ]
    for name, claim in SHOW:
        df = defs[name].fn(spark, SF)
        df.collect()  # execute THIS plan so AQE's FINAL plan (codegen ids) prints
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        simple = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple")
        lines += [f"## {name}", "", f"**Claim:** {claim}", ""]
        lines += facts(plan, simple)
        lines += ["", "```", plan.rstrip(), "```", ""]
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(lines)} lines)")


if __name__ == "__main__":
    main()
