"""Dump `.explain("formatted")` for named queries into plans/r10/.

Usage: python scripts/dump_plans.py <suffix> <query> [<query> ...]

Writes plans/r10/<query>_<suffix>.txt for each query (suffix = before/after).
Queries run at sf0.001 (plan SHAPE is scale-invariant up to AQE thresholds —
the same convention as scripts/plan_report.py). Queries that materialize a
bounded result internally (graph.materialize_release) return a LocalRelation;
for those the INTERNAL pre-collect plan is captured via a monkeypatch around
materialize_release so the file shows the plan that actually computes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fts_errors_clustering_spark.plans.registry import all_queries, \
    release_consumer_caches
from fts_errors_clustering_spark.session import get_spark

SF = "/root/testdata/sf0.001"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"))


def _explain(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    defs = all_queries()

    # capture internal bounded-result plans: materialize_release collects
    # the final plan while caches are hot, so the RETURNED frame is a
    # LocalRelation — grab the pre-collect plan here instead
    import fts_errors_clustering_spark.operators.graph as G
    captured: list[str] = []
    orig = G.materialize_release

    def patched(df, caches):
        df.collect()  # run first so AQE's FINAL plan prints
        captured.append(_explain(df))
        return orig(df, caches)

    G.materialize_release = patched
    try:
        for name in names:
            captured.clear()
            df = defs[name].fn(spark, SF)
            df.collect()
            parts = [f"== {name} ({suffix}, sf0.001) ==", ""]
            returned = _explain(df)
            if captured:
                for i, p in enumerate(captured):
                    parts += [f"-- internal materialized plan {i + 1} "
                              f"(pre-collect, via materialize_release) --",
                              p.rstrip(), ""]
                if "LocalTableScan" not in returned and \
                        "LocalRelation" not in returned:
                    parts += ["-- returned plan --", returned.rstrip(), ""]
                else:
                    parts += ["-- returned plan: LocalRelation of the "
                              "materialized rows (omitted) --", ""]
            else:
                parts += [returned.rstrip(), ""]
            path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write("\n".join(parts))
            release_consumer_caches(name)
            print(f"wrote {path}")
    finally:
        G.materialize_release = orig


if __name__ == "__main__":
    main()
