"""Command-line front door: run any registered query by name.

The reference engine is driven from notebooks; this repo's equivalent of
"open the notebook and run the cell" is::

    python -m fts_errors_clustering_spark list [--tag dedup]
    python -m fts_errors_clustering_spark run event_type_counts \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m fts_errors_clustering_spark run revenue_by_region --explain

``run`` prints one JSON object per row (stable field order = output schema
order), so results pipe into jq/DuckDB; ``--explain`` prints the formatted
physical plan instead of executing. The session comes from
:func:`fts_errors_clustering_spark.session.get_spark` unless the caller
passes one in (tests inject the shared fixture session to avoid a second
JVM).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .plans.registry import all_queries

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="fts_errors_clustering_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registered queries")
    ls.add_argument("--tag", help="filter by tag substring")

    run = sub.add_parser("run", help="run one query, print JSON rows")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    run.add_argument("--limit", type=int, default=100,
                     help="max rows printed (collect cap; 0 = no cap)")
    run.add_argument("--explain", action="store_true",
                     help="print the formatted physical plan, don't execute")
    return p


def main(argv: list[str] | None = None, spark=None,
         out=None) -> int:
    args = _build_parser().parse_args(argv)
    out = out or sys.stdout
    defs = all_queries()

    if args.cmd == "list":
        for name, d in defs.items():
            if args.tag and not any(args.tag in t for t in d.tags):
                continue
            check = "oracle" if d.oracle else "rows"
            print(f"{name}\t{check}\t{','.join(d.tags)}", file=out)
        return 0

    if args.query not in defs:
        print(f"unknown query: {args.query} (try `list`)", file=sys.stderr)
        return 2

    if spark is None:
        from .session import get_spark
        spark = get_spark("fts-cli")
    df = defs[args.query].fn(spark, args.sf_dir)

    if args.explain:
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        print(plan, file=out)
        return 0

    rows = df.limit(args.limit).collect() if args.limit else df.collect()
    cols = df.columns
    for r in rows:
        print(json.dumps({c: r[i] for i, c in enumerate(cols)},
                         default=str), file=out)
    return 0


if __name__ == "__main__":  # pragma: no cover — exercised via __main__
    raise SystemExit(main())
