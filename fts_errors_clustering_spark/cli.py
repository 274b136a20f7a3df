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
    run.add_argument("--check", action="store_true",
                     help="also run the query's DuckDB oracle on the same "
                          "parquet tables and report match/mismatch")

    chk = sub.add_parser(
        "check", help="oracle-verify many queries (default: every "
                      "oracle-backed one); exit 0 only if all match")
    chk.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    chk.add_argument("--queries",
                     help="comma-separated subset (default: all oracle-backed)")
    chk.add_argument("--tag", help="filter by tag substring")
    return p


_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "events", "documents", "embeddings")


def _oracle_rows(sql: str, sf_dir: str):
    import duckdb
    con = duckdb.connect()
    for t in _TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    res = con.execute(sql)
    return [d[0] for d in res.description], res.fetchall()


def _canon(cols, rows):
    """Order-insensitive canonical form mirroring the driver compare:
    columns sorted by lowercase name, rows sorted with a null-safe key,
    Decimals/datetimes normalized."""
    import datetime as dt
    import decimal
    import math

    def norm(v):
        if isinstance(v, decimal.Decimal):
            v = float(v)
        if isinstance(v, float) and math.isnan(v):
            return (True, "NaN")  # sorts with the null block: str key, so
            # NaN never meets a float in a comparison
        if isinstance(v, dt.datetime):
            return (False, v.replace(tzinfo=None).isoformat())
        if isinstance(v, (list, tuple)):
            return (False, tuple(norm(x) for x in v))
        return (v is None, v if v is not None else "")
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return (sorted(c.lower() for c in cols),
            sorted(tuple(norm(r[i]) for i in order) for r in rows))


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

    if args.cmd == "check":
        if spark is None:
            from .session import get_spark
            spark = get_spark("fts-cli")
        names = (args.queries.split(",") if args.queries
                 else [n for n, d in defs.items() if d.oracle])
        fails = []
        for name in names:
            d = defs.get(name)
            if d is None or not d.oracle:
                fails.append(name)
                print(json.dumps({"query": name, "match": False,
                                  "error": "unknown or rows-only"}), file=out)
                continue
            if args.tag and not any(args.tag in t for t in d.tags):
                continue
            try:
                df = d.fn(spark, args.sf_dir)
                scols, srows = df.columns, df.collect()
                # this sweep is the consumer: acknowledge per query so a
                # full-registry run doesn't accumulate scoped caches
                from .plans.registry import release_consumer_caches
                release_consumer_caches()
                dcols, drows = _oracle_rows(d.oracle, args.sf_dir)
                ok = _canon(scols, srows) == _canon(dcols, drows)
            except Exception as ex:  # noqa: BLE001 — keep sweeping, report
                ok = False
                print(json.dumps({"query": name, "match": False,
                                  "error": f"{type(ex).__name__}: {ex}"[:200]}),
                      file=out)
                fails.append(name)
                continue
            print(json.dumps({"query": name, "rows": len(srows),
                              "match": ok}), file=out)
            if not ok:
                fails.append(name)
        print(json.dumps({"checked": len(names), "failed": fails}), file=out)
        return 0 if not fails else 1

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

    if args.check:
        sql = defs[args.query].oracle
        if not sql:
            print(f"{args.query}: rows-only query (no oracle registered); "
                  "running without --check", file=sys.stderr)
        else:
            scols, srows = df.columns, df.collect()
            dcols, drows = _oracle_rows(sql, args.sf_dir)
            ok = _canon(scols, srows) == _canon(dcols, drows)
            print(json.dumps({"query": args.query, "sf_dir": args.sf_dir,
                              "spark_rows": len(srows),
                              "oracle_rows": len(drows),
                              "match": ok}), file=out)
            return 0 if ok else 1

    rows = df.limit(args.limit).collect() if args.limit else df.collect()
    cols = df.columns
    for r in rows:
        print(json.dumps({c: r[i] for i, c in enumerate(cols)},
                         default=str), file=out)
    return 0


if __name__ == "__main__":  # pragma: no cover — exercised via __main__
    raise SystemExit(main())
