"""CLI front door: list/run/explain against the shared fixture session."""

from __future__ import annotations

import io
import json

from fts_errors_clustering_spark.cli import main

from .conftest import SF_SMALL


def test_cli_list_filters_by_tag(spark):
    buf = io.StringIO()
    assert main(["list", "--tag", "dedup"], spark=spark, out=buf) == 0
    lines = buf.getvalue().strip().splitlines()
    assert lines and all("dedup" in ln for ln in lines)
    names = {ln.split("\t")[0] for ln in lines}
    assert "dedup_exact" in names


def test_cli_run_prints_json_rows(spark):
    buf = io.StringIO()
    rc = main(["run", "event_type_counts", "--sf-dir", SF_SMALL,
               "--limit", "3"], spark=spark, out=buf)
    assert rc == 0
    rows = [json.loads(ln) for ln in buf.getvalue().strip().splitlines()]
    assert 0 < len(rows) <= 3
    assert set(rows[0]) == {"event_type", "n"}


def test_cli_explain_prints_plan_without_running(spark):
    buf = io.StringIO()
    rc = main(["run", "revenue_by_region", "--sf-dir", SF_SMALL,
               "--explain"], spark=spark, out=buf)
    assert rc == 0
    assert "AdaptiveSparkPlan" in buf.getvalue() or \
        "Exchange" in buf.getvalue()


def test_cli_unknown_query_is_an_error(spark):
    assert main(["run", "no_such_query"], spark=spark) == 2


def test_cli_check_matches_oracle(spark):
    for q in ["event_type_counts", "pricing_summary", "time_rollup_revenue"]:
        buf = io.StringIO()
        rc = main(["run", q, "--sf-dir", SF_SMALL, "--check"],
                  spark=spark, out=buf)
        got = json.loads(buf.getvalue())
        assert rc == 0 and got["match"] is True, (q, got)
        assert got["spark_rows"] == got["oracle_rows"] > 0


def test_cli_check_on_rows_only_query_warns_and_runs(spark):
    buf = io.StringIO()
    rc = main(["run", "sample_events", "--sf-dir", SF_SMALL, "--check",
               "--limit", "2"], spark=spark, out=buf)
    assert rc == 0
    assert buf.getvalue().strip()  # fell through to printing rows


def test_cli_check_sweep_subset(spark):
    buf = io.StringIO()
    rc = main(["check", "--sf-dir", SF_SMALL,
               "--queries", "event_type_counts,pricing_summary,nope"],
              spark=spark, out=buf)
    lines = [json.loads(ln) for ln in buf.getvalue().strip().splitlines()]
    summary = lines[-1]
    assert rc == 1                       # 'nope' fails the sweep
    assert summary["checked"] == 3
    assert summary["failed"] == ["nope"]
    per = {d["query"]: d for d in lines[:-1]}
    assert per["event_type_counts"]["match"] is True
    assert per["pricing_summary"]["match"] is True
