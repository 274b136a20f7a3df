"""The t2 gate, locally: every registered query with an oracle must match
DuckDB exactly at sf0.001 (fast loop) — mirroring the driver's comparison
at sf0.01. Queries without an oracle are smoke-checked (runs, sane schema).
"""

from __future__ import annotations

import pytest

from fts_errors_clustering_spark.plans.registry import all_queries

from .conftest import SF_SMALL, duck_for, oracle_compare

_DEFS = all_queries()


@pytest.mark.parametrize("name", sorted(_DEFS))
def test_query_matches_oracle(spark, duck, name):
    qd = _DEFS[name]
    df = qd.fn(spark, SF_SMALL)
    if qd.oracle is None:
        rows = df.limit(1000).collect()
        assert rows is not None and len(df.columns) > 0
        return
    oracle_compare(df, duck_for(duck, SF_SMALL), qd.oracle, name=name)


def test_entry_contract(spark):
    import __spark_entry__ as e
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert "flagship_top_error_users" in q


def test_registry_head_within_driver_budget():
    """Names pinned in registry._HEAD must exist and sit inside the driver's
    ~50-entry verification window (dict order is the driver's check order)."""
    from fts_errors_clustering_spark.plans import registry
    names = list(all_queries())
    for hn in registry._HEAD:
        assert names.index(hn) < 50, f"{hn} fell out of the driver budget"


def test_approx_bounds(spark):
    """HLL++/t-digest sketches must land within their configured error of
    the exact aggregates (approx_distinct_and_quantiles)."""
    from fts_errors_clustering_spark.plans.registry import all_queries
    r = (all_queries()["approx_distinct_and_quantiles"]
         .fn(spark, SF_SMALL).first())
    assert abs(r.approx_users - r.exact_users) / max(r.exact_users, 1) <= 0.05
    assert abs(r.approx_median - r.exact_median) / max(abs(r.exact_median), 1e-9) <= 0.05
