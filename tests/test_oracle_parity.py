"""The t2 gate, locally: every registered query with an oracle must match
DuckDB exactly at sf0.001 (fast loop) — mirroring the driver's comparison
at sf0.01. Queries without an oracle are smoke-checked (runs, sane schema).
"""

from __future__ import annotations

import pytest

from fts_errors_clustering_spark.plans.registry import all_queries

from .conftest import SF_SMALL, duck_for, oracle_compare

_DEFS = all_queries()

def _persist_ids(spark):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


@pytest.mark.parametrize("name", sorted(_DEFS))
def test_query_matches_oracle(spark, duck, name):
    from fts_errors_clustering_spark.plans.registry import \
        release_consumer_caches
    qd = _DEFS[name]
    pinned_before = _persist_ids(spark)
    df = qd.fn(spark, SF_SMALL)
    # local_oracle: harness-only SQL (may use the Python UDFs conftest
    # registers, e.g. seqratio) — a full parity check here even though the
    # driver records the query rows-only
    sql = qd.oracle or qd.local_oracle
    if sql is None:
        rows = df.limit(1000).collect()
        assert rows is not None and len(df.columns) > 0
    else:
        oracle_compare(df, duck_for(duck, SF_SMALL), sql, name=name)
    # registry-wide cache hygiene (generalizes the graph-family gate): a
    # query either releases its caches itself (bounded outputs via
    # materialize_release, loop rounds as each is superseded) or registers
    # them for consumer-acknowledged release (registry.retain_for_consumer,
    # for multi-referenced lineage the returned plan still needs). After
    # this consumer acknowledges, the persistent-RDD map must be exactly
    # as found — any remainder is an UNREGISTERED retention, the
    # long-lived-session leak class.
    release_consumer_caches()
    leaked = _persist_ids(spark) - pinned_before
    assert not leaked, f"{name} leaked persistent RDD ids {leaked}"


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


def test_streaming_twins_share_batch_oracles():
    """The promoted streaming twins' driver oracles are DEFINED to be
    their batch counterpart's SQL (the batch==stream equality gates are
    the bridging proof). If someone edits one side's oracle without the
    other, the shared-oracle argument silently breaks — pin identity."""
    defs = all_queries()
    for twin, batch in [
        ("streaming_funnel_tail", "user_funnel_conversion"),
        ("streaming_cusum_tail", "hourly_cusum_changepoint"),
        ("streaming_interarrival_tail", "user_interarrival_stats"),
        ("streaming_hq_rollup_tail", "histogram_quantile_rollup"),
        ("streaming_tumbling_hourly", "tumbling_hourly_by_type"),
        ("streaming_upsert_compaction", "latest_event_per_user"),
    ]:
        assert defs[twin].oracle == defs[batch].oracle, (twin, batch)
    # the interval-join twin's oracle is the INNER restriction, not a
    # verbatim copy — assert the structural relation instead
    ij = defs["streaming_interval_join"].oracle
    assert "JOIN events e2" in ij and "LEFT JOIN" not in ij
