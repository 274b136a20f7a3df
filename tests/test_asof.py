"""As-of join semantics: exact-ts inclusion, no-prior-match nulls,
atomic struct matching (no cross-row field stitching), tolerance, and the
one-shuffle plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from fts_errors_clustering_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, "k1", _ts("2024-01-01T10:00")),   # between r1 and r2
         (2, "k1", _ts("2024-01-01T12:00")),   # exactly r2's ts -> match r2
         (3, "k1", _ts("2024-01-01T00:00")),   # before all right rows -> null
         (4, "k2", _ts("2024-01-01T23:00"))],  # key with no right rows
        "event_id long, k string, ts timestamp")
    right = spark.createDataFrame(
        [("k1", _ts("2024-01-01T09:00"), 100, None),
         ("k1", _ts("2024-01-01T12:00"), 200, "b")],
        "k string, rts timestamp, val long, tag string")
    return left, right


def test_asof_backward_semantics(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")
    got = {r.event_id: (r.val, r.tag) for r in out.collect()}
    assert out.count() == 4                      # left join: all left rows
    assert got[1] == (100, None)                 # most recent prior
    assert got[2] == (200, "b")                  # equal ts matches (>= semantics)
    assert got[3] == (None, None)                # nothing prior
    assert got[4] == (None, None)                # key absent on right


def test_asof_null_payload_not_stitched(frames):
    """Row 1 matches the 09:00 right row whose tag is NULL; a naive
    per-column last(ignorenulls) would steal tag from another row — the
    struct match must keep (100, NULL) atomic."""
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts")
    r1 = out.where("event_id = 1").collect()[0]
    assert (r1.val, r1.tag) == (100, None)


def test_asof_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    tolerance=F.expr("INTERVAL 30 MINUTES"))
    got = {r.event_id: r.val for r in out.collect()}
    assert got[1] is None        # 1h gap > 30min tolerance
    assert got[2] == 200         # 0 gap


def test_asof_single_shuffle_plan(frames):
    left, right = frames
    plan = asof_join(left, right, on=["k"], left_ts="ts",
                     right_ts="rts")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_asof_forward_semantics(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    direction="forward")
    got = {r.event_id: (r.val, r.tag) for r in out.collect()}
    assert out.count() == 4
    assert got[1] == (200, "b")   # earliest following (12:00)
    assert got[2] == (200, "b")   # equal ts matches (<= semantics)
    assert got[3] == (100, None)  # first right row at 09:00
    assert got[4] == (None, None)


def test_asof_forward_tolerance(frames):
    left, right = frames
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    direction="forward",
                    tolerance=F.expr("INTERVAL 90 MINUTES"))
    got = {r.event_id: r.val for r in out.collect()}
    assert got[1] is None   # next is 2h ahead > 90min
    assert got[2] == 200    # 0 gap
    assert got[3] is None   # 9h ahead


def test_scd2_intervals_tile_each_user_timeline(spark):
    """SCD-2 build: per user, exactly one current row; intervals are
    half-open, non-overlapping, and chain end-to-start in order."""
    from fts_errors_clustering_spark.plans.registry import all_queries
    from .conftest import SF_SMALL

    rows = all_queries()["scd2_user_intervals"].fn(spark, SF_SMALL).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, vs in by_user.items():
        vs.sort(key=lambda r: (r.valid_from, r.event_id))
        assert sum(1 for r in vs if r.is_current) == 1
        assert vs[-1].is_current and vs[-1].valid_to is None
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, uid
