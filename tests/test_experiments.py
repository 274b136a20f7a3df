"""Independent math checks for the experimentation family (windows.py A/B
readouts). The DuckDB oracles pin CROSS-ENGINE parity; these tests pin the
STATISTICS themselves against a from-scratch pandas/numpy reference, so an
error shared by both the Spark expression and its SQL twin (same wrong
formula in both) cannot hide."""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from fts_errors_clustering_spark.plans.registry import all_queries

from .conftest import SF_SMALL, duck_for


def _variant(user_id: int) -> str:
    h = int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16)
    return "A" if h % 2 == 0 else "B"


def test_ranksum_matches_pandas_reference(spark, duck):
    """ab_test_ranksum == a textbook Mann-Whitney (average ranks, tie
    correction) computed by pandas.rank on the same per-user sums."""
    row = (all_queries()["ab_test_ranksum"].fn(spark, SF_SMALL)
           .collect()[0].asDict())

    pu = duck_for(duck, SF_SMALL).execute(
        "SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS x "
        "FROM events WHERE value IS NOT NULL GROUP BY 1").df()
    pu["variant"] = pu["user_id"].map(_variant)
    pu["x"] = pu["x"].astype(float)
    ranks = pu["x"].rank(method="average")
    n_a = int((pu["variant"] == "A").sum())
    n_b = int((pu["variant"] == "B").sum())
    n = n_a + n_b
    r_a = float(ranks[pu["variant"] == "A"].sum())
    u_a = r_a - n_a * (n_a + 1) / 2.0
    tie = int(sum(t ** 3 - t for t in pu["x"].value_counts()))
    var = n_a * n_b / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2.0) / math.sqrt(var)
    rb = 2.0 * u_a / (n_a * n_b) - 1.0

    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert row["tie_term"] == tie
    assert row["u_a"] == u_a
    assert abs(row["z_score"] - z) < 1e-6
    assert abs(row["rank_biserial"] - rb) < 1e-6
    # the fixture must actually exercise the interesting paths
    assert n_a > 0 and n_b > 0 and row["z_score"] != 0.0


def test_lift_matches_pandas_reference(spark, duck):
    """ab_test_lift's pooled two-proportion z == the textbook formula on
    independently-derived conversion counts."""
    row = (all_queries()["ab_test_lift"].fn(spark, SF_SMALL)
           .collect()[0].asDict())

    ev = duck_for(duck, SF_SMALL).execute(
        "SELECT user_id, event_type, ts FROM events").df()
    t0 = (ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
          .rename("t0"))
    j = ev.join(t0, on="user_id", how="inner")
    conv = ((j.event_type == "purchase") & (j.ts > j.t0)
            & (j.ts <= j.t0 + pd.Timedelta(hours=24)))
    per_user = conv.groupby(j.user_id).max()
    variants = per_user.index.to_series().map(_variant)
    n_a = int((variants == "A").sum())
    n_b = int((variants == "B").sum())
    c_a = int(per_user[variants == "A"].sum())
    c_b = int(per_user[variants == "B"].sum())
    assert (row["n_a"], row["conv_a"], row["n_b"], row["conv_b"]) == \
        (n_a, c_a, n_b, c_b)
    p = (c_a + c_b) / (n_a + n_b)
    if 0.0 < p < 1.0:
        z = ((c_b / n_b - c_a / n_a)
             / math.sqrt(p * (1 - p) * (1 / n_a + 1 / n_b)))
        assert abs(row["z_score"] - z) < 1e-6
    else:
        assert row["z_score"] == 0.0


def test_logrank_matches_pandas_reference(spark, duck):
    """ab_test_logrank == the textbook Mantel-Cox statistic computed
    from scratch on independently-derived (duration, event, arm) rows —
    allowing only the documented 1e-6 per-term quantization."""
    row = (all_queries()["ab_test_logrank"].fn(spark, SF_SMALL)
           .collect()[0].asDict())

    d = duck_for(duck, SF_SMALL).execute("""
        WITH t0 AS (
          SELECT user_id, MIN(ts) AS t0 FROM events
          WHERE event_type = 'view' GROUP BY 1
        ),
        ev AS (
          SELECT f.user_id, MIN(e.ts) AS t_ev
          FROM t0 f JOIN events e ON e.user_id = f.user_id
           AND e.event_type = 'purchase' AND e.ts > f.t0
           AND e.ts <= f.t0 + INTERVAL 24 HOUR GROUP BY 1
        )
        SELECT f.user_id,
               CASE WHEN ev.t_ev IS NULL
                    THEN LEAST(86400000000,
                               epoch_us((SELECT MAX(ts) FROM events))
                                 - epoch_us(f.t0))
                    ELSE epoch_us(ev.t_ev) - epoch_us(f.t0) END AS t_us,
               CASE WHEN ev.t_ev IS NULL THEN 0 ELSE 1 END AS is_event
        FROM t0 f LEFT JOIN ev ON ev.user_id = f.user_id
    """).df()
    d["in_a"] = d["user_id"].map(lambda u: _variant(u) == "A")
    n, n_a = len(d), int(d["in_a"].sum())
    o_a = e_a = v_a = 0.0
    for t in sorted(d.loc[d.is_event == 1, "t_us"].unique()):
        at_risk = d[d.t_us >= t]
        nj, naj = len(at_risk), int(at_risk["in_a"].sum())
        evs = d[(d.t_us == t) & (d.is_event == 1)]
        dj, daj = len(evs), int(evs["in_a"].sum())
        o_a += daj
        e_a += dj * naj / nj
        if nj > 1:
            v_a += (dj * naj / nj) * ((nj - naj) / nj) * ((nj - dj) / (nj - 1))
    z = (o_a - e_a) / math.sqrt(v_a) if v_a > 0 else 0.0

    assert (row["n_a"], row["n_b"]) == (n_a, n - n_a)
    assert row["o_a"] == o_a
    # per-term 1e-6 quantization: curve has <= |users| event terms, so the
    # accumulated quantization error is bounded by n * 5e-7
    assert abs(row["e_a"] - e_a) <= len(d) * 5e-7 + 1e-9
    assert abs(row["v_a"] - v_a) <= len(d) * 5e-7 + 1e-9
    assert abs(row["z_score"] - z) < 1e-3
    srm = (n_a - (n - n_a)) ** 2 / n
    assert abs(row["srm_chi2"] - srm) < 1e-6
    # the fixture must exercise real censoring and both arms
    assert 0 < int(d.is_event.sum()) < n and 0 < n_a < n
