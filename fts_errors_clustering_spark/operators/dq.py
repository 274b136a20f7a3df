"""Declarative data-quality checks — the Deequ/expectations pattern as one
oracle-checkable report: every ingest of the reference's daily batches
(SURVEY.md section 3.1) would gate on exactly these before publishing a
partition, and the reference's own defect list (SURVEY.md section 2.9:
row-count drift, blank messages discovered late) is what happens without
them.

Each check is an aggregate over one table; the report unions the check
rows (check name, measured metric, threshold, pass verdict). All metrics
are exact ratios of integer counts — bit-identical across engines.

Scale: every check is a map-side-combinable aggregate or a digest-keyed
distinct; the report is a UNION of 1-row aggregates — one scan per table
feeding multiple checks via a shared aggregate where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.readers import table


@register(
    "data_quality_report",
    oracle="""
    WITH ev AS (
      SELECT COUNT(*) AS n,
             COUNT(DISTINCT event_id) AS n_ids,
             COUNT(*) - COUNT(value) AS n_null_value,
             COUNT(*) FILTER (WHERE ts < TIMESTAMP '2000-01-01'
                              OR ts > TIMESTAMP '2100-01-01') AS n_bad_ts
      FROM events
    ),
    refint AS (
      SELECT COUNT(*) AS n_orphans FROM (
        SELECT DISTINCT e.user_id FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        WHERE c.c_custkey IS NULL
      )
    ),
    docs AS (
      SELECT COUNT(*) AS n,
             COUNT(*) FILTER (WHERE length(trim(text)) = 0) AS n_blank
      FROM documents
    )
    SELECT 'events_id_unique' AS check_name,
           CAST(n_ids AS DOUBLE) / GREATEST(n, 1) AS metric, 1.0 AS threshold,
           n_ids = n AS passed
    FROM ev
    UNION ALL
    SELECT 'events_value_null_ratio',
           CAST(n_null_value AS DOUBLE) / GREATEST(n, 1), 0.5,
           CAST(n_null_value AS DOUBLE) / GREATEST(n, 1) <= 0.5 FROM ev
    UNION ALL
    SELECT 'events_ts_in_range', CAST(n_bad_ts AS DOUBLE), 0.0,
           n_bad_ts = 0 FROM ev
    UNION ALL
    SELECT 'events_user_refint_orphans', CAST(n_orphans AS DOUBLE), 0.0,
           n_orphans = 0 FROM refint
    UNION ALL
    SELECT 'documents_blank_ratio',
           CAST(n_blank AS DOUBLE) / GREATEST(n, 1), 0.1,
           CAST(n_blank AS DOUBLE) / GREATEST(n, 1) <= 0.1 FROM docs
    """,
    tags=("dq", "relational"),
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publish gate: id uniqueness, null-ratio bound, timestamp range,
    user→customer referential integrity (orphan count), blank-document
    ratio — one row per check with the measured metric and verdict."""
    ev = table(spark, sf_dir, "events")
    docs = table(spark, sf_dir, "documents")
    cust = table(spark, sf_dir, "customer").select("c_custkey")

    e = ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        (F.count("*") - F.count("value")).alias("n_null_value"),
        F.count(F.when((F.col("ts") < F.lit("2000-01-01").cast("timestamp")) |
                       (F.col("ts") > F.lit("2100-01-01").cast("timestamp")),
                       1)).alias("n_bad_ts")).cache()
    orphans = (ev.select("user_id").distinct()
               .join(cust, ev.user_id == cust.c_custkey, "left_anti")
               .agg(F.count("*").alias("n_orphans")))
    d = docs.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.length(F.trim("text")) == 0, 1)).alias("n_blank"))

    def row(src, name, metric, threshold, passed):
        return src.select(F.lit(name).alias("check_name"),
                          metric.alias("metric"),
                          F.lit(threshold).alias("threshold"),
                          passed.alias("passed"))

    # GREATEST(n, 1) denominators keep the ratios defined on EMPTY tables
    # (a publish gate must run on an empty partition, verdicts intact)
    nv = F.col("n_null_value").cast("double") / F.greatest(F.col("n"), F.lit(1))
    nb = F.col("n_blank").cast("double") / F.greatest(F.col("n"), F.lit(1))
    out = (
        row(e, "events_id_unique",
            F.col("n_ids").cast("double") / F.greatest(F.col("n"), F.lit(1)),
            1.0, F.col("n_ids") == F.col("n"))
        .unionByName(row(e, "events_value_null_ratio", nv, 0.5, nv <= 0.5))
        .unionByName(row(e, "events_ts_in_range",
                         F.col("n_bad_ts").cast("double"), 0.0,
                         F.col("n_bad_ts") == 0))
        .unionByName(row(orphans, "events_user_refint_orphans",
                         F.col("n_orphans").cast("double"), 0.0,
                         F.col("n_orphans") == 0))
        .unionByName(row(d, "documents_blank_ratio", nb, 0.1, nb <= 0.1)))
    # bounded (5-row) report: materialize while the shared events
    # aggregate cache is hot, then release
    from .graph import materialize_release
    return materialize_release(out, [e])


# --- round 4: generic single-pass column profiler ----------------------------

#: (column, DuckDB min/max operand SQL or None, Spark min/max operand
#: factory or None). Oracle SQL and Spark plan both derive their min/max
#: from the SAME entry, so a column can't grow an oracle expression
#: without the matching plan aggregate (or vice versa) — one source of
#: truth, no drift point. None = non-orderable column (min/max reported
#: as NULL). Null-skipping needs no flag: COUNT/COUNT(DISTINCT col)
#: skip nulls identically in both engines.
_PROFILE_COLS = (
    ("event_id", "CAST(event_id AS DOUBLE)",
     lambda: F.col("event_id").cast("double")),
    ("ts", "CAST(epoch_us(ts) AS DOUBLE)",
     lambda: F.unix_micros("ts").cast("double")),
    ("user_id", "CAST(user_id AS DOUBLE)",
     lambda: F.col("user_id").cast("double")),
    ("event_type", None, None),
    ("value", "value", lambda: F.col("value")),
    ("props", None, None),
)


# --- round 5: functional-dependency audit ------------------------------------

#: candidate FDs to audit as (table, determinant, dependent). One tuple
#: drives BOTH the oracle SQL and the Spark plan (same single-source rule
#: as _PROFILE_COLS). The set mixes a key FD that must hold (an orderkey
#: determines its status) with soft FDs the fixture violates — the audit's
#: value is the measured violation count, not a fixed verdict.
_FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_orderstatus"),
    ("part", "p_brand", "p_type"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"),
)

_FD_SQL_ONE = """
    SELECT '{t}' AS table_name,
           '{det}' AS determinant,
           '{dep}' AS dependent,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(SUM(cnt - mx) AS BIGINT) AS n_violations,
           SUM(cnt - mx) = 0 AS holds
    FROM (SELECT {det} AS det, SUM(c) AS cnt, MAX(c) AS mx
          FROM (SELECT {det}, {dep}, COUNT(*) AS c FROM {t} GROUP BY 1, 2)
          GROUP BY 1)
"""


@register(
    "fd_violation_audit",
    oracle=" UNION ALL ".join(
        _FD_SQL_ONE.format(t=t, det=det, dep=dep)
        for t, det, dep in _FD_CANDIDATES),
    tags=("dq", "fd", "profile"),
)
def fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (the Deequ `hasUniqueness`/metanome-style
    check): for each candidate FD ``det -> dep``, the minimum number of rows
    that must change for the FD to hold = sum over det-groups of
    (group size - size of the group's majority dep value). ``holds`` is the
    exact-FD verdict; a key constraint is the special case where the
    determinant is a candidate key.

    Scale: per candidate, two map-side-combinable aggregates — a
    (det, dep) count then a det-level sum/max — shuffling only distinct
    key pairs, never rows; the report UNIONs one-row results. The same
    plan shape at any table size; no window, no collect.
    """
    out = None
    for t, det, dep in _FD_CANDIDATES:
        pair = table(spark, sf_dir, t).groupBy(det, dep).count()
        grp = pair.groupBy(det).agg(F.sum("count").alias("cnt"),
                                    F.max("count").alias("mx"))
        one = (grp.agg(
                   F.count("*").cast("long").alias("n_groups"),
                   F.sum("cnt").cast("long").alias("n_rows"),
                   F.sum(F.col("cnt") - F.col("mx")).cast("long")
                    .alias("n_violations"))
               .select(F.lit(t).alias("table_name"),
                       F.lit(det).alias("determinant"),
                       F.lit(dep).alias("dependent"),
                       "n_groups", "n_rows", "n_violations",
                       (F.col("n_violations") == 0).alias("holds")))
        out = one if out is None else out.unionByName(one)
    return out


@register(
    "events_column_profile",
    oracle="SELECT * FROM (" + " UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               {f'MIN({mm})' if mm else 'CAST(NULL AS DOUBLE)'} AS min_value,
               {f'MAX({mm})' if mm else 'CAST(NULL AS DOUBLE)'} AS max_value
        FROM events
        """ for c, mm, _ in _PROFILE_COLS) + ")",
    tags=("dq", "profile"),
)
def events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiler (the `df.profile()` every exploration
    session starts with): per column — row count, null count, EXACT
    distinct count, and min/max for the orderable columns (timestamps as
    epoch-micros doubles, so the values are engine-neutral). One wide
    aggregate over one scan, unpivoted to a 6-row report.

    Scale note: the exact multi-column COUNT(DISTINCT) is the fidelity
    tier (Expand-based, one shuffle per distinct column set); at 100 TB
    swap `countDistinct` for `approx_count_distinct` — the HLL twin of
    this report is `approx_distinct_and_quantiles`, already registered."""
    ev = table(spark, sf_dir, "events")
    aggs = [F.count("*").alias("n_rows")]
    orderable = set()
    for c, _mm, mk in _PROFILE_COLS:
        aggs.append((F.count("*") - F.count(c)).cast("long")
                    .alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"dist_{c}"))
        if mk is not None:
            orderable.add(c)
            aggs.append(F.min(mk()).alias(f"min_{c}"))
            aggs.append(F.max(mk()).alias(f"max_{c}"))
    wide = ev.agg(*aggs)
    rows = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.col("n_rows").alias("n_rows"),
                 F.col(f"null_{c}").alias("n_null"),
                 F.col(f"dist_{c}").alias("n_distinct"),
                 (F.col(f"min_{c}") if c in orderable
                  else F.lit(None).cast("double")).alias("min_value"),
                 (F.col(f"max_{c}") if c in orderable
                  else F.lit(None).cast("double")).alias("max_value"))
        for c, _mm, _mk in _PROFILE_COLS]))
    return (wide.select(rows.alias("kv"))
            .select("kv.column_name", "kv.n_rows", "kv.n_null",
                    "kv.n_distinct", "kv.min_value", "kv.max_value"))


# --- round 6: privacy audit (k-anonymity / l-diversity) -----------------------

#: privacy thresholds: a quasi-identifier group smaller than K_ANON is
#: re-identifiable; a group whose sensitive attribute takes fewer than
#: L_DIV distinct values leaks it by membership alone.
K_ANON = 5
L_DIV = 3


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             COUNT(*) AS n,
             COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS ldiv
      FROM customer GROUP BY 1, 2
    )
    SELECT CAST({K_ANON} AS BIGINT) AS k,
           CAST({L_DIV} AS BIGINT) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_k_violating_groups,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           CAST(SUM(CASE WHEN ldiv < {L_DIV} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_l_violating_groups,
           ROUND(1.0 / MIN(n), 6) AS max_reident_risk
    FROM g
    """,
    tags=("dq", "privacy", "audit"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before a table feeds a training corpus: k-anonymity
    (every quasi-identifier combination must describe >= k people) and
    l-diversity (each QI group's SENSITIVE attribute must take >= l
    distinct values, or group membership alone leaks it) over customer,
    with QI = (nation, market segment) and sensitive = account-balance
    band (floor/1000). One row: group count, worst group size, violation
    counts, rows at re-identification risk, and the max re-identification
    probability 1/min(n) — the governance twin of ``pii_audit_counts``
    (that one finds PII in TEXT; this one measures STRUCTURED
    linkability).

    Scale: one map-side-combinable aggregate to QI-cardinality rows
    (count + distinct-band count per group), then a bounded second
    aggregate over those group rows — the profile-then-audit shape of
    ``events_column_profile``; nothing row-level leaves the first
    shuffle."""
    cust = table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("long")
    g = (cust.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count("*").alias("n"),
              F.countDistinct(band).alias("ldiv")))
    return g.agg(
        F.lit(K_ANON).cast("long").alias("k"),
        F.lit(L_DIV).cast("long").alias("l"),
        F.count("*").cast("long").alias("n_groups"),
        F.min("n").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("n") < K_ANON, 1).otherwise(0)).cast("long")
         .alias("n_k_violating_groups"),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0))
         .cast("long").alias("n_rows_at_risk"),
        F.sum(F.when(F.col("ldiv") < L_DIV, 1).otherwise(0)).cast("long")
         .alias("n_l_violating_groups"),
        F.round(F.lit(1.0) / F.min("n"), 6).alias("max_reident_risk"))
