"""Relational core: scans, predicates, aggregations, pivots, top-N, joins.

Rebuilds SURVEY.md sections 2.2 (P1-P8), 2.3 (A1-A11), 2.5 (T1-T5) and the
join layer the reference lacks (section 2.4) as declarative DataFrame plans.
The fixture mapping is FIXTURES.md part B: ``events`` stands in for the
Rucio raw-event stream, TPC-H-ish tables regression-test the join/agg layer.

Scale notes (100 TB posture), applied throughout:
- global top-k is ``orderBy().limit(k)`` -> Spark plans TakeOrderedAndProject
  (per-partition partial top-k, then a k-row merge on the driver) — never a
  single-partition global ``row_number`` window over the full set;
- scalar totals are attached with ``crossJoin(broadcast(1-row-agg))``, not a
  ``sum() over ()`` window that would funnel all rows into one partition;
- small dimension tables (region/nation/top-N key lists) are broadcast so
  the big fact side never shuffles for the join;
- aggregates are plain ``groupBy`` (map-side partial aggregation for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import (dec_avg, dec_std, dec_sum, sql_dec_avg,
                                 sql_dec_std, sql_dec_sum)
from ..plans.registry import register
from ..sources.readers import table


# ---------------------------------------------------------------------------
# Flagship (SURVEY.md section 7 step 1): top-12 error-heavy users with their
# share of all errors — filter (P2) -> group-count (A4/A5) -> global top-N
# (T3) -> scalar-total share (A7). This is ``__spark_entry__.entry``.
# ---------------------------------------------------------------------------

@register(
    "flagship_top_error_users",
    oracle="""
    WITH err AS (SELECT * FROM events WHERE event_type = 'error'),
    by_user AS (SELECT user_id, COUNT(*) AS n_errors FROM err GROUP BY user_id),
    tot AS (SELECT COUNT(*) AS total FROM err)
    SELECT user_id, n_errors,
           CAST(ROW_NUMBER() OVER (ORDER BY n_errors DESC, user_id) AS BIGINT) AS rnk,
           n_errors / (SELECT total FROM tot) AS share
    FROM by_user
    ORDER BY n_errors DESC, user_id
    LIMIT 12
    """,
    tags=("relational", "flagship"),
)
def flagship_top_error_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analog of the reference's top-N failure-site exploration
    (``rucio_data_exploration.ipynb:858-865`` top-N share + ``:888`` label
    extraction), restated as one declarative plan over ``events``."""
    ev = table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error")
    by_user = err.groupBy("user_id").agg(F.count("*").alias("n_errors"))
    total = err.agg(F.count("*").alias("total"))
    top = by_user.orderBy(F.desc("n_errors"), F.asc("user_id")).limit(12)
    w = Window.orderBy(F.desc("n_errors"), F.asc("user_id"))  # 12 rows only
    return (top.withColumn("rnk", F.row_number().over(w).cast("long"))
               .crossJoin(F.broadcast(total))
               .select("user_id", "n_errors", "rnk",
                       (F.col("n_errors") / F.col("total")).alias("share")))


# --- A1 + P2: IN-list filter and count --------------------------------------

@register(
    "count_filtered_events",
    oracle="""
    SELECT COUNT(*) AS n FROM events
    WHERE event_type IN ('error', 'purchase')
    """,
    tags=("relational",),
)
def count_filtered_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+A1: ``df.filter(col.isin([...])).count()``
    (``rucio_data_access_HDFS.ipynb:359`` and ``:390``)."""
    ev = table(spark, sf_dir, "events")
    return (ev.where(F.col("event_type").isin("error", "purchase"))
              .agg(F.count("*").alias("n")))


# --- A4: value_counts -------------------------------------------------------

@register(
    "event_type_counts",
    oracle="SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    tags=("relational",),
)
def event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 ``value_counts`` (``rucio_data_exploration.ipynb:800-801``)."""
    return (table(spark, sf_dir, "events")
            .groupBy("event_type").agg(F.count("*").alias("n")))


# --- A5: multi-key group size ----------------------------------------------

@register(
    "user_type_group_size",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
    """,
    tags=("relational",),
)
def user_type_group_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 ``groupby(['src_site','dst_site']).size()``
    (``rucio_data_exploration.ipynb:1185-1186``)."""
    return (table(spark, sf_dir, "events")
            .groupBy("user_id", "event_type").agg(F.count("*").alias("n")))


# --- A6: crosstab / pivot ---------------------------------------------------

@register(
    "crosstab_priority_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("relational",),
)
def crosstab_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 ``pd.crosstab(src_site, dst_site)``
    (``rucio_data_exploration.ipynb:1487-1488``) as groupBy+pivot with the
    pivot values pinned (no extra distinct-scan job at scale)."""
    orders = table(spark, sf_dir, "orders")
    piv = (orders.groupBy("o_orderpriority")
           .pivot("o_orderstatus", ["F", "O", "P"]).count()
           .na.fill(0, ["F", "O", "P"]))
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("status_f"),
        F.col("O").alias("status_o"),
        F.col("P").alias("status_p"),
    )


# --- A2: describe() numeric -------------------------------------------------

@register(
    "describe_event_value",
    oracle=f"""
    SELECT COUNT(value) AS n,
           {sql_dec_avg('value', 6)} AS mean_value,
           {sql_dec_std('value', 6)} AS std_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    """,
    tags=("relational",),
)
def describe_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 ``df.describe()`` (``rucio_data_access_HDFS.ipynb:2323``) over the
    measure column, with exact decimal-summed mean/std (functions.numeric)."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.count("value").alias("n"),
        dec_avg("value", 6).alias("mean_value"),
        dec_std("value", 6).alias("std_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


# --- A3: describe() categorical: distinct / mode / mode-freq ---------------

@register(
    "describe_event_type",
    oracle="""
    WITH c AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
    m AS (SELECT event_type AS top, n AS top_freq FROM c
          ORDER BY n DESC, event_type LIMIT 1)
    SELECT (SELECT COUNT(event_type) FROM events) AS n,
           (SELECT COUNT(DISTINCT event_type) FROM events) AS n_distinct,
           top, top_freq
    FROM m
    """,
    tags=("relational",),
)
def describe_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 pandas ``describe(include=['object'])``
    (``rucio_data_exploration.ipynb:607``): count / unique / top / freq.
    Mode = deterministic top-1 of the group-count (count desc, value asc) —
    a TakeOrderedAndProject, not a global window."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    mode = (counts.orderBy(F.desc("cnt"), F.asc("event_type")).limit(1)
            .select(F.col("event_type").alias("top"),
                    F.col("cnt").alias("top_freq")))
    overall = ev.agg(F.count("event_type").alias("n"),
                     F.countDistinct("event_type").alias("n_distinct"))
    return overall.crossJoin(F.broadcast(mode))


# --- A7 + T3: top-N share of total -----------------------------------------

@register(
    "top_users_share",
    oracle="""
    WITH by_user AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    top AS (SELECT n FROM by_user ORDER BY n DESC, user_id LIMIT 12)
    SELECT CAST((SELECT SUM(n) FROM top) AS BIGINT) AS top_n_events,
           (SELECT COUNT(*) FROM events) AS total_events,
           (SELECT SUM(n) FROM top) / (SELECT COUNT(*) FROM events) AS top_share
    """,
    tags=("relational",),
)
def top_users_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 top-N share ratio (``rucio_data_exploration.ipynb:858-865``):
    sum(value_counts()[:12]) / sum(value_counts())."""
    ev = table(spark, sf_dir, "events")
    by_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    top = (by_user.orderBy(F.desc("n"), F.asc("user_id")).limit(12)
           .agg(F.sum("n").alias("top_n_events")))
    total = ev.agg(F.count("*").alias("total_events"))
    return (top.crossJoin(F.broadcast(total))
            .withColumn("top_share",
                        F.col("top_n_events") / F.col("total_events")))


# --- A8: distinct counts ----------------------------------------------------

@register(
    "distinct_documents",
    oracle="""
    SELECT COUNT(*) AS n, COUNT(DISTINCT text) AS n_distinct_text,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    """,
    tags=("relational", "text"),
)
def distinct_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 ``len(errors.message.unique())``
    (``word2vec_dbscan_approach.ipynb:351``). Exact countDistinct here;
    ``approx_count_distinct`` is the 100 TB variant (see bench notes)."""
    docs = table(spark, sf_dir, "documents")
    return docs.agg(F.count("*").alias("n"),
                    F.countDistinct("text").alias("n_distinct_text"),
                    F.countDistinct("lang").alias("n_langs"))


# --- P5: null scan + imputation --------------------------------------------

@register(
    "null_scan_fill",
    oracle="""
    SELECT event_id,
           COALESCE(CASE WHEN value < 10 THEN NULL ELSE value END, -1.0) AS v_filled
    FROM events
    """,
    tags=("relational",),
)
def null_scan_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 null-row scan + the tip-cell ``fillna`` imputation
    (``rucio_data_exploration.ipynb:727`` and cell 22): the fixtures carry no
    nulls, so a deterministic mask (value<10 -> NULL) synthesizes them, then
    ``df.na.fill`` imputes — the pattern under test is NULL propagation."""
    ev = table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        F.when(F.col("value") < 10, F.lit(None).cast("double"))
         .otherwise(F.col("value")).alias("v_filled"))
    return masked.na.fill({"v_filled": -1.0})


# --- P1 + JSON scalars: nested flatten --------------------------------------

@register(
    "json_props_flatten",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    tags=("relational", "json"),
)
def json_props_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 nested-struct flatten (``select('data.*')``,
    ``rucio_data_access_HDFS.ipynb:632``): the fixture's nested payload is a
    JSON string, so ``from_json`` -> struct -> ``select(s.*)`` is the same
    shape; grouped to exercise the flattened column downstream."""
    ev = table(spark, sf_dir, "events")
    flat = (ev.withColumn("s", F.from_json("props", "k INT"))
              .select("event_id", "s.*"))
    return flat.groupBy("k").agg(F.count("*").alias("n"))


@register(
    "json_sum_by_type",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("relational", "json"),
)
def json_sum_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (SURVEY.md section 2.6 JSON functions):
    ``get_json_object`` stays JVM-side; integer sums are exact."""
    ev = table(spark, sf_dir, "events")
    return (ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
              .groupBy("event_type")
              .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n")))


# --- P4 as a real semi-join -------------------------------------------------

@register(
    "topn_semijoin_events",
    oracle="""
    WITH by_user AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
    top AS (SELECT user_id FROM by_user ORDER BY n DESC, user_id LIMIT 20)
    SELECT event_type, COUNT(*) AS n FROM events
    WHERE user_id IN (SELECT user_id FROM top)
    GROUP BY event_type
    """,
    tags=("relational", "join"),
)
def topn_semijoin_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 compound membership filter (``errors.query("src_site in @top ...")``,
    ``rucio_data_exploration.ipynb:1057``) in its scale-out form: compute the
    top-N key table, BROADCAST it, left-semi join the fact side (SURVEY.md
    section 2.4) — the fact table never shuffles."""
    ev = table(spark, sf_dir, "events")
    top = (ev.groupBy("user_id").agg(F.count("*").alias("n"))
             .orderBy(F.desc("n"), F.asc("user_id")).limit(20)
             .select("user_id"))
    kept = ev.join(F.broadcast(top), "user_id", "left_semi")
    return kept.groupBy("event_type").agg(F.count("*").alias("n"))


# --- P7: cast ---------------------------------------------------------------

@register(
    "cast_label_counts",
    oracle="""
    SELECT CAST(label AS VARCHAR) AS label_str, COUNT(*) AS n
    FROM embeddings GROUP BY 1
    """,
    tags=("relational",),
)
def cast_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 ``astype({'category':'object'})``
    (``rucio_data_exploration.ipynb:374``): int label -> categorical string."""
    emb = table(spark, sf_dir, "embeddings")
    return (emb.select(F.col("label").cast("string").alias("label_str"))
               .groupBy("label_str").agg(F.count("*").alias("n")))


# --- T1/T3: deterministic top-k ---------------------------------------------

@register(
    "top_events_by_value",
    oracle="""
    SELECT event_id, event_type, value FROM events
    ORDER BY value DESC, event_id LIMIT 15
    """,
    tags=("relational",),
)
def top_events_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 head/limit + T3 sort-desc-slice (``showDf``,
    ``rucio_data_access_HDFS.ipynb:1262-1286``) — as TakeOrderedAndProject
    with a total tie-break order."""
    ev = table(spark, sf_dir, "events")
    return (ev.select("event_id", "event_type", "value")
              .orderBy(F.desc("value"), F.asc("event_id")).limit(15))


# --- T2: seeded Bernoulli sample (rows-only: engines' RNGs differ) ----------

@register("sample_events", oracle=None, tags=("relational",))
def sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 ``df.sample(False, fraction)`` (``rucio_data_access_HDFS.ipynb:1288``).
    Sampling RNGs are engine-specific, so this is a rows-only check; the
    statistical bounds are asserted in tests/test_relational.py."""
    ev = table(spark, sf_dir, "events")
    return ev.sample(fraction=0.1, seed=42).select("event_id", "event_type")


# --- TPC-H-style regression: Q1 pricing summary (A2-class aggregate) --------

@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dec_sum('l_quantity', 2)} AS sum_qty,
           {sql_dec_sum('l_extendedprice', 2)} AS sum_base_price,
           {sql_dec_sum('l_extendedprice * (1.0 - l_discount)', 6)} AS sum_disc_price,
           {sql_dec_sum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', 8)} AS sum_charge,
           {sql_dec_avg('l_quantity', 2)} AS avg_qty,
           {sql_dec_avg('l_extendedprice', 2)} AS avg_price,
           {sql_dec_avg('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "tpch"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the regression anchor for the
    describe/aggregate layer (FIXTURES.md B4). One scan, map-side partial
    aggregation, 4-group output."""
    li = table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc * (F.lit(1.0) + F.col("l_tax"))
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
              .groupBy("l_returnflag", "l_linestatus")
              .agg(dec_sum("l_quantity", 2).alias("sum_qty"),
                   dec_sum("l_extendedprice", 2).alias("sum_base_price"),
                   dec_sum(disc, 6).alias("sum_disc_price"),
                   dec_sum(charge, 8).alias("sum_charge"),
                   dec_avg("l_quantity", 2).alias("avg_qty"),
                   dec_avg("l_extendedprice", 2).alias("avg_price"),
                   dec_avg("l_discount", 2).alias("avg_disc"),
                   F.count("*").alias("count_order")))


# --- joins + window top-N per group ----------------------------------------

@register(
    "top_customers_per_region",
    oracle="""
    SELECT r_name, c_name, c_acctbal,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT r.r_name, c.c_name, c.c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY r.r_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ) WHERE rnk <= 3
    """,
    tags=("relational", "join", "window"),
)
def top_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group (SURVEY.md section 2.8 window rebuild of T3): fact
    side joins BROADCAST dims (nation: 25 rows, region: 5), then a
    partitioned row_number — the per-group form that scales, unlike a global
    sort."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    w = (Window.partitionBy("r_name")
         .orderBy(F.desc("c_acctbal"), F.asc("c_custkey")))
    return (joined.withColumn("rnk", F.row_number().over(w).cast("long"))
                  .where(F.col("rnk") <= 3)
                  .select("r_name", "c_name", "c_acctbal", "rnk"))


@register(
    "revenue_by_region",
    oracle=f"""
    SELECT r.r_name,
           {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("relational", "join", "tpch"),
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-join aggregate: lineitem |> orders (shuffle or
    broadcast by AQE stats) |> customer |> broadcast nation |> broadcast
    region. The SURVEY.md section 2.4 join layer, end to end."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
              .groupBy("r_name")
              .agg(dec_sum(rev, 6).alias("revenue"),
                   F.count("*").alias("n_lineitems")))


@register(
    "late_shipment_orders",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("relational", "join", "tpch"),
)
def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS as a left-semi join with a non-equi residual
    (ship > order date + 90d): the declarative form Catalyst turns into a
    semi-join, no manual dedup."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = ((li.l_orderkey == o.o_orderkey) &
            (li.l_shipdate > F.date_add(o.o_orderdate, 90)))
    return (o.join(li, cond, "left_semi")
             .groupBy("o_orderpriority").agg(F.count("*").alias("n_orders")))


@register(
    "brand_revenue_by_nation",
    oracle=f"""
    SELECT p.p_brand, n.n_name,
           {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)', 6)} AS revenue,
           {sql_dec_sum('l.l_quantity', 2)} AS sum_qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size <= 25
    GROUP BY p.p_brand, n.n_name
    """,
    tags=("relational", "join", "tpch"),
)
def brand_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join over the remaining dims: fact lineitem joins BROADCAST
    part/supplier/nation (dim sides are orders-of-magnitude smaller — at
    100 TB the fact side streams, dims ship once per executor), with the
    p_size predicate pushed below the join so pruned parts never join."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_size") <= 25)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .groupBy("p_brand", "n_name")
             .agg(dec_sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 6)
                  .alias("revenue"),
                  dec_sum("l_quantity", 2).alias("sum_qty")))


_SUMMARY_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "summary_all_numeric",
    oracle=" UNION ALL ".join(f"""
    SELECT '{c}' AS column_name, COUNT({c}) AS n,
           {sql_dec_avg(c, 6)} AS mean_val,
           {sql_dec_std(c, 6)} AS std_val,
           MIN({c}) AS min_val, MAX({c}) AS max_val
    FROM lineitem""" for c in _SUMMARY_COLS),
    tags=("relational",),
)
def summary_all_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 in full: ``describe()`` across EVERY numeric measure at once —
    all per-column aggregates computed in ONE scan (the reference's 72 s
    describe() over 59 columns is one pass too, SURVEY.md §6), then
    unpivoted to the classic one-row-per-column layout."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _SUMMARY_COLS:
        aggs += [F.count(c).alias(f"{c}__n"),
                 dec_avg(c, 6).alias(f"{c}__mean"),
                 dec_std(c, 6).alias(f"{c}__std"),
                 F.min(c).alias(f"{c}__min"),
                 F.max(c).alias(f"{c}__max")]
    wide = li.agg(*aggs)
    per_col = F.explode(F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.col(f"{c}__n").alias("n"),
                 F.col(f"{c}__mean").alias("mean_val"),
                 F.col(f"{c}__std").alias("std_val"),
                 F.col(f"{c}__min").alias("min_val"),
                 F.col(f"{c}__max").alias("max_val"))
        for c in _SUMMARY_COLS]))
    return wide.select(per_col.alias("s")).select("s.*")


@register(
    "value_percentiles_by_type",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.75) AS p75,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("relational",),
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    ``percentile`` == DuckDB ``quantile_cont``, bit-identical on the
    fixtures). The at-scale variant is ``approx_distinct_and_quantiles``
    below — exact percentile is a full sort per group."""
    ev = table(spark, sf_dir, "events")
    p = F.expr("percentile(value, array(0.25, 0.5, 0.75, 0.99))")
    return (ev.groupBy("event_type").agg(p.alias("p"))
            .select("event_type",
                    F.col("p").getItem(0).alias("p25"),
                    F.col("p").getItem(1).alias("p50"),
                    F.col("p").getItem(2).alias("p75"),
                    F.col("p").getItem(3).alias("p99")))


@register("approx_distinct_and_quantiles", oracle=None, tags=("relational", "approx"))
def approx_distinct_and_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB forms of A8/percentiles: HyperLogLog++ distinct count and
    t-digest-style approximate percentiles — sketches merge associatively,
    so these aggregate in one pass with bounded memory where the exact
    forms need a full shuffle/sort. Error bound vs exact asserted in
    tests/test_empty_inputs.py's sibling (test_approx_bounds)."""
    ev = table(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
        F.expr("percentile(value, 0.5)").alias("exact_median"))


@register(
    "interval_join_prior_events",
    oracle="""
    SELECT e1.event_id,
           COUNT(e2.event_id) AS n_prior_1h
    FROM events e1
    LEFT JOIN events e2
      ON e2.user_id = e1.user_id
     AND e2.ts >= e1.ts - INTERVAL 1 HOUR
     AND e2.ts < e1.ts
    WHERE e1.event_type = 'error'
    GROUP BY e1.event_id
    """,
    tags=("relational", "join", "interval"),
)
def interval_join_prior_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join (the as-of/range-join family): for every
    error event, how many events the same user produced in the preceding
    hour. Equi-join on user_id carries the shuffle; the time range is a
    post-join filter — at 100 TB this is bucketed/sorted by (user_id, ts)
    at rest so the range probe stays within co-located sorted runs."""
    ev = table(spark, sf_dir, "events")
    e1 = (ev.where(F.col("event_type") == "error")
          .select(F.col("event_id"), F.col("user_id").alias("u1"),
                  F.col("ts").alias("t1")))
    e2 = ev.select(F.col("user_id").alias("u2"), F.col("ts").alias("t2"))
    cond = ((F.col("u2") == F.col("u1")) &
            (F.col("t2") >= F.col("t1") - F.expr("INTERVAL 1 HOUR")) &
            (F.col("t2") < F.col("t1")))
    return (e1.join(e2, cond, "left")
            .groupBy("event_id")
            .agg(F.count(F.col("t2")).alias("n_prior_1h")))


@register(
    "rollup_event_counts",
    oracle="""
    SELECT COALESCE(event_type, '(all)') AS event_type,
           COALESCE(CAST(user_id % 10 AS VARCHAR), '(all)') AS user_bucket,
           COUNT(*) AS n,
           CAST(GROUPING(event_type) * 2 + GROUPING(user_id % 10) AS BIGINT)
             AS grouping_level
    FROM events
    GROUP BY ROLLUP (event_type, user_id % 10)
    """,
    tags=("relational", "olap"),
)
def rollup_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup (GROUPING SETS family): counts at (type, bucket),
    (type), and () levels in one pass — Catalyst expands the sets, partial
    aggregation still applies, so this is ONE shuffle, not three jobs."""
    ev = (table(spark, sf_dir, "events")
          .withColumn("user_bucket", (F.col("user_id") % 10).cast("string")))
    return (ev.rollup("event_type", "user_bucket")
            .agg(F.count("*").alias("n"),
                 (F.grouping("event_type") * 2 +
                  F.grouping("user_bucket")).cast("long")
                 .alias("grouping_level"))
            .select(F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
                    F.coalesce("user_bucket", F.lit("(all)")).alias("user_bucket"),
                    "n", "grouping_level"))


@register(
    "user_event_gaps",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id,
           COUNT(prev_ts) AS n_gaps,
           CAST(MAX(epoch_us(ts) - epoch_us(prev_ts)) / 1000000 AS DOUBLE)
             AS max_gap_s
    FROM g GROUP BY user_id
    """,
    tags=("relational", "window"),
)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead window family: per-user inter-event gap stats (the
    gaps-and-islands primitive under sessionization). One window shuffle
    partitioned by user — the same partitioning the session_window agg
    uses, so at scale the two share an exchange."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    g = ev.select("user_id", "ts", F.lag("ts").over(w).alias("prev_ts"))
    # gap math stays integral (microseconds) until one final double divide,
    # mirroring the oracle exactly — float-subtracting fractional seconds
    # rounds differently
    gap_us = F.unix_micros("ts") - F.unix_micros("prev_ts")
    return (g.groupBy("user_id")
            .agg(F.count("prev_ts").alias("n_gaps"),
                 (F.max(gap_us).cast("double") / F.lit(1000000.0))
                 .alias("max_gap_s")))


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("relational", "join"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS): customers that never placed an order — the
    one join type the matrix lacked. The orders side is reduced to distinct
    keys BEFORE the join, so the anti probe carries one long per order-key
    instead of the fact table's full width; at 100 TB that distinct is a
    map-side-combined agg and the anti-join shuffles keys only."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    okeys = (table(spark, sf_dir, "orders")
             .select(F.col("o_custkey").alias("c_custkey")).distinct())
    return cust.join(okeys, "c_custkey", "left_anti")


@register(
    "value_decile_summary",
    oracle="""
    WITH d AS (
      SELECT event_type, value, event_id,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           COUNT(*) AS n, MIN(value) AS lo, MAX(value) AS hi
    FROM d GROUP BY 1, 2
    """,
    tags=("relational", "window"),
)
def value_decile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window family: per-type decile boundaries of ``value``
    (min/max/count per bucket — exact, no float sums). Ties broken by
    event_id so both engines assign identical buckets. Scale note: a
    per-key ntile funnels each key's rows through one task; for a global
    or hot-key decile cut at 100 TB use approx_percentile cut points
    (``approx_distinct_and_quantiles``) instead — this query is the exact
    semantics anchor."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.asc("value"),
                                                 F.asc("event_id"))
    d = ev.select("event_type", "value",
                  F.ntile(10).over(w).cast("long").alias("decile"))
    return (d.groupBy("event_type", "decile")
            .agg(F.count("*").alias("n"),
                 F.min("value").alias("lo"),
                 F.max("value").alias("hi")))


@register(
    "winsorized_value_stats",
    oracle=f"""
    WITH cuts AS (
      SELECT event_type,
             quantile_cont(value, 0.01) AS p01,
             quantile_cont(value, 0.99) AS p99
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    clipped AS (
      SELECT e.event_type, LEAST(GREATEST(e.value, c.p01), c.p99) AS v
      FROM events e JOIN cuts c ON e.event_type = c.event_type
      WHERE e.value IS NOT NULL
    )
    SELECT event_type, COUNT(*) AS n,
           ROUND({sql_dec_avg('v', 6)}, 6) AS mean_w,
           ROUND({sql_dec_std('v', 6)}, 6) AS std_w,
           MIN(v) AS min_w, MAX(v) AS max_w
    FROM clipped GROUP BY event_type
    """,
    tags=("relational", "robust"),
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (winsorized) per-type stats: clip ``value`` to the exact
    per-type [P1, P99] band, then mean/std/min/max of the clipped measure —
    the outlier-resistant twin of ``describe_event_value`` (A2), and the
    standard pre-normalization step before feeding heavy-tailed telemetry
    into a model.

    Scale: the cutoff table is |event_type| rows (exact percentile = one
    shuffle on the group key) and broadcasts back into the clipping scan;
    the final aggregate partially combines map-side. Spark ``percentile``
    and DuckDB ``quantile_cont`` agree bit-for-bit (the
    `value_percentiles_by_type` precedent), and the clipped mean/std use
    the DECIMAL-exact forms from functions/numeric.
    """
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cuts = (ev.groupBy("event_type")
            .agg(F.expr("percentile(value, 0.01)").alias("p01"),
                 F.expr("percentile(value, 0.99)").alias("p99")))
    clipped = (ev.join(F.broadcast(cuts), "event_type")
               .select("event_type",
                       F.least(F.greatest(F.col("value"), F.col("p01")),
                               F.col("p99")).alias("v")))
    return (clipped.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(dec_avg("v", 6), 6).alias("mean_w"),
                 F.round(dec_std("v", 6), 6).alias("std_w"),
                 F.min("v").alias("min_w"),
                 F.max("v").alias("max_w")))


#: MAD outlier gate: consistency constant (normal-distribution MAD -> sigma)
#: and the z-score cutoff — the robust twin of the 3-sigma rule.
_MAD_K = 1.4826
_MAD_Z = 3.0


@register(
    "value_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, m.med, ABS(e.value - m.med) AS ad
      FROM events e JOIN med m ON e.event_type = m.event_type
      WHERE e.value IS NOT NULL
    ),
    mad AS (
      SELECT event_type, ANY_VALUE(med) AS med,
             quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, COUNT(*) AS n,
           ROUND(ANY_VALUE(d.med), 6) AS median,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           CAST(COUNT(*) FILTER (
             WHERE d.ad > {_MAD_Z} * {_MAD_K} * m.mad) AS BIGINT)
             AS n_outliers,
           ROUND(CAST(COUNT(*) FILTER (
             WHERE d.ad > {_MAD_Z} * {_MAD_K} * m.mad) AS DOUBLE)
             / COUNT(*), 6) AS outlier_ratio
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
    tags=("relational", "robust", "stats"),
)
def value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit per event type: median / MAD (median absolute
    deviation) and the count of points whose robust z-score
    ``|x - med| / ({_MAD_K} * MAD)`` exceeds {_MAD_Z} — the
    heavy-tail-safe twin of the 3-sigma rule (mean/std are themselves
    dragged by the outliers they're meant to find; median/MAD have a 50%
    breakdown point). The telemetry gate that decides whether a feed's
    ``value`` channel went bad before it poisons training statistics.

    Scale: same shape as ``winsorized_value_stats`` — two exact grouped
    percentiles (|event_type|-row tables, broadcast back into the scan)
    plus one counting aggregate; Spark ``percentile`` and DuckDB
    ``quantile_cont`` agree bit-for-bit, and the outlier comparison runs
    on both engines' identical IEEE doubles, so the counts are exact. The
    at-scale note from `value_percentiles_by_type` applies: a group so
    hot its values overflow one task swaps `percentile` for the bucketed
    two-phase rank (`global_value_rank`'s mechanism)."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    med = (ev.groupBy("event_type")
           .agg(F.expr("percentile(value, 0.5)").alias("med")))
    dev = (ev.join(F.broadcast(med), "event_type")
           .select("event_type", "med",
                   F.abs(F.col("value") - F.col("med")).alias("ad")))
    mad = (dev.groupBy("event_type")
           .agg(F.expr("percentile(ad, 0.5)").alias("mad")))
    cut = F.lit(_MAD_Z) * F.lit(_MAD_K) * F.col("mad")
    return (dev.join(F.broadcast(mad), "event_type")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.first("med"), 6).alias("median"),
                 F.round(F.first("mad"), 6).alias("mad"),
                 F.count(F.when(F.col("ad") > cut, 1)).cast("long")
                  .alias("n_outliers"),
                 F.round(F.count(F.when(F.col("ad") > cut, 1))
                          .cast("double") / F.count("*"), 6)
                  .alias("outlier_ratio")))


@register(
    "value_decile_histogram",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5,
                                   0.6, 0.7, 0.8, 0.9]) AS qs
      FROM events WHERE value IS NOT NULL
    ),
    binned AS (
      SELECT 1 + list_sum(list_transform(c.qs,
               q -> CASE WHEN e.value > q THEN 1 ELSE 0 END)) AS decile,
             e.value AS v
      FROM events e CROSS JOIN cuts c
      WHERE e.value IS NOT NULL
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(v), 6) AS min_value, ROUND(MAX(v), 6) AS max_value
    FROM binned GROUP BY decile
    """,
    tags=("relational", "stats"),
)
def value_decile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram: exact global deciles of ``value`` as cut
    points, every row binned by how many cuts it exceeds — the
    equal-frequency companion to the fixed-width `value_histogram`
    (equi-depth bins are what optimizers and drift monitors want: each
    bucket carries the same mass, so a shifted distribution shows up as
    bucket-count imbalance instead of hiding in one wide bin).

    Scale: one exact percentile aggregate (9 doubles, broadcast) + one
    binning scan + a 10-group aggregate — the cut row is the ONLY
    broadcast, and the bin expression is a fold over a 9-literal array
    (whole-stage-codegen'd, no join per cut). Bucket boundaries use
    identical IEEE comparisons on both engines' identical cut values, so
    the counts are exact. The at-scale percentile caveat of
    `value_percentiles_by_type` applies (swap to the bucketed two-phase
    rank if one task can't hold the sorted values)."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cuts = ev.agg(F.expr(
        "percentile(value, array(0.1, 0.2, 0.3, 0.4, 0.5, "
        "0.6, 0.7, 0.8, 0.9))").alias("qs"))
    binned = (ev.crossJoin(F.broadcast(cuts))
              .select((F.lit(1) + F.aggregate(
                          "qs", F.lit(0),
                          lambda acc, q: acc + F.when(F.col("value") > q, 1)
                                                .otherwise(0)))
                      .cast("long").alias("decile"),
                      F.col("value").alias("v")))
    return (binned.groupBy("decile")
            .agg(F.count("*").cast("long").alias("n"),
                 F.round(F.min("v"), 6).alias("min_value"),
                 F.round(F.max("v"), 6).alias("max_value")))


@register(
    "chi2_priority_status",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS r, o_orderstatus AS c, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    rt AS (SELECT r, SUM(o) AS row_tot FROM obs GROUP BY r),
    ct AS (SELECT c, SUM(o) AS col_tot FROM obs GROUP BY c),
    n AS (SELECT SUM(o) AS n FROM obs),
    terms AS (
      SELECT obs.o,
             (CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
              / CAST((SELECT n FROM n) AS DOUBLE)) AS e
      FROM obs JOIN rt ON obs.r = rt.r JOIN ct ON obs.c = ct.c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(CAST(CAST(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(27,18)))
                      AS VARCHAR) AS DOUBLE), 6) AS chi2
    FROM terms
    """,
    tags=("relational", "stats"),
)
def chi2_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence statistic over the A6 contingency
    table (order priority x status): ``sum (obs-exp)^2 / exp`` with
    ``exp = row_tot * col_tot / n`` — the significance companion to the
    crosstab surface (is the association real or marginal noise?).

    Scale: ONE aggregate over the fact table produces the contingency
    cells; row/column margins and n derive from those <= |R|x|C| rows, so
    everything past the first shuffle is cell-count-sized. The per-cell
    terms sum in DECIMAL for a cross-engine-exact statistic.
    """
    orders = table(spark, sf_dir, "orders")
    obs = (orders.groupBy(F.col("o_orderpriority").alias("r"),
                          F.col("o_orderstatus").alias("c"))
           .agg(F.count("*").alias("o")).cache())
    rt = obs.groupBy("r").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("c").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("n"))
    e = (F.col("row_tot").cast("double") * F.col("col_tot").cast("double")
         / F.col("n").cast("double"))
    terms = (obs.join(F.broadcast(rt), "r").join(F.broadcast(ct), "c")
             .crossJoin(F.broadcast(n))
             .select("o", e.alias("e")))
    chi2 = ((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
    out = terms.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.sum(chi2.cast("decimal(27,18)"))
                .cast("string").cast("double"), 6).alias("chi2"))
    # the cell cache feeds four branches of this one bounded (1-row)
    # result — materialize it hot, then release
    from .graph import materialize_release
    return materialize_release(out, [obs])


@register(
    "shipping_priority_topk",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           ROUND(CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                    AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE), 4)
             AS revenue,
           o.o_orderdate AS orderdate, o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-06-01'
      AND l.l_shipdate > DATE '1998-06-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate, orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "topk"),
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): top-10 unshipped BUILDING-segment
    orders by outstanding revenue as of the 1998-06-01 cutoff (fixture
    dates span 1995-2001; the fixture orders table carries o_orderpriority
    rather than TPC-H's o_shippriority) — the classic
    filter-join-agg-topk composition over the three biggest tables.

    Scale: both date/segment predicates push into the scans; the
    customer-side filter reduces it to a broadcastable key list for the
    orders join; the revenue aggregate runs in DECIMAL (exact and
    order-independent, so the top-10 cut is deterministic); the final
    top-10 is a distributed TakeOrderedAndProject, never a global sort.
    """
    c = (table(spark, sf_dir, "customer")
         .where(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    o = (table(spark, sf_dir, "orders")
         .where(F.col("o_orderdate") < F.lit("1998-06-01").cast("date"))
         .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
    l = (table(spark, sf_dir, "lineitem")
         .where(F.col("l_shipdate") > F.lit("1998-06-01").cast("date"))
         .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    j = (l.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                l.l_orderkey == o.o_orderkey))
    agg = (j.groupBy(F.col("l_orderkey").alias("orderkey"),
                     F.col("o_orderdate").alias("orderdate"),
                     F.col("o_orderpriority").alias("priority"))
           .agg(F.round(F.sum(rev.cast("decimal(27,6)"))
                        .cast("string").cast("double"), 4).alias("revenue")))
    return (agg.orderBy(F.desc("revenue"), "orderdate", "orderkey").limit(10)
            .select("orderkey", "revenue", "orderdate", "priority"))


@register(
    "nation_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)
               AS revenue
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation, ROUND(revenue, 4) AS revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY region), 6)
             AS share_of_region
    FROM rev
    """,
    tags=("relational", "join", "window"),
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent reporting: each nation's lineitem revenue and its
    share of the region total — the ratio-to-parent window every BI rollup
    needs (revenue_by_region's sibling with the denominator computed
    in-plan, not by a second query).

    Scale: the fact scan aggregates once to |nation| rows; the share is a
    window over that aggregate (region-partitioned, 25-row input), so the
    denominator costs nothing extra. Revenue sums in DECIMAL; the share
    divides two bit-identical doubles.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey",
                                              "n_name")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev_expr = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    rev = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
           .groupBy(F.col("r_name").alias("region"),
                    F.col("n_name").alias("nation"))
           .agg(F.sum(rev_expr.cast("decimal(27,6)"))
                .cast("string").cast("double").alias("revenue")))
    w = Window.partitionBy("region")
    return rev.select(
        "region", "nation", F.round("revenue", 4).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6)
         .alias("share_of_region"))


@register(
    "small_quantity_revenue",
    oracle="""
    WITH avgq AS (
      SELECT l_partkey, 0.2 * (CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(27,6)))
                                    AS VARCHAR) AS DOUBLE) / COUNT(*)) AS cutoff
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_small_lines,
           ROUND(CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,6)))
                      AS VARCHAR) AS DOUBLE) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN avgq a ON l.l_partkey = a.l_partkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity < a.cutoff
    GROUP BY p.p_brand
    """,
    tags=("relational", "join", "subquery"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue), per brand: lineitems
    whose quantity is below 20% of that part's average quantity, summed as
    yearly-average revenue — the classic CORRELATED SCALAR SUBQUERY
    (per-outer-row aggregate), decorrelated into one per-part aggregate +
    an equi-join, which is exactly how a 100 TB engine must plan it (a
    re-evaluated subquery per row is quadratic).

    Scale: one map-side-combined aggregate over lineitem builds the
    |parts|-row cutoff table; the join back is on the same l_partkey the
    aggregate shuffled on (exchange reuse); part is a broadcast dim. All
    money/quantity sums are DECIMAL-exact.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    avgq = (li.groupBy("l_partkey")
            .agg((F.lit(0.2) * (F.sum(F.col("l_quantity").cast("decimal(27,6)"))
                                .cast("string").cast("double") / F.count("*")))
                 .alias("cutoff")))
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = (li.join(avgq, "l_partkey")
         .where(F.col("l_quantity") < F.col("cutoff"))
         .join(F.broadcast(p), li.l_partkey == p.p_partkey))
    return (j.groupBy(F.col("p_brand").alias("brand"))
            .agg(F.count("*").cast("long").alias("n_small_lines"),
                 F.round(F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
                         .cast("string").cast("double") / F.lit(7.0), 4)
                 .alias("avg_yearly")))


@register(
    "user_profile_similarity_topk",
    oracle="""
    WITH prof AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    anchor AS (SELECT event_type, n FROM prof WHERE user_id = 0),
    dots AS (
      SELECT p.user_id,
             CAST(SUM(p.n * a.n) AS BIGINT) AS dot
      FROM prof p JOIN anchor a ON p.event_type = a.event_type
      WHERE p.user_id <> 0
      GROUP BY p.user_id
    ),
    norms AS (
      SELECT user_id, SQRT(CAST(SUM(n * n) AS DOUBLE)) AS nrm
      FROM prof GROUP BY user_id
    ),
    scored AS (
      SELECT d.user_id,
             ROUND(d.dot / ((SELECT nrm FROM norms WHERE user_id = 0)
                            * n2.nrm), 6) AS cosine
      FROM dots d JOIN norms n2 ON d.user_id = n2.user_id
    )
    SELECT user_id, cosine,
           CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, user_id) AS BIGINT)
             AS rn
    FROM scored
    QUALIFY rn <= 10
    """,
    tags=("relational", "similarity"),
)
def user_profile_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral look-alikes: top-10 users most similar to user 0 by
    cosine over their event-type count profiles — the collaborative-
    filtering neighbor query, computed long-form (profile rows, not dense
    vectors).

    Scale: profiles are one aggregate; the anchor profile (≤ |types| rows)
    broadcasts into the dot-product join, so similarity against one
    anchor never shuffles the full profile table by anything but its own
    aggregate key. Dots and squared norms are exact integers; the cosine
    divides deterministic doubles, ranked after 6dp rounding.
    """
    ev = table(spark, sf_dir, "events")
    prof = (ev.groupBy("user_id", "event_type")
            .agg(F.count("*").alias("n")).cache())
    anchor = (prof.where(F.col("user_id") == 0)
              .select("event_type", F.col("n").alias("an")))
    norms = (prof.groupBy("user_id")
             .agg(F.sqrt(F.sum(F.col("n") * F.col("n")).cast("double"))
                  .alias("nrm")))
    a_nrm = norms.where(F.col("user_id") == 0).select(
        F.col("nrm").alias("anrm"))
    dots = (prof.where(F.col("user_id") != 0)
            .join(F.broadcast(anchor), "event_type")
            .groupBy("user_id")
            .agg(F.sum(F.col("n") * F.col("an")).cast("long").alias("dot")))
    scored = (dots.join(norms, "user_id")
              .crossJoin(F.broadcast(a_nrm))
              .select("user_id",
                      F.round(F.col("dot") / (F.col("anrm") * F.col("nrm")), 6)
                       .alias("cosine")))
    top = scored.orderBy(F.desc("cosine"), F.asc("user_id")).limit(10)
    w = Window.orderBy(F.desc("cosine"), F.asc("user_id"))
    out = (top.withColumn("rn", F.row_number().over(w).cast("long"))
           .select("user_id", "cosine", "rn"))
    # the profile cache feeds anchor/norms/dots; the top-10 is bounded —
    # materialize it hot, then release
    from .graph import materialize_release
    return materialize_release(out, [prof])


@register(
    "activity_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
    tags=("relational", "calendar"),
)
def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heatmap: event counts by ISO day-of-week x hour-of-day
    — the calendar-profile view behind load forecasting. One scan, a
    ≤168-cell aggregate."""
    ev = table(spark, sf_dir, "events")
    return (ev.groupBy(
        F.dayofweek(F.date_sub(F.col("ts"), 1)).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"))
        .agg(F.count("*").alias("n")))


@register(
    "benford_deviation",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(value AS DECIMAL(18,6)) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM events WHERE value >= 1
    ),
    obs AS (SELECT d, COUNT(*) AS n FROM digits GROUP BY d),
    tot AS (SELECT SUM(n) AS t FROM obs)
    SELECT obs.d,
           obs.n,
           ROUND(CAST(obs.n AS DOUBLE) / (SELECT t FROM tot), 6) AS observed_p,
           ROUND(LOG10(1.0 + 1.0 / obs.d), 6) AS benford_p
    FROM obs
    """,
    tags=("relational", "stats"),
)
def benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of ``value`` (>= 1) next to Benford's
    law expectation ``log10(1 + 1/d)`` — the forensic sanity check for
    fabricated or truncated measures (synthetic uniform values visibly
    violate it, by design). Digit extraction goes through a DECIMAL(18,6)
    string so both engines see the identical canonical text.

    Scale: one scan into a <=9-row aggregate."""
    ev = table(spark, sf_dir, "events").where(F.col("value") >= 1)
    d = (F.substring(F.col("value").cast("decimal(18,6)").cast("string"), 1, 1)
         .cast("long"))
    obs = ev.select(d.alias("d")).groupBy("d").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    return (obs.crossJoin(F.broadcast(tot))
            .select("d", "n",
                    F.round(F.col("n").cast("double") / F.col("t"), 6)
                     .alias("observed_p"),
                    F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d")), 6)
                     .alias("benford_p")))


@register(
    "fulfillment_lag_stats",
    oracle=f"""
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             CAST(epoch_us(MAX(l.l_shipdate)) - epoch_us(o.o_orderdate)
                  AS DOUBLE) / 86400e6 AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND({sql_dec_avg('days', 6)}, 4) AS mean_days,
           MIN(days) AS min_days, MAX(days) AS max_days
    FROM lag GROUP BY priority
    """,
    tags=("relational", "join", "lifecycle"),
)
def fulfillment_lag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-lifecycle duration: days from order date to the LAST lineitem
    shipment, summarized per priority — the fulfillment-SLA view (does
    priority actually predict speed?).

    Scale: one join shuffled on the order key, per-order max as a
    map-side-combined aggregate, then a |priorities|-row rollup; the day
    arithmetic runs on exact epoch micros and the mean in DECIMAL.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    per_order = (l.join(o, l.l_orderkey == o.o_orderkey)
                 .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
                 .agg(F.max("l_shipdate").alias("last_ship")))
    days = ((F.unix_micros("last_ship") - F.unix_micros("o_orderdate"))
            .cast("double") / F.lit(86400e6))
    lagd = per_order.select(F.col("o_orderpriority").alias("priority"),
                            days.alias("days"))
    return (lagd.groupBy("priority")
            .agg(F.count("*").cast("long").alias("n_orders"),
                 F.round(dec_avg("days", 6), 4).alias("mean_days"),
                 F.min("days").alias("min_days"),
                 F.max("days").alias("max_days")))


# ---------------------------------------------------------------------------
# Correlated-subquery shapes (TPC-H Q20/Q21/Q22 adapted to the fixture
# schema, which has no partsupp/receiptdate): the decorrelation patterns —
# aggregate-then-semi-join, exists/not-exists chains, scalar-subquery
# threshold — that Catalyst rewrites into joins. Each is the DataFrame
# form of the rewrite, so the plan is the decorrelated one BY CONSTRUCTION
# (no RewriteCorrelatedScalarSubquery risk at 100 TB).
# ---------------------------------------------------------------------------

@register(
    "dominant_part_suppliers",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(l_quantity) AS BIGINT) AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey,
             CAST(SUM(qty) AS BIGINT) AS total_qty,
             COUNT(*) AS n_supp
      FROM ps GROUP BY l_partkey
    ),
    dom AS (
      SELECT ps.l_suppkey, COUNT(*) AS n_dominated
      FROM ps JOIN tot USING (l_partkey)
      WHERE tot.n_supp >= 2 AND ps.qty * 2 > tot.total_qty
      GROUP BY ps.l_suppkey
    )
    SELECT s.s_name, n.n_name AS nation, dom.n_dominated
    FROM dom JOIN supplier s ON s.s_suppkey = dom.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY dom.n_dominated DESC, s.s_name ASC
    LIMIT 20
    """,
    tags=("relational", "join", "subquery"),
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (aggregate-then-semi): suppliers shipping >50% of a
    multi-supplier part's total quantity, counted per supplier. Two
    stacked aggregations on the SAME grouping prefix (part, supp) ->
    (part): the second agg reuses the first's shuffle partitioning, so
    only one exchange touches lineitem-scale data; everything after is
    (part x supp)-sized."""
    li = table(spark, sf_dir, "lineitem")
    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").cast("long").alias("qty")))
    tot = (ps.groupBy("l_partkey")
           .agg(F.sum("qty").alias("total_qty"), F.count("*").alias("n_supp")))
    dom = (ps.join(tot, "l_partkey")
           .where((F.col("n_supp") >= 2) &
                  (F.col("qty") * 2 > F.col("total_qty")))
           .groupBy("l_suppkey").agg(F.count("*").alias("n_dominated")))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (dom.join(F.broadcast(s), dom.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select("s_name", F.col("n_name").alias("nation"), "n_dominated")
            .orderBy(F.desc("n_dominated"), F.asc("s_name")).limit(20))


@register(
    "sole_late_suppliers",
    oracle="""
    WITH ol AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    stats AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             CAST(SUM(is_late) AS BIGINT) AS n_late
      FROM ol GROUP BY l_orderkey
    ),
    waiting AS (
      SELECT ol.l_suppkey
      FROM ol JOIN stats USING (l_orderkey)
      WHERE ol.is_late = 1 AND stats.n_supp >= 2 AND stats.n_late = 1
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM waiting w JOIN supplier s ON s.s_suppkey = w.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 20
    """,
    tags=("relational", "join", "subquery"),
)
def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (EXISTS + NOT EXISTS chain, decorrelated): suppliers that
    were the ONLY late shipper (>60 days after order date) in a
    multi-supplier order. The exists/not-exists pair becomes one
    per-order aggregate (supplier count, late count) joined back — one
    pass over lineitem instead of two correlated probes."""
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    late = (F.unix_micros("l_shipdate") >
            F.unix_micros(F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")))
    ol = (li.join(o, li.l_orderkey == o.o_orderkey)
          .groupBy("l_orderkey", "l_suppkey")
          .agg(F.max(late.cast("int")).alias("is_late")))
    stats = (ol.groupBy("l_orderkey")
             .agg(F.count("*").alias("n_supp"),
                  F.sum("is_late").alias("n_late")))
    waiting = (ol.join(stats, "l_orderkey")
               .where((F.col("is_late") == 1) & (F.col("n_supp") >= 2) &
                      (F.col("n_late") == 1)))
    s = table(spark, sf_dir, "supplier")
    return (waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
            .groupBy("s_name").agg(F.count("*").alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name")).limit(20))


@register(
    "idle_rich_customers",
    oracle="""
    WITH cutoff AS (
      SELECT (CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS VARCHAR)
                   AS DOUBLE) / COUNT(c_acctbal)) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(27,2))) AS VARCHAR)
                AS DOUBLE) AS total_bal
    FROM customer c CROSS JOIN cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    """,
    tags=("relational", "join", "subquery"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (scalar subquery + anti-join): never-ordered customers
    with above-average positive balance, rolled up by segment. The scalar
    average rides in as a broadcast 1-row cross join; the NOT EXISTS is an
    anti-join against distinct order keys (customers_without_orders
    discipline)."""
    cust = table(spark, sf_dir, "customer")
    cutoff = cust.where(F.col("c_acctbal") > 0).agg(
        dec_avg("c_acctbal", 2).alias("avg_bal"))
    okeys = (table(spark, sf_dir, "orders")
             .select(F.col("o_custkey").alias("c_custkey")).distinct())
    return (cust.crossJoin(F.broadcast(cutoff))
            .where(F.col("c_acctbal") > F.col("avg_bal"))
            .join(okeys, "c_custkey", "left_anti")
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n_custs"),
                 dec_sum("c_acctbal", 2).alias("total_bal")))


@register(
    "cube_priority_status_revenue",
    oracle="""
    SELECT COALESCE(o_orderpriority, '(all)') AS priority,
           COALESCE(o_orderstatus, '(all)') AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS VARCHAR)
                AS DOUBLE) AS revenue,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS BIGINT) AS grouping_level
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    tags=("relational", "olap"),
)
def cube_priority_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE (rollup_event_counts' sibling — all four grouping sets in
    one Expand pass): order counts + exact decimal revenue at (priority,
    status), (priority), (status) and () levels. Still ONE shuffle: Expand
    multiplies rows before the partial aggregate, so at scale the map-side
    combine sees 4x rows but the exchange still carries only group rows."""
    o = table(spark, sf_dir, "orders")
    return (o.cube("o_orderpriority", "o_orderstatus")
            .agg(F.count("*").alias("n"),
                 dec_sum("o_totalprice", 2).alias("revenue"),
                 (F.grouping("o_orderpriority") * 2 +
                  F.grouping("o_orderstatus")).cast("long")
                 .alias("grouping_level"))
            .select(F.coalesce("o_orderpriority", F.lit("(all)"))
                    .alias("priority"),
                    F.coalesce("o_orderstatus", F.lit("(all)"))
                    .alias("status"),
                    "n", "revenue", "grouping_level"))


@register(
    "forward_fill_values",
    oracle=f"""
    WITH f AS (
      SELECT user_id, value,
             last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS filled
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) FILTER (WHERE value IS NULL AND filled IS NOT NULL)
                AS BIGINT) AS n_filled,
           {sql_dec_sum('filled', 6)} AS sum_filled
    FROM f GROUP BY user_id
    """,
    tags=("relational", "window", "timeseries"),
)
def forward_fill_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling (forward-fill): each NULL value takes the user's most
    recent non-NULL observation in (ts, event_id) order — the sensor/
    telemetry imputation primitive. One window pass partitioned by user
    (`last IGNORE NULLS` over an unbounded-preceding frame; running state,
    no self-join, no explode); the same user-partitioned exchange the
    sessionization family rides, so at scale they share it."""
    ev = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    f = ev.select("user_id", "value",
                  F.last("value", ignorenulls=True).over(w).alias("filled"))
    return (f.groupBy("user_id")
            .agg(F.count(F.when(F.col("value").isNull() &
                                F.col("filled").isNotNull(), 1))
                 .alias("n_filled"),
                 dec_sum("filled", 6).alias("sum_filled")))


@register(
    "modal_bucket_by_type",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(LEAST(GREATEST(FLOOR(value / 10.0), 0), 9) AS BIGINT)
               AS bucket,
             COUNT(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type,
           arg_max(bucket, n * 16 + (9 - bucket)) AS modal_bucket,
           CAST(MAX(n) AS BIGINT) AS modal_n
    FROM b GROUP BY event_type
    """,
    tags=("relational", "agg"),
)
def modal_bucket_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (A3 at group granularity): the modal value bucket per
    event type, ties broken by lowest bucket. Two stacked aggregations on
    the same grouping prefix — the (type, bucket) shuffle is reused by the
    per-type argmax, and the second agg is |types|x|buckets|-sized. The
    argmax key is the single BIGINT ``n*16 + (9 - bucket)`` — distinct for
    every (n, bucket) pair since buckets span [0, 9] < 16 — so ``max_by``/
    ``arg_max`` tie-breaking (max n, then min bucket) is total-order
    deterministic in both engines without composite-key support."""
    ev = table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    bucket = (F.least(F.greatest(F.floor(F.col("value") / 10.0), F.lit(0)),
                      F.lit(9))).cast("long")
    b = (ev.groupBy("event_type", bucket.alias("bucket"))
         .agg(F.count("*").alias("n")))
    return (b.groupBy("event_type")
            .agg(F.max_by("bucket", F.col("n") * 16 + (9 - F.col("bucket")))
                 .alias("modal_bucket"),
                 F.max("n").alias("modal_n")))


# --- TPC-H Q8 shape: national market share by year ---------------------------

@register(
    "market_share_by_year",
    oracle=f"""
    WITH mkt AS (
      SELECT l.l_suppkey, o.o_orderdate,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    tagged AS (
      SELECT CAST(year(m.o_orderdate) AS BIGINT) AS o_year, m.rev,
             CASE WHEN sn.n_name = 'NATION_2' THEN m.rev ELSE 0.0 END AS trev
      FROM mkt m
      JOIN supplier s ON s.s_suppkey = m.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    )
    SELECT o_year,
           {sql_dec_sum('trev', 6)} AS nation_revenue,
           {sql_dec_sum('rev', 6)} AS market_revenue,
           ROUND({sql_dec_sum('trev', 6)} / {sql_dec_sum('rev', 6)}, 6)
             AS mkt_share
    FROM tagged GROUP BY o_year
    """,
    tags=("relational", "join", "tpch"),
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_2's share of the ASIA market's revenue per
    order year — the 6-table star (fact x orders x customer-side dims x
    supplier-side dims) with a conditional share aggregate. Dimension
    tables broadcast; the only data-sized shuffles are the two fact-side
    equi-joins and the |years|-row aggregate. Shares divide two
    decimal-exact sums, so the doubles hash bit-identically."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")

    asia_nations = (n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
                           n.n_regionkey == r.r_regionkey)
                    .select("n_nationkey"))
    mkt_cust = c.join(F.broadcast(asia_nations),
                      c.c_nationkey == asia_nations.n_nationkey)\
                .select("c_custkey")
    supp_nat = (table(spark, sf_dir, "supplier")
                .select("s_suppkey", "s_nationkey")
                .join(F.broadcast(n.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("sn_name"))),
                    F.col("s_nationkey") == F.col("sn_key"))
                .select("s_suppkey", "sn_name"))

    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(mkt_cust, o.o_custkey == mkt_cust.c_custkey)
         .join(F.broadcast(supp_nat), li.l_suppkey == supp_nat.s_suppkey)
         .select(F.year("o_orderdate").cast("long").alias("o_year"),
                 rev.alias("rev"),
                 F.when(F.col("sn_name") == "NATION_2", rev)
                  .otherwise(F.lit(0.0)).alias("trev")))
    return (j.groupBy("o_year")
            .agg(dec_sum("trev", 6).alias("nation_revenue"),
                 dec_sum("rev", 6).alias("market_revenue"))
            .select("o_year", "nation_revenue", "market_revenue",
                    F.round(F.col("nation_revenue") / F.col("market_revenue"),
                            6).alias("mkt_share")))


# --- TPC-H Q2 shape: cheapest observed supplier per part ---------------------

@register(
    "cheapest_supplier_per_part",
    oracle="""
    WITH scoped AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice / l.l_quantity AS u
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_size >= 40 AND l.l_quantity > 0
    ),
    mins AS (SELECT l_partkey, MIN(u) AS mu FROM scoped GROUP BY l_partkey),
    winners AS (
      SELECT DISTINCT sc.l_partkey AS p_partkey, sc.l_suppkey AS s_suppkey,
             m.mu
      FROM scoped sc
      JOIN mins m ON m.l_partkey = sc.l_partkey AND sc.u = m.mu
    )
    SELECT w.p_partkey, p.p_brand, w.s_suppkey,
           ROUND(w.mu, 6) AS min_unit_price
    FROM winners w JOIN part p ON p.p_partkey = w.p_partkey
    ORDER BY ROUND(w.mu, 6) ASC, w.p_partkey ASC, w.s_suppkey ASC
    LIMIT 20
    """,
    tags=("relational", "join", "tpch"),
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, adapted to the fixture's tables (no partsupp — the
    observed lineitem unit price l_extendedprice / l_quantity stands in for
    ps_supplycost): for large EUROPE-supplied parts, every supplier that
    achieves the part's MINIMUM unit price. The classic correlated
    min-subquery, decorrelated as aggregate + join-back on (partkey,
    exact min) — both engines compute u with the identical IEEE division,
    so the equality join matches bit-for-bit; output ordering keys on the
    ROUNDED price. Dimension joins broadcast; the join-back reuses the
    partkey hash partitioning the aggregate just produced."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")

    eu_supp = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
               .join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
                     n.n_regionkey == r.r_regionkey)
               .select("s_suppkey"))
    big_parts = p.where(F.col("p_size") >= 40).select("p_partkey", "p_brand")
    scoped = (li.where(F.col("l_quantity") > 0)
              .join(F.broadcast(eu_supp), li.l_suppkey == eu_supp.s_suppkey)
              .join(F.broadcast(big_parts.select("p_partkey")),
                    li.l_partkey == F.col("p_partkey"))
              .select("l_partkey", "l_suppkey",
                      (F.col("l_extendedprice") / F.col("l_quantity"))
                      .alias("u")))
    mins = scoped.groupBy("l_partkey").agg(F.min("u").alias("mu"))
    winners = (scoped.join(mins, "l_partkey")
               .where(F.col("u") == F.col("mu"))
               .select(F.col("l_partkey").alias("p_partkey"),
                       F.col("l_suppkey").alias("s_suppkey"), "mu")
               .distinct())
    return (winners.join(F.broadcast(big_parts), "p_partkey")
            .select("p_partkey", "p_brand", "s_suppkey",
                    F.round("mu", 6).alias("min_unit_price"))
            .orderBy(F.asc("min_unit_price"), F.asc("p_partkey"),
                     F.asc("s_suppkey"))
            .limit(20))


@register(
    "disjunctive_bracket_revenue",
    oracle=f"""
    SELECT CASE WHEN p.p_brand = 'Brand#12' THEN 'small'
                WHEN p.p_brand = 'Brand#23' THEN 'medium'
                ELSE 'large' END AS bracket,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)', 6)} AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY bracket
    """,
    tags=("relational", "tpch", "join"),
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: discounted revenue under an OR-of-ANDs predicate
    that references BOTH join sides (brand x size on part, quantity on
    lineitem), grouped by bracket. The disjunction itself cannot be pushed
    below the join, so the plan hoists the per-side IMPLIED conjuncts —
    ``p_brand IN (...)`` onto the part scan and the quantity envelope
    ``BETWEEN 1 AND 30`` onto the lineitem scan — explicitly (Catalyst does
    not factor disjunctions across join inputs); at 100 TB the envelope
    predicate is what reaches the parquet row-group stats and prunes the
    fact scan, while the residual OR evaluates post-join on the survivors.

    Scale: part (pre-filtered to 3 brands) is a broadcast dim, so the fact
    side never shuffles; the 3-group aggregate is map-side combined; money
    arithmetic is DECIMAL-exact (functions/numeric.py).
    """
    p = (table(spark, sf_dir, "part")
         .select("p_partkey", "p_brand", "p_size")
         .where(F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")))
    li = (table(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .where(F.col("l_quantity").between(1, 30)))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b1 = ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
          & F.col("l_quantity").between(1, 11))
    b2 = ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
          & F.col("l_quantity").between(10, 20))
    b3 = ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
          & F.col("l_quantity").between(20, 30))
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    bracket = (F.when(F.col("p_brand") == "Brand#12", "small")
               .when(F.col("p_brand") == "Brand#23", "medium")
               .otherwise("large"))
    return (j.where(b1 | b2 | b3)
            .groupBy(bracket.alias("bracket"))
            .agg(F.count("*").cast("long").alias("n_lines"),
                 dec_sum(disc, 6).alias("revenue")))


# --- TPC-H shapes round 3b: Q6/Q7/Q10/Q13/Q14/Q15/Q18 -----------------------

@register(
    "forecast_revenue_delta",
    oracle=f"""
    SELECT {sql_dec_sum('l_extendedprice * l_discount', 4)} AS revenue_delta,
           COUNT(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "tpch"),
)
def forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue delta of dropping mid-range
    discounts — a pure scan-filter-aggregate with NO join and NO shuffle
    beyond the 1-row partial-agg exchange. All three predicates (date
    range, discount band, quantity cap) reach the parquet row-group stats,
    so at 100 TB this reads only the row groups whose min/max overlap the
    window: the canonical pushdown benchmark."""
    li = table(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                     & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
                     & F.col("l_discount").between(0.05, 0.07)
                     & (F.col("l_quantity") < 24))
              .agg(dec_sum(F.col("l_extendedprice") * F.col("l_discount"), 4)
                   .alias("revenue_delta"),
                   F.count("*").alias("n_lineitems")))


@register(
    "nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
           {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)', 6)} AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_nationkey <> nc.n_nationkey
    GROUP BY ns.n_name, nc.n_name, EXTRACT(YEAR FROM l.l_shipdate)
    """,
    tags=("relational", "tpch", "join"),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border shipping volume per (supplier nation,
    customer nation, year). Every dimension side (supplier, customer,
    nation x2) is broadcast, so the only shuffle on the fact table is the
    lineitem |> orders key join and the final bounded (25 x 25 x years)
    aggregate. The intra-national rows are dropped BEFORE aggregation via
    the nationkey inequality."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(ns), s.s_nationkey == F.col("s_nk"))
             .join(F.broadcast(nc), c.c_nationkey == F.col("c_nk"))
             .where(F.col("s_nk") != F.col("c_nk"))
             .groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").cast("long").alias("ship_year"))
             .agg(dec_sum(rev, 6).alias("volume")))


@register(
    "returned_item_losses",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)', 6)} AS lost_revenue,
           COUNT(*) AS n_returned
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("relational", "tpch", "join"),
)
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers with the most revenue lost to
    returns in a one-year window. The returnflag filter prunes the fact
    scan, the date filter prunes orders BEFORE the join, customer/nation
    broadcast, and the top-20 is TakeOrderedAndProject (per-partition
    partial top-k), never a global sort."""
    l = (table(spark, sf_dir, "lineitem")
         .where(F.col("l_returnflag") == "R"))
    o = (table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))))
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .groupBy("c_custkey", "c_name", "n_name")
             .agg(dec_sum(rev, 6).alias("lost_revenue"),
                  F.count("*").alias("n_returned"))
             .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
             .limit(20))


@register(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
    tags=("relational", "tpch", "join"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts,
    INCLUDING zero-order customers (left join; COUNT over the nullable
    right key). Two cascaded aggregations, both map-side combinable; the
    second input is at most |customer| rows of two integers."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                 .groupBy("c_custkey")
                 .agg(F.count("o_orderkey").alias("n_orders")))
    return (per_cust.groupBy("n_orders")
            .agg(F.count("*").alias("n_customers")))


@register(
    "promo_revenue_share",
    oracle=f"""
    WITH yr AS (
      SELECT CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
             {sql_dec_sum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END", 6)} AS promo_revenue,
             {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)', 6)} AS total_revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY EXTRACT(YEAR FROM l.l_shipdate)
    )
    SELECT ship_year, promo_revenue, total_revenue,
           ROUND(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
    FROM yr
    """,
    tags=("relational", "tpch", "join"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the yearly share of revenue from PROMO-type parts.
    One broadcast join, one bounded-group aggregate; the conditional sum
    folds the CASE into the same partial aggregation pass, so promo and
    total revenue cost ONE scan, not two. The percentage divides the two
    already-exact decimal sums, identically on both engines."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    yr = (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
           .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
           .agg(dec_sum(promo, 6).alias("promo_revenue"),
                dec_sum(rev, 6).alias("total_revenue")))
    return yr.select(
        "ship_year", "promo_revenue", "total_revenue",
        F.round(F.lit(100.0) * F.col("promo_revenue")
                / F.col("total_revenue"), 6).alias("promo_pct"))


@register(
    "top_supplier_by_revenue",
    oracle=f"""
    WITH srev AS (
      SELECT s.s_suppkey, s.s_name,
             {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)', 6)} AS total_revenue
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1996-04-01'
      GROUP BY s.s_suppkey, s.s_name
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM srev WHERE total_revenue = (SELECT MAX(total_revenue) FROM srev)
    """,
    tags=("relational", "tpch", "join"),
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum quarterly
    revenue — ALL ties kept, per the spec's view-based formulation. The
    per-supplier revenue table (at most |supplier| rows) is computed once
    and reused for both the max and the filter via a 1-row broadcast
    cross join, not a SinglePartition global window."""
    l = (table(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    srev = (l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .groupBy("s_suppkey", "s_name")
             .agg(dec_sum(rev, 6).alias("total_revenue")))
    mx = srev.agg(F.max("total_revenue").alias("max_revenue"))
    return (srev.crossJoin(F.broadcast(mx))
            .where(F.col("total_revenue") == F.col("max_revenue"))
            .select("s_suppkey", "s_name", "total_revenue"))


@register(
    "large_volume_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           {sql_dec_sum('l.l_quantity', 2)} AS sum_qty
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    tags=("relational", "tpch", "join"),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, with their customer. The HAVING subquery is ONE aggregation
    over (l_orderkey, qty) that is then semi-joined back — Spark gets it
    as an inner join against the aggregated key set, so lineitem is
    scanned twice but shuffled on the same key both times (AQE reuses the
    exchange where stats allow). Customer is broadcast."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (l.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("big_qty"))
            .where(F.col("big_qty") > 250)
            .select("l_orderkey"))
    return (o.join(big.withColumnRenamed("l_orderkey", "bk"),
                   o.o_orderkey == F.col("bk"), "left_semi")
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(l, o.o_orderkey == l.l_orderkey)
             .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                      "o_totalprice")
             .agg(dec_sum("l_quantity", 2).alias("sum_qty")))


@register(
    "late_exists_priority_counts",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("relational", "tpch", "join"),
)
def late_exists_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (reshaped to this schema's columns: the spec's
    commitdate<receiptdate EXISTS becomes shipdate > orderdate+30d): count
    orders per priority that had at least one late line. The correlated
    EXISTS compiles to a LEFT SEMI hash join on o_orderkey with the date
    inequality as a join residual — one pass over each table, no distinct,
    no subquery re-execution, and the half-year filter prunes the orders
    scan before the shuffle."""
    o = (table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))))
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(l, (o.o_orderkey == l.l_orderkey)
                  & (l.l_shipdate > F.date_add(o.o_orderdate, 30)),
                  "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders")))


@register(
    "nation_profit_by_year",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
           {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)'
                        ' - 0.6 * p.p_retailprice * l.l_quantity', 6)}
             AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, EXTRACT(YEAR FROM l.l_shipdate)
    """,
    tags=("relational", "tpch", "join"),
)
def nation_profit_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supplycost proxied as 60% of p_retailprice — this
    schema has no partsupp table): profit on '%gear%' parts per supplier
    nation and ship year. The part-name filter lands on the BROADCAST side
    and shrinks the fact join to matching partkeys before any shuffle;
    supplier and nation broadcast too, so lineitem is never repartitioned
    — the only exchange is the bounded (25 x years) final aggregate."""
    l = table(spark, sf_dir, "lineitem")
    p = (table(spark, sf_dir, "part")
         .where(F.col("p_name").contains("gear"))
         .select("p_partkey", "p_retailprice"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
              - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"))
    return (l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
             .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .groupBy(F.col("n_name").alias("nation"),
                      F.year("l_shipdate").cast("long").alias("ship_year"))
             .agg(dec_sum(profit, 6).alias("profit")))


@register(
    "important_part_value",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey,
             {sql_dec_sum('l.l_extendedprice * l.l_quantity', 4)} AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_acctbal >= 0
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value
    FROM pv
    WHERE value > (SELECT 1.5 * {sql_dec_sum('value', 4)} / COUNT(*) FROM pv)
    """,
    tags=("relational", "tpch", "join"),
)
def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose inventory value (over solvent
    suppliers) exceeds a GLOBAL-AGGREGATE cutoff — 1.5x the mean per-part
    value (the spec's fixed fraction-of-total goes vacuous as the part
    count grows: 0.001 of total is 20x the average at 20k parts and
    nothing qualifies; mean-relative keeps the selectivity scale-stable
    — 1.5x selects 4 / 53 / 607 parts at sf0.001/0.01/0.1).
    The per-part value table is computed once; the cutoff is a 1-row
    aggregate of it that re-enters as a broadcast scalar cross join —
    never a SinglePartition window, and the base aggregation is not
    recomputed for the subquery (Spark reuses the exchange under AQE)."""
    l = table(spark, sf_dir, "lineitem")
    s = (table(spark, sf_dir, "supplier")
         .where(F.col("s_acctbal") >= 0).select("s_suppkey"))
    pv = (l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
           .groupBy("l_partkey")
           .agg(dec_sum(F.col("l_extendedprice") * F.col("l_quantity"), 4)
                .alias("value")))
    # decimal-exact numerator: a float AVG's partial-sum order could flip
    # a part sitting exactly on the cutoff between engines
    total = pv.agg((F.lit(1.5) * dec_sum("value", 4) / F.count("*"))
                   .alias("cutoff"))
    return (pv.crossJoin(F.broadcast(total))
            .where(F.col("value") > F.col("cutoff"))
            .select("l_partkey", "value"))


@register(
    "part_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_size IN (1, 5, 11, 17, 23, 29, 35, 41)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("relational", "tpch", "join"),
)
def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    for a part subset, excluding blacklisted suppliers (the spec's NOT IN
    complaint-supplier subquery becomes an acctbal<0 exclusion). The
    NOT IN is a broadcast LEFT ANTI join (the blacklist is tiny and
    null-free by construction); part prunes on the broadcast side; the
    COUNT(DISTINCT) is Spark's two-phase expand — partial distinct
    map-side, so the shuffle carries (group, suppkey) pairs, not rows."""
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (table(spark, sf_dir, "part")
         .where((F.col("p_brand") != "Brand#2")
                & F.col("p_size").isin(1, 5, 11, 17, 23, 29, 35, 41))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (table(spark, sf_dir, "supplier")
           .where(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey,
                   "left_anti")
             .join(F.broadcast(p), l.l_partkey == p.p_partkey)
             .groupBy("p_brand", "p_type", "p_size")
             .agg(F.count_distinct("l_suppkey").cast("long")
                  .alias("supplier_cnt")))


@register(
    "time_rollup_revenue",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           CASE WHEN GROUPING(EXTRACT(YEAR FROM o_orderdate)) = 1 THEN 'total'
                WHEN GROUPING(EXTRACT(MONTH FROM o_orderdate)) = 1 THEN 'year'
                ELSE 'month' END AS level,
           {sql_dec_sum('o_totalprice', 4)} AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS (
      (EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)),
      (EXTRACT(YEAR FROM o_orderdate)),
      ())
    """,
    tags=("relational", "agg"),
)
def time_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup via GROUPING SETS: month, year, and grand
    total aggregates of order revenue in ONE Expand pass over the scan —
    the multi-granularity dashboard query that would otherwise be three
    scans unioned. The `level` label derives from the grouping-null
    pattern (CASE over GROUPING bits in SQL, the same Expand-generated
    nulls in Spark), keeping both engines' semantics aligned without
    relying on their differing grouping_id bit orders. Partial
    aggregation applies per grouping set, so the shuffle carries at most
    (sets x groups) combined rows."""
    o = table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("long").alias("order_year")
    mo = F.month("o_orderdate").cast("long").alias("order_month")
    base = o.select(yr, mo, "o_totalprice")
    level = (F.when(F.grouping("order_year") == 1, F.lit("total"))
             .when(F.grouping("order_month") == 1, F.lit("year"))
             .otherwise(F.lit("month")).alias("level"))
    return (base.groupingSets([["order_year", "order_month"],
                               ["order_year"], []],
                              "order_year", "order_month")
            .agg(level,
                 dec_sum("o_totalprice", 4).alias("revenue"),
                 F.count("*").alias("n_orders"))
            .select("order_year", "order_month", "level", "revenue",
                    "n_orders"))


@register(
    "props_variant_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT)
             AS n_with_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS max_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    tags=("relational", "json", "variant"),
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payload stats through Spark 4's VARIANT type:
    ``try_parse_json`` decodes each ``props`` string ONCE into the binary
    variant encoding, and ``try_variant_get`` extracts the typed field
    without re-tokenizing JSON text per access — at 100 TB this is the
    difference between parsing the payload N times for N extractions
    (the ``get_json_object`` pattern) and shredding it once into a
    columnar-friendly binary the executor slices per field. Totals per
    event_type: row count, rows carrying the field, min/max/sum.

    ``json_props_flatten`` (P1) keeps the reference's from_json shape; this
    is its modern-engine twin over the same payload."""
    ev = table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.count("k").cast("long").alias("n_with_k"),
                 F.min("k").cast("long").alias("min_k"),
                 F.max("k").cast("long").alias("max_k"),
                 F.sum("k").cast("long").alias("sum_k")))


# --- round 4: the two remaining TPC-H shapes (Q5, Q12) -----------------------

@register(
    "local_supplier_revenue",
    oracle=f"""
    SELECT n.n_name,
           {sql_dec_sum('l.l_extendedprice * (1.0 - l.l_discount)', 6)}
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("relational", "tpch", "join"),
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (the last-but-one missing of the 22): revenue from
    orders where the supplier and the customer share a nation, per nation
    within one region and one order year. Completes the TPC-H surface
    together with ``linestatus_priority_counts``.

    Plan: the region -> nation chain reduces to a broadcast 5-key semi
    filter BEFORE the fact joins; supplier and customer broadcast; the only
    fact-fact shuffle is lineitem |> orders on orderkey, with the order
    date window pruning orders ahead of it. The co-nation equality rides
    the supplier broadcast join as a second key, never a post-join
    filter over the full cross product."""
    l = table(spark, sf_dir, "lineitem")
    o = (table(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))))
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = (table(spark, sf_dir, "region")
         .where(F.col("r_name") == "ASIA"))
    nr = (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
          .select("n_nationkey", "n_name"))
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(s),
                   (l.l_suppkey == s.s_suppkey)
                   & (c.c_nationkey == s.s_nationkey))
             .join(F.broadcast(nr), s.s_nationkey == nr.n_nationkey)
             .groupBy("n_name")
             .agg(dec_sum(rev, 6).alias("revenue")))


@register(
    "linestatus_priority_counts",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1997-01-01'
    GROUP BY l.l_linestatus
    """,
    tags=("relational", "tpch", "join"),
)
def linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape, adapted to the fixture's column set (no
    ``l_shipmode``/commit/receipt dates -> group by ``l_linestatus`` over a
    ship-date year window): the two-branch conditional aggregation — count
    urgent/high-priority vs other orders per group. The ship-date filter
    prunes the lineitem scan (PushedFilters), the priority CASE is pure
    column algebra on the probe side of the orderkey join, and the final
    aggregate is 2 groups x 2 longs."""
    l = (table(spark, sf_dir, "lineitem")
         .where((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))))
    o = table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (l.join(o, l.l_orderkey == o.o_orderkey)
             .groupBy("l_linestatus")
             .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("long")
                   .alias("high_line_count"),
                  F.sum(F.when(~hi, 1).otherwise(0)).cast("long")
                   .alias("low_line_count")))


@register(
    "open_orders_backlog",
    oracle="""
    WITH span AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start_day,
             CAST(MAX(l.l_shipdate) AS DATE) AS end_day
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
      SELECT start_day AS day, 1 AS d FROM span
      UNION ALL
      SELECT end_day AS day, -1 AS d FROM span
    ),
    daily AS (SELECT day, CAST(SUM(d) AS BIGINT) AS d FROM deltas GROUP BY day)
    SELECT day, CAST(SUM(d) OVER (ORDER BY day) AS BIGINT) AS open_orders
    FROM daily
    """,
    tags=("relational", "temporal", "sweep"),
)
def open_orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog — interval counting WITHOUT a per-day
    interval join: each order contributes +1 on its order day and -1 on
    its last-ship day, and the running sum of the per-day deltas IS the
    number of concurrently open orders (the sweep-line/stabbing-count
    identity). The naive form joins every calendar day against every
    interval (days x orders work at 100 TB); this is one fact aggregate
    to |days| delta rows plus a window over that bounded, calendar-sized
    table.

    Half-open [order_day, last_ship_day): a same-day-shipped order nets
    zero. The final running sum runs over <= a few thousand day rows —
    bounded by the calendar, not the data."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    span = (l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.max("l_shipdate").alias("last_ship"))
            .select(F.to_date("o_orderdate").alias("start_day"),
                    F.to_date("last_ship").alias("end_day")))
    deltas = (span.select(F.col("start_day").alias("day"), F.lit(1).alias("d"))
              .unionByName(span.select(F.col("end_day").alias("day"),
                                       F.lit(-1).alias("d"))))
    daily = deltas.groupBy("day").agg(F.sum("d").cast("long").alias("d"))
    w = (Window.orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return daily.select("day", F.sum("d").over(w).cast("long")
                        .alias("open_orders"))


# --- round 5: concentration + trend analytics --------------------------------

#: revenue in integer CENTS: o_totalprice is a double holding an exact
#: 2-dp value, so ROUND(x*100) -> BIGINT is exact in both engines and every
#: downstream sum/product is integer arithmetic — the rank-weighted Gini
#: sum and the OLS moment sums below stay bit-identical without the
#: decimal-sum detour (products of decimals would outgrow DECIMAL(38,_)).
_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@register(
    "revenue_gini_by_nation",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey, CAST(SUM({_CENTS}) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT n.n_name, r.rev_cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY n.n_name
                   ORDER BY r.rev_cents, r.o_custkey) AS BIGINT) AS rk
      FROM rev r
      JOIN customer c ON c.c_custkey = r.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           (2.0 * CAST(SUM(rk * rev_cents) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(rev_cents) AS DOUBLE))
             - (CAST(COUNT(*) AS DOUBLE) + 1.0) / CAST(COUNT(*) AS DOUBLE)
             AS gini
    FROM ranked GROUP BY 1
    """,
    tags=("relational", "concentration", "window"),
)
def revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue within each nation —
    the concentration question ("is our revenue a few whales or a broad
    base?") behind the reference's top-N share ratio (A7), upgraded to the
    full Lorenz statistic: G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over
    ascending-ranked x. Customers with no orders are out of frame (inner
    join); the (rev, custkey) tiebreak fixes the rank order, and equal
    revenues contribute the same rank-weighted sum under any permutation,
    so the result is deterministic.

    Scale: rank windows partition by NATION — bounded fan-in per task at
    ~1/25 of customers; for a degenerate partition cardinality compose with
    the quantile_buckets two-phase rank (scale.global_value_rank) instead.
    All sums are exact int64 cents; the final expression is IEEE-identical
    across engines."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    rev = (table(spark, sf_dir, "orders")
           .groupBy("o_custkey")
           .agg(F.sum(cents).cast("long").alias("rev_cents")))
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ranked = (rev.join(cust, rev.o_custkey == cust.c_custkey)
              .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
              .select("n_name", "rev_cents", "o_custkey"))
    w = Window.partitionBy("n_name").orderBy("rev_cents", "o_custkey")
    r = ranked.withColumn("rk", F.row_number().over(w).cast("long"))
    g = r.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("rev_cents").cast("long").alias("s"),
        F.sum(F.col("rk") * F.col("rev_cents")).cast("long").alias("s1"))
    nd = F.col("n_customers").cast("double")
    gini = ((F.lit(2.0) * F.col("s1").cast("double"))
            / (nd * F.col("s").cast("double"))
            - (nd + F.lit(1.0)) / nd)
    return g.select("n_name", "n_customers", gini.alias("gini"))


@register(
    "nation_revenue_trend",
    oracle=f"""
    WITH daily AS (
      SELECT n.n_name,
             CAST(date_diff('day', DATE '1995-01-01',
                            CAST(o.o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(SUM({_CENTS}) AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y) AS DOUBLE)
              - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
           / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x) AS DOUBLE)
              - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
           / 100.0 AS slope_dollars_per_day
    FROM daily GROUP BY 1
    """,
    tags=("relational", "trend", "regression"),
)
def nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS slope of daily order revenue over time (dollars/day)
    — "which markets are growing?" as one aggregate. REGR_SLOPE exists in
    both engines but sums doubles in engine-specific order; this computes
    the same closed form n*Sxy - Sx*Sy / (n*Sxx - Sx^2) from EXACT integer
    moment sums (day index x, daily cents y), so the slope is bit-identical
    across engines — the same doctrine as functions/numeric.py, extended
    to second moments via the cents trick.

    Scale: two map-side-combinable aggregates (nation x day, then nation);
    the moment sums make every regression over any group-by a single
    shuffle — no per-group sorting, no window."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    x = F.datediff(F.to_date("o_orderdate"),
                   F.lit("1995-01-01").cast("date")).cast("long")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders")
    daily = (o.join(cust, o.o_custkey == cust.c_custkey)
             .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
             .groupBy("n_name", x.alias("x"))
             .agg(F.sum(cents).cast("long").alias("y")))
    m = daily.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"))
    nd = F.col("n_days").cast("double")
    slope = ((nd * F.col("sxy").cast("double")
              - F.col("sx").cast("double") * F.col("sy").cast("double"))
             / (nd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double"))
             / F.lit(100.0))
    return m.select("n_name", "n_days", slope.alias("slope_dollars_per_day"))


@register(
    "revenue_autocorrelation",
    oracle=f"""
    WITH rev AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM({_CENTS}) AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    lags AS (SELECT unnest(generate_series(0, 14)) AS lag),
    j AS (
      SELECT l.lag, a.y AS x, b.y AS y
      FROM lags l
      JOIN rev a ON TRUE
      JOIN rev b ON b.day = a.day + CAST(l.lag AS INTEGER)
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           (CAST(COUNT(*) AS DOUBLE)
              * CAST(CAST(SUM(CAST(x AS HUGEINT) * y) AS VARCHAR) AS DOUBLE)
            - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
           / SQRT(
             (CAST(COUNT(*) AS DOUBLE)
                * CAST(CAST(SUM(CAST(x AS HUGEINT) * x) AS VARCHAR) AS DOUBLE)
              - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
             * (CAST(COUNT(*) AS DOUBLE)
                * CAST(CAST(SUM(CAST(y AS HUGEINT) * y) AS VARCHAR) AS DOUBLE)
              - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE)))
           AS r
    FROM j GROUP BY 1
    """,
    tags=("relational", "trend", "autocorrelation"),
)
def revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily revenue series at lags 0..14 — the
    seasonality detector (a weekly cycle shows as a peak at lag 7; lag 0
    is the r=1 sanity row). Same exact-moment doctrine as
    nation_revenue_trend, extended to PRODUCTS OF PAIRED OBSERVATIONS:
    the day-lag pairing is an equi-join on a calendar key (never a
    window), the second-moment sums go through DECIMAL because sum(y*y)
    overflows int64 on cents-scaled revenue, and the Pearson closed form
    then runs on bit-identical doubles in both engines.

    Scale: the daily aggregate is calendar-sized regardless of order
    volume; the 15x lag expansion is a compile-time constant on that
    calendar-sized table; one equi-join + one 15-group moment aggregate.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    rev = (table(spark, sf_dir, "orders")
           .groupBy(F.to_date("o_orderdate").alias("day"))
           .agg(F.sum(cents).cast("long").alias("y")))
    a = rev.select(
        F.explode(F.sequence(F.lit(0), F.lit(14))).alias("lag"),
        F.col("day"), F.col("y").alias("x"))
    b = rev.select(F.col("day").alias("bday"), "y")
    j = a.join(b, F.date_add(F.col("day"), F.col("lag")) == F.col("bday"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = j.groupBy(F.col("lag").cast("long").alias("lag")).agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(dec("x") * F.col("y")).cast("string").cast("double")
         .alias("sxy"),
        F.sum(dec("x") * F.col("x")).cast("string").cast("double")
         .alias("sxx"),
        F.sum(dec("y") * F.col("y")).cast("string").cast("double")
         .alias("syy"))
    nd = F.col("n_days").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    r = ((nd * F.col("sxy") - sxd * syd)
         / F.sqrt((nd * F.col("sxx") - sxd * sxd)
                  * (nd * F.col("syy") - syd * syd)))
    return m.select("lag", "n_days", r.alias("r"))


@register(
    "dow_seasonality_index",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
             CAST(SUM({_CENTS}) AS BIGINT) AS y
      FROM orders GROUP BY 1, 2
    ),
    g AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(y) AS BIGINT) AS s
          FROM daily GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_days) AS BIGINT) AS nd,
                   CAST(SUM(s) AS BIGINT) AS st FROM g)
    SELECT g.dow, g.n_days,
           (CAST(g.s AS DOUBLE) / CAST(g.n_days AS DOUBLE))
             / (CAST(t.st AS DOUBLE) / CAST(t.nd AS DOUBLE))
             AS seasonal_index
    FROM g CROSS JOIN tot t
    """,
    tags=("relational", "trend", "seasonality"),
)
def dow_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index of daily revenue: mean revenue on ISO
    weekday d divided by the overall daily mean (index 1.0 = flat; the
    quantification companion to revenue_autocorrelation, which only
    DETECTS the cycle). ISO day numbering is aligned explicitly —
    Spark's weekday() is 0=Monday, DuckDB's isodow() is 1=Monday — and
    all sums are exact int cents, so both ratios-of-means divide
    bit-identical doubles.

    Scale: two map-side-combinable aggregates (calendar-sized daily
    table, then 7 groups) + a 1-row grand-total broadcast."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = (table(spark, sf_dir, "orders")
             .groupBy(F.to_date("o_orderdate").alias("day"),
                      (F.weekday(F.to_date("o_orderdate")) + 1).cast("long")
                      .alias("dow"))
             .agg(F.sum(cents).cast("long").alias("y")))
    g = daily.groupBy("dow").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("s"))
    tot = g.agg(F.sum("n_days").cast("long").alias("nd"),
                F.sum("s").cast("long").alias("st"))
    idx = ((F.col("s").cast("double") / F.col("n_days").cast("double"))
           / (F.col("st").cast("double") / F.col("nd").cast("double")))
    return (g.crossJoin(F.broadcast(tot))
            .select("dow", "n_days", idx.alias("seasonal_index")))


@register(
    "nation_revenue_theilsen",
    oracle=f"""
    WITH monthly AS (
      SELECT n.n_name,
             CAST(YEAR(CAST(o.o_orderdate AS DATE)) * 12
                  + MONTH(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS x,
             CAST(SUM({_CENTS}) AS BIGINT) AS y
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.n_name,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
      FROM monthly a
      JOIN monthly b ON b.n_name = a.n_name AND b.x > a.x
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(quantile_cont(s, 0.5) / 100.0, 6)
             AS theilsen_dollars_per_month
    FROM pairs GROUP BY 1
    """,
    tags=("relational", "trend", "regression", "robust"),
)
def nation_revenue_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: per nation, the MEDIAN of all pairwise
    slopes of the monthly revenue series — the outlier-resistant
    companion to ``nation_revenue_trend``'s OLS slope (one promo-spike
    month drags an OLS fit; the median slope ignores it, which is why
    Theil-Sen is the standard robust trend in monitoring pipelines).

    Exactness: the monthly series is integer (month index, cents), each
    pairwise slope is one double division of exact integers (identical
    in both engines), and the median is the interpolated-percentile
    parity precedent over a per-nation bounded group.

    Scale: the pairwise self-join runs over the MONTHLY AGGREGATE —
    |nations| x |months| rows (calendar-bounded at ANY corpus size, ~2k
    rows at 100 TB just as here), never raw orders; the only fact-sized
    work is the first map-side-combinable aggregate. The quadratic
    pair count is quadratic in MONTHS (84 -> ~3.5k pairs/nation), the
    standard way Theil-Sen stays exact at scale without sampling."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    x = (F.year(F.to_date("o_orderdate")) * 12
         + F.month(F.to_date("o_orderdate"))).cast("long")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders")
    monthly = (o.join(cust, o.o_custkey == cust.c_custkey)
               .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
               .groupBy("n_name", x.alias("x"))
               .agg(F.sum(cents).cast("long").alias("y")))
    a = monthly.select("n_name", F.col("x").alias("x1"),
                       F.col("y").alias("y1"))
    b = monthly.select("n_name", F.col("x").alias("x2"),
                       F.col("y").alias("y2"))
    pairs = (a.join(b, "n_name").where(F.col("x2") > F.col("x1"))
             .select("n_name",
                     ((F.col("y2") - F.col("y1")).cast("double")
                      / (F.col("x2") - F.col("x1")).cast("double"))
                     .alias("s")))
    return (pairs.groupBy("n_name")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.round(F.expr("percentile(s, 0.5)") / 100.0, 6)
                 .alias("theilsen_dollars_per_month")))


@register(
    "cohort_ltv_triangle",
    oracle=f"""
    WITH co AS (
      SELECT o_custkey,
             MIN(YEAR(CAST(o_orderdate AS DATE)) * 12
                 + MONTH(CAST(o_orderdate AS DATE))) AS m0
      FROM orders GROUP BY 1
    ),
    cell AS (
      SELECT co.m0,
             CAST(YEAR(CAST(o.o_orderdate AS DATE)) * 12
                  + MONTH(CAST(o.o_orderdate AS DATE)) - co.m0
                  AS BIGINT) AS k,
             CAST(SUM({_CENTS}) AS BIGINT) AS cents,
             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active
      FROM orders o JOIN co ON co.o_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT printf('%04d-%02d', (m0 - 1) // 12, (m0 - 1) % 12 + 1)
             AS cohort_month,
           k,
           n_active,
           ROUND(cents / 100.0, 2) AS revenue,
           ROUND(CAST(SUM(cents) OVER (PARTITION BY m0 ORDER BY k
                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0, 2)
             AS cum_revenue
    FROM cell
    """,
    tags=("relational", "cohort", "ltv"),
)
def cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value cohort triangle: customers grouped by
    FIRST-order month, each cohort's revenue and active-customer count at
    k months since acquisition, with the running cumulative revenue that
    an LTV curve reads off — the revenue companion to
    ``weekly_cohort_retention``'s headcount view (finance asks "how much
    has the March cohort spent by month 6", not just "how many came
    back").

    Exactness: month indices and cents are integers; the only divisions
    are final /100 displays; the cumulative sum runs over integer cents
    in the fixed k order, so both engines emit bit-identical doubles.

    Scale: first-order month is one map-side-combinable aggregate on the
    customer key; the cell aggregate is customer-keyed then
    (cohort x k)-keyed (map-side combinable both times); the cumulative
    window runs over the TRIANGLE (|months|^2 / 2 rows at any corpus
    size — ~3k rows for a 7-year ledger), never raw orders."""
    ym = (F.year(F.to_date("o_orderdate")) * 12
          + F.month(F.to_date("o_orderdate"))).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    o = table(spark, sf_dir, "orders")
    co = (o.groupBy("o_custkey").agg(F.min(ym).alias("m0")))
    cell = (o.join(co, "o_custkey")
            .groupBy("m0", (ym - F.col("m0")).cast("long").alias("k"))
            .agg(F.sum(cents).cast("long").alias("cents"),
                 F.countDistinct("o_custkey").cast("long").alias("n_active")))
    wk = (Window.partitionBy("m0").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    month_label = F.format_string(
        "%04d-%02d",
        ((F.col("m0") - 1) / 12).cast("long"),
        ((F.col("m0") - 1) % 12 + 1).cast("long"))
    return cell.select(
        month_label.alias("cohort_month"),
        "k",
        "n_active",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.sum("cents").over(wk).cast("double") / 100.0, 2)
        .alias("cum_revenue"))
