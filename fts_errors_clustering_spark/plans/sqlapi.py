"""Spark-SQL surface: the fixture tables as temp views + spark.sql() plans.

The reference's users work in notebooks where the natural query form is
SQL over registered tables (`spark.sql`, `df.createOrReplaceTempView` —
the HDFS notebook does exactly this flow cell-by-cell in DataFrame form).
This module is that surface: ``register_views`` exposes every fixture
table under its canonical name for a given sf_dir, and queries here are
written AS SQL TEXT — same Catalyst plan class as the DataFrame forms
(views are lazy aliases, predicate pushdown/pruning apply unchanged), so
the engine's two front doors provably agree (the oracle hash gates it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.registry import register
from ..sources.readers import table

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view for ``spark.sql``. Views
    wrap the SAME normalized reader (``sources/readers.table``), so SQL
    users inherit the timestamp normalization and cache behavior."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)


@register(
    "sql_api_revenue_by_priority",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(27,4))) AS VARCHAR) AS DOUBLE)
             AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("sql-api", "relational", "join"),
)
def sql_api_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door, end to end: views registered, the query is a
    SQL string (Spark dialect), the result hash-matches the DuckDB oracle
    — proving a notebook user typing SQL gets the DataFrame layer's exact
    semantics (decimal-exact revenue discipline included)."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT o.o_orderpriority AS priority,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                                  AS DECIMAL(27,4))) AS STRING) AS DOUBLE)
                 AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """)
