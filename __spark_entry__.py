"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``fts_errors_clustering_spark``; this module only
adapts the package's query registry (``plans.registry``) to the driver's
three-function surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fts_errors_clustering_spark.plans import registry
from fts_errors_clustering_spark.session import tune_session

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top-12 error-heavy users with their share of all errors over ``events``
    (filter -> group-count -> top-N -> broadcast-total share); see
    ``operators/relational.py:flagship_top_error_users``.
    """
    tune_session(spark)
    return registry.queries()["flagship_top_error_users"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2 (plus the
    scale extensions), each ``(spark, sf_dir) -> DataFrame``."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query in ``queries()``.
    Keys absent here (ML-model-backed ops) get the driver's rows-only check."""
    return registry.oracle_sql()
