"""Query registry: the single source of truth for the engine's surface.

Every operator from SURVEY.md section 2 (and the scale extensions) registers
itself here as a named ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, the DuckDB oracle SQL the driver runs
side-by-side (row-count + schema + order-insensitive value-hash).

Design rules enforced by convention here and asserted in tests:
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver's compare sorts columns by NAME);
- float outputs are either exact (DECIMAL-summed then cast to double —
  see functions.numeric) or rounded at a scale where cross-engine ULP noise
  cannot flip the rounding;
- no query depends on output row order (the driver hash is order-insensitive),
  so plans skip final sorts unless the semantics ARE a sort (top-k).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...]


_REGISTRY: dict[str, QueryDef] = {}

#: operator modules; imported lazily so `import plans.registry` stays cheap
_MODULES = (
    "fts_errors_clustering_spark.operators.relational",
    "fts_errors_clustering_spark.operators.asof",
    "fts_errors_clustering_spark.operators.textprep",
    "fts_errors_clustering_spark.operators.tfidf",
    "fts_errors_clustering_spark.operators.clustering",
    "fts_errors_clustering_spark.operators.knn",
    "fts_errors_clustering_spark.operators.dbscan",
    "fts_errors_clustering_spark.operators.dedup",
    "fts_errors_clustering_spark.operators.similarity",
    "fts_errors_clustering_spark.operators.textstats",
    "fts_errors_clustering_spark.operators.multimodal",
    "fts_errors_clustering_spark.operators.windows",
    "fts_errors_clustering_spark.operators.pipelines",
)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``name`` with an optional oracle."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, tuple(tags))
        return fn
    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QueryDef]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: d.fn for n, d in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: d.oracle for n, d in all_queries().items() if d.oracle is not None}
