"""Vector math over ``array<float>`` embedding columns.

The reference holds its sentence embeddings as a dense numpy matrix
(2,926 x 200, ``/root/reference/notebooks/word2vec_dbscan_approach.ipynb:28695``)
and feeds sklearn/daal4py. Here embeddings live in a DataFrame column
(``embeddings.embedding``, fixed dim), and distance/similarity are column
expressions, so kNN / DBSCAN / ANN plans stay inside Catalyst.

Two tiers:
- ``dot``/``sq_dist``/``cosine`` build an EXPLICIT left-associative sum over
  the ``dim`` elements (cast to double). The identical expression is emitted
  for the DuckDB oracle (1-indexed), so both engines execute the same IEEE
  operation sequence -> bit-identical results. Codegen handles dim<=few-hundred
  fine; this is the oracle-comparable tier.
- ``dot_agg`` uses ``zip_with`` + ``aggregate`` — the generic-dim runtime
  tier for operators that don't need cross-engine exactness.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def _el(col: str, i: int) -> Column:
    return F.col(col).getItem(i).cast("double")


def dot(a: str, b: str, dim: int) -> Column:
    return reduce(lambda acc, i: acc + _el(a, i) * _el(b, i),
                  range(1, dim), _el(a, 0) * _el(b, 0))


def sql_dot(a: str, b: str, dim: int) -> str:
    terms = [f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
             for i in range(1, dim + 1)]
    return "(" + " + ".join(terms) + ")"


def sq_dist(a: str, b: str, dim: int) -> Column:
    def term(i: int) -> Column:
        d = _el(a, i) - _el(b, i)
        return d * d
    return reduce(lambda acc, i: acc + term(i), range(1, dim), term(0))


def sql_sq_dist(a: str, b: str, dim: int) -> str:
    terms = [f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE)) * "
             f"(CAST({a}[{i}] AS DOUBLE) - CAST({b}[{i}] AS DOUBLE))"
             for i in range(1, dim + 1)]
    return "(" + " + ".join(terms) + ")"


def euclidean(a: str, b: str, dim: int) -> Column:
    return F.sqrt(sq_dist(a, b, dim))


def sql_euclidean(a: str, b: str, dim: int) -> str:
    return f"sqrt({sql_sq_dist(a, b, dim)})"


def norm(a: str, dim: int) -> Column:
    return F.sqrt(dot(a, a, dim))


def sql_norm(a: str, dim: int) -> str:
    return f"sqrt({sql_dot(a, a, dim)})"


def cosine(a: str, b: str, dim: int) -> Column:
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def sql_cosine(a: str, b: str, dim: int) -> str:
    return f"({sql_dot(a, b, dim)} / ({sql_norm(a, dim)} * {sql_norm(b, dim)}))"


def dot_agg(a: Column | str, b: Column | str) -> Column:
    """Generic-dimension dot product via zip_with+aggregate (JVM higher-order
    functions, no Python). Runtime tier — not oracle-exact across engines."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
