"""Exact cross-engine numeric aggregates.

Problem: a double SUM is associativity-dependent; Spark sums per-partition
then merges, DuckDB sums sequentially, so the last ULPs differ and an exact
value-hash comparison (the driver's correctness gate) can fail on floats.

Solution: sum in DECIMAL (exact, order-independent), cast the total back to
double. Both engines then hold bit-identical doubles, and any further scalar
arithmetic (division for mean, the sum-of-squares stddev formula, sqrt) is
a deterministic IEEE-754 op on identical inputs -> identical outputs.

Each helper has a Spark form and a SQL-text form (for the DuckDB oracle);
keeping them adjacent is what keeps the two sides in lockstep.

This replaces the reference's reliance on numpy/pandas reductions (e.g. the
hand-rolled TF/IDF sums at
``/root/reference/notebooks/TF-IDF_K-Means_approach.ipynb:5541-5556`` and the
cluster stats at ``notebooks/word2vec_dbscan_approach.ipynb:30189-30220``)
with scale-out aggregates whose results are still exactly reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 27 integer digits is far beyond any fixture sum; scale matches the measure.
_PREC = 27


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact SUM: sum in DECIMAL(27,scale), return as double.

    The decimal -> double conversion goes THROUGH A STRING: DuckDB's direct
    wide-decimal->double cast is not correctly rounded (observed
    4763880.257900001 for 4763880.2579), while decimal->varchar->double is
    correctly-rounded strtod in both engines -> bit-identical doubles.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({_PREC},{scale})")).cast("string").cast("double")


def sql_dec_sum(expr: str, scale: int = 2) -> str:
    return (f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({_PREC},{scale}))) "
            f"AS VARCHAR) AS DOUBLE)")


def dec_avg(col: Column | str, scale: int = 2) -> Column:
    """Exact-sum mean: (decimal sum as double) / count — deterministic."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c, scale) / F.count(c)


def sql_dec_avg(expr: str, scale: int = 2) -> str:
    return f"({sql_dec_sum(expr, scale)} / COUNT({expr}))"


def dec_std(col: Column | str, scale: int = 4) -> Column:
    """Sample stddev via exact decimal sums of x and x^2.

    sqrt((ssq - s^2/n) / (n-1)) evaluated in double over bit-identical
    inputs on both engines. ``scale`` applies to x; x^2 gets 2*scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = dec_sum(c, scale)
    ssq = (F.sum((c.cast(f"decimal(18,{scale})") * c.cast(f"decimal(18,{scale})"))
                 .cast(f"decimal({_PREC + 6},{2 * scale})"))
           .cast("string").cast("double"))
    return F.sqrt((ssq - s * s / n) / (n - F.lit(1.0)))


def sql_dec_std(expr: str, scale: int = 4) -> str:
    # DECIMAL(19) operands force DuckDB onto int128 decimal multiply
    # (DECIMAL(18)*DECIMAL(18) overflows int64 for measures >= ~1e5); the
    # product is exact either way, so Spark's 18-digit operands (whose
    # product stays within precision 38) yield the identical value.
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    s = sql_dec_sum(expr, scale)
    ssq = (f"CAST(CAST(SUM(CAST(CAST({expr} AS DECIMAL(19,{scale})) * "
           f"CAST({expr} AS DECIMAL(19,{scale})) AS DECIMAL({_PREC + 6},{2 * scale}))) "
           f"AS VARCHAR) AS DOUBLE)")
    return f"SQRT((({ssq}) - ({s}) * ({s}) / ({n})) / (({n}) - 1.0))"


def round_half_up(x: float, ndigits: int = 6) -> float:
    """Driver-side ROUND that matches SQL engines' half-away-from-zero.

    Python's built-in ``round`` is banker's rounding, so on exactly-
    representable dyadic midpoints (e.g. 1/128 = 0.0078125 at 6 digits) it
    emits 0.007812 where DuckDB's ROUND emits 0.007813 — a latent
    value-hash failure for any operator that rounds on the driver.  DuckDB
    computes ROUND(d, n) as nearbyint-style ``floor(d * 10^n + 0.5) /
    10^n`` on the double itself; reproducing that exact computation (NOT a
    Decimal-exact quantize, which disagrees when the scaled multiply
    crosses the .5 boundary the other way, e.g. 0.1234565) keeps both
    engines bit-identical.  Verified against DuckDB ROUND on 200k random
    doubles + dyadic edge cases with zero mismatches.  Only valid for
    finite x >= 0 (conversion rates, shares); extend with a sign fold
    before using on negatives.

    KNOWN CROSS-ENGINE GAP (r07 advice): Spark's ``F.round`` is NOT this
    computation — it is decimal-exact HALF_UP via BigDecimal on the
    shortest-decimal string of the double, so on inputs whose shortest
    decimal lands exactly on a scaled .5 boundary (e.g. 0.1234565 at 6
    digits) ``F.round`` and DuckDB's ``ROUND`` can disagree by one ulp of
    the target scale.  Operators that pair Spark-side ``F.round`` with a
    DuckDB ``ROUND`` oracle (theilsen, cohort_ltv_triangle,
    funnel_step_timing, last_touch_attribution) tolerate this because
    their rounded quantities are ratios of integer cent/microsecond
    units — the quotient's shortest decimal essentially never lands on
    the boundary at 6 digits (zero mismatches across all fixture scales).
    For NEW operators, prefer keeping values in integer micro-units until
    display, or round at a scale the upstream arithmetic cannot touch;
    do not assume F.round == DuckDB ROUND on arbitrary doubles.
    """
    import math

    scale = 10.0 ** ndigits
    return math.floor(x * scale + 0.5) / scale
