"""As-of (backward) join — attach to each left row the most recent right row
with ``right_ts <= left_ts`` for the same key.

Spark has no native as-of join; the naive encoding is a range join
(``l.key = r.key AND r.ts <= l.ts`` + a per-row argmax), whose candidate set
is O(|L| * avg-prior-rows-per-key) — quadratic in time-depth and a
non-starter at 100 TB. This implementation uses the classic
union-tag-and-window form instead:

1. union left and right rows into one relation tagged by side, with the
   right row's payload packed into ONE struct column (NULL on left rows);
2. a single window ``partitionBy(key).orderBy(ts, side)`` with
   ``last(payload_struct, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — right rows sort before
   left rows at equal ts, giving DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``
   (match-exact) semantics;
3. keep left rows and unpack the struct.

Cost: ONE hash shuffle on the key + an in-partition sort — the same price
as the groupBy the query was already going to do, independent of history
depth. The struct pack is what makes it correct: ``last`` over individual
columns with ``ignorenulls`` would stitch fields from DIFFERENT right rows
whenever a right column is legitimately NULL; the struct is matched or not
matched atomically.

Reference parity: the reference joins each error event to the latest prior
deployment/config snapshot by doing a per-key sorted merge in its native
engine; this is the Spark-declarative equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.readers import table

__all__ = ["asof_join", "events_asof_latest_order",
           "events_asof_next_order"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of left join. ``right`` must be unique per
    ``(*on, right_ts)`` (pre-aggregate otherwise — ties would be
    nondeterministic in ANY engine). Matched right payload columns (and
    ``right_ts`` itself) appear in the output, NULL where no prior right row
    exists (or none within ``tolerance``, an interval Column compared against
    ``left_ts - right_ts``).

    ``direction='backward'`` (default) matches the latest right row with
    ``right_ts <= left_ts``; ``'forward'`` the earliest right row with
    ``right_ts >= left_ts`` — same single-shuffle union-tag-window plan,
    just scanned in the opposite time order (the window ORDER BY flips;
    tolerance then bounds ``right_ts - left_ts``).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    payload = [c for c in right.columns if c not in on and c != right_ts]
    clash = (set(payload) | {right_ts}) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: right payload columns {sorted(clash)} collide with "
            "left columns; rename or drop them on one side first")
    r_struct = F.struct(F.col(right_ts), *[F.col(c) for c in payload])
    left_cols = [c for c in left.columns if c not in on and c != left_ts]

    r_side = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        r_struct.alias("__r"),
    )
    l_side = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *left_cols,
        F.col(left_ts),
        F.lit(None).cast(r_side.schema["__r"].dataType).alias("__r"),
    )

    t_order = F.asc("__t") if direction == "backward" else F.desc("__t")
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    if tolerance is not None:
        gap = (F.col(left_ts) - matched[right_ts] if direction == "backward"
               else matched[right_ts] - F.col(left_ts))
        matched = F.when(gap <= tolerance, matched)

    return (
        r_side.unionByName(l_side)
        .withColumn("__m", matched)
        .where(F.col("__side") == 1)
        .select(
            *on,
            *left_cols,
            left_ts,
            F.col(f"__m.{right_ts}").alias(right_ts),
            *[F.col(f"__m.{c}").alias(c) for c in payload],
        )
    )


_ASOF_ORACLE = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       r.o_orderdate, r.o_orderkey, r.o_totalprice
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
"""


@register("events_asof_latest_order", oracle=_ASOF_ORACLE,
          tags=("relational", "asof"))
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event annotated with that user's most recent order at-or-before
    the event time (backward as-of join events->orders on user key). Orders
    are first deduped to one row per (custkey, orderdate) — max orderkey
    wins — so the match is deterministic; oracle is DuckDB's native
    ``ASOF LEFT JOIN``.
    """
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    latest = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    return asof_join(ev, latest, on=["user_id"],
                     left_ts="ts", right_ts="o_orderdate")


_ASOF_FWD_ORACLE = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_orderkey) AS o_orderkey,
         max_by(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts,
       r.o_orderdate, r.o_orderkey, r.o_totalprice
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.user_id AND e.ts <= r.o_orderdate
"""


@register("events_asof_next_order", oracle=_ASOF_FWD_ORACLE,
          tags=("relational", "asof"))
def events_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: each event annotated with that user's next order
    at-or-after the event time — the attribution direction ("which
    purchase did this session lead to") the backward join can't answer.
    Same deduped right side and single-shuffle union-tag-window plan as
    ``events_asof_latest_order``, with the window scanned in reverse time
    order; oracle is DuckDB's native forward ``ASOF LEFT JOIN``
    (``e.ts <= r.o_orderdate``)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    latest = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    return asof_join(ev, latest, on=["user_id"],
                     left_ts="ts", right_ts="o_orderdate",
                     direction="forward")
