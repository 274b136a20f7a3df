"""Graph operators over relationship structures implied by the fixtures.

The reference has no graph layer; a training-data engine needs one the
moment curation reasons about link structure (domain graphs, citation
graphs, co-occurrence graphs): PageRank-style centrality is the canonical
"which sources matter" signal feeding quality-weighted sampling (the same
role the original PageRank paper gives it for web corpora).

``part_copurchase_pagerank`` builds the co-purchase graph (parts appearing
in the same order, weight = number of co-containing orders — bounded
fanout: a TPC-H-shaped order holds <= 7 lineitems, so edge generation is a
bounded self-join, never a hot-key explosion) and runs FIXED-ITERATION
weighted PageRank. Fixed iteration count keeps the operator ANSI-SQL
expressible: the DuckDB oracle unrolls the same five update steps as CTEs,
so even this iterative algorithm gets a full value-hash correctness row
(most engines settle for rows-only checks on iterative ops).

Scale shape: the edge table is built once, pre-partitioned on the join key
and cached; each iteration shuffles only the rank table (one row per node)
plus map-side-combined per-node partial sums — the dbscan.py propagation
discipline. Rank updates are pure column algebra; convergence-to-fixpoint
variants would swap the fixed range for the label-sum certificate loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.readers import table

DAMPING = 0.85
N_ITER = 5
TOP_PARTS = 25
ROUND_AT = 10  # ~6 significant digits at rank ~1e-4; double-sum cross-
               # engine noise is ~1e-15 relative — 9 orders below the round


def _pagerank(edges: DataFrame, damping: float, n_iter: int) -> DataFrame:
    """Weighted PageRank over a directed edge list (u, v, w). Returns
    (id, r).

    PRECONDITION (asserted): every edge target also appears as a source —
    i.e. no dangling nodes, automatically true for symmetric graphs like
    the co-purchase graph below. The engine keeps inbound-less nodes at
    base rank (left join + coalesce, total algebra) while the unrolled
    oracle CTE pattern (inner join on ep.v) DROPS them — the two agree
    only under this precondition, so reusing this helper on an asymmetric
    graph without mirroring the oracle would silently mismatch. Dangling
    TARGETS additionally leak rank mass (no redistribution step), which
    the assert also rules out."""
    dangling = (edges.select(F.col("v").alias("u"))
                .exceptAll(edges.select("u")).limit(1).count())
    if dangling:
        raise ValueError(
            "_pagerank requires every edge target to appear as a source "
            "(no dangling nodes); add reverse edges or a dangling-mass "
            "redistribution step before reusing it on asymmetric graphs")
    outs = edges.groupBy("u").agg(F.sum("w").alias("s"))
    ep = (edges.join(outs, "u")
          .select("u", "v", (F.col("w") / F.col("s")).alias("p"))
          .repartition("u").cache())
    nodes = outs.select(F.col("u").alias("id")).cache()
    n = nodes.count()
    if n == 0:  # empty graph -> empty rank table, same schema
        return nodes.select("id", F.lit(0.0).alias("r"))
    ranks = nodes.select("id", F.lit(1.0 / n).alias("r"))
    base = (1.0 - damping) / n
    for _ in range(n_iter):
        contrib = (ep.join(ranks, ep.u == ranks.id)
                   .groupBy(F.col("v").alias("id"))
                   .agg(F.sum(F.col("p") * F.col("r")).alias("m")))
        # symmetric graphs leave no node without inbound mass, but keep the
        # algebra total anyway: missing inbound -> base rank only
        ranks = (nodes.join(contrib, "id", "left")
                 .select("id",
                         (F.lit(base) + F.lit(damping) *
                          F.coalesce(F.col("m"), F.lit(0.0))).alias("r"))
                 .localCheckpoint(eager=False))
    return ranks


@register(
    "part_copurchase_pagerank",
    oracle=f"""
    WITH copairs AS (
      SELECT DISTINCT l1.l_orderkey, l1.l_partkey AS u, l2.l_partkey AS v
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey <> l2.l_partkey
    ),
    edges AS (SELECT u, v, CAST(COUNT(*) AS DOUBLE) AS w
              FROM copairs GROUP BY u, v),
    outs AS (SELECT u, SUM(w) AS s FROM edges GROUP BY u),
    ep AS (SELECT e.u, e.v, e.w / o.s AS p FROM edges e JOIN outs o ON e.u = o.u),
    nn AS (SELECT COUNT(*) AS n FROM outs),
    r0 AS (SELECT u AS id, 1.0 / (SELECT n FROM nn) AS r FROM outs),
    r1 AS (SELECT ep.v AS id,
                  0.15 / (SELECT n FROM nn) + 0.85 * SUM(ep.p * r0.r) AS r
           FROM ep JOIN r0 ON ep.u = r0.id GROUP BY ep.v),
    r2 AS (SELECT ep.v AS id,
                  0.15 / (SELECT n FROM nn) + 0.85 * SUM(ep.p * r1.r) AS r
           FROM ep JOIN r1 ON ep.u = r1.id GROUP BY ep.v),
    r3 AS (SELECT ep.v AS id,
                  0.15 / (SELECT n FROM nn) + 0.85 * SUM(ep.p * r2.r) AS r
           FROM ep JOIN r2 ON ep.u = r2.id GROUP BY ep.v),
    r4 AS (SELECT ep.v AS id,
                  0.15 / (SELECT n FROM nn) + 0.85 * SUM(ep.p * r3.r) AS r
           FROM ep JOIN r3 ON ep.u = r3.id GROUP BY ep.v),
    r5 AS (SELECT ep.v AS id,
                  0.15 / (SELECT n FROM nn) + 0.85 * SUM(ep.p * r4.r) AS r
           FROM ep JOIN r4 ON ep.u = r4.id GROUP BY ep.v)
    SELECT id AS part, ROUND(r, {ROUND_AT}) AS rank
    FROM r5
    ORDER BY ROUND(r, {ROUND_AT}) DESC, id ASC
    LIMIT {TOP_PARTS}
    """,
    tags=("graph", "pagerank", "join"),
)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_PARTS} parts by {N_ITER}-iteration weighted PageRank over
    the co-purchase graph. The oracle unrolls the identical five update
    steps as SQL CTEs — a full value-hash check on an iterative graph op."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(F.col("l_orderkey").alias("o2"),
                   F.col("l_partkey").alias("v"))
    copairs = (li.join(l2, (li.l_orderkey == l2.o2) &
                       (li.l_partkey != l2.v))
               .select(F.col("l_orderkey"), F.col("l_partkey").alias("u"), "v")
               .distinct())
    edges = (copairs.groupBy("u", "v")
             .agg(F.count("*").cast("double").alias("w")))
    ranks = _pagerank(edges, DAMPING, N_ITER)
    return (ranks.select(F.col("id").alias("part"),
                         F.round("r", ROUND_AT).alias("rank"))
            .orderBy(F.desc("rank"), F.asc("part")).limit(TOP_PARTS))
