"""Entity resolution / record linkage — multi-pass blocking + edit-distance
verification over a product catalog.

The reference corpus is error TEXT; a training-data lake also carries
STRUCTURED records whose duplicates aren't byte-identical (two listings of
one product, two crawls of one profile). The canonical large-scale shape —
used by every production ER system — is:

1. **blocking**: cheap deterministic keys route records into small buckets
   so candidate generation is a bucket join, never the O(n^2) cross join;
2. **multi-pass**: a duplicate that differs IN a key's fields escapes that
   key, so several passes block on DISJOINT field subsets and union their
   candidates (a pair only needs to survive ONE pass — the standard
   "block on the fields the typo didn't touch" design);
3. **skew guard**: blocks above a size cap are dropped (a degenerate key
   would re-create the quadratic blow-up inside one bucket); the cap is
   part of the declared semantics;
4. **verification**: the expensive pairwise similarity (edit distance over
   the full concatenated record) runs only on surviving candidates.

Key-selectivity lesson (round 5, measured): a first cut blocked on
substrings of ``p_name`` alone — but the fixture's name pool is only ~64
distinct values, so at 20k parts EVERY name block overflowed the cap and
the matcher silently returned zero rows (the oracle agreed: 0 == 0; only
the 10x smoke's planted-recall gate caught it). Blocking keys must be
sized against the TARGET corpus's value distribution, not the sample's —
hence the field-combination keys below, whose block sizes stay bounded at
every fixture scale (max 26 at sf0.1) because they multiply independent
cardinalities instead of riding one low-cardinality field.

Fixture corpus: like ``dedup._augmented``, duplicates are PLANTED
deterministically (p_partkey < PLANT_N re-appended under
p_partkey + PLANT_OFFSET): even keys get a NAME typo (escapes the
name-keyed pass, caught by the type-keyed one), odd keys a TYPE typo
(the reverse) — every plant defeats exactly one blocking pass, so
completeness REQUIRES the multi-pass union. Natural duplicate/near-
duplicate records (385 exact-record groups at sf0.1) are matched too —
both engines compute them identically.

Scale: each pass is one hash-partition join on its key columns,
shuffling (key, id, record) triples, never whole rows; the verifier
(levenshtein, identical algorithm in Spark and DuckDB) touches only
candidate pairs; the cap bounds every bucket's fanout; output is bounded
by the match count. The 10x smoke gates planted recall at both scales so
key coarseness can never regress silently again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.readers import table

PLANT_N = 15          # parts with p_partkey < this get a planted duplicate
PLANT_OFFSET = 500_000
MAX_BLOCK = 50        # skew guard: blocks above this size are dropped
MAX_REC_LEV = 2       # verification gate on full-record edit distance

#: planted catalog: even planted keys typo the NAME field, odd keys the
#: TYPE field — each escapes exactly the pass keyed on that field.
_CATALOG_SQL = f"""
    catalog AS (
      SELECT p_partkey, p_name, p_brand, p_type, p_size FROM part
      UNION ALL
      SELECT p_partkey + {PLANT_OFFSET},
             CASE WHEN p_partkey % 2 = 0 THEN p_name || 'x'
                  ELSE p_name END,
             p_brand,
             CASE WHEN p_partkey % 2 = 1 THEN p_type || 'x'
                  ELSE p_type END,
             p_size
      FROM part WHERE p_partkey < {PLANT_N}
    ),
    rec AS (
      SELECT p_partkey,
             p_name || '|' || p_brand || '|' || p_type || '|'
               || CAST(p_size AS VARCHAR) AS r,
             p_name, p_brand, p_type, p_size
      FROM catalog
    )
"""

_BLOCK_SQL = f"""
    keyed AS (
      SELECT p_partkey, r, p_name || '#' || p_brand AS k,
             'byname' AS bpass
      FROM rec
      UNION ALL
      SELECT p_partkey, r,
             p_type || '#' || CAST(p_size AS VARCHAR) || '#' || p_brand AS k,
             'bytype' AS bpass
      FROM rec
    ),
    ok AS (
      SELECT k, bpass FROM keyed GROUP BY k, bpass
      HAVING COUNT(*) <= {MAX_BLOCK}
    ),
    sized AS (
      SELECT keyed.* FROM keyed JOIN ok USING (k, bpass)
    ),
    cand AS (
      SELECT DISTINCT a.p_partkey AS a, b.p_partkey AS b,
             a.r AS rec_a, b.r AS rec_b
      FROM sized a JOIN sized b
        ON a.k = b.k AND a.bpass = b.bpass AND a.p_partkey < b.p_partkey
    )
"""


@register(
    "part_entity_matches",
    oracle=f"""
    WITH {_CATALOG_SQL}, {_BLOCK_SQL}
    SELECT a AS part_a, b AS part_b,
           CAST(levenshtein(rec_a, rec_b) AS BIGINT) AS record_lev
    FROM cand
    WHERE levenshtein(rec_a, rec_b) <= {MAX_REC_LEV}
    """,
    tags=("linkage", "dedup", "join"),
)
def part_entity_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entity resolution (module docstring): two field-keyed
    blocking passes — (name, brand) and (type, size, brand), blocks capped
    at {MAX_BLOCK} — candidates unioned + deduped, verified at
    levenshtein <= {MAX_REC_LEV} over the full concatenated record.
    Planted typo duplicates each defeat one pass, so the result is a
    recall check on the multi-pass union itself. Exact value-hash oracle:
    both engines implement classic Levenshtein."""
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size")
    plants = part.where(F.col("p_partkey") < PLANT_N).select(
        (F.col("p_partkey") + PLANT_OFFSET).alias("p_partkey"),
        F.when(F.col("p_partkey") % 2 == 0, F.concat("p_name", F.lit("x")))
         .otherwise(F.col("p_name")).alias("p_name"),
        "p_brand",
        F.when(F.col("p_partkey") % 2 == 1, F.concat("p_type", F.lit("x")))
         .otherwise(F.col("p_type")).alias("p_type"),
        "p_size")
    catalog = part.unionByName(plants)
    rec = catalog.select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        F.concat_ws("|", "p_name", "p_brand", "p_type",
                    F.col("p_size").cast("string")).alias("r"))
    byname = rec.select(
        "p_partkey", "r",
        F.concat_ws("#", "p_name", "p_brand").alias("k"),
        F.lit("byname").alias("bpass"))
    bytype = rec.select(
        "p_partkey", "r",
        F.concat_ws("#", "p_type", F.col("p_size").cast("string"),
                    "p_brand").alias("k"),
        F.lit("bytype").alias("bpass"))
    keyed = byname.unionByName(bytype)
    ok = (keyed.groupBy("k", "bpass").agg(F.count("*").alias("bs"))
          .where(F.col("bs") <= MAX_BLOCK).drop("bs"))
    sized = keyed.join(ok, ["k", "bpass"], "left_semi")
    a = sized.select(F.col("p_partkey").alias("a"),
                     F.col("r").alias("rec_a"), "k", "bpass")
    b = sized.select(F.col("p_partkey").alias("b"),
                     F.col("r").alias("rec_b"), "k", "bpass")
    cand = (a.join(b, ["k", "bpass"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b", "rec_a", "rec_b")
            .distinct())
    lev = F.levenshtein("rec_a", "rec_b")
    return (cand.where(lev <= MAX_REC_LEV)
            .select(F.col("a").alias("part_a"), F.col("b").alias("part_b"),
                    lev.cast("long").alias("record_lev")))
