"""Entity resolution / record linkage — multi-pass blocking + edit-distance
verification over a product catalog.

The reference corpus is error TEXT; a training-data lake also carries
STRUCTURED records whose duplicates aren't byte-identical (two listings of
one product, two crawls of one profile). The canonical large-scale shape —
used by every production ER system — is:

1. **blocking**: cheap deterministic keys route records into small buckets
   so candidate generation is a bucket join, never the O(n^2) cross join;
2. **multi-pass**: one key misses duplicates that differ IN the key, so
   several independent passes union their candidates (a pair only needs to
   survive ONE pass);
3. **skew guard**: blocks above a size cap are dropped (a degenerate key —
   empty string, common prefix — would otherwise re-create the quadratic
   blow-up inside one bucket); the cap is part of the declared semantics;
4. **verification**: the expensive pairwise similarity (edit distance here)
   runs only on surviving candidates.

Fixture corpus: like ``dedup._augmented``, duplicates are PLANTED
deterministically (p_partkey < PLANT_N re-appended under
p_partkey + PLANT_OFFSET) so recall is checkable: even keys get a SUFFIX
typo (caught by the name-prefix pass), odd keys a PREFIX typo (caught by
the name-suffix pass) — every plant defeats exactly one blocking pass, so
completeness REQUIRES the multi-pass union. Natural TPC-H name collisions
(p_name is a 5-word draw from ~92 words; exact repeats happen) are matched
too — both engines compute them identically.

Scale: blocking keys are 8-char substrings of the name — each pass is one
hash-partition join on the key; the verifier (levenshtein, identical
algorithm in Spark and DuckDB) touches only candidate pairs; the output is
bounded by the match count. At 100 TB the passes shuffle (key, id, name)
triples, never whole records; the cap bounds every bucket's fanout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.readers import table

PLANT_N = 15          # parts with p_partkey < this get a planted duplicate
PLANT_OFFSET = 500_000
BLOCK_KEY_LEN = 8     # chars of the name used as a blocking key
MAX_BLOCK = 50        # skew guard: blocks above this size are dropped
MAX_NAME_LEV = 2      # verification gate on full-name edit distance

#: planted catalog: even planted keys append a char (suffix typo — the
#: prefix block still catches them), odd keys prepend one (prefix typo —
#: only the suffix block catches them). Brand rides along for the gate.
_CATALOG_SQL = f"""
    catalog AS (
      SELECT p_partkey, p_name, p_brand FROM part
      UNION ALL
      SELECT p_partkey + {PLANT_OFFSET},
             CASE WHEN p_partkey % 2 = 0 THEN p_name || 'x'
                  ELSE 'x' || p_name END,
             p_brand
      FROM part WHERE p_partkey < {PLANT_N}
    )
"""

_BLOCK_SQL = f"""
    keyed AS (
      SELECT p_partkey, p_name, p_brand,
             substr(p_name, 1, {BLOCK_KEY_LEN}) AS k, 'prefix' AS bpass
      FROM catalog
      UNION ALL
      SELECT p_partkey, p_name, p_brand,
             substr(p_name, length(p_name) - {BLOCK_KEY_LEN - 1},
                    {BLOCK_KEY_LEN}) AS k, 'suffix' AS bpass
      FROM catalog
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
             a.p_name AS name_a, b.p_name AS name_b,
             a.p_brand AS brand_a, b.p_brand AS brand_b
      FROM sized a JOIN sized b
        ON a.k = b.k AND a.bpass = b.bpass AND a.p_partkey < b.p_partkey
    )
"""


@register(
    "part_entity_matches",
    oracle=f"""
    WITH {_CATALOG_SQL}, {_BLOCK_SQL}
    SELECT a AS part_a, b AS part_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS name_lev
    FROM cand
    WHERE levenshtein(name_a, name_b) <= {MAX_NAME_LEV}
      AND brand_a = brand_b
    """,
    tags=("linkage", "dedup", "join"),
)
def part_entity_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entity resolution (module docstring): two blocking passes
    (name prefix-{BLOCK_KEY_LEN} / suffix-{BLOCK_KEY_LEN}, blocks capped at
    {MAX_BLOCK}), candidates unioned + deduped, verified at
    levenshtein <= {MAX_NAME_LEV} on the full name with brand equality.
    Planted typo duplicates each defeat one pass, so the result is a
    recall check on the multi-pass union itself. Exact value-hash oracle:
    both engines implement classic Levenshtein."""
    part = table(spark, sf_dir, "part").select("p_partkey", "p_name",
                                               "p_brand")
    plants = (part.where(F.col("p_partkey") < PLANT_N)
              .select((F.col("p_partkey") + PLANT_OFFSET).alias("p_partkey"),
                      F.when(F.col("p_partkey") % 2 == 0,
                             F.concat("p_name", F.lit("x")))
                       .otherwise(F.concat(F.lit("x"), "p_name"))
                       .alias("p_name"),
                      "p_brand"))
    catalog = part.unionByName(plants)

    pre = catalog.select(
        "p_partkey", "p_name", "p_brand",
        F.substring("p_name", 1, BLOCK_KEY_LEN).alias("k"),
        F.lit("prefix").alias("bpass"))
    suf = catalog.select(
        "p_partkey", "p_name", "p_brand",
        F.substring("p_name", -BLOCK_KEY_LEN, BLOCK_KEY_LEN).alias("k"),
        F.lit("suffix").alias("bpass"))
    keyed = pre.unionByName(suf)
    ok = (keyed.groupBy("k", "bpass").agg(F.count("*").alias("bs"))
          .where(F.col("bs") <= MAX_BLOCK).drop("bs"))
    sized = keyed.join(ok, ["k", "bpass"], "left_semi")
    a = sized.select(F.col("p_partkey").alias("a"),
                     F.col("p_name").alias("name_a"),
                     F.col("p_brand").alias("brand_a"), "k", "bpass")
    b = sized.select(F.col("p_partkey").alias("b"),
                     F.col("p_name").alias("name_b"),
                     F.col("p_brand").alias("brand_b"), "k", "bpass")
    cand = (a.join(b, ["k", "bpass"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b", "name_a", "name_b", "brand_a", "brand_b")
            .distinct())
    lev = F.levenshtein("name_a", "name_b")
    return (cand.where((lev <= MAX_NAME_LEV) &
                       (F.col("brand_a") == F.col("brand_b")))
            .select(F.col("a").alias("part_a"), F.col("b").alias("part_b"),
                    lev.cast("long").alias("name_lev")))
