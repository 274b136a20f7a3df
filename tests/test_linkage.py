"""Record-linkage invariants: planted recall, the necessity of the
multi-pass union, and the block-size skew guard — properties the value-hash
oracle can't express by itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from fts_errors_clustering_spark.operators.linkage import (
    MAX_BLOCK, PLANT_N, PLANT_OFFSET, part_entity_matches)

from .conftest import SF_SMALL


def test_planted_pairs_fully_recalled(spark):
    """Every planted typo duplicate must surface as (k, k + PLANT_OFFSET):
    suffix typos via the prefix pass, prefix typos via the suffix pass —
    the multi-pass union's completeness on the adversarial plant."""
    rows = part_entity_matches(spark, SF_SMALL).collect()
    got = {(r.part_a, r.part_b) for r in rows}
    want = {(k, k + PLANT_OFFSET) for k in range(PLANT_N)}
    assert want <= got
    # every planted match is a 1-char edit
    for r in rows:
        if (r.part_a, r.part_b) in want:
            assert r.name_lev == 1


def test_single_pass_blocking_is_incomplete(spark):
    """Re-run candidate generation with ONLY the prefix pass: the
    prefix-typo'd plants (odd keys) must disappear — proving the second
    pass carries real recall, not redundancy."""
    from fts_errors_clustering_spark.sources.readers import table
    part = table(spark, SF_SMALL, "part").select("p_partkey", "p_name")
    plants = (part.where(F.col("p_partkey") < PLANT_N)
              .select((F.col("p_partkey") + PLANT_OFFSET).alias("p_partkey"),
                      F.when(F.col("p_partkey") % 2 == 0,
                             F.concat("p_name", F.lit("x")))
                       .otherwise(F.concat(F.lit("x"), "p_name"))
                       .alias("p_name")))
    catalog = part.unionByName(plants)
    keyed = catalog.select("p_partkey",
                           F.substring("p_name", 1, 8).alias("k"))
    a = keyed.select(F.col("p_partkey").alias("a"), "k")
    b = keyed.select(F.col("p_partkey").alias("b"), "k")
    cand = {(r.a, r.b) for r in
            a.join(b, "k").where(F.col("a") < F.col("b")).collect()}
    evens = {(k, k + PLANT_OFFSET) for k in range(0, PLANT_N, 2)}
    odds = {(k, k + PLANT_OFFSET) for k in range(1, PLANT_N, 2)}
    assert evens <= cand            # suffix typos keep the name prefix
    assert not (odds & cand)        # prefix typos defeat the prefix block


def test_skew_guard_drops_degenerate_blocks(spark):
    """A hand-built catalog where every name shares one 8-char prefix and
    the block exceeds MAX_BLOCK: the capped pipeline must emit NO pairs
    from it (the guard refuses the quadratic bucket) even though a true
    1-char-edit pair is inside — the documented recall/robustness trade."""
    from fts_errors_clustering_spark.operators import linkage as L
    n = MAX_BLOCK + 10
    rows = [(i, f"commonpr unique{i:04d} tail", "Brand#1") for i in range(n)]
    rows.append((n, rows[0][1] + "x", "Brand#1"))  # true dup inside the block
    cat = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string")

    keyed = (cat.select("p_partkey", "p_name", "p_brand",
                        F.substring("p_name", 1, L.BLOCK_KEY_LEN).alias("k"))
             )
    ok = (keyed.groupBy("k").agg(F.count("*").alias("bs"))
          .where(F.col("bs") <= L.MAX_BLOCK).drop("bs"))
    sized = keyed.join(ok, "k", "left_semi")
    assert sized.count() == 0  # the whole degenerate block is dropped
