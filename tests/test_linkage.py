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
    name typos via the (type,size,brand) pass, type typos via the
    (name,brand) pass — the multi-pass union's completeness on the
    adversarial plant."""
    rows = part_entity_matches(spark, SF_SMALL).collect()
    got = {(r.part_a, r.part_b) for r in rows}
    want = {(k, k + PLANT_OFFSET) for k in range(PLANT_N)}
    assert want <= got
    # every planted match is a 1-char edit of the full record
    for r in rows:
        if (r.part_a, r.part_b) in want:
            assert r.record_lev == 1


def test_single_pass_blocking_is_incomplete(spark):
    """Re-run candidate generation with ONLY the (name, brand) pass: the
    name-typo'd plants (even keys) must disappear — proving the second
    pass carries real recall, not redundancy."""
    from fts_errors_clustering_spark.sources.readers import table
    part = table(spark, SF_SMALL, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type")
    plants = part.where(F.col("p_partkey") < PLANT_N).select(
        (F.col("p_partkey") + PLANT_OFFSET).alias("p_partkey"),
        F.when(F.col("p_partkey") % 2 == 0, F.concat("p_name", F.lit("x")))
         .otherwise(F.col("p_name")).alias("p_name"),
        "p_brand",
        F.when(F.col("p_partkey") % 2 == 1, F.concat("p_type", F.lit("x")))
         .otherwise(F.col("p_type")).alias("p_type"))
    catalog = part.unionByName(plants)
    keyed = catalog.select(
        "p_partkey", F.concat_ws("#", "p_name", "p_brand").alias("k"))
    a = keyed.select(F.col("p_partkey").alias("a"), "k")
    b = keyed.select(F.col("p_partkey").alias("b"), "k")
    cand = {(r.a, r.b) for r in
            a.join(b, "k").where(F.col("a") < F.col("b")).collect()}
    odds = {(k, k + PLANT_OFFSET) for k in range(1, PLANT_N, 2)}
    evens = {(k, k + PLANT_OFFSET) for k in range(0, PLANT_N, 2)}
    assert odds <= cand             # type typos keep (name, brand) intact
    assert not (evens & cand)       # name typos defeat the name-keyed pass


def test_skew_guard_drops_degenerate_blocks(spark):
    """A hand-built catalog where every record shares one blocking key and
    the block exceeds MAX_BLOCK: the capped pipeline must keep NO records
    from it (the guard refuses the quadratic bucket) even though a true
    1-char-edit pair is inside — the documented recall/robustness trade."""
    n = MAX_BLOCK + 10
    rows = [(i, f"k unique{i:04d}") for i in range(n)]
    rows.append((n, rows[0][1] + "x"))  # true dup inside the block
    cat = spark.createDataFrame(rows, "p_partkey long, r string")
    keyed = cat.select("p_partkey", F.lit("samekey").alias("k"))
    ok = (keyed.groupBy("k").agg(F.count("*").alias("bs"))
          .where(F.col("bs") <= MAX_BLOCK).drop("bs"))
    sized = keyed.join(ok, "k", "left_semi")
    assert sized.count() == 0  # the whole degenerate block is dropped
