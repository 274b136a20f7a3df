"""Invariant tests for the selection/monitoring family
(operators/selection.py). Oracle parity for the four SQL-expressible
queries is covered by the registry-wide sweep in test_oracle_parity.py;
these tests pin the SEMANTIC invariants the oracle can't state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fts_errors_clustering_spark.operators import selection
from fts_errors_clustering_spark.plans.registry import all_queries
from fts_errors_clustering_spark.sources.readers import table

from .conftest import SF_SMALL

_DEFS = all_queries()


def test_token_budget_respected(spark):
    """Kept token mass never exceeds the budget, and adding the next bin
    down would exceed it (the selection is maximal at bin granularity)."""
    res = _DEFS["token_budget_selection"].fn(spark, SF_SMALL).collect()
    docs = table(spark, SF_SMALL, "documents")
    from fts_errors_clustering_spark.functions.text import whitespace_tokens
    total = (docs.where(F.length(F.trim("text")) > 0)
             .select(F.size(whitespace_tokens("text")).alias("n"))
             .agg(F.sum("n")).first()[0])
    budget = int(selection.BUDGET_FRAC * total)
    kept = sum(r.kept_tokens for r in res)
    assert 0 < kept <= budget
    cutoffs = {r.cutoff_bin for r in res}
    assert len(cutoffs) == 1, "cutoff bin must be global"
    # maximality: the bin just below the cutoff would blow the budget
    cutoff = cutoffs.pop()
    from fts_errors_clustering_spark.operators.curation import _quality_col
    scored = (docs.where(F.length(F.trim("text")) > 0)
              .select("text", whitespace_tokens("text").alias("ts"))
              .select(F.size("ts").alias("n"),
                      F.least(F.floor(_quality_col() * selection.N_QBINS),
                              F.lit(selection.N_QBINS - 1)).alias("qbin")))
    nxt = (scored.where(F.col("qbin") < cutoff)
           .agg(F.max("qbin")).first()[0])
    if nxt is not None:
        below = (scored.where(F.col("qbin") >= nxt)
                 .agg(F.sum("n")).first()[0])
        assert below > budget


def test_importance_weights_target_ranks_first(spark):
    """The DSIR target slice (en) must get the highest mean log importance
    weight — its own features define the target distribution."""
    rows = _DEFS["importance_weights_dsir"].fn(spark, SF_SMALL).collect()
    best = max(rows, key=lambda r: r.mean_log_weight)
    assert best.lang == selection.TARGET_LANG
    # and non-target slices should score below zero on average
    others = [r.mean_log_weight for r in rows
              if r.lang != selection.TARGET_LANG]
    assert all(w < best.mean_log_weight for w in others)


def test_quality_threshold_drops_a_quartile(spark):
    """P25 gate: per language, dropped is ~25% of docs (exact quartile up
    to ties) and kept + dropped covers every non-empty doc."""
    rows = _DEFS["quality_threshold_by_lang"].fn(spark, SF_SMALL).collect()
    docs = table(spark, SF_SMALL, "documents")
    per_lang = {r.lang: r.n for r in
                docs.where(F.length(F.trim("text")) > 0)
                .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for r in rows:
        assert r.kept_docs + r.dropped_docs == per_lang[r.lang]
        # quantile_cont interpolates, so dropped < 25% strictly and kept
        # >= 75%; allow tie slack of one doc either side
        assert r.dropped_docs <= per_lang[r.lang] * 0.25 + 1
        assert r.dropped_docs >= per_lang[r.lang] * 0.25 - 2


def test_psi_nonnegative_and_complete(spark):
    """PSI is a sum of same-sign products -> >= 0 for every week; the
    weekly n_events partition the whole events table."""
    rows = _DEFS["distribution_drift_psi"].fn(spark, SF_SMALL).collect()
    assert len(rows) >= 4  # 30 days of fixture data spans >= 4 ISO weeks
    assert all(r.psi >= 0 for r in rows)
    n = table(spark, SF_SMALL, "events").count()
    assert sum(r.n_events for r in rows) == n


def test_semantic_dedup_invariants(spark):
    """Planted exact duplicates are all dropped; every dropped vector has
    a genuine near-dup partner (drop set is a subset of the exact
    cosine>=threshold pair members)."""
    cells, dropped, offset, n_planted = \
        selection._semantic_cells_and_dropped(spark, SF_SMALL)
    dropped_ids = {r.vec_id for r in dropped.collect()}
    assert (offset, n_planted) == (100000, 10)  # this fixture's geometry
    planted = {offset + i for i in range(n_planted)}
    assert planted <= dropped_ids
    exact = _DEFS["embedding_near_dup_pairs"].fn(spark, SF_SMALL).collect()
    exact_members = {r.b for r in exact}
    assert dropped_ids <= exact_members
    # aggregate view agrees with the drop set
    agg = _DEFS["semantic_dedup_ivf"].fn(spark, SF_SMALL).collect()
    assert sum(r.n_dropped for r in agg) == len(dropped_ids)
    assert sum(r.n_vectors for r in agg) == cells.count()


def test_heavy_hitters_fallback_is_exact(spark):
    """Force certificate failure (capacity 2 over a near-flat corpus with a
    planted head): the fallback must return the exact top-k — correctness
    never depends on the sketch surviving."""
    from pyspark.sql import functions as F

    from fts_errors_clustering_spark.operators.scale import heavy_hitters

    rows = ([("hot",)] * 50 + [(f"t{i % 40}",) for i in range(400)])
    toks = spark.createDataFrame(rows, "token string").repartition(8)
    got = [(r.token, r.n) for r in heavy_hitters(toks, 2, 5).collect()]
    exact = [(r.token, r.n) for r in
             (toks.groupBy("token").agg(F.count("*").alias("n"))
              .orderBy(F.desc("n"), F.asc("token")).limit(5)).collect()]
    assert got == exact and got[0] == ("hot", 50)


def test_heavy_hitters_certificate_path_matches_exact(spark):
    """Zipf-ish corpus at ample capacity: the certified sketch path (no
    fallback) must equal the exact aggregation too."""
    from pyspark.sql import functions as F

    from fts_errors_clustering_spark.operators.scale import heavy_hitters

    rows = [(f"w{i % (i % 97 + 1)}",) for i in range(20000)]
    toks = spark.createDataFrame(rows, "token string").repartition(8)
    got = [(r.token, r.n) for r in heavy_hitters(toks, 512, 10).collect()]
    exact = [(r.token, r.n) for r in
             (toks.groupBy("token").agg(F.count("*").alias("n"))
              .orderBy(F.desc("n"), F.asc("token")).limit(10)).collect()]
    assert got == exact


def test_heavy_hitters_short_candidate_union_falls_back(spark):
    """Skewed partitions can decrement the MG candidate union below top_n
    even when every surviving candidate clears the bound; the short recount
    is then NOT provably the exact top-n tail and must fall back. Corpus:
    a few massive heads survive capacity-1 sketches, the singleton tail is
    decremented away — result must still equal the exact aggregation."""
    from pyspark.sql import functions as F

    from fts_errors_clustering_spark.operators.scale import heavy_hitters

    rows = ([("alpha",)] * 500 + [("beta",)] * 400 +
            [(f"tail{i}",) for i in range(200)])
    toks = spark.createDataFrame(rows, "token string").repartition(4)
    got = [(r.token, r.n) for r in heavy_hitters(toks, 1, 8).collect()]
    exact = [(r.token, r.n) for r in
             (toks.groupBy("token").agg(F.count("*").alias("n"))
              .orderBy(F.desc("n"), F.asc("token")).limit(8)).collect()]
    assert got == exact
    assert len(got) == 8  # tail tokens present, not just the two heads
