"""BM25 ranking and incremental dedup invariants (beyond oracle parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fts_errors_clustering_spark.operators.retrieval import (
    bm25_rank, incremental_dedup_counts)

from .conftest import SF_SMALL


def _toks(spark, rows):
    return (spark.createDataFrame(rows, "doc_id long, text string")
            .select("doc_id", F.explode(F.split("text", r"\s+")).alias("token")))


def test_bm25_planted_relevance(spark):
    """A doc saturated with the query terms must outrank docs that mention
    them once among noise; a doc with no query terms must not appear."""
    toks = _toks(spark, [
        (1, "merge sort merge sort merge sort"),
        (2, "merge alpha beta gamma delta epsilon zeta eta theta iota"),
        (3, "alpha beta gamma delta"),
        (4, "sort alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ])
    q = spark.createDataFrame([(1, "merge"), (1, "sort")],
                              "query_id long, token string")
    out = bm25_rank(toks, q, top_k=10).orderBy("rn").collect()
    assert [r.doc_id for r in out][0] == 1
    assert 3 not in {r.doc_id for r in out}
    # scores strictly follow rank order
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_rare_term_beats_common(spark):
    """Equal tf and doc length: the match on the rarer term scores higher
    (idf monotonicity)."""
    toks = _toks(spark, [
        (1, "rare alpha beta"),
        (2, "common alpha beta"),
        (3, "common gamma delta"),
        (4, "common epsilon zeta"),
    ])
    q = spark.createDataFrame([(1, "rare"), (2, "common")],
                              "query_id long, token string")
    out = {(r.query_id, r.doc_id): r.score
           for r in bm25_rank(toks, q, top_k=10).collect()}
    assert out[(1, 1)] > out[(2, 2)]


def test_bm25_length_normalization(spark):
    """Same tf on the query term: the shorter doc ranks higher (b > 0)."""
    toks = _toks(spark, [
        (1, "target alpha"),
        (2, "target alpha beta gamma delta epsilon zeta eta theta iota"),
        (3, "alpha beta gamma"),
    ])
    q = spark.createDataFrame([(1, "target")], "query_id long, token string")
    out = {r.doc_id: r.rn for r in bm25_rank(toks, q).collect()}
    assert out[1] < out[2]


def test_incremental_dedup_conservation(spark):
    """Per-source, kept + hist_dup + batch_dup == n_new, all nonnegative."""
    rows = incremental_dedup_counts(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_hist_dup + r.n_batch_dup == r.n_new
        assert min(r.n_kept, r.n_hist_dup, r.n_batch_dup) >= 0
