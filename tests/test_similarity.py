"""Recall/structure tests for the approximate similarity tiers (IVF, LSH)
against their exact baselines (SURVEY.md section 5: model-backed ops get
property checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fts_errors_clustering_spark.operators import similarity
from fts_errors_clustering_spark.operators.dbscan import eps_pairs_exact
from fts_errors_clustering_spark.sources.readers import table

from .conftest import SF_SMALL


def test_ivf_recall_vs_exact(spark):
    exact = similarity.ann_bruteforce_topk(spark, SF_SMALL).collect()
    ivf = similarity.ann_ivf_topk(spark, SF_SMALL).collect()
    exact_ids = {r.vec_id for r in exact}
    ivf_ids = {r.vec_id for r in ivf}
    # probing 2/8 cells on near-uniform vectors: require non-trivial recall
    assert len(exact_ids & ivf_ids) >= 2, (exact_ids, ivf_ids)
    # every IVF hit's cosine must be <= the exact best (no fabricated scores)
    assert max(r.cosine for r in ivf) <= max(r.cosine for r in exact) + 1e-9


def test_lsh_recall_vs_exact_pairs(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    exact_n = eps_pairs_exact(emb, "vec_id", "embedding", 64, 1.18).count()
    approx = similarity.lsh_neighbor_counts(spark, SF_SMALL)
    approx_n = approx.agg(F.sum("n_neighbors")).first()[0] or 0
    # LSH is a candidate filter: it can only MISS pairs, never invent them
    assert approx_n <= exact_n
    # and with 6 hash tables it must retain a solid majority
    assert approx_n >= 0.5 * exact_n, (approx_n, exact_n)


def test_near_dup_pairs_contain_planted(spark):
    rows = similarity.embedding_near_dup_pairs(spark, SF_SMALL).collect()
    planted = {(a, a + 100000) for a in range(10)}
    got = {(r.a, r.b) for r in rows}
    assert planted <= got
    for r in rows:
        if (r.a, r.b) in planted:
            assert abs(r.cosine - 1.0) < 1e-6


def test_hof_fold_bit_identical_to_explicit_chain(spark):
    """functions/vectors.py contract: the zip_with+aggregate fold must be
    bit-identical to the explicit left-associative sum the DuckDB oracle
    executes (IEEE 0.0 + x is exact, fold order is left-to-right)."""
    from functools import reduce

    from fts_errors_clustering_spark.functions.vectors import sq_dist
    from fts_errors_clustering_spark.sources.readers import table

    emb = table(spark, SF_SMALL, "embeddings")
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b")).limit(5000)

    def el(c, i):
        return F.col(c).getItem(i).cast("double")

    def explicit(x, y, dim):
        def term(i):
            d = el(x, i) - el(y, i)
            return d * d
        return reduce(lambda acc, i: acc + term(i), range(1, dim), term(0))

    rows = pairs.select(
        sq_dist("va", "vb").alias("fold"),
        explicit("va", "vb", 64).alias("chain")).collect()
    assert all(r.fold == r.chain for r in rows)
