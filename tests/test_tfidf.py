"""Invariant tests for the model-backed TF-IDF/LSA path (SURVEY.md section 5:
non-SQL-expressible stages get property checks, not value oracles)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fts_errors_clustering_spark.operators.tfidf import fit_lsa, fit_tfidf
from fts_errors_clustering_spark.sources.readers import table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def tfidf_fitted(spark):
    docs = table(spark, SF_SMALL, "documents")
    return fit_tfidf(docs)


def test_l2_norm_is_one(tfidf_fitted):
    _, out = tfidf_fitted
    from pyspark.ml.functions import vector_to_array
    arr = vector_to_array("features")
    norms = (out.select(F.sqrt(F.aggregate(arr, F.lit(0.0),
                                           lambda a, x: a + x * x)).alias("n"))
             .collect())
    assert all(abs(r.n - 1.0) < 1e-9 or r.n == 0.0 for r in norms)


def test_min_max_df_pruning(tfidf_fitted):
    """M9: min_df=0.02 / max_df=0.8 must prune the vocabulary: no term kept
    that appears in <2% or >80% of docs (the golden-constant analog of the
    reference's 852->135 feature cut)."""
    model, out = tfidf_fitted
    cv_model = model.stages[2]
    vocab = cv_model.vocabulary
    n_docs = out.count()
    toks = (out.select("doc_id", F.explode("_kept").alias("t"))
            .groupBy("t").agg(F.countDistinct("doc_id").alias("df")))
    dfs = {r.t: r.df for r in toks.collect()}
    for term in vocab:
        share = dfs.get(term, 0) / n_docs
        assert 0.02 <= share <= 0.8, (term, share)


def test_row_count_stable(tfidf_fitted, spark):
    """SURVEY.md 2.9.1 regression: the pipeline must not grow/shrink rows
    (the reference drifted 2826 -> 2926 via index duplication)."""
    _, out = tfidf_fitted
    docs = table(spark, SF_SMALL, "documents")
    n_nonempty = docs.where(F.length(F.trim("text")) > 0).count()
    assert out.count() == n_nonempty
    assert out.select("doc_id").distinct().count() == n_nonempty


def test_lsa_explained_variance(tfidf_fitted):
    """M11: the PCA subspace must capture most of the tf-idf variance
    (reference: 83% at k=25/135 features; fixture vocab is tiny so k=10
    should capture well over half)."""
    _, feats = tfidf_fitted
    model, reduced = fit_lsa(feats, k=10)
    pca_model = model.stages[0]
    ev = sum(pca_model.explainedVariance.toArray())
    assert ev > 0.5, ev
    assert reduced.count() == feats.count()


def test_lsa_norms(tfidf_fitted):
    _, feats = tfidf_fitted
    _, reduced = fit_lsa(feats, k=5)
    from pyspark.ml.functions import vector_to_array
    arr = vector_to_array("lsa_features")
    norms = (reduced.select(F.sqrt(F.aggregate(arr, F.lit(0.0),
                                               lambda a, x: a + x * x)).alias("n"))
             .collect())
    for r in norms:
        assert r.n == 0.0 or math.isclose(r.n, 1.0, rel_tol=1e-9)
