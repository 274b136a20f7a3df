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


def test_svd_explained_variance_anchor(spark):
    """M11 proper: at the reference's shape (>=135 features, k=25,
    ``TF-IDF_K-Means_approach.ipynb:7840-7844``) truncated SVD must report
    the ~83%-explained-variance anchor. The fixture is built with 25
    dominant directions + noise sized so the true ratio is just above 0.83;
    the assertion window proves the MEASUREMENT (energy ratio from the
    singular values) tracks the planted structure."""
    import numpy as np
    from pyspark.ml.linalg import Vectors

    from fts_errors_clustering_spark.operators.tfidf import fit_lsa_svd

    rng = np.random.default_rng(7)
    n, d, r = 300, 150, 25
    base = rng.standard_normal((n, r)) @ rng.standard_normal((r, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.standard_normal((n, d))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    x = base + 0.45 * noise  # energy split ~ 1 / (1 + 0.45^2) ~ 0.83
    df = spark.createDataFrame(
        [(i, Vectors.dense(x[i])) for i in range(n)], ["doc_id", "features"])
    reduced, explained = fit_lsa_svd(df, k=r)
    assert 0.78 <= explained <= 0.92, explained
    assert reduced.count() == n
    # exact-rank control: with no noise, k=r captures everything
    df_pure = spark.createDataFrame(
        [(i, Vectors.dense(base[i])) for i in range(n)], ["doc_id", "features"])
    _, ev_pure = fit_lsa_svd(df_pure, k=r)
    assert ev_pure > 0.999, ev_pure


def test_svd_does_not_center(spark):
    """The PCA stand-in mean-centers (densifying sparse tf-idf at scale);
    the SVD path must not: an all-zero row's projection stays exactly zero,
    which is impossible under mean subtraction."""
    from pyspark.ml.linalg import Vectors

    from fts_errors_clustering_spark.operators.tfidf import fit_lsa_svd

    rows = [(0, Vectors.dense([1.0, 2.0, 3.0, 4.0])),
            (1, Vectors.dense([4.0, 3.0, 2.0, 1.0])),
            (2, Vectors.dense([1.0, 1.0, 1.0, 1.0])),
            (3, Vectors.sparse(4, [], []))]
    df = spark.createDataFrame(rows, ["doc_id", "features"])
    reduced, _ = fit_lsa_svd(df, k=2)
    zero_row = reduced.where(F.col("doc_id") == 3).first()
    assert all(abs(v) < 1e-12 for v in zero_row.lsa_svd), zero_row.lsa_svd


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


def test_model_cache_reuses_and_isolates(spark):
    """Session model registry: identical (key, hyperparams) fits return the
    SAME artifact while enabled, different keys stay distinct, and the
    default (disabled) path always fits fresh."""
    from fts_errors_clustering_spark.operators.model_cache import (
        memo, set_model_cache)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return object()

    try:
        set_model_cache(True)
        a = memo(("k", 1), build)
        b = memo(("k", 1), build)
        c = memo(("k", 2), build)
        assert a is b and a is not c and calls["n"] == 2
        # None key = caller opted out -> always builds
        memo(None, build)
        memo(None, build)
        assert calls["n"] == 4
    finally:
        set_model_cache(False)
    d = memo(("k", 1), build)
    e = memo(("k", 1), build)
    assert d is not e and calls["n"] == 6


def test_rsvd_matches_exact_tier(spark):
    """Randomized-SVD tier: on the planted-structure fixture the captured
    energy must land within a hair of the exact tier's (q=0 oversampled
    range finder on a fast-decaying spectrum), per-doc projection NORMS
    must agree with the exact tier (same subspace => same row energies,
    even though the basis itself is sign/rotation-indeterminate), and the
    fixed seed must make the whole fit deterministic."""
    import math

    import numpy as np
    from pyspark.ml.linalg import Vectors

    from fts_errors_clustering_spark.operators.tfidf import (fit_lsa_rsvd,
                                                             fit_lsa_svd)

    rng = np.random.default_rng(7)
    n, d, r = 300, 150, 25
    base = rng.standard_normal((n, r)) @ rng.standard_normal((r, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.standard_normal((n, d))
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    x = base + 0.45 * noise
    df = spark.createDataFrame(
        [(i, Vectors.dense(x[i])) for i in range(n)], ["doc_id", "features"])

    exact_red, exact_ev = fit_lsa_svd(df, k=r)
    rsvd_red, rsvd_ev = fit_lsa_rsvd(df, k=r)
    assert abs(rsvd_ev - exact_ev) <= 0.02, (rsvd_ev, exact_ev)

    en = {r_.doc_id: math.sqrt(sum(v * v for v in r_.lsa_svd))
          for r_ in exact_red.collect()}
    rn = {r_.doc_id: math.sqrt(sum(v * v for v in r_.lsa_rsvd))
          for r_ in rsvd_red.collect()}
    assert en.keys() == rn.keys()
    rel = [abs(en[i] - rn[i]) / max(en[i], 1e-12) for i in en]
    assert max(rel) <= 0.05, max(rel)

    # determinism under the fixed seed
    again, ev2 = fit_lsa_rsvd(df, k=r)
    assert ev2 == rsvd_ev
    rn2 = {r_.doc_id: r_.lsa_rsvd for r_ in again.collect()}
    rn1 = {r_.doc_id: r_.lsa_rsvd for r_ in rsvd_red.collect()}
    assert rn1 == rn2


def test_rsvd_sparse_high_dim(spark):
    """The sparse accumulation must survive a WEB-SCALE vocab dimension
    (d = 2e5) that the old dense flush path could not (a single 1024 x d
    dense block is 1.6 GB there; the whole planted matrix here carries
    only ~16k nonzeros). Planted rank-2 structure in two disjoint index
    blocks -> captured energy ~ 1.0 at k=2, per-doc projection norms
    equal to row norms, and seeded determinism. Mixed Sparse/Dense rows
    exercise both vector branches of the accumulator."""
    import math

    import numpy as np
    from pyspark.ml.linalg import Vectors

    from fts_errors_clustering_spark.operators.tfidf import fit_lsa_rsvd

    rng = np.random.default_rng(11)
    n, d = 400, 200_000
    u_idx = list(range(20))                      # block 1: dims 0..19
    v_idx = list(range(100_000, 100_020))        # block 2: far dims
    rows = []
    for i in range(n):
        a, b = float(rng.uniform(0.5, 2.0)), float(rng.uniform(0.5, 2.0))
        if i % 7 == 0:
            # a few structurally-dense rows (values mostly zero) hit the
            # DenseVector fallback branch without densifying the math
            dense = np.zeros(d)
            dense[u_idx] = a
            dense[v_idx] = b
            rows.append((i, Vectors.dense(dense)))
        else:
            rows.append((i, Vectors.sparse(
                d, u_idx + v_idx, [a] * 20 + [b] * 20)))
    df = spark.createDataFrame(rows, ["doc_id", "features"])

    red, ev = fit_lsa_rsvd(df, k=2)
    assert ev > 0.999, ev  # rank-2 planted structure fully captured
    got = {r.doc_id: math.sqrt(sum(v * v for v in r.lsa_rsvd))
           for r in red.collect()}
    # projection norm == row norm when the subspace captures the row
    for i, vec in rows:
        rn = float(np.linalg.norm(vec.toArray()))
        assert abs(got[i] - rn) / rn <= 1e-6, (i, got[i], rn)

    again, ev2 = fit_lsa_rsvd(df, k=2)
    assert ev2 == ev


def test_rsvd_trailing_empty_vector(spark):
    """Regression (r07 advice): a flush block whose FINAL element is an
    all-zero vector must not corrupt the preceding row's accumulation.
    The old clip-based reduceat shortened the last non-empty row's slice
    by one element (its last nonzero's contribution silently vanished
    from Y/GY/T). Single-partition input pins the empty row as the last
    element of the partition's final flush; rank-1 planted structure
    makes per-row projection norms exactly equal row norms, so a stolen
    contribution on the last non-empty row is a hard failure."""
    import math

    import numpy as np
    from pyspark.ml.linalg import Vectors
    from pyspark.sql import types as T

    from fts_errors_clustering_spark.operators.tfidf import fit_lsa_rsvd

    d = 64
    w = np.zeros(d)
    w[[3, 11, 27, 40, 55]] = [1.0, 2.0, 3.0, 4.0, 5.0]  # 5 nonzeros
    rows = [(i, Vectors.sparse(d, [3, 11, 27, 40, 55],
                               list((0.5 + i) * w[[3, 11, 27, 40, 55]])))
            for i in range(6)]
    rows.append((6, Vectors.sparse(d, [], [])))          # trailing empty
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", __import__(
            "pyspark.ml.linalg", fromlist=["VectorUDT"]).VectorUDT()),
    ])
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)

    red, ev = fit_lsa_rsvd(df, k=1)
    assert ev > 0.999999, ev  # exact rank-1: nothing may leak
    got = {r.doc_id: math.sqrt(sum(v * v for v in r.lsa_rsvd))
           for r in red.collect()}
    for i, vec in rows:
        rn = float(np.linalg.norm(vec.toArray()))
        if rn == 0.0:
            assert got[i] <= 1e-12, (i, got[i])
        else:
            assert abs(got[i] - rn) / rn <= 1e-9, (i, got[i], rn)
