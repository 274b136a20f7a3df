"""Empty-input robustness: every query must run (not necessarily return
rows) on structurally valid but EMPTY tables — the degenerate case the
reference never handles (its notebooks crash on 38 empty strings,
SURVEY.md §2.9.2). ML model fits are exempt: fitting KMeans/Word2Vec/LSH
on zero rows throws by design in MLlib exactly as it does in
sklearn/gensim."""

from __future__ import annotations

import os

import pytest

from fts_errors_clustering_spark.plans.registry import all_queries
from fts_errors_clustering_spark.sources.readers import table

from .conftest import SF_SMALL

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

#: queries whose core IS a model fit — empty fits throw in every framework
FIT_BASED = {
    "ann_ivf_topk", "dbscan_labels_lsh", "kmeans_cluster_sizes",
    "kmeans_quality", "lsa_features", "lsa_svd_features",
    "lsh_neighbor_counts",
    "pipeline_tfidf_kmeans", "pipeline_word2vec_dbscan",
    "tfidf_pipeline_features", "word2vec_doc_vectors",
}


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        (table(spark, SF_SMALL, t).limit(0)
         .write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet")))
    return out


def test_all_non_fit_queries_survive_empty_tables(spark, empty_dir):
    failures = []
    for name, q in sorted(all_queries().items()):
        if name in FIT_BASED:
            continue
        try:
            q.fn(spark, empty_dir).collect()
        except Exception as ex:  # noqa: BLE001 — collecting a failure report
            failures.append(f"{name}: {type(ex).__name__}")
    assert not failures, failures
