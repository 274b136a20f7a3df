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
    "ann_ivf_topk", "ann_ivfpq_topk", "ann_pq_topk",
    "dbscan_labels_lsh", "kmeans_cluster_sizes",
    "kmeans_quality", "lsa_features", "lsa_svd_features",
    "lsa_features_rsvd",
    "lsh_neighbor_counts",
    "pipeline_tfidf_kmeans", "pipeline_word2vec_dbscan",
    "semantic_dedup_ivf", "tfidf_pipeline_features", "word2vec_doc_vectors",
    "ann_recall_audit",  # composes the three fit-based ANN tiers above
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


@pytest.fixture(scope="module")
def nulls_dir(spark, tmp_path_factory):
    """Fixture tables with nulls injected into the nullable payload columns
    (text, props, value) — the shape real corpora arrive in. Ids/keys stay
    non-null (they are join keys by contract)."""
    from pyspark.sql import functions as F
    out = str(tmp_path_factory.mktemp("nulls_sf"))
    for t in TABLES:
        df = table(spark, SF_SMALL, t)
        if t == "documents":
            df = df.withColumn(
                "text", F.when(F.col("doc_id") % 19 == 0, None)
                         .otherwise(F.col("text")))
        if t == "events":
            df = (df.withColumn(
                      "props", F.when(F.col("event_id") % 17 == 0, None)
                                .otherwise(F.col("props")))
                    .withColumn(
                      "value", F.when(F.col("event_id") % 23 == 0, None)
                                .otherwise(F.col("value"))))
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def test_document_and_event_queries_survive_nulls(spark, nulls_dir):
    """Every documents/events-family query must run on null-bearing
    payloads (not necessarily produce the same rows — just never crash on
    a null text/props/value)."""
    probe = [
        "mask_documents", "document_tokens", "doc_token_stats",
        "doc_quality_scores", "token_counts", "lang_id_confusion",
        "dedup_exact", "doc_fingerprints", "minhash_near_dups",
        "ngram_jaccard_pairs", "simhash_signatures",
        "doc_repetition_stats", "duplicate_ngram_coverage",
        "quality_filter_funnel", "doc_chunks", "packed_sequences",
        "hash_split_counts", "mixture_weights",
        "json_props_flatten", "json_sum_by_type", "null_scan_fill",
        "value_histogram", "describe_event_value", "salted_group_members",
        "latest_event_per_user", "event_type_counts",
        # round-5 payload-facing additions
        "twa_value_per_user", "value_mad_outliers",
        "value_decile_histogram", "quality_retention_curve",
        "token_weighted_quality_quantiles", "rolling_7d_distinct_users",
        # round-6 payload-facing additions (funnel touches only non-null
        # contract columns but rides the probe as the cheapest regression
        # net; rsvd fits on the null-bearing text corpus)
        "user_funnel_conversion", "lsa_features_rsvd",
    ]
    qs = all_queries()
    failures = []
    for name in probe:
        try:
            qs[name].fn(spark, nulls_dir).collect()
        except Exception as ex:  # noqa: BLE001 — collecting a failure report
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, failures
