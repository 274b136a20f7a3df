"""Query registry: the single source of truth for the engine's surface.

Every operator from SURVEY.md section 2 (and the scale extensions) registers
itself here as a named ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, the DuckDB oracle SQL the driver runs
side-by-side (row-count + schema + order-insensitive value-hash).

Design rules enforced by convention here and asserted in tests:
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver's compare sorts columns by NAME);
- float outputs are either exact (DECIMAL-summed then cast to double —
  see functions.numeric) or rounded at a scale where cross-engine ULP noise
  cannot flip the rounding;
- no query depends on output row order (the driver hash is order-insensitive),
  so plans skip final sorts unless the semantics ARE a sort (top-k).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...]
    #: DuckDB SQL usable only by the LOCAL parity harness (it may reference
    #: Python UDFs the harness registers on its connection, e.g. seqratio).
    #: NOT exported through oracle_sql() — the external driver runs plain
    #: SQL strings and records such queries rows-only.
    local_oracle: str | None = None


_REGISTRY: dict[str, QueryDef] = {}

#: operator modules; imported lazily so `import plans.registry` stays cheap.
#:
#: ORDER MATTERS: the external correctness driver verifies registry entries
#: in insertion order with a bounded budget, so the families whose hard
#: (driver-side) verification is newest come FIRST; long-proven families
#: (relational/asof/textprep/tfidf/clustering) rotate to the tail, where the
#: local oracle-parity sweep (tests/test_oracle_parity.py, all entries at
#: sf0.001) remains their regression gate.
_MODULES = (
    "fts_errors_clustering_spark.operators.dbscan",
    "fts_errors_clustering_spark.operators.dedup",
    "fts_errors_clustering_spark.operators.similarity",
    "fts_errors_clustering_spark.operators.textstats",
    "fts_errors_clustering_spark.operators.multimodal",
    "fts_errors_clustering_spark.operators.curation",
    "fts_errors_clustering_spark.operators.selection",
    "fts_errors_clustering_spark.operators.scale",
    "fts_errors_clustering_spark.operators.windows",
    "fts_errors_clustering_spark.operators.pipelines",
    "fts_errors_clustering_spark.operators.knn",
    "fts_errors_clustering_spark.operators.graph",
    "fts_errors_clustering_spark.operators.linkage",
    "fts_errors_clustering_spark.operators.bpe",
    "fts_errors_clustering_spark.plans.sqlapi",
    "fts_errors_clustering_spark.operators.retrieval",
    "fts_errors_clustering_spark.operators.dq",
    "fts_errors_clustering_spark.operators.relational",
    "fts_errors_clustering_spark.operators.asof",
    "fts_errors_clustering_spark.operators.textprep",
    "fts_errors_clustering_spark.operators.tfidf",
    "fts_errors_clustering_spark.operators.clustering",
)


#: caches a query fn retains because its RETURNED plan references them
#: (multi-referenced lineage that Spark's exchange reuse cannot dedupe
#: under AQE — measured: the uncached tfidf_top_terms plan scans the
#: corpus 6x in one materialization). The consumer — bench, the check
#: CLI, the parity gate, any long-lived service — materializes the result
#: and then calls :func:`release_consumer_caches`; one-shot sessions (the
#: external driver) may skip it, their retention is bounded by the run.
#:
#: Keyed by SCOPE (the registered query name, set thread-locally by the
#: ``register`` wrapper around each query fn; ``__global__`` for direct
#: helper calls outside any query) so a consumer that has materialized
#: query A can release A's caches without yanking a localCheckpoint still
#: backing query B's uncollected result. All access under ``_CONSUMER_LOCK``.
#: Interleaved consumers on different threads are in contract BECAUSE
#: release refcounts by the frame's analyzed-plan semantic hash: two
#: scopes that retain the same helper-built lineage (Spark's cache
#: manager dedupes cache entries by logical plan) each hold a reference,
#: and the storage is unpersisted only when the LAST retaining scope
#: releases (r07 advice — previously releasing scope A yanked a cache
#: scope B still listed).
_CONSUMER_CACHES: dict[str, list[DataFrame]] = {}
_CONSUMER_LOCK = __import__("threading").RLock()
_CURRENT_SCOPE = __import__("threading").local()


def consumer_scope(name: str):
    """Context manager: retentions inside attribute to scope ``name``.
    Nested query fns (one operator calling another as a helper) keep the
    OUTERMOST scope — the caches belong to the query the consumer ran."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        prev = getattr(_CURRENT_SCOPE, "name", None)
        if prev is None:
            _CURRENT_SCOPE.name = name
        try:
            yield
        finally:
            _CURRENT_SCOPE.name = prev
    return _cm()


def retain_for_consumer(df: DataFrame) -> DataFrame:
    """Cache ``df`` (no-op if already persisted, e.g. a localCheckpoint)
    and register it for consumer-acknowledged release. After release a
    plain cache recomputes from lineage; a released localCheckpoint is
    GONE — re-collecting a result DataFrame obtained before the release
    is out of contract."""
    from pyspark.storagelevel import StorageLevel
    try:
        is_ckpt = (df._jdf.queryExecution().analyzed()
                   .getClass().getSimpleName() == "LogicalRDD")
    except Exception:  # noqa: BLE001
        is_ckpt = False
    if not is_ckpt and df.storageLevel == StorageLevel.NONE:
        df = df.cache()
    scope = getattr(_CURRENT_SCOPE, "name", None) or "__global__"
    with _CONSUMER_LOCK:
        _CONSUMER_CACHES.setdefault(scope, []).append(df)
    return df


def unpersist_any(df: DataFrame) -> None:
    """Release ``df``'s storage whatever pinned it. ``DataFrame.unpersist``
    only clears CacheManager entries (cache/persist); a localCheckpoint
    pins its RDD OUTSIDE the CacheManager (measured: df.unpersist() is a
    no-op on one), so checkpoint-backed plans (LogicalRDD) are released at
    the RDD handle. A released checkpoint cannot recompute — callers only
    release rounds that have been superseded or results the consumer has
    acknowledged."""
    try:
        df.unpersist()
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — a dead session must not block release
        pass


def _plan_key(df: DataFrame):
    """Identity of the frame's cached storage: the analyzed plan's
    semantic hash (what Spark's CacheManager dedupes cache entries by).
    Falls back to the Python object id when the JVM handle is gone — a
    dead frame only ever matches itself, which degrades to the old
    per-scope behavior instead of blocking a release."""
    try:
        return ("sem", df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:  # noqa: BLE001
        return ("pyid", id(df))


def release_consumer_caches(scope: str | None = None) -> int:
    """Unpersist consumer-scoped caches; returns how many were released.
    With ``scope`` (a query name) releases only that query's retentions;
    with no argument releases everything (the single-consumer convention
    of the check CLI / parity sweep). Safe for interleaved consumers: a
    frame whose analyzed-plan semantic hash is still retained by another
    scope is dropped from this scope's list but its storage is NOT
    unpersisted — the last retaining scope's release does that."""
    with _CONSUMER_LOCK:
        if scope is None:
            frames = [f for lst in _CONSUMER_CACHES.values() for f in lst]
            _CONSUMER_CACHES.clear()
            still_held: dict = {}
        else:
            frames = _CONSUMER_CACHES.pop(scope, [])
            still_held = {}
            for lst in _CONSUMER_CACHES.values():
                for f in lst:
                    # ALL frames per key, not one representative: two
                    # distinct still-held plans colliding on the 32-bit
                    # semanticHash must each get a sameResult shot, or the
                    # non-representative one's storage would be freed while
                    # its scope still holds it (r09 advisor finding)
                    still_held.setdefault(_plan_key(f), []).append(f)
    for df in frames:
        holders = still_held.get(_plan_key(df), [])
        if not any(_same_plan(df, h) for h in holders):
            unpersist_any(df)
    return len(frames)


def _same_plan(a: DataFrame, b: DataFrame) -> bool:
    """True iff the two frames' analyzed plans are semantically the SAME
    storage (CacheManager identity). Guards the 32-bit semanticHash against
    collisions: two distinct plans that collide must NOT make a release
    skip the unpersist (that would silently leak cached storage until a
    global release). ``pyid`` fallback keys are exact by construction; for
    ``sem`` keys confirm with Catalyst's sameResult. If the JVM handle is
    gone, answer True (conservative: treat as held — degrades to the
    pre-r09 skip, never a double-free of a live plan another scope holds)."""
    if a is b:
        return True
    try:
        pa = a._jdf.queryExecution().analyzed()
        pb = b._jdf.queryExecution().analyzed()
        return bool(pa.sameResult(pb))
    except Exception:  # noqa: BLE001
        return True


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
             local_oracle: str | None = None):
    """Decorator: register a query under ``name`` with an optional oracle
    (and optionally a harness-local oracle needing registered UDFs)."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        import functools

        @functools.wraps(fn)
        def scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # every retain_for_consumer during the call (including via
            # helper operators) attributes to THIS query's cache scope
            with consumer_scope(name):
                return fn(spark, sf_dir)

        _REGISTRY[name] = QueryDef(name, scoped, oracle, tuple(tags),
                                   local_oracle)
        # return the RAW fn: intra-module helper calls stay unscoped so the
        # outermost registered query owns the retention (consumer_scope
        # keeps the outer name on nesting anyway)
        return fn
    return deco


#: Explicit head of the driver-facing query order. The external correctness
#: driver verifies entries in dict order with a bounded budget (~50), and
#: cross-module imports make raw registration order fragile, so the names
#: whose hard verification is newest are pinned first here; everything else
#: follows in registration order. tests/test_oracle_parity.py asserts every
#: head name exists and sits inside the budget window.
_HEAD = (
    # ROUND-11 ROTATION (VERDICT r10 ask #6): first the 14 r10-optimized
    # queries whose post-change driver oracle evidence is missing (they
    # rotated out of the r10 sample head), then the 4 oracle-backed
    # queries this round's optimizations touched (dbscan driver-tier
    # restructure; external_cluster_metrics aggregate gained the folded
    # n_clusters column; part_affinity_lift rides the graph-family
    # edits), then the stalest-evidence r06 rows up to the 50-slot
    # budget.
    "copurchase_kcore", "copurchase_triangle_count", "rfm_customer_segments",
    "supplier_revenue_pareto", "importance_weights_dsir",
    "curriculum_length_phases", "leakage_safe_splits", "minhash_near_dups",
    "incremental_neardup_counts", "dedup_clusters", "knn_knee_epsilon",
    "knn_knee_sweep", "ab_test_ranksum", "nelson_aalen_hazard",
    "dbscan_labels", "dbscan_summary", "external_metrics_pseudo",
    "part_affinity_lift", "ann_recall_audit", "approx_distinct_and_quantiles",
    "brand_revenue_by_nation", "cast_label_counts", "cluster_stats_by_source",
    "cluster_stats_by_source_exact", "crosstab_priority_status",
    "customers_without_orders", "describe_event_type", "describe_event_value",
    "doc_token_stats", "document_tokens", "event_type_counts",
    "events_asof_latest_order", "group_members_by_lang",
    "histogram_quantile_rollup", "interval_join_prior_events",
    "json_props_flatten", "k_anonymity_audit", "kmeans_cluster_sizes",
    "kmeans_quality", "knn_mean_distance", "late_shipment_orders",
    "length_stats_by_source", "lsa_features", "lsa_features_rsvd",
    "mask_documents", "null_scan_fill", "pricing_summary", "revenue_by_region",
    "rollup_event_counts", "summary_all_numeric",
)

#: entries rotated DIRECTLY AFTER the head (i.e. first past the driver's
#: ~50-row budget), ordered stalest-evidence-first: the remaining r06/r07/
#: r08 rows in their prior order, then the r09 head, then the r10 head
#: (freshest driver evidence) last. Every name here already has a green
#: driver row; the local parity sweep (tests/test_oracle_parity.py over
#: all entries at sf0.001) remains their regression gate.
_TAIL_AFTER_HEAD = (
    "term_frequency", "term_idf", "tfidf_pipeline_features", "tfidf_top_terms",
    "top_customers_per_region", "user_event_gaps", "user_funnel_conversion",
    "user_type_group_size", "value_decile_summary",
    "value_percentiles_by_type", "vocabulary_set_ops", "vocabulary_size",
    "word2vec_doc_vectors", "ann_batch_topk", "ann_bruteforce_topk",
    "count_filtered_events", "curated_corpus_stats", "dedup_exact",
    "distinct_documents", "distribution_drift_psi", "doc_chunks",
    "doc_fingerprints", "doc_quality_scores", "doc_repetition_stats",
    "duplicate_ngram_coverage", "embedding_near_dup_pairs", "funnel_counts",
    "funnel_step_timing", "hash_split_counts", "json_sum_by_type",
    "lang_id_confusion", "last_touch_attribution", "latest_event_per_user",
    "multimodal_metadata", "ngram_jaccard_pairs", "pipeline_tfidf_kmeans",
    "pipeline_word2vec_dbscan", "quality_filter_funnel",
    "quality_threshold_by_lang", "session_windows_6h", "simhash_near_dups",
    "skew_join_segments", "sliding_2h_windows", "streaming_cusum_tail",
    "streaming_funnel_tail", "streaming_hq_rollup_tail",
    "streaming_interarrival_tail", "token_budget_selection", "token_counts",
    "top_events_by_value", "top_users_share", "topn_semijoin_events",
    "tumbling_hourly_by_type", "unpivot_lineitem_measures", "value_histogram",
    "zipf_slope", "ab_test_cuped", "ab_test_lift", "benchmark_contamination",
    "bigram_logprob_scores", "boilerplate_prefix_groups",
    "chi2_priority_status", "cohort_ltv_triangle",
    "cube_priority_status_revenue", "daily_cumulative_events",
    "data_quality_report", "debounced_event_counts", "decayed_user_scores",
    "event_transition_matrix", "event_trigram_journeys", "forward_fill_values",
    "fulfillment_lag_stats", "hourly_anomaly_scores",
    "hourly_resampled_counts", "hourly_session_concurrency",
    "idle_rich_customers", "internal_cluster_metrics", "label_centroid_cosine",
    "lang_token_divergence", "lsa_svd_features", "mixture_weights",
    "modal_bucket_by_type", "multimodal_audio_features",
    "nation_revenue_share", "nation_revenue_theilsen", "pmi_top_collocations",
    "quality_signal_correlation", "rolling_7d_user_value", "sample_events",
    "shipping_priority_topk", "silhouette_by_label", "small_quantity_revenue",
    "sole_late_suppliers", "streaming_debounce_gate",
    "streaming_interval_join", "streaming_neardup_gate",
    "streaming_stateful_dedup", "streaming_tumbling_hourly",
    "streaming_upsert_compaction", "user_event_entropy",
    "user_profile_similarity_topk", "weekly_cohort_retention",
    "weighted_doc_sample", "winsorized_value_stats", "activity_heatmap",
    "ann_ivf_topk", "ann_pq_topk", "benford_deviation",
    "cheapest_supplier_per_part", "customer_order_distribution",
    "dbscan_labels_lsh", "disjunctive_bracket_revenue", "doc_novelty_scores",
    "domain_capped_docs", "embedding_quantization_error",
    "events_asof_next_order", "forecast_revenue_delta",
    "hll_rollup_daily_users", "important_part_value",
    "lang_temperature_weights", "large_volume_customers",
    "late_exists_priority_counts", "linestatus_priority_counts",
    "local_supplier_revenue", "lsh_neighbor_counts", "market_share_by_year",
    "minhash_signatures", "mixture_sampled_counts", "multimodal_features",
    "multimodal_framesample", "nation_profit_by_year", "nation_trade_volume",
    "packing_efficiency", "part_supplier_diversity", "promo_revenue_share",
    "props_variant_stats", "quality_percentile_by_lang",
    "returned_item_losses", "semantic_dedup_ivf", "simhash_signatures",
    "snapshot_diff_counts", "split_leakage_counts", "stratified_doc_sample",
    "time_rollup_revenue", "top_supplier_by_revenue", "treebank_tokens",
    "weekly_growth_by_type", "ab_test_logrank", "ann_ivfpq_topk",
    "bm25_search", "bpe_merge_table", "bpe_tokens_per_lang",
    "bpe_vocab_tokens", "canonical_by_quality", "contrastive_chunk_pairs",
    "dataset_fingerprint", "dominant_part_suppliers", "dow_seasonality_index",
    "embedding_norm_stats", "events_column_profile", "fd_violation_audit",
    "flagship_top_error_users", "global_value_rank", "heavy_hitter_tokens",
    "hourly_cusum_changepoint", "hybrid_search_rrf",
    "incremental_agg_maintenance", "incremental_dedup_counts",
    "nation_revenue_trend", "neardup_threshold_sweep", "open_orders_backlog",
    "packed_sequences", "pareto_frontier_parts", "part_copurchase_pagerank",
    "part_entity_matches", "pii_audit_counts", "quality_retention_curve",
    "rest_tail_category_counts", "revenue_autocorrelation",
    "revenue_gini_by_nation", "rolling_7d_distinct_users",
    "salted_group_members", "scd2_user_intervals", "shard_balance_audit",
    "snapshot_publish_roundtrip", "source_overlap_matrix",
    "split_neardup_leakage", "split_stratification_chi2",
    "sql_api_revenue_by_priority", "stratified_hash_sample",
    "token_weighted_quality_quantiles", "tokenizer_fertility_by_lang",
    "twa_value_per_user", "user_interarrival_stats", "value_decile_histogram",
    "value_mad_outliers",
)


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QueryDef]:
    _load()
    pinned = _HEAD + _TAIL_AFTER_HEAD
    missing = [n for n in pinned if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"registry head names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in pinned}
    ordered.update((n, d) for n, d in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {n: d.fn for n, d in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: d.oracle for n, d in all_queries().items() if d.oracle is not None}
