"""Invariants for the curation family (operators/curation.py) and the new
vector ops (ann_batch_topk, label_centroid_cosine, zipf_slope). Value
correctness is covered by the oracle-parity sweep; these assert the
semantic properties a user of the curation pass relies on."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from fts_errors_clustering_spark.plans.registry import all_queries

from .conftest import SF_SMALL

_DEFS = all_queries()


def test_duplicate_ngram_coverage_bounds_and_planted(spark):
    rows = _DEFS["duplicate_ngram_coverage"].fn(spark, SF_SMALL).collect()
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        assert 0.0 <= r.dup_coverage <= 1.0
        assert r.n_dup_positions <= r.n_shingles
    # planted near-dups (originals re-inserted at +100000 with one extra
    # token) must be flagged as heavily duplicated, both copies
    planted = [r for r in rows if r.doc_id >= 100000]
    assert planted, "aug corpus lost its planted near-dups"
    for r in planted:
        assert r.dup_coverage >= 0.5
        twin = by_id.get(r.doc_id - 100000)
        assert twin is not None and twin.dup_coverage >= 0.5


def test_quality_filter_funnel_consistency(spark):
    rows = _DEFS["quality_filter_funnel"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_kept <= r.n_docs
        for c in ("n_fail_len", "n_fail_rep", "n_fail_quality"):
            assert 0 <= getattr(r, c) <= r.n_docs
        # a doc failing any rule is not kept
        assert r.n_kept <= r.n_docs - max(r.n_fail_len, r.n_fail_rep,
                                          r.n_fail_quality)


def test_curated_corpus_shrinks_and_keeps_tokens(spark):
    import duckdb
    rows = _DEFS["curated_corpus_stats"].fn(spark, SF_SMALL).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    base = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMALL}/documents.parquet'").fetchone()[0]
    # dedup + bench removal + quality + decontamination must strictly shrink
    assert 0 < total_docs < base
    for r in rows:
        assert r.n_tokens >= r.n_docs  # every kept doc has tokens


def test_ann_batch_topk_shape(spark):
    from fts_errors_clustering_spark.operators.similarity import (
        BATCH_K, N_QUERIES)
    df = _DEFS["ann_batch_topk"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == N_QUERIES * BATCH_K
    by_q = {}
    for r in rows:
        assert r.vec_id >= N_QUERIES  # query set excluded from candidates
        by_q.setdefault(r.qid, []).append(r)
    assert len(by_q) == N_QUERIES
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, BATCH_K + 1))
        cosines = [r.cosine for r in rs]
        assert cosines == sorted(cosines, reverse=True)
    # two-level top-k: the plan must contain BOTH window levels
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2


def test_label_centroid_cosine_pairs(spark):
    df = _DEFS["label_centroid_cosine"].fn(spark, SF_SMALL)
    rows = df.collect()
    labels = set()
    for r in rows:
        assert r.label_a < r.label_b
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
        labels.update((r.label_a, r.label_b))
    assert len(rows) == len(list(combinations(sorted(labels), 2)))


def test_zipf_slope_negative(spark):
    r = _DEFS["zipf_slope"].fn(spark, SF_SMALL).first()
    assert r.slope < 0  # frequency decreases with rank by construction
    assert r.n_terms > 0


def test_doc_chunks_cover_and_overlap(spark):
    """Chunk geometry invariants: chunk 0 starts the doc; consecutive
    chunks overlap by CHUNK_W - CHUNK_STRIDE tokens; the union of chunk
    spans covers every token; only the final chunk may be short."""
    from fts_errors_clustering_spark.operators.curation import (CHUNK_STRIDE,
                                                                CHUNK_W)
    from fts_errors_clustering_spark.operators.curation import doc_chunks
    from fts_errors_clustering_spark.functions.text import whitespace_tokens
    from fts_errors_clustering_spark.sources.readers import table

    chunks = doc_chunks(spark, SF_SMALL).collect()
    n_tok = {r.doc_id: r.n
             for r in table(spark, SF_SMALL, "documents")
             .where(F.length(F.trim("text")) > 0)
             .select("doc_id", F.size(whitespace_tokens("text")).alias("n"))
             .collect()}
    per_doc: dict[int, list] = {}
    for r in chunks:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(n_tok)
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r.chunk_id)
        n = n_tok[doc_id]
        assert [r.chunk_id for r in rs] == list(range(len(rs)))
        # all but the last chunk are full-width; spans cover the doc
        for r in rs[:-1]:
            assert r.n_tokens == CHUNK_W
        last = rs[-1]
        assert last.n_tokens == n - last.chunk_id * CHUNK_STRIDE
        assert last.chunk_id * CHUNK_STRIDE + last.n_tokens == n


def test_packed_sequences_conserve_tokens(spark):
    """Packing conservation: bin token counts sum to the corpus total; no
    bin is empty; every doc's start offset maps into exactly one bin."""
    from fts_errors_clustering_spark.operators.curation import packed_sequences
    from fts_errors_clustering_spark.functions.text import whitespace_tokens
    from fts_errors_clustering_spark.sources.readers import table

    bins = packed_sequences(spark, SF_SMALL).collect()
    total = (table(spark, SF_SMALL, "documents")
             .where(F.length(F.trim("text")) > 0)
             .select(F.sum(F.size(whitespace_tokens("text"))).alias("s"))
             .collect()[0].s)
    assert sum(r.n_tokens for r in bins) == total
    assert all(r.n_docs > 0 for r in bins)
    ids = sorted(r.bin_id for r in bins)
    assert len(ids) == len(set(ids))


def test_novelty_collapses_on_planted_dups(spark):
    from fts_errors_clustering_spark.operators.dedup import doc_novelty_scores
    rows = {r.doc_id: r for r in doc_novelty_scores(spark, SF_SMALL).collect()}
    planted = [i for i in rows if i >= 100000]
    assert planted, "planted dup corpus missing"
    for pid in planted:
        orig = rows.get(pid - 100000)
        if orig is None or orig.n_shingles < 3:
            continue
        # the pair shares all but the ' xdup'-suffix shingles -> both members
        # lose their uniqueness signal
        assert rows[pid].novelty <= 0.35, rows[pid]
        assert orig.novelty <= 0.35, orig
    for r in rows.values():
        assert 0 <= r.n_novel <= r.n_shingles
        assert 0.0 <= r.novelty <= 1.0


def test_domain_cap_two_level_equals_naive_window(spark):
    """The salted two-level per-domain top-k must equal the naive
    one-window-per-source definition exactly (the decomposition is the
    scale story; this pins its exactness)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fts_errors_clustering_spark.operators.curation import (
        DOMAIN_CAP, _quality_col, domain_capped_docs)
    from fts_errors_clustering_spark.functions.text import whitespace_tokens
    from fts_errors_clustering_spark.sources.readers import table

    from .conftest import SF_SMALL

    got = {r.source: (r.n_candidates, r.n_kept, r.min_kept_quality)
           for r in domain_capped_docs(spark, SF_SMALL).collect()}

    docs = (table(spark, SF_SMALL, "documents")
            .where(F.length(F.trim("text")) > 0))
    scored = (docs.select("doc_id", "source",
                          whitespace_tokens("text").alias("ts"), "text")
              .select("doc_id", "source", _quality_col().alias("q")))
    w = Window.partitionBy("source").orderBy(F.desc("q"), F.asc("doc_id"))
    naive = (scored.withColumn("rn", F.row_number().over(w))
             .groupBy("source")
             .agg(F.count("*").cast("long").alias("n_candidates"),
                  F.sum(F.when(F.col("rn") <= DOMAIN_CAP, 1).otherwise(0))
                   .cast("long").alias("n_kept"),
                  F.round(F.min(F.when(F.col("rn") <= DOMAIN_CAP,
                                       F.col("q"))), 6)
                   .alias("min_kept_quality")))
    want = {r.source: (r.n_candidates, r.n_kept, r.min_kept_quality)
            for r in naive.collect()}
    assert got == want
    assert all(k == DOMAIN_CAP for _, k, _m in got.values())  # cap binds


def test_leakage_safe_splits_planted_cross_split_families(spark):
    """Planted cross-split near-dup families at 10x fixture scale (5000
    docs): the cluster-keyed split (leakage_safe_splits' assignment rule)
    must put EVERY LSH-detected near-dup pair in one split — zero leakage —
    while the naive per-doc hash split provably leaks on the same corpus.
    Closes the loop the way the rank/cumsum property tests did for the
    two-phase global order (VERDICT r03 next-steps #6)."""
    import hashlib
    import os
    import random
    import tempfile

    from fts_errors_clustering_spark.operators.curation import SPLIT_BOUNDS
    from fts_errors_clustering_spark.operators.dedup import (
        dedup_clusters, minhash_near_dups)

    def naive_split(doc_id: int) -> str:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        return ("train" if b < SPLIT_BOUNDS[0]
                else "val" if b < SPLIT_BOUNDS[1] else "test")

    rng = random.Random(42)
    vocab = [f"w{i:04d}" for i in range(4000)]
    rows = []
    # 5000 unrelated base docs (short, distinct shingle sets)
    for i in range(5000):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(10))))
    # 40 planted families of 3 near-dup members each: 30-token base, each
    # member appends ONE distinct token (shingle Jaccard ~0.93, well above
    # the 0.5 LSH gate). Ids start at 10000; at least one family must
    # straddle naive splits for the leak assertion to bite — assert below.
    fam_members: list[list[int]] = []
    for f in range(40):
        base = " ".join(rng.choice(vocab) for _ in range(30))
        ids = [10000 + 10 * f + j for j in range(3)]
        fam_members.append(ids)
        for j, did in enumerate(ids):
            rows.append((did, f"{base} fam{f}tail{j}"))
    assert any(len({naive_split(d) for d in ids}) > 1 for ids in fam_members)

    with tempfile.TemporaryDirectory() as td:
        (spark.createDataFrame(rows, "doc_id long, text string")
         .selectExpr("doc_id", "text", "'en' AS lang", "'synth' AS source",
                     "CAST(length(text) AS BIGINT) AS n_chars")
         .write.mode("overwrite")
         .parquet(os.path.join(td, "documents.parquet")))
        pairs = [(r.a, r.b) for r in
                 minhash_near_dups(spark, td).select("a", "b").collect()]
        canon = {r.doc_id: r.canonical_id for r in
                 dedup_clusters(spark, td)
                 .select("doc_id", "canonical_id").collect()}

    # the plant was detected: every family is one connected component
    for ids in fam_members:
        assert len({canon[d] for d in ids}) == 1, ids
    # naive split leaks on the planted families
    assert any(naive_split(a) != naive_split(b) for a, b in pairs)
    # cluster-keyed split: zero cross-split near-dup pairs
    for a, b in pairs:
        assert naive_split(canon[a]) == naive_split(canon[b]), (a, b)


def test_shard_balance_conserves_docs_and_mean_skew(spark):
    """shard_balance_audit: shards partition the non-empty corpus exactly
    (doc/token totals conserved) and the token-skew column averages 1 by
    construction."""
    from fts_errors_clustering_spark.operators.scale import shard_balance_audit
    from fts_errors_clustering_spark.sources.readers import table

    rows = shard_balance_audit(spark, SF_SMALL).collect()
    docs = (table(spark, SF_SMALL, "documents")
            .where(F.length(F.trim("text")) > 0))
    assert sum(r.n_docs for r in rows) == docs.count()
    mean_skew = sum(r.token_skew for r in rows) / len(rows)
    assert abs(mean_skew - 1.0) < 1e-4
    assert all(r.token_skew > 0 for r in rows)


def test_source_overlap_matrix_conserves_pairs(spark):
    """Every near-dup pair lands in exactly one (source_a<=source_b) cell:
    the matrix total equals the LSH pair count."""
    from fts_errors_clustering_spark.operators.dedup import (
        minhash_near_dups, source_overlap_matrix)

    cells = source_overlap_matrix(spark, SF_SMALL).collect()
    n_pairs = minhash_near_dups(spark, SF_SMALL).count()
    assert sum(r.n_neardup_pairs for r in cells) == n_pairs
    for r in cells:
        assert r.source_a <= r.source_b


def test_neardup_sweep_monotone_and_anchored(spark):
    """Pair counts must be non-increasing in the threshold, and the 0.5
    cell must equal the minhash_near_dups pair count (same gate)."""
    from fts_errors_clustering_spark.operators.dedup import (
        minhash_near_dups, neardup_threshold_sweep)

    rows = sorted(neardup_threshold_sweep(spark, SF_SMALL).collect(),
                  key=lambda r: r.threshold)
    counts = [r.n_pairs for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0].threshold == 0.5
    assert rows[0].n_pairs == minhash_near_dups(spark, SF_SMALL).count()


def test_column_profile_bounds(spark):
    """Profiler sanity: nulls <= rows, distinct <= rows - nulls (+1 for the
    null bucket never counted), min <= max where present."""
    from fts_errors_clustering_spark.plans.registry import all_queries
    rows = all_queries()["events_column_profile"].fn(spark, SF_SMALL).collect()
    assert {r.column_name for r in rows} == {
        "event_id", "ts", "user_id", "event_type", "value", "props"}
    for r in rows:
        assert 0 <= r.n_null <= r.n_rows
        assert 0 <= r.n_distinct <= r.n_rows - r.n_null
        if r.min_value is not None:
            assert r.min_value <= r.max_value


def test_cc_chain_graph_log_rounds_and_release(spark):
    """Chaos twin of the DBSCAN chain test for the dedup connected
    components: a 4096-node path must resolve to one component within the
    pointer-halving round budget (max_iter=18 << n-1), AND the loop's
    round-release discipline must leave nothing pinned beyond the final
    consumer-registered checkpoint — released here as the consumer."""
    from pyspark.sql import functions as F

    from fts_errors_clustering_spark.operators.dedup import \
        min_label_components
    from fts_errors_clustering_spark.plans.registry import \
        release_consumer_caches

    def persist_ids():
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        return {int(k) for k in jmap.keySet().toArray()}

    # snapshot a CLEAN baseline: earlier tests in the session may have
    # materialized queries directly (outside the parity gate) and left
    # consumer-scoped caches awaiting acknowledgement
    release_consumer_caches()
    before = persist_ids()
    n = 4096
    fwd = (spark.range(n - 1)
           .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b")))
    edges = fwd.unionByName(fwd.select(F.col("b").alias("a"),
                                       F.col("a").alias("b")))
    ids = spark.range(n).select(F.col("id"))
    comp = min_label_components(ids, edges, max_iter=18)
    rows = comp.collect()
    assert len(rows) == n
    assert all(r.component == 0 for r in rows)
    release_consumer_caches()
    assert persist_ids() == before


def test_scoped_consumer_release_is_isolated(spark):
    """Per-query cache scoping: releasing query A's consumer caches must
    NOT unpersist a frame retained under query B's scope (the round-6
    global list let one consumer's release yank a localCheckpoint still
    backing another query's uncollected result). The no-arg release stays
    the drop-everything form."""
    from pyspark.storagelevel import StorageLevel

    from fts_errors_clustering_spark.plans.registry import (
        consumer_scope, release_consumer_caches, retain_for_consumer)

    release_consumer_caches()  # clean slate
    with consumer_scope("qa"):
        a = retain_for_consumer(spark.range(10).selectExpr("id * 2 AS x"))
    with consumer_scope("qb"):
        b = retain_for_consumer(spark.range(10).selectExpr("id * 3 AS y"))
    a.count(), b.count()
    assert a.storageLevel != StorageLevel.NONE
    assert b.storageLevel != StorageLevel.NONE

    assert release_consumer_caches("qa") == 1
    assert a.storageLevel == StorageLevel.NONE   # A released
    assert b.storageLevel != StorageLevel.NONE   # B untouched

    # nested scopes attribute to the OUTERMOST query
    with consumer_scope("outer"):
        with consumer_scope("inner"):
            c = retain_for_consumer(spark.range(5).selectExpr("id AS z"))
    c.count()
    assert release_consumer_caches("inner") == 0
    assert release_consumer_caches("outer") == 1
    assert c.storageLevel == StorageLevel.NONE

    assert release_consumer_caches("qb") == 1
    assert b.storageLevel == StorageLevel.NONE


def test_shared_lineage_release_is_refcounted(spark):
    """Regression (r07 advice): two scopes that retain the SAME logical
    plan (Spark's cache manager dedupes cache entries by plan, so both
    handles share one storage) must not lose the storage when only ONE
    of them releases — the last retaining scope's release unpersists."""
    from pyspark.storagelevel import StorageLevel

    from fts_errors_clustering_spark.plans.registry import (
        consumer_scope, release_consumer_caches, retain_for_consumer)

    release_consumer_caches()  # clean slate
    with consumer_scope("qa"):
        a = retain_for_consumer(spark.range(20).selectExpr("id * 7 AS x"))
    with consumer_scope("qb"):
        # same logical plan -> CacheManager resolves to the SAME storage
        b = retain_for_consumer(spark.range(20).selectExpr("id * 7 AS x"))
    a.count(), b.count()
    assert a.storageLevel != StorageLevel.NONE
    assert b.storageLevel != StorageLevel.NONE

    assert release_consumer_caches("qa") == 1     # qa's ref dropped...
    assert b.storageLevel != StorageLevel.NONE    # ...storage survives
    assert release_consumer_caches("qb") == 1     # last ref -> unpersist
    assert b.storageLevel == StorageLevel.NONE
    assert a.storageLevel == StorageLevel.NONE
