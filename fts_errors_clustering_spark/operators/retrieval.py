"""Ranked retrieval + incremental corpus maintenance.

Two capabilities a user of the reference's tf-idf stack reaches for next:

1. ``bm25_search`` — Okapi BM25 ranked retrieval over the corpus for a
   fixed query set. The reference builds tf-idf matrices for clustering
   (``/root/reference/notebooks/TF-IDF_K-Means_approach.ipynb:5514-5599``)
   but has no search surface; BM25 is the standard lexical-ranking
   completion of that stack (Robertson & Zaragoza 2009, public formula;
   Lucene's idf variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``).

2. ``incremental_dedup_counts`` — the shipping form of exact dedup: a NEW
   batch of documents arrives and must be reconciled against the already-
   ingested corpus (drop exact matches against history, then drop
   intra-batch duplicates keeping the lowest doc_id). Complements
   ``dedup_exact``/``dedup_clusters`` (operators/dedup.py), which dedup a
   corpus against itself.

Scale posture:
- BM25 joins the (doc, term) postings against a literal broadcast query
  table FIRST, so only the postings of query terms survive the scan —
  at 100 TB the shuffle carries |query_terms| posting lists, not the
  corpus. Corpus-wide stats (N, avgdl, df) are aggregates that partially
  combine map-side; df joins back as a broadcast (|query terms| rows).
- Incremental dedup shuffles 16-byte digests only (never bodies), as a
  sort-merge anti-join on the digest — both sides can be arbitrarily
  large; no broadcast assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import sql_whitespace_tokens
from ..plans.registry import register
from ..sources.readers import table
from .textprep import document_tokens

# BM25 constants (standard defaults; identical literals on both engines so
# the doubles are bit-identical).
_K1 = 1.2
_B = 0.75

#: fixed benchmark query set (literal on both engines).
_QUERIES = (
    (1, "merge"), (1, "sort"), (1, "window"),
    (2, "hash"), (2, "join"), (2, "spark"),
    (3, "slow"), (3, "query"), (3, "scan"),
)

_TOKS_CTE = f"""
    toks AS (SELECT doc_id, unnest({sql_whitespace_tokens('text')}) AS token
             FROM documents WHERE length(trim(text)) > 0)
"""

_Q_VALUES = ", ".join(f"({q}, '{t}')" for q, t in _QUERIES)


_BM25_ORACLE = f"""
    WITH {_TOKS_CTE},
    cnts AS (SELECT doc_id, token, COUNT(*) AS cnt FROM toks GROUP BY doc_id, token),
    lens AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS dl FROM cnts GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
              FROM lens),
    dfreq AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM cnts GROUP BY token),
    q(query_id, token) AS (VALUES {_Q_VALUES}),
    scored AS (
        SELECT q.query_id, c.doc_id,
               LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * ((c.cnt * ({_K1} + 1.0)) /
                    (c.cnt + {_K1} * (1.0 - {_B} + {_B} * (l.dl / s.avgdl)))) AS w
        FROM q
        JOIN cnts c ON q.token = c.token
        JOIN dfreq d ON c.token = d.token
        JOIN lens l ON c.doc_id = l.doc_id
        CROSS JOIN stats s),
    agg AS (SELECT query_id, doc_id,
                   ROUND(CAST(CAST(SUM(CAST(w AS DECIMAL(27,18))) AS VARCHAR)
                              AS DOUBLE), 6) AS score
            FROM scored GROUP BY query_id, doc_id)
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS BIGINT) AS rn
    FROM agg
    QUALIFY rn <= 10
    """


def bm25_rank(toks: DataFrame, q: DataFrame, top_k: int = 10) -> DataFrame:
    """Core BM25 ranking over a (doc_id, token) stream for a (query_id,
    token) query table; returns top-``top_k`` (query_id, doc_id, score, rn).

    Plan shape: one aggregation of the exploded token stream into sparse
    (doc, term, cnt) postings; the query table broadcasts into the postings
    join so only query-term postings flow further; doc lengths are a
    map-side-combined aggregate joined AFTER that filter (windowing dl over
    the full postings would sort the whole stream first); corpus stats
    (N, avgdl) broadcast as a 1-row aggregate; df computed corpus-wide then
    broadcast (≤ |vocabulary| rows, and only query terms survive the join). The
    per-(query, doc) sum runs in DECIMAL so both engines hold bit-identical
    totals (functions/numeric rationale); ranking keys on the ROUNDED score
    so cross-engine ULP noise cannot flip rank order.
    """
    # the query-term SEMI-filter happens BEFORE any (doc, token)
    # aggregation: only query-term occurrences ever enter a groupBy, so the
    # postings shuffle is |query_terms| lists, never the full vocabulary.
    # (The earlier shape aggregated the full-vocab postings once per
    # consumer — the dominant cost, re-run three times.)
    qtoks = q.select("token").distinct()
    cnts_q = (toks.join(F.broadcast(qtoks), "token")
              .groupBy("doc_id", "token").agg(F.count("*").alias("cnt")))

    # doc lengths and corpus stats come straight off the raw token stream
    # (map-side-combined count per doc) — no full postings table needed
    lens = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    stats = lens.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"))

    # df restricted to query terms is identical to the full-vocab df on
    # those terms (df(t) counts docs containing t, independent of others)
    dfreq = cnts_q.groupBy("token").agg(F.count("*").cast("double").alias("df"))

    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) /
                (F.col("df") + F.lit(0.5)))
    tf_part = ((F.col("cnt") * F.lit(_K1 + 1.0)) /
               (F.col("cnt") + F.lit(_K1) *
                (F.lit(1.0 - _B) + F.lit(_B) * (F.col("dl") / F.col("avgdl")))))
    scored = (cnts_q.join(F.broadcast(q), "token")
              .join(F.broadcast(dfreq), "token")
              .join(lens, "doc_id")
              .crossJoin(F.broadcast(stats))
              .select("query_id", "doc_id", (idf * tf_part).alias("w")))

    agg = (scored.groupBy("query_id", "doc_id")
           .agg(F.round(F.sum(F.col("w").cast("decimal(27,18)"))
                        .cast("string").cast("double"), 6).alias("score")))
    wrank = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (agg.withColumn("rn", F.row_number().over(wrank).cast("long"))
            .where(F.col("rn") <= top_k)
            .select("query_id", "doc_id", "score", "rn"))


@register("bm25_search", oracle=_BM25_ORACLE, tags=("text", "retrieval"))
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per query of the fixed literal query set, over the
    documents table (see ``bm25_rank`` for the plan-shape rationale)."""
    toks = document_tokens(spark, sf_dir)
    q = spark.createDataFrame(list(_QUERIES), "query_id long, token string")
    return bm25_rank(toks, q, top_k=10)


@register(
    "incremental_dedup_counts",
    oracle="""
    WITH base AS (
        SELECT doc_id, source, md5(lower(trim(text))) AS h
        FROM documents WHERE length(trim(text)) > 0),
    hist AS (SELECT DISTINCT h FROM base WHERE doc_id % 10 <> 0),
    batch AS (SELECT doc_id, source, h FROM base WHERE doc_id % 10 = 0),
    flagged AS (
        SELECT b.doc_id, b.source, b.h,
               CASE WHEN hist.h IS NOT NULL THEN 1 ELSE 0 END AS hist_dup
        FROM batch b LEFT JOIN hist ON b.h = hist.h),
    ranked AS (
        SELECT *, CASE WHEN hist_dup = 0 AND ROW_NUMBER() OVER (
                           PARTITION BY h ORDER BY doc_id) > 1
                       THEN 1 ELSE 0 END AS batch_dup
        FROM flagged)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_new,
           CAST(SUM(hist_dup) AS BIGINT) AS n_hist_dup,
           CAST(SUM(batch_dup) AS BIGINT) AS n_batch_dup,
           CAST(COUNT(*) - SUM(hist_dup) - SUM(batch_dup) AS BIGINT) AS n_kept
    FROM ranked
    GROUP BY source
    """,
    tags=("dedup", "incremental"),
)
def incremental_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconcile an incoming batch against the already-ingested corpus.

    The batch is simulated deterministically as ``doc_id % 10 == 0`` (the
    rest is "history"). A batch doc is dropped if its content digest
    already exists in history (anti-join semantics) or if an earlier batch
    doc (lower doc_id) carries the same digest; per-source counts of each
    outcome are reported — the dataset-card numbers an ingest job emits.

    Scale: both sides reduce to 16-byte digests before the join; the
    hist side is distinct-ed (digest-only shuffle) and the join is a plain
    sort-merge left join on the digest — no size assumption on either side.
    Intra-batch dedup is one window over the same digest key, reusing the
    partitioning.
    """
    docs = table(spark, sf_dir, "documents")
    base = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", "source",
                    F.md5(F.lower(F.trim("text"))).alias("h")))
    hist = (base.where(F.col("doc_id") % 10 != 0)
            .select("h").distinct().withColumn("in_hist", F.lit(1)))
    batch = base.where(F.col("doc_id") % 10 == 0)

    flagged = (batch.join(hist, "h", "left")
               .withColumn("hist_dup",
                           F.when(F.col("in_hist").isNotNull(), 1).otherwise(0)))
    w = Window.partitionBy("h").orderBy("doc_id")
    ranked = flagged.withColumn(
        "batch_dup",
        F.when((F.col("hist_dup") == 0) & (F.row_number().over(w) > 1), 1)
         .otherwise(0))
    return (ranked.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_new"),
                 F.sum("hist_dup").cast("long").alias("n_hist_dup"),
                 F.sum("batch_dup").cast("long").alias("n_batch_dup"),
                 (F.count("*") - F.sum("hist_dup") - F.sum("batch_dup"))
                 .cast("long").alias("n_kept")))


# --- hybrid retrieval: BM25 + embedding cosine, fused by RRF -----------------

from ..functions.vectors import cosine, sql_cosine  # noqa: E402

_EMB_DIM = 64
_RRF_K = 60         # standard reciprocal-rank-fusion constant
_FUSE_DEPTH = 50    # per-ranker candidate depth before fusion
_SEM_QUERY = 0      # embeddings row used as the semantic query
_LEX_QUERY = 1      # _QUERIES id used as the lexical query


@register(
    "hybrid_search_rrf",
    oracle=f"""
    WITH {_TOKS_CTE},
    cnts AS (SELECT doc_id, token, COUNT(*) AS cnt FROM toks GROUP BY doc_id, token),
    lens AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS dl FROM cnts GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM lens),
    dfreq AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df FROM cnts GROUP BY token),
    q(query_id, token) AS (VALUES {_Q_VALUES}),
    scored AS (
        SELECT c.doc_id,
               LN(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                 * ((c.cnt * ({_K1} + 1.0)) /
                    (c.cnt + {_K1} * (1.0 - {_B} + {_B} * (l.dl / s.avgdl)))) AS w
        FROM q
        JOIN cnts c ON q.token = c.token
        JOIN dfreq d ON c.token = d.token
        JOIN lens l ON c.doc_id = l.doc_id
        CROSS JOIN stats s
        WHERE q.query_id = {_LEX_QUERY}),
    lexagg AS (SELECT doc_id,
                      ROUND(CAST(CAST(SUM(CAST(w AS DECIMAL(27,18))) AS VARCHAR)
                                 AS DOUBLE), 6) AS score
               FROM scored GROUP BY doc_id),
    lex AS (SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                        AS BIGINT) AS r_lex
            FROM lexagg
            QUALIFY r_lex <= {_FUSE_DEPTH}),
    qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = {_SEM_QUERY}),
    semscored AS (
        SELECT e.vec_id AS doc_id,
               {sql_cosine('e.embedding', 'q.v', _EMB_DIM)} AS cos
        FROM embeddings e, qv q WHERE e.vec_id <> {_SEM_QUERY}),
    sem AS (SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
                        AS BIGINT) AS r_sem
            FROM semscored
            QUALIFY r_sem <= {_FUSE_DEPTH}),
    fused AS (
        SELECT doc_id,
               COALESCE(1.0 / ({_RRF_K} + l.r_lex), 0.0)
                 + COALESCE(1.0 / ({_RRF_K} + s.r_sem), 0.0) AS rrf
        FROM lex l FULL JOIN sem s USING (doc_id))
    SELECT doc_id, ROUND(rrf, 6) AS rrf,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rn
    FROM fused
    QUALIFY rn <= 10
    """,
    tags=("retrieval", "hybrid", "vectors"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 lexical ranking (query {_LEX_QUERY}) and
    embedding-cosine semantic ranking (query vector {_SEM_QUERY}) fused by
    reciprocal-rank fusion ``sum 1/(60 + rank)`` — the standard two-ranker
    composition (Cormack et al. 2009) a retrieval stack ships once it has
    both an inverted index and an ANN index. Doc ids align with vec ids in
    the fixtures, standing in for a real doc↔embedding mapping.

    Scale: each ranker keeps only its top-{_FUSE_DEPTH} (BM25 via the
    query-term-pruned postings plan, cosine via TakeOrderedAndProject);
    fusion is a full outer join of two {_FUSE_DEPTH}-row tables — rank
    integers make the RRF arithmetic bit-identical across engines.
    """
    toks = document_tokens(spark, sf_dir)
    q = spark.createDataFrame(
        [(qid, t) for qid, t in _QUERIES if qid == _LEX_QUERY],
        "query_id long, token string")
    lex = (bm25_rank(toks, q, top_k=_FUSE_DEPTH)
           .select("doc_id", F.col("rn").alias("r_lex")))

    emb = table(spark, sf_dir, "embeddings")
    qv = (emb.where(F.col("vec_id") == _SEM_QUERY)
          .select(F.col("embedding").alias("v")))
    semscored = (emb.where(F.col("vec_id") != _SEM_QUERY)
                 .crossJoin(F.broadcast(qv))
                 .select(F.col("vec_id").alias("doc_id"),
                         cosine("embedding", "v", _EMB_DIM).alias("cos")))
    from pyspark.sql import Window
    sem_top = (semscored.orderBy(F.desc("cos"), F.asc("doc_id"))
               .limit(_FUSE_DEPTH))
    wsem = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    sem = (sem_top.withColumn("r_sem", F.row_number().over(wsem).cast("long"))
           .select("doc_id", "r_sem"))

    fused = (lex.join(sem, "doc_id", "full_outer")
             .select("doc_id",
                     (F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_lex")),
                                 F.lit(0.0)) +
                      F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_sem")),
                                 F.lit(0.0))).alias("rrf")))
    top = fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(10)
    wr = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (top.withColumn("rn", F.row_number().over(wr).cast("long"))
            .select("doc_id", F.round("rrf", 6).alias("rrf"), "rn"))


# --- incremental NEAR-dup gate: batch vs history, MinHash-LSH ----------------

def _incr_neardup_oracle() -> str:
    from .dedup import BAND_SIZE, N_HASHES, _shingle_sql
    from ..functions.text import sql_hash32, sql_hash32_hi
    return f"""
    WITH combo AS (
      SELECT doc_id, text,
             CASE WHEN doc_id % 10 = 0 THEN 'batch' ELSE 'hist' END AS role
      FROM documents WHERE length(trim(text)) > 0
      UNION ALL
      SELECT doc_id + 300000 AS doc_id, text || ' xdup' AS text,
             'batch' AS role
      FROM documents
      WHERE doc_id % 10 <> 0 AND doc_id < 20 AND length(trim(text)) > 0
    ),
    shing AS ({_shingle_sql('combo')}),
    hashed AS (
      SELECT doc_id, {sql_hash32('sh')} AS h1, {sql_hash32_hi('sh')} AS h2
      FROM shing
    ),
    seeds AS (SELECT CAST(s.range AS BIGINT) AS seed
              FROM range(0, {N_HASHES}) s),
    sigs AS (SELECT doc_id, seed,
                    MIN((h1 + seed * h2) % 4294967296) AS minhash
             FROM hashed CROSS JOIN seeds GROUP BY doc_id, seed),
    bands AS (
      SELECT doc_id, seed // {BAND_SIZE} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed))
               AS bucket
      FROM sigs GROUP BY doc_id, seed // {BAND_SIZE}
    ),
    roles AS (SELECT doc_id, role FROM combo),
    cand AS (
      SELECT DISTINCT bb.doc_id AS bid, hb.doc_id AS hid
      FROM bands bb
      JOIN roles rb ON rb.doc_id = bb.doc_id AND rb.role = 'batch'
      JOIN bands hb ON hb.band = bb.band AND hb.bucket = bb.bucket
      JOIN roles rh ON rh.doc_id = hb.doc_id AND rh.role = 'hist'
    ),
    est AS (
      SELECT c.bid,
             SUM(CASE WHEN s1.minhash = s2.minhash THEN 1 ELSE 0 END)
               / CAST({N_HASHES} AS DOUBLE) AS ej
      FROM cand c
      JOIN sigs s1 ON s1.doc_id = c.bid
      JOIN sigs s2 ON s2.doc_id = c.hid AND s1.seed = s2.seed
      GROUP BY c.bid, c.hid
    ),
    flagged AS (SELECT DISTINCT bid FROM est WHERE ej >= 0.5)
    SELECT CAST((SELECT COUNT(*) FROM roles WHERE role = 'batch') AS BIGINT)
             AS n_batch,
           CAST((SELECT COUNT(*) FROM flagged) AS BIGINT) AS n_neardup_hist,
           CAST((SELECT COUNT(*) FROM roles WHERE role = 'batch')
                - (SELECT COUNT(*) FROM flagged) AS BIGINT) AS n_kept
    """


@register(
    "incremental_neardup_counts",
    oracle=_incr_neardup_oracle(),
    tags=("dedup", "incremental", "minhash"),
)
def incremental_neardup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEAR-dup completion of ``incremental_dedup_counts``: an incoming
    batch (``doc_id % 10 == 0`` plus planted near-copies of history docs at
    +300000) is gated against the already-ingested history via MinHash-LSH —
    a batch doc is dropped when any history doc shares an LSH band bucket
    AND the signature-agreement Jaccard estimate is >= 0.5. This is the
    batch-mode twin of the streaming near-dup gate
    (``windows.streaming_neardup_gate``), and the oracle-checked form: the
    SQL replays the identical shingle/double-hash/band pipeline.

    Scale: both sides reduce to {{n_docs}} x 16 signature integers; the
    candidate join is per-(band, bucket) — batch rows only ever meet
    history rows that COLLIDE, never the whole history. At 100 TB the
    history band table is the persisted LSH index an ingest pipeline
    maintains incrementally; only the batch side is recomputed per run.
    """
    from .dedup import N_HASHES, _band_keys, _minhash_mins, _sig_agreement

    docs = (table(spark, sf_dir, "documents").select("doc_id", "text")
            .where(F.length(F.trim("text")) > 0))
    role = F.when(F.col("doc_id") % 10 == 0, "batch").otherwise("hist")
    planted = (docs.where((F.col("doc_id") % 10 != 0) & (F.col("doc_id") < 20))
               .select((F.col("doc_id") + 300000).alias("doc_id"),
                       F.concat("text", F.lit(" xdup")).alias("text"),
                       F.lit("batch").alias("role")))
    combo = docs.select("doc_id", "text", role.alias("role")).unionByName(planted)
    roles = combo.select("doc_id", "role").cache()

    mins = _minhash_mins(combo).cache()
    bands = _band_keys(mins).join(roles, "doc_id")
    bb = (bands.where(F.col("role") == "batch")
          .select(F.col("doc_id").alias("bid"), "band", "bucket"))
    hb = (bands.where(F.col("role") == "hist")
          .select(F.col("doc_id").alias("hid"), "band", "bucket"))
    cand = bb.join(hb, ["band", "bucket"]).select("bid", "hid").distinct()

    # wide signature compare (dedup._sig_agreement): one row per candidate
    # through the verify joins instead of 16 seed rows + a groupBy
    s1 = mins.select(F.col("doc_id").alias("bid"),
                     *[F.col(f"m{s}").alias(f"m{s}_a")
                       for s in range(N_HASHES)])
    s2 = mins.select(F.col("doc_id").alias("hid"),
                     *[F.col(f"m{s}").alias(f"m{s}_b")
                       for s in range(N_HASHES)])
    est = (cand.join(s1, "bid").join(s2, "hid")
           .select("bid", "hid", _sig_agreement().alias("ej")))
    flagged = est.where(F.col("ej") >= 0.5).select("bid").distinct()

    nb = roles.where(F.col("role") == "batch").agg(
        F.count("*").alias("n_batch"))
    nf = flagged.agg(F.count("*").alias("n_neardup_hist"))
    out = (nb.crossJoin(nf)
           .select("n_batch", "n_neardup_hist",
                   (F.col("n_batch") - F.col("n_neardup_hist"))
                   .cast("long").alias("n_kept")))
    # bounded (1-row) output: materialize while the role/min-signature
    # caches are hot, then release both
    from .graph import materialize_release
    return materialize_release(out, [roles, mins])
