"""Corpus-curation operators — the composite training-data hygiene passes
built on the dedup/textstats primitives (BASELINE.json north star):

- ``doc_repetition_stats``: intra-document repetition signals (distinct-token
  ratio, top-unigram / top-bigram occupancy) — the Gopher-style "repetitious
  document" filter features.
- ``duplicate_ngram_coverage``: cross-document duplicated-span coverage —
  what fraction of each document's token 5-gram positions also occur in at
  least one OTHER document (the substring-dedup signal of Lee et al.-style
  "Deduplicating Training Data" pipelines, at 5-gram scale).
- ``quality_filter_funnel``: per-language rule-by-rule drop counts for a
  C4-style composite keep/drop filter — the report a curation run ships.
- ``curated_corpus_stats``: the end-to-end pass — exact dedup (min-id per
  content hash) → quality threshold → benchmark decontamination — reporting
  surviving docs and whitespace tokens per language.

All four are pure DataFrame algebra with DuckDB oracle twins; counts are
integers and every ratio is a single IEEE division of integers, so the
value hashes match bit-for-bit with no decimal scaffolding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import sql_whitespace_tokens, whitespace_tokens
from ..plans.registry import register
from ..sources.readers import table
from .textstats import STOPWORDS_EN, _in_list, _sql_count_in

#: duplicated-span shingle width (the published pipelines use 13-token
#: spans; the fixture docs are 10-99 tokens, so 5 keeps spans sub-document)
NGRAM_W = 5

#: quality-funnel thresholds, calibrated on the fixture distribution
#: (token lengths 10-99, quality 0.43-0.65 median 0.54) so every rule has
#: both passing and failing documents at every SF
MIN_TOKENS = 20
MIN_DISTINCT_RATIO = 0.35
MIN_QUALITY = 0.5


def _toks(docs: DataFrame) -> DataFrame:
    return (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", whitespace_tokens("text").alias("ts")))


def _quality_col(ts: str = "ts", text: str = "text"):
    """The doc_quality_scores blend (operators/textstats.py) as a column —
    alpha/stopword/length ratios weighted 0.5/0.3/0.2."""
    n = F.size(ts)
    alpha = (F.length(F.regexp_replace(F.lower(F.col(text)), "[^a-z]", ""))
             / F.length(text).cast("double"))
    stop = (F.size(F.filter(F.col(ts), lambda t: _in_list(t, STOPWORDS_EN)))
            / n.cast("double"))
    return (F.lit(0.5) * alpha + F.lit(0.3) * stop +
            F.lit(0.2) * (F.least(n, F.lit(100)) / F.lit(100.0)))


def _sql_quality(ts: str = "ts", text: str = "text") -> str:
    return f"""(
      0.5 * (length(regexp_replace(lower({text}), '[^a-z]', '', 'g'))
             / CAST(length({text}) AS DOUBLE))
      + 0.3 * ({_sql_count_in(ts, STOPWORDS_EN)} / CAST(len({ts}) AS DOUBLE))
      + 0.2 * (least(len({ts}), 100) / 100.0))"""


# --- intra-doc repetition ----------------------------------------------------

@register(
    "doc_repetition_stats",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, ts, len(ts) AS n, len(list_distinct(ts)) AS nd
      FROM (SELECT doc_id, {sql_whitespace_tokens('text')} AS ts
            FROM documents WHERE length(trim(text)) > 0)
      WHERE len(ts) >= 2
    ),
    umax AS (
      SELECT doc_id, MAX(c) AS u FROM (
        SELECT doc_id, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(ts) AS t FROM base) GROUP BY doc_id, t
      ) GROUP BY doc_id
    ),
    bmax AS (
      SELECT doc_id, MAX(c) AS bm FROM (
        SELECT doc_id, COUNT(*) AS c
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(ts)),
                            i -> ts[i] || ' ' || ts[i+1])) AS bg
              FROM base) GROUP BY doc_id, bg
      ) GROUP BY doc_id
    )
    SELECT b.doc_id, CAST(b.n AS BIGINT) AS n_tokens,
           b.nd / CAST(b.n AS DOUBLE) AS distinct_ratio,
           umax.u / CAST(b.n AS DOUBLE) AS top_unigram_frac,
           bmax.bm / CAST(b.n - 1 AS DOUBLE) AS top_bigram_frac
    FROM base b
    JOIN umax ON umax.doc_id = b.doc_id
    JOIN bmax ON bmax.doc_id = b.doc_id
    """,
    tags=("curation", "textstats"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: distinct-token ratio
    plus the corpus share of the single most frequent unigram and bigram.
    One tokenize pass; the two argmax aggregates explode into (doc, gram)
    streams that partial-aggregate map-side, so the shuffle carries grouped
    counts, not token text volume."""
    docs = table(spark, sf_dir, "documents")
    base = (_toks(docs).where(F.size("ts") >= 2)
            .select("doc_id", "ts", F.size("ts").alias("n"),
                    F.size(F.array_distinct("ts")).alias("nd")))
    umax = (base.select("doc_id", F.explode("ts").alias("t"))
            .groupBy("doc_id", "t").agg(F.count("*").alias("c"))
            .groupBy("doc_id").agg(F.max("c").alias("u")))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("ts") - 2),
        lambda i: F.concat_ws(" ", F.col("ts").getItem(i),
                              F.col("ts").getItem(i + 1)))
    bmax = (base.select("doc_id", F.explode(bigrams).alias("bg"))
            .groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
            .groupBy("doc_id").agg(F.max("c").alias("bm")))
    return (base.join(umax, "doc_id").join(bmax, "doc_id")
            .select("doc_id", F.col("n").cast("long").alias("n_tokens"),
                    (F.col("nd") / F.col("n").cast("double"))
                    .alias("distinct_ratio"),
                    (F.col("u") / F.col("n").cast("double"))
                    .alias("top_unigram_frac"),
                    (F.col("bm") / (F.col("n") - 1).cast("double"))
                    .alias("top_bigram_frac")))


# --- cross-doc duplicated-span coverage -------------------------------------

def _sql_aug() -> str:
    """Corpus with planted near-dups (doc_id < 20 re-inserted at +100000
    with one appended token) so duplicated spans exist at every SF."""
    return """
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text || ' xdup' AS text
      FROM documents WHERE doc_id < 20
    )"""


def _aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (docs.where(F.col("doc_id") < 20)
            .select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" xdup")).alias("text")))
    return docs.unionByName(dups)


@register(
    "duplicate_ngram_coverage",
    oracle=f"""
    WITH {_sql_aug()},
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ts) - {NGRAM_W - 2}),
                    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
                         ts[i+3] || ' ' || ts[i+4])) AS g
      FROM (SELECT doc_id, {sql_whitespace_tokens('text')} AS ts
            FROM corpus WHERE length(trim(text)) > 0)
      WHERE len(ts) >= {NGRAM_W}
    ),
    dup AS (
      SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS df FROM sh GROUP BY g)
      WHERE df >= 2
    ),
    cov AS (
      SELECT doc_id, COUNT(*) AS n_dup FROM sh
      WHERE g IN (SELECT g FROM dup) GROUP BY doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id)
    SELECT s.doc_id, CAST(s.n_shingles AS BIGINT) AS n_shingles,
           CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup_positions,
           COALESCE(c.n_dup, 0) / CAST(s.n_shingles AS DOUBLE) AS dup_coverage
    FROM sizes s LEFT JOIN cov c ON c.doc_id = s.doc_id
    """,
    tags=("curation", "dedup"),
)
def duplicate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span coverage: the fraction of a document's
    token {NGRAM_W}-gram positions whose span occurs in >= 2 distinct docs —
    the sub-document dedup signal (Lee et al. substring dedup, here at
    token-5-gram granularity). Near-dups are planted (doc_id < 20 at
    +100000) so coverage is exercised at every SF.

    Scale: positions shuffle ONCE on the span text to build the df table
    and once more for the membership semi-join — both map-side combinable;
    the span table is the corpus n-gram inventory, the canonical substring-
    dedup shuffle. No document bodies move after the tokenize."""
    from ..plans.registry import retain_for_consumer
    sh = retain_for_consumer(
        _toks(_aug(spark, sf_dir))
        .where(F.size("ts") >= NGRAM_W)
        .select("doc_id", F.explode(F.transform(
            F.sequence(F.lit(0), F.size("ts") - NGRAM_W),
            lambda i: F.concat_ws(" ", *[F.col("ts").getItem(i + j)
                                         for j in range(NGRAM_W)])))
            .alias("g")))  # consumer-scoped: dup/cov/sizes all read it
    dup = (sh.groupBy("g").agg(F.countDistinct("doc_id").alias("df"))
           .where(F.col("df") >= 2).select("g"))
    cov = (sh.join(dup, "g", "left_semi")
           .groupBy("doc_id").agg(F.count("*").alias("n_dup")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return (sizes.join(cov, "doc_id", "left")
            .select("doc_id",
                    F.col("n_shingles").cast("long").alias("n_shingles"),
                    F.coalesce("n_dup", F.lit(0)).cast("long")
                    .alias("n_dup_positions"),
                    (F.coalesce("n_dup", F.lit(0)) /
                     F.col("n_shingles").cast("double"))
                    .alias("dup_coverage")))


# --- C4-style quality funnel -------------------------------------------------

@register(
    "quality_filter_funnel",
    oracle=f"""
    WITH stats AS (
      SELECT lang, len(ts) AS n,
             len(list_distinct(ts)) / CAST(len(ts) AS DOUBLE) AS dr,
             {_sql_quality()} AS q
      FROM (SELECT lang, text, {sql_whitespace_tokens('text')} AS ts
            FROM documents WHERE length(trim(text)) > 0)
    )
    SELECT lang, COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE n < {MIN_TOKENS}) AS n_fail_len,
           COUNT(*) FILTER (WHERE dr < {MIN_DISTINCT_RATIO}) AS n_fail_rep,
           COUNT(*) FILTER (WHERE q < {MIN_QUALITY}) AS n_fail_quality,
           COUNT(*) FILTER (WHERE n >= {MIN_TOKENS}
                            AND dr >= {MIN_DISTINCT_RATIO}
                            AND q >= {MIN_QUALITY}) AS n_kept
    FROM stats GROUP BY lang
    """,
    tags=("curation", "textstats"),
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style composite quality filter reported as a per-language funnel:
    how many documents each rule (min length, min distinct-token ratio, min
    blended quality) would drop, and how many survive all three. One
    tokenize pass, one map-side-combinable groupBy(lang)."""
    docs = table(spark, sf_dir, "documents")
    stats = (docs.where(F.length(F.trim("text")) > 0)
             .select("lang", "text", whitespace_tokens("text").alias("ts"))
             .select("lang", F.size("ts").alias("n"),
                     (F.size(F.array_distinct("ts")) /
                      F.size("ts").cast("double")).alias("dr"),
                     _quality_col().alias("q")))
    keep = ((F.col("n") >= MIN_TOKENS) &
            (F.col("dr") >= MIN_DISTINCT_RATIO) &
            (F.col("q") >= MIN_QUALITY))
    cnt_if = lambda c: F.count(F.when(c, 1))  # noqa: E731
    return (stats.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        cnt_if(F.col("n") < MIN_TOKENS).alias("n_fail_len"),
        cnt_if(F.col("dr") < MIN_DISTINCT_RATIO).alias("n_fail_rep"),
        cnt_if(F.col("q") < MIN_QUALITY).alias("n_fail_quality"),
        cnt_if(keep).alias("n_kept")))


# --- end-to-end curation -----------------------------------------------------

#: benchmark = base docs with doc_id < 10 (matches benchmark_contamination)
BENCH_MAX_ID = 10
CONTAM_THRESHOLD = 0.2


@register(
    "curated_corpus_stats",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL               -- planted EXACT duplicates (die at dedup)
      SELECT doc_id + 200000, text, lang FROM documents
      WHERE doc_id >= {BENCH_MAX_ID} AND doc_id < 25
      UNION ALL               -- planted NEAR-dups of the benchmark docs
      SELECT doc_id + 300000, text || ' xdup', lang FROM documents
      WHERE doc_id < {BENCH_MAX_ID}
    ),
    keep1 AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
    c1 AS (
      SELECT c.doc_id, c.lang, {sql_whitespace_tokens('c.text')} AS ts, c.text
      FROM corpus c JOIN keep1 k ON k.doc_id = c.doc_id
      WHERE length(trim(c.text)) > 0 AND c.doc_id >= {BENCH_MAX_ID}
    ),
    c2 AS (SELECT * FROM c1 WHERE {_sql_quality()} >= {MIN_QUALITY}),
    bsh AS (
      SELECT DISTINCT
             unnest(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
      FROM (SELECT {sql_whitespace_tokens('text')} AS ts FROM documents
            WHERE doc_id < {BENCH_MAX_ID} AND length(trim(text)) > 0)
      WHERE len(ts) >= 3
    ),
    csh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
      FROM c2 WHERE len(ts) >= 3
    ),
    contaminated AS (
      SELECT doc_id FROM (
        SELECT c.doc_id,
               COUNT(*) FILTER (WHERE c.sh IN (SELECT sh FROM bsh)) AS hit,
               COUNT(*) AS tot
        FROM csh c GROUP BY c.doc_id
      ) WHERE hit / CAST(tot AS DOUBLE) >= {CONTAM_THRESHOLD}
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(len(ts)) AS BIGINT) AS n_tokens
    FROM c2 WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    GROUP BY lang
    """,
    tags=("curation", "dedup", "contamination"),
)
def curated_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pass over an adversarial corpus (planted
    exact duplicates AND near-duplicates of the benchmark docs):

    1. exact dedup — keep the minimum doc_id per md5(text); shuffles
       16-byte digests, never bodies;
    2. benchmark removal + quality threshold ({MIN_QUALITY} on the blended
       score);
    3. decontamination — drop any doc whose distinct 3-gram overlap with
       the benchmark set (doc_id < {BENCH_MAX_ID}) reaches
       {CONTAM_THRESHOLD}; the benchmark shingle set is broadcast.

    Output: surviving documents and whitespace tokens per language — the
    dataset card a curation run publishes. The planted exact dups die at
    (1); the planted benchmark near-dups survive (1) but die at (3)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    corpus = (docs
              .unionByName(docs.where((F.col("doc_id") >= BENCH_MAX_ID) &
                                      (F.col("doc_id") < 25))
                           .select((F.col("doc_id") + 200000).alias("doc_id"),
                                   "text", "lang"))
              .unionByName(docs.where(F.col("doc_id") < BENCH_MAX_ID)
                           .select((F.col("doc_id") + 300000).alias("doc_id"),
                                   F.concat("text", F.lit(" xdup"))
                                   .alias("text"), "lang")))
    keep1 = (corpus.groupBy(F.md5("text").alias("h"))
             .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    c1 = (corpus.join(keep1, "doc_id", "left_semi")
          .where((F.length(F.trim("text")) > 0) &
                 (F.col("doc_id") >= BENCH_MAX_ID))
          .select("doc_id", "lang", "text",
                  whitespace_tokens("text").alias("ts")))
    c2 = c1.where(_quality_col() >= MIN_QUALITY).cache()

    def shingles3(df: DataFrame, *cols: str) -> DataFrame:
        sh = F.transform(
            F.sequence(F.lit(0), F.size("ts") - 3),
            lambda i: F.concat_ws(" ", F.col("ts").getItem(i),
                                  F.col("ts").getItem(i + 1),
                                  F.col("ts").getItem(i + 2)))
        return (df.where(F.size("ts") >= 3)
                .select(*cols, F.explode(F.array_distinct(sh)).alias("sh")))

    bsh = (shingles3(
        docs.where((F.col("doc_id") < BENCH_MAX_ID) &
                   (F.length(F.trim("text")) > 0))
        .select(whitespace_tokens("text").alias("ts"))).distinct())
    csh = shingles3(c2, "doc_id")
    # left join against a marker column: count(m) counts only matched rows
    marked = (csh.join(F.broadcast(bsh.withColumn("m", F.lit(1))), "sh", "left")
              .groupBy("doc_id")
              .agg(F.count("m").alias("hit"), F.count("*").alias("tot")))
    contaminated = (marked
                    .where(F.col("hit") / F.col("tot").cast("double")
                           >= CONTAM_THRESHOLD)
                    .select("doc_id"))
    out = (c2.join(contaminated, "doc_id", "left_anti")
           .groupBy("lang")
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.size("ts")).cast("long").alias("n_tokens")))
    # bounded (per-lang) output: materialize while the c2 cache is hot,
    # then release it
    from ..operators.graph import materialize_release
    return materialize_release(out, [c2])


# --- chunking / packing / splits / mixing ------------------------------------

#: chunking geometry: 32-token windows, stride 24 (8-token overlap) — the
#: sliding-context chunking a training pipeline applies to long documents.
CHUNK_W, CHUNK_STRIDE = 32, 24

#: packed-sequence context size (tokens per training row)
PACK_TARGET = 256

#: deterministic split fractions over md5(doc_id): [0,80) train,
#: [80,90) val, [90,100) test
SPLIT_BOUNDS = (80, 90)


@register(
    "doc_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_whitespace_tokens('text')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    ids AS (
      SELECT doc_id, ts,
             unnest(range(0, 1 + (GREATEST(len(ts) - {CHUNK_W}, 0)
                                  + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}))
               AS chunk_id
      FROM toks
    )
    SELECT doc_id, chunk_id,
           CAST(len(ts[chunk_id * {CHUNK_STRIDE} + 1 :
                       chunk_id * {CHUNK_STRIDE} + {CHUNK_W}]) AS BIGINT)
             AS n_tokens,
           md5(array_to_string(ts[chunk_id * {CHUNK_STRIDE} + 1 :
                                  chunk_id * {CHUNK_STRIDE} + {CHUNK_W}], ' '))
             AS chunk_hash
    FROM ids
    """,
    tags=("curation", "chunking"),
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: each document split into {CHUNK_W}-token
    windows at stride {CHUNK_STRIDE} (trailing shorter chunk kept), the
    long-document -> context-window step of a training pipeline. Chunk
    identity is an md5 over the joined window, so the output hashes without
    carrying chunk text. One explode, no shuffle at all — embarrassingly
    parallel over documents."""
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", whitespace_tokens("text").alias("ts")))
    n = F.size("ts")
    # ceil((n - W) / stride) + 1 windows cover all n tokens; floor would
    # leave up to stride-1 trailing tokens unchunked
    n_chunks = 1 + F.floor((F.greatest(n - CHUNK_W, F.lit(0))
                            + (CHUNK_STRIDE - 1)) / CHUNK_STRIDE).cast("long")
    chunk = F.slice("ts", F.col("chunk_id").cast("int") * CHUNK_STRIDE + 1,
                    CHUNK_W)
    return (toks
            .select("doc_id", "ts",
                    F.explode(F.sequence(F.lit(0).cast("long"),
                                         n_chunks - 1)).alias("chunk_id"))
            .select("doc_id", "chunk_id",
                    F.size(chunk).cast("long").alias("n_tokens"),
                    F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash")))


@register(
    "packed_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len({sql_whitespace_tokens('text')}) AS n
      FROM documents WHERE length(trim(text)) > 0
    ),
    offs AS (
      SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS off
      FROM toks
    )
    SELECT CAST(off // {PACK_TARGET} AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens
    FROM offs GROUP BY 1
    """,
    tags=("curation", "packing"),
)
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence packing: documents concatenated in doc_id
    order, cut into {PACK_TARGET}-token contexts; each doc is assigned to
    the bin where it STARTS (exclusive running token offset div target) —
    the packing accounting of LLM pretraining loaders.

    The global running token offset is a two-phase bucket prefix-sum
    (``scale.quantile_buckets`` + ``scale.bucket_prefix_offsets``): an
    unpartitioned ``Window.orderBy(doc_id)`` cumsum would plan as ONE
    SinglePartition exchange of the whole corpus (Spark never range-
    partitions an unpartitioned window), where the bucketed form shuffles
    on the bucket id only and scans all buckets in parallel. The oracle
    keeps the plain single-level window definition; ``bin_id`` is cast to
    BIGINT there because a DuckDB windowed SUM is HUGEINT and HUGEINT //
    int stays HUGEINT — the exact int128-vs-int64 canonicalization skew
    behind round 1's top_users_share hash mismatch."""
    from .scale import bucket_prefix_offsets, quantile_buckets
    docs = table(spark, sf_dir, "documents")
    # cache the tokenized counts: the two-phase composition runs two
    # driver actions before the final job, and re-tokenizing the corpus
    # three times is the dominant repeated cost (2-int rows cached)
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", F.size(whitespace_tokens("text")).alias("n")))
    from ..plans.registry import retain_for_consumer
    toks = retain_for_consumer(toks)
    bucketed = quantile_buckets(toks, "doc_id")
    off0 = bucket_prefix_offsets(bucketed, F.sum("n"))
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    offs = bucketed.withColumn(
        "off", off0 + F.coalesce(F.sum("n").over(w), F.lit(0)))
    return (offs.groupBy(F.floor(F.col("off") / PACK_TARGET).cast("long")
                         .alias("bin_id"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n").cast("long").alias("n_tokens")))


@register(
    "hash_split_counts",
    oracle=f"""
    SELECT lang,
           CASE WHEN bucket < {SPLIT_BOUNDS[0]} THEN 'train'
                WHEN bucket < {SPLIT_BOUNDS[1]} THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs
    FROM (SELECT lang,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) % 100 AS bucket
          FROM documents)
    GROUP BY 1, 2
    """,
    tags=("curation", "split"),
)
def hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent id
    hash (md5(doc_id) mod 100 against fixed bounds) — reproducible across
    engines and runs, no RNG state, stable under corpus growth (a doc's
    split never changes when other docs are added; a seeded sample's
    does). Returns per-(lang, split) counts."""
    docs = table(spark, sf_dir, "documents")
    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                     16, 10).cast("long") % 100)
    split = (F.when(bucket < SPLIT_BOUNDS[0], "train")
             .when(bucket < SPLIT_BOUNDS[1], "val")
             .otherwise("test"))
    return (docs.groupBy("lang", split.alias("split"))
            .agg(F.count("*").alias("n_docs")))


@register(
    "mixture_weights",
    oracle="""
    WITH per AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n, COUNT(*) AS k FROM per)
    SELECT per.source, per.n_docs,
           CAST(per.n_docs AS DOUBLE) / tot.n AS actual_share,
           (CAST(tot.n AS DOUBLE) / tot.k) / per.n_docs AS sample_weight
    FROM per, tot
    """,
    tags=("curation", "mixing"),
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights: per-source document share and the per-doc
    sampling weight that rebalances the corpus to a UNIFORM source mixture
    (weight = target_share / actual_share scaled to mean 1) — the mixture
    table a training loader consumes. Integer counts; each ratio is one
    IEEE division, so the values hash exactly cross-engine."""
    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = per.agg(F.sum("n_docs").cast("long").alias("n"),
                  F.count("*").alias("k"))
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "n_docs",
                    (F.col("n_docs").cast("double") / F.col("n"))
                    .alias("actual_share"),
                    ((F.col("n").cast("double") / F.col("k")) / F.col("n_docs"))
                    .alias("sample_weight")))


@register(
    "contrastive_chunk_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_whitespace_tokens('text')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    ids AS (
      SELECT doc_id, ts,
             unnest(range(0, 1 + (GREATEST(len(ts) - {CHUNK_W}, 0)
                                  + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}))
               AS chunk_id
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             md5(array_to_string(ts[chunk_id * {CHUNK_STRIDE} + 1 :
                                    chunk_id * {CHUNK_STRIDE} + {CHUNK_W}],
                                 ' ')) AS chunk_hash
      FROM ids
    )
    SELECT a.doc_id, a.chunk_id AS pair_id,
           a.chunk_hash AS anchor_hash, p.chunk_hash AS positive_hash
    FROM chunks a JOIN chunks p
      ON p.doc_id = a.doc_id AND p.chunk_id = a.chunk_id + 1
    """,
    tags=("curation", "chunking", "contrastive"),
)
def contrastive_chunk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised pair construction: each (chunk_i, chunk_{i+1})
    adjacency within a document becomes an (anchor, positive) training
    pair — the next-chunk/contrastive-pretraining data op. Built from the
    doc_chunks table by a LEAD window per document (no self-join: the
    chunk table is already partition-local per doc_id, so one window pass
    emits every adjacent pair — at 100 TB the self-join form would
    re-shuffle the chunk table twice for the same answer)."""
    from pyspark.sql import Window
    chunks = doc_chunks(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("chunk_id")
    nxt = F.lead("chunk_hash").over(w)
    return (chunks
            .select("doc_id", F.col("chunk_id").alias("pair_id"),
                    F.col("chunk_hash").alias("anchor_hash"),
                    nxt.alias("positive_hash"))
            .where(F.col("positive_hash").isNotNull()))


# --- split hygiene: leakage detection + cluster-aware assignment -------------

def _split_bucket(idcol):
    """The hash_split_counts bucket function, shared: md5(id) first 8 hex
    chars mod 100."""
    return (F.conv(F.substring(F.md5(idcol.cast("string")), 1, 8), 16, 10)
            .cast("long") % 100)


def _split_name(bucket):
    return (F.when(bucket < SPLIT_BOUNDS[0], "train")
            .when(bucket < SPLIT_BOUNDS[1], "val")
            .otherwise("test"))


def _sql_split(expr: str) -> str:
    return f"""CASE
      WHEN CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))
           AS BIGINT) % 100 < {SPLIT_BOUNDS[0]} THEN 'train'
      WHEN CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))
           AS BIGINT) % 100 < {SPLIT_BOUNDS[1]} THEN 'val'
      ELSE 'test' END"""


#: exact-copy plant for the leakage probe (the fixture corpus has no exact
#: duplicates; dedup.py plants NEAR-dups — leakage needs exact twins, so
#: doc_id < 20 re-appear verbatim under doc_id + 200000, identically in
#: Spark and the oracle)
_XCOPY_SQL = """
    corpus2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id, text
      FROM documents WHERE doc_id < 20
    )
"""


@register(
    "split_leakage_counts",
    oracle=f"""
    WITH {_XCOPY_SQL},
    d AS (
      SELECT md5(text) AS h, {_sql_split('doc_id')} AS split
      FROM corpus2 WHERE length(trim(text)) > 0
    ),
    ps AS (SELECT DISTINCT h, split FROM d)
    SELECT a.split AS split_a, b.split AS split_b,
           COUNT(*) AS n_shared_texts
    FROM ps a JOIN ps b ON a.h = b.h AND a.split < b.split
    GROUP BY 1, 2
    """,
    tags=("curation", "split", "dedup"),
)
def split_leakage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation-leakage probe: after the deterministic hash split
    (``hash_split_counts``), count distinct document TEXTS that appear in
    two different splits — the train/test contamination every split
    pipeline must audit before shipping. One md5-digest shuffle (16-byte
    keys, never text bodies) + a per-digest split-pair join bounded by
    |splits| = 3 rows per digest; at 100 TB this is the exact-dedup
    shuffle shape applied across split labels."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = (docs.where(F.col("doc_id") < 20)
              .select((F.col("doc_id") + 200000).alias("doc_id"), "text"))
    corpus2 = docs.unionByName(copies).where(F.length(F.trim("text")) > 0)
    ps = (corpus2.select(F.md5("text").alias("h"),
                         _split_name(_split_bucket(F.col("doc_id")))
                         .alias("split"))
          .distinct())
    b = ps.select(F.col("h").alias("h2"), F.col("split").alias("split_b"))
    return (ps.join(b, (ps.h == b.h2) & (ps.split < b.split_b))
            .groupBy(F.col("split").alias("split_a"), "split_b")
            .agg(F.count("*").alias("n_shared_texts")))


def _neardup_leak_oracle() -> str:
    from .dedup import _AUG_SQL, _MINHASH_PAIRS_SQL, _MINHASH_SQL
    return f"""
    WITH {_AUG_SQL}, {_MINHASH_SQL}, {_MINHASH_PAIRS_SQL},
    dup AS (SELECT a, b FROM est WHERE est_jaccard >= 0.5),
    labeled AS (
      SELECT {_sql_split('a')} AS sa, {_sql_split('b')} AS sb FROM dup
    )
    SELECT COUNT(*) AS n_neardup_pairs,
           CAST(SUM(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross_split_pairs,
           CAST(SUM(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
             AS n_same_split_pairs
    FROM labeled
    """


@register(
    "split_neardup_leakage",
    oracle=_neardup_leak_oracle(),
    tags=("curation", "split", "dedup"),
)
def split_neardup_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate evaluation leakage: how many MinHash-LSH near-dup
    pairs straddle two different naive hash splits. ``split_leakage_counts``
    audits EXACT twins (md5 digests); this is its fuzzy sibling — the pairs
    an exact-hash audit misses but a held-out eval still leaks through
    (paraphrased twins memorize the same content). One row: total near-dup
    pairs, cross-split pairs (the leak), same-split pairs. The fix is
    ``leakage_safe_splits``' cluster-keyed assignment, under which the
    cross-split count is zero by construction (planted-family property
    test in tests/test_curation.py). Cost: the LSH candidate table + two
    md5s per pair — no text bodies move."""
    from .dedup import minhash_near_dups
    pairs = minhash_near_dups(spark, sf_dir)
    labeled = pairs.select(
        _split_name(_split_bucket(F.col("a"))).alias("sa"),
        _split_name(_split_bucket(F.col("b"))).alias("sb"))
    return labeled.agg(
        F.count("*").alias("n_neardup_pairs"),
        F.sum(F.when(F.col("sa") != F.col("sb"), 1).otherwise(0))
         .cast("long").alias("n_cross_split_pairs"),
        F.sum(F.when(F.col("sa") == F.col("sb"), 1).otherwise(0))
         .cast("long").alias("n_same_split_pairs"))


def _cluster_split_oracle() -> str:
    from .dedup import _AUG_SQL, _MINHASH_PAIRS_SQL, _MINHASH_SQL
    return f"""
    WITH RECURSIVE {_AUG_SQL}, {_MINHASH_SQL}, {_MINHASH_PAIRS_SQL},
    dup_edges AS (
      SELECT a, b FROM est WHERE est_jaccard >= 0.5
      UNION ALL
      SELECT b, a FROM est WHERE est_jaccard >= 0.5
    ),
    reach(src, dst) AS (
      SELECT a, b FROM dup_edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN dup_edges e ON r.dst = e.a
    ),
    comp AS (
      SELECT c.doc_id,
             LEAST(c.doc_id, COALESCE(MIN(r.dst), c.doc_id)) AS canonical_id
      FROM corpus c LEFT JOIN reach r ON r.src = c.doc_id
      GROUP BY c.doc_id
    ),
    assigned AS (
      SELECT doc_id, canonical_id,
             {_sql_split('doc_id')} AS naive_split,
             {_sql_split('canonical_id')} AS split
      FROM comp
    )
    SELECT split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT canonical_id) AS n_clusters,
           CAST(SUM(CASE WHEN naive_split <> split THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_moved
    FROM assigned GROUP BY split
    """


@register(
    "leakage_safe_splits",
    oracle=_cluster_split_oracle(),
    tags=("curation", "split", "dedup", "components"),
)
def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-SAFE split assignment: hash the near-dup cluster's CANONICAL
    id (``dedup_clusters``' connected-component representative) instead of
    the document's own id, so an entire near-duplicate family lands in ONE
    split by construction — the fix for the contamination
    ``split_leakage_counts`` detects. Returns per-split document/cluster
    counts plus how many documents the cluster-aware assignment moved off
    their naive split.

    Scale: component propagation touches only docs in a dup pair (the tiny
    minority, see dedup_clusters); the re-assignment itself is pure column
    math over (doc_id, canonical_id) — one md5 per row, one 3-key
    aggregate. This is how production corpora key their splits (URL/domain
    or cluster representative), for exactly this reason."""
    from .dedup import dedup_clusters
    comp = dedup_clusters(spark, sf_dir).select("doc_id", "canonical_id")
    assigned = comp.select(
        "doc_id", "canonical_id",
        _split_name(_split_bucket(F.col("doc_id"))).alias("naive_split"),
        _split_name(_split_bucket(F.col("canonical_id"))).alias("split"))
    return (assigned.groupBy("split")
            .agg(F.count("*").alias("n_docs"),
                 F.countDistinct("canonical_id").alias("n_clusters"),
                 F.sum(F.when(F.col("naive_split") != F.col("split"), 1)
                       .otherwise(0)).cast("long").alias("n_docs_moved")))


#: global downsampling factor for the mixture sampler: the target corpus is
#: BASE_RATE x (uniform-mixture share) of the input, so every source's keep
#: probability stays strictly below 1 on the fixture (all-kept sources
#: would make the rebalancing claim untestable)
MIX_BASE_RATE = 0.5


@register(
    "mixture_sampled_counts",
    oracle=f"""
    WITH per AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n, COUNT(*) AS k FROM per),
    probs AS (
      SELECT per.source, per.n_docs,
             LEAST(1.0, {MIX_BASE_RATE} * (CAST(tot.n AS DOUBLE) / tot.k)
                         / per.n_docs) AS p
      FROM per, tot
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_sampled
      FROM documents d JOIN probs pr ON pr.source = d.source
      WHERE CAST(('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) / 4294967296.0 < pr.p
      GROUP BY d.source
    )
    SELECT pr.source, pr.n_docs,
           CAST(COALESCE(k.n_sampled, 0) AS BIGINT) AS n_sampled,
           CAST(COALESCE(k.n_sampled, 0) AS DOUBLE)
             / CAST(SUM(COALESCE(k.n_sampled, 0)) OVER () AS BIGINT)
             AS realized_share
    FROM probs pr LEFT JOIN kept k ON k.source = pr.source
    """,
    tags=("curation", "mixing", "sampling"),
)
def mixture_sampled_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixing loop CLOSED: materialize the corpus that
    ``mixture_weights`` prescribes. Each source's keep probability is
    ``min(1, BASE_RATE x uniform-share weight)``; membership is a
    content-independent salted md5 fraction of doc_id (reproducible across
    engines and runs, independent of the train/val/test hash — different
    salt), so the sampled corpus is a deterministic FUNCTION of the corpus,
    not an RNG draw. Output: per-source input size, sampled size, and the
    realized mixture share — the audit row proving the rebalance landed.
    One scan + a broadcast 5-row probability table; no RNG state, no
    per-source passes."""
    docs = table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    tot = per.agg(F.sum("n_docs").cast("long").alias("n"),
                  F.count("*").alias("k"))
    probs = (per.crossJoin(F.broadcast(tot))
             .select("source", "n_docs",
                     F.least(F.lit(1.0),
                             F.lit(MIX_BASE_RATE) *
                             (F.col("n").cast("double") / F.col("k"))
                             / F.col("n_docs")).alias("p")))
    u = (F.conv(F.substring(
            F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))),
            1, 8), 16, 10).cast("long") / F.lit(4294967296.0))
    kept = (docs.join(F.broadcast(probs.select("source", "p")), "source")
            .where(u < F.col("p"))
            .groupBy("source").agg(F.count("*").alias("n_sampled")))
    joined = (probs.select("source", "n_docs")
              .join(kept, "source", "left")
              .select("source", "n_docs",
                      F.coalesce("n_sampled", F.lit(0)).cast("long")
                      .alias("n_sampled")))
    wall = Window.partitionBy()  # |sources|-row aggregate frame — bounded
    return joined.select(
        "source", "n_docs", "n_sampled",
        (F.col("n_sampled").cast("double") /
         F.sum("n_sampled").over(wall)).alias("realized_share"))


@register(
    "packing_efficiency",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len({sql_whitespace_tokens('text')}) AS n
      FROM documents WHERE length(trim(text)) > 0
    ),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM toks)
    SELECT n_docs, n_tokens,
           CAST(CEIL(n_tokens / CAST({PACK_TARGET} AS DOUBLE)) AS BIGINT)
             AS n_contexts,
           ROUND(n_tokens / (CEIL(n_tokens / CAST({PACK_TARGET} AS DOUBLE))
                             * {PACK_TARGET}), 6) AS fill_ratio
    FROM t
    """,
    tags=("curation", "packing"),
)
def packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing audit row: corpus token count, the number of
    {PACK_TARGET}-token training contexts concat-and-cut packing yields
    (= ceil(tokens/target) — packing wastes only the final partial
    context), and the fill ratio. The dataset-card number a loader config
    is validated against; one scan, one 1-row aggregate."""
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select(F.size(whitespace_tokens("text")).alias("n")))
    t = toks.agg(F.sum("n").cast("long").alias("n_tokens"),
                 F.count("*").cast("long").alias("n_docs"))
    n_ctx = F.ceil(F.col("n_tokens") / F.lit(float(PACK_TARGET))).cast("long")
    return t.select(
        "n_docs", "n_tokens", n_ctx.alias("n_contexts"),
        F.round(F.col("n_tokens") /
                (n_ctx * F.lit(PACK_TARGET)).cast("double"), 6)
        .alias("fill_ratio"))


#: curriculum phases (NTILE bucket count) — 8 is the usual short-to-long
#: schedule granularity; any k works, the math below is exact for all n, k
N_PHASES = 8


@register(
    "curriculum_length_phases",
    oracle="""
    WITH nt AS (
      SELECT doc_id, n_chars,
             NTILE(8) OVER (ORDER BY n_chars, doc_id) AS phase
      FROM documents
    )
    SELECT CAST(phase AS BIGINT) AS phase,
           COUNT(*) AS n_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM nt GROUP BY 1
    """,
    tags=("curation", "curriculum", "scale"),
)
def curriculum_length_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum schedule: the corpus split into ``N_PHASES``
    equal-population phases ordered short-to-long (NTILE over
    ``(n_chars, doc_id)`` — the unique tiebreak makes the total order and
    therefore the phase assignment engine-independent), reporting each
    phase's population and char-length envelope. This is the "train on
    short documents first" schedule builder of curriculum pretraining.

    Scale: exact global NTILE without the single-partition window. The
    global rank is the two-phase bucket prefix-sum
    (``scale.quantile_buckets`` + ``scale.bucket_prefix_offsets``, the
    same composition as ``global_value_rank``); NTILE is then pure literal
    arithmetic on the rank — SQL's NTILE(k) gives the first ``n % k``
    buckets ``n//k + 1`` rows and the rest ``n//k``, reproduced exactly
    below. The driver only ever sees <= n_buckets numbers plus one
    count-star (metadata-only on parquet)."""
    from .scale import bucket_prefix_offsets_multi, quantile_buckets
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    bucketed = quantile_buckets(docs, "n_chars")
    # n folds out of the same per-bucket collect as the rank offsets —
    # no separate count() action (guide §1.2)
    offm = bucket_prefix_offsets_multi(bucketed, cnt=F.count("*"))
    off = offm["cnt"]
    n = sum(row["cnt"] for row in offm["rows"])
    k = N_PHASES
    q, r = divmod(n, k)
    size1 = q + 1                       # rows in each of the first r phases
    qq = max(q, 1)                      # div guard; unused branch when q == 0
    w = Window.partitionBy("bucket").orderBy("n_chars", "doc_id")
    rk = (off + F.row_number().over(w)).cast("long")
    phase = (F.when(rk <= F.lit(r * size1),
                    F.floor((rk - 1) / F.lit(size1)) + 1)
             .otherwise(F.lit(r) +
                        F.floor((rk - F.lit(r * size1) - 1) / F.lit(qq)) + 1))
    return (bucketed
            .withColumn("phase", phase.cast("long"))
            .groupBy("phase")
            .agg(F.count("*").alias("n_docs"),
                 F.min("n_chars").cast("long").alias("min_chars"),
                 F.max("n_chars").cast("long").alias("max_chars"),
                 F.sum("n_chars").cast("long").alias("sum_chars")))


#: per-domain document cap (the FineWeb/C4-style "no domain dominates the
#: corpus" guard). 15 binds at every fixture SF (25 docs/source at
#: sf0.001/0.01, 250 at sf0.1), so the audit is never vacuous.
DOMAIN_CAP = 15
#: salt fanout for the two-level per-domain top-k
_CAP_SALTS = 8


@register(
    "domain_capped_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, text, {sql_whitespace_tokens('text')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    scored AS (SELECT doc_id, source, {_sql_quality()} AS q FROM toks),
    ranked AS (
      SELECT source, q,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY q DESC, doc_id ASC) AS rn
      FROM scored)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           ROUND(MIN(CASE WHEN rn <= {DOMAIN_CAP} THEN q END), 6)
             AS min_kept_quality
    FROM ranked GROUP BY source
    """,
    tags=("curation", "selection", "window"),
)
def domain_capped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: keep at most {DOMAIN_CAP} documents per source,
    highest quality first (deterministic doc_id tie-break) — the standard
    web-corpus guard against one domain flooding the mixture. Audit output
    per source: candidates, kept, and the kept-set quality floor.

    Scale shape: NOT one window per domain (a hot domain would serialize
    into a single sort task). Level 1 ranks within (source, doc_id mod
    {_CAP_SALTS}) salted partitions and keeps <= cap per salt; level 2
    ranks the <= salts x cap survivors per source exactly. Top-k per salt
    is a superset of the true top-k (any true top-k doc ranks <= cap
    within its own salt), so the two-level result is exact while the big
    sort runs {_CAP_SALTS}-way parallel per domain — the
    ``ann_batch_topk`` discipline applied to curation."""
    docs = (table(spark, sf_dir, "documents")
            .where(F.length(F.trim("text")) > 0))
    scored = (docs.select("doc_id", "source",
                          whitespace_tokens("text").alias("ts"), "text")
              .select("doc_id", "source", _quality_col().alias("q")))
    cand = scored.groupBy("source").agg(
        F.count("*").cast("long").alias("n_candidates"))
    salt = F.pmod("doc_id", F.lit(_CAP_SALTS))
    w1 = (Window.partitionBy("source", "salt")
          .orderBy(F.desc("q"), F.asc("doc_id")))
    lvl1 = (scored.withColumn("salt", salt)
            .withColumn("rn1", F.row_number().over(w1))
            .where(F.col("rn1") <= DOMAIN_CAP))
    w2 = Window.partitionBy("source").orderBy(F.desc("q"), F.asc("doc_id"))
    kept = (lvl1.withColumn("rn", F.row_number().over(w2))
            .where(F.col("rn") <= DOMAIN_CAP))
    agg = kept.groupBy("source").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.round(F.min("q"), 6).alias("min_kept_quality"))
    return cand.join(agg, "source")


@register(
    "split_stratification_chi2",
    oracle=f"""
    WITH obs AS (
      SELECT {_sql_split('doc_id')} AS r, lang AS c, COUNT(*) AS o
      FROM documents GROUP BY 1, 2
    ),
    rt AS (SELECT r, SUM(o) AS row_tot FROM obs GROUP BY r),
    ct AS (SELECT c, SUM(o) AS col_tot FROM obs GROUP BY c),
    n AS (SELECT SUM(o) AS n FROM obs),
    terms AS (
      SELECT obs.o,
             (CAST(rt.row_tot AS DOUBLE) * CAST(ct.col_tot AS DOUBLE)
              / CAST((SELECT n FROM n) AS DOUBLE)) AS e
      FROM obs JOIN rt ON obs.r = rt.r JOIN ct ON obs.c = ct.c
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(CAST(CAST(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(27,18)))
                      AS VARCHAR) AS DOUBLE), 6) AS chi2
    FROM terms
    """,
    tags=("curation", "split", "stats"),
)
def split_stratification_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-stratification QA: Pearson chi-square of the (split x lang)
    contingency — is the deterministic hash split independent of language,
    or did the key correlate with content (the failure mode of splitting
    on a key that encodes provenance, e.g. sequential ids assigned per
    crawl)? A healthy hash split shows chi2 near its degrees of freedom;
    a large value means per-language eval metrics are measuring the split,
    not the model. Same decimal-exact statistic plan as
    ``chi2_priority_status``: one corpus aggregate -> cell-sized math."""
    docs = table(spark, sf_dir, "documents")
    obs = (docs.groupBy(_split_name(_split_bucket(F.col("doc_id")))
                        .alias("r"), F.col("lang").alias("c"))
           .agg(F.count("*").alias("o")).cache())
    rt = obs.groupBy("r").agg(F.sum("o").alias("row_tot"))
    ct = obs.groupBy("c").agg(F.sum("o").alias("col_tot"))
    n = obs.agg(F.sum("o").alias("n"))
    e = (F.col("row_tot").cast("double") * F.col("col_tot").cast("double")
         / F.col("n").cast("double"))
    terms = (obs.join(F.broadcast(rt), "r").join(F.broadcast(ct), "c")
             .crossJoin(F.broadcast(n))
             .select("o", e.alias("e")))
    chi2 = ((F.col("o") - F.col("e")) * (F.col("o") - F.col("e"))
            / F.col("e"))
    out = terms.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.sum(chi2.cast("decimal(27,18)"))
                .cast("string").cast("double"), 6).alias("chi2"))
    # bounded (1-row) output: materialize while the cell cache is hot
    from ..operators.graph import materialize_release
    return materialize_release(out, [obs])
