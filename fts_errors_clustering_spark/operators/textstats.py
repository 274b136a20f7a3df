"""Text-analysis operators for the training-data pipeline (BASELINE.json
north star): language-ID, quality scoring, token counting. All pure column
algebra over ``documents`` — JVM-side, oracle-checked. (Document
fingerprinting lives with its dedup siblings in operators/dedup.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import sql_whitespace_tokens, whitespace_tokens
from ..plans.registry import register
from ..sources.readers import table

#: tiny per-language marker lists (n-gram/stopword heuristic). The fixture
#: corpus is synthetic word-soup, so the *linguistics* are nominal — the
#: operator under test is the deterministic score->argmax machinery.
LANG_MARKERS = {
    "de": ("der", "die", "und", "das"),
    "en": ("the", "a", "of", "and"),
    "es": ("el", "los", "y", "que"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "shi", "le", "zai"),
}

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")


def _in_list(t, values):
    cond = t == values[0]
    for v in values[1:]:
        cond = cond | (t == v)
    return cond


def _sql_count_in(tokens_expr: str, values) -> str:
    preds = " OR ".join(f"t = '{v}'" for v in values)
    return f"CAST(len(list_filter({tokens_expr}, t -> {preds})) AS BIGINT)"


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {sql_whitespace_tokens('text')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    scores AS (
      SELECT doc_id, lang, cand, score FROM (
        SELECT doc_id, lang,
    """ + ",\n".join(
        f"           {_sql_count_in('ts', ms)} AS score_{lg}"
        for lg, ms in sorted(LANG_MARKERS.items())
    ) + """
        FROM toks
      ) UNPIVOT (score FOR cand IN (""" + ", ".join(
        f"score_{lg} AS '{lg}'" for lg in sorted(LANG_MARKERS)
    ) + """))
    ),
    best AS (
      SELECT doc_id, lang, cand AS pred_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand) AS rn
      FROM scores
    )
    SELECT lang, pred_lang, COUNT(*) AS n
    FROM best WHERE rn = 1 GROUP BY lang, pred_lang
    """,
    tags=("textstats",),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID by marker-token scoring: per doc, count occurrences of
    each language's marker tokens, argmax with (score desc, lang asc)
    tie-break; reported as an actual-vs-predicted confusion matrix. The
    unpivot->window-argmax shape scales: one explode-free pass computes all
    scores, the argmax window partitions by doc."""
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", "lang", whitespace_tokens("text").alias("ts")))
    def marker_count(ms):
        # NB: the filter lambda must be 1-ary — PySpark treats a 2-ary
        # lambda (incl. default args) as (element, index).
        return F.size(F.filter(F.col("ts"), lambda t: _in_list(t, ms)))

    score_cols = [marker_count(ms).cast("long").alias(f"score_{lg}")
                  for lg, ms in sorted(LANG_MARKERS.items())]
    scored = toks.select("doc_id", "lang", *score_cols)
    stack_expr = "stack({n}, {args}) as (cand, score)".format(
        n=len(LANG_MARKERS),
        args=", ".join(f"'{lg}', score_{lg}" for lg in sorted(LANG_MARKERS)))
    long = scored.select("doc_id", "lang", F.expr(stack_expr))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand"))
    best = (long.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("lang", F.col("cand").alias("pred_lang")))
    return best.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))


@register(
    "doc_quality_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, text, {sql_whitespace_tokens('lower(text)')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT doc_id,
           CAST(len(ts) AS BIGINT) AS n_tokens,
           list_sum(list_transform(ts, t -> length(t))) / CAST(len(ts) AS DOUBLE)
             AS mean_token_len,
           {_sql_count_in('ts', STOPWORDS_EN)} / CAST(len(ts) AS DOUBLE)
             AS stopword_ratio,
           length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
             / CAST(length(text) AS DOUBLE) AS alpha_ratio,
           ROUND(
             0.5 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                    / CAST(length(text) AS DOUBLE))
             + 0.3 * ({_sql_count_in('ts', STOPWORDS_EN)} / CAST(len(ts) AS DOUBLE))
             + 0.2 * (least(len(ts), 100) / 100.0), 6) AS quality
    FROM toks
    """,
    tags=("textstats",),
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length / stopword / alphabetic ratios
    blended into [0,1]) — the pre-training corpus filter shape. All ratios
    are exact integer divisions; the blend is rational arithmetic, so the
    oracle matches bit-for-bit."""
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", "text",
                    whitespace_tokens(F.lower(F.col("text"))).alias("ts")))
    n = F.size("ts")
    tok_len_sum = F.aggregate(F.transform(F.col("ts"), F.length),
                              F.lit(0), lambda a, x: a + x)
    stop_n = F.size(F.filter(F.col("ts"), lambda t: _in_list(t, STOPWORDS_EN)))
    alpha = (F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
             / F.length("text").cast("double"))
    stop_ratio = stop_n / n.cast("double")
    quality = (F.lit(0.5) * alpha + F.lit(0.3) * stop_ratio +
               F.lit(0.2) * (F.least(n, F.lit(100)) / F.lit(100.0)))
    return toks.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        (tok_len_sum / n.cast("double")).alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alpha.alias("alpha_ratio"),
        F.round(quality, 6).alias("quality"))


@register(
    "token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                t -> length(t) > 0)) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                AS BIGINT) AS bpe_ish_tokens
    FROM documents WHERE length(trim(text)) > 0
    """,
    tags=("textstats",),
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (alpha runs | digit runs | single punctuation) — the cheap corpus-size
    estimator used before committing to a real tokenizer pass."""
    docs = table(spark, sf_dir, "documents")
    ws = F.size(whitespace_tokens(F.lower(F.col("text")))).cast("long")
    bpe = F.size(F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0))
    ).cast("long")
    return (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_ish_tokens")))


@register("stratified_doc_sample", oracle=None, tags=("textstats", "sampling"))
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (class-balanced) sampling by language — the curation
    primitive that rebalances a training corpus: per-stratum Bernoulli
    fractions via ``sampleBy`` (seeded; executor-local RNG, no shuffle).
    Rows-only in the driver (RNG streams are engine-specific); per-stratum
    proportion bounds asserted in tests/test_properties.py."""
    docs = table(spark, sf_dir, "documents")
    # downsample the majority classes, keep the rest
    counts = {r.lang: r.cnt for r in
              docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    target = min(counts.values()) if counts else 0
    fractions = {l: min(1.0, target / c) for l, c in counts.items()}
    sample = docs.sampleBy("lang", fractions, seed=42)
    return (sample.groupBy("lang").agg(F.count("*").alias("n_sampled"))
            .join(docs.groupBy("lang").agg(F.count("*").alias("n_total")),
                  "lang"))


#: Knuth multiplicative hash for the deterministic sampler: exact integer
#: arithmetic both engines share (no RNG stream to match). 2^32 modulus.
_HASH_A = 2_654_435_761
_HASH_M = 4_294_967_296


@register(
    "stratified_hash_sample",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang
    ),
    t AS (SELECT MIN(n_total) AS target FROM counts),
    sel AS (
      SELECT d.lang
      FROM documents d JOIN counts c ON d.lang = c.lang CROSS JOIN t
      WHERE CAST((((((d.doc_id % {_HASH_M}) // 65536) * {_HASH_A}) % 65536)
                  * 65536
                  + ((d.doc_id % {_HASH_M}) % 65536) * {_HASH_A})
                 % {_HASH_M} AS DOUBLE)
            / {_HASH_M} < LEAST(1.0, CAST(t.target AS DOUBLE) / c.n_total)
    )
    SELECT c.lang, c.n_total, t.target,
           CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM counts c
    LEFT JOIN (SELECT lang, COUNT(*) AS n_sampled FROM sel GROUP BY lang) s
      ON c.lang = s.lang
    CROSS JOIN t
    """,
    tags=("textstats", "sampling"),
)
def stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampler — the REPRODUCIBLE twin of
    ``stratified_doc_sample``: per-language keep-fractions (down to the
    minority-class size) decided by a Knuth multiplicative hash of the
    doc_id instead of an RNG stream, so the selected SET is identical
    across reruns, engines, partitionings, and code versions — the
    property real pipelines need for holdout stability and incremental
    re-materialization (a re-run must not re-roll the corpus). Exact
    value-hash oracle: the hash is integer arithmetic both engines share.

    The multiply is overflow-safe: ``doc_id`` is first reduced mod 2^32,
    then split into 16-bit halves so every intermediate product stays
    below 2^48 — without the split, ``doc_id >= ~3.47e9`` would wrap
    int64 negative in Spark (non-ANSI mode silently, making u < frac
    spuriously true) while DuckDB raises an overflow error. The result
    is bit-identical to ``(doc_id * A) mod 2^32`` for any non-negative
    int64 ``doc_id`` (negative ids are out of domain).

    Scale: one |lang|-row count aggregate broadcast into a single
    filtering scan; no shuffle of the corpus, no RNG state."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    target = counts.agg(F.min("n_total").alias("target"))
    frac = F.least(F.lit(1.0),
                   F.col("target").cast("double") / F.col("n_total"))
    dm = F.col("doc_id") % _HASH_M
    h = (((dm / 65536).cast("long") * _HASH_A) % 65536) * 65536 \
        + (dm % 65536) * _HASH_A
    u = (h % _HASH_M).cast("double") / F.lit(_HASH_M)
    sel = (docs.join(F.broadcast(counts), "lang")
           .crossJoin(F.broadcast(target))
           .where(u < frac)
           .groupBy("lang").agg(F.count("*").alias("n_sampled")))
    return (counts.join(sel, "lang", "left")
            .crossJoin(F.broadcast(target))
            .select("lang", "n_total", "target",
                    F.coalesce(F.col("n_sampled"), F.lit(0)).cast("long")
                     .alias("n_sampled")))


#: Zipf fit: how many head terms enter the OLS regression
ZIPF_TOP_N = 100

_DEC = ("CAST(CAST(SUM(CAST({x} AS DECIMAL(27,18))) AS VARCHAR) AS DOUBLE)")


@register(
    "zipf_slope",
    oracle=f"""
    WITH freq AS (
      SELECT t AS token, COUNT(*) AS cnt
      FROM (SELECT unnest({sql_whitespace_tokens('text')}) AS t
            FROM documents WHERE length(trim(text)) > 0)
      GROUP BY t
    ),
    ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM freq QUALIFY rnk <= {ZIPF_TOP_N}
    ),
    xy AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
           FROM ranked),
    s AS (
      SELECT COUNT(*) AS n,
             {_DEC.format(x='x')} AS sx, {_DEC.format(x='y')} AS sy,
             {_DEC.format(x='x * y')} AS sxy, {_DEC.format(x='x * x')} AS sxx
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS intercept
    FROM s
    """,
    tags=("textstats",),
)
def zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus head: OLS slope of ln(freq) against
    ln(rank) for the top {ZIPF_TOP_N} tokens — the classic corpus-health
    check (natural text sits near slope -1; synthetic or boilerplate-heavy
    corpora flatten). The head extraction is a global TakeOrderedAndProject
    (per-partition partial top-k, {ZIPF_TOP_N}-row merge — no full sort);
    the regression sums are per-term decimal casts so both engines
    accumulate identically."""
    docs = table(spark, sf_dir, "documents")
    freq = (docs.where(F.length(F.trim("text")) > 0)
            .select(F.explode(whitespace_tokens("text")).alias("token"))
            .groupBy("token").agg(F.count("*").alias("cnt")))
    head = freq.orderBy(F.desc("cnt"), F.asc("token")).limit(ZIPF_TOP_N)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    xy = (head.withColumn("rnk", F.row_number().over(w))
          .select(F.log(F.col("rnk").cast("double")).alias("x"),
                  F.log(F.col("cnt").cast("double")).alias("y")))

    def dec(col):
        return F.sum(col.cast("decimal(27,18)")).cast("string").cast("double")

    s = xy.agg(F.count("*").alias("n"), dec(F.col("x")).alias("sx"),
               dec(F.col("y")).alias("sy"),
               dec(F.col("x") * F.col("y")).alias("sxy"),
               dec(F.col("x") * F.col("x")).alias("sxx"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) /
             (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
        .alias("intercept"))


@register(
    "bigram_logprob_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_whitespace_tokens('lower(text)')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    bigrams AS (
      SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts)),
                      i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS b
        FROM toks WHERE len(ts) >= 2
      )
    ),
    model AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2),
    pre AS (SELECT w1, SUM(c12) AS c1 FROM model GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT t) AS v
          FROM (SELECT unnest(ts) AS t FROM toks)),
    scored AS (
      SELECT b.doc_id,
             LN((m.c12 + 1) / CAST(p.c1 + (SELECT v FROM v) AS DOUBLE)) AS lp
      FROM bigrams b
      JOIN model m ON m.w1 = b.w1 AND m.w2 = b.w2
      JOIN pre p ON p.w1 = b.w1
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(CAST(SUM(CAST(lp AS DECIMAL(27,18))) AS VARCHAR)
                      AS DOUBLE) / COUNT(*), 6) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    tags=("textstats", "lm"),
)
def bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring: train an add-one-smoothed bigram
    model ON the corpus, score each doc by its mean bigram log-probability
    ``ln((c(w1,w2)+1) / (c(w1,·)+V))`` — the classic perplexity-flavoured
    corpus filter (low scores = disfluent/outlier docs). Pure aggregation:
    no tokenizer model, no UDF.

    Scale: the model tables are vocabulary-sized (bigram types, prefix
    counts), broadcast to the corpus-sized scoring join; the per-term
    decimal sum keeps the float mean cross-engine exact. At an open-web
    vocab drop the broadcast hints and let AQE shuffle the model join.
    """
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id",
                    whitespace_tokens(F.lower(F.col("text"))).alias("ts")))
    bg = (toks.where(F.size("ts") >= 2)
          .select("doc_id", F.explode(F.transform(
              F.sequence(F.lit(0), F.size("ts") - 2),
              lambda i: F.struct(F.col("ts").getItem(i).alias("w1"),
                                 F.col("ts").getItem(i + 1).alias("w2"))))
              .alias("b"))
          .select("doc_id", "b.w1", "b.w2"))
    # consumer-scoped: the returned per-doc plan reads bg for the model,
    # the prefix totals, and the scoring pass
    from ..plans.registry import retain_for_consumer
    bg = retain_for_consumer(bg)
    model = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    pre = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = (toks.select(F.explode("ts").alias("t"))
         .agg(F.countDistinct("t").alias("v")))
    scored = (bg.join(F.broadcast(model), ["w1", "w2"])
              .join(F.broadcast(pre), "w1")
              .crossJoin(F.broadcast(v))
              .select("doc_id",
                      F.log((F.col("c12") + 1) /
                            (F.col("c1") + F.col("v")).cast("double"))
                       .alias("lp")))
    return (scored.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.round(F.sum(F.col("lp").cast("decimal(27,18)"))
                          .cast("string").cast("double") / F.count("*"), 6)
                  .alias("avg_logprob")))


@register(
    "pmi_top_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_whitespace_tokens('lower(text)')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    bigrams AS (
      SELECT b.w1 AS w1, b.w2 AS w2 FROM (
        SELECT unnest(list_transform(range(1, len(ts)),
                      i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS b
        FROM toks WHERE len(ts) >= 2
      )
    ),
    uni AS (SELECT t, COUNT(*) AS c FROM
            (SELECT unnest(ts) AS t FROM toks) GROUP BY t),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS t_toks FROM uni),
    bg AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2),
    btot AS (SELECT CAST(SUM(c12) AS DOUBLE) AS t_bg FROM bg),
    scored AS (
      SELECT b.w1, b.w2, b.c12,
             ROUND(LN((b.c12 / (SELECT t_bg FROM btot)) /
                      ((u1.c / (SELECT t_toks FROM tot)) *
                       (u2.c / (SELECT t_toks FROM tot)))), 6) AS pmi
      FROM bg b JOIN uni u1 ON b.w1 = u1.t JOIN uni u2 ON b.w2 = u2.t
      WHERE b.c12 >= 5
    )
    SELECT w1, w2, c12, pmi,
           CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2) AS BIGINT) AS rn
    FROM scored
    QUALIFY rn <= 20
    """,
    tags=("textstats", "collocations"),
)
def pmi_top_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 adjacent-token pairs by pointwise mutual
    information ``ln(p(w1,w2) / (p(w1)·p(w2)))`` with a min-count floor of
    5 — the classic phrase-detection signal (word2vec-style phrase merging
    uses exactly this statistic before training).

    Scale: one bigram explode feeds a vocabulary-sized bigram-count
    aggregate; unigram counts and the two scalar totals broadcast back into
    the (vocab-sized, count-floored) scoring join; ranking keys on the
    ROUNDED pmi so cross-engine libm noise cannot flip rank order. Nothing
    corpus-sized survives past the two aggregates.
    """
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id",
                    whitespace_tokens(F.lower(F.col("text"))).alias("ts")))
    bg_rows = (toks.where(F.size("ts") >= 2)
               .select(F.explode(F.transform(
                   F.sequence(F.lit(0), F.size("ts") - 2),
                   lambda i: F.struct(F.col("ts").getItem(i).alias("w1"),
                                      F.col("ts").getItem(i + 1).alias("w2"))))
                   .alias("b"))
               .select("b.w1", "b.w2"))
    uni = (toks.select(F.explode("ts").alias("t"))
           .groupBy("t").agg(F.count("*").alias("c")))
    tot = uni.agg(F.sum("c").cast("double").alias("t_toks"))
    bg = bg_rows.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    btot = bg.agg(F.sum("c12").cast("double").alias("t_bg"))
    u1 = uni.select(F.col("t").alias("w1"), F.col("c").alias("c_w1"))
    u2 = uni.select(F.col("t").alias("w2"), F.col("c").alias("c_w2"))
    pmi = F.round(F.log((F.col("c12") / F.col("t_bg")) /
                        ((F.col("c_w1") / F.col("t_toks")) *
                         (F.col("c_w2") / F.col("t_toks")))), 6)
    scored = (bg.where(F.col("c12") >= 5)
              .join(F.broadcast(u1), "w1").join(F.broadcast(u2), "w2")
              .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(btot))
              .select("w1", "w2", "c12", pmi.alias("pmi")))
    # distributed top-k (TakeOrderedAndProject) BEFORE the rank window, so
    # the single-partition row_number only ever sees 20 rows even when the
    # floored bigram-type table is large
    top = scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(20)
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (top.withColumn("rn", F.row_number().over(w).cast("long"))
            .select("w1", "w2", "c12", "pmi", "rn"))


# correlation between the two doc-level quality signals: compose the two
# registered oracles as CTEs so the definitions can never drift apart
from ..plans.registry import _REGISTRY as _REG  # noqa: E402

_SUM6 = ("CAST(CAST(SUM(CAST({x} AS DECIMAL(27,6))) AS VARCHAR) AS DOUBLE)")
_SUMP = ("CAST(CAST(SUM(CAST(CAST({a} AS DECIMAL(19,6)) * "
         "CAST({b} AS DECIMAL(19,6)) AS DECIMAL(33,12))) AS VARCHAR) "
         "AS DOUBLE)")


@register(
    "quality_signal_correlation",
    oracle=f"""
    WITH q AS ({_REG['doc_quality_scores'].oracle}),
    b AS ({_REG['bigram_logprob_scores'].oracle}),
    j AS (
      SELECT q.quality AS x, b.avg_logprob AS y
      FROM q JOIN b ON q.doc_id = b.doc_id
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {_SUM6.format(x='x')} AS sx,
             {_SUM6.format(x='y')} AS sy,
             {_SUMP.format(a='x', b='y')} AS sxy,
             {_SUMP.format(a='x', b='x')} AS sxx,
             {_SUMP.format(a='y', b='y')} AS syy
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           ROUND((n * sxy - sx * sy) /
                 (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
             AS pearson_r
    FROM s
    """,
    tags=("textstats", "stats"),
)
def quality_signal_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal-agreement diagnostic: Pearson correlation between the
    heuristic quality score and the bigram-LM mean log-probability, per
    corpus — the calibration question (do the cheap filter and the LM
    filter agree?) every multi-signal curation pipeline asks before
    weighting its gates.

    Both inputs are the ROUNDED registered signals (identical across
    engines by their own oracle gates); the five moment sums run in
    DECIMAL (6dp inputs → 12dp products, exact), so the correlation is a
    deterministic double both engines agree on bit-for-bit. One join on
    doc_id + one aggregate; nothing wider than a row of moments leaves the
    reducers.
    """
    q = doc_quality_scores(spark, sf_dir).select("doc_id", "quality")
    b = bigram_logprob_scores(spark, sf_dir).select("doc_id", "avg_logprob")
    j = q.join(b, "doc_id").select(F.col("quality").alias("x"),
                                   F.col("avg_logprob").alias("y"))

    def s6(c):
        return F.sum(F.col(c).cast("decimal(27,6)")).cast("string").cast("double")

    def sp(a, c):
        return (F.sum((F.col(a).cast("decimal(19,6)") *
                       F.col(c).cast("decimal(19,6)")).cast("decimal(33,12)"))
                .cast("string").cast("double"))

    s = j.agg(F.count("*").cast("double").alias("n"),
              s6("x").alias("sx"), s6("y").alias("sy"),
              sp("x", "y").alias("sxy"), sp("x", "x").alias("sxx"),
              sp("y", "y").alias("syy"))
    r = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) /
         (F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) *
          F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))))
    return s.select(F.col("n").cast("long").alias("n_docs"),
                    F.round(r, 6).alias("pearson_r"))


@register(
    "weighted_doc_sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             POW(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) / 4294967296.0,
                 1.0 / n_chars) AS k
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, ROUND(k, 12) AS key,
           CAST(ROW_NUMBER() OVER (ORDER BY ROUND(k, 12) DESC, doc_id)
                AS BIGINT) AS rn
    FROM keyed
    QUALIFY rn <= 20
    """,
    tags=("textstats", "sampling"),
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis 2006, public method): each doc draws key
    ``u^(1/w)`` (weight w = n_chars, u a hash-derived uniform) and the
    top-k keys ARE a weighted sample — the reproducible way to subsample
    a corpus proportionally to length/quality.

    The uniform comes from md5(doc_id) (not a RNG), so the sample is a
    pure function of the data — re-runs, retries, and the DuckDB oracle
    all agree exactly; ranking keys on the 12dp-rounded key so pow()
    libm noise cannot flip rank order. Scale: one scan, top-k via
    TakeOrderedAndProject — no global sort, no driver-side sampling
    state.
    """
    docs = table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16, 10).cast("double") / F.lit(4294967296.0))
    k = F.round(F.pow(u, F.lit(1.0) / F.col("n_chars")), 12)
    keyed = docs.select("doc_id", "n_chars", k.alias("key"))
    top = keyed.orderBy(F.desc("key"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("key"), F.asc("doc_id"))
    return (top.withColumn("rn", F.row_number().over(w).cast("long"))
            .select("doc_id", "n_chars", "key", "rn"))


@register(
    "lang_token_divergence",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest({sql_whitespace_tokens('lower(text)')}) AS token
      FROM documents WHERE length(trim(text)) > 0
    ),
    cnt AS (SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY lang, token),
    tot AS (SELECT lang, SUM(n) AS nt FROM cnt GROUP BY lang),
    pairs AS (
      SELECT a.lang AS l1, b.lang AS l2
      FROM tot a JOIN tot b ON a.lang < b.lang
    ),
    termsA AS (
      SELECT p.l1, p.l2,
             0.5 * (CAST(a.n AS DOUBLE) / ta.nt)
                 * LN((CAST(a.n AS DOUBLE) / ta.nt) /
                      (((CAST(a.n AS DOUBLE) / ta.nt) +
                        (CAST(COALESCE(b.n, 0) AS DOUBLE) / tb.nt)) / 2.0)) AS h
      FROM pairs p
      JOIN cnt a ON a.lang = p.l1
      JOIN tot ta ON ta.lang = p.l1
      JOIN tot tb ON tb.lang = p.l2
      LEFT JOIN cnt b ON b.lang = p.l2 AND b.token = a.token
    ),
    termsB AS (
      SELECT p.l1, p.l2,
             0.5 * (CAST(b.n AS DOUBLE) / tb.nt)
                 * LN((CAST(b.n AS DOUBLE) / tb.nt) /
                      (((CAST(COALESCE(a.n, 0) AS DOUBLE) / ta.nt) +
                        (CAST(b.n AS DOUBLE) / tb.nt)) / 2.0)) AS h
      FROM pairs p
      JOIN cnt b ON b.lang = p.l2
      JOIN tot ta ON ta.lang = p.l1
      JOIN tot tb ON tb.lang = p.l2
      LEFT JOIN cnt a ON a.lang = p.l1 AND a.token = b.token
    ),
    allterms AS (SELECT * FROM termsA UNION ALL SELECT * FROM termsB)
    SELECT l1, l2,
           ROUND(CAST(CAST(SUM(CAST(h AS DECIMAL(27,18))) AS VARCHAR)
                      AS DOUBLE), 6) AS jsd
    FROM allterms GROUP BY l1, l2
    """,
    tags=("textstats", "divergence"),
)
def lang_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition monitoring: Jensen-Shannon divergence between
    every language pair's token distributions (nats; 0 = identical,
    ln 2 = disjoint) — the drift/contrast statistic for mixture design
    (distribution_drift_psi's cross-sectional sibling over text).

    Absent tokens contribute only through the mixture m = (p+q)/2, so the
    sum splits into two one-sided LEFT joins (tokens of each side) — no
    full-outer-join per pair, and every join keys on (lang, token) with
    the tiny lang totals broadcast. Terms are deterministic doubles summed
    in DECIMAL; rounded at 6dp.
    """
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("lang",
                    F.explode(whitespace_tokens(F.lower(F.col("text"))))
                     .alias("token")))
    cnt = toks.groupBy("lang", "token").agg(F.count("*").alias("n")).cache()
    tot = cnt.groupBy("lang").agg(F.sum("n").alias("nt"))
    pairs = (tot.select(F.col("lang").alias("l1"))
             .join(tot.select(F.col("lang").alias("l2")),
                   F.col("l1") < F.col("l2")))

    ta = tot.select(F.col("lang").alias("l1"), F.col("nt").alias("nta"))
    tb = tot.select(F.col("lang").alias("l2"), F.col("nt").alias("ntb"))
    ca = cnt.select(F.col("lang").alias("al1"),
                    F.col("token").alias("atoken"), F.col("n").alias("na"))
    cb = cnt.select(F.col("lang").alias("bl2"),
                    F.col("token").alias("btoken"), F.col("n").alias("nb"))

    base = (pairs.join(F.broadcast(ta), "l1").join(F.broadcast(tb), "l2"))

    pa = F.col("na").cast("double") / F.col("nta")
    qb = F.coalesce(F.col("nb"), F.lit(0)).cast("double") / F.col("ntb")
    terms_a = (base.join(ca, F.col("l1") == F.col("al1"))
               .join(cb, (F.col("l2") == F.col("bl2")) &
                         (F.col("atoken") == F.col("btoken")), "left")
               .select("l1", "l2",
                       (F.lit(0.5) * pa *
                        F.log(pa / ((pa + qb) / F.lit(2.0)))).alias("h")))

    qb2 = F.col("nb").cast("double") / F.col("ntb")
    pa2 = F.coalesce(F.col("na"), F.lit(0)).cast("double") / F.col("nta")
    terms_b = (base.join(cb, F.col("l2") == F.col("bl2"))
               .join(ca, (F.col("l1") == F.col("al1")) &
                         (F.col("btoken") == F.col("atoken")), "left")
               .select("l1", "l2",
                       (F.lit(0.5) * qb2 *
                        F.log(qb2 / ((pa2 + qb2) / F.lit(2.0)))).alias("h")))

    out = (terms_a.unionByName(terms_b)
           .groupBy("l1", "l2")
           .agg(F.round(F.sum(F.col("h").cast("decimal(27,18)"))
                        .cast("string").cast("double"), 6).alias("jsd")))
    # bounded (lang-pair) output: materialize while the (lang, token)
    # count cache is hot, then release
    from ..operators.graph import materialize_release
    return materialize_release(out, [cnt])


@register(
    "boilerplate_prefix_groups",
    oracle=f"""
    WITH pref AS (
      SELECT source,
             array_to_string(list_slice({sql_whitespace_tokens('lower(text)')},
                                        1, 5), ' ') AS prefix
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT source, prefix, COUNT(*) AS n_docs
    FROM pref
    GROUP BY source, prefix
    HAVING COUNT(*) >= 2
    """,
    tags=("textstats", "boilerplate"),
)
def boilerplate_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detection: groups of >= 2 docs per source that
    share their first-5-token prefix — the cheap screen for injected
    headers and templated content that near-dup detectors (which need
    substantial overlap) can miss.

    Scale: prefix extraction is row-local column algebra; the aggregate
    shuffles short prefix strings, and the HAVING floor keeps output at
    template-group size.
    """
    docs = table(spark, sf_dir, "documents")
    toks = whitespace_tokens(F.lower(F.col("text")))
    pref = (docs.where(F.length(F.trim("text")) > 0)
            .select("source",
                    F.concat_ws(" ", F.slice(toks, 1, 5)).alias("prefix")))
    return (pref.groupBy("source", "prefix")
            .agg(F.count("*").alias("n_docs"))
            .where(F.col("n_docs") >= 2))


@register(
    "quality_percentile_by_lang",
    oracle=f"""
    WITH q AS ({_REG['doc_quality_scores'].oracle}),
    j AS (
      SELECT d.lang, q.doc_id, q.quality
      FROM q JOIN documents d ON d.doc_id = q.doc_id
    )
    SELECT lang, doc_id, quality,
           ROUND(PERCENT_RANK() OVER (PARTITION BY lang
                                      ORDER BY quality, doc_id), 6)
             AS quality_pct
    FROM j
    """,
    tags=("textstats", "selection", "window"),
)
def quality_percentile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LANGUAGE percentile normalization of the quality score — the
    comparability fix every multilingual curation pipeline needs before a
    single global threshold (raw heuristic scores are not comparable across
    languages: stopword lists and alpha ratios are language-biased, so a
    global cut silently skews the mix). One window partitioned by lang —
    parallel across languages at any scale; the (quality, doc_id) tiebreak
    makes every rank, and therefore the percentile, deterministic. Composes
    the registered doc_quality_scores oracle as a CTE so the two
    definitions can never drift."""
    q = doc_quality_scores(spark, sf_dir).select("doc_id", "quality")
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return (q.join(docs, "doc_id")
            .select("lang", "doc_id", "quality",
                    F.round(F.percent_rank().over(w), 6)
                    .alias("quality_pct")))


# --- round 4: PII audit + tokenizer fertility --------------------------------

#: the M1 masking chain's entity patterns, counted instead of replaced —
#: imported from functions/text.py so audit and scrub can never drift
from ..functions.text import LINE_NUMBER_RE, UID_RE, UUID_RE  # noqa: E402

_PII_TYPES = (
    ("line_number", LINE_NUMBER_RE),
    ("uuid", UUID_RE),
    ("uid_run", UID_RE),
)


@register(
    "pii_audit_counts",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{name}' AS pii_type,
               CAST(SUM(CASE WHEN len(regexp_extract_all(text, '{pat}')) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_hit,
               CAST(SUM(len(regexp_extract_all(text, '{pat}'))) AS BIGINT)
                 AS n_occurrences
        FROM documents
        """ for name, pat in _PII_TYPES),
    tags=("text", "pii", "audit"),
)
def pii_audit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-scrub PII/identifier audit: for each maskable entity class of
    the M1 chain (line numbers, UUIDs, long alphanumeric runs), how many
    documents contain at least one occurrence and how many occurrences the
    corpus carries in total — the report a curation pass publishes BEFORE
    running ``mask_documents``, and the zero-check it re-runs after. Each
    pattern is counted independently on the RAW text (a UUID also contains
    uid-run substrings; the audit reports per-class exposure, not the
    masking chain's sequential consumption). One JVM ``regexp_count`` scan
    per class folded into a single aggregate — no Python, no shuffle wider
    than 3 rows."""
    docs = table(spark, sf_dir, "documents")
    counted = docs.select(*[
        F.regexp_count("text", F.lit(pat)).cast("long").alias(name)
        for name, pat in _PII_TYPES])
    per_type = F.explode(F.array(*[
        F.struct(F.lit(name).alias("pii_type"),
                 F.col(name).alias("n_hits"))
        for name, _ in _PII_TYPES]))
    return (counted.select(per_type.alias("kv"))
            .select("kv.pii_type", "kv.n_hits")
            .groupBy("pii_type")
            .agg(F.sum(F.when(F.col("n_hits") > 0, 1).otherwise(0))
                  .cast("long").alias("n_docs_with_hit"),
                 F.sum("n_hits").cast("long").alias("n_occurrences")))


@register(
    "tokenizer_fertility_by_lang",
    oracle=f"""
    WITH per AS (
      SELECT lang,
             CAST(len({sql_whitespace_tokens('text')}) AS BIGINT) AS n_toks,
             CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(n_toks) AS DOUBLE) / COUNT(*), 6) AS tokens_per_doc,
           ROUND(CAST(SUM(n_chars) AS DOUBLE)
                 / GREATEST(CAST(SUM(n_toks) AS BIGINT), 1), 6)
             AS chars_per_token
    FROM per GROUP BY lang
    """,
    tags=("text", "tokens", "stats"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: documents, whitespace tokens,
    tokens/document, and characters/token — the table that decides
    per-language token budgets and flags scripts the tokenizer shreds
    (CJK text without spaces shows as a huge chars-per-token outlier).
    Integer sums shuffled per lang (5 groups x 2 longs), the two ratios a
    single IEEE division each, identical in both engines."""
    docs = table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.size(whitespace_tokens("text")).cast("long").alias("n_toks"),
        F.length("text").cast("long").alias("n_chars"))
    return (per.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_toks").cast("long").alias("n_tokens"),
                 F.round(F.sum("n_toks").cast("double") / F.count("*"), 6)
                  .alias("tokens_per_doc"),
                 F.round(F.sum("n_chars").cast("double")
                         / F.greatest(F.sum("n_toks").cast("long"), F.lit(1)),
                         6).alias("chars_per_token")))


from ..functions.numeric import dec_sum, sql_dec_sum  # noqa: E402


@register(
    "quality_retention_curve",
    oracle=f"""
    WITH q AS ({_REG['doc_quality_scores'].oracle}),
    cuts AS (
      SELECT quantile_cont(quality, [0.0, 0.1, 0.2, 0.3, 0.4,
                                     0.5, 0.6, 0.7, 0.8, 0.9]) AS qs
      FROM q
    ),
    lvl AS (
      SELECT i - 1 AS lvl, qs[i] AS cut
      FROM cuts CROSS JOIN generate_series(1, 10) t(i)
    )
    SELECT CAST(l.lvl AS BIGINT) AS lvl,
           ROUND(l.cut, 6) AS cut,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(q.n_tokens) AS BIGINT) AS n_tokens,
           ({sql_dec_sum('q.quality', 6)} / COUNT(q.quality)) AS mean_quality
    FROM lvl l JOIN q ON q.quality >= l.cut
    GROUP BY 1, 2
    """,
    tags=("textstats", "curation", "calibration"),
)
def quality_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration curve: for each exact decile cut of the quality
    distribution, how many documents and tokens survive a `quality >= cut`
    filter and at what mean quality — the quantity-vs-quality tradeoff
    table a corpus curator reads before picking the threshold
    (doc_quality_scores gives the score; this says what each cut COSTS).
    Composes the registered doc_quality_scores oracle as a CTE (no drift),
    and the decile cuts are exact percentiles, so the curve's x-axis is
    the same in both engines bit-for-bit.

    Scale: one exact-percentile aggregate (10 doubles, broadcast as ONE
    row), a 10x bounded expansion of the scored docs (compile-time
    constant, like the rolling-distinct explode), one 10-group aggregate.
    The at-scale percentile caveat of value_decile_histogram applies."""
    from ..plans.registry import retain_for_consumer
    # consumer-scoped cache: the returned plan reads the scored frame
    # twice (the percentile-cuts branch and the main 10x expansion) —
    # uncached, the tokenize/score scan ran once per branch
    q = retain_for_consumer(
        doc_quality_scores(spark, sf_dir).select("n_tokens", "quality"))
    cuts = q.agg(F.expr(
        "percentile(quality, array(0.0, 0.1, 0.2, 0.3, 0.4, "
        "0.5, 0.6, 0.7, 0.8, 0.9))").alias("qs"))
    lvl = cuts.select(F.posexplode("qs").alias("lvl", "cut"))
    return (q.crossJoin(F.broadcast(lvl))
            .where(F.col("quality") >= F.col("cut"))
            .groupBy(F.col("lvl").cast("long").alias("lvl"),
                     F.round("cut", 6).alias("cut"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 (dec_sum("quality", 6) / F.count("quality"))
                 .alias("mean_quality")))


from .scale import bucket_prefix_offsets, quantile_buckets  # noqa: E402

#: weighted-quantile targets — literal doubles, identical in both engines
_WQ_PS = (0.25, 0.5, 0.75)


@register(
    "token_weighted_quality_quantiles",
    oracle=f"""
    WITH q AS ({_REG['doc_quality_scores'].oracle}),
    tot AS (SELECT SUM(n_tokens) AS w FROM q),
    c AS (
      SELECT quality, doc_id,
             SUM(n_tokens) OVER (ORDER BY quality, doc_id) AS cw
      FROM q
    ),
    ps AS (SELECT unnest([{', '.join(str(p) for p in _WQ_PS)}]) AS p)
    SELECT ps.p, MIN(c.quality) AS weighted_quality
    FROM ps JOIN c ON CAST(c.cw AS DOUBLE) >= ps.p * (SELECT w FROM tot)
    GROUP BY ps.p
    """,
    tags=("textstats", "selection", "weighted-quantile"),
)
def token_weighted_quality_quantiles(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """TOKEN-weighted quality quantiles: the quality level below which
    25/50/75% of the corpus's TOKENS (not documents) sit — the statistic
    that matters when a filter budget is expressed in training tokens
    (document-weighted medians overweight short docs). Exact, not
    sketched: weighted quantile q_p = min quality whose cumulative token
    weight crosses p x total.

    Scale: the cumulative weight uses quantile_buckets +
    bucket_prefix_offsets (the packed_sequences machinery) — per-bucket
    running sums in parallel plus <=n_buckets driver-side offsets, never
    a single-partition global sort; the oracle states the same semantics
    with the plain (single-partition) window. The crossing-row selection
    is a 3-row literal join + MIN, valid because cumulative weight is
    monotone in the (quality, doc_id) order.

    Cost note: the scored frame is CACHED for the op's two driver
    round-trips (bucket cuts + offsets), so the tokenize/score scan runs
    once — the bounded 3-row result materializes while the cache is hot
    and releases it (graph.materialize_release); the token total folds
    out of the same per-bucket collect as the prefix offsets (guide §1.2:
    one pass, no throwaway recomputation — this op used to re-derive
    doc_quality_scores four times)."""
    from .scale import bucket_prefix_offsets_multi
    from .graph import materialize_release
    q = (doc_quality_scores(spark, sf_dir)
         .select("doc_id", "quality", "n_tokens").cache())
    bucketed = quantile_buckets(q, "quality")
    offm = bucket_prefix_offsets_multi(bucketed, s=F.sum("n_tokens"))
    total = F.lit(float(sum(r["s"] for r in offm["rows"]) or 0))
    wb = (Window.partitionBy("bucket").orderBy("quality", "doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = bucketed.withColumn(
        "cw", (offm["s"] + F.sum("n_tokens").over(wb)).cast("long"))
    ps = None
    for p in _WQ_PS:
        one = (cum.where(F.col("cw").cast("double") >= F.lit(p) * total)
               .agg(F.min("quality").alias("weighted_quality"))
               .select(F.lit(p).alias("p"), "weighted_quality"))
        ps = one if ps is None else ps.unionByName(one)
    # Degenerate-input parity: on an empty/all-filtered corpus the oracle's
    # join yields 0 rows, but agg(min) over an empty frame yields one NULL
    # row per p — drop those so both engines emit 0 rows.
    return materialize_release(
        ps.where(F.col("weighted_quality").isNotNull()), [q])
