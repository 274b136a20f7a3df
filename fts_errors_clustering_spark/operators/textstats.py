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
