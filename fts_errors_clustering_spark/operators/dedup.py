"""Deduplication suite — the training-data-pipeline extension family
(BASELINE.json north star): exact, MinHash-LSH, SimHash, and n-gram-Jaccard
near-dup detection over the ``documents`` corpus.

The fixture corpus has no duplicates, so every query here first PLANTS
deterministic near-duplicates (docs with doc_id < 20 re-appended under
doc_id+100000 with one extra token) — identically in the Spark plan and the
DuckDB oracle — so the candidate-generation machinery produces non-trivial,
value-checkable output.

Everything is oracle-checkable because hashing goes through the shared
md5-hex scheme (functions/text.py hash32): Spark's murmur F.hash and
DuckDB's hash() disagree, md5 doesn't.

Scale posture: exact dedup is a hash-groupBy (shuffle on a 16-byte key);
MinHash banding turns all-pairs O(n^2) into per-bucket candidate joins;
the rare-shingle block in the Jaccard query caps per-shingle fanout (df <=
50) exactly like production near-dup pipelines cap posting-list length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (hash32, hash32_hi, sql_hash32, sql_hash32_hi,
                              sql_whitespace_tokens, whitespace_tokens)
from ..plans.registry import register
from ..sources.readers import table

N_HASHES = 16
BAND_SIZE = 4  # 4 bands x 4 rows

# --- planted near-dup corpus (identical in Spark and SQL) -------------------

#: plant geometry — the ONE definition every consumer (corpus builder,
#: source lookup, oracle CTEs) derives from, so the constants cannot drift
#: between the pair detector and any doc_id -> attribute lookup joined onto
#: its pairs (a drifted inner join would silently DROP pairs).
PLANT_THRESHOLD = 20    # docs with doc_id below this get a planted near-dup
PLANT_OFFSET = 100_000  # planted copy's doc_id = original + offset

_AUG_SQL = f"""
    corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET} AS doc_id, text || ' xdup' AS text
      FROM documents WHERE doc_id < {PLANT_THRESHOLD}
    )
"""

#: doc_id -> source lookup covering the planted ids (same plant geometry
#: by construction: shares the constants above)
_SRC_SQL = f"""
    src AS (
      SELECT doc_id, source FROM documents
      UNION ALL
      SELECT doc_id + {PLANT_OFFSET} AS doc_id, source
      FROM documents WHERE doc_id < {PLANT_THRESHOLD}
    )
"""


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (docs.where(F.col("doc_id") < PLANT_THRESHOLD)
            .select((F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" xdup")).alias("text")))
    return docs.unionByName(dups)


def _augmented_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id -> source over the SAME augmented id space as ``_augmented``
    (one source of truth for the plant constants)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    copies = (docs.where(F.col("doc_id") < PLANT_THRESHOLD)
              .select((F.col("doc_id") + PLANT_OFFSET).alias("doc_id"),
                      "source"))
    return docs.unionByName(copies)


def _tok_sql(rel: str = "corpus") -> str:
    return (f"SELECT doc_id, unnest({sql_whitespace_tokens('text')}) AS token "
            f"FROM {rel} WHERE length(trim(text)) > 0")


def _tokens(df: DataFrame) -> DataFrame:
    return (df.where(F.length(F.trim("text")) > 0)
              .select("doc_id", F.explode(whitespace_tokens("text")).alias("token")))


def _shingle_sql(rel: str = "corpus") -> str:
    """3-token shingles per doc, distinct (DuckDB)."""
    return f"""
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(ts) - 1),
                    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS sh
      FROM (SELECT doc_id, {sql_whitespace_tokens('text')} AS ts
            FROM {rel} WHERE length(trim(text)) > 0)
      WHERE len(ts) >= 3
    """


def _shingles(df: DataFrame) -> DataFrame:
    """3-token shingles per doc, distinct (Spark)."""
    toks = (df.where(F.length(F.trim("text")) > 0)
            .select("doc_id", whitespace_tokens("text").alias("ts")))
    n = F.size("ts")
    idx = F.sequence(F.lit(0), n - 3)
    sh = F.transform(idx, lambda i: F.concat_ws(
        " ", F.col("ts").getItem(i), F.col("ts").getItem(i + 1),
        F.col("ts").getItem(i + 2)))
    return (toks.where(n >= 3)
            .select("doc_id", F.explode(F.array_distinct(sh)).alias("sh")))


# --- exact dedup ------------------------------------------------------------

@register(
    "dedup_exact",
    oracle=f"""
    WITH {_AUG_SQL},
    h AS (SELECT doc_id, md5(text) AS text_hash FROM corpus)
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT text_hash) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT text_hash) AS n_dup_rows
    FROM h
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text). At 100 TB this is the
    cheapest pass (shuffle on the digest, not the document)."""
    aug = _augmented(spark, sf_dir)
    h = aug.select("doc_id", F.md5("text").alias("text_hash"))
    return h.agg(F.count("*").alias("n_docs"),
                 F.countDistinct("text_hash").alias("n_distinct"),
                 (F.count("*") - F.countDistinct("text_hash")).alias("n_dup_rows"))


@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
                {sql_whitespace_tokens('text')})), ' ')) AS fingerprint
    FROM documents WHERE length(trim(text)) > 0
    """,
    tags=("dedup", "text"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the sorted distinct token set —
    order/duplication-insensitive content identity (bag-of-words
    fingerprint; byte-level md5 is ``dedup_exact``)."""
    docs = table(spark, sf_dir, "documents")
    toks = whitespace_tokens("text")
    return (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id",
                    F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
                     .alias("fingerprint")))


# --- MinHash ----------------------------------------------------------------

# MinHash is over 3-token SHINGLES, not unigram tokens: the fixture corpus
# draws from a ~31-word vocabulary, so unigram token SETS of random docs
# overlap at Jaccard ~0.6-0.8 and unigram MinHash degenerates into
# "everything is a near-dup" (5.9M pairs at sf0.1). Shingling cubes the
# effective vocabulary; random-pair shingle Jaccard ~0, planted dups ~0.9.
# Hashes are Kirsch-Mitzenmacher double hashing — ONE md5 per shingle,
# h_s = (h1 + s*h2) mod 2^32 — instead of one salted md5 per (shingle, seed).
_MINHASH_SQL = f"""
    shing AS ({_shingle_sql()}),
    hashed AS (
      SELECT doc_id, {sql_hash32('sh')} AS h1, {sql_hash32_hi('sh')} AS h2
      FROM shing
    ),
    seeds AS (SELECT CAST(s.range AS BIGINT) AS seed FROM range(0, {N_HASHES}) s),
    sigs AS (SELECT doc_id, seed,
                    MIN((h1 + seed * h2) % 4294967296) AS minhash
             FROM hashed CROSS JOIN seeds GROUP BY doc_id, seed)
"""


def _minhash_mins(df: DataFrame) -> DataFrame:
    """WIDE MinHash signatures over 3-token shingles: one row per doc with
    the {N_HASHES} double-hashed minima as COLUMNS ``m0..m{N_HASHES-1}``
    (one md5 per shingle, one map-side-combinable groupBy — the shuffle
    carries n_docs x {N_HASHES} integers, nothing proportional to corpus
    size). The wide form is the working representation for the whole LSH
    family: banding keys and signature-agreement estimates are in-row
    column algebra over it, so no consumer ever re-aggregates or seed-
    explodes the signature stream (guide §2.3/§2.4)."""
    hashed = _shingles(df).select(
        "doc_id", hash32("sh").alias("h1"), hash32_hi("sh").alias("h2"))
    return hashed.groupBy("doc_id").agg(*[
        F.min((F.col("h1") + s * F.col("h2")) % F.lit(4294967296))
         .alias(f"m{s}")
        for s in range(N_HASHES)])


def _band_keys(mins: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) from the wide signature frame: per band the
    md5 of the comma-joined minima — the identical string the oracle's
    ``string_agg(... ORDER BY seed)`` builds — via in-row concat, no
    (doc_id, band) re-aggregation shuffle."""
    n_bands = N_HASHES // BAND_SIZE
    structs = [
        F.struct(F.lit(b).cast("long").alias("band"),
                 F.md5(F.concat_ws(",", *[
                     F.col(f"m{s}").cast("string")
                     for s in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)]))
                 .alias("bucket"))
        for b in range(n_bands)]
    return (mins.select("doc_id", F.explode(F.array(*structs)).alias("kv"))
            .select("doc_id", "kv.band", "kv.bucket"))


def _sig_agreement(n_hashes: int = N_HASHES) -> "F.Column":
    """Signature-agreement Jaccard estimate between two wide signatures
    joined side by side as ``m{s}_a`` / ``m{s}_b``: the fraction of equal
    minima — same integers, same single division as the seed-exploded
    groupBy form it replaces."""
    agree = sum((F.when(F.col(f"m{s}_a") == F.col(f"m{s}_b"), 1).otherwise(0)
                 for s in range(n_hashes)), F.lit(0))
    return agree / F.lit(float(n_hashes))


@register(
    "minhash_signatures",
    oracle=f"""
    WITH {_AUG_SQL}, {_MINHASH_SQL}
    SELECT doc_id, seed, minhash FROM sigs
    """,
    tags=("dedup", "minhash"),
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures over 3-token shingles, one (doc, seed) row with
    the double-hashed minimum: the wide ``_minhash_mins`` frame unpivoted
    at the end."""
    aug = _augmented(spark, sf_dir)
    mins = _minhash_mins(aug)
    sig = F.explode(F.array(*[
        F.struct(F.lit(s).cast("long").alias("seed"),
                 F.col(f"m{s}").alias("minhash"))
        for s in range(N_HASHES)]))
    return (mins.select("doc_id", sig.alias("kv"))
            .select("doc_id", "kv.seed", "kv.minhash"))


#: banding -> bucket-join -> signature-agreement estimate; shared by
#: minhash_near_dups and the connected-components dedup_clusters oracle
_MINHASH_PAIRS_SQL = f"""
    bands AS (
      SELECT doc_id, seed // {BAND_SIZE} AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)) AS bucket
      FROM sigs GROUP BY doc_id, seed // {BAND_SIZE}
    ),
    cand AS (
      SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
      FROM bands b1 JOIN bands b2
        ON b1.band = b2.band AND b1.bucket = b2.bucket AND b1.doc_id < b2.doc_id
    ),
    est AS (
      SELECT c.a, c.b,
             SUM(CASE WHEN s1.minhash = s2.minhash THEN 1 ELSE 0 END)
               / CAST({N_HASHES} AS DOUBLE) AS est_jaccard
      FROM cand c
      JOIN sigs s1 ON s1.doc_id = c.a
      JOIN sigs s2 ON s2.doc_id = c.b AND s1.seed = s2.seed
      GROUP BY c.a, c.b
    )
"""


@register(
    "minhash_near_dups",
    oracle=f"""
    WITH {_AUG_SQL}, {_MINHASH_SQL}, {_MINHASH_PAIRS_SQL}
    SELECT a, b, est_jaccard FROM est WHERE est_jaccard >= 0.5
    """,
    tags=("dedup", "minhash"),
)
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signatures ({N_HASHES} hashes,
    bands of {BAND_SIZE}), bucket-join per band (the O(n^2) -> O(candidates)
    step), then estimate Jaccard by signature agreement and keep pairs
    >= 0.5. Shingle->minhash->band->bucket-join, the canonical LLM-corpus
    dedup shape."""
    from ..plans.registry import retain_for_consumer
    # wide signatures: banding keys AND the per-pair agreement estimate
    # are in-row column algebra over this one cached frame — no band
    # re-aggregation shuffle, no 16x seed-explode join, no groupBy(a, b)
    # (guide §2.3: the verify shuffle moves one candidate row, not 16)
    mins = retain_for_consumer(_minhash_mins(_augmented(spark, sf_dir)))
    bands = _band_keys(mins)
    b1 = bands.select(F.col("doc_id").alias("a"), "band", "bucket")
    b2 = bands.select(F.col("doc_id").alias("b"), "band", "bucket")
    cand = (b1.join(b2, ["band", "bucket"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())
    s1 = mins.select(F.col("doc_id").alias("a"),
                     *[F.col(f"m{s}").alias(f"m{s}_a")
                       for s in range(N_HASHES)])
    s2 = mins.select(F.col("doc_id").alias("b"),
                     *[F.col(f"m{s}").alias(f"m{s}_b")
                       for s in range(N_HASHES)])
    est = (cand.join(s1, "a").join(s2, "b")
           .select("a", "b", _sig_agreement().alias("est_jaccard")))
    return est.where(F.col("est_jaccard") >= 0.5)


#: threshold grid for the LSH-estimate sensitivity sweep — multiples of
#: 1/N_HASHES so every cutoff is an EXACT signature-agreement fraction
#: (est_jaccard is k/16; a grid point between two representable fractions
#: would make >= comparisons float-fragile across engines)
NEARDUP_TAUS = (0.5, 0.625, 0.75, 0.875, 1.0)


@register(
    "neardup_threshold_sweep",
    oracle=f"""
    WITH {_AUG_SQL}, {_MINHASH_SQL}, {_MINHASH_PAIRS_SQL},
    taus AS (SELECT unnest({list(NEARDUP_TAUS)}) AS threshold)
    SELECT t.threshold,
           CAST(COUNT(e.est_jaccard) AS BIGINT) AS n_pairs
    FROM taus t LEFT JOIN est e ON e.est_jaccard >= t.threshold
    GROUP BY t.threshold
    """,
    tags=("dedup", "minhash", "sweep"),
)
def neardup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold sensitivity sweep: how many near-dup pairs the
    MinHash-LSH estimate yields at each Jaccard cutoff — the tuning table a
    corpus owner reads before fixing the dedup threshold (too low merges
    distinct docs, too high leaves near-dups in). One pass over the
    candidate-pair estimates (already bounded by LSH banding, never all
    pairs); the sweep itself is a broadcast |taus|-row join + conditional
    count, so the cost is one extra aggregate over the est table, not one
    LSH run per threshold."""
    est = minhash_near_dups(spark, sf_dir)
    taus = spark.createDataFrame([(t,) for t in NEARDUP_TAUS],
                                 "threshold double")
    return (taus.join(est, est.est_jaccard >= taus.threshold, "left")
            .groupBy("threshold")
            .agg(F.count("est_jaccard").cast("long").alias("n_pairs")))


@register(
    "source_overlap_matrix",
    oracle=f"""
    WITH {_AUG_SQL}, {_MINHASH_SQL}, {_MINHASH_PAIRS_SQL}, {_SRC_SQL},
    dup AS (SELECT a, b FROM est WHERE est_jaccard >= 0.5),
    labeled AS (
      SELECT LEAST(sa.source, sb.source) AS source_a,
             GREATEST(sa.source, sb.source) AS source_b
      FROM dup JOIN src sa ON sa.doc_id = dup.a
               JOIN src sb ON sb.doc_id = dup.b
    )
    SELECT source_a, source_b, COUNT(*) AS n_neardup_pairs
    FROM labeled GROUP BY source_a, source_b
    """,
    tags=("dedup", "minhash", "provenance"),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: near-dup pairs (MinHash-LSH,
    >= 0.5) attributed to their sources — which crawls/feeds copy from
    which. Off-diagonal mass means two upstream sources ship the same
    content (pay for one); diagonal mass is intra-source duplication
    (dedup before mixing weights are computed, or the duplicated source is
    silently over-weighted). Source pairs are LEAST/GREATEST-normalized so
    (a,b) and (b,a) land in one cell. Cost: the LSH pass + a doc_id->source
    lookup join per pair side — source labels are small strings riding a
    pair-sized shuffle, never text bodies. The lookup shares ``_augmented``'s
    plant constants (one source of truth) and joins LEFT with a loud
    null-source guard, so an id-space drift fails instead of silently
    undercounting the matrix."""
    src = _augmented_sources(spark, sf_dir)
    dup = minhash_near_dups(spark, sf_dir).select("a", "b")
    sa = src.select(F.col("doc_id").alias("a"), F.col("source").alias("src_a"))
    sb = src.select(F.col("doc_id").alias("b"), F.col("source").alias("src_b"))
    labeled = (dup.join(sa, "a", "left").join(sb, "b", "left")
               .select(F.when(F.col("src_a").isNull() | F.col("src_b").isNull(),
                              F.raise_error(F.lit(
                                  "source_overlap_matrix: near-dup pair "
                                  "references a doc_id outside the source "
                                  "lookup — plant constants drifted")))
                       .otherwise(F.least("src_a", "src_b")).alias("source_a"),
                       F.greatest("src_a", "src_b").alias("source_b")))
    return (labeled.groupBy("source_a", "source_b")
            .agg(F.count("*").alias("n_neardup_pairs")))


# --- n-gram Jaccard ---------------------------------------------------------

#: Jaccard near-dup threshold as an exact rational (3/5 = 0.6) so the
#: prefix/length/positional bounds below stay in integer arithmetic —
#: float ceil(0.6*n) rounds UP spuriously (0.6*45 = 27.000000000000004)
#: and a too-large ceil SHRINKS the prefix, silently losing candidates.
_TAU_NUM, _TAU_DEN = 3, 5


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {_AUG_SQL},
    shingles AS ({_shingle_sql()}),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT s1.doc_id AS a, s2.doc_id AS b, COUNT(*) AS n_inter
      FROM shingles s1
      JOIN shingles s2 ON s1.sh = s2.sh AND s1.doc_id < s2.doc_id
      GROUP BY s1.doc_id, s2.doc_id
    )
    SELECT i.a, i.b,
           ROUND(CAST(i.n_inter AS DOUBLE) /
                 (za.sz + zb.sz - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.a
    JOIN sizes zb ON zb.doc_id = i.b
    WHERE CAST(i.n_inter AS DOUBLE) / (za.sz + zb.sz - i.n_inter)
          >= CAST({_TAU_NUM} AS DOUBLE) / {_TAU_DEN}
    """,
    tags=("dedup", "ngram"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-token shingle) Jaccard near-dup pairs (threshold
    0.6) via PREFIX FILTERING — the AllPairs/PPJoin scheme (Bayardo et al.
    WWW'07; Xiao et al. WWW'08), which is candidate-COMPLETE: the oracle is
    the plain all-pairs definition with no blocking caveat.

    Each doc's distinct shingles are ordered globally by (doc-frequency
    asc, shingle asc); a pair with Jaccard >= tau must share a shingle
    within both docs' first ``sz - ceil(tau*sz) + 1`` shingles (prefix),
    so only prefix entries — the RAREST ~40% at tau=0.6 — generate join
    candidates. Candidates are further pruned by the length filter
    (tau <= sza/szb <= 1/tau) and PPJoin's positional filter
    (1 + min(sza-ra, szb-rb) >= ceil(tau/(1+tau)*(sza+szb))), then
    verified exactly with one hash-set intersection per surviving pair.

    This replaces round 1's df-cap blocking, whose corpus-relative cap
    (2% of n_docs) let posting-list fanout grow O(df^2) with the corpus —
    measured 29.9x runtime at 10x data. Prefix filtering keys candidates
    on each doc's rarest shingles instead, so fanout tracks the rare end
    of the df distribution regardless of corpus size, with recall
    guaranteed by construction rather than by a tuned cap."""
    aug = _augmented(spark, sf_dir)
    # Candidate generation runs entirely on 8-byte xxhash64 shingle keys —
    # the prefix scheme needs only SOME total order shared by all docs, so
    # (df, hash) serves as well as (df, text) while the shuffles and the
    # per-doc sort move longs instead of ~40-byte shingle strings. A hash
    # collision can only MERGE two posting lists, i.e. add a false
    # candidate; the exact string-set verification below removes it.
    #
    # Plan shape: the shingle explode is evaluated ONCE and both per-key
    # statistics come from stacked WINDOWS over it (count over shh, then
    # count + row_number over doc_id) — the join formulation (explode ->
    # groupBy df -> join back -> groupBy sets -> join back) re-evaluates
    # the explode per branch, which measured as ~3x the whole query's cost.
    # Two shuffles total, both on 8-byte keys.
    ex = _shingles(aug).select("doc_id", F.xxhash64("sh").alias("shh"))
    w_doc = Window.partitionBy("doc_id")
    w_rnk = Window.partitionBy("doc_id").orderBy("df", "shh")
    posting = (ex.groupBy("shh")
               .agg(F.count("*").alias("df"),
                    F.collect_list("doc_id").alias("ds")))
    ranked = (posting.select("shh", "df", F.explode("ds").alias("doc_id"))
              .withColumn("sz", F.count("*").over(w_doc))
              .withColumn("rnk", F.row_number().over(w_rnk)))
    # prefix_len = sz - ceil(tau*sz) + 1, in exact integer arithmetic
    ceil_tau_sz = F.floor((F.lit(_TAU_NUM) * F.col("sz")
                           + F.lit(_TAU_DEN - 1)) / F.lit(_TAU_DEN))
    ranked = ranked.where(F.col("rnk") <= F.col("sz") - ceil_tau_sz + 1)
    p1 = ranked.select(F.col("doc_id").alias("a"), "shh",
                       F.col("sz").alias("sza"), F.col("rnk").alias("ra"))
    p2 = ranked.select(F.col("doc_id").alias("b"), "shh",
                       F.col("sz").alias("szb"), F.col("rnk").alias("rb"))
    # length filter: tau <= min/max; positional filter: overlap upper bound
    # at this occurrence must reach ceil(tau/(1+tau) * (sza+szb))
    min_ovl = F.floor((F.lit(_TAU_NUM) * (F.col("sza") + F.col("szb"))
                       + F.lit(_TAU_NUM + _TAU_DEN - 1))
                      / F.lit(_TAU_NUM + _TAU_DEN))
    cand = (p1.join(p2, "shh")
            .where((F.col("a") < F.col("b"))
                   & (F.lit(_TAU_DEN) * F.least("sza", "szb")
                      >= F.lit(_TAU_NUM) * F.greatest("sza", "szb"))
                   & (F.lit(1) + F.least(F.col("sza") - F.col("ra"),
                                         F.col("szb") - F.col("rb"))
                      >= min_ovl))
            .select("a", "b").distinct())
    # verification side: per-doc sorted distinct-shingle arrays as an
    # AGGREGATE. The exchange under the aggregate is a reuse point (the
    # same subplan serves both join sides via ReusedExchange) and a
    # containment barrier: with an array-native (per-row expression) form
    # instead, constraint pushdown re-derives the whole shingle-array
    # expression inside scan filters per row — measured 4-10x slower.
    sets = (_shingles(aug).groupBy("doc_id")
            .agg(F.sort_array(F.collect_list("sh")).alias("shs"),
                 F.count("*").alias("sz")))
    va = sets.select(F.col("doc_id").alias("a"), F.col("shs").alias("shs_a"),
                     F.col("sz").alias("sza"))
    vb = sets.select(F.col("doc_id").alias("b"), F.col("shs").alias("shs_b"),
                     F.col("sz").alias("szb"))
    n_inter = F.size(F.array_intersect("shs_a", "shs_b"))
    jac = (n_inter.cast("double") /
           (F.col("sza") + F.col("szb") - n_inter))
    return (cand.join(va, "a").join(vb, "b")
            .where(jac >= F.lit(_TAU_NUM) / F.lit(_TAU_DEN))
            .select("a", "b", F.round(jac, 6).alias("jaccard")))


# --- SimHash ----------------------------------------------------------------

def _packed_simhash(hashed: DataFrame) -> DataFrame:
    """(doc_id, h1, h2) -> (doc_id, lo, hi): 64-bit SimHash as two 32-bit
    halves, via BIT-SLICED aggregation.

    The naive plan — 64 per-bit ``SUM(CASE ...)`` aggregate columns plus a
    64-deep nested-``when`` assembly chain — is what the oracle SQL still
    spells out, but on the Spark side it costs seconds of Catalyst analysis
    and giant generated methods per invocation (measured: simhash queries
    were the slowest in the whole bench at 2.8-7.9 s, dominated by plan
    overhead, not data). Instead we pack FOUR 16-bit bit-counters into each
    64-bit sum: lane j (j in 0..15) accumulates bits {j, j+16} of h1 and
    {j, j+16} of h2 at byte offsets 0/16/32/48. That is 16 ``SUM`` columns
    plus ``COUNT(*)`` — the per-bit count is ``(s_j >> 16k) & 0xFFFF`` and
    bit b is set iff ``2*cnt_b > n`` (exactly the old ``sum(+-1) > 0``,
    ties -> 0). Counters are exact while every doc has < 32,768 hashed
    rows (the byte-48 lane's counter must stay clear of the signed-64
    sign bit) — shingle/token counts per document sit orders of magnitude
    below that.
    Assembly is two flat ``aggregate()`` folds over ``sequence(0,31)`` —
    constant-size plan regardless of bit width."""
    lanes = []
    for j in range(16):
        lane = (F.shiftright(F.col("h1"), j).bitwiseAND(F.lit(1))
                + F.shiftleft(F.shiftright(F.col("h1"), j + 16)
                              .bitwiseAND(F.lit(1)), 16)
                + F.shiftleft(F.shiftright(F.col("h2"), j)
                              .bitwiseAND(F.lit(1)), 32)
                + F.shiftleft(F.shiftright(F.col("h2"), j + 16)
                              .bitwiseAND(F.lit(1)), 48))
        lanes.append(F.sum(lane).alias(f"s{j}"))
    sums = hashed.groupBy("doc_id").agg(*lanes, F.count("*").alias("n"))
    # cnts[b] for b in 0..63: lane b%16, byte-offset 16*(b//16); order below
    # is [offset 0: j 0..15, offset 16: j 0..15, ...] = h1 bits 0..31 then
    # h2 bits 0..31.
    cnts = F.array(*[
        F.shiftright(F.col(f"s{j}"), 16 * k).bitwiseAND(F.lit(0xFFFF))
        for k in range(4) for j in range(16)])
    n = F.col("n")

    def _fold(offset: int):
        # 2^b is exact in a double for b <= 31, so pow stands in for a
        # variable-distance shiftleft (which only takes literal distances)
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(31)), F.lit(0).cast("long"),
            lambda acc, b: acc + F.when(
                F.lit(2) * F.element_at(F.col("cnts"), b + offset + 1) > n,
                F.pow(F.lit(2.0), b).cast("long")).otherwise(F.lit(0).cast("long")))

    return (sums.withColumn("cnts", cnts)
            .select("doc_id", _fold(0).alias("lo"), _fold(32).alias("hi")))


def _sql_simhash_half(hexpr: str, bits: int = 32) -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN (({hexpr} >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits))
    return sums


def _sql_simhash_assemble(bits: int = 32) -> str:
    return " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(bits))


@register(
    "simhash_signatures",
    oracle=f"""
    WITH {_AUG_SQL},
    toks AS ({_tok_sql()}),
    dtoks AS (SELECT DISTINCT doc_id, token FROM toks),
    hashed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h1,
             CAST(('0x' || substr(md5(token), 9, 8)) AS BIGINT) AS h2
      FROM dtoks
    ),
    sums AS (
      SELECT doc_id,
             {_sql_simhash_half('h1')},
             {', '.join(f"SUM(CASE WHEN ((h2 >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS t{b}" for b in range(32))}
      FROM hashed GROUP BY doc_id
    )
    SELECT doc_id,
           {_sql_simhash_assemble()} AS simhash_lo,
           {' + '.join(f"(CASE WHEN t{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(32))} AS simhash_hi
    FROM sums
    """,
    tags=("dedup", "simhash"),
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (two 32-bit halves from the shared md5
    hash): per bit, sum +-1 over the doc's distinct token hashes, sign ->
    bit. One explode + one bit-sliced groupBy (see ``_packed_simhash``) —
    exact integers throughout, so the per-bit-sum oracle is bit-for-bit."""
    aug = _augmented(spark, sf_dir)
    dtoks = _tokens(aug).distinct()
    hashed = dtoks.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(F.md5("token"), 9, 8), 16, 10).cast("long").alias("h2"))
    return (_packed_simhash(hashed)
            .select("doc_id", F.col("lo").alias("simhash_lo"),
                    F.col("hi").alias("simhash_hi")))


# --- SimHash near-dup detector ---------------------------------------------

HAM_MAX = 3  # 4 x 16-bit bands are candidate-COMPLETE for hamming <= 3


def _shingle_simhash(df: DataFrame) -> DataFrame:
    """64-bit SimHash over 3-token SHINGLES (unigram simhash suffers the
    same degeneracy as unigram minhash on this corpus — see _MINHASH_SQL
    note): (doc_id, lo, hi) with two 32-bit halves.

    Plan shape: 16 bit-sliced sums + count in ONE aggregate (see
    ``_packed_simhash``). Two earlier shapes were measured and rejected:
    posexplode into a narrow groupBy(doc_id, bit) is ~10x slower (64x the
    rows), and 64 flat conditional-sum columns cost seconds of pure
    Catalyst-planning/codegen overhead per invocation."""
    hashed = _shingles(df).select(
        "doc_id", hash32("sh").alias("h1"), hash32_hi("sh").alias("h2"))
    return _packed_simhash(hashed)


_SIMHASH_SHINGLE_SQL = f"""
    shing AS ({_shingle_sql()}),
    hashed AS (
      SELECT doc_id, {sql_hash32('sh')} AS h1, {sql_hash32_hi('sh')} AS h2
      FROM shing
    ),
    sums AS (
      SELECT doc_id,
             {_sql_simhash_half('h1')},
             {', '.join(f"SUM(CASE WHEN ((h2 >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS t{b}" for b in range(32))}
      FROM hashed GROUP BY doc_id
    ),
    sigs AS (
      SELECT doc_id, {_sql_simhash_assemble()} AS lo,
             {' + '.join(f"(CASE WHEN t{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)" for b in range(32))} AS hi
      FROM sums
    )
"""


@register(
    "simhash_near_dups",
    oracle=f"""
    WITH {_AUG_SQL}, {_SIMHASH_SHINGLE_SQL}
    SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(bit_count(xor(CAST(a.lo AS BIT), CAST(b.lo AS BIT))) +
                bit_count(xor(CAST(a.hi AS BIT), CAST(b.hi AS BIT))) AS BIGINT) AS hamming
    FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(CAST(a.lo AS BIT), CAST(b.lo AS BIT))) +
          bit_count(xor(CAST(a.hi AS BIT), CAST(b.hi AS BIT))) <= {HAM_MAX}
    """,
    tags=("dedup", "simhash"),
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: shingle-simhash, band the 64 bits into
    4 x 16-bit keys, bucket-join per band (pigeonhole: any pair within
    hamming {HAM_MAX} shares >= 1 untouched band, so candidates are
    COMPLETE), then the exact popcount filter. The oracle brute-forces
    all pairs — identical result, which is precisely the banding-is-
    lossless claim under test."""
    from ..plans.registry import retain_for_consumer
    aug = _augmented(spark, sf_dir)
    # consumer-scoped: read by the band explode and both popcount sides
    sigs = retain_for_consumer(_shingle_simhash(aug))
    halves = [("lo", 0), ("lo", 16), ("hi", 0), ("hi", 16)]
    bands = sigs.select("doc_id", F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftright(F.col(c), s).bitwiseAND(F.lit(0xFFFF)).alias("val"))
        for i, (c, s) in enumerate(halves)])).alias("kv")
    ).select("doc_id", "kv.band", "kv.val")
    b1 = bands.select(F.col("doc_id").alias("a"), "band", "val")
    b2 = bands.select(F.col("doc_id").alias("b"), "band", "val")
    cand = (b1.join(b2, ["band", "val"]).where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())
    s1 = sigs.select(F.col("doc_id").alias("a"),
                     F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"))
    s2 = sigs.select(F.col("doc_id").alias("b"),
                     F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"))
    ham = (F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))) +
           F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))).cast("long")
    return (cand.join(s1, "a").join(s2, "b")
            .select("a", "b", ham.alias("hamming"))
            .where(F.col("hamming") <= HAM_MAX))


# --- connected-components dedup clusters -------------------------------------

def min_label_components(ids: DataFrame, edges: DataFrame,
                         max_iter: int = 50) -> DataFrame:
    """Connected components by iterative min-label propagation with
    pointer-halving — the same O(log diameter) loop as DBSCAN's component
    stage (``operators/dbscan.py``), without the core/border machinery.
    ``ids`` has one column ``id``; ``edges`` columns (a, b), directed (pass
    both directions for undirected graphs). Returns (id, component) where
    component = min member id."""
    # init at min(id, min neighbor) — one propagation round folded into
    # init, same as operators/dbscan.py
    init_min = edges.groupBy("a").agg(F.min("b").alias("nlbl"))
    labels = (ids.join(init_min, ids.id == init_min.a, "left")
              .select("id",
                      F.least(F.col("id"),
                              F.coalesce(F.col("nlbl"), F.col("id")))
                       .alias("lbl"))
              .localCheckpoint())
    prev_sum, converged = None, False
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges.b == labels.id)
                   .groupBy("a").agg(F.min("lbl").alias("nlbl")))
        stale = labels
        labels = (labels.join(nbr_min, labels.id == nbr_min.a, "left")
                  .select(labels.id,
                          F.least(F.col("lbl"),
                                  F.coalesce(F.col("nlbl"), F.col("lbl")))
                           .alias("lbl")))
        jump = labels.select(F.col("id").alias("pid"),
                             F.col("lbl").alias("plbl"))
        labels = (labels.join(jump, labels.lbl == jump.pid, "left")
                  .select(labels.id,
                          F.least(F.col("lbl"),
                                  F.coalesce(F.col("plbl"), F.col("lbl")))
                           .alias("lbl"))
                  .localCheckpoint(eager=False))
        # the certificate action materializes the lazy checkpoint — one job
        cur = labels.agg(F.sum("lbl")).first()[0]
        # this round is materialized; drop the previous (checkpoint-aware:
        # plain DataFrame.unpersist is a no-op on a localCheckpoint)
        from ..plans.registry import unpersist_any
        unpersist_any(stale)
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur
    if not converged:
        raise RuntimeError(
            f"min_label_components: no convergence in {max_iter} rounds")
    # the final round's checkpoint backs the returned plan — register it
    # for consumer-acknowledged release (the loop released every earlier
    # round as soon as its successor materialized)
    from ..plans.registry import retain_for_consumer
    return retain_for_consumer(labels).select(
        "id", F.col("lbl").alias("component"))


@register(
    "dedup_clusters",
    oracle=f"""
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
    )
    SELECT doc_id, canonical_id,
           CAST(COUNT(*) OVER (PARTITION BY canonical_id) AS BIGINT)
             AS cluster_size,
           doc_id = canonical_id AS keep
    FROM comp
    """,
    tags=("dedup", "minhash", "components"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step an LLM-corpus dedup pipeline actually ships: near-dup PAIRS
    (MinHash-LSH, >= 0.5 estimated Jaccard) resolved into connected
    components, each doc mapped to its cluster's canonical representative
    (min doc_id) with the cluster size and a ``keep`` flag (true on the one
    retained row per cluster; filtering on it IS the dedup).

    Scale: propagation runs only over docs that appear in a dup pair (the
    tiny minority); everyone else is a singleton appended with
    component = self, so no corpus-sized join enters the loop.
    """
    from ..plans.registry import retain_for_consumer
    aug = _augmented(spark, sf_dir)
    # consumer-scoped: read by edges (twice), paired_ids, and the CC loop
    pairs = retain_for_consumer(
        minhash_near_dups(spark, sf_dir).select("a", "b"))
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
    paired_ids = (pairs.select(F.col("a").alias("id"))
                  .unionByName(pairs.select(F.col("b").alias("id")))
                  .distinct())
    comp = min_label_components(paired_ids, edges)
    labeled = (aug.select("doc_id")
               .join(comp, aug.doc_id == comp.id, "left")
               .select("doc_id",
                       F.coalesce("component", "doc_id").alias("canonical_id")))
    wsz = Window.partitionBy("canonical_id")
    return labeled.select(
        "doc_id", "canonical_id",
        F.count("*").over(wsz).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("canonical_id")).alias("keep"))


# --- benchmark decontamination ----------------------------------------------

@register(
    "benchmark_contamination",
    oracle=f"""
    WITH bench AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 10
    ),
    corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id >= 10
    ),
    bsh AS (SELECT DISTINCT sh FROM ({_shingle_sql('bench')})),
    csh AS ({_shingle_sql('corpus')}),
    hits AS (
      SELECT c.doc_id, COUNT(*) AS n_overlap
      FROM csh c JOIN bsh b ON c.sh = b.sh
      GROUP BY c.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM csh GROUP BY doc_id)
    SELECT h.doc_id, h.n_overlap, s.n_shingles,
           ROUND(h.n_overlap / CAST(s.n_shingles AS DOUBLE), 6)
             AS overlap_ratio
    FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
    WHERE h.n_overlap / CAST(s.n_shingles AS DOUBLE) >= 0.2
    """,
    tags=("dedup", "contamination"),
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the pre-training hygiene pass: flag
    corpus documents whose n-gram (3-token shingle) overlap with a held-out
    benchmark set exceeds a threshold, so they can be dropped before
    training. Benchmark = docs with doc_id < 10 (the fixture stand-in for
    an eval set); a corpus doc is contaminated when >= 20% of its shingles
    appear anywhere in the benchmark.

    Scale: the benchmark shingle set is tiny (eval sets are) and is
    broadcast, so the corpus side streams through one semi-join-shaped
    probe — no shuffle of corpus shingles; counts aggregate map-side. This
    is the standard 13-gram-overlap decontamination shape at 3-gram scale.
    """
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.where(F.col("doc_id") < 10)
    corpus = docs.where(F.col("doc_id") >= 10)
    from ..plans.registry import retain_for_consumer
    bsh = _shingles(bench).select("sh").distinct()
    # consumer-scoped: the returned plan reads csh for both hits and sizes
    csh = retain_for_consumer(_shingles(corpus))
    hits = (csh.join(F.broadcast(bsh), "sh")
            .groupBy("doc_id").agg(F.count("*").alias("n_overlap")))
    sizes = csh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    ratio = F.col("n_overlap") / F.col("n_shingles").cast("double")
    return (hits.join(sizes, "doc_id")
            .where(ratio >= 0.2)
            .select("doc_id", "n_overlap", "n_shingles",
                    F.round(ratio, 6).alias("overlap_ratio")))


@register(
    "canonical_by_quality",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS h,
             length(text) AS quality
      FROM documents WHERE length(trim(text)) > 0
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY h
                                   ORDER BY quality DESC, doc_id) AS rn
      FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical
    FROM ranked GROUP BY source
    """,
    tags=("dedup", "curation"),
)
def canonical_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-keep exact dedup: within each content-digest group keep the
    HIGHEST-QUALITY copy (length proxy here; doc_id tiebreak), not the
    lowest id — the policy a real corpus pipeline wants when duplicates
    differ in provenance (keep the cleanest copy, drop the rest).
    Complements ``dedup_exact`` (min-id keep) and
    ``incremental_dedup_counts`` (batch-vs-history); reported as per-source
    total vs canonical counts.

    Scale: one window over the 16-byte digest key — the same digest-only
    shuffle as every exact-dedup op here; bodies never move.
    """
    from pyspark.sql import Window as W
    docs = table(spark, sf_dir, "documents")
    scored = (docs.where(F.length(F.trim("text")) > 0)
              .select("doc_id", "source",
                      F.md5(F.lower(F.trim("text"))).alias("h"),
                      F.length("text").alias("quality")))
    w = W.partitionBy("h").orderBy(F.desc("quality"), F.asc("doc_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w))
    return (ranked.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
                  .cast("long").alias("n_canonical")))


@register(
    "snapshot_diff_counts",
    oracle="""
    WITH old_snap AS (
      SELECT DISTINCT md5(text) AS dg FROM documents
      WHERE doc_id % 2 = 0 AND text IS NOT NULL
    ),
    new_snap AS (
      SELECT DISTINCT md5(text) AS dg FROM documents
      WHERE doc_id % 3 <> 0 AND text IS NOT NULL
    )
    SELECT CASE WHEN o.dg IS NULL THEN 'added'
                WHEN n.dg IS NULL THEN 'removed'
                ELSE 'kept' END AS status,
           COUNT(*) AS n_digests
    FROM old_snap o FULL OUTER JOIN new_snap n ON o.dg = n.dg
    GROUP BY 1
    """,
    tags=("dedup", "versioning"),
)
def snapshot_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff: two corpus snapshots compared by content
    digest, reporting how many distinct contents were added, removed, or
    kept between them — the audit row a dataset release pipeline prints
    for every new crawl drop. The snapshots are deterministic overlapping
    id-slices of the fixture corpus (old = even ids, new = ids not
    divisible by 3), so all three statuses are populated at every SF.

    Scale: each side reduces to DISTINCT 16-byte digests before the
    FULL OUTER sort-merge join — document bodies never shuffle, and the
    join key is the digest itself, uniformly distributed by construction
    (no skew). This is the content-addressable diff that stays linear when
    both snapshots are 100 TB."""
    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    old_snap = (docs.where(F.col("doc_id") % 2 == 0)
                .select(F.md5("text").alias("dg")).distinct())
    new_snap = (docs.where(F.col("doc_id") % 3 != 0)
                .select(F.md5("text").alias("n_dg")).distinct())
    joined = old_snap.join(new_snap, old_snap.dg == new_snap.n_dg,
                           "full_outer")
    status = (F.when(F.col("dg").isNull(), "added")
              .when(F.col("n_dg").isNull(), "removed")
              .otherwise("kept"))
    return (joined.groupBy(status.alias("status"))
            .agg(F.count("*").alias("n_digests")))


@register(
    "doc_novelty_scores",
    oracle=f"""
    WITH {_AUG_SQL},
    shing AS ({_shingle_sql()}),
    df AS (SELECT sh, COUNT(*) AS df FROM shing GROUP BY sh),
    per_doc AS (
      SELECT s.doc_id,
             COUNT(*) AS n_shingles,
             SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS n_novel
      FROM shing s JOIN df d ON s.sh = d.sh
      GROUP BY s.doc_id
    )
    SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_novel AS BIGINT) AS n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / n_shingles, 6) AS novelty
    FROM per_doc
    """,
    tags=("dedup", "ngram", "curation"),
)
def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-token shingles that occur in NO other document (corpus df = 1) — the
    inverse signal of duplication, used to rank documents by how much new
    text they contribute to a training mix (near-dup clusters and
    boilerplate-heavy docs score ~0, unique prose scores ~1). Runs over the
    planted-dup corpus shared by the whole dedup family, so the 20 planted
    near-identical pairs are visible as novelty collapsing toward 0 on both
    members (asserted in tests/test_dedup.py).

    Scale: the shuffle moves (doc_id, shingle-hash) pairs — 8-byte xxhash64
    keys, never shingle text; document frequency comes from ONE window
    count over the exploded stream (same evaluate-the-explode-once shape
    ngram_jaccard_pairs measured 3x faster than the groupBy-join-back
    formulation), and the per-doc rollup is a map-side-combinable
    aggregate. A 64-bit hash collision can only merge two shingles' df
    counts (P ~ n_distinct^2 / 2^65 ~ 1e-8 at 10^6 shingles); the oracle
    counts exact strings, so the parity gate itself bounds the effect.
    """
    aug = _augmented(spark, sf_dir)
    ex = _shingles(aug).select("doc_id", F.xxhash64("sh").alias("shh"))
    dfw = ex.withColumn("df", F.count("*").over(Window.partitionBy("shh")))
    per = (dfw.groupBy("doc_id")
           .agg(F.count("*").cast("long").alias("n_shingles"),
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                 .cast("long").alias("n_novel")))
    return per.select(
        "doc_id", "n_shingles", "n_novel",
        F.round(F.col("n_novel").cast("double") / F.col("n_shingles"), 6)
         .alias("novelty"))
