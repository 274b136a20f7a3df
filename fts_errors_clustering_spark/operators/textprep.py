"""Text preprocessing operators: the reference's string layer (SURVEY.md
sections 2.6, 2.7 M1-M5) over the ``documents`` corpus.

Reference chain being rebuilt: ``clear_strings`` regex masking
(``/root/reference/notebooks/word2vec_dbscan_approach.ipynb:86-103``) ->
tokenization (whitespace ``TF-IDF_K-Means_approach.ipynb:319``; Treebank
``word2vec_dbscan_approach.ipynb:105-116``) -> vocabulary union
(``TF-IDF_K-Means_approach.ipynb:1196-1200``) -> per-cluster text stats with
fuzzy similarity (``word2vec_dbscan_approach.ipynb:30189-30220``).

Everything except the Treebank approximation is pure Column algebra
(regexp_replace / split / explode / window + levenshtein) — JVM-side and
SQL-oracle-checkable. Empty texts are filtered at tokenization (upstream,
once), fixing the reference's late positional filtering (SURVEY.md 2.9.2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import sql_dec_avg, sql_dec_std
from ..functions.text import (fuzz_ratio, mask_error_text, sql_fuzz_ratio,
                              sql_mask_error_text, sql_whitespace_tokens,
                              whitespace_tokens)
from ..plans.registry import register
from ..sources.readers import table


def _dec_avg_d(col, scale=10):
    """Exact mean of a derived double column (cast to decimal first)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(27,{scale})")).cast("string").cast("double")
            / F.count(c))


def _dec_std_d(col, scale=6):
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s = F.sum(c.cast(f"decimal(27,{scale})")).cast("string").cast("double")
    ssq = (F.sum((c.cast(f"decimal(18,{scale})") * c.cast(f"decimal(18,{scale})"))
                 .cast(f"decimal(33,{2 * scale})")).cast("string").cast("double"))
    return F.sqrt((ssq - s * s / n) / (n - F.lit(1.0)))


def _sql_dec_avg_d(expr, scale=10):
    return (f"(CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS VARCHAR) AS DOUBLE)"
            f" / COUNT({expr}))")


def _sql_dec_std_d(expr, scale=6):
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    s = f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS VARCHAR) AS DOUBLE)"
    ssq = (f"CAST(CAST(SUM(CAST(CAST({expr} AS DECIMAL(18,{scale})) * "
           f"CAST({expr} AS DECIMAL(18,{scale})) AS DECIMAL(33,{2 * scale}))) "
           f"AS VARCHAR) AS DOUBLE)")
    return f"SQRT((({ssq}) - ({s}) * ({s}) / ({n})) / (({n}) - 1.0))"


# --- M1: regex masking chain ------------------------------------------------

@register(
    "mask_documents",
    oracle=f"""
    SELECT doc_id, {sql_mask_error_text('text')} AS masked
    FROM documents
    """,
    tags=("text",),
)
def mask_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 ``clear_strings`` + whitespace collapse as a pure column transform
    (no in-place mutation — fixes the 2826->2926 row-drift defect class,
    SURVEY.md 2.9.1). Rule order pinned: line-number, UUID, then UID
    (the reference's UID-first ordering shadowed its UUID rule, 2.9.4)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", mask_error_text("text").alias("masked"))


# --- M2: tokenize + explode -------------------------------------------------

@register(
    "document_tokens",
    oracle=f"""
    SELECT doc_id, unnest({sql_whitespace_tokens('text')}) AS token
    FROM documents
    WHERE length(trim(text)) > 0
    """,
    tags=("text",),
)
def document_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 ``x.lower().split()`` exploded to one row per (doc, token).
    Blank docs are dropped HERE, once, upstream of every consumer — the
    P6 empty-text filter done early (SURVEY.md 2.9.2)."""
    docs = table(spark, sf_dir, "documents")
    return (docs.where(F.length(F.trim("text")) > 0)
                .select("doc_id",
                        F.explode(whitespace_tokens("text")).alias("token")))


# --- M5: vocabulary ---------------------------------------------------------

@register(
    "vocabulary_size",
    oracle=f"""
    WITH toks AS (SELECT unnest({sql_whitespace_tokens('text')}) AS token
                  FROM documents WHERE length(trim(text)) > 0)
    SELECT COUNT(DISTINCT token) AS n_terms FROM toks
    """,
    tags=("text",),
)
def vocabulary_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 vocabulary build (set-union over token lists,
    ``TF-IDF_K-Means_approach.ipynb:1196-1200``) as explode+distinct —
    a shuffle-light countDistinct instead of a driver-side set union."""
    return (document_tokens(spark, sf_dir)
            .agg(F.countDistinct("token").alias("n_terms")))


@register(
    "vocabulary_set_ops",
    oracle=f"""
    WITH en AS (SELECT DISTINCT unnest({sql_whitespace_tokens('text')}) AS token
                FROM documents WHERE lang = 'en' AND length(trim(text)) > 0),
    fr AS (SELECT DISTINCT unnest({sql_whitespace_tokens('text')}) AS token
           FROM documents WHERE lang = 'fr' AND length(trim(text)) > 0)
    SELECT (SELECT COUNT(*) FROM (SELECT token FROM en UNION SELECT token FROM fr)) AS n_union,
           (SELECT COUNT(*) FROM (SELECT token FROM en INTERSECT SELECT token FROM fr)) AS n_intersect,
           (SELECT COUNT(*) FROM (SELECT token FROM en EXCEPT SELECT token FROM fr)) AS n_except
    """,
    tags=("text", "setops"),
)
def vocabulary_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation layer (SURVEY.md 2.6: the reference only ever unions
    vocabularies; UNION/INTERSECT/EXCEPT are completed here as DataFrame
    ``union``/``intersect``/``exceptAll`` + distinct)."""
    toks = document_tokens(spark, sf_dir)
    # pre-filter to the two langs of interest BEFORE the join so a broadcast
    # is proportional to the en/fr slice, and let AQE pick the strategy
    # (a blanket broadcast of every (doc_id, lang) would OOM at 1e9 docs)
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("lang").isin("en", "fr"))
            .select("doc_id", "lang"))
    langed = toks.join(docs, "doc_id")
    en = langed.where(F.col("lang") == "en").select("token").distinct()
    fr = langed.where(F.col("lang") == "fr").select("token").distinct()
    u = en.union(fr).distinct().agg(F.count("*").alias("n_union"))
    i = en.intersect(fr).agg(F.count("*").alias("n_intersect"))
    x = en.exceptAll(fr).agg(F.count("*").alias("n_except"))
    return u.crossJoin(F.broadcast(i)).crossJoin(F.broadcast(x))


# --- token stats per document ----------------------------------------------

@register(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({sql_whitespace_tokens('text')}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_computed
    FROM documents
    """,
    tags=("text",),
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char counts (the ``len(msg)`` features of A10,
    ``word2vec_dbscan_approach.ipynb:30196-30200``)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(whitespace_tokens("text")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"))


# --- A10 length stats per group --------------------------------------------

@register(
    "length_stats_by_source",
    oracle=f"""
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           {sql_dec_avg('n_chars', 0)} AS mean_len,
           {sql_dec_std('n_chars', 0)} AS std_len
    FROM documents GROUP BY source
    """,
    tags=("text",),
)
def length_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 per-group mean/std message length
    (``word2vec_dbscan_approach.ipynb:30196-30200``), grouped by ``source``
    (the fixture's site analog)."""
    from ..functions.numeric import dec_avg, dec_std
    docs = table(spark, sf_dir, "documents")
    return (docs.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 dec_avg("n_chars", 0).alias("mean_len"),
                 dec_std("n_chars", 0).alias("std_len")))


# --- A10/M20: full cluster-stats table -------------------------------------

@register(
    "cluster_stats_by_source",
    oracle=f"""
    WITH firsted AS (
      SELECT source, doc_id, text,
             first_value(text) OVER (PARTITION BY source ORDER BY doc_id) AS first_text
      FROM documents
    ), sims AS (
      SELECT source, first_text, {sql_fuzz_ratio('text', 'first_text')} AS sim
      FROM firsted
    )
    SELECT source, COUNT(*) AS n_docs,
           MIN(first_text) AS first_text,
           {_sql_dec_avg_d('sim')} AS mean_similarity,
           {_sql_dec_std_d('sim')} AS std_similarity
    FROM sims GROUP BY source
    """,
    tags=("text", "window"),
)
def cluster_stats_by_source(spark: SparkSession, sf_dir: str,
                            exact_ratio: bool = False) -> DataFrame:
    """M20/A10 ``cluster_stats``
    (``word2vec_dbscan_approach.ipynb:30189-30220``): one row per group with
    size, first entry, and mean/std fuzzy similarity of members to that first
    entry. The reference loops per cluster in Python; here the group-first is
    a window ``first_value`` and similarity is ``levenshtein``-based column
    algebra (fuzz.ratio delta documented in functions/text.py). Pass
    ``exact_ratio=True`` for bit-exact fuzzywuzzy-0.17 scores via the
    SequenceMatcher pandas UDF (``functions.text.fuzz_ratio_exact``) — the
    reference-parity slow path; the default stays JVM-side and
    oracle-checked."""
    from ..functions.text import fuzz_ratio_exact
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    firsted = docs.withColumn("first_text", F.first("text").over(w))
    ratio = fuzz_ratio_exact if exact_ratio else fuzz_ratio
    sims = firsted.withColumn(
        "sim", ratio("text", "first_text").cast("double"))
    return (sims.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.min("first_text").alias("first_text"),
                 _dec_avg_d("sim").alias("mean_similarity"),
                 _dec_std_d("sim").alias("std_similarity")))


@register("cluster_stats_by_source_exact", oracle=None,
          tags=("text", "window", "udf"),
          local_oracle=f"""
    WITH firsted AS (
      SELECT source, doc_id, text,
             first_value(text) OVER (PARTITION BY source ORDER BY doc_id) AS first_text
      FROM documents
    ), sims AS (
      SELECT source, first_text,
             CAST(seqratio(text, first_text) AS DOUBLE) AS sim
      FROM firsted
    )
    SELECT source, COUNT(*) AS n_docs,
           MIN(first_text) AS first_text,
           {_sql_dec_avg_d('sim')} AS mean_similarity,
           {_sql_dec_std_d('sim')} AS std_similarity
    FROM sims GROUP BY source
    """)
def cluster_stats_by_source_exact(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """``cluster_stats_by_source`` with the bit-exact fuzzywuzzy-0.17
    ``fuzz.ratio`` scorer (SequenceMatcher pandas UDF,
    ``functions.text.fuzz_ratio_exact``) — the reference-parity slow path
    registered as its own plan so SequenceMatcher parity is exercised in a
    REGISTERED query, not only in tests/test_text.py. Rows-only in the
    DRIVER (its oracle harness runs plain SQL strings), but fully
    oracle-checked in the LOCAL parity sweep: conftest registers the SAME
    stdlib ``difflib.SequenceMatcher`` ratio as the DuckDB Python UDF
    ``seqratio`` and this query carries a ``local_oracle`` stated against
    it — both engines then run the identical algorithm on identical
    pairs, so the value-hash comparison is exact, junk heuristics and
    all."""
    return cluster_stats_by_source(spark, sf_dir, exact_ratio=True)


# --- A11/M19: group membership materialization ------------------------------

@register(
    "group_members_by_lang",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS member_ids
    FROM documents GROUP BY lang
    """,
    tags=("text",),
)
def group_members_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11/M19 ``print_clusters`` membership listing
    (``word2vec_dbscan_approach.ipynb:30148-30156``) as
    ``collect_list`` + deterministic sort — alignment by key, never
    positional (fixes the 2.9 positional-zip class)."""
    docs = table(spark, sf_dir, "documents")
    return (docs.groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.concat_ws(",", F.transform(
                     F.sort_array(F.collect_list("doc_id")),
                     lambda x: x.cast("string"))).alias("member_ids")))


# --- M3: Treebank-style tokenizer (the one justified pandas UDF) ------------

#: Treebank rules, a vectorized re-implementation of the NLTK
#: TreebankWordTokenizer (nltk itself is not available in this environment).
#: Rule CONTENT and ORDER mirror nltk's STARTING_QUOTES -> PUNCTUATION ->
#: PARENS_BRACKETS -> DOUBLE_DASHES, then the " " padding nltk inserts
#: MID-SEQUENCE, then ENDING_QUOTES -> CONTRACTIONS2/3 — the padding point
#: matters: contractions at end-of-string ("... can't") only split if the
#: pad precedes the contraction rules, exactly as in nltk. Token-level
#: agreement on reference-style error strings is pinned by the golden
#: fixtures in tests/test_text.py.
_TREEBANK_PRE_PAD = [
    (r"^\"", r"`` "), (r"(``)", r" \1 "), (r"([ (\[{<])(\"|'{2})", r"\1 `` "),
    (r"([:,])([^\d])", r" \1 \2"), (r"([:,])$", r" \1 "),
    (r"\.\.\.", r" ... "),
    (r"[;@#$%&]", r" \g<0> "),
    (r'([^\.])(\.)([\]\)}>"\']*)\s*$', r"\1 \2\3 "),
    (r"[?!]", r" \g<0> "), (r"([^'])' ", r"\1 ' "),
    (r"[\]\[\(\)\{\}<>]", r" \g<0> "), (r"--", r" -- "),
]
_TREEBANK_POST_PAD = [
    (r'"', r" '' "), (r"(\S)('')", r"\1 \2 "),
    (r"([^' ])('[sS]|'[mM]|'[dD]|') ", r"\1 \2 "),
    (r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ", r"\1 \2 "),
    # nltk CONTRACTIONS2/3
    (r"(?i)\b(can)(not)\b", r" \1 \2 "), (r"(?i)\b(d)('ye)\b", r" \1 \2 "),
    (r"(?i)\b(gim)(me)\b", r" \1 \2 "), (r"(?i)\b(gon)(na)\b", r" \1 \2 "),
    (r"(?i)\b(got)(ta)\b", r" \1 \2 "), (r"(?i)\b(lem)(me)\b", r" \1 \2 "),
    (r"(?i)\b(mor)('n)\b", r" \1 \2 "), (r"(?i)\b(wan)(na)\s", r" \1 \2 "),
    (r"(?i) ('t)(is)\b", r" \1 \2 "), (r"(?i) ('t)(was)\b", r" \1 \2 "),
]


def treebank_tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized Treebank tokenization over a pandas Series."""
    out = s.fillna("")
    for pat, rep in _TREEBANK_PRE_PAD:
        out = out.str.replace(pat, rep, regex=True)
    out = " " + out + " "
    for pat, rep in _TREEBANK_POST_PAD:
        out = out.str.replace(pat, rep, regex=True)
    return out.str.split()


def _sql_treebank_tokens() -> str:
    """The Treebank rule chain replayed in DuckDB, generated from the SAME
    ``_TREEBANK_PRE_PAD``/``_TREEBANK_POST_PAD`` lists (one source of
    truth): each rule is one RE2 ``regexp_replace(..., 'g')`` — the rules
    use no lookarounds, and Python-re vs RE2 agree on everything they DO
    use (``\\b``, inline ``(?i)``, backrefs; ``\\g<0>`` maps to ``\\0``).
    Verified token-for-token on the golden fixtures incl. quote /
    contraction / bracket cases (tests/test_text.py)."""
    def q(s: str) -> str:
        return s.replace("'", "''")

    e = "coalesce(text, '')"
    for pat, rep in _TREEBANK_PRE_PAD:
        rep = rep.replace("\\g<0>", "\\0")
        e = f"regexp_replace({e}, '{q(pat)}', '{q(rep)}', 'g')"
    e = f"' ' || {e} || ' '"
    for pat, rep in _TREEBANK_POST_PAD:
        rep = rep.replace("\\g<0>", "\\0")
        e = f"regexp_replace({e}, '{q(pat)}', '{q(rep)}', 'g')"
    return f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex({e}, '\\s+'),
                                t -> length(t) > 0)) AS BIGINT) AS n_tokens
    FROM documents WHERE length(trim(text)) > 0
    """


@register("treebank_tokens", oracle=_sql_treebank_tokens(),
          tags=("text", "udf"))
def treebank_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 Treebank tokenizer (``word2vec_dbscan_approach.ipynb:105-116``) as
    the engine's ONE intentional tokenizer UDF: an Arrow-batched pandas UDF
    (SURVEY.md 2.8 — everything else stays in built-in functions). The
    oracle replays the identical rule chain as RE2 ``regexp_replace``
    steps (``_sql_treebank_tokens``), so even the UDF path gets a
    cross-engine value-hash row."""
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def tb(s: pd.Series) -> pd.Series:
        return treebank_tokenize_series(s)

    docs = table(spark, sf_dir, "documents")
    return (docs.where(F.length(F.trim("text")) > 0)
                .select("doc_id", tb(F.col("text")).alias("tokens"))
                .select("doc_id",
                        F.size("tokens").cast("long").alias("n_tokens")))
