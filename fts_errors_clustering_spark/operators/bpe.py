"""Byte-pair-encoding tokenizer TRAINING as a distributed operator.

The reference stops at whitespace / Treebank tokenization
(``/root/reference/notebooks/TF-IDF_K-Means_approach.ipynb:319``,
``word2vec_dbscan_approach.ipynb:105-116``); a training-data engine also
needs the tokenizer *trainer* itself — BPE merge learning (Sennrich et al.
2016) is the canonical one. The classic trick makes it Spark-shaped: BPE
never trains on the corpus, it trains on the WORD-FREQUENCY table, which
is vocabulary-sized (~10⁶-10⁸ rows at web scale — one groupBy away from
100 TB of text, and every later pass touches only that table).

Spark-first design:
- each word's symbol sequence is ONE string column where EVERY symbol
  carries its OWN pair of space delimiters (``' l '+' r ' = ' l  r '`` —
  symbols are whitespace-split so they can never contain a space);
  applying merge (l, r) is a single JVM-side ``replace(seq, ' l  r ',
  ' lr ')``. Because adjacent symbols never SHARE a delimiter, one
  left-to-right non-overlapping replace (the scan both Spark and DuckDB
  implement) is EXACTLY canonical greedy BPE application — the i+=2 loop
  of Sennrich et al.: ``' a  a  a  a '`` -> ``' aa  aa '`` and banana's
  ``' b  a  n  a  n  a '`` -> ``' b  an  an  a '``. (The earlier
  single-space encoding ``' l r '`` consumed the delimiter shared with
  the next occurrence and under-merged consecutive pairs.) No Python UDF
  anywhere in the loop.
- per-iteration pair counts: split + adjacent-zip + explode + one
  map-side-combined groupBy over the vocab table; the argmax merge is a
  1-row collect (the merge table is a driver-sized artifact by
  definition). ``localCheckpoint`` truncates the replace-chain lineage
  each round — the dbscan.py/graph.py iterative discipline.
- the DuckDB oracle unrolls the SAME fixed number of merge rounds as CTEs
  (the part_copurchase_pagerank technique), so even the trainer loop gets
  a full value-hash correctness row. Ties break by (count DESC, left ASC,
  right ASC) in both engines — binary string order, engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import sql_whitespace_tokens, whitespace_tokens
from ..plans.registry import register, unpersist_any
from ..sources.readers import table

N_MERGES = 6
TOP_VOCAB = 20

#: adjacent symbol pairs of the current sequences, as (l, r) structs
_PAIRS_EXPR = (
    "transform(slice(syms, 1, size(syms) - 1), "
    "(x, i) -> struct(x AS l, syms[i + 1] AS r))"
)


def _word_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (docs.select(F.explode(whitespace_tokens("text")).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq")))


def _trained(spark: SparkSession, sf_dir: str):
    """All three registered queries consume the same trained state; the
    session model registry (operators/model_cache.py — OFF by default,
    bench-enabled) shares one training run, as a model store would."""
    from .model_cache import memo
    return memo(("bpe", sf_dir, N_MERGES),
                lambda: train_bpe(_word_freqs(spark, sf_dir)))


def _char_seq() -> "F.Column":
    """The round-0 symbol sequence: ' c  h  a  r ' with sentinel pads."""
    return F.concat(
        F.lit(" "),
        F.array_join(F.expr("regexp_extract_all(word, '.', 0)"), "  "),
        F.lit(" "))


def train_bpe(words: DataFrame, n_merges: int = N_MERGES):
    """Learn ``n_merges`` BPE merges over a (word, freq) table. Returns
    (final_words_df with ``seq`` column, merge list of
    (rank, left, right, pair_count)).

    Cache lifecycle: each training round checkpoints its rewritten state
    and RELEASES the previous round's checkpoint once the new one is
    materialized (the k-core pattern — at most one round pinned). The
    RETURNED state is not a checkpoint at all: the learned merges replay
    as a lineage-complete chain of string replaces over the raw char
    split (byte-identical to the loop's final state by construction), so
    consumers hold a replayable plan and nothing stays pinned in the
    session — the property the registry-wide persistent-RDD gate checks,
    and what lets the model-cache memo hand the state to later queries
    without keeping storage alive."""
    w = words.select("word", _char_seq().alias("seq"),
                     "freq").localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        syms = F.filter(F.split("seq", " "), lambda t: F.length(t) > 0)
        top = (w.withColumn("syms", syms)
               .select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
               .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
               .agg(F.sum("freq").alias("cnt"))
               .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
               .limit(1).collect())
        if not top:
            break
        l, r, cnt = top[0].l, top[0].r, top[0].cnt
        merges.append((i + 1, l, r, int(cnt)))
        prev = w
        w = (w.withColumn("seq", F.replace(
                 "seq", F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")))
             .localCheckpoint())  # eager: safe to drop the previous round
        unpersist_any(prev)
    unpersist_any(w)
    seq = _char_seq()
    for _, l, r, _ in merges:
        seq = F.replace(seq, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    final = words.select("word", seq.alias("seq"), "freq")
    return final, merges


def _bpe_oracle_ctes(n_merges: int) -> str:
    """The shared CTE scaffold: base word freqs, then n unrolled
    (pairs -> argmax merge -> replace) rounds. ``w{i}`` is the word table
    after i merges, ``m{i}`` the i-th merge row."""
    toks = sql_whitespace_tokens("text")
    parts = [f"""
    base AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({toks}) AS word FROM documents)
      GROUP BY word
    ),
    w0 AS (
      SELECT word,
             ' ' || array_to_string(regexp_extract_all(word, '.'), '  ')
             || ' ' AS seq, freq
      FROM base
    )"""]
    for i in range(1, n_merges + 1):
        parts.append(f"""
    p{i} AS (
      SELECT p[1] AS l, p[2] AS r, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, unnest(list_zip(syms, syms[2:])) AS p
            FROM (SELECT freq,
                         list_filter(string_split(seq, ' '),
                                     x -> length(x) > 0) AS syms
                  FROM w{i - 1}))
      WHERE p[2] IS NOT NULL
      GROUP BY 1, 2
    ),
    m{i} AS (SELECT l, r, cnt FROM p{i}
             ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
    w{i} AS (
      -- LEFT JOIN ON TRUE + COALESCE keeps the CTE total when fewer than
      -- n merges exist (empty m{{i}}): a CROSS JOIN would zero the word
      -- table while the engine's loop correctly stops and keeps it
      SELECT word,
             COALESCE(replace(seq, ' ' || m.l || '  ' || m.r || ' ',
                              ' ' || m.l || m.r || ' '), seq) AS seq, freq
      FROM w{i - 1} LEFT JOIN m{i} m ON TRUE
    )""")
    return ",".join(parts)


def _merge_table_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS rank, l AS lft, r AS rgt, "
        f"cnt AS pair_count FROM m{i}"
        for i in range(1, N_MERGES + 1))
    return f"WITH {_bpe_oracle_ctes(N_MERGES)} {rows}"


def _vocab_oracle() -> str:
    return f"""
    WITH {_bpe_oracle_ctes(N_MERGES)}
    SELECT tok, CAST(SUM(freq) AS BIGINT) AS n
    FROM (SELECT freq, unnest(list_filter(string_split(seq, ' '),
                                          x -> length(x) > 0)) AS tok
          FROM w{N_MERGES})
    GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT {TOP_VOCAB}
    """


@register("bpe_merge_table", oracle=_merge_table_oracle(),
          tags=("bpe", "tokenizer", "textprep"))
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: {N_MERGES} rounds of (argmax adjacent pair
    -> greedy merge) over the documents word-frequency table. Oracle
    unrolls the identical rounds as CTEs — a value-hash check on the full
    trainer loop."""
    _, merges = _trained(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank long, lft string, rgt string, pair_count long")


def _tokens_per_lang_oracle() -> str:
    toks = sql_whitespace_tokens("text")
    return f"""
    WITH {_bpe_oracle_ctes(N_MERGES)},
    wsym AS (
      SELECT word, CAST(len(list_filter(string_split(seq, ' '),
                                        x -> length(x) > 0)) AS BIGINT)
             AS n_syms
      FROM w{N_MERGES}
    ),
    doctoks AS (
      SELECT lang, unnest({toks}) AS word FROM documents
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w.n_syms) AS BIGINT) AS n_bpe_tokens
    FROM doctoks d JOIN wsym w USING (word)
    GROUP BY d.lang
    """


@register("bpe_tokens_per_lang", oracle=_tokens_per_lang_oracle(),
          tags=("bpe", "tokenizer", "selection"))
def bpe_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode side: per-language corpus token counts UNDER THE LEARNED
    tokenizer — the token-budget primitive a data mix is planned against.
    Encoding a corpus is a join against the (word -> n_syms) table — no
    broadcast hint: AQE picks broadcast while the vocab fits and falls
    back to a shuffle join when it doesn't (the round-1
    vocabulary_set_ops lesson: never hard-hint a table that grows with
    the corpus)."""
    w, _ = _trained(spark, sf_dir)
    syms = F.filter(F.split("seq", " "), lambda t: F.length(t) > 0)
    wsym = w.select("word", F.size(syms).cast("long").alias("n_syms"))
    docs = table(spark, sf_dir, "documents")
    doctoks = docs.select("lang", F.explode(whitespace_tokens("text"))
                          .alias("word"))
    return (doctoks.join(wsym, "word")
            .groupBy("lang")
            .agg(F.count("*").alias("n_words"),
                 F.sum("n_syms").alias("n_bpe_tokens")))


@register("bpe_vocab_tokens", oracle=_vocab_oracle(),
          tags=("bpe", "tokenizer", "textprep"))
def bpe_vocab_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_VOCAB} subword symbols (by corpus-weighted frequency) after
    the {N_MERGES}-merge BPE training pass — the vocab the tokenizer would
    ship."""
    w, _ = _trained(spark, sf_dir)
    syms = F.filter(F.split("seq", " "), lambda t: F.length(t) > 0)
    return (w.select("freq", F.explode(syms).alias("tok"))
            .groupBy("tok").agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), F.asc("tok")).limit(TOP_VOCAB))
