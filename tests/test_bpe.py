"""BPE trainer: golden agreement with a pure-Python reference
implementation (the Sennrich et al. 2016 dictionary algorithm), plus the
greedy-merge-application equivalence the string-replace encoding relies on.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from fts_errors_clustering_spark.operators.bpe import (
    _word_freqs,
    train_bpe,
)
from fts_errors_clustering_spark.sources.readers import table

from .conftest import SF_SMALL


def _python_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference trainer: symbol sequences as tuples, pair counts as a
    Counter, greedy left-to-right merge application."""
    seqs = {w: tuple(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, freq in word_freqs.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += freq
        if not counts:
            break
        # max by (count, then LOWEST (l, r)) — same tie-break as the engine
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


def test_merge_table_matches_python_reference(spark):
    words = _word_freqs(spark, SF_SMALL)
    wf = {r.word: r.freq for r in words.collect()}
    expect_merges, expect_seqs = _python_bpe(wf, 6)

    w, merges = train_bpe(words, n_merges=6)
    assert merges == expect_merges

    # and the final symbol sequences agree word-for-word (the string-replace
    # greedy application == the explicit left-to-right loop). Every symbol
    # carries its OWN delimiters: ' s1  s2  ... sN '.
    got = {r.seq: r.freq for r in w.collect()}
    rebuilt = {" " + "  ".join(s) + " ": wf[wo]
               for wo, s in expect_seqs.items()}
    # seq strings can collide across words only if sequences are identical,
    # in which case freq keys collide identically on both sides
    assert set(got) == set(rebuilt)


def test_greedy_replace_overlap_semantics(spark):
    """With per-symbol delimiters, one non-overlapping left-to-right replace
    IS canonical greedy merge application (the i+=2 loop): consecutive
    occurrences never share a delimiter, so ' a  a  a ' -> ' aa  a ',
    ' a  a  a  a ' -> ' aa  aa ', and banana's ' b  a  n  a  n  a ' with
    merge (a, n) -> ' b  an  an  a '. (A single-space encoding consumes the
    shared delimiter and under-merges: ' a a a a ' fixpoints at 3 tokens.)
    The property the whole seq-as-string encoding rests on."""
    df = spark.createDataFrame(
        [(" a  a  a ", " a  a ", " aa "),
         (" b  a  a ", " a  a ", " aa "),
         (" a  a  a  a ", " a  a ", " aa "),
         (" b  a  n  a  n  a ", " a  n ", " an ")],
        "seq string, pat string, rep string")
    out = [r.r for r in df.select(
        F.replace("seq", F.col("pat"), F.col("rep")).alias("r")).collect()]
    assert out == [" aa  a ", " b  aa ", " aa  aa ", " b  an  an  a "]


def test_merge_table_on_consecutive_pair_corpus(spark):
    """Adversarial corpus where the learned merges DO hit consecutive
    occurrences of a pair within one word ('banana', 'aaaaaa'): the trainer
    must still agree with the canonical Python i+=2 reference — the exact
    case the shared-delimiter encoding got wrong."""
    import pandas as pd

    wf = {"banana": 4, "bananas": 2, "aaaaaa": 3, "na": 5, "an": 1}
    words = spark.createDataFrame(
        pd.DataFrame({"word": list(wf), "freq": list(wf.values())}))
    expect_merges, expect_seqs = _python_bpe(wf, 6)
    w, merges = train_bpe(words, n_merges=6)
    assert merges == expect_merges
    got = {r.word: r.seq for r in w.collect()}
    assert got == {wo: " " + "  ".join(s) + " "
                   for wo, s in expect_seqs.items()}


def test_vocab_tokens_cover_merged_symbols(spark):
    from fts_errors_clustering_spark.plans.registry import all_queries
    qd = all_queries()["bpe_vocab_tokens"]
    rows = qd.fn(spark, SF_SMALL).collect()
    assert len(rows) > 0
    toks = [r.tok for r in rows]
    docs_chars = set("".join(
        r.word for r in _word_freqs(spark, SF_SMALL).collect()))
    # every vocab symbol is built from corpus characters
    assert all(set(t) <= docs_chars for t in toks)


def test_trainer_stops_early_on_degenerate_corpus(spark):
    """All-single-char corpus: zero merges possible. The trainer must stop
    (empty merge table) and keep the word table intact — and the unrolled
    oracle must agree (its merge CTEs go empty without zeroing w_i; the
    LEFT-JOIN-ON-TRUE totality fix)."""
    import pandas as pd

    from fts_errors_clustering_spark.operators.bpe import train_bpe

    words = spark.createDataFrame(
        pd.DataFrame({"word": list("abcd"), "freq": [2, 2, 1, 1]}))
    w, merges = train_bpe(words, n_merges=6)
    assert merges == []
    seqs = sorted(r.seq for r in w.collect())
    assert seqs == [" a ", " b ", " c ", " d "]
