"""Golden semantics tests for the M1 masking chain and text helpers
(regression anchors for the reference defects in SURVEY.md 2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fts_errors_clustering_spark.functions.text import (fuzz_ratio,
                                                        mask_error_text,
                                                        whitespace_tokens)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_mask_uuid_before_uid(spark):
    """2.9.4 fixed: hyphenated UUIDs become one UUID token, not UID-UID-..."""
    s = "xfer 123e4567-e89b-42d3-a456-426614174000 failed"
    out = _one(spark, mask_error_text(F.lit(s)))
    assert out == "xfer UUID failed"


def test_mask_uid_runs(spark):
    s = "SOURCE [70] globus_xio: token abcdef123456789012 refused"
    out = _one(spark, mask_error_text(F.lit(s)))
    assert out == "SOURCE [70] globus_xio: token UID refused"


def test_mask_line_number_and_whitespace(spark):
    s = "syntax error at line:  42  \t near token"
    out = _one(spark, mask_error_text(F.lit(s)))
    assert out == "syntax error at line LINE_NUMBER near token"


def test_mask_short_hex_untouched(spark):
    # 11 chars: below the 12-char UID threshold
    s = "code abcdef12345 ok"
    assert _one(spark, mask_error_text(F.lit(s))) == s


def test_whitespace_tokens_drop_empties(spark):
    out = _one(spark, whitespace_tokens(F.lit("  A  b\tC ")))
    assert out == ["a", "b", "c"]


def test_whitespace_tokens_empty_string(spark):
    assert _one(spark, whitespace_tokens(F.lit("   "))) == []


def test_fuzz_ratio_bounds(spark):
    assert _one(spark, fuzz_ratio(F.lit("abc"), F.lit("abc"))) == 100.0
    assert _one(spark, fuzz_ratio(F.lit("abc"), F.lit("xyz"))) == 0.0
    mid = _one(spark, fuzz_ratio(F.lit("kitten"), F.lit("sitting")))
    assert 0.0 < mid < 100.0


def test_treebank_tokenizer_rules():
    import pandas as pd

    from fts_errors_clustering_spark.operators.textprep import \
        treebank_tokenize_series
    toks = treebank_tokenize_series(pd.Series(["Can't open file, retry."]))[0]
    assert "n't" in toks and "," in toks and "." in toks
    assert "Ca" in toks


#: Golden fixtures: reference-style FTS error strings -> the token lists
#: nltk's TreebankWordTokenizer produces (derived by hand from nltk's
#: published rule set, which _TREEBANK_PRE_PAD/_TREEBANK_POST_PAD mirror
#: rule-for-rule in nltk's order; the reference applies nltk at
#: ``word2vec_dbscan_approach.ipynb:105-116``).
_TREEBANK_GOLDEN = [
    ("Transfer failed: No such file or directory.",
     ["Transfer", "failed", ":", "No", "such", "file", "or", "directory",
      "."]),
    ("Can't open file (permission denied)!",
     ["Ca", "n't", "open", "file", "(", "permission", "denied", ")", "!"]),
    ('"Permission denied" while writing to /var/log/app.log',
     ["``", "Permission", "denied", "''", "while", "writing", "to",
      "/var/log/app.log"]),
    ("Server doesn't respond; retrying in 5s...",
     ["Server", "does", "n't", "respond", ";", "retrying", "in", "5s",
      "..."]),
    ("checksum mismatch, expected 0xAB got 0xCD",
     ["checksum", "mismatch", ",", "expected", "0xAB", "got", "0xCD"]),
    ("Error at line 42:",
     ["Error", "at", "line", "42", ":"]),
    ("cannot stat '/tmp/x.y': No such file",
     ["can", "not", "stat", "'/tmp/x.y", "'", ":", "No", "such", "file"]),
    # end-of-string contraction: only splits because the pad precedes the
    # contraction rules (nltk's mid-sequence padding point)
    ("disk quota exceeded: user can't",
     ["disk", "quota", "exceeded", ":", "user", "ca", "n't"]),
]


def test_treebank_golden_error_strings():
    import pandas as pd

    from fts_errors_clustering_spark.operators.textprep import \
        treebank_tokenize_series
    got = treebank_tokenize_series(pd.Series([s for s, _ in _TREEBANK_GOLDEN]))
    for (src, want), toks in zip(_TREEBANK_GOLDEN, got):
        assert toks == want, (src, toks, want)


def test_fuzz_ratio_exact_golden(spark):
    """fuzz_ratio_exact must reproduce fuzzywuzzy==0.17.0's fuzz.ratio
    bit-for-bit. With no python-Levenshtein in the reference's pins
    (requirements.txt:9), 0.17.0 is difflib.SequenceMatcher + int(round());
    the first two expectations are fuzzywuzzy's OWN documented outputs."""
    from fts_errors_clustering_spark.functions.text import fuzz_ratio_exact
    cases = [
        ("this is a test", "this is a test!", 97),
        ("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear", 91),
        ("new york mets", "new YORK mets", 69),
        ("", "", 100),
        ("abc", "", 0),
        ("error at line 42: UID timeout", "error at line 42: UID refused", 83),
    ]
    df = spark.createDataFrame([(a, b) for a, b, _ in cases], "a string, b string")
    got = {(r.a, r.b): r.r for r in
           df.select("a", "b", fuzz_ratio_exact("a", "b").alias("r")).collect()}
    for a, b, want in cases:
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)


def test_cluster_stats_exact_ratio_path(spark):
    """The exact-ratio opt-in must return the same grouping shape and agree
    with the default path on groups where the two scores coincide by
    construction (each group's first member scores 100 either way)."""
    from fts_errors_clustering_spark.operators.textprep import \
        cluster_stats_by_source
    from .conftest import SF_SMALL
    exact = {r.source: r for r in
             cluster_stats_by_source(spark, SF_SMALL, exact_ratio=True).collect()}
    dflt = {r.source: r for r in
            cluster_stats_by_source(spark, SF_SMALL).collect()}
    assert set(exact) == set(dflt)
    for s, r in exact.items():
        assert r.n_docs == dflt[s].n_docs
        assert 0.0 <= r.mean_similarity <= 100.0
