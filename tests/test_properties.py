"""Property-based tests (hypothesis) for the shared column functions —
the invariants the reference only eyeballed (SURVEY.md §5): masking is
idempotent and whitespace-stable, tokenization never emits empty tokens,
the hash family stays in range and agrees across its two derivations.

Each hypothesis example carries a LIST of strings through one Spark job
(batched round trip; per-example jobs would be pathologically slow), with
few examples and no deadline — Spark latency is seconds, not ms.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from fts_errors_clustering_spark.functions.text import (fuzz_ratio, hash32,
                                                        hash32_hi,
                                                        mask_error_text,
                                                        whitespace_tokens)

SET = settings(max_examples=8, deadline=None)

# printable-ish text incl. the masked alphabets (hex runs, uuids, digits)
TEXT = st.text(
    alphabet=st.sampled_from("abcdef0123456789-xyz _\t:.ATLINE"),
    max_size=80)
BATCH = st.lists(TEXT, min_size=1, max_size=40)


def _roundtrip(spark, strings, *cols):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    return df.select(*cols).collect()


@SET
@given(BATCH)
def test_mask_idempotent(spark, batch):
    rows = _roundtrip(
        spark, batch,
        mask_error_text("s").alias("once"))
    df2 = spark.createDataFrame([(r.once,) for r in rows], "s string")
    rows2 = df2.select(mask_error_text("s").alias("twice")).collect()
    assert [r.once for r in rows] == [r.twice for r in rows2]


@SET
@given(BATCH)
def test_mask_collapses_whitespace(spark, batch):
    rows = _roundtrip(spark, batch, mask_error_text("s").alias("m"))
    for r in rows:
        assert "  " not in r.m and "\t" not in r.m
        assert r.m == r.m.strip()


@SET
@given(BATCH)
def test_tokens_nonempty_lowercase(spark, batch):
    rows = _roundtrip(spark, batch, whitespace_tokens("s").alias("t"))
    for r in rows:
        for tok in r.t:
            assert tok != "" and tok == tok.lower()


@SET
@given(BATCH)
def test_hash32_range_and_independence(spark, batch):
    rows = _roundtrip(spark, batch,
                      hash32("s").alias("h1"), hash32_hi("s").alias("h2"))
    for r in rows:
        assert 0 <= r.h1 < 2 ** 32 and 0 <= r.h2 < 2 ** 32
        # double-hashing family stays in 32-bit range for every seed
        for s in range(16):
            assert 0 <= (r.h1 + s * r.h2) % 4294967296 < 2 ** 32


@SET
@given(BATCH)
def test_fuzz_ratio_bounds_and_identity(spark, batch):
    df = spark.createDataFrame([(s, s[::-1]) for s in batch],
                               "a string, b string")
    rows = df.select(fuzz_ratio("a", "b").alias("ab"),
                     fuzz_ratio("a", "a").alias("aa")).collect()
    for r in rows:
        assert 0.0 <= r.ab <= 100.0
        assert r.aa == 100.0


def test_stratified_sample_balances(spark):
    """sampleBy with per-class fractions must land every class within
    binomial noise of the minority-class target (class-balancing
    contract of stratified_doc_sample)."""
    from fts_errors_clustering_spark.operators.textstats import \
        stratified_doc_sample

    rows = stratified_doc_sample(spark, "/root/testdata/sf0.01").collect()
    target = min(r.n_total for r in rows)
    for r in rows:
        # expected ~target; allow 5 sigma of Binomial(n_total, target/n_total)
        sigma = (target * (1 - target / r.n_total)) ** 0.5
        assert abs(r.n_sampled - target) <= max(5 * sigma, 10), r
