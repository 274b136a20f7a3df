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

from .conftest import SF_SMALL

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


def test_bigram_logprob_invariants(spark):
    """Add-one-smoothed bigram log-probs are strictly negative (every
    probability < 1 once V >= 2), finite, and cover exactly the docs with
    >= 2 tokens."""
    import math

    from pyspark.sql import functions as F

    from fts_errors_clustering_spark.functions.text import whitespace_tokens
    from fts_errors_clustering_spark.plans.registry import all_queries
    from fts_errors_clustering_spark.sources.readers import table

    rows = all_queries()["bigram_logprob_scores"].fn(spark, SF_SMALL).collect()
    docs = table(spark, SF_SMALL, "documents")
    expected = (docs.where(F.length(F.trim("text")) > 0)
                .where(F.size(whitespace_tokens(F.lower(F.col("text")))) >= 2)
                .count())
    assert len(rows) == expected
    for r in rows:
        assert r.n_bigrams >= 1
        assert math.isfinite(r.avg_logprob) and r.avg_logprob < 0.0, r


def test_contamination_bounds_and_benchmark_exclusion(spark):
    """Contamination ratios sit in (0, 1]; benchmark docs themselves are
    never reported; every reported doc clears the 0.2 threshold."""
    from fts_errors_clustering_spark.plans.registry import all_queries

    rows = (all_queries()["benchmark_contamination"]
            .fn(spark, SF_SMALL).collect())
    for r in rows:
        assert r.doc_id >= 10
        assert 1 <= r.n_overlap <= r.n_shingles
        assert 0.2 <= r.overlap_ratio <= 1.0, r


def test_knee_sweep_consistent_with_argmax(spark):
    """The sweep's rows cover every sensitivity; epsilons are drawn from
    the kNN curve; chosen_epsilon is their max; and the S->0 argmax knee
    (knn_knee_epsilon) never exceeds the sweep's chosen epsilon."""
    from fts_errors_clustering_spark.operators.knn import SENSITIVITIES
    from fts_errors_clustering_spark.plans.registry import all_queries

    sweep = all_queries()["knn_knee_sweep"].fn(spark, SF_SMALL).collect()
    assert sorted(r.sensitivity for r in sweep) == sorted(SENSITIVITIES)
    chosen = {r.chosen_epsilon for r in sweep}
    assert len(chosen) == 1
    assert max(r.epsilon for r in sweep) == chosen.pop()
    argmax = all_queries()["knn_knee_epsilon"].fn(spark, SF_SMALL).first()
    assert argmax.epsilon <= max(r.epsilon for r in sweep) + 1e-9
