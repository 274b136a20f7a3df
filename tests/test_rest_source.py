"""rest_pages Python Data Source (S1 as a catalog-visible format)."""

from __future__ import annotations

import pytest

from fts_errors_clustering_spark.sources.rest_source import (
    _FAKE_PAGES,
    _FAKE_PER_PAGE,
    RestPagesDataSource,
    synthetic_fetcher,
)

FETCHER = "fts_errors_clustering_spark.sources.rest_source:synthetic_fetcher"


@pytest.fixture()
def rest(spark):
    spark.dataSource.register(RestPagesDataSource)
    return spark


def _expected_rows():
    out = []
    page = 1
    while True:
        p = synthetic_fetcher(page)
        out.extend((r["id"], r["message"], r["category"])
                   for r in p["results"])
        if not p["next"]:
            return out
        page += 1


def test_sequential_walk_matches_reference_loop(rest):
    """No page count -> one partition walking next links, exactly the
    fetch_issues.py loop; content must equal the full paginated payload."""
    df = (rest.read.format("rest_pages")
          .option("fetcher", FETCHER).load())
    assert df.rdd.getNumPartitions() == 1
    got = sorted((r.id, r.message, r.category) for r in df.collect())
    assert got == sorted(_expected_rows())
    assert len(got) == _FAKE_PAGES * _FAKE_PER_PAGE


def test_parallel_fetch_same_content(rest):
    """With pages known, fetches stripe across partitions and the union is
    identical to the sequential walk."""
    df = (rest.read.format("rest_pages")
          .option("fetcher", FETCHER)
          .option("pages", str(_FAKE_PAGES))
          .option("parallelism", "4").load())
    assert df.rdd.getNumPartitions() == 4
    got = sorted((r.id, r.message, r.category) for r in df.collect())
    assert got == sorted(_expected_rows())


def test_schema_projection_and_filter_compose(rest):
    """The format composes with ordinary relational ops downstream."""
    from pyspark.sql import functions as F
    df = (rest.read.format("rest_pages")
          .option("fetcher", FETCHER)
          .option("pages", str(_FAKE_PAGES)).load())
    by_cat = (df.where(F.col("category") != "auth")
              .groupBy("category").agg(F.count("*").alias("n"))
              .collect())
    assert {r.category for r in by_cat} == {"timeout", "network"}


def test_missing_fetcher_rejected(rest):
    with pytest.raises(Exception, match="fetcher"):
        rest.read.format("rest_pages").load().collect()
