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


def test_stream_reader_batches_and_offsets(rest):
    """Unit contract of the streaming reader: page offsets advance past
    exactly the consumed pages, batches respect max_pages_per_batch, a
    drained endpoint leaves the offset unchanged, and readBetweenOffsets
    replays a committed range verbatim."""
    from pyspark.sql.types import StructType
    from fts_errors_clustering_spark.sources.rest_source import (
        _FAKE_PAGES, _FAKE_PER_PAGE, _RestPagesStreamReader,
        RestPagesDataSource)

    opts = {"fetcher":
            "fts_errors_clustering_spark.sources.rest_source:synthetic_fetcher",
            "max_pages_per_batch": "3"}
    schema = StructType.fromDDL(RestPagesDataSource(opts).schema())
    r = _RestPagesStreamReader(opts, schema)
    off = r.initialOffset()
    seen = []
    for _ in range(5):
        rows, off = r.read(off)
        seen.append(list(rows))
    assert [len(b) for b in seen[:3]] == [3 * _FAKE_PER_PAGE,
                                          3 * _FAKE_PER_PAGE,
                                          1 * _FAKE_PER_PAGE]
    assert seen[3] == [] and seen[4] == []  # drained: no phantom rows
    # the tail page (next == null) is NOT advanced past: the offset parks
    # at its record count so later appends to it are picked up
    assert off == {"page": _FAKE_PAGES, "rec": _FAKE_PER_PAGE}
    ids = [t[0] for b in seen for t in b]
    assert ids == list(range(_FAKE_PAGES * _FAKE_PER_PAGE))
    # legacy page-only offsets (pre-"rec" checkpoints) still replay
    replay = list(r.readBetweenOffsets({"page": 2}, {"page": 4}))
    assert [t[0] for t in replay] == list(range(_FAKE_PER_PAGE,
                                                3 * _FAKE_PER_PAGE))


#: mutable geometry for the growing-tail fetcher below (per-test reset)
_GROW = {"total": 5}
_GROW_PER_PAGE = 10


def growing_fetcher(page: int) -> dict:
    """Append-only feed whose TAIL page fills in place: `_GROW['total']`
    records paginated 10/page; `next` appears only once a page is outgrown."""
    base = (page - 1) * _GROW_PER_PAGE
    cnt = max(0, min(_GROW_PER_PAGE, _GROW["total"] - base))
    return {
        "results": [{"id": base + i, "message": f"m{base + i}",
                     "category": "c"} for i in range(cnt)],
        "next": f"?page={page + 1}"
        if _GROW["total"] > page * _GROW_PER_PAGE else None,
    }


def test_stream_reader_tail_page_appends_not_skipped(rest):
    """The exactly-once contract on the normal append-only feed shape:
    records appended to the final, still-filling page after a batch
    consumed it must surface in the next batch (the offset tracks a
    within-page record index), and readBetweenOffsets replays exactly the
    committed slice across the page boundary."""
    from pyspark.sql.types import StructType
    from fts_errors_clustering_spark.sources.rest_source import (
        _RestPagesStreamReader, RestPagesDataSource)

    _GROW["total"] = 5
    opts = {"fetcher": "tests.test_rest_source:growing_fetcher"}
    schema = StructType.fromDDL(RestPagesDataSource(opts).schema())
    r = _RestPagesStreamReader(opts, schema)

    rows1, off1 = r.read(r.initialOffset())
    assert [t[0] for t in rows1] == list(range(5))
    assert off1 == {"page": 1, "rec": 5}
    rows_idle, off_idle = r.read(off1)
    assert list(rows_idle) == [] and off_idle == off1

    _GROW["total"] = 8          # tail page grows in place
    rows2, off2 = r.read(off1)
    assert [t[0] for t in rows2] == [5, 6, 7]
    assert off2 == {"page": 1, "rec": 8}

    _GROW["total"] = 12         # page 1 fills; page 2 becomes the tail
    rows3, off3 = r.read(off2)
    assert [t[0] for t in rows3] == [8, 9, 10, 11]
    assert off3 == {"page": 2, "rec": 2}

    replay = list(r.readBetweenOffsets(off1, off3))
    assert [t[0] for t in replay] == list(range(5, 12))


def test_stream_end_to_end_available_now(rest, tmp_path):
    """readStream.format('rest_pages') drains the 35-record synthetic feed
    through a real micro-batch query into a memory sink. Spark downgrades
    Trigger.AvailableNow to single-batch for Python micro-batch streams,
    so the per-batch cap is set above the feed depth here; multi-batch
    offset advancement is pinned by the unit test above."""
    q = (rest.readStream.format("rest_pages")
         .option("fetcher", "fts_errors_clustering_spark.sources."
                 "rest_source:synthetic_fetcher")
         .option("max_pages_per_batch", "10")
         .load()
         .writeStream.format("memory").queryName("rest_stream_t")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = rest.sql("SELECT id, category FROM rest_stream_t").collect()
    assert len(rows) == 35
    assert {r.id for r in rows} == set(range(35))
