"""S1 as a FIRST-CLASS Spark data source: ``spark.read.format("rest_pages")``.

The reference's ingest is a driver-side pagination loop
(``/root/reference/code/fetch_issues.py:29-39``: fetch page, follow
``data['next']``, append ``data['results']``). ``readers.fetch_pages``
rebuilds that loop as an injectable iterator; this module lifts the same
protocol into the PySpark 4 Python Data Source API so the REST corpus is
catalog-visible and its fetch runs ON EXECUTORS:

- ``pages`` option known (the usual case — REST APIs report a total/count):
  page numbers are striped round-robin across ``parallelism`` input
  partitions, so N executors fetch N pages concurrently — the 100 TB-shape
  ingest (page fetch is IO-bound; the driver loop serializes it).
- ``pages`` unknown: one sequential partition walks ``next`` links exactly
  like the reference loop (pagination without a count is inherently
  sequential — the cursor lives in the previous response).

HTTP stays OUT of this module: the ``fetcher`` option names a
``module:function`` resolved on the executor, ``fetcher(page_no) ->
{'results': [...], 'next': url|None}`` — the same contract as
``readers.fetch_pages``, so tests and offline runs inject a deterministic
fake while a deployment points it at urllib/requests.
"""

from __future__ import annotations

import importlib
from collections.abc import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import StructType


def resolve_fetcher(spec: str):
    """Resolve a ``module:function`` fetcher spec (executor-side import)."""
    mod, _, fn = spec.partition(":")
    if not fn:
        raise ValueError(f"fetcher must be 'module:function', got {spec!r}")
    return getattr(importlib.import_module(mod), fn)


class _PagePartition(InputPartition):
    def __init__(self, start: int, step: int, sequential: bool):
        self.start = start      # first page number this partition fetches
        self.step = step        # stride between its pages (== parallelism)
        self.sequential = sequential  # walk next-links until exhausted


class _RestPagesReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self.schema = schema

    def partitions(self):
        pages = self.options.get("pages")
        par = int(self.options.get("parallelism", "8"))
        start = int(self.options.get("start", "1"))
        if pages is None:
            # no page count advertised: the next-link cursor forces a
            # sequential walk (exactly fetch_issues.py's loop)
            return [_PagePartition(start, 1, sequential=True)]
        n = max(1, min(par, int(pages)))
        return [_PagePartition(start + i, n, sequential=False)
                for i in range(n)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        fetch = resolve_fetcher(self.options["fetcher"])
        names = [f.name for f in self.schema.fields]
        pages = self.options.get("pages")
        last = None if pages is None else (
            int(self.options.get("start", "1")) + int(pages) - 1)
        page = partition.start
        while last is None or page <= last:
            payload = fetch(page)
            for rec in payload.get("results", []):
                yield tuple(rec.get(c) for c in names)
            if partition.sequential and not payload.get("next"):
                return
            page += partition.step


class _RestPagesStreamReader(SimpleDataSourceStreamReader):
    """STREAMING twin of the page reader: ``spark.readStream.format(
    "rest_pages")`` tails the endpoint — each micro-batch fetches what
    appeared since the last committed offset. The offset is
    ``{"page": P, "rec": K}``: records of page P before index K are
    consumed (a dict so it JSON-round-trips through the checkpoint log).
    Tracking the WITHIN-PAGE index matters for the normal fixed-page-size
    shape of an append-only feed: the tail page (the one with ``next ==
    null``) is usually still filling, so the reader consumes its current
    records without advancing past it — records appended to that page
    later surface in the next batch instead of being skipped forever.

    Feed contract (the assumption that makes replays deterministic): the
    feed is append-only and only the tail page grows; a page that has ever
    advertised a ``next`` link is immutable. ``readBetweenOffsets``
    re-fetches exactly [start, end) on recovery — under the contract those
    slices are stable, which makes the source exactly-once into an
    idempotent sink. Per-batch page count is capped
    (``max_pages_per_batch``) so a cold start against a deep feed
    back-fills in bounded batches instead of one giant first batch."""

    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self.names = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"page": int(self.options.get("start", "1")), "rec": 0}

    def read(self, start: dict):
        fetch = resolve_fetcher(self.options["fetcher"])
        cap = int(self.options.get("max_pages_per_batch", "10"))
        page, rec = int(start["page"]), int(start.get("rec", 0))
        rows: list[tuple] = []
        for _ in range(cap):
            payload = fetch(page)
            results = payload.get("results", [])
            for r in results[rec:]:
                rows.append(tuple(r.get(c) for c in self.names))
            if not payload.get("next"):
                # tail page (possibly still filling): consume its current
                # records but DON'T advance past it — later appends to this
                # page land in the next batch
                rec = len(results)
                break
            page, rec = page + 1, 0
        return iter(rows), {"page": page, "rec": rec}

    def readBetweenOffsets(self, start: dict, end: dict):
        fetch = resolve_fetcher(self.options["fetcher"])
        sp, sr = int(start["page"]), int(start.get("rec", 0))
        ep, er = int(end["page"]), int(end.get("rec", 0))
        for page in range(sp, ep + 1):
            if page == ep and er == 0:
                return  # end offset sits at the top of an unread page
            payload = fetch(page)
            results = payload.get("results", [])
            lo = sr if page == sp else 0
            hi = er if page == ep else len(results)
            for r in results[lo:hi]:
                yield tuple(r.get(c) for c in self.names)

    def commit(self, end: dict) -> None:
        pass  # the endpoint is remote state; nothing to clean up


class RestPagesDataSource(DataSource):
    """``spark.read.format("rest_pages")`` after
    ``spark.dataSource.register(RestPagesDataSource)``.

    Options: ``fetcher`` (required, ``module:function``), ``pages``
    (total page count -> parallel fetch), ``parallelism`` (default 8),
    ``start`` (first page, default 1). Schema comes from
    ``.schema(...)``; the default below matches the reference issue
    records' scalar fields."""

    @classmethod
    def name(cls) -> str:
        return "rest_pages"

    def schema(self) -> str:
        return self.options.get(
            "ddl", "id bigint, message string, category string")

    def reader(self, schema: StructType) -> _RestPagesReader:
        if "fetcher" not in self.options:
            raise ValueError("rest_pages requires a fetcher=module:function "
                             "option (see module docstring)")
        return _RestPagesReader(dict(self.options), schema)

    def simpleStreamReader(self, schema: StructType) -> _RestPagesStreamReader:
        if "fetcher" not in self.options:
            raise ValueError("rest_pages requires a fetcher=module:function "
                             "option (see module docstring)")
        return _RestPagesStreamReader(dict(self.options), schema)


# --- deterministic offline fetcher (tests / demos) ---------------------------

#: geometry of the synthetic endpoint: 7 pages x 5 records
_FAKE_PAGES, _FAKE_PER_PAGE = 7, 5


def synthetic_fetcher(page: int) -> dict:
    """Deterministic fake of the reference endpoint: same payload contract
    (``results`` + ``next``), content derived purely from the page number —
    the offline stand-in wired by tests (no network in this environment)."""
    if page > _FAKE_PAGES:
        return {"results": [], "next": None}
    base = (page - 1) * _FAKE_PER_PAGE
    return {
        "results": [
            {"id": base + i,
             "message": f"error at line {base + i}: transfer failed",
             "category": ["timeout", "auth", "network"][(base + i) % 3]}
            for i in range(_FAKE_PER_PAGE)
        ],
        "next": f"?page={page + 1}" if page < _FAKE_PAGES else None,
    }


def register(spark) -> None:
    """Idempotently register the format on a session."""
    spark.dataSource.register(RestPagesDataSource)
