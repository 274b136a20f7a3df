"""Shared fixtures: one SparkSession per test session + the DuckDB oracle.

``oracle_compare`` mirrors the driver's t2 gate (row count + sorted-by-name
columns + order-insensitive value comparison) but is STRICTER: values must
match exactly (bit-exact floats), so anything that passes here should hash-
match in the driver.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
import os

import duckdb
import pytest

from fts_errors_clustering_spark.session import get_spark
from fts_errors_clustering_spark.sources.readers import TABLES

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fts-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


def _seqratio(a: str, b: str) -> int:
    """fuzzywuzzy-0.17 fuzz.ratio == int(round(100 * SequenceMatcher.ratio))
    — registered as a DuckDB Python UDF so local_oracle queries can state
    the EXACT same algorithm the Spark pandas UDF runs."""
    from difflib import SequenceMatcher
    return int(round(100 * SequenceMatcher(None, a or "", b or "").ratio()))


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    con.create_function("seqratio", _seqratio)
    for sf in {SF_SMALL, SF_MED}:
        schema = "sf" + sf.rsplit("sf", 1)[1].replace(".", "_")
        con.execute(f"CREATE SCHEMA IF NOT EXISTS {schema}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {schema}.{t} AS "
                f"SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    yield con
    con.close()


def duck_for(duck, sf_dir: str):
    """Return a cursor whose unqualified table names resolve to sf_dir."""
    schema = "sf" + sf_dir.rsplit("sf", 1)[1].replace(".", "_")
    cur = duck.cursor()
    cur.execute(f"USE memory.{schema}")
    return cur


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, _decimal.Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def oracle_compare(spark_df, duck_cur, sql: str, name: str = "?"):
    """Assert Spark result == DuckDB result (order-insensitive, exact)."""
    srows = spark_df.collect()
    scols = spark_df.columns
    res = duck_cur.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column names differ: spark={sorted(scols)} duck={sorted(dcols)}")
    assert len(srows) == len(drows), (
        f"{name}: row count differs: spark={len(srows)} duck={len(drows)}")

    sidx = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    didx = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())

    # total order even with NULL cells (None < float comparisons raise);
    # both sides sort under the same key, so the zip comparison is valid
    def _key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)

    sset = sorted((tuple(_norm(r[i]) for i in sidx) for r in srows), key=_key)
    dset = sorted((tuple(_norm(r[i]) for i in didx) for r in drows), key=_key)
    for k, (a, b) in enumerate(zip(sset, dset)):
        assert a == b, (f"{name}: first row mismatch at sorted-row {k}:\n"
                        f"  spark={a}\n  duck ={b}")
