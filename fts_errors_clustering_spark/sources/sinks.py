"""Parquet sinks shaped for 100 TB reads, not just writes.

The reference only ever lands JSON page dumps (``fetch_fts_errors.py:34-41``
→ ``land_pages`` here); a training-data pipeline also needs the OUTPUT side
of the lake to be scan-efficient. Two concerns drive the layout:

- **partition pruning**: writing ``partitionBy(key)`` turns every later
  ``WHERE key = ...`` into a directory prune — the scan never opens the
  other partitions' files;
- **file sizing + row-group order**: ``repartition(n, key)`` bounds the
  file count per partition value (one task → one file per value it holds,
  so n caps parallel-write memory AND avoids the many-tiny-files problem),
  and ``sortWithinPartitions`` clusters row groups so min/max column stats
  make point/range predicates skip whole row groups on read.

Both knobs are declarative — Catalyst still plans the write — and neither
touches driver memory, so the same call shape works for a 60 k-row fixture
and a 100 TB table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_partitioned_parquet", "write_jsonl_shards",
           "write_bucketed_table"]


def write_partitioned_parquet(
    df: DataFrame,
    out_path: str,
    partition_by: str,
    sort_by: list[str] | None = None,
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a hive-partitioned parquet dataset.

    ``files_per_partition`` scales write parallelism for big partition
    values (salting the task split without changing the directory layout);
    ``sort_by`` orders rows inside each file so parquet row-group min/max
    stats prune reads on those columns.
    """
    shaped = df.repartition(files_per_partition, partition_by)
    if sort_by:
        shaped = shaped.sortWithinPartitions(partition_by, *sort_by)
    shaped.write.mode(mode).partitionBy(partition_by).parquet(out_path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    n_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a BUCKETED parquet table: rows hash-clustered into
    ``n_buckets`` files by ``bucket_by``, optionally sorted within each.

    Bucketing is the at-rest half of a co-located join: two tables bucketed
    the same way join WITHOUT EITHER SIDE SHUFFLING (the plan shows no
    Exchange under the SortMergeJoin), because the bucket layout IS the
    join partitioning. For a 100 TB fact table joined repeatedly on the
    same key, this converts every join's O(data) shuffle into a one-time
    write-side cost — the standard warehouse trick for dimension-stable
    pipelines. Requires the session catalog (``saveAsTable``); plain-path
    parquet cannot carry bucket metadata.
    """
    w = df.write.mode(mode).format("parquet")
    if path:
        w = w.option("path", path)  # external table: data lives off-warehouse
    if sort_by:
        w = w.bucketBy(n_buckets, bucket_by).sortBy(sort_by)
    else:
        w = w.bucketBy(n_buckets, bucket_by)
    w.saveAsTable(table_name)


def write_jsonl_shards(
    df: DataFrame,
    out_path: str,
    n_shards: int,
    shard_key: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Land a curated corpus as N JSON-lines shards — the handoff format
    training loaders consume (one record per line, fixed shard count so
    downstream dataloader workers map 1:1 onto files).

    ``shard_key`` hashes rows to shards (stable co-location, e.g. by
    doc_id so re-exports shard identically); without it a round-robin
    repartition balances shard sizes exactly. Compression stays default-off
    because JSONL consumers stream-decode; flip via
    ``df.write.option('compression', ...)`` at call sites that archive.
    """
    shaped = (df.repartition(n_shards, shard_key) if shard_key
              else df.repartition(n_shards))
    shaped.write.mode(mode).json(out_path)
