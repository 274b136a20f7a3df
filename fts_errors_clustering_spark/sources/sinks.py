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
           "write_bucketed_table", "write_zordered_parquet",
           "compact_parquet", "publish_versioned_parquet",
           "read_latest_version", "read_versioned"]


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


def write_zordered_parquet(
    df: DataFrame,
    out_path: str,
    zorder_by: tuple[str, str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-ORDER (Morton) curve of two numeric
    columns — multi-dimensional data skipping for the 100 TB lake.

    A linear ``sort_by(x)`` makes row-group min/max stats prune predicates
    on x but leaves every row group spanning the FULL range of y; at scale
    a query filtering on both dimensions still opens every file. Morton
    interleaving clusters rows so each row group covers a small rectangle
    of (x, y) space — predicates on EITHER or BOTH columns skip row groups
    via the same min/max stats, no index structure needed (the Delta/
    Iceberg OPTIMIZE ZORDER technique, done with plain DataFrame ops).

    Mechanics: each column is affinely mapped to a 16-bit integer using its
    global min/max (one tiny aggregate — driver sees 4 numbers), the two
    bit-strings interleave into a 32-bit z-value (pure JVM column algebra),
    and the frame is range-partitioned + sorted on z before writing. The
    z column itself is dropped from the files.
    """
    from pyspark.sql import functions as F

    c1, c2 = zorder_by
    mm = df.agg(F.min(c1).alias("a1"), F.max(c1).alias("b1"),
                F.min(c2).alias("a2"), F.max(c2).alias("b2")).first()

    def scale16(col, lo, hi):
        span = float(hi) - float(lo)
        if span <= 0:
            return F.lit(0).cast("long")
        return F.least(
            F.lit(65535),
            F.floor((F.col(col).cast("double") - float(lo)) / span * 65536.0)
            .cast("long"))

    x = scale16(c1, mm["a1"], mm["b1"])
    y = scale16(c2, mm["a2"], mm["b2"])
    z = F.lit(0).cast("long")
    for i in range(16):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)),
                                    2 * i + 1))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)),
                                    2 * i))
    cols = df.columns
    (df.withColumn("_z", z)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .select(*cols)
       .write.mode(mode).parquet(out_path))


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within: list[str] | None = None,
) -> int:
    """Small-files compaction — the OPTIMIZE half every streaming/incremental
    ingest needs: micro-batch sinks and per-trigger appends leave thousands
    of KB-sized files, and at 100 TB the resulting task-per-file scheduling
    and open/seek overhead dominates scans. Re-lands the dataset at
    ``target_file_bytes`` per file (computed from the ACTUAL input byte
    size — no row counting pass), optionally re-sorting rows within files
    so row-group stats stay selective after compaction. Returns the file
    count written. Coalesce (not repartition) when only merging: no shuffle
    — each output task concatenates input splits."""
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = p.getFileSystem(conf)
    total = sum(s.getLen() for s in fs.listStatus(p)
                if s.getPath().getName().endswith(".parquet"))
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(in_path)
    if sort_within:
        shaped = df.repartition(n).sortWithinPartitions(*sort_within)
    else:
        shaped = df.coalesce(n)
    shaped.write.mode("overwrite").parquet(out_path)
    out = jvm.org.apache.hadoop.fs.Path(out_path)
    return sum(1 for s in fs.listStatus(out)
               if s.getPath().getName().endswith(".parquet"))


def publish_versioned_parquet(df: DataFrame, root: str) -> int:
    """Atomic snapshot publish — the minimal lakehouse commit protocol.

    Writes the dataset to ``root/v=N/`` (N = last published version + 1),
    then flips the ``root/_LATEST`` pointer with an atomic rename. Readers
    that resolve the pointer (``read_versioned``) therefore see either the
    previous snapshot or the complete new one, never a half-written
    directory — the publish is all-or-nothing even if the writer dies
    mid-write (an orphaned ``v=N`` directory without a pointer flip is
    invisible and safe to GC). Old versions stay readable: time travel is
    ``read_versioned(spark, root, version=K)``.

    This is the pattern Iceberg/Delta implement with manifest files; the
    single-pointer variant here is exactly right for the publish-once /
    read-many cadence of a curated training-data drop, with no table
    format dependency. Returns the new version number.

    Scope: ``root`` must be a DRIVER-LOCAL path (bare path or ``file:``
    URI) — the pointer flip uses POSIX rename, whose atomicity an object
    store (s3/dbfs) does not provide; a remote root is rejected loudly
    instead of publishing a pointer whose flip is not atomic. Concurrent
    publishers are serialized by an O_EXCL lock file so two writers cannot
    both compute version N and have the second clobber a ``v=N`` directory
    readers already resolved; a crash while holding the lock leaves
    ``_PUBLISH_LOCK`` behind for manual GC (same rule as an orphaned
    ``v=N`` without a pointer flip), which the error message states."""
    import os
    import tempfile
    from urllib.parse import urlparse

    scheme = urlparse(root).scheme
    if scheme not in ("", "file"):
        raise ValueError(
            f"publish_versioned_parquet requires a driver-local root "
            f"(bare path or file: URI); got scheme {scheme!r} — the "
            f"_LATEST pointer flip relies on POSIX-atomic rename")
    local_root = urlparse(root).path if scheme == "file" else root
    os.makedirs(local_root, exist_ok=True)
    lock = os.path.join(local_root, "_PUBLISH_LOCK")
    try:
        lock_fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"another publisher holds {lock}; if its process died, delete "
            f"the lock file (and any orphaned v=N directory) and retry"
        ) from None
    try:
        os.write(lock_fd, str(os.getpid()).encode())
        os.close(lock_fd)
        ptr = os.path.join(local_root, "_LATEST")
        cur = read_latest_version(local_root)
        new = cur + 1
        df.write.mode("overwrite").parquet(
            os.path.join(local_root, f"v={new}"))
        fd, tmp = tempfile.mkstemp(dir=local_root, prefix="._latest_")
        with os.fdopen(fd, "w") as fh:
            fh.write(str(new))
        os.replace(tmp, ptr)  # POSIX-atomic pointer flip
    finally:
        os.unlink(lock)
    return new


def read_latest_version(root: str) -> int:
    """Current published version (0 = nothing published)."""
    import os
    ptr = os.path.join(root, "_LATEST")
    if not os.path.exists(ptr):
        return 0
    with open(ptr) as fh:
        return int(fh.read().strip())


def read_versioned(spark, root: str, version: int | None = None) -> DataFrame:
    """Read a published snapshot: latest by default, or time-travel to an
    explicit ``version``. Raises if nothing is published (or the requested
    version was never committed) rather than scanning a partial write."""
    import os
    v = read_latest_version(root) if version is None else version
    if v < 1:
        raise ValueError(f"no published version under {root}")
    path = os.path.join(root, f"v={v}")
    if version is not None and version > read_latest_version(root):
        raise ValueError(f"version {version} not committed under {root}")
    return spark.read.parquet(path)
