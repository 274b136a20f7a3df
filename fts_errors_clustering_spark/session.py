"""SparkSession factory tuned for the test/bench environment.

The reference creates its session at
``/root/reference/notebooks/rucio_data_access_HDFS.ipynb:62``
(``SparkSession.builder.master("local[*]")``) with no further tuning and pays
for it (schema inference, 200 default shuffle partitions). Here we pin the
configs that matter for a local[N] run and for DuckDB-oracle comparability:

- ``spark.sql.shuffle.partitions`` ~= cores: the fixtures are small enough
  that 200 partitions is pure scheduling overhead; on a real cluster this
  would be sized to ~2-3x total cores and AQE coalesces the rest.
- AQE on: runtime re-planning (partition coalescing, skew-join splitting)
  is the 100 TB safety net for every shuffle this engine emits.
- session timezone UTC: parquet timestamps must collect identically in
  Spark and DuckDB (which is UTC-naive).
- Arrow on: every toPandas()/pandas_udf boundary is vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "fts-errors-clustering-spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or max(8, cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # one BLAS thread per Python worker: with `cpus` workers already
        # running data-parallel, nested OpenBLAS pools (workers x cores
        # threads) thrash the scheduler — the broadcast-kernel GEMMs in
        # operators/pairwise.py get their parallelism from partitions, not
        # from BLAS. Driver-side numpy (dbscan driver-kernel tier) is NOT
        # affected: executorEnv applies to workers only.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable invariants to an externally created session.

    The driver hands us its own SparkSession for ``entry``/``queries``; the
    only config our operators *require* is the UTC session timezone (so
    timestamp results agree with the UTC-naive DuckDB oracle). Everything
    else is plan-level and works on any session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
