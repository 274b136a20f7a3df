"""Structured Streaming jobs (SURVEY.md section 2.8 extension).

The reference processes daily HDFS batches; the streaming rebuild runs the
same windowed aggregations as continuous queries: file source with explicit
schema -> ``withWatermark`` -> ``window()``/``session_window()`` agg ->
sink. For tests/driver checks the sink is ``memory`` and
``processAllAvailable()`` drains the fixture synchronously; in production
the same plan writes to parquet/kafka with a real trigger.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec_sum
from ..sources.readers import table

_STAGE_ROOT = "/root/repo/.tmp/stream_stage"


def _stage_events(spark: SparkSession, sf_dir: str) -> str:
    """Stage the events fixture as a normal-micros parquet directory the
    file-stream source can watch (the fixture file itself is nanos-typed
    and single-file; a real deployment watches the landing directory)."""
    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(_STAGE_ROOT, tag)
    marker = os.path.join(out, "_SUCCESS")
    if not os.path.exists(marker):
        table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def streaming_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    staged = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    return spark.readStream.schema(schema).parquet(staged)


def tumbling_agg(events: DataFrame) -> DataFrame:
    """Watermarked tumbling 1h window x event_type — identical semantics to
    operators/windows.tumbling_hourly_by_type (Spark guarantees batch and
    streaming window() agree)."""
    return (events
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 dec_sum("value", 6).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n", "sum_value"))


def run_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the tumbling aggregation as a streaming query into a memory
    sink, drain it, and return the materialized result."""
    agg = tumbling_agg(streaming_events(spark, sf_dir))
    name = "tumbling_" + uuid.uuid4().hex[:12]
    q = (agg.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # materialize before the sink table goes away with the stopped query
    rows = spark.table(name)
    out = spark.createDataFrame(rows.collect(), schema=rows.schema)
    return out
