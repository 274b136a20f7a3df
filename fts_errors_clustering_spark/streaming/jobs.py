"""Structured Streaming jobs (SURVEY.md section 2.8 extension).

The reference processes daily HDFS batches; the streaming rebuild runs the
same windowed aggregations as continuous queries: file source with explicit
schema -> ``withWatermark`` -> ``window()``/``session_window()`` agg ->
sink. For tests/driver checks the sink is ``memory`` and
``processAllAvailable()`` drains the fixture synchronously; in production
the same plan writes to parquet/kafka with a real trigger.

TEST-HARNESS ADAPTER BOUNDARY: every registry entry in this module ends
with ``spark.createDataFrame(rows.collect(), ...)`` — that collect() is
the memory-sink -> batch-DataFrame re-wrap the rows-only driver check
needs, NOT a production sink, and it is safe here only because each
streamed result is window-aggregate-sized (bounded by #windows x #keys,
never by input rows). A deployment takes the ``*_agg``/``*_gate`` plan
builders above the runners and attaches ``writeStream`` directly; piping
a real volume through these runner adapters would materialize the sink on
the driver. ``_guarded_collect`` enforces that boundary at runtime.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dec_sum, round_half_up
from ..sources.readers import table

_STAGE_ROOT = "/root/repo/.tmp/stream_stage"

#: adapter guard: refuse to driver-materialize a "streamed" result bigger
#: than any plausible windowed aggregate of the fixtures — failing loudly
#: beats an OOM'd driver if someone points a runner at real volume.
_ADAPTER_MAX_ROWS = 2_000_000


def _guarded_collect(rows):
    got = rows.limit(_ADAPTER_MAX_ROWS + 1).collect()
    if len(got) > _ADAPTER_MAX_ROWS:
        raise RuntimeError(
            "streaming test adapter: memory-sink result exceeds "
            f"{_ADAPTER_MAX_ROWS} rows — attach writeStream to the plan "
            "builder instead of using the test runner (see module header)")
    return got


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
    out = spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)
    return out


# --- custom stateful operator: streaming first-seen dedup -------------------

DEDUP_OUT_SCHEMA = "text_hash string, doc_id long"
DEDUP_STATE_SCHEMA = "doc_id long"


def _stage_documents_staggered(spark: SparkSession, sf_dir: str) -> str:
    """Stage the corpus plus planted EXACT duplicates (doc_id+100000, same
    text — unlike dedup._augmented's near-dups, which alter the text) as
    several sequentially written parquet files, originals first, duplicates
    last — so with maxFilesPerTrigger=1 the duplicates arrive in LATER
    micro-batches and cross-batch state suppression is genuinely
    exercised."""
    tag = "docs_" + sf_dir.strip("/").replace("/", "_")
    out = os.path.join(_STAGE_ROOT, tag)
    marker = os.path.join(out, "_STAGED")
    if not os.path.exists(marker):
        # temp-dir build + atomic rename (the _stage_events_daily
        # discipline): a markerless target is a partial interrupted write
        # whose rerun would append a second copy of every slice
        shutil.rmtree(out, ignore_errors=True)
        tmp = out + "_building"
        shutil.rmtree(tmp, ignore_errors=True)
        docs = table(spark, sf_dir, "documents").select("doc_id", "text")
        slices = [docs.where(F.col("doc_id") % 4 == part)
                  for part in range(4)]
        slices.append(docs.where(F.col("doc_id") < 20)
                      .select((F.col("doc_id") + 100000).alias("doc_id"),
                              "text"))
        seen: set[str] = set()
        base = 1_600_000_000  # fixed epoch; only the ORDER matters
        for i, sl in enumerate(slices):
            sl.coalesce(1).write.mode("append").parquet(tmp)
            # FileStreamSource orders by modification time; parallel appends
            # can land within the same clock tick, so stamp explicit,
            # strictly increasing mtimes per staged slice
            for f in sorted(os.listdir(tmp)):
                if f.endswith(".parquet") and f not in seen:
                    seen.add(f)
                    os.utime(os.path.join(tmp, f), (base + i, base + i))
        with open(os.path.join(tmp, "_STAGED"), "w") as fh:
            fh.write("ok")
        os.replace(tmp, out)
    return out


def _first_seen(key, pdfs, state):
    """applyInPandasWithState hook: emit the group's min doc_id the first
    time its text_hash is seen; afterwards the state swallows the group.
    Arrow-batched; state is one long per distinct hash."""
    import pandas as pd
    mins = [int(p["doc_id"].min()) for p in pdfs if len(p)]
    if state.exists or not mins:
        return
    first = min(mins)
    state.update((first,))
    yield pd.DataFrame({"text_hash": [key[0]], "doc_id": [first]})


def run_stateful_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup as a CUSTOM STATEFUL OPERATOR
    (``applyInPandasWithState``): key = md5(text), state = first doc_id,
    output = one row per distinct document text, duplicates in later
    micro-batches dropped. The streaming twin of ``dedup_exact`` —
    at 100 TB this is the continuous-ingest dedup gate in front of a
    training-data lake (state store scales per-key, shuffled by hash)."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    staged = _stage_documents_staggered(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(staged))
    hashed = stream.select(F.md5("text").alias("text_hash"), "doc_id")
    deduped = (hashed.groupBy("text_hash")
               .applyInPandasWithState(
                   _first_seen, DEDUP_OUT_SCHEMA, DEDUP_STATE_SCHEMA,
                   "append", GroupStateTimeout.NoTimeout))
    name = "dedup_" + uuid.uuid4().hex[:12]
    q = (deduped.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name)
    return spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)


NEARDUP_OUT_SCHEMA = "doc_id long, band long, owner long"
NEARDUP_STATE_SCHEMA = "owner long"


def _claim_bucket(key, pdfs, state):
    """applyInPandasWithState hook for one (band, bucket) group: the first
    doc to arrive owns the bucket forever (min doc_id within the first
    trigger); every doc in the group is emitted with the owner so the
    caller can tell first-claimers (doc == owner) from near-dup hits."""
    import pandas as pd
    docs: list[int] = []
    for p in pdfs:
        docs.extend(int(d) for d in p["doc_id"])
    if not docs:
        return
    owner = int(state.get[0]) if state.exists else min(docs)
    if not state.exists:
        state.update((owner,))
    yield pd.DataFrame({"doc_id": docs,
                        "band": [int(key[0])] * len(docs),
                        "owner": [owner] * len(docs)})


def run_dedup_stream_with_recovery(spark: SparkSession, sf_dir: str,
                                   checkpoint_dir: str,
                                   stop_after_batches: int = 2) -> DataFrame:
    """The stateful first-seen dedup run in TWO sessions against one
    checkpoint: start, kill the query after ``stop_after_batches``
    micro-batches (a crash stand-in), then restart from the checkpoint and
    drain. The state store + WAL must resume exactly — every distinct text
    emitted once across both incarnations, none lost, none duplicated
    (asserted by the caller against the batch dedup).

    This is the recovery contract a 100 TB continuous-ingest gate runs
    on: the checkpoint (offsets + state) is the source of truth, process
    lifetime is incidental."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    staged = _stage_documents_staggered(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    out_dir = os.path.join(checkpoint_dir, "out")
    ckpt = os.path.join(checkpoint_dir, "ckpt")

    def start():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(staged))
        hashed = stream.select(F.md5("text").alias("text_hash"), "doc_id")
        deduped = (hashed.groupBy("text_hash")
                   .applyInPandasWithState(
                       _first_seen, DEDUP_OUT_SCHEMA, DEDUP_STATE_SCHEMA,
                       "append", GroupStateTimeout.NoTimeout))
        # FILE sink: its transaction log (_spark_metadata) is what makes
        # the recovery exactly-once — a replayed in-flight batch overwrites
        # its own manifest entry instead of appending duplicates
        return (deduped.writeStream.outputMode("append")
                .format("parquet").option("path", out_dir)
                .option("checkpointLocation", ckpt).start())

    # incarnation 1: process a couple of micro-batches, then "crash"
    q1 = start()
    try:
        while len(q1.recentProgress) < stop_after_batches:
            time.sleep(0.1)
    finally:
        q1.stop()

    # incarnation 2: fresh query object, SAME checkpoint — resumes source
    # offsets and the per-key state store, drains the remaining files
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    rows = spark.read.parquet(out_dir)
    return spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)


def run_neardup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash-LSH near-dup gate: the streaming twin of
    ``minhash_near_dups`` (same shingle -> Kirsch-Mitzenmacher minhash ->
    4x4 banding scheme, ``operators/dedup.py``), as a custom stateful
    operator.

    The signature is computed STATELESSLY per row — per-doc shingle array,
    per-seed minima via ``aggregate()`` folds, band buckets as md5 of each
    4-minimum slice — so the only stateful stage is bucket ownership:
    key = (band, bucket), state = first-owner doc_id. A doc whose 4 buckets
    are all first-claims is novel; any bucket owned by an EARLIER doc makes
    it a near-dup candidate (exactly LSH candidate semantics). At 100 TB
    the state store shards by bucket hash and the per-key state is one
    long — the continuous-ingest near-dedup gate in front of a corpus.

    Returns (doc_id, n_hit_bands, is_candidate) for every streamed doc.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import BAND_SIZE, N_HASHES

    staged = _stage_documents_staggered(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(staged))

    toks = F.filter(F.split(F.lower("text"), r"\s+"),
                    lambda t: F.length(t) > 0)
    with_ts = stream.where(F.length(F.trim("text")) > 0).select(
        "doc_id", toks.alias("ts"))
    n = F.size("ts")
    shs = F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - 3),
        lambda i: F.concat_ws(" ", F.col("ts").getItem(i),
                              F.col("ts").getItem(i + 1),
                              F.col("ts").getItem(i + 2))))
    # per-shingle double hash (one md5), then per-seed minima as a fold —
    # all row-local, no aggregation state
    pairs = F.transform(shs, lambda sh: F.struct(
        F.conv(F.substring(F.md5(sh), 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(F.md5(sh), 9, 8), 16, 10).cast("long").alias("h2")))
    mod = F.lit(4294967296)
    def _minhash(s: int):
        return F.aggregate(
            F.col("hp"), F.lit(4294967296).cast("long"),
            lambda acc, p: F.least(
                acc, (p.getField("h1") + F.lit(s) * p.getField("h2")) % mod))
    sig = (with_ts.where(n >= 3).select("doc_id", pairs.alias("hp"))
           .select("doc_id", *[_minhash(s).alias(f"m{s}")
                               for s in range(N_HASHES)]))
    band_rows = F.explode(F.array(*[
        F.struct(
            F.lit(b).cast("long").alias("band"),
            F.md5(F.concat_ws(",", *[F.col(f"m{s}").cast("string")
                                     for s in range(b * BAND_SIZE,
                                                    (b + 1) * BAND_SIZE)]))
             .alias("bucket"))
        for b in range(N_HASHES // BAND_SIZE)]))
    banded = (sig.select("doc_id", band_rows.alias("bb"))
              .select("doc_id", "bb.band", "bb.bucket"))

    claimed = (banded.groupBy("band", "bucket")
               .applyInPandasWithState(
                   _claim_bucket, NEARDUP_OUT_SCHEMA, NEARDUP_STATE_SCHEMA,
                   "append", GroupStateTimeout.NoTimeout))
    name = "neardup_" + uuid.uuid4().hex[:12]
    q = (claimed.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name)
    out = (rows.groupBy("doc_id")
           .agg(F.sum(F.when(F.col("owner") != F.col("doc_id"), 1)
                      .otherwise(0)).cast("long").alias("n_hit_bands"))
           .select("doc_id", "n_hit_bands",
                   (F.col("n_hit_bands") > 0).alias("is_candidate")))
    return spark.createDataFrame(_guarded_collect(out), schema=out.schema)


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks: error events joined to the
    SAME user's events in the preceding hour — the streaming twin of the
    batch ``interval_join_prior_events``. Both sides carry a watermark and
    the join condition bounds event time on both sides, so state retention
    is finite (Spark can drop buffered rows older than watermark + range).
    Returns (event_id, n_prior_1h) aggregated from the joined pairs."""
    staged = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(staged).schema

    err = (spark.readStream.schema(schema).parquet(staged)
           .where(F.col("event_type") == "error")
           .select(F.col("event_id"), F.col("user_id").alias("u1"),
                   F.col("ts").alias("t1"))
           .withWatermark("t1", "2 hours"))
    ev = (spark.readStream.schema(schema).parquet(staged)
          .select(F.col("user_id").alias("u2"), F.col("ts").alias("t2"))
          .withWatermark("t2", "2 hours"))
    joined = err.join(
        ev,
        (F.col("u2") == F.col("u1")) &
        (F.col("t2") >= F.col("t1") - F.expr("INTERVAL 1 HOUR")) &
        (F.col("t2") < F.col("t1")),
        "inner")

    name = "ssjoin_" + uuid.uuid4().hex[:12]
    q = (joined.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    pairs = spark.table(name)
    out = (pairs.groupBy("event_id")
           .agg(F.count("*").cast("long").alias("n_prior_1h")))
    return spark.createDataFrame(_guarded_collect(out), schema=out.schema)


# --- custom stateful operator: per-key cooldown (debounce) gate --------------

DEBOUNCE_OUT_SCHEMA = "user_id long, event_type string, event_id long, kept boolean"
DEBOUNCE_STATE_SCHEMA = "last_kept_us long"

_COOLDOWN_US = 3_600_000_000  # 1 hour


def _cooldown_gate(key, pdfs, state):
    """applyInPandasWithState hook for one (user_id, event_type) key: keep
    an event iff >= 1h has passed since the last KEPT event — the
    recursive kept-gap semantics no window expression can state (each
    verdict depends on the previous verdict, not the previous row).
    Events are processed in event-time order within the micro-batch; the
    last kept timestamp is the only state (one long per key)."""
    import pandas as pd
    batch = pd.concat([p for p in pdfs if len(p)], ignore_index=True) \
        if pdfs else pd.DataFrame()
    if not len(batch):
        return
    batch = batch.sort_values(["ts", "event_id"])
    last = int(state.get[0]) if state.exists else None
    kept = []
    for t in batch.itertuples():
        us = t.ts.value // 1000  # pandas ns -> micros
        ok = last is None or us - last >= _COOLDOWN_US
        if ok:
            last = us
        kept.append(ok)
    state.update((int(last),))
    yield pd.DataFrame({
        "user_id": [int(key[0])] * len(batch),
        "event_type": [str(key[1])] * len(batch),
        "event_id": batch["event_id"].astype("int64").tolist(),
        "kept": kept,
    })


def run_debounce_stream(spark: SparkSession, sf_dir: str,
                        single_batch: bool = False) -> DataFrame:
    """Streaming debounce gate: per-(user, event_type) cooldown verdicts as
    a custom stateful operator. Unlike the BATCH ``debounced_event_counts``
    (stateless raw-gap lag — oracle-checkable), this implements the
    stricter KEPT-gap recursion (>= 1h since the last kept event), which is
    inherently sequential per key: exactly the shape
    ``applyInPandasWithState`` exists for. State = one epoch-micros long
    per key; the store shards by key hash and scales horizontally.

    ``single_batch=True`` drains the staged fixture in one micro-batch
    (deterministic event-time order end to end), which the test compares
    against an in-pandas reference; the default multi-batch run exercises
    cross-batch state carry-over. Both paths stream the CHRONOLOGICALLY
    staged daily slices (r08): a key's next event is never in an earlier
    micro-batch and the gate sorts within each batch, so the multi-batch
    verdict sequence equals the global (ts, event_id)-order recursion —
    what makes the registered query's recursive-CTE oracle
    (``operators/windows.DEBOUNCE_GATE_ORACLE``) exact."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    staged = _stage_events_daily(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    reader = spark.readStream.schema(schema)
    if not single_batch:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(staged).select(
        "user_id", "event_type", "event_id", "ts")
    gated = (stream.groupBy("user_id", "event_type")
             .applyInPandasWithState(
                 _cooldown_gate, DEBOUNCE_OUT_SCHEMA, DEBOUNCE_STATE_SCHEMA,
                 "append", GroupStateTimeout.NoTimeout))
    name = "debounce_" + uuid.uuid4().hex[:12]
    q = (gated.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name)
    return spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)


# --- foreachBatch upsert sink: latest-wins CDC compaction -------------------

def run_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert sink via ``foreachBatch``: each micro-batch's
    latest-per-user rows MERGE into a parquet state table
    (read-modify-write full-snapshot compaction — the idempotent upsert
    pattern when the table format lacks transactional MERGE; with
    Delta/Iceberg the body becomes one MERGE INTO and the stream code is
    unchanged). Batch-internal dedup first (latest (ts, event_id) per
    user), then anti-join style reconciliation: state rows lose to newer
    batch rows on (ts, event_id) total order.

    Scale shape: state is user-cardinality (not event-cardinality); each
    batch shuffles only batch keys + state keys, and the rewrite is
    partitioned by user-hash bucket at a real deployment (only buckets
    containing updated users rewrite). Returns the final compacted state —
    asserted equal to the batch `latest_event_per_user` plan in
    tests/test_streaming.py."""
    from pyspark.sql import Window

    staged = _stage_events(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    # 4-file split so the stream sees multiple micro-batches
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(staged))
    state_dir = os.path.join(_STAGE_ROOT,
                             "upsert_state_" + uuid.uuid4().hex[:12])

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        sp = batch.sparkSession
        w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                                  F.desc("event_id"))
        latest = (batch.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") == 1)
                  .select("user_id", "event_id", "ts", "event_type", "value"))
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            state = sp.read.parquet(state_dir)
            merged = (state.unionByName(latest)
                      .withColumn("rn", F.row_number().over(w))
                      .where(F.col("rn") == 1).drop("rn"))
        else:
            merged = latest
        # rewrite via a staging dir: the read above streams from state_dir,
        # so writing in place would clobber inputs mid-scan
        tmp = state_dir + "_next"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.replace(tmp, state_dir)

    q = (stream.writeStream.foreachBatch(merge_batch)
         .option("checkpointLocation",
                 state_dir + "_ckpt")
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(state_dir)
    out = spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)
    shutil.rmtree(state_dir, ignore_errors=True)
    shutil.rmtree(state_dir + "_ckpt", ignore_errors=True)
    return out


# --- round 6: temporal-op twins (CUSUM + inter-arrival) ----------------------

def _stage_events_daily(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as SIX chronologically ordered parquet slices (5-6
    calendar days each, strictly increasing mtimes) so maxFilesPerTrigger=1
    replays the month as ordered micro-batches — an append-only event-log
    tail. Chronological slicing is what makes per-user gap state exact:
    a user's next event is never in an EARLIER batch, and same-ts ties
    (same day by definition) always land in the same slice."""
    tag = "events_daily_" + sf_dir.strip("/").replace("/", "_")
    out = os.path.join(_STAGE_ROOT, tag)
    marker = os.path.join(out, "_STAGED")
    if not os.path.exists(marker):
        # Interruption safety: build the slices in a TEMP directory and
        # atomically rename into place.  Appending directly into `out` and
        # writing the marker last leaves a trap: an interrupted run leaves
        # partial slices with no marker, and the rerun's mode('append')
        # stacks a second copy of every event on top — all streaming twins
        # then silently double their input.  A markerless `out` is
        # therefore garbage by definition and is removed first.
        shutil.rmtree(out, ignore_errors=True)
        tmp = out + "_building"
        shutil.rmtree(tmp, ignore_errors=True)
        ev = table(spark, sf_dir, "events")
        seen: set[str] = set()
        base = 1_600_000_000
        for i in range(6):
            sl = ev.where(F.floor((F.dayofmonth("ts") - 1) / 6) == i)
            sl.coalesce(1).write.mode("append").parquet(tmp)
            for f in sorted(os.listdir(tmp)):
                if f.endswith(".parquet") and f not in seen:
                    seen.add(f)
                    os.utime(os.path.join(tmp, f), (base + i, base + i))
        with open(os.path.join(tmp, "_STAGED"), "w") as fh:
            fh.write("ok")
        os.replace(tmp, out)
    return out


GAP_OUT_SCHEMA = "event_type string, gap_us long"
GAP_STATE_SCHEMA = "last_us long"


def _gap_walk(key, pdfs, state):
    """applyInPandasWithState hook for one user: emit (event_type, gap_us)
    for every consecutive-event gap, carrying the last-seen timestamp
    across micro-batches. Vectorized: sort the batch by (us, event_id),
    shift, prepend the state's last_us."""
    import numpy as np
    import pandas as pd
    parts = [p for p in pdfs if len(p)]
    if not parts:
        return
    pdf = (pd.concat(parts).sort_values(["us", "event_id"])
           if len(parts) > 1 else parts[0].sort_values(["us", "event_id"]))
    us = pdf["us"].to_numpy(dtype="int64")
    last_us = state.get[0] if state.exists else None
    prev = np.concatenate(([last_us if last_us is not None else 0], us[:-1]))
    # with no carried state the first event of the batch has no gap
    start = 0 if last_us is not None else 1
    state.update((int(us[-1]),))
    gaps = (us - prev)[start:]
    if len(gaps):
        yield pd.DataFrame({"event_type": pdf["event_type"].to_numpy()[start:],
                            "gap_us": gaps.astype("int64")})


def run_interarrival_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming inter-arrival extraction as a custom stateful operator:
    key = user_id, state = last event timestamp (micros), output = one row
    per consecutive gap, attributed to the LATER event's type — the
    streaming twin of the LAG window inside
    ``operators.windows.user_interarrival_stats``. The rollup reuses the
    batch tail (``interarrival_stats``), so the pytest equality gate
    isolates exactly the stateful gap extraction."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.windows import interarrival_stats
    staged = _stage_events_daily(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(staged))
    keyed = stream.select("user_id", "event_id", "event_type",
                          F.unix_micros("ts").alias("us"))
    gaps = (keyed.groupBy("user_id")
            .applyInPandasWithState(
                _gap_walk, GAP_OUT_SCHEMA, GAP_STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))
    name = "gaps_" + uuid.uuid4().hex[:12]
    q = (gaps.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name)
    mat = spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)
    return interarrival_stats(mat)


def run_hourly_cusum_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CUSUM changepoint: a watermarked tumbling-1h count per
    event type maintains the hourly aggregate as the stream drains the
    ordered daily slices; the CUSUM walk + peak pick then runs BATCH-SIDE
    over the stream-maintained aggregate (``operators.windows.cusum_tail``)
    — chained stateful aggregations are restricted in Structured
    Streaming, and the aggregate-in-stream / scan-in-batch split is how
    the op deploys in production anyway."""
    from ..operators.windows import cusum_tail
    staged = _stage_events_daily(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(staged))
    hourly = (stream
              .withWatermark("ts", "2 hours")
              .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count("*").cast("long").alias("n"))
              .select(F.col("w.start").alias("h"), "event_type", "n"))
    name = "cusum_" + uuid.uuid4().hex[:12]
    q = (hourly.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name)
    mat = spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)
    return cusum_tail(mat)


FUNNEL_OUT_SCHEMA = "user_id long, stage long"
FUNNEL_STATE_SCHEMA = "stage long, t_us long"


def _funnel_walk(key, pdfs, state):
    """applyInPandasWithState hook for one user: a stage machine over the
    chronological event stream. State = (stages completed, time of the
    last completed step); a row advances the machine iff it is the NEXT
    step's type and strictly after the last step time — exactly the batch
    operator's min-qualifying-time recurrence, because the walk runs in
    (ts, event_id) order and takes the FIRST qualifying event. Emits one
    (user_id, stage) row per advance; a user advances to each stage at
    most once across all micro-batches, so counting emitted rows per
    stage IS the funnel table."""
    import pandas as pd

    from ..operators.windows import FUNNEL_STEPS
    parts = [p for p in pdfs if len(p)]
    if not parts:
        return
    pdf = (pd.concat(parts) if len(parts) > 1 else parts[0]).sort_values(
        ["us", "event_id"])
    stage, t_us = state.get if state.exists else (0, -1)
    advanced = []
    for et, us in zip(pdf["event_type"], pdf["us"]):
        if stage >= len(FUNNEL_STEPS):
            break
        if et == FUNNEL_STEPS[stage] and (stage == 0 or us > t_us):
            stage += 1
            t_us = int(us)
            advanced.append(stage)
    state.update((int(stage), int(t_us)))
    if advanced:
        yield pd.DataFrame({"user_id": [key[0]] * len(advanced),
                            "stage": advanced})


def run_funnel_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``operators.windows.user_funnel_conversion``: the
    ordered view->click->purchase funnel maintained as per-user state over
    the month replayed as chronological daily micro-batches. The memory
    sink collects stage-advance events; the bounded 3-row conversion
    table is assembled exactly as the batch operator assembles it, so the
    pytest equality gate isolates the stateful stage machine."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.windows import FUNNEL_STEPS
    staged = _stage_events_daily(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(staged))
    keyed = stream.select("user_id", "event_id", "event_type",
                          F.unix_micros("ts").alias("us"))
    adv = (keyed.groupBy("user_id")
           .applyInPandasWithState(
               _funnel_walk, FUNNEL_OUT_SCHEMA, FUNNEL_STATE_SCHEMA,
               "append", GroupStateTimeout.NoTimeout))
    name = "funnel_" + uuid.uuid4().hex[:12]
    q = (adv.writeStream.outputMode("append")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name)
    mat = spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)
    counts = {r["stage"]: r["n"] for r in
              mat.groupBy("stage").agg(F.count("*").alias("n")).collect()}
    n1, n2, n3 = (counts.get(1, 0), counts.get(2, 0), counts.get(3, 0))
    # same all-defined conversion convention (and same half-up rounding,
    # matching SQL ROUND on dyadic midpoints) as the batch operator
    conv = lambda num, den: (0.0 if den == 0
                             else round_half_up(float(num) / float(den), 6))
    return spark.createDataFrame(
        [(1, FUNNEL_STEPS[0], int(n1), 1.0 if n1 else 0.0),
         (2, FUNNEL_STEPS[1], int(n2), conv(n2, n1)),
         (3, FUNNEL_STEPS[2], int(n3), conv(n3, n2))],
        "step int, event_type string, n_users long, conv_from_prev double")


def run_hq_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``operators.scale.histogram_quantile_rollup``:
    the per-day histogram STATES (day x bin counts — the mergeable sketch)
    are maintained by a watermarked streaming aggregate as the ordered
    daily slices drain; the week merge + median walk then runs batch-side
    over the stream-maintained states (``scale.hq_rollup_tail``), exactly
    the aggregate-in-stream / scan-in-batch split of the CUSUM twin. The
    exact-median comparison column is computed batch-side from the staged
    data — it exists to certify the sketch's bound, not as stream state."""
    from ..operators.scale import HQ_BIN_W, hq_rollup_tail
    staged = _stage_events_daily(spark, sf_dir)
    schema = spark.read.parquet(staged).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(staged)
              .where(F.col("value").isNotNull()))
    day_state = (stream
                 .withWatermark("ts", "25 hours")
                 .groupBy(F.window("ts", "1 day").alias("w"),
                          F.floor(F.col("value") / HQ_BIN_W).cast("long")
                           .alias("bin"))
                 .agg(F.count("*").alias("c"))
                 .select(F.col("w.start").alias("day"), "bin", "c"))
    name = "hq_" + uuid.uuid4().hex[:12]
    q = (day_state.writeStream.outputMode("complete")
         .format("memory").queryName(name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table(name)
    mat = spark.createDataFrame(_guarded_collect(rows), schema=rows.schema)
    ev = spark.read.parquet(staged).where(F.col("value").isNotNull())
    exact = (ev.groupBy(F.date_trunc("week", "ts").alias("week"))
             .agg(F.expr("percentile(value, 0.5)").alias("exact_median")))
    return hq_rollup_tail(mat, exact)
