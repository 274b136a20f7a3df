"""Streaming == batch equivalence for the windowed aggregations, plus
multimodal mapInPandas plumbing checks."""

from __future__ import annotations

from fts_errors_clustering_spark.operators.multimodal import (
    decode_image, fake_decode_brightness, multimodal_features)
from fts_errors_clustering_spark.operators.windows import \
    tumbling_hourly_by_type
from fts_errors_clustering_spark.streaming.jobs import run_tumbling_stream

from .conftest import SF_SMALL


def _keyed(rows):
    return {(r.window_start, r.event_type): (r.n, r.sum_value) for r in rows}


def test_streaming_equals_batch(spark):
    batch = _keyed(tumbling_hourly_by_type(spark, SF_SMALL).collect())
    stream = _keyed(run_tumbling_stream(spark, SF_SMALL).collect())
    assert batch == stream


def test_multimodal_features_deterministic(spark):
    a = {r.doc_id: r for r in multimodal_features(spark, SF_SMALL).collect()}
    b = {r.doc_id: r for r in multimodal_features(spark, SF_SMALL).collect()}
    assert a.keys() == b.keys() and len(a) == 500
    for k in a:
        assert a[k] == b[k]
        assert 0.0 <= a[k].brightness <= 1.0
        assert a[k].frame_bytes * 1 <= a[k].byte_len


def test_framesample_invariants(spark):
    """Row-expanding mapInPandas sampler: ≤K frames per doc, evenly spaced,
    offsets/lengths consistent with the payload slicing, deterministic."""
    from fts_errors_clustering_spark.operators.multimodal import (
        FRAME_SAMPLE_K, multimodal_framesample, with_payload)
    from fts_errors_clustering_spark.sources.readers import table

    frames = multimodal_framesample(spark, SF_SMALL).collect()
    meta = {r.doc_id: r for r in
            with_payload(table(spark, SF_SMALL, "documents"))
            .drop("payload").collect()}
    per_doc: dict[int, list] = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) <= set(meta)
    for doc_id, rows in per_doc.items():
        m = meta[doc_id]
        assert len(rows) == min(FRAME_SAMPLE_K, m.n_frames)
        idxs = sorted(r.frame_idx for r in rows)
        assert len(set(idxs)) == len(idxs)          # distinct frames
        flen = max(1, m.byte_len // m.n_frames)
        for r in rows:
            assert 0 <= r.frame_idx < m.n_frames
            assert r.frame_off == r.frame_idx * flen
            assert 0.0 <= r.brightness <= 1.0
    again = multimodal_framesample(spark, SF_SMALL).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))


def test_dedup_clusters_invariants(spark):
    """Connected-components dedup: every planted dup (d, d+100000) lands in
    the same cluster with canonical = d; exactly one keep row per cluster;
    cluster sizes consistent."""
    from fts_errors_clustering_spark.plans.registry import all_queries

    rows = all_queries()["dedup_clusters"].fn(spark, SF_SMALL).collect()
    by_doc = {r.doc_id: r for r in rows}
    for d in range(20):
        if d in by_doc and d + 100000 in by_doc:
            assert by_doc[d + 100000].canonical_id == by_doc[d].canonical_id
            assert by_doc[d].canonical_id <= d
    clusters: dict[int, list] = {}
    for r in rows:
        clusters.setdefault(r.canonical_id, []).append(r)
    for canon, members in clusters.items():
        assert sum(1 for m in members if m.keep) == 1
        assert all(m.cluster_size == len(members) for m in members)
        assert min(m.doc_id for m in members) == canon


def test_decode_stub_contract():
    import pytest
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    assert fake_decode_brightness(b"") == 0.0
    assert abs(fake_decode_brightness(bytes([255, 255])) - 1.0) < 1e-12


def test_stateful_dedup_matches_batch_semantics(spark):
    """applyInPandasWithState first-seen dedup: exactly one emission per
    distinct text (cross-batch duplicate suppression — the planted dups are
    staged into later micro-batches), each emitted doc_id a member of its
    hash group."""
    from pyspark.sql import functions as F

    from fts_errors_clustering_spark.sources.readers import table
    from fts_errors_clustering_spark.streaming.jobs import \
        run_stateful_dedup_stream

    out = run_stateful_dedup_stream(spark, SF_SMALL).collect()
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "text")
    staged = docs.unionByName(
        docs.where(F.col("doc_id") < 20)
            .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    batch = staged.select(F.md5("text").alias("h"), "doc_id").collect()
    groups = {}
    for r in batch:
        groups.setdefault(r.h, set()).add(r.doc_id)
    assert len(out) == len(groups)          # one emission per distinct text
    assert {r.text_hash for r in out} == set(groups)
    for r in out:
        assert r.doc_id in groups[r.text_hash]
    # the planted duplicates (doc_id >= 100000) arrive in the LAST file;
    # their originals were already seen, so no +100000 id may be emitted
    assert all(r.doc_id < 100000 for r in out)


def test_stream_stream_join_equals_batch(spark):
    """Watermarked stream-stream interval join == batch interval join on
    the same fixture (restricted to errors with at least one prior event,
    since the streaming side is an inner join)."""
    from fts_errors_clustering_spark.operators.relational import \
        interval_join_prior_events
    from fts_errors_clustering_spark.streaming.jobs import \
        run_stream_stream_join

    batch = {r.event_id: r.n_prior_1h
             for r in interval_join_prior_events(spark, SF_SMALL).collect()
             if r.n_prior_1h > 0}
    stream = {r.event_id: r.n_prior_1h
              for r in run_stream_stream_join(spark, SF_SMALL).collect()}
    assert stream == batch


def test_streaming_neardup_gate_planted_recall(spark):
    """The streaming MinHash-LSH gate must flag every planted exact
    duplicate (identical text arriving in a LATER micro-batch than its
    original) as a candidate on ALL bands — identical signatures share all
    4 buckets, whose state the original claimed first. Originals own at
    least the buckets their dups hit, so no planted id may be an owner."""
    from fts_errors_clustering_spark.streaming.jobs import run_neardup_stream

    out = {r.doc_id: r for r in run_neardup_stream(spark, SF_SMALL).collect()}
    planted = [r for i, r in out.items() if i >= 100000]
    assert len(planted) == 20
    for r in planted:
        assert r.is_candidate and r.n_hit_bands == 4, r
    # every planted dup's original streamed earlier and was emitted too
    for i in range(20):
        assert i in out or (i + 100000) not in out


def test_stateful_dedup_checkpoint_recovery(spark, tmp_path):
    """Kill the stateful dedup stream after 2 micro-batches, restart from
    the same checkpoint, drain. The resumed state store + file-sink
    transaction log must give EXACTLY the batch dedup result across both
    incarnations — nothing lost to the crash, nothing emitted twice."""
    from pyspark.sql import functions as F

    from fts_errors_clustering_spark.sources.readers import table
    from fts_errors_clustering_spark.streaming.jobs import \
        run_dedup_stream_with_recovery

    out = run_dedup_stream_with_recovery(
        spark, SF_SMALL, str(tmp_path / "recovery")).collect()
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "text")
    staged = docs.unionByName(
        docs.where(F.col("doc_id") < 20)
            .select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    batch = staged.select(F.md5("text").alias("h"), "doc_id").collect()
    groups: dict[str, set] = {}
    for r in batch:
        groups.setdefault(r.h, set()).add(r.doc_id)
    # exactly one emission per distinct text across BOTH incarnations
    assert len(out) == len(groups), (len(out), len(groups))
    assert {r.text_hash for r in out} == set(groups)
    for r in out:
        assert r.doc_id in groups[r.text_hash]


def test_streaming_debounce_single_batch_matches_reference(spark):
    """Single-batch drain (deterministic event-time order end to end) must
    equal the in-pandas kept-gap cooldown reference exactly."""
    from fts_errors_clustering_spark.sources.readers import table
    from fts_errors_clustering_spark.streaming.jobs import run_debounce_stream

    out = run_debounce_stream(spark, SF_SMALL, single_batch=True)
    got = {r.event_id: r.kept for r in out.collect()}

    ev = (table(spark, SF_SMALL, "events")
          .select("user_id", "event_type", "event_id", "ts").toPandas())
    ref = {}
    for _, g in ev.groupby(["user_id", "event_type"]):
        g = g.sort_values(["ts", "event_id"])
        last = None
        for r in g.itertuples():
            us = r.ts.value // 1000
            ok = last is None or us - last >= 3_600_000_000
            if ok:
                last = us
            ref[r.event_id] = ok
    assert got == ref


def test_streaming_debounce_cross_batch_invariants(spark):
    """Multi-batch run (state carried across micro-batches): every event
    gets exactly one verdict and every key keeps at least one event."""
    import collections

    from fts_errors_clustering_spark.sources.readers import table
    from fts_errors_clustering_spark.streaming.jobs import run_debounce_stream

    rows = run_debounce_stream(spark, SF_SMALL).collect()
    n_events = table(spark, SF_SMALL, "events").count()
    assert len(rows) == n_events
    kept_by_key = collections.defaultdict(list)
    for r in rows:
        kept_by_key[(r.user_id, r.event_type)].append(r.kept)
    assert all(any(v) for v in kept_by_key.values())


def test_upsert_stream_equals_batch_compaction(spark):
    """The foreachBatch MERGE state after draining all micro-batches must
    equal the one-shot batch latest-wins compaction exactly."""
    from fts_errors_clustering_spark.plans.registry import all_queries
    from fts_errors_clustering_spark.streaming.jobs import run_upsert_stream

    from .conftest import SF_SMALL

    got = {(r.user_id, r.event_id, r.ts, r.event_type, r.value)
           for r in run_upsert_stream(spark, SF_SMALL).collect()}
    want = {(r.user_id, r.event_id, r.ts, r.event_type, r.value)
            for r in all_queries()["latest_event_per_user"]
            .fn(spark, SF_SMALL).collect()}
    assert got == want and len(got) > 0


def test_streaming_interarrival_equals_batch(spark):
    """The stateful gap extraction (per-user last-ts state across ordered
    daily micro-batches) must reproduce the batch LAG window exactly —
    same per-type gap counts and identical quantiles."""
    from fts_errors_clustering_spark.operators.windows import \
        user_interarrival_stats
    from fts_errors_clustering_spark.streaming.jobs import \
        run_interarrival_stream
    batch = {r.event_type: r for r in
             user_interarrival_stats(spark, SF_SMALL).collect()}
    stream = {r.event_type: r for r in
              run_interarrival_stream(spark, SF_SMALL).collect()}
    assert batch.keys() == stream.keys()
    for k in batch:
        assert batch[k] == stream[k], f"{k}: {batch[k]} != {stream[k]}"


def test_streaming_cusum_equals_batch(spark):
    """The stream-maintained hourly aggregate fed through the shared CUSUM
    tail must land on the same changepoint hour and peak value as the
    batch plan."""
    from fts_errors_clustering_spark.operators.windows import \
        hourly_cusum_changepoint
    from fts_errors_clustering_spark.streaming.jobs import \
        run_hourly_cusum_stream
    batch = {r.event_type: r for r in
             hourly_cusum_changepoint(spark, SF_SMALL).collect()}
    stream = {r.event_type: r for r in
              run_hourly_cusum_stream(spark, SF_SMALL).collect()}
    assert batch == stream or (
        batch.keys() == stream.keys()
        and all(batch[k] == stream[k] for k in batch))


def test_streaming_funnel_equals_batch(spark):
    """The per-user stage machine (state carried across chronological
    micro-batches) must reproduce the batch funnel's min-qualifying-time
    recurrence exactly — same step counts, same conversions."""
    from fts_errors_clustering_spark.operators.windows import \
        user_funnel_conversion
    from fts_errors_clustering_spark.streaming.jobs import run_funnel_stream
    batch = {r.step: r for r in
             user_funnel_conversion(spark, SF_SMALL).collect()}
    stream = {r.step: r for r in run_funnel_stream(spark, SF_SMALL).collect()}
    assert batch.keys() == stream.keys()
    for k in batch:
        assert batch[k] == stream[k], f"step {k}: {batch[k]} != {stream[k]}"


def test_streaming_hq_rollup_equals_batch(spark):
    """The stream-maintained daily histogram states fed through the shared
    merge/median tail must equal the batch rollup exactly."""
    from fts_errors_clustering_spark.operators.scale import \
        histogram_quantile_rollup
    from fts_errors_clustering_spark.streaming.jobs import run_hq_rollup_stream
    batch = {r.week: r for r in
             histogram_quantile_rollup(spark, SF_SMALL).collect()}
    stream = {r.week: r for r in run_hq_rollup_stream(spark, SF_SMALL).collect()}
    assert batch.keys() == stream.keys()
    for k in batch:
        assert batch[k] == stream[k], f"{k}: {batch[k]} != {stream[k]}"


def test_multimodal_audio_invariants(spark):
    """Audio featurizer: deterministic across runs; RMS/ZCR in [0, 1];
    frame count = n_samples // FRAME; duration consistent with the
    sample-rate constant; framewise peak >= full-signal RMS is NOT
    guaranteed, but both must be positive whenever samples exist."""
    from fts_errors_clustering_spark.operators.multimodal import (
        AUDIO_FRAME, AUDIO_SAMPLE_RATE, multimodal_audio_features)
    a = {r.doc_id: r for r in
         multimodal_audio_features(spark, SF_SMALL).collect()}
    b = {r.doc_id: r for r in
         multimodal_audio_features(spark, SF_SMALL).collect()}
    assert a.keys() == b.keys() and len(a) == 500
    for k, r in a.items():
        assert r == b[k]
        assert 0.0 <= r.rms <= 1.0 and 0.0 <= r.zero_cross_rate <= 1.0
        assert r.n_frames == r.n_samples // AUDIO_FRAME
        assert abs(r.duration_s - round(r.n_samples / AUDIO_SAMPLE_RATE, 6)) < 1e-9
        if r.n_samples:
            assert r.rms > 0.0
        if r.n_frames:
            assert r.max_frame_rms > 0.0


def test_funnel_min_times_parameterized(spark):
    """The min-time recurrence must work for an ARBITRARY step sequence,
    not just the registered default: run it on the reversed-ish funnel
    (signup -> view) and verify each frame against a brute-force pandas
    walk of the strict-after recurrence."""
    from fts_errors_clustering_spark.operators.windows import \
        funnel_min_times
    from fts_errors_clustering_spark.sources.readers import table

    steps = ("signup", "view")
    ev = table(spark, SF_SMALL, "events")
    f1, f2 = funnel_min_times(ev, steps)

    pdf = ev.select("user_id", "event_type", "ts").toPandas()
    t1 = (pdf[pdf.event_type == steps[0]].groupby("user_id").ts.min())
    got1 = {r.user_id: r.t1 for r in f1.collect()}
    assert got1 == {int(u): t.to_pydatetime() for u, t in t1.items()}

    want2 = {}
    for u, t_first in t1.items():
        later = pdf[(pdf.user_id == u) & (pdf.event_type == steps[1])
                    & (pdf.ts > t_first)]
        if len(later):
            want2[int(u)] = later.ts.min().to_pydatetime()
    got2 = {r.user_id: r.t2 for r in f2.collect()}
    assert got2 == want2 and len(got2) > 0
