"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus the decode/feature-extract plumbing as Arrow-batched
``mapInPandas`` (BASELINE.json north star).

The fixture set has no binary table, so payloads are derived
deterministically from ``documents.text`` (UTF-8 encode) — identically in
Spark and the oracle — which keeps the schema/partitioning/UDF plumbing
fully real while the codec is a stub: real decoders (PIL/ffmpeg) are not in
this environment, so ``decode_image`` raises ``NotImplementedError`` and the
pipeline runs the clearly-marked deterministic fake.

Scale notes: payload columns ride along parquet row groups; the decode pass
is ``mapInPandas`` so bytes stream per Arrow batch (no per-row pickling and
no driver collect); metadata-only queries never touch the payload column
(column pruning — verify with ``.explain`` that ``ReadSchema`` excludes it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.readers import table


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the deterministic binary payload + typed metadata columns.
    Width and height come from DISJOINT md5 substrings so the fake metadata
    is not perfectly correlated (realistic aspect-ratio variety)."""
    h_w = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    h_h = F.conv(F.substring(F.md5("text"), 9, 8), 16, 10).cast("long")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.length(payload).cast("long").alias("byte_len"),
        (h_w % 640 + 1).alias("width"),
        (h_h % 480 + 1).alias("height"),
        (F.length(payload).cast("long") % 30 + 1).alias("n_frames"),
    )


def decode_image(payload: bytes):
    """REAL decode stub: no image codec ships in this environment.

    A production build plugs PIL/libvips here; the Spark-side contract
    (bytes in, ndarray-like out) is what the pipeline tests.
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_decode_brightness for the deterministic test path")


def fake_decode_brightness(payload: bytes) -> float:
    """Deterministic fake decode: mean byte value / 255 as 'brightness'."""
    if not payload:
        return 0.0
    return sum(payload) / len(payload) / 255.0


FEATURE_SCHEMA = ("doc_id long, byte_len long, width long, height long, "
                  "brightness double, aspect double, frame_bytes long")


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas feature extractor: per Arrow batch, 'decode' each payload
    and emit typed features. Batch-shaped (vectorized over the pandas frame),
    no Python-per-row in the Spark row pipeline."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "byte_len": pdf["byte_len"],
            "width": pdf["width"],
            "height": pdf["height"],
            "brightness": [fake_decode_brightness(p) for p in payloads],
            "aspect": pdf["width"] / pdf["height"],
            "frame_bytes": pdf["byte_len"] // pdf["n_frames"],
        })


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 640 + 1 AS width,
           CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 480 + 1 AS height,
           CAST(octet_length(encode(text)) AS BIGINT) % 30 + 1 AS n_frames
    FROM documents
    """,
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads — the query pattern that must
    NEVER read the payload bytes (column pruning keeps the scan narrow)."""
    docs = table(spark, sf_dir, "documents")
    return with_payload(docs).drop("payload")


@register(
    "multimodal_features",
    oracle="""
    WITH meta AS (
      SELECT doc_id, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 640 + 1
               AS width,
             CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 480 + 1
               AS height,
             CAST(octet_length(encode(text)) AS BIGINT) % 30 + 1 AS n_frames
      FROM documents
    )
    SELECT doc_id, byte_len, width, height,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE (list_aggregate(list_transform(
                        range(1, length(text) + 1),
                        i -> ascii(substr(text, i, 1))), 'sum')
                      / CAST(length(text) AS DOUBLE)) / 255.0
           END AS brightness,
           CAST(width AS DOUBLE) / height AS aspect,
           byte_len // n_frames AS frame_bytes
    FROM meta
    """,
    tags=("multimodal", "udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas. The fake codec (mean byte
    value / 255 as brightness) is deterministic AND byte-arithmetic, so the
    oracle replays it in SQL via per-character code points — equal to bytes
    because the fixture corpus is ASCII (asserted for all SFs; a non-ASCII
    corpus would re-demote this to rows-only). Batch shape asserted in
    tests/test_multimodal.py."""
    docs = table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(extract_features, FEATURE_SCHEMA)


# --- frame sampling (video-shaped payloads) ----------------------------------

FRAME_SAMPLE_K = 4  # evenly-spaced frames sampled per payload

FRAME_SCHEMA = ("doc_id long, frame_idx long, frame_off long, "
                "frame_len long, brightness double")


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas frame sampler: treat each payload as ``n_frames`` equal
    byte-slices, emit min(K, n_frames) evenly-spaced frames with a
    deterministic per-frame feature (mean byte value of the slice — the
    stand-in for a real ffmpeg keyframe decode, which this environment
    doesn't ship). Row-EXPANDING mapInPandas: one input row -> up to K
    output rows, all inside the Arrow batch."""
    for pdf in batches:
        out = {k: [] for k in
               ("doc_id", "frame_idx", "frame_off", "frame_len", "brightness")}
        for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]):
            payload = payload or b""
            n_frames = int(n_frames) if len(payload) else 0
            if n_frames < 1:
                continue
            flen = max(1, len(payload) // n_frames)
            k = min(FRAME_SAMPLE_K, n_frames)
            for j in range(k):
                idx = (j * n_frames) // k
                sl = payload[idx * flen:(idx + 1) * flen]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_off"].append(idx * flen)
                out["frame_len"].append(len(sl))
                out["brightness"].append(
                    sum(sl) / len(sl) / 255.0 if sl else 0.0)
        yield pd.DataFrame(out)


@register(
    "multimodal_framesample",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id, text,
             CAST(octet_length(encode(text)) AS BIGINT) AS blen,
             CAST(octet_length(encode(text)) AS BIGINT) % 30 + 1 AS n_frames
      FROM documents WHERE octet_length(encode(text)) > 0
    ),
    fr AS (
      SELECT doc_id, text, n_frames,
             GREATEST(1, blen // n_frames) AS flen,
             LEAST({FRAME_SAMPLE_K}, n_frames) AS k,
             unnest(range(0, LEAST({FRAME_SAMPLE_K}, n_frames))) AS j
      FROM meta
    ),
    sl AS (
      SELECT doc_id,
             (j * n_frames) // k AS frame_idx,
             ((j * n_frames) // k) * flen AS frame_off,
             substr(text, CAST(((j * n_frames) // k) * flen + 1 AS BIGINT),
                    CAST(flen AS BIGINT)) AS s
      FROM fr
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(frame_off AS BIGINT) AS frame_off,
           CAST(length(s) AS BIGINT) AS frame_len,
           CASE WHEN length(s) = 0 THEN 0.0
                ELSE (list_aggregate(list_transform(
                        range(1, length(s) + 1),
                        i -> ascii(substr(s, i, 1))), 'sum')
                      / CAST(length(s) AS DOUBLE)) / 255.0
           END AS brightness
    FROM sl
    """,
    tags=("multimodal", "udf"),
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-shaped payloads: evenly-spaced keyframe
    selection as a row-expanding ``mapInPandas``. The slicing codec is byte
    arithmetic over the payload, so the oracle replays it with char-slice
    code points — equal to bytes on the ASCII fixture corpus (same
    precondition as ``multimodal_features``; a real binary corpus demotes
    this to rows-only). Row-count/offset invariants additionally asserted
    in tests/test_multimodal.py. The 100 TB posture matches decode: payload
    bytes stream per Arrow batch, never through the driver, and the output
    is a per-frame relation ready for downstream feature joins."""
    docs = table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(sample_frames, FRAME_SCHEMA)


# --- round 6: audio-shaped payload features -----------------------------------

#: fake-waveform geometry: bytes reinterpreted as 8-bit PCM samples
AUDIO_SAMPLE_RATE = 8000
AUDIO_FRAME = 256  # samples per analysis frame (32 ms at 8 kHz)

AUDIO_SCHEMA = ("doc_id long, n_samples long, duration_s double, "
                "rms double, zero_cross_rate double, n_frames long, "
                "max_frame_rms double")


def decode_audio(payload: bytes):
    """REAL decode stub: no audio codec (ffmpeg/soundfile) ships in this
    environment. A production build plugs the codec here; the Spark-side
    contract (bytes in, float waveform out) is what the pipeline tests."""
    raise NotImplementedError(
        "audio codec not available in this environment; "
        "use the deterministic PCM reinterpretation in extract_audio")


def extract_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas audio featurizer: per Arrow batch, reinterpret each
    payload as centered 8-bit PCM and compute duration, full-signal RMS,
    zero-crossing rate, and framewise peak RMS (the VAD/clipping-screen
    statistics an audio-curation pass gates on). All numpy per payload —
    no per-row Python beyond the batch loop, no driver collect.

    Rounding is ``round_half_up`` (NOT Python's banker's ``round``): a
    constant payload of one odd-deviation byte value makes the true RMS
    k/128 — a terminating 7-decimal ending in 5 (1/128 = 0.0078125) —
    exactly the boundary where banker's rounding and DuckDB's ROUND
    disagree, and the r08 oracle replays these features in SQL."""
    import numpy as np

    from ..functions.numeric import round_half_up
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "n_samples", "duration_s", "rms",
                               "zero_cross_rate", "n_frames",
                               "max_frame_rms")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            x = (np.frombuffer(bytes(payload), dtype=np.uint8)
                 .astype(np.float64) - 128.0)
            n = int(len(x))
            out["doc_id"].append(int(doc_id))
            out["n_samples"].append(n)
            out["duration_s"].append(round_half_up(n / AUDIO_SAMPLE_RATE, 6))
            if n == 0:
                out["rms"].append(0.0)
                out["zero_cross_rate"].append(0.0)
                out["n_frames"].append(0)
                out["max_frame_rms"].append(0.0)
                continue
            out["rms"].append(round_half_up(float(np.sqrt(np.mean(x * x))) / 128.0, 6))
            zc = (np.signbit(x[1:]) != np.signbit(x[:-1])).mean() if n > 1 else 0.0
            out["zero_cross_rate"].append(round_half_up(float(zc), 6))
            k = n // AUDIO_FRAME
            out["n_frames"].append(k)
            if k:
                fr = x[:k * AUDIO_FRAME].reshape(k, AUDIO_FRAME)
                frms = np.sqrt((fr * fr).mean(axis=1)) / 128.0
                out["max_frame_rms"].append(round_half_up(float(frms.max()), 6))
            else:
                out["max_frame_rms"].append(0.0)
        yield pd.DataFrame(out)


@register(
    "multimodal_audio_features",
    # SQL replay of the PCM reinterpretation (r08, the image twin's
    # treatment): every feature is byte arithmetic over the payload, and
    # the payload is the ASCII text's bytes, so per-character code points
    # reproduce it exactly. Float parity is EXACT, not approximate: the
    # squared deviations are integer-valued doubles (sums are exact in
    # any order), sqrt is IEEE-correctly-rounded on both engines, /128
    # and /8000-into-6-decimals are exact scalings, and the UDF rounds
    # half-up (round_half_up) to match DuckDB ROUND bit-for-bit. The
    # sign convention replays signbit: a crossing is (c < 128) flipping
    # (x = c - 128.0; signbit(0.0) is False, i.e. c >= 128 is
    # 'non-negative').
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents
    ),
    chars AS (
      SELECT doc_id, n,
             unnest(range(1, n + 1)) AS i
      FROM base WHERE n > 0
    ),
    vals AS (
      SELECT c.doc_id, c.n, c.i,
             CAST(ascii(substr(b.text, CAST(c.i AS BIGINT), 1)) AS DOUBLE)
               - 128.0 AS x,
             ascii(substr(b.text, CAST(c.i AS BIGINT), 1)) < 128 AS neg
      FROM chars c JOIN base b ON b.doc_id = c.doc_id
    ),
    lagd AS (
      SELECT doc_id, n, i, x, neg,
             LAG(neg) OVER (PARTITION BY doc_id ORDER BY i) AS prev_neg
      FROM vals
    ),
    stats AS (
      SELECT doc_id,
             SUM(x * x) AS ssq,
             SUM(CASE WHEN prev_neg IS NOT NULL AND neg <> prev_neg
                      THEN 1 ELSE 0 END) AS ncross
      FROM lagd GROUP BY doc_id
    ),
    frames AS (
      SELECT doc_id, (i - 1) // {AUDIO_FRAME} AS frame, SUM(x * x) AS fssq
      FROM vals GROUP BY doc_id, (i - 1) // {AUDIO_FRAME}
      HAVING COUNT(*) = {AUDIO_FRAME}
    ),
    fmax AS (
      SELECT doc_id, MAX(SQRT(fssq / {AUDIO_FRAME}.0)) / 128.0 AS mfr
      FROM frames GROUP BY doc_id
    )
    SELECT b.doc_id,
           b.n AS n_samples,
           ROUND(b.n / {AUDIO_SAMPLE_RATE}.0, 6) AS duration_s,
           CASE WHEN b.n = 0 THEN 0.0
                ELSE ROUND(SQRT(s.ssq / b.n) / 128.0, 6) END AS rms,
           CASE WHEN b.n <= 1 THEN 0.0
                ELSE ROUND(CAST(s.ncross AS DOUBLE) / (b.n - 1), 6)
           END AS zero_cross_rate,
           b.n // {AUDIO_FRAME} AS n_frames,
           CASE WHEN f.mfr IS NULL THEN 0.0 ELSE ROUND(f.mfr, 6) END
             AS max_frame_rms
    FROM base b
    LEFT JOIN stats s ON s.doc_id = b.doc_id
    LEFT JOIN fmax f ON f.doc_id = b.doc_id
    """,
    tags=("multimodal", "audio", "mapinpandas"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped member of the multimodal family: the binary payload
    treated as an 8-bit PCM waveform, featurized per Arrow batch
    (duration / RMS / zero-crossing rate / framewise peak — the curation
    screen for silence, clipping, and synthetic tones). Codec stubbed
    like the image path (``decode_audio`` raises; the deterministic PCM
    reinterpretation keeps schema, batching, and the numpy hot path
    real). Promoted to a FULL oracle in r08: the reinterpretation is byte
    arithmetic, replayed in DuckDB over per-character code points (ASCII
    fixture precondition, same as ``multimodal_features``); determinism
    and physical invariants stay in tests/test_streaming.py's multimodal
    block."""
    docs = table(spark, sf_dir, "documents")
    pay = with_payload(docs).select("doc_id", "payload")
    return pay.mapInPandas(extract_audio, AUDIO_SCHEMA)
