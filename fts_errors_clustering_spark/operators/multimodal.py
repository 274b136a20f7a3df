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
    """Attach the deterministic binary payload + typed metadata columns
    (width/height/n_frames derived from the shared md5 hash scheme)."""
    h = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.length(payload).cast("long").alias("byte_len"),
        (h % 640 + 1).alias("width"),
        (h % 480 + 1).alias("height"),
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
           CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 480 + 1 AS height,
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


@register("multimodal_features", oracle=None, tags=("multimodal", "udf"))
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas (rows-only: the fake codec
    is engine-internal). Deterministic output; batch shape asserted in
    tests/test_multimodal.py."""
    docs = table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(extract_features, FEATURE_SCHEMA)
