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


def test_decode_stub_contract():
    import pytest
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    assert fake_decode_brightness(b"") == 0.0
    assert abs(fake_decode_brightness(bytes([255, 255])) - 1.0) < 1e-12
