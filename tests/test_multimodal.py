"""Multimodal binary-column plumbing (operators/multimodal.py).

The codec is a deterministic stub (no image/audio libs in-container);
what these tests pin down is the real Spark side: binary payload
construction JVM-side, mapInPandas batch iteration, schema, null
handling for undecodable payloads.
"""

from __future__ import annotations

import hashlib

import pytest

from apache_spark_link_prediction_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    decode_stub,
    extract_media_features,
    make_stub_payload,
    media_from_documents,
)


def test_stub_codec_roundtrip():
    p = make_stub_payload(640, 480, 12345, b"body-bytes")
    meta = decode_stub(p)
    assert meta == {"width": 640, "height": 480, "duration_ms": 12345}
    with pytest.raises(ValueError):
        decode_stub(b"not a payload")
    with pytest.raises(ValueError):
        decode_stub(b"SG")


def test_media_payload_built_jvm_side_matches_python_codec(spark, docs):
    media = media_from_documents(docs.limit(20))
    rows = (
        media.join(docs.select("doc_id", "text", "n_chars"),
                   media.media_id == docs.doc_id)
        .collect()
    )
    assert rows
    for r in rows:
        expected = make_stub_payload(
            int(r.media_id) % 1920 + 1,
            int(r.media_id) % 1080 + 1,
            int(r.n_chars) * 10,
            r.text.encode("utf-8"),
        )
        assert bytes(r.payload) == expected


def test_extract_media_features(spark, docs):
    media = media_from_documents(docs.limit(50)).cache()
    feats = extract_media_features(media)
    assert feats.schema == FEATURE_SCHEMA
    got = {r.media_id: r for r in feats.collect()}
    src = {r.media_id: r for r in media.collect()}
    assert len(got) == len(src) > 0
    for mid, r in got.items():
        payload = bytes(src[mid].payload)
        assert r.n_bytes == len(payload)
        assert r.sha256 == hashlib.sha256(payload).hexdigest()
        assert r.width == mid % 1920 + 1
        assert r.height == mid % 1080 + 1
        assert r.modality == "image"
        assert r.duration_ms is not None and r.duration_ms % 10 == 0


def test_undecodable_payload_quarantined_not_crashed(spark):
    media = spark.createDataFrame(
        [
            (1, "image", "image/jpeg", bytearray(b"\xff\xd8 not really a jpeg")),
            (2, "audio", None, None),
            (3, "video", "video/mp4", bytearray(make_stub_payload(10, 20, 30))),
        ],
        schema="media_id long, modality string, mime string, payload binary",
    )
    got = {r.media_id: r for r in extract_media_features(media).collect()}
    assert got[1].sha256 is not None and got[1].width is None
    assert got[2].n_bytes is None and got[2].sha256 is None
    assert (got[3].width, got[3].height, got[3].duration_ms) == (10, 20, 30)
