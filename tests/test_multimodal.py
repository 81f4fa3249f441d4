"""Multimodal plumbing: schema, Arrow batch path, stubbed decode (C5)."""

from __future__ import annotations

import pytest

from pipeline_kinesis_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    fake_features,
    media_from_documents,
)


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")


def test_fake_features_deterministic():
    a, b = fake_features(b"payload"), fake_features(b"payload")
    assert a == b
    assert len(a) == FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in a)
    assert fake_features(b"other") != a


def test_media_schema_roundtrip(spark, sf_dir):
    m = media_from_documents(spark, sf_dir)
    assert dict(m.dtypes)["payload"] == "binary"
    meta = m.select("meta.n_bytes", "meta.mime").collect()[0]
    assert meta.mime == "text/plain" and meta.n_bytes > 0


def test_extract_features_mapinpandas(spark, sf_dir):
    m = media_from_documents(spark, sf_dir)
    feats = extract_features(m)
    rows = feats.collect()
    assert len(rows) == m.count()
    r = rows[0]
    assert len(r.features) == FEATURE_DIM
    assert r.n_bytes > 0
    # deterministic: features derive from payload bytes only
    by_id = {x.media_id: x.features for x in rows}
    again = {x.media_id: x.features for x in extract_features(m).collect()}
    assert by_id == again


def test_media_schema_declares_modalities():
    names = [f.name for f in MEDIA_SCHEMA.fields]
    assert names == ["media_id", "modality", "payload", "meta"]
