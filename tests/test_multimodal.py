"""Multimodal plumbing: binary payload schema + mapInPandas feature path."""

from __future__ import annotations

import pytest

from sport_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    attach_binary_payload,
    extract_features,
)

from conftest import SF_DIR


def test_binary_roundtrip_and_features(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    media = attach_binary_payload(docs, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "mime_type", "n_bytes", "meta_json",
    ]
    feats = extract_features(media, decode_stub=True).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0


def test_features_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(5)
    media = attach_binary_payload(docs, "doc_id", "text")
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b


def test_real_decode_raises(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(1)
    media = attach_binary_payload(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(media, decode_stub=False).collect()
