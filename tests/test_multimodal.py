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


def _png(w: int, h: int) -> bytes:
    import struct as st
    import zlib

    ihdr = st.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = st.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += st.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def _jpeg(w: int, h: int) -> bytes:
    import struct as st

    app0 = b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    # progressive SOF2 after an APP0 — the scanner must skip segments
    sof = b"\xff\xc2" + st.pack(">H", 11) + b"\x08" + st.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + app0 + sof


def _gif(w: int, h: int) -> bytes:
    import struct as st

    return b"GIF89a" + st.pack("<HH", w, h) + b"\x00" * 4


def test_header_parser_on_real_container_bytes():
    from sport_data_pipeline_spark.operators.multimodal import parse_image_header

    assert parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_jpeg(1920, 1080)) == ("jpeg", 1920, 1080)
    assert parse_image_header(_gif(32, 16)) == ("gif", 32, 16)
    assert parse_image_header(b"plain text, not an image") is None
    assert parse_image_header(b"") is None
    assert parse_image_header(None) is None
    assert parse_image_header(b"\xff\xd8\x00\x00") is None  # desynced JPEG


def test_extract_media_dimensions_distributed(spark):
    from sport_data_pipeline_spark.operators.multimodal import extract_media_dimensions

    rows = [
        (1, _png(640, 480), "image/png", 0, "{}"),
        (2, _jpeg(1920, 1080), "image/jpeg", 0, "{}"),
        (3, _gif(32, 16), "image/gif", 0, "{}"),
        (4, b"not an image", "text/plain", 0, "{}"),
        (5, None, None, 0, "{}"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, mime_type string, n_bytes long, meta_json string"
    )
    got = {r["media_id"]: r for r in extract_media_dimensions(media).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 640, 480)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 1920, 1080)
    assert (got[3]["format"], got[3]["width"], got[3]["height"]) == ("gif", 32, 16)
    assert got[4]["format"] is None and got[5]["format"] is None


def test_real_decode_header_features(spark):
    rows = [
        (1, _png(100, 50), "image/png", 0, "{}"),
        (2, b"not an image", "text/plain", 0, "{}"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, mime_type string, n_bytes long, meta_json string"
    )
    feats = {r["media_id"]: r["feature"] for r in extract_features(media, decode_stub=False).collect()}
    assert feats[1][:3] == [100.0, 50.0, 2.0]  # width, height, aspect
    assert feats[2] is None  # unrecognized payload → NULL, not a crash
