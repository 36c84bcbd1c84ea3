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


# ---------------------------------------------------------------------------
# Audio (RIFF/WAVE) + video (ISO-BMFF) header decode and frame sampling.
# The WAV bytes come from the stdlib `wave` writer (a real encoder); the MP4
# bytes are hand-packed to the published ISO/IEC 14496-12 box layout.
# ---------------------------------------------------------------------------

import io
import struct
import wave


def _wav(channels=2, rate=16000, n_frames=8000, bits=16):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        w.writeframes(b"\x00" * (n_frames * channels * (bits // 8)))
    return buf.getvalue()


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4(duration_sec=10.0, timescale=600, version=0, brand=b"isom"):
    if version == 0:
        mvhd = bytes([0, 0, 0, 0]) + struct.pack(
            ">III", 0, 0, timescale
        ) + struct.pack(">I", int(duration_sec * timescale)) + b"\x00" * 80
    else:
        mvhd = bytes([1, 0, 0, 0]) + struct.pack(
            ">QQI", 0, 0, timescale
        ) + struct.pack(">Q", int(duration_sec * timescale)) + b"\x00" * 80
    return _box(b"ftyp", brand + b"\x00\x00\x02\x00isomiso2") + _box(
        b"moov", _box(b"mvhd", mvhd)
    ) + _box(b"mdat", b"\x00" * 64)


def test_parse_wav_header_real_encoder_bytes():
    from sport_data_pipeline_spark.operators.multimodal import parse_wav_header

    assert parse_wav_header(_wav(2, 16000, 8000, 16)) == (2, 16000, 16, 0.5)
    assert parse_wav_header(_wav(1, 44100, 44100, 16)) == (1, 44100, 16, 1.0)
    assert parse_wav_header(b"RIFFxxxxNOPE") is None
    assert parse_wav_header(None) is None
    assert parse_wav_header(b"") is None


def test_parse_mp4_header_both_mvhd_versions():
    from sport_data_pipeline_spark.operators.multimodal import parse_mp4_header

    assert parse_mp4_header(_mp4(10.0, 600, version=0)) == ("isom", 10.0)
    assert parse_mp4_header(_mp4(3.5, 90000, version=1)) == ("isom", 3.5)
    assert parse_mp4_header(b"\x00\x00\x00\x08free") is None  # no ftyp
    assert parse_mp4_header(_box(b"ftyp", b"isom")) is None  # no moov/mvhd
    assert parse_mp4_header(None) is None


def test_extract_audio_meta_distributed(spark):
    from sport_data_pipeline_spark.operators.multimodal import extract_audio_meta

    rows = [
        (1, _wav(2, 16000, 8000, 16), "audio/wav", 0, "{}"),
        (2, b"not audio", "text/plain", 0, "{}"),
        (3, None, None, 0, "{}"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, mime_type string, n_bytes long, meta_json string"
    )
    got = {r["media_id"]: r for r in extract_audio_meta(media).collect()}
    assert (got[1]["channels"], got[1]["sample_rate"], got[1]["bits_per_sample"]) == (2, 16000, 16)
    assert abs(got[1]["duration_sec"] - 0.5) < 1e-6
    assert got[2]["channels"] is None and got[3]["channels"] is None


def test_sample_frames_stride_and_cap(spark):
    from sport_data_pipeline_spark.operators.multimodal import sample_frames

    rows = [
        (1, _mp4(4.0, 600), "video/mp4", 0, "{}"),  # 4s @ 1fps → 5 frames
        (2, _mp4(100.0, 600), "video/mp4", 0, "{}"),  # capped at max_frames
        (3, b"junk", "text/plain", 0, "{}"),  # rejected → zero rows
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, mime_type string, n_bytes long, meta_json string"
    )
    out = sample_frames(media, fps=1.0, max_frames=8).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 5
    assert [r["frame_idx"] for r in sorted(by_id[1], key=lambda r: r["frame_idx"])] == list(range(5))
    assert len(by_id[2]) == 8  # uniform stride under the cap
    ts = sorted(r["ts_sec"] for r in by_id[2])
    assert abs((ts[1] - ts[0]) - 12.5) < 1e-4  # 100s / 8 frames
    assert 3 not in by_id
    assert all(r["frame"] is None for r in out)  # codec seam yields NULL


def test_fit_within_geometry():
    from sport_data_pipeline_spark.operators.multimodal import fit_within

    assert fit_within(1920, 1080, 640, 640) == (640, 360)
    assert fit_within(1080, 1920, 640, 640) == (360, 640)
    assert fit_within(100, 50, 640, 640) == (100, 50)  # never upscale
    assert fit_within(10000, 1, 64, 64) == (64, 1)
    assert fit_within(0, 0, 64, 64) == (1, 1)


def test_mediaops_synthesized_payloads_roundtrip_parsers():
    """The driver-checkable multimodal query synthesizes container bytes
    from closed formulas; every builder must round-trip through the real
    header parsers with exactly the parameters it was built from."""
    from sport_data_pipeline_spark.operators.multimodal import (
        parse_image_header,
        parse_mp4_header,
        parse_wav_header,
    )
    from sport_data_pipeline_spark.plans.mediaops import _gif, _jpeg, _mp4, _png, _wav

    assert parse_image_header(_png(17, 33)) == ("png", 17, 33)
    assert parse_image_header(_gif(64, 32)) == ("gif", 64, 32)
    assert parse_image_header(_jpeg(320, 200, progressive=False)) == ("jpeg", 320, 200)
    assert parse_image_header(_jpeg(330, 205, progressive=True)) == ("jpeg", 330, 205)
    # 1 ch × 8000 Hz × 16 bit → byte_rate 16000; 28000 bytes = 1.75 s
    assert parse_wav_header(_wav(1, 8000, 16, 28000)) == (1, 8000, 16, 1.75)
    assert parse_mp4_header(_mp4(1000, 2250)) == ("isom", 2.25)
