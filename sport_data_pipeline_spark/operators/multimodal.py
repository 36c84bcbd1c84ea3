"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each task processes whole record batches.

Decode depth is tiered: ``parse_image_header`` is a REAL pure-stdlib
decoder of the PNG/JPEG/GIF container headers (signature + dimensions —
the published container formats, no codec library needed), powering
``extract_media_dimensions`` and the ``decode_stub=False`` path of
``extract_features``. Full pixel decode (libjpeg/ffmpeg territory) stays
out of this container; ``decode_stub=True`` substitutes a deterministic
byte-histogram feature so the distributed path — schema, batch shape,
partitioning, null handling — is exercised end to end
(tests/test_multimodal.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("meta_json", StringType(), True),
    ]
)

_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

FEATURE_DIM = 16


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: JPEG start-of-frame markers that carry dimensions (baseline, extended
#: sequential, progressive, lossless, and the differential variants).
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # DHT, JPG, DAC are not SOFs

DIMENSIONS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def parse_image_header(b: bytes | None) -> tuple[str, int, int] | None:
    """Header-only image decode: (format, width, height) from the container
    bytes, or None when the payload is not a recognizable PNG/JPEG/GIF.

    Pure stdlib ``struct`` over the published container layouts:
    PNG — 8-byte signature, then the IHDR chunk holds two big-endian
    uint32 dimensions at offsets 16/20; GIF — 'GIF87a'/'GIF89a', then two
    little-endian uint16; JPEG — walk the marker segments from SOI to the
    first SOFn, whose payload is [precision u8, height u16be, width u16be].
    """
    if not b:
        return None
    if b[:8] == _PNG_SIG and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return ("png", w, h)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return ("gif", w, h)
    if b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        n = len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:  # desync — not a marker where one must be
                return None
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers have no length field
                continue
            (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 <= n:
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return ("jpeg", w, h)
                return None
            i += 2 + seg_len
        return None
    return None


def extract_media_dimensions(df: DataFrame) -> DataFrame:
    """Arrow-batched header decode: (media_id, mime_type, n_bytes, format,
    width, height); format/width/height are NULL for unrecognized payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                parse_image_header(None if p is None else bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pdf["n_bytes"],
                    "format": [p[0] if p else None for p in parsed],
                    "width": pd.array([p[1] if p else None for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] if p else None for p in parsed], dtype="Int32"),
                }
            )

    return df.mapInPandas(run, schema=DIMENSIONS_SCHEMA)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap any table into the media schema (test harness: document text
    bytes stand in for image payloads)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.octet_length(F.col(text_col).cast("binary")).cast("long").alias("n_bytes"),
        F.to_json(F.struct(F.lit("stub").alias("codec"))).alias("meta_json"),
    )


def extract_features(df: DataFrame, decode_stub: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow record batches).

    With ``decode_stub`` the "decoder" derives FEATURE_DIM floats from the
    payload bytes deterministically — exercising the full distributed path
    (schema, batch shape, null payloads) without codec libraries.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                b = bytes(payload)
                if not decode_stub:
                    # real header decode: container features (dims, aspect,
                    # compression density). Pixel-level features would slot
                    # in here with a codec library; unrecognized payloads
                    # yield NULL, not a crash.
                    parsed = parse_image_header(b)
                    if parsed is None:
                        feats.append(None)
                        continue
                    fmt, w, h = parsed
                    px = max(w * h, 1)
                    feats.append(
                        [
                            float(w),
                            float(h),
                            round(w / max(h, 1), 6),
                            round(len(b) / px, 6),  # bytes per pixel
                            float({"png": 0, "jpeg": 1, "gif": 2}[fmt]),
                        ]
                    )
                    continue
                # deterministic fake: byte-sum histogram over FEATURE_DIM buckets
                acc = [0.0] * FEATURE_DIM
                for i, byte in enumerate(b):
                    acc[i % FEATURE_DIM] += byte / 255.0
                n = max(len(b), 1)
                feats.append([round(v / n, 6) for v in acc])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)
