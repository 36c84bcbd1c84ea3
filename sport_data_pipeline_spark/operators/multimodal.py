"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each task processes whole record batches.
The actual codec work is stubbed (image/audio libraries are not in this
container): ``decode_stub=True`` produces a deterministic fake feature
vector from the payload bytes; ``decode_stub=False`` raises
NotImplementedError at the point a real libjpeg/ffmpeg call would go.
The Spark-side contract — schemas, batch iteration, partitioning — is real
and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
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
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this image"
                )
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                b = bytes(payload)
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
