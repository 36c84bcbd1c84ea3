"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so each task processes whole record batches.

Decode depth is tiered: ``parse_image_header`` is a REAL pure-stdlib
decoder of the PNG/JPEG/GIF container headers (signature + dimensions —
the published container formats, no codec library needed), powering
``extract_media_dimensions`` and the ``decode_stub=False`` path of
``extract_features``; ``decode_png_rgb`` goes all the way to PIXELS for
PNG (zlib inflate + all five scanline filters — PNG's pixel layer needs
no codec library), powering ``extract_pixel_stats``; ``decode_wav_pcm``
goes all the way to SAMPLES for 16-bit PCM WAV (raw little-endian frames
in the data chunk), powering ``extract_audio_stats``. JPEG/MP4 pixel and
compressed-audio decode (libjpeg/ffmpeg entropy-coder territory) stays
behind the documented codec seam; ``decode_stub=True`` substitutes a deterministic
byte-histogram feature so that distributed path — schema, batch shape,
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
    DoubleType,
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


def parse_wav_header(b: bytes | None) -> tuple[int, int, int, float] | None:
    """Header-only audio decode: (channels, sample_rate, bits_per_sample,
    duration_sec) from a RIFF/WAVE container, or None if unrecognizable.

    Walks the RIFF chunk list (4-byte id, little-endian uint32 size): the
    ``fmt `` chunk carries channels/rate/bits, the ``data`` chunk size over
    the byte rate gives the duration — the published canonical WAV layout.
    """
    if not b or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = bits = None
    data_bytes = None
    i = 12
    n = len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        if cid == b"fmt " and i + 24 <= n:
            channels, rate = struct.unpack("<HI", b[i + 10 : i + 16])
            (bits,) = struct.unpack("<H", b[i + 22 : i + 24])
        elif cid == b"data":
            data_bytes = size
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if not channels or not rate or not bits or data_bytes is None:
        return None
    byte_rate = rate * channels * (bits // 8)
    return (channels, rate, bits, round(data_bytes / byte_rate, 6) if byte_rate else 0.0)


def parse_mp4_header(b: bytes | None) -> tuple[str, float] | None:
    """Header-only video decode: (major_brand, duration_sec) from an
    ISO-BMFF (MP4) container, or None if unrecognizable.

    Walks the top-level box list (big-endian uint32 size, 4-byte type;
    size==1 means a 64-bit largesize follows). ``ftyp`` yields the brand;
    the ``mvhd`` box inside ``moov`` carries timescale + duration (version
    0: uint32s at offset 12; version 1: uint64 duration, uint32 timescale
    at offset 20) — the published ISO/IEC 14496-12 layout.
    """
    if not b or len(b) < 12 or b[4:8] != b"ftyp":
        return None
    brand = b[8:12].decode("ascii", errors="replace")

    def walk(lo: int, hi: int, depth: int) -> float | None:
        i = lo
        while i + 8 <= hi:
            (size,) = struct.unpack(">I", b[i : i + 4])
            btype = b[i + 4 : i + 8]
            payload = i + 8
            if size == 1:
                if payload + 8 > hi:
                    return None
                (size,) = struct.unpack(">Q", b[payload : payload + 8])
                payload += 8
            elif size == 0:  # box extends to end of file
                size = hi - i
            if size < 8 or i + size > hi:
                return None
            if btype == b"moov" and depth == 0:
                found = walk(payload, i + size, 1)
                if found is not None:
                    return found
            elif btype == b"mvhd" and depth == 1 and payload + 4 <= hi:
                version = b[payload]
                if version == 1 and payload + 32 <= hi:
                    (timescale,) = struct.unpack(">I", b[payload + 20 : payload + 24])
                    (duration,) = struct.unpack(">Q", b[payload + 24 : payload + 32])
                elif version == 0 and payload + 24 <= hi:
                    timescale, duration = struct.unpack(">II", b[payload + 12 : payload + 20])
                else:
                    return None
                return round(duration / timescale, 6) if timescale else None
            i += size
        return None

    duration = walk(0, len(b), 0)
    return None if duration is None else (brand, duration)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("bits_per_sample", IntegerType(), True),
        StructField("duration_sec", FloatType(), True),
    ]
)


def extract_audio_meta(df: DataFrame) -> DataFrame:
    """Arrow-batched WAV header decode over the media schema; NULL columns
    for unrecognizable payloads (never a crash mid-corpus)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                parse_wav_header(None if p is None else bytes(p)) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "channels": pd.array([p[0] if p else None for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array([p[1] if p else None for p in parsed], dtype="Int32"),
                    "bits_per_sample": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "duration_sec": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Float32"
                    ),
                }
            )

    return df.mapInPandas(run, schema=AUDIO_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_sec", FloatType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, fps: float = 1.0, max_frames: int = 32) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp, capped at
    ``max_frames`` per video (uniform stride when the cap binds).

    The container parse (mvhd duration) is REAL; the pixel extraction seam
    yields NULL ``frame`` bytes — an ffmpeg-backed decoder slots into
    ``_extract_frame`` without touching the distributed shape. Videos the
    parser rejects produce no rows (filtered, not crashed).
    """

    def _extract_frame(payload: bytes, ts: float) -> bytes | None:
        # codec seam: real frame extraction requires ffmpeg, which stays
        # outside this container. NULL marks "not decoded", never fake pixels.
        return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id: list[int] = []
            out_idx: list[int] = []
            out_ts: list[float] = []
            out_frame: list[bytes | None] = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                parsed = parse_mp4_header(b)
                if parsed is None:
                    continue
                _, duration = parsed
                n_want = int(duration * fps) + 1
                n = min(n_want, max_frames)
                if n <= 0:
                    continue
                stride = duration / n
                for k in range(n):
                    ts = round(k * stride, 6)
                    out_id.append(int(media_id))
                    out_idx.append(k)
                    out_ts.append(ts)
                    out_frame.append(_extract_frame(b, ts))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out_id, dtype="Int64"),
                    "frame_idx": pd.array(out_idx, dtype="Int32"),
                    "ts_sec": pd.array(out_ts, dtype="Float32"),
                    "frame": pd.array(out_frame, dtype=object),
                }
            )

    return df.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def fit_within(w: int, h: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-preserving resize geometry (the pure-math half of a resize
    operator; the resampler slots in behind the same numbers): largest
    (width, height) <= (max_w, max_h) keeping w:h, floor-rounded, min 1px."""
    if w <= 0 or h <= 0:
        return (1, 1)
    scale = min(max_w / w, max_h / h, 1.0)
    return (max(int(w * scale), 1), max(int(h * scale), 1))


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


# ---------------------------------------------------------------------------
# PNG pixel codec: REAL pixel-level decode, pure stdlib + numpy.
#
# PNG's pixel layer is zlib + five per-scanline byte filters (RFC 2083 /
# the W3C PNG spec) — no codec library needed, unlike JPEG/MP4 whose
# entropy coders stay behind the documented seam. decode_png_rgb walks the
# chunk list, inflates the concatenated IDAT stream, and un-filters every
# scanline (None/Sub/Up/Average/Paeth); encode_png_rgb is the write-time
# synthesizer (spec-valid files, real CRCs) used by the oracled query,
# which cycles ALL five filter types across rows so each unfilter path is
# exercised on every image. Reference parity: the reference pipeline
# treats media as opaque URLs + metadata (src/scrapers, SURVEY §2.10);
# pixel statistics are the engine-side extension the training-data brief
# adds on top.
# ---------------------------------------------------------------------------

_PNG_BPP = 3  # encoder/decoder fixed to 8-bit truecolor (color type 2)


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG filter 4): nearest of left/up/up-left to a+b-c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_rgb(pixels, filters=None) -> bytes:
    """Encode an (h, w, 3) uint8 array as a spec-valid PNG (8-bit truecolor,
    non-interlaced, real chunk CRCs). ``filters`` picks the per-row filter
    type (int, or a callable row→type; default: cycle 0..4 so decoders see
    every filter). Write-time utility — synthesizes query fixtures; a real
    ingest would land camera/scraper bytes instead."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    raw = px.astype(np.int32)
    lines = bytearray()
    for y in range(h):
        f = filters(y) if callable(filters) else (y % 5 if filters is None else filters)
        row = raw[y].reshape(-1)  # stride = 3w bytes
        up = raw[y - 1].reshape(-1) if y else np.zeros_like(row)
        if f == 0:
            filt = row
        elif f == 1:
            left = np.concatenate([np.zeros(_PNG_BPP, np.int32), row[:-_PNG_BPP]])
            filt = row - left
        elif f == 2:
            filt = row - up
        elif f == 3:
            left = np.concatenate([np.zeros(_PNG_BPP, np.int32), row[:-_PNG_BPP]])
            filt = row - (left + up) // 2
        elif f == 4:
            filt = np.empty_like(row)
            for i in range(row.size):
                a = int(row[i - _PNG_BPP]) if i >= _PNG_BPP else 0
                c = int(up[i - _PNG_BPP]) if i >= _PNG_BPP else 0
                filt[i] = row[i] - _paeth(a, int(up[i]), c)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        lines.append(f)
        lines.extend((filt % 256).astype(np.uint8).tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + typ + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def decode_png_rgb(b: bytes | None):
    """Full pixel decode of an 8-bit truecolor non-interlaced PNG: returns
    an (h, w, 3) uint8 numpy array, or None for anything unrecognizable or
    outside that profile (palette/alpha/16-bit/interlaced → None, never a
    crash — same null discipline as the header parsers). Filters 0 and 2
    un-apply vectorized, 1 via per-lane cumulative sum; 3/4 walk bytes
    (their recurrences are inherently sequential within a scanline)."""
    import zlib

    import numpy as np

    if not b or b[:8] != _PNG_SIG:
        return None
    i, n = 8, len(b)
    w = h = -1
    idat = bytearray()
    try:
        while i + 8 <= n:
            (ln,) = struct.unpack(">I", b[i : i + 4])
            typ = b[i + 4 : i + 8]
            data = b[i + 8 : i + 8 + ln]
            if len(data) < ln:
                return None
            if typ == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8 or color != 2 or comp != 0 or filt != 0 or interlace != 0:
                    return None
            elif typ == b"IDAT":
                idat.extend(data)
            elif typ == b"IEND":
                break
            i += 12 + ln  # length + type + data + CRC
        if w <= 0 or h <= 0 or not idat:
            return None
        raw = zlib.decompress(bytes(idat))
    except (zlib.error, struct.error):
        return None
    stride = w * _PNG_BPP
    if len(raw) != h * (stride + 1):
        return None
    out = np.empty((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        f = line[0]
        filt = np.frombuffer(line, dtype=np.uint8, offset=1).astype(np.int32)
        if f == 0:
            recon = filt
        elif f == 1:
            recon = (
                np.cumsum(filt.reshape(w, _PNG_BPP), axis=0, dtype=np.int64).reshape(-1)
                % 256
            ).astype(np.int32)
        elif f == 2:
            recon = (filt + prev) % 256
        elif f == 3:
            recon = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = recon[i - _PNG_BPP] if i >= _PNG_BPP else 0
                recon[i] = (filt[i] + (left + prev[i]) // 2) % 256
        elif f == 4:
            recon = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = int(recon[i - _PNG_BPP]) if i >= _PNG_BPP else 0
                c = int(prev[i - _PNG_BPP]) if i >= _PNG_BPP else 0
                recon[i] = (filt[i] + _paeth(a, int(prev[i]), c)) % 256
        else:
            return None
        out[y] = recon
        prev = recon
    return out.reshape(h, w, _PNG_BPP).astype(np.uint8)


PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_px", LongType(), True),
        StructField("sum_r", LongType(), True),
        StructField("sum_g", LongType(), True),
        StructField("sum_b", LongType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
    ]
)


def extract_pixel_stats(df: DataFrame) -> DataFrame:
    """Distributed pixel-level statistics over PNG payloads: per-image
    channel sums and means from the REAL decode (``decode_png_rgb``), via
    Arrow-batched ``mapInPandas`` over MEDIA_SCHEMA frames. Undecodable
    payloads yield NULL stats. The per-image reduce happens inside the
    executor pass — only the (id, stats) row leaves, never pixels, so
    output is O(images) regardless of resolution."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png_rgb(None if payload is None else bytes(payload))
                if px is None:
                    rows.append((mid, None, None, None, None, None, None, None, None, None))
                    continue
                h, w, _ = px.shape
                s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                n = w * h
                rows.append(
                    (
                        mid,
                        w,
                        h,
                        n,
                        int(s[0]),
                        int(s[1]),
                        int(s[2]),
                        s[0] / n,
                        s[1] / n,
                        s[2] / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_px",
                    "sum_r",
                    "sum_g",
                    "sum_b",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                ],
            )

    return df.mapInPandas(run, schema=PIXEL_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# WAV PCM codec: REAL sample-level decode, pure stdlib + numpy — the audio
# twin of the PNG pixel codec above. 16-bit integer PCM is raw
# little-endian samples inside the RIFF 'data' chunk (no entropy coder),
# so full waveform reconstruction needs no codec library; compressed
# audio (MP3/AAC/Opus) stays behind the documented seam with JPEG/MP4.
# ---------------------------------------------------------------------------


def encode_wav_pcm(samples, sample_rate: int, channels: int) -> bytes:
    """Encode interleaved int16 samples (flat array, frame-major) as a
    spec-valid RIFF/WAVE file (PCM format 1, 16-bit). Write-time fixture
    synthesizer, same discipline as ``encode_png_rgb``."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int16)
    data = s.tobytes()  # numpy int16 is little-endian on all our platforms
    block = channels * 2
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, sample_rate * block, block, 16
    )
    body = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"  # RIFF chunks are word-aligned
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm(b: bytes | None):
    """Full sample decode of a 16-bit integer-PCM RIFF/WAVE payload:
    returns (channels, sample_rate, samples) with ``samples`` a flat
    interleaved int16 numpy array, or None for anything unrecognizable or
    outside that profile (float/8-bit/24-bit/compressed formats, missing
    or truncated chunks → None, never a crash). Walks the chunk list with
    RIFF word alignment; ignores unknown chunks (LIST/fact/cue)."""
    import numpy as np

    if not b or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, n = 12, len(b)
    channels = rate = bits = fmt_tag = None
    data = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        (sz,) = struct.unpack("<I", b[i + 4 : i + 8])
        payload = b[i + 8 : i + 8 + sz]
        if len(payload) < sz:
            return None  # declared size runs past the buffer: truncated
        if cid == b"fmt " and sz >= 16:
            fmt_tag, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
        elif cid == b"data":
            data = payload
        i += 8 + sz + (sz & 1)  # word alignment
    if fmt_tag != 1 or bits != 16 or not channels or not rate or data is None:
        return None
    if len(data) % (channels * 2):
        return None  # partial frame
    return channels, rate, np.frombuffer(data, dtype="<i2")


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("sum_sq", LongType(), True),
        StructField("sum_abs", LongType(), True),
        StructField("peak", IntegerType(), True),
        StructField("rms", DoubleType(), True),
    ]
)


def extract_audio_stats(df: DataFrame) -> DataFrame:
    """Distributed waveform statistics over PCM WAV payloads via the REAL
    sample decode (``decode_wav_pcm``) inside Arrow-batched mapInPandas:
    per-payload energy (sum of squares), total magnitude, peak, and RMS.
    Undecodable payloads yield NULL stats. Like ``extract_pixel_stats``,
    the reduce happens in the executor pass — O(files) rows out, never
    samples. Stats accumulate in int64 (a peak of -32768 would overflow
    abs() in int16)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                dec = decode_wav_pcm(None if payload is None else bytes(payload))
                if dec is None or dec[2].size == 0:
                    rows.append((mid, None, None, None, None, None, None, None))
                    continue
                ch, rate, s = dec
                v = s.astype(np.int64)
                sum_sq = int((v * v).sum())
                n = int(v.size)
                rows.append(
                    (
                        mid,
                        ch,
                        rate,
                        n,
                        sum_sq,
                        int(np.abs(v).sum()),
                        int(np.abs(v).max()),
                        (sum_sq / n) ** 0.5,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "channels",
                    "sample_rate",
                    "n_samples",
                    "sum_sq",
                    "sum_abs",
                    "peak",
                    "rms",
                ],
            )

    return df.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


def box_downsample_rgb(px, factor: int):
    """Average-pool an (h, w, 3) uint8 array by ``factor`` in both axes
    with floor-integer means; ragged right/bottom edges average their
    actual (smaller) block. Pure numpy (``add.reduceat`` over both axes)
    — no per-pixel Python."""
    import numpy as np

    h, w, _ = px.shape
    ys = np.arange(0, h, factor)
    xs = np.arange(0, w, factor)
    s = np.add.reduceat(np.add.reduceat(px.astype(np.int64), ys, axis=0), xs, axis=1)
    bh = np.diff(np.append(ys, h))
    bw = np.diff(np.append(xs, w))
    counts = (bh[:, None] * bw[None, :])[:, :, None]
    return (s // counts).astype(np.uint8)


def resize_image_payloads(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL pixel resize over PNG payloads, distributed: decode
    (``decode_png_rgb``) → box-downsample by ``factor`` (floor-integer
    block means, ragged edges handled) → re-encode (``encode_png_rgb``),
    inside Arrow-batched mapInPandas. Returns MEDIA_SCHEMA rows with the
    resized payload; undecodable payloads pass through with payload NULL
    (the same null discipline as the stat extractors). Completes the
    decode / feature-extract / RESIZE / frame-sample multimodal quartet
    with real pixels for the PNG profile."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, sizes = [], []
            for payload in pdf["payload"]:
                px = decode_png_rgb(None if payload is None else bytes(payload))
                if px is None:
                    payloads.append(None)
                    sizes.append(None)
                    continue
                out = encode_png_rgb(box_downsample_rgb(px, factor))
                payloads.append(out)
                sizes.append(len(out))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pd.array(sizes, dtype="Int64"),
                    "meta_json": pdf["meta_json"],
                }
            )

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)
