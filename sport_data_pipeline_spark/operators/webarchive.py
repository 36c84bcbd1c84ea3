"""WARC/WET web-archive record extraction — the Common Crawl ingestion
shape (SURVEY §2.1 S3–S8 treats acquisition as out-of-engine, but the
LANDED bytes of a crawl corpus arrive as WARC: per-record gzip members
concatenated into one file, each member a "WARC/1.0" header block +
Content-Length-framed body). A 100 TB text pipeline's first real
operator is exactly this: opaque archive bytes -> framed records, one
output row per record, without ever shipping payloads off the executor.

Pure stdlib (zlib with the gzip wrapper, wbits=31) — the same
no-codec-library discipline as operators/multimodal.py, with the same
null honesty: malformed framing, truncated members, or a bad
Content-Length void the ITEM (None, never a crash), because a partially
parsed archive reported as complete is corpus corruption.

ISO 28500 (WARC 1.0) framing implemented here: records are
  WARC/1.0\\r\\n  <name>: <value>\\r\\n ...  \\r\\n  <body bytes = Content-Length>  \\r\\n\\r\\n
and the standard Common Crawl layout gzips EACH record as its own
member (so HDFS-style splitters can resync on member boundaries); plain
uncompressed concatenation is also in profile.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: cap on total decompressed bytes per item (decode-bomb guard — a
#: 10 KB gzip member can inflate to GBs; same posture as _MAX_DECODE_PIXELS)
_MAX_ARCHIVE_BYTES = 1 << 26  # 64 MiB


def _split_gzip_members(b: bytes) -> list[bytes] | None:
    """Inflate a concatenation of gzip members into one bytes blob per
    member, bounded by _MAX_ARCHIVE_BYTES total; None on corruption."""
    out = []
    total = 0
    pos = 0
    while pos < len(b):
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(b[pos:], _MAX_ARCHIVE_BYTES - total + 1)
        except zlib.error:
            return None
        if not d.eof:  # truncated member or bomb-capped mid-member
            return None
        total += len(chunk)
        if total > _MAX_ARCHIVE_BYTES:
            return None
        out.append(chunk)
        pos = len(b) - len(d.unused_data)
    return out


def parse_warc_records(b: bytes | None):
    """Parse a WARC payload (gzip-member-per-record or plain) into a list
    of (headers: dict[str, str], body: bytes), or None outside the
    profile. Header names are lower-cased; the version line must read
    WARC/1.0 or WARC/1.1; Content-Length is mandatory (ISO 28500 §4);
    each record must be terminated by CRLF CRLF."""
    if not b:
        return None
    if b[:2] == b"\x1f\x8b":
        members = _split_gzip_members(b)
        if members is None:
            return None
        raw = b"".join(members)
    elif b[:5] in (b"WARC/",):
        if len(b) > _MAX_ARCHIVE_BYTES:
            return None
        raw = b
    else:
        return None
    records = []
    i, n = 0, len(raw)
    while i < n:
        head_end = raw.find(b"\r\n\r\n", i)
        if head_end < 0:
            return None
        lines = raw[i:head_end].split(b"\r\n")
        if lines[0] not in (b"WARC/1.0", b"WARC/1.1"):
            return None
        headers: dict[str, str] = {}
        last_key: str | None = None
        for ln in lines[1:]:
            if ln[:1] in (b" ", b"\t"):
                # ISO 28500 §4: a header value may span lines; each
                # continuation line begins with SP/HT and folds onto the
                # previous value (joined with a single space). A fold with
                # no preceding header line is malformed.
                if last_key is None:
                    return None
                try:
                    cont = ln.decode("utf-8", "strict").strip()
                except UnicodeDecodeError:
                    return None
                headers[last_key] = (headers[last_key] + " " + cont).strip()
                continue
            sep = ln.find(b":")
            if sep <= 0:
                return None
            try:
                key = ln[:sep].decode("ascii").strip().lower()
                headers[key] = ln[sep + 1 :].decode("utf-8", "strict").strip()
            except UnicodeDecodeError:
                return None
            last_key = key
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            return None
        body_at = head_end + 4
        if length < 0 or body_at + length + 4 > n:
            return None
        if raw[body_at + length : body_at + length + 4] != b"\r\n\r\n":
            return None
        records.append((headers, raw[body_at : body_at + length]))
        i = body_at + length + 4
    return records if records else None


def encode_warc(records, gzip_members: bool = True) -> bytes:
    """Write (headers: dict, body: bytes) records as a spec-valid WARC —
    one gzip member per record (the Common Crawl layout) or plain
    concatenation. Content-Length is derived, never trusted from the
    caller. Write-time fixture synthesizer; real ingests land crawler
    output instead."""
    out = bytearray()
    for headers, body in records:
        rec = bytearray(b"WARC/1.0\r\n")
        for k, v in headers.items():
            if k.lower() == "content-length":
                continue
            rec += f"{k}: {v}\r\n".encode()
        rec += f"Content-Length: {len(body)}\r\n\r\n".encode()
        rec += body + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(bytes(rec)) + co.flush()
        else:
            out += rec
    return bytes(out)


WARC_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_records", IntegerType(), True),
        StructField("n_conversion", IntegerType(), True),
        StructField("total_body_bytes", LongType(), True),
        StructField("max_body_bytes", LongType(), True),
        StructField("records_md5", StringType(), True),
        StructField("text_md5", StringType(), True),
    ]
)


def extract_warc_stats(df: DataFrame) -> DataFrame:
    """Distributed WARC record extraction stats: per archive payload, the
    record count, conversion-record count (WET text records), body byte
    totals, a canonical "type:length" CSV md5 (framing under the hash),
    and the md5 of the concatenated conversion bodies (content under the
    hash). Undecodable archives yield one NULL-stats row — voided whole,
    never partially (the multimodal extractors' discipline). O(archives)
    rows out; bodies never leave the executor."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import _typed_frame

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                recs = parse_warc_records(None if payload is None else bytes(payload))
                if recs is None:
                    rows.append((int(mid),) + (None,) * 6)
                    continue
                types = [h.get("warc-type", "") for h, _ in recs]
                bodies = [b for _, b in recs]
                conv = [
                    b for (h, b) in recs if h.get("warc-type", "") == "conversion"
                ]
                csv = ",".join(
                    f"{t}:{len(b)}" for t, b in zip(types, bodies)
                ).encode()
                rows.append(
                    (
                        int(mid),
                        len(recs),
                        len(conv),
                        sum(len(b) for b in bodies),
                        max(len(b) for b in bodies),
                        hashlib.md5(csv).hexdigest(),
                        hashlib.md5(b"".join(conv)).hexdigest(),
                    )
                )
            yield _typed_frame(
                rows,
                ["media_id", "n_records", "n_conversion", "total_body_bytes",
                 "max_body_bytes", "records_md5", "text_md5"],
                ["int64", "Int32", "Int32", "Int64", "Int64", "object", "object"],
            )

    return df.mapInPandas(run, schema=WARC_STATS_SCHEMA)


WARC_RECORDS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("rec_idx", IntegerType(), False),
        StructField("warc_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("content_length", LongType(), False),
        StructField("body_text", StringType(), True),
    ]
)


def warc_text_records(df: DataFrame) -> DataFrame:
    """One output row per WARC record — the one-to-many SOURCE primitive
    that turns landed WET archives into a documents table (compose with
    the quality gates / dedup / tokenizer exactly like the synthetic
    `documents` table): (media_id, rec_idx, warc_type, target_uri,
    content_length, body_text). body_text is the strict-UTF-8 decode of
    conversion-record bodies (WET text payloads); non-conversion records
    keep their framing columns with NULL text, and a body that is not
    valid UTF-8 yields NULL text rather than mojibake (the downstream
    encoding gate is the policy point, not this extractor). Archives the
    parser rejects produce NO rows (filtered, not crashed) — the
    `sample_frames` discipline for source primitives, vs the stats
    operators' NULL-row voiding for per-item reports."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One output frame PER ARROW BATCH (like extract_warc_stats): a
        # task's worth of decoded record text never accumulates in Python —
        # peak memory is bounded by one input batch's records, not the task.
        for pdf in batches:
            out_id: list[int] = []
            out_idx: list[int] = []
            out_type: list[str | None] = []
            out_uri: list[str | None] = []
            out_len: list[int] = []
            out_text: list[str | None] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                recs = parse_warc_records(None if payload is None else bytes(payload))
                if recs is None:
                    continue
                for k, (h, body) in enumerate(recs):
                    text = None
                    if h.get("warc-type") == "conversion":
                        try:
                            text = body.decode("utf-8", "strict")
                        except UnicodeDecodeError:
                            text = None
                    out_id.append(int(mid))
                    out_idx.append(k)
                    out_type.append(h.get("warc-type"))
                    out_uri.append(h.get("warc-target-uri"))
                    out_len.append(len(body))
                    out_text.append(text)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out_id, dtype="int64"),
                    "rec_idx": pd.array(out_idx, dtype="Int32"),
                    "warc_type": pd.array(out_type, dtype="object"),
                    "target_uri": pd.array(out_uri, dtype="object"),
                    "content_length": pd.array(out_len, dtype="int64"),
                    "body_text": pd.array(out_text, dtype="object"),
                }
            )

    return df.mapInPandas(run, schema=WARC_RECORDS_SCHEMA)
