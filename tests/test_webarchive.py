"""WARC/WET extraction units: framing round-trips both layouts,
corruption honesty, decode-bomb cap, and the distributed operator's
whole-item voiding."""

from __future__ import annotations

import zlib

import numpy as np

from sport_data_pipeline_spark.operators.webarchive import (
    _MAX_ARCHIVE_BYTES,
    encode_warc,
    extract_warc_stats,
    parse_warc_records,
)

RECS = [
    ({"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:uuid:1>"}, b"software: x\r\n"),
    ({"WARC-Type": "conversion", "WARC-Target-URI": "http://ex/a"}, b"hello " * 40),
    ({"WARC-Type": "metadata"}, b""),  # zero-length body is legal
    ({"WARC-Type": "conversion"}, "café text".encode()),
]


def test_warc_roundtrip_both_layouts():
    for gz in (True, False):
        got = parse_warc_records(encode_warc(RECS, gzip_members=gz))
        assert got is not None and len(got) == len(RECS)
        for (h0, b0), (h1, b1) in zip(RECS, got):
            assert b1 == b0
            assert h1["warc-type"] == h0["WARC-Type"]
            assert int(h1["content-length"]) == len(b0)


def test_warc_rejects_malformed_framing():
    plain = encode_warc(RECS, gzip_members=False)
    gz = encode_warc(RECS, gzip_members=True)
    assert parse_warc_records(None) is None
    assert parse_warc_records(b"") is None
    assert parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\n") is None
    # truncated gzip member / truncated plain record
    assert parse_warc_records(gz[: len(gz) // 2]) is None
    assert parse_warc_records(plain[:-6]) is None
    # Content-Length lying long (overruns buffer)
    lying = plain.replace(b"Content-Length: 0", b"Content-Length: 9", 1)
    assert parse_warc_records(lying) is None
    # missing CRLF CRLF record terminator
    noterm = plain[:-4] + b"XXXX"
    assert parse_warc_records(noterm) is None
    # header line without a colon
    bad = plain.replace(b"WARC-Type: warcinfo", b"WARC-Type warcinfo!", 1)
    assert parse_warc_records(bad) is None
    # wrong version line
    assert parse_warc_records(plain.replace(b"WARC/1.0", b"WARC/9.9", 1)) is None


def test_warc_folded_header_continuation():
    """ISO 28500 §4 header values may span lines (continuation lines
    start with SP/HT and fold onto the previous value); real Common
    Crawl records occasionally fold long WARC-Target-URI values, so a
    fold must parse — and a fold with no preceding header must reject."""
    plain = encode_warc(RECS, gzip_members=False)
    folded = plain.replace(
        b"WARC-Target-URI: http://ex/a\r\n",
        b"WARC-Target-URI: http://ex\r\n\t/a\r\n",
        1,
    )
    got = parse_warc_records(folded)
    assert got is not None and len(got) == len(RECS)
    # folded value joins with a single space; body framing is untouched
    assert got[1][0]["warc-target-uri"] == "http://ex /a"
    assert got[1][1] == RECS[1][1]
    # fold as the FIRST header line (nothing to fold onto) is malformed
    orphan = plain.replace(
        b"WARC/1.0\r\nWARC-Type: warcinfo",
        b"WARC/1.0\r\n cont\r\nWARC-Type: warcinfo",
        1,
    )
    assert parse_warc_records(orphan) is None


def test_warc_gzip_bomb_capped():
    # a single member inflating past the cap must reject, not allocate
    big = b"\x00" * (_MAX_ARCHIVE_BYTES + 1024)
    rec = (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        + f"Content-Length: {len(big)}\r\n\r\n".encode()
        + big
        + b"\r\n\r\n"
    )
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    bomb = co.compress(rec) + co.flush()
    assert len(bomb) < 1 << 21  # highly compressible on the wire
    assert parse_warc_records(bomb) is None


def test_warc_fuzz_never_crashes():
    rng = np.random.default_rng(31)
    good = encode_warc(RECS, gzip_members=True)
    for _ in range(150):
        buf = bytearray(good)
        mode = rng.integers(0, 3)
        if mode == 0:
            for _ in range(int(rng.integers(1, 5))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        elif mode == 1:
            buf = buf[: int(rng.integers(1, len(buf)))]
        else:
            at = int(rng.integers(0, len(buf)))
            buf = buf[:at] + bytes(rng.integers(0, 256, 3, dtype=np.uint8)) + buf[at:]
        got = parse_warc_records(bytes(buf))
        if got is not None:
            for h, b in got:
                assert isinstance(h, dict) and isinstance(b, bytes)


def test_warc_operator_voids_whole_items(spark):
    rows = [
        (1, encode_warc(RECS), "application/warc", 0, None),
        (2, b"garbage", None, 0, None),
        (3, None, None, 0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, mime_type string, n_bytes long, meta_json string",
    )
    got = {r["media_id"]: r for r in extract_warc_stats(df).collect()}
    assert got[1]["n_records"] == 4 and got[1]["n_conversion"] == 2
    assert got[1]["total_body_bytes"] == sum(len(b) for _, b in RECS)
    assert got[2]["n_records"] is None and got[3]["n_records"] is None


def test_warc_text_records_explode(spark):
    from sport_data_pipeline_spark.operators.webarchive import warc_text_records

    bad_utf8 = ({"WARC-Type": "conversion"}, b"\xff\xfe broken")
    rows = [
        (1, encode_warc(RECS + [bad_utf8]), "application/warc", 0, None),
        (2, b"garbage", None, 0, None),  # rejected archive -> NO rows
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, payload binary, mime_type string, n_bytes long, meta_json string",
    )
    got = warc_text_records(df).orderBy("media_id", "rec_idx").collect()
    assert [r["media_id"] for r in got] == [1] * 5
    assert [r["rec_idx"] for r in got] == list(range(5))
    assert got[0]["warc_type"] == "warcinfo" and got[0]["body_text"] is None
    assert got[1]["body_text"] == "hello " * 40
    assert got[1]["target_uri"] == "http://ex/a"
    assert got[3]["body_text"] == "café text"
    # conversion body that is not valid UTF-8: framing kept, text NULL
    assert got[4]["warc_type"] == "conversion" and got[4]["body_text"] is None
    assert got[4]["content_length"] == len(b"\xff\xfe broken")
