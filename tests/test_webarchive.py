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


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, rec_idx int, target_uri string, body_text string"
    )


def test_crawl_route_canonical_urls_batch_equivalence(spark):
    """canonical_urls=True adds exactly the URL-level hygiene stage:
    spelling duplicates of an earlier surviving row route as dup_url
    (pointing at the URL keeper), every other row routes identically to
    the knob-off run."""
    from sport_data_pipeline_spark.operators.webarchive import crawl_route_records

    rows = [
        (1, 1, "http://site.com/a?b=2&a=1", "alpha text one"),
        # URL-spelling duplicate of row 1 (case/port/slash/order), new text
        (1, 2, "HTTP://SITE.com:80/a/?a=1&b=2#x", "different text two"),
        # content duplicate of row 1 under a different URL
        (1, 3, "http://site.com/b", "alpha text one"),
        # bare tracking param drops; unique content
        (1, 4, "http://site.com/c?fbclid", "unique text four"),
        (1, 5, "http://site.com/bad", "cafÃ© mojibake"),
        # another spelling of row 1's URL (explicit :80, extra tracking)
        (1, 6, "http://site.com:80/a?utm_y=2&b=2&a=1", "third different text"),
    ]
    docs = _docs(spark, rows)
    off = {
        (r["media_id"], r["rec_idx"]): r
        for r in crawl_route_records(docs).collect()
    }
    on = {
        (r["media_id"], r["rec_idx"]): r
        for r in crawl_route_records(docs, canonical_urls=True).collect()
    }
    assert {k: v["status"] for k, v in off.items()} == {
        (1, 1): "ok", (1, 2): "ok", (1, 3): "dup_exact",
        (1, 4): "ok", (1, 5): "bad_encoding", (1, 6): "ok",
    }
    assert {k: v["status"] for k, v in on.items()} == {
        (1, 1): "ok", (1, 2): "dup_url", (1, 3): "dup_exact",
        (1, 4): "ok", (1, 5): "bad_encoding", (1, 6): "dup_url",
    }
    for k in ((1, 2), (1, 6)):  # URL dups point at the URL keeper
        assert (on[k]["match_mid"], on[k]["match_rec"]) == (1, 1)
        assert not on[k]["kept"] and on[k]["n_tokens"] is None
    # equivalence off/on for every row that is NOT a URL-spelling dup
    for k in ((1, 1), (1, 3), (1, 4), (1, 5)):
        assert off[k] == on[k], k


def test_crawl_route_canonical_urls_cross_batch(spark, tmp_path):
    """The streaming knob: with canonical_urls=True the per-batch fold
    persists kept rows' canonical URLs, so a LATER batch's spelling
    re-crawl of a kept page routes as dup_url against the index (its
    content is never part of the hash probe); with the knob off the same
    rows route by content alone."""
    from pyspark.sql import functions as SF

    from sport_data_pipeline_spark.functions.parsing import canonicalize_url
    from sport_data_pipeline_spark.operators.webarchive import (
        encode_warc,
        warc_text_records,
    )
    from sport_data_pipeline_spark.plans.mediaops import (
        MEDIA_SCHEMA,
        _crawl_process_batch,
    )
    from sport_data_pipeline_spark.streaming.idempotent import epoch_write

    def archive(mid, texts):
        recs = [({"WARC-Type": "warcinfo"}, b"software: crawl\r\n")]
        recs += [
            ({"WARC-Type": "conversion", "WARC-Target-URI": u}, t.encode())
            for u, t in texts
        ]
        payload = encode_warc(recs, gzip_members=True)
        return (mid, payload, "application/warc", len(payload), None)

    batches = {
        0: [("http://crawl.ex/p1", "page one text " * 4),
            ("http://crawl.ex/p2", "page two text " * 4)],
        # spelling re-crawl of batch 0's kept p1 with CHANGED content, plus
        # a content re-crawl of p2 under a fresh URL
        1: [("HTTP://CRAWL.ex:80/p1/?utm_s=1", "page one REVISED " * 4),
            ("http://crawl.ex/p3", "page two text " * 4)],
    }

    for knob, want in (
        (False, {(4500, 1): "ok", (4500, 2): "ok",
                 (4501, 1): "ok", (4501, 2): "dup_exact"}),
        (True, {(4500, 1): "ok", (4500, 2): "ok",
                (4501, 1): "dup_url", (4501, 2): "dup_exact"}),
    ):
        state_dir = str(tmp_path / f"state_{knob}")
        routed_dir = str(tmp_path / f"routed_{knob}")
        # preseed: empty-but-schema'd index (no seed corpus)
        seed = warc_text_records(
            spark.createDataFrame([archive(4490, [("http://crawl.ex/seed", "seed text")])],
                                  MEDIA_SCHEMA)
        ).filter(SF.col("warc_type") == "conversion")
        fold = [
            SF.md5(SF.col("body_text").cast("binary")).alias("h"),
            SF.col("media_id").alias("k_mid"),
            SF.col("rec_idx").alias("k_rec"),
        ]
        if knob:
            fold.append(canonicalize_url(SF.col("target_uri")).alias("u"))
        epoch_write(seed.select(*fold), state_dir, -1)
        for e in (0, 1):
            batch = spark.createDataFrame([archive(4500 + e, batches[e])], MEDIA_SCHEMA)
            _crawl_process_batch(
                spark, batch, e, state_dir, routed_dir, canonical_urls=knob
            )
        got = {
            (r["media_id"], r["rec_idx"]): r
            for r in spark.read.parquet(routed_dir).collect()
        }
        assert {k: v["status"] for k, v in got.items()} == want, knob
        if knob:
            # the cross-batch URL dup points at batch 0's keeper
            assert (got[(4501, 1)]["match_mid"], got[(4501, 1)]["match_rec"]) == (4500, 1)
        else:
            # knob off: the revised re-crawl is (correctly, for content
            # dedup) a NEW document — the URL identity is invisible
            assert got[(4501, 1)]["kept"]
        assert (got[(4501, 2)]["match_mid"], got[(4501, 2)]["match_rec"]) == (4500, 2)


def test_crawl_batch_self_heals_crashed_compaction(spark, tmp_path):
    """A between-runs compact_epochs that crashes INSIDE its committed
    swap (marker valid, scratch present, a source partition already
    deleted) must not keep the resumed loop down: _crawl_process_batch
    heals the recorded swap before its state read (epoch_read alone
    would refuse loudly), and the healed index is COMPLETE — the next
    batch's re-crawl of a pre-crash keeper still routes dup_exact."""
    import os
    import shutil

    from pyspark.sql import functions as SF

    from sport_data_pipeline_spark.operators.webarchive import warc_text_records
    from sport_data_pipeline_spark.plans.mediaops import (
        MEDIA_SCHEMA,
        _crawl_process_batch,
    )
    from sport_data_pipeline_spark.streaming.idempotent import (
        EPOCH_COL,
        epoch_read,
        epoch_write,
        marker_body,
    )

    def archive(mid, texts):
        recs = [({"WARC-Type": "warcinfo"}, b"software: crawl\r\n")]
        recs += [
            ({"WARC-Type": "conversion", "WARC-Target-URI": u}, t.encode())
            for u, t in texts
        ]
        payload = encode_warc(recs, gzip_members=True)
        return (mid, payload, "application/warc", len(payload), None)

    state_dir, routed_dir = str(tmp_path / "state"), str(tmp_path / "routed")
    seed = warc_text_records(
        spark.createDataFrame(
            [archive(4590, [("http://crawl.ex/seed", "seed text " * 4)])],
            MEDIA_SCHEMA,
        )
    ).filter(SF.col("warc_type") == "conversion")
    epoch_write(
        seed.select(
            SF.md5(SF.col("body_text").cast("binary")).alias("h"),
            SF.col("media_id").alias("k_mid"),
            SF.col("rec_idx").alias("k_rec"),
        ),
        state_dir,
        -1,
    )
    _crawl_process_batch(
        spark,
        spark.createDataFrame(
            [archive(4600, [("http://crawl.ex/p1", "page one text " * 4)])],
            MEDIA_SCHEMA,
        ),
        0,
        state_dir,
        routed_dir,
    )
    # simulate compact_epochs(state_dir, below_epoch=1) crashing inside
    # _finish_swap: scratch holds the full merge, the marker committed,
    # and epoch 0's source partition is already gone
    epoch_write(
        spark.read.parquet(state_dir)
        .filter((SF.col(EPOCH_COL) >= -1) & (SF.col(EPOCH_COL) < 1))
        .drop(EPOCH_COL),
        state_dir,
        -2,
    )
    with open(os.path.join(state_dir, "__epoch_compact_commit"), "w") as fh:
        fh.write(marker_body(1))
    shutil.rmtree(os.path.join(state_dir, f"{EPOCH_COL}=0"))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="mid-swap"):
        epoch_read(spark, state_dir, before_epoch=1)
    # the resumed loop's next batch re-crawls BOTH the seed (pre-crash
    # base) and batch 0's keeper (rows only the scratch still holds)
    _crawl_process_batch(
        spark,
        spark.createDataFrame(
            [archive(
                4601,
                [("http://crawl.ex/p1b", "page one text " * 4),
                 ("http://crawl.ex/seed2", "seed text " * 4),
                 ("http://crawl.ex/new", "brand new page " * 4)],
            )],
            MEDIA_SCHEMA,
        ),
        1,
        state_dir,
        routed_dir,
    )
    got = {
        (r["media_id"], r["rec_idx"]): r
        for r in spark.read.parquet(routed_dir).collect()
    }
    assert got[(4601, 1)]["status"] == "dup_exact"
    assert (got[(4601, 1)]["match_mid"], got[(4601, 1)]["match_rec"]) == (4600, 1)
    assert got[(4601, 2)]["status"] == "dup_exact"
    assert (got[(4601, 2)]["match_mid"], got[(4601, 2)]["match_rec"]) == (4590, 1)
    assert got[(4601, 3)]["status"] == "ok" and got[(4601, 3)]["kept"]
    # the swap is finished: marker gone, sources rolled into the base
    assert not os.path.exists(os.path.join(state_dir, "__epoch_compact_commit"))
    parts = sorted(
        d for d in os.listdir(state_dir) if d.startswith(f"{EPOCH_COL}=")
    )
    assert parts == [f"{EPOCH_COL}=-1", f"{EPOCH_COL}=1"]
