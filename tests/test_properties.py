"""Property-based tests (hypothesis) for the pure-Python seams: container
header codecs round-trip arbitrary valid parameters, and resize geometry
keeps its invariants on any input. These run driver-side (no Spark), so
hypothesis can afford hundreds of examples."""

from __future__ import annotations

import io
import struct
import wave

from hypothesis import given, settings, strategies as st

from sport_data_pipeline_spark.operators.multimodal import (
    fit_within,
    parse_image_header,
    parse_mp4_header,
    parse_wav_header,
)

dims = st.integers(min_value=1, max_value=65535)


@given(w=dims, h=dims)
def test_png_header_roundtrip(w, h):
    b = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )
    assert parse_image_header(b) == ("png", w, h)


@given(w=dims, h=dims)
def test_gif_header_roundtrip(w, h):
    b = b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 4
    assert parse_image_header(b) == ("gif", w, h)


@given(w=dims, h=dims, n_skip=st.integers(min_value=0, max_value=4))
def test_jpeg_header_roundtrip_with_leading_segments(w, h, n_skip):
    # SOI, then n_skip APPn segments before the SOF0 — the parser must walk
    # the marker chain, not assume a fixed offset.
    b = b"\xff\xd8"
    for i in range(n_skip):
        payload = b"x" * (i + 1)
        b += b"\xff\xe0" + struct.pack(">H", 2 + len(payload)) + payload
    b += b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", h, w) + b"\x01"
    assert parse_image_header(b) == ("jpeg", w, h)


@given(
    channels=st.integers(min_value=1, max_value=8),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    n_frames=st.integers(min_value=1, max_value=100_000),
    bits=st.sampled_from([8, 16, 32]),
)
@settings(max_examples=60)
def test_wav_header_roundtrip(channels, rate, n_frames, bits):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wr:
        wr.setnchannels(channels)
        wr.setsampwidth(bits // 8)
        wr.setframerate(rate)
        wr.writeframes(b"\x00" * (n_frames * channels * (bits // 8)))
    got = parse_wav_header(buf.getvalue())
    assert got is not None
    c, r, bps, dur = got
    assert (c, r, bps) == (channels, rate, bits)
    assert abs(dur - n_frames / rate) < 1e-5


@given(
    timescale=st.integers(min_value=1, max_value=1_000_000),
    ticks=st.integers(min_value=0, max_value=10_000_000),
    version=st.sampled_from([0, 1]),
)
@settings(max_examples=60)
def test_mp4_header_roundtrip(timescale, ticks, version):
    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    if version == 0:
        if ticks >= 2**32 or timescale >= 2**32:
            return
        mvhd = bytes([0, 0, 0, 0]) + struct.pack(">III", 0, 0, timescale)
        mvhd += struct.pack(">I", ticks) + b"\x00" * 80
    else:
        mvhd = bytes([1, 0, 0, 0]) + struct.pack(">QQI", 0, 0, timescale)
        mvhd += struct.pack(">Q", ticks) + b"\x00" * 80
    b = box(b"ftyp", b"mp42\x00\x00\x00\x00") + box(b"moov", box(b"mvhd", mvhd))
    got = parse_mp4_header(b)
    assert got is not None
    brand, dur = got
    assert brand == "mp42"
    assert abs(dur - round(ticks / timescale, 6)) < 1e-9


@given(w=dims, h=dims, mw=dims, mh=dims)
def test_fit_within_invariants(w, h, mw, mh):
    fw, fh = fit_within(w, h, mw, mh)
    assert 1 <= fw and 1 <= fh
    assert fw <= max(mw, 1) and fh <= max(mh, 1)
    assert fw <= w and fh <= h  # never upscale
    if fw > 1 and fh > 1:
        # aspect preserved within integer-floor rounding
        assert abs(fw / fh - w / h) <= max(w / h, 1.0) * (1 / fw + 1 / fh)


@given(junk=st.binary(max_size=64))
@settings(max_examples=200)
def test_parsers_never_crash_on_junk(junk):
    # arbitrary bytes must yield None or a tuple — never an exception.
    for parser in (parse_image_header, parse_wav_header, parse_mp4_header):
        out = parser(junk)
        assert out is None or isinstance(out, tuple)


@given(n_tok=st.integers(min_value=1, max_value=10_000))
def test_chunk_count_formula_covers_all_tokens(n_tok):
    # The closed-form 64/48 chunk count used by doc_chunks /
    # corpus_train_shards (and restated in their SQL oracles) must tile the
    # token range: chunks cover every token, the last chunk is non-empty,
    # and one fewer chunk would leave tokens uncovered.
    CHUNK, STRIDE = 64, 48
    import math

    nc = 1 + math.ceil(max(n_tok - CHUNK, 0) / STRIDE)
    last_start = (nc - 1) * STRIDE  # 0-based
    assert last_start < n_tok  # last chunk non-empty
    assert last_start + CHUNK >= n_tok  # full coverage
    if nc > 1:  # minimality: nc-1 chunks would stop short
        assert (nc - 2) * STRIDE + CHUNK < n_tok
