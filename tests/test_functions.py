"""Scalar function unit tests — direct ports of the reference's parser test
style (tests/unit/test_scraper_utils.py: score/status, term mapper)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sport_data_pipeline_spark.functions.parsing import (
    id_from_url,
    implied_probability,
    parse_date_multi,
    parse_market_value,
    parse_minute,
    parse_number,
    parse_score,
)
from sport_data_pipeline_spark.functions.text import lang_id, normalize_text, slugify


def one(spark, value: str, col):
    return spark.createDataFrame([(value,)], "s string").select(col.alias("x")).collect()[0]["x"]


def test_parse_score(spark):
    h, a = parse_score("s")
    df = spark.createDataFrame(
        [("2-1",), ("2:1",), (" 10 - 0 ",), ("abc",)], "s string"
    ).select(h.alias("h"), a.alias("a"))
    rows = [(r["h"], r["a"]) for r in df.collect()]
    assert rows == [(2, 1), (2, 1), (10, 0), (None, None)]


def test_parse_minute(spark):
    assert one(spark, "45+2", parse_minute("s")) == 47
    assert one(spark, "90", parse_minute("s")) == 90
    assert one(spark, "x", parse_minute("s")) is None


def test_parse_market_value(spark):
    assert one(spark, "€12 Mio", parse_market_value("s")) == 12_000_000.0
    assert one(spark, "€900 Tsd", parse_market_value("s")) == 900_000.0
    assert one(spark, "€2,5 Mio", parse_market_value("s")) == 2_500_000.0
    assert one(spark, "n/a", parse_market_value("s")) is None


def test_parse_number(spark):
    assert one(spark, "1.234,56", parse_number("s")) == 1234.56
    assert one(spark, "85%", parse_number("s")) == 85.0
    assert one(spark, "-7,5", parse_number("s")) == -7.5
    assert one(spark, "abc", parse_number("s")) is None


def test_parse_date_multi(spark):
    assert str(one(spark, "2024-05-01", parse_date_multi("s"))) == "2024-05-01"
    assert str(one(spark, "01.05.2024", parse_date_multi("s"))) == "2024-05-01"
    assert one(spark, "junk", parse_date_multi("s")) is None


def test_id_from_url(spark):
    assert one(spark, "https://site.tld/spieler/12345/profil", id_from_url("s")) == 12345


def test_implied_probability(spark):
    df = spark.createDataFrame([(2.0,), (0.0,)], "p double").select(
        implied_probability("p").alias("x")
    )
    assert [r["x"] for r in df.collect()] == [0.5, None]


def test_slugify_umlauts(spark):
    assert one(spark, "Bayern München!", slugify("s")) == "bayern-muenchen"
    assert one(spark, "  Borussia  Mönchengladbach ", slugify("s")) == "borussia-moenchengladbach"


def test_normalize_text(spark):
    assert one(spark, "  Müller,   Thomas! ", normalize_text("s")) == "muller thomas"


def test_lang_id(spark):
    markers = {"en": ["the", "and"], "de": ["der", "und"], "es": ["el", "y"]}
    assert one(spark, "the cat and the dog", lang_id("s", markers)) == "en"
    assert one(spark, "der hund und die katze", lang_id("s", markers)) == "de"


def test_mojibake_marker_requires_continuation_range(spark):
    # The encoding gate's mojibake signal anchors on 'Ã' + a Latin-1
    # continuation-range character (the UTF-8-read-as-Latin-1 signature).
    # A bare 'Ã' in legitimate text (Portuguese proper nouns) must NOT count.
    import duckdb
    from pyspark.sql import functions as F

    pat = "Ã[\u0080-\u00bf]"
    rows = [("SÃO PAULO",), ("cafÃ© bar",), ("maçÃ£ and cafÃ©",), ("plain",)]
    df = spark.createDataFrame([(i, s) for i, (s,) in enumerate(rows)], "i int, s string")
    got = [
        r["n"]
        for r in df.select("i", F.regexp_count("s", F.lit(pat)).alias("n"))
        .orderBy("i")
        .collect()
    ]
    assert got == [0, 1, 2, 0]
    # DuckDB restatement (the oracle's formulation) agrees character-exactly
    con = duckdb.connect()
    duck = [
        con.execute("SELECT len(regexp_extract_all(?, ?))", [s, pat]).fetchone()[0]
        for (s,) in rows
    ]
    assert duck == got


def test_canonicalize_url_rules(spark):
    from pyspark.sql import functions as F

    from sport_data_pipeline_spark.functions.parsing import canonicalize_url

    cases = [
        # (raw, canonical)
        ("HTTP://Site.COM:80/A/b/?utm_source=x&b=2&a=1#top",
         "http://site.com/A/b?a=1&b=2"),          # host lowers, path case kept
        ("http://site.com/a?a=1&b=2", "http://site.com/a?a=1&b=2"),
        ("https://site.com:443/p", "https://site.com/p"),
        ("https://site.com:8443/p", "https://site.com:8443/p"),  # non-default kept
        ("http://site.com:443/p", "http://site.com:443/p"),      # wrong scheme's default kept
        ("http://site.com", "http://site.com/"),                 # empty path -> root
        ("http://site.com/", "http://site.com/"),
        ("http://site.com/x///", "http://site.com/x"),
        ("http://site.com/x?utm_a=1&fbclid=2&gclid=3&ref=z", "http://site.com/x"),
        ("http://site.com/x?", "http://site.com/x"),
        ("http://site.com/x#only-frag", "http://site.com/x"),
        ("http://site.com/x?z=1&a=2", "http://site.com/x?a=2&z=1"),
        # tracking params written WITHOUT '=value' must still drop
        ("http://site.com/x?fbclid", "http://site.com/x"),
        ("http://site.com/x?utm_source&a=1", "http://site.com/x?a=1"),
        # ...but a non-tracking param that merely PREFIXES one is kept
        ("http://site.com/x?refresh=1", "http://site.com/x?refresh=1"),
        # scheme-less input passes through unchanged (no '://host' mangle,
        # no scheme guess that would merge http/https origins)
        ("site.com/x?b=2&a=1#top", "site.com/x?b=2&a=1#top"),
        ("/relative/path", "/relative/path"),
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(cases)], "i int, url string")
    got = {r["i"]: r["c"] for r in df.select("i", canonicalize_url("url").alias("c")).collect()}
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"
