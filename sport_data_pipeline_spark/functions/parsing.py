"""Parsing columns: scores, minutes, market values, numbers, dates, URLs.

Spark rewrites of the reference's per-row Python parsers (SURVEY.md §2.8
F4/F5/F8/F9/F10/F11) — regexp_extract + casts, all JVM-side:
- score text "2-1" / "2:1" → (home, away)      (src/common/scraper_utils.py:28-45)
- minute "45+2" → 47                            (fbref_match_scraper.py:486-497)
- market value "€12 Mio" → 12_000_000           (scraping_orchestrator.py:138-158)
- comma-decimal numbers "1.234,56" → 1234.56    (src/common/parsing.py:24-36)
- multi-format dates                            (src/common/parsing.py:8-48)
- entity id from URL                            (src/common/parsing.py:55-66)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_score(col: Column | str) -> tuple[Column, Column]:
    """'2-1' or '2:1' → (2, 1); malformed → (NULL, NULL)."""
    norm = F.regexp_replace(_c(col), ":", "-")
    home = F.regexp_extract(norm, r"^\s*(\d+)\s*-\s*(\d+)\s*$", 1)
    away = F.regexp_extract(norm, r"^\s*(\d+)\s*-\s*(\d+)\s*$", 2)
    return (
        F.when(home != "", home.cast("int")),
        F.when(away != "", away.cast("int")),
    )


def parse_minute(col: Column | str) -> Column:
    """"45+2" → 47, "90" → 90 (stoppage-time addition)."""
    base = F.regexp_extract(_c(col), r"^(\d+)(?:\+(\d+))?$", 1)
    extra = F.regexp_extract(_c(col), r"^(\d+)(?:\+(\d+))?$", 2)
    return F.when(
        base != "",
        base.cast("int") + F.coalesce(F.when(extra != "", extra.cast("int")), F.lit(0)),
    )


def parse_market_value(col: Column | str) -> Column:
    """'€12 Mio' → 1.2e7, '€900 Tsd' → 9e5, '€3.5m' → 3.5e6, plain numbers
    pass through. Comma decimal separators are normalized first."""
    s = F.regexp_replace(F.trim(_c(col)), ",", ".")
    num = F.regexp_extract(s, r"([0-9]+(?:\.[0-9]+)?)", 1)
    mult = (
        F.when(s.rlike(r"(?i)(mio|mill|m\b|m$)"), F.lit(1_000_000.0))
        .when(s.rlike(r"(?i)(tsd|k\b|k$)"), F.lit(1_000.0))
        .otherwise(F.lit(1.0))
    )
    return F.when(num != "", num.cast("double") * mult)


def parse_number(col: Column | str) -> Column:
    """European-format number text → double ('1.234,56' → 1234.56;
    '85%' → 85.0)."""
    s = F.trim(_c(col))
    # Thousands dots then comma decimal; no lookahead (RE2-compatible so the
    # same pattern runs in any engine): '.' before exactly 3 digits drops.
    s = F.regexp_replace(s, r"\.(\d{3})", "$1")
    s = F.regexp_replace(s, ",", ".")
    num = F.regexp_extract(s, r"(-?[0-9]+(?:\.[0-9]+)?)", 1)
    return F.when(num != "", num.cast("double"))


def parse_date_multi(col: Column | str, formats: Sequence[str] = ("yyyy-MM-dd", "dd.MM.yyyy", "dd/MM/yyyy", "MMM d, yyyy")) -> Column:
    """First format that parses wins (coalesce chain — F5)."""
    c = _c(col)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(fmt)).cast("date") for fmt in formats])


def id_from_url(col: Column | str, pattern: str = r"/(?:spieler|player)/(\d+)") -> Column:
    """Extract the numeric entity id from a provider URL (F11)."""
    hit = F.regexp_extract(_c(col), pattern, 1)
    return F.when(hit != "", hit.cast("long"))


def implied_probability(price: Column | str) -> Column:
    """1/price with a zero guard (F13, domain/models.py:524-532)."""
    p = _c(price)
    return F.when(p > 0, F.lit(1.0) / p)


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL form for crawl-frontier / corpus URL-level dedup —
    the hygiene step that precedes content dedup in a crawl pipeline
    (two fetches of ``HTTP://Site.com:80/a/?utm_source=x&b=2&a=1#top``
    and ``http://site.com/a?a=1&b=2`` are the same document and should
    cost one content-dedup candidate, not two). The reference handles
    per-provider URL shapes ad hoc (id_from_url above is its extraction
    side); this is the normalization side, generalized.

    Rules (each a plain JVM expression — the whole chain is map-only at
    any scale, no UDF): drop the fragment; lowercase scheme and host;
    strip the scheme's default port (:80 http, :443 https — a
    non-default port is PRESERVED, it names a different origin); strip
    trailing slashes off non-root paths and collapse an empty path to
    '/'; drop tracking parameters (utm_*, fbclid, gclid, ref — with or
    without an ``=value`` tail, so a bare ``?fbclid`` cannot split
    identity) and sort the surviving query parameters byte-wise so
    parameter order cannot split a URL into two identities. An input
    with no ``scheme://`` prefix is passed through UNCHANGED — guessing
    a scheme would merge http/https origins, and mangling it into
    '://host' would be worse than leaving it for the caller's policy."""
    raw = _c(col)
    u = F.regexp_replace(raw, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    host0 = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = (
        F.when(scheme == F.lit("http"), F.regexp_replace(host0, r":80$", ""))
        .when(scheme == F.lit("https"), F.regexp_replace(host0, r":443$", ""))
        .otherwise(host0)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    path0 = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path1 = F.regexp_replace(path0, r"/+$", "")
    path = F.when(path1 == F.lit(""), F.lit("/")).otherwise(path1)
    qs = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda x: (x != F.lit("")) & ~x.rlike(r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"),
        )
    )
    q = F.array_join(params, "&")
    return F.when(scheme == F.lit(""), raw).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q == F.lit(""), F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )
