"""Text normalization + analysis columns (SURVEY.md §2.8 F2/F3/F15/F18 and
the LLM-pipeline text-analysis operators).

Reference parity: the TermMapper normalization pipeline
(src/common/term_mapper.py:35-59 — lowercase → trim → strip accents →
strip punctuation → collapse whitespace), the API slug transliteration
(src/api/endpoints/clubs.py:86-95), plus quality scoring / token counting /
language-ID heuristics for training-data pipelines.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, functions as F

# Accent transliteration table (NFKD-strip equivalent for the Latin chars the
# reference's sports data actually contains; a full-unicode strip would be a
# pandas UDF — deliberately avoided in the hot path).
_ACCENTED = "áàâäãåéèêëíìîïóòôöõúùûüýÿñçšžćčđ"
_PLAIN = "aaaaaaeeeeiiiiooooouuuuyyncszccd"

#: Default stopword list for quality scoring (tiny, language-generic).
DEFAULT_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is")

# Marker words for the heuristic language ID (functional words are the
# highest-frequency, most language-specific tokens — the classic n-gram-free
# shortcut).
DEFAULT_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "that", "with"),
    "de": ("der", "die", "das", "und", "ist", "mit", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "que", "pour"),
    "es": ("el", "la", "los", "que", "es", "para", "con"),
}


def strip_accents(col: Column | str) -> Column:
    """Transliterate accented Latin characters to ASCII (F2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, _ACCENTED, _PLAIN)


def normalize_text(col: Column | str) -> Column:
    """lower → strip accents → strip punctuation → collapse whitespace → trim.

    Mirrors term_mapper.py:35-59's `_normalize`.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = strip_accents(F.lower(c))
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def slugify(col: Column | str) -> Column:
    """URL slug with German transliteration (clubs.py:86-95): umlauts →
    ae/oe/ue/ss, lowercase, non-alphanumerics → single dash, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    for src, dst in (("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss")):
        c = F.regexp_replace(c, src, dst)
    c = strip_accents(c)
    c = F.regexp_replace(c, r"[^a-z0-9]+", "-")
    return F.regexp_replace(F.regexp_replace(c, r"^-+", ""), r"-+$", "")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization to array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def stopword_count(col: Column | str, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def word_shingles(col: Column | str, n: int) -> Column:
    """n-word shingles as array<string> (for MinHash / Jaccard near-dup).

    Built as a zip_with chain over n shifted slices, NOT transform over an
    index range: higher-order lambdas re-evaluate expression children per
    element, so slice-per-index is O(tokens²) interpreted work (measured
    ~7× slower on this corpus). Each shifted slice here is evaluated once
    per row."""
    toks = tokens(col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    shingles = F.slice(toks, 1, m)
    for i in range(1, n):
        shingles = F.zip_with(
            shingles, F.slice(toks, i + 1, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return shingles


def content_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text (the
    exact-dedup key; the winnowing rolling-hash variant lives in
    operators/dedup.py)."""
    return F.md5(normalize_text(col).cast("binary"))


def quality_features(col: Column | str, stopwords: Sequence[str] = DEFAULT_STOPWORDS) -> dict[str, Column]:
    """Length / token / stopword / uniqueness features for quality filtering.

    All ratios are int/int divisions computed identically in any engine.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("long")
    n_unique = distinct_token_count(c).cast("long")
    n_stop = stopword_count(c, stopwords).cast("long")
    n_chars = F.length(c).cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "n_unique_tokens": n_unique,
        "stopword_ratio": F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0),
        "unique_ratio": F.when(n_tok > 0, n_unique.cast("double") / n_tok).otherwise(0.0),
        "avg_token_len": F.when(
            n_tok > 0,
            (n_chars - (n_tok - 1)).cast("double") / n_tok,  # chars minus single spaces
        ).otherwise(0.0),
    }


def lang_id(col: Column | str, markers: Mapping[str, Sequence[str]]) -> Column:
    """Marker-word language ID: the language whose marker words hit the most
    tokens wins (ties → lexicographically greatest language, deterministic).

    Pure expression (no UDF): builds (score, lang) structs and takes
    ``greatest``; struct comparison is lexicographic.
    """
    toks = F.array_distinct(tokens(col))
    scored = [
        F.struct(
            F.size(
                F.filter(toks, lambda t: F.array_contains(F.array(*[F.lit(m) for m in ws]), t))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in sorted(markers.items())
    ]
    best = scored[0] if len(scored) == 1 else F.greatest(*scored)
    return best.getField("lang")
