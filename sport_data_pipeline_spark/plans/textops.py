"""Text / JSON / parsing query pack (SURVEY.md §2.8 scalar functions and the
LLM-pipeline text-analysis operators over the documents table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..functions.parsing import (
    implied_probability,
    parse_market_value,
    parse_minute,
    parse_number,
    parse_score,
)
from ..functions.text import (
    DEFAULT_LANG_MARKERS,
    DEFAULT_STOPWORDS,
    content_fingerprint,
    normalize_text,
    quality_features,
    slugify,
)
from ..operators.dedup import exact_dedup
from .registry import query

#: DuckDB mirror of functions.text.normalize_text (accent translate is a
#: no-op on this corpus; DuckDB regexp_replace needs the 'g' flag).
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({col}), '[^\\w\\s]', ' ', 'g'),"
    " '\\s+', ' ', 'g'))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# F14/P6: JSON field extraction + typed aggregation (JSONB projections,
# database/validation/schema_validation.sql:18-27).
# ---------------------------------------------------------------------------

JSON_EXTRACT_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_total,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE) / COUNT(*) AS k_avg,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_max
FROM events
GROUP BY 1
"""


@query("json_extract_stats", survey="F14,P6,F16", oracle=JSON_EXTRACT_ORACLE)
def json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("k_total"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("k_avg"),
        F.max(k).alias("k_max"),
    )


# ---------------------------------------------------------------------------
# F2/F15/P8/F18: normalization + slug pipeline on part names
# (term_mapper.py:35-59; clubs.py:86-95).
# ---------------------------------------------------------------------------

SLUG_ORACLE = f"""
SELECT p_partkey AS part_id,
       trim(regexp_replace(lower(p_name), '[^a-z0-9]+', '-', 'g'), '-') AS slug,
       {_NORM_SQL.format(col="p_name")} AS name_norm
FROM part
"""


@query("string_normalize_slug", survey="F2,F15,F18,P8", oracle=SLUG_ORACLE)
def string_normalize_slug(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("part_id"),
        slugify("p_name").alias("slug"),
        normalize_text("p_name").alias("name_norm"),
    )


# ---------------------------------------------------------------------------
# F4/F8/F10/F13: parser battery on literal rows (the reference parses these
# shapes from scraped HTML; literal VALUES make the operator oracle-testable
# independent of table contents).
# ---------------------------------------------------------------------------

_PARSE_ROWS = [
    ("2-1", "45+2", "€12 Mio", "1.234,56", 2.5),
    ("0:0", "90", "€900 Tsd", "85%", 1.25),
    ("3:2", "90+4", "€3.5m", "-7,5", 0.0),
    ("bad", "x", "n/a", "abc", 4.0),
]

PARSE_ORACLE = """
WITH t(raw_score, raw_minute, raw_value, raw_number, price) AS (
  VALUES ('2-1', '45+2', '€12 Mio', '1.234,56', 2.5),
         ('0:0', '90', '€900 Tsd', '85%', 1.25),
         ('3:2', '90+4', '€3.5m', '-7,5', 0.0),
         ('bad', 'x', 'n/a', 'abc', 4.0)
),
s AS (
  SELECT *,
         regexp_replace(raw_score, ':', '-', 'g') AS score_norm,
         replace(trim(raw_value), ',', '.') AS value_norm,
         regexp_replace(regexp_replace(trim(raw_number), '\\.(\\d{3})', '\\1', 'g'), ',', '.', 'g') AS number_norm
  FROM t
)
SELECT raw_score,
       CASE WHEN regexp_extract(score_norm, '^\\s*(\\d+)\\s*-\\s*(\\d+)\\s*$', 1) <> ''
            THEN CAST(regexp_extract(score_norm, '^\\s*(\\d+)\\s*-\\s*(\\d+)\\s*$', 1) AS INTEGER) END AS home_goals,
       CASE WHEN regexp_extract(score_norm, '^\\s*(\\d+)\\s*-\\s*(\\d+)\\s*$', 2) <> ''
            THEN CAST(regexp_extract(score_norm, '^\\s*(\\d+)\\s*-\\s*(\\d+)\\s*$', 2) AS INTEGER) END AS away_goals,
       CASE WHEN regexp_extract(raw_minute, '^(\\d+)(?:\\+(\\d+))?$', 1) <> ''
            THEN CAST(regexp_extract(raw_minute, '^(\\d+)(?:\\+(\\d+))?$', 1) AS INTEGER)
                 + COALESCE(CASE WHEN regexp_extract(raw_minute, '^(\\d+)(?:\\+(\\d+))?$', 2) <> ''
                                 THEN CAST(regexp_extract(raw_minute, '^(\\d+)(?:\\+(\\d+))?$', 2) AS INTEGER) END, 0)
       END AS minute,
       CASE WHEN regexp_extract(value_norm, '([0-9]+(?:\\.[0-9]+)?)', 1) <> ''
            THEN CAST(regexp_extract(value_norm, '([0-9]+(?:\\.[0-9]+)?)', 1) AS DOUBLE)
                 * (CASE WHEN regexp_matches(value_norm, '(?i)(mio|mill|m\\b|m$)') THEN 1000000.0
                         WHEN regexp_matches(value_norm, '(?i)(tsd|k\\b|k$)') THEN 1000.0
                         ELSE 1.0 END)
       END AS market_value,
       CASE WHEN regexp_extract(number_norm, '(-?[0-9]+(?:\\.[0-9]+)?)', 1) <> ''
            THEN CAST(regexp_extract(number_norm, '(-?[0-9]+(?:\\.[0-9]+)?)', 1) AS DOUBLE) END AS number_value,
       CASE WHEN price > 0 THEN 1.0 / price END AS implied_prob
FROM s
"""


@query("parse_functions", survey="F4,F8,F10,F13", oracle=PARSE_ORACLE)
def parse_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(
        _PARSE_ROWS, "raw_score string, raw_minute string, raw_value string, raw_number string, price double"
    )
    home, away = parse_score("raw_score")
    return df.select(
        "raw_score",
        home.alias("home_goals"),
        away.alias("away_goals"),
        parse_minute("raw_minute").alias("minute"),
        parse_market_value("raw_value").alias("market_value"),
        parse_number("raw_number").alias("number_value"),
        implied_probability("price").alias("implied_prob"),
    )


# ---------------------------------------------------------------------------
# Text quality features (training-data quality scoring).
# ---------------------------------------------------------------------------

_SW = ", ".join(f"'{w}'" for w in DEFAULT_STOPWORDS)

DOC_QUALITY_ORACLE = f"""
WITH q AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
       CASE WHEN len(toks) > 0
            THEN CAST(len(list_filter(toks, t -> t IN ({_SW}))) AS DOUBLE) / len(toks)
            ELSE 0.0 END AS stopword_ratio,
       CASE WHEN len(toks) > 0
            THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
            ELSE 0.0 END AS unique_ratio
FROM q
"""


@query("doc_quality", survey="F2,A11(text)", oracle=DOC_QUALITY_ORACLE)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    feats = quality_features("text")
    return d.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["n_unique_tokens"].alias("n_unique_tokens"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["unique_ratio"].alias("unique_ratio"),
    )


# ---------------------------------------------------------------------------
# Language distribution stats.
# ---------------------------------------------------------------------------

LANG_STATS_ORACLE = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
GROUP BY 1
"""


@query("lang_stats", survey="A5,A7(text)", oracle=LANG_STATS_ORACLE)
def lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish char/4 heuristic).
# ---------------------------------------------------------------------------

TOKEN_COUNT_ORACLE = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS word_tokens,
       CAST(LENGTH(text) AS BIGINT) AS char_count,
       CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
FROM documents
"""


@query("token_counts", survey="F4(text),X6", oracle=TOKEN_COUNT_ORACLE)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[a-z0-9]+")).cast("long").alias("word_tokens"),
        F.length("text").cast("long").alias("char_count"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("approx_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Content fingerprint + exact dedup (md5 over normalized text).
# ---------------------------------------------------------------------------

FINGERPRINT_ORACLE = f"""
SELECT doc_id, md5({_NORM_SQL.format(col="text")}) AS fingerprint
FROM documents
"""


@query("doc_fingerprint", survey="dedup-exact,F2", oracle=FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", content_fingerprint("text").alias("fingerprint"))


EXACT_DEDUP_ORACLE = f"""
WITH fp AS (SELECT doc_id, md5({_NORM_SQL.format(col="text")}) AS fp FROM documents),
keep AS (SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY fp)
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
JOIN keep k ON d.doc_id = k.doc_id
"""


@query("exact_dedup_docs", survey="dedup-exact,U3", oracle=EXACT_DEDUP_ORACLE)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------------------------------
# End-to-end corpus cleaning: quality gate → exact dedup → MinHash near-dup
# removal → annotation, composed lazily from the tested operators. The
# MinHash stage has measured recall 1.0 on these corpora (see MINHASH_ORACLE
# in plans/similarity.py), so the whole pipeline is oracle-checkable: the
# DuckDB twin re-runs every stage with exact all-pairs trigram Jaccard as
# the near-dup step. Post-conditions (no surviving exact or near dups) stay
# unit-tested in tests/test_corpus.py.
# ---------------------------------------------------------------------------

_STOPWORDS_SQL = "['" + "', '".join(DEFAULT_STOPWORDS) + "']"


def _lang_struct_sql(lang: str, markers: tuple[str, ...]) -> str:
    lst = "['" + "', '".join(markers) + "']"
    return f"{{score: len(list_intersect(dt, {lst})), lang: '{lang}'}}"


#: CTE block shared by the e2e cleaning oracles: quality gate → exact dedup
#: → exact all-pairs trigram-Jaccard near-dup removal, ending in a
#: ``survivors`` relation (doc_id, lang, source, text, toks, n_tokens,
#: unique_ratio, stopword_ratio, sh). plans/corpusops.py composes further
#: stages (split / chunk / pack) on top of the same block.
CLEAN_SURVIVORS_CTES = f"""feat AS (
  SELECT doc_id, lang, source, text,
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
),
q AS (
  SELECT doc_id, lang, source, text, toks,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS unique_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(len([t for t in toks if list_contains({_STOPWORDS_SQL}, t)]) AS DOUBLE)
                   / len(toks) ELSE 0.0 END AS stopword_ratio
  FROM feat
),
gate AS (
  SELECT * FROM q
  WHERE n_tokens >= 5 AND unique_ratio >= 0.1 AND stopword_ratio <= 0.95
),
keep AS (
  SELECT MIN(doc_id) AS doc_id
  FROM (SELECT doc_id, md5({{norm}}) AS fp FROM gate)
  GROUP BY fp
),
dedup AS (
  SELECT g.*, list_distinct([ concat(g.toks[i], ' ', g.toks[i+1], ' ', g.toks[i+2])
                              for i in range(1, greatest(len(g.toks) - 2, 0) + 1) ]) AS sh
  FROM gate g JOIN keep k ON g.doc_id = k.doc_id
),
losers AS (
  SELECT DISTINCT b.doc_id
  FROM dedup a JOIN dedup b ON a.doc_id < b.doc_id
  WHERE len(list_distinct(a.sh || b.sh)) > 0
    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(a.sh || b.sh)) >= 0.7
),
survivors AS (
  SELECT d.* FROM dedup d
  LEFT JOIN losers l ON d.doc_id = l.doc_id
  WHERE l.doc_id IS NULL
)""".replace("{norm}", _NORM_SQL.format(col="text"))


CLEAN_CORPUS_ORACLE = f"""
WITH {CLEAN_SURVIVORS_CTES}
SELECT d.doc_id, d.lang, d.source, d.n_tokens, d.unique_ratio, d.stopword_ratio,
       d.n_tokens AS word_tokens,
       struct_extract(list_aggregate([
         {_lang_struct_sql("de", DEFAULT_LANG_MARKERS["de"])},
         {_lang_struct_sql("en", DEFAULT_LANG_MARKERS["en"])},
         {_lang_struct_sql("es", DEFAULT_LANG_MARKERS["es"])},
         {_lang_struct_sql("fr", DEFAULT_LANG_MARKERS["fr"])}
       ], 'max'), 'lang') AS lang_guess
FROM (SELECT *, list_distinct(toks) AS dt FROM survivors) d
"""


@query("clean_corpus_docs", survey="llm-pipeline-e2e", oracle=CLEAN_CORPUS_ORACLE)
def clean_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import clean_corpus

    d = _t(spark, sf_dir, "documents")
    return clean_corpus(d).select(
        "doc_id", "lang", "source", "n_tokens", "unique_ratio",
        "stopword_ratio", "word_tokens", "lang_guess",
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS rolling-hash scheme). The registered query is
# the md5-based portable variant exploded to (doc_id, fingerprint) rows so it
# is hash-comparable cross-engine; the xxhash64 array<long> production variant
# (operators/dedup.py:winnow_fingerprints) keeps its substring-overlap unit
# tests in tests/test_dedup.py.
# ---------------------------------------------------------------------------

_WINNOW_K = 3
_WINNOW_W = 4

WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         [md5(array_to_string(t[i:i+{_WINNOW_K - 1}], ' '))
          for i in generate_series(1, greatest(len(t) - {_WINNOW_K - 1}, 0))] AS g
  FROM toks
),
fps AS (
  SELECT doc_id,
         list_distinct([list_aggregate(g[j:j+{_WINNOW_W - 1}], 'min')
                        for j in generate_series(1, greatest(len(g) - {_WINNOW_W - 1}, 0))]) AS f
  FROM grams
)
SELECT doc_id, unnest(f) AS fingerprint FROM fps
"""


@query("doc_winnow_fingerprint", survey="dedup-fingerprint-rolling", oracle=WINNOW_ORACLE)
def doc_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import winnow_fingerprints_portable

    d = _t(spark, sf_dir, "documents")
    return winnow_fingerprints_portable(d, "doc_id", "text", k=_WINNOW_K, window=_WINNOW_W)


# Encoding-health oracle: every signal is a character-exact count
# (replace-diffs + one anchored regexp count) over deterministically
# injected artifacts (both engines count Unicode codepoints with
# length(); DuckDB strlen() = UTF-8 bytes = Spark octet_length; both
# regex engines count non-overlapping codepoint-class matches), so the
# gate is restated verbatim. The injected
# artifacts are the three classic corpus-poisoners: U+FFFD replacement
# characters (a lossy transcode happened), UTF-8-read-as-Latin-1
# mojibake sequences ('Ã', 'â€¦'-style), and C0 control bytes.
ENCODING_GATE_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 1 THEN text || ' �' || text
           WHEN 2 THEN 'cafÃ© ' || text
           WHEN 3 THEN text || chr(1) || 'tail' || chr(8)
           WHEN 4 THEN 'â€œ' || text || 'â€'
           ELSE text
         END AS s
  FROM documents
),
sig AS (
  SELECT doc_id,
         CAST(length(s) AS BIGINT) AS n_chars,
         CAST(strlen(s) AS BIGINT) AS n_bytes,
         CAST(length(s) - length(replace(s, '�', '')) AS INTEGER) AS n_repl,
         CAST((length(s) - length(replace(s, 'â€', '')))//2
              + len(regexp_extract_all(s, 'Ã[\u0080-\u00bf]')) AS INTEGER) AS n_moji,
         CAST(length(s) - length(replace(replace(s, chr(1), ''), chr(8), ''))
              AS INTEGER) AS n_ctrl
  FROM t
)
SELECT doc_id, n_chars, n_bytes, n_repl, n_moji, n_ctrl,
       CASE WHEN n_repl > 0 OR n_moji > 0 THEN 'bad_encoding'
            WHEN n_ctrl > 0 THEN 'suspect'
            ELSE 'ok' END AS status
FROM sig ORDER BY doc_id
"""


@query("encoding_quality_gate", survey="F2,llm-quality,P8", oracle=ENCODING_GATE_ORACLE)
def encoding_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health gate — the byte-level quality pass a web-crawl
    corpus runs before any tokenizer sees the text: per document, counts
    of U+FFFD replacement characters (evidence of a lossy transcode),
    UTF-8-read-as-Latin-1 mojibake marker sequences (the 'Ã'/'â€¦'
    family), and C0 control characters, plus codepoint and UTF-8 byte
    lengths; documents route to bad_encoding / suspect / ok. All signals
    are character-exact counts — replace-diffs plus one anchored regexp
    count (a bare 'Ã' is legitimate text; the mojibake signature is 'Ã'
    followed by a Latin-1 continuation-range character) — JVM-side
    expressions, no UDFs. The synthetic corpus is clean ASCII, so the query injects the
    artifacts deterministically by doc_id (the media-fixture
    discipline) and the oracle restates injection + gate verbatim."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    s = (
        F.when(F.col("doc_id") % 5 == 1, F.concat(F.col("text"), F.lit(" �"), F.col("text")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("cafÃ© "), F.col("text")))
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.col("text"), F.lit("\x01tail\x08")),
        )
        .when(
            F.col("doc_id") % 5 == 4,
            F.concat(F.lit("â€œ"), F.col("text"), F.lit("â€")),
        )
        .otherwise(F.col("text"))
    )
    occ = lambda col, lit_: F.length(col) - F.length(F.replace(col, F.lit(lit_)))
    sig = d.select(
        "doc_id",
        F.length(s).cast("long").alias("n_chars"),
        F.octet_length(s).cast("long").alias("n_bytes"),
        occ(s, "�").cast("int").alias("n_repl"),
        (
            (occ(s, "â€") / 2).cast("int")
            # a bare 'Ã' is legitimate text (Portuguese proper nouns);
            # the UTF-8-as-Latin-1 signature is 'Ã' followed by a
            # continuation-range character, so anchor on the pair
            + F.regexp_count(s, F.lit("Ã[\u0080-\u00bf]")).cast("int")
        ).alias("n_moji"),
        (occ(s, "\x01") + occ(s, "\x08")).cast("int").alias("n_ctrl"),
    )
    return sig.select(
        "doc_id",
        "n_chars",
        "n_bytes",
        "n_repl",
        "n_moji",
        "n_ctrl",
        F.when((F.col("n_repl") > 0) | (F.col("n_moji") > 0), "bad_encoding")
        .when(F.col("n_ctrl") > 0, "suspect")
        .otherwise("ok")
        .alias("status"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# URL-level dedup for crawl pipelines: canonicalize fetched URLs (drop
# fragments/tracking params, normalize case/ports/slashes, sort query
# params) and keep the first-seen doc per canonical URL — the hygiene step
# that runs BEFORE content dedup, because two spellings of one URL should
# cost one content-dedup candidate, not two. The URL fixture is built
# deterministically from doc_id: consecutive ids form a cluster whose six
# spelling variants collapse to four canonical identities, so the oracle
# only matches if every canonicalization rule fires correctly.
# ---------------------------------------------------------------------------

_URL_FIXTURE_SQL = """
SELECT doc_id,
       'site' || (doc_id // 8) % 37 || '.example.com' AS h,
       CAST(doc_id // 8 AS BIGINT) AS pid,
       doc_id % 8 AS v
FROM documents
"""

def canonical_url_sql_ctes(src: str, keys: str, url_col: str = "url") -> str:
    """DuckDB CTE chain restating ``functions.parsing.canonicalize_url``
    rule for rule — the REUSABLE oracle half of the URL canonicalization
    contract (every oracle that needs canonical URLs derives them through
    this one chain, so the Spark expression and its SQL restatement can
    never drift apart silently). Produces CTEs ``__c1..__c5`` and a final
    ``canon`` CTE selecting ``{keys}, canonical_url`` from ``src``.
    ``keys`` is the comma-separated passthrough column list."""
    k = keys
    u = url_col
    return f"""
__c1 AS (SELECT {k}, {u} AS __url, regexp_replace({u}, '#.*$', '') AS __u FROM {src}),
__c2 AS (
  SELECT {k}, __url,
         coalesce(lower(regexp_extract(__u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)), '') AS __scheme,
         regexp_replace(__u, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS __rest
  FROM __c1
),
__c3 AS (
  SELECT {k}, __url, __scheme,
         coalesce(lower(regexp_extract(__rest, '^([^/?]+)', 1)), '') AS __host0,
         regexp_replace(__rest, '^[^/?]+', '') AS __pathq
  FROM __c2
),
__c4 AS (
  SELECT {k}, __url, __scheme,
         CASE WHEN __scheme = 'http'  THEN regexp_replace(__host0, ':80$', '')
              WHEN __scheme = 'https' THEN regexp_replace(__host0, ':443$', '')
              ELSE __host0 END AS __host,
         coalesce(regexp_extract(__pathq, '^([^?]*)', 1), '') AS __path0,
         coalesce(regexp_extract(__pathq, '\\?(.*)$', 1), '') AS __qs
  FROM __c3
),
__c5 AS (
  SELECT {k}, __url, __scheme, __host,
         CASE WHEN regexp_replace(__path0, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(__path0, '/+$', '') END AS __path,
         coalesce(array_to_string(
           list_sort(
             list_filter(string_split(__qs, '&'),
               x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid|ref)(=|$)'))),
           '&'), '') AS __q
  FROM __c4
),
canon AS (
  SELECT {k},
         CASE WHEN __scheme = '' THEN __url
              ELSE __scheme || '://' || __host || __path ||
                CASE WHEN __q = '' THEN '' ELSE '?' || __q END
         END AS canonical_url
  FROM __c5
)"""


URL_CANON_ORACLE = (
    '''
WITH f AS ('''
    + _URL_FIXTURE_SQL
    + '''),
raw AS (
  SELECT doc_id,
         CASE v
           WHEN 0 THEN 'http://' || h || '/art/' || pid
           WHEN 1 THEN 'HTTP://' || upper(h) || ':80/art/' || pid || '/'
           WHEN 2 THEN 'http://' || h || '/art/' || pid || '?utm_source=x&b=2&a=1#frag'
           WHEN 3 THEN 'http://' || h || '/art/' || pid || '?a=1&b=2'
           WHEN 4 THEN 'https://' || h || ':443/page/' || pid
           WHEN 5 THEN 'https://' || h || '/page/' || pid || '?z=1&utm_campaign=c'
           WHEN 6 THEN h || '/art/' || pid
           ELSE 'http://' || h || '/art/' || pid || '?fbclid'
         END AS url
  FROM f
),'''
    + canonical_url_sql_ctes("raw", "doc_id")
    + '''
SELECT canonical_url,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS n_variants
FROM canon
GROUP BY 1
ORDER BY 1
'''
)


@query("url_canonical_dedup", survey="F2,U3", oracle=URL_CANON_ORACLE)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize crawl URLs and dedup to first-seen per canonical form
    (``functions.parsing.canonicalize_url``). The canonicalization is one
    map-only JVM expression chain (regexp + array_sort — no UDF) and the
    keeper selection one hash aggregation on the canonical key, so at
    100 TB of crawl metadata this costs one scan + one key exchange —
    and every URL-spelling duplicate it removes is a content-dedup
    candidate the downstream MinHash/semantic stages never have to
    generate. Eight deterministic spelling variants per id cluster
    (case, default ports, trailing slash, fragments, tracking params —
    with and without '=value' — param order, and a scheme-less spelling
    that must pass through UNCHANGED, not be mangled or merged) collapse
    to five canonical identities, hash-checked."""
    from ..functions.parsing import canonicalize_url

    d = _t(spark, sf_dir, "documents").select("doc_id")
    h = F.concat(
        F.lit("site"),
        (F.floor(F.col("doc_id") / 8) % 37).cast("long").cast("string"),
        F.lit(".example.com"),
    )
    pid = F.floor(F.col("doc_id") / 8).cast("long").cast("string")
    v = F.col("doc_id") % 8
    url = (
        F.when(v == 0, F.concat(F.lit("http://"), h, F.lit("/art/"), pid))
        .when(v == 1, F.concat(F.lit("HTTP://"), F.upper(h), F.lit(":80/art/"), pid, F.lit("/")))
        .when(v == 2, F.concat(F.lit("http://"), h, F.lit("/art/"), pid, F.lit("?utm_source=x&b=2&a=1#frag")))
        .when(v == 3, F.concat(F.lit("http://"), h, F.lit("/art/"), pid, F.lit("?a=1&b=2")))
        .when(v == 4, F.concat(F.lit("https://"), h, F.lit(":443/page/"), pid))
        .when(v == 5, F.concat(F.lit("https://"), h, F.lit("/page/"), pid, F.lit("?z=1&utm_campaign=c")))
        .when(v == 6, F.concat(h, F.lit("/art/"), pid))
        .otherwise(F.concat(F.lit("http://"), h, F.lit("/art/"), pid, F.lit("?fbclid")))
    )
    return (
        d.select("doc_id", canonicalize_url(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .orderBy("canonical_url")
    )
