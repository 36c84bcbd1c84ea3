"""Bronze → silver refinement (SURVEY.md §2.1 S14, §3.2 steps 4-6).

The reference lands any scraped dict into ``scraped_data(scraper_name,
json, created_at)`` (src/domain/utils.py:24-41) and normalizes on the way
into typed tables. The Spark twin:

  bronze: DataFrame[scraper_name, data(json string), ingested_at]
  → from_json with an explicit silver StructType (schema-on-read)
  → validation filters (Pydantic's role, SURVEY §1.1)
  → term-map normalization (broadcast map join — F3)
  → external-id resolution (J7: (source, external_id) → internal id,
    ensure = left-anti append with deterministic new keys)
  → merge_latest into the silver table (idempotent upsert).

All steps are narrow projections + one broadcast join; the only shuffle is
the final merge's key partition.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructType

from ..functions.text import normalize_text
from ..operators.merge import merge_latest

#: Default synonym → canonical term map (reference TermMapper YAML configs,
#: src/common/term_mapper.py:96-152: positions, footedness). Extend/replace
#: per deployment; rebuilt per batch = the hot-reload equivalent (X4).
DEFAULT_TERM_MAP: dict[str, dict[str, str]] = {
    "position": {
        "goalkeeper": "GK", "torwart": "GK", "keeper": "GK", "gk": "GK",
        "defender": "DF", "abwehr": "DF", "centre back": "DF", "left back": "DF",
        "right back": "DF", "df": "DF",
        "midfielder": "MF", "mittelfeld": "MF", "defensive midfield": "MF",
        "central midfield": "MF", "attacking midfield": "MF", "mf": "MF",
        "forward": "FW", "sturm": "FW", "striker": "FW", "centre forward": "FW",
        "winger": "FW", "fw": "FW",
    },
    "preferred_foot": {
        "left": "left", "links": "left", "right": "right", "rechts": "right",
        "both": "both", "beidfussig": "both",
    },
}


def land_records(spark, records: Sequence[tuple[str, str]], ingested_at) -> DataFrame:
    """Create a bronze batch from (scraper_name, json) pairs — the
    ``to_scraped_data_rows`` equivalent."""
    return spark.createDataFrame(
        [(n, d, ingested_at) for n, d in records],
        "scraper_name string, data string, ingested_at timestamp",
    )


def refine(
    bronze: DataFrame,
    schema: StructType,
    scraper_name: str | None = None,
    required: Sequence[str] = (),
) -> DataFrame:
    """Parse bronze JSON into a typed frame; permissive mode keeps
    malformed rows NULL, then validation filters drop rows missing
    required fields (the Pydantic layer's job)."""
    df = bronze
    if scraper_name is not None:
        df = df.filter(F.col("scraper_name") == scraper_name)
    parsed = df.select(
        F.from_json(F.col("data"), schema).alias("r"), F.col("ingested_at")
    ).select("r.*", "ingested_at")
    for c in required:
        parsed = parsed.filter(F.col(c).isNotNull())
    return parsed


def term_map_df(spark, mapping: Mapping[str, str], category: str) -> DataFrame:
    """Synonym table for one category, normalized on the synonym side."""
    rows = [(category, k, v) for k, v in mapping.items()]
    df = spark.createDataFrame(rows, "category string, synonym string, canonical string")
    return df.select("category", normalize_text("synonym").alias("synonym"), "canonical")


def apply_term_mapping(
    df: DataFrame,
    col: str,
    mapping_df: DataFrame,
    keep_unmapped: bool = True,
) -> DataFrame:
    """Map a raw term column to canonical values via broadcast join (F3).

    The reference's TermMapper dict lookup (term_mapper.py:313-364) becomes
    a broadcast hash join against the normalized synonym table; unmapped
    terms pass through (or become NULL with ``keep_unmapped=False``)."""
    out_cols = df.columns
    joined = df.withColumn("__norm", normalize_text(F.col(col))).join(
        F.broadcast(mapping_df.select(F.col("synonym").alias("__norm"), "canonical")),
        "__norm",
        "left",
    )
    mapped = F.coalesce("canonical", F.col(col)) if keep_unmapped else F.col("canonical")
    return joined.select(
        *[mapped.alias(c) if c == col else F.col(c) for c in out_cols]
    )


def resolve_external_ids(
    incoming: DataFrame,
    id_map: DataFrame,
    entity_type: str,
    source_col: str = "source",
    external_col: str = "external_id",
    generate_missing: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(source, external_id) → internal_id ensure/find (J7,
    external_id_mapping_service_async.py:40-200).

    Returns (resolved, new_mappings): ``resolved`` is ``incoming`` plus an
    ``internal_id`` column; unseen externals get deterministic new ids
    (xxhash64 of type/source/external — collision-checked against the map
    would be a second anti-join at production scale). ``new_mappings``
    rows are appended to the id map by the caller (merge_latest keyed on
    (entity_type, source, external_id) keeps this idempotent).
    """
    m = id_map.filter(F.col("entity_type") == entity_type).select(
        F.col("source").alias(source_col),
        F.col("external_id").alias(external_col),
        "internal_id",
    )
    joined = incoming.join(F.broadcast(m), [source_col, external_col], "left")
    generated = F.abs(
        F.xxhash64(F.lit(entity_type), F.col(source_col), F.col(external_col))
    )
    resolved = (
        joined.withColumn("internal_id", F.coalesce("internal_id", generated))
        if generate_missing
        else joined
    )
    new_mappings = (
        joined.filter(F.col("internal_id").isNull())
        .select(
            F.lit(entity_type).alias("entity_type"),
            F.col(source_col).alias("source"),
            F.col(external_col).alias("external_id"),
            generated.alias("internal_id"),
            F.current_timestamp().alias("created_at"),
        )
        .dropDuplicates(["entity_type", "source", "external_id"])
    )
    return resolved, new_mappings


def ingest_to_silver(
    bronze: DataFrame,
    existing_silver: DataFrame | None,
    schema: StructType,
    merge_keys: Sequence[str],
    order_col: str = "ingested_at",
    scraper_name: str | None = None,
    required: Sequence[str] = (),
) -> DataFrame:
    """Full bronze→silver path: refine + validate + idempotent merge."""
    refined = refine(bronze, schema, scraper_name, required)
    if existing_silver is not None:
        refined = existing_silver.unionByName(refined, allowMissingColumns=True)
    return merge_latest(refined, merge_keys, [order_col])
