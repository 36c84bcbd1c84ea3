"""Snapshot sinks (SURVEY.md §2.1 S9): timestamped JSON/CSV dumps plus a
``_latest`` alias, the reference's scraper-output convention
(fbref_scraper.py:330-446 writes reports/<name>_<ts>.json and
<name>_latest.json)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.errors import AnalysisException


def read_parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet target, returning None ONLY when the path does not
    exist yet (first write). Every other failure — transient IO, schema
    corruption, analysis errors — propagates: swallowing them in a
    read-merge-overwrite loop silently replaces the target with just the
    current batch (data loss)."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        cond = getattr(e, "getCondition", getattr(e, "getErrorClass", lambda: None))()
        if cond == "PATH_NOT_FOUND":
            return None
        raise


def write_snapshot(
    df: DataFrame,
    base_dir: str,
    name: str,
    fmt: str = "json",
    timestamp: dt.datetime | None = None,
) -> tuple[str, str]:
    """Write a timestamped snapshot and overwrite the `_latest` alias.

    Returns (snapshot_path, latest_path). Caller controls partition count
    (coalesce upstream for small report outputs).
    """
    ts = (timestamp or dt.datetime.now()).strftime("%Y%m%d_%H%M%S")
    snap = f"{base_dir}/{name}_{ts}.{fmt}"
    latest = f"{base_dir}/{name}_latest.{fmt}"
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(snap)
        df.write.mode("overwrite").option("header", "true").csv(latest)
    else:
        writer.json(snap)
        df.write.mode("overwrite").json(latest)
    return snap, latest


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write a silver/gold parquet table partitioned by low-cardinality
    key columns (SURVEY.md §7 storage: match facts by season/date).

    At 100 TB the partition layout IS the query plan: a date-range filter
    prunes to the touched directories before any IO happens
    (PartitionFilters in the scan), and dynamic partition overwrite
    replaces only the partitions present in ``df`` — the idempotent
    daily-rerun story. ``max_records_per_file`` caps file size so a hot
    partition splits into parallel-readable chunks instead of one giant
    file.
    """
    writer = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.option("partitionOverwriteMode", "dynamic").parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Bucketing pre-shuffles once at write time: two tables bucketed the
    same way join/aggregate on the bucket key with NO exchange at read
    time — the co-located join strategy for repeated big-big joins (fact ×
    fact) where broadcast is impossible. ``sort_by`` additionally removes
    the sort from sort-merge joins.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
