"""Snapshot sinks (SURVEY.md §2.1 S9): timestamped JSON/CSV dumps plus a
``_latest`` alias, the reference's scraper-output convention
(fbref_scraper.py:330-446 writes reports/<name>_<ts>.json and
<name>_latest.json)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame


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
