"""Spark 4 Python DataSource for the reference's snapshot-report format.

The reference's scrapers drop timestamped JSON snapshots plus a
``<name>_latest.json`` alias (fbref_scraper.py:330-446; our
``sources/sinks.write_snapshot`` writes the same layout). This module
exposes that layout as a first-class pluggable Spark source (SURVEY §2.10
X1/X2) via the Spark 4 Python DataSource API — no JVM code:

- **batch** (``spark.read.format("bronze_snapshot")``): one input
  partition PER SNAPSHOT FILE, so a directory of thousands of snapshots
  scans as thousands of parallel tasks; with ``EqualTo``/``In`` filter
  pushdown on the ``snapshot`` file-name column, pruned files are never
  opened (file-level skipping, the Python-source analogue of partition
  pruning).
- **stream** (``spark.readStream.format("bronze_snapshot")``): the
  reference's poll loop inverted into a Structured Streaming source —
  each micro-batch picks up snapshot files that arrived since the last
  offset (offset = sorted-file-list high-water mark), which is exactly
  what the scraping orchestrator's 30 s/300 s poll cadence produces.

Rows are JSON-lines (the layout Spark's own ``df.write.json`` emits, and
what ``write_snapshot`` produces). The user supplies the value schema as a
DDL string via the ``schema`` option (snapshots are schemaless on disk);
the source appends a ``snapshot`` string column carrying the originating
file stem so downstream dedup/latest-wins merges can order arrivals.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def _snapshot_files(path: str, suffix: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    out = []
    for f in sorted(os.listdir(path)):
        full = os.path.join(path, f)
        if f.endswith(suffix) and os.path.isdir(full):
            # Spark's json writer emits a DIRECTORY of part files
            out.append(full)
        elif f.endswith(suffix) and os.path.isfile(full):
            out.append(full)
    return out


def _stem(path: str) -> str:
    return os.path.basename(path).rsplit(".", 1)[0]


def _iter_json_rows(path: str) -> Iterator[dict]:
    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, p)
            for p in os.listdir(path)
            if p.startswith("part-") and not p.endswith(".crc")
        )
    else:
        parts = [path]
    for part in parts:
        with open(part, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if line:
                    yield json.loads(line)


@dataclass
class _SnapshotPartition(InputPartition):
    path: str


class SnapshotBatchReader(DataSourceReader):
    """One partition per snapshot file; file-level filter pushdown on the
    ``snapshot`` column (EqualTo / In)."""

    def __init__(self, options: dict, schema: StructType) -> None:
        self.path = options["path"]
        self.suffix = options.get("suffix", ".json")
        self.fields = [f.name for f in schema.fields if f.name != "snapshot"]
        self.keep: set[str] | None = None  # None = no pruning

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:  # noqa: N802
        for f in filters:
            # file-name pruning: snapshot = 'x' / snapshot IN (...) prune
            # at the LISTING, before any file opens
            if isinstance(f, EqualTo) and f.attribute == ("snapshot",):
                self.keep = {f.value}
            elif isinstance(f, In) and f.attribute == ("snapshot",):
                self.keep = set(f.values)
            else:
                yield f  # everything else stays Spark-side

    def partitions(self) -> Sequence[InputPartition]:
        files = _snapshot_files(self.path, self.suffix)
        if self.keep is not None:
            files = [p for p in files if _stem(p) in self.keep]
        return [_SnapshotPartition(p) for p in files]

    def read(self, partition: _SnapshotPartition) -> Iterator[tuple]:
        stem = _stem(partition.path)
        for rec in _iter_json_rows(partition.path):
            yield tuple(rec.get(k) for k in self.fields) + (stem,)


class SnapshotStreamReader(SimpleDataSourceStreamReader):
    """Poll-loop-as-stream: offset = high-water mark over the sorted file
    list; each micro-batch reads exactly the files that arrived since."""

    def __init__(self, options: dict, schema: StructType) -> None:
        self.path = options["path"]
        self.suffix = options.get("suffix", ".json")
        self.fields = [f.name for f in schema.fields if f.name != "snapshot"]

    def initialOffset(self) -> dict:  # noqa: N802
        return {"seen": []}

    def _rows(self, files: list[str]) -> Iterator[tuple]:
        for path in files:
            stem = _stem(path)
            for rec in _iter_json_rows(path):
                yield tuple(rec.get(k) for k in self.fields) + (stem,)

    def read(self, start: dict) -> tuple[list[tuple], dict]:
        seen = set(start.get("seen", []))
        files = _snapshot_files(self.path, self.suffix)
        new = [p for p in files if _stem(p) not in seen]
        end = {"seen": sorted(seen | {_stem(p) for p in new})}
        # a LIST, not a generator: the prefetching runner pickles the rows
        return list(self._rows(new)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        # deterministic replay for recovery: exactly the files in end\start
        seen, upto = set(start.get("seen", [])), set(end.get("seen", []))
        files = _snapshot_files(self.path, self.suffix)
        return list(self._rows([p for p in files if _stem(p) in (upto - seen)]))


class SnapshotDataSource(DataSource):
    """``spark.dataSource.register(SnapshotDataSource)`` then
    ``spark.read.format("bronze_snapshot").option("path", dir)
    .schema("home string, away string, score string, snapshot string")``.
    The ``snapshot`` column is filled by the source; all other schema
    fields are read from the JSON records by name."""

    @classmethod
    def name(cls) -> str:
        return "bronze_snapshot"

    def schema(self) -> str:
        raise NotImplementedError(
            "bronze_snapshot requires an explicit .schema(...) — snapshots "
            "are schemaless JSON on disk"
        )

    def reader(self, schema: StructType) -> SnapshotBatchReader:
        return SnapshotBatchReader(self.options, schema)

    def simpleStreamReader(self, schema: StructType) -> SnapshotStreamReader:  # noqa: N802
        return SnapshotStreamReader(self.options, schema)
