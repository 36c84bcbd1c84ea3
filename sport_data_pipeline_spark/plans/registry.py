"""Query registry: the engine's named query pack.

Every operator family from SURVEY.md §2 is exposed as a named query with
  - a Spark implementation ``(spark, sf_dir) -> DataFrame`` (the engine), and
  - an equivalent ANSI-SQL oracle string for DuckDB (the correctness gate),
unless the op is genuinely not SQL-expressible (then ``oracle=None`` and the
driver records a rows-only check).

Alias discipline: the driver compares results column-name-sorted, so Spark
aliases and oracle ``AS`` names must match exactly — helpers in _util.py
keep numeric results bit-identical across engines (decimal sums, integer
division, total tie-break orders).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    survey: str  # SURVEY.md §2 operator ids this query covers, e.g. "J1,A1,O1"
    headline: bool = False  # include in bench.py
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    *,
    survey: str,
    oracle: str | None = None,
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            survey=survey,
            headline=headline,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect populates REGISTRY exactly once.
    from . import relational, windows, textops, similarity, domain, corpusops, eventops  # noqa: F401

    return REGISTRY
