"""Named query pack. Import ``all_queries`` to get the populated registry."""

from .registry import REGISTRY, QuerySpec, all_queries

__all__ = ["REGISTRY", "QuerySpec", "all_queries"]
