"""Declared-query registry.

Every operator the engine claims (SURVEY.md §2.2 inventory plus the
training-data-pipeline pack) registers here exactly once, carrying
both its Spark implementation and — when SQL-expressible — the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports this
registry verbatim, so a query is "declared" if and only if it is
registered, keeping the contract in one place.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in all_queries().items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module (side effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred to avoid circularity at package import time.
    from zvdb_spark.queries import (  # noqa: F401
        aggregates,
        ann,
        dedup,
        joins,
        multimodal,
        relational,
        scalar,
        setops,
        streaming_twins,
        text,
        vector,
        windows,
    )

    _LOADED = True
