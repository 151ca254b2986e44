"""Query registry — the single source of truth for the driver contract.

Every implemented operator registers a named query (a callable
``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
``__spark_entry__.py`` and ``bench.py`` both read from this registry.

Conventions (driver compares row-count + schema + order-insensitive
value hash, columns sorted by name):
- alias every computed/aggregate column identically in Spark and SQL;
- round floating aggregates to a fixed scale on BOTH sides so
  summation order cannot flip the hash;
- deterministic output sets only: any LIMIT is preceded by a total
  order with a unique tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver runs rows-only check
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: rq.oracle for name, rq in _REGISTRY.items() if rq.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: rq.fn for name, rq in _REGISTRY.items() if rq.bench}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from kinesis2sse_spark.queries import (  # noqa: F401
        aggregates,
        event_pipeline,
        graph,
        joins,
        llm_dedup,
        llm_similarity,
        llm_text,
        multimodal,
        scalar_functions,
        setops,
        sortlimit,
        sources,
        streaming_queries,
        subqueries,
        timeseries,
        tpch,
        udfs,
        windows,
    )

    _LOADED = True
