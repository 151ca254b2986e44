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


# The correctness driver checks the FIRST 50 entries of queries() in
# iteration order. Registration order is import order (alphabetical by
# module), so without intervention the same 50 get re-checked every
# round and the rest never earn a driver row. This list front-loads the
# round's highest-signal window: queries whose driver rows were red last
# round (now fixed), then families with no driver row yet. Names not
# (yet) registered are skipped, so entries can be listed ahead of the
# code landing.
DRIVER_PRIORITY: tuple[str, ...] = (
    # red in CORRECTNESS_r01 (nanos-read / array-cell) — fixed, prove it
    "asof_replay",
    "envelope_validate_project",
    "offsets_contiguous",
    "retention_last_n",
    "retention_max_age",
    "ingest_envelope_pipeline",
    "tail_offset",
    "join_asof",
    "agg_min_max_by",
    "agg_stats",
    "agg_percentile",
    "agg_filtered",
    "agg_array_collect",
    # new this round
    "kpl_deaggregate",
    "sim_recall_lsh",
    "sim_recall_ivf",
    "dedup_recall_minhash",
    # TPC-H — no driver rows in round 1
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_part_value",
    "q12_late_shipment_priority",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_parts_supplier_count",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    # one–three representatives per family with no round-1 driver row
    "window_ranks",
    "window_range_frame",
    "topk_per_group",
    "except_all",
    "scalar_variant",
    "scalar_string",
    "subquery_correlated_exists",
    "join_skew_salted",
    "sort_limit_topn",
    "envelope_canonical_json",
    "streaming_stateful_offsets",
    "timeseries_gapfill",
)


def _ordered() -> list[str]:
    names = [n for n in DRIVER_PRIORITY if n in _REGISTRY]
    seen = set(names)
    names.extend(n for n in _REGISTRY if n not in seen)
    return names


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: _REGISTRY[name].fn for name in _ordered()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: _REGISTRY[name].oracle
        for name in _ordered()
        if _REGISTRY[name].oracle is not None
    }


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
