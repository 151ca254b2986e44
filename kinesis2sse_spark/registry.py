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

FP determinism ladder (escalate when a query flips at some SF — found
via tools/sweep_oracles.py; the flip class is invisible at other SFs):
1. round(x, k) both sides — sufficient while x stays clear of exact
   half-way points at scale k;
2. floor(x*10^k + 0.5)/10^k both sides — engine round() MODES disagree
   at exact half-way doubles (Spark HALF_UP vs DuckDB); floor on the
   identical IEEE double is deterministic (see text_quality_score);
3. per-row CAST to DECIMAL(18,m) before SUM — a double SUM's last bits
   depend on partial-aggregation order, so a total sitting on a
   rounding boundary can flip; decimal summation is exact and
   order-independent (see q9_product_type_profit). Don't blanket-apply:
   decimal avg/division scale rules differ between engines.
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
# round and the rest never earn a driver row. This list is ROTATED each
# round to the 50 highest-signal unchecked queries. Round-4 window:
# everything that has never had a driver row in r01–r03 (70 queries for
# 50 slots — the ~20 left over, mostly scalar-function variants and
# small sort/limit forms, rotate in next round), front-loaded with the
# four streaming queries whose ts-unit wrong answers r03's window
# missed. Names not (yet) registered are skipped, so entries can be
# listed ahead of the code landing.
DRIVER_PRIORITY: tuple[str, ...] = (
    # streaming: wrong answers in r03 (ts-unit bug, fixed this round) —
    # prove it, plus the two streaming queries never checked at all
    "streaming_tumbling_window",
    "streaming_sliding_window",
    "streaming_session_window",
    "streaming_stream_stream_join",
    "streaming_dedup",
    "streaming_stream_static_join",
    # text analysis / pipeline family: zero driver rows ever
    "text_tfidf_top_terms",
    "text_ngrams",
    "text_scrub",
    "text_stopword_removal",
    "text_repetition_score",
    "decontaminate_ngram",
    "select_token_budget",
    "pipeline_sequence_packing",
    "pipeline_training_export",
    "mix_domain_weights",
    "filter_quality_percentile",
    "hist_token_lengths",
    "sample_systematic",
    "sample_stratified",
    # multimodal family: zero driver rows ever (two are rows-only)
    "mm_binary_meta",
    "mm_frame_sample",
    "mm_decode_features",
    "mm_audio_windows",
    "source_binary_files",
    # UDF surface: zero driver rows ever
    "udf_scalar_python",
    "udf_pandas_vectorized",
    "udf_grouped_zscore",
    "udtf_tokenize",
    # sources/sinks: zero driver rows ever
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "source_orc_roundtrip",
    "sink_partitioned_parquet",
    # window-function variants: zero driver rows ever
    "window_lag_lead",
    "window_running_agg",
    "window_sliding_rows",
    "window_first_last",
    "window_time_range",
    "window_distribution",
    # set ops: zero driver rows ever
    "union_all",
    "union_distinct",
    "intersect_distinct",
    "except_distinct",
    "intersect_all",
    # subqueries: zero driver rows ever
    "subquery_scalar",
    "subquery_in",
    "subquery_not_in_null_safe",
    "subquery_correlated_scalar_min",
    "subquery_nested_correlated_having",
    # dedup: containment never checked (+ new exact-collapse semantics)
    "dedup_ngram_containment",
)


def _checked_names() -> set[str]:
    """Union of query names across all recorded driver rounds
    (CORRECTNESS_r*.json in the repo root). Missing/garbled files are
    ignored — worst case the ordering degrades to registration order."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                out |= set(json.load(f))
        except Exception:
            continue
    return out


def _ordered() -> list[str]:
    """Driver window ordering, SELF-ROTATING: within both the manual
    DRIVER_PRIORITY list and the remaining registry, names with no
    CORRECTNESS row in any past round sort first. So even if a round
    forgets to update DRIVER_PRIORITY, the never-checked backlog flows
    into the driver's 50-query window automatically; the manual list
    still fronts this round's must-prove queries (e.g. fixed-red rows,
    which HAVE past rows and would otherwise rotate to the back)."""
    checked = _checked_names()
    pri = [n for n in DRIVER_PRIORITY if n in _REGISTRY]
    seen = set(pri)
    ordered = pri + [n for n in _REGISTRY if n not in seen]
    return [n for n in ordered if n not in checked] + [
        n for n in ordered if n in checked
    ]


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
