"""Round-14 optimization tests: invariants for operator internals the
optimization round changed (guide-driven rewrites must not move any
declared query's output)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis2sse_spark.registry import all_queries

SF = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


def test_lsh_python_xxhash64_matches_spark(spark):
    """The Python reimplementation of Spark's xxhash64 (the constant
    hyperplane generator for the vectorized LSH signature stage) must be
    value-identical to F.xxhash64 on the int-triple domain it covers —
    including negative-hash cases and the full (table, plane, dim)
    lattice corners."""
    from kinesis2sse_spark.queries.llm_similarity import _xxhash64_ints

    cases = [
        (t, p, d)
        for t in (0, 1, 7, 15)
        for p in (0, 3, 5)
        for d in (0, 1, 31, 63, 127)
    ]
    df = spark.range(1).select(
        *[
            F.xxhash64(F.lit(t), F.lit(p), F.lit(d)).alias(f"h{i}")
            for i, (t, p, d) in enumerate(cases)
        ]
    )
    row = df.collect()[0]
    for i, tpl in enumerate(cases):
        assert _xxhash64_ints(tpl) == row[f"h{i}"], tpl


def test_lsh_arrow_signatures_match_hof(spark):
    """The mapInArrow signature stage must produce byte-identical bucket
    ids to the reference JVM-HOF _lsh_signature for every corpus vector
    (same hyperplane constants, same IEEE accumulation order) — the
    equivalence that keeps sim_topk_lsh's candidate sets, and therefore
    sim_recall_lsh's oracle-checked recall contract, unchanged."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import (
        LSH_PLANES,
        LSH_TABLES,
        _lsh_sign,
        _lsh_signature,
        _with_norm,
    )

    corpus = _with_norm(load_table(spark, SF, "embeddings"))
    ref = corpus.select(
        "vec_id",
        *[
            _lsh_signature(F.col("v"), t, LSH_PLANES).alias(f"b{t}")
            for t in range(LSH_TABLES)
        ],
    )
    new = _lsh_sign(corpus).select(
        "vec_id",
        *[F.col("sigs")[t].alias(f"b{t}") for t in range(LSH_TABLES)],
    )
    assert ref.exceptAll(new).count() == 0
    assert new.exceptAll(ref).count() == 0


def test_lsh_plan_has_no_python_hash_hof(spark):
    """sim_topk_lsh's plan must carry the vectorized signature stage
    (PythonMapInArrow) and no interpreted per-element xxhash64 chain."""
    qs = all_queries()
    df = qs["sim_topk_lsh"](spark, SF_SMOKE)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "MapInArrow" in plan
    assert "xxhash64" not in plan
