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


class _FakeState:
    """Minimal GroupState stand-in for driving the probe directly."""

    def __init__(self, value=None):
        self._v = value
        self.updated = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self.updated = v


def test_dedup_probe_exact_bucket_match_inside_coarse_group():
    """The r14 coarse state key groups several exact buckets together;
    the probe must match ONLY same-bucket earlier rows (identical
    vectors in different buckets of one group stay clean), and the
    exact integer threshold must agree with the old per-pair bigint
    rule (identical vectors pass, orthogonal-ish ones don't)."""
    import numpy as np
    import pandas as pd

    from kinesis2sse_spark.streaming.dedup import DEDUP_DIM, _dedup_probe_fn

    probe = _dedup_probe_fn(600)
    iq = [500000] * DEDUP_DIM
    batch = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "ts_s": [100, 110, 120],
            "bucket": [5, 13, 5],  # 5 % 8 == 13 % 8: same coarse group
            "iq": [iq, iq, iq],
        }
    )
    st = _FakeState()
    (out,) = list(probe((0, 5), iter([batch]), st))
    got = dict(zip(out["vec_id"], out["match_id"]))
    assert got[1] is pd.NA  # first sight
    assert got[2] is pd.NA  # identical vector, DIFFERENT bucket
    assert got[3] == 1      # identical vector, same bucket, in horizon
    # state keeps exact buckets for the next batch
    vids, tss, n2s, bks, iqs = st.updated
    assert bks == [5, 13, 5] and vids == [1, 2, 3]

    # next batch: carry-over match against state, horizon eviction per
    # exact bucket
    batch2 = pd.DataFrame(
        {
            "vec_id": [4, 5],
            "ts_s": [400, 1000],
            "bucket": [13, 5],
            "iq": [iq, iq],
        }
    )
    st2 = _FakeState((vids, tss, n2s, bks, iqs))
    (out2,) = list(probe((0, 5), iter([batch2]), st2))
    got2 = dict(zip(out2["vec_id"], out2["match_id"]))
    assert got2[4] == 2       # state member, same bucket 13, within 600s
    assert got2[5] is pd.NA   # bucket-5 members are 880-900s old


def test_minhash_arrow_bands_match_reference(spark):
    """The vectorized minhash banding kernel must be row-identical to
    the retained JVM reference pipeline — including the pinned edge
    semantics (empty text, empty tokens, <3-token docs, BMP unicode)."""
    from pyspark.sql import functions as F

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.streaming.dedup import (
        DEDUP_TS_BASE,
        _minhash_bands_reference,
        with_minhash_bands,
    )

    def src():
        return load_table(spark, SF, "documents").select(
            "doc_id",
            "text",
            F.timestamp_seconds(
                F.lit(DEDUP_TS_BASE) + F.col("doc_id")
            ).alias("ts"),
        )

    a, b = _minhash_bands_reference(src()), with_minhash_bands(src())
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

    edge = spark.createDataFrame(
        [
            (1, ""),
            (2, "a b"),
            (3, "a b c"),
            (4, "a  b  c"),
            (5, "héllo wörld tést"),
            (6, " a b c "),
        ],
        "doc_id long, text string",
    ).withColumn(
        "ts", F.timestamp_seconds(F.lit(DEDUP_TS_BASE) + F.col("doc_id"))
    )
    ea, eb = _minhash_bands_reference(edge), with_minhash_bands(edge)
    assert ea.exceptAll(eb).count() == 0
    assert eb.exceptAll(ea).count() == 0
