"""Model-semantics tests for the round-12 operators — properties the
DuckDB oracle comparison cannot express (cross-operator invariants,
mechanism-level guarantees, artifact lifecycle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis2sse_spark.registry import all_queries

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_holm_dominates_bh_pointwise(spark):
    """Holm controls FWER, BH only FDR — on the SAME p-value family
    Holm's adjusted p must be >= BH's for every hypothesis (both are
    monotone transforms of the same ranked p's; Holm multiplies by
    m-rank+1 cummax'd down, BH by m/rank cummin'd up). Also: both
    must share identical raw p-values and ranks, which pins that the
    refactor really did leave the family shared."""
    qs = all_queries()
    bh = {r["hypothesis"]: r for r in qs["stats_fdr_bh"](spark, SF).collect()}
    holm = {
        r["hypothesis"]: r
        for r in qs["stats_holm_bonferroni"](spark, SF).collect()
    }
    assert set(bh) == set(holm) and len(bh) >= 3
    for h in bh:
        assert bh[h]["p_value"] == holm[h]["p_value"], h
        assert bh[h]["p_rank"] == holm[h]["p_rank"], h
        assert holm[h]["p_adj"] >= bh[h]["p_adj"] - 1e-9, h
    # Holm's adjusted p is non-decreasing in rank (step-down cummax)
    by_rank = sorted(holm.values(), key=lambda r: r["p_rank"])
    adjs = [r["p_adj"] for r in by_rank]
    assert adjs == sorted(adjs)


def test_dp_histogram_mechanism_model(spark):
    """The geometric mechanism's integer inverse CDF: thresholds sum
    exactly to DP_M (total probability 1), noise stays within the
    truncation bound, the draw is deterministic (same cells -> same
    noise across calls), and n_noisy is the clamped sum."""
    from kinesis2sse_spark.queries.privacy import DP_B, DP_M, _dp_noise_sql

    # model-level: replay the CASE ladder over every residue
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {_dp_noise_sql('u')} AS k FROM "
        f"(SELECT unnest(range(0, {DP_M})) AS u)"
    ).fetchall()
    ks = [r[0] for r in rows]
    assert len(ks) == DP_M
    assert all(-DP_B <= k <= DP_B for k in ks)
    # symmetric: P(k) == P(-k) for all k
    from collections import Counter

    c = Counter(ks)
    for k in range(1, DP_B + 1):
        assert c[k] == c[-k], k
    # alpha = 1/2 shape away from the folded tail
    for k in range(1, DP_B - 1):
        assert c[k] * 2 == c[k - 1] or k == 0, k

    qs = all_queries()
    a = {r["event_type"]: r for r in qs["privacy_dp_histogram"](spark, SF).collect()}
    b = {r["event_type"]: r for r in qs["privacy_dp_histogram"](spark, SF).collect()}
    assert a.keys() == b.keys() and len(a) >= 2
    for t in a:
        assert a[t]["noise"] == b[t]["noise"], "mechanism must be deterministic"
        assert -DP_B <= a[t]["noise"] <= DP_B
        assert a[t]["n_noisy"] == max(a[t]["n_true"] + a[t]["noise"], 0)


def test_contribution_bounding_honors_cap(spark):
    """No user may contribute more than PRIV_USER_CAP events to the
    bounded aggregates — checked by replaying the keep-rule directly:
    the total bounded count equals sum over users of min(cap, n_u)."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.privacy import PRIV_USER_CAP

    qs = all_queries()
    out = qs["privacy_contribution_bounding"](spark, SF)
    total_bounded = out.agg(F.sum("n_bounded")).collect()[0][0]
    per_user = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.least(F.count("*"), F.lit(PRIV_USER_CAP)).alias("kept"))
        .agg(F.sum("kept"))
        .collect()[0][0]
    )
    assert total_bounded == per_user


def test_blocking_quality_bounds(spark):
    """Census invariants: both metrics in [0, 1], covered <= gold,
    candidate pairs <= total pairs, and the candidate count really is
    the block histogram's pair sum (replayed independently)."""
    from kinesis2sse_spark.catalog import load_table

    qs = all_queries()
    r = qs["er_blocking_quality"](spark, SF).collect()[0]
    assert 0.0 <= r["reduction_ratio"] <= 1.0
    assert r["gold_covered"] <= r["gold_pairs"]
    assert r["cand_pairs"] <= r["total_pairs"]
    if r["gold_pairs"] > 0:
        assert 0.0 <= r["pairs_completeness"] <= 1.0
    docs = load_table(spark, SF, "documents")
    bkey = F.array_join(F.slice(F.split("text", " "), 1, 2), " ")
    expect = (
        docs.groupBy(bkey.alias("b"))
        .count()
        .agg(F.sum(F.expr("count * (count - 1) div 2")))
        .collect()[0][0]
    )
    assert r["cand_pairs"] == expect


def test_rake_scores_hand_fixture(spark):
    """RAKE on a hand-computable two-doc corpus: phrases split at
    stopwords, deg/freq scores, per-occurrence phrase sums."""
    import pandas as pd

    from kinesis2sse_spark.queries.llm_text import text_rake_keywords

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "red apple and red apple pie",
                    "green pear",
                ],
                "lang": ["en", "en"],
                "source": ["t", "t"],
                "n_chars": [27, 10],
            }
        )
    )
    import os
    import tempfile

    d = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {
        (r["doc_id"], r["phrase"]): (r["n_words"], r["score_s"], r["rank"])
        for r in text_rake_keywords(spark, d).collect()
    }
    # doc 1 phrases: "red apple" (pos 1-2) and "red apple pie"
    # (pos 4-6, 'and' delimits); doc 2: "green pear".
    # freq: red=2, apple=2, pie=1, green=1, pear=1
    # deg: red = 2+3 = 5, apple = 5, pie = 3, green=2, pear=2
    # scores(1e6): red = 5*1e6//2 = 2500000, apple = 2500000, pie = 3000000
    # "red apple" = 5000000; "red apple pie" = 8000000; "green pear" = 4000000
    assert out[(1, "red apple pie")] == (3, 8000000, 1)
    assert out[(1, "red apple")] == (2, 5000000, 2)
    assert out[(2, "green pear")] == (2, 4000000, 1)


def test_prebuilt_graph_twins_match_inline(spark):
    """The build/probe split must be output-IDENTICAL to the inline
    rungs (same helper, same oracle): row-set equality checked
    directly, plus the artifact roundtrip (a second probe call reads
    the artifact without rebuilding — byte-identical again)."""
    qs = all_queries()
    inline = {
        tuple(r) for r in qs["graph_hits"](spark, SF01).collect()
    }
    probe1 = {
        tuple(r) for r in qs["graph_hits_prebuilt"](spark, SF01).collect()
    }
    probe2 = {
        tuple(r) for r in qs["graph_hits_prebuilt"](spark, SF01).collect()
    }
    assert inline == probe1 == probe2 and len(inline) > 0
    ia = {tuple(r) for r in qs["graph_degree_assortativity"](spark, SF01).collect()}
    pa = {tuple(r) for r in qs["graph_assortativity_prebuilt"](spark, SF01).collect()}
    assert ia == pa
    ic = {tuple(r) for r in qs["dedup_connected_components"](spark, SF01).collect()}
    pc = {tuple(r) for r in qs["dedup_cc_prebuilt"](spark, SF01).collect()}
    assert ic == pc and len(ic) > 0


def test_dp_mean_clip_and_quantize_model(spark):
    """privacy_dp_mean invariants: |per-release noise| <= DP_B steps,
    the quantized sum sits on the DP_CLIP lattice within half a step of
    the clipped sum, dp_sum = quantized + steps*DP_CLIP, and the whole
    release is deterministic across calls."""
    from kinesis2sse_spark.queries.privacy import DP_B, DP_CLIP

    qs = all_queries()
    a = qs["privacy_dp_mean"](spark, SF).collect()[0]
    b = qs["privacy_dp_mean"](spark, SF).collect()[0]
    assert a == b, "release must be deterministic"
    assert a["sum_quantized"] % DP_CLIP == 0
    assert abs(a["sum_quantized"] - a["sum_clipped"]) * 2 <= DP_CLIP
    assert abs(a["noise_steps"]) <= DP_B
    assert a["dp_sum_milli"] == a["sum_quantized"] + a["noise_steps"] * DP_CLIP
    assert a["dp_n_users"] >= 1
