"""Scale-stability spot checks at sf0.1 (the bench scale) for queries
whose correctness could plausibly be data-dependent — frame-boundary
precision, FP rounding conventions — beyond the sf0.01 driver gate."""

from __future__ import annotations

import pytest

from tests.conftest import assert_matches_oracle

SF_BENCH = "/root/testdata/sf0.1"

SPOT = [
    # µs-precision RANGE frame boundaries (regression: unix_timestamp
    # truncation diverged at sf0.1 while passing at sf0.01)
    "window_time_range",
    # FP rounding conventions under 10x more summation reorder
    "q1_pricing_summary",
    "dedup_ngram_jaccard",
    # engine round() modes disagree at exact half-way points — fixed
    # with explicit floor-based half-up (llm_text) and exact decimal
    # summation (q9); both first diverged ONLY at sf0.1
    "text_quality_score",
    "q9_product_type_profit",
    # round-6 additions whose FP surface grows with data: the OLS
    # moment quantization (vocab count and ln() magnitudes scale) and
    # the ln()-heavy drift score over fuller bands
    "text_zipf_slope",
    "stats_js_divergence",
]


@pytest.mark.parametrize("name", SPOT)
def test_matches_oracle_at_bench_scale(spark, name):
    assert_matches_oracle(spark, name, SF_BENCH)
