"""Model checks for the round-6 analytics additions: CUSUM changepoint
against a literal Python replay on a synthetic level shift, and the
Benford digit census against a Python count over the fixture."""

from __future__ import annotations

import datetime

from tests.conftest import SF_SMOKE


def test_cusum_finds_synthetic_level_shift(spark, tmp_path):
    """10 days at 5 events/day then 10 days at 50: |S_i| peaks exactly
    at the last pre-shift day, with the exact integer-derived value."""
    rows = []
    base = datetime.datetime(2024, 3, 1)
    for d in range(20):
        per_day = 5 if d < 10 else 50
        for k in range(per_day):
            rows.append((base + datetime.timedelta(days=d, minutes=k),))
    spark.createDataFrame(rows, "ts timestamp").write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from kinesis2sse_spark.queries.timeseries import timeseries_cusum_changepoint

    got = timeseries_cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    # python model: S_i = prefix_i - i * mean, mean = 550/20 = 27.5
    counts = [5] * 10 + [50] * 10
    mean = sum(counts) / len(counts)
    s = [sum(counts[: i + 1]) - (i + 1) * mean for i in range(len(counts) - 1)]
    peak = max(range(len(s)), key=lambda i: (abs(s[i]), -i))
    assert r["change_day"] == (base + datetime.timedelta(days=peak)).date()
    assert r["n_days"] == 20
    assert abs(r["cusum"] - s[peak]) < 1e-6


def test_benford_census_matches_python_model(spark):
    """Digit census over the fixture must equal a literal Python count
    of first digits of integer cents; fractions sum to ~1 and digits
    stay in 1..9."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.lakeops import stats_benford_deviation

    rows = stats_benford_deviation(spark, SF_SMOKE).collect()
    got = {r["digit"]: r["n_obs"] for r in rows}
    import math

    prices = [
        r["o_totalprice"]
        for r in load_table(spark, SF_SMOKE, "orders").select("o_totalprice").collect()
        if r["o_totalprice"] > 0
    ]
    want: dict[int, int] = {}
    for p in prices:
        d = int(str(int(math.floor(p * 100 + 0.5)))[0])
        want[d] = want.get(d, 0) + 1
    assert got == want
    assert set(got) <= set(range(1, 10))
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-4


def test_holt_linear_matches_python_replay(spark, tmp_path):
    """Holt level/trend/forecast over a synthetic ramp must equal a
    literal Python replay of the recursion (same IEEE op order)."""
    rows = []
    base = datetime.datetime(2024, 3, 1)
    counts = [3, 7, 4, 12, 9, 15, 11, 20]
    for d, per_day in enumerate(counts):
        for k in range(per_day):
            rows.append((base + datetime.timedelta(days=d, minutes=k),))
    spark.createDataFrame(rows, "ts timestamp").write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from kinesis2sse_spark.queries.timeseries import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_HORIZON,
        timeseries_holt_linear,
    )

    got = timeseries_holt_linear(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    l, b = float(counts[0]), 0.0
    for y in counts[1:]:
        lp = HOLT_ALPHA * y + (1 - HOLT_ALPHA) * (l + b)
        b = HOLT_BETA * (lp - l) + (1 - HOLT_BETA) * b
        l = lp
    assert r["n_days"] == len(counts)
    assert abs(r["level"] - l) < 1e-6
    assert abs(r["trend"] - b) < 1e-6
    assert abs(r[f"forecast_{HOLT_HORIZON}d"] - (l + HOLT_HORIZON * b)) < 1e-6


def test_seasonal_decompose_zero_residual_on_pure_weekly(spark, tmp_path):
    """A perfectly periodic weekly signal decomposes into dow means
    equal to the observed counts and residuals of exactly zero."""
    rows = []
    base = datetime.datetime(2024, 3, 4)  # a Monday
    pattern = [10, 20, 30, 40, 50, 5, 8]
    for d in range(21):  # three full weeks
        for k in range(pattern[d % 7]):
            rows.append((base + datetime.timedelta(days=d, minutes=k),))
    spark.createDataFrame(rows, "ts timestamp").write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from kinesis2sse_spark.queries.timeseries import timeseries_seasonal_decompose

    got = timeseries_seasonal_decompose(spark, str(tmp_path)).collect()
    assert len(got) == 21
    for r in got:
        assert r["residual"] == 0.0, r
        assert r["dow_mean"] == float(r["n"]), r
        # epoch-day modulus: 2024-03-04 is epoch day 19786, 19786 % 7 == 4
        offset = (r["day"] - datetime.date(2024, 3, 4)).days
        assert r["dow"] == (19786 + offset) % 7


def test_readability_formula_replay(spark, tmp_path):
    """Flesch score on a known sentence equals the literal formula with
    vowel-group syllables and doc-as-one-sentence."""
    docs = [(1, "the quick brown fox jumps"), (2, "aa b"), (3, "")]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from kinesis2sse_spark.queries.llm_text import text_readability

    got = {r["doc_id"]: r for r in text_readability(spark, str(tmp_path)).collect()}
    # doc 1: 5 words; syllables = vowel-groups: e|ui|o|o|u = 5
    r = got[1]
    assert r["n_words"] == 5 and r["n_syllables"] == 5
    assert abs(r["flesch_score"] - (206.835 - 1.015 * 5 - 84.6 * 1.0)) < 1e-6
    # doc 2: 2 words, 1 vowel group ("aa"; "b" has none)
    r = got[2]
    assert r["n_words"] == 2 and r["n_syllables"] == 1
    # doc 3: split('') -> [''] in Spark = 1 word of zero syllables — it
    # still passes the n_words > 0 gate with the degenerate-but-defined
    # score; both engines agree (locked by the oracle sweep)
    assert 3 in got and got[3]["n_syllables"] == 0


def test_toxicity_threshold_integer_edge(spark, tmp_path):
    """Flagging compares integer cross-products: a doc at EXACTLY the
    ppm threshold is NOT flagged (strict >), one token over is."""
    from kinesis2sse_spark.queries.llm_text import (
        TOXICITY_THRESHOLD_PPM,
        classify_toxicity_lexicon,
    )

    assert TOXICITY_THRESHOLD_PPM == 40000  # 1/25
    exactly = "bad " + "ok " * 24  # 1 hit / 25 tokens = threshold
    over = "bad bad " + "ok " * 23  # 2 hits / 25 tokens
    docs = [(1, exactly.strip()), (2, over.strip()), (3, "clean words only")]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in classify_toxicity_lexicon(spark, str(tmp_path)).collect()
    }
    assert got[1]["n_hits"] == 1 and got[1]["flagged"] is False
    assert got[2]["n_hits"] == 2 and got[2]["flagged"] is True
    assert got[3]["n_hits"] == 0 and got[3]["flagged"] is False


def test_boilerplate_fraction_counts_positions_not_grams(spark, tmp_path):
    """Three docs sharing one 3-gram (>= BOILERPLATE_DF) and one doc
    repeating it: the fraction is over gram POSITIONS, so the repeat
    counts twice in the numerator and denominator."""
    from kinesis2sse_spark.queries.llm_text import (
        BOILERPLATE_DF,
        text_boilerplate_fraction,
    )

    assert BOILERPLATE_DF == 3
    common = "click here now"
    docs = [
        (1, common + " unique alpha beta"),
        (2, common + " gamma delta epsilon"),
        (3, common + " " + common),  # the 3-gram appears at 2 positions... plus straddles
        (4, "totally unrelated words here"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in text_boilerplate_fraction(spark, str(tmp_path)).collect()
    }
    # doc 1: 4 gram positions, 1 boiler ("click here now")
    assert rows[1]["n_grams"] == 4 and rows[1]["n_boiler"] == 1
    # doc 3: 6 tokens -> 4 positions; "click here now" at positions 1 and 4
    assert rows[3]["n_grams"] == 4 and rows[3]["n_boiler"] == 2
    assert rows[3]["boiler_frac"] == 0.5
    # doc 4 shares no gram with anyone
    assert rows[4]["n_boiler"] == 0


def test_cross_source_overlap_token_set_identity(spark, tmp_path):
    """The fingerprint is order- and repetition-insensitive: a shuffled,
    token-repeating copy in another source counts as shared; a doc with
    an extra token does not. Coefficient = shared / min(|A|, |B|)."""
    docs = [
        (1, "alpha beta gamma", "A"),
        (2, "gamma beta alpha alpha", "B"),   # same token set as doc 1
        (3, "alpha beta gamma delta", "B"),   # superset -> different
        (4, "zeta eta", "A"),
        (5, "zeta eta", "C"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from kinesis2sse_spark.queries.llm_dedup import dedup_cross_source_overlap

    rows = {
        (r["src_a"], r["src_b"]): r
        for r in dedup_cross_source_overlap(spark, str(tmp_path)).collect()
    }
    # A={abg, ze}, B={abg, abgd}, C={ze}
    ab = rows[("A", "B")]
    assert ab["n_shared"] == 1 and ab["n_a"] == 2 and ab["n_b"] == 2
    assert ab["overlap_coeff"] == 0.5
    ac = rows[("A", "C")]
    assert ac["n_shared"] == 1 and ac["overlap_coeff"] == 1.0
    assert ("B", "C") not in rows  # nothing shared -> no row


def test_incremental_agg_merge_equals_direct_recompute(spark, tmp_path):
    """The merged 80/20 partials must equal a direct single-pass
    aggregate, including keys present in only one side and the
    NULL-value rows both paths drop."""
    rows = []
    for eid in range(40):
        uid = eid % 3 if eid % 10 < 8 else 100 + eid % 2  # batch-only keys
        rows.append((eid, uid, None if eid % 7 == 0 else float(eid) * 0.31))
    spark.createDataFrame(
        rows, "event_id long, user_id long, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from kinesis2sse_spark.queries.lakeops import pipeline_incremental_agg

    got = {
        r["user_id"]: r for r in pipeline_incremental_agg(spark, str(tmp_path)).collect()
    }
    import collections
    import math

    direct = collections.defaultdict(list)
    for eid, uid, v in rows:
        if v is not None:
            direct[uid].append(v)
    assert set(got) == set(direct)
    for uid, vs in direct.items():
        r = got[uid]
        sq = sum(math.floor(v * 1000000) for v in vs)
        assert r["n_events"] == len(vs)
        assert r["sum_value_q"] == sq
        assert r["min_value"] == min(vs) and r["max_value"] == max(vs)
        assert r["avg_value"] == math.floor(sq / len(vs) + 0.5) / 1000000


def test_spearman_matches_python_model_with_ties(spark, tmp_path):
    """rho on a fixture with heavy ties equals a literal average-rank
    Pearson replay; a perfectly monotone corpus gives exactly 1.0."""
    docs = [
        (1, "a b c", 10), (2, "a b c d", 10), (3, "a b", 30),
        (4, "a b c d e f", 40), (5, "a", 40), (6, "a b c d e", 55),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from kinesis2sse_spark.queries.aggregates import stats_spearman_rank

    row = stats_spearman_rank(spark, str(tmp_path)).collect()[0]

    def avg_ranks(vals):
        out = []
        for v in vals:
            less = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            out.append(less + (eq + 1) / 2)
        return out

    import math

    a = [d[2] for d in docs]
    b = [len(d[1].split(" ")) for d in docs]
    ra, rb = avg_ranks(a), avg_ranks(b)
    n = len(ra)
    ma, mb = sum(ra) / n, sum(rb) / n
    num = sum((x - ma) * (y - mb) for x, y in zip(ra, rb))
    den = math.sqrt(
        sum((x - ma) ** 2 for x in ra) * sum((y - mb) ** 2 for y in rb)
    )
    assert row["n_docs"] == n
    assert abs(row["rho_spearman"] - num / den) < 2e-6
    # monotone corpus -> rho exactly 1
    mono = [(i, "t " * (i + 1), 10 * (i + 1)) for i in range(5)]
    spark.createDataFrame(
        mono, "doc_id long, text string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = stats_spearman_rank(spark, str(tmp_path)).collect()[0]
    assert row["rho_spearman"] == 1.0


def test_gini_known_distributions(spark, tmp_path):
    """Exact grouped-form Gini: uniform corpus -> 0; a known skewed
    fixture matches the literal rank-weighted formula."""
    import math

    def write(docs):
        spark.createDataFrame(
            [(i, " ".join(["t"] * n)) for i, n in enumerate(docs)],
            "doc_id long, text string",
        ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from kinesis2sse_spark.queries.aggregates import stats_gini_concentration

    write([7, 7, 7, 7])  # perfectly equal
    row = stats_gini_concentration(spark, str(tmp_path)).collect()[0]
    assert row["gini"] == 0.0 and row["n_docs"] == 4 and row["total_tokens"] == 28

    counts = [1, 1, 2, 5, 5, 40]
    write(counts)
    row = stats_gini_concentration(spark, str(tmp_path)).collect()[0]
    xs = sorted(counts)
    n, t = len(xs), sum(xs)
    g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * t) - (n + 1) / n
    assert abs(row["gini"] - g) < 1e-6
    assert row["total_tokens"] == t


def test_approx_distinct_contract_all_within_bound(spark):
    """The HLL error contract holds on the fixture and the exact side
    equals a direct distinct count."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.aggregates import agg_approx_distinct_contract

    from pyspark.sql import functions as F

    rows = agg_approx_distinct_contract(spark, SF_SMOKE).collect()
    assert rows and all(r["within_bound"] for r in rows)
    li = load_table(spark, SF_SMOKE, "lineitem")
    want = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert {r["l_returnflag"]: r["n_exact"] for r in rows} == want


def test_holt_empty_series_returns_no_rows(spark, tmp_path):
    """All-NULL-ts (or empty) events: the global aggregate must not
    leak a zeroed-state row — the oracle's recursive anchor is empty,
    so both engines agree on 0 rows."""
    spark.createDataFrame(
        [(None,), (None,)], "ts timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from kinesis2sse_spark.queries.timeseries import timeseries_holt_linear

    assert timeseries_holt_linear(spark, str(tmp_path)).count() == 0


def test_spearman_overflow_safe_at_55k_distinct(spark, tmp_path):
    """The final cross-products must run in DOUBLE: 60k distinct-valued
    rows overflow int64 in n*sab (~4n^4) — this corpus crashed the
    pre-fix expression under ANSI and silently wrapped without it."""
    n = 60000
    spark.range(n).selectExpr(
        "id AS doc_id",
        "repeat('t ', CAST(id % 97 + 1 AS INT)) AS text",
        "id AS n_chars",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from kinesis2sse_spark.queries.aggregates import stats_spearman_rank

    row = stats_spearman_rank(spark, str(tmp_path)).collect()[0]
    assert row["n_docs"] == n
    assert -1.0 <= row["rho_spearman"] <= 1.0


def test_dataset_card_empty_corpus_yields_no_rows(spark, tmp_path):
    """Empty documents table: the card must emit ZERO rows (matching
    the oracle's HAVING), not crash on an ANSI divide-by-zero."""
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from kinesis2sse_spark.queries.llm_text import stats_dataset_card

    assert stats_dataset_card(spark, str(tmp_path)).count() == 0
