"""Property tests for the round-11 operators — semantics pinned against
independent Python models and structural invariants, beyond the sf0.01
oracle battery."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis2sse_spark.registry import all_queries
from tests.conftest import SF_SMOKE, duckdb_connect


def _run(spark, name, sf=SF_SMOKE):
    spark.catalog.clearCache()
    return all_queries()[name](spark, sf).toPandas()


def test_randomized_response_mechanism_properties(spark):
    """The RR coin must actually flip (~1/4 of rows — a mechanism that
    never fires is privacy theater), the debias must recover the true
    rate within sampling noise at cohort n, and the flip decision must
    match the integer hash rule replayed in pure Python."""
    from kinesis2sse_spark.queries.privacy import RR_COHORT, RR_P, RR_SEED

    df = _run(spark, "privacy_randomized_response")
    assert len(df) >= 2, "need multiple cohorts"
    # pure-Python replay of the mechanism over the raw fixture
    con = duckdb_connect(SF_SMOKE)
    rows = con.execute(
        "SELECT event_id, user_id, event_type FROM events"
    ).fetchall()
    agg = {}
    n_flipped = 0
    for eid, uid, et in rows:
        b = 1 if et == "purchase" else 0
        flip = ((eid % RR_P + RR_SEED * 7919) * 2654435761) % RR_P % 4 == 0
        n_flipped += flip
        r = 1 - b if flip else b
        c = uid // RR_COHORT
        a = agg.setdefault(c, [0, 0, 0])
        a[0] += 1
        a[1] += b
        a[2] += r
    # flip rate ~ 1/4 (exact integer coin; binomial noise at n=1000)
    assert 0.18 < n_flipped / len(rows) < 0.32
    for _, row in df.iterrows():
        n, nt, nr = agg[row["cohort"]]
        assert row["n"] == n and row["n_true"] == nt and row["n_reported"] == nr
        # debiased estimate recovers truth within ~4 sigma of RR noise
        # (sd = sqrt(3/16/n) for the 3/4-coin)
        sigma = (3 / 16 / n) ** 0.5
        assert abs(row["pi_hat"] - row["pi_true"]) < 4 * sigma + 1e-6, (
            row["cohort"], row["pi_hat"], row["pi_true"], sigma,
        )
        # and the reports genuinely differ from the truth
        assert row["n_reported"] != row["n_true"]


def test_quantile_histogram_matches_exact_percentiles_to_bucket(spark):
    """The histogram quantile must equal the EXACT nearest-rank
    percentile floored to the bucket width — the operator's documented
    resolution contract, checked against sorted raw values in Python."""
    import math

    df = _run(spark, "streaming_quantile_histogram").set_index("event_type")
    con = duckdb_connect(SF_SMOKE)
    rows = con.execute(
        "SELECT event_type, value FROM events WHERE value IS NOT NULL"
    ).fetchall()
    byt = {}
    for et, v in rows:
        byt.setdefault(et, []).append(v)
    for et, vals in byt.items():
        vals.sort()
        n = len(vals)
        for q, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            exact = vals[math.ceil(q * n / 100) - 1]
            assert df.loc[et, col] == math.floor(exact), (et, col)
