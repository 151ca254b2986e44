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
