"""Model checks for the PACF operator: a literal Durbin-Levinson
replay from the daily counts and the AR(1)-whitening property on a
synthetic series."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_pacf_matches_statsmodels_free_python_model(spark):
    """Durbin-Levinson replay in literal Python from the daily counts:
    same standard ACF normalization (global mean, lag-0 denominator),
    same recursion, same 1e6 floor."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.timeseries import PACF_MAX_LAG, timeseries_pacf
    from pyspark.sql import functions as F

    got = {r["lag"]: r["pacf"] for r in timeseries_pacf(spark, SF_SMOKE).collect()}
    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .orderBy("day")
        .collect()
    )
    from datetime import date

    byday = {
        (r["day"].date() - date(1992, 1, 1)).days: float(r["n"]) for r in daily
    }
    xs = byday  # day-number -> count (may have gaps; pairs align by day)
    m = sum(xs.values()) / len(xs)
    s0 = sum((v - m) ** 2 for v in xs.values())
    r = {}
    for k in range(1, PACF_MAX_LAG + 1):
        cov = sum(
            (xs[d] - m) * (xs[d + k] - m) for d in xs if d + k in xs
        )
        r[k] = cov / s0
    # Durbin-Levinson
    phi_prev: dict = {}
    want = {}
    for k in range(1, PACF_MAX_LAG + 1):
        if k == 1:
            pkk = r[1]
            phi = {1: pkk}
        else:
            num = r[k] - sum(phi_prev[j] * r[k - j] for j in range(1, k))
            den = 1.0 - sum(phi_prev[j] * r[j] for j in range(1, k))
            pkk = num / den
            phi = {j: phi_prev[j] - pkk * phi_prev[k - j] for j in range(1, k)}
            phi[k] = pkk
        want[k] = math.floor(pkk * 1e6 + 0.5) / 1e6
        phi_prev = phi
    assert set(got) == set(want)
    for k in want:
        assert got[k] is not None
        assert abs(got[k] - want[k]) <= 2e-6, (k, got[k], want[k])
    # PACF lag-1 equals ACF lag-1 by definition
    assert got[1] == math.floor(r[1] * 1e6 + 0.5) / 1e6


def test_pacf_whitens_an_ar1_series(spark, tmp_path):
    """On a synthetic AR(1) daily series, PACF at lag 1 is large and
    every higher lag is near zero — the defining property."""
    from datetime import datetime, timedelta

    from kinesis2sse_spark.queries.timeseries import timeseries_pacf

    # deterministic AR(1): x_t = 0.7 x_{t-1} + hash-noise, kept at
    # count scale so integer rounding can't crush the autocorrelation;
    # the noise hash is QUADRATIC in t — any linear t*K mod p mod m is
    # an arithmetic progression (structured, not noise)
    xs = [300.0]
    P = 1000000007
    for t in range(1, 120):
        noise = ((t * t % P) * 2654435761 + t * 40503) % P % 81 - 40
        xs.append(0.7 * xs[-1] + 90.0 + noise)
    rows = []
    base = datetime(1992, 1, 1)
    eid = 0
    for t, x in enumerate(xs):
        for i in range(max(1, int(round(x)))):
            rows.append(
                (eid, base + timedelta(days=t, seconds=i), 1, "view", 1.0, "{}")
            )
            eid += 1
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {r["lag"]: r["pacf"] for r in timeseries_pacf(spark, str(tmp_path)).collect()}
    assert got[1] > 0.5, got
    for k in range(2, 8):
        assert abs(got[k]) < 0.25, (k, got[k])


def test_theil_sen_matches_python_and_resists_outliers(spark, tmp_path):
    """Literal Python replay (same lower-median and tiebreaks) on the
    fixture, then a planted-outlier series: three 50x spike days must
    leave the Theil-Sen slope at the true trend while they would wreck
    an OLS fit."""
    import math
    from datetime import datetime, timedelta

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.timeseries import timeseries_theil_sen
    from pyspark.sql import functions as F
    from datetime import date

    got = timeseries_theil_sen(spark, SF_SMOKE).collect()[0]
    daily = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    pts = sorted(
        ((r["day"].date() - date(1992, 1, 1)).days, float(r["n"])) for r in daily
    )
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            di, ni = pts[i]
            dj, nj = pts[j]
            slopes.append(((nj - ni) / (dj - di), di, dj))
    slopes.sort()
    m = len(slopes)
    slope_med = slopes[(m + 1) // 2 - 1][0]
    resid = sorted((n - slope_med * d, d) for d, n in pts)
    r0 = resid[(len(resid) + 1) // 2 - 1][0]
    assert got["n_days"] == len(pts) and got["n_pairs"] == m
    assert got["slope"] == math.floor(slope_med * 1e6 + 0.5) / 1e6
    assert got["intercept"] == math.floor(r0 * 1e6 + 0.5) / 1e6

    # planted outliers: linear trend 100 + 2t, spikes on 3 of 30 days
    rows, eid = [], 0
    base = datetime(1992, 1, 1)
    for t in range(30):
        n = 100 + 2 * t
        if t in (7, 15, 23):
            n *= 50
        for i in range(n):
            rows.append((eid, base + timedelta(days=t, seconds=i), 1, "view", 1.0, "{}"))
            eid += 1
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = timeseries_theil_sen(spark, str(tmp_path)).collect()[0]
    assert abs(r["slope"] - 2.0) < 0.35, r["slope"]
