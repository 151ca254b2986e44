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


def test_asof_nearest_distance_optimality(spark):
    """join_asof_nearest must pick, for EVERY probe, a version at the
    true minimum |ts distance| among all same-user versions — checked
    against a pure-Python scan of the raw fixture (independent of both
    engines' window machinery), plus the documented backward
    preference on exact ties."""
    con = duckdb_connect(SF_SMOKE)
    versions = {}
    for uid, ts, eid, val in con.execute(
        "SELECT user_id, ts, event_id, value FROM events"
        " WHERE event_type = 'purchase'"
    ).fetchall():
        versions.setdefault(uid, []).append((ts, eid, val))
    probes = con.execute(
        "SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'"
    ).fetchall()

    got = {
        r["event_id"]: (r["dim_value"], r["direction"])
        for r in _run_df(spark, "join_asof_nearest").collect()
    }
    n_fwd = n_bwd = 0
    for uid, ts, eid in probes:
        cands = versions.get(uid)
        if not cands:
            assert eid not in got
            continue
        best = min(abs((ts - vts).total_seconds()) for vts, _, _ in cands)
        val, direction = got[eid]
        matched = [
            (vts, veid, v)
            for vts, veid, v in cands
            if abs((ts - vts).total_seconds()) == best and v == val
        ]
        assert matched, (eid, best, val)
        # documented tie rule: equal distance on both sides -> backward
        has_bwd = any(vts <= ts and abs((ts - vts).total_seconds()) == best
                      for vts, _, _ in cands)
        if has_bwd:
            assert direction == "backward", eid
        n_fwd += direction == "forward"
        n_bwd += direction == "backward"
    # both directions must actually occur at fixture scale
    assert n_fwd > 0 and n_bwd > 0, (n_fwd, n_bwd)


def _run_df(spark, name, sf=SF_SMOKE):
    spark.catalog.clearCache()
    from kinesis2sse_spark.registry import all_queries as _aq

    return _aq()[name](spark, sf)


def test_t_closeness_python_emd_replay(spark):
    """privacy_t_closeness's EMD and gate replayed in exact-integer
    Python over the raw fixture — independent of both engines'
    window/join machinery."""
    from fractions import Fraction

    from kinesis2sse_spark.queries.privacy import (
        SENSITIVE_BUCKET,
        T_CLOSE_DEN,
        T_CLOSE_NUM,
    )

    con = duckdb_connect(SF_SMOKE)
    rows = con.execute(
        "SELECT lang, source, n_chars FROM documents"
    ).fetchall()
    gcount: dict = {}
    ccount: dict = {}
    for lang, src, n_chars in rows:
        b = n_chars // SENSITIVE_BUCKET
        gcount[b] = gcount.get(b, 0) + 1
        ccount.setdefault((lang, src), {})
        ccount[(lang, src)][b] = ccount[(lang, src)].get(b, 0) + 1
    buckets = sorted(gcount)
    G = sum(gcount.values())
    got = {
        (r["lang"], r["source"]): (r["class_size"], r["emd"], r["is_t_close"])
        for r in _run_df(spark, "privacy_t_closeness").collect()
    }
    assert set(got) == set(ccount)
    regimes = set()
    for cls, cnts in ccount.items():
        C = sum(cnts.values())
        cumg = cumc = num = 0
        for b in buckets:
            cumg += gcount[b]
            cumc += cnts.get(b, 0)
            num += abs(cumg * C - cumc * G)
        emd = Fraction(num, G * C * (len(buckets) - 1))
        ok = T_CLOSE_DEN * num <= T_CLOSE_NUM * G * C * (len(buckets) - 1)
        size, gemd, gok = got[cls]
        assert size == C and gok == ok, cls
        import math

        assert gemd == math.floor(float(emd) * 1e6 + 0.5) / 1e6, cls
        regimes.add(ok)
    assert regimes == {True, False}, "both gate regimes must appear"
