"""Property / reference-model tests for the late-round-10 operators —
defense beyond the sf0.01 oracle battery (test_oracle_all.py covers
equivalence; these pin the SEMANTICS against independent Python
models and structural invariants)."""

from __future__ import annotations

import math

import pytest

from kinesis2sse_spark.registry import all_queries
from tests.conftest import SF_SMOKE, duckdb_connect


def _run(spark, name, sf=SF_SMOKE):
    spark.catalog.clearCache()
    return all_queries()[name](spark, sf).toPandas()


def test_prefix_filter_matches_bruteforce_python(spark):
    """dedup_jaccard_prefix_filter == brute-force jaccard over
    distinct shingle sets, recomputed in pure Python from the raw
    fixture — independent of BOTH engines' join machinery."""
    from kinesis2sse_spark.queries.llm_dedup import PF_THRESHOLD

    con = duckdb_connect(SF_SMOKE)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    sets = {}
    for doc_id, text in docs:
        t = text.split(" ")
        if len(t) >= 3:
            sets[doc_id] = {
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            }
    ids = sorted(sets)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= PF_THRESHOLD:
                expected.add((a, b))
    got = _run(spark, "dedup_jaccard_prefix_filter")
    assert {(r.doc_a, r.doc_b) for r in got.itertuples()} == expected


def test_holt_winters_matches_python_reference(spark):
    """timeseries_holt_winters == a direct Python implementation of
    the additive HW recursion on the daily counts."""
    from kinesis2sse_spark.queries.timeseries import (
        HW_ALPHA,
        HW_ALPHA_C,
        HW_BETA,
        HW_BETA_C,
        HW_GAMMA,
        HW_GAMMA_C,
        HW_HORIZON,
        HW_SEASON,
    )

    con = duckdb_connect(SF_SMOKE)
    ys = [
        r[0]
        for r in con.execute(
            "SELECT count(*) FROM events WHERE ts IS NOT NULL"
            " GROUP BY date_trunc('day', ts) ORDER BY date_trunc('day', ts)"
        ).fetchall()
    ]
    m = HW_SEASON
    assert len(ys) >= 2 * m
    level = sum(ys[:m]) / m
    b = (sum(ys[m : 2 * m]) - sum(ys[:m])) / (m * m)
    s = [y - level for y in ys[:m]]
    for t in range(m, len(ys)):
        p = t % m
        sp = s[p]
        y = ys[t]
        lp = HW_ALPHA * (y - sp) + HW_ALPHA_C * (level + b)
        bp = HW_BETA * (lp - level) + HW_BETA_C * b
        gnew = HW_GAMMA * (y - level - b) + HW_GAMMA_C * sp
        level, b, s[p] = lp, bp, gnew
    n = len(ys)
    fc = level + HW_HORIZON * b + s[(n + HW_HORIZON - 1) % m]
    got = _run(spark, "timeseries_holt_winters").iloc[0]
    assert got.n_days == n
    assert math.isclose(got.level, level, abs_tol=2e-6)
    assert math.isclose(got.trend, b, abs_tol=2e-6)
    assert math.isclose(got[f"forecast_{HW_HORIZON}d"], fc, abs_tol=2e-6)


def test_fdr_bh_adjustment_recomputed_in_python(spark):
    """stats_fdr_bh's adjusted p-values follow the BH step-up exactly
    (recomputed from its own raw p-values), the controls reject, and
    the natural (exchangeable-by-synthesis) hypotheses do not."""
    from kinesis2sse_spark.queries.aggregates import FDR_Q

    got = _run(spark, "stats_fdr_bh").sort_values("p_rank").reset_index(drop=True)
    m = len(got)
    ps = list(got.p_value)
    expect_adj = [
        min(1.0, min(ps[j] * m / (j + 1) for j in range(i, m)))
        for i in range(m)
    ]
    for a, e in zip(got.p_adj, expect_adj):
        assert math.isclose(a, e, abs_tol=2e-6)
    by = dict(zip(got.hypothesis, got.reject))
    assert by["ctrl_hi"] and by["ctrl_lo"]
    assert not any(v for k, v in by.items() if not k.startswith("ctrl"))
    assert all(
        got.p_adj[i] <= got.p_adj[i + 1] + 1e-12 for i in range(m - 1)
    ), "BH adjusted p-values must be monotone in rank"
    assert (got.reject == (got.p_adj <= FDR_Q)).all()


def test_kcenter_radii_monotone_and_distinct(spark):
    """sample_kcenter_greedy: selected ids are distinct, radii are
    nonincreasing (greedy picks the farthest point first), and every
    radius is the true min-distance to the earlier centers
    (recomputed in Python)."""
    con = duckdb_connect(SF_SMOKE)
    vecs = dict(
        con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    )
    got = _run(spark, "sample_kcenter_greedy").sort_values("step")
    ids = list(got.vec_id)
    assert len(set(ids)) == len(ids)
    radii = list(got.radius)[1:]
    assert all(radii[i] >= radii[i + 1] - 1e-9 for i in range(len(radii) - 1))
    for k in range(1, len(ids)):
        v = [float(x) for x in vecs[ids[k]]]
        mind = min(
            round(
                sum((a - b) * (a - b) for a, b in zip(v, (float(x) for x in vecs[c]))),
                6,
            )
            for c in ids[:k]
        )
        assert math.isclose(got.radius.iloc[k], mind, abs_tol=2e-6)


def test_changelog_compaction_conserves_ops_and_drops_tombstones(spark):
    """pipeline_changelog_compaction: per-user op counts sum to the
    event count MINUS the tombstoned users' ops, no surviving user's
    last op is a delete, and the tombstoned set matches a Python
    replay."""
    con = duckdb_connect(SF_SMOKE)
    rows = con.execute(
        "SELECT user_id, ts, event_id, event_type FROM events"
    ).fetchall()
    last = {}
    nops = {}
    for uid, ts, eid, et in rows:
        nops[uid] = nops.get(uid, 0) + 1
        key = (ts, eid)
        if uid not in last or key > last[uid][0]:
            op = "I" if et == "signup" else ("D" if et == "error" else "U")
            last[uid] = (key, op)
    survivors = {u for u, (_, op) in last.items() if op != "D"}
    got = _run(spark, "pipeline_changelog_compaction")
    assert set(got.user_id) == survivors
    assert (got.last_op != "D").all()
    for r in got.itertuples():
        assert r.n_ops == nops[r.user_id]


def test_link_prediction_candidates_are_nonedges_with_shared_neighbor(spark):
    """graph_link_prediction structural invariants at smoke scale:
    every candidate pair is NOT an edge of the kNN graph, u < v, and
    common_neighbors >= 1."""
    got = _run(spark, "graph_link_prediction")
    assert (got.node_u < got.node_v).all()
    assert (got.common_neighbors >= 1).all()
    assert (got.ra_ppb > 0).all()
    # jaccard_nbr in (0, 1]
    assert ((got.jaccard_nbr > 0) & (got.jaccard_nbr <= 1)).all()


def test_maxsim_matches_python_reference(spark):
    """search_maxsim_late_interaction == a direct Python MaxSim
    implementation (same rolling hash, same integer projection, same
    distinct-query-token / capped-doc-token semantics) — independent
    of both engines."""
    from kinesis2sse_spark.queries.llm_similarity import (
        LI_DOC_TOKENS,
        LI_P,
        LI_PARAMS,
        LI_QUERIES,
        LI_QUERY_TOKENS,
        LI_TOP_K,
    )

    def th(tok):
        h = 7
        for ch in tok:
            h = (h * 31 + ord(ch)) % LI_P
        return h

    def emb(h):
        return [((h * a + b) % LI_P) % 2001 - 1000 for a, b in LI_PARAMS]

    con = duckdb_connect(SF_SMOKE)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    dembs = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t][:LI_DOC_TOKENS]
        if toks:
            dembs[doc_id] = [emb(th(t)) for t in toks]
    expected = {}
    for doc_id, text in docs:
        if doc_id >= LI_QUERIES:
            continue
        qtoks = [t for t in text.split(" ") if t][:LI_QUERY_TOKENS]
        qembs = [emb(h) for h in {th(t) for t in qtoks}]
        scored = sorted(
            (
                (
                    -sum(
                        max(sum(a * b for a, b in zip(q, d)) for d in dv)
                        for q in qembs
                    ),
                    nid,
                )
                for nid, dv in dembs.items()
            )
        )[:LI_TOP_K]
        expected[doc_id] = {(nid, -neg) for neg, nid in scored}
    got = _run(spark, "search_maxsim_late_interaction")
    for q, grp in got.groupby("query_id"):
        assert {
            (r.neighbor_id, r.li_score) for r in grp.itertuples()
        } == expected[q]


def test_privacy_ladder_chooses_minimal_level(spark):
    """privacy_generalization_ladder: exactly one chosen level, it is
    k-anonymous, and no finer k-anonymous level exists."""
    got = _run(spark, "privacy_generalization_ladder").sort_values("level")
    chosen = got[got.chosen]
    assert len(chosen) == 1
    lvl = chosen.level.iloc[0]
    assert chosen.k_anonymous.iloc[0]
    assert not got[(got.level < lvl)].k_anonymous.any()
    assert got[got.level >= lvl].k_anonymous.all()
