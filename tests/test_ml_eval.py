"""Model checks for the ml_eval operator family: exact tie-corrected
ROC AUC vs a literal Python rank-sum replay on a synthetic corpus,
confusion/kappa cell counts vs Python counts, calibration bin identity,
and the degenerate-input edges (single-class AUC, chance-certain kappa).
"""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE

DIM = 64


def _w(i: int) -> int:
    return ((i + 1) * 2654435761 % 1000000007) % 2001 - 1000


def _score(emb) -> int:
    return sum(
        int(math.floor(float(x) * 1000000 + 0.5)) * _w(i) for i, x in enumerate(emb)
    )


def _write_embeddings(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def _auc_model(scored):
    """Literal tie-averaged Mann-Whitney AUC over (score, pos) pairs."""
    pos = [s for s, p in scored if p]
    neg = [s for s, p in scored if not p]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if sp > sn else (0.5 if sp == sn else 0.0) for sp in pos for sn in neg
    )
    return wins / (len(pos) * len(neg))


def test_auc_matches_python_ranksum_with_ties(spark, tmp_path):
    """Synthetic corpus engineered to hit ties both within and across
    classes AND to straddle multiple 2^28 score buckets, so the
    two-level prefix rank path is exercised, not just the trivial
    single-bucket case."""
    rows = []
    # 40 vectors: embedding = v * e_0 basis direction, so score = q(v)*w(0);
    # duplicate values create cross-class ties, big v values cross buckets
    vals = [0.0, 0.1, 0.1, 0.2, 0.3, 0.3, 0.3, 0.45, -0.2, -0.2] * 4
    for k, v in enumerate(vals):
        emb = [0.0] * DIM
        emb[0] = v
        emb[1] = 0.5 if k % 7 == 0 else -0.5  # second dim spreads scores
        rows.append((k, emb, 9 if k % 3 == 0 else 1))
    _write_embeddings(spark, tmp_path, rows)

    from kinesis2sse_spark.queries.ml_eval import ml_auc_roc

    got = ml_auc_roc(spark, str(tmp_path)).collect()[0]
    scored = [(_score(emb), lab >= 5) for _, emb, lab in rows]
    want = _auc_model(scored)
    assert got["n_pos"] == sum(1 for _, p in scored if p)
    assert got["n_neg"] == sum(1 for _, p in scored if not p)
    assert got["auc"] == math.floor(want * 1000000 + 0.5) / 1000000


def test_auc_single_class_is_null(spark, tmp_path):
    rows = [(k, [0.1 * k] + [0.0] * (DIM - 1), 9) for k in range(5)]
    _write_embeddings(spark, tmp_path, rows)
    from kinesis2sse_spark.queries.ml_eval import ml_auc_roc

    r = ml_auc_roc(spark, str(tmp_path)).collect()[0]
    assert r["n_neg"] == 0 and r["auc"] is None


def test_confusion_cells_match_python_counts(spark):
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.ml_eval import ml_confusion_threshold

    got = ml_confusion_threshold(spark, SF_SMOKE).collect()[0]
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    tp = fp = fn = tn = 0
    for r in rows:
        pred = _score(r["embedding"]) >= 0
        pos = r["label"] >= 5
        tp += pos and pred
        fp += (not pos) and pred
        fn += pos and not pred
        tn += (not pos) and not pred
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    assert got["tp"] + got["fp"] + got["fn"] + got["tn"] == len(rows)
    if tp + fp:
        assert got["precision_"] == math.floor(tp / (tp + fp) * 1e6 + 0.5) / 1e6


def test_calibration_bins_partition_corpus_and_order(spark):
    """Bins tile the corpus exactly (counts sum to n), bin ids stay in
    [0, CALIB_BINS), and mean_score is monotone nondecreasing in bin —
    the property that makes an equal-width reliability diagram legible."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.ml_eval import CALIB_BINS, ml_calibration_bins

    rows = ml_calibration_bins(spark, SF_SMOKE).collect()
    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n"] for r in rows) == n
    assert all(0 <= r["bin"] < CALIB_BINS for r in rows)
    by_bin = sorted(rows, key=lambda r: r["bin"])
    means = [r["mean_score"] for r in by_bin]
    assert means == sorted(means)
    for r in rows:
        assert 0.0 <= r["pos_rate"] <= 1.0
        assert r["n_pos"] <= r["n"]


def test_kappa_known_value_and_chance_certain_null(spark, tmp_path):
    """A 2x2 table with known kappa, then the pe=1 degenerate case
    (both raters constant) must be NULL, not a 0/0 ANSI error."""
    from kinesis2sse_spark.queries.ml_eval import (
        KAPPA_CHARS_MIN,
        KAPPA_TOKENS_MIN,
        stats_cohens_kappa,
    )

    long_txt = " ".join(["tok"] * KAPPA_TOKENS_MIN)  # B says long
    short_txt = "tok"
    rows = []
    # 6 agree-long, 2 agree-short, 1 A-only, 1 B-only
    for k in range(6):
        rows.append((k, long_txt, "en", "s", KAPPA_CHARS_MIN + 10))
    for k in range(6, 8):
        rows.append((k, short_txt, "en", "s", 10))
    rows.append((8, short_txt, "en", "s", KAPPA_CHARS_MIN))  # A long, B short
    rows.append((9, long_txt, "en", "s", 10))  # A short, B long
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = stats_cohens_kappa(spark, str(tmp_path)).collect()[0]
    n, na, nb, agree = 10, 7, 7, 8
    e = na * nb + (n - na) * (n - nb)
    want = (n * agree - e) / (n * n - e)
    assert got["n_docs"] == n and got["n_agree"] == agree
    assert got["kappa"] == math.floor(want * 1e6 + 0.5) / 1e6

    # degenerate: every doc long under both raters -> pe = 1 -> NULL
    rows2 = [(k, long_txt, "en", "s", KAPPA_CHARS_MIN + 1) for k in range(4)]
    spark.createDataFrame(rows2, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got2 = stats_cohens_kappa(spark, str(tmp_path)).collect()[0]
    assert got2["n_agree"] == 4 and got2["kappa"] is None


def test_ir_eval_invariants_and_model(spark):
    """nDCG/RR/recall bounds, dcg<=idcg, and a literal Python replay of
    nDCG from the ranked lists the engine itself produces."""
    from kinesis2sse_spark.queries.ml_eval import (
        _DISC,
        _IDCG,
        IR_K,
        ir_eval_retrieval,
    )

    rows = {r["query_id"]: r for r in ir_eval_retrieval(spark, SF_SMOKE).collect()}
    assert len(rows) == 10
    for q, r in rows.items():
        assert 0 <= r["hits"] <= IR_K
        assert r["dcg_s"] <= r["idcg_s"]
        if r["ndcg"] is not None:
            assert 0.0 <= r["ndcg"] <= 1.0
        assert 0.0 <= r["rr"] <= 1.0
        if r["recall_k"] is not None:
            assert 0.0 <= r["recall_k"] <= 1.0 + 1e-12
        # idcg is the prefix-sum literal for min(n_rel, K) ideal hits
        assert r["idcg_s"] == _IDCG[max(min(r["n_rel"], IR_K), 1)]
        # rr is 1/first_rel from the literal table: a power-of-table check
        if r["rr"] > 0:
            inv = 1.0 / r["rr"]
            assert abs(inv - round(inv)) < 1e-3


def test_brier_ece_bounds_and_degenerate_perfect(spark, tmp_path):
    """Brier/ECE are bounded; a corpus where the probe's min score is
    all-negative and max all-positive (two distinct score points) gives
    p3 in {0, ~999} and a near-zero Brier."""
    from kinesis2sse_spark.queries.ml_eval import ml_brier_ece

    row = ml_brier_ece(spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["brier"] <= 1.0
    assert 0.0 <= row["ece"] <= 1.0

    base = [0.0] * DIM
    lo = list(base)
    lo[0] = -0.4  # strongly negative score
    hi = list(base)
    hi[0] = 0.4  # strongly positive score once sign-corrected
    sign = 1 if _w(0) > 0 else -1
    rows = [
        (i, [x * sign for x in (lo if i % 2 else hi)], 9 if i % 2 == 0 else 0)
        for i in range(20)
    ]
    _write_embeddings(spark, tmp_path, rows)
    row = ml_brier_ece(spark, str(tmp_path)).collect()[0]
    # perfectly separated two-point scores: p3 = 0 for negatives and
    # 999 for positives (floor(999.xxx) granularity) -> Brier ~ 1e-6
    assert row["brier"] <= 2e-6
    assert row["ece"] <= 2e-3


def test_auc_by_slice_partitions_the_corpus(spark):
    """Slice sizes sum to the corpus and each AUC is a valid AUC."""
    from kinesis2sse_spark.queries.ml_eval import ml_auc_by_slice

    rows = ml_auc_by_slice(spark, SF_SMOKE).collect()
    assert {r["lang"] for r in rows} <= {"en", "de", "es", "fr", "zh"}
    total = sum(r["n_pos"] + r["n_neg"] for r in rows)
    from kinesis2sse_spark.catalog import load_table

    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert total == n
    for r in rows:
        if r["auc"] is not None:
            assert 0.0 <= r["auc"] <= 1.0


def test_welch_ttest_sign_and_df_bounds(spark):
    from kinesis2sse_spark.queries.aggregates import stats_welch_ttest

    r = stats_welch_ttest(spark, SF_SMOKE).collect()[0]
    assert r["n_group1"] > 0 and r["n_group0"] > 0
    if r["t_stat"] is not None:
        # t and mean_diff share a sign (sqrt(se) > 0)
        assert (r["t_stat"] >= 0) == (r["mean_diff"] >= 0)
        # Welch df lies in [min(n1,n0)-1, n1+n0-2]
        assert min(r["n_group1"], r["n_group0"]) - 1 <= r["df"] + 1e-6
        assert r["df"] <= r["n_group1"] + r["n_group0"] - 2 + 1e-6


def test_context_chunks_cover_and_reconstruct(spark):
    """Every doc's chunks: chunk 0 starts at 0, strides are exact,
    the last chunk ends at n_tokens, lengths are in (0, CHUNK_LEN],
    and stitching stride-prefixes + the last chunk reconstructs the
    document text byte-for-byte."""
    from kinesis2sse_spark.queries.llm_text import (
        CHUNK_LEN,
        CHUNK_STRIDE,
        pipeline_context_chunks,
    )
    from kinesis2sse_spark.catalog import load_table

    chunks = pipeline_context_chunks(spark, SF_SMOKE).collect()
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    bydoc: dict = {}
    for r in chunks:
        bydoc.setdefault(r["doc_id"], []).append(r)
    assert set(bydoc) == set(texts)
    for doc_id, rs in bydoc.items():
        rs.sort(key=lambda r: r["chunk_id"])
        toks = texts[doc_id].split(" ")
        n = len(toks)
        assert [r["chunk_id"] for r in rs] == list(range(len(rs)))
        for i, r in enumerate(rs):
            assert r["start_tok"] == i * CHUNK_STRIDE
            assert 0 < r["chunk_tokens"] <= CHUNK_LEN
            assert r["chunk_text"] == " ".join(
                toks[r["start_tok"] : r["start_tok"] + r["chunk_tokens"]]
            )
        last = rs[-1]
        assert last["start_tok"] + last["chunk_tokens"] == n
        # stitch: stride-sized prefix of every chunk but the last + last
        stitched: list = []
        for r in rs[:-1]:
            stitched.extend(r["chunk_text"].split(" ")[:CHUNK_STRIDE])
        stitched.extend(rs[-1]["chunk_text"].split(" "))
        assert " ".join(stitched) == texts[doc_id]


def test_feature_drift_identical_cohorts_near_zero_and_planted_shift(spark, tmp_path):
    """PSI per dimension: cohorts drawn identically -> psi ~ 0 (only
    Laplace noise); a planted mean shift on dim 2 for positives makes
    dim 2 the clear argmax."""
    from kinesis2sse_spark.queries.ml_eval import DRIFT_DIMS, ml_feature_drift

    rows = []
    for k in range(200):
        base = [((k * 37 + i * 11) % 9 - 4) / 10.0 for i in range(DIM)]
        lab = 9 if k % 2 == 0 else 0
        if lab == 9:
            base[2] = min(0.45, base[2] + 0.4)  # planted shift on dim 2
        rows.append((k, base, lab))
    _write_embeddings(spark, tmp_path, rows)
    got = {r["dim"]: r for r in ml_feature_drift(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(DRIFT_DIMS))
    for r in got.values():
        assert r["n_pos"] == 100 and r["n_neg"] == 100
        assert r["psi"] >= 0.0 or abs(r["psi"]) < 1e-9
    top = max(got.values(), key=lambda r: r["psi"])
    assert top["dim"] == 2 and top["psi"] > 0.5
    others = [r["psi"] for r in got.values() if r["dim"] != 2]
    assert all(p < top["psi"] / 4 for p in others)


def test_mm_dedup_binary_flags_planted_copies(spark, tmp_path):
    """Three docs share identical payload bytes -> one canonical (min
    id), two dups, reclaimable = 2x payload size; unique docs reclaim
    nothing and every content_key groups exactly its copies."""
    from kinesis2sse_spark.queries.multimodal import mm_dedup_binary

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    rows = [
        (0, "same bytes here", "en", "s", 15),
        (3, "same bytes here", "en", "s", 15),
        (7, "same bytes here", "en", "s", 15),
        (1, "unique one", "en", "s", 10),
        (2, "unique two", "en", "s", 10),
    ]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r["doc_id"]: r for r in mm_dedup_binary(spark, str(tmp_path)).collect()}
    assert len(got) == 5
    for d in (0, 3, 7):
        assert got[d]["canonical_doc_id"] == 0
        assert got[d]["n_copies"] == 3
        assert got[d]["is_dup"] == (d != 0)
        assert got[d]["reclaimable_bytes"] == 2 * len("same bytes here")
    for d in (1, 2):
        assert got[d]["n_copies"] == 1 and not got[d]["is_dup"]
        assert got[d]["reclaimable_bytes"] == 0
    assert len({got[d]["content_key"] for d in (0, 1, 2)}) == 3


def test_lift_deciles_match_python_model(spark):
    """Replay the decile table in literal Python from the scored
    corpus: same tie convention (a distinct score group lands in the
    decile of its first descending-rank row), same cumulative stats."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.ml_eval import ml_lift_pr_deciles

    got = {r["decile"]: r for r in ml_lift_pr_deciles(spark, SF_SMOKE).collect()}
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    scored = [(_score(r["embedding"]), 1 if r["label"] >= 5 else 0) for r in rows]
    n = len(scored)
    hist: dict = {}
    for s, p in scored:
        c, cp = hist.get(s, (0, 0))
        hist[s] = (c + 1, cp + p)
    before = 0
    want: dict = {}
    for s in sorted(hist, reverse=True):
        c, cp = hist[s]
        dec = before * 10 // n
        nd, tpd = want.get(dec, (0, 0))
        want[dec] = (nd + c, tpd + cp)
        before += c
    assert set(got) == set(want)
    cum_n = cum_tp = 0
    for dec in sorted(want):
        nd, tpd = want[dec]
        cum_n += nd
        cum_tp += tpd
        r = got[dec]
        assert (r["n_d"], r["tp_d"], r["cum_n"], r["cum_tp"]) == (
            nd,
            tpd,
            cum_n,
            cum_tp,
        )
    # invariants: recall monotone nondecreasing, final recall = 1
    recalls = [got[d]["recall_"] for d in sorted(got)]
    assert recalls == sorted(recalls)
    assert abs(recalls[-1] - 1.0) < 1e-9
    assert got[max(got)]["cum_n"] == n


def test_percentile_contract_holds_on_skewed_data(spark, tmp_path):
    """The sketch bound must hold on adversarial skew (one huge tie
    block + a long tail), not just the friendly fixture."""
    from kinesis2sse_spark.queries.aggregates import agg_approx_percentile_contract

    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    rows = [(k, "t", "en", "s", 100) for k in range(500)]  # giant tie
    rows += [(500 + k, "t", "en", "s", 100 + k * 7) for k in range(100)]  # tail
    rows += [(700 + k, "t", "de", "s", k * k % 997) for k in range(300)]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    for r in agg_approx_percentile_contract(spark, str(tmp_path)).collect():
        assert r["p50_within_bound"] and r["p90_within_bound"], r


def test_bootstrap_ci_matches_python_replay(spark):
    """Literal Python replay of the deterministic bootstrap: same hash
    uniforms, same Poisson inverse-CDF thresholds, same rank-2 /
    rank-31 selection."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.aggregates import (
        BOOT_P,
        BOOT_REPLICAS,
        BOOT_T,
        stats_bootstrap_ci,
    )

    got = stats_bootstrap_ci(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "n_chars").collect()
    means = []
    for b in range(BOOT_REPLICAS):
        n_b = s_b = 0
        for r in docs:
            u = ((r["doc_id"] % BOOT_P) + b * 7919) * 2654435761 % BOOT_P
            w = sum(1 for t in BOOT_T if u >= t)
            n_b += w
            s_b += w * r["n_chars"]
        means.append((math.floor(s_b / n_b * 1e6 + 0.5) / 1e6, b))
    means.sort()
    assert got["n_docs"] == len(docs)
    assert got["n_replicas"] == BOOT_REPLICAS
    assert got["ci_lo"] == means[1][0]
    assert got["ci_hi"] == means[BOOT_REPLICAS - 2][0]
    assert got["ci_lo"] <= got["ci_hi"]
    full = math.floor(sum(r["n_chars"] for r in docs) / len(docs) * 1e6 + 0.5) / 1e6
    assert got["mean_full"] == full
    # the interval is a CI for the mean: it must contain the full-corpus
    # mean on this non-degenerate fixture
    assert got["ci_lo"] <= got["mean_full"] <= got["ci_hi"]


def test_permutation_test_matches_python_replay(spark):
    """Literal replay of the deterministic permutation test: same hash
    splits, same degenerate-replica exclusion, same add-one p-value."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.aggregates import (
        BOOT_P,
        BOOT_REPLICAS,
        PERM_REPLICAS,
        TTEST_LANG,
        stats_permutation_test,
    )

    got = stats_permutation_test(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "n_chars"
    ).collect()
    n = len(docs)
    n1 = sum(1 for r in docs if r["lang"] == TTEST_LANG)
    s1 = sum(r["n_chars"] for r in docs if r["lang"] == TTEST_LANG)
    s = sum(r["n_chars"] for r in docs)
    aobs = abs(s1 / n1 - (s - s1) / (n - n1))
    n_extreme = n_rep = 0
    for b in range(PERM_REPLICAS):
        pn1 = ps1 = 0
        for r in docs:
            u = (r["doc_id"] % BOOT_P + (b + BOOT_REPLICAS) * 7919) * 2654435761 % BOOT_P
            if u % n < n1:
                pn1 += 1
                ps1 += r["n_chars"]
        if 0 < pn1 < n:
            n_rep += 1
            if abs(ps1 / pn1 - (s - ps1) / (n - pn1)) >= aobs:
                n_extreme += 1
    assert got["n_group1"] == n1
    assert got["n_extreme"] == n_extreme
    assert got["n_replicas"] == n_rep
    assert got["p_value"] == math.floor((n_extreme + 1) / (n_rep + 1) * 1e6 + 0.5) / 1e6
    assert 0.0 < got["p_value"] <= 1.0


def test_range_search_is_thresholded_subset_of_bruteforce_space(spark):
    """Every returned pair clears the threshold; the result equals the
    Python-filtered exact pair set over the broadcast query block."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import (
        N_QUERIES,
        RANGE_COS_MIN,
        sim_range_search,
    )

    got = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in sim_range_search(spark, SF_SMOKE).collect()
    }
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    import math as _m

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = _m.sqrt(sum(x * x for x in a))
        nb = _m.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    want = {}
    for q in range(N_QUERIES):
        for c, v in vecs.items():
            if c == q:
                continue
            cs = cos(vecs[q], v)
            if cs >= RANGE_COS_MIN:
                want[(q, c)] = cs
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 2e-6
        assert got[k] >= RANGE_COS_MIN


def test_average_precision_matches_python_replay(spark):
    """Literal AP replay from the engine's own ranking convention,
    plus the metric's defining invariants (perfect prefix -> 1.0 when
    n_rel >= hits at every rank; ap <= 1; zero hits -> ap = 0)."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.ml_eval import (
        _RECIP,
        IR_K,
        IR_QUERIES,
        ir_eval_average_precision,
    )

    got = {
        r["query_id"]: r
        for r in ir_eval_average_precision(spark, SF_SMOKE).collect()
    }
    assert len(got) == IR_QUERIES
    vecs = {
        r["vec_id"]: ([float(x) for x in r["embedding"]], r["label"])
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    for q in range(IR_QUERIES):
        qv, ql = vecs[q]
        scored = sorted(
            ((-cos(qv, v), c, 1 if lab == ql else 0) for c, (v, lab) in vecs.items() if c != q),
        )[:IR_K]
        h = 0
        ap_s = 0
        for r, (_, _, rel) in enumerate(scored, start=1):
            h += rel
            ap_s += rel * h * _RECIP[r - 1]
        n_rel = sum(1 for c, (v, lab) in vecs.items() if c != q and lab == ql)
        assert got[q]["ap_s"] == ap_s
        assert got[q]["n_rel"] == n_rel
        want = math.floor(ap_s / (1e6 * min(n_rel, IR_K)) * 1e6 + 0.5) / 1e6
        assert got[q]["avg_precision"] == want
        assert 0.0 <= got[q]["avg_precision"] <= 1.0 + 1e-9


def test_mann_whitney_u_matches_pairwise_definition(spark):
    """u2_stat equals the literal pairwise definition 2*#(en > other)
    + #(ties), and z matches the tie-corrected normal approximation
    replayed in Python."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.aggregates import TTEST_LANG, stats_mann_whitney

    got = stats_mann_whitney(spark, SF_SMOKE).collect()[0]
    docs = load_table(spark, SF_SMOKE, "documents").select("lang", "n_chars").collect()
    g1 = [r["n_chars"] for r in docs if r["lang"] == TTEST_LANG]
    g0 = [r["n_chars"] for r in docs if r["lang"] != TTEST_LANG]
    wins = sum(1 for a in g1 for b in g0 if a > b)
    ties = sum(1 for a in g1 for b in g0 if a == b)
    u2 = 2 * wins + ties
    assert got["n_group1"] == len(g1) and got["n_group0"] == len(g0)
    assert got["u2_stat"] == u2
    n1, n0 = len(g1), len(g0)
    nd = n1 + n0
    from collections import Counter

    tie3 = sum(c * (c - 1) * (c + 1) for c in Counter(x["n_chars"] for x in docs).values())
    var = n1 * n0 / 12.0 * ((nd + 1.0) - tie3 / (nd * (nd - 1.0)))
    z = (u2 - n1 * n0) / 2.0 / math.sqrt(var)
    assert abs(got["z_score"] - z) < 2e-6


def test_logistic_probe_gd_matches_python_replay(spark):
    """Replay all gradient steps in Python with the identical
    quantization ladder; weights must match exactly. Also: the probe's
    hard-sigmoid scores must separate the classes at least weakly
    (training sanity, not a quality bar)."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import (
        LOGIT_ETA,
        LOGIT_L2,
        LOGIT_POS_LABEL_MIN,
        LOGIT_STEPS,
        ml_logistic_probe_gd,
    )
    from tests.conftest import SF_SMOKE

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = [[float(v) for v in r["embedding"]] for r in rows]
    y = [1.0 if r["label"] >= LOGIT_POS_LABEL_MIN else 0.0 for r in rows]
    n = len(X)
    d = 64
    w = [0.0] * d
    for _ in range(LOGIT_STEPS):
        grads_q = [0] * d
        for xi, yi in zip(X, y, strict=True):
            uq = sum(int(math.floor(x * wv * 1e12 + 0.5)) for x, wv in zip(xi, w, strict=True))
            p = max(0.0, min(1.0, uq / 1e12 / 4.0 + 0.5))
            r = p - yi
            for j in range(d):
                grads_q[j] += int(math.floor(xi[j] * r * 1e12 + 0.5))
        w = [
            math.floor((w[j] - LOGIT_ETA * (grads_q[j] / 1e12 / n + LOGIT_L2 * w[j]))
                       * 1e9 + 0.5) / 1e9
            for j in range(d)
        ]
    got = {r["dim"]: r["weight"] for r in ml_logistic_probe_gd(spark, SF_SMOKE).collect()}
    assert len(got) == d
    for j in range(d):
        assert got[j] == w[j], f"dim {j}: {got[j]} != {w[j]}"
    assert any(abs(v) > 0 for v in w), "all-zero weights: training did nothing"


def test_isotonic_pav_pools_violators_and_is_monotone(spark):
    """The minimax closed form must equal classic sequential PAV on
    hand-computed violator fixtures, and the operator's fixture-scale
    output must be monotone with pooling ACTUALLY exercised (a fit
    where iso == raw everywhere would leave PAV's defining behavior
    untested)."""
    from kinesis2sse_spark.queries.ml_eval import pav_fit

    # rates [1.0, 0.0, 0.5], equal weights -> PAV pools all three
    g1 = spark.createDataFrame(
        [(0, 2, 2), (1, 2, 0), (2, 2, 1)], "bin long, n long, np long"
    )
    got1 = {r["bin"]: r["iso"] for r in pav_fit(g1).collect()}
    assert got1 == {0: 0.5, 1: 0.5, 2: 0.5}, got1

    # rates [0.2, 0.8, 0.4] -> only the last two pool (to 0.6)
    g2 = spark.createDataFrame(
        [(0, 5, 1), (1, 5, 4), (2, 5, 2)], "bin long, n long, np long"
    )
    got2 = {r["bin"]: r["iso"] for r in pav_fit(g2).collect()}
    assert got2 == {0: 0.2, 1: 0.6, 2: 0.6}, got2

    # weighted pooling: [1.0 (w1), 0.0 (w3)] -> pooled mean 0.25
    g3 = spark.createDataFrame(
        [(0, 1, 1), (1, 3, 0)], "bin long, n long, np long"
    )
    got3 = {r["bin"]: r["iso"] for r in pav_fit(g3).collect()}
    assert got3 == {0: 0.25, 1: 0.25}, got3

    from kinesis2sse_spark.registry import all_queries

    rows = (
        all_queries()["ml_isotonic_calibration"](spark, "/root/testdata/sf0.001")
        .orderBy("bin")
        .collect()
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso), "isotonic fit must be monotone"
    assert any(r["iso_rate"] != r["raw_rate"] for r in rows), (
        "fixture must exercise pooling"
    )
