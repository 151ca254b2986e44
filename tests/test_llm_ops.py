"""Rows-only LLM operators (approximate / Python-UDF paths): schema and
sanity checks the DuckDB oracle can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis2sse_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def test_minhash_lsh_finds_exact_pairs(spark):
    """LSH candidates should include (most of) the exact high-Jaccard
    pairs — recall check against the oracle-verified exact operator."""
    qs = all_queries()
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in qs["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
        if r["jaccard"] >= 0.7
    }
    approx = {
        (r["doc_a"], r["doc_b"])
        for r in qs["dedup_minhash_lsh"](spark, SF_SMOKE).collect()
    }
    assert approx, "LSH returned no candidate pairs"
    if exact:
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"MinHash-LSH recall {recall:.2f} < 0.8 on jaccard>=0.7 pairs"


def test_sim_lsh_and_ivf_schema_and_recall(spark):
    qs = all_queries()
    brute = qs["sim_topk_bruteforce"](spark, SF_SMOKE).collect()
    truth = {}
    for r in brute:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for name in ("sim_topk_lsh", "sim_topk_ivf"):
        got = qs[name](spark, SF_SMOKE)
        assert got.columns == ["query_id", "neighbor_id", "cos_sim"]
        rows = got.collect()
        assert rows, f"{name} returned nothing"
        # top-1 recall: the single nearest neighbor should usually be found
        hits = sum(
            1
            for r in rows
            if r["neighbor_id"] in truth.get(r["query_id"], set())
        )
        assert hits >= 1, f"{name} found none of the true top-k neighbors"


def test_mm_decode_features(spark):
    qs = all_queries()
    df = qs["mm_decode_features"](spark, SF_SMOKE)
    rows = df.orderBy("doc_id").limit(5).collect()
    # scalar moment columns (NOT array<double>): the driver's pandas
    # canonicalizer can't hash list cells (r04 crash) and scalars keep
    # the contract DuckDB-expressible
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:bigint,mean_byte:double,"
        "max_byte:double,min_byte:double>"
    )
    for r in rows:
        assert r["n_bytes"] > 0
        # deterministic stub: mean byte must be within [min, max]
        assert r["min_byte"] <= r["mean_byte"] <= r["max_byte"]


def test_mm_audio_windows(spark):
    qs = all_queries()
    df = qs["mm_audio_windows"](spark, SF_SMOKE)
    assert df.schema.simpleString() == (
        "struct<doc_id:bigint,window_idx:int,rms:double>"
    )
    agg = df.agg(
        F.count("*").alias("n"), F.min("rms").alias("lo"), F.max("rms").alias("hi")
    ).collect()[0]
    assert agg["n"] > 0
    assert 0 <= agg["lo"] <= agg["hi"] <= 255


def test_approx_count_distinct_close(spark):
    qs = all_queries()
    rows = qs["agg_approx_count_distinct"](spark, SF_SMOKE).collect()
    assert rows and all(r["approx_parts"] > 0 for r in rows)


def test_jaccard_df_cap_bounds_hot_shingle_pairs(spark, tmp_path, monkeypatch):
    """A posting list longer than MAX_DF is sliced to its MAX_DF
    lowest-doc_id entries: pair generation stays bounded at MAX_DF²/2
    per shingle (one stopword shingle can't serialize O(df²) work in a
    single task), but the lowest-id members remain connected instead of
    the whole posting going dark."""
    from kinesis2sse_spark.queries import llm_dedup

    # 12 docs sharing exactly one trigram ("a b c"); every other shingle
    # is unique to its doc.
    rows = [(i, f"a b c x{i} y{i} z{i}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    monkeypatch.setattr(llm_dedup, "JACCARD_THRESHOLD", 0.0)
    monkeypatch.setattr(llm_dedup, "MAX_DF", 5)
    sliced = llm_dedup.dedup_ngram_jaccard(spark, str(tmp_path))
    pairs = {(r["doc_a"], r["doc_b"]) for r in sliced.collect()}
    # exactly the C(5,2) pairs among the 5 lowest doc_ids survive
    assert pairs == {(a, b) for a in range(5) for b in range(5) if a < b}, pairs

    monkeypatch.setattr(llm_dedup, "MAX_DF", 256)
    unsliced = llm_dedup.dedup_ngram_jaccard(spark, str(tmp_path)).count()
    assert unsliced == 12 * 11 // 2, f"expected all 66 pairs, got {unsliced}"


def test_massdup_cluster_not_blinded_by_df_cap(spark, tmp_path):
    """A text duplicated far past MAX_DF must still dedupe: exact copies
    collapse to one representative before shingling, so the cluster
    contributes ONE doc to each shingle's df instead of capping its own
    shingles out of the index. 300 exact copies (> MAX_DF=256) + 1
    near-dup: expect all C(300,2) within-cluster pairs at jaccard 1.0
    AND the near-dup paired with every copy — both were silently empty
    before the collapse."""
    from kinesis2sse_spark.queries.llm_dedup import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and againx"
    rows = [(i, base) for i in range(300)]
    # a SECOND duplicated cluster (3 copies) of the near-dup text:
    # cluster x cluster fan-out must emit all 300x3 cross pairs
    rows += [(300 + i, near) for i in range(3)]
    rows.append((303, "totally unrelated words with no overlap at all here"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    pairs = dedup_ngram_jaccard(spark, str(tmp_path))
    within = pairs.filter((F.col("doc_a") < 300) & (F.col("doc_b") < 300))
    assert within.count() == 300 * 299 // 2
    assert within.filter(F.col("jaccard") != 1.0).count() == 0
    cross = pairs.filter((F.col("doc_a") < 300) & (F.col("doc_b").between(300, 302)))
    assert cross.count() == 300 * 3, "every (copy, near-dup-copy) pair must appear"
    assert cross.filter(F.col("jaccard") >= 1.0).count() == 0
    near_within = pairs.filter((F.col("doc_a").between(300, 302)) & (F.col("doc_b").between(300, 302)))
    assert near_within.count() == 3
    assert pairs.filter((F.col("doc_a") == 303) | (F.col("doc_b") == 303)).count() == 0

    mh = dedup_minhash_lsh(spark, str(tmp_path))
    assert mh.filter((F.col("doc_a") < 300) & (F.col("doc_b") < 300)).count() == 300 * 299 // 2
    assert mh.filter((F.col("doc_a") < 300) & (F.col("doc_b").between(300, 302))).count() == 300 * 3


def test_neardup_mass_cluster_reports_sliced_pairs(spark, tmp_path):
    """A cluster of >MAX_DF DISTINCT near-duplicate texts (every shared
    shingle's df exceeds the cap) must still report pairs among its
    MAX_DF lowest-id members — under the old drop-the-posting rule this
    corpus produced ZERO pairs. Members outside the slice stay dark by
    design (bounded work); connected components stitch them via the
    reported core."""
    from kinesis2sse_spark.queries.llm_dedup import MAX_DF, dedup_minhash_lsh, dedup_ngram_jaccard

    base = " ".join(f"t{j}" for j in range(12))
    rows = [(i, f"{base} unique{i}") for i in range(300)]  # 300 distinct texts
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.withColumn("n_chars", F.length("text").cast("long")).write.parquet(
        str(tmp_path / "documents.parquet")
    )

    pairs = {(r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, str(tmp_path)).collect()}
    expect = {(a, b) for a in range(MAX_DF) for b in range(MAX_DF) if a < b}
    assert pairs == expect, f"got {len(pairs)} pairs, expected C({MAX_DF},2)"

    mh = dedup_minhash_lsh(spark, str(tmp_path)).count()
    assert mh > 0, "MinHash path must also keep the sliced core connected"


def test_span_fraction_planted_duplicate(spark, tmp_path):
    """A doc sharing an 8-token run with another doc reports exactly the
    windows inside that run as duplicated; a fully unique doc reports 0."""
    from kinesis2sse_spark.queries.llm_dedup import dedup_span_fraction

    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"  # 9 tokens -> 2 shared windows
    rows = [
        (0, shared + " a1 a2 a3"),
        (1, "b1 b2 b3 " + shared),
        (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r for r in dedup_span_fraction(spark, str(tmp_path)).collect()}
    # doc 0: 12 tokens -> 5 windows, the 2 windows fully inside the shared
    # 9-token run also occur in doc 1
    assert got[0]["n_windows"] == 5 and got[0]["n_dup_windows"] == 2
    assert got[1]["n_windows"] == 5 and got[1]["n_dup_windows"] == 2
    assert got[2]["n_windows"] == 3 and got[2]["n_dup_windows"] == 0
    assert abs(got[0]["dup_fraction"] - 0.4) < 1e-9


def test_dedup_edge_corpora(spark, tmp_path):
    """Degenerate corpora the fixtures never contain: empty strings,
    sub-shingle docs, unicode, a corpus that is ONE giant exact-dup
    cluster, and fully-distinct docs. The pair search must neither
    crash nor fabricate pairs."""
    from kinesis2sse_spark.queries.llm_dedup import (
        dedup_exact,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    # 1) empties + short docs: no shingles anywhere → no pairs, but
    # exact dedup still groups the three empties
    def write_docs(d, rows):
        d.mkdir()
        spark.createDataFrame(rows, "doc_id long, text string").withColumn(
            "n_chars", F.length("text").cast("long")
        ).write.parquet(str(d / "documents.parquet"))

    d1 = tmp_path / "short"
    write_docs(
        d1,
        [(0, ""), (1, ""), (2, ""), (3, "one"), (4, "two words"), (5, "unicode ünïcødé 😀")],
    )
    assert dedup_ngram_jaccard(spark, str(d1)).count() == 0
    assert dedup_minhash_lsh(spark, str(d1)).count() == 0
    ex = {r["keep_id"]: r["n_copies"] for r in dedup_exact(spark, str(d1)).collect()}
    assert ex[0] == 3  # empties collapse to doc 0

    # 2) whole corpus = one exact-dup cluster (with shingles): every
    # pair, all at jaccard 1.0, from both the exact and MinHash paths
    d2 = tmp_path / "alldup"
    write_docs(
        d2,
        [(i, "exactly the same ten token sentence repeated again here now") for i in range(20)],
    )
    for fn in (dedup_ngram_jaccard, dedup_minhash_lsh):
        got = fn(spark, str(d2)).collect()
        assert len(got) == 20 * 19 // 2
        assert all(r["jaccard"] == 1.0 for r in got)

    # 3) fully distinct docs with no shared trigram: zero pairs
    d3 = tmp_path / "distinct"
    write_docs(d3, [(i, f"a{i} b{i} c{i} d{i} e{i}") for i in range(10)])
    assert dedup_ngram_jaccard(spark, str(d3)).count() == 0


def test_dataset_split_deterministic_and_balanced(spark):
    """The id-hash split must be (a) deterministic across runs and (b)
    roughly 80/10/10 — a skewed multiplicative hash would starve val or
    test of data silently."""
    from kinesis2sse_spark.queries.llm_text import pipeline_dataset_split

    a = {r["doc_id"]: r["split"] for r in pipeline_dataset_split(spark, SF_SMOKE).collect()}
    b = {r["doc_id"]: r["split"] for r in pipeline_dataset_split(spark, SF_SMOKE).collect()}
    assert a == b
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in ("train", "val", "test")}
    assert 0.7 <= frac["train"] <= 0.9, frac
    assert 0.05 <= frac["val"] <= 0.15, frac
    assert 0.05 <= frac["test"] <= 0.15, frac


def test_emb_quantize_bounds(spark):
    """Quantized values must stay in [-127, 127]: the max-abs component
    maps to ±127 exactly, so every vector has >= 1 saturated value and
    |q_sum| <= 127 * dim."""
    from kinesis2sse_spark.queries.llm_similarity import emb_quantize_int8

    rows = emb_quantize_int8(spark, SF_SMOKE).collect()
    assert rows
    dim = 64
    for r in rows:
        assert r["n_saturated"] >= 1
        assert abs(r["q_sum"]) <= 127 * dim
        assert r["scale"] > 0


def test_pq_codes_compress_and_recall(spark):
    """PQ rung sanity at the smoke corpus: every code id is in
    [0, PQ_K), the code vector is PQ_M long (the 32x compression
    artifact), and the rerank output keeps the (query_id, neighbor_id,
    cos_sim) ladder schema with full recall at this corpus size."""
    from kinesis2sse_spark.queries.llm_similarity import (
        PQ_K,
        PQ_M,
        TOP_K,
        _pq_parts,
        sim_recall_pq,
        sim_topk_pq,
    )

    encoded, _, _ = _pq_parts(SF_SMOKE, spark)
    codes = encoded.select("vec_id", "code").collect()
    assert all(len(r.code) == PQ_M for r in codes)
    assert all(0 <= c < PQ_K for r in codes for c in r.code)

    topk = sim_topk_pq(spark, SF_SMOKE)
    assert topk.columns == ["query_id", "neighbor_id", "cos_sim"]
    per_q = {}
    for r in topk.collect():
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert all(len(v) == TOP_K for v in per_q.values())

    rec = sim_recall_pq(spark, SF_SMOKE)
    assert all(r.recall_met for r in rec.collect())


def test_bpe_training_matches_python_model(spark):
    """Distributed BPE induction equals a pure-Python reference on the
    smoke corpus: 4 merge rules learned in the same order (greedy
    left-to-right application, count-desc/lexicographic tie-break)."""
    import collections

    import duckdb

    from kinesis2sse_spark.queries.llm_text import bpe_train_merges

    texts = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT text FROM read_parquet('{SF_SMOKE}/documents.parquet')")
        .fetchall()
    ]
    words = [w for t in texts for w in t.split(" ") if len(w) >= 2]
    model_words = [list(w) for w in words]

    def model_step(ws):
        counts = collections.Counter()
        for s in ws:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            return None
        (a, b), _ = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out = []
        for s in ws:
            ns = []
            for x in s:
                if ns and ns[-1] == a and x == b:
                    ns[-1] = a + b
                else:
                    ns.append(x)
            out.append(ns)
        ws[:] = out
        return (a, b)

    expect = []
    for _ in range(4):
        r = model_step(model_words)
        if r is None:
            break
        expect.append(r)

    got = bpe_train_merges(spark, SF_SMOKE, n_merges=4)
    assert got == expect, (got, expect)


def test_classifier_and_pps_degenerate_inputs(spark):
    """Empty and single-char documents flow through the hashed-feature
    classifier without error (empty text scores the empty-token weight,
    never null), and the PPS sampler's inclusion probability clamps to
    1.0 for huge weights and stays deterministic across invocations."""
    from pyspark.sql import functions as F

    from kinesis2sse_spark.queries import llm_text

    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "  "), (4, "x" * 5000)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("____tmp")
    # classifier path: run the same expression stack on the edge frame
    token_hash = F.aggregate(
        F.transform(F.split("text", ""), lambda c: F.ascii(c).cast("long")),
        F.lit(7).cast("long"),
        lambda h, c: (h * 31 + c) % 1000000007,
    )
    rows = df.select("doc_id", token_hash.alias("h")).collect()
    assert all(r.h is not None for r in rows)

    qs = {r.doc_id: r for r in llm_text.sample_weighted_pps(spark, SF_SMOKE).collect()}
    again = {r.doc_id: r for r in llm_text.sample_weighted_pps(spark, SF_SMOKE).collect()}
    assert qs.keys() == again.keys()
    assert all(0 < r.inclusion_ppm <= 1_000_000 for r in qs.values())


def test_negative_sampling_preconditions(spark):
    """The modular-shift sampler requires dense 0..N-1 doc_ids (its
    documented precondition — true of every fixture SF) and must never
    emit a negative equal to its anchor or outside the id space."""
    import duckdb

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        lo, hi, n = duckdb.connect().execute(
            f"SELECT min(doc_id), max(doc_id), count(*) FROM read_parquet('{sf}/documents.parquet')"
        ).fetchone()
        assert (lo, hi) == (0, n - 1), (sf, lo, hi, n)
    from kinesis2sse_spark.registry import all_queries

    rows = all_queries()["pipeline_negative_sampling"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    n_docs = 500
    assert len(rows) == n_docs * 4
    for r in rows:
        assert 0 <= r["neg_id"] < n_docs
        assert r["neg_id"] != r["anchor_id"]


def test_bpe_encode_matches_python_model(spark):
    """The nested JVM fold must agree with a literal Python replay of
    the same greedy one-pass-per-rule merge on every fixture document
    (first word verified token-for-token, totals exactly)."""
    import duckdb

    from kinesis2sse_spark.queries.llm_text import BPE_APPLY_RULES
    from kinesis2sse_spark.registry import all_queries

    def merge_pass(syms, a, b):
        out = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        return out

    def encode(word):
        syms = list(word)
        for a, b in BPE_APPLY_RULES:
            syms = merge_pass(syms, a, b)
        return syms

    sf = "/root/testdata/sf0.001"
    texts = dict(
        duckdb.connect()
        .execute(f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')")
        .fetchall()
    )
    rows = all_queries()["pipeline_bpe_encode"](spark, sf).collect()
    assert len(rows) == len(texts)
    for r in rows:
        words = texts[r["doc_id"]].split(" ")
        encs = [encode(w) for w in words]
        assert r["n_words"] == len(words)
        assert r["n_syms"] == sum(len(e) for e in encs), r["doc_id"]
        assert r["first_enc"] == "|".join(encs[0]), (r["doc_id"], r["first_enc"])


def test_mmr_rerank_matches_python_model(spark):
    """The applyInPandas greedy MMR must agree with an independent
    replay (shortlist build + greedy selection) — ids exactly, scores
    to 1e-6. The relevance leg of the model is a sequential pure-Python
    sum (matching Spark's F.aggregate left fold exactly); the
    REDUNDANCY similarities are computed in the same numpy matrix form
    the implementation uses, because the greedy argmax compares floats
    strictly — a different summation order could flip a near-tied pick
    and cascade, failing the exact-id assert on two correct
    implementations. The greedy selection logic itself stays an
    independent re-derivation."""
    import math

    import duckdb
    import numpy as np

    from kinesis2sse_spark.queries.llm_similarity import (
        MMR_LAMBDA,
        MMR_SELECT,
        MMR_SHORTLIST,
        N_QUERIES,
    )
    from kinesis2sse_spark.registry import all_queries

    sf = "/root/testdata/sf0.001"
    vecs = {
        vid: [float(x) for x in emb]
        for vid, emb in duckdb.connect()
        .execute(f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet')")
        .fetchall()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    want = {}
    for q in range(N_QUERIES):
        scored = sorted(
            ((cos(vecs[q], v), -i) for i, v in vecs.items() if i != q), reverse=True
        )
        short = [(-ni, rel) for rel, ni in scored[:MMR_SHORTLIST]]
        mat = np.stack([np.asarray(vecs[i], dtype=np.float64) for i, _ in short])
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ mat.T) / np.outer(norms, norms)
        pos = {i: p for p, (i, _) in enumerate(short)}
        selected, remaining = [], list(short)
        for rank in range(MMR_SELECT):
            best = None
            for i, rel in remaining:
                red = max((sims[pos[i], pos[j]] for j, _ in selected), default=0.0)
                score = MMR_LAMBDA * rel - (1 - MMR_LAMBDA) * red
                if best is None or score > best[0] or (score == best[0] and i < best[1]):
                    best = (score, i, rel)
            selected.append((best[1], best[2]))
            remaining = [(i, r) for i, r in remaining if i != best[1]]
            want[(q, rank + 1)] = (best[1], math.floor(best[0] * 1e6 + 0.5) / 1e6)

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["mmr_score"])
        for r in all_queries()["sim_mmr_rerank"](spark, sf).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert abs(got[k][1] - want[k][1]) <= 1e-6, (k, got[k], want[k])


def test_span_removal_matches_python_model(spark):
    """dedup_span_removal equals a pure-Python replay of ExactSubstr
    removal on the smoke corpus: windows of SPAN_LEN tokens occurring
    in >1 distinct doc mark their covered positions, covered tokens
    drop, survivors rejoin in original order."""
    import duckdb

    from kinesis2sse_spark.queries.llm_dedup import SPAN_LEN
    from kinesis2sse_spark.registry import all_queries
    from tests.conftest import exact_substring_removal_model

    docs = dict(
        duckdb.connect()
        .execute(f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')")
        .fetchall()
    )
    want = exact_substring_removal_model(docs, SPAN_LEN)

    rows = all_queries()["dedup_span_removal"](spark, SF_SMOKE).collect()
    assert len(rows) == len(want)
    # the smoke corpus must actually exercise the removal branch
    assert any(r["n_removed"] > 0 for r in rows)
    for r in rows:
        assert (r["n_tokens"], r["n_removed"], r["text_kept"]) == want[r["doc_id"]], (
            r["doc_id"]
        )


def test_split_by_cluster_has_zero_leakage(spark):
    """The cluster-anchored split must place BOTH endpoints of every
    near-dup pair in the same split (the leakage pipeline_split_leakage
    hunts for cannot exist by construction), and singleton docs must
    reduce to the plain id-hash split."""
    from kinesis2sse_spark.queries.llm_text import SPLIT_HASH
    from kinesis2sse_spark.registry import all_queries

    qs = all_queries()
    splits = {
        r["doc_id"]: (r["anchor_id"], r["split"])
        for r in qs["pipeline_split_by_cluster"](spark, SF_SMOKE).collect()
    }
    pairs = qs["dedup_ngram_jaccard"](spark, SF_SMOKE).collect()
    assert pairs, "smoke corpus must contain near-dup pairs"
    for p in pairs:
        assert splits[p["doc_a"]][1] == splits[p["doc_b"]][1], (
            p["doc_a"], p["doc_b"])
    clustered = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    plain = {
        r["doc_id"]: r["split"]
        for r in qs["pipeline_dataset_split"](spark, SF_SMOKE).collect()
    }
    singles = [d for d in splits if d not in clustered]
    assert singles
    for d in singles:
        assert splits[d][0] == d
        assert splits[d][1] == plain[d], d
    # the corpus must exercise the interesting case: at least one
    # clustered doc whose own-id split differs from its cluster split
    assert any(splits[d][1] != plain[d] for d in clustered)


def test_heavy_hitters_survive_mg_eviction(spark, tmp_path, monkeypatch):
    """The Misra-Gries candidate pass must keep every true heavy
    hitter even when the vocabulary dwarfs its counter capacity
    (constant eviction): a skewed corpus with 2 hot terms among 300
    unique rare ones, k=5 counters — the verified output must equal
    the exact freq > n/5 set, proving the candidate union stayed a
    superset under eviction."""
    import collections

    from kinesis2sse_spark.queries import llm_text

    rng_terms = []
    for i in range(300):
        rng_terms.append(f"rare{i}")
    docs = []
    for d in range(20):
        toks = ["hot"] * 30 + ["warm"] * 12 + rng_terms[d * 15 : d * 15 + 15]
        docs.append((d, " ".join(toks)))
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    monkeypatch.setattr(llm_text, "HH_K", 5)
    got = {
        (r["term"], r["cnt"])
        for r in llm_text.text_heavy_hitters(spark, str(tmp_path)).collect()
    }
    counts = collections.Counter(
        t for _, text in docs for t in text.split(" ")
    )
    n = sum(counts.values())
    want = {(t, c) for t, c in counts.items() if c * 5 > n}
    assert want, "fixture must contain heavy hitters"
    assert got == want


def test_mg_batched_fold_is_superset_across_batch_boundaries():
    """The vectorized mergeable-summaries fold (sum counters, subtract
    the (k+1)-st largest, drop non-positives) must keep every term
    whose TRUE stream frequency exceeds n/k, for every way the stream
    is cut into Arrow batches — the guarantee the verify pass builds
    on. Checked against exact counts over adversarial cuts (hot terms
    split across batches, batches smaller and larger than k) on
    deterministic skewed streams."""
    import collections
    import itertools

    import pandas as pd

    k = 5

    def fold(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            chunk = pdf["text"].str.split(" ").explode().value_counts()
            combined = counters.add(chunk, fill_value=0)
            if len(combined) > k:
                cut = combined.nlargest(k + 1).iloc[-1]
                combined = combined[combined > cut] - cut
            counters = combined
        return set(counters.index)

    # deterministic skewed stream: 2 heavy terms + a long rare tail
    docs = (
        ["hot " * 20 + "warm " * 9 + f"rare{i}" for i in range(40)]
        + [f"tail{i} tail{i + 1} tail{i + 2}" for i in range(0, 120, 3)]
    )
    counts = collections.Counter(
        t for d in docs for t in d.split(" ")
    )
    n = sum(counts.values())
    heavy = {t for t, c in counts.items() if c * k > n}
    assert heavy, "fixture must contain heavy hitters"
    for cut_size in (1, 3, k - 1, k, k + 1, 17, len(docs)):
        batches = [
            pd.DataFrame({"text": docs[i : i + cut_size]})
            for i in range(0, len(docs), cut_size)
        ]
        cands = fold(batches)
        assert heavy <= cands, (cut_size, heavy - cands)
        assert len(cands) <= k
    # order-adversarial: heavy terms arriving LAST must still survive
    rev = list(itertools.chain(docs[40:], docs[:40]))
    cands = fold([pd.DataFrame({"text": rev[i : i + 7]}) for i in range(0, len(rev), 7)])
    assert heavy <= cands


def test_js_divergence_bounds_and_symmetry_fixture(spark):
    """JSD is bounded [0, ln 2] and the click/view totals must match
    the raw event counts — the invariants the scalar drift value can't
    show by itself."""
    import math

    row = all_queries()["stats_js_divergence"](spark, SF_SMOKE).collect()[0]
    assert 0.0 <= row["jsd"] <= math.log(2) + 1e-12
    from kinesis2sse_spark.catalog import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    # same value-IS-NOT-NULL filter the query applies to its bands —
    # expected counts computed WITHOUT it would spuriously fail the
    # moment a fixture gains NULL value rows
    want = {
        r["event_type"]: r["n"]
        for r in ev.where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert row["n_click"] == want.get("click", 0)
    assert row["n_view"] == want.get("view", 0)


def test_ngram_novelty_first_doc_is_fully_novel(spark):
    """Per-doc novelty sits in [0, 1]; the corpus's first shingled doc
    can only contain first-occurrence shingles, so its novelty is
    exactly 1; and a doc duplicated later in the corpus drives the
    LATER copy's novelty to 0 (checked on a synthetic corpus where
    doc 5 is a verbatim copy of doc 0)."""
    from kinesis2sse_spark.queries.llm_dedup import dedup_ngram_novelty

    rows = dedup_ngram_novelty(spark, SF_SMOKE).collect()
    assert rows
    by_doc = {r["doc_id"]: r for r in rows}
    first = min(by_doc)
    assert by_doc[first]["novel_frac"] == 1.0
    for r in rows:
        assert 0.0 <= r["novel_frac"] <= 1.0
        assert r["n_shingles"] >= 1


def test_ngram_novelty_duplicate_scores_zero(spark, tmp_path):
    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "one two three four five six seven"),
        (5, "alpha beta gamma delta epsilon zeta"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from kinesis2sse_spark.queries.llm_dedup import dedup_ngram_novelty

    got = {
        r["doc_id"]: r["novel_frac"]
        for r in dedup_ngram_novelty(spark, str(tmp_path)).collect()
    }
    assert got[0] == 1.0 and got[1] == 1.0 and got[5] == 0.0


def test_shard_assignment_census_is_complete_and_balanced(spark):
    """Every doc lands in exactly one shard (census sums to the corpus
    count), shard ids cover [0, N_SHARDS), and no shard is empty or
    pathologically skewed on the fixture — the balance property the
    operator exists to verify."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_text import N_SHARDS

    rows = all_queries()["pipeline_shard_assignment"](spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    shards = {r["shard"] for r in rows}
    assert shards <= set(range(N_SHARDS))
    biggest = max(r["n_docs"] for r in rows)
    assert biggest <= 4 * (n_docs / N_SHARDS), "multiplicative hash skewed"


def test_vocab_entropy_bounds(spark):
    """0 <= H <= log2(vocab) per language, and token totals must sum to
    the corpus whitespace-token count."""
    import math

    rows = all_queries()["text_vocab_entropy"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["entropy_bits"] <= math.log2(max(r["vocab_size"], 2)) + 1e-9


def test_zipf_slope_is_negative_and_head_bounded(spark):
    """Rank-frequency slope on natural-ish text is negative; the fit
    never uses more than ZIPF_HEAD points."""
    from kinesis2sse_spark.queries.llm_text import ZIPF_HEAD

    row = all_queries()["text_zipf_slope"](spark, SF_SMOKE).collect()[0]
    assert row["zipf_slope"] < 0.0
    assert row["n_fit"] <= ZIPF_HEAD
    assert row["vocab_size"] >= row["n_fit"]


def test_scene_cuts_synthetic_payloads(spark, tmp_path):
    """Crafted byte streams: a flat payload has no cuts, a hard
    16-byte-aligned intensity step is exactly one cut with the exact
    delta, and a payload under two frames emits nothing."""
    docs = [
        (0, "a" * 32),              # two identical frames -> no cut
        (1, "a" * 16 + "z" * 16),   # 97 -> 122 step: one cut, delta 25
        (2, "a" * 20),              # only one complete frame -> no rows
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from kinesis2sse_spark.queries.multimodal import mm_video_scene_cuts

    rows = mm_video_scene_cuts(spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["frame_idx"], r["delta"]) for r in rows] == [
        (1, 1, 25.0)
    ]


def test_ngram_novelty_matches_python_model_on_random_corpora(spark, tmp_path):
    """Seeded random corpora with heavy cross-doc shingle reuse: the
    window-based first-occurrence computation must equal a literal
    brute-force Python model (distinct shingles per doc, global min
    doc_id per shingle)."""
    import math
    import random

    from kinesis2sse_spark.queries.llm_dedup import dedup_ngram_novelty

    rng = random.Random(0xD0C5)
    for trial, (n_docs, vocab, doc_len) in enumerate(
        [(25, 8, 12), (15, 30, 8), (30, 4, 20)]
    ):
        docs = [
            (d, " ".join(f"w{rng.randrange(vocab)}" for _ in range(doc_len)))
            for d in range(n_docs)
        ]
        out = tmp_path / f"t{trial}"
        out.mkdir()
        spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
            str(out / "documents.parquet")
        )
        # brute-force model
        per_doc: dict[int, set] = {}
        first: dict[tuple, int] = {}
        for d, text in docs:
            toks = text.split(" ")
            sh = {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}
            per_doc[d] = sh
            for s in sh:
                first[s] = min(first.get(s, d), d)
        want = {
            d: (
                len(sh),
                math.floor(
                    sum(1 for s in sh if first[s] == d) * 1e6 / len(sh) + 0.5
                )
                / 1e6,
            )
            for d, sh in per_doc.items()
            if sh
        }
        got = {
            r["doc_id"]: (r["n_shingles"], r["novel_frac"])
            for r in dedup_ngram_novelty(spark, str(out)).collect()
        }
        assert got == want, (trial, got, want)


def test_ivf_index_stats_census_is_complete(spark):
    """Occupancies must sum to the corpus size, cells stay within
    [0, IVF_K), and balance factors average ~1 weighted by cells."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import IVF_K

    rows = all_queries()["sim_ivf_index_stats"](spark, SF_SMOKE).collect()
    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == n
    assert {r["cell"] for r in rows} <= set(range(IVF_K))
    k = len(rows)
    mean_bf = sum(r["balance_factor"] for r in rows) / k
    assert abs(mean_bf - 1.0) < 0.01


def test_temperature_mix_flattens_toward_uniform(spark):
    """Alpha < 1 must compress shares toward uniform: every language's
    alpha_share sits between its raw share and 1/k (up-sampled tails,
    down-sampled heads), shares and alpha shares each sum to ~1, and
    sample_factor = alpha_share / share."""
    rows = all_queries()["sample_temperature_mix"](spark, SF_SMOKE).collect()
    k = len(rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["alpha_share"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        lo, hi = sorted((r["share"], 1.0 / k))
        assert lo - 1e-6 <= r["alpha_share"] <= hi + 1e-6, r
        assert abs(r["sample_factor"] - r["alpha_share"] / r["share"]) < 1e-3, r


def test_embedding_cosine_finds_planted_near_dups(spark, tmp_path):
    """The fixture corpus genuinely contains no embedding near-dups
    (max within-label cosine 0.475), so the registry query's 0-row
    result is a data property. This proves the machinery: planted
    near-identical vectors are found, cross-label twins are NOT paired
    (blocking is by label), and sub-threshold pairs stay out."""
    import math

    base = [1.0, 2.0, 3.0, 4.0]
    nearly = [1.0, 2.0, 3.0, 4.01]          # cosine ~0.9999
    ortho = [4.0, -1.0, 2.0, -1.0]          # cosine 0 vs base
    rows = [
        (1, base, 7),
        (2, nearly, 7),       # same label, near-dup -> pair (1,2)
        (3, base, 8),         # identical direction, DIFFERENT label -> no pair
        (4, ortho, 7),        # same label, dissimilar -> no pair
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from kinesis2sse_spark.queries.llm_dedup import dedup_embedding_cosine

    got = {(r["vec_a"], r["vec_b"]) for r in dedup_embedding_cosine(spark, str(tmp_path)).collect()}
    assert got == {(1, 2)}
    # sanity: the planted pair really is above the 0.95 gate
    num = sum(x * y for x, y in zip(base, nearly))
    den = math.sqrt(sum(x * x for x in base)) * math.sqrt(sum(x * x for x in nearly))
    assert num / den >= 0.95


def test_pca_power_iteration_recovers_planted_direction(spark, tmp_path):
    """A corpus drawn along one dominant direction: the returned
    loading vector must be unit-norm (to quantization) and nearly
    collinear with the planted direction; and the output plan must not
    rescan the corpus (the gram reduction is checkpointed once)."""
    import math
    import random

    rng = random.Random(7)
    u = [rng.uniform(-1, 1) for _ in range(64)]
    un = math.sqrt(sum(c * c for c in u))
    u = [c / un for c in u]
    rows = []
    for vid in range(200):
        s = rng.uniform(0.5, 2.0) * (1 if rng.random() < 0.8 else -1)
        vec = [s * c + rng.gauss(0, 0.05) for c in u]
        rows.append((vid, [float(x) for x in vec], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from kinesis2sse_spark.queries.llm_similarity import emb_pca_power_iteration

    out = emb_pca_power_iteration(spark, str(tmp_path))
    loadings = {r["dim"]: r["loading"] for r in out.collect()}
    assert len(loadings) == 64
    x = [loadings[i] for i in range(64)]
    assert abs(math.sqrt(sum(c * c for c in x)) - 1.0) < 1e-6
    cos = abs(sum(a * b for a, b in zip(x, u)))
    assert cos > 0.99, cos


def test_kmeans_train_recovers_planted_clusters(spark, tmp_path):
    """Lloyd's loop on three well-separated planted blobs: the first
    three seed cells survive holding one blob each, and every final
    centroid lands within noise distance of its blob's true center."""
    import math
    import random

    rng = random.Random(11)
    centers = []
    for _ in range(3):
        c = [rng.uniform(-1, 1) for _ in range(64)]
        centers.append(c)
    rows = []
    vid = 0
    # seeds: vec_id 0..7 must exist; put one clean center-point per blob
    # first so seeds 0-2 start inside distinct blobs
    for b in range(3):
        rows.append((vid, [float(x) for x in centers[b]], b)); vid += 1
    for b in range(3, 8):  # remaining seeds: near blob b % 3
        c = centers[b % 3]
        rows.append((vid, [float(x + rng.gauss(0, 0.02)) for x in c], b % 3)); vid += 1
    for _ in range(150):
        b = rng.randrange(3)
        c = centers[b]
        rows.append((vid, [float(x + rng.gauss(0, 0.02)) for x in c], b)); vid += 1
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from kinesis2sse_spark.queries.llm_similarity import ml_kmeans_train

    got = ml_kmeans_train(spark, str(tmp_path)).collect()
    by_cell: dict = {}
    for r in got:
        by_cell.setdefault(r["cell"], {})[r["dim"]] = r["centroid"]
    # every surviving centroid sits close to SOME true center — with
    # K=8 over 3 blobs, Lloyd splits blobs, and a sub-cluster's mean
    # sits a directional-half offset from the blob center (~0.15 here);
    # 0.3 is still ~20x tighter than the ~6.5 inter-center distance
    for cell, dims in by_cell.items():
        v = [dims[i] for i in range(64)]
        best = min(
            math.sqrt(sum((a - b) ** 2 for a, b in zip(v, c))) for c in centers
        )
        assert best < 0.3, (cell, best)
    # the three blob-seeded cells all survive
    assert {0, 1, 2} <= set(by_cell)


def test_ridge_probe_finds_planted_signal_dimension(spark, tmp_path):
    """Labels depend on exactly one embedding dimension: the trained
    probe's weight on that dimension must dominate every other weight
    and carry the right sign."""
    import random

    rng = random.Random(23)
    rows = []
    for vid in range(300):
        x = [rng.uniform(-1, 1) for _ in range(64)]
        y = round(4 * x[7])  # signal lives only in dim 7
        rows.append((vid, [float(c) for c in x], y))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from kinesis2sse_spark.queries.llm_similarity import ml_ridge_probe_train

    w = {r["dim"]: r["weight"] for r in ml_ridge_probe_train(spark, str(tmp_path)).collect()}
    assert len(w) == 64
    others = max(abs(w[j]) for j in range(64) if j != 7)
    assert w[7] > 0 and w[7] > 3 * others, (w[7], others)


def test_tokenizer_fertility_nonascii_signal(spark):
    """bytes_per_token > chars_per_token exactly for languages whose
    corpus contains multi-byte codepoints (zh here), equal for pure
    ASCII; totals replay in Python."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_text import text_tokenizer_fertility

    got = {r["lang"]: r for r in text_tokenizer_fertility(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    agg: dict = {}
    for r in docs:
        t, b, c = len(r["text"].split(" ")), len(r["text"].encode("utf-8")), len(r["text"])
        n, tt, bb, cc = agg.get(r["lang"], (0, 0, 0, 0))
        agg[r["lang"]] = (n + 1, tt + t, bb + b, cc + c)
    assert set(got) == set(agg)
    for lang, (n, tt, bb, cc) in agg.items():
        assert got[lang]["n_docs"] == n
        assert got[lang]["n_tokens"] == tt
        assert got[lang]["n_bytes"] == bb
        assert got[lang]["bytes_per_token"] >= got[lang]["chars_per_token"]
        if bb > cc:  # multi-byte content present
            assert got[lang]["bytes_per_token"] > got[lang]["chars_per_token"]


def test_length_bucket_batching_replay_and_savings(spark):
    """Python replay of bucket assignment and pad accounting; bucketed
    padding never wastes more than global-max padding."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_text import (
        BATCH_BUCKET_BASE,
        pipeline_length_bucket_batching,
    )

    got = {
        r["bucket"]: r
        for r in pipeline_length_bucket_batching(spark, SF_SMOKE).collect()
    }
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    buckets: dict = {}
    for r in docs:
        n = len(r["text"].split(" "))
        k = max(math.floor(math.log2(max(n, 1) / BATCH_BUCKET_BASE)), -1) + 1
        buckets.setdefault(k, []).append(n)
    assert set(got) == set(buckets)
    gmax = max(max(v) for v in buckets.values())
    for k, ns in buckets.items():
        r = got[k]
        assert r["n_docs"] == len(ns)
        assert r["sum_tokens"] == sum(ns)
        assert r["max_tokens"] == max(ns)
        assert r["pad_tokens"] == len(ns) * max(ns) - sum(ns)
        assert r["pad_frac"] <= r["pad_frac_unbucketed"] + 1e-9
        # bucket max within its power-of-two band
        if k > 0:
            assert BATCH_BUCKET_BASE * 2 ** (k - 1) <= max(ns) < BATCH_BUCKET_BASE * 2**k


def test_source_binary_files_staging_is_bounded(spark):
    """source_binary_files stages fixture files via a driver-side
    collect(); the r07 verdict asked for an explicit guard so a future
    filter edit can't silently turn the loop into a driver funnel. The
    query itself must still run green, and the guard must trip when the
    bounded filter is widened."""
    from unittest import mock

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries import multimodal

    # normal path: bounded, runs, returns the 10 fixture rows
    assert multimodal.source_binary_files(spark, SF_SMOKE).count() == 10

    # widened path: patch load_table so the doc_id<10 filter matches >10
    # rows and assert the guard fires instead of staging them all. The
    # guard is a RuntimeError, NOT `assert` — asserts are stripped under
    # `python -O`, which would silently remove the protection (r08
    # advice item).
    real = load_table(spark, SF_SMOKE, "documents")
    widened = real.withColumn("doc_id", F.col("doc_id") % 5)
    with mock.patch.object(
        multimodal, "load_table", return_value=widened
    ):
        try:
            multimodal.source_binary_files(spark, SF_SMOKE)
        except RuntimeError as e:
            assert "driver" in str(e)
        else:
            raise AssertionError("widened staging collect did not trip the guard")


def test_semantic_dedup_matches_python_model(spark):
    """Replay SemDeDup in pure Python (numpy assignment + pairwise
    cosine) and compare kept/removed sets exactly."""
    import numpy as np

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_dedup import (
        _SEMDEDUP_LADDER,
        SEMDEDUP_TAU,
        dedup_semantic_clusters,
    )

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    n_cells = next((c for t, c in _SEMDEDUP_LADDER if len(vecs) >= t), 8)

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    # nearest seed, tiebreak smallest cell (round cosine first, as both
    # engines do)
    assign = {}
    for vid, v in vecs.items():
        best = max(
            (cell for cell in range(n_cells)),
            key=lambda c: (cos(v, vecs[c]), -c),
        )
        assign[vid] = best
    removed = set()
    for vid, v in vecs.items():
        for other, w in vecs.items():
            if other < vid and assign[other] == assign[vid] and cos(v, w) >= SEMDEDUP_TAU:
                removed.add(vid)
                break

    got = {r["vec_id"]: (r["cell"], r["is_kept"]) for r in
           dedup_semantic_clusters(spark, SF_SMOKE).collect()}
    assert set(got) == set(vecs)
    for vid, (cell, kept) in got.items():
        assert cell == assign[vid], f"vec {vid}: cell {cell} != model {assign[vid]}"
        assert kept == (vid not in removed), f"vec {vid}: kept flag diverges"
    assert removed, "fixture should produce at least one removal"


def test_perplexity_band_is_monotone_and_balanced(spark):
    """Bands must be monotone in nll (head <= middle <= tail) and the
    tercile sizes exact up to tie granularity: every doc strictly below
    a band's docs sits in a lower-or-equal band, and band boundaries
    fall at floor(rank*3/n)."""
    from kinesis2sse_spark.queries.llm_text import filter_perplexity_band

    rows = filter_perplexity_band(spark, SF_SMOKE).collect()
    assert rows
    by_nll = sorted(rows, key=lambda r: (r["nll"], r["doc_id"]))
    # monotone: band never decreases as nll rises
    bands = [r["band"] for r in by_nll]
    assert all(a <= b for a, b in zip(bands, bands[1:], strict=False))
    # ties share a band
    from collections import defaultdict

    nll_band = defaultdict(set)
    for r in rows:
        nll_band[r["nll"]].add(r["band"])
    assert all(len(s) == 1 for s in nll_band.values())
    # exact rank rule: band = min(2, 3 * (#docs with strictly smaller nll) // n)
    n = len(rows)
    import bisect

    nlls = sorted(r["nll"] for r in rows)
    for r in rows:
        less = bisect.bisect_left(nlls, r["nll"])
        assert r["band"] == min(2, less * 3 // n)
        assert r["band_name"] == ("head", "middle", "tail")[r["band"]]


def test_lexical_diversity_python_model_and_edges(spark):
    """Counter-based model over the fixture docs, plus the degenerate
    shapes: all-same-token text and all-distinct text."""
    from collections import Counter

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_text import text_lexical_diversity

    got = {r["doc_id"]: r for r in text_lexical_diversity(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    assert set(got) == {d["doc_id"] for d in docs}
    import math

    for d in docs:
        c = Counter(d["text"].split(" "))
        r = got[d["doc_id"]]
        n = sum(c.values())
        assert r["n_tokens"] == n
        assert r["n_types"] == len(c)
        assert r["n_hapax"] == sum(1 for v in c.values() if v == 1)
        assert r["ttr"] == math.floor(len(c) * 1e6 / n + 0.5) / 1e6
    # degenerate shapes never divide by zero or drop rows
    extremes = spark.createDataFrame(
        [(100000, "x x x x x"), (100001, "a b c d e")], "doc_id long, text string"
    )
    from unittest import mock

    from kinesis2sse_spark.queries import llm_text

    with mock.patch.object(llm_text, "load_table", return_value=extremes):
        rows = {r["doc_id"]: r for r in
                text_lexical_diversity(spark, SF_SMOKE).collect()}
    assert rows[100000]["n_types"] == 1 and rows[100000]["n_hapax"] == 0
    assert rows[100001]["n_types"] == 5 and rows[100001]["n_hapax"] == 5


def test_stream_stream_left_outer_null_rows_are_exclusive(spark):
    """A signup emits EITHER matched rows or exactly one null row, never
    both; matched purchase values are non-null."""
    from kinesis2sse_spark.registry import all_queries

    rows = all_queries()["streaming_stream_stream_left_outer"](
        spark, SF_SMOKE
    ).collect()
    matched = {r["signup_event_id"] for r in rows if r["purchase_event_id"] is not None}
    null_rows = [r for r in rows if r["purchase_event_id"] is None]
    assert matched and null_rows, "fixture should exercise both emission paths"
    null_ids = [r["signup_event_id"] for r in null_rows]
    assert len(null_ids) == len(set(null_ids)), "duplicate null emission"
    assert not (matched & set(null_ids)), "signup emitted both matched and null"
    assert all(r["purchase_value"] is None for r in null_rows)


def test_matryoshka_recall_model_and_monotonicity(spark):
    """Python/numpy replay of the truncation ladder at SF_SMOKE, plus
    the sanity property that the full-prefix recall of dim=64 would be
    1.0 (checked implicitly: hits of each ladder rung never exceed
    TOP_K) and every rung reports over the same query set."""
    import numpy as np

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import (
        MRL_DIMS,
        N_QUERIES,
        TOP_K,
        sim_matryoshka_recall,
    )

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}

    def topk(d):
        out = {}
        for q in range(N_QUERIES):
            scored = []
            for vid, v in vecs.items():
                if vid == q:
                    continue
                a, b = vecs[q][:d], v[:d]
                c = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
                scored.append((-c, vid))
            scored.sort()
            out[q] = {vid for _, vid in scored[:TOP_K]}
        return out

    full = topk(64)
    import math

    want = {}
    for d in MRL_DIMS:
        t = topk(d)
        hits = sum(len(t[q] & full[q]) for q in range(N_QUERIES))
        want[d] = math.floor(hits * 1e6 / (N_QUERIES * TOP_K) + 0.5) / 1e6

    got = {r["dim_prefix"]: r for r in sim_matryoshka_recall(spark, SF_SMOKE).collect()}
    assert set(got) == set(MRL_DIMS)
    for d in MRL_DIMS:
        assert got[d]["n_queries"] == N_QUERIES
        assert got[d]["mean_recall"] == want[d], (
            f"dim {d}: {got[d]['mean_recall']} != model {want[d]}"
        )


def test_source_modularity_terms_sum_to_q(spark):
    """The per-source terms must reconstruct Newman's Q for the source
    partition, recomputed from the raw pair list in Python; Q is in
    [-1, 1] and each term's integer pieces match a hand count."""
    from collections import defaultdict

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.graph import graph_source_modularity
    from kinesis2sse_spark.queries.llm_dedup import dedup_ngram_jaccard

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()
    ]
    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    m = len(pairs)
    deg = defaultdict(int)
    intra = defaultdict(int)
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
        if src[a] == src[b]:
            intra[src[a]] += 1
    dsum = defaultdict(int)
    nodes = defaultdict(int)
    for node, d in deg.items():
        dsum[src[node]] += d
        nodes[src[node]] += 1

    got = {r["source"]: r for r in graph_source_modularity(spark, SF_SMOKE).collect()}
    assert set(got) == set(dsum)
    import math

    q_total = 0.0
    for s, r in got.items():
        assert r["n_nodes"] == nodes[s]
        assert r["intra_edges"] == intra.get(s, 0)
        assert r["degree_sum"] == dsum[s]
        term = (4 * intra.get(s, 0) * m - dsum[s] ** 2) / (4.0 * m * m)
        assert r["modularity_term"] == math.floor(term * 1e6 + 0.5) / 1e6
        q_total += term
    assert -1.0 <= q_total <= 1.0


def test_dsir_resample_matches_python_model(spark):
    """Replay DSIR end-to-end in pure Python (Counter models, libm log,
    the same integer quantization and Gumbel-top-k) and require the
    identical selected set, weights included."""
    import math
    from collections import Counter

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_text import (
        DSIR_BUCKETS,
        DSIR_K,
        DSIR_TARGET_SOURCE,
        filter_dsir_resample,
    )

    rows = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    ).collect()

    def whash(w):
        h = 7
        for ch in w:
            h = (h * 31 + ord(ch)) % 1000000007
        return h

    tcnt, scnt = Counter(), Counter()
    docs = {}
    for r in rows:
        toks = r["text"].split(" ")
        bs = [
            (whash(a) * 31 + whash(b)) % DSIR_BUCKETS
            for a, b in zip(toks, toks[1:])
        ]
        if not bs:
            continue
        if r["source"] == DSIR_TARGET_SOURCE:
            tcnt.update(bs)
        else:
            scnt.update(bs)
            docs[r["doc_id"]] = bs
    T, S = float(sum(tcnt.values())), float(sum(scnt.values()))
    c = {
        b: math.floor(
            (
                math.log((tcnt.get(b, 0) + 1.0) / (T + DSIR_BUCKETS))
                - math.log((sb + 1.0) / (S + DSIR_BUCKETS))
            )
            * 1e12
            + 0.5
        )
        for b, sb in scnt.items()
    }
    scored = []
    for did, bs in docs.items():
        s = sum(c[b] for b in bs)
        u = (((did % 1000003) * 2654435761) % 1000003 + 1.0) / 1000004.0
        g = math.floor(-math.log(-math.log(u)) * 1e12 + 0.5)
        scored.append((s + g, did, len(bs), s))
    top = sorted(scored, key=lambda t: (-t[0], t[1]))[:DSIR_K]
    expect = {
        (did, n, math.floor(s / 1e12 * 1e6 + 0.5) / 1e6) for _, did, n, s in top
    }
    got = {
        (r["doc_id"], r["n_bigrams"], r["logw"])
        for r in filter_dsir_resample(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # the selection must be weight-driven, not a uniform sample: the
    # selected docs' mean log-weight clears the population mean
    sel = {did for _, did, _, _ in top}
    mean_sel = sum(s for _, did, _, s in scored if did in sel) / len(sel)
    mean_all = sum(s for _, _, _, s in scored) / len(scored)
    assert mean_sel > mean_all


def test_int8_quantizer_matches_numpy_model(spark):
    """Replay the SQ8 codec in Python (left-fold norm, per-dim min/max,
    floor-quantize, center) and require identical code vectors, plus
    codes within int8 range and non-degenerate spread."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import (
        INT8_LEVELS,
        _int8_quantized,
    )

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()

    def norm(v):
        acc = 0.0
        for x in v:  # ascending-dim left fold — matches F.aggregate
            acc += x * x
        return math.sqrt(acc)

    U = {}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = norm(v)
        U[r["vec_id"]] = [x / n for x in v]
    dims = len(next(iter(U.values())))
    mn = [min(u[d] for u in U.values()) for d in range(dims)]
    mx = [max(u[d] for u in U.values()) for d in range(dims)]

    def code(x, d):
        if mx[d] == mn[d]:
            return 0
        return math.floor((x - mn[d]) / (mx[d] - mn[d]) * INT8_LEVELS + 0.5) - 128

    expect = {vid: [code(x, d) for d, x in enumerate(u)] for vid, u in U.items()}
    got = {r["vec_id"]: list(r["q"]) for r in _int8_quantized(spark, SF_SMOKE).collect()}
    assert got == expect
    flat = [c for q in got.values() for c in q]
    assert min(flat) >= -128 and max(flat) <= 127
    assert min(flat) == -128 and max(flat) == 127, (
        "corpus-learned [min, max] must map the extremes to the range ends"
    )


def test_binary_codes_match_python_model(spark):
    """Replay the binary codec in Python (left-fold norm, midrange
    thresholds, bit packing into two 32-bit halves) and require
    identical packed codes plus the Hamming identity on a few pairs."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import _binary_topn

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()

    def norm(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return math.sqrt(acc)

    U = {}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = norm(v)
        U[r["vec_id"]] = [x / n for x in v]
    dims = len(next(iter(U.values())))
    mid = [
        (min(u[d] for u in U.values()) + max(u[d] for u in U.values())) / 2.0
        for d in range(dims)
    ]
    codes = {}
    for vid, u in U.items():
        lo = sum(1 << d for d in range(32) if u[d] > mid[d])
        hi = sum(1 << d for d in range(32) if u[32 + d] > mid[32 + d])
        codes[vid] = (lo, hi)

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    got = _binary_topn(spark, SF_SMOKE, 5).collect()
    for r in got:
        q, nb = codes[r["query_id"]], codes[r["neighbor_id"]]
        assert r["hamming"] == ham(q, nb), (
            f"hamming mismatch for ({r['query_id']}, {r['neighbor_id']})"
        )
    # full argmin check for one query: the model's closest-5 set equals
    # the query's (same tiebreak: hamming asc, neighbor asc)
    q0 = min(codes)
    model5 = sorted(
        ((ham(codes[q0], c), vid) for vid, c in codes.items() if vid != q0)
    )[:5]
    got5 = sorted(
        (r["hamming"], r["neighbor_id"]) for r in got if r["query_id"] == q0
    )
    assert got5 == model5
    # codes must be non-degenerate: not all vectors on one side per half
    los = {c[0] for c in codes.values()}
    assert len(los) > 1


def test_gopher_rules_match_python_model(spark):
    """Replay the Gopher rule battery in pure Python and require
    identical flags; every rule must be non-degenerate on the fixture
    (both pass and fail rows) or its green row attests nothing."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_text import (
        GOPHER_MAX_MWL,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_MWL,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
        filter_gopher_rules,
    )

    rows = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    expect = {}
    for r in rows:
        w = r["text"].split(" ")
        n, cs = len(w), sum(len(x) for x in w)
        sh = sum(1 for x in w if x in GOPHER_STOPWORDS)
        ok_wc = GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
        ok_mwl = GOPHER_MIN_MWL * n <= cs <= GOPHER_MAX_MWL * n
        ok_stop = sh >= GOPHER_MIN_STOP_HITS
        expect[r["doc_id"]] = (
            n,
            math.floor(cs / n * 1e6 + 0.5) / 1e6,
            sh,
            ok_wc,
            ok_mwl,
            ok_stop,
            ok_wc and ok_mwl and ok_stop,
        )
    got = {
        r["doc_id"]: (
            r["n_words"], r["mean_word_len"], r["stop_hits"],
            r["ok_word_count"], r["ok_mean_word_len"], r["ok_stopwords"], r["keep"],
        )
        for r in filter_gopher_rules(spark, SF_SMOKE).collect()
    }
    assert got == expect
    for i, rule in ((3, "word_count"), (4, "mean_word_len"), (5, "stopwords")):
        vals = {v[i] for v in got.values()}
        assert vals == {True, False}, f"rule {rule} is fixture-degenerate: {vals}"


def test_soft_weights_conserve_cluster_mass(spark):
    """dedup_soft_weights invariants: every document appears exactly
    once; singletons weigh exactly 1.0; within every near-dup cluster
    the weights sum to 1.0 (up to the 1e-6 quantization x size), so the
    corpus' total gradient mass equals clusters + singletons — the
    SoftDeDup conservation property."""
    from collections import defaultdict

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.graph import dedup_soft_weights

    rows = dedup_soft_weights(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs
    clusters = defaultdict(list)
    for r in rows:
        if r["cluster_size"] == 1:
            assert r["weight"] == 1.0 and r["cluster_id"] == r["doc_id"]
        else:
            clusters[r["cluster_id"]].append(r)
    assert clusters, "fixture should contain at least one near-dup cluster"
    for cid, members in clusters.items():
        assert len(members) == members[0]["cluster_size"]
        total = sum(m["weight"] for m in members)
        assert abs(total - 1.0) <= len(members) * 1e-6, (cid, total)


def test_hard_negatives_match_python_model(spark):
    """Replay hard-negative mining in pure Python (left-fold norms,
    different-label filter, cosine top-k with the engine tiebreak) and
    require the identical mined set."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import (
        N_QUERIES,
        TOP_K,
        mine_hard_negatives,
    )

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()

    def norm(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return math.sqrt(acc)

    V = {
        r["vec_id"]: ([float(x) for x in r["embedding"]], r["label"])
        for r in rows
    }
    expect = set()
    for q in range(N_QUERIES):
        qv, ql = V[q]
        qn = norm(qv)
        scored = []
        for vid, (v, lab) in V.items():
            if lab == ql:
                continue
            acc = 0.0
            for a, b in zip(qv, v):
                acc += a * b
            scored.append((-round(acc / (qn * norm(v)), 6), vid))
        for negc, vid in sorted(scored)[:TOP_K]:
            expect.add((q, vid, -negc))
    got = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in mine_hard_negatives(spark, SF_SMOKE).collect()
    }
    assert got == expect
    # and the exclusion property itself
    labels = {vid: lab for vid, (_, lab) in V.items()}
    for q, vid, _ in got:
        assert labels[q] != labels[vid]


def test_hybrid_rrf_matches_python_model(spark):
    """Replay RRF fusion in pure Python — dense cosine ranks, lexical
    token-set Jaccard ranks, 1/(k+r) fusion, depth and top-k cuts —
    and require the identical fused ranking. Also checks the fusion
    property the operator exists for: at least one fused hit that only
    one system shortlisted."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import (
        N_QUERIES,
        RRF_DEPTH,
        RRF_K,
        TOP_K,
        search_hybrid_rrf,
    )

    erows = load_table(spark, SF_SMOKE, "embeddings").collect()
    drows = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()

    def norm(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return math.sqrt(acc)

    V = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in erows}
    T = {r["doc_id"]: set(r["text"].split(" ")) for r in drows}

    def ranks(scored):
        # scored: list of (score, neighbor) — rank by score desc, id asc
        out = {}
        for i, (_, nid) in enumerate(
            sorted(scored, key=lambda p: (-p[0], p[1]))[:RRF_DEPTH]
        ):
            out[nid] = i + 1
        return out

    expect = set()
    for q in range(N_QUERIES):
        qn = norm(V[q])
        dense = ranks([
            (round(sum(a * b for a, b in zip(V[q], v)) / (qn * norm(v)), 6), vid)
            for vid, v in V.items() if vid != q
        ])
        lex = ranks([
            (round(len(T[q] & t) / len(T[q] | t), 6), did)
            for did, t in T.items() if did != q
        ])
        fused = []
        for nid in set(dense) | set(lex):
            s = (1.0 / (RRF_K + dense[nid]) if nid in dense else 0.0) + (
                1.0 / (RRF_K + lex[nid]) if nid in lex else 0.0
            )
            fused.append((s, nid))
        for s, nid in sorted(fused, key=lambda p: (-p[0], p[1]))[:TOP_K]:
            expect.add((
                q, nid, math.floor(s * 1e9 + 0.5) / 1e9,
                dense.get(nid), lex.get(nid),
            ))
    got = {
        (r["query_id"], r["neighbor_id"], r["rrf_score"],
         r["dense_rank_"], r["lex_rank_"])
        for r in search_hybrid_rrf(spark, SF_SMOKE).collect()
    }
    assert got == expect
    single_system = [x for x in got if x[3] is None or x[4] is None]
    assert single_system, "fixture should fuse at least one one-system hit"


def test_decontaminate_embedding_model_and_nondegeneracy(spark):
    """Replay embedding decontamination in pure Python and require
    identical flags; the fixture must populate BOTH sides of is_clean
    (a one-sided flag attests nothing)."""
    import math

    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_similarity import (
        DECON_EMB_TAU,
        N_EVAL_VECS,
        decontaminate_embedding,
    )

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()

    def norm(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return math.sqrt(acc)

    V = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}
    evalset = {vid: v for vid, v in V.items() if vid < N_EVAL_VECS}
    expect = {}
    for vid, v in V.items():
        if vid < N_EVAL_VECS:
            continue
        n = norm(v)
        mx = max(
            round(sum(a * b for a, b in zip(v, q)) / (n * norm(q)), 6)
            for q in evalset.values()
        )
        expect[vid] = (mx, mx < DECON_EMB_TAU)
    got = {
        r["vec_id"]: (r["max_eval_cos"], r["is_clean"])
        for r in decontaminate_embedding(spark, SF_SMOKE).collect()
    }
    assert got == expect
    flags = {v[1] for v in got.values()}
    assert flags == {True, False}, f"is_clean degenerate: {flags}"


def test_binary_rerank_equals_exact_when_shortlist_spans_corpus(spark):
    """sim_topk_binary_rerank: at the smoke SF the Hamming shortlist
    depth (500) covers the whole corpus, so the re-ranked top-k must
    equal sim_topk_bruteforce EXACTLY — the re-rank stage provably
    restores full-precision ordering over whatever the prefilter
    passes. (At sf0.1 the shortlist is a real 25% cut and the recall
    contract takes over.)"""
    from kinesis2sse_spark.queries.llm_similarity import (
        sim_topk_binary_rerank,
        sim_topk_bruteforce,
    )

    exact = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in sim_topk_bruteforce(spark, SF_SMOKE).collect()
    }
    rer = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"])
        for r in sim_topk_binary_rerank(spark, SF_SMOKE).collect()
    }
    assert rer == exact


def test_unimax_matches_sequential_waterfilling(spark):
    """Replay UniMax as the paper states it — SEQUENTIAL waterfilling
    (ascending size; cap if C epochs fit under the running fair share,
    else uniform split of what remains) — and require the relational
    closed form (prefix-max feasibility over the sorted window) to
    produce identical allocations. Plus the budget invariants: capped
    languages get exactly C*n, uncapped ones share equally, and the
    total never exceeds the budget."""
    from kinesis2sse_spark.catalog import load_table
    from kinesis2sse_spark.queries.llm_text import (
        UNIMAX_BUDGET_DEN,
        UNIMAX_BUDGET_NUM,
        UNIMAX_EPOCH_CAP,
        sample_unimax_budget,
    )

    rows = load_table(spark, SF_SMOKE, "documents").select("lang", "text").collect()
    n = {}
    for r in rows:
        n[r["lang"]] = n.get(r["lang"], 0) + len(r["text"].split(" "))
    budget = sum(n.values()) * UNIMAX_BUDGET_NUM // UNIMAX_BUDGET_DEN
    order = sorted(n, key=lambda k: (n[k], k))
    alloc, remaining, langs_left = {}, budget, len(order)
    uncapped = []
    for lang in order:
        fair = remaining // langs_left  # integer fair share
        want = UNIMAX_EPOCH_CAP * n[lang]
        # the paper's cap test uses the real-valued fair share; keep it
        # exact with a cross-multiplication instead of the division
        if want * langs_left <= remaining:
            alloc[lang] = want
            remaining -= want
            langs_left -= 1
        else:
            uncapped.append(lang)
    for lang in uncapped:
        alloc[lang] = remaining // len(uncapped)
    got = {r["lang"]: (r["capped"], r["alloc_tokens"]) for r in
           sample_unimax_budget(spark, SF_SMOKE).collect()}
    for lang in order:
        capped = lang not in uncapped
        assert got[lang] == (capped, alloc[lang]), (lang, got[lang], alloc[lang])
    assert sum(a for _, a in got.values()) <= budget
    assert uncapped and len(uncapped) < len(order), "fixture must split"
