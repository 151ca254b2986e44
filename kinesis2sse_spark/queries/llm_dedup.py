"""Deduplication operators over ``documents`` / ``embeddings`` —
exact (hash groupBy), n-gram Jaccard (exact, inverted-index join),
SimHash (oracle-checked bit-for-bit), MinHash-LSH (approximate, the
100 TB path), embedding-cosine near-dup (blocked exact).

Scale design: the exact Jaccard pair search never cross-joins — it
builds an inverted index (shingle → docs), equi-joins on shingle, and
aggregates common-shingle counts, which is the MapReduce-canonical
candidate generation. MinHash-LSH replaces the exact index when even
the shingle join is too big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table, spread, pin_cache
from kinesis2sse_spark.registry import register

JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 24
# Candidate-generation document-frequency cap: a posting list longer
# than MAX_DF is SLICED to its MAX_DF lowest-doc_id entries (not
# dropped) before pair emission. The slice bounds any posting's pair
# blow-up at MAX_DF²/2 — without it one stopword-ish shingle shared by
# 10⁶ distinct texts explodes O(df²) pairs inside a single task — while
# keeping a deterministic representative sample connected, so a cluster
# of >MAX_DF distinct NEAR-duplicate texts (whose shared shingles all
# exceed the cap) still reports pairs among its lowest-id members
# instead of going silently blind; connected components stitch the rest.
# Intersection counts are over the sliced universe (a conservative
# lower bound on jaccard), and the oracle applies the identical slice
# so both sides agree exactly. (Exact-duplicate mass clusters never
# reach this path — they collapse to one representative first.)
MAX_DF = 256

# Rolling polynomial token hash, identical arithmetic in Spark SQL and
# DuckDB (same trick as text_fingerprint).
_SPARK_TOKEN_HASHES = (
    "transform(split(text, ' '), t -> aggregate("
    "transform(split(t, ''), c -> cast(ascii(c) as bigint)), "
    "cast(7 as bigint), (h, c) -> (h * 31 + c) % 1000000007))"
)
_DUCK_TOKEN_HASHES = (
    "list_transform(string_split(text, ' '), t -> list_reduce("
    "list_prepend(CAST(7 AS BIGINT), "
    "list_transform(string_split_regex(t, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(h, c) -> (h * 31 + c) % 1000000007))"
)


def _simhash_expr(hashes_var: str, intdiv: str) -> str:
    """Sum of 2^b over bits b where the (+1/-1) bit-vote is positive."""
    terms = []
    for b in range(SIMHASH_BITS):
        p = 2**b
        bit = f"(({hashes_var} {intdiv} {p}) % 2 = 1)"
        cnt = f"2 * len(list_filter(hs, h -> ((h {intdiv} {p}) % 2 = 1))) - len(hs)"
        if intdiv == "div":  # Spark dialect
            cnt = f"2 * size(filter(hs, h -> ((h div {p}) % 2 = 1))) - size(hs)"
        terms.append(f"(CASE WHEN {cnt} > 0 THEN CAST({p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
    return " + ".join(terms)


@register(
    "dedup_exact",
    bench=True,
    oracle="""
    SELECT min(doc_id) AS keep_id, count(*) AS n_copies, min(n_chars) AS n_chars
    FROM documents
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the full text, keep the lowest doc_id.
    One shuffle on the text hash; at 100 TB, group on xxhash64(text) first
    so the shuffle key is 8 bytes, then resolve rare collisions."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count("*").alias("n_copies"),
        F.min("n_chars").alias("n_chars"),
    ).drop("text")


def _exact_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse exact-duplicate texts to one representative BEFORE any
    shingling: one row per distinct text — (rep_id = min doc_id, text,
    members = sorted doc_id array). Grouping key is xxhash64(text) so
    the exchange sorts 8-byte keys, not document bodies (collision odds
    are negligible vs shingle-FP noise; the text rides along for the
    downstream shingler). This is what closes the MAX_DF blind spot: a
    10⁶-copy document contributes ONE doc to every shingle's df, so the
    heaviest duplicate clusters — exactly where dedup matters — can no
    longer cap their own shingles out of the index.

    The relation is persisted (MEMORY_AND_DISK — spills, never OOMs):
    it feeds the inverted index, both sides of the cross-cluster
    fan-out, and the within-cluster pair explode, and without a cache
    Spark instantiates that subtree — full scan + text-hash shuffle —
    once per use (4× here, more when the MinHash path composes on top).
    Spark's CacheManager keys on the analyzed plan, so every dedup
    query over the same sf_dir shares ONE materialization and repeated
    bench reps don't re-cache. At 100 TB the same role is played by
    staging the collapsed corpus to parquet once — it is the input to
    every downstream dedup/text operator, not just this query."""
    from pyspark import StorageLevel

    d = spread(load_table(spark, sf_dir, "documents"), spark)
    return (
        d.groupBy(F.xxhash64("text").alias("fp"))
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.first("text").alias("text"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .drop("fp")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _fan_out_pairs(rep_pairs: DataFrame, clusters: DataFrame, score_col: str) -> DataFrame:
    """Expand representative-level scored pairs back to doc-level pairs.
    Cross-cluster pairs inherit the rep pair's score verbatim (every
    member has the identical shingle set); within-cluster pairs are
    exact duplicates, score 1.0 (only for texts long enough to have
    shingles, matching the >= 3-token gate everywhere else). The
    expansion is quadratic in cluster size by construction of the
    pair-output contract — at 100 TB stop at rep pairs + the cluster
    membership table instead of materializing it."""
    mem = clusters.select("rep_id", F.explode("members").alias("doc_id"))
    cross = (
        rep_pairs.join(
            mem.select(F.col("rep_id").alias("ra"), F.col("doc_id").alias("da")),
            F.col("doc_a") == F.col("ra"),
        )
        .join(
            mem.select(F.col("rep_id").alias("rb"), F.col("doc_id").alias("db")),
            F.col("doc_b") == F.col("rb"),
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            score_col,
        )
    )
    pair = F.explode(
        F.filter(
            F.flatten(
                F.transform(
                    F.col("members"),
                    lambda x: F.transform(
                        F.col("members"), lambda y: F.struct(x.alias("a"), y.alias("b"))
                    ),
                )
            ),
            lambda p: p["a"] < p["b"],
        )
    )
    within = (
        clusters.filter(
            (F.size("members") >= 2) & (F.size(F.split("text", " ")) >= 3)
        )
        .select(pair.alias("p"))
        .select(
            F.col("p.a").alias("doc_a"),
            F.col("p.b").alias("doc_b"),
            F.lit(1.0).alias(score_col),
        )
    )
    return cross.unionByName(within)


# Shared oracle scaffolding: the same collapse → shingle-over-reps →
# rare-shingle inverted index the Spark side runs, in DuckDB SQL.
_ORACLE_CLUSTER_CTE = f"""
    clus AS (SELECT text, min(doc_id) AS rep_id FROM documents GROUP BY text),
    mem AS (SELECT d.doc_id, c.rep_id FROM documents d JOIN clus c ON d.text = c.text),
    toks AS (SELECT rep_id AS doc_id, string_split(text, ' ') AS t FROM clus),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) u
      WHERE len(t) >= 3
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    shc AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
        FROM sh
      ) WHERE rn <= {MAX_DF}
    ),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
"""


def _oracle_fan_out(score_expr: str, score_name: str, threshold: float) -> str:
    """Rep-pair scoring + doc-level fan-out, mirroring _fan_out_pairs."""
    return f"""
    , repscore AS (
      SELECT doc_a, doc_b, round({score_expr}, 6) AS {score_name}
      FROM inter i
      JOIN counts na ON na.doc_id = i.doc_a
      JOIN counts nb ON nb.doc_id = i.doc_b
      WHERE {score_expr} >= {threshold}
    )
    SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
           greatest(ma.doc_id, mb.doc_id) AS doc_b,
           r.{score_name}
    FROM repscore r
    JOIN mem ma ON ma.rep_id = r.doc_a
    JOIN mem mb ON mb.rep_id = r.doc_b
    UNION ALL
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(1.0 AS DOUBLE) AS {score_name}
    FROM mem a
    JOIN mem b ON a.rep_id = b.rep_id AND a.doc_id < b.doc_id
    JOIN toks t ON t.doc_id = a.rep_id
    WHERE len(t.t) >= 3
    """


def _ngram_pair_counts(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Shared inverted-index pair search over exact-duplicate-collapsed
    representatives: returns (inter, clusters) where inter is
    (doc_a, doc_b, na, nb, c) for every ordered REP pair co-occurring in
    >= 1 sliced word-3-shingle posting — c counts shared sliced-universe
    shingles, na/nb are full-universe per-rep distinct-shingle counts —
    and clusters is the membership table for fan-out. ONE shuffle on
    the shingle hash (posting lists carry doc counts, so no join-back);
    the MAX_DF slice bounds any posting list's pair blow-up at
    MAX_DF^2/2 while keeping heavy postings' lowest-id members
    connected, and since postings hold distinct TEXTS, only genuinely
    corpus-wide boilerplate shingles get sliced. Scoring layers on
    top."""
    clusters = _exact_clusters(spark, sf_dir)
    d = clusters.select(F.col("rep_id").alias("doc_id"), "text")
    # Single pass: distinct-shingle array once per doc, per-doc count rides
    # along with every exploded row, and shingles shuffle as 8-byte
    # xxhash64 keys instead of ~25-byte strings (collision odds over ~10M
    # distinct shingles ~ 1e-6 — far below FP noise). Shingle ids come
    # from _shingle_hash_arr's token-hash combine — see its docstring for
    # why that is 6x cheaper and output-identical here.
    sh = _shingle_hash_arr(d).select(
        "doc_id",
        F.size("shs").alias("n"),
        F.explode("shs").alias("sh"),
    )
    postings = sh.groupBy("sh").agg(
        F.collect_list(F.struct("doc_id", "n")).alias("docs")
    )
    pair = F.explode(
        F.filter(
            F.flatten(
                F.transform(
                    F.col("docs"),
                    lambda x: F.transform(
                        F.col("docs"), lambda y: F.struct(x.alias("a"), y.alias("b"))
                    ),
                )
            ),
            lambda p: p["a"]["doc_id"] < p["b"]["doc_id"],
        )
    )
    # Round-robin the surviving posting lists across all cores before the
    # quadratic pair explode: AQE coalesces the groupBy output by *bytes*
    # (4 partitions at sf0.1), but explode cost is O(df²) per list, so a
    # byte-balanced layout under-parallelizes the CPU-heavy stage and one
    # hot list can serialize it. Measured 2.01s -> 1.74s median at sf0.1;
    # at 100 TB the same shuffle is what spreads skewed lists. (Hashing
    # shingles before array_distinct was also tried: slower — xxhash64
    # then runs per occurrence instead of per distinct shingle.)
    inter = (
        # slice heavy postings to the MAX_DF lowest-doc_id entries
        # (sort_array on the struct array orders by doc_id, the first
        # field) — bounded pair blow-up, no silent cluster blindness
        postings.filter(F.size("docs") >= 2)
        .withColumn("docs", F.slice(F.sort_array("docs"), 1, MAX_DF))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(pair.alias("p"))
        .groupBy(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.n").alias("na"),
            F.col("p.b.n").alias("nb"),
        )
        .agg(F.count("*").alias("c"))
    )
    return inter, clusters


@register(
    "dedup_ngram_jaccard",
    bench=True,
    oracle=f"""
    WITH {_ORACLE_CLUSTER_CTE}
    {_oracle_fan_out("i.c * 1.0 / (na.n + nb.n - i.c)", "jaccard", JACCARD_THRESHOLD)}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via the shared inverted
    index (_ngram_pair_counts): |A∩B| / (|A|+|B|-|A∩B|) over rep pairs
    sharing >= 1 rare shingle, fanned back out to doc-level pairs
    (exact-duplicate cluster members pair at jaccard 1.0). No cross
    join anywhere."""
    inter, clusters = _ngram_pair_counts(spark, sf_dir)
    jac = F.col("c") * 1.0 / (F.col("na") + F.col("nb") - F.col("c"))
    rep_pairs = inter.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    return _fan_out_pairs(rep_pairs, clusters, "jaccard")


@register(
    "dedup_simhash",
    oracle=f"""
    SELECT doc_id,
           ({_simhash_expr("h", "//")}) AS simhash
    FROM (SELECT doc_id, {_DUCK_TOKEN_HASHES} AS hs FROM documents)
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint: per-token rolling hash → per-bit +1/-1 vote →
    sign vector packed into a 24-bit integer. Near-dup docs land on equal
    or small-Hamming-distance fingerprints; verified bit-for-bit by the
    oracle because the token hash is plain integer arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.expr(_SPARK_TOKEN_HASHES).alias("hs"))
        .select("doc_id", F.expr(_simhash_expr("h", "div")).alias("simhash"))
    )


# MinHash banding parameters: H signature rows in B bands of R. A pair
# with jaccard s collides in a band w.p. s^R; candidate w.p.
# 1-(1-s^R)^B — s=0.7, R=2, B=12 → 0.9997.
MINHASH_H = 24
MINHASH_R = 2
MINHASH_B = MINHASH_H // MINHASH_R


def _doc_shingle_hashes(d: DataFrame) -> DataFrame:
    """(doc_id, shs): distinct word-3-shingles per doc as xxhash64 longs
    of the shingle STRINGS — kept exclusively for dedup_minhash_lsh,
    whose banded signatures are min-hashes OF these values: changing
    the shingle-id function changes its candidate set and therefore its
    declared output rows. Every hash-value-INVARIANT consumer (the
    exact Jaccard ladder, where ids only ever feed equality/distinct-
    ness and the oracle verifies over strings) uses _shingle_hash_arr
    instead."""
    toks = F.split("text", " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
    )
    return (
        d.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            F.array_distinct(F.transform(shingles, lambda s: F.xxhash64(s))).alias("shs"),
        )
    )


def _shingle_hash_arr(d: DataFrame) -> DataFrame:
    """(doc_id, shs): distinct word-3-shingle ids per doc, via a
    token-hash combine — xxhash64 each TOKEN once, then one
    xxhash64(long, long, long) per shingle position — instead of
    building a shingle string (slice + concat_ws allocation) and
    hashing it per position. A/B at sf0.1: 1.5 s -> 0.24 s for the
    corpus map stage (guide §1.2 "per-task work"). Safe ONLY where
    shingle ids feed equality/distinctness (exact-Jaccard ladder):
    ids are a different 64-bit space than _doc_shingle_hashes', so
    anything whose OUTPUT depends on id values (MinHash signatures)
    must not switch. Collision story unchanged: one xxhash64 output
    per distinct shingle, ~s^2/2^65 within-doc.

    r14 opt — combine via nested zip_with over SHIFTED SLICES, not a
    transform-over-positions lambda indexing into th: when a consumer
    EXPLODES shs, the Project+Generate rewrite inlines the th
    expression into the position lambda's three index sites, and
    because higher-order-function lambdas are interpreted (no
    codegen subexpression elimination) the token-hash array was
    re-evaluated PER POSITION — O(tokens x shingles) per doc. Hidden
    in the collapsed-rep jaccard path (few reps), quadratic-visible on
    the raw corpus (dedup_ngram_novelty: the explode stage alone was
    5.1 s at sf0.1; this form is 0.5 s — 10x). In the zip_with form th
    is referenced only OUTSIDE lambdas, so worst-case inlining
    re-evaluates it a constant number of times per ROW. Identical id
    VALUES: the combine is still xxhash64(th[i], th[i+1], th[i+2]).
    Slice lengths clamp at 0 (the get()-era totality rule: Catalyst
    may push a downstream predicate embedding this expression BELOW
    the size filter, where a negative slice length throws on
    sub-shingle docs — caught by test_dedup_edge_corpora; empty
    slices make the whole expression total)."""
    toks = F.split("text", " ")
    n2 = lambda c: F.greatest(F.size(c) - 2, F.lit(0))  # noqa: E731
    combined = F.zip_with(
        F.zip_with(
            F.slice(F.col("th"), 1, n2("th")),
            F.slice(F.col("th"), 2, n2("th")),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
        F.slice(F.col("th"), 3, n2("th")),
        lambda s, c: F.xxhash64(s["a"], s["b"], c),
    )
    return (
        d.filter(F.size(toks) >= 3)
        .select("doc_id", F.transform(toks, lambda t: F.xxhash64(t)).alias("th"))
        .select(
            "doc_id",
            F.array_distinct(combined).alias("shs"),
        )
    )


@register("dedup_minhash_lsh", oracle=None)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, fully deterministic: per-doc MinHash
    signature (min of xxhash64(shingle, i) per hash row — plain column
    arithmetic, no fitted vocabulary, so there is nothing to broadcast
    or fit at 100 TB), banded into MINHASH_B keys; docs sharing a band
    key become candidates (equi-join on band key, never all pairs);
    candidates are verified EXACTLY by intersecting their shingle-hash
    sets. Output = exact-jaccard pairs restricted to MinHash
    candidates, so results are stable across sessions/partitionings —
    the property dedup_recall_minhash contracts. The pyspark.ml
    MinHashLSH route was rejected: CountVectorizer's frequency-tied
    vocabulary order is partition-dependent, which makes candidates
    nondeterministic.

    Like the exact path, exact-duplicate texts collapse to one
    representative before signatures (one sig per distinct text, so a
    mass-duplicated document can't flood a band's posting list past
    MAX_DF and blind the search to its own near-dups); verified rep
    pairs fan back out to doc pairs, with within-cluster pairs at
    jaccard 1.0."""
    clusters = _exact_clusters(spark, sf_dir)
    d = clusters.select(F.col("rep_id").alias("doc_id"), "text")
    docs = _doc_shingle_hashes(d).withColumn("n", F.size("shs"))
    sig = [
        F.array_min(F.transform("shs", lambda s: F.xxhash64(s, F.lit(i)))).alias(f"mh{i}")
        for i in range(MINHASH_H)
    ]
    banded = docs.select("doc_id", "n", "shs", *sig).select(
        "doc_id",
        "n",
        "shs",
        F.explode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[F.col(f"mh{b * MINHASH_R + r}") for r in range(MINHASH_R)],
                    ).alias("k")
                    for b in range(MINHASH_B)
                ]
            )
        ).alias("band_key"),
    )
    # candidate pairs from band-key posting lists (same shape as the
    # exact path's inverted index, incl. the df cap against degenerate
    # bands — e.g. many empty-ish docs sharing one signature)
    postings = banded.groupBy("band_key").agg(
        F.collect_list(F.struct("doc_id", "n", "shs")).alias("docs")
    )
    pair = F.explode(
        F.filter(
            F.flatten(
                F.transform(
                    F.col("docs"),
                    lambda x: F.transform(
                        F.col("docs"), lambda y: F.struct(x.alias("a"), y.alias("b"))
                    ),
                )
            ),
            lambda p: p["a"]["doc_id"] < p["b"]["doc_id"],
        )
    )
    cand = (
        # same slice-not-drop rule as the exact path's inverted index
        postings.filter(F.size("docs") >= 2)
        .withColumn("docs", F.slice(F.sort_array("docs"), 1, MAX_DF))
        .select(pair.alias("p"))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.col("p.a.n").alias("na"),
            F.col("p.b.n").alias("nb"),
            F.col("p.a.shs").alias("sa"),
            F.col("p.b.shs").alias("sb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # exact verification on candidates only
    c = F.size(F.array_intersect("sa", "sb"))
    jac = c * 1.0 / (F.col("na") + F.col("nb") - c)
    rep_pairs = cand.filter(jac >= JACCARD_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )
    return _fan_out_pairs(rep_pairs, clusters, "jaccard")


@register(
    "dedup_recall_minhash",
    oracle=f"""
    WITH {_ORACLE_CLUSTER_CTE},
    repscore AS (
      SELECT doc_a, doc_b
      FROM inter i
      JOIN counts na ON na.doc_id = i.doc_a
      JOIN counts nb ON nb.doc_id = i.doc_b
      WHERE i.c * 1.0 / (na.n + nb.n - i.c) >= 0.7
    )
    SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
           greatest(ma.doc_id, mb.doc_id) AS doc_b,
           true AS found
    FROM repscore r
    JOIN mem ma ON ma.rep_id = r.doc_a
    JOIN mem mb ON mb.rep_id = r.doc_b
    UNION ALL
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, true AS found
    FROM mem a
    JOIN mem b ON a.rep_id = b.rep_id AND a.doc_id < b.doc_id
    JOIN toks t ON t.doc_id = a.rep_id
    WHERE len(t.t) >= 3
    """,
)
def dedup_recall_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall contract for the MinHash rung: every exact pair with
    jaccard ≥ 0.7 (well above the banding threshold, candidate
    probability 1-(1-0.7^R)^B ≈ 0.9997) must appear among the MinHash
    pairs. The oracle recomputes the exact ≥0.7 pair set in SQL and
    expects found = true for each — a red row means the banding no
    longer catches high-similarity pairs."""
    exact = dedup_ngram_jaccard(spark, sf_dir).filter(F.col("jaccard") >= 0.7)
    mh = dedup_minhash_lsh(spark, sf_dir).withColumnRenamed("jaccard", "mh_jaccard")
    return (
        exact.select("doc_a", "doc_b")
        .join(mh, ["doc_a", "doc_b"], "left")
        .select("doc_a", "doc_b", F.col("mh_jaccard").isNotNull().alias("found"))
    )


# Fixture-calibrated: the synthetic embeddings are spread (max pairwise
# cosine ~0.5), so 0.40 marks the high-similarity tail — 5/5/86 pairs at
# sf0.001/0.01/0.1. The r07-era 0.95 literal (production's usual bar on
# real embeddings) was fixture-DEGENERATE: no corpus in the fixture
# family could ever produce a row, so its green driver rows attested
# nothing. Plan is threshold-independent.
EMB_COSINE_THRESHOLD = 0.40


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6)
          >= {EMB_COSINE_THRESHOLD}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup, blocked by label: pairs only form inside
    a block (label = cluster id), turning O(n²) into Σ O(b²) — the blocked
    exact-verification stage that follows any ANN candidate pass."""
    e = load_table(spark, sf_dir, "embeddings")
    withn = e.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    )
    a = withn.alias("a")
    b = withn.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.norm") * F.col("b.norm"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .filter(F.round(cos, 6) >= EMB_COSINE_THRESHOLD)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )


CONTAINMENT_THRESHOLD = 0.8


@register(
    "dedup_ngram_containment",
    oracle=f"""
    WITH {_ORACLE_CLUSTER_CTE}
    {_oracle_fan_out("i.c * 1.0 / least(na.n, nb.n)", "containment", CONTAINMENT_THRESHOLD)}
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram CONTAINMENT pairs: |A∩B| / min(|A|,|B|) — catches a short
    doc embedded in a long one, which symmetric Jaccard dilutes below
    threshold (the quote/boilerplate/excerpt case every training corpus
    has). Identical single-shuffle inverted-index plan as
    dedup_ngram_jaccard — only the final scoring expression differs, so
    the df cap, pair-generation bounds, and exact-cluster fan-out carry
    over unchanged."""
    inter, clusters = _ngram_pair_counts(spark, sf_dir)
    cont = F.col("c") * 1.0 / F.least("na", "nb")
    rep_pairs = inter.filter(cont >= CONTAINMENT_THRESHOLD).select(
        "doc_a", "doc_b", F.round(cont, 6).alias("containment")
    )
    return _fan_out_pairs(rep_pairs, clusters, "containment")


SPAN_LEN = 8  # tokens per duplicate-span window


@register(
    "dedup_span_fraction",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    win AS (
      SELECT doc_id, i,
             array_to_string(list_slice(t, i, i + {SPAN_LEN} - 1), ' ') AS w
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {SPAN_LEN} + 2)) AS i) u
      WHERE len(t) >= {SPAN_LEN}
    ),
    df AS (SELECT w, count(DISTINCT doc_id) AS ndocs FROM win GROUP BY w),
    flag AS (
      SELECT win.doc_id, win.i, (df.ndocs > 1) AS dup
      FROM win JOIN df USING (w)
    )
    SELECT doc_id,
           count(*) AS n_windows,
           count(*) FILTER (WHERE dup) AS n_dup_windows,
           round(count(*) FILTER (WHERE dup) * 1.0 / count(*), 6) AS dup_fraction
    FROM flag
    GROUP BY doc_id
    """,
)
def dedup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication coverage (the metric behind
    suffix-array training-data dedup, Lee et al. 2022, computed at
    token-window granularity): for every doc, the fraction of its
    SPAN_LEN-token sliding windows that also occur verbatim in at least
    one OTHER doc. Corpus-wide exact-substring dedup policies trim or
    drop docs above a dup_fraction threshold.

    Plan: explode per-doc windows keyed by xxhash64 of the window text
    (windows shuffle as 8-byte longs), aggregate distinct-doc counts per
    window hash, then roll the dup flag back up per doc. Two shuffles
    (window hash, doc_id), both map-side-combinable; no pair emission at
    all, so — unlike the pairwise Jaccard path — a window shared by a
    million docs costs one counter, not O(df²) pairs, and no df cap is
    needed. At 100 TB the window-hash agg is the big exchange; partial
    aggregation keeps it at one (hash, count) record per distinct window
    per map task. The exploded window relation is persisted — the df
    aggregate and the roll-up join both consume it, and uncached each
    would re-run the scan + shingle-hash explode (16-byte rows cache
    far cheaper than the explode recomputes)."""

    d = spread(load_table(spark, sf_dir, "documents"), spark)
    toks = F.split("text", " ")
    win = (
        d.filter(F.size(toks) >= SPAN_LEN)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - SPAN_LEN),
                    lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, SPAN_LEN))),
                )
            ).alias("w"),
        )
        .transform(pin_cache)
    )
    df = win.groupBy("w").agg(F.count_distinct("doc_id").alias("ndocs"))
    return (
        win.join(df, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count_if(F.col("ndocs") > 1).alias("n_dup_windows"),
            F.round(F.count_if(F.col("ndocs") > 1) / F.count("*"), 6).alias("dup_fraction"),
        )
    )


@register(
    "dedup_span_removal",
    bench=True,
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    win AS (
      SELECT doc_id, i,
             array_to_string(list_slice(t, i, i + {SPAN_LEN} - 1), ' ') AS w
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {SPAN_LEN} + 2)) AS i) u
      WHERE len(t) >= {SPAN_LEN}
    ),
    dupw AS (SELECT w FROM win GROUP BY w HAVING count(DISTINCT doc_id) > 1),
    cov AS (
      SELECT DISTINCT win.doc_id, i + off AS pos
      FROM win JOIN dupw USING (w),
           LATERAL (SELECT unnest(range(0, {SPAN_LEN})) AS off) o
    ),
    tokpos AS (
      SELECT doc_id, p AS pos, t[p] AS tok
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS p) q
    ),
    kept AS (
      SELECT tp.doc_id, tp.pos, tp.tok
      FROM tokpos tp ANTI JOIN cov ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos
    )
    SELECT d.doc_id,
           CAST(len(d.t) AS BIGINT) AS n_tokens,
           CAST(coalesce(c.nrem, 0) AS BIGINT) AS n_removed,
           coalesce(k.text_kept, '') AS text_kept
    FROM toks d
    LEFT JOIN (SELECT doc_id, count(*) AS nrem FROM cov GROUP BY doc_id) c USING (doc_id)
    LEFT JOIN (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_kept
               FROM kept GROUP BY doc_id) k USING (doc_id)
    """,
)
def dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVE step of exact-substring dedup (Lee et al. 2022):
    where dedup_span_fraction meters how much of a doc is duplicated,
    this emits the scrubbed corpus — every token covered by at least
    one SPAN_LEN-token window that also occurs verbatim in another doc
    is cut, and the survivors rejoin in original order. This is the
    transformation training pipelines actually apply (drop the
    boilerplate/quote spans, keep the fresh text around them), so it
    belongs next to the metric.

    Plan — linear, never pairwise, and never per-token-quadratic: the
    persisted window relation (a 16-byte double-xxhash64 composite of
    the window text — span_fraction's metric path keeps the single
    8-byte key) aggregates to the duplicated-window set, dup
    windows explode to their SPAN_LEN covered positions and distinct
    down to a (doc_id, pos) coverage set, and the rebuild is a
    LEFT ANTI join of the posexploded tokens against that set followed
    by one doc_id groupBy that sorts (pos, tok) structs back into
    text. Every exchange is key-bounded (window hash, (doc_id, pos),
    doc_id) with map-side partial aggregation; a window shared by a
    million docs costs one counter and each doc's own positions, not
    O(df²) pairs. A two-sided HOF membership probe (exists over a
    per-doc starts array) would have been O(n·k) per doc — the
    anti-join shape keeps fully-duplicated documents linear."""

    d = spread(load_table(spark, sf_dir, "documents"), spark)
    docs = d.select(
        "doc_id", F.split("text", " ").alias("t")
    ).transform(pin_cache)
    win = (
        docs.filter(F.size("t") >= SPAN_LEN)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - SPAN_LEN),
                    lambda i: F.struct(
                        i.alias("i"),
                        # 128-bit composite window key: two independently
                        # salted xxhash64s. span_fraction (a metric) rides
                        # a single 64-bit key, but THIS operator mutates
                        # the corpus — a collision would scrub
                        # non-duplicate text — so the key is widened until
                        # the birthday bound (~n²/2¹²⁹) is negligible at
                        # any corpus size.
                        F.struct(
                            F.xxhash64(
                                F.concat_ws(" ", F.slice("t", i + 1, SPAN_LEN))
                            ).alias("h1"),
                            F.xxhash64(
                                F.concat_ws(" ", F.slice("t", i + 1, SPAN_LEN)),
                                F.lit(1),
                            ).alias("h2"),
                        ).alias("w"),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.i", "p.w")
        .transform(pin_cache)
    )
    dupw = (
        win.groupBy("w")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .where(F.col("ndocs") > 1)
        .select("w")
    )
    cov = (
        win.join(dupw, "w")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + SPAN_LEN - 1)).alias("pos"),
        )
        .distinct()
        .transform(pin_cache)
    )
    covn = cov.groupBy("doc_id").agg(F.count("*").alias("n_removed"))
    tokpos = docs.select("doc_id", F.posexplode("t").alias("pos", "tok"))
    kept_text = (
        tokpos.join(cov, ["doc_id", "pos"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
            ).alias("text_kept")
        )
    )
    return (
        docs.select("doc_id", F.size("t").cast("bigint").alias("n_tokens"))
        .join(covn, "doc_id", "left")
        .join(kept_text, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias("n_removed"),
            F.coalesce("text_kept", F.lit("")).alias("text_kept"),
        )
    )


@register(
    "dedup_incremental_probe",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) u
      WHERE len(t) >= 3
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    cidx AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle,
               row_number() OVER (PARTITION BY shingle ORDER BY doc_id) AS rn
        FROM sh WHERE doc_id % 10 <> 0
      ) WHERE rn <= {MAX_DF}
    ),
    probe AS (
      SELECT i.doc_id AS new_id, c.doc_id AS corpus_id, count(*) AS c
      FROM sh i JOIN cidx c ON i.shingle = c.shingle
      WHERE i.doc_id % 10 = 0
      GROUP BY 1, 2
    )
    SELECT p.new_id AS doc_id, p.corpus_id AS dup_of,
           round(p.c * 1.0 / (ni.n + nc.n - p.c), 6) AS jaccard
    FROM probe p
    JOIN counts ni ON ni.doc_id = p.new_id
    JOIN counts nc ON nc.doc_id = p.corpus_id
    WHERE p.c * 1.0 / (ni.n + nc.n - p.c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the workflow that actually runs at 100 TB:
    nobody re-clusters the archived corpus per ingest batch; the NEW
    batch probes a prebuilt shingle index and only near-dups OF THE
    CORPUS come back. Here the fixture splits deterministically
    (doc_id % 10 == 0 → incoming, rest → corpus); production persists
    the index bucketed by shingle hash, so the probe shuffles ONLY the
    incoming batch — corpus-side data never moves again.

    Same primitives as dedup_ngram_jaccard: distinct word-3-shingles,
    xxhash64 join keys, corpus postings sliced to the MAX_DF lowest
    doc_ids (bounded blow-up per boilerplate shingle; the oracle
    applies the identical slice). Asymmetric by construction —
    incoming×incoming pairs are out of scope (they are next batch's
    corpus). Compose with _exact_clusters upstream when the corpus
    carries mass exact-duplicates."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    shingles = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
    )
    sh = (
        d.filter(F.size(toks) >= 3)
        .select("doc_id", F.array_distinct(shingles).alias("shs"))
        .select(
            "doc_id",
            F.size("shs").alias("n"),
            F.explode(F.transform("shs", lambda s: F.xxhash64(s))).alias("sh"),
        )
    )
    incoming = F.col("doc_id") % 10 == 0
    index = (
        sh.filter(~incoming)
        .groupBy("sh")
        .agg(F.collect_list(F.struct("doc_id", "n")).alias("docs"))
        .withColumn("docs", F.slice(F.sort_array("docs"), 1, MAX_DF))
    )
    hits = (
        sh.filter(incoming)
        .withColumnsRenamed({"doc_id": "new_id", "n": "ni"})
        .join(index, "sh")
        .select("new_id", "ni", F.explode("docs").alias("cdoc"))
        .groupBy(
            "new_id",
            "ni",
            F.col("cdoc.doc_id").alias("dup_of"),
            F.col("cdoc.n").alias("nc"),
        )
        .agg(F.count("*").alias("c"))
    )
    jac = F.col("c") * 1.0 / (F.col("ni") + F.col("nc") - F.col("c"))
    return hits.filter(jac >= JACCARD_THRESHOLD).select(
        F.col("new_id").alias("doc_id"),
        "dup_of",
        F.round(jac, 6).alias("jaccard"),
    )


ER_WINDOW = 3  # sorted-neighborhood width: compare each record with the next 3
ER_MAX_DIST = 3  # levenshtein match threshold


@register(
    "er_sorted_neighborhood",
    oracle=f"""
    WITH recs AS (
      SELECT p_partkey, p_name,
             string_split(p_name, ' ')[1] AS blk,
             row_number() OVER (PARTITION BY string_split(p_name, ' ')[1]
                                ORDER BY p_name, p_partkey) AS rn
      FROM part
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM recs a
    JOIN recs b
      ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + {ER_WINDOW}
    WHERE levenshtein(a.p_name, b.p_name) <= {ER_MAX_DIST}
    """,
)
def er_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution on structured records (parts): blocking +
    sorted neighborhood + edit-distance matching — the classic record-
    linkage pipeline, here resolving near-identical part names.

    Blocking key = first name token; within each block records sort by
    (name, key) and each record compares ONLY against its next
    ER_WINDOW neighbors, so candidate pairs are O(W·n) — never the
    O(n²/|blocks|) of compare-everything-in-the-block, and never a
    single-partition global sort: the window AND the self-join are both
    partitioned by the block key, so every stage parallelizes. The
    deliberate recall trade (cross-block true matches are missed) is
    the textbook one; production runs multiple passes with different
    blocking keys and unions the pair sets. Match = levenshtein <= 3,
    exact integer on both engines."""
    from pyspark.sql import Window as W

    p = load_table(spark, sf_dir, "part")
    blk = F.split("p_name", " ")[0]
    # persisted: both legs of the neighbor self-join consume the same
    # windowed relation — uncached, Spark would scan + sort twice
    recs = p.select(
        "p_partkey",
        "p_name",
        blk.alias("blk"),
        F.row_number()
        .over(W.partitionBy(blk).orderBy("p_name", "p_partkey"))
        .alias("rn"),
    ).transform(pin_cache)
    # Neighbor offset as an EQUI-join key (r13 opt round): the former
    # range-condition join (rn_b in (rn_a, rn_a + W]) hash-joined on blk
    # alone — the part fixture has only 8 distinct first tokens, so the
    # residual condition evaluated on ~n²/2 per-block row pairs, and
    # Catalyst had folded the levenshtein filter INTO that residual:
    # ~25M edit-distance evaluations at sf0.1 (the 15 s was all there).
    # Exploding each left record into its W target ranks turns the join
    # into exact (blk, rn) hash lookups — W·n candidate rows — and the
    # edit distance runs only on those. Identical pairs: for a pair at
    # rank gap g in (0, W], exactly k = g matches (measured 14.0 ->
    # 1.0 s best; plans/r13/er_sorted_neighborhood_*.txt).
    a = recs.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "blk",
        F.col("rn").alias("rn_a"),
        F.explode(F.sequence(F.lit(1), F.lit(ER_WINDOW))).alias("k"),
    ).withColumn("rn_t", F.col("rn_a") + F.col("k"))
    b = recs.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("blk").alias("blk_b"),
        F.col("rn").alias("rn_b"),
    )
    return (
        a.join(
            b,
            (F.col("blk") == F.col("blk_b")) & (F.col("rn_t") == F.col("rn_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .where(F.col("dist") <= ER_MAX_DIST)
        .select("key_a", "key_b", "name_a", "name_b", "dist")
    )


# Fellegi-Sunter (1969) probabilistic record linkage over the SAME
# sorted-neighborhood candidates as er_sorted_neighborhood — the
# principled replacement for the ad-hoc edit-distance rule: each field
# contributes a likelihood ratio, m/u on agreement and (1-m)/(1-u) on
# disagreement, with m fixed at 9/10 (the standard prior for "true
# matches agree unless dirty") and u ESTIMATED FROM THE DATA as the
# random-agreement probability sum(c_v^2)/n^2 (value-frequency u —
# Winkler's refinement). Everything stays rational arithmetic over
# BIGINT counts: NO log-weights, so no libm call can diverge between
# engines; the product of ratios ranks identically to the log-score.
FS_M = 0.9  # P(field agrees | true match)
FS_MISS = 0.1  # 1 - FS_M, spelled as its OWN literal: both engines
# parse "0.1" to the same IEEE double, while Python's 1 - 0.9 is the
# DIFFERENT double 0.09999999999999998 (FP ladder: share literals,
# never re-derive them)
FS_MATCH_THRESHOLD = 10.0  # likelihood-ratio cut (fixture: splits
# the 73 multi-field-agreement pairs from the 5.9k chance candidates)
_FS_FIELDS = ("p_brand", "p_type", "p_size")


def _fs_oracle() -> str:
    ustats = ",\n    ".join(
        f"u_{f} AS (SELECT CAST(sum(c*c) AS BIGINT) AS num"
        f" FROM (SELECT count(*) AS c FROM part GROUP BY {f}))"
        for f in _FS_FIELDS
    )
    # CAST the priors to DOUBLE explicitly — DuckDB parses a bare
    # "0.9" as DECIMAL(1,1) and would run the whole ratio in decimal
    # arithmetic while Spark runs doubles
    # the disagreement branch guards n2 > num: for a corpus-constant
    # field num = n2, and though a constant field can never actually
    # disagree (the branch is unreachable then), an unguarded division
    # would hand DuckDB a divide-by-zero and Spark an Infinity — the
    # neutral ratio 1.0 keeps the degenerate edge defined identically
    # in both engines
    ratio = " * ".join(
        f"(CASE WHEN agree_{f} THEN CAST({FS_M} AS DOUBLE) * n.n2 / u_{f}.num"
        f" WHEN n.n2 > u_{f}.num"
        f" THEN CAST({FS_MISS} AS DOUBLE) * n.n2 / (n.n2 - u_{f}.num)"
        f" ELSE CAST(1.0 AS DOUBLE) END)"
        for f in _FS_FIELDS
    )
    agrees = ",\n         ".join(
        f"a.{f} = b.{f} AS agree_{f}" for f in _FS_FIELDS
    )
    return f"""
    WITH recs AS (
      SELECT p_partkey, {", ".join(_FS_FIELDS)},
             string_split(p_name, ' ')[1] AS blk,
             row_number() OVER (PARTITION BY string_split(p_name, ' ')[1]
                                ORDER BY p_name, p_partkey) AS rn
      FROM part
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) * CAST(count(*) AS BIGINT) AS n2
          FROM part),
    {ustats},
    cand AS (
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         {agrees}
      FROM recs a
      JOIN recs b ON a.blk = b.blk AND b.rn > a.rn AND b.rn <= a.rn + {ER_WINDOW}
    )
    SELECT key_a, key_b, {", ".join(f"agree_{f}" for f in _FS_FIELDS)},
           floor(({ratio}) * 1000 + 0.5) / 1000 AS fs_score,
           ({ratio}) >= {FS_MATCH_THRESHOLD} AS is_match
    FROM cand, n, {", ".join(f"u_{f}" for f in _FS_FIELDS)}
    """


@register("er_fellegi_sunter", oracle=_fs_oracle())
def er_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter scoring of the sorted-neighborhood candidate
    pairs (see the block comment above for the model and the
    all-rational-arithmetic determinism argument).

    Scale shape: candidates stay O(W*n) from the block-partitioned
    window; the u-statistics are three corpus aggregates collapsed to
    a ONE-ROW relation that broadcasts onto the pair stream, so
    scoring is a map-side projection — the same
    stats-broadcast-then-project shape as sim_topk_int8. At 100 TB
    the u-stats are sublinear (bounded by field cardinality) and the
    pair relation never exceeds W x corpus."""
    from pyspark.sql import Window as W

    p = load_table(spark, sf_dir, "part")
    blk = F.split("p_name", " ")[0]
    recs = p.select(
        "p_partkey",
        "p_name",
        *_FS_FIELDS,
        blk.alias("blk"),
        F.row_number()
        .over(W.partitionBy(blk).orderBy("p_name", "p_partkey"))
        .alias("rn"),
    ).transform(pin_cache)

    n2 = p.agg(
        (F.count("*").cast("long") * F.count("*").cast("long")).alias("n2")
    )
    stats = n2
    for f in _FS_FIELDS:
        num = (
            p.groupBy(f)
            .agg(F.count("*").alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias(f"num_{f}"))
        )
        stats = stats.crossJoin(num)

    # NOT converted to er_sorted_neighborhood's neighbor-offset
    # equi-join (r13 opt round A/B): this join's residual is only the
    # cheap rank-range comparison (no levenshtein), and the codegen'd
    # blk-hash join over it measured 1.31 s best vs 2.62-3.10 s for the
    # exploded equi-join form — the extra explode + wider build side
    # cost more than the residual saves when the residual is integer
    # compares.
    a = recs.select(
        F.col("p_partkey").alias("key_a"),
        "blk",
        F.col("rn").alias("rn_a"),
        *[F.col(f).alias(f"{f}_a") for f in _FS_FIELDS],
    )
    b = recs.select(
        F.col("p_partkey").alias("key_b"),
        F.col("blk").alias("blk_b"),
        F.col("rn").alias("rn_b"),
        *[F.col(f).alias(f"{f}_b") for f in _FS_FIELDS],
    )
    cand = a.join(
        b,
        (F.col("blk") == F.col("blk_b"))
        & (F.col("rn_b") > F.col("rn_a"))
        & (F.col("rn_b") <= F.col("rn_a") + ER_WINDOW),
    ).crossJoin(F.broadcast(stats))

    score = F.lit(1.0)
    for f in _FS_FIELDS:
        agree = F.col(f"{f}_a") == F.col(f"{f}_b")
        # disagreement guarded on n2 > num — see the oracle's comment:
        # a corpus-constant field (num = n2) cannot disagree, but the
        # unguarded division would still be Infinity; 1.0 is neutral
        r = (
            F.when(agree, F.lit(FS_M) * F.col("n2") / F.col(f"num_{f}"))
            .when(
                F.col("n2") > F.col(f"num_{f}"),
                F.lit(FS_MISS) * F.col("n2") / (F.col("n2") - F.col(f"num_{f}")),
            )
            .otherwise(F.lit(1.0))
        )
        score = score * r

    return cand.select(
        "key_a",
        "key_b",
        *[
            (F.col(f"{f}_a") == F.col(f"{f}_b")).alias(f"agree_{f}")
            for f in _FS_FIELDS
        ],
        (F.floor(score * 1000 + F.lit(0.5)) / 1000).alias("fs_score"),
        (score >= FS_MATCH_THRESHOLD).alias("is_match"),
    )


@register(
    "dedup_ngram_novelty",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) u
      WHERE len(t) >= 3
    ),
    fs AS (
      SELECT doc_id, min(doc_id) OVER (PARTITION BY shingle) AS first_doc
      FROM sh
    )
    SELECT doc_id, count(*) AS n_shingles,
           floor(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                 * 1000000.0 / count(*) + 0.5) / 1000000 AS novel_frac
    FROM fs GROUP BY doc_id
    """,
)
def dedup_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the streaming-corpus memorization /
    crawl-freshness metric: the fraction of a doc's distinct word-3-
    shingles whose FIRST occurrence (minimum doc_id over the corpus) is
    in this document. A verbatim re-crawl scores ~0, fresh text ~1, and
    boilerplate-heavy pages land in between — the per-doc signal
    curation stacks threshold on BEFORE pairwise dedup is worth
    running (cheap: no pair explosion at all, unlike jaccard).

    Plan (r14 opt): per-doc distinct shingle-id arrays via the shared
    _shingle_hash_arr front end (token-hash combine, 8-byte ids — the
    r13 6x map-stage win; ids only feed equality/distinctness here, the
    hash-value-invariant class its docstring defines, and the oracle
    verifies the fractions over strings so a collision would surface
    as a value mismatch), exploded to (doc_id, sh) rows that are
    ALREADY distinct (array_distinct ran per doc), so the global
    distinct() exchange the string form paid is gone outright (guide
    §2.4 "a distinct on data that is already unique"); per-shingle
    first_doc stays the window over the shingle partition, then the
    per-doc fraction (second shuffle, doc_id). Two linear shuffles on
    8-byte keys where there were three carrying ~25-byte strings. (A
    collect_set-per-shingle shape that also folded the window into the
    first aggregation was A/B-REJECTED: 5.6 s vs 2.4 s before — the
    set build + re-explode cost more than the window it saved.) Ratio
    floor-quantizes at 1e6 on the identical IEEE double both sides
    (ladder step 2)."""
    d = load_table(spark, sf_dir, "documents")
    sh = _shingle_hash_arr(d).select("doc_id", F.explode("shs").alias("sh"))
    first = Window.partitionBy("sh")
    fs = sh.select("doc_id", F.min("doc_id").over(first).alias("first_doc"))
    return fs.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        (
            F.floor(
                F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
                * 1000000.0
                / F.count("*")
                + F.lit(0.5)
            )
            / 1000000
        ).alias("novel_frac"),
    )


@register(
    "dedup_cross_source_overlap",
    oracle="""
    WITH hs AS (
      SELECT DISTINCT source,
             md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' ')) AS h
      FROM documents
    ),
    counts AS (
      SELECT source, count(*) AS n FROM hs GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_shared,
           CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
           floor(n_shared * 1000000.0 / least(ca.n, cb.n) + 0.5) / 1000000
             AS overlap_coeff
    FROM pairs
    JOIN counts ca ON ca.source = pairs.src_a
    JOIN counts cb ON cb.source = pairs.src_b
    """,
)
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate overlap matrix — the census a corpus
    curator runs before mixing sources ("how much of source B is
    already inside source A"): for every source pair, the number of
    distinct shared content fingerprints, plus the overlap coefficient
    n_shared / min(|A|, |B|). The fingerprint is the SORTED DISTINCT
    TOKEN SET (bag-of-words identity) — order- and repetition-
    insensitive, so it catches the shuffled/reflowed duplicates exact
    text hashing misses while staying a single 16-byte key per doc
    (contrast dedup_ngram_jaccard, which scores partial overlap but
    pays for shingle-level candidate generation).

    Plan: ONE corpus shuffle builds the distinct (source, hash)
    relation; pairs come from grouping BY HASH and expanding each
    hash's sorted source-set into its combinations (bounded by the
    source cardinality squared per hash — never a corpus self-join,
    which is how the oracle spells it but would shuffle the corpus
    twice and explode on a hot hash). Per-source totals are a
    |sources|-row broadcast. md5 keys here so the oracle can replay
    membership; at 100 TB swap to xxhash64 (8-byte shuffle key, same
    shape as dedup_exact). The coefficient floor-quantizes at 1e6
    from an exact integer pair."""

    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(F.split("text", " ")))))
    hs = (
        d.select("source", fp.alias("h"))
        .distinct()
        .transform(pin_cache)
    )
    src_counts = hs.groupBy("source").agg(F.count("*").alias("n"))
    sets = (
        hs.groupBy("h")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") >= 2)
    )
    pair_col = F.flatten(
        F.transform(
            "ss",
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size("ss")),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(pair_col).alias("p"))
        .groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    ca = src_counts.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    cb = src_counts.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ca), "src_a")
        .join(F.broadcast(cb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.floor(
                    F.col("n_shared") * 1000000.0 / F.least("n_a", "n_b")
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("overlap_coeff"),
        )
    )


# SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
# embedding space, then search for near-duplicates ONLY within each
# cluster — the published recipe that made embedding-level dedup
# tractable for LAION/LLM-scale corpora. Cell count scales with the
# corpus so per-cell membership stays bounded; the pairwise stage is
# Σ O(m_i²), never O(n²). Seeds follow the ml_kmeans_assign convention
# (deterministic: vec_id < cells). The fixture embeddings are
# spread (max pairwise cosine ~0.5), so the threshold is calibrated to
# the corpus; production uses ~0.95+ on real embeddings — the plan is
# identical, only the literal changes.
SEMDEDUP_TAU = 0.40

# Corpus-adaptive cell count ~ sqrt(n): assignment costs n*k and the
# within-cell pairwise stage costs ~n²/k, so k = sqrt(n) balances them
# at 2*n^1.5 total — the reason SemDeDup stays tractable while growing.
# The rule is a PURE-INTEGER power-of-4 threshold ladder (cells = 2^k
# for n in [4^k, 4^(k+1))), inlined as literals in BOTH engines — never
# log()/sqrt() at query time, whose FP behavior at exact boundaries is
# engine-specific (the fixed-lookup-table convention). Ladder capped at
# 2^20 cells (n ~ 1.1e12 vectors) — raise the range if corpora outgrow it.
_SEMDEDUP_LADDER = [(4**k, 2**k) for k in range(20, 3, -1)]
_SEMDEDUP_CELLS_SQL = (
    "CASE "
    + " ".join(f"WHEN n >= {t} THEN {c}" for t, c in _SEMDEDUP_LADDER)
    + " ELSE 8 END"
)


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    k AS (
      SELECT {_SEMDEDUP_CELLS_SQL} AS cells
      FROM (SELECT count(*) AS n FROM corpus)
    ),
    seeds AS (
      SELECT vec_id AS cell, v AS cv FROM corpus, k WHERE vec_id < k.cells
    ),
    scored AS (
      SELECT c.vec_id, s.cell,
             round(list_cosine_similarity(c.v, s.cv), 6) AS cos_sim
      FROM corpus c CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, cell) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    members AS (
      SELECT b.cell, c.vec_id, c.v FROM best b JOIN corpus c USING (vec_id)
    ),
    removed AS (
      SELECT DISTINCT a.vec_id
      FROM members a JOIN members b
        ON a.cell = b.cell AND b.vec_id < a.vec_id
      WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {SEMDEDUP_TAU}
    )
    SELECT m.cell, m.vec_id, r.vec_id IS NULL AS is_kept
    FROM members m LEFT JOIN removed r ON m.vec_id = r.vec_id
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: assign every vector to its nearest seed centroid
    (broadcast k×dim join, one corpus scan, then a map-side-combined
    max_by argmax so only n rows — never the n×k expansion — cross the
    exchange; the ml_kmeans_assign plan), then within each cell mark a
    vector REMOVED
    if an earlier member (smaller vec_id, the deterministic canonical)
    sits above the cosine threshold. The self-join equi-keys on the
    cell id, so pairs only materialize inside hash groups — the same
    bounded-block shape as dedup_embedding_cosine, with the blocks
    LEARNED from geometry instead of requiring a label column. At
    100 TB: the cell count follows the integer sqrt-ladder (k ~ sqrt(n)
    balances the n*k assignment against the n²/k pairwise stage, and
    the k x dim seed relation stays broadcastable through 2^20 cells —
    broadcast-growth citation: seeds is k*dim ~ sqrt(n)*dim doubles,
    one power-of-4 ladder step per 4x corpus, i.e. ~0.5 GB at 2^20
    cells x 64 dims vs the 8 GB ceiling; measured curve
    artifacts/SCALE_CURVE_r08_semdedup.json, 5.0/18.1/413 s at
    1x/10x/100x with the ladder stepping twice),
    the corpus shuffles ONCE on the cell key, and the within-cell pair
    expansion is capacity-planned by the cell-size histogram
    (sim_ivf_index_stats is exactly that report). Cosine rounds at 1e-6
    on both sides before every comparison (FP ladder rung 1).

    Scale honesty: EXACT SemDeDup is Θ(n^1.5) total work by
    construction (both balanced stages grow as n·sqrt(n)); the measured
    10x->100x scale-curve leg is 22.9x, under the theoretical 31.6x
    (artifacts/SCALE_CURVE_r08_semdedup.json) and embarrassingly
    parallel — the work spreads evenly over cells, so wall-clock rides
    executor count. When n^1.5 total work is too much, the published
    remedy is approximate assignment + per-cell shortlists — exactly
    the sim_topk_ivf machinery in this repo — which trades the
    byte-exact oracle for a recall contract."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    )
    k = corpus.agg(F.count("*").alias("n")).select(
        F.expr(_SEMDEDUP_CELLS_SQL).alias("cells")
    )
    seeds = (
        corpus.crossJoin(F.broadcast(k))
        .filter(F.col("vec_id") < F.col("cells"))
        .select(
            F.col("vec_id").alias("cell"),
            F.col("v").alias("cv"),
            F.col("norm").alias("cnorm"),
        )
    )
    dot_seed = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    # Nearest-cell argmax as a max_by AGGREGATE, not a row_number
    # window: the n x k scored expansion partial-aggregates MAP-SIDE to
    # one candidate struct per vec_id per partition, so only n rows
    # cross the exchange instead of all n x k (k ~ sqrt(n): ~1400x less
    # exchange volume at the 100x curve point). The ordering struct
    # (cos_sim, -cell) reproduces the window's ORDER BY cos_sim DESC,
    # cell ASC exactly — struct comparison is lexicographic and the
    # key is unique per (vec_id, cell), so the argmax is deterministic.
    members = (
        corpus.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id", "v", "norm", "cell",
            F.round(dot_seed / (F.col("norm") * F.col("cnorm")), 6).alias("cos_sim"),
        )
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct("cell", "v", "norm"),
                F.struct(F.col("cos_sim").alias("s"), (-F.col("cell")).alias("nc")),
            ).alias("best")
        )
        .select(
            F.col("best.cell").alias("cell"),
            "vec_id",
            F.col("best.v").alias("v"),
            F.col("best.norm").alias("norm"),
        )
    )
    a, b = members.alias("a"), members.alias("b")
    dot_pair = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    removed = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(
            F.round(dot_pair / (F.col("a.norm") * F.col("b.norm")), 6)
            >= SEMDEDUP_TAU
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
    )
    return members.join(removed.withColumn("hit", F.lit(1)), "vec_id", "left").select(
        "cell", "vec_id", F.col("hit").isNull().alias("is_kept")
    )


# Prefix-filtered exact set-similarity self-join (SSJoin/PPJoin family:
# Chaudhuri et al. 2006, Xiao et al. 2008) — the third candidate-
# generation algorithm in the dedup ladder next to the MAX_DF inverted
# index and MinHash-LSH, and the only one of the three that is BOTH
# exact AND cap-free: order each document's distinct shingles by
# (global df ASC, hash) and index only the first
# s - ceil(t*s) + 1 of them; any pair with Jaccard >= t MUST share a
# prefix element (pigeonhole on the s - ceil(t*s) non-shared budget),
# so completeness is algorithmic, not a tuning assumption. Rare-first
# ordering makes prefix postings the SHORTEST lists, which is what
# bounds candidate pairs at scale. The output (all pairs with
# J >= PF_THRESHOLD over distinct-shingle sets) is invariant to the
# ordering, so the oracle verifies with the naive pairwise join.
#
# COLLISION ASSUMPTION (the one caveat on "exact"): set sizes and
# intersections are computed over xxhash64 shingle hashes, the oracle
# over the shingle strings themselves. "Exact" therefore means exact
# up to 64-bit hash collisions: a within-doc collision shrinks s by 1
# (P ~ s^2/2^65, ~3e-14 for a 1000-shingle doc), a cross-doc collision
# inflates one candidate pair's intersection by at most 1. At 100 TB
# (~2^40 distinct shingles) a handful of global collisions exist, each
# perturbing a single pair's Jaccard by ~1/s — far below any sane
# threshold margin; any collision at fixture scale would surface as an
# oracle hash-mismatch, which is exactly the monitoring this needs.
# Shingling on the raw strings would make the guarantee absolute at
# the cost of shuffling ~30-byte keys instead of 8-byte hashes through
# both corpus-scale exchanges — the wrong trade at scale.
PF_THRESHOLD = 0.5


@register(
    "dedup_jaccard_prefix_filter",
    oracle=f"""
    WITH toksp AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    shp AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toksp, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) u
      WHERE len(t) >= 3
    ),
    countsp AS (SELECT doc_id, count(*) AS n FROM shp GROUP BY doc_id),
    interp AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM shp a JOIN shp b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           round(i.c * 1.0 / (na.n + nb.n - i.c), 6) AS jaccard
    FROM interp i
    JOIN countsp na ON na.doc_id = i.doc_a
    JOIN countsp nb ON nb.doc_id = i.doc_b
    WHERE i.c * 1.0 / (na.n + nb.n - i.c) >= {PF_THRESHOLD}
    """,
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard self-join via prefix filtering (see the block
    comment above). Stages and their scale bounds:
      1. distinct shingle hashes per doc (map-side HOF build);
      2. global df — one shuffle on the 8-byte shingle hash;
      3. per-doc rare-first rank (window keyed by doc, shuffle 2);
      4. PREFIX postings only (s - ceil(t*s) + 1 per doc) self-join —
         candidates bounded by the rarest shingles' df, plus the
         length prune t*s_a <= s_b (a J >= t pair cannot differ in
         size by more than t);
      5. exact verification joins restricted to candidate pairs.
    The corpus-sized relations only ever shuffle on shingle-hash or
    doc_id keys; no all-pairs stage exists anywhere. Candidate
    completeness is the prefix pigeonhole, so unlike the MAX_DF index
    there is NO recall cap to calibrate."""
    d = load_table(spark, sf_dir, "documents")
    # Pin the per-doc ARRAY relation, not the exploded occurrence
    # relation: same shingle-hash payload, one cached row per DOC
    # instead of one per occurrence. Profiled at sf0.1: the old
    # occurrence-level pin was 3.1-4.0 s of the operator's 5.6-7.8 s —
    # the cache write itself dominated (guide §5: caching competes with
    # execution; cache the narrowest reusable form). The explode below
    # is a map over the cache, recomputed per consumer for free.
    sh = _shingle_hash_arr(d).transform(pin_cache)
    ex = sh.select("doc_id", F.explode("shs").alias("h"))
    dfreq = ex.groupBy("h").agg(F.count("*").alias("dfc"))

    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("dfc").asc(), F.col("h").asc())
    )
    # s = |distinct shingle set| = exact row count of ex per doc (shs is
    # array_distinct'd before the explode), computed as a COUNT WINDOW
    # over the SAME doc_id partitioning the rank window establishes — it
    # rides the existing exchange+sort for free. The earlier form joined
    # a separate size relation whose lineage re-ran the whole shingle
    # pipeline (split/slice/hash/distinct) over a second corpus scan
    # just to produce size(shs) (guide §2.4: two ops keyed the same way
    # share one exchange; plans/r13/dedup_jaccard_prefix_filter_*.txt).
    prefix_len = (F.col("s") - F.ceil(F.lit(PF_THRESHOLD) * F.col("s")) + 1)
    # pinned: prefix feeds BOTH sides of the candidate self-join, and
    # its lineage (df-join + per-doc rank window, two corpus-scale
    # exchanges) would otherwise execute twice (the connected_components
    # rule, same as ex above)
    prefix = (
        ex.join(dfreq, "h")
        .withColumn("rn", rn)
        .withColumn("s", F.count("*").over(W.partitionBy("doc_id")))
        .filter(F.col("rn") <= prefix_len)
        .select("doc_id", "h", "s", "rn")
        .transform(pin_cache)
    )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "h", F.col("s").alias("sa"),
        F.col("rn").alias("rna"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"),
        F.col("s").alias("sb"), F.col("rn").alias("rnb"),
    )
    # POSITIONAL filter (PPJoin, Xiao et al. 2008): for the pair's
    # FIRST shared prefix element in the global rare-first order —
    # minimal (i, j) ranks — no shared element can precede it (it
    # would itself be an earlier generation event: both docs order
    # shingles by the same global (df, h) key, and an earlier shared
    # element sits inside both prefixes), so the whole overlap is
    # bounded by that element plus the shorter suffix:
    # overlap <= 1 + min(sa - i, sb - j). The bound holds ONLY for the
    # minimal event (later events miss earlier shared elements — the
    # over-pruning bug the oracle caught on first cut), hence min_by
    # on rank, not min of bounds. J >= t needs overlap*(1+t) >= t*(sa+sb)
    # — derived in exact integer form from PF_THRESHOLD below (t=1/2 →
    # 3*overlap >= sa+sb); pairs whose bound can't reach that never
    # enter the verification joins. Output-invariant (verify is exact).
    from fractions import Fraction

    _t = Fraction(PF_THRESHOLD).limit_denominator(1_000_000)
    assert float(_t) == PF_THRESHOLD, "PF_THRESHOLD must be exactly rational"
    ub = 1 + F.least(F.col("sa") - F.col("rna"), F.col("sb") - F.col("rnb"))
    cand = (
        pa.join(
            pb,
            (F.col("h") == F.col("hb"))
            & (F.col("doc_a") < F.col("doc_b"))
            # length prune: J >= t forces t*max(sa,sb) <= min(sa,sb)
            & (F.lit(PF_THRESHOLD) * F.col("sa") <= F.col("sb"))
            & (F.lit(PF_THRESHOLD) * F.col("sb") <= F.col("sa")),
        )
        .groupBy("doc_a", "doc_b", "sa", "sb")
        .agg(F.min_by(ub, F.col("rna")).alias("ub"))
        # ub*(den+num) >= num*(sa+sb)  ⟺  ub*(1+t) >= t*(sa+sb), t=num/den
        .filter(
            (_t.denominator + _t.numerator) * F.col("ub")
            >= _t.numerator * (F.col("sa") + F.col("sb"))
        )
        .select("doc_a", "doc_b", "sa", "sb")
    )
    # Verify against the per-doc ARRAYS: c = |A∩B| as a map-side
    # array_intersect size. The earlier occurrence-level form joined
    # cand to the exploded relation twice — join 1 fanned every
    # candidate out to its s_a occurrence rows and shipped THAT through
    # join 2's (doc, h) exchange (candidates × avg set size rows);
    # here each candidate carries exactly two array cells, and with
    # cand small AQE broadcasts it so the corpus-sized side never
    # shuffles at all. Same result by construction: ex rows are the
    # distinct (doc, h) pairs of shs, so counting equi-matches equals
    # intersecting the distinct-hash arrays.
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a")), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "sa",
            "sb",
            F.size(F.array_intersect("shs_a", "shs_b")).alias("c"),
        )
    )
    jac = F.col("c") * 1.0 / (F.col("sa") + F.col("sb") - F.col("c"))
    return inter.filter(jac >= PF_THRESHOLD).select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    )


# LSH band-tuning curve: for each (bands, rows) split of the
# MINHASH_H-hash budget, the EXPECTED candidate recall over the
# corpus's ACTUAL near-dup pair similarity distribution — i.e. the
# banding S-curve P(candidate | s) = 1 - (1 - s^r)^b evaluated at
# every verified pair's exact jaccard and averaged. This is the
# "measure, don't guess" version of the textbook S-curve table: the
# analytic p at the threshold similarity says where the curve SITS,
# the empirical mean says what the corpus actually GETS (a corpus
# whose dup pairs cluster near s=1 tolerates aggressive r; one with
# mass at the threshold does not). Deterministic cross-engine: s is
# the round-6 jaccard both engines already agree on, s^r and
# (1-s^r)^b are generated as IDENTICAL textual multiplication chains
# (no pow(), no libm), per-pair probabilities quantize to 1e6 ints
# before the cross-pair sum.
LSH_TUNING_CONFIGS = ((24, 1), (12, 2), (8, 3), (6, 4))  # (bands, rows)


def _chain_pow(expr: str, n: int) -> str:
    """x^n as a left-folded textual product — identical IEEE order in
    both engines."""
    out = expr
    for _ in range(n - 1):
        out = f"({out} * {expr})"
    return out


def _lsh_curve_legs(src: str) -> str:
    legs = " UNION ALL ".join(
        f"""
        SELECT CAST({b} AS BIGINT) AS n_bands, CAST({r} AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CAST(floor(
                 (CAST(1 AS DOUBLE) - {_chain_pow(f"(CAST(1 AS DOUBLE) - {_chain_pow('s', r)})", b)})
                 * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS p_sum
        FROM {src}
        """
        for b, r in LSH_TUNING_CONFIGS
    )
    return legs


def _lsh_p_at_threshold(b: int, r: int) -> float:
    return 1.0 - (1.0 - JACCARD_THRESHOLD**r) ** b


def _lsh_tuning_oracle() -> str:
    p_lit = " ".join(
        f"WHEN {b} THEN CAST({_lsh_p_at_threshold(b, r)!r} AS DOUBLE)"
        for b, r in LSH_TUNING_CONFIGS
    )
    return f"""
    WITH pr AS (
      WITH {_ORACLE_CLUSTER_CTE}
      {_oracle_fan_out("i.c * 1.0 / (na.n + nb.n - i.c)", "jaccard", JACCARD_THRESHOLD)}
    ),
    ps AS (SELECT jaccard AS s FROM pr),
    legs AS ({_lsh_curve_legs("ps")})
    SELECT n_bands, n_rows, n_pairs,
           CASE WHEN n_pairs > 0 THEN
             floor(CAST(p_sum AS DOUBLE) / n_pairs + 0.5) / 1000000
           END AS expected_recall,
           floor((CASE n_bands {p_lit} END) * 1000000 + 0.5) / 1000000
             AS p_at_threshold
    FROM legs
    """


@register("dedup_lsh_tuning_curve", oracle=_lsh_tuning_oracle())
def dedup_lsh_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected candidate recall of each (bands, rows) MinHash banding
    config over the corpus's verified near-dup pairs — see the block
    comment. Scale shape: the pair relation is the output-bounded
    near-dup set (computed once, pinned); each config leg is a
    projection + 1-row aggregate over |pairs| rows, so the whole
    4-point curve costs one pair generation plus |pairs|-bounded
    arithmetic. At 100 TB you'd feed the same legs from the prebuilt
    edge artifact's jaccard column; the config that clears your recall
    target with the fewest bands minimizes posting-list writes."""
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select(F.col("jaccard").alias("s"))
        .transform(pin_cache)
    )
    legs = None
    for b, r in LSH_TUNING_CONFIGS:
        miss = f"(CAST(1 AS DOUBLE) - {_chain_pow('s', r)})"
        p = f"(CAST(1 AS DOUBLE) - {_chain_pow(miss, b)})"
        leg = pairs.select(
            F.expr(f"CAST(floor({p} * 1000000 + 0.5) AS BIGINT)").alias("pq")
        ).agg(
            F.lit(b).cast("bigint").alias("n_bands"),
            F.lit(r).cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("pq").cast("bigint").alias("p_sum"),
        )
        legs = leg if legs is None else legs.unionByName(leg)
    pt = {b: _lsh_p_at_threshold(b, r) for b, r in LSH_TUNING_CONFIGS}
    p_at = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in pt.items() for x in kv]
        ),
        F.col("n_bands").cast("int"),
    )
    return legs.select(
        "n_bands",
        "n_rows",
        "n_pairs",
        F.when(
            F.col("n_pairs") > 0,
            F.floor(F.col("p_sum").cast("double") / F.col("n_pairs") + F.lit(0.5))
            / 1000000,
        ).alias("expected_recall"),
        (F.floor(p_at * 1000000 + F.lit(0.5)) / 1000000).alias("p_at_threshold"),
    )
