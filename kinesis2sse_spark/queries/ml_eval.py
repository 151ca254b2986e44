"""Model-evaluation operators — the metrics layer a training-data
pipeline runs after its quality classifiers: exact tie-corrected ROC
AUC, threshold confusion matrix with precision/recall/F1, calibration
(reliability) bins, and inter-rater agreement (Cohen's kappa).

All four score the embeddings/documents fixtures with a DETERMINISTIC
integer-exact linear scorer (per-component 1e6 quantization times a
multiplicative-hash weight, summed in int64 — the classify_quality_linear
convention), so every count, rank, and moment is exact integer
arithmetic on both engines and the only floating point anywhere is one
fixed-shape final expression per metric, floor-quantized at 1e6.

Scale design notes (100 TB):
- AUC is the one metric that needs global order statistics; the exact
  rank-sum is computed with the two-level distributed prefix pattern
  (sessions_max_concurrency / pipeline_sequence_packing): a score
  histogram shuffles once, per-bucket subtotals cumulate in a
  |buckets|-row window, and within-bucket ranks ride a bucket-
  partitioned window — no single-partition pass over the corpus.
- Confusion matrix / kappa are single full-aggregate passes (map-side
  combined), calibration adds one broadcast of the 1-row min/max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table, pin_cache
from kinesis2sse_spark.registry import register

# Deterministic linear probe score over the 64-dim embedding: each
# component floor-quantizes to an exact 1e6-scaled integer, multiplied
# by an integer weight from the multiplicative hash
# w(i) = ((i+1) * 2654435761 mod 1000000007) mod 2001 - 1000  in [-1000, 1000]
# (the SPLIT_HASH overflow-safe convention), summed in int64 — order-
# independent, so Spark's fold and DuckDB's list_sum cannot disagree.
# Headroom: |comp| <= ~0.5 -> per-term <= 5e8, 64 dims -> |score| <= 3.2e10.
EVAL_DIM = 64
EVAL_POS_LABEL_MIN = 5  # binary task: positive = label in {5..9}

_SCORE_SPARK = (
    "aggregate(transform(embedding, (x, i) -> "
    "CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT) * "
    "(((CAST(i + 1 AS BIGINT) * 2654435761) % 1000000007) % 2001 - 1000)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)

_SCORE_DUCK = f"""CAST(list_sum(list_transform(range(0, {EVAL_DIM}), i ->
      CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
      * (((CAST(i + 1 AS BIGINT) * 2654435761) % 1000000007) % 2001 - 1000)
    )) AS BIGINT)"""

# shared oracle CTE: (s BIGINT score, pos INT 0/1) per vector
_SCORED_CTE = f"""scored AS (
  SELECT {_SCORE_DUCK} AS s,
         CASE WHEN label >= {EVAL_POS_LABEL_MIN} THEN 1 ELSE 0 END AS pos
  FROM embeddings
)"""

AUC_BUCKET = 1 << 28  # score-range bucket for the two-level prefix sum


def _with_prefix_counts(
    h: DataFrame,
    keys: tuple = (),
    descending: bool = False,
    keep_value: bool = False,
    bucket: int = AUC_BUCKET,
) -> DataFrame:
    """Two-level distributed prefix counts over a score histogram —
    the shared machinery of ml_auc_roc / ml_auc_by_slice /
    ml_lift_pr_deciles and (via keep_value=True, which retains the
    score column ``s`` for rank->value lookups) of
    pipeline_quantile_normalize (one implementation so the bucketing
    and tie conventions cannot drift between them).

    ``h``: relation (*keys, s, c, cp), which the CALLER must persist —
    it feeds both the bucket-subtotal aggregate and the within-bucket
    rank join here (and often a totals aggregate at the call site).
    Returns (*keys, c, cp, less) where ``less`` is the exact count of
    rows strictly before this score group in (keys-partitioned) score
    order. Bucket offsets cumulate in a window over the tiny
    (*keys, bucket) relation and broadcast back; within-bucket counts
    ride a (*keys, bucket)-partitioned window — never a corpus-sized
    single partition."""
    h = h.withColumn("k", F.expr(f"s div {bucket}"))
    kcol = F.col("k").desc() if descending else F.col("k")
    scol = F.col("s").desc() if descending else F.col("s")
    ks = h.groupBy(*keys, "k").agg(F.sum("c").alias("kc"))
    wk = (
        Window.partitionBy(*keys)
        .orderBy(kcol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = ks.select(
        *keys, "k", (F.sum("kc").over(wk) - F.col("kc")).alias("off")
    )
    ww = (
        Window.partitionBy(*keys, "k")
        .orderBy(scol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return h.join(F.broadcast(off), [*keys, "k"]).select(
        *keys,
        *(("s",) if keep_value else ()),
        "c",
        "cp",
        (F.col("off") + F.sum("c").over(ww) - F.col("c")).cast("bigint").alias("less"),
    )


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        F.expr(_SCORE_SPARK).alias("s"),
        (F.col("label") >= EVAL_POS_LABEL_MIN).cast("int").alias("pos"),
    )


_AUC_ORACLE = f"""
WITH {_SCORED_CTE},
h AS (
  SELECT s, count(*) AS c, CAST(sum(pos) AS BIGINT) AS cp
  FROM scored GROUP BY s
),
r AS (
  SELECT c, cp,
         CAST(sum(c) OVER (ORDER BY s) - c AS BIGINT) AS less
  FROM h
),
agg AS (
  SELECT CAST(sum(cp) AS BIGINT) AS n_pos,
         CAST(sum(c - cp) AS BIGINT) AS n_neg,
         CAST(sum(cp * (2 * less + c + 1)) AS BIGINT) AS s2
  FROM r
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         floor((CAST(s2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE))
               / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
               * 1000000 + 0.5) / 1000000
       END AS auc
FROM agg
"""


@register("ml_auc_roc", oracle=_AUC_ORACLE, bench=True)
def ml_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC AUC of the deterministic linear probe
    against the binary label — the Mann-Whitney rank-sum form
    AUC = (S2 - n1(n1+1)) / (2 n1 n0), where S2 is the sum over
    positives of DOUBLED average ranks (2*less + c + 1 keeps the
    .5-granular tie-averaged ranks integral, the stats_spearman_rank
    trick), so the statistic is exact int64 end to end and the only
    floating point is the final ratio, floor-quantized at 1e6.

    The global ranks do NOT use a corpus-sized single-partition window:
    the score histogram (one shuffle, map-side combined) buckets by
    score div 2^28, per-bucket count subtotals cumulate in a window
    over the ~|score range|/2^28 bucket relation, the offsets broadcast
    back, and within-bucket cumulative counts ride a bucket-partitioned
    window — the two-level distributed prefix pattern, monotone because
    integer division is monotone in the score. Int64 headroom:
    S2 <= 2n^2 stays exact through ~2e9 vectors; beyond that switch the
    moment accumulator to DECIMAL(38,0) (same plan)."""
    from pyspark import StorageLevel

    h = (
        _scored(spark, sf_dir)
        .groupBy("s")
        .agg(F.count("*").alias("c"), F.sum("pos").cast("bigint").alias("cp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    r = _with_prefix_counts(h)
    agg = r.agg(
        F.sum("cp").cast("bigint").alias("n_pos"),
        F.sum(F.col("c") - F.col("cp")).cast("bigint").alias("n_neg"),
        F.sum(F.col("cp") * (2 * F.col("less") + F.col("c") + 1))
        .cast("bigint")
        .alias("s2"),
    )
    n1d = F.col("n_pos").cast("double")
    n0d = F.col("n_neg").cast("double")
    auc = (F.col("s2").cast("double") - n1d * (F.col("n_pos") + 1).cast("double")) / (
        2.0 * n1d * n0d
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.floor(auc * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("auc"),
    )


_CONFUSION_ORACLE = f"""
WITH {_SCORED_CTE},
agg AS (
  SELECT CAST(sum(CASE WHEN pos = 1 AND s >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN pos = 0 AND s >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN pos = 1 AND s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN pos = 0 AND s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored
)
SELECT tp, fp, fn, tn,
       CASE WHEN tp + fp > 0 THEN
         floor(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) * 1000000 + 0.5) / 1000000
       END AS precision_,
       CASE WHEN tp + fn > 0 THEN
         floor(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) * 1000000 + 0.5) / 1000000
       END AS recall_,
       CASE WHEN 2 * tp + fp + fn > 0 THEN
         floor(2.0 * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
               * 1000000 + 0.5) / 1000000
       END AS f1
FROM agg
"""


@register("ml_confusion_threshold", oracle=_CONFUSION_ORACLE)
def ml_confusion_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix + precision/recall/F1 for the linear probe at
    the natural threshold (score >= 0) — the per-release gate report
    that accompanies ml_auc_roc's threshold-free ranking view. One
    full-aggregate corpus pass (map-side combined, no shuffle beyond
    the 4-cell reduction); the four cells are exact integers and each
    ratio is a single fixed-shape IEEE division, floor-quantized at
    1e6, NULL (not an ANSI 0/0) when its denominator is empty.
    Column names carry a trailing underscore where DuckDB reserves the
    bare word (precision)."""
    s = _scored(spark, sf_dir)
    pred = F.col("s") >= 0
    pos = F.col("pos") == 1
    agg = s.agg(
        F.sum(F.when(pos & pred, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(~pos & pred, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(pos & ~pred, 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~pos & ~pred, 1).otherwise(0)).cast("bigint").alias("tn"),
    )

    def q6(num, den):
        return F.when(
            den > 0, F.floor(num / den * 1000000 + F.lit(0.5)) / 1000000
        )

    tp, fp, fn = [F.col(c).cast("double") for c in ("tp", "fp", "fn")]
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        q6(tp, tp + fp).alias("precision_"),
        q6(tp, tp + fn).alias("recall_"),
        q6(2.0 * tp, 2.0 * tp + fp + fn).alias("f1"),
    )


CALIB_BINS = 10

_CALIB_ORACLE = f"""
WITH {_SCORED_CTE},
mm AS (
  SELECT CAST(min(s) AS BIGINT) AS mn, CAST(max(s) AS BIGINT) AS mx FROM scored
),
b AS (
  SELECT CAST(((s - mn) * {CALIB_BINS}) // (mx - mn + 1) AS BIGINT) AS bin,
         s, pos
  FROM scored, mm
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(floor(CAST(CAST(sum(s) AS BIGINT) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS mean_score,
       floor(CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS pos_rate
FROM b GROUP BY bin
"""


@register("ml_calibration_bins", oracle=_CALIB_ORACLE)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: equal-width score bins (over the observed
    score range) vs empirical positive rate — the calibration check
    that tells you whether the probe's scores can be THRESHOLDED at a
    target precision or must be recalibrated first. The 1-row min/max
    aggregate broadcasts back onto the corpus scan (crossJoin of a
    literal-sized side, the filter_quality_percentile shape), binning
    is pure integer arithmetic ((s - mn) * 10 // (mx - mn + 1), exact
    and identical across engines because the numerator is nonnegative),
    and the per-bin stats are one map-side-combined aggregate. The bin
    mean score rounds to the nearest integer via one IEEE division of
    exact int64 sums; pos_rate floor-quantizes at 1e6."""

    s = _scored(spark, sf_dir).transform(pin_cache)
    mm = s.agg(
        F.min("s").cast("bigint").alias("mn"), F.max("s").cast("bigint").alias("mx")
    )
    b = s.crossJoin(F.broadcast(mm)).select(
        F.expr(f"((s - mn) * {CALIB_BINS}) div (mx - mn + 1)")
        .cast("bigint")
        .alias("bin"),
        "s",
        "pos",
    )
    g = b.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("s").cast("bigint").alias("ssum"),
    )
    return g.select(
        "bin",
        "n",
        "n_pos",
        F.floor(F.col("ssum").cast("double") / F.col("n").cast("double") + F.lit(0.5))
        .cast("bigint")
        .alias("mean_score"),
        (
            F.floor(
                F.col("n_pos").cast("double") / F.col("n").cast("double") * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("pos_rate"),
    )


_BRIER_ORACLE = f"""
WITH {_SCORED_CTE},
mm AS (
  SELECT CAST(min(s) AS BIGINT) AS mn, CAST(max(s) AS BIGINT) AS mx FROM scored
),
p AS (
  SELECT CAST(((s - mn) * 1000) // (mx - mn + 1) AS BIGINT) AS p3, pos
  FROM scored, mm
),
b AS (
  SELECT (p3 * {CALIB_BINS}) // 1000 AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(pos) AS BIGINT) AS n_pos_b,
         CAST(sum(p3) AS BIGINT) AS sum_p3_b,
         CAST(sum((p3 - 1000 * pos) * (p3 - 1000 * pos)) AS BIGINT) AS sq_b
  FROM p GROUP BY 1
)
SELECT CAST(sum(n_b) AS BIGINT) AS n_vecs,
       floor(CAST(sum(sq_b) AS DOUBLE)
             / (CAST(sum(n_b) AS DOUBLE) * 1000000.0) * 1000000 + 0.5)
         / 1000000 AS brier,
       floor(CAST(sum(abs(1000 * n_pos_b - sum_p3_b)) AS DOUBLE)
             / (CAST(sum(n_b) AS DOUBLE) * 1000.0) * 1000000 + 0.5)
         / 1000000 AS ece
FROM b
"""


@register("ml_brier_ece", oracle=_BRIER_ORACLE)
def ml_brier_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score + expected calibration error (ECE) for the linear
    probe, with the score min-max-rescaled to a 1e-3-granular pseudo-
    probability p3 = ((s - mn) * 1000) div (mx - mn + 1) in [0, 999] —
    exact integer division (nonnegative numerator, so both engines'
    `div`/`//` agree). Brier sums the exact int64 squared residuals
    (p3 - 1000*pos)^2 <= 1e6 per row (headroom to ~9e12 rows; beyond
    that promote to DECIMAL(38,0)); ECE folds the same per-bin
    aggregates as ml_calibration_bins — sum_b |1000*n_pos_b - sum_p3_b|
    is EXACTLY n * sum_b w_b*|pos_rate_b - mean_p_b| scaled integral —
    so both metrics come out of ONE grouped aggregate over the cached
    scored relation plus the 1-row min/max broadcast; the only floating
    point is the two final ratios, floor-quantized at 1e6."""

    s = _scored(spark, sf_dir).transform(pin_cache)
    mm = s.agg(
        F.min("s").cast("bigint").alias("mn"), F.max("s").cast("bigint").alias("mx")
    )
    p = s.crossJoin(F.broadcast(mm)).select(
        F.expr("((s - mn) * 1000) div (mx - mn + 1)").cast("bigint").alias("p3"),
        "pos",
    )
    res = F.col("p3") - 1000 * F.col("pos")
    b = p.groupBy(F.expr(f"(p3 * {CALIB_BINS}) div 1000").alias("bin")).agg(
        F.count("*").cast("bigint").alias("n_b"),
        F.sum("pos").cast("bigint").alias("n_pos_b"),
        F.sum("p3").cast("bigint").alias("sum_p3_b"),
        F.sum(res * res).cast("bigint").alias("sq_b"),
    )
    n = F.sum("n_b").cast("bigint")
    return b.agg(
        n.alias("n_vecs"),
        (
            F.floor(
                F.sum("sq_b").cast("double")
                / (n.cast("double") * 1000000.0)
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("brier"),
        (
            F.floor(
                F.sum(F.abs(1000 * F.col("n_pos_b") - F.col("sum_p3_b")))
                .cast("double")
                / (n.cast("double") * 1000.0)
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("ece"),
    )


# per-slice AUC joins the embedding scores to the documents table's
# language tag on vec_id = doc_id — the id spaces are aligned by the
# fixture generator, and at 100 TB this is the standard fact-to-
# metadata co-partitioned join (bucket both by id to make it
# zero-exchange).
_AUC_SLICE_ORACLE = f"""
WITH {_SCORED_CTE.replace("SELECT", "SELECT vec_id,", 1)},
tagged AS (
  SELECT d.lang AS lang, sc.s AS s, sc.pos AS pos
  FROM scored sc JOIN documents d ON sc.vec_id = d.doc_id
),
h AS (
  SELECT lang, s, count(*) AS c, CAST(sum(pos) AS BIGINT) AS cp
  FROM tagged GROUP BY lang, s
),
r AS (
  SELECT lang, c, cp,
         CAST(sum(c) OVER (PARTITION BY lang ORDER BY s) - c AS BIGINT) AS less
  FROM h
),
agg AS (
  SELECT lang,
         CAST(sum(cp) AS BIGINT) AS n_pos,
         CAST(sum(c - cp) AS BIGINT) AS n_neg,
         CAST(sum(cp * (2 * less + c + 1)) AS BIGINT) AS s2
  FROM r GROUP BY lang
)
SELECT lang, n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         floor((CAST(s2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE))
               / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
               * 1000000 + 0.5) / 1000000
       END AS auc
FROM agg
"""


@register("ml_auc_by_slice", oracle=_AUC_SLICE_ORACLE)
def ml_auc_by_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language-slice ROC AUC — the sliced evaluation report that
    catches a probe scoring well on the majority language while failing
    a minority one (overall AUC hides exactly this). Same exact
    tie-corrected rank-sum as ml_auc_roc, with every stage keyed by the
    slice: the score histogram groups by (lang, s), bucket offsets
    cumulate in a window PARTITIONED by lang over the tiny
    (lang, bucket) relation, within-bucket ranks ride a (lang, bucket)
    window — so no slice ever collapses the corpus to one partition,
    and a slice 1000x bigger than another just gets proportionally more
    buckets. The lang tag joins from documents on vec_id = doc_id (the
    fact-to-metadata join; bucket both by id at scale)."""
    from pyspark import StorageLevel

    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    sc = e.select(
        "vec_id",
        F.expr(_SCORE_SPARK).alias("s"),
        (F.col("label") >= EVAL_POS_LABEL_MIN).cast("int").alias("pos"),
    )
    h = (
        sc.join(d, "vec_id")
        .groupBy("lang", "s")
        .agg(F.count("*").alias("c"), F.sum("pos").cast("bigint").alias("cp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    r = _with_prefix_counts(h, keys=("lang",))
    agg = r.groupBy("lang").agg(
        F.sum("cp").cast("bigint").alias("n_pos"),
        F.sum(F.col("c") - F.col("cp")).cast("bigint").alias("n_neg"),
        F.sum(F.col("cp") * (2 * F.col("less") + F.col("c") + 1))
        .cast("bigint")
        .alias("s2"),
    )
    n1d = F.col("n_pos").cast("double")
    n0d = F.col("n_neg").cast("double")
    auc = (F.col("s2").cast("double") - n1d * (F.col("n_pos") + 1).cast("double")) / (
        2.0 * n1d * n0d
    )
    return agg.select(
        "lang",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.floor(auc * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("auc"),
    )


import math

IR_K = 10  # evaluate the top-10 ranking
IR_QUERIES = 10  # query set = vec_id < 10 (the sim_topk convention)

# 1e6-scaled DCG discounts and reciprocal ranks for ranks 1..IR_K,
# computed ONCE here and inlined as integer literals into BOTH the
# Spark expression and the DuckDB oracle — so no engine ever evaluates
# log2 at query time and the metric is exact integer arithmetic.
_DISC = [int(math.floor(1_000_000 / math.log2(r + 1) + 0.5)) for r in range(1, IR_K + 1)]
_RECIP = [int(math.floor(1_000_000 / r + 0.5)) for r in range(1, IR_K + 1)]
# prefix sums of _DISC: _IDCG[m] = ideal 1e6-scaled DCG with m relevant
_IDCG = [0]
for _d in _DISC:
    _IDCG.append(_IDCG[-1] + _d)

_DISC_LIST = "[" + ", ".join(str(d) for d in _DISC) + "]"
_IDCG_LIST = "[" + ", ".join(str(v) for v in _IDCG[1:]) + "]"
_RECIP_LIST = "[" + ", ".join(str(v) for v in _RECIP) + "]"

# shared oracle fragments: the label-relevance top-k ranking and the
# per-query relevant-total — ONE definition so the two IR operators'
# oracles cannot drift from each other (mirrors _ir_ranked below)
_RANKED_CTE = f"""ranked AS (
  SELECT query_id, neighbor_id, rel, rn FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS rel,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(
                        CAST(q.embedding AS DOUBLE[]),
                        CAST(c.embedding AS DOUBLE[])), 6) DESC,
                      c.vec_id) AS rn
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < {IR_QUERIES}
  ) WHERE rn <= {IR_K}
)"""

_NREL_CTE = f"""nrel AS (
  SELECT q.vec_id AS query_id,
         CAST((SELECT count(*) FROM embeddings c
               WHERE c.label = q.label AND c.vec_id <> q.vec_id) AS BIGINT) AS n_rel
  FROM embeddings q WHERE q.vec_id < {IR_QUERIES}
)"""

_IR_ORACLE = f"""
WITH {_RANKED_CTE},
{_NREL_CTE},
perq AS (
  SELECT query_id,
         CAST(sum(rel) AS BIGINT) AS hits,
         CAST(sum(rel * {_DISC_LIST}[rn]) AS BIGINT) AS dcg_s,
         min(CASE WHEN rel = 1 THEN rn END) AS first_rel
  FROM ranked GROUP BY query_id
)
SELECT n.query_id, n.n_rel, p.hits, p.dcg_s,
       CAST({_IDCG_LIST}[greatest(least(n.n_rel, {IR_K}), 1)] AS BIGINT) AS idcg_s,
       CASE WHEN n.n_rel > 0 THEN
         floor(CAST(p.dcg_s AS DOUBLE)
               / CAST({_IDCG_LIST}[greatest(least(n.n_rel, {IR_K}), 1)] AS DOUBLE)
               * 1000000 + 0.5) / 1000000
       END AS ndcg,
       CASE WHEN p.first_rel IS NULL THEN 0.0
            ELSE CAST({_RECIP_LIST}[p.first_rel] AS DOUBLE) / 1000000.0
       END AS rr,
       CASE WHEN n.n_rel > 0 THEN
         floor(CAST(p.hits AS DOUBLE) / CAST(n.n_rel AS DOUBLE)
               * 1000000 + 0.5) / 1000000
       END AS recall_k
FROM nrel n JOIN perq p ON n.query_id = p.query_id
"""


def _ir_ranked(spark: SparkSession, sf_dir: str):
    """Label-relevance cosine top-k ranking shared by the IR
    evaluation operators (the Spark twin of _RANKED_CTE): returns
    (ranked, e) where ranked = (query_id, qlabel, neighbor_id, rel,
    rn <= IR_K) using the proven sim_topk_bruteforce convention
    (round(cos, 6) DESC, id tiebreak), corpus scanned once against the
    broadcast query set with WindowGroupLimit pruning map-side."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = _with_label_norm(e)
    queries = corpus.filter(F.col("vec_id") < IR_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("label").alias("qlabel"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    ranked = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("label") == F.col("qlabel")).cast("int").alias("rel"),
            F.round(dot / (F.col("qnorm") * F.col("norm")), 6).alias("cos_sim"),
            "vec_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IR_K)
    )
    return ranked, e


def _with_nrel(perq: DataFrame, e: DataFrame) -> DataFrame:
    """Join the 10-row label histogram (broadcast) and derive n_rel."""
    lc = e.groupBy("label").agg(F.count("*").alias("lcnt"))
    return perq.join(F.broadcast(lc), perq["qlabel"] == lc["label"]).withColumn(
        "n_rel", (F.col("lcnt") - 1).cast("bigint")
    )


@register("ir_eval_retrieval", oracle=_IR_ORACLE)
def ir_eval_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality report per query: nDCG@10, reciprocal rank,
    and recall@10 of exact cosine top-k against the label-match
    relevance signal — the evaluation loop a RAG / embedding-training
    pipeline runs after building an index (sim_topk_* are the systems
    under test; this is their scorecard). Ranking reuses the proven
    sim_topk_bruteforce convention (round(cos, 6) DESC, id tiebreak);
    the log2 discounts are 1e6-scaled INTEGER LITERAL tables inlined
    into both engines at build time, so DCG/IDCG/RR are exact int64
    and the only floating point is the final ratios, floor-quantized
    at 1e6. n_rel comes from the 10-row label histogram (broadcast);
    the corpus is scanned once against the broadcast query set and
    WindowGroupLimit prunes the top-k map-side."""
    ranked, e = _ir_ranked(spark, sf_dir)
    disc = F.element_at(F.array(*[F.lit(d) for d in _DISC]), F.col("rn"))
    perq = ranked.groupBy("query_id", "qlabel").agg(
        F.sum("rel").cast("bigint").alias("hits"),
        F.sum(F.col("rel") * disc).cast("bigint").alias("dcg_s"),
        F.min(F.when(F.col("rel") == 1, F.col("rn"))).alias("first_rel"),
    )
    perq = _with_nrel(perq, e)
    idcg = F.element_at(
        F.array(*[F.lit(v) for v in _IDCG[1:]]),
        F.greatest(F.least(F.col("n_rel"), F.lit(IR_K)), F.lit(1)).cast("int"),
    ).cast("bigint")
    recip = F.element_at(
        F.array(*[F.lit(v) for v in _RECIP]), F.col("first_rel").cast("int")
    )
    return perq.select(
        "query_id",
        "n_rel",
        "hits",
        "dcg_s",
        idcg.alias("idcg_s"),
        F.when(
            F.col("n_rel") > 0,
            F.floor(
                F.col("dcg_s").cast("double") / idcg.cast("double") * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("ndcg"),
        F.when(F.col("first_rel").isNull(), F.lit(0.0))
        .otherwise(recip.cast("double") / 1000000.0)
        .alias("rr"),
        F.when(
            F.col("n_rel") > 0,
            F.floor(
                F.col("hits").cast("double") / F.col("n_rel").cast("double") * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("recall_k"),
    )


def _with_label_norm(e: DataFrame) -> DataFrame:
    from kinesis2sse_spark.queries.llm_similarity import _with_norm

    return _with_norm(e, extra_cols=("label",))


KAPPA_CHARS_MIN = 300  # rater A: long-document gate on raw chars
KAPPA_TOKENS_MIN = 50  # rater B: long-document gate on whitespace tokens

_KAPPA_ORACLE = f"""
WITH m AS (
  SELECT CASE WHEN n_chars >= {KAPPA_CHARS_MIN} THEN 1 ELSE 0 END AS a,
         CASE WHEN len(string_split(text, ' ')) >= {KAPPA_TOKENS_MIN}
              THEN 1 ELSE 0 END AS b
  FROM documents
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a) AS BIGINT) AS na,
         CAST(sum(b) AS BIGINT) AS nb,
         CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
  FROM m
)
SELECT n AS n_docs, agree AS n_agree,
       CASE WHEN n * n - (na * nb + (n - na) * (n - nb)) > 0 THEN
         floor(CAST(n * agree - (na * nb + (n - na) * (n - nb)) AS DOUBLE)
               / CAST(n * n - (na * nb + (n - na) * (n - nb)) AS DOUBLE)
               * 1000000 + 0.5) / 1000000
       END AS kappa
FROM agg
"""


@register("stats_cohens_kappa", oracle=_KAPPA_ORACLE)
def stats_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic long-document raters
    (chars gate vs whitespace-token gate) — chance-corrected agreement,
    the metric annotation pipelines report when two labelers (or a
    labeler and a heuristic) grade the same corpus; raw percent
    agreement overstates consensus whenever the marginals are skewed.
    kappa = (n*agree - E) / (n^2 - E) with E = na*nb + (n-na)*(n-nb):
    the standard (po-pe)/(1-pe) multiplied through by n^2 so every term
    is an exact int64 (n^2 stays exact through ~3e9 docs; beyond that
    promote the products to DECIMAL(38,0)). One full-aggregate corpus
    pass, no shuffle beyond the 4-cell reduction; NULL when the
    marginals make chance agreement certain (pe = 1)."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        (F.col("n_chars") >= KAPPA_CHARS_MIN).cast("int").alias("a"),
        (F.size(F.split("text", " ")) >= KAPPA_TOKENS_MIN).cast("int").alias("b"),
    )
    agg = m.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
        F.sum((F.col("a") == F.col("b")).cast("int")).cast("bigint").alias("agree"),
    )
    e = F.col("na") * F.col("nb") + (F.col("n") - F.col("na")) * (
        F.col("n") - F.col("nb")
    )
    num = F.col("n") * F.col("agree") - e
    den = F.col("n") * F.col("n") - e
    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("agree").alias("n_agree"),
        F.when(
            den > 0,
            F.floor(num.cast("double") / den.cast("double") * 1000000 + F.lit(0.5))
            / 1000000,
        ).alias("kappa"),
    )


DRIFT_DIMS = 8  # audit the first 8 embedding dimensions
DRIFT_BANDS = 10  # fixed equal-width bands at 0.1 granularity


_FEATURE_DRIFT_ORACLE = f"""
WITH x AS (
  SELECT dim,
         least(4, greatest(-5,
           CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 10) AS BIGINT))) AS b,
         CASE WHEN label >= {EVAL_POS_LABEL_MIN} THEN 1 ELSE 0 END AS pos
  FROM embeddings, (SELECT unnest(range(0, {DRIFT_DIMS})) AS dim)
),
cells0 AS (
  SELECT dim, b,
         count(*) FILTER (pos = 1) AS ca,
         count(*) FILTER (pos = 0) AS cb
  FROM x GROUP BY dim, b
),
cells AS (
  SELECT s.dim, s.b, coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
  FROM (SELECT d.dim, bb.b
        FROM (SELECT unnest(range(0, {DRIFT_DIMS})) AS dim) d,
             (SELECT unnest(range(-5, 5)) AS b) bb) s
  LEFT JOIN cells0 c ON c.dim = s.dim AND c.b = s.b
),
tot AS (
  SELECT dim, sum(ca) AS na, sum(cb) AS nb FROM cells GROUP BY dim
),
contrib AS (
  SELECT c.dim,
         CAST(floor(
           ((ca + 0.5) / (na + {DRIFT_BANDS} * 0.5)
            - (cb + 0.5) / (nb + {DRIFT_BANDS} * 0.5))
           * ln(((ca + 0.5) / (na + {DRIFT_BANDS} * 0.5))
                / ((cb + 0.5) / (nb + {DRIFT_BANDS} * 0.5)))
           * 1000000000000 + 0.5) AS BIGINT) AS c,
         na, nb
  FROM cells c JOIN tot t ON c.dim = t.dim
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(max(na) AS BIGINT) AS n_pos,
       CAST(max(nb) AS BIGINT) AS n_neg,
       CAST(sum(c) AS DOUBLE) / 1000000000000 AS psi
FROM contrib GROUP BY dim
"""


@register("ml_feature_drift", oracle=_FEATURE_DRIFT_ORACLE)
def ml_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-FEATURE drift report: PSI of each of the first DRIFT_DIMS
    embedding dimensions between the positive and negative label
    cohorts — the feature-level monitoring view that tells you WHICH
    input moved when the aggregate drift alarm (stats_psi_drift) fires,
    and the per-dimension health check run before retraining a probe.
    Same determinism recipe as stats_psi_drift: integer 0.1-granular
    bands (float->double cast then floor, identical in both engines),
    one grouped aggregate to (dim, band) cells joined onto the FIXED
    {DRIFT_BANDS}-band spine (so bands empty in both cohorts still
    contribute their smoothed mass and the Laplace masses sum to 1), and per-cell contributions
    floor-quantized to 1e-12-scaled integers before the per-dim sum
    (the gram-matrix rule). Scale: the explode emits DRIFT_DIMS rows
    per vector but they immediately collapse into the (dim, band)
    cell aggregate — map-side combined, so the shuffle carries only
    |dims| x |bands| cells per task, never the corpus."""

    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        F.posexplode(F.slice("embedding", 1, DRIFT_DIMS)).alias("dim", "xv"),
        (F.col("label") >= EVAL_POS_LABEL_MIN).cast("int").alias("pos"),
    ).select(
        "dim",
        F.least(
            F.lit(4).cast("bigint"),
            F.greatest(
                F.lit(-5).cast("bigint"),
                F.floor(F.col("xv").cast("double") * 10),
            ),
        ).alias("b"),
        "pos",
    )
    cells0 = x.groupBy("dim", "b").agg(
        F.count(F.when(F.col("pos") == 1, 1)).alias("ca"),
        F.count(F.when(F.col("pos") == 0, 1)).alias("cb"),
    )
    # fixed band domain: a band empty in BOTH cohorts still carries its
    # smoothed contribution (nonzero whenever na != nb) — without the
    # spine the Laplace masses would not sum to 1 over the 10 bands
    spine = (
        spark.range(DRIFT_DIMS)
        .select(F.col("id").cast("int").alias("dim"))
        .crossJoin(
            spark.range(-5, 5).select(F.col("id").cast("bigint").alias("b"))
        )
    )
    cells = (
        spine.join(cells0, ["dim", "b"], "left")
        .fillna(0, subset=["ca", "cb"])
        .transform(pin_cache)
    )
    tot = cells.groupBy("dim").agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    sm = DRIFT_BANDS * 0.5
    p = (F.col("ca") + 0.5) / (F.col("na") + sm)
    q = (F.col("cb") + 0.5) / (F.col("nb") + sm)
    contrib = cells.join(F.broadcast(tot), "dim").select(
        "dim",
        F.floor((p - q) * F.log(p / q) * 1000000000000 + F.lit(0.5)).alias("c"),
        "na",
        "nb",
    )
    return contrib.groupBy(F.col("dim").cast("bigint").alias("dim")).agg(
        F.max("na").cast("bigint").alias("n_pos"),
        F.max("nb").cast("bigint").alias("n_neg"),
        (F.sum("c").cast("double") / 1000000000000).alias("psi"),
    )


LIFT_DECILES = 10

_LIFT_ORACLE = f"""
WITH {_SCORED_CTE},
h AS (
  SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(pos) AS BIGINT) AS cp
  FROM scored GROUP BY s
),
r AS (
  SELECT s, c, cp,
         CAST(sum(c) OVER (ORDER BY s DESC) - c AS BIGINT) AS before
  FROM h
),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(cp) AS BIGINT) AS np FROM h
),
d AS (
  SELECT (before * {LIFT_DECILES}) // n AS decile,
         CAST(sum(c) AS BIGINT) AS n_d,
         CAST(sum(cp) AS BIGINT) AS tp_d
  FROM r, tot GROUP BY 1
),
cum AS (
  SELECT decile, n_d, tp_d,
         CAST(sum(n_d) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
         CAST(sum(tp_d) OVER (ORDER BY decile) AS BIGINT) AS cum_tp
  FROM d
)
SELECT decile, n_d, tp_d, cum_n, cum_tp,
       floor(CAST(cum_tp AS DOUBLE) / CAST(cum_n AS DOUBLE) * 1000000 + 0.5)
         / 1000000 AS precision_,
       CASE WHEN np > 0 THEN
         floor(CAST(cum_tp AS DOUBLE) / CAST(np AS DOUBLE) * 1000000 + 0.5)
           / 1000000
       END AS recall_,
       CASE WHEN np > 0 THEN
         floor((CAST(cum_tp AS DOUBLE) / CAST(cum_n AS DOUBLE))
               / (CAST(np AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000 + 0.5)
           / 1000000
       END AS lift
FROM cum, tot
"""


@register("ml_lift_pr_deciles", oracle=_LIFT_ORACLE)
def ml_lift_pr_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / lift table with precision-recall by score
    decile — 'if we keep only the top d/10 of the corpus by probe
    score, what precision/recall/lift do we get?' — the report that
    picks the retention threshold for a quality-filtering pass.
    Deciles are EXACT global descending-rank bands computed from the
    score histogram, with the deterministic tie convention that a
    distinct-score group lands entirely in the decile of its FIRST
    row ((rows_before * 10) div n) — tie groups never split, so both
    engines agree bit-for-bit and a giant tie group may legitimately
    swallow neighboring deciles. The histogram cumulates with the
    same two-level prefix pattern as ml_auc_roc, ordered DESCENDING
    (bucket key negated); everything through cum_tp is exact int64,
    the three ratios floor-quantize at 1e6. The decile relation is
    10 rows, so its cumulative window is trivially single-partition."""

    h = (
        _scored(spark, sf_dir)
        .groupBy("s")
        .agg(F.count("*").cast("bigint").alias("c"), F.sum("pos").cast("bigint").alias("cp"))
        .transform(pin_cache)
    )
    r = _with_prefix_counts(h, descending=True).withColumnRenamed("less", "before")
    tot = h.agg(
        F.sum("c").cast("bigint").alias("n"), F.sum("cp").cast("bigint").alias("np")
    )
    d = (
        r.crossJoin(F.broadcast(tot))
        .groupBy(F.expr(f"(before * {LIFT_DECILES}) div n").alias("decile"))
        .agg(
            F.sum("c").cast("bigint").alias("n_d"),
            F.sum("cp").cast("bigint").alias("tp_d"),
        )
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = d.select(
        "decile",
        "n_d",
        "tp_d",
        F.sum("n_d").over(wd).cast("bigint").alias("cum_n"),
        F.sum("tp_d").over(wd).cast("bigint").alias("cum_tp"),
    )
    cumn, cumtp = F.col("cum_n").cast("double"), F.col("cum_tp").cast("double")
    return cum.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_d",
        "tp_d",
        "cum_n",
        "cum_tp",
        (F.floor(cumtp / cumn * 1000000 + F.lit(0.5)) / 1000000).alias("precision_"),
        F.when(
            F.col("np") > 0,
            F.floor(cumtp / F.col("np").cast("double") * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("recall_"),
        F.when(
            F.col("np") > 0,
            F.floor(
                (cumtp / cumn)
                / (F.col("np").cast("double") / F.col("n").cast("double"))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("lift"),
    )


_AP_ORACLE = f"""
WITH {_RANKED_CTE},
hits AS (
  SELECT query_id, rel, rn,
         CAST(sum(rel) OVER (PARTITION BY query_id ORDER BY rn) AS BIGINT) AS h
  FROM ranked
),
{_NREL_CTE},
perq AS (
  SELECT query_id,
         CAST(sum(rel * h * {_RECIP_LIST}[rn]) AS BIGINT) AS ap_s
  FROM hits GROUP BY query_id
)
SELECT n.query_id, n.n_rel, p.ap_s,
       CASE WHEN n.n_rel > 0 THEN
         floor(CAST(p.ap_s AS DOUBLE)
               / (1000000.0 * CAST(least(n.n_rel, {IR_K}) AS DOUBLE))
               * 1000000 + 0.5) / 1000000
       END AS avg_precision
FROM nrel n JOIN perq p ON n.query_id = p.query_id
"""


@register("ir_eval_average_precision", oracle=_AP_ORACLE)
def ir_eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision at 10 per query — the third leg of the ranked-
    retrieval scorecard (nDCG grades the whole ranking shape, MRR the
    first hit; AP integrates precision over every relevant hit, the
    quantity whose macro average is MAP). Same proven ranking
    convention as ir_eval_retrieval; precision@r uses the SAME
    1e6-scaled reciprocal literal table inlined into both engines, so
    the per-query statistic ap_s = sum(rel_r * hits_r * R6[r]) is
    exact int64 (the metric is DEFINED with quantized reciprocals —
    documented convention, identical on both sides; |error| vs true
    AP < 1e-5). Normalized by min(n_rel, k), the standard cutoff-aware
    denominator. The cumulative-hit window partitions by query over
    k-row groups — never corpus-sized."""
    ranked, e = _ir_ranked(spark, sf_dir)
    wh = (
        Window.partitionBy("query_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = ranked.withColumn("h", F.sum("rel").over(wh).cast("bigint"))
    recip = F.element_at(F.array(*[F.lit(v) for v in _RECIP]), F.col("rn"))
    perq = hits.groupBy("query_id", "qlabel").agg(
        F.sum(F.col("rel") * F.col("h") * recip).cast("bigint").alias("ap_s")
    )
    perq = _with_nrel(perq, e)
    return perq.select(
        "query_id",
        "n_rel",
        "ap_s",
        F.when(
            F.col("n_rel") > 0,
            F.floor(
                F.col("ap_s").cast("double")
                / (
                    1000000.0
                    * F.least(F.col("n_rel"), F.lit(IR_K)).cast("double")
                )
                * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("avg_precision"),
    )


# Isotonic regression (PAV) over the reliability bins — the standard
# post-hoc calibrator (Zadrozny & Elkan 2002) one step past the
# diagnostics above: ml_calibration_bins SHOWS miscalibration, this
# produces the monotone score->probability map that FIXES it. The fit
# uses the minimax closed form of pool-adjacent-violators:
#   iso(i) = max_{j<=i} min_{k>=i}  (CP[k]-CP[j-1]) / (N[k]-N[j-1])
# (weighted interval averages over prefix sums), which is PAV's exact
# solution without the sequential pooling loop — the right shape for a
# relational engine: the corpus collapses to <= CALIB_BINS bin rows in
# ONE map-side-combined aggregate, and the j<=i<=k interval expansion
# runs over that constant-size relation (<= B^3 rows, B = 10), never
# the corpus. Interval averages are single IEEE divisions of exact
# int64 prefix sums (identical across engines); min/max over those
# doubles are exact; only the final rate floor-quantizes at 1e6.
_ISO_ORACLE = f"""
WITH {_SCORED_CTE},
mm AS (
  SELECT CAST(min(s) AS BIGINT) AS mn, CAST(max(s) AS BIGINT) AS mx FROM scored
),
b AS (
  SELECT CAST(((s - mn) * {CALIB_BINS}) // (mx - mn + 1) AS BIGINT) AS bin, pos
  FROM scored, mm
),
g AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS np
  FROM b GROUP BY bin
),
p AS (
  SELECT bin, n, np,
         CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
         CAST(sum(np) OVER (ORDER BY bin) AS BIGINT) AS cp
  FROM g
),
iv AS (
  SELECT j.bin AS jb, k.bin AS kb,
         CAST(k.cp - j.cp + j.np AS DOUBLE)
           / CAST(k.cn - j.cn + j.n AS DOUBLE) AS avg_jk
  FROM p j JOIN p k ON j.bin <= k.bin
),
fit AS (
  SELECT i.bin, max(inner_min.mn_avg) AS iso
  FROM p i
  JOIN (
    SELECT v.jb, i2.bin AS ib, min(v.avg_jk) AS mn_avg
    FROM iv v JOIN p i2 ON v.jb <= i2.bin AND i2.bin <= v.kb
    GROUP BY v.jb, i2.bin
  ) inner_min ON inner_min.ib = i.bin
  GROUP BY i.bin
)
SELECT g.bin, g.n, g.np AS n_pos,
       floor(CAST(g.np AS DOUBLE) / CAST(g.n AS DOUBLE) * 1000000 + 0.5)
         / 1000000 AS raw_rate,
       floor(f.iso * 1000000 + 0.5) / 1000000 AS iso_rate
FROM g JOIN fit f ON f.bin = g.bin
"""


@register("ml_isotonic_calibration", oracle=_ISO_ORACLE)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the linear probe via the minimax
    closed form — see the block comment above for the algebra and the
    determinism argument. Scale shape: ONE corpus aggregate (the same
    equal-width reliability binning as ml_calibration_bins — integer
    arithmetic against the broadcast 1-row min/max) collapses
    everything to <= {CALIB_BINS} bin rows; prefix sums, the j<=k
    interval expansion, and the max-of-min fold all run on that
    constant-size relation with no forced hints (AQE trivially
    broadcasts ten-row sides). The fitted iso_rate is monotone
    nondecreasing in bin by construction — pinned in
    tests/test_ml_eval.py along with the PAV pooling property on a
    hand-computed violator fixture."""
    s = _scored(spark, sf_dir).transform(pin_cache)
    mm = s.agg(
        F.min("s").cast("bigint").alias("mn"), F.max("s").cast("bigint").alias("mx")
    )
    g = (
        s.crossJoin(F.broadcast(mm))
        .select(
            F.expr(f"((s - mn) * {CALIB_BINS}) div (mx - mn + 1)")
            .cast("bigint")
            .alias("bin"),
            "pos",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("np"),
        )
        .transform(pin_cache)
    )
    fit = pav_fit(g)
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return g.join(fit, "bin").select(
        "bin",
        "n",
        F.col("np").alias("n_pos"),
        q6(F.col("np").cast("double") / F.col("n").cast("double")).alias("raw_rate"),
        q6(F.col("iso")).alias("iso_rate"),
    )


def pav_fit(g: DataFrame) -> DataFrame:
    """Minimax PAV over a (bin, n, np) relation -> (bin, iso): the
    weighted isotonic fit, exactly the pooled-adjacent-violators
    solution. Relation is constant-size (<= CALIB_BINS rows), so the
    single-partition window and the j<=i<=k expansion are free."""
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = g.select(
        "bin",
        "n",
        "np",
        F.sum("n").over(w).cast("bigint").alias("cn"),
        F.sum("np").over(w).cast("bigint").alias("cp"),
    )
    j = p.select(
        F.col("bin").alias("jb"), F.col("n").alias("jn"),
        F.col("np").alias("jnp"), F.col("cn").alias("jcn"), F.col("cp").alias("jcp"),
    )
    k = p.select(
        F.col("bin").alias("kb"), F.col("cn").alias("kcn"), F.col("cp").alias("kcp"),
    )
    iv = j.join(k, F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        (
            (F.col("kcp") - F.col("jcp") + F.col("jnp")).cast("double")
            / (F.col("kcn") - F.col("jcn") + F.col("jn")).cast("double")
        ).alias("avg_jk"),
    )
    i2 = p.select(F.col("bin").alias("ib"))
    inner_min = (
        iv.join(i2, (F.col("jb") <= F.col("ib")) & (F.col("ib") <= F.col("kb")))
        .groupBy("jb", "ib")
        .agg(F.min("avg_jk").alias("mn_avg"))
    )
    return inner_min.groupBy(F.col("ib").alias("bin")).agg(
        F.max("mn_avg").alias("iso")
    )


# Embedding-distribution two-sample test: exact linear-kernel MMD^2
# (Gretton et al. 2012) with a hash-permutation null — the
# REPRESENTATION-level drift check that complements ml_feature_drift's
# per-dimension PSI: linear-kernel MMD^2 = ||mean_X - mean_Y||^2
# detects any mean shift of the embedding cloud in one corpus pass
# (group mean vectors are 64 map-side-combined integer sums; no
# pairwise stage exists — the kernel trick collapses to moment
# matching). Two hypotheses ride the same machinery, the FDR-style
# control design: the LABEL split is exchangeable by synthesis and is
# EXPECTED to accept, while the comp0-sign split is selected on the
# embedding itself, so its mean shift is true by construction and pins
# the reject regime. Null calibration: MMD_REPLICAS hash-permuted
# memberships (u mod n < nx — integer threshold, never a double; seed
# multiplier offset 32768 sits above bootstrap/permutation/FDR/RR id
# ranges), add-one p-value. Components floor-quantize to 1e3-scaled
# int64 (sums exact, order-free); the only floating point is one
# division pair per dimension and the FIXED-ORDER 64-term fold of
# squared mean differences (F.aggregate / list_reduce — both engines
# fold left over the same dim order, so the doubles are identical).
MMD_REPLICAS = 32
MMD_SEED = 32768
_MMD_P = 1000000007


def _mmd_oracle() -> str:
    u = f"((vec_id % {_MMD_P} + (r.b + {MMD_SEED}) * 7919) * 2654435761) % {_MMD_P}"
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS qv,
             CASE WHEN label >= {EVAL_POS_LABEL_MIN} THEN 1 ELSE 0 END AS g_label,
             CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END AS g_comp0
      FROM embeddings
    ),
    hyp AS (
      SELECT 'label_split' AS hypothesis, vec_id, qv, g_label AS g FROM q
      UNION ALL
      SELECT 'comp0_split', vec_id, qv, g_comp0 FROM q
    ),
    sizes AS (
      SELECT hypothesis, CAST(sum(g) AS BIGINT) AS nx,
             CAST(count(*) - sum(g) AS BIGINT) AS ny,
             CAST(count(*) AS BIGINT) AS n
      FROM hyp GROUP BY hypothesis
    ),
    fan AS (
      SELECT h.hypothesis, h.vec_id, h.qv, r.b,
             CASE WHEN r.b = -1 THEN h.g
                  WHEN {u} % s.n < s.nx THEN 1 ELSE 0 END AS g
      FROM hyp h
      JOIN sizes s USING (hypothesis)
      CROSS JOIN (SELECT unnest(range(-1, {MMD_REPLICAS})) AS b) r
    ),
    dim AS (
      SELECT hypothesis, b, g, d.d,
             CAST(sum(qv[d.d + 1]) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      FROM fan, LATERAL (SELECT unnest(range(0, {EVAL_DIM})) AS d) d
      GROUP BY hypothesis, b, g, d.d
    ),
    vecs AS (
      SELECT hypothesis, b, g,
             list(s ORDER BY d) AS sums, max(n) AS n
      FROM dim GROUP BY hypothesis, b, g
    ),
    mmd AS (
      SELECT x.hypothesis, x.b, x.n AS nx, y.n AS ny,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, {EVAL_DIM} + 1), i ->
                 (CAST(x.sums[i] AS DOUBLE) / x.n
                  - CAST(y.sums[i] AS DOUBLE) / y.n)
                 * (CAST(x.sums[i] AS DOUBLE) / x.n
                    - CAST(y.sums[i] AS DOUBLE) / y.n))),
               (a, v) -> a + v) AS mmd2
      FROM vecs x JOIN vecs y
        ON x.hypothesis = y.hypothesis AND x.b = y.b AND x.g = 1 AND y.g = 0
    ),
    obs AS (SELECT hypothesis, nx, ny, mmd2 FROM mmd WHERE b = -1),
    null_cnt AS (
      SELECT m.hypothesis,
             CAST(count(*) FILTER (WHERE m.mmd2 >= o.mmd2) AS BIGINT) AS n_ge
      FROM mmd m JOIN obs o USING (hypothesis)
      WHERE m.b >= 0
      GROUP BY m.hypothesis
    )
    SELECT o.hypothesis, o.nx, o.ny,
           floor(o.mmd2 * 1000000 + 0.5) / 1000000 AS mmd2,
           n.n_ge,
           floor((1.0 + n.n_ge) / (1.0 + {MMD_REPLICAS}) * 1000000 + 0.5)
             / 1000000 AS p_value,
           (1.0 + n.n_ge) / (1.0 + {MMD_REPLICAS}) <= 0.05 AS reject
    FROM obs o JOIN null_cnt n USING (hypothesis)
    """


@register("stats_mmd_embedding_drift", oracle=_mmd_oracle())
def stats_mmd_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-kernel MMD two-sample test over the embedding cloud with
    a permutation null — see the block comment for the model, the
    control design, and the FP discipline. Scale shape: the
    (1 + MMD_REPLICAS) x 2-hypotheses fan-out collapses to group mean
    vectors INSIDE one map-side-combined aggregate (64 integer sums
    per (hypothesis, replica, group) — ~4k tiny rows cross the
    exchange, never the corpus); the MMD fold, null counting and
    p-values run on that constant-size relation. No pairwise kernel
    stage exists at any scale — linear-kernel MMD is moment matching."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)"
            " AS BIGINT))"
        ).alias("qv"),
        (F.col("label") >= EVAL_POS_LABEL_MIN).cast("int").alias("g_label"),
        (F.col("embedding")[0] >= 0).cast("int").alias("g_comp0"),
    )
    hyp = q.select(
        F.lit("label_split").alias("hypothesis"), "vec_id", "qv",
        F.col("g_label").alias("g"),
    ).unionAll(
        q.select(
            F.lit("comp0_split").alias("hypothesis"), "vec_id", "qv",
            F.col("g_comp0").alias("g"),
        )
    ).transform(pin_cache)
    sizes = hyp.groupBy("hypothesis").agg(
        F.sum("g").cast("bigint").alias("nx"),
        (F.count("*") - F.sum("g")).cast("bigint").alias("ny"),
        F.count("*").cast("bigint").alias("n"),
    )
    reps = spark.range(-1, MMD_REPLICAS).select(F.col("id").cast("bigint").alias("b"))
    u = f"((vec_id % {_MMD_P} + (b + {MMD_SEED}) * 7919) * 2654435761) % {_MMD_P}"
    fan = (
        hyp.join(F.broadcast(sizes), "hypothesis")
        .crossJoin(F.broadcast(reps))
        .select(
            "hypothesis",
            "qv",
            "b",
            F.when(F.col("b") == -1, F.col("g"))
            .when(F.expr(u) % F.col("n") < F.col("nx"), 1)
            .otherwise(0)
            .alias("g"),
        )
    )
    sums = fan.groupBy("hypothesis", "b", "g").agg(
        F.array(
            *[F.sum(F.col("qv")[i]).cast("bigint") for i in range(EVAL_DIM)]
        ).alias("sums"),
        F.count("*").cast("bigint").alias("n"),
    )
    x = sums.where(F.col("g") == 1).select(
        "hypothesis", "b", F.col("sums").alias("sx"), F.col("n").alias("nx")
    )
    y = sums.where(F.col("g") == 0).select(
        F.col("hypothesis").alias("hy"), F.col("b").alias("by"),
        F.col("sums").alias("sy"), F.col("n").alias("ny"),
    )
    diff2 = F.aggregate(
        F.zip_with(
            "sx",
            "sy",
            lambda a, c: (
                a.cast("double") / F.col("nx") - c.cast("double") / F.col("ny")
            )
            * (a.cast("double") / F.col("nx") - c.cast("double") / F.col("ny")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    mmd = (
        x.join(
            y, (F.col("hypothesis") == F.col("hy")) & (F.col("b") == F.col("by"))
        )
        .select("hypothesis", "b", "nx", "ny", diff2.alias("mmd2"))
        .transform(pin_cache)
    )
    obs = mmd.where(F.col("b") == -1).select(
        "hypothesis",
        "nx",
        "ny",
        F.col("mmd2").alias("obs_mmd2"),
    )
    nulls = (
        mmd.where(F.col("b") >= 0)
        .join(F.broadcast(obs), "hypothesis")
        .groupBy("hypothesis")
        .agg(
            F.sum(
                F.when(F.col("mmd2") >= F.col("obs_mmd2"), 1).otherwise(0)
            ).cast("bigint").alias("n_ge")
        )
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    p = (1.0 + F.col("n_ge")) / (1.0 + MMD_REPLICAS)
    return obs.join(nulls, "hypothesis").select(
        "hypothesis",
        "nx",
        "ny",
        q6(F.col("obs_mmd2")).alias("mmd2"),
        "n_ge",
        q6(p).alias("p_value"),
        (p <= 0.05).alias("reject"),
    )


# Youden-optimal operating point: sweep EVERY distinct score as a
# candidate threshold (predict positive when s >= t) and pick the one
# maximizing Youden's J = sensitivity + specificity - 1 — the standard
# ROC-derived threshold choice ml_confusion_threshold (fixed t = 0)
# stops short of. Exactness: J's argmax is taken over the INTEGER
# numerator TP*N - FP*P (J = that over the constant P*N), so no
# floating point touches the comparison; ties break toward the
# smallest threshold. The sweep is NOT a corpus windows pass: the
# score histogram (one shuffle) feeds the same two-level distributed
# prefix machinery as ml_auc_roc — once for row-prefix, once with the
# positive counts in the count role for pos-prefix — and the argmax is
# a single map-side-combined max_by.
_YOUDEN_ORACLE = f"""
WITH {_SCORED_CTE},
h AS (
  SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(pos) AS BIGINT) AS cp
  FROM scored GROUP BY s
),
tot AS (
  SELECT CAST(sum(cp) AS BIGINT) AS p, CAST(sum(c - cp) AS BIGINT) AS n FROM h
),
r AS (
  SELECT s,
         CAST(sum(c) OVER (ORDER BY s) - c AS BIGINT) AS rows_lt,
         CAST(sum(cp) OVER (ORDER BY s) - cp AS BIGINT) AS pos_lt
  FROM h
),
cand AS (
  SELECT r.s AS threshold,
         t.p - r.pos_lt AS tp,
         t.n - (r.rows_lt - r.pos_lt) AS fp,
         r.pos_lt AS fn, r.rows_lt - r.pos_lt AS tn,
         (t.p - r.pos_lt) * t.n - (t.n - (r.rows_lt - r.pos_lt)) * t.p AS num,
         t.p, t.n
  FROM r CROSS JOIN tot t
)
SELECT threshold, tp, fp, fn, tn,
       floor(CAST(tp AS DOUBLE) / p * 1000000 + 0.5) / 1000000 AS sensitivity,
       floor(CAST(tn AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS specificity,
       floor(CAST(num AS DOUBLE) / (CAST(p AS DOUBLE) * n) * 1000000 + 0.5)
         / 1000000 AS youden_j
FROM cand
ORDER BY num DESC, threshold ASC
LIMIT 1
"""


@register("ml_threshold_sweep_youden", oracle=_YOUDEN_ORACLE)
def ml_threshold_sweep_youden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Youden-optimal threshold sweep — see the block comment for the
    model and the integer-argmax exactness argument. The histogram
    pins (it feeds both prefix passes and the totals); the argmax is
    max_by over struct(num, -threshold) (lexicographic = J desc,
    threshold asc — exactly the oracle's ORDER BY), one
    map-side-combined reduce over the distinct-score relation."""
    h = (
        _scored(spark, sf_dir)
        .groupBy("s")
        .agg(
            F.count("*").cast("bigint").alias("c"),
            F.sum("pos").cast("bigint").alias("cp"),
        )
        .transform(pin_cache)
    )
    tot = h.agg(
        F.sum("cp").cast("bigint").alias("p"),
        F.sum(F.col("c") - F.col("cp")).cast("bigint").alias("n"),
    )
    r1 = _with_prefix_counts(h, keep_value=True).select(
        "s", F.col("less").alias("rows_lt")
    )
    r2 = _with_prefix_counts(
        h.select("s", F.col("cp").alias("c"), F.col("c").alias("cp")),
        keep_value=True,
    ).select(F.col("s").alias("s2"), F.col("less").alias("pos_lt"))
    cand = (
        r1.join(r2, F.col("s") == F.col("s2"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("s").alias("threshold"),
            (F.col("p") - F.col("pos_lt")).alias("tp"),
            (F.col("n") - (F.col("rows_lt") - F.col("pos_lt"))).alias("fp"),
            F.col("pos_lt").alias("fn"),
            (F.col("rows_lt") - F.col("pos_lt")).alias("tn"),
            (
                (F.col("p") - F.col("pos_lt")) * F.col("n")
                - (F.col("n") - (F.col("rows_lt") - F.col("pos_lt"))) * F.col("p")
            ).alias("num"),
            "p",
            "n",
        )
    )
    best = (
        cand.agg(
            F.max_by(
                F.struct("threshold", "tp", "fp", "fn", "tn", "num", "p", "n"),
                F.struct(F.col("num"), (-F.col("threshold")).alias("ns")),
            ).alias("b")
        )
        .select("b.*")
        # empty-corpus parity: the global max_by emits one all-null row
        # on empty input while the oracle's LIMIT 1 emits nothing — the
        # empty-fixture audit's placeholder-row class (caught r11)
        .where(F.col("threshold").isNotNull())
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return best.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        q6(F.col("tp").cast("double") / F.col("p")).alias("sensitivity"),
        q6(F.col("tn").cast("double") / F.col("n")).alias("specificity"),
        q6(
            F.col("num").cast("double") / (F.col("p").cast("double") * F.col("n"))
        ).alias("youden_j"),
    )


# Classifier-level average precision (area under the PR curve in its
# step form): walk the score groups in descending order; each group
# contributes (its positives) x (precision at the group's END), and
# AP = that sum / P. Ties share the group-end precision — the
# deterministic convention pinned here (sklearn's step AP with ties
# collapsed to one threshold). Exactness: precision at a group end is
# one IEEE division of exact int64 prefix counts; the per-group terms
# cast to DECIMAL(27,15) BEFORE summation (ladder step 3) so the
# group-count-length sum is order-independent; final /P is one
# division, floor-quantized. Same two-level prefix machinery as
# ml_auc_roc/ml_threshold_sweep_youden — never a corpus-wide
# single-partition window.
_AP_ORACLE = f"""
WITH {_SCORED_CTE},
h AS (
  SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(pos) AS BIGINT) AS cp
  FROM scored GROUP BY s
),
r AS (
  SELECT s, c, cp,
         CAST(sum(c) OVER (ORDER BY s DESC) AS BIGINT) AS rows_ge,
         CAST(sum(cp) OVER (ORDER BY s DESC) AS BIGINT) AS pos_ge
  FROM h
),
tot AS (SELECT CAST(sum(cp) AS BIGINT) AS p FROM h),
terms AS (
  SELECT CAST(sum(CAST(cp * (CAST(pos_ge AS DOUBLE) / rows_ge)
                       AS DECIMAL(27,15))) AS DOUBLE) AS num
  FROM r
)
SELECT t.p AS n_pos,
       floor(terms.num / t.p * 1000000 + 0.5) / 1000000 AS average_precision
FROM terms CROSS JOIN tot t
"""


@register("ml_average_precision", oracle=_AP_ORACLE)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-form average precision of the linear probe — see the block
    comment for the tie convention and determinism. The histogram pins
    (row-prefix pass, pos-prefix pass, totals); descending prefix
    counts come from the shared two-level machinery."""
    h = (
        _scored(spark, sf_dir)
        .groupBy("s")
        .agg(
            F.count("*").cast("bigint").alias("c"),
            F.sum("pos").cast("bigint").alias("cp"),
        )
        .transform(pin_cache)
    )
    tot = h.agg(F.sum("cp").cast("bigint").alias("p"))
    r1 = _with_prefix_counts(h, descending=True, keep_value=True).select(
        "s", "c", "cp", F.col("less").alias("rows_gt")
    )
    r2 = _with_prefix_counts(
        h.select("s", F.col("cp").alias("c"), F.col("c").alias("cp")),
        descending=True,
        keep_value=True,
    ).select(F.col("s").alias("s2"), F.col("less").alias("pos_gt"))
    terms = (
        r1.join(r2, F.col("s") == F.col("s2"))
        .select(
            (
                F.col("cp")
                * (
                    (F.col("pos_gt") + F.col("cp")).cast("double")
                    / (F.col("rows_gt") + F.col("c"))
                )
            )
            .cast("decimal(27,15)")
            .alias("t")
        )
        .agg(F.sum("t").cast("double").alias("num"))
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        F.col("p").alias("n_pos"),
        (
            F.floor(F.col("num") / F.col("p") * 1000000 + F.lit(0.5)) / 1000000
        ).alias("average_precision"),
    )


# Bootstrap CI on the headline eval metric — ml_auc_roc reports a
# point AUC; this attaches the deterministic Poisson-bootstrap
# interval (the stats_bootstrap_ci machinery lifted to a RANK
# statistic): each replica reweights every vector by the inverse
# Poisson(1) CDF of a hash-uniform (integer thresholds inlined into
# both engines, seed multiplier offset 49152 — above every other
# operator's id range) and recomputes the tie-corrected Mann-Whitney
# AUC from WEIGHTED score-histogram counts, which is exact: duplicated
# rows share their score, so weight-multiplicity flows through the
# rank formula's integer counts unchanged. Replica b = -1 carries
# weight 1 everywhere — the point estimate rides the same plan. CI =
# 2nd smallest / 2nd largest replica AUC (the stats_bootstrap_ci rank
# convention, ties by replica id).
AUC_BOOT_SEED = 49152

from kinesis2sse_spark.queries.aggregates import (  # noqa: E402
    BOOT_P,
    BOOT_REPLICAS,
    _boot_w_sql,
)


def _auc_boot_oracle() -> str:

    u = f"(((vec_id % {BOOT_P}) + (r.b + {AUC_BOOT_SEED}) * 7919) * 2654435761) % {BOOT_P}"
    return f"""
    WITH base AS (
      SELECT vec_id, {_SCORE_DUCK} AS s,
             CASE WHEN label >= {EVAL_POS_LABEL_MIN} THEN 1 ELSE 0 END AS pos
      FROM embeddings
    ),
    fan AS (
      SELECT r.b, base.s, base.pos,
             CASE WHEN r.b = -1 THEN 1 ELSE {_boot_w_sql(u)} END AS w
      FROM base CROSS JOIN (SELECT unnest(range(-1, {BOOT_REPLICAS})) AS b) r
    ),
    h AS (
      SELECT b, s, CAST(sum(w) AS BIGINT) AS c,
             CAST(sum(w * pos) AS BIGINT) AS cp
      FROM fan GROUP BY b, s
    ),
    rk AS (
      SELECT b, c, cp,
             CAST(sum(c) OVER (PARTITION BY b ORDER BY s) - c AS BIGINT) AS less
      FROM h
    ),
    auc AS (
      SELECT b,
             CAST(sum(cp) AS BIGINT) AS p,
             CAST(sum(c - cp) AS BIGINT) AS nn,
             CAST(sum(cp * (2 * less + c + 1)) AS BIGINT) AS s2
      FROM rk GROUP BY b
    ),
    vals AS (
      SELECT b,
             floor((CAST(s2 AS DOUBLE) - CAST(p AS DOUBLE) * (p + 1))
                   / (2.0 * CAST(p AS DOUBLE) * nn) * 1000000 + 0.5)
               / 1000000 AS auc_b
      FROM auc WHERE p > 0 AND nn > 0
    ),
    ranked AS (
      SELECT auc_b, row_number() OVER (ORDER BY auc_b, b) AS rk
      FROM vals WHERE b >= 0
    )
    SELECT v.auc_b AS auc,
           CAST({BOOT_REPLICAS} AS BIGINT) AS n_replicas,
           (SELECT auc_b FROM ranked WHERE rk = 2) AS ci_lo,
           (SELECT auc_b FROM ranked WHERE rk = {BOOT_REPLICAS - 1}) AS ci_hi
    FROM vals v WHERE v.b = -1
    """


@register("ml_auc_bootstrap_ci", oracle=_auc_boot_oracle())
def ml_auc_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap CI around the probe's AUC — see
    the block comment. Scale shape: ONE corpus scan fans to
    (1 + {BOOT_REPLICAS}) weighted copies that collapse to per-replica
    score histograms inside a map-side-combined aggregate; ranks ride
    the b-partitioned two-level prefix machinery, and everything after
    is a {BOOT_REPLICAS}-row relation."""
    base = (
        load_table(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.expr(_SCORE_SPARK).alias("s"),
            (F.col("label") >= EVAL_POS_LABEL_MIN).cast("int").alias("pos"),
        )
    )
    reps = spark.range(-1, BOOT_REPLICAS).select(
        F.col("id").cast("bigint").alias("b")
    )
    u = (
        f"(((vec_id % {BOOT_P}) + (b + {AUC_BOOT_SEED}) * 7919)"
        f" * 2654435761) % {BOOT_P}"
    )
    fan = base.crossJoin(F.broadcast(reps)).select(
        "b",
        "s",
        "pos",
        F.when(F.col("b") == -1, 1).otherwise(F.expr(_boot_w_sql(u))).alias("w"),
    )
    h = (
        fan.groupBy("b", "s")
        .agg(
            F.sum("w").cast("bigint").alias("c"),
            F.sum(F.col("w") * F.col("pos")).cast("bigint").alias("cp"),
        )
        .transform(pin_cache)
    )
    rk = _with_prefix_counts(h, keys=("b",))
    auc = rk.groupBy("b").agg(
        F.sum("cp").cast("bigint").alias("p"),
        F.sum(F.col("c") - F.col("cp")).cast("bigint").alias("nn"),
        F.sum(F.col("cp") * (2 * F.col("less") + F.col("c") + 1))
        .cast("bigint")
        .alias("s2"),
    )
    auc_b = (
        F.floor(
            (F.col("s2").cast("double") - F.col("p").cast("double") * (F.col("p") + 1))
            / (2.0 * F.col("p").cast("double") * F.col("nn"))
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    vals = (
        auc.where((F.col("p") > 0) & (F.col("nn") > 0))
        .select("b", auc_b.alias("auc_b"))
        .transform(pin_cache)
    )
    point = vals.where(F.col("b") == -1).select(F.col("auc_b").alias("auc"))
    from pyspark.sql import Window as W

    ranked = (
        vals.where(F.col("b") >= 0)
        .withColumn("rk", F.row_number().over(W.orderBy("auc_b", "b")))
    )
    # 1-row global aggregate (never empty, NULL bounds when the rank is
    # absent) so the point row survives replica-starved fixtures exactly
    # like the oracle's scalar subqueries do.
    bounds = ranked.agg(
        F.max(F.when(F.col("rk") == 2, F.col("auc_b"))).alias("ci_lo"),
        F.max(
            F.when(F.col("rk") == BOOT_REPLICAS - 1, F.col("auc_b"))
        ).alias("ci_hi"),
    )
    return (
        point.crossJoin(F.broadcast(bounds))
        .select(
            "auc",
            F.lit(BOOT_REPLICAS).cast("bigint").alias("n_replicas"),
            "ci_lo",
            "ci_hi",
        )
    )


# Graded-relevance nDCG (the TREC convention, Järvelin & Kekäläinen
# 2002): binary label-match relevance (ir_eval_retrieval) cannot tell
# a ranking that surfaces near-misses from one that surfaces garbage.
# Grades here: label == qlabel -> 2 (exact), |label - qlabel| == 1 ->
# 1 (adjacent class, the near-miss), else 0; gain = 2^grade - 1 in
# {3, 1, 0}. DCG = sum(gain * disc[rank]) over the same 1e6-scaled
# INTEGER discount table as the binary rung, so DCG and the ideal DCG
# (3s first, then 1s, greedy by grade — provably optimal for
# monotone discounts) are exact int64; the only float is the final
# ratio, floor-quantized at 1e6.
_NDCG_IDCG_PFX = "[" + ", ".join(str(v) for v in _IDCG[1:]) + "]"


@register(
    "ir_eval_ndcg_graded",
    oracle=f"""
    WITH gr AS (
      SELECT query_id, gain, rn FROM (
        SELECT q.vec_id AS query_id,
               CASE WHEN c.label = q.label THEN 3
                    WHEN abs(c.label - q.label) = 1 THEN 1
                    ELSE 0 END AS gain,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(c.embedding AS DOUBLE[])), 6) DESC,
                          c.vec_id) AS rn
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {IR_QUERIES}
      ) WHERE rn <= {IR_K}
    ),
    counts AS (
      SELECT q.vec_id AS query_id,
             CAST((SELECT count(*) FROM embeddings c
                   WHERE c.label = q.label) - 1 AS BIGINT) AS n_exact,
             CAST((SELECT count(*) FROM embeddings c
                   WHERE abs(c.label - q.label) = 1) AS BIGINT) AS n_adj
      FROM embeddings q WHERE q.vec_id < {IR_QUERIES}
    ),
    perq AS (
      SELECT query_id,
             CAST(sum(gain * {_DISC_LIST}[rn]) AS BIGINT) AS dcg_s
      FROM gr GROUP BY query_id
    ),
    ideal AS (
      SELECT query_id, n_exact, n_adj,
             least(n_exact, {IR_K}) AS a,
             least(n_adj, {IR_K} - least(n_exact, {IR_K})) AS b
      FROM counts
    )
    SELECT i.query_id, i.n_exact, i.n_adj, p.dcg_s,
           CAST(3 * (CASE WHEN i.a > 0 THEN {_NDCG_IDCG_PFX}[i.a] ELSE 0 END)
                + (CASE WHEN i.a + i.b > 0 THEN {_NDCG_IDCG_PFX}[i.a + i.b] ELSE 0 END)
                - (CASE WHEN i.a > 0 THEN {_NDCG_IDCG_PFX}[i.a] ELSE 0 END)
                AS BIGINT) AS idcg_s,
           CASE WHEN i.a + i.b > 0 THEN
             floor(CAST(p.dcg_s AS DOUBLE)
                   / CAST(3 * (CASE WHEN i.a > 0 THEN {_NDCG_IDCG_PFX}[i.a] ELSE 0 END)
                          + (CASE WHEN i.a + i.b > 0 THEN {_NDCG_IDCG_PFX}[i.a + i.b] ELSE 0 END)
                          - (CASE WHEN i.a > 0 THEN {_NDCG_IDCG_PFX}[i.a] ELSE 0 END)
                          AS DOUBLE)
                   * 1000000 + 0.5) / 1000000
           END AS ndcg
    FROM ideal i JOIN perq p ON p.query_id = i.query_id
    """,
)
def ir_eval_ndcg_graded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded-relevance nDCG@{IR_K} per query — see the block comment
    for grades/gains and the greedy-ideal argument. Plan shape
    identical to ir_eval_retrieval: one corpus scan against the
    broadcast query set, WindowGroupLimit pruning the top-k map-side,
    then |queries|-row arithmetic; the exact/adjacent population
    counts come from the 10-row label histogram, broadcast twice."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = _with_label_norm(e)
    queries = corpus.filter(F.col("vec_id") < IR_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("label").alias("qlabel"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    gain = (
        F.when(F.col("label") == F.col("qlabel"), 3)
        .when(F.abs(F.col("label") - F.col("qlabel")) == 1, 1)
        .otherwise(0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    gr = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "qlabel",
            gain.alias("gain"),
            F.round(dot / (F.col("qnorm") * F.col("norm")), 6).alias("cos_sim"),
            "vec_id",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= IR_K)
    )
    disc = F.element_at(F.array(*[F.lit(d) for d in _DISC]), F.col("rn"))
    perq = gr.groupBy("query_id", "qlabel").agg(
        F.sum(F.col("gain") * disc).cast("bigint").alias("dcg_s")
    )
    lc = e.groupBy("label").agg(F.count("*").alias("lcnt"))
    n_exact = (F.col("lcnt") - 1).cast("bigint")
    adj = (
        e.select((F.col("label")).alias("clabel"))
        .groupBy("clabel")
        .agg(F.count("*").alias("acnt"))
    )
    # n_adj = histogram mass at qlabel-1 plus qlabel+1 (two broadcast
    # joins against the 10-row histogram; missing labels coalesce to 0)
    perq = (
        perq.join(F.broadcast(lc), perq["qlabel"] == lc["label"])
        .join(
            F.broadcast(adj.selectExpr("clabel AS lo_l", "acnt AS lo_c")),
            F.col("qlabel") - 1 == F.col("lo_l"),
            "left",
        )
        .join(
            F.broadcast(adj.selectExpr("clabel AS hi_l", "acnt AS hi_c")),
            F.col("qlabel") + 1 == F.col("hi_l"),
            "left",
        )
        .select(
            "query_id",
            "dcg_s",
            n_exact.alias("n_exact"),
            (F.coalesce(F.col("lo_c"), F.lit(0)) + F.coalesce(F.col("hi_c"), F.lit(0)))
            .cast("bigint")
            .alias("n_adj"),
        )
    )
    a = F.least(F.col("n_exact"), F.lit(IR_K))
    b = F.least(F.col("n_adj"), F.lit(IR_K) - a)
    pfx = F.array(*[F.lit(v) for v in _IDCG[1:]])
    pa = F.when(a > 0, F.element_at(pfx, a.cast("int"))).otherwise(F.lit(0))
    pab = (
        F.when(a + b > 0, F.element_at(pfx, (a + b).cast("int")))
        .otherwise(F.lit(0))
    )
    idcg = (3 * pa + pab - pa).cast("bigint")
    return perq.select(
        "query_id",
        "n_exact",
        "n_adj",
        "dcg_s",
        idcg.alias("idcg_s"),
        F.when(
            a + b > 0,
            F.floor(
                F.col("dcg_s").cast("double") / idcg.cast("double") * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("ndcg"),
    )


@register(
    "ml_mcc_threshold",
    oracle=f"""
WITH {_SCORED_CTE},
agg AS (
  SELECT CAST(sum(CASE WHEN pos = 1 AND s >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN pos = 0 AND s >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN pos = 1 AND s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN pos = 0 AND s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM scored
)
SELECT tp, fp, fn, tn,
       CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0
             AND (tn + fp) > 0 AND (tn + fn) > 0 THEN
         floor((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
               / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                      * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))
               * 1000000 + 0.5) / 1000000
       END AS mcc,
       CASE WHEN (tp + fn) > 0 AND (tn + fp) > 0 THEN
         floor((CAST(tp AS DOUBLE) / (tp + fn)
                + CAST(tn AS DOUBLE) / (tn + fp)) / 2.0
               * 1000000 + 0.5) / 1000000
       END AS balanced_accuracy
FROM agg
""",
)
def ml_mcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient + balanced accuracy at the
    natural threshold — the class-imbalance-robust companions to
    ml_confusion_threshold's precision/recall/F1 (MCC is the only
    single-number confusion summary that uses all four cells; F1
    ignores TN entirely). Numerator is exact int64 cross-product; the
    denominator multiplies the four marginals as DOUBLES in fixed
    left-to-right order (int64 would overflow at n^4 for corpus-scale
    n), one sqrt, floor-quantized 1e6, NULL when any marginal is empty
    — same plan shape as the confusion rung: one map-side-combined
    corpus aggregate, 1-row arithmetic after."""
    s = _scored(spark, sf_dir)
    pred = F.col("s") >= 0
    pos = F.col("pos") == 1
    agg = s.agg(
        F.sum(F.when(pos & pred, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(~pos & pred, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(pos & ~pred, 1).otherwise(0)).cast("bigint").alias("fn"),
        F.sum(F.when(~pos & ~pred, 1).otherwise(0)).cast("bigint").alias("tn"),
    )
    tp, fp, fn, tn = [F.col(c) for c in ("tp", "fp", "fn", "tn")]
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    den = F.sqrt(
        (tp + fp).cast("double")
        * (tp + fn).cast("double")
        * (tn + fp).cast("double")
        * (tn + fn).cast("double")
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            (tp + fp > 0) & (tp + fn > 0) & (tn + fp > 0) & (tn + fn > 0),
            q6((tp.cast("double") * tn - fp.cast("double") * fn) / den),
        ).alias("mcc"),
        F.when(
            (tp + fn > 0) & (tn + fp > 0),
            q6(
                (
                    tp.cast("double") / (tp + fn)
                    + tn.cast("double") / (tn + fp)
                )
                / 2.0
            ),
        ).alias("balanced_accuracy"),
    )


# Kaplan-Meier survival estimator (Kaplan & Meier 1958) over
# PER-(USER, EVENT-TYPE) LIFETIMES — duration = days between the
# first and last event of that type for that user; a lifetime whose
# last event falls within KM_CENSOR_DAYS of the corpus horizon is
# right-CENSORED (may still be active), everyone else is an observed
# churn "death". The churn-curve primitive every retention analysis
# starts from (the reference's retention_* family reports
# fixed-window rates; KM is the proper censoring-aware curve).
#
# Scale shape: the corpus collapses to one row per (user, type) with
# a single map-side min/max aggregate (the natural key); everything
# after lives on the DURATION-DOMAIN relation (distinct whole-day
# lifetimes, bounded by the retention window, ~thousands of rows at
# any corpus size). Exactness: risk counts n_i and death counts d_i
# are exact int64 (descending cumulative over the domain-bounded
# relation); the survival product is carried as the CUMULATIVE SUM OF
# 1e9-QUANTIZED log terms — each ln(1 - d/n) is one IEEE op on
# identical doubles, floor-quantized to int64 BEFORE the cumulative
# sum, so the running total is exact integer arithmetic and immune to
# window-aggregate combine-order differences between engines (DuckDB
# segment-tree vs Spark sequential); S(t) = exp(sum/1e9) is then one
# final IEEE op, floor-quantized at 1e6.
KM_CENSOR_DAYS = 3  # horizon guard: last event this close = censored


@register(
    "ml_kaplan_meier",
    oracle=f"""
    WITH u AS (
      SELECT user_id, event_type,
             CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS d0,
             CAST(epoch_us(max(ts)) // 86400000000 AS BIGINT) AS d1
      FROM events WHERE ts IS NOT NULL
      GROUP BY user_id, event_type
    ),
    h AS (SELECT max(d1) AS horizon FROM u),
    life AS (
      SELECT d1 - d0 AS t,
             CASE WHEN d1 <= (SELECT horizon FROM h) - {KM_CENSOR_DAYS}
                  THEN 1 ELSE 0 END AS died
      FROM u
    ),
    g AS (
      SELECT t, CAST(count(*) AS BIGINT) AS total,
             CAST(sum(died) AS BIGINT) AS d
      FROM life GROUP BY t
    ),
    r AS (
      SELECT t, d,
             CAST(sum(total) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
      FROM g
    ),
    l AS (
      SELECT t, d, n_risk,
             CASE WHEN d > 0 AND d < n_risk THEN
               CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                          * 1000000000 + 0.5) AS BIGINT)
             ELSE 0 END AS lq
      FROM r
    )
    SELECT t AS t_days, n_risk, d AS d_churned,
           CASE WHEN d >= n_risk AND d > 0 THEN 0.0 ELSE
             floor(exp(CAST(sum(CASE WHEN d >= n_risk THEN NULL ELSE lq END)
                            OVER (ORDER BY t) AS DOUBLE) / 1000000000)
                   * 1000000 + 0.5) / 1000000
           END AS survival
    FROM l
    """,
)
def ml_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (days from first
    to last event, horizon-censored) — see the block comment for the
    duration-domain machinery and the quantized-log exact product."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    u = e.groupBy("user_id", "event_type").agg(
        F.expr("CAST(unix_micros(min(ts)) div 86400000000 AS BIGINT)").alias("d0"),
        F.expr("CAST(unix_micros(max(ts)) div 86400000000 AS BIGINT)").alias("d1"),
    ).transform(pin_cache)
    h = u.agg(F.max("d1").alias("horizon"))
    life = u.crossJoin(F.broadcast(h)).select(
        (F.col("d1") - F.col("d0")).alias("t"),
        (F.col("d1") <= F.col("horizon") - KM_CENSOR_DAYS)
        .cast("int")
        .alias("died"),
    )
    g = life.groupBy("t").agg(
        F.count("*").cast("bigint").alias("total"),
        F.sum("died").cast("bigint").alias("d"),
    )
    wdesc = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = g.select(
        "t", "d", F.sum("total").over(wdesc).cast("bigint").alias("n_risk")
    )
    lq = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.floor(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk").cast("double"))
            * 1000000000
            + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    l_ = r.select("t", "d", "n_risk", lq.alias("lq"))
    wasc = (
        Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(
        F.when(F.col("d") >= F.col("n_risk"), F.lit(None)).otherwise(F.col("lq"))
    ).over(wasc)
    return l_.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("d_churned"),
        F.when((F.col("d") >= F.col("n_risk")) & (F.col("d") > 0), F.lit(0.0))
        .otherwise(
            F.floor(
                F.exp(cum.cast("double") / 1000000000) * 1000000 + F.lit(0.5)
            )
            / 1000000
        )
        .alias("survival"),
    )


# Decision-stump split finding — the single-feature threshold search
# at the heart of distributed tree building (XGBoost/LightGBM's
# histogram method): over the deterministic linear-probe score, find
# the threshold s* that maximizes Gini impurity reduction for the
# binary label, evaluating EVERY distinct score as a candidate in one
# pass. Classic Spark shape: the corpus collapses to the score
# histogram (one shuffle, map-side combined, the ml_auc_roc relation),
# cumulative (count, positive) prefixes ride the same two-level
# distributed prefix machinery (_with_prefix_counts twice — once on
# counts, once on positives — never a corpus-sized single-partition
# window), and each candidate's score is arithmetic on exact int64
# prefixes. Selection: maximize J = sum_side (p^2 + q^2)/m (weighted
# Gini W satisfies W = n - J, so argmax J = argmax gain); J/n is
# 1e9-quantized from identical IEEE doubles on both engines, argmax
# tie-broken by smallest threshold — a global top-1, not a sort.
@register(
    "ml_decision_stump",
    oracle=f"""
    WITH {_SCORED_CTE},
    h AS (
      SELECT s, CAST(count(*) AS BIGINT) AS c, CAST(sum(pos) AS BIGINT) AS cp
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s,
             CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS ml,
             CAST(sum(cp) OVER (ORDER BY s) AS BIGINT) AS pl
      FROM h
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(cp) AS BIGINT) AS p FROM h
    ),
    cand AS (
      SELECT s, ml, pl, n - ml AS mr, p - pl AS pr, n, p
      FROM cum, tot WHERE n - ml > 0
    ),
    sc AS (
      SELECT s, ml, pl, mr, pr, n, p,
             (CAST(pl AS DOUBLE) * CAST(pl AS DOUBLE)
              + CAST(ml - pl AS DOUBLE) * CAST(ml - pl AS DOUBLE))
               / CAST(ml AS DOUBLE)
             + (CAST(pr AS DOUBLE) * CAST(pr AS DOUBLE)
                + CAST(mr - pr AS DOUBLE) * CAST(mr - pr AS DOUBLE))
               / CAST(mr AS DOUBLE) AS j
      FROM cand
    )
    SELECT s AS split_threshold, ml AS n_left, pl AS pos_left,
           mr AS n_right, pr AS pos_right,
           floor((j / CAST(n AS DOUBLE)
                  - (CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
                  - (CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(n - p AS DOUBLE) / CAST(n AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000 AS gini_gain
    FROM sc
    ORDER BY CAST(floor(j / CAST(n AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
             DESC, s
    LIMIT 1
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-optimal single-threshold split of the linear-probe score
    vs the binary label, all distinct scores as candidates in one
    distributed pass — see the block comment."""
    from pyspark import StorageLevel

    h = (
        _scored(spark, sf_dir)
        .groupBy("s")
        .agg(F.count("*").cast("bigint").alias("c"), F.sum("pos").cast("bigint").alias("cp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    h.count()  # eager pin: two prefix passes + totals consume h
    rc = _with_prefix_counts(h, keep_value=True).select(
        "s", (F.col("less") + F.col("c")).cast("bigint").alias("ml")
    )
    hp = h.select("s", F.col("cp").alias("c"), "cp")
    rp = _with_prefix_counts(hp, keep_value=True).select(
        "s", (F.col("less") + F.col("c")).cast("bigint").alias("pl")
    )
    tot = h.agg(
        F.sum("c").cast("bigint").alias("n"), F.sum("cp").cast("bigint").alias("p")
    )
    cand = (
        rc.join(rp, "s")
        .crossJoin(F.broadcast(tot))
        .select(
            "s",
            "ml",
            "pl",
            (F.col("n") - F.col("ml")).alias("mr"),
            (F.col("p") - F.col("pl")).alias("pr"),
            "n",
            "p",
        )
        .where(F.col("mr") > 0)
    )
    pld, mld = F.col("pl").cast("double"), F.col("ml").cast("double")
    qld = (F.col("ml") - F.col("pl")).cast("double")
    prd, mrd = F.col("pr").cast("double"), F.col("mr").cast("double")
    qrd = (F.col("mr") - F.col("pr")).cast("double")
    j = (pld * pld + qld * qld) / mld + (prd * prd + qrd * qrd) / mrd
    nd, pd_ = F.col("n").cast("double"), F.col("p").cast("double")
    qd = (F.col("n") - F.col("p")).cast("double")
    gain = j / nd - (pd_ / nd) * (pd_ / nd) - (qd / nd) * (qd / nd)
    jq = F.floor(j / nd * 1000000000 + F.lit(0.5)).cast("bigint")
    return (
        cand.select(
            F.col("s").alias("split_threshold"),
            F.col("ml").alias("n_left"),
            F.col("pl").alias("pos_left"),
            F.col("mr").alias("n_right"),
            F.col("pr").alias("pos_right"),
            (F.floor(gain * 1000000 + F.lit(0.5)) / 1000000).alias("gini_gain"),
            jq.alias("_jq"),
        )
        .orderBy(F.col("_jq").desc(), "split_threshold")
        .limit(1)
        .drop("_jq")
    )


# --- log loss ----------------------------------------------------------------
# Mean negative log-likelihood of the deterministic linear probe under a
# fixed logistic link, sliced by raw label — the model-eval ladder's
# proper-scoring-rule rung next to ml_brier_ece. The probe score s is an
# exact int64 lattice value (the _SCORE_SPARK convention); z = s / 1e10
# lands the logits in ~[-3.2, 3.2] so the link never saturates. Per-row
# losses ln(1+exp(-+z)) quantize to the 1e12 lattice as int64 (the
# text_perplexity convention) so the per-slice SUM is order-independent
# exact integer arithmetic; only the final mean divides in float,
# floor-quantized 1e6.
LOGLOSS_Z_DIV = 10000000000.0  # 1e10: lattice score -> logit scale


@register(
    "ml_log_loss",
    oracle=f"""
    WITH {_SCORED_CTE.replace("FROM embeddings", ", label FROM embeddings", 1)},
    t AS (
      SELECT label, pos,
             CAST(s AS DOUBLE) / {LOGLOSS_Z_DIV} AS z
      FROM scored
    ),
    q AS (
      SELECT label,
             CAST(floor(CASE WHEN pos = 1 THEN ln(1 + exp(-z))
                             ELSE ln(1 + exp(z)) END
                        * 1000000000000 + 0.5) AS BIGINT) AS c,
             pos
      FROM t
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           floor(CAST(sum(c) AS DOUBLE) / 1000000000000 / count(*)
                 * 1000000 + 0.5) / 1000000 AS mean_log_loss
    FROM q GROUP BY label ORDER BY label
    """,
)
def ml_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean logistic log loss of the deterministic linear
    probe — the proper scoring rule that (unlike AUC) punishes
    confident wrong probabilities, sliced by the raw 0-9 label so
    calibration failures localize to the label band causing them.
    Plan: the probe score projects map-side, each row's loss quantizes
    to an exact 1e12-lattice int64, and ONE hash aggregate (10 groups,
    map-side combined) finishes; no joins, no windows."""
    e = load_table(spark, sf_dir, "embeddings")
    z = F.expr(_SCORE_SPARK).cast("double") / F.lit(LOGLOSS_Z_DIV)
    pos = (F.col("label") >= EVAL_POS_LABEL_MIN).cast("int")
    loss = F.when(
        pos == 1, F.log(F.lit(1.0) + F.exp(-z))
    ).otherwise(F.log(F.lit(1.0) + F.exp(z)))
    q = e.select(
        "label",
        pos.alias("pos"),
        F.floor(loss * 1000000000000 + F.lit(0.5)).cast("bigint").alias("c"),
    )
    return (
        q.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            (
                F.floor(
                    F.sum("c").cast("double") / 1000000000000 / F.count("*") * 1000000
                    + F.lit(0.5)
                )
                / 1000000
            ).alias("mean_log_loss"),
        )
        .orderBy("label")
    )


# --- Platt scaling -----------------------------------------------------------
# The parametric calibration rung next to ml_isotonic_calibration:
# fit p = sigmoid(a z + b) to the binary label by PLATT_ITERS unrolled
# Newton steps on the cross-entropy with Platt's smoothed targets
# t+ = (n+ + 1)/(n+ + 2), t- = 1/(n- + 2) (the out-of-sample trick
# from Platt 1999), starting at a = 1, b = ln((n- + 1)/(n+ + 1)).
# Determinism: each step's gradient/Hessian entries quantize per row
# to the 1e12 lattice and sum as exact int64, so the (a, b) entering
# the NEXT step are identical doubles on both engines and the whole
# unrolled ladder replays exactly (the same argument as one lattice
# aggregate, applied PLATT_ITERS times). Plan: the scored relation
# pins once; each step is one map-side-combined 5-term aggregate plus
# 1-row 2x2 Newton arithmetic — PLATT_ITERS linear passes, no windows,
# no joins.
PLATT_ITERS = 4
_PLATT_Q = 1000000000000


def _platt_step_sql(i: int) -> str:
    """One unrolled Newton step as a pair of CTEs reading params p{i}
    -> params p{i+1}."""
    return f"""
    g{i + 1} AS (
      SELECT
        CAST(sum(CAST(floor((1.0 / (1.0 + exp(-(p{i}.a * t.z + p{i}.b)))
                             - t.tgt) * t.z * {_PLATT_Q} + 0.5) AS BIGINT))
             AS BIGINT) AS gx,
        CAST(sum(CAST(floor((1.0 / (1.0 + exp(-(p{i}.a * t.z + p{i}.b)))
                             - t.tgt) * {_PLATT_Q} + 0.5) AS BIGINT))
             AS BIGINT) AS gb,
        CAST(sum(CAST(floor((1.0 / (1.0 + exp(-(p{i}.a * t.z + p{i}.b))))
                            * (1.0 - 1.0 / (1.0 + exp(-(p{i}.a * t.z + p{i}.b))))
                            * t.z * t.z * {_PLATT_Q} + 0.5) AS BIGINT))
             AS BIGINT) AS hxx,
        CAST(sum(CAST(floor((1.0 / (1.0 + exp(-(p{i}.a * t.z + p{i}.b))))
                            * (1.0 - 1.0 / (1.0 + exp(-(p{i}.a * t.z + p{i}.b))))
                            * t.z * {_PLATT_Q} + 0.5) AS BIGINT))
             AS BIGINT) AS hxb,
        CAST(sum(CAST(floor((1.0 / (1.0 + exp(-(p{i}.a * t.z + p{i}.b))))
                            * (1.0 - 1.0 / (1.0 + exp(-(p{i}.a * t.z + p{i}.b))))
                            * {_PLATT_Q} + 0.5) AS BIGINT))
             AS BIGINT) AS hbb
      FROM t, p{i}
    ),
    p{i + 1} AS (
      SELECT
        p{i}.a - (CAST(g{i + 1}.hbb AS DOUBLE) * g{i + 1}.gx
                  - CAST(g{i + 1}.hxb AS DOUBLE) * g{i + 1}.gb)
                 / (CAST(g{i + 1}.hxx AS DOUBLE) * g{i + 1}.hbb
                    - CAST(g{i + 1}.hxb AS DOUBLE) * g{i + 1}.hxb) AS a,
        p{i}.b - (CAST(g{i + 1}.hxx AS DOUBLE) * g{i + 1}.gb
                  - CAST(g{i + 1}.hxb AS DOUBLE) * g{i + 1}.gx)
                 / (CAST(g{i + 1}.hxx AS DOUBLE) * g{i + 1}.hbb
                    - CAST(g{i + 1}.hxb AS DOUBLE) * g{i + 1}.hxb) AS b
      FROM p{i}, g{i + 1}
    )"""


@register(
    "ml_platt_scaling",
    oracle=f"""
    WITH {_SCORED_CTE},
    nn AS (
      SELECT CAST(sum(pos) AS BIGINT) AS np,
             CAST(sum(1 - pos) AS BIGINT) AS nn
      FROM scored
    ),
    t AS (
      SELECT CAST(s AS DOUBLE) / {LOGLOSS_Z_DIV} AS z,
             CASE WHEN pos = 1
                  THEN (CAST(nn.np AS DOUBLE) + 1) / (nn.np + 2)
                  ELSE 1.0 / (nn.nn + 2) END AS tgt
      FROM scored, nn
    ),
    p0 AS (
      SELECT CAST(1.0 AS DOUBLE) AS a,
             ln((CAST(nn.nn AS DOUBLE) + 1) / (nn.np + 1)) AS b
      FROM nn
    ),
    {",".join(_platt_step_sql(i).strip().lstrip() for i in range(PLATT_ITERS))}
    SELECT nn.np AS n_pos, nn.nn AS n_neg,
           floor(p{PLATT_ITERS}.a * 1000000 + 0.5) / 1000000 AS platt_a,
           floor(p{PLATT_ITERS}.b * 1000000 + 0.5) / 1000000 AS platt_b
    FROM p{PLATT_ITERS}, nn
    """,
)
def ml_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt sigmoid calibration of the linear probe: PLATT_ITERS
    unrolled Newton steps with 1e12-lattice gradient/Hessian sums —
    exact-replay iterative optimization as pure dataflow; see the
    block comment. Each step is one map-side aggregate over the pinned
    scored relation plus 1-row 2x2 arithmetic."""
    scored = _scored(spark, sf_dir).transform(pin_cache)
    nn = scored.agg(
        F.sum("pos").cast("bigint").alias("np"),
        F.sum(1 - F.col("pos")).cast("bigint").alias("nn"),
    )
    t = (
        scored.crossJoin(F.broadcast(nn))
        .select(
            (F.col("s").cast("double") / LOGLOSS_Z_DIV).alias("z"),
            F.when(
                F.col("pos") == 1,
                (F.col("np").cast("double") + 1) / (F.col("np") + 2),
            )
            .otherwise(1.0 / (F.col("nn") + 2))
            .alias("tgt"),
        )
        .transform(pin_cache)
    )
    params = nn.select(
        F.lit(1.0).alias("a"),
        F.log((F.col("nn").cast("double") + 1) / (F.col("np") + 1)).alias("b"),
    )
    q = F.lit(float(_PLATT_Q))
    for _ in range(PLATT_ITERS):
        p = 1.0 / (1.0 + F.exp(-(F.col("a") * F.col("z") + F.col("b"))))
        gsum = (
            t.crossJoin(F.broadcast(params))
            .select(
                F.floor((p - F.col("tgt")) * F.col("z") * q + F.lit(0.5))
                .cast("bigint")
                .alias("gx"),
                F.floor((p - F.col("tgt")) * q + F.lit(0.5))
                .cast("bigint")
                .alias("gb"),
                F.floor(p * (1.0 - p) * F.col("z") * F.col("z") * q + F.lit(0.5))
                .cast("bigint")
                .alias("hxx"),
                F.floor(p * (1.0 - p) * F.col("z") * q + F.lit(0.5))
                .cast("bigint")
                .alias("hxb"),
                F.floor(p * (1.0 - p) * q + F.lit(0.5)).cast("bigint").alias("hbb"),
            )
            .agg(
                F.sum("gx").cast("bigint").alias("gx"),
                F.sum("gb").cast("bigint").alias("gb"),
                F.sum("hxx").cast("bigint").alias("hxx"),
                F.sum("hxb").cast("bigint").alias("hxb"),
                F.sum("hbb").cast("bigint").alias("hbb"),
            )
        )
        det = (
            F.col("hxx").cast("double") * F.col("hbb")
            - F.col("hxb").cast("double") * F.col("hxb")
        )
        params = params.crossJoin(F.broadcast(gsum)).select(
            (
                F.col("a")
                - (
                    F.col("hbb").cast("double") * F.col("gx")
                    - F.col("hxb").cast("double") * F.col("gb")
                )
                / det
            ).alias("a"),
            (
                F.col("b")
                - (
                    F.col("hxx").cast("double") * F.col("gb")
                    - F.col("hxb").cast("double") * F.col("gx")
                )
                / det
            ).alias("b"),
        )
    return params.crossJoin(F.broadcast(nn)).select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        (F.floor(F.col("a") * 1000000 + F.lit(0.5)) / 1000000).alias("platt_a"),
        (F.floor(F.col("b") * 1000000 + F.lit(0.5)) / 1000000).alias("platt_b"),
    )


# --- KS score separation -----------------------------------------------------
# The credit-scoring / ranking-power headline metric: the maximum gap
# between the positive and negative score CDFs of the linear probe —
# "how separable are the classes at the best single threshold",
# reported next to AUC in every scorecard. Rides the stats_ks_test
# shape on the SCORE histogram: exact (c, cp) per distinct score, CDF
# fractions are exact-int/exact-int IEEE divisions, max over identical
# doubles is order-free. The score histogram is corpus-derived but the
# window is the two-level-prefix-free simple cumulative over it — the
# same domain-bounded-by-quantization argument as the AUC machinery's
# bucketed ranks does not apply here, so the cumulative rides the
# AUC bucket machinery (_with_prefix_counts) instead of a global
# single-partition window.
@register(
    "ml_ks_separation",
    oracle=f"""
    WITH {_SCORED_CTE},
    h AS (
      SELECT s, CAST(count(*) AS BIGINT) AS c,
             CAST(sum(pos) AS BIGINT) AS cp
      FROM scored GROUP BY s
    ),
    tot AS (
      SELECT CAST(sum(cp) AS BIGINT) AS n1,
             CAST(sum(c - cp) AS BIGINT) AS n0
      FROM h
    ),
    cum AS (
      SELECT sum(cp) OVER w AS ca, sum(c - cp) OVER w AS cb
      FROM h
      WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT tot.n1 AS n_pos, tot.n0 AS n_neg,
           floor(max(abs(CAST(ca AS DOUBLE) / tot.n1
                         - CAST(cb AS DOUBLE) / tot.n0))
                 * 1000000 + 0.5) / 1000000 AS ks_stat
    FROM cum, tot
    GROUP BY tot.n1, tot.n0
    """,
)
def ml_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max CDF gap between positive and negative probe scores (the
    scorecard KS) — exact integer histogram, bucketed two-level prefix
    cumulative (no corpus-sized window), 1-row max."""
    from pyspark import StorageLevel

    h = (
        _scored(spark, sf_dir)
        .groupBy("s")
        .agg(F.count("*").alias("c"), F.sum("pos").cast("bigint").alias("cp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # cumulative-inclusive per class: per-class prefixes via the bucketed
    # two-level machinery on each class's own histogram column
    hp = h.select(
        "s",
        F.col("cp").alias("c"),
        F.lit(0).cast("bigint").alias("cp"),
    ).transform(pin_cache)
    hn = h.select(
        "s",
        (F.col("c") - F.col("cp")).cast("bigint").alias("c"),
        F.lit(0).cast("bigint").alias("cp"),
    ).transform(pin_cache)
    rp = _with_prefix_counts(hp, keep_value=True).select(
        "s", (F.col("less") + F.col("c")).alias("ca")
    )
    rn = _with_prefix_counts(hn, keep_value=True).select(
        "s", (F.col("less") + F.col("c")).alias("cb")
    )
    tot = h.agg(
        F.sum("cp").cast("bigint").alias("n1"),
        F.sum(F.col("c") - F.col("cp")).cast("bigint").alias("n0"),
    )
    j = rp.join(rn, "s").crossJoin(F.broadcast(tot))
    gap = F.abs(
        F.col("ca").cast("double") / F.col("n1")
        - F.col("cb").cast("double") / F.col("n0")
    )
    return (
        j.groupBy("n1", "n0")
        .agg(F.max(gap).alias("mg"))
        .select(
            F.col("n1").alias("n_pos"),
            F.col("n0").alias("n_neg"),
            (F.floor(F.col("mg") * 1000000 + F.lit(0.5)) / 1000000).alias("ks_stat"),
        )
    )


# --- regression metrics ------------------------------------------------------
# The regression half of the eval surface (everything else grades
# classifiers/rankers): MAE, RMSE, R^2 and MAPE of a FIXED linear
# predictor yhat = REG_A * props.k + REG_B against the event value —
# the baseline-model scorecard every "predict the metric" pipeline
# starts from. Exactness: y and yhat live on the milli lattice
# (yhat's integer form 1000*yhat = REG_A_MILLI*k + REG_B_MILLI is
# exact), so the error moments (sum |e|, sum e^2, and the y moments
# for R^2's total sum of squares) are exact: the linear moments stay
# int64, while the squared moments (sse, syy) and the MAPE lattice sum
# (per-row ratio quantized 1e12) accumulate in DECIMAL(38,0) — their
# per-row terms pass int64 per-term but the corpus SUM does not (the
# 100x curve leg caught the int64 accumulator overflowing under ANSI
# mode); the TSS product n*syy then runs in double from the same exact
# decimal on both engines.
# ONE map-side-combined corpus aggregate, 1-row arithmetic.
REG_A_MILLI = 500  # yhat = 0.5 * k + 10  (milli: 500 * k + 10000)
REG_B_MILLI = 10000


@register(
    "ml_regression_metrics",
    oracle=f"""
    WITH p AS (
      SELECT CAST(floor(value * 1000 + 0.5) AS BIGINT) AS ym,
             {REG_A_MILLI} * CAST(json_extract(props, '$.k') AS BIGINT)
               + {REG_B_MILLI} AS fm
      FROM events
      WHERE value IS NOT NULL AND props IS NOT NULL AND json_valid(props)
        AND json_extract(props, '$.k') IS NOT NULL
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(abs(ym - fm)) AS BIGINT) AS sae,
             CAST(sum(CAST((ym - fm) * (ym - fm) AS DECIMAL(38, 0)))
                  AS DECIMAL(38, 0)) AS sse,
             CAST(sum(ym) AS BIGINT) AS sy,
             CAST(sum(CAST(ym * ym AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS syy,
             CAST(sum(CAST(CAST(floor(CAST(abs(ym - fm) AS DOUBLE) / ym
                                      * 1000000000000 + 0.5) AS BIGINT)
                           AS DECIMAL(38, 0))) AS DECIMAL(38, 0)) AS sap
      FROM p WHERE ym > 0
    )
    SELECT n,
           floor(CAST(sae AS DOUBLE) / n / 1000 * 1000000 + 0.5) / 1000000
             AS mae,
           floor(sqrt(CAST(sse AS DOUBLE) / n) / 1000 * 1000000 + 0.5)
             / 1000000 AS rmse,
           CASE WHEN CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0 THEN
             floor((1.0 - CAST(sse AS DOUBLE) * n
                          / (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                   * 1000000 + 0.5) / 1000000
           END AS r2,
           floor(CAST(sap AS DOUBLE) / 1000000000000 / n * 1000000 + 0.5)
             / 1000000 AS mape
    FROM m
    """,
)
def ml_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE / RMSE / R^2 / MAPE of the fixed linear baseline predictor
    on the milli lattice — exact integer error moments, one map-side
    aggregate; see the block comment."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    p = e.where(
        F.col("value").isNotNull() & F.col("props").isNotNull() & k.isNotNull()
    ).select(
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("ym"),
        (REG_A_MILLI * k + REG_B_MILLI).alias("fm"),
    ).where(F.col("ym") > 0)
    er = F.col("ym") - F.col("fm")
    m = p.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.abs(er)).cast("bigint").alias("sae"),
        F.sum((er * er).cast("decimal(38,0)")).cast("decimal(38,0)").alias("sse"),
        F.sum("ym").cast("bigint").alias("sy"),
        F.sum((F.col("ym") * F.col("ym")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(
            F.floor(
                F.abs(er).cast("double") / F.col("ym") * 1000000000000 + F.lit(0.5)
            )
            .cast("bigint")
            .cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("sap"),
    )
    nd = F.col("n").cast("double")
    tss = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    )
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return m.select(
        "n",
        q6(F.col("sae").cast("double") / F.col("n") / 1000).alias("mae"),
        q6(F.sqrt(F.col("sse").cast("double") / F.col("n")) / 1000).alias("rmse"),
        F.when(tss > 0, q6(1.0 - F.col("sse").cast("double") * nd / tss)).alias(
            "r2"
        ),
        q6(F.col("sap").cast("double") / 1000000000000 / F.col("n")).alias("mape"),
    )
