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

from kinesis2sse_spark.catalog import load_table
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


@register("ml_auc_roc", oracle=_AUC_ORACLE)
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

    # persisted: the histogram feeds BOTH the bucket-subtotal aggregate
    # and the within-bucket rank join
    h = (
        _scored(spark, sf_dir)
        .groupBy("s")
        .agg(F.count("*").alias("c"), F.sum("pos").cast("bigint").alias("cp"))
        .withColumn("k", F.expr(f"s div {AUC_BUCKET}"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ks = h.groupBy("k").agg(F.sum("c").alias("kc"))
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    off = ks.select("k", (F.sum("kc").over(wk) - F.col("kc")).alias("off"))
    ww = (
        Window.partitionBy("k")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = h.join(F.broadcast(off), "k").select(
        "c",
        "cp",
        (F.col("off") + F.sum("c").over(ww) - F.col("c")).cast("bigint").alias("less"),
    )
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
    from pyspark import StorageLevel

    s = _scored(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
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
