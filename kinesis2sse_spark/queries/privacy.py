"""Privacy / compliance operators — the release-gate checks a training-
data pipeline runs before shipping a corpus: k-anonymity over
quasi-identifier equivalence classes, l-diversity of a sensitive
attribute within those classes, and the generalization ladder that
picks the minimal coarsening at which a release becomes k-anonymous
(Sweeney 2002; Machanavajjhala et al. 2007).

No counterpart exists in the reference (kinesis2sse serves raw events);
these are first-class LLM-pipeline operators in the SURVEY §2 sense.

Scale notes (100 TB): every operator here is one hash-aggregate over
the corpus followed by arithmetic on the (bounded) equivalence-class
relation — |classes| = |QI value combinations|, orders of magnitude
below corpus size. The generalization ladder computes the FINEST level
with the corpus shuffle and derives every coarser level by re-
aggregating the class relation, so adding ladder rungs costs no extra
corpus passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table, pin_cache
from kinesis2sse_spark.registry import register

# fixture-calibrated so both regimes appear (documents QI class sizes
# run 1..16 at sf0.01): k=5 suppresses the long tail, l=2 fails the
# single-bucket classes
K_ANON = 5
L_DIVERSE = 2
SENSITIVE_BUCKET = 256  # n_chars // 256 is the "sensitive" attribute

# ladder: user_id // 10^level inside event_type; k chosen between the
# finest level's min class size and the coarsest's so the chosen level
# is interior (events: ~150 users x 5 types at sf0.01)
LADDER_LEVELS = 4
LADDER_K = 25


@register(
    "privacy_k_anonymity",
    oracle=f"""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS class_size,
           count(*) >= {K_ANON} AS is_k_anonymous
    FROM documents
    GROUP BY lang, source
    """,
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: every (lang, source) quasi-identifier
    equivalence class with its size and whether it meets k={K_ANON} —
    classes below k re-identify their members and must be suppressed
    or generalized before release. One map-side-combined hash
    aggregate; the class relation is |langs| x |sources|, constant in
    corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("class_size"),
        (F.count("*") >= K_ANON).alias("is_k_anonymous"),
    )


@register(
    "privacy_l_diversity",
    oracle=f"""
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT n_chars // {SENSITIVE_BUCKET}) AS BIGINT)
             AS n_sensitive_values,
           count(DISTINCT n_chars // {SENSITIVE_BUCKET}) >= {L_DIVERSE}
             AS is_l_diverse
    FROM documents
    GROUP BY lang, source
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: a k-anonymous class is still unsafe when the
    sensitive attribute is (near-)constant within it — homogeneity
    attack. Counts distinct sensitive buckets (n_chars//{SENSITIVE_BUCKET})
    per quasi-identifier class and flags classes below l={L_DIVERSE}.
    count(DISTINCT) over a grouped relation partial-aggregates
    map-side; still one corpus shuffle."""
    d = load_table(spark, sf_dir, "documents")
    # integer `div`, not double-divide-then-cast: double division
    # truncates toward zero for negatives and loses precision past
    # 2^53, while DuckDB's // floors — the repo's integer-div rule
    sens = F.expr(f"n_chars div {SENSITIVE_BUCKET}")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("class_size"),
        F.countDistinct(sens).alias("n_sensitive_values"),
        (F.countDistinct(sens) >= L_DIVERSE).alias("is_l_diverse"),
    )


def _ladder_oracle() -> str:
    per_level = " UNION ALL ".join(
        f"""
        SELECT CAST({lvl} AS BIGINT) AS level,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(n) AS BIGINT) AS min_class_size
        FROM (
          SELECT event_type, user_id // {10 ** lvl} AS bucket,
                 sum(n) AS n
          FROM finest GROUP BY event_type, bucket
        )
        """
        for lvl in range(LADDER_LEVELS)
    )
    return f"""
    WITH finest AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events GROUP BY event_type, user_id
    ),
    levels AS ({per_level})
    SELECT level, n_classes, min_class_size,
           min_class_size >= {LADDER_K} AS k_anonymous,
           min_class_size >= {LADDER_K}
             AND level = min(CASE WHEN min_class_size >= {LADDER_K}
                                  THEN level END) OVER () AS chosen
    FROM levels
    """


@register("privacy_generalization_ladder", oracle=_ladder_oracle())
def privacy_generalization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization ladder: coarsen the user_id quasi-identifier by
    powers of ten (level l -> user_id // 10^l, inside event_type) and
    pick the MINIMAL level whose every class reaches k={LADDER_K} —
    the standard utility-preserving release: generalize just enough,
    no more.

    Scale shape: the corpus shuffles ONCE into the finest
    (event_type, user_id) class counts; every coarser level re-
    aggregates that bounded class relation (coarser counts are exact
    sums of finer ones), so the ladder's height adds zero corpus
    passes. The chosen-level argmin runs as a window over
    {LADDER_LEVELS} rows."""
    e = load_table(spark, sf_dir, "events")
    # consumed by LADDER_LEVELS branches of one action -> eager pin
    # (the connected_components rule; see catalog.pin_cache)
    finest = e.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n")
    ).transform(pin_cache)

    levels = None
    for lvl in range(LADDER_LEVELS):
        bucket = F.expr(f"user_id div {10 ** lvl}")  # pure integer div, like the oracle's //
        lev = (
            finest.groupBy("event_type", bucket.alias("bucket"))
            .agg(F.sum("n").alias("n"))
            .agg(
                F.lit(lvl).cast("long").alias("level"),
                F.count("*").alias("n_classes"),
                F.min("n").alias("min_class_size"),
            )
        )
        levels = lev if levels is None else levels.unionAll(lev)

    w = Window.partitionBy()
    k_ok = F.col("min_class_size") >= LADDER_K
    min_ok_level = F.min(F.when(k_ok, F.col("level"))).over(w)
    return levels.select(
        "level",
        "n_classes",
        "min_class_size",
        k_ok.alias("k_anonymous"),
        (k_ok & (F.col("level") == min_ok_level)).alias("chosen"),
    )


# Randomized response (Warner 1965) — the LOCAL differential-privacy
# mechanism that rounds out the release-gate family above: each event's
# sensitive bit (did this user purchase?) is reported TRUTHFULLY with
# probability 3/4 and FLIPPED with probability 1/4, giving each
# individual report eps = ln(3) local DP, and the cohort-level rate is
# recovered from the noisy reports by the standard debiasing
# pi_hat = 2*observed - 1/2 (spelled in integers: (4*R - n) / (2n)).
# The coin is the repo's deterministic hash-uniform (multiplicative-
# hash integer threshold, never a double comparison), seeded past every
# other operator's replica id range so no pair of operators shares a
# split; flip iff u mod 4 == 0 makes the 3/4 keep probability EXACT,
# not a float approximation. Everything is int64 arithmetic until the
# three final fixed-shape divisions (floor-quantized at 1e-6), so the
# oracle replays the mechanism bit-for-bit — including the ground-truth
# columns that make the utility contract (|pi_hat - pi_true| small at
# cohort n, a property test) checkable.
RR_P = 1000000007
RR_SEED = 16384  # multiplier offset: above bootstrap (0-31), permutation
# (32-95) and FDR (96-8231) id ranges — no shared splits
RR_COHORT = 5  # user_id div 5: 3 cohorts at sf0.001, 30 at sf0.01 —
# scales with the user population so per-cohort n stays ~constant


@register(
    "privacy_randomized_response",
    oracle=f"""
    WITH ev AS (
      SELECT user_id // {RR_COHORT} AS cohort,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b,
             CASE WHEN ((event_id % {RR_P} + {RR_SEED} * 7919)
                        * 2654435761) % {RR_P} % 4 = 0 THEN 1 ELSE 0 END AS flip
      FROM events
    ),
    rep AS (
      SELECT cohort, b, CASE WHEN flip = 1 THEN 1 - b ELSE b END AS r FROM ev
    )
    SELECT cohort,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(b) AS BIGINT) AS n_true,
           CAST(sum(r) AS BIGINT) AS n_reported,
           floor(CAST(sum(b) AS DOUBLE) / count(*) * 1000000 + 0.5) / 1000000
             AS pi_true,
           floor(CAST(4 * sum(r) - count(*) AS DOUBLE) / (2 * count(*))
                 * 1000000 + 0.5) / 1000000 AS pi_hat
    FROM rep GROUP BY cohort
    """,
)
def privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized response per user cohort — see the block
    comment for the mechanism, the exact-3/4 integer coin, and the
    debiasing algebra. Scale shape: a map-side projection (hash, flip,
    report — no shuffle) followed by ONE map-side-combined cohort
    aggregate; cohorts grow with the user population, not with events,
    and nothing but the per-cohort counters crosses the exchange. The
    ground-truth columns ride along because this operator's job in a
    pipeline is the A/B: prove the mechanism's report stream still
    estimates the cohort rate (utility) while each individual row
    carries eps = ln(3) deniability (privacy)."""
    e = load_table(spark, sf_dir, "events")
    b = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    flip = F.when(
        F.expr(
            f"((event_id % {RR_P} + {RR_SEED} * 7919) * 2654435761)"
            f" % {RR_P} % 4"
        )
        == 0,
        1,
    ).otherwise(0)
    rep = e.select(
        F.expr(f"user_id div {RR_COHORT}").alias("cohort"),
        b.alias("b"),
        F.when(flip == 1, 1 - b).otherwise(b).alias("r"),
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return rep.groupBy("cohort").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("b").cast("bigint").alias("n_true"),
        F.sum("r").cast("bigint").alias("n_reported"),
        q6(F.sum("b").cast("double") / F.count("*")).alias("pi_true"),
        q6(
            (4 * F.sum("r") - F.count("*")).cast("double")
            / (2 * F.count("*"))
        ).alias("pi_hat"),
    )


# t-closeness (Li, Li & Venkatasubramanian 2007) — the third member of
# the classic anonymity triad: l-diversity counts distinct sensitive
# values per class but a class can be l-diverse and still leak (its
# distribution may be far from the population's). t-closeness bounds
# the Earth Mover's Distance between each quasi-identifier class's
# sensitive-attribute distribution and the GLOBAL one. For an ordered
# 1-D attribute with unit ground distance between adjacent buckets,
# EMD = sum_i |cum(P)_i - cum(Q)_i| / (B - 1) — and with integer
# counts the cumulative difference at bucket i is the RATIONAL
# (cumg_i*C - cumc_i*G) / (G*C) (G, C = global/class totals), so both
# the EMD numerator and the threshold test run in EXACT int64
# arithmetic: t = {0}.{1} passes iff {2}*sum|num| <= {3}*G*C*(B-1).
# Only the reported emd column is a (fixed-shape, floor-quantized)
# double. One corpus aggregate to the class x bucket grid; the grid
# itself is |classes| x |buckets| — domain-bounded.
T_CLOSE_NUM = 1  # threshold t = 1/5 = 0.2 as an exact rational
T_CLOSE_DEN = 5


@register(
    "privacy_t_closeness",
    oracle=f"""
    WITH base AS (
      SELECT lang, source, n_chars // {SENSITIVE_BUCKET} AS b
      FROM documents
    ),
    buckets AS (SELECT DISTINCT b FROM base),
    nb AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets FROM buckets),
    classes AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS class_size
      FROM base GROUP BY lang, source
    ),
    cls_cnt AS (
      SELECT lang, source, b, CAST(count(*) AS BIGINT) AS c
      FROM base GROUP BY lang, source, b
    ),
    gcnt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS g FROM base GROUP BY b
    ),
    gt AS (SELECT CAST(sum(g) AS BIGINT) AS gtot FROM gcnt),
    grid AS (
      SELECT cl.lang, cl.source, cl.class_size, bu.b,
             coalesce(cc.c, 0) AS c, gl.g
      FROM classes cl
      CROSS JOIN buckets bu
      JOIN gcnt gl ON gl.b = bu.b
      LEFT JOIN cls_cnt cc
        ON cc.lang = cl.lang AND cc.source = cl.source AND cc.b = bu.b
    ),
    cum AS (
      SELECT lang, source, class_size, b,
             CAST(sum(g) OVER w AS BIGINT) AS cumg,
             CAST(sum(c) OVER w AS BIGINT) AS cumc
      FROM grid
      WINDOW w AS (PARTITION BY lang, source ORDER BY b)
    ),
    emd AS (
      SELECT lang, source, class_size,
             CAST(sum(abs(cumg * class_size - cumc * gt.gtot)) AS BIGINT) AS num
      FROM cum CROSS JOIN gt
      GROUP BY lang, source, class_size, gt.gtot
    )
    SELECT e.lang, e.source, e.class_size,
           floor(CAST(e.num AS DOUBLE)
                 / (CAST(g.gtot AS DOUBLE) * e.class_size * (n.n_buckets - 1))
                 * 1000000 + 0.5) / 1000000 AS emd,
           {T_CLOSE_DEN} * e.num
             <= {T_CLOSE_NUM} * g.gtot * e.class_size * (n.n_buckets - 1)
             AS is_t_close
    FROM emd e CROSS JOIN gt g CROSS JOIN nb n
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit over the (lang, source) classes — see the
    block comment for the exact-rational EMD. Plan: one corpus
    aggregate to (class, bucket) counts; the dense class x bucket grid
    (domain-bounded) forms by crossing the class relation with the
    bucket relation and left-joining counts; cumulative sums ride a
    class-partitioned window over <= |buckets| rows; the threshold
    test is pure int64. Headroom: |num| <= n_buckets * G * C
    <= ~1e3 * (6e4)^2 ~ 4e12 at sf0.1 — promote to DECIMAL(38,0)
    past ~1e9-row corpora (same plan)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang", "source", F.expr(f"n_chars div {SENSITIVE_BUCKET}").alias("b")
    ).transform(pin_cache)
    buckets = base.select("b").distinct()
    nb = buckets.agg(F.count("*").cast("bigint").alias("n_buckets"))
    classes = base.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("class_size")
    )
    cls_cnt = base.groupBy("lang", "source", "b").agg(
        F.count("*").cast("bigint").alias("c")
    )
    glob = base.groupBy("b").agg(F.count("*").cast("bigint").alias("g"))
    gt = glob.agg(F.sum("g").cast("bigint").alias("gtot"))
    grid = (
        classes.crossJoin(F.broadcast(buckets))
        .join(F.broadcast(glob), "b")
        .join(cls_cnt, ["lang", "source", "b"], "left")
        .select(
            "lang",
            "source",
            "class_size",
            "b",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            "g",
        )
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "lang",
        "source",
        "class_size",
        F.sum("g").over(w).cast("bigint").alias("cumg"),
        F.sum("c").over(w).cast("bigint").alias("cumc"),
    )
    emd = (
        cum.crossJoin(F.broadcast(gt))
        .groupBy("lang", "source", "class_size", "gtot")
        .agg(
            F.sum(
                F.abs(
                    F.col("cumg") * F.col("class_size")
                    - F.col("cumc") * F.col("gtot")
                )
            )
            .cast("bigint")
            .alias("num")
        )
    )
    return emd.crossJoin(F.broadcast(nb)).select(
        "lang",
        "source",
        "class_size",
        (
            F.floor(
                F.col("num").cast("double")
                / (
                    F.col("gtot").cast("double")
                    * F.col("class_size")
                    * (F.col("n_buckets") - 1)
                )
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("emd"),
        (
            T_CLOSE_DEN * F.col("num")
            <= T_CLOSE_NUM
            * F.col("gtot")
            * F.col("class_size")
            * (F.col("n_buckets") - 1)
        ).alias("is_t_close"),
    )


# Differentially-private histogram via the GEOMETRIC MECHANISM (Ghosh,
# Roughgarden & Sundararajan 2009) — the discrete counterpart of
# Laplace noise and the utility-optimal eps-DP mechanism for count
# queries (sensitivity 1). Noise ~ two-sided geometric with
# alpha = e^(-eps); choosing eps = ln 2 makes alpha = 1/2, so EVERY
# probability is a dyadic rational: P(0) = 1/3, P(+-k) = (1/3)*2^-k —
# the full inverse CDF is exact integer thresholds out of
# M = 3 * 2^B, no float anywhere, and the oracle replays the draw
# bit-for-bit. Support truncates at +-B (tail mass 2^(1-B)/3 folded
# into the extreme buckets — a truncated-geometric variant, documented
# standard practice for bounded-noise deployments). The noise draw is
# keyed on the CELL (its alphabetical rank), one draw per histogram
# bucket, exactly the mechanism's unit of release.
DP_B = 8  # truncation half-width; tail mass folded = 2/768
DP_M = 3 * (1 << DP_B)  # 768
DP_SEED = 163840  # above every other operator's seed offset range


def _dp_noise_sql(u_expr: str) -> str:
    """Exact inverse-CDF CASE ladder for the alpha=1/2 two-sided
    geometric over [-B, B], in integer units of DP_M — generated once,
    inlined verbatim into BOTH engines."""
    ws = {
        k: (1 << (DP_B - abs(k))) for k in range(-DP_B, DP_B + 1)
    }
    ws[-DP_B] += 1  # the two leftover units of truncated tail mass
    ws[DP_B] += 1
    assert sum(ws.values()) == DP_M
    cum, parts = 0, []
    for k in range(-DP_B, DP_B + 1):
        cum += ws[k]
        parts.append((cum, k))
    clauses = " ".join(
        f"WHEN {u_expr} < {t} THEN {k}" for t, k in parts[:-1]
    )
    return f"(CASE {clauses} ELSE {parts[-1][1]} END)"


_DP_U = f"((li + {DP_SEED}) * 2654435761) % {DP_M}"


@register(
    "privacy_dp_histogram",
    oracle=f"""
    WITH h AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
      FROM events GROUP BY event_type
    ),
    lr AS (
      SELECT event_type, n_true,
             row_number() OVER (ORDER BY event_type) - 1 AS li
      FROM h
    )
    SELECT event_type, n_true,
           CAST({_dp_noise_sql(_DP_U)} AS BIGINT) AS noise,
           CAST(greatest(n_true + {_dp_noise_sql(_DP_U)}, 0) AS BIGINT)
             AS n_noisy
    FROM lr
    """,
)
def privacy_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eps-DP histogram of events per type under the geometric
    mechanism — see the block comment for the exact dyadic inverse
    CDF (eps = ln 2, alpha = 1/2, truncated at +-{DP_B}). Scale
    shape: ONE map-side-combined count aggregate; the noise draw is a
    projection over the |cells|-row histogram (cells bounded by the
    type domain, not the stream), so nothing but per-cell counters
    crosses the exchange. n_true rides along for the utility A/B,
    same contract as privacy_randomized_response — production
    releases only (event_type, n_noisy).

    PRODUCTION NOTE: the seeded draw here is a deterministic
    REPRODUCIBILITY SIMULATION of the mechanism (it exists so the
    DuckDB oracle can replay the release bit-for-bit); it provides
    zero actual privacy. A real deployment must substitute a
    cryptographically secure RNG for the hash-of-rank draw — the
    mechanism math (exact dyadic inverse CDF) is unchanged."""
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_true"))
    )
    lr = h.select(
        "event_type",
        "n_true",
        (F.row_number().over(Window.orderBy("event_type")) - 1)
        .cast("long")
        .alias("li"),
    )
    noise = F.expr(_dp_noise_sql(_DP_U)).cast("bigint")
    return lr.select(
        "event_type",
        "n_true",
        noise.alias("noise"),
        F.greatest(F.col("n_true") + noise, F.lit(0)).cast("bigint").alias("n_noisy"),
    )


# Per-user contribution bounding — the preprocessing step every
# user-level DP aggregate needs (Wilson et al. 2020, "Differentially
# Private SQL"): before noise can give user-level guarantees, each
# user's influence on any aggregate must be capped, so keep at most
# PRIV_USER_CAP events per user (deterministic keep-first-by-event-time
# rule) and everything downstream has sensitivity <= CAP per user
# instead of unbounded. Raw aggregates ride along for the utility A/B,
# same contract as the other privacy rungs.
PRIV_USER_CAP = 4


@register(
    "privacy_contribution_bounding",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts ASC NULLS FIRST, event_id)
               AS rn
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(sum(v) AS BIGINT) AS sum_raw_milli,
           CAST(sum(CASE WHEN rn <= {PRIV_USER_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bounded,
           CAST(sum(CASE WHEN rn <= {PRIV_USER_CAP} THEN v ELSE 0 END)
                AS BIGINT) AS sum_bounded_milli
    FROM r GROUP BY event_type
    """,
)
def privacy_contribution_bounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user contribution bounding to PRIV_USER_CAP events — see
    the block comment. Scale shape: ONE row_number window partitioned
    by user (the natural shuffle key; no global order anywhere), then
    a map-side-combined per-type aggregate; values integerized at
    milli-units so both engines sum exact int64. Null timestamps sort
    FIRST explicitly — Spark's ASC default — pinned in the oracle so
    the keep-first rule is engine-invariant."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        "ts",
        "event_id",
    )
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(
            F.col("ts").asc_nulls_first(), F.col("event_id")
        )
    )
    r = e.withColumn("rn", rn)
    keep = F.col("rn") <= PRIV_USER_CAP
    return r.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_raw"),
        F.sum("v").cast("bigint").alias("sum_raw_milli"),
        F.sum(keep.cast("int")).cast("bigint").alias("n_bounded"),
        F.sum(F.when(keep, F.col("v")).otherwise(0))
        .cast("bigint")
        .alias("sum_bounded_milli"),
    )


# User-level eps-DP mean — the composition the previous two rungs
# exist for (Wilson et al. 2020): (1) bound each user to
# PRIV_USER_CAP events (keep-first rule, privacy_contribution_bounding),
# (2) clip each user's bounded value-sum into [-DP_CLIP, DP_CLIP]
# milli-units, so one user moves the corpus sum by at most DP_CLIP;
# (3) QUANTIZE the clipped sum to multiples of DP_CLIP and add
# DP_CLIP * Z with Z the exact dyadic two-sided geometric of
# privacy_dp_histogram. On the DP_CLIP lattice a user-level neighbor
# moves the quantized sum by at most one step, so the release is
# eps = ln 2 user-level DP — the quantization is what makes the
# scaled-noise construction exact rather than approximate, and it
# costs at most DP_CLIP/2 bias, folded into the reported error budget.
# The user count is released through the same mechanism (sensitivity
# 1, unscaled noise). True values ride along for the utility A/B.
DP_CLIP = 200_000  # milli-units: one user's max |contribution| to the sum
DP_MEAN_SEED = 163900  # distinct draws for the sum and count cells


def _lattice_round_sql(x: str, step: int, div_op: str) -> str:
    """Round-half-up of ``x`` to multiples of ``step`` in exact integer
    arithmetic: floor((2x + step) / (2*step)) * step. Both engines'
    integer division TRUNCATES TOWARD ZERO (`div` in Spark, `//` in
    DuckDB — verified), which for a negative numerator is NOT floor —
    a bare (2x+step) div (2*step) would give a double-width zero bucket
    for sums in (-3*step/2, -step/2) (r12 advice). So the floor is
    spelled sign-safely: for a >= 0 truncation IS floor; for a < 0,
    floor(a/b) = -ceil(-a/b) = -((-a + b - 1) trunc-div b). One
    generator emits both engines' spellings so they cannot drift."""
    a = f"(2 * {x} + {step})"
    b = 2 * step
    return (
        f"(CASE WHEN {a} >= 0 THEN ({a} {div_op} {b}) "
        f"ELSE -((-{a} + {b - 1}) {div_op} {b}) END) * {step}"
    )


@register(
    "privacy_dp_mean",
    oracle=f"""
    WITH r AS (
      SELECT user_id,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts ASC NULLS FIRST, event_id) AS rn
      FROM events
    ),
    pu AS (
      SELECT user_id,
             least(greatest(CAST(sum(CASE WHEN rn <= {PRIV_USER_CAP}
                                          THEN v ELSE 0 END) AS BIGINT),
                            -{DP_CLIP}), {DP_CLIP}) AS cs
      FROM r GROUP BY user_id
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(cs) AS BIGINT) AS sum_clipped
      FROM pu
    ),
    qz AS (
      SELECT n_users, sum_clipped,
             -- round-half-up to the DP_CLIP lattice, sign-safe floor
             -- form (see _lattice_round_sql)
             {_lattice_round_sql("sum_clipped", DP_CLIP, "//")} AS sum_q,
             {_dp_noise_sql(f"(({DP_MEAN_SEED}) * 2654435761) % {DP_M}")}
               AS z_sum,
             {_dp_noise_sql(f"(({DP_MEAN_SEED + 1}) * 2654435761) % {DP_M}")}
               AS z_n
      FROM agg
    )
    SELECT n_users, sum_clipped,
           CAST(sum_q AS BIGINT) AS sum_quantized,
           CAST(z_sum AS BIGINT) AS noise_steps,
           CAST(sum_q + z_sum * {DP_CLIP} AS BIGINT) AS dp_sum_milli,
           CAST(greatest(n_users + z_n, 1) AS BIGINT) AS dp_n_users,
           floor(CAST(sum_q + z_sum * {DP_CLIP} AS DOUBLE)
                 / greatest(n_users + z_n, 1) * 1000 + 0.5) / 1000000
             AS dp_mean,
           floor(CAST(sum_clipped AS DOUBLE) / n_users * 1000 + 0.5)
             / 1000000 AS clipped_mean
    FROM qz
    """,
)
def privacy_dp_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level eps-DP mean event value — see the block comment for
    the bound→clip→quantize→noise construction and the exactness
    argument. Scale shape: one per-user window (shuffled on user_id,
    the natural key), one map-side-combined per-user aggregate, then a
    1-row release; the noise draws are constants folded at plan time.
    Both released quantities (sum, user count) go through the same
    dyadic geometric mechanism; dp_mean divides the two releases —
    post-processing, so the eps budget is the two draws' composition.

    PRODUCTION NOTE: DP_MEAN_SEED makes the two noise draws
    compile-time constants — a deterministic reproducibility
    simulation for oracle hash-matching that provides zero actual
    privacy. A real release must replace the seeded draws with a
    cryptographically secure RNG; everything else (bound → clip →
    quantize → noise) carries over unchanged."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        "ts",
        "event_id",
    )
    rn = F.row_number().over(
        W.partitionBy("user_id").orderBy(
            F.col("ts").asc_nulls_first(), F.col("event_id")
        )
    )
    pu = (
        e.withColumn("rn", rn)
        .groupBy("user_id")
        .agg(
            F.least(
                F.greatest(
                    F.sum(
                        F.when(F.col("rn") <= PRIV_USER_CAP, F.col("v")).otherwise(0)
                    ).cast("bigint"),
                    F.lit(-DP_CLIP),
                ),
                F.lit(DP_CLIP),
            ).alias("cs")
        )
    )
    agg = pu.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("cs").cast("bigint").alias("sum_clipped"),
    )
    sum_q = F.expr(_lattice_round_sql("sum_clipped", DP_CLIP, "div"))
    z_sum = F.expr(
        _dp_noise_sql(f"(({DP_MEAN_SEED}) * 2654435761) % {DP_M}")
    ).cast("bigint")
    z_n = F.expr(
        _dp_noise_sql(f"(({DP_MEAN_SEED + 1}) * 2654435761) % {DP_M}")
    ).cast("bigint")
    dp_sum = (sum_q + z_sum * DP_CLIP).cast("bigint")
    dp_n = F.greatest(F.col("n_users") + z_n, F.lit(1)).cast("bigint")
    q3 = lambda c: F.floor(c * 1000 + F.lit(0.5)) / 1000000  # noqa: E731
    return agg.select(
        "n_users",
        "sum_clipped",
        sum_q.cast("bigint").alias("sum_quantized"),
        z_sum.alias("noise_steps"),
        dp_sum.alias("dp_sum_milli"),
        dp_n.alias("dp_n_users"),
        q3(dp_sum.cast("double") / dp_n).alias("dp_mean"),
        q3(F.col("sum_clipped").cast("double") / F.col("n_users")).alias(
            "clipped_mean"
        ),
    )


# One-shot DP top-k selection (Durfee & Rogers 2019, "Practical
# Differentially Private Top-k Selection with Pay-what-you-get
# Composition"): add independent noise to every cell's count, release
# the IDENTITIES and noisy counts of the k largest noisy cells. Cells
# here are (event_type, props.k decile) — a 2-level domain-bounded
# grid (types x 10 buckets), the shape of a "which segments are
# hottest" release. Noise = the same exact dyadic two-sided geometric
# as privacy_dp_histogram (eps = ln 2 per cell), draw keyed on the
# cell's alphabetical rank under a dedicated seed offset. Exactly
# DP_TOPK_K rows release at ANY scale (a selection, not a threshold),
# ranked by (noisy count DESC, cell) for a deterministic total order.
DP_TOPK_K = 10
DP_TOPK_SEED = 164000


@register(
    "privacy_dp_topk",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST(CAST(json_extract(props, '$.k') AS BIGINT) // 10
                  AS BIGINT) AS k_decile,
             CAST(count(*) AS BIGINT) AS n_true
      FROM events GROUP BY 1, 2
    ),
    lr AS (
      SELECT event_type, k_decile, n_true,
             row_number() OVER (ORDER BY event_type, k_decile) - 1 AS li
      FROM h
    ),
    nz AS (
      SELECT event_type, k_decile, n_true,
             CAST(n_true + {_dp_noise_sql(_DP_U.replace(str(DP_SEED), str(DP_TOPK_SEED)))}
                  AS BIGINT) AS n_noisy
      FROM lr
    ),
    rk AS (
      SELECT event_type, k_decile, n_true, n_noisy,
             row_number() OVER (ORDER BY n_noisy DESC, event_type, k_decile)
               AS release_rank
      FROM nz
    )
    SELECT CAST(release_rank AS BIGINT) AS release_rank,
           event_type, k_decile, n_noisy, n_true
    FROM rk WHERE release_rank <= {DP_TOPK_K}
    """,
)
def privacy_dp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot eps-DP top-k cell selection over the (event_type,
    props.k decile) grid — see the block comment. Scale shape: ONE
    map-side-combined count over a domain-bounded cell grid (types x
    10 deciles — the grid, not the stream, crosses the exchange), the
    noise projection over |cells| rows, and a WindowGroupLimit-prunable
    global top-k over |cells| rows. n_true rides along for the utility
    A/B; production releases only (cell identity, n_noisy).

    PRODUCTION NOTE: the seeded draw is a deterministic
    reproducibility simulation for oracle hash-matching and provides
    zero actual privacy — substitute a cryptographically secure RNG
    before any real release."""
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 10")
            .cast("bigint")
            .alias("k_decile"),
        )
        .agg(F.count("*").cast("bigint").alias("n_true"))
    )
    lr = h.select(
        "event_type",
        "k_decile",
        "n_true",
        (
            F.row_number().over(Window.orderBy("event_type", "k_decile")) - 1
        )
        .cast("long")
        .alias("li"),
    )
    noise = F.expr(
        _dp_noise_sql(_DP_U.replace(str(DP_SEED), str(DP_TOPK_SEED)))
    ).cast("bigint")
    nz = lr.select(
        "event_type",
        "k_decile",
        "n_true",
        (F.col("n_true") + noise).cast("bigint").alias("n_noisy"),
    )
    rk = F.row_number().over(
        Window.orderBy(
            F.col("n_noisy").desc(), F.col("event_type"), F.col("k_decile")
        )
    )
    return (
        nz.withColumn("release_rank", rk.cast("bigint"))
        .filter(F.col("release_rank") <= DP_TOPK_K)
        .select("release_rank", "event_type", "k_decile", "n_noisy", "n_true")
    )


# DP quantile via the EXPONENTIAL MECHANISM (McSherry & Talwar 2007;
# the quantile instantiation is Smith 2011): release the median of
# the per-user event-count distribution by scoring every cell of a
# fixed candidate lattice with u(c) = -|2*rank(c) - n| (twice the
# rank distance to the median, exact int64) and sampling one
# candidate with probability proportional to exp(eps * u / (2 * du)).
# Sampling is replayed with the Gumbel-max trick: per-candidate
# g_c = -ln(-ln(u_c)) from a hash-seeded uniform, selected candidate
# = argmax(score_c + g_c) — distributionally identical to the
# mechanism and a pure argmax, so both engines replay it exactly.
# NOTE: the hash-seeded uniform exists for oracle hash-matching and
# provides ZERO actual privacy — a production release must substitute
# a cryptographically secure RNG for the draw (module convention, see
# privacy_dp_histogram).
#
# Scale shape: the corpus collapses to per-user counts with one
# map-side aggregate (user_id is the natural key); counts bucket onto
# the DP_Q_CELLS-cell lattice (histogram, map-side combined); ranks
# cumulate in a window over the 101-row domain-bounded cell relation;
# the argmax is a global top-1. Exactness: rank arithmetic is int64
# end to end; score + gumbel is one fixed-shape IEEE expression from
# exact ints, 1e9-quantized before the argmax so the engines' orders
# cannot diverge; tie-broken by smallest candidate.
DP_Q_STEP = 10  # lattice step, events per user
DP_Q_CELLS = 100  # cells 0..100 -> candidates 0, 10, ..., 1000
DP_Q_SEED = 164100  # dedicated seed offset (dp_topk ends at 164000)
DP_Q_M = 1 << 20  # uniform-draw modulus
DP_Q_EPS_HALF = "CAST(0.34657359027997264 AS DOUBLE)"  # ln(2)/2

_DP_Q_U = f"(((ci + {DP_Q_SEED}) * 2654435761) % {DP_Q_M})"


@register(
    "privacy_dp_quantile",
    oracle=f"""
    WITH uc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT least({DP_Q_CELLS}, c // {DP_Q_STEP}) AS cell,
             CAST(count(*) AS BIGINT) AS m
      FROM uc GROUP BY 1
    ),
    lattice AS (
      SELECT unnest(generate_series(0, {DP_Q_CELLS})) AS ci
    ),
    r AS (
      SELECT l.ci,
             CAST(COALESCE(sum(c2.m), 0) AS BIGINT) AS rnk,
             (SELECT CAST(sum(m) AS BIGINT) FROM cells) AS n
      FROM lattice l LEFT JOIN cells c2 ON c2.cell <= l.ci
      GROUP BY l.ci
    ),
    sc AS (
      SELECT ci, rnk, n,
             -abs(2 * rnk - n) AS u,
             CAST(floor((CAST(-abs(2 * rnk - n) AS DOUBLE) / 2.0
                         * {DP_Q_EPS_HALF}
                         - ln(-ln((CAST({_DP_Q_U} AS DOUBLE) + 0.5)
                                  / {DP_Q_M})))
                        * 1000000000 + 0.5) AS BIGINT) AS total_q
      FROM r
    )
    SELECT CAST(ci * {DP_Q_STEP} AS BIGINT) AS dp_median,
           n AS n_users, u AS utility, total_q
    FROM sc ORDER BY total_q DESC, ci LIMIT 1
    """,
)
def privacy_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eps-DP median of per-user event count via the exponential
    mechanism, Gumbel-max replayed — see the block comment (and the
    module-wide note: the deterministic draw is a reproducibility
    simulation; substitute secret randomness before any real
    release)."""
    e = load_table(spark, sf_dir, "events")
    uc = e.groupBy("user_id").agg(F.count("*").cast("bigint").alias("c"))
    cells = uc.groupBy(
        F.least(F.lit(DP_Q_CELLS).cast("bigint"), F.expr(f"c div {DP_Q_STEP}")).alias(
            "cell"
        )
    ).agg(F.count("*").cast("bigint").alias("m")).transform(pin_cache)
    n1 = cells.agg(F.sum("m").cast("bigint").alias("n"))
    lattice = spark.range(0, DP_Q_CELLS + 1).select(F.col("id").alias("ci"))
    r = (
        lattice.join(
            F.broadcast(cells), F.col("cell") <= F.col("ci"), "left"
        )
        .groupBy("ci")
        .agg(F.coalesce(F.sum("m"), F.lit(0)).cast("bigint").alias("rnk"))
        .crossJoin(F.broadcast(n1))
    )
    u = -F.abs(2 * F.col("rnk") - F.col("n"))
    gum = -F.log(
        -F.log(
            (F.expr(_DP_Q_U).cast("double") + 0.5) / DP_Q_M
        )
    )
    total = u.cast("double") / 2.0 * F.expr(DP_Q_EPS_HALF) + gum
    sc = r.select(
        "ci",
        "rnk",
        "n",
        u.alias("u"),
        F.floor(total * 1000000000 + F.lit(0.5)).cast("bigint").alias("total_q"),
    )
    return (
        sc.orderBy(F.col("total_q").desc(), "ci")
        .limit(1)
        .select(
            (F.col("ci") * DP_Q_STEP).cast("bigint").alias("dp_median"),
            F.col("n").alias("n_users"),
            F.col("u").alias("utility"),
            "total_q",
        )
    )
