"""Aggregation operators — hash agg (partial+final is automatic in Spark),
count/sum/avg/min/max, count distinct, approx_count_distinct, min_by/max_by,
rollup/cube/grouping sets, pivot, exact percentile, filtered aggregates.

Floating-point convention: every double-valued aggregate is rounded to a
fixed scale on BOTH the Spark and oracle side so summation order can't
flip the driver's value hash (doubles sum in partition order on Spark and
scan order in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table, pin_cache
from kinesis2sse_spark.registry import register


@register(
    "q1_pricing_summary",
    bench=True,
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter (pushed to parquet) + 8-agg hash
    aggregate. Partial aggregation runs map-side; only 4 groups shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


@register("agg_approx_count_distinct", oracle=None)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch — approximate, so no value-exact oracle (the driver's
    rows-only check applies). At 100 TB this replaces exact distinct
    counts that would shuffle every key."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts")
    )


@register("agg_hll_sketch", oracle=None)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches HLL: build mergeable sketches per group — at 100 TB
    the sketches union across partitions/days without re-scanning, unlike
    exact distinct. Estimate ≠ exact → rows-only check."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey")).alias("est_parts"),
        F.hll_sketch_estimate(F.hll_sketch_agg("l_suppkey")).alias("est_supps"),
    )


@register(
    "agg_min_max_by",
    oracle="""
    SELECT event_type, event_id AS top_event_id, user_id AS top_user_id
    FROM (
      SELECT event_type, event_id, user_id,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with a unique (value, event_id) struct key — the same
    lexicographic-argmax primitive the as-of lookup uses (reference
    timestamp2offset.go:60-68). Oracle expresses it as a row_number
    window because DuckDB's max_by lacks struct keys."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("max_by(event_id, struct(value, event_id))").alias("top_event_id"),
        F.expr("max_by(user_id, struct(value, event_id))").alias("top_user_id"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known engine-semantic edge (applies to the whole grouping-set
    family here: rollup/cube/grouping_id/grouping_sets): on an EMPTY
    input, DuckDB emits the () grand-total row (count 0, SQL-standard
    global-aggregate behavior) while Spark emits zero rows. Documented
    rather than papered over — synthesizing a grand-total row would
    distort the operator under test, and the driver fixtures are never
    empty (found by the round-7 empty-fixture differential audit)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("sum_price")
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
           CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() markers distinguish real NULL group values from rollup
    subtotal rows — required for correct downstream consumption of any
    rollup/cube output."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count("*").alias("n"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return piv


@register(
    "agg_stats",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd,
           round(var_samp(value), 6) AS var,
           round(min(value), 2) AS min_v,
           round(max(value), 2) AS max_v,
           round(avg(value), 6) AS avg_v
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.round(F.min("value"), 2).alias("min_v"),
        F.round(F.max("value"), 2).alias("max_v"),
        F.round(F.avg("value"), 6).alias("avg_v"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY event_type
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (Spark `percentile` ≡ DuckDB
    `quantile_cont`). The scale path is `approx_percentile` (KLL/GK
    sketch), benchmarked separately without an oracle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
    )


@register(
    "agg_filtered",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase_value,
           count(*) AS n_total
    FROM events
    GROUP BY user_id
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERed aggregates — one pass computing several conditional
    aggregates, instead of N self-joins."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 2
        ).alias("purchase_value"),
        F.count("*").alias("n_total"),
    )


@register(
    "agg_corr_regr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS cv_samp,
           round(covar_pop(l_extendedprice, l_quantity), 4) AS cv_pop,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistical aggregates — corr / covar / least-squares
    regression, all single-pass partial-aggregable (map-side combine of
    (n, Σx, Σy, Σxy, Σx², Σy²) moments — the reduction that scales to
    any row count with O(groups) state)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("cv_samp"),
        F.round(F.covar_pop("l_extendedprice", "l_quantity"), 4).alias("cv_pop"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
    )


@register(
    "agg_array_collect",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
           CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array: deterministic array aggregation.
    collect_list order is partition-dependent and NEVER comparable
    across engines — the sort is what makes the result well-defined.
    The sorted array is string-joined so result cells stay scalar
    (hash comparators generally can't canonicalize list cells)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.count_distinct("c_mktsegment").alias("n_segments"),
    )


@register(
    "agg_boolean",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/some ≡ bool_and/bool_or) — quantified
    predicates as single-pass aggregations."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.every(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.some(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
    )


@register(
    "hist_equi_depth",
    oracle="""
    WITH counts AS (SELECT value, count(*) AS c FROM events
                    WHERE value IS NOT NULL GROUP BY value),
    cum AS (
      SELECT value, c,
             coalesce(sum(c) OVER (ORDER BY value
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cb
      FROM counts
    ),
    total AS (SELECT sum(c) AS n FROM counts)
    SELECT CAST(least(9, cb * 10 // n) AS BIGINT) AS bucket,
           min(value) AS lo, max(value) AS hi,
           CAST(sum(c) AS BIGINT) AS n_rows
    FROM cum, total
    GROUP BY 1
    """,
)
def hist_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth (10-quantile) histogram over event values —
    the histogram-of-histograms rewrite: aggregate per-VALUE counts
    first (one corpus shuffle down to the value domain), run the
    cumulative window over that tiny relation, and assign each whole
    value-group the bucket its preceding mass lands in (ties never
    split across buckets, so bucket populations wobble around n/10 by
    at most one value-group — the standard exact-histogram contract).
    The unpartitioned window is BOUNDED BY THE VALUE DOMAIN (2-decimal
    readings here), not the corpus: at 100 TB the windowed relation is
    still |distinct values| rows, which is what makes this exact plan
    viable where a global row_number/ntile over raw rows would
    single-partition the corpus. All-integer bucket arithmetic — no FP
    rounding surface. NULL values are filtered on BOTH engines before
    the cumulative window: Spark sorts NULLS FIRST and DuckDB NULLS
    LAST by default, so an unfiltered NULL group would shift every
    bucket boundary between engines (the stats_ks_test divergence)."""

    ev = load_table(spark, sf_dir, "events")
    # counts is persisted and the grand total FOLDS from it (sum of
    # counts) — an un-cached total would re-scan the corpus, doubling
    # I/O at the design scale (the MI/PMI fold-totals rule)
    counts = (
        ev.where(F.col("value").isNotNull())
        .groupBy("value").agg(F.count("*").alias("c"))
        .transform(pin_cache)
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.select(
        "value", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cb")
    )
    total = counts.agg(F.sum("c").alias("n"))
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            F.expr("CAST(least(9, (cb * 10) div n) AS BIGINT)").alias("bucket"),
            "value",
            "c",
        )
        .groupBy("bucket")
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.sum("c").cast("bigint").alias("n_rows"),
        )
    )


@register(
    "stats_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT event_type AS x,
             -- explicit floor: DuckDB's // does not floor doubles and
             -- CAST(double AS BIGINT) rounds, unlike Spark's floor()
             least(5, CAST(floor(value / 100) AS BIGINT)) AS y,
             count(*) AS nxy
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT x, CAST(sum(nxy) AS DOUBLE) AS nx FROM cells GROUP BY x),
    my AS (SELECT y, CAST(sum(nxy) AS DOUBLE) AS ny FROM cells GROUP BY y),
    tot AS (SELECT CAST(sum(nxy) AS DOUBLE) AS n FROM cells),
    contrib AS (
      SELECT CAST(floor((nxy / n) * ln((nxy / n) / ((nx / n) * (ny / n)))
                        * 1000000000000 + 0.5) AS BIGINT) AS c
      FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(c) AS DOUBLE) / 1000000000000 AS mi
    FROM contrib
    """,
)
def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and value band (nats) —
    the dependence statistic feature selection and drift monitoring
    run over column pairs. The contingency table aggregates the corpus
    down to |X| x |Y| cells with map-side combine (30 cells here —
    bounded by the category domains, never the corpus); the marginals
    fold FROM the cells (rollup reuse, same identity as
    timeseries_rollup_hierarchy), so the corpus is scanned and
    shuffled exactly once. Per-cell contributions floor-quantize to
    1e-12-scaled integers before the final sum (the emb_gram_matrix
    lesson: an exact integer sum is order-independent and immune to
    engine decimal-rounding modes), and the cell joins broadcast. The
    cell relation is PERSISTED: marginals, total, and the scoring join
    all consume it — uncached, Spark re-instantiates the corpus
    aggregation once per consumer (four corpus scans where one
    suffices; the round-4 repeated-subtree rule)."""

    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.groupBy(
            F.col("event_type").alias("x"),
            F.least(F.lit(5).cast("bigint"), F.floor(F.col("value") / 100)).alias("y"),
        )
        .agg(F.count("*").alias("nxy"))
        .transform(pin_cache)
    )
    mx = cells.groupBy("x").agg(F.sum("nxy").cast("double").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("nxy").cast("double").alias("ny"))
    tot = cells.agg(F.sum("nxy").cast("double").alias("n"))
    pxy = F.col("nxy") / F.col("n")
    contrib = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                pxy
                * F.log(pxy / ((F.col("nx") / F.col("n")) * (F.col("ny") / F.col("n"))))
                * 1000000000000
                + F.lit(0.5)
            ).alias("c")
        )
    )
    return contrib.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        (F.sum("c").cast("double") / 1000000000000).alias("mi"),
    )


@register(
    "stats_ks_test",
    oracle="""
    WITH counts AS (
      SELECT value,
             count(*) FILTER (event_type = 'click') AS a,
             count(*) FILTER (event_type = 'view') AS b
      FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL
      GROUP BY value
    ),
    cum AS (
      SELECT value,
             sum(a) OVER w AS ca, sum(b) OVER w AS cb
      FROM counts
      WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (SELECT sum(a) AS na, sum(b) AS nb FROM counts)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           floor(max(abs(CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb))
                 * 1000000 + 0.5) / 1000000 AS ks_d
    FROM cum, tot
    GROUP BY na, nb
    """,
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    view value distributions — the nonparametric drift test monitoring
    stacks run next to PSI/MI: D = max |F_a(v) - F_b(v)| over the
    merged support. Same histogram-of-histograms shape as
    hist_equi_depth: the corpus aggregates once down to per-value
    (a,b) counts, the CDF window runs over the VALUE DOMAIN (bounded,
    never the corpus), and the sample totals fold from the cached
    counts. The CDF fractions are exact-integer/exact-integer IEEE
    divisions — identical on both engines — and max() over identical
    doubles is order-free, so only the final D needs the floor
    ladder. NULL values are filtered explicitly on BOTH sides: Spark's
    ascending window orders NULLs first while DuckDB defaults to NULLS
    LAST, so an unfiltered NULL bucket would enter the running CDF
    sums at opposite ends and shift every intermediate |F_a - F_b|."""

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    counts = (
        ev.groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("a"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("b"),
        )
        .transform(pin_cache)
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    tot = counts.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    diff = F.abs(
        F.col("ca").cast("double") / F.col("na")
        - F.col("cb").cast("double") / F.col("nb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg((F.floor(F.max(diff) * 1000000 + F.lit(0.5)) / 1000000).alias("ks_d"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            "ks_d",
        )
    )


PSI_BUCKETS = 6  # least(5, floor(value/100)) -> 6 value bands


@register(
    "stats_psi_drift",
    oracle=f"""
    WITH bounds AS (
      SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid FROM events
    ),
    cells AS (
      SELECT least(5, CAST(floor(value / 100) AS BIGINT)) AS b,
             count(*) FILTER (epoch_us(ts) < mid) AS ca,
             count(*) FILTER (epoch_us(ts) >= mid) AS cb
      FROM events, bounds
      GROUP BY 1
    ),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cells),
    contrib AS (
      SELECT CAST(floor(
               ((ca + 0.5) / (na + {PSI_BUCKETS} * 0.5)
                - (cb + 0.5) / (nb + {PSI_BUCKETS} * 0.5))
               * ln(((ca + 0.5) / (na + {PSI_BUCKETS} * 0.5))
                    / ((cb + 0.5) / (nb + {PSI_BUCKETS} * 0.5)))
               * 1000000000000 + 0.5) AS BIGINT) AS c,
             na, nb
      FROM cells, tot
    )
    SELECT CAST(max(na) AS BIGINT) AS n_first,
           CAST(max(nb) AS BIGINT) AS n_second,
           CAST(sum(c) AS DOUBLE) / 1000000000000 AS psi
    FROM contrib
    """,
)
def stats_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the first and second half of
    the time range — the third leg of the drift-monitoring trio (MI:
    dependence, KS: distribution distance, PSI: the banded score risk
    teams alert on, with the usual reading 0.1/0.25 thresholds). The
    corpus aggregates ONCE into per-band (first, second) counts — the
    time midpoint is a 1-row bounds aggregate in exact integer
    microseconds, broadcast into the banding pass — and the PSI
    arithmetic runs on the |bands|-row relation with Laplace-smoothed
    fractions (empty bands contribute smoothly instead of exploding
    the log). Contributions floor-quantize to scaled integers before
    the sum (the gram-matrix rule)."""

    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        ((F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2)
        .cast("bigint")
        .alias("mid")
    )
    cells = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            F.least(F.lit(5).cast("bigint"), F.floor(F.col("value") / 100)).alias("b")
        )
        .agg(
            F.count(F.when(F.unix_micros("ts") < F.col("mid"), 1)).alias("ca"),
            F.count(F.when(F.unix_micros("ts") >= F.col("mid"), 1)).alias("cb"),
        )
        .transform(pin_cache)
    )
    tot = cells.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    sm = PSI_BUCKETS * 0.5
    p = (F.col("ca") + 0.5) / (F.col("na") + sm)
    q = (F.col("cb") + 0.5) / (F.col("nb") + sm)
    contrib = cells.crossJoin(F.broadcast(tot)).select(
        F.floor((p - q) * F.log(p / q) * 1000000000000 + F.lit(0.5)).alias("c"),
        "na",
        "nb",
    )
    return contrib.agg(
        F.max("na").cast("bigint").alias("n_first"),
        F.max("nb").cast("bigint").alias("n_second"),
        (F.sum("c").cast("double") / 1000000000000).alias("psi"),
    )


@register(
    "stats_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT event_type AS x,
             least(5, CAST(floor(value / 100) AS BIGINT)) AS y,
             CAST(count(*) AS DOUBLE) AS o
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT x, sum(o) AS nx FROM cells GROUP BY x),
    my AS (SELECT y, sum(o) AS ny FROM cells GROUP BY y),
    tot AS (SELECT sum(o) AS n,
                   CAST(count(DISTINCT x) AS DOUBLE) AS r,
                   CAST(count(DISTINCT y) AS DOUBLE) AS c
            FROM cells),
    chi AS (
      SELECT CAST(floor((o - nx * ny / n) * (o - nx * ny / n) / (nx * ny / n)
                        * 1000000000000 + 0.5) AS BIGINT) AS t,
             n, r, c
      FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
    )
    SELECT CAST(max(n) AS BIGINT) AS n_rows,
           CASE WHEN max(n) * least(max(r) - 1, max(c) - 1) > 0 THEN
             floor(sqrt((CAST(sum(t) AS DOUBLE) / 1000000000000)
                        / (max(n) * least(max(r) - 1, max(c) - 1)))
                   * 1000000 + 0.5) / 1000000
           END AS cramers_v
    FROM chi
    """,
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V between event type and value band — the bounded
    [0,1] association coefficient EDA dashboards report next to the
    raw chi-square (and the categorical sibling of
    stats_mutual_information, same one-corpus-shuffle contingency
    shape): expected counts from the marginals, chi-square terms
    floor-quantized to scaled integers pre-sum, normalized by
    n*min(r-1, c-1). Marginals and totals fold from the persisted
    cell relation — one corpus aggregation total."""

    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.groupBy(
            F.col("event_type").alias("x"),
            F.least(F.lit(5).cast("bigint"), F.floor(F.col("value") / 100)).alias("y"),
        )
        .agg(F.count("*").cast("double").alias("o"))
        .transform(pin_cache)
    )
    mx = cells.groupBy("x").agg(F.sum("o").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("o").alias("ny"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("x").cast("double").alias("r"),
        F.count_distinct("y").cast("double").alias("c"),
    )
    exp = F.col("nx") * F.col("ny") / F.col("n")
    chi = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                (F.col("o") - exp) * (F.col("o") - exp) / exp * 1000000000000
                + F.lit(0.5)
            ).alias("t"),
            "n",
            "r",
            "c",
        )
    )
    # V is undefined on a 1x1 table (min(r-1, c-1) = 0): emit NULL, not
    # an ANSI divide-by-zero — same CASE guard as the oracle
    denom = F.max("n") * F.least(F.max("r") - 1, F.max("c") - 1)
    v = F.sqrt((F.sum("t").cast("double") / 1000000000000) / denom)
    return chi.agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.when(denom > 0, F.floor(v * 1000000 + F.lit(0.5)) / 1000000).alias(
            "cramers_v"
        ),
    )


@register(
    "stats_js_divergence",
    oracle=f"""
    WITH cells AS (
      SELECT least(5, CAST(floor(value / 100) AS BIGINT)) AS b,
             count(*) FILTER (event_type = 'click') AS ca,
             count(*) FILTER (event_type = 'view') AS cb
      FROM events
      WHERE event_type IN ('click', 'view') AND value IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cells),
    contrib AS (
      SELECT CAST(floor(
               (0.5 * ((ca + 0.5) / (na + {PSI_BUCKETS} * 0.5))
                    * ln(((ca + 0.5) / (na + {PSI_BUCKETS} * 0.5))
                         / (0.5 * ((ca + 0.5) / (na + {PSI_BUCKETS} * 0.5))
                            + 0.5 * ((cb + 0.5) / (nb + {PSI_BUCKETS} * 0.5))))
                + 0.5 * ((cb + 0.5) / (nb + {PSI_BUCKETS} * 0.5))
                    * ln(((cb + 0.5) / (nb + {PSI_BUCKETS} * 0.5))
                         / (0.5 * ((ca + 0.5) / (na + {PSI_BUCKETS} * 0.5))
                            + 0.5 * ((cb + 0.5) / (nb + {PSI_BUCKETS} * 0.5)))))
               * 1000000000000 + 0.5) AS BIGINT) AS c,
             na, nb
      FROM cells, tot
    )
    SELECT CAST(max(na) AS BIGINT) AS n_click,
           CAST(max(nb) AS BIGINT) AS n_view,
           CAST(sum(c) AS DOUBLE) / 1000000000000 AS jsd
    FROM contrib
    """,
)
def stats_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the click and view value
    distributions — the SYMMETRIC, bounded ([0, ln 2]) companion to the
    drift trio (KS: sup-distance, PSI: banded alert score, MI/V:
    dependence): JSD = 0.5*KL(P||M) + 0.5*KL(Q||M) with M the mixture,
    the metric monitoring stacks prefer when neither side is the
    canonical "expected" distribution (PSI blows up on empty target
    bands; JSD never does). Identical one-corpus-shuffle shape as
    stats_psi_drift: the corpus aggregates ONCE into per-band (click,
    view) counts, totals fold from the persisted |bands|-row relation,
    and the JSD arithmetic runs on bands with the same Laplace
    smoothing; per-band contributions floor-quantize to scaled
    integers before the sum (the gram-matrix rule), so
    partial-aggregation order cannot move the total between engines.

    Smoothing convention (same as stats_psi_drift): the Laplace
    denominator uses the FIXED design band count PSI_BUCKETS (6), not
    the number of bands that happen to materialize — so on a sparse
    corpus the smoothed p/q need not sum to exactly 1 over present
    bands and the reported jsd can sit slightly above the true mixture
    divergence. Deliberate: a fixed denominator keeps the score
    comparable across corpora and snapshots (the monitoring use case),
    and both engines share it, so the oracle is exact either way."""

    ev = load_table(spark, sf_dir, "events")
    cells = (
        # value IS NOT NULL on both sides: a NULL band would hit the
        # engines' diverging least()/NULL-ordering conventions (the
        # stats_ks_test rule) — and a NULL value carries no drift signal
        ev.where(
            F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
        )
        .groupBy(
            F.least(F.lit(5).cast("bigint"), F.floor(F.col("value") / 100)).alias("b")
        )
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("ca"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("cb"),
        )
        .transform(pin_cache)
    )
    tot = cells.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    sm = PSI_BUCKETS * 0.5
    p = (F.col("ca") + 0.5) / (F.col("na") + sm)
    q = (F.col("cb") + 0.5) / (F.col("nb") + sm)
    m = 0.5 * p + 0.5 * q
    contrib = cells.crossJoin(F.broadcast(tot)).select(
        F.floor(
            (0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)) * 1000000000000
            + F.lit(0.5)
        ).alias("c"),
        "na",
        "nb",
    )
    return contrib.agg(
        F.max("na").cast("bigint").alias("n_click"),
        F.max("nb").cast("bigint").alias("n_view"),
        (F.sum("c").cast("double") / 1000000000000).alias("jsd"),
    )


_SPEARMAN_ORACLE = """
WITH m AS (
  SELECT n_chars AS a,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS b
  FROM documents
),
ha AS (SELECT a, count(*) AS c FROM m GROUP BY a),
ra AS (
  SELECT a, CAST(2 * (sum(c) OVER (ORDER BY a) - c) + c + 1 AS BIGINT) AS r2
  FROM ha
),
hb AS (SELECT b, count(*) AS c FROM m GROUP BY b),
rb AS (
  SELECT b, CAST(2 * (sum(c) OVER (ORDER BY b) - c) + c + 1 AS BIGINT) AS r2
  FROM hb
),
j AS (
  SELECT ra.r2 AS ra2, rb.r2 AS rb2
  FROM m JOIN ra USING (a) JOIN rb USING (b)
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ra2) AS BIGINT) AS sa, CAST(sum(rb2) AS BIGINT) AS sb,
         CAST(sum(ra2 * rb2) AS BIGINT) AS sab,
         CAST(sum(ra2 * ra2) AS BIGINT) AS saa,
         CAST(sum(rb2 * rb2) AS BIGINT) AS sbb
  FROM j
)
SELECT n AS n_docs,
       CASE WHEN CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0
             AND CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0 THEN
         floor((CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
                - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
               / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                       - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                         - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))
               * 1000000 + 0.5) / 1000000
       END AS rho_spearman
FROM s
"""


@register("stats_spearman_rank", oracle=_SPEARMAN_ORACLE)
def stats_spearman_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between document length (n_chars) and
    token count — the rank-based dependence dial the drift suite lacked
    (Pearson via agg_corr_regr assumes linearity; MI/Cramér need
    categorical bands; Spearman catches any monotone relation and
    shrugs at outliers, which is why feature-vs-quality monitoring
    reports it).

    Ties use average ranks (mandatory — the d-squared shortcut is wrong
    under ties), computed WITHOUT a corpus-sized window: each metric
    aggregates to a value-domain-sized histogram, a domain-sized
    cumulative window turns counts into average ranks, and the tiny
    rank tables broadcast back onto the corpus. Ranks are DOUBLED so
    the .5-granular average ranks stay integers (r2 = 2*cnt_less +
    cnt_eq + 1); every moment is then an exact BIGINT sum (saa ~ 4n^3
    stays inside int64 through ~1.3M rows — beyond that, switch the
    moment accumulators to DECIMAL(38,0), same plan). The final
    cross-products (n*sab etc., ~4n^4) would overflow int64 near 55k
    rows, so each factor casts to DOUBLE FIRST and rho is one
    fixed-shape IEEE expression over those doubles on both engines,
    floor-quantized at 1e6."""

    d = load_table(spark, sf_dir, "documents")
    # persisted: consumed by BOTH histogram builds and the final join —
    # without it the corpus is scanned and re-tokenized three times
    m = d.select(
        F.col("n_chars").alias("a"),
        F.size(F.split("text", " ")).cast("bigint").alias("b"),
    ).transform(pin_cache)

    def rank2(col: str) -> DataFrame:
        h = m.groupBy(col).agg(F.count("*").alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return h.select(
            col,
            (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1)
            .cast("bigint")
            .alias(f"r2_{col}"),
        )

    j = m.join(F.broadcast(rank2("a")), "a").join(F.broadcast(rank2("b")), "b")
    s = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("r2_a").cast("bigint").alias("sa"),
        F.sum("r2_b").cast("bigint").alias("sb"),
        F.sum(F.col("r2_a") * F.col("r2_b")).cast("bigint").alias("sab"),
        F.sum(F.col("r2_a") * F.col("r2_a")).cast("bigint").alias("saa"),
        F.sum(F.col("r2_b") * F.col("r2_b")).cast("bigint").alias("sbb"),
    )
    # cross-products in DOUBLE: n*sab etc. would overflow int64 near
    # 55k rows (sab ~ 4n^3); the MOMENTS stay exact int64 to ~1.3M rows
    # and the final expression is the same IEEE chain on both engines
    n_d, sa_d, sb_d = [F.col(c).cast("double") for c in ("n", "sa", "sb")]
    sab_d, saa_d, sbb_d = [F.col(c).cast("double") for c in ("sab", "saa", "sbb")]
    num = n_d * sab_d - sa_d * sb_d
    va = n_d * saa_d - sa_d * sa_d
    vb = n_d * sbb_d - sb_d * sb_d
    den = F.sqrt(va * vb)
    # rho is undefined when either metric has zero rank variance (n=1,
    # or an all-tied column): NULL, not an ANSI 0/0 — same CASE as the
    # oracle
    return s.select(
        F.col("n").alias("n_docs"),
        F.when(
            (va > 0) & (vb > 0),
            F.floor(num / den * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("rho_spearman"),
    )


_GINI_ORACLE = """
WITH m AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS v FROM documents
),
h AS (SELECT v, count(*) AS c FROM m GROUP BY v),
w AS (
  SELECT v, c, sum(c) OVER (ORDER BY v) - c AS s FROM h
),
agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(v * c) AS BIGINT) AS t,
         CAST(sum(v * (2 * c * s + c * (c + 1))) AS BIGINT) AS s2
  FROM w
)
SELECT n AS n_docs, t AS total_tokens,
       floor((CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
              - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS gini
FROM agg
"""


@register("stats_gini_concentration", oracle=_GINI_ORACLE)
def stats_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the per-document token-count distribution —
    the inequality dial curation reports put next to entropy and the
    Zipf slope (0 = every doc the same length, →1 = a few giants carry
    the corpus; a mixture whose Gini jumps after filtering usually lost
    its long documents). Grouped-data exact form: for each distinct
    count v with multiplicity c and cumulative count s below it,
    sum-of-rank-weighted-values Σ i·x_(i) = Σ_v v·(c·s + c(c+1)/2), so
    G = 2·Σ/(n·T) - (n+1)/n with every term an exact BIGINT (the
    doubled form 2cs + c(c+1) keeps it integral). The only window runs
    over the value-domain-sized histogram — the corpus aggregates once
    and never sorts. Final G is one fixed-shape IEEE expression from
    three exact integers, floor-quantized at 1e6."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select(F.size(F.split("text", " ")).cast("bigint").alias("v"))
    h = m.groupBy("v").agg(F.count("*").alias("c"))
    win = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w = h.select("v", "c", (F.sum("c").over(win) - F.col("c")).alias("s"))
    agg = w.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("bigint").alias("t"),
        F.sum(
            F.col("v")
            * (2 * F.col("c") * F.col("s") + F.col("c") * (F.col("c") + 1))
        )
        .cast("bigint")
        .alias("s2"),
    )
    g = (
        F.col("s2").cast("double") / (F.col("n").cast("double") * F.col("t").cast("double"))
        - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
    )
    return agg.select(
        F.col("n").alias("n_docs"),
        F.col("t").alias("total_tokens"),
        (F.floor(g * 1000000 + F.lit(0.5)) / 1000000).alias("gini"),
    )


APPROX_DISTINCT_RSD = 0.02
APPROX_DISTINCT_BOUND_PPM = 60000  # contract: |approx-exact| <= 6% (3x rsd)


@register(
    "agg_approx_distinct_contract",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
           true AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error contract for the HLL estimate — the same design that gave
    the LSH/IVF/PQ approximations real oracles: the sketch's VALUE is
    not SQL-expressible, but its accuracy guarantee is. Per group,
    compute the exact distinct count AND the approx_count_distinct
    estimate in one pass, and emit whether the estimate lands within
    3x the configured rsd of exact (integer cross-product compare, no
    FP boundary). The oracle recomputes exact and expects
    within_bound = true everywhere — a red row means the engine's HLL
    degraded beyond its contract. Deterministic: HLL is seed-fixed, so
    a given corpus always produces the same estimate; verified stable
    at sf0.001/0.01/0.1."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_exact"),
        F.approx_count_distinct("l_partkey", rsd=APPROX_DISTINCT_RSD).alias("n_approx"),
    )
    err = F.abs(F.col("n_approx") - F.col("n_exact")) * 1000000
    return g.select(
        "l_returnflag",
        F.col("n_exact").cast("bigint").alias("n_exact"),
        (err <= F.lit(APPROX_DISTINCT_BOUND_PPM) * F.col("n_exact")).alias(
            "within_bound"
        ),
    )


TTEST_LANG = "en"  # group 1; group 0 = every other language


@register(
    "stats_welch_ttest",
    oracle=f"""
    WITH agg AS (
      SELECT CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN n_chars ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN n_chars * n_chars ELSE 0 END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE 1 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE n_chars END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE n_chars * n_chars END) AS BIGINT) AS q0
      FROM documents
    ),
    m AS (
      SELECT n1, n0,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
             CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
             (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               / (CAST(n1 AS DOUBLE) - 1.0) AS v1,
             (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
               / (CAST(n0 AS DOUBLE) - 1.0) AS v0
      FROM agg
    ),
    se AS (
      SELECT n1, n0, m1, m0, v1, v0,
             v1 / CAST(n1 AS DOUBLE) AS a1,
             v0 / CAST(n0 AS DOUBLE) AS a0
      FROM m
    )
    SELECT n1 AS n_group1, n0 AS n_group0,
           floor((m1 - m0) * 1000000 + 0.5) / 1000000 AS mean_diff,
           CASE WHEN n1 > 1 AND n0 > 1 THEN
             floor((m1 - m0) / sqrt(a1 + a0) * 1000000 + 0.5) / 1000000
           END AS t_stat,
           CASE WHEN n1 > 1 AND n0 > 1 THEN
             floor((a1 + a0) * (a1 + a0)
                   / (a1 * a1 / (CAST(n1 AS DOUBLE) - 1.0)
                      + a0 * a0 / (CAST(n0 AS DOUBLE) - 1.0))
                   * 1000000 + 0.5) / 1000000
           END AS df
    FROM se
    """,
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on document length (n_chars) —
    English vs every other language: the parametric drift check that
    complements the distribution-free stats_ks_test/stats_psi_drift
    when the question is specifically 'did the MEAN shift, and by how
    many standard errors?'. One map-side-combined aggregate pass emits
    six exact int64 moments (counts, sums, sums of squares; the squares
    are summed engine-side because s^2 would overflow int64 past ~3e9
    docs, while per-row n_chars^2 never does); mean, variance, the t
    statistic and the Welch-Satterthwaite df are then ONE fixed-shape
    IEEE expression per output column, written with identical operation
    order in both engines and floor-quantized at 1e6. NULL t/df when a
    group has <2 rows (variance undefined)."""
    d = load_table(spark, sf_dir, "documents")
    is1 = F.col("lang") == TTEST_LANG
    nc = F.col("n_chars")
    agg = d.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, nc).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(is1, nc * nc).otherwise(0)).cast("bigint").alias("q1"),
        F.sum(F.when(is1, 0).otherwise(1)).cast("bigint").alias("n0"),
        F.sum(F.when(is1, 0).otherwise(nc)).cast("bigint").alias("s0"),
        F.sum(F.when(is1, 0).otherwise(nc * nc)).cast("bigint").alias("q0"),
    )
    n1d, n0d = F.col("n1").cast("double"), F.col("n0").cast("double")
    s1d, s0d = F.col("s1").cast("double"), F.col("s0").cast("double")
    q1d, q0d = F.col("q1").cast("double"), F.col("q0").cast("double")
    m = agg.select(
        "n1",
        "n0",
        (s1d / n1d).alias("m1"),
        (s0d / n0d).alias("m0"),
        ((q1d - s1d * s1d / n1d) / (n1d - 1.0)).alias("v1"),
        ((q0d - s0d * s0d / n0d) / (n0d - 1.0)).alias("v0"),
    )
    se = m.select(
        "n1",
        "n0",
        "m1",
        "m0",
        (F.col("v1") / F.col("n1").cast("double")).alias("a1"),
        (F.col("v0") / F.col("n0").cast("double")).alias("a0"),
    )
    ok = (F.col("n1") > 1) & (F.col("n0") > 1)
    a1, a0 = F.col("a1"), F.col("a0")
    n1m = F.col("n1").cast("double") - 1.0
    n0m = F.col("n0").cast("double") - 1.0
    return se.select(
        F.col("n1").alias("n_group1"),
        F.col("n0").alias("n_group0"),
        (F.floor((F.col("m1") - F.col("m0")) * 1000000 + F.lit(0.5)) / 1000000).alias(
            "mean_diff"
        ),
        F.when(
            ok,
            F.floor(
                (F.col("m1") - F.col("m0")) / F.sqrt(a1 + a0) * 1000000 + F.lit(0.5)
            )
            / 1000000,
        ).alias("t_stat"),
        F.when(
            ok,
            F.floor(
                (a1 + a0)
                * (a1 + a0)
                / (a1 * a1 / n1m + a0 * a0 / n0m)
                * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("df"),
    )


PCTL_ACCURACY = 100  # approx_percentile sketch accuracy: rank err <= n/100
PCTL_EPS = 0.03  # contract window: exact quantiles at q +/- eps bracket it


@register(
    "agg_approx_percentile_contract",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n,
           floor(quantile_cont(n_chars, 0.5) * 1000000 + 0.5) / 1000000 AS p50_exact,
           floor(quantile_cont(n_chars, 0.9) * 1000000 + 0.5) / 1000000 AS p90_exact,
           true AS p50_within_bound,
           true AS p90_within_bound
    FROM documents GROUP BY lang
    """,
)
def agg_approx_percentile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error contract for the quantile sketch (approx_percentile), the
    agg_approx_distinct_contract design: the sketch's value is not
    SQL-expressible, but its rank-error guarantee (<= n/accuracy) is.
    Per language group, one pass computes the exact continuous-rank
    quantiles (p50/p90, plus the bracketing quantiles at q +/- eps) AND
    the approx sketch at accuracy 100; the emitted booleans assert
    the sketch landed inside the exact [q-eps, q+eps] value bracket,
    where eps = 0.03 comfortably covers the guaranteed 1/100 rank
    error for ANY partition-merge order — the guarantee, not a seed,
    is what's contracted, so executor scheduling cannot flake the row.
    The oracle recomputes exact quantiles (quantile_cont = Spark's
    percentile, both the (n-1)p linear-interpolation definition) and
    expects within_bound = true; a red row means the engine's sketch
    broke its documented bound. Exact percentile on a grouped corpus
    is a per-group sort internally — acceptable as the CONTRACT CHECK
    run at validation time, while production reads only the sketch
    (one pass, mergeable, no sort)."""
    d = load_table(spark, sf_dir, "documents")
    lo50, hi50 = 0.5 - PCTL_EPS, 0.5 + PCTL_EPS
    lo90, hi90 = 0.9 - PCTL_EPS, 0.9 + PCTL_EPS
    g = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("percentile(n_chars, 0.5)").alias("e50"),
        F.expr("percentile(n_chars, 0.9)").alias("e90"),
        F.expr(f"percentile(n_chars, {lo50})").alias("e50lo"),
        F.expr(f"percentile(n_chars, {hi50})").alias("e50hi"),
        F.expr(f"percentile(n_chars, {lo90})").alias("e90lo"),
        F.expr(f"percentile(n_chars, {hi90})").alias("e90hi"),
        F.expr(f"approx_percentile(n_chars, 0.5, {PCTL_ACCURACY})").alias("a50"),
        F.expr(f"approx_percentile(n_chars, 0.9, {PCTL_ACCURACY})").alias("a90"),
    )
    return g.select(
        "lang",
        "n",
        (F.floor(F.col("e50") * 1000000 + F.lit(0.5)) / 1000000).alias("p50_exact"),
        (F.floor(F.col("e90") * 1000000 + F.lit(0.5)) / 1000000).alias("p90_exact"),
        ((F.col("a50") >= F.col("e50lo")) & (F.col("a50") <= F.col("e50hi"))).alias(
            "p50_within_bound"
        ),
        ((F.col("a90") >= F.col("e90lo")) & (F.col("a90") <= F.col("e90hi"))).alias(
            "p90_within_bound"
        ),
    )


BOOT_REPLICAS = 32
BOOT_P = 1000000007
# Poisson(1) inverse-CDF thresholds scaled to BOOT_P, computed once and
# inlined as integer literals into both engines: the bootstrap weight of
# (doc, replica) is #{t_k <= u}, u the deterministic hash-uniform below.
BOOT_T = (367879443, 735758887, 919698609, 981011849, 996340160, 999405822, 999916765)


def _boot_w_sql(u: str) -> str:
    return "(" + " + ".join(f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in BOOT_T) + ")"


_BOOT_U = f"(((doc_id % {BOOT_P}) + b * 7919) * 2654435761) % {BOOT_P}"

_BOOT_ORACLE = f"""
WITH reps AS (SELECT unnest(range(0, {BOOT_REPLICAS})) AS b),
w AS (
  SELECT b, {_boot_w_sql(_BOOT_U)} AS w, n_chars
  FROM documents, reps
),
m AS (
  SELECT b,
         CAST(sum(w) AS BIGINT) AS n_b,
         CAST(sum(w * n_chars) AS BIGINT) AS s_b
  FROM w GROUP BY b
),
means AS (
  SELECT b,
         floor(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) * 1000000 + 0.5)
           / 1000000 AS mean_b,
         row_number() OVER (
           ORDER BY floor(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                          * 1000000 + 0.5), b) AS rk
  FROM m
),
whole AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         floor(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               * 1000000 + 0.5) / 1000000 AS mean_full
  FROM documents
)
SELECT f.n_docs, f.mean_full,
       CAST({BOOT_REPLICAS} AS BIGINT) AS n_replicas,
       lo.mean_b AS ci_lo, hi.mean_b AS ci_hi
FROM whole f,
     (SELECT mean_b FROM means WHERE rk = 2) lo,
     (SELECT mean_b FROM means WHERE rk = {BOOT_REPLICAS - 1}) hi
"""


@register("stats_bootstrap_ci", oracle=_BOOT_ORACLE)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the corpus mean document
    length — the resampling CI a data-quality report attaches to any
    headline statistic, made fully DETERMINISTIC so two engines (and
    two runs) agree bit-for-bit: the Poisson(1) multinomial-approx
    resampling weight of (doc, replica) is the inverse CDF evaluated
    on a hash-uniform u = (((doc_id mod P) + b*7919) * 2654435761)
    mod P — the replica offset is mixed BEFORE the multiplicative hash
    so replicas decorrelate (a post-hash additive shift of ~4e4 would
    leave all 32 replicas resampling the same pseudo-sample), and the
    key is reduced mod P before the multiply (SPLIT_HASH overflow rule),
    with the CDF breakpoints precomputed as P-scaled integer literals
    inlined into both engines — no engine ever evaluates exp() or a
    RNG at query time. Each of the 32 replicas is one conditional sum
    in a single map-side-combined pass (the replica fan-out collapses
    to 32 groups before the exchange; the corpus is scanned once), the
    replica means are one fixed-shape IEEE division each (quantized at
    1e6), and the 93.75% percentile-bootstrap interval takes the 2nd
    smallest / 2nd largest of the 32 means (rank convention documented;
    ties broken by replica id) in a 32-row window. Scale: the only
    data-sized work is the weighted-sum pass; everything after is a
    32-row relation."""
    d = load_table(spark, sf_dir, "documents")
    reps = spark.range(BOOT_REPLICAS).select(F.col("id").cast("bigint").alias("b"))
    u = f"(((doc_id % {BOOT_P}) + b * 7919) * 2654435761) % {BOOT_P}"
    w = d.crossJoin(F.broadcast(reps)).select(
        "b", F.expr(_boot_w_sql(u)).alias("w"), "n_chars"
    )
    m = w.groupBy("b").agg(
        F.sum("w").cast("bigint").alias("n_b"),
        F.sum(F.col("w") * F.col("n_chars")).cast("bigint").alias("s_b"),
    )
    mean_b = (
        F.floor(
            F.col("s_b").cast("double") / F.col("n_b").cast("double") * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    wr = Window.orderBy(
        F.floor(
            F.col("s_b").cast("double") / F.col("n_b").cast("double") * 1000000
            + F.lit(0.5)
        ),
        "b",
    )
    means = m.select("b", mean_b.alias("mean_b"), F.row_number().over(wr).alias("rk"))
    full = d.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.floor(
                F.sum("n_chars").cast("double")
                / F.count("*").cast("double")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("mean_full"),
    )
    lo = means.filter(F.col("rk") == 2).select(F.col("mean_b").alias("ci_lo"))
    hi = means.filter(F.col("rk") == BOOT_REPLICAS - 1).select(
        F.col("mean_b").alias("ci_hi")
    )
    return (
        full.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_docs",
            "mean_full",
            F.lit(BOOT_REPLICAS).cast("bigint").alias("n_replicas"),
            "ci_lo",
            "ci_hi",
        )
    )


PERM_REPLICAS = 64


_PERM_ORACLE = f"""
WITH reps AS (SELECT unnest(range(0, {PERM_REPLICAS})) AS b),
obs AS (
  SELECT CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN n_chars ELSE 0 END) AS BIGINT) AS s1,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s
  FROM documents
),
perm AS (
  SELECT b,
         CAST(sum(g) AS BIGINT) AS pn1,
         CAST(sum(g * n_chars) AS BIGINT) AS ps1,
         CAST(count(*) AS BIGINT) AS pn,
         CAST(sum(n_chars) AS BIGINT) AS ps
  FROM (
    SELECT b, n_chars,
           CASE WHEN ((doc_id % {BOOT_P} + (b + {BOOT_REPLICAS}) * 7919)
                      * 2654435761) % {BOOT_P}
                      % (SELECT n FROM obs)
                     < (SELECT n1 FROM obs)
                THEN 1 ELSE 0 END AS g
    FROM documents, reps
  ) GROUP BY b
),
diffs AS (
  SELECT b,
         CASE WHEN pn1 > 0 AND pn1 < pn THEN
           abs(CAST(ps1 AS DOUBLE) / CAST(pn1 AS DOUBLE)
               - CAST(ps - ps1 AS DOUBLE) / CAST(pn - pn1 AS DOUBLE))
         END AS adiff
  FROM perm
),
od AS (
  SELECT abs(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(s - s1 AS DOUBLE) / CAST(n - n1 AS DOUBLE)) AS aobs
  FROM obs
)
SELECT (SELECT n1 FROM obs) AS n_group1,
       floor(aobs * 1000000 + 0.5) / 1000000 AS obs_absdiff,
       CAST(sum(CASE WHEN adiff >= aobs THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST(count(adiff) AS BIGINT) AS n_replicas,
       floor((sum(CASE WHEN adiff >= aobs THEN 1 ELSE 0 END) + 1.0)
             / (count(adiff) + 1.0) * 1000000 + 0.5) / 1000000 AS p_value
FROM diffs, od
GROUP BY aobs, (SELECT n1 FROM obs)
"""


@register("stats_permutation_test", oracle=_PERM_ORACLE)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monte-Carlo permutation test for the en-vs-rest mean document
    length — the distribution-free companion to stats_welch_ttest
    (same question, no normality assumption): under H0 the group
    labels are exchangeable, so re-split the corpus 64 times with
    the DETERMINISTIC hash-uniform (replica index mixed BEFORE the
    multiplicative hash, offset past the bootstrap's replica ids so
    the two operators' randomness never overlaps) at the observed
    group-1 rate — membership is the pure-integer test u mod n < n1,
    so no engine ever rounds or truncates a double threshold (CAST of
    a double truncates in Spark but ROUNDS in DuckDB; caught in
    review before any fixture hit the boundary) — and report how often a random split's |mean diff|
    reaches the observed one. p = (n_extreme + 1)/(B + 1), the
    add-one convention that keeps p > 0 honest. ONE corpus pass
    computes all replica sums map-side (the fan-out collapses to 64
    groups before the exchange) plus the observed moments; every
    accumulator is exact int64 and each replica contributes a single
    fixed-shape IEEE |mean difference|. Replicas whose random split
    degenerates (all docs one side) are excluded from both count and
    denominator (NULL adiff), identically in both engines."""
    d = load_table(spark, sf_dir, "documents")
    is1 = F.col("lang") == TTEST_LANG
    obs = d.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, F.col("n_chars")).otherwise(0)).cast("bigint").alias("s1"),
        F.count("*").cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("s"),
    )
    reps = spark.range(PERM_REPLICAS).select(F.col("id").cast("bigint").alias("b"))
    u = (
        f"((doc_id % {BOOT_P} + (b + {BOOT_REPLICAS}) * 7919) * 2654435761) "
        f"% {BOOT_P}"
    )
    fan = (
        d.crossJoin(F.broadcast(reps))
        .crossJoin(F.broadcast(obs))
        .select(
            "b",
            "n_chars",
            F.when(F.expr(u) % F.col("n") < F.col("n1"), 1)
            .otherwise(0)
            .alias("g"),
        )
    )
    perm = fan.groupBy("b").agg(
        F.sum("g").cast("bigint").alias("pn1"),
        F.sum(F.col("g") * F.col("n_chars")).cast("bigint").alias("ps1"),
        F.count("*").cast("bigint").alias("pn"),
        F.sum("n_chars").cast("bigint").alias("ps"),
    )
    adiff = F.when(
        (F.col("pn1") > 0) & (F.col("pn1") < F.col("pn")),
        F.abs(
            F.col("ps1").cast("double") / F.col("pn1").cast("double")
            - (F.col("ps") - F.col("ps1")).cast("double")
            / (F.col("pn") - F.col("pn1")).cast("double")
        ),
    )
    diffs = perm.select("b", adiff.alias("adiff"))
    aobs = F.abs(
        F.col("s1").cast("double") / F.col("n1").cast("double")
        - (F.col("s") - F.col("s1")).cast("double")
        / (F.col("n") - F.col("n1")).cast("double")
    )
    od = obs.select("n1", aobs.alias("aobs"))
    joined = diffs.crossJoin(F.broadcast(od))
    return joined.groupBy("n1", "aobs").agg(
        F.sum(F.when(F.col("adiff") >= F.col("aobs"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_extreme"),
        F.count("adiff").cast("bigint").alias("n_replicas"),
    ).select(
        F.col("n1").alias("n_group1"),
        (F.floor(F.col("aobs") * 1000000 + F.lit(0.5)) / 1000000).alias("obs_absdiff"),
        "n_extreme",
        "n_replicas",
        (
            F.floor(
                (F.col("n_extreme") + 1.0)
                / (F.col("n_replicas") + 1.0)
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("p_value"),
    )


_MWU_ORACLE = f"""
WITH m AS (
  SELECT n_chars AS s,
         CASE WHEN lang = '{TTEST_LANG}' THEN 1 ELSE 0 END AS pos
  FROM documents
),
h AS (
  SELECT s, count(*) AS c, CAST(sum(pos) AS BIGINT) AS cp
  FROM m GROUP BY s
),
r AS (
  SELECT c, cp,
         CAST(sum(c) OVER (ORDER BY s) - c AS BIGINT) AS less
  FROM h
),
agg AS (
  SELECT CAST(sum(cp) AS BIGINT) AS n1,
         CAST(sum(c - cp) AS BIGINT) AS n0,
         CAST(sum(cp * (2 * less + c + 1)) AS BIGINT) AS r2,
         CAST(sum(c * (c - 1) * (c + 1)) AS BIGINT) AS tie3
  FROM r
)
SELECT n1 AS n_group1, n0 AS n_group0,
       r2 - n1 * (n1 + 1) AS u2_stat,
       CASE WHEN n1 > 0 AND n0 > 0
             AND ((CAST(n1 + n0 AS DOUBLE) + 1.0)
                  - CAST(tie3 AS DOUBLE)
                    / (CAST(n1 + n0 AS DOUBLE)
                       * (CAST(n1 + n0 AS DOUBLE) - 1.0))) > 0 THEN
         floor((CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
                - CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) / 2.0
               / sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 12.0
                      * ((CAST(n1 + n0 AS DOUBLE) + 1.0)
                         - CAST(tie3 AS DOUBLE)
                           / (CAST(n1 + n0 AS DOUBLE)
                              * (CAST(n1 + n0 AS DOUBLE) - 1.0))))
               * 1000000 + 0.5) / 1000000
       END AS z_score
FROM agg
"""


@register("stats_mann_whitney", oracle=_MWU_ORACLE)
def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test for en-vs-rest document length — the
    classical rank-based two-sample test completing the trio with
    stats_welch_ttest (parametric) and stats_permutation_test
    (resampling). The U statistic IS the tie-corrected rank sum the
    AUC machinery computes (U = AUC * n1 * n0 — same doubled-rank
    trick): with ties U itself is half-integer-granular, so the
    operator reports u2_stat = 2U = r2 - n1(n1+1), exact int64, and
    folds the halving into the z expression. The normal approximation applies the standard
    tie-corrected variance n1*n0/12 * ((N+1) - sum(t^3-t)/(N(N-1)))
    with sum(t^3-t) = sum c(c-1)(c+1) accumulated exactly per distinct
    length; z floor-quantizes at 1e6 and is NULL when ties are so
    total that the variance degenerates. At corpus scale the length
    histogram replaces the corpus (the ml_eval prefix pattern; at
    document-length cardinality a plain window suffices — lengths are
    bounded — so no bucket level is needed)."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        F.col("n_chars").alias("s"),
        (F.col("lang") == TTEST_LANG).cast("int").alias("pos"),
    )
    h = m.groupBy("s").agg(
        F.count("*").alias("c"), F.sum("pos").cast("bigint").alias("cp")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = h.select(
        "c",
        "cp",
        (F.sum("c").over(w) - F.col("c")).cast("bigint").alias("less"),
    )
    agg = r.agg(
        F.sum("cp").cast("bigint").alias("n1"),
        F.sum(F.col("c") - F.col("cp")).cast("bigint").alias("n0"),
        F.sum(F.col("cp") * (2 * F.col("less") + F.col("c") + 1))
        .cast("bigint")
        .alias("r2"),
        F.sum(F.col("c") * (F.col("c") - 1) * (F.col("c") + 1))
        .cast("bigint")
        .alias("tie3"),
    )
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    nd = n1d + n0d
    u2 = (F.col("r2") - F.col("n1") * (F.col("n1") + 1)).cast("bigint")
    tie_term = F.col("tie3").cast("double") / (nd * (nd - 1.0))
    var = n1d * n0d / 12.0 * ((nd + 1.0) - tie_term)
    z = (u2.cast("double") - n1d * n0d) / 2.0 / F.sqrt(var)
    return agg.select(
        F.col("n1").alias("n_group1"),
        F.col("n0").alias("n_group0"),
        u2.alias("u2_stat"),
        F.when(
            (F.col("n1") > 0) & (F.col("n0") > 0) & (((nd + 1.0) - tie_term) > 0),
            F.floor(z * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("z_score"),
    )


# Benjamini-Hochberg FDR over a FAMILY of permutation tests — the
# multiple-comparisons discipline the single-hypothesis suite
# (welch/mann-whitney/permutation) stops short of: test every event
# type's mean value against the corpus AND two planted positive
# controls (subgroups SELECTED ON the metric itself — value >= 75 /
# value < 25 — so their "effect" is true by construction), then
# control the false discovery rate across the 7-member family
# (Benjamini & Hochberg 1995). The fixture's event types are
# exchangeable by synthesis, so accepting them is the CORRECT answer;
# the controls exist to pin the reject regime — the standard
# positive-control design for validating an FDR pipeline.
#
# Determinism machinery reused from stats_permutation_test verbatim:
# hash-uniform integer membership (u mod n < n1 — never a double
# threshold), exact int64 accumulators over MILLI-UNIT fixed-point
# values (floor(value*1000+0.5) — identical parquet doubles floor
# identically, and integer sums are order-independent where double
# sums are not), one fixed-shape IEEE |mean diff| per replica, add-one
# p-values. Replica randomness offsets past both the bootstrap's and
# the single permutation test's id ranges via
# (b*64 + hyp_idx + 96)*7919 so no operator pair shares a split (the
# 64 stride stays safely above any plausible family size — an 8
# stride would alias (b, hyp) seed pairs once a fixture grew past 8
# hypotheses, silently giving different hypotheses identical
# permutation splits).
FDR_REPLICAS = 128  # sized so the controls' floor p = 1/129 clears
# the BH cut at rank 1-2 of a 7-member family under FDR_Q
FDR_Q = 0.1
_FDR_OFFSET = BOOT_REPLICAS + PERM_REPLICAS  # = 96
_FDR_CTRL_HI = 75000  # milli-units
_FDR_CTRL_LO = 25000


def _pv_family_ctes() -> str:
    """The permutation-test p-value family (events' per-type mean vs
    corpus + two planted controls) as oracle CTEs through `ranked` —
    shared by stats_fdr_bh (BH step-up tail) and stats_holm_bonferroni
    (Holm step-down tail), so the two multiple-testing corrections are
    provably computed over the SAME p-values."""
    u = (
        f"((d.event_id % {BOOT_P} + (r.b * 64 + l.li + {_FDR_OFFSET}) * 7919)"
        f" * 2654435761) % {BOOT_P}"
    )
    return f"""
    WITH ev AS (
      SELECT event_id, event_type,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      FROM events
    ),
    obs AS (
      SELECT event_type AS hypothesis, CAST(count(*) AS BIGINT) AS n1,
             CAST(sum(v) AS BIGINT) AS s1
      FROM ev GROUP BY event_type
      UNION ALL
      SELECT 'ctrl_hi', CAST(sum(CASE WHEN v >= {_FDR_CTRL_HI} THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN v >= {_FDR_CTRL_HI} THEN v ELSE 0 END) AS BIGINT)
      FROM ev
      UNION ALL
      SELECT 'ctrl_lo', CAST(sum(CASE WHEN v < {_FDR_CTRL_LO} THEN 1 ELSE 0 END) AS BIGINT),
             CAST(sum(CASE WHEN v < {_FDR_CTRL_LO} THEN v ELSE 0 END) AS BIGINT)
      FROM ev
    ),
    li AS (
      SELECT hypothesis, row_number() OVER (ORDER BY hypothesis) - 1 AS li
      FROM obs
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS s FROM ev),
    reps AS (SELECT unnest(range(0, {FDR_REPLICAS})) AS b),
    fan AS (
      SELECT l.hypothesis, r.b, d.v,
             CASE WHEN {u} % t.n < o.n1 THEN 1 ELSE 0 END AS g
      FROM ev d, reps r, tot t, li l, obs o
      WHERE o.hypothesis = l.hypothesis
    ),
    perm AS (
      SELECT hypothesis, b,
             CAST(sum(g) AS BIGINT) AS pn1,
             CAST(sum(g * v) AS BIGINT) AS ps1,
             CAST(count(*) AS BIGINT) AS pn,
             CAST(sum(v) AS BIGINT) AS ps
      FROM fan GROUP BY hypothesis, b
    ),
    diffs AS (
      SELECT hypothesis, b,
             CASE WHEN pn1 > 0 AND pn1 < pn THEN
               abs(CAST(ps1 AS DOUBLE) / CAST(pn1 AS DOUBLE)
                   - CAST(ps - ps1 AS DOUBLE) / CAST(pn - pn1 AS DOUBLE))
             END AS adiff
      FROM perm
    ),
    aob AS (
      SELECT o.hypothesis,
             abs(CAST(o.s1 AS DOUBLE) / CAST(o.n1 AS DOUBLE)
                 - CAST(t.s - o.s1 AS DOUBLE) / CAST(t.n - o.n1 AS DOUBLE))
               AS aobs,
             o.n1
      FROM obs o, tot t
    ),
    pv AS (
      SELECT a.hypothesis, a.n1,
             (sum(CASE WHEN d.adiff >= a.aobs THEN 1 ELSE 0 END) + 1.0)
               / (count(d.adiff) + 1.0) AS p
      FROM aob a JOIN diffs d ON d.hypothesis = a.hypothesis
      GROUP BY a.hypothesis, a.n1, a.aobs
    ),
    ranked AS (
      SELECT hypothesis, n1, p,
             CAST(row_number() OVER (ORDER BY p, hypothesis) AS BIGINT) AS rnk,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pv
    )"""


def _fdr_oracle() -> str:
    return f"""
    {_pv_family_ctes()},
    adj AS (
      SELECT hypothesis, n1, p, rnk, m,
             least(CAST(1.0 AS DOUBLE),
                   min((p * m) / rnk) OVER (ORDER BY rnk
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
               AS padj
      FROM ranked
    )
    SELECT hypothesis, n1 AS n_group, rnk AS p_rank,
           floor(p * 1000000 + 0.5) / 1000000 AS p_value,
           floor(padj * 1000000 + 0.5) / 1000000 AS p_adj,
           padj <= CAST({FDR_Q} AS DOUBLE) AS reject
    FROM adj
    """


def _perm_family_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _pv_family_ctes: the (hypothesis, n1, p, rnk, m)
    relation both multiple-testing corrections consume."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
    )
    hi = F.col("v") >= _FDR_CTRL_HI
    lo = F.col("v") < _FDR_CTRL_LO
    obs = (
        ev.groupBy(F.col("event_type").alias("hypothesis"))
        .agg(
            F.count("*").cast("bigint").alias("n1"),
            F.sum("v").cast("bigint").alias("s1"),
        )
        .unionByName(
            ev.agg(
                F.lit("ctrl_hi").alias("hypothesis"),
                F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("n1"),
                F.sum(F.when(hi, F.col("v")).otherwise(0)).cast("bigint").alias("s1"),
            )
        )
        .unionByName(
            ev.agg(
                F.lit("ctrl_lo").alias("hypothesis"),
                F.sum(F.when(lo, 1).otherwise(0)).cast("bigint").alias("n1"),
                F.sum(F.when(lo, F.col("v")).otherwise(0)).cast("bigint").alias("s1"),
            )
        )
    )
    li = obs.select(
        "hypothesis",
        "n1",
        "s1",
        (F.row_number().over(W.orderBy("hypothesis")) - 1).cast("long").alias("li"),
    )
    tot = ev.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    )
    u = (
        f"((event_id % {BOOT_P} + (b * 64 + li + {_FDR_OFFSET}) * 7919)"
        f" * 2654435761) % {BOOT_P}"
    )
    # ONE broadcast nested-loop join (events x the 7-row hypothesis
    # relation with the 1-row totals fused in), then the replica axis
    # as a codegen'd explode(sequence(...)) generator. The former shape
    # chained THREE BNLJs (reps, tot, li), so all |events| x B x |hyp|
    # ~ 90M fan rows at sf0.1 were materialized row-at-a-time through
    # interpreted join machinery; now only |events| x |hyp| rows cross
    # a join and the x B expansion happens inside WholeStageCodegen
    # (guide §1.2 per-task work / §3.3 accidental-product shapes).
    # Identical sums (same u expression per (event, b, li) triple).
    # spread(): the single-file events scan yields 2-4 partitions, which
    # would pin the x B x |hyp| fan onto as many cores (guide §2.5 input
    # parallelism) — one 100k-row shuffle buys 32-way map parallelism
    # for the 90M-row expression stage. Both fixes together measured
    # 13.9 -> 2.15 s best (stats_fdr_bh) / 12.1 -> 2.36 s
    # (stats_holm_bonferroni).
    from kinesis2sse_spark.catalog import spread

    fan = (
        spread(ev, spark).join(
            F.broadcast(
                li.select(F.col("hypothesis").alias("hyp_t"), "li", "n1").crossJoin(
                    tot
                )
            ),
            F.lit(True),
        )
        .select(
            "hyp_t",
            "li",
            "n1",
            "n",
            "v",
            "event_id",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.lit(FDR_REPLICAS - 1).cast("bigint"))
            ).alias("b"),
        )
        .select(
            "hyp_t",
            "b",
            "v",
            F.when(F.expr(u) % F.col("n") < F.col("n1"), 1).otherwise(0).alias("g"),
        )
    )
    perm = fan.groupBy("hyp_t", "b").agg(
        F.sum("g").cast("bigint").alias("pn1"),
        F.sum(F.col("g") * F.col("v")).cast("bigint").alias("ps1"),
        F.count("*").cast("bigint").alias("pn"),
        F.sum("v").cast("bigint").alias("ps"),
    )
    adiff = F.when(
        (F.col("pn1") > 0) & (F.col("pn1") < F.col("pn")),
        F.abs(
            F.col("ps1").cast("double") / F.col("pn1").cast("double")
            - (F.col("ps") - F.col("ps1")).cast("double")
            / (F.col("pn") - F.col("pn1")).cast("double")
        ),
    )
    diffs = perm.select(F.col("hyp_t").alias("hypothesis"), adiff.alias("adiff"))
    aob = li.crossJoin(F.broadcast(tot)).select(
        "hypothesis",
        "n1",
        F.abs(
            F.col("s1").cast("double") / F.col("n1").cast("double")
            - (F.col("s") - F.col("s1")).cast("double")
            / (F.col("n") - F.col("n1")).cast("double")
        ).alias("aobs"),
    )
    pv = (
        aob.join(diffs, "hypothesis")
        .groupBy("hypothesis", "n1", "aobs")
        .agg(
            F.sum(F.when(F.col("adiff") >= F.col("aobs"), 1).otherwise(0)).alias("ne"),
            F.count("adiff").alias("nr"),
        )
        .select(
            "hypothesis",
            "n1",
            ((F.col("ne") + 1.0) / (F.col("nr") + 1.0)).alias("p"),
        )
    )
    return pv.select(
        "hypothesis",
        "n1",
        "p",
        F.row_number().over(W.orderBy("p", "hypothesis")).cast("long").alias("rnk"),
        F.count("*").over(W.partitionBy()).cast("long").alias("m"),
    )


@register("stats_fdr_bh", oracle=_fdr_oracle())
def stats_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation tests (each event type's mean value vs the corpus,
    plus two planted positive controls) with Benjamini-Hochberg FDR
    adjustment across the family (see block comment). Plan shape: ONE
    corpus pass fans each event across {FDR_REPLICAS} replicas x
    |hypotheses| entirely map-side (the fan-out partial-aggregates to
    |hypotheses| x B groups before the exchange — the same
    combiner-collapse as stats_permutation_test); the BH step-up
    (rank, cumulative min from the worst rank) runs as windows over
    the |hypotheses|-row p-value relation."""
    from pyspark.sql import Window as W

    ranked = _perm_family_ranked(spark, sf_dir)
    wmin = W.orderBy("rnk").rowsBetween(W.currentRow, W.unboundedFollowing)
    padj = F.least(
        F.lit(1.0), F.min((F.col("p") * F.col("m")) / F.col("rnk")).over(wmin)
    )
    return ranked.select(
        "hypothesis",
        F.col("n1").alias("n_group"),
        F.col("rnk").alias("p_rank"),
        (F.floor(F.col("p") * 1000000 + F.lit(0.5)) / 1000000).alias("p_value"),
        (F.floor(padj * 1000000 + F.lit(0.5)) / 1000000).alias("p_adj"),
        (padj <= F.lit(FDR_Q)).alias("reject"),
    )


HOLM_ALPHA = 0.05


@register(
    "stats_holm_bonferroni",
    oracle=f"""
    {_pv_family_ctes()},
    adj AS (
      SELECT hypothesis, n1, p, rnk, m,
             least(CAST(1.0 AS DOUBLE),
                   max((m - rnk + 1) * p) OVER (ORDER BY rnk
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS padj
      FROM ranked
    )
    SELECT hypothesis, n1 AS n_group, rnk AS p_rank,
           floor(p * 1000000 + 0.5) / 1000000 AS p_value,
           floor(padj * 1000000 + 0.5) / 1000000 AS p_adj,
           padj <= CAST({HOLM_ALPHA} AS DOUBLE) AS reject
    FROM adj
    """,
)
def stats_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm-Bonferroni step-DOWN correction over the same permutation
    p-value family as stats_fdr_bh (shared _perm_family_ranked /
    _pv_family_ctes, so the two corrections are provably computed over
    identical p-values): adjusted p_i = cummax over j<=i of
    (m-j+1)*p_j, clamped at 1 — strong FWER control where BH controls
    only FDR; a pipeline uses Holm when any single false rejection is
    costly (e.g. shipping a model change on a guardrail metric) and BH
    for discovery sweeps. Same plan shape as BH: the permutation fan
    collapses map-side, the step-down is one window over the
    |hypotheses|-row relation."""
    from pyspark.sql import Window as W

    ranked = _perm_family_ranked(spark, sf_dir)
    wmax = W.orderBy("rnk").rowsBetween(W.unboundedPreceding, W.currentRow)
    padj = F.least(
        F.lit(1.0),
        F.max((F.col("m") - F.col("rnk") + 1) * F.col("p")).over(wmax),
    )
    return ranked.select(
        "hypothesis",
        F.col("n1").alias("n_group"),
        F.col("rnk").alias("p_rank"),
        (F.floor(F.col("p") * 1000000 + F.lit(0.5)) / 1000000).alias("p_value"),
        (F.floor(padj * 1000000 + F.lit(0.5)) / 1000000).alias("p_adj"),
        (padj <= F.lit(HOLM_ALPHA)).alias("reject"),
    )


# Chi-square goodness-of-fit against the uniform distribution — the
# classic categorical-balance check a dataset card runs per dimension
# (is the event mix balanced? is the language mix?). The statistic
# sum((o - e)^2 / e) with e = n/k is computed per-category in doubles
# and QUANTIZED TO PPB BIGINTs before the sum (the gram-matrix rule:
# a 5-term double sum's last bits still depend on partial-agg order),
# then compared against the inlined 95% chi-square critical value for
# the OBSERVED df = k-1 (literal table, no CDF/igamma libm call
# anywhere). Two family rows pin both regimes on the fixtures: the
# synthetic event mix is near-uniform (accept) while the language mix
# is en-heavy (reject).
_CHISQ_CRIT_95 = {
    1: 3.841458820694124,
    2: 5.991464547107979,
    3: 7.814727903251179,
    4: 9.487729036781154,
    5: 11.070497693516351,
    6: 12.591587243743977,
    7: 14.067140449340169,
    8: 15.50731305586545,
    9: 16.918977604620448,
}


def _chisq_crit_sql(df_expr: str) -> str:
    cases = " ".join(
        f"WHEN {k} THEN CAST({v} AS DOUBLE)" for k, v in _CHISQ_CRIT_95.items()
    )
    return f"(CASE {df_expr} {cases} END)"


def _chisq_cte(table: str, col: str, dim: str) -> str:
    return f"""
      SELECT '{dim}' AS dimension,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(o) AS BIGINT) AS n,
             floor(sum(floor((o - e) * (o - e) / e * 1000000000 + 0.5))
                   / 1000000000 * 1000000 + 0.5) / 1000000 AS chisq
      FROM (
        SELECT o, CAST(sum(o) OVER () AS DOUBLE) / count(*) OVER () AS e
        FROM (SELECT CAST(count(*) AS DOUBLE) AS o FROM {table} GROUP BY {col})
      )
    """


@register(
    "stats_chisq_gof",
    oracle=f"""
    WITH fam AS (
      {_chisq_cte("events", "event_type", "event_type_uniform")}
      UNION ALL
      {_chisq_cte("documents", "lang", "lang_uniform")}
    )
    SELECT dimension, k, n, chisq,
           CAST(k - 1 AS BIGINT) AS dof,
           {_chisq_crit_sql("(k - 1)")} AS crit_95,
           chisq > {_chisq_crit_sql("(k - 1)")} AS reject_uniform
    FROM fam
    """,
)
def stats_chisq_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit vs uniform for the event-type and
    language mixes (see block comment: ppb-quantized terms, inlined
    critical-value table, both regimes pinned). One map-side-combined
    aggregate per dimension; everything after runs on k-row
    relations."""
    def one(table: str, col: str, dim: str) -> DataFrame:
        t = load_table(spark, sf_dir, table)
        counts = t.groupBy(col).agg(F.count("*").cast("double").alias("o"))
        from pyspark.sql import Window as W

        w = W.partitionBy()
        e = F.sum("o").over(w) / F.count("*").over(w)
        terms = counts.select(
            "o",
            F.floor((F.col("o") - e) * (F.col("o") - e) / e * 1000000000 + F.lit(0.5)).alias("tq"),
        )
        return terms.agg(
            F.lit(dim).alias("dimension"),
            F.count("*").cast("bigint").alias("k"),
            F.sum("o").cast("bigint").alias("n"),
            (
                F.floor(F.sum("tq") / 1000000000 * 1000000 + F.lit(0.5)) / 1000000
            ).alias("chisq"),
        )

    fam = one("events", "event_type", "event_type_uniform").unionByName(
        one("documents", "lang", "lang_uniform")
    )
    # the oracle's CASE expression IS the Spark lookup — one source of
    # truth for the critical-value table (CASE with no ELSE -> NULL)
    crit = F.expr(_chisq_crit_sql("(k - 1)"))
    return fam.select(
        "dimension",
        "k",
        "n",
        "chisq",
        (F.col("k") - 1).cast("bigint").alias("dof"),
        crit.alias("crit_95"),
        (F.col("chisq") > crit).alias("reject_uniform"),
    )


# CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013) — the
# experimentation-platform primitive: adjust each unit's metric by its
# PRE-period covariate, y_adj = y - theta*(x - mean_x) with
# theta = cov(x, y)/var(x), shrinking metric variance by the squared
# x/y correlation and with it the A/B sample size needed. Here the
# unit is the user, x = total event value in the first half of the
# fixture month, y = in the second half. Everything reduces to exact
# int64 moments over milli-quantized per-user sums (one corpus shuffle
# to user grain, one map-side-combined 1-row moment aggregate);
# var/cov/theta and the closed-form adjusted variance
# var_adj = var_y - cov^2/var_x are five fixed-shape IEEE expressions
# evaluated identically by both engines, floor-quantized at 1e6.
# Headroom: per-user milli-sums <= ~3e7, squares 1e15, summed over
# ~2e3 users at sf0.1 -> ~1e18; promote the moment sums to
# DECIMAL(38,0) past ~1e4 users x this activity (same plan).
CUPED_SPLIT_DAY = 16  # day-of-month boundary: days 1-15 = pre, 16+ = post


@register(
    "stats_cuped_variance_reduction",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN extract(day FROM ts) < {CUPED_SPLIT_DAY}
                  THEN CAST(floor(value * 1000 + 0.5) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS x,
             CAST(sum(CASE WHEN extract(day FROM ts) >= {CUPED_SPLIT_DAY}
                  THEN CAST(floor(value * 1000 + 0.5) AS BIGINT) ELSE 0 END)
               AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM per_user
    )
    SELECT n,
           floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                 * 1000000 + 0.5) / 1000000 AS theta,
           floor((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n
                 * 0.000001 * 1000000 + 0.5) / 1000000 AS var_y,
           floor(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n
                  - (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                    * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n)
                 * 0.000001 * 1000000 + 0.5) / 1000000 AS var_cuped,
           floor((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                 / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                 / (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)
                 * 1000000 + 0.5) / 1000000 AS var_reduction
    FROM m
    """,
)
def stats_cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED adjustment — see the block comment. var_y/var_cuped are
    reported in metric units (the 1e-3 quantization squared is folded
    out via the 1e-6 factor before rounding); var_reduction is the
    squared x/y correlation (the fraction of variance CUPED removes),
    unit-free. One corpus shuffle to user grain + one 1-row moment
    aggregate; nothing else."""
    e = load_table(spark, sf_dir, "events")
    v3 = F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)")
    pre = F.when(F.dayofmonth("ts") < CUPED_SPLIT_DAY, v3).otherwise(F.lit(0))
    post = F.when(F.dayofmonth("ts") >= CUPED_SPLIT_DAY, v3).otherwise(F.lit(0))
    pu = e.groupBy("user_id").agg(
        F.sum(pre).cast("bigint").alias("x"),
        F.sum(post).cast("bigint").alias("y"),
    )
    m = pu.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov_n = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / F.col("n")
    vx_n = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / F.col("n")
    vy_n = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return m.select(
        "n",
        q6(cov_n / vx_n).alias("theta"),
        q6((vy_n / n) * 0.000001).alias("var_y"),
        q6(((vy_n / n) - cov_n * cov_n / vx_n / n) * 0.000001).alias("var_cuped"),
        q6(cov_n * cov_n / vx_n / vy_n).alias("var_reduction"),
    )


# Delete-one-group jackknife (Quenouille/Tukey; the cluster-robust
# standard error every experimentation platform reports when units are
# CORRELATED within groups): leave each user cohort out in turn,
# recompute the overall mean, and estimate the variance of the mean
# from the spread of the leave-one-out replicates:
#   SE^2 = (G-1)/G * sum_g (mean_{-g} - mean_of_replicates)^2.
# Exactness: per-cohort (sum, count) are int64 over milli-quantized
# values, so every leave-one-out mean is ONE fixed-shape IEEE division
# (S - s_g)/(n - n_g); the replicate-spread sum quantizes each squared
# deviation to DECIMAL(27,15) before summing (registry ladder step 3 —
# decimal summation is exact and order-independent, so the G-term sum
# cannot differ between engines). One corpus shuffle to cohort grain;
# everything after runs on the G-row cohort relation.
JK_COHORT = 5  # user_id div 5 — same cohort grain as randomized response


@register(
    "stats_jackknife_variance",
    oracle=f"""
    WITH per_g AS (
      SELECT user_id // {JK_COHORT} AS cohort,
             CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY user_id // {JK_COHORT}
    ),
    tot AS (
      SELECT CAST(sum(s) AS BIGINT) AS st, CAST(sum(c) AS BIGINT) AS ct,
             CAST(count(*) AS BIGINT) AS g
      FROM per_g
    ),
    loo AS (
      SELECT p.cohort,
             CASE WHEN t.ct - p.c > 0
                  THEN (CAST(t.st AS DOUBLE) - p.s) / (t.ct - p.c) END AS m
      FROM per_g p CROSS JOIN tot t
    ),
    mbar AS (SELECT CAST(sum(CAST(m AS DECIMAL(27,15))) AS DOUBLE) / max(t.g) AS mb
             FROM loo CROSS JOIN tot t),
    dev AS (
      SELECT CAST(sum(CAST((loo.m - mb.mb) * (loo.m - mb.mb)
                           AS DECIMAL(27,15))) AS DOUBLE) AS ss
      FROM loo CROSS JOIN mbar mb
    )
    SELECT t.g AS n_cohorts,
           floor(CAST(t.st AS DOUBLE) / t.ct * 1000 + 0.5) / 1000000 AS mean_value,
           CASE WHEN t.g > 0 THEN
             floor(sqrt((t.g - 1.0) / t.g * d.ss) / 1000 * 1000000 + 0.5) / 1000000
           END AS jackknife_se
    FROM tot t CROSS JOIN dev d
    """,
)
def stats_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-cohort jackknife SE of the mean event value — see
    the block comment. mean_value and jackknife_se are reported in
    metric units (the 1e-3 quantization divides back out before the
    1e-6 floor). One corpus shuffle + a G-row replicate relation; the
    cross joins are 1-row broadcasts."""
    e = load_table(spark, sf_dir, "events")
    per_g = e.groupBy(F.expr(f"user_id div {JK_COHORT}").alias("cohort")).agg(
        F.sum(F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)"))
        .cast("bigint")
        .alias("s"),
        F.count("*").cast("bigint").alias("c"),
    ).transform(pin_cache)
    tot = per_g.agg(
        F.sum("s").cast("bigint").alias("st"),
        F.sum("c").cast("bigint").alias("ct"),
        F.count("*").cast("bigint").alias("g"),
    )
    # guards mirror the oracle: a single-cohort corpus makes ct - c = 0
    # (leave-one-out undefined) and an EMPTY corpus makes g = 0 — Spark
    # ANSI division would throw where DuckDB yields NULL (the empty-
    # fixture audit caught the crash)
    loo = per_g.crossJoin(F.broadcast(tot)).select(
        "cohort",
        "g",
        F.when(
            (F.col("ct") - F.col("c")) > 0,
            (F.col("st").cast("double") - F.col("s")) / (F.col("ct") - F.col("c")),
        ).alias("m"),
    ).transform(pin_cache)
    # the replicate-mean division runs in DOUBLE over the exact decimal
    # sum — a decimal/int division would round at engine-specific
    # quotient scales
    mbar = loo.agg(
        (
            F.sum(F.col("m").cast("decimal(27,15)")).cast("double") / F.max("g")
        ).alias("mb")
    )
    dev = (
        loo.crossJoin(F.broadcast(mbar))
        .agg(
            F.sum(
                (
                    (F.col("m") - F.col("mb")) * (F.col("m") - F.col("mb"))
                ).cast("decimal(27,15)")
            )
            .cast("double")
            .alias("ss")
        )
    )
    return (
        tot.crossJoin(F.broadcast(dev))
        .select(
            F.col("g").alias("n_cohorts"),
            (
                F.floor(F.col("st").cast("double") / F.col("ct") * 1000 + F.lit(0.5))
                / 1000000
            ).alias("mean_value"),
            F.when(
                F.col("g") > 0,
                F.floor(
                    F.sqrt((F.col("g") - 1.0) / F.col("g") * F.col("ss"))
                    / 1000
                    * 1000000
                    + F.lit(0.5)
                )
                / 1000000,
            ).alias("jackknife_se"),
        )
    )


# A/B power analysis — the third leg of the experimentation trio
# (CUPED reduces variance, the jackknife reports the error bar, this
# SIZES the experiment): from the observed baseline conversion rate
# (users with >= 1 purchase), compute the minimum detectable absolute
# effect of an equal-split two-proportion test at alpha = 0.05 (two-
# sided) and power = 0.8, and the per-arm sample size required to
# detect a 10% relative lift. The normal quantiles are INLINED
# LITERALS (z_{0.975} = 1.959964, z_{0.8} = 0.841621) — the repo's
# no-libm-CDF rule, same as the chi-square critical table — so both
# engines evaluate the identical fixed-shape expressions: counts are
# exact int64, then one sqrt (correctly rounded) and a handful of
# multiplications, floor-quantized at 1e6.
PWR_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
PWR_Z_BETA = 0.841621  # power = 0.8
PWR_REL_LIFT_PCT = 10  # sizing target: +10% relative


@register(
    "stats_power_analysis",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted
      FROM events GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(converted) AS BIGINT) AS n_conv
      FROM per_user
    )
    SELECT n_users, n_conv,
           floor(CAST(n_conv AS DOUBLE) / n_users * 1000000 + 0.5) / 1000000
             AS p_baseline,
           floor(({PWR_Z_ALPHA} + {PWR_Z_BETA})
                 * sqrt(2.0 * (CAST(n_conv AS DOUBLE) / n_users)
                        * (1.0 - CAST(n_conv AS DOUBLE) / n_users)
                        / (n_users // 2))
                 * 1000000 + 0.5) / 1000000 AS mde_abs,
           CAST(ceil(2.0 * (CAST(n_conv AS DOUBLE) / n_users)
                     * (1.0 - CAST(n_conv AS DOUBLE) / n_users)
                     * (({PWR_Z_ALPHA} + {PWR_Z_BETA})
                        / (0.01 * {PWR_REL_LIFT_PCT}
                           * (CAST(n_conv AS DOUBLE) / n_users)))
                     * (({PWR_Z_ALPHA} + {PWR_Z_BETA})
                        / (0.01 * {PWR_REL_LIFT_PCT}
                           * (CAST(n_conv AS DOUBLE) / n_users))))
                AS BIGINT) AS n_per_arm_for_lift
    FROM m WHERE n_users >= 2
    """,
)
def stats_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B power analysis — see the block comment for
    the literal-quantile determinism. One corpus shuffle to user grain
    + a 1-row moment aggregate; every output is a fixed-shape
    expression on two int64 counts. The n_users >= 2 guard keeps the
    per-arm division defined on degenerate corpora in both engines."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("converted")
    )
    m = per_user.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    p = F.col("n_conv").cast("double") / F.col("n_users")
    z = PWR_Z_ALPHA + PWR_Z_BETA
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    ratio = z / (0.01 * PWR_REL_LIFT_PCT * p)
    return m.where(F.col("n_users") >= 2).select(
        "n_users",
        "n_conv",
        q6(p).alias("p_baseline"),
        q6(
            z * F.sqrt(2.0 * p * (1.0 - p) / F.expr("n_users div 2"))
        ).alias("mde_abs"),
        F.ceil(2.0 * p * (1.0 - p) * ratio * ratio)
        .cast("bigint")
        .alias("n_per_arm_for_lift"),
    )


# Brown-Forsythe variance-homogeneity test (Brown & Forsythe 1974 —
# Levene's test with the MEDIAN center, the robust form): before a
# t-test/ANOVA treats groups as comparable, this tests whether their
# SPREADS differ. z_ij = |x_ij - median_j| (lower median, nearest-rank
# on the integer milli-unit histogram — exact in both engines), then
# the one-way ANOVA F statistic on the z's. Exactness protocol: all
# per-group moments (n, sum z, sum z^2) are exact int64; the ONE
# cross-group float reduction (sum of Sz_j^2/n_j) folds over the
# group list SORTED BY event_type — both engines reduce left-to-right
# over the same ordered list, so the IEEE result is bit-identical
# (the same trick _boot/_perm avoid needing by staying integer; a
# dynamic group count rules out Welch's fixed-column pivot here).
@register(
    "stats_brown_forsythe",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    h AS (
      SELECT event_type, v, count(*) AS c FROM ev GROUP BY event_type, v
    ),
    cum AS (
      SELECT event_type, v, c,
             sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cm,
             sum(c) OVER (PARTITION BY event_type) AS n
      FROM h
    ),
    med AS (
      SELECT event_type, CAST(min(CASE WHEN 2 * cm >= n THEN v END) AS BIGINT) AS md
      FROM cum GROUP BY event_type
    ),
    z AS (
      SELECT ev.event_type, abs(ev.v - med.md) AS z
      FROM ev JOIN med ON med.event_type = ev.event_type
    ),
    g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS nj,
             CAST(sum(z) AS BIGINT) AS sz,
             CAST(sum(z * z) AS BIGINT) AS szz
      FROM z GROUP BY event_type
    ),
    fold AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(nj) AS BIGINT) AS n,
             CAST(sum(sz) AS BIGINT) AS sz_tot,
             CAST(sum(szz) AS BIGINT) AS szz_tot,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
                      / CAST(nj AS DOUBLE) ORDER BY event_type)),
               (a, b) -> a + b) AS asum
      FROM g
    )
    SELECT k AS n_groups, n AS n_rows,
           CASE WHEN k > 1
                 AND (szz_tot - asum) > 0 THEN
             floor(((asum - CAST(sz_tot AS DOUBLE) * CAST(sz_tot AS DOUBLE)
                              / CAST(n AS DOUBLE))
                    / (CAST(k AS DOUBLE) - 1.0))
                   / ((CAST(szz_tot AS DOUBLE) - asum)
                      / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                   * 1000000 + 0.5) / 1000000
           END AS f_stat
    FROM fold
    """,
)
def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe robust variance-homogeneity F — see the block
    comment for the median-centered construction and the ordered-fold
    float determinism. Scale shape: value histogram per group (map-side
    combined), per-group cumulative window (partitioned by group,
    never global), a broadcast k-row median join back onto the corpus,
    one more map-side-combined moment aggregate, then k-row arithmetic
    — two corpus passes total, both exchange only bounded relations."""
    from pyspark.sql import Window as W

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    h = ev.groupBy("event_type", "v").agg(F.count("*").alias("c"))
    cum = h.select(
        "event_type",
        "v",
        F.sum("c").over(W.partitionBy("event_type").orderBy("v")).alias("cm"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n"),
    )
    med = cum.groupBy("event_type").agg(
        F.min(F.when(2 * F.col("cm") >= F.col("n"), F.col("v")))
        .cast("bigint")
        .alias("md")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("md")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("nj"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
    )
    term = (
        F.col("sz").cast("double")
        * F.col("sz").cast("double")
        / F.col("nj").cast("double")
    )
    fold = g.select("event_type", "nj", "sz", "szz", term.alias("t")).agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("nj").cast("bigint").alias("n"),
        F.sum("sz").cast("bigint").alias("sz_tot"),
        F.sum("szz").cast("bigint").alias("szz_tot"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("event_type", "t"))),
                lambda x: x.t,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("asum"),
    )
    k, n = F.col("k").cast("double"), F.col("n").cast("double")
    a = F.col("asum") - F.col("sz_tot").cast("double") * F.col(
        "sz_tot"
    ).cast("double") / n
    b = F.col("szz_tot").cast("double") - F.col("asum")
    return fold.select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_rows"),
        F.when(
            (F.col("k") > 1) & (b > 0),
            F.floor((a / (k - 1.0)) / (b / (n - k)) * 1000000 + F.lit(0.5))
            / 1000000,
        ).alias("f_stat"),
    )


# Kruskal-Wallis H (1952) — the k-group nonparametric one-way ANOVA,
# completing the rank-test ladder: stats_mann_whitney handles k = 2,
# this handles the k event types at once (rank ALL values pooled,
# compare per-group mean ranks). Exactness: tied ranks enter through
# 2*R = 2*less + c + 1 (the Mann-Whitney/AUC integer convention), so
# each group's rank-sum S2_j = sum over its values of
# c_gj * (2*less + c + 1) is exact int64 via the pooled-histogram
# prefix counts (_with_prefix_counts, bucketed two-level — no global
# single-partition window); the cross-group reduction of
# (S2_j - n_j(N+1))^2 / (4 n_j) folds over the group list sorted by
# event_type (the stats_brown_forsythe ordered-fold idiom, IEEE
# bit-identical in both engines). Tie correction T = sum(c^3 - c)
# stays int64 while no single tied value holds > ~2^21 rows per
# milli-bucket (the milli quantization spreads a [0,100] domain over
# 1e5 buckets, so realistic corpora sit orders of magnitude under it).
@register(
    "stats_kruskal_wallis",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    hg AS (
      SELECT event_type, v, CAST(count(*) AS BIGINT) AS cg
      FROM ev GROUP BY event_type, v
    ),
    hp AS (SELECT v, CAST(sum(cg) AS BIGINT) AS c FROM hg GROUP BY v),
    rk AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v) - c AS BIGINT) AS less
      FROM hp
    ),
    g AS (
      SELECT hg.event_type,
             CAST(sum(hg.cg) AS BIGINT) AS nj,
             CAST(sum(hg.cg * (2 * rk.less + rk.c + 1)) AS BIGINT) AS s2
      FROM hg JOIN rk ON rk.v = hg.v GROUP BY hg.event_type
    ),
    tt AS (
      SELECT CAST(sum(c * c * c - c) AS BIGINT) AS t,
             CAST(sum(c) AS BIGINT) AS n
      FROM hp
    ),
    fold AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list((CAST(s2 AS DOUBLE) - CAST(nj AS DOUBLE) * (t2.n + 1))
                      * (CAST(s2 AS DOUBLE) - CAST(nj AS DOUBLE) * (t2.n + 1))
                      / (4.0 * nj) ORDER BY event_type)),
               (a, b) -> a + b) AS asum
      FROM g, tt t2 GROUP BY ALL
    )
    SELECT t2.n AS n_rows, f.k AS n_groups,
           CAST(f.k - 1 AS BIGINT) AS df,
           CASE WHEN f.k > 1 AND t2.n > 1
                 AND (1.0 - CAST(t2.t AS DOUBLE)
                      / (CAST(t2.n AS DOUBLE) * t2.n * t2.n - t2.n)) > 0 THEN
             floor((12.0 * f.asum
                    / (CAST(t2.n AS DOUBLE) * (t2.n + 1)))
                   / (1.0 - CAST(t2.t AS DOUBLE)
                      / (CAST(t2.n AS DOUBLE) * t2.n * t2.n - t2.n))
                   * 1000000 + 0.5) / 1000000
           END AS h_stat
    FROM fold f, tt t2
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across event types — see the block comment for
    the integer rank convention, tie correction, and the ordered-fold
    determinism. Scale shape: value histogram (map-side combined),
    bucketed two-level prefix ranks (_with_prefix_counts — the pooled
    rank never sees a corpus-sized single partition), one
    histogram-sized join, then k-row arithmetic."""
    from kinesis2sse_spark.queries.ml_eval import _with_prefix_counts

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    hg = ev.groupBy("event_type", "v").agg(
        F.count("*").cast("bigint").alias("cg")
    )
    # pooled histogram: the prefix helper's caller-persist contract
    hp = (
        hg.groupBy("v")
        .agg(F.sum("cg").cast("bigint").alias("c"))
        .select(F.col("v").alias("s"), "c", F.lit(0).cast("bigint").alias("cp"))
        .transform(pin_cache)
    )
    rk = _with_prefix_counts(hp, keys=(), keep_value=True).select(
        F.col("s").alias("v"), "c", "less"
    )
    g = (
        hg.join(rk, "v")
        .groupBy("event_type")
        .agg(
            F.sum("cg").cast("bigint").alias("nj"),
            F.sum(F.col("cg") * (2 * F.col("less") + F.col("c") + 1))
            .cast("bigint")
            .alias("s2"),
        )
    )
    tt = hp.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("bigint")
        .alias("t"),
        F.sum("c").cast("bigint").alias("n"),
    )
    nd = F.col("n").cast("double")
    term = (
        (F.col("s2").cast("double") - F.col("nj").cast("double") * (F.col("n") + 1))
        * (F.col("s2").cast("double") - F.col("nj").cast("double") * (F.col("n") + 1))
        / (4.0 * F.col("nj"))
    )
    # global (not keyed) fold: a keyed groupBy over an empty group
    # relation emits ZERO rows while the oracle's ungrouped aggregate
    # emits one — the empty-fixture divergence class; n/t re-join from
    # the 1-row tt aggregate instead of riding the grouping key.
    fold = (
        g.crossJoin(F.broadcast(tt))
        .select("event_type", term.alias("term"))
        .agg(
            F.count("*").cast("bigint").alias("k"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("event_type", "term"))),
                    lambda x: x.term,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("asum"),
        )
        .crossJoin(F.broadcast(tt))
    )
    corr = 1.0 - F.col("t").cast("double") / (nd * nd * nd - nd)
    return fold.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_groups"),
        (F.col("k") - 1).cast("bigint").alias("df"),
        F.when(
            (F.col("k") > 1) & (F.col("n") > 1) & (corr > 0),
            F.floor(
                (12.0 * F.col("asum") / (nd * (F.col("n") + 1)))
                / corr
                * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("h_stat"),
    )


@register(
    "stats_cohens_d",
    oracle=f"""
    WITH agg AS (
      SELECT CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN n_chars ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN n_chars * n_chars ELSE 0 END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE 1 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE n_chars END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE n_chars * n_chars END) AS BIGINT) AS q0
      FROM documents
    ),
    m AS (
      SELECT n1, n0,
             CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0 AS diff,
             ((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
              + (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0))
               / (CAST(n1 AS DOUBLE) + n0 - 2.0) AS vp
      FROM agg
    )
    SELECT n1 AS n_group1, n0 AS n_group0,
           CASE WHEN n1 + n0 > 2 AND vp > 0 THEN
             floor(diff / sqrt(vp) * 1000000 + 0.5) / 1000000
           END AS cohens_d,
           CASE WHEN n1 + n0 > 2 AND vp > 0 THEN
             floor(diff / sqrt(vp)
                   * (1.0 - 3.0 / (4.0 * (CAST(n1 AS DOUBLE) + n0) - 9.0))
                   * 1000000 + 0.5) / 1000000
           END AS hedges_g
    FROM m
    """,
)
def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d + Hedges' g (small-sample-corrected) standardized
    effect size for the stats_welch_ttest contrast — the companion
    every significance test needs at corpus scale, where n is so large
    that trivial differences reach p < 0.05 and only the effect SIZE
    says whether a difference matters. Pooled-variance convention
    (same-variance assumption is what d standardizes by; Welch's
    separate-variance t rides alongside, not instead). Same plan shape
    as Welch: ONE map-side-combined corpus aggregate pivoting both
    groups into columns of a single row — exact int64 raw moments —
    then fixed-shape 1-row float arithmetic, floor-quantized 1e6."""
    d = load_table(spark, sf_dir, "documents")
    is1 = F.col("lang") == TTEST_LANG
    agg = d.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, F.col("n_chars")).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(is1, F.col("n_chars") * F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("q1"),
        F.sum(F.when(is1, 0).otherwise(1)).cast("bigint").alias("n0"),
        F.sum(F.when(is1, 0).otherwise(F.col("n_chars"))).cast("bigint").alias("s0"),
        F.sum(F.when(is1, 0).otherwise(F.col("n_chars") * F.col("n_chars")))
        .cast("bigint")
        .alias("q0"),
    )
    n1, n0 = F.col("n1").cast("double"), F.col("n0").cast("double")
    s1, s0 = F.col("s1").cast("double"), F.col("s0").cast("double")
    q1, q0 = F.col("q1").cast("double"), F.col("q0").cast("double")
    diff = s1 / n1 - s0 / n0
    vp = ((q1 - s1 * s1 / n1) + (q0 - s0 * s0 / n0)) / (n1 + n0 - 2.0)
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    ok = (F.col("n1") + F.col("n0") > 2) & (vp > 0)
    return agg.select(
        F.col("n1").alias("n_group1"),
        F.col("n0").alias("n_group0"),
        F.when(ok, q6(diff / F.sqrt(vp))).alias("cohens_d"),
        F.when(
            ok,
            q6(diff / F.sqrt(vp) * (1.0 - 3.0 / (4.0 * (n1 + n0) - 9.0))),
        ).alias("hedges_g"),
    )


# Wilson score interval (Wilson 1927) — the production-grade binomial
# proportion CI (unlike the Wald interval it never leaves [0,1] and
# stays calibrated at extreme rates / small n), the interval every
# rate dashboard and A/B readout should use. Proportion under test:
# the share of events whose props.k lands in the top half of its
# domain (k >= 50), per event type. z is pinned to the 97.5th normal
# quantile as a shared literal so both engines run the identical IEEE
# double ladder from identical int64 (n, x).
WILSON_Z = "CAST(1.959963984540054 AS DOUBLE)"  # Phi^-1(0.975)


@register(
    "stats_wilson_ci",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT)
                           >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, x,
           floor(CAST(x AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS p_hat,
           floor((CAST(x AS DOUBLE) / n + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  - {WILSON_Z} * sqrt((CAST(x AS DOUBLE) / n)
                      * (1 - CAST(x AS DOUBLE) / n) / n
                      + {WILSON_Z} * {WILSON_Z} / (4.0 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n) * 1000000 + 0.5)
             / 1000000 AS wilson_lo,
           floor((CAST(x AS DOUBLE) / n + {WILSON_Z} * {WILSON_Z} / (2 * n)
                  + {WILSON_Z} * sqrt((CAST(x AS DOUBLE) / n)
                      * (1 - CAST(x AS DOUBLE) / n) / n
                      + {WILSON_Z} * {WILSON_Z} / (4.0 * n * n)))
                 / (1 + {WILSON_Z} * {WILSON_Z} / n) * 1000000 + 0.5)
             / 1000000 AS wilson_hi
    FROM c WHERE n > 0
    """,
)
def stats_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Wilson score interval for the per-type rate of high-k
    events — see the block comment. Scale shape: ONE map-side-combined
    count/sum aggregate over the domain-bounded type set; the interval
    arithmetic is a projection over |types| rows. Identical IEEE
    expression tree both engines (shared z literal, n/x int64)."""
    e = load_table(spark, sf_dir, "events")
    hit = (
        F.get_json_object("props", "$.k").cast("bigint") >= 50
    ).cast("int")
    c = e.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(hit).cast("bigint").alias("x"),
    )
    z = F.expr(WILSON_Z)
    n, x = F.col("n").cast("double"), F.col("x").cast("double")
    p = x / n
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return c.where(F.col("n") > 0).select(
        "event_type",
        "n",
        "x",
        q6(p).alias("p_hat"),
        q6((center - half) / denom).alias("wilson_lo"),
        q6((center + half) / denom).alias("wilson_hi"),
    )


# Kendall tau-b rank correlation (Kendall 1945, the tie-corrected
# form) between DAILY VOLUME and DAILY MEAN VALUE per event type —
# "do busy days run hot?". The corpus collapses FIRST to one row per
# (type, day) via a map-side aggregate; the pair stage then runs on
# the day-aggregated relation, so its cost is |days|^2 per type —
# bounded by the retention window (3650 days of retention = ~13M
# integer comparisons), NOT by corpus size. All tau ingredients are
# exact integers (concordant/discordant/tie counts over int64 keys:
# daily count, and daily value-sum cross-multiplied against counts to
# compare means without division); the final tau is two IEEE ops from
# int64.
@register(
    "stats_kendall_tau",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
               AS s
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type,
             CASE WHEN a.n > b.n THEN 1 WHEN a.n < b.n THEN -1 ELSE 0 END
               AS sx,
             -- mean comparison via cross-multiplication: sa/na vs sb/nb
             CASE WHEN a.s * b.n > b.s * a.n THEN 1
                  WHEN a.s * b.n < b.s * a.n THEN -1 ELSE 0 END AS sy
      FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
    ),
    c AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS concordant,
             CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS discordant,
             CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
             CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
      FROM p GROUP BY event_type
    )
    SELECT event_type, n_pairs, concordant, discordant,
           CASE WHEN (n_pairs - ties_x) > 0 AND (n_pairs - ties_y) > 0 THEN
             floor((concordant - discordant)
                   / sqrt(CAST(n_pairs - ties_x AS DOUBLE)
                          * (n_pairs - ties_y)) * 1000000 + 0.5) / 1000000
           END AS tau_b
    FROM c
    """,
)
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily volume and daily mean value per
    event type — see the block comment for the exact-integer pair
    machinery and the retention-bounded (not corpus-bounded) pair
    stage. Note tau-b's tie handling here uses the pairwise identity
    n0 - n1 = n_pairs - ties_x (pairs tied on x), which equals
    Kendall's sum-over-groups form exactly."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = e.groupBy(
        "event_type",
        F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long"))
        .cast("bigint")
        .alias("s"),
    ).transform(pin_cache)
    a = d.select(
        "event_type",
        F.col("day").alias("da"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = d.select(
        "event_type",
        F.col("day").alias("db"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    sx = (
        F.when(F.col("na") > F.col("nb"), 1)
        .when(F.col("na") < F.col("nb"), -1)
        .otherwise(0)
    )
    sy = (
        F.when(F.col("sa") * F.col("nb") > F.col("sb") * F.col("na"), 1)
        .when(F.col("sa") * F.col("nb") < F.col("sb") * F.col("na"), -1)
        .otherwise(0)
    )
    p = (
        a.join(b, "event_type")
        .where(F.col("da") < F.col("db"))
        .select("event_type", sx.alias("sx"), sy.alias("sy"))
    )
    c = p.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum((F.col("sx") * F.col("sy") == 1).cast("int"))
        .cast("bigint")
        .alias("concordant"),
        F.sum((F.col("sx") * F.col("sy") == -1).cast("int"))
        .cast("bigint")
        .alias("discordant"),
        F.sum((F.col("sx") == 0).cast("int")).cast("bigint").alias("ties_x"),
        F.sum((F.col("sy") == 0).cast("int")).cast("bigint").alias("ties_y"),
    )
    denom_ok = (F.col("n_pairs") - F.col("ties_x") > 0) & (
        F.col("n_pairs") - F.col("ties_y") > 0
    )
    tau = (
        (F.col("concordant") - F.col("discordant"))
        / F.sqrt(
            (F.col("n_pairs") - F.col("ties_x")).cast("double")
            * (F.col("n_pairs") - F.col("ties_y"))
        )
    )
    return c.select(
        "event_type",
        "n_pairs",
        "concordant",
        "discordant",
        F.when(
            denom_ok, F.floor(tau * 1000000 + F.lit(0.5)) / 1000000
        ).alias("tau_b"),
    )


# Mann-Kendall trend test (Mann 1945 / Kendall 1975) on the DAILY
# VOLUME series per event type — "is traffic monotonically trending?".
# The day-aggregated relation is the same retention-bounded one
# stats_kendall_tau rides (pair stage is |days|^2 per type, NOT
# corpus-bounded); the corpus collapses to it with one map-side
# aggregate. S = sum_{i<j} sign(x_j - x_i) is exact int64. The
# tie-corrected variance is kept as the exact integer
# var18 = n(n-1)(2n+5) - sum_t t(t-1)(2t+5) (i.e. 18*Var(S)), so the
# only floating point is the final continuity-corrected
# z = (S -/+ 1)/sqrt(var18/18) — one fixed-shape IEEE expression,
# floor-quantized at 1e6, identical operation order in both engines.
@register(
    "stats_mann_kendall",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    s AS (
      SELECT a.event_type,
             CAST(sum(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
      FROM d a JOIN d b ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY a.event_type
    ),
    n AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM d
      GROUP BY event_type
    ),
    t AS (
      SELECT event_type,
             CAST(sum(tc * (tc - 1) * (2 * tc + 5)) AS BIGINT) AS tie_term
      FROM (
        SELECT event_type, x, CAST(count(*) AS BIGINT) AS tc
        FROM d GROUP BY event_type, x
      ) GROUP BY event_type
    )
    SELECT n.event_type, n.n_days, s.s_stat,
           n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term
             AS var18,
           CASE WHEN n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                     - t.tie_term > 0 THEN
             floor(CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                        WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                        ELSE 0.0 END
                   / sqrt(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                               - t.tie_term AS DOUBLE) / 18.0)
                   * 1000000 + 0.5) / 1000000
           END AS z_stat
    FROM n JOIN s USING (event_type) JOIN t USING (event_type)
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on daily event volume per
    type — see the block comment for the exact-integer S / var18
    machinery and the retention-bounded pair stage."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = e.groupBy(
        "event_type",
        F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
    ).agg(F.count("*").cast("bigint").alias("x")).transform(pin_cache)
    a = d.select("event_type", F.col("day").alias("da"), F.col("x").alias("xa"))
    b = d.select("event_type", F.col("day").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(b, "event_type")
        .where(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = d.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n_days"))
    t = (
        d.groupBy("event_type", "x")
        .agg(F.count("*").cast("bigint").alias("tc"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    var18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    num = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double"))
        .otherwise(F.lit(0.0))
    )
    z = num / F.sqrt(var18.cast("double") / 18.0)
    return (
        n.join(s, "event_type")
        .join(t, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            var18.cast("bigint").alias("var18"),
            F.when(var18 > 0, F.floor(z * 1000000 + F.lit(0.5)) / 1000000).alias(
                "z_stat"
            ),
        )
    )


# Krippendorff's alpha (nominal scale) — inter-rater agreement where
# UNITS are users, RATERS are event types (each (user, type) pair's
# single "rating" is the band of its mean event value), the
# reliability check a labeling pipeline runs on multi-source
# annotations. Exactness: the per-unit 1/(m_u - 1) weights make the
# observed-disagreement sum rational, so it is scaled by
# KRIPP_L = 2520 = lcm(1..9) — exact int64 for any unit with at most
# 10 raters (the rater set here is the domain-bounded event-type set;
# units outside 2..10 ratings are excluded and counted). Ratings:
# band c = least(3, sum_milli div (35000 * cnt)) compares the exact
# 1e-3-quantized value mean against 35-unit band edges by integer
# cross-multiplication — no division, no FP. alpha's closing
# expression is exact-int arithmetic up to ONE division (and n^2
# stays in int64 below ~3e9 total ratings — the welch q-moment
# overflow convention, documented there). Scale: corpus -> one
# map-side (user, type) aggregate; everything after lives on the
# users x types relation (bounded by active-user count, the natural
# key), with 1-row totals broadcast.
KRIPP_L = 2520  # lcm(1..9): exact 1/(m_u-1) scaling for m_u <= 10
KRIPP_BAND = 35000  # 1e-3-scaled mean-value band width


@register(
    "stats_krippendorff_alpha",
    oracle=f"""
    WITH r AS (
      SELECT user_id,
             least(3, CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))
                           // ({KRIPP_BAND} * count(*)) AS BIGINT)) AS c
      FROM events
      GROUP BY user_id, event_type
    ),
    u AS (
      SELECT user_id, c, CAST(count(*) AS BIGINT) AS n_uc,
             CAST(sum(count(*)) OVER (PARTITION BY user_id) AS BIGINT) AS m_u
      FROM r GROUP BY user_id, c
    ),
    k AS (SELECT * FROM u WHERE m_u BETWEEN 2 AND 10),
    do_ AS (
      SELECT CAST(sum(n_uc * (m_u - n_uc) * ({KRIPP_L} // (m_u - 1)))
                  AS BIGINT) AS do_scaled,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_units,
             CAST(sum(n_uc) AS BIGINT) AS n_ratings
      FROM k
    ),
    nc AS (
      SELECT CAST(sum(s * s) AS BIGINT) AS sum_nc2
      FROM (SELECT c, CAST(sum(n_uc) AS BIGINT) AS s FROM k GROUP BY c)
    )
    SELECT n_ratings, n_units, do_scaled,
           CASE WHEN n_ratings * n_ratings - sum_nc2 > 0 THEN
             floor((1.0 - CAST(do_scaled * (n_ratings - 1) AS DOUBLE)
                    / ({KRIPP_L}.0
                       * CAST(n_ratings * n_ratings - sum_nc2 AS DOUBLE)))
                   * 1000000 + 0.5) / 1000000
           END AS alpha
    FROM do_, nc
    """,
)
def stats_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) over per-(user, event_type)
    mean-value bands — see the block comment for the exact lcm-scaled
    disagreement machinery and the users-bounded intermediate."""
    e = load_table(spark, sf_dir, "events")
    r = (
        e.groupBy("user_id", "event_type")
        .agg(
            F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long"))
            .cast("bigint")
            .alias("sm"),
            F.count("*").cast("bigint").alias("cnt"),
        )
        .select(
            "user_id",
            F.least(
                F.lit(3).cast("bigint"),
                F.expr(f"sm div ({KRIPP_BAND} * cnt)"),
            ).alias("c"),
        )
    )
    u = r.groupBy("user_id", "c").agg(F.count("*").cast("bigint").alias("n_uc"))
    w = Window.partitionBy("user_id")
    k = u.withColumn("m_u", F.sum("n_uc").over(w).cast("bigint")).where(
        F.col("m_u").between(2, 10)
    ).transform(pin_cache)
    do_ = k.agg(
        F.sum(
            F.col("n_uc")
            * (F.col("m_u") - F.col("n_uc"))
            * F.expr(f"CAST({KRIPP_L} AS BIGINT) div (m_u - 1)")
        )
        .cast("bigint")
        .alias("do_scaled"),
        F.count_distinct("user_id").cast("bigint").alias("n_units"),
        F.sum("n_uc").cast("bigint").alias("n_ratings"),
    )
    nc = (
        k.groupBy("c")
        .agg(F.sum("n_uc").cast("bigint").alias("s"))
        .agg(F.sum(F.col("s") * F.col("s")).cast("bigint").alias("sum_nc2"))
    )
    j = do_.crossJoin(F.broadcast(nc))
    n = F.col("n_ratings")
    denom = n * n - F.col("sum_nc2")
    alpha = F.lit(1.0) - (
        (F.col("do_scaled") * (n - 1)).cast("double")
        / (F.lit(float(KRIPP_L)) * denom.cast("double"))
    )
    return j.select(
        "n_ratings",
        "n_units",
        "do_scaled",
        F.when(denom > 0, F.floor(alpha * 1000000 + F.lit(0.5)) / 1000000).alias(
            "alpha"
        ),
    )


# TOST equivalence test (Schuirmann 1987, two one-sided tests) on the
# stats_welch_ttest contrast — "is the English-vs-rest mean document
# length equivalent WITHIN +/- TOST_MARGIN chars?", the flip side of
# the difference test a dataset-drift gate actually wants ("prove the
# refresh did NOT move the distribution"). Same six exact int64
# moments (one map-side aggregate pass; per-row n_chars^2 keeps the
# squares exact below ~3e9 docs — the welch overflow convention);
# t_lower = (diff + margin)/se and t_upper = (margin - diff)/se are
# each ONE fixed-shape IEEE expression floor-quantized at 1e6.
# Decision uses the z critical value (documented large-sample normal
# approximation — Welch df here is in the thousands, where t and z
# agree to 4 decimals); equivalent = min(t_lower, t_upper) > z_0.95.
TOST_MARGIN = "CAST(25.0 AS DOUBLE)"  # equivalence margin, chars
TOST_Z_CRIT = "CAST(1.6448536269514722 AS DOUBLE)"  # Phi^-1(0.95)


@register(
    "stats_tost_equivalence",
    oracle=f"""
    WITH agg AS (
      SELECT CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN n_chars ELSE 0 END) AS BIGINT) AS s1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN n_chars * n_chars ELSE 0 END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE 1 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE n_chars END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN lang = '{TTEST_LANG}' THEN 0 ELSE n_chars * n_chars END) AS BIGINT) AS q0
      FROM documents
    ),
    se AS (
      SELECT n1, n0,
             CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS diff,
             sqrt((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                    / (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE)
                  + (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                    / (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE)) AS se
      FROM agg
    )
    SELECT n1 AS n_group1, n0 AS n_group0,
           floor(diff * 1000000 + 0.5) / 1000000 AS mean_diff,
           CASE WHEN n1 > 1 AND n0 > 1 THEN
             floor((diff + {TOST_MARGIN}) / se * 1000000 + 0.5) / 1000000
           END AS t_lower,
           CASE WHEN n1 > 1 AND n0 > 1 THEN
             floor(({TOST_MARGIN} - diff) / se * 1000000 + 0.5) / 1000000
           END AS t_upper,
           CASE WHEN n1 > 1 AND n0 > 1 THEN
             least((diff + {TOST_MARGIN}) / se, ({TOST_MARGIN} - diff) / se)
               > {TOST_Z_CRIT}
           END AS equivalent
    FROM se
    """,
)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence on mean document length, English vs rest —
    see the block comment for the margin, exact moments, and the
    documented large-sample z approximation of the decision rule."""
    d = load_table(spark, sf_dir, "documents")
    is1 = F.col("lang") == TTEST_LANG
    nc = F.col("n_chars")
    agg = d.agg(
        F.sum(F.when(is1, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(is1, nc).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(is1, nc * nc).otherwise(0)).cast("bigint").alias("q1"),
        F.sum(F.when(is1, 0).otherwise(1)).cast("bigint").alias("n0"),
        F.sum(F.when(is1, 0).otherwise(nc)).cast("bigint").alias("s0"),
        F.sum(F.when(is1, 0).otherwise(nc * nc)).cast("bigint").alias("q0"),
    )
    n1d, n0d = F.col("n1").cast("double"), F.col("n0").cast("double")
    s1d, s0d = F.col("s1").cast("double"), F.col("s0").cast("double")
    q1d, q0d = F.col("q1").cast("double"), F.col("q0").cast("double")
    se = agg.select(
        "n1",
        "n0",
        (s1d / n1d - s0d / n0d).alias("diff"),
        F.sqrt(
            (q1d - s1d * s1d / n1d) / (n1d - 1.0) / n1d
            + (q0d - s0d * s0d / n0d) / (n0d - 1.0) / n0d
        ).alias("se"),
    )
    margin = F.expr(TOST_MARGIN)
    zc = F.expr(TOST_Z_CRIT)
    ok = (F.col("n1") > 1) & (F.col("n0") > 1)
    tl = (F.col("diff") + margin) / F.col("se")
    tu = (margin - F.col("diff")) / F.col("se")
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return se.select(
        F.col("n1").alias("n_group1"),
        F.col("n0").alias("n_group0"),
        q6(F.col("diff")).alias("mean_diff"),
        F.when(ok, q6(tl)).alias("t_lower"),
        F.when(ok, q6(tu)).alias("t_upper"),
        F.when(ok, F.least(tl, tu) > zc).alias("equivalent"),
    )


# Fleiss' kappa (Fleiss 1971) — multi-rater chance-corrected
# agreement on the SAME (user-as-unit, event-type-as-rater,
# mean-value-band-as-category) rating relation Krippendorff's alpha
# uses, for the classic fixed-panel case: every unit rated by exactly
# the same NUMBER of raters m (units with a different rater count are
# excluded and the kept count released — the standard Fleiss
# precondition). With m constant, every per-unit agreement
# P_i = (sum_c n_uc^2 - m)/(m(m-1)) shares one denominator, so
# P_bar, P_e and kappa reduce to exact int64 sums (sum over units of
# sum_c n_uc^2; per-category totals n_c) with ONE final fixed-shape
# IEEE expression, floor-quantized at 1e6 — no per-unit FP
# accumulation anywhere. Scale: corpus -> map-side (user, type)
# aggregate -> users-bounded relation -> 1-row moments.
FLEISS_M = 5  # fixed rater-panel size (the fixture's event-type count)


@register(
    "stats_fleiss_kappa",
    oracle=f"""
    WITH r AS (
      SELECT user_id,
             least(3, CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))
                           // ({KRIPP_BAND} * count(*)) AS BIGINT)) AS c
      FROM events
      GROUP BY user_id, event_type
    ),
    u AS (
      SELECT user_id, c, CAST(count(*) AS BIGINT) AS n_uc,
             CAST(sum(count(*)) OVER (PARTITION BY user_id) AS BIGINT) AS m_u
      FROM r GROUP BY user_id, c
    ),
    k AS (SELECT * FROM u WHERE m_u = {FLEISS_M}),
    mom AS (
      SELECT CAST(sum(n_uc * n_uc) AS BIGINT) AS sum_sq,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_units
      FROM k
    ),
    nc AS (
      SELECT CAST(sum(s * s) AS BIGINT) AS sum_nc2
      FROM (SELECT c, CAST(sum(n_uc) AS BIGINT) AS s FROM k GROUP BY c)
    )
    SELECT n_units, sum_sq,
           CASE WHEN n_units > 0 THEN
             floor((CAST(sum_sq - n_units * {FLEISS_M} AS DOUBLE)
                    / CAST(n_units * {FLEISS_M} * ({FLEISS_M} - 1) AS DOUBLE))
                   * 1000000 + 0.5) / 1000000
           END AS p_bar,
           CASE WHEN n_units > 0 THEN
             floor(CAST(sum_nc2 AS DOUBLE)
                   / (CAST(n_units * {FLEISS_M} AS DOUBLE)
                      * CAST(n_units * {FLEISS_M} AS DOUBLE))
                   * 1000000 + 0.5) / 1000000
           END AS p_e,
           CASE WHEN n_units > 0
                 AND CAST(sum_nc2 AS DOUBLE)
                     < CAST(n_units * {FLEISS_M} AS DOUBLE)
                       * CAST(n_units * {FLEISS_M} AS DOUBLE) THEN
             floor((CAST(sum_sq - n_units * {FLEISS_M} AS DOUBLE)
                      / CAST(n_units * {FLEISS_M} * ({FLEISS_M} - 1) AS DOUBLE)
                    - CAST(sum_nc2 AS DOUBLE)
                      / (CAST(n_units * {FLEISS_M} AS DOUBLE)
                         * CAST(n_units * {FLEISS_M} AS DOUBLE)))
                   / (1.0 - CAST(sum_nc2 AS DOUBLE)
                            / (CAST(n_units * {FLEISS_M} AS DOUBLE)
                               * CAST(n_units * {FLEISS_M} AS DOUBLE)))
                   * 1000000 + 0.5) / 1000000
           END AS kappa
    FROM mom, nc
    """,
)
def stats_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the fixed 5-rater (user, event-type) band
    ratings — see the block comment for the constant-denominator
    exact-moment reduction."""
    e = load_table(spark, sf_dir, "events")
    r = (
        e.groupBy("user_id", "event_type")
        .agg(
            F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long"))
            .cast("bigint")
            .alias("sm"),
            F.count("*").cast("bigint").alias("cnt"),
        )
        .select(
            "user_id",
            F.least(
                F.lit(3).cast("bigint"),
                F.expr(f"sm div ({KRIPP_BAND} * cnt)"),
            ).alias("c"),
        )
    )
    u = r.groupBy("user_id", "c").agg(F.count("*").cast("bigint").alias("n_uc"))
    w = Window.partitionBy("user_id")
    k = (
        u.withColumn("m_u", F.sum("n_uc").over(w).cast("bigint"))
        .where(F.col("m_u") == FLEISS_M)
        .transform(pin_cache)
    )
    mom = k.agg(
        F.sum(F.col("n_uc") * F.col("n_uc")).cast("bigint").alias("sum_sq"),
        F.count_distinct("user_id").cast("bigint").alias("n_units"),
    )
    nc = (
        k.groupBy("c")
        .agg(F.sum("n_uc").cast("bigint").alias("s"))
        .agg(F.sum(F.col("s") * F.col("s")).cast("bigint").alias("sum_nc2"))
    )
    j = mom.crossJoin(F.broadcast(nc))
    nm = (F.col("n_units") * FLEISS_M).cast("double")
    p_bar = (F.col("sum_sq") - F.col("n_units") * FLEISS_M).cast("double") / (
        F.col("n_units") * FLEISS_M * (FLEISS_M - 1)
    ).cast("double")
    p_e = F.col("sum_nc2").cast("double") / (nm * nm)
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    ok = F.col("n_units") > 0
    return j.select(
        "n_units",
        "sum_sq",
        F.when(ok, q6(p_bar)).alias("p_bar"),
        F.when(ok, q6(p_e)).alias("p_e"),
        F.when(
            ok & (F.col("sum_nc2").cast("double") < nm * nm),
            q6((p_bar - p_e) / (F.lit(1.0) - p_e)),
        ).alias("kappa"),
    )


# --- one-way ANOVA -----------------------------------------------------------
# The parametric companion of stats_kruskal_wallis on the same contrast
# (event value by event_type; reference query surface parity: the engine's
# stats ladder, cf. kinesis2sse.go:1 which has no stats at all — this is the
# LLM-pipeline extension surface). Exactness: values quantize to the milli
# lattice (int64), so per-group n/sum/sum-of-squares are exact integer
# moments; the only floating point is the k-term group fold (ordered by
# event_type — the stats_brown_forsythe idiom, IEEE bit-identical in both
# engines) and the final 3-term F arithmetic, floor-quantized 1e6.
@register(
    "stats_anova_oneway",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS nj,
             CAST(sum(v) AS BIGINT) AS sj,
             CAST(sum(v * v) AS BIGINT) AS qj
      FROM ev GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(sum(nj) AS BIGINT) AS n,
             CAST(sum(sj) AS BIGINT) AS s,
             CAST(sum(qj) AS BIGINT) AS q,
             CAST(count(*) AS BIGINT) AS k
      FROM g
    ),
    fold AS (
      SELECT list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list(CAST(sj AS DOUBLE) * sj / nj ORDER BY event_type)),
               (a, b) -> a + b) AS sb
      FROM g
    )
    SELECT t.n AS n_rows, t.k AS n_groups,
           CAST(t.k - 1 AS BIGINT) AS df_between,
           CAST(t.n - t.k AS BIGINT) AS df_within,
           CASE WHEN t.k > 1 AND t.n > t.k
                 AND (CAST(t.q AS DOUBLE) - f.sb) > 0 THEN
             floor(((f.sb - CAST(t.s AS DOUBLE) * t.s / t.n)
                    / (CAST(t.k AS DOUBLE) - 1))
                   / ((CAST(t.q AS DOUBLE) - f.sb)
                      / (CAST(t.n AS DOUBLE) - t.k))
                   * 1000000 + 0.5) / 1000000
           END AS f_stat
    FROM tot t, fold f
    """,
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across event types — the parametric twin of
    stats_kruskal_wallis, sharing its milli-lattice quantization so the
    per-group moments (n, sum, sum-of-squares) are exact int64. Plan:
    ONE map-side-combined hash aggregate to k group rows, a k-row
    ordered fold for the between-group sum (event_type order, the
    Brown-Forsythe determinism idiom), then 1-row F arithmetic. Nothing
    scales with the corpus except the map-side combine."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("nj"),
        F.sum("v").cast("bigint").alias("sj"),
        F.sum(F.col("v") * F.col("v")).cast("bigint").alias("qj"),
    )
    fold = g.agg(
        F.sum("nj").cast("bigint").alias("n"),
        F.sum("sj").cast("bigint").alias("s"),
        F.sum("qj").cast("bigint").alias("q"),
        F.count("*").cast("bigint").alias("k"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "event_type",
                            (F.col("sj").cast("double") * F.col("sj") / F.col("nj")).alias(
                                "term"
                            ),
                        )
                    )
                ),
                lambda x: x.term,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("sb"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    ssb = F.col("sb") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = F.col("q").cast("double") - F.col("sb")
    return fold.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_groups"),
        (F.col("k") - 1).cast("bigint").alias("df_between"),
        (F.col("n") - F.col("k")).cast("bigint").alias("df_within"),
        F.when(
            (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ssw > 0),
            F.floor(
                (ssb / (kd - 1)) / (ssw / (nd - kd)) * 1000000 + F.lit(0.5)
            )
            / 1000000,
        ).alias("f_stat"),
    )


# --- McNemar's paired test ---------------------------------------------------
# Two paired binary "classifiers" over the same events: A = high-value
# (value > threshold), B = high-k (props.k >= 50, the event_pipeline
# convention). McNemar asks whether the two disagree symmetrically —
# the standard paired A/B-vs-A/B comparison when upgrading a production
# filter. Entirely integer-exact: four contingency counts from one
# map-side aggregate; the statistic is a 2-term rational.
MCNEMAR_VALUE_T = 34.0  # ~median event value at every SF (synthesis-invariant)


@register(
    "stats_mcnemar",
    oracle=f"""
    WITH p AS (
      SELECT CASE WHEN value > {MCNEMAR_VALUE_T} THEN 1 ELSE 0 END AS a,
             CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) >= 50
                  THEN 1 ELSE 0 END AS b
      FROM events
      WHERE value IS NOT NULL AND props IS NOT NULL AND json_valid(props)
        AND json_extract(props, '$.k') IS NOT NULL
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
             CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11
      FROM p
    )
    SELECT n00, n01, n10, n11,
           CASE WHEN n01 + n10 > 0 THEN
             floor(CAST((n01 - n10) * (n01 - n10) AS DOUBLE) / (n01 + n10)
                   * 1000000 + 0.5) / 1000000
           END AS chi2,
           CASE WHEN n01 + n10 > 0 THEN
             floor(CAST(greatest(abs(n01 - n10) - 1, 0)
                        * greatest(abs(n01 - n10) - 1, 0) AS DOUBLE)
                   / (n01 + n10) * 1000000 + 0.5) / 1000000
           END AS chi2_cc
    FROM c
    """,
)
def stats_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary classifiers (high-value vs
    high-k on the same events) — discordant-pair chi-square, plain and
    continuity-corrected. ONE map-side-combined corpus aggregate
    pivots the 2x2 contingency into a single row of exact int64
    counts; the statistic is integer-rational, floor-quantized 1e6
    only at the final division. Nothing shuffles but 4 counters."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    p = e.where(
        F.col("value").isNotNull()
        & F.col("props").isNotNull()
        & k.isNotNull()
    ).select(
        (F.col("value") > MCNEMAR_VALUE_T).cast("int").alias("a"),
        (k >= 50).cast("int").alias("b"),
    )
    c = p.agg(
        F.sum(((F.col("a") == 0) & (F.col("b") == 0)).cast("int"))
        .cast("bigint")
        .alias("n00"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 1)).cast("int"))
        .cast("bigint")
        .alias("n01"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("int"))
        .cast("bigint")
        .alias("n10"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 1)).cast("int"))
        .cast("bigint")
        .alias("n11"),
    )
    d = F.col("n01") - F.col("n10")
    tot = F.col("n01") + F.col("n10")
    dc = F.greatest(F.abs(d) - 1, F.lit(0))
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return c.select(
        "n00",
        "n01",
        "n10",
        "n11",
        F.when(tot > 0, q6((d * d).cast("double") / tot)).alias("chi2"),
        F.when(tot > 0, q6((dc * dc).cast("double") / tot)).alias("chi2_cc"),
    )


# --- Friedman test -----------------------------------------------------------
# Repeated-measures rank test: blocks = users, treatments = event types,
# response = the user's total milli-quantized value in that type. Only
# COMPLETE blocks (users observed in every type) enter, per the test's
# definition. Exactness: doubled within-block ranks d = 2*rank + c - 1
# keep tie-averaged ranks integral, so every moment (A4 = sum d^2, the
# per-treatment doubled rank sums D_j) is exact int64 and the
# tie-corrected statistic (k-1) * sum_j (D_j - n(k+1))^2 / (A4 - nk(k+1)^2)
# is an exact integer ratio — NO float fold anywhere, the only double is
# the final division, floor-quantized 1e6. Plan: (user,type) hash
# aggregate (map-side combined), per-user k-row windows (blocks are
# k-row partitions — no corpus-sized window), then map-side moment
# aggregates to k+1 rows of arithmetic.
@register(
    "stats_friedman",
    oracle="""
    WITH m AS (
      SELECT user_id, event_type,
             CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS m
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, event_type
    ),
    kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM m),
    cb AS (
      SELECT user_id FROM m, kk
      GROUP BY user_id, kk.k HAVING count(*) = any_value(kk.k)
    ),
    r AS (
      SELECT m.user_id, m.event_type,
             2 * rank() OVER (PARTITION BY m.user_id ORDER BY m.m)
               + count(*) OVER (PARTITION BY m.user_id, m.m) - 1 AS d
      FROM m JOIN cb USING (user_id)
    ),
    mom AS (
      SELECT CAST(sum(d * d) AS BIGINT) AS a4,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n
      FROM r
    ),
    tj AS (
      SELECT event_type, CAST(sum(d) AS BIGINT) AS dj FROM r GROUP BY event_type
    ),
    num AS (
      SELECT CAST(sum((dj - mom.n * (kk.k + 1)) * (dj - mom.n * (kk.k + 1)))
                  AS BIGINT) AS sq
      FROM tj, mom, kk GROUP BY ALL
    )
    SELECT mom.n AS n_blocks, kk.k AS n_treatments,
           CAST(kk.k - 1 AS BIGINT) AS df,
           CASE WHEN mom.a4 - mom.n * kk.k * (kk.k + 1) * (kk.k + 1) > 0 THEN
             floor(CAST((kk.k - 1) * num.sq AS DOUBLE)
                   / (mom.a4 - mom.n * kk.k * (kk.k + 1) * (kk.k + 1))
                   * 1000000 + 0.5) / 1000000
           END AS friedman_stat
    FROM mom, kk, num
    """,
)
def stats_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Friedman test (blocks = users, treatments = event
    types, response = total milli-quantized value). Doubled-rank trick
    keeps the whole statistic integer-exact; see the block comment for
    the plan shape. Blocks are k-row windows — the rank stage never
    sees a corpus-sized partition."""
    from pyspark import StorageLevel

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    m = (
        ev.groupBy("user_id", "event_type")
        .agg(F.sum("v").cast("bigint").alias("m"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    kk = m.agg(F.countDistinct("event_type").cast("bigint").alias("k"))
    cb = (
        m.crossJoin(F.broadcast(kk))
        .groupBy("user_id", "k")
        .agg(F.count("*").alias("ct"))
        .where(F.col("ct") == F.col("k"))
        .select("user_id")
    )
    wr = Window.partitionBy("user_id").orderBy("m")
    we = Window.partitionBy("user_id", "m")
    r = (
        m.join(cb, "user_id")
        .select(
            "user_id",
            "event_type",
            (2 * F.rank().over(wr) + F.count("*").over(we) - 1)
            .cast("bigint")
            .alias("d"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    mom = r.agg(
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("a4"),
        F.countDistinct("user_id").cast("bigint").alias("n"),
    )
    tj = r.groupBy("event_type").agg(F.sum("d").cast("bigint").alias("dj"))
    # global aggregate (same empty-row reasoning as the KW fold): the
    # moment columns re-join from their 1-row aggregates afterwards.
    num = (
        tj.crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(kk))
        .agg(
            F.sum(
                (F.col("dj") - F.col("n") * (F.col("k") + 1))
                * (F.col("dj") - F.col("n") * (F.col("k") + 1))
            )
            .cast("bigint")
            .alias("sq")
        )
        .crossJoin(F.broadcast(mom))
        .crossJoin(F.broadcast(kk))
    )
    den = F.col("a4") - F.col("n") * F.col("k") * (F.col("k") + 1) * (F.col("k") + 1)
    return num.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        (F.col("k") - 1).cast("bigint").alias("df"),
        F.when(
            den > 0,
            F.floor(
                ((F.col("k") - 1) * F.col("sq")).cast("double")
                / den
                * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("friedman_stat"),
    )


# --- sample-ratio-mismatch check ---------------------------------------------
# The A/B-experiment guardrail every event pipeline needs: users bucket
# into two arms by the overflow-safe multiplicative hash (the ml_eval
# SPLIT_HASH convention), and the chi-square against the designed 50/50
# split reduces, for two arms, to the exact integer form (n0-n1)^2 / N.
# Per-arm event volume and mean value ride along as the first guardrail
# metrics. One user-level aggregate + one event-level aggregate, both
# map-side combined; output is a single row.
@register(
    "stats_srm_check",
    oracle="""
    WITH u AS (
      SELECT user_id,
             ((user_id + 1) * 2654435761) % 1000000007 % 2 AS arm
      FROM events GROUP BY user_id
    ),
    ua AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM u
    ),
    ea AS (
      SELECT CAST(sum(CASE WHEN ((e.user_id + 1) * 2654435761) % 1000000007 % 2 = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS e0,
             CAST(sum(CASE WHEN ((e.user_id + 1) * 2654435761) % 1000000007 % 2 = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS e1,
             CAST(sum(CASE WHEN ((e.user_id + 1) * 2654435761) % 1000000007 % 2 = 0
                           THEN CAST(floor(value * 1000 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS s0,
             CAST(sum(CASE WHEN ((e.user_id + 1) * 2654435761) % 1000000007 % 2 = 1
                           THEN CAST(floor(value * 1000 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS s1
      FROM events e WHERE value IS NOT NULL
    )
    SELECT ua.n0 AS users_arm0, ua.n1 AS users_arm1,
           ea.e0 AS events_arm0, ea.e1 AS events_arm1,
           CASE WHEN ua.n0 + ua.n1 > 0 THEN
             floor(CAST((ua.n0 - ua.n1) * (ua.n0 - ua.n1) AS DOUBLE)
                   / (ua.n0 + ua.n1) * 1000000 + 0.5) / 1000000
           END AS srm_chi2,
           CASE WHEN ua.n0 + ua.n1 > 0 THEN
             CAST((ua.n0 - ua.n1) * (ua.n0 - ua.n1) AS DOUBLE)
               / (ua.n0 + ua.n1) > 3.841459 END AS srm_detected,
           CASE WHEN ea.e0 > 0 THEN
             floor(CAST(ea.s0 AS DOUBLE) / 1000 / ea.e0 * 1000000 + 0.5)
               / 1000000 END AS mean_value_arm0,
           CASE WHEN ea.e1 > 0 THEN
             floor(CAST(ea.s1 AS DOUBLE) / 1000 / ea.e1 * 1000000 + 0.5)
               / 1000000 END AS mean_value_arm1
    FROM ua, ea
    """,
)
def stats_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for hash-bucketed experiments:
    users split 50/50 by the overflow-safe multiplicative hash, exact
    integer chi-square (n0-n1)^2/N against the design, alpha = 0.05
    flag, plus per-arm event volume and milli-lattice mean value. Two
    map-side-combined aggregates (one over distinct users, one over
    events) fold into a single row."""
    e = load_table(spark, sf_dir, "events")
    arm = ((F.col("user_id") + 1) * 2654435761) % 1000000007 % 2
    ua = (
        e.groupBy("user_id")
        .agg(F.first(F.lit(1)))
        .select(arm.alias("arm"))
        .agg(
            F.sum((F.col("arm") == 0).cast("int")).cast("bigint").alias("n0"),
            F.sum((F.col("arm") == 1).cast("int")).cast("bigint").alias("n1"),
        )
    )
    v = F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")
    ea = e.where(F.col("value").isNotNull()).agg(
        F.sum((arm == 0).cast("int")).cast("bigint").alias("e0"),
        F.sum((arm == 1).cast("int")).cast("bigint").alias("e1"),
        F.sum(F.when(arm == 0, v).otherwise(0)).cast("bigint").alias("s0"),
        F.sum(F.when(arm == 1, v).otherwise(0)).cast("bigint").alias("s1"),
    )
    j = ua.crossJoin(F.broadcast(ea))
    nn = F.col("n0") + F.col("n1")
    chi = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    ) / nn
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return j.select(
        F.col("n0").alias("users_arm0"),
        F.col("n1").alias("users_arm1"),
        F.col("e0").alias("events_arm0"),
        F.col("e1").alias("events_arm1"),
        F.when(nn > 0, q6(chi)).alias("srm_chi2"),
        F.when(nn > 0, chi > 3.841459).alias("srm_detected"),
        F.when(
            F.col("e0") > 0, q6(F.col("s0").cast("double") / 1000 / F.col("e0"))
        ).alias("mean_value_arm0"),
        F.when(
            F.col("e1") > 0, q6(F.col("s1").cast("double") / 1000 / F.col("e1"))
        ).alias("mean_value_arm1"),
    )


# --- Cramér–von Mises two-sample test ---------------------------------------
# The integral companion of stats_ks_test on the same click-vs-view
# contrast: where KS reads only the single worst CDF gap, CvM sums the
# squared gap over the whole support, so it sees broad mild drift KS
# misses. Rank form (Anderson 1962): with pooled ranks r_i of sample A
# (own positions i) and s_j of sample B (positions j),
#   U = n * sum_i (r_i - i)^2 + m * sum_j (s_j - j)^2
#   T = U / (n m (n+m)) - (4 m n - 1) / (6 (m+n)).
# Tie handling: within a tied value group every member shares the
# pooled average rank while own positions run lessOwn+1..lessOwn+c, so
# the group's contribution has the closed form (doubled ranks keep it
# integral): sum_{i=P+1}^{P+c} (dr - 2i)^2 with dr = 2L + ct + 1 —
# expanded via the square-pyramidal formula, per-group exact int64,
# accumulated in DECIMAL(38,0) (U grows ~n N^2, past int64 at corpus
# scale but nowhere near 38 digits; identical exact decimal on both
# engines -> identical final double). The group relation is the
# VALUE-DOMAIN histogram with a domain-bounded CDF window — the
# stats_ks_test machinery, never a corpus-sized partition.
@register(
    "stats_cvm_two_sample",
    oracle="""
    WITH counts AS (
      SELECT value,
             CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS a,
             CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS b
      FROM events WHERE event_type IN ('click', 'view') AND value IS NOT NULL
      GROUP BY value
    ),
    cum AS (
      SELECT value, a, b,
             sum(a + b) OVER w - (a + b) AS lp,
             sum(a) OVER w - a AS la,
             sum(b) OVER w - b AS lb
      FROM counts
      WINDOW w AS (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    terms AS (
      SELECT
        CAST(a AS DECIMAL(38, 0))
          * CAST(2 * lp + a + b - 1 - 2 * la AS DECIMAL(38, 0))
          * CAST(2 * lp + a + b - 1 - 2 * la AS DECIMAL(38, 0))
        - CAST(2 * a * (a - 1) AS DECIMAL(38, 0))
          * CAST(2 * lp + a + b - 1 - 2 * la AS DECIMAL(38, 0))
        + CAST(2 * (a * (a - 1) * (2 * a - 1) // 3) AS DECIMAL(38, 0)) AS ta,
        CAST(b AS DECIMAL(38, 0))
          * CAST(2 * lp + a + b - 1 - 2 * lb AS DECIMAL(38, 0))
          * CAST(2 * lp + a + b - 1 - 2 * lb AS DECIMAL(38, 0))
        - CAST(2 * b * (b - 1) AS DECIMAL(38, 0))
          * CAST(2 * lp + a + b - 1 - 2 * lb AS DECIMAL(38, 0))
        + CAST(2 * (b * (b - 1) * (2 * b - 1) // 3) AS DECIMAL(38, 0)) AS tb
      FROM cum
    ),
    tot AS (
      SELECT (SELECT CAST(sum(a) AS BIGINT) FROM counts) AS n,
             (SELECT CAST(sum(b) AS BIGINT) FROM counts) AS m,
             CAST(sum(ta) AS DECIMAL(38, 0)) AS sa,
             CAST(sum(tb) AS DECIMAL(38, 0)) AS sb
      FROM terms
    )
    SELECT n AS n_a, m AS n_b,
           CASE WHEN n > 0 AND m > 0 THEN
             floor(((CAST(n AS DOUBLE) * CAST(sa AS DOUBLE) / 4
                     + CAST(m AS DOUBLE) * CAST(sb AS DOUBLE) / 4)
                    / (CAST(n AS DOUBLE) * m * (n + m))
                    - (4.0 * n * m - 1) / (6.0 * (n + m)))
                   * 1000000 + 0.5) / 1000000
           END AS cvm_t
    FROM tot
    """,
)
def stats_cvm_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-aware two-sample Cramér–von Mises T between the click and
    view value distributions — see the block comment for the rank
    closed form, the DECIMAL(38,0) accumulation, and the value-domain
    window shape shared with stats_ks_test."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view") & F.col("value").isNotNull()
    )
    counts = (
        ev.groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1))
            .cast("bigint")
            .alias("a"),
            F.count(F.when(F.col("event_type") == "view", 1))
            .cast("bigint")
            .alias("b"),
        )
        .transform(pin_cache)
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "a",
        "b",
        (F.sum(F.col("a") + F.col("b")).over(w) - (F.col("a") + F.col("b"))).alias(
            "lp"
        ),
        (F.sum("a").over(w) - F.col("a")).alias("la"),
        (F.sum("b").over(w) - F.col("b")).alias("lb"),
    )

    def _term(cn, lon):
        # x0 = first doubled-rank gap dr - 2(lo+1); the c-term arithmetic
        # sequence sums to c*x0^2 - 2c(c-1)*x0 + 2*(c(c-1)(2c-1) div 3).
        # Small factors (c is a tie-group size) stay int64; x0 can be
        # corpus-sized so its square runs in DECIMAL(38,0).
        c, lo = F.col(cn), F.col(lon)
        x0 = (2 * F.col("lp") + F.col("a") + F.col("b") - 1 - 2 * lo).cast(
            "decimal(38,0)"
        )
        cd = c.cast("decimal(38,0)")
        l1 = (2 * c * (c - 1)).cast("decimal(38,0)")
        l2 = (
            2 * F.expr(f"({cn} * ({cn} - 1) * (2 * {cn} - 1)) div 3")
        ).cast("decimal(38,0)")
        return cd * x0 * x0 - l1 * x0 + l2

    terms = cum.select(
        _term("a", "la").alias("ta"),
        _term("b", "lb").alias("tb"),
    )
    nm = counts.agg(
        F.sum("a").cast("bigint").alias("n"), F.sum("b").cast("bigint").alias("m")
    )
    tot = terms.agg(
        F.sum("ta").cast("decimal(38,0)").alias("sa"),
        F.sum("tb").cast("decimal(38,0)").alias("sb"),
    ).crossJoin(F.broadcast(nm))
    nd, md = F.col("n").cast("double"), F.col("m").cast("double")
    u = nd * F.col("sa").cast("double") / 4 + md * F.col("sb").cast("double") / 4
    t = u / (nd * md * (nd + md)) - (4.0 * nd * md - 1) / (6.0 * (nd + md))
    return tot.select(
        F.col("n").alias("n_a"),
        F.col("m").alias("n_b"),
        F.when(
            (F.col("n") > 0) & (F.col("m") > 0),
            F.floor(t * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("cvm_t"),
    )


# --- Gwet's AC1 --------------------------------------------------------------
# The paradox-resistant twin of stats_fleiss_kappa on the SAME rater
# matrix (units = complete-panel users, raters = the FLEISS_M event
# types, categories = the 4 KRIPP_BAND value bands): Fleiss' kappa
# collapses toward 0 when category prevalence is skewed even at high
# raw agreement (the kappa paradox); Gwet's chance model
# p_e = sum_q pi_q (1 - pi_q) / (Q - 1) stays calibrated. Same exact
# int64 moments (sum of squared per-unit category counts; per-category
# totals), one extra constant Q = 4 (the band DOMAIN, fixed by the
# quantization design, not data-dependent). Everything after the
# (user, category) aggregate is a handful of rows.
GWET_Q = 4  # category domain size: the KRIPP_BAND quantization's 4 bands


@register(
    "stats_gwet_ac1",
    oracle=f"""
    WITH r AS (
      SELECT user_id,
             least(3, CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))
                           // ({KRIPP_BAND} * count(*)) AS BIGINT)) AS c
      FROM events
      GROUP BY user_id, event_type
    ),
    u AS (
      SELECT user_id, c, CAST(count(*) AS BIGINT) AS n_uc,
             CAST(sum(count(*)) OVER (PARTITION BY user_id) AS BIGINT) AS m_u
      FROM r GROUP BY user_id, c
    ),
    k AS (SELECT * FROM u WHERE m_u = {FLEISS_M}),
    mom AS (
      SELECT CAST(sum(n_uc * n_uc) AS BIGINT) AS sum_sq,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_units
      FROM k
    ),
    pe AS (
      SELECT CAST(sum(CAST(floor(
               (CAST(s AS DOUBLE) / (mom.n_units * {FLEISS_M}))
               * (1.0 - CAST(s AS DOUBLE) / (mom.n_units * {FLEISS_M}))
               * 1000000000000 + 0.5) AS BIGINT)) AS BIGINT) AS peq
      FROM (SELECT c, CAST(sum(n_uc) AS BIGINT) AS s FROM k GROUP BY c), mom
      GROUP BY ALL
    )
    SELECT mom.n_units, mom.sum_sq,
           CASE WHEN mom.n_units > 0 THEN
             floor((CAST(mom.sum_sq - mom.n_units * {FLEISS_M} AS DOUBLE)
                    / CAST(mom.n_units * {FLEISS_M} * ({FLEISS_M} - 1) AS DOUBLE))
                   * 1000000 + 0.5) / 1000000
           END AS p_a,
           CASE WHEN mom.n_units > 0 THEN
             floor(CAST(pe.peq AS DOUBLE) / 1000000000000 / ({GWET_Q} - 1)
                   * 1000000 + 0.5) / 1000000
           END AS p_e_gamma,
           CASE WHEN mom.n_units > 0
                 AND CAST(pe.peq AS DOUBLE) / 1000000000000 / ({GWET_Q} - 1)
                     < 1.0 THEN
             floor(((CAST(mom.sum_sq - mom.n_units * {FLEISS_M} AS DOUBLE)
                     / CAST(mom.n_units * {FLEISS_M} * ({FLEISS_M} - 1) AS DOUBLE))
                    - CAST(pe.peq AS DOUBLE) / 1000000000000 / ({GWET_Q} - 1))
                   / (1.0 - CAST(pe.peq AS DOUBLE) / 1000000000000
                            / ({GWET_Q} - 1))
                   * 1000000 + 0.5) / 1000000
           END AS ac1
    FROM mom, pe
    """,
)
def stats_gwet_ac1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gwet's AC1 chance-corrected agreement over the Fleiss rater
    matrix — the prevalence-robust alternative reported alongside
    kappa in every serious annotation-quality audit. Same plan shape
    as stats_fleiss_kappa (one (user, band) aggregate, then
    constant-size arithmetic); the chance terms pi_q(1-pi_q) quantize
    to the 1e12 lattice per category before the 4-term sum."""
    ev = load_table(spark, sf_dir, "events")
    r = ev.groupBy("user_id", "event_type").agg(
        F.least(
            F.lit(3),
            F.expr(
                f"sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))"
                f" div ({KRIPP_BAND} * count(*))"
            ),
        )
        .cast("bigint")
        .alias("c")
    )
    u = (
        r.groupBy("user_id", "c")
        .agg(F.count("*").cast("bigint").alias("n_uc"))
        .withColumn(
            "m_u",
            F.sum("n_uc").over(Window.partitionBy("user_id")).cast("bigint"),
        )
        .where(F.col("m_u") == FLEISS_M)
        .transform(pin_cache)
    )
    mom = u.agg(
        F.sum(F.col("n_uc") * F.col("n_uc")).cast("bigint").alias("sum_sq"),
        F.countDistinct("user_id").cast("bigint").alias("n_units"),
    )
    sq = u.groupBy("c").agg(F.sum("n_uc").cast("bigint").alias("s"))
    pi = F.col("s").cast("double") / (F.col("n_units") * FLEISS_M)
    pe = (
        sq.crossJoin(F.broadcast(mom))
        .select(
            F.floor(pi * (1.0 - pi) * 1000000000000 + F.lit(0.5))
            .cast("bigint")
            .alias("q")
        )
        .agg(F.sum("q").cast("bigint").alias("peq"))
    )
    j = mom.crossJoin(F.broadcast(pe))
    p_a = (F.col("sum_sq") - F.col("n_units") * FLEISS_M).cast("double") / (
        F.col("n_units") * FLEISS_M * (FLEISS_M - 1)
    ).cast("double")
    p_e = F.col("peq").cast("double") / 1000000000000 / (GWET_Q - 1)
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    ok = F.col("n_units") > 0
    return j.select(
        "n_units",
        "sum_sq",
        F.when(ok, q6(p_a)).alias("p_a"),
        F.when(ok, q6(p_e)).alias("p_e_gamma"),
        F.when(ok & (p_e < 1.0), q6((p_a - p_e) / (F.lit(1.0) - p_e))).alias("ac1"),
    )


# --- Dunn's post-hoc test ----------------------------------------------------
# The pairwise follow-up stats_kruskal_wallis needs: KW says "SOME
# group differs", Dunn says WHICH pairs, via rank-mean z-statistics
# with the tie-corrected pooled variance
#   z_ij = (Rbar_i - Rbar_j)
#          / sqrt((N(N+1)/12 - T/(12(N-1))) (1/n_i + 1/n_j)).
# Rides the identical pooled-histogram machinery (doubled rank sums s2
# and tie moment T are exact int64 — kruskal's plan, one extra k x k
# self-join over the k-row group relation). Released unadjusted; pair
# count m = k(k-1)/2 rides along so any caller can Bonferroni at
# alpha/m (the normal quantile is the caller's constant, not data).
@register(
    "stats_dunn_posthoc",
    oracle="""
    WITH ev AS (
      SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    hg AS (
      SELECT event_type, v, CAST(count(*) AS BIGINT) AS cg
      FROM ev GROUP BY event_type, v
    ),
    hp AS (SELECT v, CAST(sum(cg) AS BIGINT) AS c FROM hg GROUP BY v),
    rk AS (
      SELECT v, c,
             CAST(sum(c) OVER (ORDER BY v) - c AS BIGINT) AS less
      FROM hp
    ),
    g AS (
      SELECT hg.event_type,
             CAST(sum(hg.cg) AS BIGINT) AS nj,
             CAST(sum(hg.cg * (2 * rk.less + rk.c + 1)) AS BIGINT) AS s2
      FROM hg JOIN rk ON rk.v = hg.v GROUP BY hg.event_type
    ),
    tt AS (
      SELECT CAST(sum(c * c * c - c) AS BIGINT) AS t,
             CAST(sum(c) AS BIGINT) AS n
      FROM hp
    ),
    kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM g)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.nj AS n_a, b.nj AS n_b,
           CAST(kk.k * (kk.k - 1) // 2 AS BIGINT) AS n_comparisons,
           CASE WHEN tt.n > 1
                 AND (CAST(tt.n AS DOUBLE) * (tt.n + 1) / 12.0
                      - CAST(tt.t AS DOUBLE) / (12.0 * (tt.n - 1))) > 0 THEN
             floor((CAST(a.s2 AS DOUBLE) / (2.0 * a.nj)
                    - CAST(b.s2 AS DOUBLE) / (2.0 * b.nj))
                   / sqrt((CAST(tt.n AS DOUBLE) * (tt.n + 1) / 12.0
                           - CAST(tt.t AS DOUBLE) / (12.0 * (tt.n - 1)))
                          * (1.0 / a.nj + 1.0 / b.nj))
                   * 1000000 + 0.5) / 1000000
           END AS z_stat
    FROM g a JOIN g b ON a.event_type < b.event_type, tt, kk
    """,
)
def stats_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's pairwise rank-mean z for every event-type pair — the
    post-hoc companion of stats_kruskal_wallis on the same exact
    integer rank machinery; see the block comment. Plan: the KW
    histogram prefix plan plus a k x k broadcast self-join of the
    k-row group relation."""
    from kinesis2sse_spark.queries.ml_eval import _with_prefix_counts

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    hg = ev.groupBy("event_type", "v").agg(
        F.count("*").cast("bigint").alias("cg")
    )
    hp = (
        hg.groupBy("v")
        .agg(F.sum("cg").cast("bigint").alias("c"))
        .select(F.col("v").alias("s"), "c", F.lit(0).cast("bigint").alias("cp"))
        .transform(pin_cache)
    )
    rk = _with_prefix_counts(hp, keys=(), keep_value=True).select(
        F.col("s").alias("v"), "c", "less"
    )
    g = (
        hg.join(rk, "v")
        .groupBy("event_type")
        .agg(
            F.sum("cg").cast("bigint").alias("nj"),
            F.sum(F.col("cg") * (2 * F.col("less") + F.col("c") + 1))
            .cast("bigint")
            .alias("s2"),
        )
        .transform(pin_cache)
    )
    tt = hp.agg(
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("bigint")
        .alias("t"),
        F.sum("c").cast("bigint").alias("n"),
    )
    kk = g.agg(F.count("*").cast("bigint").alias("k"))
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("nj").alias("n_a"),
        F.col("s2").alias("s2_a"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("nj").alias("n_b"),
        F.col("s2").alias("s2_b"),
    )
    j = (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(kk))
    )
    nd = F.col("n").cast("double")
    varp = nd * (F.col("n") + 1) / 12.0 - F.col("t").cast("double") / (
        12.0 * (F.col("n") - 1)
    )
    z = (
        F.col("s2_a").cast("double") / (2.0 * F.col("n_a"))
        - F.col("s2_b").cast("double") / (2.0 * F.col("n_b"))
    ) / F.sqrt(varp * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return j.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        F.expr("k * (k - 1) div 2").cast("bigint").alias("n_comparisons"),
        F.when(
            (F.col("n") > 1) & (varp > 0),
            F.floor(z * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("z_stat"),
    )


# --- Cochran's Q -------------------------------------------------------------
# The binary repeated-measures test completing the block-design ladder
# (Friedman = ordinal response, Cochran = binary): blocks = complete-
# panel users, treatments = event types, response = "did the user's
# total milli-value in that type clear COCHRAN_T". ENTIRELY integer:
#   Q = (k-1) (k * sum_j C_j^2 - S^2) / (k * S - sum_u R_u^2)
# with column totals C_j, row totals R_u, grand total S — one exact
# rational, df = k-1. Rows-constant blocks (R_u in 0..k) keep every
# moment int64 at any corpus size. Plan: (user, type) aggregate,
# complete-block filter, two map-side moment aggregates, 1-row fold.
COCHRAN_T = 1500000  # milli-lattice threshold: ~1.5k total value per type


@register(
    "stats_cochran_q",
    oracle=f"""
    WITH m AS (
      SELECT user_id, event_type,
             CASE WHEN sum(CAST(floor(value * 1000 + 0.5) AS BIGINT))
                  > {COCHRAN_T} THEN 1 ELSE 0 END AS x
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id, event_type
    ),
    kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM m),
    cb AS (
      SELECT user_id FROM m, kk
      GROUP BY user_id, kk.k HAVING count(*) = any_value(kk.k)
    ),
    f AS (SELECT m.* FROM m JOIN cb USING (user_id)),
    cj AS (
      SELECT event_type, CAST(sum(x) AS BIGINT) AS c FROM f GROUP BY event_type
    ),
    ru AS (
      SELECT user_id, CAST(sum(x) AS BIGINT) AS r FROM f GROUP BY user_id
    ),
    mom AS (
      SELECT (SELECT CAST(sum(c * c) AS BIGINT) FROM cj) AS sc2,
             (SELECT CAST(sum(c) AS BIGINT) FROM cj) AS s,
             (SELECT CAST(sum(r * r) AS BIGINT) FROM ru) AS sr2,
             (SELECT CAST(count(*) AS BIGINT) FROM ru) AS n,
             (SELECT k FROM kk) AS k
    )
    SELECT n AS n_blocks, k AS n_treatments,
           CAST(k - 1 AS BIGINT) AS df,
           CASE WHEN k * s - sr2 > 0 THEN
             floor(CAST((k - 1) * (k * sc2 - s * s) AS DOUBLE)
                   / (k * s - sr2) * 1000000 + 0.5) / 1000000
           END AS cochran_q
    FROM mom
    """,
)
def stats_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q across event types on the binary cleared-threshold
    response over complete user blocks — exact integer statistic; see
    the block comment for formula and plan shape."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    m = (
        ev.groupBy("user_id", "event_type")
        .agg((F.sum("v") > COCHRAN_T).cast("int").alias("x"))
        .transform(pin_cache)
    )
    kk = m.agg(F.countDistinct("event_type").cast("bigint").alias("k"))
    cb = (
        m.crossJoin(F.broadcast(kk))
        .groupBy("user_id", "k")
        .agg(F.count("*").alias("ct"))
        .where(F.col("ct") == F.col("k"))
        .select("user_id")
    )
    f = m.join(cb, "user_id").transform(pin_cache)
    cj = f.groupBy("event_type").agg(F.sum("x").cast("bigint").alias("c"))
    ru = f.groupBy("user_id").agg(F.sum("x").cast("bigint").alias("r"))
    mom = (
        cj.agg(
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sc2"),
            F.sum("c").cast("bigint").alias("s"),
        )
        .crossJoin(
            F.broadcast(
                ru.agg(
                    F.sum(F.col("r") * F.col("r")).cast("bigint").alias("sr2"),
                    F.count("*").cast("bigint").alias("n"),
                )
            )
        )
        .crossJoin(F.broadcast(kk))
    )
    den = F.col("k") * F.col("s") - F.col("sr2")
    return mom.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("n_treatments"),
        (F.col("k") - 1).cast("bigint").alias("df"),
        F.when(
            den > 0,
            F.floor(
                (
                    (F.col("k") - 1)
                    * (F.col("k") * F.col("sc2") - F.col("s") * F.col("s"))
                ).cast("double")
                / den
                * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("cochran_q"),
    )


# --- mode --------------------------------------------------------------------
# Deterministic per-group mode (most frequent milli-quantized value,
# smallest value on ties) with its support count and share — the one
# descriptive statistic the agg_stats battery lacked; mode-vs-median
# divergence is the quick skew probe on operational metrics. Exact:
# histogram counts are int64 and the argmax rides a histogram-sized
# (value-domain-bounded) window per group, never a corpus partition.
@register(
    "agg_mode",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, v
    ),
    t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY event_type),
    r AS (
      SELECT event_type, v, c,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY c DESC, v) AS rn
      FROM h
    )
    SELECT r.event_type,
           floor(CAST(r.v AS DOUBLE) / 1000 * 1000000 + 0.5) / 1000000
             AS mode_value,
           r.c AS mode_count,
           floor(CAST(r.c AS DOUBLE) / t.n * 1000000 + 0.5) / 1000000
             AS mode_share
    FROM r JOIN t USING (event_type) WHERE r.rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type deterministic mode of the milli-quantized value with
    support count and share; see the block comment."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        )
    )
    h = (
        ev.groupBy("event_type", "v")
        .agg(F.count("*").cast("bigint").alias("c"))
        .transform(pin_cache)
    )
    t = h.groupBy("event_type").agg(F.sum("c").cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.col("c").desc(), "v")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            (
                F.floor(F.col("v").cast("double") / 1000 * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("mode_value"),
            F.col("c").alias("mode_count"),
            (
                F.floor(F.col("c").cast("double") / F.col("n") * 1000000 + F.lit(0.5))
                / 1000000
            ).alias("mode_share"),
        )
    )


# --- two-proportion z-test ---------------------------------------------------
# The conversion-rate A/B significance test completing the experiment
# trio (stats_srm_check guards enrollment, streaming_srm_monitor
# guards it live, this tests the outcome): users hash into the same
# two arms, "converted" = has at least one HIGH-VALUE purchase
# (value > TWO_PROP_VALUE_T — bare "any purchase" saturates to a 100%
# conversion rate at realistic activity levels, the degenerate-
# predicate trap), and the pooled two-proportion z
#   z = (p0 - p1) / sqrt(p_pool (1 - p_pool) (1/n0 + 1/n1))
# is a fixed-shape double expression over four exact int64 counts.
# ONE user-level aggregate (map-side combined), 1-row arithmetic.
TWO_PROP_VALUE_T = 150.0  # conversion = purchase with value above this


@register(
    "stats_two_proportion_z",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             ((user_id + 1) * 2654435761) % 1000000007 % 2 AS arm,
             CAST(max(CASE WHEN event_type = 'purchase'
                            AND value > {TWO_PROP_VALUE_T}
                           THEN 1 ELSE 0 END) AS BIGINT) AS conv
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
             CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
      FROM u
    )
    SELECT n0 AS users_arm0, n1 AS users_arm1,
           c0 AS conv_arm0, c1 AS conv_arm1,
           CASE WHEN n0 > 0 THEN
             floor(CAST(c0 AS DOUBLE) / n0 * 1000000 + 0.5) / 1000000
           END AS rate_arm0,
           CASE WHEN n1 > 0 THEN
             floor(CAST(c1 AS DOUBLE) / n1 * 1000000 + 0.5) / 1000000
           END AS rate_arm1,
           CASE WHEN n0 > 0 AND n1 > 0 AND c0 + c1 > 0
                 AND c0 + c1 < n0 + n1 THEN
             floor((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                   / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                          * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                          * (1.0 / n0 + 1.0 / n1))
                   * 1000000 + 0.5) / 1000000
           END AS z_stat
    FROM c
    """,
)
def stats_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled two-proportion z on purchase conversion between the hash
    arms — the outcome test of the experiment trio; exact integer
    counts, one user-level aggregate. See the block comment."""
    e = load_table(spark, sf_dir, "events")
    arm = ((F.col("user_id") + 1) * 2654435761) % 1000000007 % 2
    u = e.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase")
                & (F.col("value") > TWO_PROP_VALUE_T)
            ).cast("int")
        )
        .cast("bigint")
        .alias("conv")
    ).select(arm.alias("arm"), "conv")
    c = u.agg(
        F.sum((F.col("arm") == 0).cast("int")).cast("bigint").alias("n0"),
        F.sum((F.col("arm") == 1).cast("int")).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("c0"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("c1"),
    )
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (F.col("c0").cast("double") / n0d - F.col("c1").cast("double") / n1d) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / n0d + 1.0 / n1d)
    )
    q6 = lambda c_: F.floor(c_ * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    ok = (
        (F.col("n0") > 0)
        & (F.col("n1") > 0)
        & (F.col("c0") + F.col("c1") > 0)
        & (F.col("c0") + F.col("c1") < F.col("n0") + F.col("n1"))
    )
    return c.select(
        F.col("n0").alias("users_arm0"),
        F.col("n1").alias("users_arm1"),
        F.col("c0").alias("conv_arm0"),
        F.col("c1").alias("conv_arm1"),
        F.when(F.col("n0") > 0, q6(F.col("c0").cast("double") / n0d)).alias(
            "rate_arm0"
        ),
        F.when(F.col("n1") > 0, q6(F.col("c1").cast("double") / n1d)).alias(
            "rate_arm1"
        ),
        F.when(ok, q6(z)).alias("z_stat"),
    )
