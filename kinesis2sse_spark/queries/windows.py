"""Window-function operators — row_number/rank/dense_rank/ntile, lag/lead,
first/last, running aggregates with ROWS and RANGE frames, per-group top-k.

Determinism convention: every ORDER BY inside a window carries a unique
tiebreaker (event_id / orderkey) so Spark and the oracle agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table
from kinesis2sse_spark.registry import register


@register(
    "window_ranks",
    oracle="""
    SELECT event_id, event_type, value,
           row_number() OVER w AS rn,
           rank()       OVER w AS rk,
           dense_rank() OVER w AS drk,
           ntile(4)     OVER w AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
    """,
)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rk"),
        F.dense_rank().over(w).cast("bigint").alias("drk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "window_lag_lead",
    bench=True,
    oracle="""
    SELECT event_id, user_id, ts,
           lag(event_id)  OVER w AS prev_event_id,
           lead(event_id) OVER w AS next_event_id,
           round(epoch(ts - lag(ts) OVER w), 6) AS gap_sec
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization primitive: previous/next event and the
    inter-event gap. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.round(gap, 6).alias("gap_sec"),
    )


@register(
    "window_running_agg",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_n
    FROM events
    """,
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
        F.count("*").over(w).alias("running_n"),
    )


@register(
    "window_sliding_rows",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
             AS moving_avg3
    FROM events
    """,
)
def window_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("moving_avg3")
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5
    FROM lineitem
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on a value, not row position — frame membership
    depends only on l_quantity, so tie order can't change the result."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity").rangeBetween(-5, 0)
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", F.count("*").over(w).alias("n_within_5")
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_id) OVER w AS first_event_id,
           last_value(event_id)  OVER w AS last_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_id").over(w).alias("first_event_id"),
        F.last("event_id").over(w).alias("last_event_id"),
    ).distinct()


@register(
    "window_time_range",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           round(sum(value) OVER w, 2) AS value_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour window per user — a RANGE frame over event time.
    Spark's rangeBetween is numeric-only, so the frame rides epoch
    MICROseconds — unix_timestamp (seconds) would truncate and admit
    pairs whose true gap straddles the 3600s boundary; frame membership
    depends only on timestamps, so tie order cannot change results."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_last_hour"),
    )


@register(
    "window_distribution",
    oracle="""
    SELECT event_id, event_type,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist,
           nth_value(event_id, 2) OVER (PARTITION BY event_type
                                        ORDER BY value, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS second_event
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank, cume_dist, nth_value."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.nth_value("event_id", 2).over(wf).alias("second_event"),
    )


@register(
    "topk_per_group",
    bench=True,
    oracle="""
    SELECT event_type, event_id, value
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: rank-and-filter. Spark pushes a per-partition
    top-k (WindowGroupLimit) below the shuffle, so only k rows per group
    per mapper move — the pattern that matters at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.select("event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "window_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           floor(median(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                 * 1000000 + 0.5) / 1000000 AS med5
    FROM events
    """,
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over the last 5 observations per user — the
    robust-smoothing counterpart of window_running_agg's mean family
    (a median shrugs off the spikes timeseries_anomaly_zscore flags).
    An exact percentile as a FRAMED window aggregate: each frame holds
    at most 5 values, so the per-row sort inside the frame is O(1) and
    the whole operator costs one user_id exchange + one per-key sort,
    identical to any other framed window. Both engines interpolate the
    even-count frames (the first 4 rows per key) as the mean of the two
    middle values — the same IEEE expression — and the floor ladder
    pins the rounding."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    med = F.expr("percentile(value, 0.5)").over(w)
    return ev.select(
        "event_id",
        "user_id",
        (F.floor(med * 1000000 + F.lit(0.5)) / 1000000).alias("med5"),
    )
