"""Time-series operators — hypertable-style rollups over the events
stream: dense gap-filled bucket rollups (empty buckets materialized) and
LOCF (last-observation-carried-forward) resampling.

Spark has no generate_series table function, but `sequence` + `explode`
builds the dense time spine from a one-row min/max aggregate — a
broadcast-sized driver of the fill join, never a shuffle of the facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table, pin_cache
from kinesis2sse_spark.registry import register


@register(
    "timeseries_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '6 hours', min(ts)) AS lo,
             time_bucket(INTERVAL '6 hours', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '6 hours')) AS bucket, t.event_type
      FROM bounds, (SELECT DISTINCT event_type FROM events) t
    ),
    agg AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS bucket, event_type,
             count(*) AS n, round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT s.bucket, s.event_type,
           coalesce(a.n, 0) AS n,
           coalesce(a.total, 0.0) AS total
    FROM spine s LEFT JOIN agg a
      ON s.bucket = a.bucket AND s.event_type = a.event_type
    """,
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled rollup: every (6h bucket × event_type) cell exists, empty
    cells filled with zeros. The spine (buckets × types) comes from a
    one-row bounds aggregate cross a tiny distinct list — both broadcast;
    the fact table shuffles once for the rollup."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.window("ts", "6 hours")["start"]
    agg = ev.groupBy(bucket.alias("bucket"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    def floor_to(col, seconds):
        # epoch-aligned bucket start (≡ window()/time_bucket boundaries
        # for day-divisible intervals)
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(col) / seconds).cast("long") * seconds
        )

    bounds = ev.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).select(
        floor_to(F.col("mn"), 21600).alias("lo"), floor_to(F.col("mx"), 21600).alias("hi")
    )
    spine = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 6 HOURS"))).alias("bucket")
        )
        .crossJoin(ev.select("event_type").distinct())
    )
    return (
        spine.join(agg, ["bucket", "event_type"], "left")
        .select(
            "bucket",
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


@register(
    "timeseries_locf",
    oracle="""
    WITH daily AS (
      SELECT user_id, day, value AS last_value
      FROM (
        SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day, value,
               row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '1 day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    bounds AS (
      SELECT time_bucket(INTERVAL '1 day', min(ts)) AS lo,
             time_bucket(INTERVAL '1 day', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT u.user_id, unnest(generate_series(lo, hi, INTERVAL '1 day')) AS day
      FROM bounds, (SELECT DISTINCT user_id FROM events) u
    )
    SELECT s.user_id, s.day,
           round(last_value(d.last_value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS value_locf
    FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def timeseries_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF resampling: daily grid per user; days without an observation
    carry the user's most recent value forward (null before the first
    observation). The argmax-per-day uses the same (ts, offset) tiebreak
    as the as-of operator Q2."""
    ev = load_table(spark, sf_dir, "events")
    day = F.window("ts", "1 day")["start"]
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        F.expr("max_by(value, struct(ts, event_id))").alias("last_value")
    )
    bounds = ev.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).select(
        F.date_trunc("day", "mn").alias("lo"), F.date_trunc("day", "mx").alias("hi")
    )
    spine = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
        )
        .crossJoin(ev.select("user_id").distinct())
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.round(F.last("last_value", ignorenulls=True).over(w), 2).alias("value_locf"),
        )
    )


# Shared by sessionize_batch and sessions_max_concurrency (the sweep
# consumes the session intervals the final CTE defines).
_SESSIONS_CTES = """flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS BIGINT) AS session_id
      FROM flagged
    ), sess AS (
      SELECT user_id, session_id,
             count(*) AS n_events,
             min(ts) AS session_start,
             max(ts) AS session_end
      FROM numbered
      GROUP BY user_id, session_id
    )"""


@register("sessionize_batch", oracle=f"WITH {_SESSIONS_CTES} SELECT * FROM sess")
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the gaps-and-islands rewrite of
    `session_window` (30-minute inactivity gap): flag session starts with
    lag(), number sessions with a running sum, aggregate per session.
    One shuffle on user_id serves both windows AND the final groupBy —
    the partitioning is reused across all three stages, which is what
    makes this shape viable on a 100 TB event log (contrast a
    self-join-per-gap approach). Batch counterpart of
    `streaming_session_window` (service semantics ref: SURVEY.md S1.3 —
    event-time, arrival-tolerant)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        # microsecond-precision gap — a seconds-truncated diff would
        # disagree with the oracle's INTERVAL comparison on .5s gaps
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0).alias("new_sess"),
    )
    numbered = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w).cast("bigint")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "timeseries_ewma",
    oracle="""
    WITH ordered AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n,
           floor(list_reduce(vs, (acc, x) -> 0.25 * x + 0.75 * acc) * 1000000 + 0.5)
             / 1000000 AS ewma
    FROM ordered
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key exponentially weighted moving average (alpha = 1/4 — an
    exact binary fraction, so every fold step is the same IEEE double on
    both engines; the floor ladder guards the final rounding). EWMA is
    inherently sequential per key, so it is expressed as an ordered
    fold: one groupBy shuffle gathers each key's series, sort_array
    orders it by (ts, event_id), and a JVM aggregate folds it — no
    window, no Python.

    Scale note: this materializes each key's history in one task, fine
    while per-key cardinality is bounded (50 events/user here; metrics
    series, device histories). For unbounded keys the same recurrence
    runs INCREMENTALLY as keyed streaming state — one double per key,
    see streaming_keyed_running_stats — because EWMA's fold needs only
    the previous value, never the series."""
    e = load_table(spark, sf_dir, "events")
    series = e.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias("s")
    )
    vs = F.transform("s", lambda st: st["value"])
    ewma = F.aggregate(
        vs,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(0.25 * x + 0.75 * acc),
    )
    return series.select(
        "user_id",
        F.size("s").cast("bigint").alias("n"),
        (F.floor(ewma * 1000000 + F.lit(0.5)) / 1000000).alias("ewma"),
    )


@register(
    "timeseries_interpolate",
    oracle="""
    WITH daily AS (
      SELECT user_id, day, value AS obs
      FROM (
        SELECT user_id, time_bucket(INTERVAL '1 day', ts) AS day, value,
               row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL '1 day', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    bounds AS (
      SELECT time_bucket(INTERVAL '1 day', min(ts)) AS lo,
             time_bucket(INTERVAL '1 day', max(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT u.user_id, unnest(generate_series(lo, hi, INTERVAL '1 day')) AS day
      FROM bounds, (SELECT DISTINCT user_id FROM events) u
    ),
    ctx AS (
      SELECT s.user_id, s.day, d.obs,
             last_value(d.obs IGNORE NULLS) OVER wb AS pv,
             last_value(d.day IGNORE NULLS) OVER wb AS pd,
             first_value(d.obs IGNORE NULLS) OVER wf AS nv,
             first_value(d.day IGNORE NULLS) OVER wf AS nd
      FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
      WINDOW
        wb AS (PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day,
           floor((CASE
             WHEN obs IS NOT NULL THEN obs
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
                                 / CAST(date_diff('day', pd, nd) AS DOUBLE))
             ELSE NULL END) * 1000000 + 0.5) / 1000000 AS value_interp
    FROM ctx
    """,
)
def timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation on the daily grid: days between two
    observations get the straight-line value, days outside the user's
    observed range stay null (contrast timeseries_locf, which carries
    the last value). Same spine/shuffle shape as LOCF — ONE exchange on
    user_id feeds both direction windows (backward last-non-null,
    forward first-non-null), so interpolation costs no more than carry
    -forward. Determinism: the interpolation fraction is an integer-day
    ratio and both engines evaluate the identical IEEE expression
    ``pv + (nv-pv)*(num/den)``; the floor ladder (registry step 2)
    guards the final rounding."""
    ev = load_table(spark, sf_dir, "events")
    day = F.window("ts", "1 day")["start"]
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        F.expr("max_by(value, struct(ts, event_id))").alias("obs")
    )
    bounds = ev.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).select(
        F.date_trunc("day", "mn").alias("lo"), F.date_trunc("day", "mx").alias("hi")
    )
    spine = (
        bounds.select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
        )
        .crossJoin(ev.select("user_id").distinct())
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ctx = (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            "obs",
            F.last("obs", ignorenulls=True).over(wb).alias("pv"),
            F.last(F.when(F.col("obs").isNotNull(), F.col("day")), ignorenulls=True)
            .over(wb)
            .alias("pd"),
            F.first("obs", ignorenulls=True).over(wf).alias("nv"),
            F.first(F.when(F.col("obs").isNotNull(), F.col("day")), ignorenulls=True)
            .over(wf)
            .alias("nd"),
        )
    )
    frac = F.datediff(F.col("day").cast("date"), F.col("pd").cast("date")).cast(
        "double"
    ) / F.datediff(F.col("nd").cast("date"), F.col("pd").cast("date")).cast("double")
    interp = (
        F.when(F.col("obs").isNotNull(), F.col("obs"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .otherwise(F.lit(None))
    )
    return ctx.select(
        "user_id",
        "day",
        (F.floor(interp * 1000000 + F.lit(0.5)) / 1000000).alias("value_interp"),
    )


@register(
    "timeseries_rollup_hierarchy",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS day, event_type,
           count(*) AS n_events,
           CAST(count(DISTINCT time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS n_hours,
           CAST(sum(CAST(value AS DECIMAL(27,10))) AS DOUBLE) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def timeseries_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (hypertable-style) rollup reuse: the daily rollup is
    computed FROM the hourly rollup, never from raw events — counts and
    decimal sums are decomposable, so the coarser aggregate folds the
    finer one. The oracle computes daily directly from raw events;
    equality IS the rollup-reuse identity. At 100 TB this is the
    continuous-aggregate pattern: materialize the finest rollup once
    (24x-8760x smaller than raw), derive every coarser grain from it —
    the daily pass shuffles |hours x types| rows, not the corpus.
    Per-row DECIMAL casts (registry ladder step 3) make the two-level
    sum exact, hence order- and topology-independent."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.window("ts", "1 hour")["start"]
    hourly = ev.groupBy(hour.alias("hour"), "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(27,10)")).alias("total"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "hour").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.count("*").cast("bigint").alias("n_hours"),
            F.sum("total").cast("double").alias("total"),
        )
    )


# Shared by the batch operator and streaming_anomaly_alert — the scoring
# is identical by construction (one helper, one oracle), so batch and
# streaming can never diverge.
ANOMALY_ZSCORE_ORACLE = """
    WITH stats AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(27,10))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value * value AS DECIMAL(27,10))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    scored AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - s1 / n)
               / sqrt((s2 - CAST(n AS DOUBLE) * (s1 / n) * (s1 / n))
                      / CAST(n - 1 AS DOUBLE)) AS z
      FROM events e JOIN stats s ON e.event_type = s.event_type
      WHERE n > 1 AND (s2 - CAST(n AS DOUBLE) * (s1 / n) * (s1 / n)) > 0
    )
    SELECT event_id, event_type, value,
           floor(z * 10000 + 0.5) / 10000 AS z
    FROM scored WHERE abs(z) > 2.5
"""


def zscore_anomalies(stats_source: DataFrame, scored_source: DataFrame) -> DataFrame:
    """Per-type z-score anomaly filter: fit decimal-exact stats on
    ``stats_source`` (batch), broadcast them onto ``scored_source``
    (batch or stream), keep |z| > 2.5. One helper serves both the
    batch operator and the streaming alert, so the scoring math exists
    exactly once."""
    stats = stats_source.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(27,10)")).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(27,10)"))
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("n").cast("double") * mean * mean) / (
        F.col("n") - 1
    ).cast("double")
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        scored_source.join(F.broadcast(stats), "event_type")
        .where((F.col("n") > 1) & (F.col("s2") - F.col("n").cast("double") * mean * mean > 0))
        .where(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            "value",
            (F.floor(z * 10000 + F.lit(0.5)) / 10000).alias("z"),
        )
    )


@register("timeseries_anomaly_zscore", oracle=ANOMALY_ZSCORE_ORACLE)
def timeseries_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly detection: events whose value sits more than
    2.5 sample standard deviations from their event_type's mean. The
    per-type stats aggregate map-side-combines to |types| rows and then
    BROADCASTS back onto the corpus scan — the corpus itself never
    shuffles, which is the only viable shape when the corpus is 100 TB
    and the dimension is five rows. Mean/variance derive from exact
    per-row-DECIMAL sums (registry ladder step 3), so both engines
    score the identical IEEE z and the 2.5 cut can never straddle an
    engine-rounding boundary. Scoring lives in zscore_anomalies, shared
    with streaming_anomaly_alert."""
    ev = load_table(spark, sf_dir, "events")
    return zscore_anomalies(ev, ev)


_FUNNEL_ORACLE = """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 1 DAY
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 AND e.ts <= s2.t2 + INTERVAL 1 DAY
      GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, count(*) AS n_users FROM s1
    UNION ALL SELECT 'view_24h' AS stage, count(*) AS n_users FROM s2
    UNION ALL SELECT 'purchase_24h' AS stage, count(*) AS n_users FROM s3
"""


@register("funnel_conversion", oracle=_FUNNEL_ORACLE)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with conversion windows: users who signed up, then
    viewed within 24h of signup, then purchased within 24h of that view
    — each stage anchored to the PREVIOUS stage's first qualifying
    event, the semantics product-analytics engines ship as their
    windowFunnel operator. Each stage is a filtered scan + per-user
    min-aggregate; the previous stage's relation (one row per
    converting user) BROADCASTS into the next stage's join, so the
    corpus never shuffles for the chain. Stage relations are persisted:
    the 3-way union consumes s1 three times and s2 twice, and without a
    cache Spark re-instantiates each subtree per consumer (the round-4
    repeated-subtree rule) — six filtered corpus scans where three
    suffice. Fixture shape at sf0.1: 1500 → 550 → 189."""
    from pyspark import StorageLevel

    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Eager pin (the connected_components rule): s1 feeds the s2 join
    # AND the stage union — independent branches of one action race an
    # unpopulated cache (this exact site was the first catch of the
    # sweep's automated cache-race gate).
    s1.count()
    s2 = (
        e.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 1 DAY")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Eager pin: s2 feeds the s3 join and the stage union.
    s2.count()
    s3 = (
        e.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 1 DAY")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df, name):
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(s1, "signup")
        .unionByName(stage(s2, "view_24h"))
        .unionByName(stage(s3, "purchase_24h"))
    )


_COHORT_ORACLE = """
    WITH cohort AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cw
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT CAST(cw AS DATE) AS cohort_week,
           CAST(date_diff('week', cw, date_trunc('week', e.ts)) AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS n_active
    FROM events e JOIN cohort USING (user_id)
    WHERE e.ts >= cw
    GROUP BY cw, week_offset
"""


@register("retention_cohort", oracle=_COHORT_ORACLE)
def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by signup week, activity
    counted as distinct active users per (cohort_week, weeks-since) —
    the retention triangle every growth dashboard draws. Week
    arithmetic stays on week-truncated timestamps (ISO Monday start on
    both engines), so the offset is exact integer days/7. One shuffle
    builds the cohort map, one joins it back (broadcast when cohorts
    are small relative to events — they are, it's one row per user),
    and the distinct-count aggregate is the only corpus-wide exchange."""
    e = load_table(spark, sf_dir, "events")
    cohort = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    joined = e.join(cohort, "user_id").where(F.col("ts") >= F.col("cw"))
    return (
        joined.groupBy(
            F.col("cw").cast("date").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cw").cast("date"))
                / 7
            ).cast("bigint").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


_PATHS_ORACLE = """
    WITH seqs AS (
      SELECT user_id, list(event_type ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    ), trigrams AS (
      SELECT s[i] || '>' || s[i + 1] || '>' || s[i + 2] AS path
      FROM seqs, LATERAL (SELECT unnest(range(1, len(s) - 1)) AS i) t
    ), counted AS (
      SELECT path, count(*) AS n FROM trigrams GROUP BY path
    )
    SELECT path, n, rnk FROM (
      SELECT path, n, row_number() OVER (ORDER BY n DESC, path) AS rnk
      FROM counted
    ) WHERE rnk <= 10
"""


@register("path_common_sequences", oracle=_PATHS_ORACLE)
def path_common_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-step event sequences across
    all user journeys ("what do users do around a purchase?") — the
    sequence-mining counterpart of funnel_conversion's fixed template.
    One groupBy gathers each user's ordered journey (bounded per-key
    history, like timeseries_ewma), trigram extraction is a per-row
    higher-order function, and the count is a map-side-combined shuffle
    on the path string; the top-10 rank runs over the tiny distinct-path
    relation (|event_types|^3 at most)."""
    e = load_table(spark, sf_dir, "events")
    seqs = e.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias("s")
    )
    types = F.transform("s", lambda st: st["event_type"])
    trigrams = seqs.select(
        F.explode(
            F.when(
                F.size("s") >= 3,
                F.transform(
                    F.sequence(F.lit(0), F.size("s") - 3),
                    lambda i: F.concat_ws(
                        ">",
                        F.element_at(types, i + 1),
                        F.element_at(types, i + 2),
                        F.element_at(types, i + 3),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("path")
    )
    counted = trigrams.groupBy("path").agg(F.count("*").alias("n"))
    w = Window.partitionBy().orderBy(F.col("n").desc(), "path")
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 10)
        .select("path", "n", "rnk")
    )


CONC_KEY = "day"  # prefix-sum bucket = calendar day


@register(
    "sessions_max_concurrency",
    oracle=f"""
    WITH {_SESSIONS_CTES},
    deltas AS (
      SELECT session_start AS ts, 1 AS d, user_id, session_id FROM sess
      UNION ALL
      SELECT session_end, -1, user_id, session_id FROM sess
    ),
    run AS (
      SELECT ts, d,
             sum(d) OVER (ORDER BY ts, d, user_id, session_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      FROM deltas
    )
    SELECT time_bucket(INTERVAL '1 day', ts) AS day,
           CAST(max(conc) AS BIGINT) AS max_concurrent,
           CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts
    FROM run GROUP BY 1
    """,
)
def sessions_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line (interval
    stabbing) rewrite: each session contributes +1 at its start and -1
    at its end (end exclusive: at equal ts the -1 sorts first), and
    concurrency is the GLOBAL running sum over the merged delta
    stream, sampled at delta instants. The global prefix sum uses the
    two-level pattern pipeline_sequence_packing proved out: per-day
    delta subtotals roll up in a tiny window (|days| rows), broadcast
    back as day offsets, and the within-day running sum rides a
    day-partitioned window — no single-partition pass over the deltas,
    so the sweep scales to any event volume while sessions crossing
    midnight are carried exactly by the offset chain. Max/count per
    day then reuse the same day partitioning. The sessions relation is
    persisted (read twice, once per union branch) and so is the delta
    stream (read by the day-subtotal aggregate AND the run join) — the
    sessionize pipeline's shuffle+windows execute once, not four
    times."""

    sessions = sessionize_batch(spark, sf_dir).transform(pin_cache)
    starts = sessions.select(
        F.col("session_start").alias("ts"), F.lit(1).alias("d"), "user_id", "session_id"
    )
    ends = sessions.select(
        F.col("session_end").alias("ts"), F.lit(-1).alias("d"), "user_id", "session_id"
    )
    deltas = (
        starts.unionByName(ends)
        .withColumn("k", F.date_trunc("day", "ts"))
        .transform(pin_cache)
    )
    key_sums = deltas.groupBy("k").agg(F.sum("d").alias("kd"))
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = key_sums.select(
        "k", (F.sum("kd").over(wk) - F.col("kd")).alias("offset")
    )
    ww = (
        Window.partitionBy("k")
        .orderBy("ts", "d", "user_id", "session_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = deltas.join(F.broadcast(offsets), "k").select(
        "k", "d", (F.col("offset") + F.sum("d").over(ww)).alias("conc")
    )
    return run.groupBy(F.col("k").alias("day")).agg(
        F.max("conc").cast("bigint").alias("max_concurrent"),
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).cast("bigint").alias("n_starts"),
    )


@register(
    "pipeline_winsorize",
    oracle="""
    WITH p AS (
      SELECT event_type,
             round(quantile_cont(value, 0.05), 6) AS lo,
             round(quantile_cont(value, 0.95), 6) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           least(greatest(e.value, p.lo), p.hi) AS value_winsorized
    FROM events e JOIN p USING (event_type)
    """,
)
def pipeline_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each event's value to its type's [p05, p95]
    band — the outlier-taming step that precedes any mean-based
    aggregate a spike could poison (complement of
    timeseries_anomaly_zscore, which REPORTS the outliers). The exact
    per-type percentile pair is a |types|-row aggregate broadcast back
    onto the corpus scan — the filter_quality_percentile shape — so
    the corpus never shuffles; both engines use interpolated
    percentile_cont semantics and the thresholds round to 6 dp on both
    sides (one-ULP interpolation differences cannot move a clip
    boundary). The clipped value is exact arithmetic on the rounded
    thresholds — no further ladder needed."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.05)), 6).alias("lo"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("hi"),
    )
    return (
        ev.join(F.broadcast(p), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
                "value_winsorized"
            ),
        )
    )


ACF_MAX_LAG = 7


@register(
    "stats_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    ),
    dn AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(day AS DATE)) AS BIGINT) AS d,
             n
      FROM daily
    ),
    pairs AS (
      SELECT CAST(k.k AS BIGINT) AS lag, x.n AS x, y.n AS y
      FROM dn x, LATERAL (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS k) k
      JOIN dn y ON y.d = x.d + k.k
    ),
    m AS (
      SELECT lag, count(*) AS np, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT lag,
           CAST(np AS BIGINT) AS n_pairs,
           floor((np * sxy - sx * sy)
                 / sqrt((np * sxx - sx * sx) * (np * syy - sy * sy))
                 * 1000000 + 0.5) / 1000000 AS acf
    FROM m
    WHERE (np * sxx - sx * sx) > 0 AND (np * syy - sy * sy) > 0
    """,
)
def stats_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7 —
    the seasonality probe (a weekly cycle shows as a lag-7 peak) run
    before any forecasting or anomaly model. Two-tier shape: the
    corpus reduces ONCE to the daily-count series (map-side combine to
    |days| rows), and everything after — the lag alignment (an
    integer day-number equi-join; Spark's lead() needs a foldable
    offset), the Pearson moments, the correlation — runs on
    that bounded relation, so the operator costs one corpus aggregate
    regardless of event volume. Counts are exact integers in doubles
    (< 2^53), every moment sum is over identical IEEE products in a
    |days|-bounded window partition... with the daily relation this
    small the cross-engine summation-order risk is confined to the
    floor ladder on the final coefficient."""
    from pyspark import StorageLevel

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("double").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # lag alignment as an integer day-number equi-join on the tiny
    # daily relation (Spark's lead() needs a foldable offset, so a
    # per-lag variable lead is inexpressible as a window)
    dn = daily.select(
        F.datediff(F.col("day").cast("date"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
        "n",
    )
    ks = dn.crossJoin(
        F.broadcast(
            ev.sparkSession.range(1, ACF_MAX_LAG + 1).select(
                F.col("id").cast("bigint").alias("lag")
            )
        )
    )
    y = dn.select(F.col("d").alias("d2"), F.col("n").alias("y"))
    pairs = ks.join(y, F.col("d2") == F.col("d") + F.col("lag")).select(
        "lag", F.col("n").alias("x"), "y"
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("np"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        m.where((vx > 0) & (vy > 0))
        .select(
            "lag",
            F.col("np").cast("bigint").alias("n_pairs"),
            (F.floor(num / F.sqrt(vx * vy) * 1000000 + F.lit(0.5)) / 1000000).alias(
                "acf"
            ),
        )
    )


@register(
    "timeseries_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    tot AS (SELECT sum(c) AS total, count(*) AS n FROM daily),
    pre AS (
      SELECT day, row_number() OVER (ORDER BY day) AS i,
             sum(c) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
      FROM daily
    ),
    stat AS (
      SELECT day, i, n, n * p - i * total AS s FROM pre, tot
    )
    SELECT day AS change_day, CAST(n AS BIGINT) AS n_days,
           floor(CAST(s AS DOUBLE) / n * 1000000 + 0.5) / 1000000 AS cusum
    FROM (
      SELECT day, n, s,
             row_number() OVER (ORDER BY abs(s) DESC, day) AS rn
      FROM stat WHERE i < n
    ) WHERE rn = 1
    """,
)
def timeseries_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily event-count series —
    the temporal counterpart of the KS/PSI/JSD drift family: the day
    maximizing |S_i|, where S_i is the cumulative deviation of daily
    counts from their grand mean, is the classic single-changepoint
    estimate monitoring stacks alert on (a level shift in traffic puts
    the peak exactly at the shift). Integer-exact end to end: instead
    of the FP-order-sensitive sum of (c_j - mean), the score is
    n*prefix_i - i*total — all int64 arithmetic, so argmax ordering
    can never diverge between engines; only the one reported S value
    divides (then floor-quantizes, ladder step 2). The last index is
    excluded (S_n = 0 by construction).

    Plan: one corpus aggregation into the |days|-row daily relation
    (persisted: the totals and the prefix pass both fold from it), a
    value-domain-bounded running-sum window over days, and a 1-row
    argmax — nothing corpus-sized past the first aggregate."""

    ev = load_table(spark, sf_dir, "events")
    daily = (
        # ts IS NOT NULL both sides: a NULL day would land at opposite
        # ends of the rank window (Spark NULLS FIRST vs DuckDB NULLS
        # LAST), shifting every prefix index (the stats_ks_test rule)
        ev.where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("c"))
        .transform(pin_cache)
    )
    tot = daily.agg(F.sum("c").alias("total"), F.count("*").alias("n"))
    wo = Window.orderBy("day")
    pre = daily.select(
        "day",
        F.row_number().over(wo).alias("i"),
        F.sum("c").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
    )
    stat = pre.crossJoin(F.broadcast(tot)).select(
        "day", "i", "n", (F.col("n") * F.col("p") - F.col("i") * F.col("total")).alias("s")
    )
    wr = Window.orderBy(F.abs("s").desc(), "day")
    return (
        stat.where(F.col("i") < F.col("n"))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            # DuckDB date_trunc('day') yields DATE while Spark yields
            # TIMESTAMP — cast so both stringify identically (the
            # retention_cohort convention)
            F.col("day").cast("date").alias("change_day"),
            F.col("n").cast("bigint").alias("n_days"),
            (F.floor(F.col("s").cast("double") / F.col("n") * 1000000 + F.lit(0.5)) / 1000000).alias("cusum"),
        )
    )


@register(
    "timeseries_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    keyed AS (
      SELECT day, c, (CAST(day AS DATE) - DATE '1970-01-01') % 7 AS dow
      FROM daily
    ),
    seasonal AS (
      SELECT dow, sum(c) AS s, count(*) AS k FROM keyed GROUP BY dow
    )
    SELECT keyed.day, CAST(keyed.c AS BIGINT) AS n, keyed.dow,
           floor(seasonal.s * 1.0 / seasonal.k * 1000000 + 0.5) / 1000000
             AS dow_mean,
           floor((keyed.c - seasonal.s * 1.0 / seasonal.k) * 1000000 + 0.5)
             / 1000000 AS residual
    FROM keyed JOIN seasonal USING (dow)
    """,
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal decomposition of the daily event-count series —
    the additive model monitoring dashboards draw (observed =
    day-of-week seasonal mean + residual), and the de-seasonalizing
    step that should run BEFORE timeseries_anomaly_zscore or the CUSUM
    changepoint when traffic has a weekly rhythm (otherwise every
    weekend is an 'anomaly'). Day-of-week keys off integer epoch-day
    arithmetic ((day - 1970-01-01) % 7) — both engines' dayofweek()
    functions disagree on week start, integer modulus cannot. Plan:
    ONE corpus shuffle into the |days|-row daily relation; the
    seasonal means and the join back happen on that days-sized
    relation (7-row seasonal side, broadcast). Mean and residual are
    each one FP op on exact integer pairs, floor-quantized at 1e6."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    keyed = daily.select(
        "day",
        "c",
        (
            F.datediff(F.col("day").cast("date"), F.to_date(F.lit("1970-01-01")))
            % 7
        ).alias("dow"),
    )
    seasonal = keyed.groupBy("dow").agg(
        F.sum("c").alias("s"), F.count("*").alias("k")
    )
    mean = F.col("s") * 1.0 / F.col("k")
    # cast to DATE: DuckDB date_trunc('day') returns DATE while Spark
    # returns TIMESTAMP — the canonicalized strings differ otherwise
    return keyed.join(F.broadcast(seasonal), "dow").select(
        F.col("day").cast("date").alias("day"),
        F.col("c").cast("bigint").alias("n"),
        "dow",
        (F.floor(mean * 1000000 + F.lit(0.5)) / 1000000).alias("dow_mean"),
        (F.floor((F.col("c") - mean) * 1000000 + F.lit(0.5)) / 1000000).alias(
            "residual"
        ),
    )


HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
HOLT_HORIZON = 7


@register(
    "timeseries_holt_linear",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    idx AS (
      SELECT c, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    nn AS (SELECT count(*) AS n FROM daily),
    h(i, l, b) AS (
      SELECT CAST(1 AS BIGINT), CAST(c AS DOUBLE), CAST(0.0 AS DOUBLE)
      FROM idx WHERE i = 1
      UNION ALL
      SELECT h.i + 1,
             {HOLT_ALPHA} * y.c + (1 - {HOLT_ALPHA}) * (h.l + h.b),
             {HOLT_BETA} * (({HOLT_ALPHA} * y.c
                             + (1 - {HOLT_ALPHA}) * (h.l + h.b)) - h.l)
               + (1 - {HOLT_BETA}) * h.b
      FROM h JOIN idx y ON y.i = h.i + 1
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           floor(l * 1000000 + 0.5) / 1000000 AS level,
           floor(b * 1000000 + 0.5) / 1000000 AS trend,
           floor((l + {HOLT_HORIZON} * b) * 1000000 + 0.5) / 1000000
             AS forecast_{HOLT_HORIZON}d
    FROM h, nn WHERE i = n
    """,
)
def timeseries_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing over the daily
    event-count series — the trend-aware upgrade of timeseries_ewma
    capacity planners run for short-horizon load forecasts: level
    l_t = a*y_t + (1-a)*(l+b), trend b_t = B*(l_t - l) + (1-B)*b,
    forecast = l_n + h*b_n. The smoothing recursion is inherently
    sequential, but the SERIES is |days| rows, not the corpus: one
    corpus shuffle builds the daily counts, then the whole fold runs
    as a single JVM F.aggregate over the sort_array'd (day, count)
    structs — no Python, no per-row state exchange, and at 100 TB the
    fold input is still just the days dimension. Determinism: the
    recursion is one fixed IEEE expression chain from integer counts
    ((1 - a) written identically on both sides — the literal 0.5/0.7
    need not equal the subtraction's double); the oracle's recursive
    CTE threads (level, trend) through the identical ops; outputs
    floor-quantize at 1e6."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    # the global agg always yields one row; gate on n_days > 0 so an
    # empty/all-NULL-ts corpus returns the oracle's 0 rows (the
    # recursive CTE's anchor is empty) rather than a zeroed-state row
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "c"))).alias("ys"),
        F.count("*").alias("n_days"),
    ).where(F.col("n_days") > 0)
    a, bb = HOLT_ALPHA, HOLT_BETA

    def step(acc, x):
        y = x["c"].cast("double")
        lp = F.lit(a) * y + (F.lit(1.0) - F.lit(a)) * (acc["l"] + acc["b"])
        return F.when(
            acc["i"] == 0,
            F.struct(
                y.alias("l"), F.lit(0.0).alias("b"), (acc["i"] + 1).alias("i")
            ),
        ).otherwise(
            F.struct(
                lp.alias("l"),
                (
                    F.lit(bb) * (lp - acc["l"])
                    + (F.lit(1.0) - F.lit(bb)) * acc["b"]
                ).alias("b"),
                (acc["i"] + 1).alias("i"),
            )
        )

    acc0 = F.struct(
        F.lit(0.0).alias("l"), F.lit(0.0).alias("b"), F.lit(0).cast("long").alias("i")
    )
    fold = F.aggregate("ys", acc0, step)
    return series.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        (F.floor(fold["l"] * 1000000 + F.lit(0.5)) / 1000000).alias("level"),
        (F.floor(fold["b"] * 1000000 + F.lit(0.5)) / 1000000).alias("trend"),
        (
            F.floor(
                (fold["l"] + F.lit(HOLT_HORIZON) * fold["b"]) * 1000000 + F.lit(0.5)
            )
            / 1000000
        ).alias(f"forecast_{HOLT_HORIZON}d"),
    )


PACF_MAX_LAG = 7


def _durbin_levinson_stages(K: int) -> list[tuple[str, str]]:
    """Unrolled Durbin-Levinson recursion as (column_name, sql_expr)
    stages over ACF columns r1..rK — ONE symbolic expansion consumed
    by BOTH engines (Spark selectExpr and the DuckDB oracle's chained
    CTEs), so the floating-point shapes cannot drift apart. Each stage
    may reference columns from earlier stages only."""
    stages: list[tuple[str, str]] = [("p_1_1", "r1")]
    for k in range(2, K + 1):
        num = f"r{k} - (" + " + ".join(
            f"p_{k - 1}_{j} * r{k - j}" for j in range(1, k)
        ) + ")"
        den = "1.0 - (" + " + ".join(
            f"p_{k - 1}_{j} * r{j}" for j in range(1, k)
        ) + ")"
        stages.append(
            (f"p_{k}_{k}", f"CASE WHEN abs({den}) > 1e-12 THEN ({num}) / ({den}) END")
        )
        for j in range(1, k):
            stages.append(
                (f"p_{k}_{j}", f"p_{k - 1}_{j} - p_{k}_{k} * p_{k - 1}_{k - j}")
            )
    return stages


def _pacf_quant(k: int) -> str:
    return f"floor(p_{k}_{k} * 1000000 + 0.5) / 1000000"


_PACF_STAGES = _durbin_levinson_stages(PACF_MAX_LAG)

_PACF_ORACLE = (
    f"""
    WITH daily AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    dn AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(day AS DATE)) AS BIGINT) AS d,
             n
      FROM daily
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nd,
             CAST(sum(n) AS BIGINT) AS sx,
             CAST(sum(n * n) AS BIGINT) AS sxx
      FROM dn
    ),
    rr AS (
      SELECT CAST(k.k AS BIGINT) AS lag,
             CAST(count(*) AS BIGINT) AS mk,
             CAST(sum(x.n * y.n) AS BIGINT) AS sxy,
             CAST(sum(x.n) AS BIGINT) AS sxa,
             CAST(sum(y.n) AS BIGINT) AS sya
      FROM dn x, LATERAL (SELECT unnest(range(1, {PACF_MAX_LAG} + 1)) AS k) k
      JOIN dn y ON y.d = x.d + k.k
      GROUP BY 1
    ),
    base AS (
      SELECT """
    + ", ".join(
        f"(max(CASE WHEN lag = {k} THEN CAST(sxy AS DOUBLE) END)"
        f" - (CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE))"
        f" * max(CASE WHEN lag = {k} THEN CAST(sxa + sya AS DOUBLE) END)"
        f" + max(CASE WHEN lag = {k} THEN CAST(mk AS DOUBLE) END)"
        f" * (CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE))"
        f" * (CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE)))"
        f" / (CAST(sxx AS DOUBLE)"
        f" - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE)) AS r{k}"
        for k in range(1, PACF_MAX_LAG + 1)
    )
    + """
      FROM rr, tot GROUP BY nd, sx, sxx
    )"""
    + "".join(
        f",\n    lvl{i} AS (SELECT *, {expr} AS {name} FROM "
        + ("base" if i == 0 else f"lvl{i - 1}")
        + ")"
        for i, (name, expr) in enumerate(_PACF_STAGES)
    )
    + f"\n    "
    + " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS lag, {_pacf_quant(k)} AS pacf "
        f"FROM lvl{len(_PACF_STAGES) - 1}"
        for k in range(1, PACF_MAX_LAG + 1)
    )
)


@register("timeseries_pacf", oracle=_PACF_ORACLE)
def timeseries_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at lags
    1..{K} via the Durbin-Levinson recursion — the AR-order picker
    that complements stats_autocorrelation (ACF says lag 7 correlates;
    PACF says whether that is a REAL weekly AR term or just lag-1
    propagation). The corpus reduces once to the daily series; the
    standard-normalized ACF (global mean, lag-0 variance denominator,
    not per-lag Pearson) pivots to a single row, and the recursion is
    UNROLLED at plan-build time from one symbolic expansion shared
    verbatim with the oracle (chained scalar stages on a 1-row
    relation), so both engines evaluate bit-identical IEEE shapes and
    the only quantization is the final 1e6 floor per lag. Degenerate
    guard: each level's innovation variance denominator yields NULL
    (not a 0/0) when the recursion hits an exactly-predictable
    series.""".replace("{K}", str(PACF_MAX_LAG))

    ev = load_table(spark, sf_dir, "events")
    dn = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.datediff(F.col("day").cast("date"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
            "n",
        )
        .transform(pin_cache)
    )
    tot = dn.agg(
        F.count("*").cast("bigint").alias("nd"),
        F.sum("n").cast("bigint").alias("sx"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sxx"),
    )
    ks = dn.crossJoin(
        F.broadcast(
            ev.sparkSession.range(1, PACF_MAX_LAG + 1).select(
                F.col("id").cast("bigint").alias("lag")
            )
        )
    )
    y = dn.select(F.col("d").alias("d2"), F.col("n").alias("y"))
    rr = (
        ks.join(y, F.col("d2") == F.col("d") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").cast("bigint").alias("mk"),
            F.sum(F.col("n") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum("n").cast("bigint").alias("sxa"),
            F.sum("y").cast("bigint").alias("sya"),
        )
    )
    # r_k from exact int64 moments, centered algebraically with the
    # IDENTICAL expression shape as the oracle (a direct sum of
    # centered double products would be partial-aggregation-order
    # dependent; integer sums are not)
    def rk(k: int):
        mud = "(CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE))"
        num = (
            f"(max(CASE WHEN lag = {k} THEN CAST(sxy AS DOUBLE) END)"
            f" - {mud} * max(CASE WHEN lag = {k} THEN CAST(sxa + sya AS DOUBLE) END)"
            f" + max(CASE WHEN lag = {k} THEN CAST(mk AS DOUBLE) END)"
            f" * {mud} * {mud})"
        )
        den = (
            "(CAST(sxx AS DOUBLE)"
            " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE))"
        )
        return F.expr(f"{num} / {den}").alias(f"r{k}")

    base = (
        rr.crossJoin(F.broadcast(tot))
        .groupBy("nd", "sx", "sxx")
        .agg(*[rk(k) for k in range(1, PACF_MAX_LAG + 1)])
        .drop("nd", "sx", "sxx")
    )
    cur = base
    for name, expr in _PACF_STAGES:
        cur = cur.selectExpr("*", f"{expr} AS {name}")
    stack = ", ".join(
        f"CAST({k} AS BIGINT), {_pacf_quant(k)}" for k in range(1, PACF_MAX_LAG + 1)
    )
    return cur.selectExpr(f"stack({PACF_MAX_LAG}, {stack}) AS (lag, pacf)")


_THEIL_SEN_ORACLE = """
    WITH daily AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day,
             CAST(count(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    ),
    dn AS (
      SELECT CAST(date_diff('day', DATE '1992-01-01', CAST(day AS DATE)) AS BIGINT) AS d,
             n
      FROM daily
    ),
    slopes AS (
      SELECT a.d AS di, b.d AS dj,
             (b.n - a.n) / CAST(b.d - a.d AS DOUBLE) AS slope
      FROM dn a JOIN dn b ON b.d > a.d
    ),
    ranked AS (
      SELECT slope,
             row_number() OVER (ORDER BY slope, di, dj) AS rk,
             count(*) OVER () AS m
      FROM slopes
    ),
    med AS (
      SELECT slope AS slope_med, CAST(m AS BIGINT) AS n_pairs
      FROM ranked WHERE rk = (m + 1) // 2
    ),
    resid AS (
      SELECT dn.n - med.slope_med * CAST(dn.d AS DOUBLE) AS r0,
             row_number() OVER (
               ORDER BY dn.n - med.slope_med * CAST(dn.d AS DOUBLE), dn.d
             ) AS rk,
             count(*) OVER () AS k
      FROM dn, med
    )
    SELECT CAST(r.k AS BIGINT) AS n_days,
           m.n_pairs,
           floor(m.slope_med * 1000000 + 0.5) / 1000000 AS slope,
           floor(r.r0 * 1000000 + 0.5) / 1000000 AS intercept
    FROM med m, resid r
    WHERE r.rk = (r.k + 1) // 2
"""


@register("timeseries_theil_sen", oracle=_THEIL_SEN_ORACLE)
def timeseries_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily event-count series: the
    LOWER MEDIAN of all pairwise slopes (deterministic rank convention
    rk = (m+1) div 2 with (slope, d_i, d_j) tiebreak — never an
    averaged median, so no new FP shape), plus the matching lower-
    median intercept of the residuals. Up to ~29% contaminated days
    (outages, backfill spikes) cannot move this trend, which is why
    it's the estimator for alerting baselines where OLS (stats_corr /
    holt) chases outliers. The corpus reduces ONCE to the bounded
    daily relation; the O(|days|^2) pair explode runs on that tiny
    relation only (for multi-year horizons, bucket to months first or
    use the repeated-median variant — same plan shape). Slopes are
    single IEEE divisions of exact integer counts/day-numbers; the
    published slope/intercept floor-quantize at 1e6."""

    ev = load_table(spark, sf_dir, "events")
    dn = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("double").alias("n"))
        .select(
            F.datediff(F.col("day").cast("date"), F.lit("1992-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
            "n",
        )
        .transform(pin_cache)
    )
    b = dn.select(F.col("d").alias("dj"), F.col("n").alias("nj"))
    slopes = dn.join(b, F.col("dj") > F.col("d")).select(
        F.col("d").alias("di"),
        "dj",
        ((F.col("nj") - F.col("n")) / (F.col("dj") - F.col("d")).cast("double")).alias(
            "slope"
        ),
    )
    wr = Window.orderBy("slope", "di", "dj")
    ranked = slopes.select(
        "slope",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("m"),
    )
    med = ranked.filter(F.col("rk") == F.expr("(m + 1) div 2")).select(
        F.col("slope").alias("slope_med"), F.col("m").cast("bigint").alias("n_pairs")
    )
    resid = dn.crossJoin(F.broadcast(med)).select(
        (F.col("n") - F.col("slope_med") * F.col("d").cast("double")).alias("r0"),
        "d",
        "slope_med",
        "n_pairs",
    )
    wk = Window.orderBy("r0", "d")
    rr = resid.select(
        "r0",
        "slope_med",
        "n_pairs",
        F.row_number().over(wk).alias("rk"),
        F.count("*").over(Window.partitionBy()).alias("k"),
    )
    return rr.filter(F.col("rk") == F.expr("(k + 1) div 2")).select(
        F.col("k").cast("bigint").alias("n_days"),
        "n_pairs",
        (F.floor(F.col("slope_med") * 1000000 + F.lit(0.5)) / 1000000).alias("slope"),
        (F.floor(F.col("r0") * 1000000 + F.lit(0.5)) / 1000000).alias("intercept"),
    )


# Holt-Winters additive seasonal smoothing — the seasonality-aware
# rung above timeseries_holt_linear. Weekly season over the daily
# event-count series; standard "simple" initialization (first-season
# mean level, two-season trend, first-season deviations as the
# seasonal vector), recursion from day m+1. All (1-x) complements are
# spelled as their OWN literals on both sides (the FS_MISS rule:
# share literals, never re-derive them), and the oracle CASTs them to
# DOUBLE so DuckDB cannot run the recursion in decimal.
HW_SEASON = 7
HW_ALPHA, HW_ALPHA_C = 0.4, 0.6
HW_BETA, HW_BETA_C = 0.2, 0.8
HW_GAMMA, HW_GAMMA_C = 0.3, 0.7
HW_HORIZON = 7


def _hw_oracle() -> str:
    m = HW_SEASON
    a, ac = f"CAST({HW_ALPHA} AS DOUBLE)", f"CAST({HW_ALPHA_C} AS DOUBLE)"
    b, bc = f"CAST({HW_BETA} AS DOUBLE)", f"CAST({HW_BETA_C} AS DOUBLE)"
    g, gc = f"CAST({HW_GAMMA} AS DOUBLE)", f"CAST({HW_GAMMA_C} AS DOUBLE)"
    sp = f"list_extract(h.s, (h.i % {m}) + 1)"
    lp = f"({a} * (y.c - {sp}) + {ac} * (h.l + h.b))"
    return f"""
    WITH RECURSIVE daily AS (
      SELECT date_trunc('day', ts) AS day, count(*) AS c
      FROM events WHERE ts IS NOT NULL GROUP BY 1
    ),
    idx AS (
      SELECT c, row_number() OVER (ORDER BY day) AS i FROM daily
    ),
    nn AS (SELECT count(*) AS n FROM daily),
    init AS (
      SELECT
        (SELECT CAST(sum(c) AS DOUBLE) FROM idx WHERE i <= {m}) / {m} AS l0,
        ((SELECT CAST(sum(c) AS DOUBLE) FROM idx WHERE i > {m} AND i <= {2 * m})
         - (SELECT CAST(sum(c) AS DOUBLE) FROM idx WHERE i <= {m}))
          / {m * m} AS b0
    ),
    h(i, l, b, s) AS (
      SELECT CAST({m} AS BIGINT), init.l0, init.b0,
             (SELECT list(CAST(c AS DOUBLE) - init.l0 ORDER BY i)
              FROM idx WHERE i <= {m})
      FROM init
      UNION ALL
      SELECT h.i + 1,
             {lp},
             {b} * ({lp} - h.l) + {bc} * h.b,
             h.s[1:(h.i % {m})]
               || [{g} * (y.c - h.l - h.b) + {gc} * {sp}]
               || h.s[(h.i % {m}) + 2:{m}]
      FROM h JOIN idx y ON y.i = h.i + 1
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           floor(l * 1000000 + 0.5) / 1000000 AS level,
           floor(b * 1000000 + 0.5) / 1000000 AS trend,
           floor(list_extract(s, (n % {m}) + 1) * 1000000 + 0.5) / 1000000
             AS season_next,
           floor((l + {HW_HORIZON} * b
                  + list_extract(s, ((n + {HW_HORIZON} - 1) % {m}) + 1))
                 * 1000000 + 0.5) / 1000000 AS forecast_{HW_HORIZON}d
    FROM h, nn WHERE i = n AND n >= {2 * m}
    """


@register("timeseries_holt_winters", oracle=_hw_oracle())
def timeseries_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive seasonal smoothing over the daily event
    counts (level + trend + weekly seasonal vector) — the model a
    capacity planner actually uses when load has a day-of-week shape:
      l_t = a*(y_t - s_(t-m)) + (1-a)*(l + b)
      b_t = B*(l_t - l) + (1-B)*b
      s_t = G*(y_t - l - b) + (1-G)*s_(t-m)
    forecast_h = l_n + h*b_n + s at the (n+h) phase.

    Scale shape: identical to timeseries_holt_linear — ONE corpus
    shuffle builds the |days|-row daily series, then the inherently
    sequential recursion runs as a single JVM F.aggregate fold whose
    accumulator carries (l, b, i, seasonal vector of {HW_SEASON}); at
    100 TB the fold input is still the days dimension. Determinism:
    the fold is one fixed IEEE expression chain from integer counts,
    the oracle's recursive CTE threads the identical ops through a
    LIST column, outputs floor-quantize at 1e6; gated to n >= 2m so
    the two-season initialization is always fully formed."""
    m = HW_SEASON
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "c"))).alias("ys"),
        F.count("*").alias("n_days"),
    ).where(F.col("n_days") >= 2 * m)

    first = F.slice("ys", 1, m)
    second = F.slice("ys", m + 1, m)
    s1 = F.aggregate(
        first, F.lit(0).cast("long"), lambda acc, x: acc + x["c"]
    )
    s2 = F.aggregate(
        second, F.lit(0).cast("long"), lambda acc, x: acc + x["c"]
    )
    l0 = s1.cast("double") / m
    b0 = (s2.cast("double") - s1.cast("double")) / (m * m)
    s0 = F.transform(first, lambda x: x["c"].cast("double") - l0)
    rest = F.slice(
        "ys", m + 1, F.greatest(F.size("ys") - m, F.lit(0))
    )

    def step(acc, x):
        p = (acc["i"] % m + 1).cast("int")
        sprev = F.element_at(acc["s"], p)
        y = x["c"].cast("double")
        lp = F.lit(HW_ALPHA) * (y - sprev) + F.lit(HW_ALPHA_C) * (
            acc["l"] + acc["b"]
        )
        bp = F.lit(HW_BETA) * (lp - acc["l"]) + F.lit(HW_BETA_C) * acc["b"]
        gnew = (
            F.lit(HW_GAMMA) * (y - acc["l"] - acc["b"])
            + F.lit(HW_GAMMA_C) * sprev
        )
        snew = F.concat(
            F.slice(acc["s"], F.lit(1), p - 1),
            F.array(gnew),
            F.slice(acc["s"], p + 1, F.lit(m) - p),
        )
        return F.struct(
            lp.alias("l"),
            bp.alias("b"),
            (acc["i"] + 1).alias("i"),
            snew.alias("s"),
        )

    acc0 = F.struct(
        l0.alias("l"),
        b0.alias("b"),
        F.lit(m).cast("long").alias("i"),
        s0.alias("s"),
    )
    fold = F.aggregate(rest, acc0, step)
    n = F.col("n_days")
    season_next = F.element_at(fold["s"], ((n % m) + 1).cast("int"))
    season_h = F.element_at(
        fold["s"], (((n + HW_HORIZON - 1) % m) + 1).cast("int")
    )
    q = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return series.select(
        n.cast("bigint").alias("n_days"),
        q(fold["l"]).alias("level"),
        q(fold["b"]).alias("trend"),
        q(season_next).alias("season_next"),
        q(fold["l"] + F.lit(HW_HORIZON) * fold["b"] + season_h).alias(
            f"forecast_{HW_HORIZON}d"
        ),
    )


# MAD-based robust anomaly flagging — the heavy-tail-safe twin of
# timeseries_anomaly_zscore: mean/std are themselves dragged by the
# outliers they should flag, while the median and the median absolute
# deviation (the Hampel filter) stay put. ENTIRELY integer arithmetic:
# values milli-quantize, the per-type LOWER median (min value whose
# cumulative count reaches ceil(n/2) — the convention pinned here) and
# the lower-median MAD come off value HISTOGRAMS via cumulative-count
# selection (the value domain is bounded, so the windows run over
# domain-sized relations — never a corpus sort), and the flag rule
# |v - med| > K*MAD is an int64 comparison. K = 3 (~2 sigma-equivalents
# under normality: 3 x 0.6745).
MAD_K = 3


@register(
    "timeseries_anomaly_mad",
    oracle=f"""
    WITH q AS (
      SELECT event_id, event_type, value,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v3
      FROM events WHERE value IS NOT NULL
    ),
    h1 AS (SELECT event_type, v3, count(*) AS c FROM q GROUP BY 1, 2),
    c1 AS (
      SELECT event_type, v3,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY v3) AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM h1
    ),
    med AS (
      SELECT event_type,
             CAST(min(CASE WHEN 2 * cum >= n + 1 THEN v3 END) AS BIGINT) AS med
      FROM c1 GROUP BY event_type
    ),
    dev AS (
      SELECT q.event_id, q.event_type, q.value, abs(q.v3 - m.med) AS d
      FROM q JOIN med m ON m.event_type = q.event_type
    ),
    h2 AS (SELECT event_type, d, count(*) AS c FROM dev GROUP BY 1, 2),
    c2 AS (
      SELECT event_type, d,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM h2
    ),
    mad AS (
      SELECT event_type,
             CAST(min(CASE WHEN 2 * cum >= n + 1 THEN d END) AS BIGINT) AS mad
      FROM c2 GROUP BY event_type
    )
    SELECT v.event_id, v.event_type, v.value, v.d AS abs_dev_milli,
           m.mad AS mad_milli
    FROM dev v JOIN mad m ON m.event_type = v.event_type
    WHERE v.d > {MAD_K} * m.mad
    """,
)
def timeseries_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel (median/MAD) robust anomaly filter — see the block
    comment for the lower-median convention and the all-integer
    exactness. Plan: two histogram shuffles (per-type value counts,
    per-type deviation counts), cumulative selection over the
    domain-bounded histograms, medians/MADs broadcast back onto the
    event scan; the flag is a map-side integer comparison. The
    deviation relation pins — it feeds the MAD histogram AND the
    final flag projection."""
    e = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    q = e.select(
        "event_id",
        "event_type",
        "value",
        F.expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)").alias("v3"),
    )

    def lower_median(rel: DataFrame, col: str, out: str) -> DataFrame:
        h = rel.groupBy("event_type", col).agg(F.count("*").alias("c"))
        wc = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy("event_type")
        cum = h.select(
            "event_type",
            F.col(col),
            F.sum("c").over(wc).cast("bigint").alias("cum"),
            F.sum("c").over(wt).cast("bigint").alias("n"),
        )
        return cum.groupBy("event_type").agg(
            F.min(F.when(2 * F.col("cum") >= F.col("n") + 1, F.col(col)))
            .cast("bigint")
            .alias(out)
        )

    med = lower_median(q, "v3", "med")
    dev = q.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.abs(F.col("v3") - F.col("med")).alias("d"),
    ).transform(pin_cache)
    mad = lower_median(dev, "d", "mad")
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("d") > MAD_K * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.col("d").alias("abs_dev_milli"),
            F.col("mad").alias("mad_milli"),
        )
    )


# Association-rule mining over per-user event-type baskets (Agrawal &
# Srikant 1994's support/confidence/lift, restricted to 2-itemsets —
# the pairwise tier every basket analysis starts with; higher-order
# itemsets follow by the same self-join recurrence). Basket = a user's
# DISTINCT event types; a rule a -> b reads "users who did a also did
# b". All three metrics derive from exact integer counts: support =
# n_ab / N, confidence = n_ab / n_a, lift = N * n_ab / (n_a * n_b)
# (lift > 1 = positive association). Both rule directions emit; the
# min-support gate keeps noise pairs out.
ASSOC_MIN_USERS = 2


@register(
    "mine_association_pairs",
    oracle=f"""
    WITH b AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n1 AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS na
      FROM b GROUP BY event_type
    ),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM b),
    p AS (
      SELECT x.event_type AS ante, y.event_type AS cons,
             CAST(count(*) AS BIGINT) AS nab
      FROM b x JOIN b y
        ON x.user_id = y.user_id AND x.event_type <> y.event_type
      GROUP BY x.event_type, y.event_type
      HAVING count(*) >= {ASSOC_MIN_USERS}
    )
    SELECT p.ante, p.cons, p.nab,
           a.na AS n_ante, c.na AS n_cons, t.n AS n_users,
           floor(CAST(p.nab AS DOUBLE) / t.n * 1000000 + 0.5) / 1000000
             AS support,
           floor(CAST(p.nab AS DOUBLE) / a.na * 1000000 + 0.5) / 1000000
             AS confidence,
           floor(CAST(t.n AS DOUBLE) * p.nab / (CAST(a.na AS DOUBLE) * c.na)
                 * 1000000 + 0.5) / 1000000 AS lift
    FROM p
    JOIN n1 a ON a.event_type = p.ante
    JOIN n1 c ON c.event_type = p.cons
    CROSS JOIN tot t
    """,
)
def mine_association_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise association rules over user baskets — see the block
    comment. Scale shape: the basket relation shuffles ONCE on
    user_id; the pair self-join runs inside that partitioning (per-user
    baskets are type-domain-bounded, so the per-user pair fan-out is a
    constant factor, never corpus-quadratic); pair counts combine
    map-side to a |types|^2-bounded relation; the per-type counts and
    the 1-row user total attach as broadcasts."""
    b = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .transform(pin_cache)
    )
    n1 = b.groupBy("event_type").agg(F.count("*").cast("bigint").alias("na"))
    tot = b.agg(F.countDistinct("user_id").cast("bigint").alias("n"))
    x = b.select(F.col("user_id"), F.col("event_type").alias("ante"))
    y = b.select(F.col("user_id"), F.col("event_type").alias("cons"))
    p = (
        x.join(y, "user_id")
        .where(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count("*").cast("bigint").alias("nab"))
        .where(F.col("nab") >= ASSOC_MIN_USERS)
    )
    q6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    return (
        p.join(
            F.broadcast(n1.select(F.col("event_type").alias("ante"),
                                  F.col("na").alias("n_ante"))),
            "ante",
        )
        .join(
            F.broadcast(n1.select(F.col("event_type").alias("cons"),
                                  F.col("na").alias("n_cons"))),
            "cons",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "ante",
            "cons",
            "nab",
            "n_ante",
            "n_cons",
            F.col("n").alias("n_users"),
            q6(F.col("nab").cast("double") / F.col("n")).alias("support"),
            q6(F.col("nab").cast("double") / F.col("n_ante")).alias("confidence"),
            q6(
                F.col("n").cast("double")
                * F.col("nab")
                / (F.col("n_ante").cast("double") * F.col("n_cons"))
            ).alias("lift"),
        )
    )


# Burstiness (Goh & Barabási 2008): B = (sigma - mu) / (sigma + mu)
# over each event type's inter-arrival gaps — B -> -1 periodic,
# B ~ 0 Poisson, B -> +1 bursty. The one-number answer to "is this
# stream's load schedulable or spiky", which sizes streaming state
# stores and ingest buffers. Gaps in integer MICROSECONDS via the lag
# window; moments exact int64 up to the documented bound (gap <= ~3e9
# us and n <= ~1e6 at sf0.1 keeps sum(gap^2) ~ 1e25... so gaps are
# CLAMPED to <= 1 hour = 3.6e9 us first — tail gaps beyond an hour
# carry no burstiness signal and the clamp keeps sum(g^2) inside
# int64 for n up to ~700 (3.6e9)^2 ... see the per-type scaling note
# below: gaps are stored in MILLIseconds (<= 3.6e6 per gap), so
# sum(g^2) <= n * 1.3e13 — int64-safe to n ~ 7e5 per type at sf0.1
# and the variance is centered algebraically from raw moments.
TS_GAP_CLAMP_MS = 3_600_000  # 1 hour


@register(
    "timeseries_burstiness",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             least(CAST(floor(epoch_us(ts - lag(ts) OVER (
                     PARTITION BY event_type ORDER BY ts, event_id
                   )) / 1000 + 0.5) AS BIGINT), {TS_GAP_CLAMP_MS}) AS gap
      FROM events WHERE ts IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             CAST(count(gap) AS BIGINT) AS n,
             CAST(sum(gap) AS BIGINT) AS s,
             CAST(sum(gap * gap) AS BIGINT) AS q
      FROM g WHERE gap IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n AS n_gaps,
           CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS mean_gap_ms,
           CASE WHEN n > 1 AND s > 0 THEN
             floor((sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1.0))
                    - CAST(s AS DOUBLE) / n)
                   / (sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1.0))
                      + CAST(s AS DOUBLE) / n)
                   * 1000000 + 0.5) / 1000000
           END AS burstiness
    FROM m
    """,
)
def timeseries_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type inter-arrival burstiness B = (sd - mean)/(sd + mean) —
    see the block comment for the clamp and int64 bounds. Scale shape:
    ONE lag window partitioned by event_type (the natural shuffle key,
    never a global sort), then a map-side-combined moment aggregate;
    the final row count is type-domain-bounded."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    lag_ts = F.lag("ts").over(
        W.partitionBy("event_type").orderBy("ts", "event_id")
    )
    gap = F.least(
        F.floor(
            (F.unix_micros(F.col("ts")) - F.unix_micros(lag_ts)) / 1000
            + F.lit(0.5)
        ).cast("long"),
        F.lit(TS_GAP_CLAMP_MS),
    )
    g = e.select("event_type", gap.alias("gap")).where(F.col("gap").isNotNull())
    m = g.groupBy("event_type").agg(
        F.count("gap").cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("q"),
    )
    n, s, q = (F.col(c).cast("double") for c in ("n", "s", "q"))
    sd = F.sqrt((q - s * s / n) / (n - 1.0))
    mu = s / n
    return m.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.floor(s / n + F.lit(0.5)).alias("mean_gap_ms"),
        F.when(
            (F.col("n") > 1) & (F.col("s") > 0),
            F.floor((sd - mu) / (sd + mu) * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("burstiness"),
    )


# Hurst exponent via rescaled-range (R/S) analysis (Hurst 1951;
# Mandelbrot & Wallis 1969): chunk each per-type series into windows
# of w, compute R/S per chunk (range of cumulative mean-deviations
# over population std), average per window size, and estimate
# H = dlog(R/S)/dlog(w) from the two-point slope. H ≈ 0.5 = memoryless
# (this fixture's iid values), H > 0.5 = long-range persistence — the
# standard "does this metric trend or mean-revert" probe.
#
# Exactness: values integerize at milli-units; within a chunk the
# cumulative deviation is held in the EXACT integer form
# Z'_t = w*prefix_t - t*sum_w (scaling by w clears the mean's
# denominator), so R' = max Z' - min Z' is exact int64, the population
# variance numerator D = w*q - s^2 is exact int64, and
# R/S = R'/sqrt(D) is ONE IEEE op per chunk. Per-chunk R/S rounds to a
# 1e6-scaled BIGINT before the cross-chunk SUM, so no cross-engine
# FP-summation-order risk; the final slope takes ln() of two exact
# rationals (identical doubles both engines).
HURST_W = (32, 128)


def _hurst_oracle() -> str:
    w_small, w_big = HURST_W
    legs = " UNION ALL ".join(
        f"""
        SELECT event_type, CAST({w} AS BIGINT) AS w,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(rs_q) AS BIGINT) AS rs_sum
        FROM (
          SELECT event_type, chunk,
                 floor(CAST(max(zp) - min(zp) AS DOUBLE)
                       / sqrt(CAST({w} * max(q) - max(s) * max(s) AS DOUBLE))
                       * 1000000 + 0.5) AS rs_q
          FROM (
            SELECT event_type, chunk, t,
                   {w} * pref - t * s AS zp, s, q
            FROM (
              SELECT event_type, chunk,
                     row_number() OVER (PARTITION BY event_type, chunk
                                        ORDER BY rn) AS t,
                     sum(v) OVER (PARTITION BY event_type, chunk
                                  ORDER BY rn) AS pref,
                     sum(v) OVER (PARTITION BY event_type, chunk) AS s,
                     sum(v * v) OVER (PARTITION BY event_type, chunk) AS q,
                     count(*) OVER (PARTITION BY event_type, chunk) AS cn
              FROM (
                SELECT event_type,
                       CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY ts, event_id) AS rn,
                       CAST((row_number() OVER (PARTITION BY event_type
                                                ORDER BY ts, event_id) - 1)
                            // {w} AS BIGINT) AS chunk
                FROM events
              )
            ) WHERE cn = {w}
          )
          GROUP BY event_type, chunk
          HAVING {w} * max(q) - max(s) * max(s) > 0
        )
        GROUP BY event_type
        """
        for w in HURST_W
    )
    return f"""
    WITH legs AS ({legs})
    SELECT a.event_type,
           a.n_chunks AS n_chunks_small, b.n_chunks AS n_chunks_big,
           floor(CAST(a.rs_sum AS DOUBLE) / a.n_chunks + 0.5) / 1000000
             AS rs_small,
           floor(CAST(b.rs_sum AS DOUBLE) / b.n_chunks + 0.5) / 1000000
             AS rs_big,
           floor((ln(CAST(b.rs_sum AS DOUBLE) / b.n_chunks / 1000000)
                  - ln(CAST(a.rs_sum AS DOUBLE) / a.n_chunks / 1000000))
                 / ln(CAST({w_big} AS DOUBLE) / {w_small})
                 * 1000000 + 0.5) / 1000000 AS hurst
    FROM legs a JOIN legs b
      ON a.event_type = b.event_type AND a.w = {w_small} AND b.w = {w_big}
    """


@register("timeseries_hurst_exponent", oracle=_hurst_oracle())
def timeseries_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-point R/S Hurst exponent per event type — see the block
    comment for the exact-integer construction. Scale shape: ONE
    shuffle on event_type (domain-bounded partitions) feeds every
    window; chunk aggregates combine map-side within partitions; the
    cross-chunk reduction carries one 1e6-scaled integer per chunk
    (n/w rows), and the final join is |types| x 2 rows. No corpus
    self-joins, no Python."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long").alias("v"),
        "ts",
        "event_id",
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("ts", "event_id")
    )
    base = e.withColumn("rn", rn).transform(pin_cache)
    w_small, w_big = HURST_W
    legs = None
    for w in HURST_W:
        chunked = base.withColumn(
            "chunk", F.expr(f"CAST((rn - 1) div {w} AS BIGINT)")
        )
        wc = Window.partitionBy("event_type", "chunk")
        wp = wc.orderBy("rn")
        g = chunked.select(
            "event_type",
            "chunk",
            F.row_number().over(wp).alias("t"),
            F.sum("v").over(wp).alias("pref"),
            F.sum("v").over(wc).alias("s"),
            F.sum(F.col("v") * F.col("v")).over(wc).alias("q"),
            F.count("*").over(wc).alias("cn"),
        ).filter(F.col("cn") == w)
        zp = F.lit(w) * F.col("pref") - F.col("t") * F.col("s")
        chunks = (
            g.withColumn("zp", zp)
            .groupBy("event_type", "chunk")
            .agg(
                (F.max("zp") - F.min("zp")).alias("rp"),
                F.max("q").alias("q"),
                F.max("s").alias("s"),
            )
            .filter(F.lit(w) * F.col("q") - F.col("s") * F.col("s") > 0)
            .select(
                "event_type",
                F.floor(
                    F.col("rp").cast("double")
                    / F.sqrt(
                        (F.lit(w) * F.col("q") - F.col("s") * F.col("s"))
                        .cast("double")
                    )
                    * 1000000
                    + F.lit(0.5)
                ).alias("rs_q"),
            )
        )
        leg = chunks.groupBy("event_type").agg(
            F.lit(w).cast("bigint").alias("w"),
            F.count("*").cast("bigint").alias("n_chunks"),
            F.sum("rs_q").cast("bigint").alias("rs_sum"),
        )
        legs = leg if legs is None else legs.unionByName(leg)
    legs = legs.transform(pin_cache)
    a = legs.filter(F.col("w") == w_small).select(
        "event_type",
        F.col("n_chunks").alias("n_chunks_small"),
        F.col("rs_sum").alias("sum_small"),
    )
    b = legs.filter(F.col("w") == w_big).select(
        "event_type",
        F.col("n_chunks").alias("n_chunks_big"),
        F.col("rs_sum").alias("sum_big"),
    )
    avg_s = F.col("sum_small").cast("double") / F.col("n_chunks_small")
    avg_b = F.col("sum_big").cast("double") / F.col("n_chunks_big")
    return a.join(b, "event_type").select(
        "event_type",
        "n_chunks_small",
        "n_chunks_big",
        (F.floor(avg_s + F.lit(0.5)) / 1000000).alias("rs_small"),
        (F.floor(avg_b + F.lit(0.5)) / 1000000).alias("rs_big"),
        (
            F.floor(
                (F.log(avg_b / 1000000) - F.log(avg_s / 1000000))
                / F.log(F.lit(float(w_big)) / w_small)
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("hurst"),
    )


# Cross-correlation function (CCF) between the DAILY VOLUME series of
# every ordered event-type pair at lags 0..CCF_MAX_LAG — "does signup
# traffic lead purchase traffic by k days?", the lead/lag companion to
# stats_autocorrelation (which correlates a series with itself). The
# corpus collapses to the retention-bounded (type, day) relation with
# one map-side aggregate; the series are DENSIFIED on the shared
# min..max day spine (absent days are true zeros — the same dense-spine
# convention as timeseries_gapfill, built from a broadcast 1-row
# bounds aggregate, never a shuffle of the facts). The lagged pairing
# and the five moment sums (n, Sx, Sy, Sxy, Sxx, Syy) are exact int64
# on the |types|^2 x |days| x |lags| domain-bounded relation; Pearson
# r at each lag is ONE fixed-shape IEEE expression floor-quantized at
# 1e6. Int64 headroom: per-day counts up to ~3e9 keep x*y exact.
CCF_MAX_LAG = 7


@register(
    "timeseries_cross_correlation",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(day) AS lo, max(day) AS hi FROM d
    ),
    spine AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM d) t,
           (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds))) AS day) s
    ),
    dense AS (
      SELECT spine.event_type, spine.day, COALESCE(d.x, 0) AS x
      FROM spine LEFT JOIN d
        ON d.event_type = spine.event_type AND d.day = spine.day
    ),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             b.day - a.day AS lag, a.x AS xa, b.x AS xb
      FROM dense a
      JOIN dense b
        ON b.event_type > a.event_type
       AND b.day BETWEEN a.day AND a.day + {CCF_MAX_LAG}
    ),
    m AS (
      SELECT type_a, type_b, lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xa) AS BIGINT) AS sx,
             CAST(sum(xb) AS BIGINT) AS sy,
             CAST(sum(xa * xb) AS BIGINT) AS sxy,
             CAST(sum(xa * xa) AS BIGINT) AS sxx,
             CAST(sum(xb * xb) AS BIGINT) AS syy
      FROM p GROUP BY 1, 2, 3
    )
    SELECT type_a, type_b, lag, n,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             floor(CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   * 1000000 + 0.5) / 1000000
           END AS ccf
    FROM m
    """,
)
def timeseries_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson cross-correlation at lags 0..7 between the dense daily
    volume series of every ordered event-type pair — see the block
    comment for the spine/densify machinery and exact int64 moments."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = e.groupBy(
        "event_type",
        F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
    ).agg(F.count("*").cast("bigint").alias("x")).transform(pin_cache)
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        d.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    dense = (
        spine.join(d, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
        )
        .transform(pin_cache)
    )
    a = dense.select(
        F.col("event_type").alias("type_a"),
        F.col("day").alias("da"),
        F.col("x").alias("xa"),
    )
    b = dense.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("db"),
        F.col("x").alias("xb"),
    )
    p = a.join(
        b,
        (F.col("type_b") > F.col("type_a"))
        & F.col("db").between(F.col("da"), F.col("da") + CCF_MAX_LAG),
    ).select(
        "type_a",
        "type_b",
        (F.col("db") - F.col("da")).alias("lag"),
        "xa",
        "xb",
    )
    m = p.groupBy("type_a", "type_b", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xa").cast("bigint").alias("sx"),
        F.sum("xb").cast("bigint").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).cast("bigint").alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).cast("bigint").alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).cast("bigint").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "type_a",
        "type_b",
        "lag",
        "n",
        F.when(
            (vx > 0) & (vy > 0),
            F.floor(
                cov.cast("double")
                / F.sqrt(vx.cast("double") * vy.cast("double"))
                * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        ).alias("ccf"),
    )


# --- permutation entropy -----------------------------------------------------
# Ordinal-pattern complexity (Bandt & Pompe 2002) of each event type's
# dense daily-volume series at embedding order 3: every consecutive
# triple maps to its comparison pattern code 4*(a<b) + 2*(b<c) + (a<c)
# (strict "<" makes ties deterministic and extends the 6 permutations
# to 8 tie-aware codes), the code histogram is Shannon-summarized, and
# a white-noise series scores near ln(6) while a monotone trend scores
# near 0 — the cheap "is this metric structured or noise?" probe.
# Exactness: pattern counts are exact int64; each histogram term
# -(c/N) ln(c/N) quantizes to the 1e12 lattice as int64 so the <= 8
# term sum is order-independent exact integer arithmetic; final
# entropy floor-quantizes 1e6. Plan: corpus -> (type, day) map-side
# aggregate, dense spine from a broadcast bounds row (absent days are
# true zeros, the CCF convention), per-type lag-2 window over the
# days-bounded partition, then two tiny hash aggregates.
@register(
    "timeseries_permutation_entropy",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM d) t,
           (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds))) AS day) s
    ),
    dense AS (
      SELECT spine.event_type, spine.day, COALESCE(d.x, 0) AS x
      FROM spine LEFT JOIN d
        ON d.event_type = spine.event_type AND d.day = spine.day
    ),
    tr AS (
      SELECT event_type,
             lag(x, 2) OVER w AS a, lag(x, 1) OVER w AS b, x AS c
      FROM dense
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    codes AS (
      SELECT event_type,
             4 * (CASE WHEN a < b THEN 1 ELSE 0 END)
               + 2 * (CASE WHEN b < c THEN 1 ELSE 0 END)
               + (CASE WHEN a < c THEN 1 ELSE 0 END) AS code,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tr WHERE a IS NOT NULL
      GROUP BY event_type, code
    ),
    tot AS (
      SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_codes
      FROM codes GROUP BY event_type
    ),
    terms AS (
      SELECT c.event_type,
             CAST(floor(-(CAST(c.cnt AS DOUBLE) / t.n)
                        * ln(CAST(c.cnt AS DOUBLE) / t.n)
                        * 1000000000000 + 0.5) AS BIGINT) AS q
      FROM codes c JOIN tot t USING (event_type)
    )
    SELECT t.event_type, t.n AS n_triples, t.n_codes,
           floor(CAST(s.sq AS DOUBLE) / 1000000000000 * 1000000 + 0.5)
             / 1000000 AS perm_entropy
    FROM tot t
    JOIN (SELECT event_type, CAST(sum(q) AS BIGINT) AS sq
          FROM terms GROUP BY event_type) s USING (event_type)
    """,
)
def timeseries_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-3 permutation entropy of each event type's dense daily
    volume series — tie-aware ordinal codes, exact int64 histogram,
    1e12-lattice entropy terms. See the block comment for the plan
    shape (map-side collapse -> broadcast spine -> days-bounded lag
    window -> two tiny aggregates)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = (
        e.groupBy(
            "event_type",
            F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
        )
        .agg(F.count("*").cast("bigint").alias("x"))
        .transform(pin_cache)
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        d.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    dense = spine.join(d, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    tr = dense.select(
        "event_type",
        F.lag("x", 2).over(w).alias("a"),
        F.lag("x", 1).over(w).alias("b"),
        F.col("x").alias("c"),
    ).where(F.col("a").isNotNull())
    codes = (
        tr.select(
            "event_type",
            (
                4 * (F.col("a") < F.col("b")).cast("int")
                + 2 * (F.col("b") < F.col("c")).cast("int")
                + (F.col("a") < F.col("c")).cast("int")
            ).alias("code"),
        )
        .groupBy("event_type", "code")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .transform(pin_cache)
    )
    tot = codes.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_codes"),
    )
    p = F.col("cnt").cast("double") / F.col("n")
    terms = (
        codes.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.floor(-p * F.log(p) * 1000000000000 + F.lit(0.5))
            .cast("bigint")
            .alias("q"),
        )
        .groupBy("event_type")
        .agg(F.sum("q").cast("bigint").alias("sq"))
    )
    return tot.join(terms, "event_type").select(
        "event_type",
        F.col("n").alias("n_triples"),
        "n_codes",
        (
            F.floor(F.col("sq").cast("double") / 1000000000000 * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("perm_entropy"),
    )


# --- SAX symbolization -------------------------------------------------------
# Symbolic Aggregate approXimation (Lin et al. 2003) of each event
# type's dense daily-volume series: z-normalize, piecewise-aggregate
# into SAX_SEGMENTS equal index ranges, map each segment mean to a
# 4-letter alphabet by the standard Gaussian breakpoints
# (-0.6745, 0, 0.6745), and emit the word — the discretization that
# turns numeric series into joinable/groupable motif strings (the
# standard preprocessing for motif discovery and series indexing).
# Determinism: per-type mean/std and per-segment sums reduce from
# exact int64 moments, so both engines feed IDENTICAL doubles into the
# same fixed breakpoint comparisons (IEEE sqrt/divide are correctly
# rounded — no summation-order freedom anywhere); the word assembles
# with an ordered aggregation over the <= SAX_SEGMENTS rows. Plan:
# (type, day) map-side collapse, broadcast spine densify, segment
# index from pure arithmetic (day rank via the day-domain window),
# two tiny aggregates.
SAX_SEGMENTS = 8
SAX_BP = (-0.6745, 0.0, 0.6745)  # N(0,1) quartile breakpoints, alphabet abcd


@register(
    "timeseries_sax",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM d) t,
           (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds))) AS day) s
    ),
    dense AS (
      SELECT spine.event_type, spine.day - b.lo AS i,
             COALESCE(d.x, 0) AS x, b.hi - b.lo + 1 AS len
      FROM spine
      LEFT JOIN d ON d.event_type = spine.event_type AND d.day = spine.day
      CROSS JOIN bounds b
    ),
    mom AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS q
      FROM dense GROUP BY event_type
    ),
    seg AS (
      SELECT event_type, CAST(({SAX_SEGMENTS} * i) // len AS BIGINT) AS g,
             CAST(sum(x) AS BIGINT) AS ss, CAST(count(*) AS BIGINT) AS sc
      FROM dense GROUP BY 1, 2
    ),
    z AS (
      SELECT seg.event_type, seg.g,
             CASE WHEN mom.n * mom.q - mom.s * mom.s > 0 THEN
               (CAST(seg.ss AS DOUBLE) / seg.sc - CAST(mom.s AS DOUBLE) / mom.n)
               / sqrt((CAST(mom.q AS DOUBLE) - CAST(mom.s AS DOUBLE) * mom.s
                       / mom.n) / mom.n)
             ELSE 0.0 END AS zv
      FROM seg JOIN mom USING (event_type)
    ),
    sym AS (
      SELECT event_type, g,
             CASE WHEN zv < {SAX_BP[0]} THEN 'a'
                  WHEN zv < {SAX_BP[1]} THEN 'b'
                  WHEN zv < {SAX_BP[2]} THEN 'c'
                  ELSE 'd' END AS s
      FROM z
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_segments,
           string_agg(s, '' ORDER BY g) AS sax_word
    FROM sym GROUP BY event_type
    """,
)
def timeseries_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX word per event type over the dense daily-volume series —
    z-normalized PAA into SAX_SEGMENTS index ranges, Gaussian-breakpoint
    alphabet abcd. See the block comment for the exactness argument
    (int64 moments feed identical doubles to fixed comparisons)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = (
        e.groupBy(
            "event_type",
            F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
        )
        .agg(F.count("*").cast("bigint").alias("x"))
        .transform(pin_cache)
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        d.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
            (F.col("hi") - F.col("lo") + 1).alias("len"),
            F.col("lo"),
        )
    )
    dense = (
        spine.join(d, ["event_type", "day"], "left")
        .select(
            "event_type",
            (F.col("day") - F.col("lo")).alias("i"),
            F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
            "len",
        )
        .transform(pin_cache)
    )
    mom = dense.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    seg = dense.groupBy(
        "event_type", F.expr(f"({SAX_SEGMENTS} * i) div len").alias("g")
    ).agg(
        F.sum("x").cast("bigint").alias("ss"),
        F.count("*").cast("bigint").alias("sc"),
    )
    var_ok = F.col("n") * F.col("q") - F.col("s") * F.col("s") > 0
    zv = F.when(
        var_ok,
        (
            F.col("ss").cast("double") / F.col("sc")
            - F.col("s").cast("double") / F.col("n")
        )
        / F.sqrt(
            (
                F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / F.col("n")
        ),
    ).otherwise(F.lit(0.0))
    sym = seg.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "g",
        F.when(zv < SAX_BP[0], F.lit("a"))
        .when(zv < SAX_BP[1], F.lit("b"))
        .when(zv < SAX_BP[2], F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("s"),
    )
    return sym.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("g", "s"))), lambda x: x.s
            ),
        ).alias("sax_word"),
    )


# --- peak detection ----------------------------------------------------------
# Strict local maxima of the dense daily-volume series with a
# PEAK_WINDOW-neighbor dominance test and exact integer prominence
# proxies (height above the highest neighbor on each side) — the
# release-spike / incident-spike finder that pairs with the MAD and
# CUSUM anomaly rungs: those flag level shifts, this pinpoints the
# spike days themselves. Entirely integer-exact (counts and
# differences of counts); the only machinery is lag/lead over the
# days-bounded per-type partition.
PEAK_WINDOW = 2  # neighbors per side a peak must strictly dominate


@register(
    "timeseries_peak_detection",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM d) t,
           (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds))) AS day) s
    ),
    dense AS (
      SELECT spine.event_type, spine.day, COALESCE(d.x, 0) AS x
      FROM spine LEFT JOIN d
        ON d.event_type = spine.event_type AND d.day = spine.day
    ),
    nb AS (
      SELECT event_type, day, x,
             greatest(COALESCE(lag(x, 1) OVER w, -1),
                      COALESCE(lag(x, 2) OVER w, -1)) AS lmax,
             greatest(COALESCE(lead(x, 1) OVER w, -1),
                      COALESCE(lead(x, 2) OVER w, -1)) AS rmax
      FROM dense
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, x AS height,
           CAST(x - lmax AS BIGINT) AS left_excess,
           CAST(x - rmax AS BIGINT) AS right_excess
    FROM nb WHERE x > lmax AND x > rmax
    """,
)
def timeseries_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima (dominating PEAK_WINDOW neighbors per side)
    of each type's dense daily volume, with integer left/right excess
    heights. Boundary days treat missing neighbors as -1 so a
    spine-edge spike still qualifies (the convention is explicit in
    both engines). Days-bounded windows only."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = (
        e.groupBy(
            "event_type",
            F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
        )
        .agg(F.count("*").cast("bigint").alias("x"))
        .transform(pin_cache)
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        d.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    dense = spine.join(d, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lmax = F.greatest(
        F.coalesce(F.lag("x", 1).over(w), F.lit(-1)),
        F.coalesce(F.lag("x", 2).over(w), F.lit(-1)),
    )
    rmax = F.greatest(
        F.coalesce(F.lead("x", 1).over(w), F.lit(-1)),
        F.coalesce(F.lead("x", 2).over(w), F.lit(-1)),
    )
    nb = dense.select(
        "event_type", "day", "x", lmax.alias("lmax"), rmax.alias("rmax")
    )
    return nb.where((F.col("x") > F.col("lmax")) & (F.col("x") > F.col("rmax"))).select(
        "event_type",
        "day",
        F.col("x").alias("height"),
        (F.col("x") - F.col("lmax")).cast("bigint").alias("left_excess"),
        (F.col("x") - F.col("rmax")).cast("bigint").alias("right_excess"),
    )


# --- Granger-style lead test -------------------------------------------------
# The parametric answer to the question timeseries_cross_correlation
# only hints at: does type A's daily volume LEAD type B's, beyond what
# B's own history explains? Order-1 Granger F: restricted model
# y_t ~ 1 + y_{t-1} vs full y_t ~ 1 + y_{t-1} + x_{t-1}, on the dense
# shared day spine; F = (SSE_r - SSE_f) / (SSE_f / (T - 3)).
# Exactness: the ten raw moments over the (pair, day) relation are
# exact int64; the scaled centered moments A_pq = T*S_pq - S_p*S_q
# stay exact int64 (CCF's convention), and every SSE is a fixed-shape
# double expression of those ints — identical on both engines, 1/T
# factors cancelling inside F. Plan: corpus collapses once to the
# (type, day) dense relation (broadcast-spine densify), a per-type lag
# window over days-bounded partitions, one day-equi join against the
# lagged cause series, and a k(k-1)-group moment aggregate — nothing
# downstream of the first collapse scales with the corpus.
@register(
    "timeseries_granger_lead",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM d) t,
           (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds))) AS day) s
    ),
    dense AS (
      SELECT spine.event_type, spine.day, COALESCE(d.x, 0) AS x
      FROM spine LEFT JOIN d
        ON d.event_type = spine.event_type AND d.day = spine.day
    ),
    yl AS (
      SELECT event_type AS eb, day, x AS z,
             lag(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS u
      FROM dense
    ),
    p AS (
      SELECT a.event_type AS ea, yl.eb, yl.z, yl.u, a.x AS w
      FROM yl JOIN dense a ON a.day = yl.day - 1
      WHERE yl.u IS NOT NULL AND a.event_type <> yl.eb
    ),
    m AS (
      SELECT ea, eb,
             CAST(count(*) AS BIGINT) AS t,
             CAST(sum(u) AS BIGINT) AS su, CAST(sum(w) AS BIGINT) AS sw,
             CAST(sum(z) AS BIGINT) AS sz,
             CAST(sum(u * u) AS BIGINT) AS suu,
             CAST(sum(w * w) AS BIGINT) AS sww,
             CAST(sum(u * w) AS BIGINT) AS suw,
             CAST(sum(u * z) AS BIGINT) AS suz,
             CAST(sum(w * z) AS BIGINT) AS swz,
             CAST(sum(z * z) AS BIGINT) AS szz
      FROM p GROUP BY ea, eb
    ),
    a AS (
      SELECT ea, eb, t,
             CAST(t * suu - su * su AS DOUBLE) AS auu,
             CAST(t * sww - sw * sw AS DOUBLE) AS aww,
             CAST(t * suw - su * sw AS DOUBLE) AS auw,
             CAST(t * suz - su * sz AS DOUBLE) AS auz,
             CAST(t * swz - sw * sz AS DOUBLE) AS awz,
             CAST(t * szz - sz * sz AS DOUBLE) AS azz
      FROM m
    ),
    f AS (
      SELECT ea, eb, t, auu, azz,
             auu * aww - auw * auw AS det,
             azz - auz * auz / auu AS sser,
             azz - (aww * auz * auz - 2 * auw * auz * awz + auu * awz * awz)
                   / (auu * aww - auw * auw) AS ssef
      FROM a WHERE auu > 0
    )
    SELECT ea AS cause_type, eb AS effect_type,
           t AS n_samples, CAST(t - 3 AS BIGINT) AS df_resid,
           CASE WHEN det > 0 AND ssef > 0 AND t > 3 THEN
             floor((sser - ssef) / (ssef / (t - 3)) * 1000000 + 0.5) / 1000000
           END AS f_stat
    FROM f
    """,
)
def timeseries_granger_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-1 Granger lead F for every directed event-type pair over
    the dense daily series — see the block comment for the exact-int
    moment ladder and the domain-bounded plan."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = (
        e.groupBy(
            "event_type",
            F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
        )
        .agg(F.count("*").cast("bigint").alias("x"))
        .transform(pin_cache)
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        d.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    dense = (
        spine.join(d, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
        )
        .transform(pin_cache)
    )
    w = Window.partitionBy("event_type").orderBy("day")
    yl = dense.select(
        F.col("event_type").alias("eb"),
        "day",
        F.col("x").alias("z"),
        F.lag("x", 1).over(w).alias("u"),
    ).where(F.col("u").isNotNull())
    a_side = dense.select(
        F.col("event_type").alias("ea"),
        (F.col("day") + 1).alias("day"),
        F.col("x").alias("w"),
    )
    p = yl.join(a_side, "day").where(F.col("ea") != F.col("eb"))
    m = p.groupBy("ea", "eb").agg(
        F.count("*").cast("bigint").alias("t"),
        F.sum("u").cast("bigint").alias("su"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(F.col("u") * F.col("u")).cast("bigint").alias("suu"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sww"),
        F.sum(F.col("u") * F.col("w")).cast("bigint").alias("suw"),
        F.sum(F.col("u") * F.col("z")).cast("bigint").alias("suz"),
        F.sum(F.col("w") * F.col("z")).cast("bigint").alias("swz"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
    )
    t = F.col("t")
    auu = (t * F.col("suu") - F.col("su") * F.col("su")).cast("double")
    aww = (t * F.col("sww") - F.col("sw") * F.col("sw")).cast("double")
    auw = (t * F.col("suw") - F.col("su") * F.col("sw")).cast("double")
    auz = (t * F.col("suz") - F.col("su") * F.col("sz")).cast("double")
    awz = (t * F.col("swz") - F.col("sw") * F.col("sz")).cast("double")
    azz = (t * F.col("szz") - F.col("sz") * F.col("sz")).cast("double")
    det = auu * aww - auw * auw
    sser = azz - auz * auz / auu
    ssef = azz - (aww * auz * auz - 2 * auw * auz * awz + auu * awz * awz) / det
    fstat = (sser - ssef) / (ssef / (t - 3))
    return m.where(auu > 0).select(
        F.col("ea").alias("cause_type"),
        F.col("eb").alias("effect_type"),
        t.alias("n_samples"),
        (t - 3).cast("bigint").alias("df_resid"),
        F.when(
            (det > 0) & (ssef > 0) & (t > 3),
            F.floor(fstat * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("f_stat"),
    )


# --- Page-Hinkley changepoint detector --------------------------------------
# The sequential drift detector (Page 1954, Hinkley 1971) replayed in
# batch over each type's dense daily series — the online companion to
# timeseries_cusum_changepoint (which tests against a FIXED reference
# mean; Page-Hinkley tracks the RUNNING mean, so it is the form
# monitoring stacks actually deploy): m_t = sum_{i<=t} (x_i - xbar_i
# - PH_DELTA) with xbar_i the running mean through i, and the alarm
# statistic PH_t = m_t - min_{s<=t} m_s crossing PH_LAMBDA. Exactness:
# xbar_i = prefix_i / i from exact int64 prefixes, each deviation term
# quantizes to the 1e12 lattice, and m_t / its running min are exact
# integer window sums — both engines walk identical integers, so the
# alarm day cannot differ by an ulp. All windows live on the
# days-bounded per-type partition.
PH_DELTA = 2.0  # per-day tolerated drift in the deviation term
PH_LAMBDA = 100.0  # alarm threshold on the PH statistic


@register(
    "timeseries_page_hinkley",
    oracle=f"""
    WITH d AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM events WHERE ts IS NOT NULL
      GROUP BY 1, 2
    ),
    bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
      SELECT t.event_type, s.day
      FROM (SELECT DISTINCT event_type FROM d) t,
           (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds))) AS day) s
    ),
    dense AS (
      SELECT spine.event_type, spine.day, COALESCE(d.x, 0) AS x
      FROM spine LEFT JOIN d
        ON d.event_type = spine.event_type AND d.day = spine.day
    ),
    pf AS (
      SELECT event_type, day, x,
             sum(x) OVER w AS pre,
             row_number() OVER w AS i
      FROM dense
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    q AS (
      SELECT event_type, day, i,
             CAST(floor((x - CAST(pre AS DOUBLE) / i - {PH_DELTA})
                        * 1000000000000 + 0.5) AS BIGINT) AS dev
      FROM pf
    ),
    m1 AS (
      SELECT event_type, day,
             sum(dev) OVER (PARTITION BY event_type ORDER BY day) AS mt
      FROM q
    ),
    ph AS (
      SELECT event_type, day,
             CAST(mt - min(mt) OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS phq
      FROM m1
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           floor(CAST(max(phq) AS DOUBLE) / 1000000000000 * 1000000 + 0.5)
             / 1000000 AS max_ph,
           CAST(min(CASE WHEN CAST(phq AS DOUBLE) / 1000000000000
                              > {PH_LAMBDA} THEN day END) AS BIGINT)
             AS alarm_day,
           max(CAST(phq AS DOUBLE) / 1000000000000 > {PH_LAMBDA}) AS drift_detected
    FROM ph GROUP BY event_type
    """,
)
def timeseries_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley running-mean drift detector per event type over the
    dense daily series — exact lattice deviations, integer cumulative/
    running-min windows, first alarm day released; see the block
    comment."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    d = (
        e.groupBy(
            "event_type",
            F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias("day"),
        )
        .agg(F.count("*").cast("bigint").alias("x"))
        .transform(pin_cache)
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        d.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    dense = spine.join(d, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    pf = dense.select(
        "event_type",
        "day",
        "x",
        F.sum("x").over(wcum).alias("pre"),
        F.row_number().over(w).alias("i"),
    )
    q = pf.select(
        "event_type",
        "day",
        F.floor(
            (F.col("x") - F.col("pre").cast("double") / F.col("i") - PH_DELTA)
            * 1000000000000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("dev"),
    )
    m = q.select(
        "event_type",
        "day",
        F.sum("dev").over(wcum).alias("mt"),
    ).select(
        "event_type",
        "day",
        (F.col("mt") - F.min("mt").over(wcum)).cast("bigint").alias("phq"),
    )
    phd = F.col("phq").cast("double") / 1000000000000
    return m.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        (
            F.floor(F.max("phq").cast("double") / 1000000000000 * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("max_ph"),
        F.min(F.when(phd > PH_LAMBDA, F.col("day")))
        .cast("bigint")
        .alias("alarm_day"),
        F.max(phd > PH_LAMBDA).alias("drift_detected"),
    )
