"""Event-pipeline queries over the ``events`` table — the reference's own
semantics (SURVEY.md §2.1 operators S4/F1-F3/P1/P2/W1/W3/Q1-Q4) expressed
as oracle-checkable batch queries. ``event_id`` is the log offset
(contiguous from 0, FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table
from kinesis2sse_spark.pipeline.asof import replay_since
from kinesis2sse_spark.registry import register

# Mid-range event-time probe; the events table spans a few days from
# 2024-01-01 at every sf.
SINCE = "2024-01-03 00:00:00"


@register(
    "asof_replay",
    bench=True,
    oracle=f"""
    WITH cand AS (
      SELECT event_id FROM events WHERE ts >= TIMESTAMP '{SINCE}'
      ORDER BY ts, event_id LIMIT 1
    ), fb AS (
      SELECT event_id FROM events WHERE ts < TIMESTAMP '{SINCE}'
      ORDER BY ts DESC, event_id DESC LIMIT 1
    ), resolved AS (
      SELECT coalesce((SELECT event_id FROM cand), (SELECT event_id FROM fb)) AS off
    )
    SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props
    FROM events e, resolved r
    WHERE e.event_id >= r.off
    ORDER BY e.event_id
    """,
)
def asof_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's full serve path as one query — resolve
    ``since`` to the nearest offset (Q2, timestamp2offset.go:58-80), then
    replay in offset order (Q4, service.go:267-282)."""
    events = load_table(spark, sf_dir, "events")
    return replay_since(events, SINCE)


@register(
    "envelope_validate_project",
    oracle="""
    SELECT event_id,
           ts,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE props IS NOT NULL
      AND json_valid(props)
      AND json_extract(props, '$.k') IS NOT NULL
      AND ts IS NOT NULL
    """,
)
def envelope_validate_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+F1-F3+P1 re-expressed over the fixtures: permissive JSON parse of
    ``props`` (≡ detail), validity filters, project the parsed field
    (record_processor.go:60-88)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.select("event_id", "ts", k.alias("k"))
        .filter(F.col("k").isNotNull() & F.col("ts").isNotNull())
    )


@register(
    "offsets_contiguous",
    oracle="""
    SELECT event_id,
           CAST(row_number() OVER (ORDER BY event_id) - 1 AS BIGINT) AS offset
    FROM events
    """,
)
def offsets_contiguous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: contiguous offset assignment (record_processor.go:90-94) —
    row_number over the arrival order; the fixtures' event_id doubles as
    the expected offset so the oracle cross-checks contiguity."""
    from kinesis2sse_spark.pipeline.envelope import with_offsets

    events = load_table(spark, sf_dir, "events").select("event_id")
    return with_offsets(events, ["event_id"]).select(
        "event_id", F.col("offset").cast("bigint").alias("offset")
    )


@register(
    "retention_last_n",
    oracle="""
    SELECT e.event_id, e.ts, e.event_type
    FROM events e, (SELECT max(event_id) AS max_off FROM events) m
    WHERE e.event_id > m.max_off - 500
    """,
)
def retention_last_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: bounded retention — keep the newest 500 records by offset
    (service.go:97-101; predicate-not-eviction per SURVEY.md §7)."""
    from kinesis2sse_spark.pipeline.envelope import retain_last

    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    return retain_last(events, capacity=500)


@register(
    "retention_max_age",
    oracle="""
    SELECT e.event_id, e.ts
    FROM events e, (SELECT max(ts) AS max_ts FROM events) m
    WHERE e.ts >= m.max_ts - INTERVAL 24 HOURS
    """,
)
def retention_max_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Age-based retention — the README.md:45-46 extension ("no older than
    M age") the reference documents but never implemented: keep events
    within 24h of the newest event time. Same shape as retention_last_n:
    a predicate against a one-row broadcast aggregate, so parquet min/max
    stats prune whole files at scale."""
    events = load_table(spark, sf_dir, "events").select("event_id", "ts")
    hi = events.agg(F.max("ts").alias("__max_ts"))
    return (
        events.join(
            F.broadcast(hi),
            F.col("ts") >= F.col("__max_ts") - F.expr("INTERVAL 24 HOURS"),
            "inner",
        )
        .drop("__max_ts")
    )


@register(
    "ingest_envelope_pipeline",
    bench=True,
    oracle="""
    SELECT strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z' AS time_str,
           replace(props, '": ', '":') AS detail
    FROM events
    WHERE props IS NOT NULL AND ts IS NOT NULL
    """,
)
def ingest_envelope_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ENTIRE ingest path as one measurable batch query
    (record_processor.go:52-102): build wire-format envelopes from the
    fixtures, then parse (S4), validate (F1-F3), strip (P1) and
    canonicalize (P2). Benchmarked — this is the per-record hot path a
    Kinesis route would run at scale."""
    from kinesis2sse_spark.catalog import spread
    from kinesis2sse_spark.pipeline.envelope import parse_envelope

    # spread: the parse is the CPU hot spot; a single-file scan would
    # otherwise pin all of it on one core (no-op at real scale where the
    # scan already has >= cores partitions)
    events = spread(load_table(spark, sf_dir, "events"), spark)
    wire = events.select(
        F.concat(
            F.lit('{"time":"'),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
            F.lit('","detail":'),
            F.col("props"),
            F.lit("}"),
        ).alias("value")
    )
    parsed = parse_envelope(wire)
    return parsed.select(
        F.date_format("time", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("time_str"),
        F.col("detail"),
    )


@register(
    "kpl_deaggregate",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z' AS time_str,
           replace(props, '": ', '":') AS detail
    FROM events
    WHERE props IS NOT NULL AND ts IS NOT NULL
    """,
)
def kpl_deaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: KPL de-aggregation — producer-side aggregated records (one
    stream record = JSON array of envelopes, reference
    record_processor.go:104-106) exploded back to user records, then run
    through the standard parse path. Aggregates are built per user_id
    here to exercise multi-envelope records; the oracle checks that
    de-agg + parse is lossless — exactly one output row per valid
    envelope, regardless of how records were batched."""
    from kinesis2sse_spark.pipeline.envelope import deaggregate_envelopes, parse_envelope

    events = load_table(spark, sf_dir, "events")
    env = F.concat(
        F.lit('{"time":"'),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
        F.lit('","detail":'),
        F.col("props"),
        F.lit("}"),
    )
    aggregated = (
        events.select(F.col("user_id"), env.alias("env"))
        .groupBy("user_id")
        .agg(
            F.concat(F.lit("["), F.concat_ws(",", F.collect_list("env")), F.lit("]")).alias(
                "value"
            )
        )
        .select("value")
    )
    parsed = parse_envelope(deaggregate_envelopes(aggregated))
    return parsed.select(
        F.date_format("time", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("time_str"),
        F.col("detail"),
    )


@register(
    "tail_offset",
    oracle="SELECT greatest(max(event_id), 0) AS off FROM events",
)
def tail_offset_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: tail-position query — latest retained offset, floor 0
    (service.go:253-258)."""
    from kinesis2sse_spark.pipeline.asof import tail_offset

    return tail_offset(load_table(spark, sf_dir, "events"))


_REJECT_ORACLE = r"""
    WITH src AS (
      SELECT event_id, ts, props,
             '{"time":"' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z","detail":' || props || '}' AS good
      FROM events
      WHERE props IS NOT NULL AND ts IS NOT NULL AND json_valid(props)
    ), wire AS (
      SELECT event_id,
             CASE event_id % 10
               WHEN 0 THEN substr(good, 1, length(good) - 1)
               WHEN 1 THEN '{"detail":' || props || '}'
               WHEN 2 THEN '{"time":"13:45 on Friday","detail":' || props || '}'
               WHEN 3 THEN '{"time":"' || strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z"}'
               ELSE good
             END AS raw
      FROM src
    ), classified AS (
      SELECT event_id,
             CASE
               WHEN NOT json_valid(raw) THEN 'invalid_json'
               WHEN json_extract_string(raw, '$.time') IS NULL THEN 'missing_time'
               WHEN NOT regexp_matches(json_extract_string(raw, '$.time'),
                 '^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$')
                 THEN 'bad_time'
               WHEN json_extract(raw, '$.detail') IS NULL THEN 'missing_detail'
               ELSE 'valid'
             END AS reason
      FROM wire
    )
    SELECT reason, count(*) AS n, min(event_id) AS first_event_id
    FROM classified GROUP BY reason
"""


@register("ingest_reject_channel", oracle=_REJECT_ORACLE)
def ingest_reject_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter accounting for the ingest path: classify every wire
    record the permissive parse would DROP by its reject reason
    (invalid JSON / missing time / unparseable time / missing detail —
    the reference warn-logs and skips these, record_processor.go:60-88)
    plus the 'valid' passthrough, with counts and the first offending
    id per reason. In production the same classification column routes
    rejects to a quarantine sink (the DLQ) instead of silently
    vanishing — at 100 TB "0.3% of records dropped, all missing_time,
    starting at id X" is the observability difference between a schema
    regression caught in minutes and a silent data hole.

    Corruption is injected deterministically by event_id % 10 so the
    DuckDB oracle can rebuild the identical wire batch and replay the
    identical classification. The classifier reuses parse_envelope's
    exact expressions (one variant parse per record, RFC3339 shape
    gate before try_to_timestamp); one groupBy on a 5-value key is the
    only shuffle."""
    events = load_table(spark, sf_dir, "events").where(
        F.col("props").isNotNull()
        & F.col("ts").isNotNull()
        & F.try_parse_json("props").isNotNull()
    )
    events = events.withColumn(
        "good",
        F.concat(
            F.lit('{"time":"'),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
            F.lit('","detail":'),
            F.col("props"),
            F.lit("}"),
        ),
    )
    wire = events.select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, F.expr(
            "substr(good, 1, length(good) - 1)"
        ))
        .when(F.col("event_id") % 10 == 1, F.concat(F.lit('{"detail":'), F.col("props"), F.lit("}")))
        .when(F.col("event_id") % 10 == 2, F.concat(
            F.lit('{"time":"13:45 on Friday","detail":'), F.col("props"), F.lit("}")
        ))
        .when(F.col("event_id") % 10 == 3, F.concat(
            F.lit('{"time":"'),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"),
            F.lit('"}'),
        ))
        .otherwise(F.col("good"))
        .alias("raw"),
    )
    from kinesis2sse_spark.pipeline.envelope import reject_reason

    classified = wire.select("event_id", reject_reason("raw").alias("reason"))
    return classified.groupBy("reason").agg(
        F.count("*").alias("n"), F.min("event_id").alias("first_event_id")
    )
