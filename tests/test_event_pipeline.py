"""Event-pipeline queries vs the DuckDB oracle + the reference's golden
envelope fixtures (FIXTURES.md §A.1) and as-of vectors (§A.2)."""

from __future__ import annotations

import pytest

# oracle comparisons for pipeline queries live in test_oracle_all.py

# --- golden envelope fixtures: record_processor_test.go:15-20, 58-84 ---

ENVELOPE_BATCH = [
    ("bogus",),  # unparseable → drop
    ('{"detail":{}}',),  # missing time → drop
    ('{"time":"1970-01-01T00:00:00.000Z"}',),  # missing detail → drop
    ('{"time":"1970-01-01T00:00:00.000Z","detail":{"good":true,"event":1}}',),
    ('{"time":"1970-01-01T00:00:00.001Z","detail":{"good":true,"event":2}}',),
]


def test_parse_envelope_golden(spark):
    from kinesis2sse_spark.pipeline.envelope import parse_envelope, with_offsets

    df = spark.createDataFrame(ENVELOPE_BATCH, ["value"])
    out = with_offsets(parse_envelope(df), ["time"]).orderBy("offset").collect()
    assert len(out) == 2
    # canonical bytes: keys alphabetically sorted, compact (golden from
    # record_processor_test.go:60-66)
    assert out[0]["detail"] == '{"event":1,"good":true}'
    assert out[1]["detail"] == '{"event":2,"good":true}'
    assert [r["offset"] for r in out] == [0, 1]
    assert out[0]["time"].isoformat().startswith("1970-01-01T00:00:00")


def test_parse_envelope_bad_time(spark):
    from kinesis2sse_spark.pipeline.envelope import parse_envelope

    df = spark.createDataFrame(
        [
            ('{"time":"not-a-time","detail":{}}',),
            # non-string time: the reference's F1 type assertion drops it
            # (get_json_object stringifies 42 → loose cast would accept
            # it as year 42)
            ('{"time":42,"detail":{}}',),
            ('{"time":1234,"detail":{}}',),
            # not RFC3339 (date-only / missing offset): F2 drops
            ('{"time":"2024-01-02","detail":{}}',),
            ('{"time":"2024-01-02 10:00:00","detail":{}}',),
        ],
        ["value"],
    )
    assert parse_envelope(df).count() == 0


def test_parse_envelope_rfc3339_offsets(spark):
    from kinesis2sse_spark.pipeline.envelope import parse_envelope

    df = spark.createDataFrame(
        [
            ('{"time":"2024-01-02T10:00:00Z","detail":1}',),
            ('{"time":"2024-01-02T10:00:00+02:00","detail":2}',),
            ('{"time":"2024-01-02T10:00:00.123456Z","detail":3}',),
        ],
        ["value"],
    )
    out = parse_envelope(df).orderBy("detail").collect()
    assert [r["detail"] for r in out] == ["1", "2", "3"]
    # +02:00 is normalized to UTC (session timezone)
    assert out[1]["time"].hour == 8


# --- as-of vectors: timestamp2offset_test.go:10-92 (FIXTURES.md §A.2) ---


def _probe(spark, rows, probe_ms):
    from kinesis2sse_spark.pipeline.asof import nearest_offset
    from pyspark.sql import functions as F

    if not rows:
        df = spark.createDataFrame([], "offset long, ts timestamp")
    else:
        df = spark.createDataFrame(
            [(o, ms / 1000.0) for o, ms in rows], "offset long, ts_s double"
        ).select("offset", F.timestamp_seconds("ts_s").alias("ts"))
    since = F.timestamp_seconds(F.lit(probe_ms / 1000.0))
    row = nearest_offset(df, since, ts_col="ts", offset_col="offset").collect()[0]
    return row["off"]


ASOF_VECTORS = [
    ([], 0, None),
    ([(0, 100)], 0, 0),
    ([(0, 100)], 100, 0),
    ([(0, 100)], 1000, 0),
    ([(0, 100), (1, 500)], 0, 0),
    ([(0, 100), (1, 500)], 100, 0),
    ([(0, 100), (1, 500)], 250, 1),
    ([(0, 100), (1, 500)], 500, 1),
    ([(0, 100), (1, 500)], 1000, 1),
    # capacity-2 eviction + out-of-order timestamps: state [1→500, 2→250]
    ([(1, 500), (2, 250)], 0, 2),
    ([(1, 500), (2, 250)], 100, 2),
    ([(1, 500), (2, 250)], 250, 2),
    ([(1, 500), (2, 250)], 300, 1),
    ([(1, 500), (2, 250)], 500, 1),
    ([(1, 500), (2, 250)], 1000, 1),
]


@pytest.mark.parametrize("rows,probe,expected", ASOF_VECTORS)
def test_nearest_offset_vectors(spark, rows, probe, expected):
    assert _probe(spark, rows, probe) == expected


# --- since parsing: service.go:226-242 + intended CLI semantics (§2.2) ---


def test_parse_since():
    from datetime import datetime, timedelta, timezone

    from kinesis2sse_spark.pipeline.since import parse_since

    t = parse_since("1970-01-01T00:00:00.000Z")
    assert t == datetime(1970, 1, 1, tzinfo=timezone.utc)
    now = datetime(2024, 1, 2, tzinfo=timezone.utc)
    assert parse_since("1h", now=now) == now - timedelta(hours=1)
    assert parse_since("1h30m", now=now) == now - timedelta(hours=1, minutes=30)
    assert parse_since("300ms", now=now) == now - timedelta(milliseconds=300)
    # Go-grammar corners time.ParseDuration accepts
    assert parse_since("0", now=now) == now
    assert parse_since(".5s", now=now) == now - timedelta(milliseconds=500)
    assert parse_since("1.s", now=now) == now - timedelta(seconds=1)
    assert parse_since("1μs", now=now) == now - timedelta(microseconds=1)
    with pytest.raises(ValueError):
        parse_since("bogus")
    # Go's RFC3339 parse is strict — shapes fromisoformat would accept
    # but the reference 400s must reject here too
    for loose in ("2024-01-01", "2024-01-01 00:00:00Z", "2024-01-01T00:00:00"):
        with pytest.raises(ValueError):
            parse_since(loose)


def test_parse_envelope_null_detail_kept(spark):
    """{"detail": null} is a PRESENT detail in the reference (Go map
    lookup succeeds; json.Marshal(nil) stores "null") — only a missing
    detail key drops (record_processor.go:78-84)."""
    from kinesis2sse_spark.pipeline.envelope import parse_envelope

    df = spark.createDataFrame(
        [
            ('{"time":"2024-01-02T10:00:00Z","detail":null}',),
            ('{"time":"2024-01-02T10:00:00Z"}',),
        ],
        ["value"],
    )
    out = parse_envelope(df).collect()
    assert len(out) == 1
    assert out[0]["detail"] == "null"


def test_parse_envelope_observe_batch(spark):
    """Drop accounting rides the parse scan: Observation reports total and
    dropped counts without a second pass (the scalable stand-in for the
    reference's per-record warn log, record_processor.go:63-81)."""
    from pyspark.sql import Observation

    from kinesis2sse_spark.pipeline.envelope import parse_envelope

    rows = [
        ('{"time":"2024-01-01T00:00:00Z","detail":{"a":1}}',),  # good
        ("not json",),                                          # S4 drop
        ('{"time":"nope","detail":1}',),                        # F2 drop
        ('{"time":"2024-01-01T00:00:00Z"}',),                   # F3 drop
        ('{"time":"2024-01-02T00:00:00Z","detail":null}',),     # kept (null detail)
    ]
    df = spark.createDataFrame(rows, "value string")
    obs = Observation()
    out = parse_envelope(df, observe=obs)
    assert out.count() == 2
    m = obs.get
    assert m["n_records"] == 5
    assert m["n_dropped"] == 3


def test_parse_envelope_observe_streaming(spark):
    """The same metrics surface per micro-batch through
    StreamingQueryProgress.observedMetrics under the given name."""
    from kinesis2sse_spark.pipeline.envelope import parse_envelope
    from kinesis2sse_spark.streaming.source import staged_batch_dir
    import os

    d = staged_batch_dir("observe")
    rows = [
        ('{"time":"2024-01-01T00:00:00Z","detail":{"a":1}}',),
        ("junk",),
    ]
    spark.createDataFrame(rows, "value string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "b0"))
    stream = spark.readStream.schema("value string").parquet(os.path.join(d, "*"))
    q = (
        parse_envelope(stream, observe="ingest")
        .writeStream.format("memory")
        .queryName("t_observe")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        metrics = None
        for p in q.recentProgress:
            if "ingest" in (p.get("observedMetrics") or {}):
                metrics = p["observedMetrics"]["ingest"]
        assert metrics is not None, "no observedMetrics in progress"
        assert metrics["n_records"] == 2
        assert metrics["n_dropped"] == 1
        assert spark.table("t_observe").count() == 1
    finally:
        q.stop()


def test_deaggregate_envelopes_golden(spark):
    """S3: aggregated-record input (one stream record = JSON array of
    envelopes) de-aggregates losslessly into the standard parse path;
    scalars pass through, junk and bad elements drop permissively,
    an empty aggregate yields nothing."""
    from kinesis2sse_spark.pipeline.envelope import (
        deaggregate_envelopes,
        parse_envelope,
        with_offsets,
    )

    batch = [
        # KPL-aggregated: two valid + one invalid element
        ('[{"time":"1970-01-01T00:00:00.000Z","detail":{"event":1}},'
         '{"time":"1970-01-01T00:00:00.001Z","detail":{"event":2}},'
         '{"detail":{"no":"time"}}]',),
        # plain (non-aggregated) envelope passes through unchanged
        ('{"time":"1970-01-01T00:00:00.002Z","detail":{"event":3}}',),
        ("junk",),  # unparseable → drop
        ("[]",),  # empty aggregate → zero records
        ("[1, 2]",),  # array of non-envelopes → elements drop in parse
    ]
    df = spark.createDataFrame(batch, ["value"])
    out = with_offsets(parse_envelope(deaggregate_envelopes(df)), ["time"]).orderBy(
        "offset"
    ).collect()
    assert [r["detail"] for r in out] == [
        '{"event":1}', '{"event":2}', '{"event":3}'
    ]
    assert [r["offset"] for r in out] == [0, 1, 2]


def test_reject_reason_partitions_exactly_like_parse(spark):
    """reject_reason is parse_envelope's acceptance predicate split by
    reason: over every corruption class — including a time that PASSES
    the RFC3339 shape gate but fails to parse (month 13) — a record is
    classified 'valid' IFF parse_envelope keeps it."""
    from pyspark.sql import functions as F

    from kinesis2sse_spark.pipeline.envelope import parse_envelope, reject_reason

    cases = [
        ('{"time":"2024-03-01T00:00:01.000000Z","detail":{"k":1}}', "valid"),
        ('{"time":"2024-03-01T00:00:01Z","detail":null}', "valid"),  # null detail kept
        ('{"time":"2024-03-01T00:00:03.000000Z","detail":{"k":3}', "invalid_json"),
        ("not json at all", "invalid_json"),
        ('{"detail":{"k":4}}', "missing_time"),
        ('{"time":"13:45 on Friday","detail":{"k":5}}', "bad_time"),
        ('{"time":"2024-13-01T00:00:00Z","detail":{"k":6}}', "bad_time"),  # regex OK, parse fails
        ('{"time":"2024-03-01","detail":{"k":7}}', "bad_time"),  # date-only, Go ref rejects
        ('{"time":"2024-03-01T00:00:06.000000Z"}', "missing_detail"),
    ]
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(cases)], "i long, raw string")
    got = {
        r.i: r.reason
        for r in df.select("i", reject_reason("raw").alias("reason")).collect()
    }
    assert got == {i: want for i, (_, want) in enumerate(cases)}

    kept = parse_envelope(df.select(F.col("raw").alias("value")), "value").count()
    assert kept == sum(1 for _, want in cases if want == "valid")
