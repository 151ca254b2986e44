"""End-to-end SSE serving tests — mirrors the reference's service_test.go:
real HTTP server on an ephemeral port, real SSE client, direct log writes
(the disableKCL seam), plus a full Spark-streaming-fed route."""

from __future__ import annotations

import http.client
import json
import os
import time
from datetime import datetime
from urllib.parse import urlparse

import pytest

from kinesis2sse_spark.streaming.serve import RouteLog, RouteOptions, SseService

EPOCH = datetime(1970, 1, 1)


def read_sse(addr: str, path: str, n_events: int, timeout: float = 10.0,
             headers: dict | None = None):
    """Minimal SSE client: returns (status, headers, first n data payloads)."""
    u = urlparse(addr)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=timeout)
    conn.request("GET", path, headers=headers or {})
    resp = conn.getresponse()
    events: list[str] = []
    if resp.status == 200 and n_events > 0:
        deadline = time.time() + timeout
        while len(events) < n_events and time.time() < deadline:
            line = resp.fp.readline()
            if not line:
                break
            line = line.decode().rstrip("\n")
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    headers = dict(resp.getheaders())
    conn.close()
    return resp.status, headers, events


@pytest.fixture()
def service():
    svc = SseService(routes=[RouteOptions("/", capacity=100)])
    svc.start()
    yield svc
    svc.stop()


def test_single_route_replay(service):
    """service_test.go:69-87: two events at ts=0, since=epoch replays both
    in offset order, preceded by the :ok preamble."""
    log = service.log("/")
    log.append(EPOCH, '{"hello":"world"}')
    log.append(EPOCH, '{"goodbye":"world"}')
    status, headers, events = read_sse(
        service.addr, "/?since=1970-01-01T00:00:00.000Z", 2
    )
    assert status == 200
    assert headers["Content-Type"] == "text/event-stream"
    assert headers["Access-Control-Allow-Origin"] == "*"
    assert events == ['{"hello":"world"}', '{"goodbye":"world"}']


def test_two_route_isolation():
    """service_test.go:94-181: each route's client sees only its events."""
    svc = SseService(routes=[RouteOptions("/foo"), RouteOptions("/bar")])
    svc.start()
    try:
        svc.log("/foo").append(EPOCH, '{"foo":true}')
        svc.log("/bar").append(EPOCH, '{"bar":false}')
        _, _, foo = read_sse(svc.addr, "/foo?since=1970-01-01T00:00:00.000Z", 1)
        _, _, bar = read_sse(svc.addr, "/bar?since=1970-01-01T00:00:00.000Z", 1)
        assert foo == ['{"foo":true}']
        assert bar == ['{"bar":false}']
    finally:
        svc.stop()


def test_default_cursor_is_latest(service):
    """Q3 (service.go:253-258): no since → start at the latest offset,
    inclusive — the newest retained record is re-delivered."""
    log = service.log("/")
    for i in range(3):
        log.append(datetime(2024, 1, 1, i), json.dumps({"i": i}))
    _, _, events = read_sse(service.addr, "/", 1)
    assert events == ['{"i": 2}']


def test_since_mid_stream(service):
    """Q2: since between event times starts at the first (ts, offset) >= since."""
    log = service.log("/")
    log.append(datetime(2024, 1, 1, 0), '{"e":0}')
    log.append(datetime(2024, 1, 1, 2), '{"e":1}')
    _, _, events = read_sse(service.addr, "/?since=2024-01-01T01:00:00Z", 1)
    assert events == ['{"e":1}']


def test_since_relative_duration(service):
    """Q1 intended semantics (SURVEY.md §2.2): '1h' = now - 1h; events newer
    than that are replayed."""
    log = service.log("/")
    log.append(datetime.utcnow(), '{"fresh":1}')
    _, _, events = read_sse(service.addr, "/?since=1h", 1)
    assert events == ['{"fresh":1}']


def test_bad_since_400(service):
    status, _, _ = read_sse(service.addr, "/?since=bogus", 0)
    assert status == 400


def test_unknown_route_404(service):
    status, _, _ = read_sse(service.addr, "/nope", 0)
    assert status == 404


def test_health(service):
    status, _, _ = read_sse(service.addr, "/health", 0)
    assert status == 200


def test_capacity_eviction():
    """W3: capacity bounds the log; replay from epoch returns only the
    retained suffix."""
    svc = SseService(routes=[RouteOptions("/", capacity=2)])
    svc.start()
    try:
        log = svc.log("/")
        for i in range(5):
            log.append(datetime(2024, 1, 1, i), json.dumps({"i": i}))
        _, _, events = read_sse(svc.addr, "/?since=1970-01-01T00:00:00Z", 2)
        assert events == ['{"i": 3}', '{"i": 4}']
    finally:
        svc.stop()


def test_last_event_id_resume(service):
    """SSE reconnect extension (README.md:47, unimplemented in the
    reference): Last-Event-ID resumes delivery at the NEXT offset."""
    log = service.log("/")
    for i in range(4):
        log.append(datetime(2024, 1, 1, i), json.dumps({"i": i}))
    _, _, events = read_sse(service.addr, "/", 2, headers={"Last-Event-ID": "1"})
    assert events == ['{"i": 2}', '{"i": 3}']


def test_stale_last_event_id_does_not_stall(service):
    """A Last-Event-ID beyond the log head (e.g. from before a restart of
    this non-durable service) is clamped — the client still receives the
    next appended events instead of waiting forever."""
    import threading

    log = service.log("/")
    log.append(datetime(2024, 1, 1), '{"pre":1}')
    results = {}

    def client():
        results["events"] = read_sse(
            service.addr, "/", 1, timeout=8, headers={"Last-Event-ID": "5000"}
        )[2]

    t = threading.Thread(target=client)
    t.start()
    time.sleep(0.8)
    log.append(datetime(2024, 1, 2), '{"post":1}')
    t.join(timeout=10)
    assert results["events"] == ['{"post":1}']


def test_age_based_eviction():
    """README.md:45-46 extension: entries older than max_age relative to
    the newest event time are evicted."""
    from datetime import timedelta

    svc = SseService(routes=[RouteOptions("/", capacity=100, max_age=timedelta(hours=2))])
    svc.start()
    try:
        log = svc.log("/")
        log.append(datetime(2024, 1, 1, 0), '{"old":1}')
        log.append(datetime(2024, 1, 1, 1), '{"mid":1}')
        log.append(datetime(2024, 1, 1, 5), '{"new":1}')  # evicts both older
        _, _, events = read_sse(svc.addr, "/?since=1970-01-01T00:00:00Z", 1)
        assert events == ['{"new":1}']
        assert len(log.read_from(0)) == 1
    finally:
        svc.stop()


def test_live_tail(service):
    """Q4 tail half: a connected client receives events appended later."""
    import threading

    log = service.log("/")
    log.append(datetime(2024, 1, 1), '{"first":1}')
    results = {}

    def client():
        results["events"] = read_sse(
            service.addr, "/?since=1970-01-01T00:00:00Z", 2, timeout=8
        )[2]

    t = threading.Thread(target=client)
    t.start()
    time.sleep(0.8)  # client connected, replaying
    log.append(datetime(2024, 1, 2), '{"second":2}')
    t.join(timeout=10)
    assert results["events"] == ['{"first":1}', '{"second":2}']


def test_many_concurrent_clients(service):
    """Fan-out: N concurrent tailing clients each receive every event in
    offset order (per-client cursors over the shared log, reference
    service.go:267 — N readers, zero copies of history)."""
    import threading

    log = service.log("/")
    log.append(datetime(2024, 1, 1), '{"seed":0}')
    n_clients, n_live = 12, 5
    results = [None] * n_clients

    def client(i):
        results[i] = read_sse(
            service.addr, "/?since=1970-01-01T00:00:00Z", 1 + n_live, timeout=15
        )[2]

    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_clients)]
    for t in threads:
        t.start()
    time.sleep(1.0)
    for k in range(n_live):
        log.append(datetime(2024, 1, 2, k), json.dumps({"live": k}))
        time.sleep(0.05)
    for t in threads:
        t.join(timeout=20)
    expected = ['{"seed":0}'] + [json.dumps({"live": k}) for k in range(n_live)]
    for i, got in enumerate(results):
        assert got == expected, f"client {i}: {got}"


def test_spark_fed_route(spark):
    """Full pipeline: raw JSON envelopes → file stream → parse_envelope
    (S4/F1-F3/P1/P2) → foreachBatch → SSE client sees canonical detail
    payloads in offset order — the reference's whole dataflow on Spark."""
    from kinesis2sse_spark.pipeline.envelope import parse_envelope
    from kinesis2sse_spark.streaming.source import staged_batch_dir

    d = staged_batch_dir("sse_feed")
    raw = [
        "bogus",
        '{"detail":{}}',
        '{"time":"1970-01-01T00:00:00.000Z","detail":{"good":true,"event":1}}',
        '{"time":"1970-01-01T00:00:00.001Z","detail":{"good":true,"event":2}}',
    ]
    spark.createDataFrame([(v,) for v in raw], "value string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "b0"))

    svc = SseService(routes=[RouteOptions("/events")])
    svc.start()
    try:
        stream = spark.readStream.schema("value string").parquet(os.path.join(d, "*"))
        parsed = parse_envelope(stream)
        q = svc.attach_query("/events", parsed, ts_col="time", data_col="detail")
        q.processAllAvailable()
        _, _, events = read_sse(svc.addr, "/events?since=1970-01-01T00:00:00.000Z", 2)
        # canonical key-sorted JSON, malformed records dropped
        assert events == ['{"event":1,"good":true}', '{"event":2,"good":true}']
        q.stop()
    finally:
        svc.stop()


def test_oversized_batch_trimmed_before_driver(spark, tmp_path):
    """A first micro-batch larger than route capacity must reach the
    driver already trimmed to the newest `capacity` rows — yet the
    offset counter advances as if every row had been appended and
    evicted (reference: TRIM_HORIZON over deep history, service.go
    capacity semantics)."""
    n, cap = 50, 5
    rows = [(datetime(2024, 1, 1, 0, 0, i % 60, i), json.dumps({"i": i})) for i in range(n)]
    src = str(tmp_path / "batch")
    spark.createDataFrame(rows, "time timestamp, detail string").coalesce(2).write.parquet(src)

    svc = SseService(routes=[RouteOptions("/e", capacity=cap)])
    svc.start()
    try:
        stream = spark.readStream.schema("time timestamp, detail string").parquet(src)
        q = svc.attach_query("/e", stream, ts_col="time", data_col="detail")
        q.processAllAvailable()
        q.stop()
        log = svc.log("/e")
        assert log.next_offset() == n, "trimmed rows must still consume offsets"
        entries = log.read_from(0)
        assert [o for o, _ in entries] == list(range(n - cap, n))
        assert [json.loads(d)["i"] for _, d in entries] == list(range(n - cap, n))
    finally:
        svc.stop()


def test_equal_timestamp_ties_deterministic(spark, tmp_path):
    """Rows with identical event time get offsets in data-column order —
    deterministic across runs (the reference's mutex order is stable;
    a ts-only sort is not)."""
    ts = datetime(2024, 1, 1)
    rows = [(ts, f"payload-{c}") for c in "dbca"]
    src = str(tmp_path / "ties")
    spark.createDataFrame(rows, "time timestamp, detail string").coalesce(4).write.parquet(src)

    svc = SseService(routes=[RouteOptions("/t", capacity=100)])
    svc.start()
    try:
        stream = spark.readStream.schema("time timestamp, detail string").parquet(src)
        q = svc.attach_query("/t", stream, ts_col="time", data_col="detail")
        q.processAllAvailable()
        q.stop()
        assert [d for _, d in svc.log("/t").read_from(0)] == [
            "payload-a", "payload-b", "payload-c", "payload-d"
        ]
    finally:
        svc.stop()
