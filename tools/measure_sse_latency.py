#!/usr/bin/env python
"""Measure SSE serving latency at two layers:

1. serving-layer tail latency — RouteLog.append() → connected client
   receives the `data:` frame (pure serve path, no Spark); reference
   equivalent: memlog write → per-client goroutine fmt.Fprintf
   (service.go:267-282).
2. end-to-end micro-batch latency — file lands in the stream source dir
   → Structured Streaming micro-batch → parse_envelope → foreachBatch →
   client frame. This includes Spark's trigger/scheduling floor, the
   cost the reference's per-record path doesn't pay (SURVEY.md §7 "SSE
   latency" watch item).

Prints one JSON line per layer with p50/p95/max seconds.
"""

from __future__ import annotations

import http.client
import json
import os
import sys
import threading
import time
from datetime import datetime
from urllib.parse import urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pctl(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p * len(xs)))]


def tail_frames(addr: str, path: str, on_frame, stop_evt: threading.Event) -> None:
    u = urlparse(addr)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=60)
    conn.request("GET", path)
    resp = conn.getresponse()
    while not stop_evt.is_set():
        line = resp.fp.readline()
        if not line:
            break
        line = line.decode().rstrip("\n")
        if line.startswith("data: "):
            on_frame(line[len("data: "):], time.perf_counter())
    conn.close()


def measure_serving_layer(n_events: int = 2000) -> dict:
    from kinesis2sse_spark.streaming.serve import RouteOptions, SseService

    svc = SseService(routes=[RouteOptions("/bench", capacity=n_events + 10)])
    svc.start()
    lat: list[float] = []
    done = threading.Event()
    stop = threading.Event()

    def on_frame(payload: str, t_recv: float) -> None:
        t_sent = json.loads(payload)["t"]
        lat.append(t_recv - t_sent)
        if len(lat) >= n_events:
            done.set()

    try:
        log = svc.log("/bench")
        log.append(datetime(2024, 1, 1), '{"seed":0}')
        seen_seed = threading.Event()

        def on_frame_with_seed(payload: str, t_recv: float) -> None:
            if "seed" in payload:
                seen_seed.set()
                return
            on_frame(payload, t_recv)

        t = threading.Thread(
            target=tail_frames,
            args=(svc.addr, "/bench?since=1970-01-01T00:00:00Z", on_frame_with_seed, stop),
            daemon=True,
        )
        t.start()
        assert seen_seed.wait(10), "client never connected"
        ts = datetime(2024, 1, 2)
        # paced appends → per-frame latency (append must not outrun the
        # client, else we measure queueing); then a burst → drain throughput
        for _ in range(n_events):
            log.append(ts, json.dumps({"t": time.perf_counter()}))
            time.sleep(0.001)
        assert done.wait(30), f"only {len(lat)}/{n_events} frames received"
        orig_len = len(lat)
        t0 = time.perf_counter()
        for _ in range(n_events):
            log.append(ts, json.dumps({"t": 0.0}))
        while len(lat) < orig_len + n_events and time.perf_counter() - t0 < 30:
            time.sleep(0.01)
        throughput = (len(lat) - orig_len) / (time.perf_counter() - t0)
    finally:
        stop.set()
        svc.stop()
    paced = lat[:orig_len]
    return {
        "metric": "sse_tail_latency",
        "events": len(paced),
        "p50_s": round(pctl(paced, 0.50), 6),
        "p95_s": round(pctl(paced, 0.95), 6),
        "max_s": round(max(paced), 6),
        "drain_events_per_s": round(throughput),
    }


def measure_end_to_end(n_batches: int = 10) -> dict:
    from kinesis2sse_spark.pipeline.envelope import parse_envelope
    from kinesis2sse_spark.session import build_session
    from kinesis2sse_spark.streaming.serve import RouteOptions, SseService
    from kinesis2sse_spark.streaming.source import staged_batch_dir

    spark = build_session(app_name="sse_latency", shuffle_partitions=4)
    d = staged_batch_dir("sse_latency")
    svc = SseService(routes=[RouteOptions("/e2e")])
    svc.start()
    lat: list[float] = []
    got = threading.Event()
    stop = threading.Event()

    def on_frame(payload: str, t_recv: float) -> None:
        t_drop = json.loads(payload)["t"]
        lat.append(t_recv - t_drop)
        got.set()

    try:
        stream = spark.readStream.schema("value string").option(
            "maxFilesPerTrigger", "1"
        ).parquet(os.path.join(d, "*"))
        parsed = parse_envelope(stream)
        q = svc.attach_query("/e2e", parsed, ts_col="time", data_col="detail")
        t = threading.Thread(
            target=tail_frames,
            args=(svc.addr, "/e2e?since=1970-01-01T00:00:00Z", on_frame, stop),
            daemon=True,
        )
        t.start()
        time.sleep(1.0)  # client connected before first drop
        import pyarrow as pa
        import pyarrow.parquet as pq

        for i in range(n_batches):
            got.clear()
            # write the landing file with pyarrow, not a Spark job, so the
            # clock starts when the file exists — not when a driver-side
            # write job finishes
            t_drop = time.perf_counter()
            raw = json.dumps(
                {
                    "time": "1970-01-01T00:00:%06.3fZ" % (i / 1000.0,),
                    "detail": {"t": t_drop, "i": i},
                }
            )
            os.makedirs(os.path.join(d, f"b{i}"), exist_ok=True)
            pq.write_table(
                pa.table({"value": [raw]}),
                os.path.join(d, f"b{i}", "part-0.parquet"),
            )
            assert got.wait(60), f"batch {i} frame never arrived"
        q.stop()
    finally:
        stop.set()
        svc.stop()
    # first batch pays stream-start + codegen; report steady state too
    return {
        "metric": "sse_end_to_end_latency",
        "batches": len(lat),
        "first_s": round(lat[0], 3),
        "steady_p50_s": round(pctl(lat[1:], 0.50), 3),
        "steady_max_s": round(max(lat[1:]), 3),
    }


def main() -> None:
    print(json.dumps(measure_serving_layer()))
    print(json.dumps(measure_end_to_end()))


if __name__ == "__main__":
    main()
