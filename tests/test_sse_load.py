"""Multi-client SSE fan-out under load — the reference's operational
story is N independent cursors over a shared in-memory log
(service.go:267-282; two-route isolation, service_test.go:94-181).
This drives ~50 concurrent clients across 2 routes with a mixed
replay + tail population and asserts per-route isolation and ZERO
frame loss or reordering for every client. Throughput is printed so a
perf run can record it (PERF.md round 6)."""

from __future__ import annotations

import json
import threading
import time
from datetime import datetime

from kinesis2sse_spark.streaming.serve import RouteOptions, SseService

from tests.test_sse import read_sse

N_HIST = 200   # events preloaded per route (replayed)
N_LIVE = 100   # events appended per route while clients are connected
N_REPLAY = 13  # replay clients per route (since=epoch: history + live)
N_TAIL = 12    # tail clients per route (default cursor: live only)
# 2 routes x (13 + 12) = 50 concurrent connections


def _payload(route: str, kind: str, k: int) -> str:
    # key-sorted compact JSON — what the canonical pipeline emits
    return json.dumps({"k": k, "kind": kind, "route": route}, separators=(",", ":"))


def test_fifty_clients_two_routes_no_frame_loss():
    svc = SseService(
        routes=[RouteOptions("/a", capacity=1000), RouteOptions("/b", capacity=1000)]
    )
    svc.start()
    try:
        for route in ("a", "b"):
            log = svc.log(f"/{route}")
            for k in range(N_HIST):
                log.append(datetime(2024, 1, 1, 0, 0, 0, k), _payload(route, "h", k))

        n_per_route = N_REPLAY + N_TAIL
        results: list[list[str] | None] = [None] * (2 * n_per_route)
        connected = threading.Barrier(2 * n_per_route + 1)

        def client(i: int) -> None:
            route = "a" if i < n_per_route else "b"
            replay = (i % n_per_route) < N_REPLAY
            path = f"/{route}?since=1970-01-01T00:00:00Z" if replay else f"/{route}"
            # default cursor starts at the LATEST offset inclusive
            # (Q3, service.go:253-258): tail clients re-receive the
            # newest retained record, then the live stream
            want = (N_HIST + N_LIVE) if replay else 1 + N_LIVE
            connected.wait(timeout=30)
            # the barrier releases just before the request goes out; the
            # appender waits a beat so default-cursor (tail) clients are
            # registered before the first live append
            results[i] = read_sse(svc.addr, path, want, timeout=60)[2]

        threads = [
            threading.Thread(target=client, args=(i,), daemon=True)
            for i in range(2 * n_per_route)
        ]
        for t in threads:
            t.start()
        connected.wait(timeout=30)
        time.sleep(2.0)

        t0 = time.perf_counter()
        for k in range(N_LIVE):
            for route in ("a", "b"):
                svc.log(f"/{route}").append(
                    datetime(2024, 1, 2, 0, 0, 0, k), _payload(route, "l", k)
                )
        for t in threads:
            t.join(timeout=90)
        elapsed = time.perf_counter() - t0
        assert all(not t.is_alive() for t in threads), "client(s) stalled"

        frames = 0
        for i, got in enumerate(results):
            route = "a" if i < n_per_route else "b"
            replay = (i % n_per_route) < N_REPLAY
            hist = [_payload(route, "h", k) for k in range(N_HIST)]
            live = [_payload(route, "l", k) for k in range(N_LIVE)]
            expected = (hist + live) if replay else [hist[-1]] + live
            # exact equality = no loss, no duplication, no reordering,
            # no cross-route contamination
            assert got == expected, (
                f"client {i} ({route}, {'replay' if replay else 'tail'}): "
                f"{len(got or [])} frames, first mismatch at "
                f"{next((j for j, (x, y) in enumerate(zip(got or [], expected)) if x != y), 'len')}"
            )
            frames += len(expected)
        # frames delivered across all clients once live appends began
        # (replay history is served at connect; the timed window covers
        # the live fan-out: 100 events x 50 clients + replay backlog)
        print(
            f"\nSSE load: {2 * n_per_route} clients, {frames} frames total, "
            f"{elapsed:.2f}s live window, {frames / elapsed:,.0f} frames/s aggregate"
        )
    finally:
        svc.stop()
