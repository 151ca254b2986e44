"""SSE serving layer — the reference's HTTP surface (service.go) rebuilt
outside Spark, fed by Structured Streaming via foreachBatch.

Parity map:
- route registry / multiplexing ......... service.go:74, 92-128 (E2)
- /health ................................ service.go:88-90 (E3)
- ?since= parse (RFC3339 | duration) ..... service.go:226-242 (Q1)
- SSE headers + ":ok" preamble ........... service.go:244-252 (E1)
- default cursor = latest offset ......... service.go:253-258 (Q3)
- since → nearest offset ................. service.go:260-265 (Q2,
  timestamp2offset.go:58-80 — same B-tree seek semantics, here a
  bisect over the retained (ts, offset) keys)
- replay + blocking live tail ............ service.go:267-282 (Q4)
- bounded retention (capacity) ........... service.go:97-101 (W3)
- direct-write test seam ................. service.go:34-35 (disableKCL)

Design stance: SSE fan-out is a driver-side edge concern — Spark owns
ingest/transform (executors, any scale), foreachBatch delivers each
micro-batch's cleaned rows to the in-process route log, and each HTTP
client gets a cursor + condition-variable tail, exactly one thread per
connection like the reference's goroutine-per-client.
"""

from __future__ import annotations

import bisect
import json
import threading
from collections import deque
from dataclasses import dataclass, field
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from kinesis2sse_spark.pipeline.since import parse_since

DEFAULT_CAPACITY = 100_000  # service.go:20


class RouteLog:
    """Bounded in-memory append-only log + event-time index for one route
    (≡ memlog.Log + Timestamp2Offset). Offsets are contiguous from 0;
    capacity evicts the oldest entry from both log and index
    (timestamp2offset.go:96-112)."""

    def __init__(self, capacity: int = DEFAULT_CAPACITY, max_age=None) -> None:
        if capacity <= 0:
            raise ValueError("capacity must be positive")  # service.go:94-96
        self.capacity = capacity
        # README.md:45-46 extension: "up to N events no older than M age" —
        # the age bound the reference documents but never implemented
        # (SURVEY.md §1.4); None preserves exact reference semantics.
        self.max_age = max_age
        self._entries: deque[tuple[int, datetime, str]] = deque()
        self._keys: list[tuple[datetime, int]] = []  # sorted (ts, offset)
        self._next_offset = 0
        self._max_ts: datetime | None = None  # running max — O(1) age checks
        self.cond = threading.Condition()

    def append(self, ts: datetime, data: str) -> int:
        """Append one canonical-JSON event; returns its offset (W1)."""
        with self.cond:
            offset = self._next_offset
            self._next_offset += 1
            self._entries.append((offset, ts, data))
            bisect.insort(self._keys, (ts, offset))
            if self._max_ts is None or ts > self._max_ts:
                self._max_ts = ts
            if len(self._entries) > self.capacity:
                old_off, old_ts, _ = self._entries.popleft()
                del self._keys[bisect.bisect_left(self._keys, (old_ts, old_off))]
            if self.max_age is not None:
                horizon = self._max_ts - self.max_age
                while self._entries and self._entries[0][1] < horizon:
                    old_off, old_ts, _ = self._entries.popleft()
                    del self._keys[bisect.bisect_left(self._keys, (old_ts, old_off))]
            self.cond.notify_all()
            return offset

    def skip(self, n: int) -> None:
        """Advance the offset counter by ``n`` without storing entries —
        used when a micro-batch larger than capacity is trimmed before
        reaching the driver: the dropped (oldest) rows still consume
        offsets, exactly as if they had been appended and immediately
        evicted, so ``next_offset`` parity with the reference holds."""
        if n < 0:
            raise ValueError("skip must be non-negative")
        with self.cond:
            self._next_offset += n

    def nearest_offset(self, since: datetime):
        """Q2: offset of the smallest (ts, offset) >= (since, 0); fallback
        largest (ts, offset) < (since, 0); None if empty."""
        with self.cond:
            if not self._keys:
                return None
            i = bisect.bisect_left(self._keys, (since, 0))
            if i < len(self._keys):
                return self._keys[i][1]
            return self._keys[-1][1]

    def latest_offset(self) -> int:
        """Q3: newest retained offset, floor 0 (service.go:253-258)."""
        with self.cond:
            return max(self._next_offset - 1, 0)

    def next_offset(self) -> int:
        """Offset the next append will receive."""
        with self.cond:
            return self._next_offset

    def _tail_from(self, offset: int):
        """Retained entries with offset >= requested, in offset order.
        Offsets are contiguous (eviction is left-only), so this seeks by
        index and copies only the O(result) tail — islice avoids
        materializing the whole deque. Caller holds the lock."""
        import itertools

        if not self._entries:
            return []
        first = self._entries[0][0]
        start = max(offset - first, 0)
        return [(o, d) for o, _, d in itertools.islice(self._entries, start, None)]

    def read_from(self, offset: int):
        """Snapshot of retained entries with offset >= requested, in offset
        order (replay half of Q4)."""
        with self.cond:
            return self._tail_from(offset)

    def wait_beyond(self, offset: int, timeout: float):
        """Block until an entry with offset >= requested exists (tail half
        of Q4); returns new entries or [] on timeout."""
        with self.cond:
            self.cond.wait_for(
                lambda: self._next_offset > offset, timeout=timeout
            )
            return self._tail_from(offset)


@dataclass
class RouteOptions:
    pattern: str
    capacity: int = DEFAULT_CAPACITY
    max_age: object = None  # optional timedelta — README age-bound extension


@dataclass
class SseService:
    """Multi-route SSE server (E2). Each route owns an independent
    RouteLog; Spark streaming queries attach via ``attach_query``; tests
    write logs directly (the disableKCL seam)."""

    routes: list[RouteOptions]
    port: int = 0  # 0 → ephemeral (reference: -1 → random, service.go:67-72)
    _logs: dict[str, RouteLog] = field(default_factory=dict)
    _server: ThreadingHTTPServer | None = None
    _thread: threading.Thread | None = None
    _queries: list = field(default_factory=list)
    recorder: object | None = None  # ProgressRecorder (streaming/metrics.py)

    def __post_init__(self) -> None:
        for r in self.routes:
            self._logs[r.pattern.rstrip("/") or "/"] = RouteLog(r.capacity, r.max_age)

    def log(self, pattern: str) -> RouteLog:
        return self._logs[pattern.rstrip("/") or "/"]

    # -- Spark integration ------------------------------------------------
    def attach_query(
        self,
        pattern: str,
        stream_df,
        ts_col: str = "time",
        data_col: str = "detail",
        order_col: str | list[str] | None = None,
        query_name: str | None = None,
        checkpoint_location: str | None = None,
    ):
        """Bridge a streaming DataFrame into a route log: every micro-batch
        is sorted (per-batch total order ≡ the reference's mutex order) and
        appended on the driver. Returns the StreamingQuery.

        checkpoint_location=None matches the reference's deliberately
        non-durable checkpointing (service.go:113-116) — restart replays
        from the source's starting position; pass a path for Spark's
        durable exactly-once checkpoint (C1, strictly stronger).

        Batches are ordered by (ts_col, data_col) by default — the data
        column breaks equal-timestamp ties so offsets are deterministic
        across runs/restarts (the reference gets a stable order for free
        from its per-route mutex). A batch larger than the route's
        capacity is trimmed executor-side to the newest ``capacity``
        rows before ``collect()`` — a TRIM_HORIZON start over a year of
        history must never materialize the year on the driver — and the
        trimmed rows still advance the offset counter (append + instant
        eviction ≡ skip)."""
        log = self.log(pattern)
        if order_col is None:
            order_cols = [ts_col] + ([data_col] if data_col != ts_col else [])
        elif isinstance(order_col, str):
            order_cols = [order_col]
        else:
            order_cols = list(order_col)

        def push(batch_df, epoch_id: int) -> None:
            from pyspark.sql import functions as F

            cap = log.capacity
            # The batch feeds TWO actions (count, then the ordered
            # collect); without a persist each action re-executes the
            # batch plan from the source — measured 3x source-read
            # amplification per micro-batch via the ProgressRecorder
            # (parse + both actions), which at 100 TB triples the
            # ingest scan. Cache once, release before returning.
            batch_df.persist()
            n_total = batch_df.count()
            if n_total > cap:
                # newest `cap` rows via executor-side top-k (WindowGroupLimit
                # prunes map-side); the count pass is far cheaper than
                # collecting an unbounded batch.
                rows = (
                    batch_df.orderBy(*[F.desc(c) for c in order_cols])
                    .limit(cap)
                    .collect()
                )
                rows.reverse()
                log.skip(n_total - cap)
            else:
                rows = batch_df.orderBy(*order_cols).collect()
            batch_df.unpersist()
            for row in rows:
                log.append(row[ts_col], row[data_col])

        writer = stream_df.writeStream.foreachBatch(push).queryName(
            query_name or f"sse_{pattern.strip('/') or 'root'}"
        )
        if checkpoint_location:
            writer = writer.option("checkpointLocation", checkpoint_location)
        q = writer.start()
        self._queries.append(q)
        return q

    # -- HTTP -------------------------------------------------------------
    def start(self) -> None:
        service = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"
            daemon_threads = True
            # per-frame flush latency: Go's net/http sets TCP_NODELAY on
            # accepted conns (the reference relies on it for sub-ms pushes,
            # service.go:273-277); python's http.server leaves Nagle on,
            # which adds ~20-40ms per small flushed frame
            disable_nagle_algorithm = True

            def log_message(self, *args) -> None:  # quiet
                pass

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                url = urlparse(self.path)
                path = url.path.rstrip("/") or "/"
                if path == "/health":  # E3
                    self.send_response(200)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                if path == "/metrics" and service.recorder is not None:
                    # extension beyond the reference's bare /health: the
                    # ProgressRecorder's per-query totals as JSON, the
                    # HTTP face of the rows-in==rows-served audit
                    per_q: dict[str, dict] = {}
                    with service.recorder._lock:
                        for b in service.recorder._rows:
                            agg = per_q.setdefault(
                                b.query_name,
                                {
                                    "batches": 0,
                                    "rows": 0,
                                    "dropped_by_watermark": 0,
                                },
                            )
                            agg["batches"] += 1
                            agg["rows"] += b.num_input_rows
                            # late-data visibility (r11 verdict item 6):
                            # Spark drops late rows where the reference
                            # stores disorder — surface the drop count
                            agg["dropped_by_watermark"] += (
                                b.dropped_by_watermark
                            )
                    body = json.dumps(per_q).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                log = service._logs.get(path)
                if log is None:
                    self.send_response(404)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                params = parse_qs(url.query)
                since = None
                if "since" in params:
                    try:  # Q1: RFC3339, else duration, else 400
                        since = parse_since(params["since"][0])
                        if since.tzinfo is not None:
                            since = since.astimezone(timezone.utc).replace(tzinfo=None)
                    except ValueError:
                        self.send_response(400)
                        self.send_header("Content-Length", "0")
                        self.end_headers()
                        return

                # E1: SSE headers + :ok preamble (service.go:244-252)
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Connection", "keep-alive")
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                try:
                    self.wfile.write(b":ok\n\n")
                    self.wfile.flush()
                except (BrokenPipeError, ConnectionError):
                    return

                # Q2/Q3: resolve the start offset. Precedence: Last-Event-ID
                # (SSE reconnect, the README.md:47 extension the reference
                # never implemented) > since > latest.
                offset = log.latest_offset()
                if since is not None:
                    resolved = log.nearest_offset(since)
                    if resolved is not None:
                        offset = resolved
                last_id = self.headers.get("Last-Event-ID")
                if last_id is not None:
                    try:
                        # clamp to the log head: a stale id from a prior
                        # (non-durable) incarnation must not stall the
                        # stream waiting for offsets that may never come
                        offset = min(int(last_id) + 1, log.next_offset())
                    except ValueError:
                        pass

                # Q4: replay retained history, then tail until disconnect
                try:
                    while True:
                        entries = log.read_from(offset)
                        if not entries:
                            entries = log.wait_beyond(offset, timeout=0.5)
                        for o, data in entries:
                            self.wfile.write(f"id: {o}\ndata: {data}\n\n".encode())
                            offset = o + 1
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionError, OSError):
                    return  # client went away — same exit as service.go:273-276

        class Server(ThreadingHTTPServer):
            daemon_threads = True
            # socketserver's default listen backlog is 5 — a thundering
            # herd of clients (dozens of dashboards reconnecting after a
            # deploy) overflows the accept queue and times out
            # connections the server never saw. Raise it to the
            # conventional server value; the reference's Go net.Listen
            # gets the OS default (usually 128+) for free.
            request_queue_size = 128

        self._server = Server(("127.0.0.1", self.port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()

    @property
    def addr(self) -> str:
        assert self._server is not None, "service not started"
        host, port = self._server.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        for q in self._queries:
            try:
                q.stop()
            except Exception:
                pass
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


def envelope_json_rows(rows: list[dict]) -> list[str]:
    """Test helper: serialize event-envelope dicts to the wire format the
    reference consumes from Kinesis ({"time": ..., "detail": ...})."""
    return [json.dumps(r) for r in rows]
