"""In-process fake Kinesis connector (PySpark Python Data Source API).

OSS PySpark ships no Kinesis connector jar, so ``kinesis_stream``
(source.py) gates on ``source_format=``. This module provides that
format in-process: a ``DataSourceStreamReader`` over a JSON-lines
"stream" file whose records carry an arrival timestamp — enough to
exercise the ENTIRE seam end-to-end (S1/S2, kinesis2sse.go:110-126):
``kinesis_start_options`` → reader spec → ``format(...).load()`` →
micro-batches, including the three seek modes:

- ``TRIM_HORIZON`` → replay from sequence 0;
- ``LATEST``       → only records appended after the query starts;
- ``AT_TIMESTAMP`` → first record with arrival ts >= the instant
  (broker-side seek — the record filter happens in the SOURCE, not in
  a downstream event-time filter, mirroring the Kafka
  ``startingTimestamp`` fix from round 3).

The output schema mirrors the canonical Kinesis connector surface:
(partitionKey, data, sequenceNumber, approximateArrivalTimestamp).
Records appended to the backing file between micro-batches are picked
up by the next ``latestOffset`` poll, so LATEST-mode liveness is
testable. This is test infrastructure, but it is also the working
example of how a real connector slots into the seam: swap
``source_format="fake_kinesis"`` for the real format name and drop the
``recordsPath`` option.

Resharding (round-8 addition, mirroring KCL shard-sync under shard
split/merge, service.go:134-151): each record may carry a ``shard``
field (default ``"0"``), and the streaming offset is a per-shard
consumed-count map ``{"shards": {shard_id: n}}``. A shard id first
seen in a later ``latestOffset`` poll — a child born from a split or
merge — is absent from the start offset, and ``partitions`` treats the
missing entry as 0: children are consumed from their TRIM_HORIZON,
exactly the KCL rule, so a reshard can never drop records. Closed
parents simply stop growing; their offset entries persist so no
re-delivery occurs. ``test_kinesis_reshard_no_loss`` asserts the
no-gap/no-dup invariant across a split and a merge.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "partitionKey string, data binary, sequenceNumber string, "
    "approximateArrivalTimestamp timestamp"
)


def _load_records(path: str) -> list[dict]:
    """Read the backing stream file: one JSON object per line with
    ``ts`` (ms since epoch), ``data`` (str), optional ``partitionKey``
    and ``shard`` (default "0"). Within a shard, arrival order = file
    order, so appends never renumber earlier records."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def _by_shard(recs: list[dict]) -> dict[str, list[dict]]:
    """shard_id -> its records in file (= arrival) order."""
    out: dict[str, list[dict]] = {}
    for r in recs:
        out.setdefault(str(r.get("shard", "0")), []).append(r)
    return out


class _Range(InputPartition):
    def __init__(self, path: str, shard: str, start: int, end: int) -> None:
        self.path = path
        self.shard = shard
        self.start = start
        self.end = end


class _FakeKinesisStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self._path = options.get("recordsPath") or options.get("recordspath")
        if not self._path:
            raise ValueError("fake_kinesis requires a recordsPath option")
        # canonical keys as built by kinesis_start_options(); the
        # Python DataSource API lowercases option names
        pos = (options.get("startingPosition")
               or options.get("startingposition") or "LATEST").upper()
        ts_ms = options.get("startingTimestamp") or options.get("startingtimestamp")
        shards = _by_shard(_load_records(self._path))
        if pos == "TRIM_HORIZON":
            self._initial = {s: 0 for s in shards}
        elif pos == "AT_TIMESTAMP":
            if ts_ms is None:
                raise ValueError("AT_TIMESTAMP requires startingTimestamp")
            want = int(ts_ms)
            # per-shard seek, as the real service does shard-by-shard
            self._initial = {
                s: next(
                    (i for i, r in enumerate(rs) if int(r["ts"]) >= want),
                    len(rs),
                )
                for s, rs in shards.items()
            }
        else:  # LATEST: records appended after query start
            self._initial = {s: len(rs) for s, rs in shards.items()}

    def initialOffset(self) -> dict:
        return {"shards": self._initial}

    def latestOffset(self) -> dict:
        return {
            "shards": {
                s: len(rs) for s, rs in _by_shard(_load_records(self._path)).items()
            }
        }

    def partitions(self, start: dict, end: dict):
        # A shard in `end` but not `start` was discovered mid-stream (a
        # split/merge child): .get(s, 0) consumes it from TRIM_HORIZON,
        # the KCL child-shard rule — a reshard can never drop records.
        s0 = start["shards"]
        return [
            _Range(self._path, shard, s0.get(shard, 0), n)
            for shard, n in end["shards"].items()
            if n > s0.get(shard, 0)
        ] or [_Range(self._path, "0", 0, 0)]  # Spark requires >=1 partition

    def read(self, partition: _Range):
        rs = _by_shard(_load_records(partition.path)).get(partition.shard, [])
        for i in range(partition.start, min(partition.end, len(rs))):
            r = rs[i]
            yield (
                str(r.get("partitionKey", partition.shard)),
                r["data"].encode("utf-8"),
                f"{partition.shard}:{i}",
                datetime.fromtimestamp(int(r["ts"]) / 1000.0, tz=timezone.utc),
            )

    def commit(self, end: dict) -> None:
        pass


class FakeKinesisDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fake_kinesis"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema):
        return _FakeKinesisStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the fake connector on a session."""
    spark.dataSource.register(FakeKinesisDataSource)
