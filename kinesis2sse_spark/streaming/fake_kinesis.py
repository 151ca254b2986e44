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
    ``ts`` (ms since epoch), ``data`` (str), optional ``partitionKey``.
    Line number = sequence number, so appends never renumber."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


class _Range(InputPartition):
    def __init__(self, path: str, start: int, end: int) -> None:
        self.path = path
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
        n = len(_load_records(self._path))
        if pos == "TRIM_HORIZON":
            self._initial = 0
        elif pos == "AT_TIMESTAMP":
            if ts_ms is None:
                raise ValueError("AT_TIMESTAMP requires startingTimestamp")
            want = int(ts_ms)
            recs = _load_records(self._path)
            self._initial = next(
                (i for i, r in enumerate(recs) if int(r["ts"]) >= want), n
            )
        else:  # LATEST: records appended after query start
            self._initial = n

    def initialOffset(self) -> dict:
        return {"seq": self._initial}

    def latestOffset(self) -> dict:
        return {"seq": len(_load_records(self._path))}

    def partitions(self, start: dict, end: dict):
        return [_Range(self._path, start["seq"], end["seq"])]

    def read(self, partition: _Range):
        recs = _load_records(partition.path)
        for i in range(partition.start, min(partition.end, len(recs))):
            r = recs[i]
            yield (
                str(r.get("partitionKey", "0")),
                r["data"].encode("utf-8"),
                str(i),
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
