"""Stateful contiguous offset assignment — streaming operator W1.

The reference serializes all shards of a route through one mutex and
lets the in-memory log assign the next integer offset
(record_processor.go:58, 90-94). The Spark equivalent: group every
record onto ONE state key and carry a single counter across
micro-batches with applyInPandasWithState. The state is 8 bytes; the
serialization point is inherent to "contiguous global offsets" — same
bottleneck the reference accepted, and the reason offsets ride an
already-ordered ingest key (event_id) wherever one exists.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OFFSET_STATE_SCHEMA = T.StructType([T.StructField("next_offset", T.LongType())])


def _assign_offsets_fn(order_col: str):
    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (start,) = state.get if state.exists else (0,)
        # The group arrives as an ITERATOR of Arrow chunks (default 10k
        # rows each) — the whole micro-batch must be concatenated before
        # sorting, or offsets would only be ordered within each chunk.
        # Materializing the batch is inherent to a total order; the single
        # state key already serializes this stage (the reference holds the
        # whole ProcessRecords batch in memory the same way).
        chunks = [pdf for pdf in pdfs]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            batch = batch.sort_values(order_col).reset_index(drop=True)
            batch["offset"] = range(start, start + len(batch))
            start += len(batch)
            yield batch.drop(columns=["__k"])
        state.update((start,))

    return assign


# NOTE: a transformWithStateInPandas variant was evaluated (Spark 4's
# typed-state successor to applyInPandasWithState) but remains
# incompatible with this runtime. Re-probed on pyspark 4.1.2
# (2026-08, round 7): a minimal keyed ValueState counter over a rate
# source fails every micro-batch with STREAM_FAILED /
# "TransformWithStateInPySpark driver worker exited unexpectedly
# (crashed) SQLSTATE: XXKST" before the first state op runs. Revisit
# on the next runtime bump; the semantics here are identical.
def with_streaming_offsets(df: DataFrame, order_col: str = "event_id") -> DataFrame:
    """Assign contiguous offsets 0,1,2,... across micro-batches.

    Output schema = input schema + ``offset: long``. All rows map to one
    state key (the route), exactly mirroring the reference's route-wide
    mutex; throughput of this stage is bounded by one task, so keep the
    payload columns slim and join the rest back by event id if needed.
    """
    out_fields = [T.StructField(f.name, f.dataType) for f in df.schema.fields] + [
        T.StructField("offset", T.LongType())
    ]
    return (
        df.withColumn("__k", F.lit(1))
        .groupBy("__k")
        .applyInPandasWithState(
            _assign_offsets_fn(order_col),
            outputStructType=T.StructType(out_fields),
            stateStructType=OFFSET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


KEYED_STATS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _keyed_stats_fn(key_col: str, value_col: str):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return update


def with_keyed_running_stats(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key running (count, sum) carried across micro-batches — the
    MULTI-key generalization of the offset counter above: state shards
    by key across executors (hash partition on the grouping key), so
    throughput scales with the keyspace instead of serializing through
    one task. One output row per key per micro-batch in which the key
    appears, carrying the running totals — the streaming twin of a
    running-aggregate window, without retaining per-event state (8+8
    bytes per key, regardless of history length).

    The Arrow chunks stream through without concatenation (unlike the
    offset assigner, which must materialize the batch to total-order
    it) — per-key aggregation is order-free, so memory per task is one
    chunk, not one batch."""
    out_schema = T.StructType(
        [
            next(T.StructField(f.name, f.dataType) for f in df.schema.fields if f.name == key_col),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    return df.groupBy(key_col).applyInPandasWithState(
        _keyed_stats_fn(key_col, value_col),
        outputStructType=out_schema,
        stateStructType=KEYED_STATS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming changelog compaction -------------------------------------

COMPACTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_ns", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_ops", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
    ]
)


# NULL event times sort SMALLEST — the same rule as Spark struct
# ordering (batch max_by) and the oracle's ORDER BY ts DESC (DuckDB
# puts nulls last in DESC). Encoded as an int64 sentinel below every
# real timestamp; pd.isna handles NaT explicitly because
# Series.astype("int64") on NaT either yields an unspecified sentinel
# or raises, depending on the pandas version.
_TS_NULL_SENTINEL = -(2**63)


def _compaction_fn(key_col: str):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_ns, eid, op, val, n_ops, n_del = state.get
        else:
            ts_ns, eid, op, val, n_ops, n_del = (
                _TS_NULL_SENTINEL, -1, "", 0.0, 0, 0,
            )
        for pdf in pdfs:
            n_ops += len(pdf)
            ops = pdf["event_type"].map(
                lambda et: "I" if et == "signup" else ("D" if et == "error" else "U")
            )
            n_del += int((ops == "D").sum())
            tsi = pdf["ts"].map(
                lambda x: _TS_NULL_SENTINEL if pd.isna(x) else int(x.value)
            )
            for t, e, o, v in zip(tsi, pdf["event_id"], ops, pdf["value"]):
                if (t, e) > (ts_ns, eid):
                    ts_ns, eid, op, val = int(t), int(e), o, float(v)
        state.update((ts_ns, eid, op, val, n_ops, n_del))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "last_op": [op],
                "last_ts": [
                    pd.NaT if ts_ns == _TS_NULL_SENTINEL else pd.to_datetime(ts_ns)
                ],
                "last_value": [val],
                "n_ops": [n_ops],
                "n_deletes": [n_del],
            }
        )

    return update


def with_changelog_compaction(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key last-writer-wins changelog state carried across
    micro-batches — the streaming twin of
    queries/lakeops.py::pipeline_changelog_compaction: state per key
    is ONE op (the (ts, event_id)-max), two counters, never the op
    history, so memory is O(keys) regardless of stream length. Emits
    the refreshed compacted row for every key seen in the micro-batch
    (update semantics, like a compacted Kafka topic's latest-value
    view); tombstone filtering is the CONSUMER's final-snapshot
    concern, downstream of this operator."""
    out_schema = T.StructType(
        [
            next(
                T.StructField(f.name, f.dataType)
                for f in df.schema.fields
                if f.name == key_col
            ),
            T.StructField("last_op", T.StringType()),
            T.StructField("last_ts", T.TimestampType()),
            T.StructField("last_value", T.DoubleType()),
            T.StructField("n_ops", T.LongType()),
            T.StructField("n_deletes", T.LongType()),
        ]
    )
    return df.groupBy(key_col).applyInPandasWithState(
        _compaction_fn(key_col),
        outputStructType=out_schema,
        stateStructType=COMPACTION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
