"""Streaming archive sink: exactly-once partitioned parquet.

The reference serves events and drops them at capacity (memlog
eviction); it has no durable record of what flowed through. At 100 TB
the pipeline needs one: every micro-batch appended to a
date-partitioned parquet lake, exactly once across restarts, so batch
analytics (the whole registry) runs over the archived stream without
re-reading the source.

Spark's file sink gives exactly-once for free — the checkpoint's WAL
plus the output directory's ``_spark_metadata`` transaction log commit
atomically per epoch, so a crash between write and commit replays the
epoch without duplicating files. Partitioning by event date keeps the
lake prunable: a reader filtering a day touches one directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def archive_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: tuple[str, ...] = ("event_date",),
    query_name: str = "archive",
):
    """Append a streaming DataFrame to a partitioned parquet lake with
    exactly-once semantics. If ``event_date`` is requested as a
    partition column and absent, it is derived from ``ts``. Returns the
    started StreamingQuery; callers drive it (processAllAvailable) or
    let it run.

    Scale notes: the sink writes one file per partition-dir per task
    per epoch — at high epoch rates compact downstream (the metadata
    log makes files discoverable transactionally, so compaction is an
    ordinary batch rewrite). The partition column must be LOW
    cardinality (a date, a source tag): partitioning by a high-card key
    explodes the namespace and kills the metadata log."""
    if "event_date" in partition_cols and "event_date" not in df.columns:
        df = df.withColumn("event_date", F.to_date("ts"))
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_cols)
        .outputMode("append")
        .queryName(query_name)
        .start()
    )
