"""Lake maintenance: small-file compaction for the streaming archive.

The file sink writes one file per task per epoch — a day of
minute-level micro-batches leaves thousands of small files per
partition, and at 100 TB the listing cost and per-file open overhead
dominate scan time. Compaction is an ordinary batch rewrite: read a
partition set, coalesce to size-targeted files, overwrite ONLY those
partitions (dynamic partition overwrite — a static overwrite would
delete every partition not in the rewrite set).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024  # parquet sweet spot at scale


def _on_disk_bytes(path: str) -> int:
    """Parquet bytes under ``path`` (driver-side listing, no data scan).
    Local-FS walk for tests; on an object store swap in the FS client's
    listing — the sizing logic is unchanged."""
    total = 0
    for root, _dirs, files in os.walk(path):
        if "_spark_metadata" in root:
            continue
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    return total


def compact_lake(
    spark: SparkSession,
    path: str,
    partition_col: str = "event_date",
    partitions: list | None = None,
    target_file_bytes: int = TARGET_FILE_BYTES,
    schema=None,
) -> DataFrame:
    """Rewrite the named partitions (default: all) of a partitioned
    parquet lake into size-targeted files; returns the lazy read of the
    compacted lake.

    Output file count = ceil(on_disk_bytes / target), derived from the
    actual listing, not guessed; ``repartition(n, partition_col)``
    co-locates each partition value so every partition dir gets whole
    coalesced files. Dynamic partition overwrite replaces exactly the
    rewritten dirs. The pre-write ``localCheckpoint`` both breaks the
    read-overwrite-same-path conflict and pins the data before its
    source files are replaced; a deployment wanting crash-atomicity
    writes to a staging dir and swaps, or runs over a table format with
    a transaction log.

    Compact only RETIRED streaming lakes (the query stopped, or the
    lake rotated out of the live write path): a lake written by the
    file sink is read through its ``_spark_metadata`` transaction log,
    which still lists the pre-compaction files — so compaction reads
    the log-committed view (orphans from crashed epochs are excluded),
    rewrites, then REMOVES the log, converting the directory to a
    plain batch-managed parquet lake. A streaming query must not
    resume appending to it afterward (rotate to a fresh directory
    instead — the standard hourly/daily layout at scale)."""
    import shutil

    # optional explicit schema: an empty lake (zero-event stream) has
    # no part files to infer from, and a compaction job must handle the
    # empty partition-set gracefully rather than throw at the listing
    def _read():
        return (spark.read.schema(schema) if schema is not None else spark.read)

    lake = _read().parquet(path)  # via _spark_metadata if present
    if partitions is not None:
        lake = lake.filter(F.col(partition_col).isin(list(partitions)))
    n_files = max(1, math.ceil(_on_disk_bytes(path) / target_file_bytes))

    staged = lake.repartition(n_files, partition_col).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        staged.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    shutil.rmtree(os.path.join(path, "_spark_metadata"), ignore_errors=True)
    return _read().parquet(path)
