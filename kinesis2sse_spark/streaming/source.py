"""Stream-source abstraction — the equivalent of the reference's
``disableKCL`` injection seam (service.go:34-35): production wires a
Kinesis-style source, tests wire file/memory sources, and every operator
downstream sees the same streaming DataFrame shape.

OSS PySpark has no first-party Kinesis connector, so the Kinesis source
is isolated behind this abstraction and raises until a connector jar is
provided (SURVEY.md §7 M4). Kafka would slot in the same way.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _staged_dir(sf_dir: str) -> str:
    """FileStreamSource needs a *directory*; stage a symlink to the events
    parquet under /tmp (content-addressed, reused across calls)."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = f"/tmp/k2s_stream_{key}/events"
    src = os.path.join(sf_dir, "events.parquet")
    link = os.path.join(d, "events.parquet")
    if not os.path.islink(link):
        os.makedirs(d, exist_ok=True)
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(src, link)
    return d


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based streaming source over the events table, with the same
    ns→µs timestamp conversion the batch catalog applies."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(_staged_dir(sf_dir)).withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Built-in rate source — synthetic (timestamp, value) rows, used for
    liveness tests of the serving layer."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def staged_batch_dir(name: str) -> str:
    """Empty staging directory for tests that feed a stream file-by-file
    (deterministic multi-batch arrival with maxFilesPerTrigger=1)."""
    d = f"/tmp/k2s_stage_{name}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """Kafka source through the same seam: returns the raw ``value`` bytes
    column shape ``parse_envelope`` consumes. The kafka-sql connector jar
    ships with Spark distributions but needs a broker; tests use the file
    source through the identical downstream path."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select("value")
    )


def kinesis_stream(spark: SparkSession, stream_name: str, region: str, **options):
    """Kinesis source stub. OSS PySpark ships no Kinesis connector; wire
    one (e.g. spark-sql-kinesis) on the classpath and replace this body
    with spark.readStream.format("aws-kinesis")... — reference operator
    S1/S2 (kinesis2sse.go:110-126) maps to the connector's
    startingPosition option (latest / trim_horizon / at_timestamp)."""
    raise NotImplementedError(
        "No Kinesis connector jar on the classpath; use events_stream() "
        "(file source) or a Kafka source via the same seam."
    )


def run_to_memory(
    df: DataFrame,
    name: str,
    output_mode: str = "append",
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Drive a streaming DataFrame to completion into an in-memory sink
    and return the materialized result — the synchronous harness used by
    registry queries and tests (processAllAvailable = all staged input).

    ``shuffle_partitions`` pins the stateful-operator partition count for
    THIS query (captured at start, restored after). Size it to the state
    cardinality, not the core count: every state partition carries a
    store + checkpoint per micro-batch, so a bounded-cardinality window
    agg with 32 stores pays ~2x the per-batch overhead of 4 doing the
    same work. At real scale (large keyspaces) leave it unset."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name)
