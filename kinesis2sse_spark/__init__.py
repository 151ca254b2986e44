"""kinesis2sse_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the
reference system markandrus/kinesis2sse (a Kinesis → in-memory log →
SSE replay service, see /root/reference) as an idiomatic PySpark
library, and extends it with the full relational operator surface plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layers:
- ``session``    — tuned SparkSession builders (AQE, Arrow, UTC).
- ``catalog``    — table loaders for the shared parquet fixtures.
- ``pipeline``   — the reference's ingest semantics (envelope parse,
  validity filters, canonical JSON, offset assignment, retention,
  ``since`` resolution / as-of lookup) as batch DataFrame transforms.
- ``operators``  — relational + LLM-pipeline operators as composable
  DataFrame functions.
- ``streaming``  — Structured Streaming sources, windows, stateful
  offset assignment, and the SSE serving sink.
- ``queries``    — the registry binding every operator to an
  oracle-checkable query (driver contract in ``__spark_entry__.py``).
"""

__version__ = "0.1.0"
