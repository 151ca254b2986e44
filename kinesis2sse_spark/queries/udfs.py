"""UDF surface (SURVEY.md §2.3 last row): scalar Python UDF, vectorized
pandas UDF, applyInPandas (UDAF-style grouped map), and Python UDTF.

Every flavor computes something the oracle can verify relationally, so
the comparison checks both the UDF machinery and the values. The scalar
UDF exists to cover the API; the pandas UDF computes the SAME formula —
production guidance is in the docstrings (row-at-a-time = slow path,
Arrow-vectorized = acceptable when built-ins can't express the logic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis2sse_spark.catalog import load_table
from kinesis2sse_spark.registry import register

_ORACLE_SCORE = """
    SELECT event_id,
           round(value * 1.07 + length(event_type) * 0.5, 6) AS score
    FROM events
"""


@register("udf_scalar_python", oracle=_ORACLE_SCORE)
def udf_scalar_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the SLOW path (per-row serde, no
    vectorization, breaks codegen). Registered for API surface parity;
    anything hot belongs in built-ins or a pandas UDF."""

    @F.udf(T.DoubleType())
    def score(value: float, event_type: str) -> float:
        return round(value * 1.07 + len(event_type) * 0.5, 6)

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", score("value", "event_type").alias("score"))


@register("udf_pandas_vectorized", oracle=_ORACLE_SCORE)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same formula as udf_scalar_python as an Arrow-vectorized pandas
    UDF — one serde per batch instead of per row (~10-100x faster)."""

    @F.pandas_udf(T.DoubleType())
    def score(value: pd.Series, event_type: pd.Series) -> pd.Series:
        return (value * 1.07 + event_type.str.len() * 0.5).round(6)

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", score("value", "event_type").alias("score"))


@register(
    "udf_grouped_zscore",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map (UDAF-style): per-group z-score where the
    whole group is materialized as a pandas DataFrame — the escape hatch
    for per-group logic Spark SQL can't express (here it CAN, which is
    exactly what lets the oracle verify the machinery)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "zscore": ((pdf["value"] - mean) / std).round(6)}
        )

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, zscore double"
    )


@register(
    "udtf_tokenize",
    oracle="""
    SELECT doc_id, CAST(i AS INT) - 1 AS pos, t[i] AS term
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 20),
         LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+): one input row → many output rows, with
    the UDTF owning the expansion logic. Tokenizes a slice of documents
    into (pos, term) rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, term string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for pos, term in enumerate(text.split(" ")):
                yield doc_id, pos, term

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        "SELECT t.* FROM udtf_docs, LATERAL tokenize_udtf(doc_id, text) t"
    )
