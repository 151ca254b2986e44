"""Sort / limit / top-k operators.

Global sort in Spark is a range-partitioned sort (sampled boundaries →
shuffle → per-partition sort) — it scales linearly; LIMIT after ORDER BY
becomes TakeOrderedAndProject (a distributed top-k, no full sort).
Every LIMIT here sits on a total order with a unique key so the result
set is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table
from kinesis2sse_spark.registry import register


@register(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject: each partition keeps its
    local top-100, the driver merges — no global sort materializes."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "sort_multicol",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_returnflag = 'R'
    ORDER BY l_shipdate DESC, l_orderkey, l_linenumber
    LIMIT 500
    """,
)
def sort_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy(F.col("l_shipdate").desc(), "l_orderkey", "l_linenumber")
        .limit(500)
    )


@register(
    "limit_offset",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    ORDER BY event_id
    LIMIT 50 OFFSET 200
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "ts", "event_type").orderBy("event_id").offset(200).limit(50)
    )


@register(
    "distinct_values",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()
