"""Set operations — union all / union distinct / intersect (all) /
except (all). Spark plans intersect/except as semi/anti joins with
aggregate dedup; AQE picks broadcast when one side collapses small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table
from kinesis2sse_spark.registry import register


def _buyers(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select("user_id")


def _clickers(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "click").select("user_id")


@register(
    "union_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir).unionAll(_clickers(spark, sf_dir))


@register(
    "union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir).union(_clickers(spark, sf_dir)).distinct()


@register(
    "intersect_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir).intersect(_clickers(spark, sf_dir))


@register(
    "except_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'signup' AND value > 250
    """,
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the subtracted side is the SELECTIVE set (high-value signups):
    # every fixture user has events of every type, so subtracting ALL
    # signup users would always produce the degenerate empty relation —
    # the anti-join plan would never move a row at any scale
    ev = load_table(spark, sf_dir, "events")
    promo = ev.filter(
        (F.col("event_type") == "signup") & (F.col("value") > 250)
    ).select("user_id")
    return _buyers(spark, sf_dir).subtract(promo)


@register(
    "intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersectAll(o)


@register(
    "except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.exceptAll(o)
