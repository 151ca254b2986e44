"""Subquery forms — scalar, IN, NOT IN (with its null three-valued-logic
trap), correlated EXISTS — plus the salting pattern for skewed joins and
lateral explode forms. Catalyst rewrites all subqueries into joins; the
queries here pin that the rewrites produce oracle-identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis2sse_spark.catalog import load_table, register_views
from kinesis2sse_spark.registry import register


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 6) AS diff_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery → Catalyst plans a one-row broadcast, the fact scan
    happens once per subquery use but never shuffles."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 6) AS diff_from_avg
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


@register(
    "subquery_not_in_null_safe",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def subquery_not_in_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN carries three-valued logic: one NULL in the subquery result
    empties the output. Both engines implement ANSI semantics (Spark plans
    a null-aware anti join); the fixture's keys are non-null so the query
    returns real rows, but the plan is the null-aware variant."""
    register_views(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        """
    )


@register(
    "subquery_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
    """,
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → decorrelated by Catalyst into a left-semi join
    on the correlation key; no per-row execution ever happens."""
    register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
        )
        """
    )


@register(
    "subquery_correlated_scalar_min",
    oracle="""
    SELECT DISTINCT p.p_partkey, p.p_brand, l.l_suppkey,
           round(l.l_extendedprice / l.l_quantity, 6) AS unit_price
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 5
      AND round(l.l_extendedprice / l.l_quantity, 6) = (
        SELECT min(round(l2.l_extendedprice / l2.l_quantity, 6))
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def subquery_correlated_scalar_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar aggregate (per-part minimum unit
    price, ties kept). The oracle states the literal correlated subquery;
    the Spark plan uses a window min over l_partkey instead — one shuffle
    of lineitem, no self-join, which is the plan that survives when the
    correlated side is the 100 TB fact table. Per-row division is rounded
    BEFORE the min on both sides so the equality is exact."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 5).select(
        "p_partkey", "p_brand"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6).alias("unit_price"),
    )
    w = Window.partitionBy("l_partkey")
    cheapest = l.withColumn("min_price", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("min_price")
    )
    return (
        cheapest.join(p, cheapest.l_partkey == p.p_partkey)
        .select("p_partkey", "p_brand", "l_suppkey", "unit_price")
        .distinct()
    )


@register(
    "subquery_nested_correlated_having",
    oracle="""
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 0.2 * (
        SELECT sum(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    )
    """,
)
def subquery_nested_correlated_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: IN over a grouped subquery whose HAVING compares
    against a correlated scalar aggregate (suppliers whose share of a
    red part's shipped volume exceeds 0.2 — above the uniform 1/5 share
    the fixture's ~5-suppliers-per-part generator centers on, so the
    predicate is selective yet non-degenerate at every SF; the original
    >0.5 literal could NEVER fire on this corpus, max share 0.245,
    leaving the whole plan untested on real rows). The oracle nests
    three levels; the Spark plan is two aggregates over ONE lineitem
    scan lineage — per (suppkey, partkey) totals joined to per-partkey
    totals on the already co-partitioned key — then a semi join into
    supplier. Quantities are integral doubles, so the sums and the
    0.2* comparison are one identical FP product on both engines."""
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    l = load_table(spark, sf_dir, "lineitem").join(
        part_keys, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    ).select("l_suppkey", "l_partkey", "l_quantity")
    per_supp_part = l.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = l.groupBy("l_partkey").agg(F.sum("l_quantity").alias("part_qty"))
    dominant = (
        per_supp_part.join(per_part, "l_partkey")
        .filter(F.col("supp_qty") > 0.2 * F.col("part_qty"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(
        dominant, s.s_suppkey == dominant.l_suppkey, "left_semi"
    ).distinct()


@register(
    "join_skew_salted",
    oracle="""
    SELECT e.event_type, count(*) AS n, round(sum(c.c_acctbal), 2) AS bal_sum
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.event_type
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual salting for a skewed join key: replicate the build side 8x
    with salt 0..7, spread the probe side across salts, equi-join on
    (key, salt). Same result as the plain join (which the oracle runs);
    at 100 TB this splits one hot key's partition 8 ways when AQE's
    skew-join can't (e.g. a broadcast-unfriendly aggregation downstream).
    """
    n_salt = 8
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salt))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
        .withColumn("salt", F.col("salt").cast("bigint"))
    )
    return (
        ev.hint("shuffle_hash")
        .join(cust, (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("c_acctbal"), 2).alias("bal_sum"))
    )


@register(
    "lateral_posexplode",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 10),
         LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) u
    """,
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: explode with element position — the lateral-view form."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, round(val, 2) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    )
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via the melt/unpivot API."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.col("c_nationkey").cast("double").alias("c_nationkey")
    )
    up = c.unpivot(
        ids=["c_custkey"],
        values=["c_acctbal", "c_nationkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return up.select(
        "c_custkey",
        F.when(F.col("metric") == "c_acctbal", "acctbal")
        .otherwise("nationkey")
        .alias("metric"),
        F.round("val", 2).alias("val"),
    )
