"""Join operators — SURVEY.md §2.3: broadcast/shuffle-hash/sort-merge equi
joins, all outer variants, semi/anti, theta via cross+filter, range join,
and the custom as-of join (generalizing reference operator Q2,
timestamp2offset.go:58-80).

Scale notes (local[32] correctness, 1000-executor design):
- dimension tables (region/nation/supplier/customer/part) are broadcast —
  no shuffle of the fact side;
- fact-fact joins (lineitem ⋈ orders) shuffle on the join key once; AQE
  handles skew;
- the as-of join is the union+window formulation: ONE shuffle on the
  partition key, no correlated per-row lookup, no cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table
from kinesis2sse_spark.registry import register


@register(
    "join_broadcast_inner",
    bench=True,
    oracle="""
    SELECT p.p_brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size > 20
    GROUP BY p.p_brand
    """,
)
def join_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: fact ⋈ small dim — the dim ships to every
    executor, the 100 TB fact table never shuffles. The forced hint
    here IS the operator under test (§2.3's user-directed broadcast
    join form — census class operator-demo): a user applies it to a
    dim they know is bounded; the engine's own queries rely on
    AQE/static sizing instead (see broadcast_census.py)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 20)
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "join_sort_merge",
    bench=True,
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n_lines,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    """,
)
def join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-merge join (MERGE hint): the fact-fact pattern — both sides
    shuffle-sort on the key once; at scale this is the default for two
    large tables and spills gracefully."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        lineitem.hint("merge")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "join_shuffle_hash",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           round(avg(o.o_totalprice), 6) AS avg_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle hash join (SHUFFLE_HASH hint): avoids the sort when one
    side's per-partition build fits in memory."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT n.n_name, count(c.c_custkey) AS n_customers
    FROM customer c RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("c_custkey").alias("n_customers"))
    )


@register(
    "join_full_outer",
    oracle="""
    WITH cu AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         su AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cu.nk, su.nk) AS nationkey,
           coalesce(cu.n_cust, 0) AS n_cust,
           coalesce(su.n_supp, 0) AS n_supp
    FROM cu FULL OUTER JOIN su ON cu.nk = su.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cu.join(su, cu.nk == su.nk, "full").select(
        F.coalesce(cu.nk, su.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= DATE '1998-06-01')
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: LAPSED customers — no order since the cutoff. The
    orders side filters BEFORE the anti join (predicate pushed to the
    fact scan, then the anti join sees only the recent slice). The
    original every-order form was fixture-degenerate at the driver SF
    (every sf0.01 customer has some order → 0 rows attested nothing);
    the dated form returns 3/8/142 rows at sf0.001/0.01/0.1 and is the
    churn query real pipelines actually run."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1998-06-01"
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_theta_cross",
    oracle="""
    SELECT s.s_suppkey, count(*) AS n_richer_customers
    FROM supplier s JOIN customer c
      ON c.c_acctbal > s.s_acctbal AND c.c_nationkey <> s.s_nationkey
    GROUP BY s.s_suppkey
    """,
)
def join_theta_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join = cross join + non-equi predicate. Spark plans this as a
    BroadcastNestedLoopJoin when one side is small — acceptable only
    because the supplier dim is tiny; at scale a theta join needs a
    bucketed rewrite (see join_range)."""
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    cond = (customer.c_acctbal > supplier.s_acctbal) & (
        customer.c_nationkey != supplier.s_nationkey
    )
    return (
        supplier.join(customer, cond)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_richer_customers"))
    )


@register(
    "join_range",
    oracle="""
    SELECT s.s_suppkey,
           count(*) AS n_close
    FROM supplier s JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 500 AND s.s_acctbal + 500
    GROUP BY s.s_suppkey
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucketing: map each row to width-w buckets, equi-join
    on bucket id, then apply the exact range predicate. Turns an O(n·m)
    nested loop into a co-partitioned equi-join — the 100 TB-safe plan for
    interval/band joins."""
    width = 500
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal", F.floor(F.col("s_acctbal") / width).alias("b")
    )
    # each supplier probes its own bucket and both neighbors, so every
    # candidate within ±width is covered by exactly one equi-match
    probe = supplier.withColumn("bucket", F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)))
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.floor(F.col("c_acctbal") / width).alias("bucket")
    )
    return (
        probe.join(customer, "bucket")
        .filter(
            (F.col("c_acctbal") >= F.col("s_acctbal") - width)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + width)
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close"))
    )


@register(
    "join_asof",
    bench=True,
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           (SELECT s.event_id FROM events s
             WHERE s.user_id = e.user_id AND s.event_type = 'signup'
               AND s.ts <= e.ts
             ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS signup_event_id
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (generalizes reference Q2 to a per-key join): for every
    'error' event, the most recent 'signup' of the same user at or before
    its event time.

    Union+window formulation: tag both sides, sort within user by
    (ts, side, event_id), carry the last signup id forward. ONE shuffle on
    user_id, zero cross products — the plan that survives 100 TB, unlike
    the oracle's correlated subquery."""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.lit(None).cast("long").alias("sid"), F.lit(1).alias("side")
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", F.col("event_id").alias("sid"), F.lit(0).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = errors.unionByName(signups).withColumn(
        "signup_event_id", F.last("sid", ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("side") == 1).select(
        "event_id", "user_id", "ts", "signup_event_id"
    )


# Interval-OVERLAP join (distinct from join_range's point-band join):
# both sides carry [start, end] intervals and a pair matches iff the
# intervals intersect. The 100 TB-safe plan is the chunked interval
# join every genomics/temporal engine uses: explode each interval to
# the width-W buckets it spans, equi-join on (key, bucket), apply the
# exact overlap predicate, and COUNT EACH PAIR EXACTLY ONCE via the
# ownership rule "the pair belongs to the bucket containing
# greatest(start_a, start_b)" — the canonical dedup trick that avoids
# a distinct over the pair set. Intervals here: each purchase/error
# event opens a 2-hour activity window for its user; the join finds
# per-user purchase/error co-activity.
IVL_LEN_US = 2 * 3600 * 1_000_000  # interval length
IVL_BUCKET_US = IVL_LEN_US  # chunk width = interval length → ≤ 2 buckets/interval


@register(
    "join_interval_overlap",
    oracle=f"""
    WITH a AS (
      SELECT user_id, epoch_us(ts) AS sa, epoch_us(ts) + {IVL_LEN_US} AS ea
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
    ),
    b AS (
      SELECT user_id, epoch_us(ts) AS sb, epoch_us(ts) + {IVL_LEN_US} AS eb
      FROM events WHERE event_type = 'error' AND ts IS NOT NULL
    )
    SELECT a.user_id, CAST(count(*) AS BIGINT) AS n_overlaps
    FROM a JOIN b ON b.user_id = a.user_id
                 AND a.sa <= b.eb AND b.sb <= a.ea
    GROUP BY a.user_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count of overlapping purchase/error activity windows —
    see the block comment for the chunked plan. The oracle states the
    TRUTH (naive per-user overlap join — fine for DuckDB at fixture
    scale); the Spark side runs the bucketed plan: each interval
    explodes to the ≤2 width-W buckets it spans, the join is an
    equi-join on (user_id, bucket) — co-partitioned, no theta join
    anywhere — and the ownership predicate keeps exactly the bucket
    containing greatest(start_a, start_b), so no pair-level distinct
    is needed. Work per bucket is |a_bucket|x|b_bucket| within one
    user — bounded by per-user-per-window activity, not corpus size."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    us = F.expr("unix_micros(ts)")

    def side(tp: str, s: str, epre: str):
        iv = e.where(F.col("event_type") == tp).select(
            "user_id",
            us.alias(s),
            (us + F.lit(IVL_LEN_US)).alias(epre),
        )
        return iv.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"{s} div {IVL_BUCKET_US}"),
                    F.expr(f"{epre} div {IVL_BUCKET_US}"),
                )
            ),
        )

    a = side("purchase", "sa", "ea")
    b = side("error", "sb", "eb")
    own = F.expr(f"greatest(sa, sb) div {IVL_BUCKET_US}") == F.col("bucket")
    return (
        a.join(b, ["user_id", "bucket"])
        .where(
            (F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")) & own
        )
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_overlaps"))
    )
