"""Lake-maintenance / layout operators a 100 TB pipeline runs daily:
table profiling (ANALYZE-style one-pass statistics), join-key skew
diagnostics, Z-order layout (multi-dimensional clustering for data
skipping), MERGE-style snapshot upsert + its inverse snapshot diff
(the CDC round-trip, proven inverse in tests/test_lakeops.py), and
SCD type-2 history builds.

All pure DataFrame compositions — no UDFs — so Catalyst keeps them
inside whole-stage codegen and the scans stay pruned.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table, pin_cache
from kinesis2sse_spark.registry import register

# ---------------------------------------------------------------------------
# stats_column_profile — ANALYZE TABLE in one scan
# ---------------------------------------------------------------------------

_PROFILE_COLS = ("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_discount")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           count({c}) AS n_nonnull,
           count(*) - count({c}) AS n_null,
           count(DISTINCT {c}) AS n_distinct,
           CAST(min({c}) AS DOUBLE) AS min_val,
           CAST(max({c}) AS DOUBLE) AS max_val
    FROM lineitem
    """
    for c in _PROFILE_COLS
)


@register("stats_column_profile", oracle=_PROFILE_ORACLE)
def stats_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table profile (non-null / null / NDV / min / max) for
    the five numeric lineitem columns — the statistics a cost-based
    optimizer or data-quality monitor collects before planning over a
    100 TB table.

    One scan: all twenty aggregates ride a single pass with map-side
    partial aggregation; the multiple exact COUNT(DISTINCT)s cost one
    Expand (5× row multiplication) inside that pass. At real scale the
    NDV column switches to approx_count_distinct (one-pass HLL, no
    Expand) — exact here so the DuckDB oracle can verify bit-for-bit.
    The wide one-row aggregate is then unpivoted driver-side-free with
    ``stack`` into one row per column.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.count_distinct(c).alias(f"ndv_{c}"),
            F.min(F.col(c).cast("double")).alias(f"min_{c}"),
            F.max(F.col(c).cast("double")).alias(f"max_{c}"),
        ]
    row = li.agg(*aggs)
    stack_items = ", ".join(
        f"'{c}', nn_{c}, n_rows - nn_{c}, ndv_{c}, min_{c}, max_{c}" for c in _PROFILE_COLS
    )
    return row.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_items}) AS "
        "(column_name, n_nonnull, n_null, n_distinct, min_val, max_val)"
    )


# ---------------------------------------------------------------------------
# layout_zorder — multi-dimensional clustering
# ---------------------------------------------------------------------------

_ZBITS = 8  # 8 bits per dimension → 16-bit z-value, 256 top buckets


def _z_sql(x: str, y: str) -> str:
    """Bit-interleave SQL shared (textually) by Spark and DuckDB."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_ZORDER_ORACLE = f"""
    WITH pts AS (
      SELECT (o_custkey % 256) AS x,
             (date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 256) AS y
      FROM orders
    ), z AS (
      SELECT x, y, {_z_sql('x', 'y')} AS zval FROM pts
    )
    SELECT zval >> 8 AS zbucket,
           count(*) AS n,
           count(DISTINCT x) AS n_x,
           count(DISTINCT y) AS n_y,
           min(zval) AS z_min,
           max(zval) AS z_max
    FROM z GROUP BY zval >> 8
"""


@register("layout_zorder", oracle=_ZORDER_ORACLE)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two order dimensions
    (customer bucket × order-day bucket), reported per top-level
    z-bucket: row count, distinct x/y values covered, and the z range.

    The interleaved key is what `repartitionByRange(zval)` + sorted
    parquet writes cluster by: each output file then covers a narrow
    hyper-rectangle in BOTH dimensions, so min/max row-group stats
    prune 2-D predicates that a single-column sort can only prune in
    one dimension (see tests/test_lakeops.py for the file-skipping
    demonstration). Pure integer bit arithmetic, whole-stage codegen,
    one shuffle for the bucket aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        (F.col("o_custkey") % 256).alias("x"),
        (
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
            % 256
        ).cast("long").alias("y"),
    )
    z = pts.withColumn("zval", F.expr(_z_sql("x", "y")))
    return z.groupBy(F.expr("zval >> 8").alias("zbucket")).agg(
        F.count("*").alias("n"),
        F.count_distinct("x").alias("n_x"),
        F.count_distinct("y").alias("n_y"),
        F.min("zval").alias("z_min"),
        F.max("zval").alias("z_max"),
    )


def zorder_value(x: F.Column, y: F.Column) -> F.Column:
    """The reusable z-value column (8 bits per dimension) for layout
    writes: ``df.repartitionByRange(n, zorder_value(...)).sortWithinPartitions(...)``."""
    def bit(col: F.Column, i: int, pos: int) -> F.Column:
        return F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)), pos)

    parts = [bit(x, i, 2 * i) for i in range(_ZBITS)] + [
        bit(y, i, 2 * i + 1) for i in range(_ZBITS)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


# ---------------------------------------------------------------------------
# pipeline_upsert_snapshot — MERGE INTO semantics
# ---------------------------------------------------------------------------

_UPSERT_ORACLE = """
    WITH batch AS (
      SELECT c_custkey AS k, c_name AS name, c_acctbal + 100.0 AS acctbal, 'U' AS op
      FROM customer WHERE c_custkey % 10 = 3
      UNION ALL
      SELECT c_custkey + 10000000 AS k, 'NEW:' || c_name AS name, 50.0 AS acctbal, 'I' AS op
      FROM customer WHERE c_custkey % 100 = 7
      UNION ALL
      SELECT c_custkey AS k, NULL AS name, NULL AS acctbal, 'D' AS op
      FROM customer WHERE c_custkey % 10 = 6
    )
    SELECT coalesce(b.c_custkey, t.k) AS c_custkey,
           coalesce(t.name, b.c_name) AS c_name,
           coalesce(t.acctbal, b.c_acctbal) AS c_acctbal,
           CASE WHEN t.k IS NULL THEN 'base'
                WHEN t.op = 'U' THEN 'updated'
                ELSE 'inserted' END AS provenance
    FROM customer b FULL OUTER JOIN batch t ON b.c_custkey = t.k
    WHERE t.op IS NULL OR t.op <> 'D'
"""


@register("pipeline_upsert_snapshot", oracle=_UPSERT_ORACLE)
def pipeline_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (upsert + delete) applied to a keyed
    snapshot — the foreachBatch write path of a streaming CDC feed into
    a lakehouse table, expressed as one full-outer join:

      matched + op=U  → update columns,   matched + op=D → drop row,
      unmatched batch → insert,           unmatched base → carry over.

    The change batch is derived deterministically from the customer
    table itself (updates for key%10=3, inserts for key%100=7, deletes
    for key%10=6) so the DuckDB oracle replays the identical merge. At
    100 TB the base side is bucketed by key and the batch (orders of
    magnitude smaller) broadcasts or co-shuffles into the same buckets,
    then only affected partitions rewrite (dynamic partition
    overwrite — see pipeline_lake_compaction for the write side).
    """
    c = load_table(spark, sf_dir, "customer")
    updates = c.where(F.col("c_custkey") % 10 == 3).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        (F.col("c_acctbal") + 100.0).alias("acctbal"),
        F.lit("U").alias("op"),
    )
    inserts = c.where(F.col("c_custkey") % 100 == 7).select(
        (F.col("c_custkey") + 10000000).alias("k"),
        F.concat(F.lit("NEW:"), F.col("c_name")).alias("name"),
        F.lit(50.0).alias("acctbal"),
        F.lit("I").alias("op"),
    )
    deletes = c.where(F.col("c_custkey") % 10 == 6).select(
        F.col("c_custkey").alias("k"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("double").alias("acctbal"),
        F.lit("D").alias("op"),
    )
    batch = updates.unionByName(inserts).unionByName(deletes)
    merged = c.join(batch, c.c_custkey == batch.k, "full_outer")
    return merged.where(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(F.col("c_custkey"), F.col("k")).alias("c_custkey"),
        F.coalesce(F.col("name"), F.col("c_name")).alias("c_name"),
        F.coalesce(F.col("acctbal"), F.col("c_acctbal")).alias("c_acctbal"),
        F.when(F.col("k").isNull(), "base")
        .when(F.col("op") == "U", "updated")
        .otherwise("inserted")
        .alias("provenance"),
    )


# ---------------------------------------------------------------------------
# stats_key_skew — the diagnostic you run BEFORE choosing a join strategy
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
    WITH c AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    ), ranked AS (
      SELECT rank() OVER (ORDER BY cnt DESC, user_id) AS rnk,
             user_id, cnt,
             CAST((cnt * 1000000) // (SELECT sum(cnt) FROM c) AS BIGINT) AS share_ppm
      FROM c
    )
    SELECT rnk, user_id, cnt, share_ppm FROM ranked WHERE rnk <= 20
"""


@register("stats_key_skew", oracle=_SKEW_ORACLE)
def stats_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 20 heaviest event keys with their
    exact frequency and parts-per-million share — the report that
    decides between a plain shuffle join, AQE skew splitting, and
    explicit salting (see join_skew_salted) before a 100 TB join runs.

    Cost shape: one map-side-combined groupBy on the key (the only
    full-data shuffle), after which the per-key relation is |distinct
    keys| rows; the unpartitioned rank/total windows run over THAT
    small relation on a single post-agg partition, never over the raw
    events. Share stays in integer ppm (x*1000000 DIV total) so the
    two engines can never disagree on FP division."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").alias("cnt"))
    ranked = counts.select(
        F.rank().over(Window.partitionBy().orderBy(F.desc("cnt"), F.asc("user_id"))).alias("rnk"),
        "user_id",
        "cnt",
        F.expr("CAST((cnt * 1000000) DIV sum(cnt) OVER () AS BIGINT)").alias("share_ppm"),
    )
    return ranked.where(F.col("rnk") <= 20)


# ---------------------------------------------------------------------------
# pipeline_snapshot_diff — changelog extraction (inverse of the upsert)
# ---------------------------------------------------------------------------

_DIFF_ORACLE = """
    WITH new_snap AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 10 = 3 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 10 <> 6
      UNION ALL
      SELECT c_custkey + 10000000 AS c_custkey, 'NEW:' || c_name AS c_name, 50.0 AS c_acctbal
      FROM customer WHERE c_custkey % 100 = 7
    )
    SELECT coalesce(b.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN b.c_custkey IS NULL THEN 'I'
                WHEN n.c_custkey IS NULL THEN 'D'
                ELSE 'U' END AS op,
           n.c_acctbal AS new_acctbal,
           b.c_acctbal AS old_acctbal
    FROM customer b FULL OUTER JOIN new_snap n USING (c_custkey)
    WHERE b.c_custkey IS NULL OR n.c_custkey IS NULL
       OR b.c_name <> n.c_name OR b.c_acctbal <> n.c_acctbal
"""


@register("pipeline_snapshot_diff", oracle=_DIFF_ORACLE)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog extraction — the inverse of pipeline_upsert_snapshot:
    given two snapshots of a keyed table, emit the I/U/D batch that
    transforms old into new (the diff a CDC-less source needs before it
    can feed a MERGE). One full-outer join on the key; unchanged rows
    (the overwhelming majority at 100 TB) are filtered out by column
    comparison, so only the changed slice flows downstream. The 'new'
    snapshot is derived deterministically from the base (same mutation
    rules as the upsert query) so the DuckDB oracle rebuilds it
    identically. At scale both snapshots are bucketed by key → the
    join is exchange-free, and a row-hash column (xxhash64 of the
    compared fields, stored at write time) replaces the per-column
    comparison with one long compare."""
    c = load_table(spark, sf_dir, "customer")
    new_snap = (
        c.where(F.col("c_custkey") % 10 != 6)
        .select(
            "c_custkey",
            "c_name",
            F.when(F.col("c_custkey") % 10 == 3, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
        )
        .unionByName(
            c.where(F.col("c_custkey") % 100 == 7).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"),
                F.concat(F.lit("NEW:"), F.col("c_name")).alias("c_name"),
                F.lit(50.0).alias("c_acctbal"),
            )
        )
    )
    b = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("old_name"),
        F.col("c_acctbal").alias("old_acctbal"),
    )
    n = new_snap.select(
        F.col("c_custkey").alias("k2"),
        F.col("c_name").alias("new_name"),
        F.col("c_acctbal").alias("new_acctbal"),
    )
    joined = b.join(n, b.k == n.k2, "full_outer")
    changed = joined.where(
        F.col("k").isNull()
        | F.col("k2").isNull()
        | (F.col("old_name") != F.col("new_name"))
        | (F.col("old_acctbal") != F.col("new_acctbal"))
    )
    return changed.select(
        F.coalesce(F.col("k"), F.col("k2")).alias("c_custkey"),
        F.when(F.col("k").isNull(), "I")
        .when(F.col("k2").isNull(), "D")
        .otherwise("U")
        .alias("op"),
        F.col("new_acctbal"),
        F.col("old_acctbal"),
    )


# ---------------------------------------------------------------------------
# pipeline_scd2_intervals — slowly-changing-dimension history build
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
    WITH chg AS (
      SELECT user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             event_id
      FROM events WHERE event_type = 'purchase'
    ), starts AS (
      SELECT user_id, ts, value, event_id FROM chg
      WHERE prev_value IS NULL OR value <> prev_value
    )
    SELECT user_id, value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS BOOLEAN) AS is_current
    FROM starts
"""


@register("pipeline_scd2_intervals", oracle=_SCD2_ORACLE, bench=True)
def pipeline_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build: collapse a per-key changelog into
    validity intervals — consecutive equal values merge, each retained
    version carries [valid_from, valid_to) and the open interval is
    flagged current. Two windows over the same (user_id, ts) sort order
    (lag to drop no-op updates, lead to close intervals), so Spark
    sorts each key's partition ONCE and both windows ride it — one
    shuffle total. This is how a point-in-time dimension join (as-of
    semantics at rest) gets its table; pair with join_asof for the
    probe side."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = e.select(
        "user_id", "ts", "value", "event_id", F.lag("value").over(w).alias("prev_value")
    )
    starts = chg.where(F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return starts.select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Generic merge/diff helpers — the reusable API behind the two queries
# ---------------------------------------------------------------------------

def merge_snapshot(base: DataFrame, batch: DataFrame, key: str) -> DataFrame:
    """Apply an I/U/D change batch to a keyed snapshot (MERGE INTO).
    ``batch`` carries the base's columns plus ``op`` ('I'/'U'/'D');
    non-key columns are taken from the batch when present (coalesce),
    so an update cannot set a column to NULL — CDC feeds that need
    explicit NULL writes carry per-column change structs instead. One
    full-outer join; with both sides bucketed by ``key`` it is
    exchange-free."""
    cols = [c for c in base.columns if c != key]
    t = batch.select(
        F.col(key).alias("__k"),
        F.col("op").alias("__op"),
        *[F.col(c).alias(f"__{c}") for c in cols],
    )
    j = base.join(t, F.col(key) == F.col("__k"), "full_outer")
    return j.where(F.col("__op").isNull() | (F.col("__op") != "D")).select(
        F.coalesce(F.col(key), F.col("__k")).alias(key),
        *[F.coalesce(F.col(f"__{c}"), F.col(c)).alias(c) for c in cols],
    )


def snapshot_diff(base: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Extract the minimal I/U/D batch that transforms ``base`` into
    ``new`` (the inverse of merge_snapshot — see
    tests/test_lakeops.py::test_merge_diff_round_trip). Null-safe
    column comparison; the emitted batch carries the NEW values (NULL
    for deletes), matching merge_snapshot's input contract."""
    cols = [c for c in base.columns if c != key]
    n = new.select(
        F.col(key).alias("__k"), *[F.col(c).alias(f"__{c}") for c in cols]
    )
    j = base.join(n, F.col(key) == F.col("__k"), "full_outer")
    changed_pred = F.col(key).isNull() | F.col("__k").isNull()
    for c in cols:
        changed_pred = changed_pred | ~F.col(c).eqNullSafe(F.col(f"__{c}"))
    return j.where(changed_pred).select(
        F.coalesce(F.col(key), F.col("__k")).alias(key),
        F.when(F.col(key).isNull(), "I")
        .when(F.col("__k").isNull(), "D")
        .otherwise("U")
        .alias("op"),
        *[F.col(f"__{c}").alias(c) for c in cols],
    )


# ---------------------------------------------------------------------------
# stats_dq_report — declarative data-quality constraint checks
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
    SELECT 'customer_key_unique' AS check_name,
           count(*) - count(DISTINCT c_custkey) AS n_violations,
           CAST(count(*) = count(DISTINCT c_custkey) AS BOOLEAN) AS passed
    FROM customer
    UNION ALL
    SELECT 'orders_customer_fk' AS check_name,
           count(*) AS n_violations,
           CAST(count(*) = 0 AS BOOLEAN) AS passed
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_quantity_range' AS check_name,
           count(*) FILTER (WHERE l_quantity < 0 OR l_quantity > 100) AS n_violations,
           CAST(count(*) FILTER (WHERE l_quantity < 0 OR l_quantity > 100) = 0 AS BOOLEAN) AS passed
    FROM lineitem
    UNION ALL
    SELECT 'events_ts_not_null' AS check_name,
           count(*) - count(ts) AS n_violations,
           CAST(count(*) = count(ts) AS BOOLEAN) AS passed
    FROM events
"""


@register("stats_dq_report", oracle=_DQ_ORACLE)
def stats_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the dbt-tests / Deequ shape): one
    row per constraint — key uniqueness, referential integrity,
    value-range, non-null — with the violation count and a pass flag.
    The report a 100 TB ingest runs before publishing a partition.

    Each check is an aggregate over only the columns it reads (pruned
    scans); the FK check is a broadcast-able anti join that counts
    orphans without materializing them. Checks over the same table can
    fuse into one pass at scale (the stats_column_profile pattern);
    they stay separate here so each row's provenance is one
    self-contained query."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")

    uniq = c.agg(
        (F.count("*") - F.count_distinct("c_custkey")).alias("n_violations")
    ).select(
        F.lit("customer_key_unique").alias("check_name"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
    orphans = (
        o.join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("n_violations"))
        .select(
            F.lit("orders_customer_fk").alias("check_name"),
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
    )
    qty = li.agg(
        F.count(F.when((F.col("l_quantity") < 0) | (F.col("l_quantity") > 100), 1)).alias(
            "n_violations"
        )
    ).select(
        F.lit("lineitem_quantity_range").alias("check_name"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
    ts_nn = e.agg((F.count("*") - F.count("ts")).alias("n_violations")).select(
        F.lit("events_ts_not_null").alias("check_name"),
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
    return uniq.unionByName(orphans).unionByName(qty).unionByName(ts_nn)


# ---------------------------------------------------------------------------
# join_scd2_point_in_time — as-of probe against the SCD2 dimension
# ---------------------------------------------------------------------------

_PIT_ORACLE = """
    WITH chg AS (
      SELECT user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             event_id
      FROM events WHERE event_type = 'purchase'
    ), starts AS (
      SELECT user_id, ts, value, event_id FROM chg
      WHERE prev_value IS NULL OR value <> prev_value
    ), dim AS (
      SELECT user_id, value,
             ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM starts
    ), probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts, d.value AS dim_value
    FROM probes p
    JOIN dim d
      ON d.user_id = p.user_id
     AND d.valid_from <= p.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
"""


@register("join_scd2_point_in_time", oracle=_PIT_ORACLE)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join of a probe stream against the SCD2
    dimension pipeline_scd2_intervals builds: each 'view' event picks
    the purchase-value version valid AT its timestamp. The oracle
    states the declarative form — an interval-containment join — but
    the engine executes the UNION-SORT rewrite: tag versions and
    probes, union them, ONE window per user ordered by
    (ts, versions-first, event_id), and carry the last version value
    forward onto each probe row. Zero join operators, one shuffle of
    probes+versions together — the interval join's per-key O(V·P)
    blow-up (and its banding workarounds) never exists. Version rows
    sort BEFORE probes at equal ts, so a version taking effect exactly
    at the probe instant applies, matching valid_from <= ts; a
    same-instant version pair collapses to the later event_id, exactly
    the zero-length interval the declarative form produces."""
    e = load_table(spark, sf_dir, "events")
    probes = e.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    return point_in_time_join(scd2_versions(e), probes, key="user_id")


def scd2_versions(events: DataFrame) -> DataFrame:
    """Compressed SCD2 version rows of the purchase-value history:
    (user_id, ts, event_id, dim_value), consecutive equal values
    collapsed to their first row. ONE definition shared by the batch
    PIT join and the streaming enrichment (streaming_queries.py
    derives valid_from/valid_to intervals from it) so a tie-break or
    compression change can never desync the two paths."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.where(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id", F.lag("value").over(w).alias("prev_value"), "value"
        )
        .where(F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value")))
        .select("user_id", "ts", "event_id", F.col("value").alias("dim_value"))
    )


def point_in_time_join(versions: DataFrame, probes: DataFrame, key: str) -> DataFrame:
    """Union-sort as-of join: annotate each probe row (columns ``key``,
    ``ts``, ``event_id``) with ``dim_value`` from the latest version row
    (same columns plus ``dim_value``) whose ts <= the probe's ts —
    version rows win ties at equal ts (inclusive valid_from), later
    event_id wins among same-instant versions. Probes with no preceding
    version are dropped (inner semantics). One window, zero joins."""
    return _pit_carried(versions, probes, key).select(
        "event_id", key, "ts", F.col("carried").alias("dim_value")
    )


def _pit_carried(versions: DataFrame, probes: DataFrame, key: str) -> DataFrame:
    """Shared union-sort core: probe rows annotated with the carried
    version value AND the carrying version's ts (for tolerance
    variants). The (vts, dim_value) pair rides in ONE struct so a
    version row whose dim_value is NULL still advances the carry —
    value and timestamp can never desync (a split last(value)/last(ts)
    pair would skip the NULL value but take its timestamp, serving a
    stale value the tolerance check then wrongly passes)."""
    from pyspark.sql import Window

    vtype = versions.schema["dim_value"].dataType.simpleString()
    ttype = versions.schema["ts"].dataType.simpleString()
    v = versions.select(
        key, "ts", "event_id", F.lit(0).alias("pri"),
        F.struct(F.col("ts").alias("vts"), F.col("dim_value")).alias("ver"),
    )
    p = probes.select(
        key, "ts", "event_id", F.lit(1).alias("pri"),
        F.lit(None).cast(
            f"struct<vts:{ttype},dim_value:{vtype}>"
        ).alias("ver"),
    )
    wc = (
        Window.partitionBy(key)
        .orderBy("ts", "pri", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        v.unionByName(p)
        .withColumn("cver", F.last("ver", ignorenulls=True).over(wc))
        .where((F.col("pri") == 1) & F.col("cver").isNotNull())
        .withColumn("carried", F.col("cver.dim_value"))
        .withColumn("carried_ts", F.col("cver.vts"))
    )


_ASOF_TOL_ORACLE = """
    WITH versions AS (
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'purchase'
    ), probes AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
    ), matched AS (
      -- argmax via row_number: DuckDB's max_by lacks struct keys (same
      -- rewrite as the agg_min_max_by oracle)
      SELECT event_id, user_id, ts, dim_value, vts FROM (
        SELECT p.event_id, p.user_id, p.ts, v.value AS dim_value, v.ts AS vts,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts DESC, v.event_id DESC) AS rn
        FROM probes p
        JOIN versions v
          ON v.user_id = p.user_id AND v.ts <= p.ts
      ) WHERE rn = 1
    )
    SELECT event_id, user_id, ts, dim_value
    FROM matched
    WHERE ts - vts <= INTERVAL 2 DAY
"""


@register("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS BOUND (pandas merge_asof(tolerance=)
    semantics): each view event takes the latest preceding purchase
    value, but only if that version is at most 2 days old — stale
    matches drop rather than silently serving outdated state, the
    contract feature stores enforce at serving time. Same union-sort
    core as the PIT join (the carried version's OWN timestamp rides
    along in the window), so the tolerance costs one extra carried
    column, not a join: still zero join operators, one shuffle. The
    oracle states the declarative per-probe-argmax + staleness filter;
    here ties at equal ts go to the version (ts - vts = 0 <= tol), and
    among same-instant versions the later event_id wins — matching the
    oracle's (ts, event_id) argmax exactly."""
    e = load_table(spark, sf_dir, "events")
    versions = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("dim_value")
    )
    probes = e.where(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    carried = _pit_carried(versions, probes, key="user_id")
    return carried.where(
        F.col("ts") - F.col("carried_ts") <= F.expr("INTERVAL 2 DAY")
    ).select("event_id", "user_id", "ts", F.col("carried").alias("dim_value"))


@register(
    "stats_benford_deviation",
    oracle="""
    WITH cents AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             count(*) AS n_obs
      FROM cents GROUP BY 1
    ),
    tot AS (SELECT sum(n_obs) AS n FROM obs)
    SELECT digit, n_obs,
           floor(n_obs * 1000000.0 / n + 0.5) / 1000000 AS obs_frac,
           floor(log10(1.0 + 1.0 / digit) * 1000000 + 0.5) / 1000000 AS benford_frac,
           floor(abs(n_obs * 1.0 / n - log10(1.0 + 1.0 / digit)) * 1000000 + 0.5)
             / 1000000 AS abs_dev
    FROM obs, tot
    """,
)
def stats_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit over order totals — the
    forensic data-quality screen (fabricated, truncated, or
    unit-mangled numeric columns bend away from log10(1 + 1/d); audit
    and DQ suites report the per-digit deviation next to null/range
    profiles). The digit comes from integer cents — floor(x*100 + 0.5)
    is exact int64, and int-to-string is unambiguous on both engines —
    NEVER from casting the double to a string (engine float formatting
    differs) or floor(log10(x)) (exact powers of ten sit on the
    boundary). One map-side-combined aggregation to a 9-row digit
    census; the expected-vs-observed arithmetic runs on those 9 rows
    with the standard floor-quantize ladder."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.where(F.col("o_totalprice") > 0).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("c")
    )
    obs = cents.groupBy(
        F.substring(F.col("c").cast("string"), 1, 1).cast("bigint").alias("digit")
    ).agg(F.count("*").alias("n_obs"))

    obs = obs.transform(pin_cache)
    tot = obs.agg(F.sum("n_obs").alias("n"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        (F.floor(F.col("n_obs") * 1000000.0 / F.col("n") + F.lit(0.5)) / 1000000).alias("obs_frac"),
        (F.floor(benford * 1000000 + F.lit(0.5)) / 1000000).alias("benford_frac"),
        (
            F.floor(
                F.abs(F.col("n_obs") * 1.0 / F.col("n") - benford) * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("abs_dev"),
    )


_INCR_AGG_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
         AS sum_value_q,
       min(value) AS min_value,
       max(value) AS max_value,
       floor(sum(CAST(floor(value * 1000000) AS BIGINT)) * 1.0 / count(*)
             + 0.5) / 1000000 AS avg_value
FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
GROUP BY user_id
"""


@register("pipeline_incremental_agg", oracle=_INCR_AGG_ORACLE)
def pipeline_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: merge a new batch's PARTIAL
    aggregate states into a stored per-key state without recomputing
    history — the nightly-ETL shape that makes a 100 TB rollup
    affordable (the state table is bucketed on the key; only the
    batch shuffles, and the merge cost is batch-sized + one co-located
    join, never a full-history rescan).

    Here the events table is split 80/20 by event_id into "state" and
    "batch", each side aggregates to (count, quantized sum, min, max)
    partials, and a full-outer merge combines them with the explicit
    mergeable-state algebra (counts/sums add; min/max compare with
    NULL-side fallback spelled as CASE, not least()/greatest(), whose
    NULL conventions engines disagree on). THE ORACLE DOES NOT REPLAY
    THE MERGE — it recomputes the aggregate over the whole table in
    one pass, so a green row PROVES the state algebra is mergeable,
    not merely that two engines ran the same plan. Determinism: sums
    add integer-quantized per-row contributions (gram-matrix rule) so
    partial-vs-total addition order cannot move them; min/max are
    selections; the derived mean is one FP op from exact integers,
    floor-quantized at 1e6."""
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.floor(F.col("value") * 1000000).cast("bigint").alias("vq"),
            "value",
        )
    )

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum("vq").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    state = partials(ev.where(F.col("event_id") % 10 < 8))
    batch = partials(ev.where(F.col("event_id") % 10 >= 8))
    o, b = state.alias("o"), batch.alias("b")
    merged = o.join(b, "user_id", "full_outer")

    def pick(cmp):
        a, c = F.col("o.mn"), F.col("b.mn")
        if cmp == "max":
            a, c = F.col("o.mx"), F.col("b.mx")
        return (
            F.when(a.isNull(), c)
            .when(c.isNull(), a)
            .when((a < c) if cmp == "min" else (a > c), a)
            .otherwise(c)
        )

    n = F.coalesce(F.col("o.n"), F.lit(0)) + F.coalesce(F.col("b.n"), F.lit(0))
    s = F.coalesce(F.col("o.s"), F.lit(0)) + F.coalesce(F.col("b.s"), F.lit(0))
    return merged.select(
        "user_id",
        n.cast("bigint").alias("n_events"),
        s.cast("bigint").alias("sum_value_q"),
        pick("min").alias("min_value"),
        pick("max").alias("max_value"),
        (F.floor(s * 1.0 / n + F.lit(0.5)) / 1000000).alias("avg_value"),
    )


@register(
    "pipeline_changelog_compaction",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id, value,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op
      FROM events
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n_ops,
             sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS n_deletes
      FROM log
    )
    SELECT user_id, op AS last_op, ts AS last_ts, value AS last_value,
           CAST(n_ops AS BIGINT) AS n_ops,
           CAST(n_deletes AS BIGINT) AS n_deletes
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def pipeline_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction — the Kafka-log-compaction / CDC-topic
    shape pipeline_upsert_snapshot's single-op MERGE doesn't cover:
    MANY ordered ops per key (I/U/D derived deterministically from
    event_type), keep each key's LAST-writer state, drop keys whose
    final op is a delete tombstone. The op/sequence columns mirror a
    Debezium envelope (op + source offset).

    Scale shape: ONE hash shuffle on the key with everything computed
    as map-side-combinable aggregates — max_by keyed on the
    (ts, event_id) sequence struct picks the last op's full payload
    without a sort or window over the corpus (the same max_by move
    that fixed the SemDeDup argmax). The oracle replays it with a
    window, which is fine at oracle scale."""
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
    )
    seq = F.struct("ts", "event_id")
    last = F.max_by(
        F.struct(op.alias("op"), F.col("ts").alias("ts"), F.col("value").alias("value")),
        seq,
    )
    out = ev.groupBy("user_id").agg(
        last.alias("last"),
        F.count("*").alias("n_ops"),
        F.sum(F.when(op == "D", 1).otherwise(0)).cast("bigint").alias("n_deletes"),
    )
    return out.where(F.col("last.op") != "D").select(
        "user_id",
        F.col("last.op").alias("last_op"),
        F.col("last.ts").alias("last_ts"),
        F.col("last.value").alias("last_value"),
        "n_ops",
        "n_deletes",
    )


_ASOF_NEAREST_ORACLE = """
    WITH versions AS (
      SELECT user_id, ts, event_id, value
      FROM events WHERE event_type = 'purchase'
    ), probes AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
    )
    SELECT event_id, user_id, ts, dim_value, direction FROM (
      SELECT p.event_id, p.user_id, p.ts, v.value AS dim_value,
             CASE WHEN v.ts <= p.ts THEN 'backward' ELSE 'forward' END AS direction,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)),
                        CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END,
                        CASE WHEN v.ts <= p.ts THEN -v.event_id ELSE v.event_id END
             ) AS rn
      FROM probes p
      JOIN versions v ON v.user_id = p.user_id
    ) WHERE rn = 1
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas merge_asof
    direction='nearest'): each view event takes whichever purchase —
    the latest before OR the earliest after — sits closest in time,
    ties preferring the backward match (the value that was actually
    current), and same-instant ties resolving by the backward rule's
    latest event_id / the forward rule's earliest. Shape: the SAME
    union-sort core as the PIT/tolerance rungs run TWICE over one
    partitioned relation — a backward pass (ts asc; versions sort
    before probes at equal ts, so the current-instant version is
    visible) and a forward pass (ts desc; probes sort first, making
    the bound STRICTLY after) — then a per-probe projection picks the
    closer side. Two window sorts over one hash partitioning, ZERO
    join operators, no per-probe candidate expansion anywhere; the
    oracle states the declarative per-probe argmin over both
    directions."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    vtype = "double"
    ttype = e.schema["ts"].dataType.simpleString()
    v = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(0).alias("pri"),
        F.struct(
            F.col("ts").alias("vts"), F.col("value").alias("dim_value")
        ).alias("ver"),
    )
    p = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.lit(1).alias("pri"),
        F.lit(None).cast(f"struct<vts:{ttype},dim_value:{vtype}>").alias("ver"),
    )
    u = v.unionByName(p)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "pri", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("pri").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = (
        u.withColumn("bwd", F.last("ver", ignorenulls=True).over(wb))
        .withColumn("fwd", F.last("ver", ignorenulls=True).over(wf))
        .where(F.col("pri") == 1)
    )
    # distances in MICROSECONDS (unix_micros) — a cast to long is epoch
    # SECONDS in Spark, and truncating each endpoint before subtracting
    # is not the same as comparing the true sub-second distances the
    # oracle's epoch_us uses
    bd = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("bwd.vts"))
    fd = F.unix_micros(F.col("fwd.vts")) - F.unix_micros(F.col("ts"))
    pick_fwd = F.col("bwd").isNull() | (
        F.col("fwd").isNotNull() & (fd < bd)
    )
    return both.where(
        F.col("bwd").isNotNull() | F.col("fwd").isNotNull()
    ).select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_fwd, F.col("fwd.dim_value"))
        .otherwise(F.col("bwd.dim_value"))
        .alias("dim_value"),
        F.when(pick_fwd, F.lit("forward")).otherwise(F.lit("backward")).alias(
            "direction"
        ),
    )
