"""Scalar function families — string, date/time, math, array, map, JSON,
conditionals and predicate forms (IN / BETWEEN / LIKE / null-safe eq).

All JVM-side built-ins (whole-stage codegen) — no Python UDFs in any of
these paths. Oracle caveats handled per-query: libm functions (exp/ln)
are rounded; regex dialects kept to the common subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table
from kinesis2sse_spark.registry import register


@register(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_name, '#', c_mktsegment) AS tagged,
           replace(c_name, 'Customer', 'Cust') AS renamed,
           trim(concat(' ', c_name, ' ')) AS trimmed,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           split_part(c_name, '#', 1) AS first_part,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded
    FROM customer
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat("c_name", F.lit("#"), "c_mktsegment").alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("renamed"),
        F.trim(F.concat(F.lit(" "), "c_name", F.lit(" "))).alias("trimmed"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.split_part("c_name", F.lit("#"), F.lit(1)).alias("first_part"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
    )


@register(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           CAST(dayofmonth(o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95,
           strftime(o_orderdate, '%Y-%m-%d') AS iso_day,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_sec
    FROM orders
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6) AS abs_d,
           CAST(floor(l_quantity) AS BIGINT) AS floor_q,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q7,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           round(ln(l_extendedprice + 1), 6) AS ln_price,
           round(pow(l_discount, 2), 6) AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS mod7,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_d"),
        F.floor("l_quantity").alias("floor_q"),
        F.ceil(F.col("l_quantity") / 7).alias("ceil_q7"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.pow("l_discount", F.lit(2)), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).alias("mod7"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
    )


@register(
    "scalar_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 50), ' '))), ',')
             AS sorted_prefix_vocab
    FROM documents
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops on tokenized text. Array-valued outputs are serialized to
    a canonical string so the hash comparison is representation-stable."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks.getItem(0).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_join(
            F.array_sort(F.array_distinct(F.split(F.substring("text", 1, 50), " "))), ","
        ).alias("sorted_prefix_vocab"),
    )


@register(
    "scalar_array_lambda",
    oracle="""
    SELECT vec_id,
           round(list_aggregate(embedding, 'sum'), 6) AS vec_sum,
           round(list_aggregate(list_transform(embedding, x -> x * x), 'sum'), 6) AS vec_sq_sum,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def scalar_array_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) — the
    JVM-side way to do vector math without leaving codegen."""
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 6).alias("vec_sum"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x), 6).alias("vec_sq_sum"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.k') AS k_str,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.when(F.from_json("props", "map<string,string>").isNotNull(), 1)
        .otherwise(0)
        .alias("is_valid"),
    )


@register(
    "scalar_encoding",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name) AS name_sha256,
           upper(hex(encode(c_name))) AS name_hex,
           to_base64(encode(c_name)) AS name_b64
    FROM customer
    """,
)
def scalar_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing/encoding functions — content keys, cache keys, wire formats."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(F.encode("c_name", "utf-8")).alias("name_md5"),
        F.sha2(F.encode("c_name", "utf-8"), 256).alias("name_sha256"),
        F.hex(F.encode("c_name", "utf-8")).alias("name_hex"),
        F.base64(F.encode("c_name", "utf-8")).alias("name_b64"),
    )


@register(
    "scalar_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS missing
    FROM events
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType (Spark 4): parse props once into a variant and extract
    typed paths — the schemaless-detail storage option of SURVEY.md §1.2
    (preference 2) with binary-encoded, pushdown-friendly access."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing"),
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 150000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           least(o_totalprice, 100000.0) AS capped,
           greatest(o_custkey % 10, 5) AS floor5,
           (o_orderstatus IS NOT DISTINCT FROM 'F') AS is_f_nullsafe
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.least("o_totalprice", F.lit(100000.0)).alias("capped"),
        F.greatest(F.col("o_custkey") % 10, F.lit(5)).alias("floor5"),
        F.col("o_orderstatus").eqNullSafe("F").alias("is_f_nullsafe"),
    )


@register(
    "predicate_forms",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 10000 AND 250000
      AND o_orderpriority LIKE '%URGENT%'
    """,
)
def predicate_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE — all pushed into the parquet scan by Catalyst
    (visible as PushedFilters in explain)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice").filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(10000, 250000)
        & F.col("o_orderpriority").like("%URGENT%")
    )


@register(
    "scalar_map",
    oracle="""
    SELECT event_id,
           'k' AS first_key,
           CAST(json_extract(props, '$.k') AS VARCHAR) AS first_val
    FROM events
    WHERE json_valid(props)
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: parse props into a map, then explode keys/values
    back to scalars (map-typed output would not hash portably)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select("event_id", m.alias("m"))
        .filter(F.col("m").isNotNull())
        .select(
            "event_id",
            F.map_keys("m").getItem(0).alias("first_key"),
            F.map_values("m").getItem(0).alias("first_val"),
        )
    )


@register(
    "scalar_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255 AS lo_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, 21845) AS toggled,
           event_id << 2 AS shl,
           event_id >> 3 AS shr,
           CAST(bit_count(event_id) AS BIGINT) AS popcount
    FROM events
    WHERE event_id < 1000
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators — masks, xor, shifts, popcount. All JVM-side
    whole-stage-codegen expressions; the filter pushes to the scan."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.expr("event_id & 255").alias("lo_byte"),
        F.expr("event_id | 4096").alias("with_flag"),
        F.expr("event_id ^ 21845").alias("toggled"),
        F.shiftleft("event_id", 2).alias("shl"),
        F.shiftright("event_id", 3).alias("shr"),
        F.bit_count("event_id").cast("bigint").alias("popcount"),
    )
