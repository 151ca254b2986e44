"""Iterative/graph operators: connected components over the near-dup pair
graph — the canonical "collapse duplicate clusters" step after pair
generation in an LLM dedup pipeline.

Spark side: label propagation to a fixpoint (driver-controlled loop over
DataFrame joins — each iteration is one shuffle; iteration count is
O(graph diameter), tiny for near-dup clusters). The oracle replays the
same closure with a recursive CTE, so even this iterative operator is
value-checked, not just rows-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis2sse_spark.registry import register

# near-dup pairs (the dedup_ngram_jaccard oracle) as an embeddable subquery
_PAIRS_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) u
      WHERE len(t) >= 3
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b
    FROM inter i
    JOIN counts na ON na.doc_id = i.doc_a
    JOIN counts nb ON nb.doc_id = i.doc_b
    WHERE i.c * 1.0 / (na.n + nb.n - i.c) >= 0.5
"""


@register(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS x FROM edges),
    cc(node, label) AS (
      SELECT x, x FROM nodes
      UNION
      SELECT e.b, cc.label FROM cc JOIN edges e ON e.a = cc.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM cc GROUP BY node
    """,
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the Jaccard>=0.5 near-dup graph: every doc
    in a duplicate cluster gets the cluster's minimum doc_id as its
    canonical id (keep-one policy = keep cluster_id). Min-label
    propagation converges in O(diameter) shuffles."""
    from kinesis2sse_spark.queries.llm_dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).cache()
    while True:
        # one propagation round: each node adopts the min label among
        # itself and its neighbors
        neighbor_min = (
            edges.join(labels, edges.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.node2, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
            )
            .cache()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
