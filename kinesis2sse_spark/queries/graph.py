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

from kinesis2sse_spark.queries.llm_dedup import _ORACLE_CLUSTER_CTE, JACCARD_THRESHOLD
from kinesis2sse_spark.registry import register

# Near-dup pairs with EXACTLY dedup_ngram_jaccard's oracle semantics
# (exact-duplicate collapse + sliced postings + fan-out) — built from
# the same CTE fragments so the edge definition can never drift from
# the pair operator it consumes.
_PAIRS_CTES = f"""
    {_ORACLE_CLUSTER_CTE},
    repscore AS (
      SELECT doc_a, doc_b
      FROM inter i
      JOIN counts na ON na.doc_id = i.doc_a
      JOIN counts nb ON nb.doc_id = i.doc_b
      WHERE i.c * 1.0 / (na.n + nb.n - i.c) >= {JACCARD_THRESHOLD}
    ),
    pairs AS (
      SELECT least(ma.doc_id, mb.doc_id) AS doc_a,
             greatest(ma.doc_id, mb.doc_id) AS doc_b
      FROM repscore r
      JOIN mem ma ON ma.rep_id = r.doc_a
      JOIN mem mb ON mb.rep_id = r.doc_b
      UNION ALL
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM mem a
      JOIN mem b ON a.rep_id = b.rep_id AND a.doc_id < b.doc_id
      JOIN toks t ON t.doc_id = a.rep_id
      WHERE len(t.t) >= 3
    )
"""


def connected_components(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Min-label connected components over an undirected edge list
    (columns ``a``, ``b``; both directions need not be present).

    Each round does (1) a neighbor-min propagation and (2) a pointer
    jump (``label <- label(label)``), so chain depth HALVES per round:
    convergence is O(log diameter) shuffles, not the O(diameter) of
    plain label propagation — the difference between ~40 rounds and an
    unbounded loop on a pathological 100 TB path graph. ``max_rounds``
    defaults to 64, enough for any graph with < 2**64 nodes under
    doubling; a non-converged loop raises instead of running forever.
    The driver holds only a per-round convergence count; labels stay
    distributed (cached per round, unpersisted after use)."""
    und = (
        edges.select(F.col("a").cast("long").alias("a"), F.col("b").cast("long").alias("b"))
        .unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .cache()
    )
    labels = (
        und.select(F.col("a").alias("node")).distinct().withColumn("label", F.col("node"))
    ).cache()
    for _ in range(max_rounds):
        # (1) propagate: each node adopts the min label among itself
        # and its neighbors
        neighbor_min = (
            und.join(labels, und.a == labels.node)
            .groupBy(F.col("b").alias("node2"))
            .agg(F.min("label").alias("nlabel"))
        )
        propagated = labels.join(
            neighbor_min, labels.node == neighbor_min.node2, "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce("nlabel", F.col("label"))).alias("label"),
        )
        # (2) shortcut: follow one hop up the label tree. Labels only
        # ever decrease, so label(label(n)) <= label(n); combined with
        # (1) this is pointer doubling and depth halves every round.
        #
        # localCheckpoint, not cache: the self-join references
        # `propagated` TWICE, so the logical plan would double per
        # round — cache() truncates execution but Catalyst still
        # re-analyzes the full lineage, and analysis time goes
        # exponential by ~round 4. Eager localCheckpoint materializes
        # AND truncates the plan, keeping every round O(1) to analyze.
        # (On a real cluster prefer sc.setCheckpointDir + .checkpoint()
        # for fault tolerance; localCheckpoint trades that for speed.)
        new_labels = (
            propagated.alias("x")
            .join(
                propagated.select(
                    F.col("node").alias("lnode"), F.col("label").alias("llabel")
                ),
                F.col("x.label") == F.col("lnode"),
                "left",
            )
            .select(
                F.col("x.node").alias("node"),
                F.coalesce("llabel", F.col("x.label")).alias("label"),
            )
            .localCheckpoint(eager=True)
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
            und.unpersist()
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    und.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


@register(
    "dedup_connected_components",
    oracle=f"""
    WITH RECURSIVE {_PAIRS_CTES},
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
    canonical id (keep-one policy = keep cluster_id). Pointer-doubling
    min-label propagation — O(log diameter) shuffles, capped (see
    connected_components)."""
    from kinesis2sse_spark.queries.llm_dedup import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    return connected_components(pairs)
