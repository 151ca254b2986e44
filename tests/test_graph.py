"""connected_components scale-hardening: the pointer-doubling loop must
converge in O(log diameter) rounds, so a pathological long chain — the
worst case for plain label propagation, which needs O(diameter) full
edge joins — finishes in a handful of shuffles, and a non-converging
loop raises instead of running unbounded (the r04 verdict's 100 TB
concern)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis2sse_spark.queries.graph import connected_components


def _chain_edges(spark, n):
    # path graph 0-1-2-...-n: diameter n
    return spark.range(n).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )


def test_long_chain_converges_in_log_rounds(spark):
    # diameter-100 chain: plain label propagation needs ~100 rounds;
    # pointer doubling must land it within 10 (2^10 >> 100, with slack
    # for the propagate/shortcut interleaving)
    edges = _chain_edges(spark, 100)
    labels = connected_components(edges, max_rounds=10)
    rows = labels.collect()
    assert len(rows) == 101
    assert {r["cluster_id"] for r in rows} == {0}


def test_two_components_and_singleton_edges(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 20)],
        "a long, b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_non_convergence_raises_instead_of_spinning(spark):
    edges = _chain_edges(spark, 64)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=1)


def test_random_graphs_match_union_find(spark):
    """Pointer doubling must agree with a driver-side union-find model on
    arbitrary graph shapes (stars, cycles, bridges, singletons), not
    just the chain fixture — seeded RNG, three graph densities."""
    import random

    rng = random.Random(0xC0FFEE)
    for n_nodes, n_edges in [(30, 15), (40, 60), (25, 5)]:
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        # union-find model
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = sorted({v for e in edges for v in e})
        want = {}
        for v in touched:
            root = find(v)
            want[v] = min(u for u in touched if find(u) == root)

        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                spark.createDataFrame(edges, "a long, b long")
            ).collect()
        }
        assert got == want, f"divergence on graph ({n_nodes},{n_edges})"
