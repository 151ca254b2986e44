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
from tests.conftest import SF_SMOKE


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


def test_triangle_counts_match_bruteforce(spark):
    """Degree-ordered orientation must count each triangle exactly once
    per corner — checked against an itertools brute force on seeded
    random graphs (cliques appear at the denser settings)."""
    import itertools
    import random

    from kinesis2sse_spark.queries.graph import triangle_counts

    rng = random.Random(0xBEEF)
    for n_nodes, n_edges in [(12, 30), (20, 40), (8, 28)]:
        edges = {
            tuple(sorted((rng.randrange(n_nodes), rng.randrange(n_nodes))))
            for _ in range(n_edges)
        }
        edges = {(a, b) for a, b in edges if a != b}
        eset = set(edges)
        want: dict[int, int] = {}
        for x, y, z in itertools.combinations(range(n_nodes), 3):
            if (x, y) in eset and (x, z) in eset and (y, z) in eset:
                for v in (x, y, z):
                    want[v] = want.get(v, 0) + 1
        df = spark.createDataFrame(sorted(edges), "a long, b long")
        got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
        assert got == want, (sorted(edges), got, want)


def test_pagerank_matches_python_model(spark):
    """The unrolled DataFrame loop must agree with a literal per-node
    Python replay of the same recurrence (damping 0.85, 3 iterations)
    to within the DECIMAL(27,15) contribution quantization."""
    import random

    from kinesis2sse_spark.queries.graph import pagerank

    rng = random.Random(0xFEED)
    edges = {
        tuple(sorted((rng.randrange(15), rng.randrange(15))))
        for _ in range(35)
    }
    edges = sorted({(a, b) for a, b in edges if a != b})
    und: dict[int, set[int]] = {}
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    n = len(und)
    rank = {v: 1.0 / n for v in und}
    for _ in range(3):
        rank = {
            v: 0.15 / n + 0.85 * sum(rank[u] / len(und[u]) for u in und[v])
            for v in und
        }
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["rank"] for r in pagerank(df, 3).collect()}
    assert set(got) == set(rank)
    for v in rank:
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])
    # ranks are a probability mass: they must sum to ~1
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_label_propagation_matches_python_model(spark):
    """The unrolled vote-and-argmax loop must agree with a literal
    synchronous Python replay of the same update (modal neighbor
    label, ties to the lowest label) on seeded random graphs."""
    import random

    from kinesis2sse_spark.queries.graph import label_propagation

    rng = random.Random(0xFACADE)
    for n_nodes, n_edges, iters in [(20, 30, 4), (30, 25, 3), (12, 40, 5)]:
        edges = sorted(
            {
                tuple(sorted((rng.randrange(n_nodes), rng.randrange(n_nodes))))
                for _ in range(n_edges)
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        und: dict[int, set[int]] = {}
        for a, b in edges:
            und.setdefault(a, set()).add(b)
            und.setdefault(b, set()).add(a)
        labels = {v: v for v in und}
        for _ in range(iters):
            nxt = {}
            for v in und:
                counts: dict[int, int] = {}
                for u in und[v]:
                    counts[labels[u]] = counts.get(labels[u], 0) + 1
                nxt[v] = min(
                    counts, key=lambda lbl: (-counts[lbl], lbl)
                )
            labels = nxt
        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iters).collect()
        }
        assert got == labels, (edges, got, labels)


def test_label_propagation_refines_connected_components(spark):
    """On the fixture near-dup graph every LPA community must sit
    inside ONE connected component (labels only travel along edges),
    and every community id must be a member of its own community's
    component — the structural sanity contract between the two
    operators."""
    from kinesis2sse_spark.registry import all_queries

    qs = all_queries()
    cc = {
        r["doc_id"]: r["cluster_id"]
        for r in qs["dedup_connected_components"](spark, SF_SMOKE).collect()
    }
    lpa = {
        r["doc_id"]: r["community_id"]
        for r in qs["graph_label_propagation"](spark, SF_SMOKE).collect()
    }
    assert set(lpa) == set(cc)
    for doc, comm in lpa.items():
        assert cc[comm] == cc[doc], (doc, comm)


def test_cluster_histogram_consistent_with_components(spark):
    """The size-of-sizes histogram must reconcile exactly with the CC
    label relation: per-size cluster counts, doc totals, and the
    keep-one removal count (docs - clusters)."""
    import collections

    from kinesis2sse_spark.registry import all_queries

    qs = all_queries()
    labels = qs["dedup_connected_components"](spark, SF_SMOKE).collect()
    sizes = collections.Counter(
        collections.Counter(r["cluster_id"] for r in labels).values()
    )
    hist = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["n_removable"])
        for r in qs["dedup_cluster_histogram"](spark, SF_SMOKE).collect()
    }
    assert {s: c for s, (c, _, _) in hist.items()} == dict(sizes)
    for s, (c, nd, nr) in hist.items():
        assert nd == s * c and nr == (s - 1) * c
    assert sum(nd for _, nd, _ in hist.values()) == len(labels)


def test_bfs_hops_distances_horizon_and_unreachable(spark):
    """BFS from the 5 lowest node ids over a known shape: exact hop
    distances on a path + cycle, a node past the horizon excluded, and
    a disconnected far component unreached (absent, not infinite)."""
    from kinesis2sse_spark.queries.graph import bfs_hops

    # seeds will be {0,1,2,3,4}: 0-1-2-3-4 path, plus a tail
    # 4-10-11-...-14 (hops 1..4 from seed 4), a cycle 0-20-21-0, and a
    # disconnected component 100-101.
    edges = (
        [(i, i + 1) for i in range(4)]
        + [(4, 10), (10, 11), (11, 12), (12, 13), (13, 14)]
        + [(0, 20), (20, 21), (21, 0)]
        + [(100, 101)]
    )
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["hops"] for r in bfs_hops(df, n_seeds=5, max_hops=3).collect()}
    want = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 1, 11: 2, 12: 3,
            20: 1, 21: 1}
    assert got == want  # 13,14 beyond horizon; 100,101 unreachable


def test_bfs_frontier_drains_before_horizon(spark):
    """On a tiny component the loop stops when the frontier empties —
    every node gets its exact distance even with a huge horizon."""
    from kinesis2sse_spark.queries.graph import bfs_hops

    df = spark.createDataFrame([(0, 1), (1, 2)], "a long, b long")
    got = {r["node"]: r["hops"] for r in bfs_hops(df, n_seeds=1, max_hops=16).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_random_graphs_bfs_matches_python_model(spark):
    """Frontier BFS must agree with a driver-side BFS model on arbitrary
    graph shapes and seed/horizon combinations — seeded RNG, three
    densities, two horizons."""
    import collections
    import random

    rng = random.Random(0xBF5)
    from kinesis2sse_spark.queries.graph import bfs_hops

    for n_nodes, n_edges in [(30, 15), (40, 60), (25, 5)]:
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        nodes = sorted(adj)
        for n_seeds, max_hops in [(3, 2), (5, 16)]:
            seeds = nodes[:n_seeds]
            want = {s: 0 for s in seeds}
            frontier = list(seeds)
            for d in range(1, max_hops + 1):
                nxt = {
                    v for u in frontier for v in adj[u] if v not in want
                }
                if not nxt:
                    break
                for v in nxt:
                    want[v] = d
                frontier = list(nxt)
            got = {
                r["node"]: r["hops"]
                for r in bfs_hops(
                    spark.createDataFrame(edges, "a long, b long"),
                    n_seeds=n_seeds,
                    max_hops=max_hops,
                ).collect()
            }
            assert got == want, (n_nodes, n_edges, n_seeds, max_hops)


def test_coreness_matches_peeling_model_on_random_graphs(spark):
    """Iterated h-index coreness vs a literal Python peeling model
    (repeatedly remove min-degree nodes) on seeded random graphs,
    including a clique-plus-tail shape where coreness and triangle
    membership disagree."""
    import random

    from kinesis2sse_spark.queries.graph import coreness

    def model(edge_list):
        adj: dict = {}
        for a, b in edge_list:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        core = {}
        deg = {v: len(ns) for v, ns in adj.items()}
        alive = set(adj)
        k = 0
        while alive:
            k = max(k, min(deg[v] for v in alive))
            peel = [v for v in alive if deg[v] <= k]
            while peel:
                v = peel.pop()
                if v not in alive:
                    continue
                core[v] = k
                alive.discard(v)
                for u in adj[v]:
                    if u in alive:
                        deg[u] -= 1
                        if deg[u] <= k:
                            peel.append(u)
        return core

    rng = random.Random(7)
    cases = []
    # clique of 5 + tail chain + separate 4-cycle
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    tail = [(4, 10), (10, 11), (11, 12)]
    cyc = [(20, 21), (21, 22), (22, 23), (23, 20)]
    cases.append(clique + tail + cyc)
    for _ in range(3):
        n = 30
        es = {tuple(sorted(rng.sample(range(n), 2))) for _ in range(60)}
        cases.append(sorted(es))
    from kinesis2sse_spark.queries.graph import KCORE_ITERS

    for edge_list in cases:
        df = spark.createDataFrame(edge_list, "a long, b long")
        # the SHIPPED iteration count must already be converged here
        got = {r["node"]: r["c"] for r in coreness(df, KCORE_ITERS).collect()}
        want = model(edge_list)
        assert got == want
