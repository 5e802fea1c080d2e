"""PageRank (operators/graph.py): numpy parity, mass conservation."""

from __future__ import annotations

import numpy as np

from etl_demos_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n, iters, d=0.85):
    A = np.zeros((n, n))
    for s, t in edges:
        A[s, t] = 1
    deg = A.sum(1)
    r = np.full(n, 1 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s in range(n):
            if deg[s]:
                contrib += d * r[s] * A[s] / deg[s]
        dang = r[deg == 0].sum()
        r = (1 - d) / n + d * dang / n + contrib
    return r


def test_pagerank_matches_numpy_with_dangling_node(spark):
    # cycle + feeder + dangling sink (node 4 has no out-edges)
    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
    df = spark.createDataFrame(E, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=15).collect()}
    ref = _numpy_pagerank(E, 5, 15)
    assert max(abs(got[i] - ref[i]) for i in range(5)) < 1e-9
    # stochastic completion: total mass conserved every run
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the hub everything points at ranks first
    assert max(got, key=got.get) == 2


def test_pagerank_duplicate_edges_count_once(spark):
    E = [(0, 1), (0, 1), (1, 0)]
    df = spark.createDataFrame(E, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    ref = _numpy_pagerank([(0, 1), (1, 0)], 2, 10)
    assert max(abs(got[i] - ref[i]) for i in range(2)) < 1e-9


def test_flatten_hierarchy_chain_and_forest(spark):
    """Pointer jumping resolves a depth-20 chain (log-round doubling)
    and keeps separate trees separate; roots are their own fixpoint."""
    from etl_demos_spark.operators.graph import flatten_hierarchy

    rows = [(0, None)] + [(i, i - 1) for i in range(1, 21)]  # chain 0..20
    rows += [(100, None), (101, 100), (102, 100), (103, 101)]  # small tree
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {
        r["node"]: (r["root"], r["depth"])
        for r in flatten_hierarchy(df, "node", "parent").collect()
    }
    for i in range(21):
        assert got[i] == (0, i)
    assert got[100] == (100, 0)
    assert got[101] == (100, 1)
    assert got[102] == (100, 1)
    assert got[103] == (100, 2)


def test_label_propagation_two_planted_cliques(spark):
    """Two 5-cliques joined by one bridge edge: LPA must label each
    clique with its smallest member id, and the bridge must not merge
    them (a clique's internal majority beats one cross-edge). Result
    identical under repartitioning (synchronous + min-tie-break =
    order-free)."""
    from etl_demos_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(5) for b in range(5) if a < b]
    c2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    edges = c1 + c2 + [(4, 10)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=4).collect()
    }
    assert {got[n] for n in range(5)} == {0}
    assert {got[n] for n in range(10, 15)} == {10}
    got2 = {
        r["node"]: r["community"]
        for r in label_propagation(df.repartition(7), iters=4).collect()
    }
    assert got == got2


def test_label_propagation_matches_python_reference(spark):
    """Synchronous LPA pinned move-for-move against a first-principles
    Python sweep on an irregular graph (ring + chords): every round's
    (majority, min-label) choice must agree."""
    from collections import Counter

    from etl_demos_spark.operators.graph import label_propagation

    edges = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (3, 9), (2, 7)]
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        new = {}
        for n, ns in adj.items():
            cnt = Counter(labels[m] for m in ns)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=3).collect()
    }
    assert got == labels


def test_bfs_distances_matches_python_reference(spark):
    """Path + branch + unreachable island; 3-hop bound. Reference is a
    textbook frontier BFS over the same undirected edges."""
    from collections import deque

    from etl_demos_spark.operators.graph import bfs_distances

    E = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (100, 101)]
    adj: dict[int, list[int]] = {}
    for a, b in E:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    ref = {0: 0}
    q = deque([0])
    while q:
        u = q.popleft()
        if ref[u] >= 3:
            continue
        for v in adj[u]:
            if v not in ref:
                ref[v] = ref[u] + 1
                q.append(v)
    edges = spark.createDataFrame(E, "a long, b long")
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, iters=3).collect()
    }
    assert got == ref  # exact: hop-bounded reachable set and distances
    # nodes 4 (hop 4) and the 100-101 island must be absent
    assert 4 not in got and 100 not in got and 101 not in got


def test_bfs_distances_multi_source_takes_min(spark):
    from etl_demos_spark.operators.graph import bfs_distances

    # line 0-1-2-3-4 with seeds at both ends: dist = min(from 0, from 4)
    E = [(i, i + 1) for i in range(4)]
    edges = spark.createDataFrame(E, "a long, b long")
    seeds = spark.createDataFrame([(0,), (4,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, seeds, iters=4).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 0}


def test_flatten_hierarchy_keeps_dangling_parents(spark):
    from etl_demos_spark.operators.graph import flatten_hierarchy

    nodes = spark.createDataFrame(
        [(1, 99), (2, 1), (3, None)], "id long, parent long"
    )
    got = {r["node"]: (r["root"], r["depth"])
           for r in flatten_hierarchy(nodes, "id", "parent").collect()}
    # node 1's parent 99 has no row: 1 surfaces with root=99, not dropped
    assert got[1] == (99, 1)
    assert got[2] == (99, 2)
    assert got[3] == (3, 0)


def test_pagerank_empty_edges_returns_empty(spark):
    from etl_demos_spark.operators.graph import pagerank

    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e, iters=2).count() == 0


def test_graph_single_task_and_iterative_paths_identical(spark):
    """The size-routed single-task numpy replay and the distributed
    iterative rounds must be value-identical (pagerank: bit-identical
    doubles) on a random irregular graph — cliques, a long chain, a
    hub, dangling/isolated structure, duplicate + reversed edges."""
    import random

    from etl_demos_spark.operators.graph import (
        bfs_distances,
        label_propagation,
        pagerank,
    )

    rng = random.Random(13)
    E = []
    for c in range(6):  # cliques of 5
        ids = [c * 5 + i for i in range(5)]
        E += [(a, b) for a in ids for b in ids if a < b]
    E += [(100 + i, 101 + i) for i in range(15)]  # chain
    E += [(200, 300 + i) for i in range(8)]  # hub
    E += [(400, 401), (1, 100), (29, 200)]
    E += E[:9]  # duplicates
    E = [(b, a) if rng.random() < 0.4 else (a, b) for a, b in E]
    rng.shuffle(E)
    df = spark.createDataFrame(E, "a long, b long")

    # pagerank (directed, src/dst cols)
    pr = df.selectExpr("a as src", "b as dst")
    fast = {r["node"]: r["rank"] for r in pagerank(pr, iters=6, single_task_edge_cap=10**9).collect()}
    slow = {r["node"]: r["rank"] for r in pagerank(pr, iters=6, single_task_edge_cap=0).collect()}
    assert fast == slow  # bit-identical doubles by construction

    fast = {r["node"]: r["community"] for r in label_propagation(df, iters=3, single_task_edge_cap=10**9).collect()}
    slow = {r["node"]: r["community"] for r in label_propagation(df, iters=3, single_task_edge_cap=0).collect()}
    assert fast == slow

    seeds = spark.createDataFrame([(0,), (107,)], "node long")
    fast = {r["node"]: r["dist"] for r in bfs_distances(df, seeds, iters=4, single_task_edge_cap=10**9).collect()}
    slow = {r["node"]: r["dist"] for r in bfs_distances(df, seeds, iters=4, single_task_edge_cap=0).collect()}
    assert fast == slow


def test_bfs_seed_only_and_empty_routes(spark):
    """Fast-path edge cases: a seed not present in any edge appears at
    dist 0; an empty seed set yields an empty result."""
    from etl_demos_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(1, 2)], "a long, b long")
    seeds = spark.createDataFrame([(99,)], "node long")
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, iters=3).collect()}
    assert got == {99: 0}
    empty_seeds = seeds.filter("node < 0")
    assert bfs_distances(edges, empty_seeds, iters=3).count() == 0


def test_flatten_hierarchy_paths_identical(spark):
    """Single-task numpy replay vs distributed pointer jumping — same
    (root, depth) fixpoint on a forest with deep chains, dangling
    parents, and roots."""
    rows = []
    # chain of depth 20 under root 0
    rows.append((0, None))
    rows += [(i, i - 1) for i in range(1, 21)]
    # star under 100, dangling parent 999 for 200-202
    rows.append((100, None))
    rows += [(100 + i, 100) for i in range(1, 6)]
    rows += [(200 + i, 999) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, parent long")

    from etl_demos_spark.operators.graph import flatten_hierarchy

    fast = {r["node"]: (r["root"], r["depth"])
            for r in flatten_hierarchy(df, "id", "parent", single_task_node_cap=10**9).collect()}
    slow = {r["node"]: (r["root"], r["depth"])
            for r in flatten_hierarchy(df, "id", "parent", single_task_node_cap=0).collect()}
    assert fast == slow
    assert fast[20] == (0, 20) and fast[105] == (100, 1)
    assert fast[201] == (999, 1)  # dangling parent kept, not resolved


def test_flatten_hierarchy_duplicate_ids_decline_fast_path(spark):
    """Duplicate ids must route to the distributed path (the fast path
    cannot replicate the hop join's row multiplication); both paths
    then agree trivially because only the distributed one runs."""
    df = spark.createDataFrame(
        [(1, None), (2, 1), (2, 1)], "id long, parent long"
    )
    from etl_demos_spark.operators.graph import flatten_hierarchy

    out = flatten_hierarchy(df, "id", "parent", single_task_node_cap=10**9)
    assert out.count() == 3  # dup rows preserved, as before


def test_flatten_hierarchy_self_parent_root_paths_identical(spark):
    """Self-parent roots (parent == id, non-null — a common root
    convention): the final round's depth update must be APPLIED on both
    paths (the distributed loop assigns state before breaking). The
    numpy replay previously broke before the assignment and returned
    depth 1 where the distributed path returns depth 2."""
    from etl_demos_spark.operators.graph import flatten_hierarchy

    rows = [(1, 1), (2, 1), (3, 2), (10, None), (11, 10)]
    df = spark.createDataFrame(rows, "id long, parent long")
    fast = {r["node"]: (r["root"], r["depth"])
            for r in flatten_hierarchy(df, "id", "parent",
                                       single_task_node_cap=10**9).collect()}
    slow = {r["node"]: (r["root"], r["depth"])
            for r in flatten_hierarchy(df, "id", "parent",
                                       single_task_node_cap=0).collect()}
    assert fast == slow
    # plain roots are unaffected by the fix
    assert fast[10] == (10, 0) and fast[11] == (10, 1)


def test_graph_null_edges_decline_fast_path(spark):
    """Null edge endpoints must route to the distributed path on every
    operator (the numpy fast path cannot represent them): output with a
    huge cap (fast-eligible) must equal output with cap 0 (forced
    distributed) — if the fast path ran it would crash on the NaN→int64
    conversion or silently diverge."""
    from etl_demos_spark.operators.graph import (
        bfs_distances,
        label_propagation,
        pagerank,
    )

    E = [(0, 1), (1, 2), (None, 3), (4, None)]
    pr = spark.createDataFrame(E, "src long, dst long")
    fast = {r["node"]: r["rank"]
            for r in pagerank(pr, iters=4, single_task_edge_cap=10**9).collect()}
    slow = {r["node"]: r["rank"]
            for r in pagerank(pr, iters=4, single_task_edge_cap=0).collect()}
    assert fast == slow

    lp = spark.createDataFrame(E, "a long, b long")
    fast = {r["node"]: r["community"]
            for r in label_propagation(lp, iters=3, single_task_edge_cap=10**9).collect()}
    slow = {r["node"]: r["community"]
            for r in label_propagation(lp, iters=3, single_task_edge_cap=0).collect()}
    assert fast == slow

    seeds = spark.createDataFrame([(0,)], "node long")
    fast = {r["node"]: r["dist"]
            for r in bfs_distances(lp, seeds, iters=3, single_task_edge_cap=10**9).collect()}
    slow = {r["node"]: r["dist"]
            for r in bfs_distances(lp, seeds, iters=3, single_task_edge_cap=0).collect()}
    assert fast == slow


def test_bfs_null_seed_paths_identical(spark):
    """A null seed yields exactly one (null, 0) row on both paths (the
    distributed dist table starts from sources.distinct(); the fast
    path carries the null seed in-task via the nn flag)."""
    from etl_demos_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame([(0, 1), (1, 2)], "a long, b long")
    seeds = spark.createDataFrame([(0,), (None,), (None,)], "node long")
    fast = {r["node"]: r["dist"]
            for r in bfs_distances(edges, seeds, iters=3, single_task_edge_cap=10**9).collect()}
    slow = {r["node"]: r["dist"]
            for r in bfs_distances(edges, seeds, iters=3, single_task_edge_cap=0).collect()}
    assert fast == slow
    assert fast[None] == 0 and fast[2] == 2
