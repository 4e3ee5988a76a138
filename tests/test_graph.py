"""connected_components / dedup_clusters (operators/graph.py): planted
graphs, an adversarial long path (label propagation's worst case), and a
pseudo-random graph checked against an independent union-find."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.graph import connected_components, dedup_clusters


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["id"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def test_two_components_and_chain(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # a 64-node path with ids deliberately anti-sorted: plain label
    # propagation needs ~64 rounds; star contraction must do it in O(log^2)
    ids = [(i * 37) % 64 + 100 for i in range(64)]
    edges = list(zip(ids, ids[1:]))
    got = _cc(spark, edges, max_iter=14)
    assert set(got.values()) == {100}
    assert len(got) == 64


def test_random_graph_matches_union_find(spark):
    # deterministic pseudo-random graph: 300 nodes, 260 edges
    def rng(i):
        x = (i * 2654435761 + 17) % (2**32)
        return x

    edges = [((rng(i) % 300), (rng(i * 7 + 3) % 300)) for i in range(260)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _cc(spark, edges)
    assert got == _union_find(edges)


def test_self_loops_and_duplicates_ignored(spark):
    got = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}  # self-loop node 5 has no real edge


def test_dedup_clusters_canonical_flags(spark):
    pairs = spark.createDataFrame(
        [(3, 7), (7, 9), (20, 21)], ["id_a", "id_b"]
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        3: 3, 7: 3, 9: 3, 20: 20, 21: 20
    }
    assert {d: r["cluster_size"] for d, r in rows.items()} == {
        3: 3, 7: 3, 9: 3, 20: 2, 21: 2
    }
    assert {d for d, r in rows.items() if r["is_canonical"]} == {3, 20}


@pytest.mark.slow
def test_large_random_graph_matches_union_find(spark):
    """20k-node / 24k-edge pseudo-random graph (mix of a giant component,
    many small ones, and a planted 2k-node anti-sorted path): the Spark
    star contraction must agree with union-find exactly, within the
    O(log^2 n) round budget."""

    def rng(i):
        x = i * 6364136223846793005 + 1442695040888963407
        return (x ^ (x >> 31)) % (2**63)

    edges = [((rng(i) % 20000), (rng(i * 11 + 5) % 20000)) for i in range(22000)]
    path_ids = [(i * 977) % 2000 + 50000 for i in range(2000)]
    edges += list(zip(path_ids, path_ids[1:]))
    edges = [(u, v) for u, v in edges if u != v]
    got = _cc(spark, edges, max_iter=20)
    assert got == _union_find(edges)


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=0)


# ---------------------------------------------------------------------------
# pagerank — independent pure-Python reference (own adjacency/dict loop, no
# DataFrames), planted structure, dangling mass, determinism, overflow guard
# ---------------------------------------------------------------------------
def _pagerank_ref(edges, n_iter=5, scale=10**12):
    """Independent integer PageRank: plain dicts, same semantics as the
    operator's docstring formulas (floor division throughout)."""
    eset = sorted({(u, v) for u, v in edges if u != v})
    nodes = sorted({u for u, _ in eset} | {v for _, v in eset})
    out = {}
    for u, v in eset:
        out.setdefault(u, []).append(v)
    n = len(nodes)
    rank = {x: scale for x in nodes}
    teleport = (scale * 15) // 100
    for _ in range(n_iter):
        damped = {x: (rank[x] * 85) // 100 for x in nodes}
        dang = sum(damped[x] for x in nodes if x not in out) // n
        nxt = {x: teleport + dang for x in nodes}
        for u, vs in out.items():
            share = damped[u] // len(vs)
            for v in vs:
                nxt[v] += share
        rank = nxt
    return rank


def _pr(spark, edges, **kw):
    from mediacrawler_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r["node"]: r["rank_fp"] for r in pagerank(df, **kw).collect()}


def test_pagerank_matches_reference_with_dangling(spark):
    # 4 joins into the hub 0; 0 -> 1 -> 2; 9 is dangling (in-edges only)
    edges = [(3, 0), (4, 0), (5, 0), (6, 0), (0, 1), (1, 2), (2, 9), (5, 9)]
    got = _pr(spark, edges)
    want = _pagerank_ref(edges)
    assert got == want
    assert got[0] > got[3]  # the hub outranks its pointers
    # total mass only shrinks under floor division
    assert sum(got.values()) <= len(want) * 10**12


def test_pagerank_self_loops_and_dups_dropped(spark):
    edges = [(1, 2), (1, 2), (1, 1), (2, 3)]
    assert _pr(spark, edges) == _pagerank_ref([(1, 2), (2, 3)])


def test_pagerank_deterministic_under_repartition(spark):
    edges = [((i * 7) % 23, (i * 13 + 1) % 23) for i in range(60)]
    edges = [(u, v) for u, v in edges if u != v]
    from mediacrawler_spark.operators.graph import pagerank

    a = {
        r["node"]: r["rank_fp"]
        for r in pagerank(spark.createDataFrame(edges, ["src", "dst"])).collect()
    }
    b = {
        r["node"]: r["rank_fp"]
        for r in pagerank(
            spark.createDataFrame(edges, ["src", "dst"]).repartition(7)
        ).collect()
    }
    assert a == b == _pagerank_ref(edges)


def test_pagerank_overflow_guard(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    with pytest.raises(ValueError, match="overflow"):
        from mediacrawler_spark.operators.graph import pagerank as pr

        pr(df, scale=2**62)


# ---------------------------------------------------- triangle counts ----
def _tri_reference(edge_list):
    """Independent brute force: enumerate ALL node triples over the
    cleaned undirected edge set."""
    from itertools import combinations

    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    per = {}
    for x, y, z in combinations(nodes, 3):
        if ((x, y) in und) and ((x, z) in und) and ((y, z) in und):
            for n in (x, y, z):
                per[n] = per.get(n, 0) + 1
    return per


def test_triangle_counts_matches_brute_force(spark):
    """K4 block (every node in 3 triangles), a hub star (zero triangles
    despite high degree), a pendant triangle, duplicate + reversed +
    self-loop edges — per-node counts equal the all-triples brute force."""
    from mediacrawler_spark.operators.graph import triangle_counts

    edges = (
        # K4 on 1-4
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
        # hub 100 with leaves (star: no triangles)
        + [(100, i) for i in range(200, 212)]
        # pendant triangle hanging off the hub
        + [(100, 50), (50, 51), (51, 100)]
        # noise: duplicates, reversals, self loop
        + [(2, 1), (3, 1), (7, 7), (1, 2)]
    )
    want = _tri_reference(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == want
    assert got[1] == got[2] == got[3] == got[4] == 3  # K4
    assert got[100] == 1 and got[50] == 1 and got[51] == 1
    assert 200 not in got  # star leaves: no triangles


def test_triangle_counts_plan_no_python(spark):
    from mediacrawler_spark.operators.graph import triangle_counts

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    plan = triangle_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan
