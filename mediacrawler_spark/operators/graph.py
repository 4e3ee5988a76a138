"""Distributed graph primitives for dedup clustering.

Pair-emitting near-dup operators (operators/text_dedup.py,
operators/similarity.py) answer "which documents are near-duplicates of
each other"; a training pipeline then needs "keep ONE document per
duplicate group", which is connected components over the pair graph.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC 2014): each round is two hash-aggregate + equi-join
passes over the edge list, converging in O(log^2 n) rounds, with edges
only ever keyed by node id — no per-component state, no driver-side
graph, so the shape survives a 100 TB pair graph. Label propagation
(the obvious alternative) needs O(diameter) rounds, which a pathological
duplicate chain can push to O(n); star contraction does not.

Reference scope: the reference crawler has no graph stage (its dedup is
the per-URL seen set, /root/reference/store/*); this extends SURVEY §2's
LLM-corpus operators to cluster granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) -> edges (v, m(u)) for v in N(u), v > u, with
    m(u) = min(N(u) + {u}); neighborhoods taken in BOTH directions."""
    nb = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = nb.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("mv", F.col("u")).alias("m"))
    # no trailing distinct: small_star canonicalizes + dedupes its input,
    # so deduping here would just add a shuffle per round
    return (
        nb.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Directed to u > v, then (u,v) -> edges (w, m(u)) for w in
    N(u) + {u}, w != m(u), with m(u) = min(N(u) + {u})."""
    nb = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")).distinct()
    mins = nb.groupBy("u").agg(F.min("v").alias("m"))  # all v < u, so min(N+{u}) = min(N)
    out = nb.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        mins.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(id, component) for every node that appears in a NON-self-loop
    edge, with component = the minimum node id of its connected
    component. Self-loops are dropped up front, so a node whose only
    edges are self-loops is not reported (it carries no dedup
    information; tests/test_graph.py pins the drop).

    Alternates large-star / small-star until the edge set is a fixed
    point (then it is exactly the forest of depth-1 stars rooted at each
    component's minimum). Lineage is truncated with an eager
    localCheckpoint every round — iterative self-joins otherwise grow
    the plan exponentially. Convergence is checked exactly (count match
    + one set-difference), one extra shuffle per round; the proven
    O(log^2 n) round bound keeps that affordable at any scale."""
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = e.count()
    for _ in range(max_iter):
        e_new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        n_new = e_new.count()
        if n_new == n_prev and e_new.subtract(e).isEmpty():
            e = e_new
            break
        e, n_prev = e_new, n_new
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    centers = e.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return members.union(centers).distinct()


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Duplicate groups from verified near-dup pairs: (doc_id,
    cluster_id, cluster_size, is_canonical) for every doc in a group,
    cluster_id = min doc_id of the group, is_canonical marking the one
    row per group a keep-one-per-cluster filter retains."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            (F.col("id") == F.col("component")).alias("is_canonical"),
        )
    )
