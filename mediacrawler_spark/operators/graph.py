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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediacrawler_spark.operators.fanout import pin_parallelism


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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    scale: int = 10**12,
) -> DataFrame:
    """Integer fixed-point PageRank over a directed edge list:
    (node, rank_fp) with rank_fp a BIGINT in units of ``1/scale``,
    damping 0.85, ``n_iter`` synchronous iterations.

    Why integer: float PageRank sums are addition-order-dependent, so
    two engines (or two runs) disagree in the low bits — useless for a
    hash-pinned oracle and for reproducible crawl-priority feeds. This
    formulation does every step in exact BIGINT arithmetic (floor
    division), so the result is bit-identical on Spark, DuckDB, and a
    single-threaded reference regardless of partitioning:

        damped(u)  = (rank(u) * 85) div 100
        share(u)   = damped(u) div outdeg(u)           (outdeg > 0)
        dangling   = sum(damped(u) : outdeg(u) = 0) div N
        rank'(v)   = (scale*15) div 100 + dangling + sum share(u), u->v

    Self-loops are dropped and edges deduplicated (same conventions as
    :func:`connected_components`); nodes are everything appearing at
    either end. Overflow bound: rank <= N*scale (mass only shrinks under
    floor), so N*scale*85 must stay < 2^63 — holds to N ~= 10^8 at the
    default scale; pass a smaller ``scale`` for larger graphs.

    Scale shape: per iteration ONE hash-agg keyed by dst (partial
    map-side combine) after an equi-join of edges with the rank table on
    src — the Pregel step as plain DataFrame ops. The dangling pool is a
    one-row aggregate cross-joined back (Spark broadcasts it); lineage is
    truncated per iteration with an eager localCheckpoint, as in
    connected_components. The reference crawler has no ranking stage
    (/root/reference/store/* is insertion-ordered); this feeds the
    priority-frontier story (W1) with a principled page score.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_fp"))
    if n_nodes * scale * 85 >= 2**63:
        raise ValueError(
            f"pagerank: {n_nodes} nodes at scale {scale} would overflow BIGINT; "
            "pass a smaller scale"
        )
    deg = e.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("outdeg"))
    teleport = (scale * 15) // 100
    r = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(n_iter):
        d = r.join(deg, "node", "left").select(
            "node",
            "outdeg",
            F.expr("rank * 85 div 100").alias("damped"),
        )
        dang = d.filter(F.col("outdeg").isNull()).agg(
            F.expr(f"coalesce(sum(damped), 0L) div {n_nodes}L").alias("dang_share")
        )
        contrib = (
            e.join(
                d.filter(F.col("outdeg").isNotNull()).select(
                    F.col("node").alias("u"),
                    F.expr("damped div outdeg").alias("share"),
                ),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.sum("share").alias("contrib"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.col("dang_share")
                    + F.coalesce(F.col("contrib"), F.lit(0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select("node", F.col("rank").cast("long").alias("rank_fp"))


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


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts via the degree-ordered node-iterator —
    the clustering-coefficient / community-density primitive (spam-farm
    and link-ring detection on a crawl graph).

    Input is any directed/multi edge list; it is undirected and deduped
    first (self-loops dropped). Each undirected edge is then ORIENTED
    from the endpoint with smaller (degree, id) to the larger — the
    classic trick (Suri & Vassilvitskii, WWW'11) that bounds every
    node's out-degree by O(sqrt(m)), so the wedge self-join below never
    explodes on a hub node: a celebrity with 10^7 followers creates
    zero wedges at the hub (its edges all point AWAY from it in
    orientation order) instead of 10^14 candidate pairs. Wedges
    (u→v, u→w) with (deg,id)(v) < (deg,id)(w) are closed by one
    equi-join against the oriented edge list; each triangle matches
    exactly once, then credits all three corners.

    Returns (node, n_triangles) for every node in at least one
    triangle, exact bigint counts. Plan: two degree hash-aggs, the
    wedge self-join keyed by u, one closing equi-join on (v,w), one
    final node-keyed count — no window, no UDF.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .union(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    with_deg = (
        und.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    )
    fwd = F.struct("da", "a") < F.struct("db", "b")
    oriented = with_deg.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).persist()
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("w"), F.col("dv").alias("dw")
    )
    # fan-out join: the wedge fan-out is O(√m) per node while the edge
    # frame is tiny in bytes — pin its parallelism (see fanout.py)
    wedges = pin_parallelism(oriented, "u").join(o2, "u").filter(
        F.struct("dv", "v") < F.struct("dw", "w")
    )
    closing = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("u", "v", "w")
    corners = (
        tri.select(F.col("u").alias("node"))
        .union(tri.select(F.col("v").alias("node")))
        .union(tri.select(F.col("w").alias("node")))
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


def markov_transitions(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """First-order Markov transition model over a directed edge stream —
    the next-page predictor / crawl-prefetch statistic: for every
    observed (src, dst) transition, its count, the source's total
    out-transitions, and P(dst | src) as ONE double division of the two
    exact bigints, rounded 6dp (engine-exact). Self-loops count (a
    refresh IS a transition — unlike the pagerank/triangle edge prep,
    which drops them; callers choose by pre-filtering).

    Scale shape: one (src, dst) hash-agg with map-side combine over the
    edges, then the source totals as a WINDOW over the pair-count table
    (vertex²-bounded, never edge-bounded). The totals-as-join
    formulation recomputed the WHOLE edge lineage for the totals side
    (observed in the clickstream query: the events scan + lag window
    ran twice); the window form reads the pair table once and costs one
    src-keyed exchange of pair rows. No UDF.
    """
    pc = (
        edges.groupBy(F.col(src).alias("s"), F.col(dst).alias("d"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("s")).cast("bigint")
    return pc.select(
        F.col("s").alias(src),
        F.col("d").alias(dst),
        "n",
        tot.alias("n_src"),
        F.round(F.col("n").cast("double") / tot.cast("double"), 6).alias("p"),
    )


def copageview(
    user_item: DataFrame,
    user_col: str = "user_id",
    item_col: str = "page",
    max_items_per_user: int = 20,
    min_cooc: int = 2,
) -> DataFrame:
    """Bipartite co-visitation projection — "users who viewed X also
    viewed Y": for every unordered item pair, how many distinct users
    viewed both. The classic item-item collaborative signal, with the
    standard production bound on quadratic user fan-out: each user
    contributes at most ``max_items_per_user`` items (a user who views
    everything would otherwise emit C(n,2) pairs), chosen by
    deterministic md5(user:item) order so the cap is engine-reproducible
    rather than "first seen" (every co-occurrence pipeline at scale caps
    exactly like this; the cap is part of the DEFINITION here, so the
    oracle applies the identical rule — not a recall loss).

    Scale shape: one distinct (user, item) pre-agg, ONE exchange on the
    user for the cap window, then the pair enumeration as a
    parallelism-PINNED self-join of the capped table on the user
    (operators/fanout.py — the pin the CLAUDE.md invariant demands for
    every bucket/wedge join), one pair-keyed hash-agg. The earlier
    array-HOF formulation (collect_list + nested transform/element_at)
    generated the identical pair set but in INTERPRETED expression eval
    — higher-order lambdas don't enter whole-stage codegen, so every
    pair paid a per-element interpreter dispatch; the join emits pairs
    from codegen'd probe loops (measured 5.2s -> ~1.7s at 1M events).
    Fan-out is bounded by the cap (≤ C(cap, 2) per user) exactly as
    before. Exact bigint counts.
    """
    ui = user_item.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("it")
    ).distinct()
    w = Window.partitionBy("u").orderBy(
        F.md5(F.concat_ws(":", F.col("u"), F.col("it"))), F.col("it")
    )
    # persisted: the capped table is both sides of the self-join — the
    # distinct + md5 cap window would otherwise run twice
    capped = (
        ui.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(max_items_per_user))
        .select("u", "it")
        .persist()
    )
    from mediacrawler_spark.operators.fanout import pin_parallelism

    pairs = (
        pin_parallelism(capped.select("u", F.col("it").alias("item_a")), "u")
        .join(
            # shuffle-hash, not sort-merge: per-user groups are
            # cap-bounded (≤ max_items_per_user), so the build side
            # hashes cheaply and neither stream pays a sort
            capped.select("u", F.col("it").alias("item_b")).hint("shuffle_hash"),
            "u",
        )
        .filter(F.col("item_a") < F.col("item_b"))
    )
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .filter(F.col("n_users") >= int(min_cooc))
        .orderBy(F.col("n_users").desc(), "item_a", "item_b")
    )
