"""markov_transitions + copageview (operators/graph.py): independent
pure-Python references (own counting / own md5 cap / own pair
enumeration), self-loop inclusion, cap determinism under repartition,
and plan shape (copageview: no self-join, no Python eval)."""

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from mediacrawler_spark.operators.graph import copageview, markov_transitions


def _ref_transitions(edges):
    pc = Counter(edges)
    tot = Counter()
    for (s, _), n in pc.items():
        tot[s] += n
    return {
        (s, d): (n, tot[s], round(n / tot[s], 6)) for (s, d), n in pc.items()
    }


def test_markov_transitions_matches_reference(spark):
    edges = [(1, 2), (1, 2), (1, 3), (2, 2), (2, 1), (3, 1), (1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r["src"], r["dst"]): (r["n"], r["n_src"], r["p"])
        for r in markov_transitions(df).collect()
    }
    assert got == _ref_transitions(edges)
    # self-loop (2,2) is counted
    assert got[(2, 2)][0] == 1
    # probabilities per src sum to 1 (exact thirds round to .333333)
    assert got[(1, 2)] == (3, 4, 0.75)


def _ref_copageview(rows, cap, min_cooc):
    """Own md5 cap rule + own pair enumeration via per-user set joins."""
    per_user = defaultdict(set)
    for u, it in rows:
        per_user[u].add(it)
    pairs = Counter()
    for u, items in per_user.items():
        ranked = sorted(
            items,
            key=lambda it: (
                hashlib.md5(f"{u}:{it}".encode()).hexdigest(),
                str(it),
            ),
        )[:cap]
        kept = sorted(ranked)
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                pairs[(kept[i], kept[j])] += 1
    return {k: v for k, v in pairs.items() if v >= min_cooc}


def test_copageview_matches_reference(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # dup visit: distinct first
        (2, "a"), (2, "b"),
        (3, "b"), (3, "c"),
        (4, "a"), (4, "b"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "page"])
    got = {
        (r["item_a"], r["item_b"]): r["n_users"]
        for r in copageview(df, min_cooc=1).collect()
    }
    assert got == _ref_copageview(rows, 20, 1)
    assert got[("a", "b")] == 3


def test_copageview_cap_is_deterministic_and_bounds_fanout(spark):
    # one hot user visiting 50 items: with cap 5 they contribute
    # exactly C(5,2)=10 pairs, and WHICH 5 is md5-determined, not
    # partition-order-determined
    rows = [(9, f"p{i:02d}") for i in range(50)] + [(1, "p00"), (1, "p01")]
    df = spark.createDataFrame(rows, ["user_id", "page"])
    a = {
        (r["item_a"], r["item_b"]): r["n_users"]
        for r in copageview(df, max_items_per_user=5, min_cooc=1).collect()
    }
    b = {
        (r["item_a"], r["item_b"]): r["n_users"]
        for r in copageview(
            df.repartition(7), max_items_per_user=5, min_cooc=1
        ).collect()
    }
    ref = _ref_copageview(rows, 5, 1)
    assert a == b == ref
    hot_pairs = sum(1 for k, v in a.items() if v >= 1)
    assert hot_pairs <= 10 + 1  # C(5,2) from the hot user + user 1's pair


def test_copageview_plan_pinned_selfjoin_no_python(spark):
    """Pair enumeration is a self-join of the capped table (codegen probe
    loops — the HOF form paid interpreted lambda eval per pair) and the
    probe side MUST carry the fanout pin (CLAUDE.md invariant: an
    explicit REPARTITION_BY_NUM exchange AQE cannot coalesce away)."""
    df = copageview(
        spark.createDataFrame([(1, "a"), (1, "b")], ["user_id", "page"])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "REPARTITION_BY_NUM" in plan, plan


def test_markov_transitions_single_pass_over_edges(spark):
    """The totals must come from a window over the pair-count table —
    the join formulation recomputed the whole edge lineage twice."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    plan = (
        markov_transitions(edges)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Scan") <= 1, plan
