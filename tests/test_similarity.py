"""Similarity search: brute-force exactness + ANN recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.similarity import ann_lsh_topk, cosine_topk

DIM = 16
N = 120


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    # 3 well-separated clusters so ground truth is unambiguous
    centers = rng.standard_normal((3, DIM)) * 5
    rows = []
    for i in range(N):
        c = i % 3
        v = centers[c] + rng.standard_normal(DIM) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_topk(emb_rows, k=3, n_queries=6):
    ids = np.array([r[0] for r in emb_rows])
    m = np.array([r[1] for r in emb_rows], dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    out = {}
    for qi in range(n_queries):
        order = sorted(
            ((-sims[qi, j], ids[j]) for j in range(len(ids)) if ids[j] != ids[qi])
        )
        out[qi] = [int(nid) for _, nid in order[:k]]
    return out


def test_cosine_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    want = _numpy_topk([(r["vec_id"], r["embedding"]) for r in rows])
    q = emb.filter(F.col("vec_id") < 6)
    got_rows = cosine_topk(emb, q, k=3).collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == want


def test_ann_lsh_recall(spark, emb):
    rows = emb.collect()
    want = _numpy_topk([(r["vec_id"], r["embedding"]) for r in rows])
    q = emb.filter(F.col("vec_id") < 6)
    got_rows = ann_lsh_topk(emb, q, dim=DIM, k=3, n_planes=10).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(qi, set()) & set(want[qi])) for qi in want)
    total = sum(len(v) for v in want.values())
    recall = hits / total
    assert recall >= 0.8, f"ANN recall too low: {recall}"


def test_ivf_recall(spark, emb):
    """IVF coarse-quantized ANN: with enough probes over the clustered
    corpus, recall@3 against exact brute force clears the same floor the
    LSH path is held to."""
    from mediacrawler_spark.operators.similarity import ivf_topk

    rows = emb.collect()
    want = _numpy_topk([(r["vec_id"], r["embedding"]) for r in rows])
    q = emb.filter(F.col("vec_id") < 6)
    got_rows = ivf_topk(emb, q, dim=DIM, k=3, n_cells=8, n_probe=3).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(qi, set()) & set(want[qi])) for qi in want)
    total = sum(len(v) for v in want.values())
    recall = hits / total
    assert recall >= 0.8, f"IVF recall too low: {recall}"


def test_ivf_planted_twin_rank1(spark, emb):
    """A query identical to a corpus vector lands in the same cell (same
    argmin, same tie-break) and must come back rank-1 at cosine 1.0 —
    the deterministic invariant the driver oracle pins at sf0.01."""
    from mediacrawler_spark.operators.similarity import ivf_topk

    q = emb.filter(F.col("vec_id") < 6).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    top1 = {
        r["query_id"]: (r["neighbor_id"], r["cosine"])
        for r in ivf_topk(emb, q, dim=DIM, k=3, n_cells=8, n_probe=2)
        .filter(F.col("rank") == 1)
        .collect()
    }
    assert set(top1) == {10000 + i for i in range(6)}
    for qid, (nid, cos) in top1.items():
        assert nid == qid - 10000
        assert abs(cos - 1.0) < 1e-6


def test_ivf_centroids_deterministic(spark, emb):
    """Centroid pick is md5(id)-ordered — invariant to partitioning and
    row order, so two runs (one over a shuffled frame) agree exactly."""
    from mediacrawler_spark.operators.similarity import ivf_centroids

    c1 = ivf_centroids(emb, n_cells=8)
    c2 = ivf_centroids(emb.repartition(13).sortWithinPartitions(F.desc("vec_id")), n_cells=8)
    assert c1.shape == (8, DIM)
    np.testing.assert_array_equal(c1, c2)


def test_ivf_refined_centroids_find_true_clusters(spark, emb):
    """Lloyd refinement on the well-separated 3-cluster fixture with
    n_cells=3 must converge each centroid onto a distinct true cluster
    center (cosine > 0.99), and the result must be deterministic under
    repartitioning (sorted-id summation)."""
    from mediacrawler_spark.operators.similarity import (
        ivf_centroids_refined,
        ivf_topk,
    )

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((3, DIM)) * 5  # same formula as `emb`
    cn = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    ref = ivf_centroids_refined(emb, n_cells=3, iters=3)
    sims = ref @ cn.T  # (3 refined, 3 true)
    best = sims.argmax(axis=1)
    assert sorted(best) == [0, 1, 2]  # one refined centroid per true cluster
    assert (sims.max(axis=1) > 0.99).all()

    ref2 = ivf_centroids_refined(emb.repartition(13), n_cells=3, iters=3)
    np.testing.assert_array_equal(ref, ref2)

    # refined quantizer slots straight into ivf_topk and stays exact on recall floor
    rows = emb.collect()
    want = _numpy_topk([(r["vec_id"], r["embedding"]) for r in rows])
    q = emb.filter(F.col("vec_id") < 6)
    got_rows = ivf_topk(emb, q, dim=DIM, k=3, n_probe=2, centroids=ref).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(qi, set()) & set(want[qi])) for qi in want)
    assert hits / sum(len(v) for v in want.values()) >= 0.8


def test_ivf_plan_broadcasts_probes(spark, emb):
    """The cell equi-join must broadcast the (tiny, exploded) query side
    — never a shuffle or cartesian over the corpus."""
    import io
    from contextlib import redirect_stdout

    from mediacrawler_spark.operators.similarity import ivf_topk

    q = emb.filter(F.col("vec_id") < 3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        ivf_topk(emb, q, dim=DIM, n_cells=8).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # one ArrowEvalPython per side: the coalesced (non-nullable) cell key
    # keeps the join's isnotnull guard from re-running the assignment UDF
    # over the whole corpus in a second pass
    tree = plan.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 2, tree


def test_ann_lsh_plan_single_udf_pass_per_side(spark, emb):
    import io
    from contextlib import redirect_stdout

    q = emb.filter(F.col("vec_id") < 3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        ann_lsh_topk(emb, q, dim=DIM, n_planes=10).explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 2, tree


def test_ivf_empty_corpus_returns_empty(spark, emb):
    from mediacrawler_spark.operators.similarity import ivf_topk

    empty = emb.limit(0)
    q = emb.filter(F.col("vec_id") < 3)
    out = ivf_topk(empty, q, dim=DIM, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank", "cosine"]


def test_cosine_near_dup_pairs_planted_twins(spark):
    """Bucketed self-join near-dup: planted identical twins all found
    (identical signature → same bucket, recall 1.0 by construction),
    nothing else at threshold 0.8, exact match vs brute force."""
    import pyspark.sql.functions as F

    from mediacrawler_spark.operators.similarity import cosine_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") < 30).select(
            (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
        )
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_near_dup_pairs(corpus, threshold=0.8, dim=64).collect()
    }
    want_pairs = {(i, i + 10000) for i in range(30)}
    assert set(got) == want_pairs
    assert all(abs(c - 1.0) < 1e-6 for c in got.values())

    # brute-force cross-check: no pair >= 0.8 outside the twins
    from mediacrawler_spark.operators.similarity import _dot, _norm

    a = corpus.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = corpus.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("c", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))))
        .filter(F.col("c") >= 0.8)
        .count()
    )
    assert brute == len(want_pairs)

def test_ivf_refined_hot_cell_is_distributed(spark):
    """One cell holding ~all vectors (VERDICT r04 #2): the old shape fed
    the whole cell to a single applyInPandas task (executor OOM at
    scale); the two-level (cell, pos) hash aggregate must (a) produce the
    numpy ground-truth mean, (b) stay bit-deterministic across
    partitionings, and (c) keep no per-cell grouping in the plan."""
    import io
    from contextlib import redirect_stdout

    from mediacrawler_spark.operators.similarity import ivf_centroids_refined

    rng = np.random.RandomState(11)
    hot = rng.standard_normal(DIM) * 5
    cold = -hot  # antipodal: nothing ever crosses cells
    rows = [(i, [float(x) for x in hot + rng.standard_normal(DIM) * 0.2]) for i in range(500)]
    rows += [(1000 + i, [float(x) for x in cold + rng.standard_normal(DIM) * 0.2]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(16)

    ref = ivf_centroids_refined(df, n_cells=2, iters=2)
    # ground truth: every refined centroid matches SOME true cluster mean
    m = np.array([r[1] for r in rows], dtype=np.float64)
    hot_mean = m[:500].mean(axis=0)
    cold_mean = m[500:].mean(axis=0)
    truths = [v / np.linalg.norm(v) for v in (hot_mean, cold_mean)]
    for c in ref:
        assert max(float(c @ t) for t in truths) > 0.999

    ref2 = ivf_centroids_refined(df.repartition(3), n_cells=2, iters=2)
    np.testing.assert_array_equal(ref, ref2)

    # the aggregation plan must be a hash aggregate over (cell, pos) —
    # no FlatMapGroupsInPandas (the single-task-per-cell shape)
    from mediacrawler_spark.operators.similarity import ivf_cell_udf, ivf_centroids

    cents = ivf_centroids(df, 2)
    udf = ivf_cell_udf(cents, n_probe=1)
    agg = (
        df.select("embedding", udf(F.col("embedding")).getItem(0).alias("cell"))
        .select("cell", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg(F.sum(F.col("x").cast("decimal(38,18)")).alias("s"), F.count("*").alias("n"))
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        agg.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" not in plan
    assert "HashAggregate" in plan


# ------------------------------------------------------- int8 quantization ----
def test_quantize_int8_codes_bounded_and_exact(spark, emb):
    """Codes live in [-127, 127]; the max-|x| element maps to ±127; a zero
    vector maps to all-zero codes with scale 0 (no NULLs, no NaNs)."""
    from mediacrawler_spark.operators.quantize import quantize_int8

    z = spark.createDataFrame(
        [(9999, [0.0] * DIM)], "vec_id long, embedding array<float>"
    )
    qz = quantize_int8(emb.unionByName(z)).collect()
    by_id = {r["id"]: r for r in qz}
    for r in qz:
        assert all(-127 <= c <= 127 for c in r["q"]), r
        assert all(c is not None for c in r["q"])
    assert by_id[9999]["q"] == [0] * DIM and by_id[9999]["scale"] == 0.0
    # the argmax-|x| component quantizes to exactly ±127
    src = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for vid, v in list(src.items())[:10]:
        i = int(np.argmax(np.abs(np.array(v, dtype=np.float64))))
        assert abs(by_id[vid]["q"][i]) == 127


def test_quantized_topk_recall_vs_exact(spark, emb):
    """Int8 quantization barely perturbs cosine rank order: top-3 overlap
    with the float32-exact baseline >= 0.85 on the clustered corpus."""
    from mediacrawler_spark.operators.quantize import quantized_cosine_topk

    rows = emb.collect()
    want = _numpy_topk([(r["vec_id"], r["embedding"]) for r in rows])
    q = emb.filter(F.col("vec_id") < 6)
    got_rows = quantized_cosine_topk(emb, q, k=3).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(qi, set()) & set(want[qi])) for qi in want)
    total = sum(len(v) for v in want.values())
    assert hits / total >= 0.85, f"quantized recall {hits}/{total}"


def test_quantized_topk_plan_is_pure_codegen(spark, emb):
    """The whole quantize + integer-dot + top-k pipeline is column
    expressions: no Python eval node of any kind in the physical plan,
    and the query side is broadcast (corpus never shuffles for scoring)."""
    from mediacrawler_spark.operators.quantize import quantized_cosine_topk

    q = emb.filter(F.col("vec_id") < 6)
    plan = (
        quantized_cosine_topk(emb, q, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------------- quantized outlier screen ----
def _outliers_reference(rows, top_k):
    """Independent pure-Python reference for quantized_outliers: own
    quantization (math.floor round-half-up), exact integer dim sums,
    integer-rounded mean, exact integer squared distance."""
    import math

    codes = {}
    for vid, vec in rows:
        amax = max(abs(float(x)) for x in vec)
        if amax > 0:
            codes[vid] = [
                int(math.floor(float(x) * 127.0 / amax + 0.5)) for x in vec
            ]
        else:
            codes[vid] = [0] * len(vec)
    n = len(codes)
    dim = len(next(iter(codes.values())))
    mean_q = [
        int(math.floor(sum(q[i] for q in codes.values()) / n + 0.5))
        for i in range(dim)
    ]
    scored = sorted(
        ((sum((q[i] - mean_q[i]) ** 2 for i in range(dim)), vid)
         for vid, q in codes.items()),
        key=lambda t: (-t[0], t[1]),
    )
    return [(vid, s) for s, vid in scored[:top_k]]


def test_quantized_outliers_matches_reference(spark, emb):
    """On the mixed 3-cluster corpus the full top-k list (ids AND exact
    integer scores) must equal the independent reference bit-for-bit."""
    from mediacrawler_spark.operators.quantize import quantized_outliers

    rows = [(r["vec_id"], r["embedding"]) for r in emb.collect()]
    want = _outliers_reference(rows, top_k=5)
    got = [
        (r["id"], r["outlier_score"])
        for r in quantized_outliers(emb, top_k=5).collect()
    ]
    assert got == want


def test_quantized_outliers_flags_junk_in_tight_corpus(spark):
    """On a tight single-direction corpus, a planted junk vector (one hot
    dim orthogonal to the corpus direction — a classic mis-embedded blob)
    must rank first, and the list must equal the independent reference."""
    from mediacrawler_spark.operators.quantize import quantized_outliers

    rng = np.random.RandomState(11)
    center = rng.standard_normal(DIM) * 3
    rows = [
        (i, [float(x) for x in center + rng.standard_normal(DIM) * 0.05])
        for i in range(60)
    ]
    rows.append((7777, [100.0] + [0.001] * (DIM - 1)))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    want = _outliers_reference(rows, top_k=5)
    got = [
        (r["id"], r["outlier_score"])
        for r in quantized_outliers(corpus, top_k=5).collect()
    ]
    assert got == want
    assert got[0][0] == 7777


def test_quantized_outliers_plan_pure_codegen(spark, emb):
    """quantize -> dim-sum agg -> broadcast mean -> score -> top-k is all
    column expressions: no Python eval node anywhere in the plan."""
    from mediacrawler_spark.operators.quantize import quantized_outliers

    plan = (
        quantized_outliers(emb, top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan
