"""Planted-structure scale run of the full dedup pipeline: 60k docs in
2,000 near-dup clusters of 30 through MinHash-LSH -> connected
components -> keep-canonical, asserting EXACT cluster recovery.

This is the "would it still work at 100x" probe for the dedup family:
mega-cluster corpora are the case that stresses band buckets (every
member of a cluster lands in the same bucket in every band), the
candidate-pair dedup (16 bands x 30^2 collisions per cluster before
dropDuplicates), and the O(log^2 n) component rounds. Ground truth is
known by construction, so recovery is asserted exactly — no oracle
re-computation needed at this size (all-pairs would be 1.8e9
comparisons).

Construction: cluster ci's template is 40 tokens of cluster-private
vocabulary (cross-cluster Jaccard is exactly 0 — token sets are
disjoint — so any cross-cluster merge is a hard failure, not bad luck);
member m substitutes ONE member-private token, so intra-cluster shingle
Jaccard stays >= ~0.7, far above the 0.5 verify threshold, and each
cluster remains a near-clique in the candidate graph (banding can only
drop a ~0.6% tail of edges, never disconnect a 30-node near-clique).
"""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.graph import dedup_clusters
from mediacrawler_spark.operators.text_dedup import minhash_lsh_pairs

pytestmark = pytest.mark.slow

N_CLUSTERS = 2000
MEMBERS = 30
TEMPLATE_TOKENS = 40


def _member_text(ci: int, m: int) -> str:
    toks = [f"c{ci}t{j}" for j in range(TEMPLATE_TOKENS)]
    toks[(m * 7) % TEMPLATE_TOKENS] = f"c{ci}m{m}"
    return " ".join(toks)


def test_minhash_cc_canonical_recovers_planted_clusters(spark):
    rows = [
        (ci * 100 + m, _member_text(ci, m))
        for ci in range(N_CLUSTERS)
        for m in range(MEMBERS)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)

    pairs = minhash_lsh_pairs(docs, threshold=0.5, max_bucket=64)
    # no cross-cluster edge may survive the verify stage (vocabularies
    # are disjoint, so one would mean a broken estimator, not noise)
    cross = pairs.filter(
        (F.col("id_a") / 100).cast("int") != (F.col("id_b") / 100).cast("int")
    )
    assert cross.count() == 0

    clusters = dedup_clusters(pairs)
    got = (
        clusters.groupBy("cluster_id")
        .agg(
            F.count("*").alias("size"),
            F.min("doc_id").alias("min_id"),
            F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        )
        .collect()
    )
    assert len(got) == N_CLUSTERS
    for r in got:
        assert r["size"] == MEMBERS, r
        assert r["min_id"] == r["cluster_id"], r  # min-label convention
        assert r["n_canon"] == 1, r
    # keep-one filter: exactly one survivor per planted cluster
    assert clusters.filter("is_canonical").count() == N_CLUSTERS
    assert clusters.count() == N_CLUSTERS * MEMBERS  # every doc assigned
