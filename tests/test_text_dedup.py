"""Training-data dedup operators: planted duplicates must be found,
distinct docs must not collide."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.text_dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d00", BASE),
        ("d01", BASE),  # exact dup of d00
        ("d02", BASE + " tonight"),  # near dup (1 word appended)
        ("d03", BASE.replace("quick", "swift")),  # near dup (1 word changed)
        ("d04", "completely different content about spark dataframes and shuffles"
                " partitions catalysts and tungsten engines running at scale"),
        ("d05", "yet another unrelated document mentioning bloom filters cuckoo"
                " hashing and the art of deduplicating ten billion urls"),
        ("d06", "  The   QUICK brown fox jumps over the lazy dog while the cat watches "
                "from the warm windowsill and the birds sing in the garden outside "),
        # d06 = d00 modulo case/whitespace → exact dup after normalization
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_duplicates_normalized(docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == ["d00", "d01", "d06"]


def test_dedup_exact_keeps_min_id(docs):
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == ["d00", "d02", "d03", "d04", "d05"]


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # the dup cluster {d00,d01,d02,d03,d06} must be densely connected
    assert ("d00", "d01") in pairs
    assert ("d00", "d02") in pairs
    assert ("d00", "d03") in pairs
    # unrelated docs never pair with the cluster
    assert not any("d04" in p or "d05" in p for p in pairs)


def test_minhash_est_jaccard_sane(docs):
    rows = minhash_lsh_pairs(docs, threshold=0.0).collect()
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in rows}
    assert est[("d00", "d01")] == 1.0  # identical docs → identical signatures


def test_ngram_jaccard_verify(spark, docs):
    cand = spark.createDataFrame(
        [("d00", "d01"), ("d00", "d04")], "id_a string, id_b string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, cand, threshold=0.0).collect()
    }
    assert got[("d00", "d01")] == 1.0
    assert got[("d00", "d04")] == 0.0


def test_simhash_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]) for r in simhash_pairs(docs, max_hamming=10).collect()
    }
    assert ("d00", "d01") in pairs  # identical → distance 0
    assert ("d00", "d06") in pairs
    assert not any(("d04" in p) ^ ("d05" in p) == 0 and "d00" in p for p in [])
    # distinct topics stay apart even at the loose threshold
    assert ("d04", "d05") not in pairs


# ------------------------------------- exact prefix-filter jaccard join ----
def _brute_force_jaccard(docs_rows, k=3, threshold=0.5):
    """Independent all-pairs ground truth (python sets, own tokenizer)."""
    import re

    def shingles(text):
        toks = [t for t in re.split(r"[^\w]+", text.lower()) if t]
        if len(toks) >= k:
            return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        return {" ".join(toks)}

    sh = {i: shingles(t) for i, t in docs_rows}
    out = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sh[ids[x]], sh[ids[y]]
            u = len(a | b)
            j = len(a & b) / u if u else 0.0
            if j >= threshold:
                out[(ids[x], ids[y])] = j
    return out


def test_jaccard_join_matches_brute_force(docs):
    from mediacrawler_spark.operators.text_dedup import jaccard_similarity_join

    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_similarity_join(docs, threshold=0.5).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    want = _brute_force_jaccard(rows, threshold=0.5)
    assert set(got) == set(want)
    for p, j in want.items():
        assert abs(got[p] - j) < 1e-9


def test_jaccard_join_exact_at_low_threshold(spark):
    """Adversarial completeness case for the prefix filter: a boilerplate
    mega-cluster (every gram shared, frequency ties everywhere) plus
    borderline pairs that sit exactly at the threshold boundary."""
    from mediacrawler_spark.operators.text_dedup import jaccard_similarity_join

    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(f"b{i:02d}", boiler) for i in range(12)]
    # borderline: share a sliding window of the boilerplate
    rows += [("e01", boiler + " extra tail words here now"),
             ("e02", "prefix words go here " + boiler)]
    # unrelated
    rows += [("z01", "nothing in common with anything else whatsoever today"),
             ("z02", "totally disjoint vocabulary again for the second control")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["id_a"], r["id_b"]) for r in jaccard_similarity_join(docs, threshold=0.3).collect()
    }
    want = set(_brute_force_jaccard(rows, threshold=0.3))
    assert got == want
    assert len(want) >= 66  # the 12-doc clique alone
    assert not any("z01" in p or "z02" in p for p in got)
