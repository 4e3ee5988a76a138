"""skipgram_cooc (operators/corpus.py): token-level windowed
co-occurrence counts vs an independent pure-Python reference (own
tokenizer, own index-pair enumeration, own canonicalization), repeated
phrases weighting in at token granularity, same-term pairs, window
boundary, and the plan (no corpus self-join, no Python eval)."""

import re
from collections import Counter

from pyspark.sql import functions as F

from mediacrawler_spark.operators.corpus import skipgram_cooc


def _ref(texts, window, min_count):
    """Independent reference: own regex tokenizer + nested loop."""
    c = Counter()
    for t in texts:
        # own tokenizer: split on anything not a unicode letter/digit
        # (python \w includes underscore, the package rule does not —
        # strip it via the character-class subtraction)
        toks = [
            w
            for w in re.split(r"[\W_]+", t.lower(), flags=re.UNICODE)
            if w
        ]
        for i in range(len(toks)):
            for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                a, b = sorted((toks[i], toks[j]))
                c[(a, b)] += 1
    return {k: v for k, v in c.items() if v >= min_count}


def _mk(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def _collect(df):
    return {(r["term_a"], r["term_b"]): r["n"] for r in df.collect()}


def test_skipgram_matches_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick quick fox",
        "brown dog and brown fox play",
    ]
    got = _collect(skipgram_cooc(_mk(spark, texts), window=3, min_count=1, top_k=10000))
    assert got == _ref(texts, 3, 1)


def test_skipgram_repeated_phrase_weighs_per_token(spark):
    # "spam ham" repeated 5 times: pair counts scale with occurrences,
    # not document membership (the difference vs pmi_collocations)
    texts = ["spam ham " * 5]
    got = _collect(skipgram_cooc(_mk(spark, texts), window=1, min_count=1, top_k=100))
    assert got[("ham", "spam")] == 9  # 9 adjacent index pairs in 10 tokens


def test_skipgram_same_term_pair_and_window_boundary(spark):
    texts = ["a b c a"]
    # window=3: (a,a) at distance 3 included; window=2 excludes it
    g3 = _collect(skipgram_cooc(_mk(spark, texts), window=3, min_count=1, top_k=100))
    assert g3[("a", "a")] == 1
    g2 = _collect(skipgram_cooc(_mk(spark, texts), window=2, min_count=1, top_k=100))
    assert ("a", "a") not in g2
    assert g3 == _ref(texts, 3, 1) and g2 == _ref(texts, 2, 1)


def test_skipgram_plan_no_selfjoin_no_python(spark):
    df = skipgram_cooc(_mk(spark, ["x y z"]), window=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
