"""Term-distribution drift (integer-exact total variation) vs an
independent pure-Python reference: own tokenizer, exact Fraction
arithmetic — never the package helpers."""

import re
from collections import Counter
from fractions import Fraction

import pytest

from mediacrawler_spark.operators.corpus import term_drift


def _ref_drift(rows, top_k=20):
    """rows: (slice, text). Returns (top list, exact TV Fraction)."""
    counts = {"a": Counter(), "b": Counter()}
    for s, text in rows:
        toks = [t for t in re.split(r"[^A-Za-z0-9]+", text.lower()) if t]
        counts[s].update(toks)
    n_a, n_b = sum(counts["a"].values()), sum(counts["b"].values())
    terms = set(counts["a"]) | set(counts["b"])
    scored = [
        (abs(counts["a"][t] * n_b - counts["b"][t] * n_a), t) for t in terms
    ]
    tv = Fraction(sum(num for num, _ in scored), 2 * n_a * n_b)
    top = sorted(scored, key=lambda x: (-x[0], x[1]))[:top_k]
    return (
        [(t, counts["a"][t], counts["b"][t], num) for num, t in top],
        tv,
    )


@pytest.fixture(scope="module")
def sliced(spark):
    rows = [
        ("a", "spark spark spark shuffle partition broadcast join join"),
        ("a", "bloom filter cuckoo hash urls urls frontier crawl"),
        ("a", "politeness budget host host host ordering epoch"),
        ("b", "spark shuffle shuffle shuffle partition skew salt salt"),
        ("b", "bloom bloom bloom filter anti join seen set"),
        ("b", "tokens grams drift drift drift distribution monitor"),
    ]
    return rows, spark.createDataFrame(rows, "slice string, text string")


def test_matches_exact_reference(sliced):
    rows, df = sliced
    want_top, want_tv = _ref_drift(rows)
    got = term_drift(df, top_k=20).orderBy(
        "drift_num", ascending=False
    ).collect()
    got = sorted(got, key=lambda r: (-r["drift_num"], r["term"]))
    assert [(r["term"], r["k_a"], r["k_b"], r["drift_num"]) for r in got] == want_top
    tv6 = round(float(want_tv), 6)
    assert all(r["tv_distance"] == pytest.approx(tv6, abs=5e-7) for r in got)


def test_identical_slices_zero_drift(spark):
    text = "alpha beta gamma delta alpha beta"
    df = spark.createDataFrame(
        [("a", text), ("b", text)], "slice string, text string"
    )
    got = term_drift(df, top_k=5).collect()
    assert got and all(r["drift_num"] == 0 and r["tv_distance"] == 0.0 for r in got)


def test_disjoint_slices_full_drift(spark):
    df = spark.createDataFrame(
        [("a", "one two three"), ("b", "four five six")],
        "slice string, text string",
    )
    got = term_drift(df, top_k=10).collect()
    # disjoint vocabularies: TV = 1 exactly
    assert got and all(r["tv_distance"] == 1.0 for r in got)
    assert len(got) == 6
