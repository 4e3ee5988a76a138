"""Corpus-prep operators (operators/corpus.py): repetition fraction,
shared-span stats, decontamination, stratified sampling — planted
fixtures with hand-computed expectations, plus plan shape checks."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.corpus import (
    decontaminate,
    shared_ngram_stats,
    stratified_sample,
    top_ngram_fraction,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "a b" appears 3x of 5 bigrams -> top_frac 0.6
        (1, "a b a b a b"),
        # all 4 bigrams distinct -> top_frac 0.25
        (2, "p q r s t"),
        # too short for bigrams
        (3, "solo"),
        # shares the 3-gram "x y z" with doc 5, rest unique
        (4, "x y z m n o p q"),
        (5, "x y z w v u t s"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_top_ngram_fraction(docs):
    out = {
        r["doc_id"]: (r["n_grams"], r["top_frac"])
        for r in top_ngram_fraction(docs, 2).collect()
    }
    assert out[1] == (5, 0.6)
    assert out[2] == (4, 0.25)
    assert out[3] == (0, 0.0)  # short doc present, zeroed
    assert out[4] == (7, pytest.approx(1 / 7, abs=1e-6))


def test_shared_ngram_stats(docs):
    out = {
        r["doc_id"]: (r["n_spans"], r["shared_spans"], r["shared_frac"])
        for r in shared_ngram_stats(docs, n=3).collect()
    }
    # docs 4 and 5 share exactly the "x y z" 3-gram; each has 6 trigrams
    assert out[4] == (6, 1, pytest.approx(1 / 6, abs=1e-6))
    assert out[5] == (6, 1, pytest.approx(1 / 6, abs=1e-6))
    assert out[1][1] == 0 and out[2][1] == 0
    assert out[3] == (0, 0, 0.0)
    assert len(out) == 5  # every doc reported


def test_decontaminate(spark, docs):
    bench = spark.createDataFrame(
        [(100, "x y z only here"), (101, "nothing matches this")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["n_contaminated"] for r in
           decontaminate(docs, bench, n=3).collect()}
    assert out == {4: 1, 5: 1}  # only the "x y z" span overlaps


def test_decontaminate_broadcasts_benchmark(spark, docs):
    bench = spark.createDataFrame([(100, "x y z only here")], ["doc_id", "text"])
    plan = decontaminate(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side must not shuffle


def test_stratified_sample_deterministic(spark):
    rows = [(i, "s%d" % (i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "stratum"]).withColumn(
        "draw", F.md5(F.col("id").cast("string"))
    )
    out = stratified_sample(df, ["stratum"], k=4, order_col="draw")
    got = sorted((r["stratum"], r["rk"], r["id"]) for r in out.collect())
    assert len(got) == 12  # 3 strata x k
    # matches the unsalted single-window reference ranking exactly
    from pyspark.sql import Window

    w = Window.partitionBy("stratum").orderBy("draw")
    ref = (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 4)
        .collect()
    )
    assert got == sorted((r["stratum"], r["rk"], r["id"]) for r in ref)
    # rerun is identical (deterministic draw)
    again = sorted((r["stratum"], r["rk"], r["id"]) for r in out.collect())
    assert again == got


def test_pii_scrub_and_counts(spark):
    from mediacrawler_spark.functions.textual import pii_counts, pii_scrub

    rows = [
        (1, "mail bob@example.com and carol@test.org from 10.1.2.3"),
        (2, "call +1 555 0100 999 or nothing"),
        (3, "clean text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    e, i, p = pii_counts(F.col("text"))
    out = {
        r["doc_id"]: (r["e"], r["i"], r["p"], r["s"])
        for r in df.select(
            "doc_id", e.alias("e"), i.alias("i"), p.alias("p"),
            pii_scrub(F.col("text")).alias("s"),
        ).collect()
    }
    assert out[1][:3] == (2, 1, 0)
    assert out[1][3] == "mail <EMAIL> and <EMAIL> from <IP>"
    assert out[2][:3] == (0, 0, 1)
    assert out[2][3] == "call <PHONE> or nothing"
    assert out[3] == (0, 0, 0, "clean text")


def test_pii_counts_match_emitted_placeholders_on_overlap(spark):
    """Overlapping matches (ADVICE r04): an IPv4-shaped segment inside an
    email's domain is consumed by the email pass, so the audit must NOT
    also count it as an IP — counts equal the placeholders pii_scrub
    actually emits."""
    from mediacrawler_spark.functions.textual import pii_counts, pii_scrub

    rows = [(1, "contact a@1.2.3.4.com or 5.6.7.8 now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    e, i, p = pii_counts(F.col("text"))
    r = df.select(
        e.alias("e"), i.alias("i"), p.alias("p"), pii_scrub(F.col("text")).alias("s")
    ).collect()[0]
    assert r["s"] == "contact <EMAIL> or <IP> now"
    # old raw-text counting said i == 2 (counted 1.2.3.4 inside the email)
    assert (r["e"], r["i"], r["p"]) == (1, 1, 0)
    assert r["s"].count("<EMAIL>") == r["e"] and r["s"].count("<IP>") == r["i"]


def test_decontaminate_normalizes_case_and_punct(spark):
    """Eval grams are matched on normalized text — lowercase, punctuation
    stripped (tokens() applies both) — so cosmetic variants of a
    benchmark passage still count as contamination (VERDICT r04 #6)."""
    from mediacrawler_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame(
        [(100, "The Quick Brown Fox Jumps Over It")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "...the QUICK, brown fox; jumps!! over it..."),  # variant: caught
            (2, "a quick brown dog sits under it"),  # shares no 4-gram
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n_contaminated"] for r in decontaminate(corpus, bench, n=4).collect()}
    assert 1 in got and got[1] >= 1
    assert 2 not in got


def test_tfidf_top_terms_planted(spark):
    """Hand-checkable corpus: scores = tf*ln(N/df), ties break term-asc."""
    import math

    from mediacrawler_spark.operators.corpus import tfidf_top_terms

    docs = [
        ("d1", "apple apple banana common"),
        ("d2", "banana cherry common"),
        ("d3", "cherry cherry cherry common"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = {
        (r["doc_id"], r["rk"]): (r["term"], r["tf"], r["score"])
        for r in tfidf_top_terms(df, k=2).collect()
    }
    ln = math.log
    # d1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5); common score 0
    import pytest

    def close(got, term, tf, score):
        assert got[0] == term and got[1] == tf
        assert got[2] == pytest.approx(score, rel=1e-12)

    close(rows[("d1", 1)], "apple", 2, 2 * ln(3.0))
    close(rows[("d1", 2)], "banana", 1, ln(1.5))
    # d3: cherry tf=3 df=2 -> 3*ln(1.5) tops; common ln(1)=0 ranks after
    close(rows[("d3", 1)], "cherry", 3, 3 * ln(1.5))
    assert rows[("d3", 2)][0] == "common" and rows[("d3", 2)][2] == 0.0
    # d2: banana and cherry tie at ln(1.5) -> term-ascending order
    assert rows[("d2", 1)][0] == "banana" and rows[("d2", 2)][0] == "cherry"


def test_tfidf_no_cartesian_one_term_join(spark):
    from mediacrawler_spark.operators.corpus import tfidf_top_terms

    df = spark.createDataFrame(
        [(f"d{i}", "alpha beta gamma") for i in range(20)], "doc_id string, text string"
    )
    out = tfidf_top_terms(df, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
