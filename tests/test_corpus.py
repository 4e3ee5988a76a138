"""Corpus-prep operators (operators/corpus.py): repetition fraction,
shared-span stats, decontamination, stratified sampling — planted
fixtures with hand-computed expectations, plus plan shape checks."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.corpus import (
    decontaminate,
    shard_assign,
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


# ------------------------------------------------------------ line dedup ----
def test_line_dedup_drops_corpus_duplicated_lines(spark):
    from mediacrawler_spark.operators.corpus import line_dedup

    rows = [
        ("d1", "unique body one\nshared boilerplate line\n---\nend d1"),
        ("d2", "unique body two\nshared boilerplate line\n---\nend d2"),
        ("d3", "unique body three\nrepeated inside\nrepeated inside\nend d3"),
    ]
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id string, text string")
        ).collect()
    }
    # corpus-duplicated substantial line dropped from both docs
    assert out["d1"]["text_deduped"] == "unique body one\n---\nend d1"
    assert out["d2"]["text_deduped"] == "unique body two\n---\nend d2"
    assert out["d1"]["n_dropped"] == 1 and out["d1"]["n_lines"] == 4
    # '---' is below min_line_chars → protected even though shared
    # within-doc repetition is NOT corpus duplication (distinct-doc df=1)
    assert out["d3"]["text_deduped"] == rows[2][1]
    assert out["d3"]["n_dropped"] == 0


def test_line_dedup_all_lines_dropped_yields_empty(spark):
    from mediacrawler_spark.operators.corpus import line_dedup

    rows = [("a", "same long line here"), ("b", "same long line here")]
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id string, text string")
        ).collect()
    }
    assert out["a"]["text_deduped"] == "" and out["a"]["n_dropped"] == 1
    # trimmed-identical lines match across whitespace variants
    rows2 = [("a", "  padded line content  "), ("b", "padded line content")]
    out2 = {
        r["doc_id"]: r
        for r in line_dedup(
            spark.createDataFrame(rows2, "doc_id string, text string")
        ).collect()
    }
    assert out2["a"]["n_dropped"] == 1 and out2["b"]["n_dropped"] == 1


# ------------------------------------------------------- sequence packing ----
def test_pack_sequences_matches_brute_force(spark):
    from pyspark.sql import functions as F

    from mediacrawler_spark.operators.corpus import pack_sequences

    rows = [(i, "tok " * (7 + (i * 13) % 90)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in pack_sequences(
            df, budget=50, shard_col=F.pmod(F.col("doc_id"), F.lit(4)), n_shards=4
        ).collect()
    }
    # brute force: concat in id order within shard, cut every 50 tokens
    import collections

    shards = collections.defaultdict(list)
    for i, t in rows:
        shards[i % 4].append((i, len(t.split())))
    for shard, docs in shards.items():
        off = 0
        for i, n in sorted(docs):
            g = got[i]
            assert g["shard"] == shard and g["n_tokens"] == n
            assert g["start_offset"] == off
            assert g["start_pack"] == off // 50
            assert g["end_pack"] == max(off + n - 1, off) // 50
            off += n


def test_pack_sequences_no_global_sort(spark):
    from pyspark.sql import functions as F

    from mediacrawler_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(100)], "doc_id long, text string"
    )
    out = pack_sequences(df, budget=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # window is partitioned by shard — no single-partition global window
    assert "SinglePartition" not in plan


def test_bigram_lm_score_matches_reference(spark):
    """bigram_lm_score vs an independent pure-Python retrain+rescore
    (own tokenizer, collections.Counter model, math.log)."""
    import math
    import re
    from collections import Counter

    from mediacrawler_spark.operators.corpus import bigram_lm_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "the dog sat on the mat"),
        (4, "zq xv wk jj qq zz"),  # vocabulary noise: every bigram unique
        (5, "solo"),  # no bigrams
        (6, ""),  # no tokens at all
        (7, "The CAT... sat!! on -- the MAT"),  # normalizes to doc 1
    ]
    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for i, s in rows
    }
    bgs = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    c_bg = Counter(b for l in bgs.values() for b in l)
    c_ctx = Counter(b[0] for l in bgs.values() for b in l)
    vocab = len({t for ts in toks.values() for t in ts})
    expect = {}
    for i, l in bgs.items():
        if not l:
            expect[i] = (0, 0.0)
        else:
            avg = sum(
                math.log((c_bg[b] + 1) / (c_ctx[b[0]] + vocab)) for b in l
            ) / len(l)
            expect[i] = (len(l), round(avg, 6))

    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in bigram_lm_score(docs).collect()
    }
    assert set(out) == set(expect)  # every doc reported, including empty
    for i in expect:
        assert out[i][0] == expect[i][0], i
        assert out[i][1] == pytest.approx(expect[i][1], abs=2e-6), i
    # the filter's point: fluent/template text outscores vocabulary noise
    assert out[1][1] > out[4][1]
    # punctuation/case variants score identically to their clean twin
    assert out[7] == out[1]


# ---------------------------------------------------------------------------
# bm25_topk — independent pure-Python BM25 (own tokenizer via re, own math)
# ---------------------------------------------------------------------------
def _bm25_ref(texts, terms, k1=1.2, b=0.75):
    import math
    import re

    toks = {i: [t for t in re.split(r"[^\w]+", s.lower()) if t] for i, s in texts}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, ts in toks.items():
        s = 0.0
        for term in terms:
            tf = ts.count(term)
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        out[i] = round(s, 6)
    return out


def test_bm25_matches_independent_reference(spark):
    from mediacrawler_spark.operators.corpus import bm25_topk

    texts = [
        (1, "spark joins the window and the window wins"),
        (2, "vector vector vector spark"),
        (3, "nothing relevant here at all plain words only"),
        (4, "window"),
        (5, "spark spark spark spark spark spark spark spark"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["spark", "vector", "window"], k=5).collect()}
    want = _bm25_ref(texts, ["spark", "vector", "window"])
    assert got == want
    # rare term dominates: doc 2's triple 'vector' (df=1) outranks doc 5's
    # spark spam (df=3), and the irrelevant doc scores 0
    assert got[2] > got[5] and want[3] == 0.0


def test_bm25_topk_cut_and_tiebreak(spark):
    from mediacrawler_spark.operators.corpus import bm25_topk

    # identical docs tie exactly: the k-cut must keep the lowest doc_ids
    df = spark.createDataFrame(
        [(i, "same text spark here") for i in range(8)], ["doc_id", "text"]
    )
    rows = bm25_topk(df, ["spark"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert len({r["score"] for r in rows}) == 1


def test_bm25_scoring_is_a_map(spark):
    """No explode / per-(doc,term) shuffle: the only aggregation is the
    one-row stats agg and the final top-k is TakeOrderedAndProject."""
    from mediacrawler_spark.operators.corpus import bm25_topk

    df = spark.createDataFrame([(1, "spark window")], ["doc_id", "text"])
    plan = bm25_topk(df, ["spark", "window"], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no explode anywhere


def test_bm25_rejects_bad_terms(spark):
    import pytest as _pytest

    from mediacrawler_spark.operators.corpus import bm25_topk

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError):
        bm25_topk(df, [])
    with _pytest.raises(ValueError):
        bm25_topk(df, ["a", "a"])


# ---------------------------------------------------------------------------
# BPE pre-tokenizer count — independent reference: python `re` with its own
# unicode classes ([^\W\d_] for \p{L}), so agreement is a 3rd-engine check
# beside the DuckDB oracle.
# ---------------------------------------------------------------------------


def test_bpe_token_count_matches_python_re(spark):
    import re as _re

    from pyspark.sql import functions as F

    from mediacrawler_spark.functions.textual import bpe_token_count

    # python \w includes '_', which \p{L}/\p{N} do not — spell the punct
    # class as (non-space-non-word OR underscore) to match Java/RE2.
    py_pat = r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w]|_)+|\s+"
    cases = [
        "Hello, world!  It's 2026...",
        "don't stop believin'",
        "naïve café — über-cool 42x",
        "中文测试 tokens 123",
        "  leading and   multiple   spaces\t\ttabs\nnewlines  ",
        "a'b''c",
        "",
        "!!!???...,,,",
        "CamelCase snake_case kebab-case x1y2z3",
        "emoji 🙂 and ½ fractions",
    ]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], ["i", "t"])
    got = {
        r["i"]: r["n"]
        for r in df.select("i", bpe_token_count(F.col("t")).alias("n")).collect()
    }
    want = {i: len(_re.findall(py_pat, c)) for i, c in enumerate(cases)}
    assert got == want


def test_bpe_token_count_is_pure_codegen(spark):
    from pyspark.sql import functions as F

    from mediacrawler_spark.functions.textual import bpe_token_count

    df = spark.createDataFrame([("hi there",)], ["t"])
    plan = (
        df.select(bpe_token_count(F.col("t")).alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "Generate" not in plan


# ---------------------------------------------------------------------------
# token-budget data mixing — independent reference: own md5 ordering, own
# running total, own keep rule.
# ---------------------------------------------------------------------------


def _budget_ref(rows, budgets):
    import hashlib

    out = []
    by_src = {}
    for doc_id, src, toks in rows:
        by_src.setdefault(src, []).append((doc_id, toks))
    for src, docs in by_src.items():
        if src not in budgets:
            continue
        docs.sort(key=lambda d: hashlib.md5(str(d[0]).encode()).hexdigest())
        cum = 0
        for doc_id, toks in docs:
            if cum < budgets[src]:
                cum += toks
                out.append((doc_id, src, toks, cum))
    return sorted(out)


def _budget_rows(n):
    # n_tokens derived from a text of i%7+1 words
    return [(i, f"s{i % 3}", i % 7 + 1) for i in range(n)]


def _budget_df(spark, rows):
    from pyspark.sql import functions as F

    return spark.createDataFrame(rows, ["doc_id", "source", "k"]).select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.array_repeat(F.lit("w"), F.col("k").cast("int"))).alias(
            "text"
        ),
    )


def test_token_budget_sample_matches_reference(spark):
    from mediacrawler_spark.operators.corpus import token_budget_sample

    rows = _budget_rows(500)
    budgets = {"s0": 40, "s1": 7, "s2": 1}
    got = sorted(
        tuple(r) for r in token_budget_sample(
            _budget_df(spark, rows), ["source"], budgets
        ).collect()
    )
    assert got == _budget_ref(rows, budgets)
    # overshoot bound: per stratum, cum <= budget + max doc size; and the
    # LAST kept doc is the only one allowed past the budget
    for src, b in budgets.items():
        kept = [r for r in got if r[1] == src]
        assert kept, src
        over = [r for r in kept if r[3] > b]
        assert len(over) <= 1


def test_token_budget_sample_deterministic_and_strata_dropped(spark):
    from mediacrawler_spark.operators.corpus import token_budget_sample

    rows = _budget_rows(300)
    budgets = {"s0": 25}  # s1/s2 absent -> dropped entirely
    df = _budget_df(spark, rows)
    a = sorted(tuple(r) for r in token_budget_sample(df, ["source"], budgets).collect())
    b = sorted(
        tuple(r)
        for r in token_budget_sample(df.repartition(13), ["source"], budgets).collect()
    )
    assert a == b
    assert {r[1] for r in a} == {"s0"}


def test_token_budget_sample_plan_shape(spark):
    from mediacrawler_spark.operators.corpus import token_budget_sample

    df = _budget_df(spark, _budget_rows(50))
    plan = (
        token_budget_sample(df, ["source"], {"s0": 10, "s1": 10, "s2": 10})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # broadcast budget join; the cumsum window is the two-phase salted
    # form — partitioned by (stratum, _bk md5-prefix range bucket), so a
    # hot stratum spreads over 16 parallel tasks instead of one
    assert "BroadcastHashJoin" in plan
    assert "_bk" in plan
    assert "BatchEvalPython" not in plan


def test_token_budget_sample_hot_stratum_two_phase(spark):
    """One stratum holds ~all docs (the VERDICT r05 #2 shape that made the
    old Window.partitionBy(stratum) a single serial task): the two-phase
    salted cumsum must reproduce the independent reference exactly, with
    the window keyed by (stratum, bucket)."""
    from mediacrawler_spark.operators.corpus import token_budget_sample

    rows = [(i, "s1" if i % 100 == 0 else "s0", i % 7 + 1) for i in range(2000)]
    budgets = {"s0": 600, "s1": 25}
    df = _budget_df(spark, rows).repartition(2)  # few partitions: the old
    # serial form would funnel ~2000 rows through one window task
    got = sorted(
        tuple(r)
        for r in token_budget_sample(df, ["source"], budgets).collect()
    )
    assert got == _budget_ref(rows, budgets)
    plan = (
        token_budget_sample(df, ["source"], budgets)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_bk" in plan


# ---------------------------------------------------------------- shard_assign


def _shard_ref(ids, n_shards):
    """Independent reference: own md5, own hex parse, own per-shard sort."""
    import hashlib

    rows = []
    for i in ids:
        d = hashlib.md5(str(i).encode()).hexdigest()
        rows.append((i, int(d[:15], 16) % n_shards, d))
    out = {}
    by_shard = {}
    for i, s, d in rows:
        by_shard.setdefault(s, []).append((d, i))
    for s, lst in by_shard.items():
        for pos, (_, i) in enumerate(sorted(lst), start=1):
            out[i] = (s, pos)
    return out


def test_shard_assign_matches_reference(spark):
    ids = list(range(400))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assign(df, 16).collect()
    }
    assert got == _shard_ref(ids, 16)


def test_shard_assign_balanced_and_contiguous(spark):
    # clustered ids (all one prefix) still spread: the hash is the shuffle
    ids = [1000000 + i for i in range(512)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    rows = shard_assign(df, 8).collect()
    per = {}
    for r in rows:
        per.setdefault(r["shard"], []).append(r["pos"])
    assert set(per) == set(range(8))  # every shard populated
    for s, poss in per.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), s  # contiguous
    sizes = sorted(len(v) for v in per.values())
    assert sizes[0] >= 0.4 * sizes[-1]  # balanced within hash noise


def test_shard_assign_plan_one_exchange(spark):
    df = spark.createDataFrame([(i,) for i in range(32)], "doc_id bigint")
    plan = (
        shard_assign(df, 4)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan


# ------------------------------------------------ shared-span REMOVAL ----
def _remove_spans_reference(rows, n):
    """Independent pure-Python reference for remove_shared_spans: own
    tokenizer, own positional grams, own min-doc ownership rule."""
    import re

    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        for i, txt in rows
    }
    gram_occ, pos_grams = {}, {}
    for i, ts in toks.items():
        pg = []
        for p in range(1, len(ts) - n + 2):
            g = " ".join(ts[p - 1 : p - 1 + n])
            pg.append((p, g))
            gram_occ.setdefault(g, set()).add(i)
        pos_grams[i] = pg
    owner = {g: min(s) for g, s in gram_occ.items()}
    out = {}
    for i, ts in toks.items():
        cov = set()
        for p, g in pos_grams[i]:
            if len(gram_occ[g]) >= 2 and owner[g] != i:
                cov.update(range(p, p + n))
        kept = [t for j, t in enumerate(ts, 1) if j not in cov]
        frac = round(len(cov) / len(ts), 6) if ts else 0.0
        out[i] = (len(ts), len(cov), frac, " ".join(kept))
    return out


def test_remove_shared_spans_matches_reference(spark):
    """Owner doc keeps its boilerplate; every later doc loses exactly the
    covered token span; unique and too-short docs pass through whole.
    All columns (incl. the reconstructed clean text) equal the
    independent reference exactly."""
    from mediacrawler_spark.operators.corpus import remove_shared_spans

    boiler = "terms of service apply to all content on this site"  # 10 toks
    rows = [
        (10, "alpha beta gamma " + boiler + " delta epsilon"),
        (20, "zeta eta " + boiler + " theta iota kappa"),
        (30, boiler + " and nothing else here today"),
        (40, "completely unique document with no shared spans at all ok"),
        (50, "short doc"),  # < n tokens: passes through whole
        (60, ""),  # empty: 0 tokens, empty clean text
    ]
    want = _remove_spans_reference([(i, t) for i, t in rows], n=8)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_removed"],
            r["removed_frac"],
            r["clean_text"],
        )
        for r in remove_shared_spans(
            spark.createDataFrame(rows, ["doc_id", "text"]), n=8
        ).collect()
    }
    assert got == want
    # semantic spot checks: owner (10) keeps everything, later docs lose
    # the boilerplate span, unique/short/empty docs intact
    assert got[10][1] == 0 and "terms of service" in got[10][3]
    assert got[20][1] > 0 and "terms of service" not in got[20][3]
    assert got[30][1] > 0
    assert got[40][1] == 0 and got[50][1] == 0
    assert got[60] == (0, 0, 0.0, "")


def test_remove_shared_spans_no_python_eval(spark):
    """The whole pipeline (tokenize, positional grams, ownership agg,
    coverage, reconstruction) is column expressions — no Python eval
    node in the physical plan."""
    from mediacrawler_spark.operators.corpus import remove_shared_spans

    df = spark.createDataFrame([(1, "a b c d e f g h i")], ["doc_id", "text"])
    plan = (
        remove_shared_spans(df, n=8)._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan


# ---------------------------------------------------- PMI collocations ----
def _pmi_reference(rows, min_df, max_vocab, min_pair, top_k):
    """Independent reference: own tokenizer, own vocab cut, own pair
    enumeration, exact int lift numerators."""
    import re
    from itertools import combinations

    toks = {
        i: sorted({t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t})
        for i, txt in rows
    }
    n_docs = len(toks)
    df = {}
    for ts in toks.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    vocab = sorted(
        (t for t in df if df[t] >= min_df), key=lambda t: (-df[t], t)
    )[:max_vocab]
    vs = set(vocab)
    pc = {}
    for ts in toks.values():
        kt = [t for t in ts if t in vs]
        for a, b in combinations(kt, 2):
            pc[(a, b)] = pc.get((a, b), 0) + 1
    out = [
        (a, b, n, df[a], df[b], round(n * n_docs / (df[a] * df[b]), 6))
        for (a, b), n in pc.items()
        if n >= min_pair
    ]
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:top_k]


def test_pmi_collocations_matches_reference(spark):
    """Planted collocation (two rare terms always together -> max lift),
    anti-collocation (never together -> absent), frequent-everywhere
    terms (lift ~1), min_df/min_pair cuts — equal to the independent
    reference including exact counts and 6dp lift."""
    from mediacrawler_spark.operators.corpus import pmi_collocations

    rows = []
    for i in range(40):
        parts = ["common filler words here"]
        if i % 4 == 0:
            parts.append("quantum entanglement")  # planted collocation
        if i % 2 == 0:
            parts.append("alpha")
        else:
            parts.append("beta")  # alpha/beta never co-occur
        if i < 3:
            parts.append("rareword")  # below min_df
        rows.append((i, " ".join(parts)))
    args = dict(min_df=4, max_vocab=100, min_pair=3, top_k=20)
    want = _pmi_reference(rows, **args)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r["term_a"], r["term_b"], r["n_ab"], r["n_a"], r["n_b"], r["lift"])
        for r in pmi_collocations(df, **args).collect()
    ]
    assert got == want
    top = got[0]
    assert {top[0], top[1]} == {"quantum", "entanglement"} and top[5] == 4.0
    assert not any({g[0], g[1]} == {"alpha", "beta"} for g in got)
    assert not any("rareword" in (g[0], g[1]) for g in got)


def test_pmi_collocations_pinned_pair_join(spark):
    """Pair generation is a doc-keyed self-join of the vocab-int frame:
    no Python eval, no cartesian, the probe side carries the fanout pin
    (REPARTITION_BY_NUM — AQE cannot coalesce it), and the join is
    shuffle-hash, never sort-merge (per-doc groups are vocab-bounded, so
    the build side hashes cheaply and neither stream pays a sort)."""
    from mediacrawler_spark.operators.corpus import pmi_collocations

    df = spark.createDataFrame(
        [(i, "w x y z") for i in range(8)], ["doc_id", "text"]
    )
    plan = (
        pmi_collocations(df, min_df=2, min_pair=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    assert "REPARTITION_BY_NUM" in plan, plan
