"""Directed shingle-containment join: planted contained docs must be
found, the brute-force reference must be reproduced exactly, and the
asymmetry must be real (A-in-B without B-in-A).

The reference below is an INDEPENDENT pure-Python implementation — own
tokenizer, own shingling, own set math — never the package helpers, so
agreement is a format check, not self-agreement.
"""

import re

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.operators.text_dedup import containment_join


def _brute_containment(rows, k=3, threshold=0.8):
    """Ordered (id_a, id_b, containment) pairs with |A∩B|/|A| >= t."""

    def sh(text):
        toks = [t for t in re.split(r"[^A-Za-z0-9]+", text.lower()) if t]
        if len(toks) >= k:
            return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
        return {" ".join(toks)}

    sets = {i: sh(t) for i, t in rows}
    out = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not sa:
                continue
            c = len(sa & sb) / len(sa)
            if c >= threshold:
                out[(a, b)] = c
    return out


LONG = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu one two three four five six seven"
)
# a contiguous chunk of LONG: every shingle of CHUNK is a shingle of LONG
CHUNK = "echo foxtrot golf hotel india juliet kilo lima mike november"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("c00", LONG),
        ("c01", CHUNK),  # fully contained in c00, reverse far below t
        ("c02", CHUNK + " extra trailing words here"),  # partially contained
        ("c03", LONG),  # exact dup: containment 1.0 BOTH directions
        ("c04", "totally unrelated text about bloom filters and cuckoo"
                " hash tables deduplicating ten billion crawled urls fast"),
    ]
    return rows, spark.createDataFrame(rows, "doc_id string, text string")


def test_planted_containment_found(docs):
    rows, df = docs
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join(df, threshold=0.8).collect()
    }
    assert got[("c01", "c00")] == 1.0
    assert got[("c01", "c03")] == 1.0
    # exact dups contain each other
    assert got[("c00", "c03")] == 1.0 and got[("c03", "c00")] == 1.0
    # asymmetry: the long doc is NOT contained in its chunk
    assert ("c00", "c01") not in got
    # unrelated doc pairs with nothing
    assert not any("c04" in p for p in got)


@pytest.mark.parametrize("threshold", [0.5, 0.8, 1.0])
def test_matches_brute_force(docs, threshold):
    rows, df = docs
    want = _brute_containment(rows, threshold=threshold)
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join(df, threshold=threshold).collect()
    }
    assert set(got) == set(want)
    for p, c in want.items():
        assert got[p] == pytest.approx(c, abs=1e-12)


def test_brute_force_on_sliding_window_corpus(spark):
    """Overlapping-window corpus: dense partial containments at every
    level — the regime where prefix-filter completeness actually bites."""
    words = [f"w{i:02d}" for i in range(40)]
    rows = []
    for i, start in enumerate(range(0, 28, 4)):
        rows.append((f"s{i:02d}", " ".join(words[start : start + 16])))
    rows.append(("sall", " ".join(words)))  # container of every window
    df = spark.createDataFrame(rows, "doc_id string, text string")
    want = _brute_containment(rows, threshold=0.6)
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join(df, threshold=0.6).collect()
    }
    assert set(got) == set(want)
    for p, c in want.items():
        assert got[p] == pytest.approx(c, abs=1e-12)
    # sanity on the corpus shape: every window is contained in sall
    assert all((f"s{i:02d}", "sall") in got for i in range(7))
    # and sall is contained in no window
    assert not any(a == "sall" for a, _ in got)
