"""Hot-key skew report vs an independent pure-Python reference (own
Counter math, exact Fractions for the scalars)."""

from collections import Counter
from fractions import Fraction

import pytest

from mediacrawler_spark.operators.skew import key_skew_report


def _ref(keys, top_k=20):
    c = Counter(keys)
    n = len(keys)
    hhi = Fraction(sum(v * v for v in c.values()), n * n)
    hot = Fraction(max(c.values()) * len(c), n)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    return c, n, round(float(hhi), 6), round(float(hot), 6), top


@pytest.fixture(scope="module")
def keyed(spark):
    # one hot host, a mid tier, a long tail — the frontier shape
    keys = (
        ["hot.example"] * 40
        + ["mid1.example"] * 12
        + ["mid2.example"] * 12
        + [f"tail{i}.example" for i in range(16)]
    )
    return keys, spark.createDataFrame([(k,) for k in keys], "host string")


def test_matches_reference(keyed):
    keys, df = keyed
    c, n, hhi, hot, top = _ref(keys, top_k=5)
    rows = key_skew_report(df, "host", top_k=5).collect()
    rows = sorted(rows, key=lambda r: (-r["cnt"], r["key"]))
    assert [(r["key"], r["cnt"]) for r in rows] == top
    for r in rows:
        assert r["total"] == n and r["n_keys"] == len(c)
        assert r["hhi"] == pytest.approx(hhi, abs=5e-7)
        assert r["hot_factor"] == pytest.approx(hot, abs=5e-7)
        assert r["share"] == pytest.approx(round(c[r["key"]] / n, 6), abs=5e-7)


def test_uniform_is_flat(spark):
    df = spark.createDataFrame([(f"h{i}",) for i in range(8)] * 3, "host string")
    rows = key_skew_report(df, "host", top_k=8).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["hot_factor"] == 1.0
        assert r["hhi"] == 0.125  # 1/n_keys exactly


def test_single_key_is_total_concentration(spark):
    df = spark.createDataFrame([("only",)] * 9, "host string")
    r = key_skew_report(df, "host").collect()[0]
    assert (r["hhi"], r["hot_factor"], r["share"]) == (1.0, 1.0, 1.0)
    assert (r["cnt"], r["total"], r["n_keys"]) == (9, 9, 1)
