"""URL canonicalization (F1) + xxhash64 key parity (F9)."""

from pyspark.sql import functions as F

from mediacrawler_spark.functions.urls import canonicalize_one, canonicalize_urls, host_of
from mediacrawler_spark.functions.xxhash import spark_xxhash64_str


def test_canonicalize_rules():
    cases = {
        # scheme+host lowercase, default port stripped, fragment dropped
        "HTTPS://H0.Example.TEST:443/Note/ABC#frag": "https://h0.example.test/Note/ABC",
        # query params sorted; tracking params dropped; xsec_token kept
        "https://h.t/explore/x?xsec_token=T&b=2&a=1&utm_source=s": "https://h.t/explore/x?a=1&b=2&xsec_token=T",
        # duplicate slashes collapsed, trailing slash stripped
        "https://h.t//a//b/": "https://h.t/a/b",
        # root path preserved
        "https://h.t": "https://h.t/",
        "": "",
    }
    for raw, want in cases.items():
        assert canonicalize_one(raw) == want, raw


def test_canonicalize_idempotent():
    urls = [
        "https://h0.example.test/note/0123?cursor=5",
        "https://x.y/search?kw=k&page=2",
    ]
    for u in urls:
        assert canonicalize_one(canonicalize_one(u)) == canonicalize_one(u)


def test_vectorized_udf_matches_scalar(spark):
    raw = [
        "HTTPS://A.B:443/x/?utm_source=1&z=2&a=3",
        "https://h0.example.test/note/1",
        "https://h.t//doubled//path",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    got = [r["c"] for r in df.select(canonicalize_urls("url").alias("c")).collect()]
    assert got == [canonicalize_one(u) for u in raw]


def test_xxhash64_parity_with_spark(spark):
    vals = [
        "",
        "a",
        "hello world",
        "https://h0.example.test/note/0000000000000001",
        "x" * 7,
        "y" * 8,
        "z" * 31,
        "w" * 32,
        "v" * 100,
        "日本語テキスト",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for v in vals:
        assert rows[v] == spark_xxhash64_str(v), v


def test_fast_path_is_noop_subset_of_slow_path(spark):
    """Every URL the fast-path regex accepts must be a fixed point of the
    full canonicalizer — otherwise fast/slow would diverge on hashes."""
    import re

    from mediacrawler_spark.functions.urls import _FAST_PATH

    urls = [
        "https://h0.example.test/note/abc",
        "https://h0.example.test/comments/abc?cursor=0",
        "https://h.t/subcomments/n/c?cursor=no_more",
        "http://x.y/a/b/c",
        # near-misses that must NOT match the fast path:
        "https://h.t",  # no path (slow adds '/')
        "https://H.t/a",  # uppercase host
        "https://h.t/a/",  # trailing slash
        "https://h.t//a",  # doubled slash
        "https://h.t/a?b=1&c=2",  # two params
        "https://h.t/a?utm_source=x",  # tracking param
        "https://h.t:443/a",  # default port
        "https://h.t/a#frag",  # fragment
    ]
    pat = re.compile(_FAST_PATH)
    for u in urls:
        if pat.match(u):
            assert canonicalize_one(u) == u, f"fast path not a fixed point: {u}"
    # the first four are intended fast-path members
    assert all(pat.match(u) for u in urls[:4])
    assert not any(pat.match(u) for u in urls[4:])


def test_host_of(spark):
    df = spark.createDataFrame(
        [("https://H0.Example.TEST/note/1",), ("https://a.b/x?q=1",)], "url string"
    )
    got = [r["h"] for r in df.select(host_of(F.col("url")).alias("h")).collect()]
    assert got == ["h0.example.test", "a.b"]
