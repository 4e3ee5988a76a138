"""Property-based tests (hypothesis) for the pure functions the whole
engine's determinism hangs on."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from mediacrawler_spark.functions.urls import canonicalize_one
from mediacrawler_spark.functions.xxhash import spark_xxhash64_str, xxh64

url_text = st.text(
    alphabet=string.ascii_letters + string.digits + "-._~",
    min_size=1,
    max_size=12,
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS"]))
    host = ".".join(draw(st.lists(url_text, min_size=1, max_size=3)))
    segs = draw(st.lists(url_text, min_size=0, max_size=4))
    path = "/" + "/".join(segs) if segs else ""
    q = draw(
        st.lists(st.tuples(url_text, url_text), min_size=0, max_size=4).map(
            lambda kv: "&".join(f"{k}={v}" for k, v in kv)
        )
    )
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return f"{scheme}://{host}{path}{'?' + q if q else ''}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    once = canonicalize_one(u)
    assert canonicalize_one(once) == once


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_drops_fragment_and_sorts_query(u):
    c = canonicalize_one(u)
    assert "#" not in c
    if "?" in c:
        qs = c.split("?", 1)[1]
        keys = [p.split("=", 1)[0] for p in qs.split("&") if p]
        assert keys == sorted(keys)


@given(st.binary(min_size=0, max_size=200), st.integers(min_value=0, max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_xxh64_stable_and_bounded(data, seed):
    h1 = xxh64(data, seed)
    h2 = xxh64(data, seed)
    assert h1 == h2
    assert 0 <= h1 < 2**64


@given(st.text(max_size=64))
@settings(max_examples=200, deadline=None)
def test_spark_hash_signed_range(s):
    v = spark_xxhash64_str(s)
    assert -(2**63) <= v < 2**63
