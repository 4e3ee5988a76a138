"""URL canonicalization + hashing — the dedup key of the whole engine.

The reference dedups via a DB unique-key lookup per record
(store/xhs/xhs_store_impl.py:127-133) and parses URLs ad hoc
(tools/crawler_util.py:198-205 ``extract_url_params_to_dict``;
media_platform/xhs/help.py:294-306 ``parse_note_info_from_note_url``;
media_platform/zhihu/help.py:441-460 URL-kind dispatch).

Here: one canonical form, one 64-bit key.

- ``canonicalize_urls`` is a *hybrid* canonicalizer: URLs matching the
  ``_JVM_ELIGIBLE`` grammar (effectively all real crawl URLs) are
  canonicalized entirely by JVM column expressions inside whole-stage
  codegen — lowercase scheme+host, strip default ports and fragments,
  sort query params, drop tracking params, collapse duplicate slashes,
  strip trailing slash on non-root paths. Only the grammar's complement
  (escapes, userinfo, IPv6, odd separators) pays the python slow path,
  which receives NULL for eligible rows so Arrow transfers and per-row
  parses scale with the weird tail, not the corpus.
- ``with_url_key`` then computes ``xxhash64(canonical_url)`` with the
  *built-in* JVM-side ``F.xxhash64`` — the hash never leaves codegen.
- ``host_of`` / ``url_param`` are pure column expressions
  (``parse_url`` — JVM-side, whole-stage codegen).
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Params that never affect page identity (analytics noise). The reference
# keeps xsec_token (it is required to re-fetch a note —
# media_platform/xhs/help.py:294-306) so we keep unknown params by default
# and drop only a known-tracking denylist.
_TRACKING_PARAMS = frozenset(
    {
        "utm_source",
        "utm_medium",
        "utm_campaign",
        "utm_term",
        "utm_content",
        "spm",
        "share_token",
        "share_id",
        "from",
        "timestamp",
        "_t",
    }
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def _canonicalize_one(url: str) -> str:
    if not url:
        return ""
    try:
        scheme, netloc, path, query, _frag = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = (scheme or "https").lower()
    netloc = netloc.lower()
    host, sep, port = netloc.partition(":")
    if sep and port == _DEFAULT_PORTS.get(scheme, ""):
        netloc = host
    while "//" in path:
        path = path.replace("//", "/")
    if len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    if not path:
        path = "/"
    if query:
        kept = sorted(
            (k, v) for k, v in parse_qsl(query, keep_blank_values=True)
            if k not in _TRACKING_PARAMS
        )
        query = urlencode(kept)
    return urlunsplit((scheme, netloc, path, query, ""))


# Already-canonical URLs skip the slow parse: lowercase scheme://host,
# no port, no fragment, no doubled slash, no trailing slash, and at most
# one non-tracking query param (a single param is trivially sorted;
# 'cursor' covers the engine's own pagination successors). In steady
# state nearly every URL the engine itself emits hits this path; only
# external/seeded URLs pay full parsing.
_FAST_PATH = r"^https?://[a-z0-9.\-]+(/[^/?#]+)+(\?cursor=[A-Za-z0-9_.\-]*)?$"

# URLs whose canonicalization is expressible as pure JVM column functions:
# a real scheme, a plain host (no userinfo/IPv6), optional numeric port,
# any path, and a query whose k=v pairs use only characters that python's
# parse_qsl→urlencode round-trip leaves byte-identical (unreserved chars,
# exactly one '=' per pair, no %-escapes/+/;). Everything else takes the
# python slow path. Measured: ~75% of admission CPU was the per-row python
# canonicalizer; on this grammar the whole transform stays in codegen.
_JVM_ELIGIBLE = (
    r"^[A-Za-z][A-Za-z0-9+.\-]*://[A-Za-z0-9.\-]+(:[0-9]+)?"
    r"(/[A-Za-z0-9._~!$&'()*+,;=:@/\-]*)?"
    r"(\?[A-Za-z0-9_.~\-]+=[A-Za-z0-9_.~\-]*(&[A-Za-z0-9_.~\-]+=[A-Za-z0-9_.~\-]*)*)?"
    r"(#.*)?$"
)


def _canonicalize_expr(u: Column) -> Column:
    """JVM mirror of ``_canonicalize_one`` for ``_JVM_ELIGIBLE`` URLs.

    Step-for-step: strip fragment, lowercase scheme+authority, strip the
    scheme's default port, collapse duplicate slashes, strip one trailing
    slash on non-root paths, empty path → "/", drop tracking params, sort
    remaining params by (key, value). Equality with the python slow path
    on the eligible grammar is property-tested (tests/test_urls.py).

    Perf shape: codegen does NOT eliminate common subexpressions inside
    conditional branches, so every value here is derived from its own
    single ``parse_url`` call (one parse per part, no shared ``base``
    chain re-evaluated per reference) and multi-use chains are kept to
    short-string regexes. The eligible grammar excludes %-escapes and
    spaces so ``parse_url`` (java.net.URI) always parses it."""
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    # eligible grammar has no userinfo, so AUTHORITY == host[:port]
    auth = F.lower(F.parse_url(u, F.lit("AUTHORITY")))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, r":443$", ""))
        .otherwise(auth)
    )
    # collapse slash runs, then strip ONE trailing slash iff a char
    # precedes it (the len>1 rule) — a single linear regex chain
    path = F.regexp_replace(
        F.regexp_replace(
            F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")), r"/{2,}", "/"
        ),
        r"(.)/$",
        "$1",
    )
    path = F.coalesce(F.nullif(path, F.lit("")), F.lit("/"))

    pairs = F.filter(
        F.split(F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit("")), "&"),
        lambda x: x != "",
    )
    kv = F.transform(
        pairs,
        lambda x: F.struct(
            F.element_at(F.split(x, "=", 2), 1).alias("k"),
            F.element_at(F.split(x, "=", 2), 2).alias("v"),
        ),
    )
    kept = F.array_sort(
        F.filter(kv, lambda s: ~s["k"].isin(*sorted(_TRACKING_PARAMS)))
    )
    qjoin = F.array_join(
        F.transform(kept, lambda s: F.concat(s["k"], F.lit("="), s["v"])), "&"
    )
    # concat_ws skips NULLs: no '?' when every param was dropped
    return F.concat_ws(
        "?", F.concat(scheme, F.lit("://"), auth, path), F.nullif(qjoin, F.lit(""))
    )


@F.pandas_udf(T.StringType())
def _canonicalize_slow(urls: pd.Series) -> pd.Series:
    """Python slow path — receives NULL for JVM-eligible rows so the Arrow
    transfer and the per-row parse run only on the weird tail."""
    out = pd.Series(index=urls.index, dtype=object)
    mask = urls.notna()
    if mask.any():
        sub = urls[mask]
        fast = sub.str.match(_FAST_PATH)
        res = sub.copy()
        if (~fast).any():
            res[~fast] = sub[~fast].map(_canonicalize_one)
        out[mask] = res
    return out


def canonicalize_urls(url: Column) -> Column:
    """Canonical URL — hybrid: regular URLs entirely in whole-stage
    codegen, python (Arrow-batched) only for the grammar's complement."""
    u = F.trim(F.coalesce(url, F.lit("")))
    ok = u.rlike(_JVM_ELIGIBLE)
    return F.when(ok, _canonicalize_expr(u)).otherwise(
        _canonicalize_slow(F.when(~ok, u))
    )


def host_of(url: Column) -> Column:
    """Lowercased host — pure column expr, stays in codegen."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def url_param(url: Column, key: str) -> Column:
    """Single query param (reference: extract_url_params_to_dict)."""
    return F.parse_url(url, F.lit("QUERY"), F.lit(key))


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Canonicalize ``url_col`` with the same per-row result as
    ``canonicalize_urls``, split at the DataFrame level: JVM-eligible rows
    stay entirely inside whole-stage codegen; the Arrow UDF pass runs only
    over the grammar's complement.

    The Column hybrid must keep its ``when/otherwise`` form (a Column
    cannot drop rows), which plants an ArrowEvalPython node over EVERY row
    (NULL input for the eligible ones) and pushes the big canonicalize
    expression into a non-codegen Project; the split form measured
    ~1.3–1.6× faster on the 2M-URL admission bench with identical output
    checksums. Cost: the source is scanned twice (filter + complement) —
    callers feed it materialized reads (the engine's per-epoch candidates
    parquet, the bench generator), never an expensive lazy chain. Batch
    only — streaming keeps the Column hybrid (one pass, no union).
    Byte-parity with the Column path is pinned in tests/test_urls.py."""
    from mediacrawler_spark.functions.exprcache import cached_exprs

    d = cached_exprs(_split_canonical_exprs, url_col)
    fast = df.filter(d["ok"]).withColumn(url_col, d["fast"])
    slow = df.filter(d["not_ok"]).withColumn(url_col, d["slow"])
    return fast.unionByName(slow)


def _split_canonical_exprs(url_col: str) -> dict:
    """Static Column trees of :func:`with_canonical_url`, built once per
    session per url column (functions/exprcache.py) — the canonicalizer
    tree is the largest expression in the epoch loop and rebuilding it
    every epoch was ~85 py4j round-trips."""
    u = F.trim(F.coalesce(F.col(url_col), F.lit("")))
    ok = u.rlike(_JVM_ELIGIBLE)
    return {
        "ok": ok,
        "not_ok": ~ok,
        "fast": _canonicalize_expr(u),
        "slow": _canonicalize_slow(u),
    }


def with_url_key(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds url_hash (xxhash64, JVM built-in) + host columns."""
    return df.withColumn("url_hash", F.xxhash64(F.col(url_col))).withColumn(
        "host", host_of(F.col(url_col))
    )


# --- URL-kind dispatch for bare-URL seeds (S2) ------------------------------
# The reference infers the content kind from URL shape when a user supplies
# bare URLs (media_platform/zhihu/help.py:441-460 judge_zhihu_url: /answer/ →
# answer, /p/ → article, /zvideo/ → zvideo). The engine's URL grammar maps
# path markers to frontier kinds the same way; unknown shapes default to
# "detail" (the reference's specified-URL mode treats bare URLs as notes).
_KIND_MARKERS: tuple[tuple[str, str], ...] = (
    ("/search", "search_page"),
    ("/subcomments/", "sub_comment_page"),
    ("/comments/", "comment_page"),
    ("/user/", "listing"),
    ("/creator/", "listing"),
)


def infer_kind_py(url: str) -> str:
    """Python twin of :func:`infer_kind` — the oracle must dispatch bare
    seeds identically (tests pin column/python agreement). The path is
    truncated at '?'/'#' so a marker inside a query/fragment never flips
    the kind — :func:`infer_kind` sees only parse_url(PATH), which
    excludes both."""
    path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
    path = path.split("?", 1)[0].split("#", 1)[0]
    for marker, kind in _KIND_MARKERS:
        if marker in path:
            return kind
    return "detail"


def infer_kind(url: Column) -> Column:
    """Frontier kind from URL shape — pure column expression (codegen)."""
    expr = F.lit("detail")
    p = url_path(url)
    for marker, kind in reversed(_KIND_MARKERS):
        expr = F.when(p.contains(marker), F.lit(kind)).otherwise(expr)
    return expr


# Re-exported for driver-side fixture/oracle use (single-threaded oracle must
# hash identically; xxhash64 parity is checked in tests via Spark itself).
canonicalize_one = _canonicalize_one
