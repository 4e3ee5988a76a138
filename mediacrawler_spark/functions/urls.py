"""URL canonicalization + hashing — the dedup key of the whole engine.

The reference dedups via a DB unique-key lookup per record
(store/xhs/xhs_store_impl.py:127-133) and parses URLs ad hoc
(tools/crawler_util.py:198-205 ``extract_url_params_to_dict``;
media_platform/xhs/help.py:294-306 ``parse_note_info_from_note_url``;
media_platform/zhihu/help.py:441-460 URL-kind dispatch).

Here: one canonical form, one 64-bit key.

- ``canonicalize_urls`` is a *vectorized pandas UDF* (Arrow-batched — the
  input_hint forbids per-row Python): lowercase scheme+host, strip default
  ports and fragments, sort query params, drop tracking params, collapse
  duplicate slashes, strip trailing slash on non-root paths.
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


@F.pandas_udf(T.StringType())
def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalizer (Arrow batch in/out)."""
    urls = urls.fillna("")
    fast = urls.str.match(_FAST_PATH)
    out = urls.copy()
    slow = ~fast
    if slow.any():
        out[slow] = urls[slow].map(_canonicalize_one)
    return out


def host_of(url: Column) -> Column:
    """Lowercased host — pure column expr, stays in codegen."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def url_param(url: Column, key: str) -> Column:
    """Single query param (reference: extract_url_params_to_dict)."""
    return F.parse_url(url, F.lit("QUERY"), F.lit(key))


def url_path(url: Column) -> Column:
    return F.parse_url(url, F.lit("PATH"))


def with_canonical_url(df: DataFrame, url_col: str = "url") -> DataFrame:
    return df.withColumn(url_col, canonicalize_urls(F.col(url_col)))


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
    seeds identically (tests pin column/python agreement)."""
    path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
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
