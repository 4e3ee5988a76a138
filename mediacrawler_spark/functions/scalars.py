"""Scalar helpers (SURVEY §2.9) — all pure column expressions.

Every function here compiles to JVM-side Catalyst expressions inside
whole-stage codegen; none drops to Python. Reference citations inline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def html_to_text(col: Column) -> Column:
    """Strip <script>/<style> blocks then all tags, collapse whitespace.

    Reference: tools/crawler_util.py:187-196 (regex strip). Two
    regexp_replace passes + trim — stays in codegen.
    """
    no_blocks = F.regexp_replace(
        col, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    no_tags = F.regexp_replace(no_blocks, r"(?s)<[^>]+>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def parse_count(col: Column) -> Column:
    """'1.2万'-style count strings → bigint.

    Reference regex-extracts the first digit run (tools/crawler_util.py:162-171)
    *ignoring* the 万/亿 multiplier; we reproduce that exact semantic for
    parity (first run of digits, else 0).
    """
    digits = F.regexp_extract(F.coalesce(col, F.lit("")), r"(\d+)", 1)
    return F.when(digits == "", F.lit(0)).otherwise(digits.cast("bigint"))


def base36_encode(col: Column) -> Column:
    """base36 of a non-negative bigint (reference: media_platform/xhs/help.py:242-265)."""
    return F.lower(F.conv(col.cast("string"), 10, 36))


def base36_decode(col: Column) -> Column:
    return F.conv(F.upper(col), 36, 10).cast("bigint")


def search_id(keyword: Column, epoch: Column) -> Column:
    """Deterministic search-session id.

    The reference generates (ms_epoch << 64) + rand → base36
    (media_platform/xhs/help.py:268-271) — nondeterministic. For
    ordering-match we derive it from xxhash64(keyword, epoch) instead.
    """
    return base36_encode(F.abs(F.xxhash64(keyword, epoch)))


def cookie_to_map(col: Column) -> Column:
    """Cookie string → map (reference: tools/crawler_util.py:134-159)."""
    return F.str_to_map(col, F.lit(r";\s*"), F.lit("="))


def gender_label(col: Column) -> Column:
    """Int/str gender code → label (reference: store/xhs/__init__.py:188-194)."""
    return (
        F.when(col.cast("string") == "1", F.lit("女"))
        .when(col.cast("string") == "0", F.lit("男"))
        .otherwise(F.lit(""))
    )


def ms_epoch_to_ts(col: Column) -> Column:
    """13-digit ms epoch → timestamp (reference: tools/time_util.py:21-26)."""
    return F.timestamp_millis(col.cast("bigint"))


def s_epoch_to_ts(col: Column) -> Column:
    """10-digit s epoch → timestamp (reference: tools/time_util.py:82-83)."""
    return F.timestamp_seconds(col.cast("bigint"))


def rfc2822_to_ts(col: Column) -> Column:
    """'Mon Dec 11 12:00:00 +0800 2023' → timestamp (tools/time_util.py:86-111)."""
    return F.to_timestamp(col, "EEE MMM dd HH:mm:ss Z yyyy")


def day_range(start: Column, end: Column) -> Column:
    """Array of days [start, end] inclusive — Bilibili per-day search slicing
    (media_platform/bilibili/core.py:100-127,176). Explode to get per-day seeds."""
    return F.sequence(F.to_date(start), F.to_date(end), F.expr("interval 1 day"))


def day_bounds_s(day: Column) -> tuple[Column, Column]:
    """[begin_ts, end_ts] epoch-seconds for one day; end = start+1d-1s
    (media_platform/bilibili/core.py:100-127)."""
    begin = F.unix_timestamp(day.cast("timestamp"))
    end = F.unix_timestamp(F.date_add(day, 1).cast("timestamp")) - 1
    return begin, end


def custom_b64(col: Column, std: str, custom: str) -> Column:
    """Custom-alphabet base64 (reference: media_platform/xhs/help.py:119-239)
    = standard base64 + alphabet translation."""
    return F.translate(F.base64(col), std, custom)


def normalize_json_text(col: Column) -> Column:
    """':undefined' → ':null' before from_json (reference:
    media_platform/xhs/client.py:449)."""
    return F.regexp_replace(col, r":\s*undefined", ":null")
