"""Per-platform cursor normalizers (SURVEY W3: six distinct pagination
styles, one opaque engine contract).

The engine treats pagination as ``cursor: string`` + ``has_more`` and
emits the successor page from them (operators/frontier.py). The reference
has six per-platform styles; each normalizer here is a pure column
expression mapping the platform's raw paging fields onto that contract,
so a live adapter needs ONE select per platform and the frontier dataflow
stays generic:

- **xhs**: opaque cursor + explicit has_more boolean
  (xhs/client.py:343-358: loop ``while comments_has_more``).
- **weibo**: numeric ``max_id``; ``max_id == 0`` means end
  (weibo/client.py:186-193: ``is_end = max_id == 0``).
- **kuaishou**: ``pcursor`` with the literal sentinel ``"no_more"``
  (kuaishou/client.py:203-209: ``while pcursor != "no_more"``).
- **zhihu**: a full next-page URL whose ``offset`` query param is the
  cursor; empty/missing next URL means end (zhihu/help.py:274-292
  ``extract_offset``: urlparse → query ``offset``).
- **bilibili**: cursor object with ``is_end`` + numeric ``next`` page
  (bilibili/client.py:239-246).
- **tieba**: plain page number ``pn`` increments; sub-comment pages run
  ``pn`` = 1..ceil(sub_count/10) (tieba/client.py:186,269-275).

Each returns ``struct<has_more boolean, next_cursor string>``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _pack(has_more: Column, next_cursor: Column) -> Column:
    return F.struct(
        has_more.alias("has_more"),
        F.coalesce(next_cursor, F.lit("")).alias("next_cursor"),
    )


def xhs_cursor(cursor: Column, has_more: Column) -> Column:
    """Opaque token + explicit flag — already the engine contract."""
    return _pack(F.coalesce(has_more, F.lit(False)), cursor)


def weibo_cursor(max_id: Column) -> Column:
    """``max_id`` chain; 0 (or null) is the end sentinel."""
    mid = F.coalesce(max_id.cast("long"), F.lit(0))
    return _pack(mid != 0, mid.cast("string"))


def kuaishou_cursor(pcursor: Column) -> Column:
    """``pcursor`` token with the literal ``"no_more"`` end sentinel
    (empty string also terminates — the reference's .get default)."""
    p = F.coalesce(pcursor, F.lit(""))
    return _pack((p != "no_more") & (p != ""), p)


def zhihu_cursor(next_url: Column) -> Column:
    """Next-page URL → its ``offset`` query param is the cursor; a
    missing/empty next URL ends the chain."""
    offset = F.parse_url(next_url, F.lit("QUERY"), F.lit("offset"))
    return _pack(
        next_url.isNotNull() & (next_url != "") & offset.isNotNull(),
        offset,
    )


def bilibili_cursor(is_end: Column, next_page: Column) -> Column:
    """Cursor object: explicit ``is_end`` + numeric ``next``."""
    return _pack(
        ~F.coalesce(is_end, F.lit(True)),
        F.coalesce(next_page.cast("long"), F.lit(0)).cast("string"),
    )


def tieba_cursor(pn: Column, total_pages: Column) -> Column:
    """Plain page number: next = pn+1 while pn < total pages (the
    reference iterates sub pages 1..ceil(count/10))."""
    cur = F.coalesce(pn.cast("long"), F.lit(1))
    return _pack(cur < F.coalesce(total_pages.cast("long"), F.lit(1)), (cur + 1).cast("string"))


def tieba_total_pages(sub_comment_count: Column, page_size: int = 10) -> Column:
    """floor(count / page_size) + 1 — tieba/client.py:269 loops
    ``while sub_comment_count // 10 + 1 >= current_page``, so exact
    multiples of the page size fetch one extra (usually empty) page;
    count=0 still yields 1 page, matching the loop bound exactly."""
    n = F.coalesce(sub_comment_count.cast("long"), F.lit(0))
    return (F.floor(n / F.lit(page_size)) + F.lit(1)).cast("long")
