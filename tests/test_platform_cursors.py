"""Per-platform cursor styles → the engine's opaque (has_more,
next_cursor) contract, including the sentinel interaction with successor
emission (a terminated chain emits no next page)."""

from pyspark.sql import functions as F

from mediacrawler_spark.operators.frontier import emit_successors
from mediacrawler_spark.operators.platform_cursors import (
    bilibili_cursor,
    kuaishou_cursor,
    tieba_cursor,
    tieba_total_pages,
    weibo_cursor,
    xhs_cursor,
    zhihu_cursor,
)


def _eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [
        (r["c"]["has_more"], r["c"]["next_cursor"])
        for r in df.select(col.alias("c")).collect()
    ]


def test_weibo_max_id_zero_is_end(spark):
    got = _eval(
        spark, weibo_cursor(F.col("max_id")),
        [(138492,), (0,), (None,)], "max_id long",
    )
    assert got == [(True, "138492"), (False, "0"), (False, "0")]


def test_kuaishou_no_more_sentinel(spark):
    got = _eval(
        spark, kuaishou_cursor(F.col("pcursor")),
        [("abc123",), ("no_more",), ("",), (None,)], "pcursor string",
    )
    assert got == [(True, "abc123"), (False, "no_more"), (False, ""), (False, "")]


def test_zhihu_next_url_offset(spark):
    url = (
        "https://www.zhihu.example/api/v4/comment_v5/zvideos/142/root_comment"
        "?limit=10&offset=456770961_10125996085_0&order_by=score"
    )
    got = _eval(
        spark, zhihu_cursor(F.col("nxt")),
        [(url,), ("",), (None,), ("https://z.example/x?limit=10",)], "nxt string",
    )
    assert got == [
        (True, "456770961_10125996085_0"),
        (False, ""),
        (False, ""),
        (False, ""),  # next URL without offset param terminates too
    ]


def test_bilibili_is_end_next(spark):
    got = _eval(
        spark, bilibili_cursor(F.col("is_end"), F.col("nxt")),
        [(False, 2), (True, 0), (None, None)], "is_end boolean, nxt long",
    )
    assert got == [(True, "2"), (False, "0"), (False, "0")]


def test_tieba_page_numbers(spark):
    rows = [(1, 25), (3, 25), (1, 5)]
    df = spark.createDataFrame(rows, "pn long, sub_count long")
    out = df.select(
        tieba_cursor(F.col("pn"), tieba_total_pages(F.col("sub_count"))).alias("c")
    ).collect()
    got = [(r["c"]["has_more"], r["c"]["next_cursor"]) for r in out]
    # 25 subs → 3 pages: pn=1 → 2, pn=3 ends; 5 subs → 1 page: pn=1 ends
    assert got == [(True, "2"), (False, "4"), (False, "2")]


def test_xhs_passthrough(spark):
    got = _eval(
        spark, xhs_cursor(F.col("cursor"), F.col("hm")),
        [("tok", True), ("tok", False), (None, None)],
        "cursor string, hm boolean",
    )
    assert got == [(True, "tok"), (False, "tok"), (False, "")]


def test_sentinel_stops_successor_emission(spark):
    """End-to-end through emit_successors: a weibo-style max_id=0 page
    (normalized to has_more=False) emits no next comment page, while the
    live chain emits exactly one."""
    schema = (
        "url string, url_hash long, host string, platform string, kind string,"
        "priority int, seq long, parent_id string, cursor string, parent_seq long,"
        "empty_streak int, attempt int, not_before_epoch int, epoch int,"
        "status int, note_id string,"
        "items array<struct<id:string,model_type:string,comments_count:int,"
        "title:string,text:string,image_refs:array<string>,video_ref:string>>,"
        "comments array<struct<comment_id:string,parent_comment_id:string,"
        "content:string,sub_comment_count:int,sub_comment_cursor:string,"
        "like_count:int,create_time:long>>,"
        "max_id long"
    )
    raw = spark.createDataFrame(
        [
            ("https://w.example/comments/n1?cursor=0", 1, "w.example", "wb",
             "comment_page", 1, 0, "n1", "0", -1, 0, 0, 0, 0, 200, "n1", [], [], 987),
            ("https://w.example/comments/n2?cursor=0", 2, "w.example", "wb",
             "comment_page", 1, 0, "n2", "0", -1, 0, 0, 0, 0, 200, "n2", [], [], 0),
        ],
        schema,
    )
    normalized = raw.select(
        "*", weibo_cursor(F.col("max_id")).alias("_c")
    ).select(
        *[c for c in raw.columns if c != "max_id"],
        F.col("_c.has_more").alias("has_more"),
        F.col("_c.next_cursor").alias("next_cursor"),
    )
    succ = emit_successors(normalized, epoch=0).collect()
    urls = sorted(r["url"] for r in succ)
    assert urls == ["https://w.example/comments/n1?cursor=987"]


def test_tieba_exact_multiple_fetches_extra_page(spark):
    """ADVICE r02: the reference loop (tieba/client.py:269) is
    ``while count // 10 + 1 >= current_page`` → count=10,20,… fetch
    floor(count/10)+1 pages, one more than ceil(count/10)."""
    rows = [(0,), (9,), (10,), (19,), (20,), (25,)]
    df = spark.createDataFrame(rows, "sub_count long")
    got = [r["p"] for r in df.select(
        tieba_total_pages(F.col("sub_count")).alias("p")
    ).collect()]
    assert got == [1, 1, 2, 2, 3, 3]
