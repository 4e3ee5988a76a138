"""Golden span-sequence fixtures — the per-row invariant (input_hint).

Hand-written fetched rows → exact expected (kind, text, media_ref, offset)
sequences, mirroring the reference's emission order: title, desc, images,
video (store/xhs/__init__.py:89-111), then comment pages in cursor order
with sub-comments directly after their parent page
(media_platform/xhs/client.py:345-369).
"""

from pyspark.sql import functions as F

from mediacrawler_spark.operators.extract import assemble_documents, extract_span_rows

FETCHED_DDL = (
    "url string, url_hash long, host string, platform string, kind string,"
    "priority int, seq long, parent_id string, cursor string, parent_seq long,"
    "empty_streak int, attempt int, not_before_epoch int, epoch int,"
    "status int, body_kind string, note_id string, has_more boolean,"
    "next_cursor string,"
    "items array<struct<id string, model_type string, comments_count int,"
    "title string, text string, image_refs array<string>, video_ref string>>,"
    "comments array<struct<comment_id string, parent_comment_id string,"
    "content string, sub_comment_count int, sub_comment_cursor string,"
    "like_count int, create_time bigint>>"
)


def _row(kind, seq=0, parent_seq=-1, note_id="n1", items=None, comments=None):
    return (
        f"https://h/{kind}/{seq}", hash((kind, seq, parent_seq)) % 10**9, "h",
        "xhs", kind, 0, seq, None, "", parent_seq, 0, 0, 0, 0,
        200, kind, note_id, False, "", items or [], comments or [],
    )


def _item(title="T", text="B", images=(), video=""):
    return ("n1", "note", 5, title, text, list(images), video)


def _comment(cid, content, subs=0):
    return (cid, "", content, subs, "0" if subs else "", 0, 0)


def _spans_of(spark, rows, **kw):
    df = spark.createDataFrame(rows, FETCHED_DDL)
    docs = assemble_documents(extract_span_rows(df, **kw)).collect()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in docs
    }


def test_note_only_order(spark):
    rows = [_row("detail", items=[_item("T", "B", ["i1", "i2"], "v1")])]
    got = _spans_of(spark, rows)
    assert got["xhs:note:n1"] == [
        ("title", "T", "", 0),
        ("text", "B", "", 1),
        ("image", "", "i1", 2),
        ("image", "", "i2", 3),
        ("video", "", "v1", 4),
    ]


def test_comments_interleave_after_note(spark):
    rows = [
        # comment pages arrive in a different epoch/order than the note
        _row("comment_page", seq=1, comments=[_comment("c10", "p1c0")]),
        _row("detail", items=[_item("T", "B")]),
        _row("comment_page", seq=0, comments=[_comment("c00", "p0c0"), _comment("c01", "p0c1")]),
    ]
    got = _spans_of(spark, rows)
    assert got["xhs:note:n1"] == [
        ("title", "T", "", 0),
        ("text", "B", "", 1),
        ("comment", "p0c0", "", 2),
        ("comment", "p0c1", "", 3),
        ("comment", "p1c0", "", 4),
    ]


def test_sub_comments_follow_parent_page(spark):
    """Reference order: page-0 roots, then sub-chains of page-0 parents (in
    parent order), then page-1 roots (xhs/client.py:359-369)."""
    rows = [
        _row("detail", items=[_item("T", "B")]),
        _row("comment_page", seq=0,
             comments=[_comment("c00", "r0", subs=2), _comment("c01", "r1", subs=1)]),
        _row("comment_page", seq=1, comments=[_comment("c10", "r2")]),
        # sub pages: parent_seq = page*10 + idx
        _row("sub_comment_page", seq=0, parent_seq=0,
             comments=[_comment("s000", "sub-r0-a"), _comment("s001", "sub-r0-b")]),
        _row("sub_comment_page", seq=0, parent_seq=1,
             comments=[_comment("s010", "sub-r1-a")]),
    ]
    got = _spans_of(spark, rows)
    texts = [t for (k, t, m, o) in got["xhs:note:n1"] if k == "comment"]
    assert texts == ["r0", "r1", "sub-r0-a", "sub-r0-b", "sub-r1-a", "r2"]


def test_sub_comment_multipage_order(spark):
    rows = [
        _row("comment_page", seq=0, comments=[_comment("c00", "r0", subs=5)]),
        _row("sub_comment_page", seq=1, parent_seq=0, comments=[_comment("s2", "q-page1")]),
        _row("sub_comment_page", seq=0, parent_seq=0, comments=[_comment("s1", "q-page0")]),
    ]
    got = _spans_of(spark, rows)
    texts = [t for (k, t, m, o) in got["xhs:note:n1"] if k == "comment"]
    assert texts == ["r0", "q-page0", "q-page1"]


def test_truncation_w4(spark):
    """Root comments beyond the per-note budget are cut mid-page
    (reference slices the last page — xhs/client.py:357-358)."""
    rows = [
        _row("comment_page", seq=0, comments=[_comment(f"c{i}", f"r{i}") for i in range(10)]),
        _row("comment_page", seq=1, comments=[_comment(f"c1{i}", f"r1{i}") for i in range(10)]),
    ]
    got = _spans_of(spark, rows, max_comments_per_note=13)
    texts = [t for (k, t, m, o) in got["xhs:note:n1"] if k == "comment"]
    assert len(texts) == 13
    assert texts[-1] == "r12"


def test_offsets_dense_and_zero_based(spark):
    rows = [_row("detail", items=[_item("T", "B", ["i1"], "")])]
    got = _spans_of(spark, rows)
    offs = [o for (_, _, _, o) in got["xhs:note:n1"]]
    assert offs == list(range(len(offs)))
