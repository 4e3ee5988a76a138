"""Span extraction + document assembly (the per-row invariant).

Each fetched page contributes *span rows* — (doc_id, sort-key, kind, text,
media_ref) — and the ``documents`` table is their per-doc ordered assembly
into ``array<struct<kind,text,media_ref,offset>>`` with dense 0-based
offsets (BASELINE.json input_hint).

Span order reproduces the reference's emission order exactly
(SURVEY §1.3):

  title, text, images (list order), video,            -- the note itself
  then per comment page p (cursor order):             -- client.py:345-369
     the page's root comments (page order),
     then each root's sub-comment chain, roots in page order

The six-field sort key encodes that total order:
  (section, page, phase, parent_ordinal, sub_page, idx)
  section: 0 title | 1 text | 2 image | 3 video | 4 comments
  phase:   0 root page | 1 sub chains of that page

Assembly is one hash aggregation + JVM-side array sort —
``sort_array(collect_list(struct(...)))`` then ``transform`` for dense
offsets. No Python anywhere; no window over the span table needed.

W4 truncation: root comments beyond ``max_comments_per_note`` are cut at
extraction (the reference slices the last page —
media_platform/xhs/client.py:357-358); sub-comments follow their parent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("s_sec", T.IntegerType(), False),
        T.StructField("s_page", T.LongType(), False),
        T.StructField("s_phase", T.IntegerType(), False),
        T.StructField("s_parent", T.LongType(), False),
        T.StructField("s_subpage", T.LongType(), False),
        T.StructField("s_idx", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
    ]
)
SPAN_ROW_COLS = [f.name for f in SPAN_ROWS_SCHEMA.fields]


def _doc_id(platform, note_id):
    return F.concat(platform, F.lit(":note:"), note_id)


def _span_exprs(comments_per_page: int, max_comments_per_note: int) -> dict:
    """All static Column trees of :func:`extract_span_rows`, built once
    per session (see functions/exprcache.py — per-epoch re-construction
    of these lists dominated the epoch loop's py4j round-trips)."""
    zero = F.lit(0).cast("long")
    d: dict = {}
    d["detail_filter"] = (F.col("kind") == "detail") & (F.size("items") > 0)
    d["detail_it"] = F.try_element_at(F.col("items"), F.lit(1))
    d["detail_sel"] = [
        _doc_id(F.col("platform"), F.col("note_id")).alias("doc_id"),
        F.col("it.title").alias("title"),
        F.col("it.text").alias("text"),
        F.col("it.image_refs").alias("image_refs"),
        F.col("it.video_ref").alias("video_ref"),
    ]
    d["title_sel"] = [
        "doc_id", F.lit(0).alias("s_sec"), zero.alias("s_page"),
        F.lit(0).alias("s_phase"), zero.alias("s_parent"), zero.alias("s_subpage"),
        zero.alias("s_idx"), F.lit("title").alias("kind"),
        F.col("title").alias("text"), F.lit("").alias("media_ref"),
    ]
    d["body_sel"] = [
        "doc_id", F.lit(1).alias("s_sec"), zero.alias("s_page"),
        F.lit(0).alias("s_phase"), zero.alias("s_parent"), zero.alias("s_subpage"),
        zero.alias("s_idx"), F.lit("text").alias("kind"),
        F.col("text"), F.lit("").alias("media_ref"),
    ]
    d["images_pos"] = ["doc_id", F.posexplode(F.col("image_refs")).alias("pos", "ref")]
    d["images_sel"] = [
        "doc_id", F.lit(2).alias("s_sec"), zero.alias("s_page"),
        F.lit(0).alias("s_phase"), zero.alias("s_parent"), zero.alias("s_subpage"),
        F.col("pos").cast("long").alias("s_idx"), F.lit("image").alias("kind"),
        F.lit("").alias("text"), F.col("ref").alias("media_ref"),
    ]
    d["video_filter"] = F.col("video_ref") != ""
    d["video_sel"] = [
        "doc_id", F.lit(3).alias("s_sec"), zero.alias("s_page"),
        F.lit(0).alias("s_phase"), zero.alias("s_parent"), zero.alias("s_subpage"),
        zero.alias("s_idx"), F.lit("video").alias("kind"),
        F.lit("").alias("text"), F.col("video_ref").alias("media_ref"),
    ]
    d["listing_filter"] = F.col("kind") == "listing"
    d["listing_sel"] = [
        F.col("platform"),
        F.col("note_id").alias("uid"),
        F.explode(F.col("items")).alias("it"),
    ]
    d["profile_filter"] = F.col("it.model_type") == "creator_profile"
    d["profile_sel"] = [
        F.concat(F.col("platform"), F.lit(":creator:"), F.col("uid")).alias("doc_id"),
        F.col("it.title").alias("title"),
        F.col("it.text").alias("text"),
    ]
    d["cpage_filter"] = F.col("kind") == "comment_page"
    d["roots_sel"] = [
        _doc_id(F.col("platform"), F.col("note_id")).alias("doc_id"),
        F.col("seq").alias("page"),
        F.posexplode(F.col("comments")).alias("idx", "c"),
    ]
    d["roots_budget"] = (
        F.col("page") * comments_per_page + F.col("idx") < max_comments_per_note
    )
    d["roots_out"] = [
        "doc_id", F.lit(4).alias("s_sec"), F.col("page").alias("s_page"),
        F.lit(0).alias("s_phase"),
        (F.col("page") * comments_per_page + F.col("idx")).cast("long").alias("s_parent"),
        zero.alias("s_subpage"), zero.alias("s_idx"),
        F.lit("comment").alias("kind"),
        F.col("c.content").alias("text"), F.lit("").alias("media_ref"),
    ]
    d["spage_filter"] = F.col("kind") == "sub_comment_page"
    d["subs_sel"] = [
        _doc_id(F.col("platform"), F.col("note_id")).alias("doc_id"),
        (F.col("parent_seq") / comments_per_page).cast("long").alias("s_page"),
        F.col("parent_seq").alias("s_parent"),
        F.col("seq").alias("s_subpage"),
        F.posexplode(F.col("comments")).alias("idx", "c"),
    ]
    d["subs_out"] = [
        "doc_id", F.lit(4).alias("s_sec"), F.col("s_page"),
        F.lit(1).alias("s_phase"), F.col("s_parent"), F.col("s_subpage"),
        F.col("idx").cast("long").alias("s_idx"),
        F.lit("comment").alias("kind"),
        F.col("c.content").alias("text"), F.lit("").alias("media_ref"),
    ]
    return d


def extract_span_rows(
    successes: DataFrame,
    comments_per_page: int = 10,
    max_comments_per_note: int = 500,
) -> DataFrame:
    """Successful fetches of one epoch → span rows (pure expr + explode)."""
    from mediacrawler_spark.functions.exprcache import cached_exprs

    d = cached_exprs(_span_exprs, comments_per_page, max_comments_per_note)

    # --- note detail: title, text, images, video ---------------------------
    detail = (
        successes.filter(d["detail_filter"])
        .withColumn("it", d["detail_it"])
        .select(*d["detail_sel"])
    )
    title = detail.select(*d["title_sel"])
    body = detail.select(*d["body_sel"])
    images = detail.select(*d["images_pos"]).select(*d["images_sel"])
    video = detail.filter(d["video_filter"]).select(*d["video_sel"])

    # --- creator profile (first listing page carries a profile item) --------
    profile = (
        successes.filter(d["listing_filter"])
        .select(*d["listing_sel"])
        .filter(d["profile_filter"])
        .select(*d["profile_sel"])
    )
    p_title = profile.select(*d["title_sel"])
    p_body = profile.select(*d["body_sel"])

    # --- root comments (comment pages), W4 truncation -----------------------
    roots = (
        successes.filter(d["cpage_filter"])
        .select(*d["roots_sel"])
        .filter(d["roots_budget"])
        .select(*d["roots_out"])
    )

    # --- sub comments: sort after their parent's page ------------------------
    subs = (
        successes.filter(d["spage_filter"])
        .select(*d["subs_sel"])
        .select(*d["subs_out"])
    )

    out = title
    for part in (body, images, video, p_title, p_body, roots, subs):
        out = out.unionByName(part)
    return out.select(*SPAN_ROW_COLS)


def assemble_documents(span_rows: DataFrame) -> DataFrame:
    """Span rows (any number of epochs) → the ``documents`` table.

    One shuffle on doc_id; the sort is a per-row array sort (JVM codegen),
    not a window. Offsets are re-densified so robots-denied or truncated
    segments never leave gaps.
    """
    packed = F.struct(
        F.col("s_sec"), F.col("s_page"), F.col("s_phase"),
        F.col("s_parent"), F.col("s_subpage"), F.col("s_idx"),
        F.col("kind"), F.col("text"), F.col("media_ref"),
    )
    return (
        span_rows.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(packed)).alias("arr"))
        .select(
            "doc_id",
            F.transform(
                F.col("arr"),
                lambda x, i: F.struct(
                    x["kind"].alias("kind"),
                    x["text"].alias("text"),
                    x["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )
