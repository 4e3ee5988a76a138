"""K3 upsert semantics + the remaining §2.9 scalar functions."""

from pyspark.sql import functions as F

from mediacrawler_spark.functions.scalars import (
    cdn_image_url,
    comma_join_refs,
    custom_b64,
    trace_id,
    unpack_interactions,
    wbi_sign,
)
from mediacrawler_spark.sinks.upsert import merge_with_insert_only_cols


def test_merge_preserves_add_ts(spark):
    """Reference contract: add_ts only on insert (xhs_store_impl.py:130-131),
    last_modify_ts always updated (store/xhs/__init__.py:107)."""
    ddl = "note_id string, title string, add_ts long, last_modify_ts long"
    existing = spark.createDataFrame(
        [("n1", "old title", 100, 100), ("n2", "keep me", 150, 150)], ddl
    )
    updates = spark.createDataFrame(
        [("n1", "new title", 999, 200), ("n3", "brand new", 201, 201)], ddl
    )
    out = {
        r["note_id"]: r
        for r in merge_with_insert_only_cols(existing, updates, "note_id").collect()
    }
    assert out["n1"]["title"] == "new title"
    assert out["n1"]["add_ts"] == 100  # preserved on match
    assert out["n1"]["last_modify_ts"] == 200  # updated
    assert out["n2"]["title"] == "keep me"  # untouched rows survive
    assert out["n3"]["add_ts"] == 201  # fresh insert keeps its own
    assert len(out) == 3


def test_merge_into_empty(spark):
    ddl = "note_id string, add_ts long"
    updates = spark.createDataFrame([("n1", 1)], ddl)
    assert merge_with_insert_only_cols(None, updates, "note_id").count() == 1


def test_wbi_sign_deterministic_and_order_insensitive(spark):
    df = spark.createDataFrame(
        [({"b": "2", "a": "1"},), ({"a": "1", "b": "2"},)],
        "params map<string,string>",
    )
    out = [
        r["s"]
        for r in df.select(wbi_sign(F.col("params"), F.lit("SALT")).alias("s")).collect()
    ]
    assert out[0] == out[1]  # key order never changes the signature
    assert len(out[0]) == 32


def test_trace_id_deterministic(spark):
    df = spark.createDataFrame([("u1", "e1")], "a string, b string")
    t1 = df.select(trace_id(F.col("a"), F.col("b")).alias("t")).collect()[0]["t"]
    t2 = df.select(trace_id(F.col("a"), F.col("b")).alias("t")).collect()[0]["t"]
    assert t1 == t2 and len(t1) == 32


def test_cdn_image_url(spark):
    cdns = ["https://cdn1.test", "https://cdn2.test"]
    df = spark.createDataFrame([(f"trace{i}",) for i in range(20)], "t string")
    urls = [r["u"] for r in df.select(cdn_image_url(F.col("t"), cdns).alias("u")).collect()]
    assert all(u.startswith("https://cdn") and "/trace" in u for u in urls)
    assert len({u.split("/trace")[0] for u in urls}) == 2  # both CDNs used


def test_unpack_interactions(spark):
    df = spark.createDataFrame(
        [([("follows", "12"), ("fans", "3400"), ("interaction", "99")],)],
        "ints array<struct<type string, count string>>",
    )
    row = df.select(
        unpack_interactions(F.col("ints"), "fans").alias("fans"),
        unpack_interactions(F.col("ints"), "follows").alias("follows"),
        unpack_interactions(F.col("ints"), "missing").alias("missing"),
    ).collect()[0]
    assert row["fans"] == "3400" and row["follows"] == "12" and row["missing"] is None


def test_comma_join_refs(spark):
    df = spark.createDataFrame(
        [(["u1", "u2"], [("a", 1), ("b", 2)])],
        "plain array<string>, structs array<struct<url string, n int>>",
    )
    row = df.select(
        comma_join_refs(F.col("plain")).alias("p"),
        comma_join_refs(F.col("structs"), "url").alias("s"),
    ).collect()[0]
    assert row["p"] == "u1,u2" and row["s"] == "a,b"


def test_custom_b64_alphabet_translation(spark):
    std = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    custom = std[::-1]
    df = spark.createDataFrame([(b"hello",)], "v binary")
    row = df.select(custom_b64(F.col("v"), std, custom).alias("c")).collect()[0]
    import base64

    want = base64.b64encode(b"hello").decode().translate(str.maketrans(std, custom))
    assert row["c"] == want
