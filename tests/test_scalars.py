"""Scalar function parity (SURVEY §2.9) — column-expression helpers."""

from pyspark.sql import functions as F

from mediacrawler_spark.functions import scalars as S


def _one(spark, col, value=None, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(col(F.col("v")).alias("r")).collect()[0]["r"]


def test_html_to_text(spark):
    html = "<html><script>var x=1;</script><style>.a{}</style><p>Hello <b>world</b></p></html>"
    assert _one(spark, S.html_to_text, html) == "Hello world"


def test_parse_count_first_digit_run(spark):
    # reference semantics: FIRST digit run, multiplier ignored
    # (tools/crawler_util.py:162-171)
    assert _one(spark, S.parse_count, "1.2万") == 1
    assert _one(spark, S.parse_count, "345 likes") == 345
    assert _one(spark, S.parse_count, "no digits") == 0
    assert _one(spark, S.parse_count, None) == 0


def test_base36_roundtrip(spark):
    df = spark.createDataFrame([(i * 987654321,) for i in range(5)], "v long")
    out = df.select(
        "v", S.base36_decode(S.base36_encode(F.col("v"))).alias("rt")
    ).collect()
    for r in out:
        assert r["rt"] == r["v"]


def test_search_id_deterministic(spark):
    df = spark.createDataFrame([("kw0", 1), ("kw0", 1), ("kw1", 1)], "k string, e int")
    ids = [
        r["s"]
        for r in df.select(S.search_id(F.col("k"), F.col("e")).alias("s")).collect()
    ]
    assert ids[0] == ids[1] and ids[0] != ids[2]


def test_gender_label(spark):
    assert _one(spark, S.gender_label, "1") == "女"
    assert _one(spark, S.gender_label, "0") == "男"
    assert _one(spark, S.gender_label, "9") == ""


def test_epoch_conversions(spark):
    ms = _one(spark, S.ms_epoch_to_ts, 1700000000123, typ="long")
    s = _one(spark, S.s_epoch_to_ts, 1700000000, typ="long")
    assert str(ms).startswith("2023-11-14 22:13:20")
    assert str(s).startswith("2023-11-14 22:13:20")


def test_day_range_and_bounds(spark):
    df = spark.createDataFrame([("2024-01-01", "2024-01-03")], "a string, b string")
    days = df.select(
        F.explode(S.day_range(F.col("a"), F.col("b"))).alias("d")
    ).collect()
    assert [str(r["d"]) for r in days] == ["2024-01-01", "2024-01-02", "2024-01-03"]
    b, e = S.day_bounds_s(F.col("d"))
    row = (
        df.select(F.explode(S.day_range(F.col("a"), F.col("b"))).alias("d"))
        .select(b.alias("b"), e.alias("e"))
        .collect()[0]
    )
    assert row["e"] - row["b"] == 86399  # end = start + 1d - 1s


def test_cookie_to_map(spark):
    m = _one(spark, S.cookie_to_map, "a=1; b=2;c=3")
    assert m == {"a": "1", "b": "2", "c": "3"}


def test_normalize_json_text(spark):
    assert (
        _one(spark, S.normalize_json_text, '{"x":undefined,"y":1}')
        == '{"x":null,"y":1}'
    )


def test_creator_record_golden(spark):
    """Golden creator-profile projection (VERDICT r02 item 8), mirroring
    store/xhs/__init__.py:160-209 save_creator on a reference-shaped
    payload: basicInfo passthrough, interactions unpack with a missing
    type defaulting like the reference's initial 0... = None-absent (we
    surface NULL), gender 1→女 / 0→男, tag_list as {tagType: name}."""
    import json

    payload = {
        "basicInfo": {
            "nickname": "山里人",
            "gender": 1,
            "images": "https://img.example/avatar/u1.jpg",
            "desc": "记录生活",
            "ipLocation": "浙江",
        },
        "interactions": [
            {"type": "follows", "count": "128"},
            {"type": "fans", "count": "3.4万"},
            {"type": "interaction", "count": "12001"},
        ],
        "tags": [
            {"tagType": "profession", "name": "摄影博主"},
            {"tagType": "location", "name": "杭州"},
        ],
    }
    df = spark.createDataFrame(
        [("user-001", json.dumps(payload, ensure_ascii=False))], "uid string, raw string"
    )
    rec = df.select(
        S.creator_record(F.col("raw"), F.col("uid"), F.lit(1700000000)).alias("r")
    ).collect()[0]["r"]
    assert rec["user_id"] == "user-001"
    assert rec["nickname"] == "山里人"
    assert rec["gender"] == "女"
    assert rec["avatar"] == "https://img.example/avatar/u1.jpg"
    assert rec["desc"] == "记录生活"
    assert rec["ip_location"] == "浙江"
    assert rec["follows"] == "128"
    assert rec["fans"] == "3.4万"
    assert rec["interaction"] == "12001"
    assert json.loads(rec["tag_list"]) == {"profession": "摄影博主", "location": "杭州"}
    assert rec["last_modify_ts"] == 1700000000

    # male + missing interaction type → NULL count (reference leaves 0)
    p2 = dict(payload)
    p2["basicInfo"] = {**payload["basicInfo"], "gender": 0}
    p2["interactions"] = [{"type": "fans", "count": "5"}]
    df2 = spark.createDataFrame([("u2", json.dumps(p2, ensure_ascii=False))], "uid string, raw string")
    r2 = df2.select(
        S.creator_record(F.col("raw"), F.col("uid"), F.lit(0)).alias("r")
    ).collect()[0]["r"]
    assert r2["gender"] == "男" and r2["fans"] == "5" and r2["follows"] is None
