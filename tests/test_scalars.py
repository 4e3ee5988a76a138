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
