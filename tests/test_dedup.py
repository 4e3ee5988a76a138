"""Bloom shards + exact anti-join dedup (J1) and intra-batch dedup."""

from pyspark.sql import functions as F

from mediacrawler_spark.operators.dedup import (
    BloomParams,
    bloom_maybe_seen_udf,
    build_bloom_shards,
    dedup_against_seen,
    dedup_within_batch,
)


def _seen(spark, hashes):
    return spark.createDataFrame(
        [(h, f"u{h}") for h in hashes], "url_hash long, url string"
    )


def _cands(spark, hashes):
    rows = [
        (f"https://h/{h}", h, "h", "xhs", "detail", 0, 0, None, "", -1, 0, 0, 0, 0)
        for h in hashes
    ]
    return spark.createDataFrame(
        rows,
        "url string, url_hash long, host string, platform string, kind string,"
        "priority int, seq long, parent_id string, cursor string, parent_seq long,"
        "empty_streak int, attempt int, not_before_epoch int, epoch int",
    )


def test_bloom_no_false_negatives(spark):
    hashes = [h * 2_654_435_761 - 3 for h in range(2000)]
    seen = _seen(spark, hashes)
    params = BloomParams.size(2000, fpp=0.01, n_shards=8)
    bc = build_bloom_shards(seen, params)
    probe = bloom_maybe_seen_udf(bc)
    got = seen.select(probe(F.col("url_hash")).alias("m")).collect()
    assert all(r["m"] for r in got), "bloom must never miss a present key"


def test_bloom_fpp_bound(spark):
    present = [h * 7_919 + 1 for h in range(5000)]
    absent = [h * 6_271 + 500_000_001 for h in range(5000)]
    absent = [a for a in absent if a not in set(present)]
    seen = _seen(spark, present)
    params = BloomParams.size(5000, fpp=0.01, n_shards=8)
    bc = build_bloom_shards(seen, params)
    probe = bloom_maybe_seen_udf(bc)
    df = spark.createDataFrame([(a,) for a in absent], "url_hash long")
    fp = df.select(probe(F.col("url_hash")).alias("m")).filter("m").count()
    assert fp / len(absent) < 0.05, f"fpp too high: {fp}/{len(absent)}"


def test_dedup_exactness_matches_plain_antijoin(spark):
    seen_hashes = list(range(0, 3000, 3))
    cand_hashes = list(range(0, 2000))
    seen = _seen(spark, seen_hashes)
    cands = _cands(spark, cand_hashes)
    got = sorted(
        r["url_hash"] for r in dedup_against_seen(cands, seen, spark).collect()
    )
    want = sorted(set(cand_hashes) - set(seen_hashes))
    assert got == want


def test_dedup_within_batch_deterministic(spark):
    rows = [
        ("https://h/x", 7, "h", "xhs", "detail", 1, 5, None, "", -1, 0, 0, 0, 0),
        ("https://h/x", 7, "h", "xhs", "detail", 0, 9, None, "", -1, 0, 0, 0, 0),
        ("https://h/x", 7, "h", "xhs", "detail", 0, 2, None, "", -1, 0, 0, 0, 0),
    ]
    df = spark.createDataFrame(rows, _cands(spark, [1]).schema)
    out = dedup_within_batch(df).collect()
    assert len(out) == 1
    assert (out[0]["priority"], out[0]["seq"]) == (0, 2)
