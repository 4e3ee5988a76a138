"""Streaming equivalents driven synchronously via the memory sink."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.streaming.frontier_stream import (
    streaming_candidates,
    streaming_dedup,
    streaming_host_rate,
)


@pytest.fixture()
def url_stream(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    rows = [
        ("2024-01-01 00:00:01", "https://A.example.test/note/1?utm_source=x"),
        ("2024-01-01 00:00:02", "https://a.example.test/note/1"),  # dup after canon
        ("2024-01-01 00:00:03", "https://b.example.test/note/2"),
        ("2024-01-01 00:01:30", "https://a.example.test/note/3"),
    ]
    spark.createDataFrame(rows, "ts_s string, url string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "url"
    ).write.mode("overwrite").parquet(src)
    return (
        spark.readStream.schema("ts timestamp, url string").parquet(src)
    )


def _run(df, name, mode="append"):
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def test_streaming_dedup(spark, url_stream):
    out = streaming_dedup(streaming_candidates(url_stream))
    name = _run(out, "dedup_out")
    urls = sorted(r["url"] for r in spark.sql(f"SELECT url FROM {name}").collect())
    assert urls == [
        "https://a.example.test/note/1",
        "https://a.example.test/note/3",
        "https://b.example.test/note/2",
    ]


def test_streaming_budget_limiter(spark, tmp_path):
    from mediacrawler_spark.streaming.frontier_stream import streaming_budget_limiter

    src = str(tmp_path / "budget_src")
    rows = [
        ("2024-01-01 00:00:01", f"https://{h}.t/note/{i}")
        for h in ("a", "b")
        for i in range(8)
    ]
    spark.createDataFrame(rows, "ts_s string, url string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "url"
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("ts timestamp, url string").parquet(src)
    cand = streaming_candidates(stream).withColumn("priority", F.lit(0)).withColumn(
        "seq", F.xxhash64("url")
    )
    out = streaming_budget_limiter(cand, budget_per_host=3)
    name = _run(out, "budget_out", mode="append")
    got = spark.sql(f"SELECT host, count(*) AS n FROM {name} GROUP BY host").collect()
    assert {r["host"]: r["n"] for r in got} == {"a.t": 3, "b.t": 3}


def test_snapshot_fsck(spark, tmp_path):
    import shutil

    from mediacrawler_spark.sinks.snapshot import SnapshotCatalog

    root = str(tmp_path / "fsck_cat")
    cat = SnapshotCatalog(spark, root)
    df = spark.createDataFrame([(1,)], "x int")
    cat.stage(df, "t1")
    cat.stage_append(df, "t2", 0)
    cat.commit(0)
    assert SnapshotCatalog(spark, root).fsck() == []
    shutil.rmtree(f"{root}/t1/v=0")
    problems = SnapshotCatalog(spark, root).fsck()
    assert problems and "missing version dir" in problems[0]


def test_streaming_host_rate(spark, url_stream):
    out = streaming_host_rate(streaming_candidates(url_stream))
    name = _run(out, "rate_out", mode="complete")
    got = {
        (str(r["w_start"]), r["host"]): r["n_urls"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    assert got[("2024-01-01 00:00:00", "a.example.test")] == 2
    assert got[("2024-01-01 00:00:00", "b.example.test")] == 1
    assert got[("2024-01-01 00:01:00", "a.example.test")] == 1
