"""Bucketed-table co-located joins (sinks/bucketed.py): the write pays
the one hash shuffle, the join plan carries ZERO Exchange operators."""

import pytest
from pyspark.sql import functions as F

from mediacrawler_spark.sinks.bucketed import bucketed_join, write_bucketed

N_BUCKETS = 4


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("host"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )
    scores = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 3 % 11).cast("double").alias("score"),
    )
    write_bucketed(docs, "bt_docs", "doc_id", N_BUCKETS, path=str(tmp_path / "d"))
    write_bucketed(scores, "bt_scores", "doc_id", N_BUCKETS, path=str(tmp_path / "s"))
    yield "bt_docs", "bt_scores"
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_scores")


def test_bucketed_join_is_shuffle_free_and_correct(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the sort-merge path: a broadcast join would trivially have
    # no exchange on the big side and prove nothing about co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        out = joined.agg(
            F.count("*").alias("n"), F.sum("score").alias("s")
        ).collect()[0]
        assert out["n"] == 2000
        assert out["s"] == sum(i * 3 % 11 for i in range(2000))
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_mismatched_bucket_count_still_correct(spark, tmp_path):
    a = spark.range(0, 500).select(F.col("id").alias("k"), F.lit(1).alias("va"))
    b = spark.range(0, 500).select(F.col("id").alias("k"), F.lit(2).alias("vb"))
    write_bucketed(a, "bt_a", "k", 4, path=str(tmp_path / "a"))
    write_bucketed(b, "bt_b", "k", 8, path=str(tmp_path / "b"))
    try:
        assert bucketed_join(spark, "bt_a", "bt_b", "k").count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
