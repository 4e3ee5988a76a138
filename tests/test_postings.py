"""inverted_postings (operators/corpus.py) vs an independent
pure-Python index builder, postings order, min_df cut, and the
rolling-DAU window-end fan-out rule (q_rolling_dau in the entry
harness) vs a brute-force day-range reference."""

import re
from collections import Counter, defaultdict
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from mediacrawler_spark.operators.corpus import inverted_postings


def _ref_index(docs, min_df):
    tf = defaultdict(Counter)
    for did, text in docs:
        for w in [w for w in re.split(r"[\W_]+", text.lower()) if w]:
            tf[w][did] += 1
    out = {}
    for term, c in tf.items():
        if len(c) >= min_df:
            postings = ",".join(f"{d}:{n}" for d, n in sorted(c.items()))
            out[term] = (len(c), sum(c.values()), postings)
    return out


def test_inverted_postings_matches_reference(spark):
    docs = [
        (1, "spark spark shuffles data"),
        (2, "data shuffles beat spark"),
        (3, "unrelated words only once"),
        (10, "spark again"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["term"]: (r["df"], r["cf"], r["postings"])
        for r in inverted_postings(df, min_df=2, top_k=100).collect()
    }
    assert got == _ref_index(docs, 2)
    assert got["spark"] == (3, 4, "1:2,2:1,10:1")  # doc-id NUMERIC order


def test_rolling_dau_matches_brute_force(spark):
    t0 = datetime(2024, 5, 1)
    rows = []
    eid = 0
    for day, users in [(0, [1, 2]), (1, [2]), (3, [3]), (9, [1]), (10, [1, 4])]:
        for u in users:
            rows.append((eid, u, t0 + timedelta(days=day, hours=u)))
            eid += 1
    e = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])

    day = F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").cast("long")
    ud = e.select("user_id", day.alias("day")).distinct()
    days = ud.select("day").distinct()
    win = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6))).alias("wday"),
    )
    got = {
        r["day"]: r["active_users_7d"]
        for r in win.join(
            F.broadcast(days.withColumnRenamed("day", "wday")), "wday"
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users_7d"))
        .select(F.col("wday").cast("bigint").alias("day"), "active_users_7d")
        .collect()
    }
    # brute force: for each observed day, distinct users in [d-6, d]
    byday = defaultdict(set)
    for _, u, ts in rows:
        byday[(ts - datetime(1970, 1, 1)).days].add(u)
    obs = sorted(byday)
    ref = {
        d: len(set().union(*[byday[x] for x in obs if d - 6 <= x <= d]))
        for d in obs
    }
    assert got == ref
    # day 3 window covers days 0,1,3 -> users {1,2,3}; day 10 covers 9,10
    d0 = obs[0]
    assert got[d0 + 3] == 3 and got[d0 + 10] == 2
