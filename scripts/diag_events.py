"""Stage-by-stage isolation of the events-table queries (guide 1.1/1.4):
zorder_layout / trending_decay cost far more than one hash-agg over 1M
rows should. Times each suspect sub-plan with the noop sink.
Usage: python scripts/diag_events.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mediacrawler_spark.session import get_spark


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label}: {time.perf_counter()-t0:.2f}s", flush=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig/sf1.0"
    spark = get_spark(app_name="diag_events")
    e = spark.read.parquet(f"{sf}/events.parquet")

    t("scan all cols", e)
    t("scan props only", e.select("props"))
    page_json = F.get_json_object("props", "$.k").cast("long")
    t("get_json_object", e.select(page_json.alias("page")))
    t("get_json x2 warm", e.select(page_json.alias("page")))
    page_fj = F.from_json("props", "k long")["k"]
    t("from_json", e.select(page_fj.alias("page")))
    page_re = F.regexp_extract("props", r'"k"\s*:\s*(-?\d+)', 1).cast("long")
    t("regexp_extract", e.select(page_re.alias("page")))

    ui = e.select("user_id", page_json.alias("page")).filter(F.col("page").isNotNull())
    t("ui agg count", ui.groupBy("page").count())

    from mediacrawler_spark.operators.layout import zorder_assign

    za = zorder_assign(ui, "user_id", "page", bits=8, n_buckets=64)
    t("zorder assign only", za)
    t("zorder agg no-distinct", za.groupBy("z_bucket").agg(
        F.count("*").alias("n"), F.min("z"), F.max("z")))
    t("zorder agg with countDistinct", za.groupBy("z_bucket").agg(
        F.count("*").alias("n"), F.min("z"), F.max("z"),
        F.countDistinct("user_id").alias("nu")))

    # trending: constant max week vs broadcast-joined bound
    wk = F.expr("(unix_micros(cast(ts as timestamp)) div 86400000000) div 7").cast("long")
    ev = e.select(page_json.alias("page"), wk.alias("week")).filter(F.col("page").isNotNull())
    t("trending weeks only", ev)
    bounds = ev.agg(F.max("week").alias("_maxw"))
    withb = ev.crossJoin(F.broadcast(bounds))
    num = F.expr(
        "shiftleft(CAST(1 AS BIGINT), greatest(30 - CAST(_maxw - week AS INT), 0))")
    t("trending full agg", withb.groupBy("page").agg(
        F.sum(num).alias("s"), F.count("*").alias("n")))
    spark.stop()


if __name__ == "__main__":
    main()
