"""Variant matrix for the jaccard restructure regression (guide 1.1:
measure each change in isolation).
Usage: python scripts/diag_jaccard3.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from mediacrawler_spark.functions.textual import word_shingles
from mediacrawler_spark.operators.fanout import pin_parallelism
from mediacrawler_spark.operators.text_dedup import _with_gram_ids
from mediacrawler_spark.session import get_spark


def run(spark, sf, exg_mode, dedup_cand, attach, order_gid, tag):
    threshold = 0.5
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    t0 = time.perf_counter()
    sh = d.select(F.col("doc_id").alias("id"), word_shingles(F.col("text"), 3).alias("sh"))
    sh = sh.select("id", "sh", F.size("sh").alias("n")).persist()
    ex = sh.select("id", "n", F.explode("sh").alias("g"))
    freq = ex.groupBy("g").agg(F.count("*").alias("gdf"))
    exg = ex.join(_with_gram_ids(freq), "g")
    if order_gid:
        exg = exg.select("id", "n", "gid", "gdf")
    if exg_mode == "pin_persist":
        exg = pin_parallelism(exg, "id").persist()
    elif exg_mode == "persist":
        exg = exg.persist()
    ish = exg.groupBy("id").agg(F.array_sort(F.collect_list("gid")).alias("ish")).persist()
    order_cols = ["gdf", "gid"] if order_gid else ["gdf", "g"]
    w = Window.partitionBy("id").orderBy(*order_cols)
    plen = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    prefix = (
        exg.select("id", "n", "gid", F.row_number().over(w).alias("p"))
        .filter(F.col("p") <= plen)
    )
    a = prefix.select("gid", F.col("id").alias("id_a"), F.col("n").alias("n_a"), F.col("p").alias("p_a"))
    b = prefix.select("gid", F.col("id").alias("id_b"), F.col("n").alias("n_b"), F.col("p").alias("p_b"))
    overlap_floor = F.ceil(F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b")))
    overlap_ub = F.lit(1) + F.least(F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b"))
    cand = (
        a.join(b, "gid")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") * F.lit(1.0) >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") * F.lit(1.0) >= F.lit(threshold) * F.col("n_b"))
            & (overlap_ub >= overlap_floor)
        )
        .select("id_a", "id_b", "n_a", "n_b")
    )
    if dedup_cand:
        cand = cand.dropDuplicates(["id_a", "id_b"])
    ia = ish.select(F.col("id").alias("id_a"), F.col("ish").alias("ish_a"))
    ib = ish.select(F.col("id").alias("id_b"), F.col("ish").alias("ish_b"))
    if attach == "broadcast":
        ia, ib = F.broadcast(ia), F.broadcast(ib)
    elif attach == "shj":
        ia, ib = ia.hint("shuffle_hash"), ib.hint("shuffle_hash")
    j = cand.join(ia, "id_a").join(ib, "id_b")
    inter = F.size(F.array_intersect("ish_a", "ish_b"))
    union = (F.col("n_a") + F.col("n_b") - inter).cast("double")
    out = (
        j.withColumn("jaccard", F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not dedup_cand:
        out = out.dropDuplicates(["id_a", "id_b"])
    n = out.count()
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt:.2f}s ({n} pairs)", flush=True)
    for df in (sh, ish):
        df.unpersist()
    if exg_mode in ("pin_persist", "persist"):
        exg.unpersist()
    spark.catalog.clearCache()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/sfbig/sf1.0"
    spark = get_spark(app_name="diag_jaccard3")
    run(spark, sf, "none", True, "auto", False, "OLD none+dedup+auto warmup")
    run(spark, sf, "none", True, "auto", False, "OLD none+dedup+auto")
    run(spark, sf, "pin_persist", False, "broadcast", False, "NEW pin+nodedup+bcast")
    run(spark, sf, "none", False, "broadcast", False, "none+nodedup+bcast")
    run(spark, sf, "none", True, "broadcast", False, "none+dedup+bcast")
    run(spark, sf, "persist", False, "broadcast", True, "persistnarrow+nodedup+bcast+gid")
    run(spark, sf, "none", False, "broadcast", True, "none+nodedup+bcast+gid")
    spark.stop()


if __name__ == "__main__":
    main()
