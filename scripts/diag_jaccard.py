"""Stage-by-stage diagnosis of jaccard_similarity_join / containment_join
at a given SF dir (guide §1: find the expensive stage before changing it).
Usage: python scripts/diag_jaccard.py [sf_dir]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from mediacrawler_spark.functions.textual import word_shingles
from mediacrawler_spark.session import get_spark


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    spark = get_spark(app_name="diag_jaccard")
    d = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    threshold = 0.5

    t0 = time.perf_counter()
    sh = d.select(
        F.col("doc_id").alias("id"), word_shingles(F.col("text"), 3).alias("sh")
    )
    sh = sh.select("id", "sh", F.size("sh").alias("n")).persist()
    n_docs = sh.count()
    t1 = time.perf_counter()
    print(f"shingle build: {t1-t0:.2f}s  docs={n_docs}")
    stats = sh.agg(F.sum("n").alias("tot"), F.max("n").alias("mx"), F.avg("n").alias("av")).collect()[0]
    print(f"shingles: total={stats['tot']} max={stats['mx']} avg={stats['av']:.1f}")

    ex = sh.select("id", "n", F.explode("sh").alias("g"))
    freq = ex.groupBy("g").agg(F.count("*").alias("gdf"))
    t2 = time.perf_counter()
    n_grams = freq.count()
    print(f"distinct grams: {n_grams}  ({time.perf_counter()-t2:.2f}s)")

    w = Window.partitionBy("id").orderBy("gdf", "g")
    plen = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    prefix = (
        ex.join(freq, "g")
        .select("id", "n", "g", F.row_number().over(w).alias("p"))
        .filter(F.col("p") <= plen)
    ).persist()
    t3 = time.perf_counter()
    n_prefix = prefix.count()
    print(f"prefix rows: {n_prefix}  ({time.perf_counter()-t3:.2f}s)")

    pg = prefix.groupBy("g").agg(F.count("*").alias("c"))
    blow = pg.agg(
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"), F.max("c").alias("max_c")
    ).collect()[0]
    print(f"prefix-gram join blowup: sum_c2={blow['sum_c2']} max_bucket={blow['max_c']}")

    a = prefix.select("g", F.col("id").alias("id_a"), F.col("n").alias("n_a"), F.col("p").alias("p_a"))
    b = prefix.select("g", F.col("id").alias("id_b"), F.col("n").alias("n_b"), F.col("p").alias("p_b"))
    overlap_floor = F.ceil(F.lit(threshold / (1.0 + threshold)) * (F.col("n_a") + F.col("n_b")))
    overlap_ub = F.lit(1) + F.least(F.col("n_a") - F.col("p_a"), F.col("n_b") - F.col("p_b"))
    t4 = time.perf_counter()
    cand_raw = (
        a.join(b, "g")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("n_b") * F.lit(1.0) >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") * F.lit(1.0) >= F.lit(threshold) * F.col("n_b"))
            & (overlap_ub >= overlap_floor)
        )
        .select("id_a", "id_b")
    )
    n_cand_raw = cand_raw.count()
    t5 = time.perf_counter()
    print(f"candidates pre-dedup: {n_cand_raw}  ({t5-t4:.2f}s)")
    cand = cand_raw.dropDuplicates(["id_a", "id_b"])
    n_cand = cand.count()
    t6 = time.perf_counter()
    print(f"candidates deduped: {n_cand}  ({t6-t5:.2f}s)")

    j = (
        cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    res = (
        j.withColumn("jaccard", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .filter(F.col("jaccard") >= threshold)
    )
    n_res = res.count()
    t7 = time.perf_counter()
    print(f"verified pairs: {n_res}  ({t7-t6:.2f}s)")

    # containment-side stats: contained prefix vs ALL-gram index
    thr_c = 0.8
    plen_c = (F.col("n") - F.ceil(F.lit(thr_c) * F.col("n")) + 1).cast("int")
    prefix_c = (
        ex.join(freq, "g")
        .select("id", "n", "g", F.row_number().over(w).alias("p"))
        .filter(F.col("p") <= plen_c)
    )
    pc = prefix_c.groupBy("g").agg(F.count("*").alias("ca"))
    allg = ex.groupBy("g").agg(F.count("*").alias("cb"))
    bl = pc.join(allg, "g").agg(
        F.sum(F.col("ca") * F.col("cb")).alias("cross"), F.max("cb").alias("max_all")
    ).collect()[0]
    print(f"containment join blowup: sum_ca_cb={bl['cross']} max_allgram_bucket={bl['max_all']}")
    spark.stop()


if __name__ == "__main__":
    main()
